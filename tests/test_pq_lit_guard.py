"""The PQ literal-expression helpers must fall back to the retained
join form above the plan-size bound (VERDICT r12 ask #7: at production
PQ sizes — m=64, k=256 — embedding every codeword as a literal would
put megabytes of doubles into one expression tree and blow up Catalyst
analysis time). The fallback IS the pre-round-12 implementation, so
codes, d2s and LUT layouts must be bit-identical either side of the
bound; these tests pin that by running both paths on the same input
with the bound monkeypatched to 0."""

from __future__ import annotations

import pytest

from talknet_segmentation_batchprocessing_spark.queries import dataset_ops as dops

# two subspaces x two codewords x subdim 2 — tiny, but exercises the
# full layout (multiple m, multiple codes, tie-free d2s)
BOOKS = [
    (0, 0, [0.0, 0.0]),
    (0, 1, [1.0, 1.0]),
    (1, 0, [0.5, -0.5]),
    (1, 1, [2.0, 2.0]),
]
N_SUB, SUBDIM = 2, 2

VECS = [
    (1, [0.1, 0.2, 0.4, -0.4]),
    (2, [0.9, 1.1, 1.9, 2.1]),
    (3, [0.0, 0.0, 0.0, 0.0]),
    (4, [1.0, 0.0, 1.0, 0.0]),
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, v array<double>")


def _q(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in VECS], "query_id long, v array<double>"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_wide_books_fallback_matches_literal(spark, monkeypatch):
    lit = _rows(dops._pq_wide_books(_emb(spark), BOOKS, N_SUB, SUBDIM))
    monkeypatch.setattr(dops, "_PQ_LIT_MAX_DOUBLES", 0)
    join_form = _rows(dops._pq_wide_books(_emb(spark), BOOKS, N_SUB, SUBDIM))
    assert join_form == lit


def test_luts_fallback_matches_literal(spark, monkeypatch):
    lit = _rows(dops._pq_luts_lit(_q(spark), BOOKS, N_SUB, SUBDIM))
    monkeypatch.setattr(dops, "_PQ_LIT_MAX_DOUBLES", 0)
    join_form = _rows(dops._pq_luts_lit(_q(spark), BOOKS, N_SUB, SUBDIM))
    assert join_form == lit


def test_declared_sizes_stay_on_the_literal_path():
    """The registered queries' codebooks (4 x 8 x 16 = 512 doubles) are
    far inside the bound — the guard must not reroute them."""
    assert dops._pq_lit_fits([(m, c, [0.0] * 16) for m in range(4) for c in range(8)], 16)


def test_production_sizes_take_the_fallback():
    """m=64, k=256, subdim=16 (~262k doubles) is exactly the cliff the
    guard exists for."""
    books = [(m, c, None) for m in range(64) for c in range(256)]
    assert not dops._pq_lit_fits(books, 16)
