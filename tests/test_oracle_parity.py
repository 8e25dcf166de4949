"""Mirror of the driver's correctness gate: run every registered query
on Spark AND its DuckDB oracle on the same parquet tables, then compare
row count + schema (column names) + values exactly.

Runs at sf0.001 for speed (the driver uses sf0.01); any float that
could differ in low bits is rounded in-query on BOTH sides, so exact
comparison is the intended bar.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from talknet_segmentation_batchprocessing_spark import registry

from .conftest import SF_SMOKE

registry._ensure_loaded()
ORACLE_NAMES = sorted(n for n, s in registry.REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in registry.REGISTRY.items() if s.oracle is None)


# ONE shared implementation with scripts/driver_sweep.py — the two
# checks must classify dtypes identically or one can lie about the
# other (round-4 review find).
from talknet_segmentation_batchprocessing_spark.oracle_compare import (  # noqa: E402
    canon as _canon,
    dtype_class as _dtype_class,
)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, duck):
    spec = registry.REGISTRY[name]
    sdf_raw = spec.fn(spark, SF_SMOKE).toPandas()
    odf_raw = duck.execute(spec.oracle).df()
    sdf = _canon(sdf_raw)
    odf = _canon(odf_raw)
    dtype_diff = {
        c: (_dtype_class(sdf_raw[c]), _dtype_class(odf_raw[c]))
        for c in sdf_raw.columns
        if c in odf_raw.columns
        and _dtype_class(sdf_raw[c]) != _dtype_class(odf_raw[c])
    }
    assert not dtype_diff, (
        f"{name}: dtype class mismatch (splits the driver hash even when "
        f"values are equal): {dtype_diff}"
    )
    assert list(sdf.columns) == list(odf.columns), (
        f"{name}: column mismatch {list(sdf.columns)} vs {list(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        if pd.api.types.is_float_dtype(a):
            bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                i = bad.idxmax()
                assert math.isclose(a[i], b[i], rel_tol=0, abs_tol=0), (
                    f"{name}.{c}: row {i}: {a[i]!r} != {b[i]!r} "
                    f"({int(bad.sum())} mismatching rows)"
                )
        else:
            eq = (a == b) | (a.isna() & b.isna())
            assert eq.all(), (
                f"{name}.{c}: {int((~eq).sum())} mismatching rows, first at "
                f"{(~eq).idxmax()}: {a[(~eq)].head(3).tolist()} vs {b[(~eq)].head(3).tolist()}"
            )


# DuckDB integer sum()/product() widen to HUGEINT (int128), which pandas
# can only materialize as float64 — so an uncast HUGEINT output column
# hash-splits at the driver even when every value matches (round-3
# failure: mix_domain_weights, doc_length_histogram,
# multimodal_frame_sample). Lint every oracle's output schema so the
# class can never recur: any HUGEINT/UHUGEINT output column must be
# CAST(... AS BIGINT) in the oracle SQL.
_WIDE_INT_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_no_hugeint_outputs(name, duck):
    rel = duck.sql(registry.REGISTRY[name].oracle)
    bad = {
        col: str(t)
        for col, t in zip(rel.columns, rel.types)
        if str(t).upper() in _WIDE_INT_TYPES
    }
    assert not bad, (
        f"{name}: oracle output columns {bad} are 128-bit/unsigned ints — "
        f"pandas will coerce to float64 and split the driver hash; add "
        f"CAST(... AS BIGINT)"
    )


# Queries whose oracle-parity check would be vacuous on an empty result:
# assert the fixture actually exercises them (round-1 lesson — the
# cosine near-dup query passed with 0 rows and proved nothing).
NON_VACUOUS = ["dedup_embedding_cosine", "dedup_ngram_jaccard", "dedup_minhash_lsh"]


@pytest.mark.parametrize("name", NON_VACUOUS)
def test_non_vacuous(name, spark):
    assert registry.REGISTRY[name].fn(spark, SF_SMOKE).count() > 0, (
        f"{name} returned 0 rows at {SF_SMOKE}: its parity check is vacuous"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark):
    spec = registry.REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    # determinism: same plan executed twice yields identical results
    p1 = df.toPandas()
    p2 = spec.fn(spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(
        _canon(p1), _canon(p2), check_dtype=False
    )


def test_sentence_stats_empty_sentence_doc_matches_oracle(spark, tmp_path):
    """A document with only separators/whitespace has zero sentences:
    Spark must emit NULL (not 0) chars/mean exactly like the oracle's
    list_sum-over-empty — testdata contains no such doc, so this pins
    the case synthetically (round-4 review find)."""
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["hello there. bye.", "!!!", "   "],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [17, 3, 3],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spec = registry.REGISTRY["text_sentence_stats"]
    s_raw = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    o_raw = con.execute(spec.oracle).df()
    s, o = _canon(s_raw), _canon(o_raw)
    assert _dtype_class(s_raw["n_sentence_chars"]) == _dtype_class(
        o_raw["n_sentence_chars"]
    )
    for c in s.columns:
        eq = (s[c] == o[c]) | (s[c].isna() & o[c].isna())
        assert eq.all(), (c, s[c].tolist(), o[c].tolist())
    # the separator-only docs specifically: NULL chars, NULL mean
    empty = s_raw[s_raw.n_sentences == 0]
    assert len(empty) == 2 and empty.n_sentence_chars.isna().all()
