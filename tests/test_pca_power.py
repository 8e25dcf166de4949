"""emb_pca_power numerical-fidelity test: the engine's exact
integer-grid power iterate must align (cos >= 0.9999) with a plain
float64 numpy power iteration from the same start vector — proving the
1/1024 value grid and 1/1e5 iterate grid do not distort the math. The
DuckDB oracle (tests/test_oracle_parity.py) separately proves Spark ==
DuckDB bit-for-bit; this test proves both equal the real algorithm.

Convergence to the true top eigenvector is data-dependent
((lambda2/lambda1)^T); on the isotropic synthetic embeddings the gap
is ~1.07, so NO fixed-iteration method converges there — fidelity to
the float iterate is the correct invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from talknet_segmentation_batchprocessing_spark import registry

from .conftest import SF_SMOKE

registry._ensure_loaded()


def test_integer_grid_matches_float_power_iteration(spark):
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array(
        [np.asarray(r) for r in t["embedding"].to_pylist()], dtype=np.float64
    )
    Q = np.floor(X * 1024 + 0.5)
    v = np.full(Q.shape[1], 1.0)
    for _ in range(3):
        u = Q.T @ (Q @ v)
        v = u / np.abs(u).max()
    v = v / np.linalg.norm(v)

    rows = registry.REGISTRY["emb_pca_power"].fn(spark, SF_SMOKE).collect()
    vg = np.zeros(Q.shape[1])
    for r in rows:
        vg[r["dim"]] = r["component"]
    assert abs(float(np.linalg.norm(vg)) - 1.0) < 1e-4, "output is unit-norm"
    cos = abs(float(v @ vg))
    assert cos >= 0.9999, f"integer-grid iterate drifted: cos={cos}"


def test_rdiv_positive_operand_form_matches_duckdb():
    """The round-half-away-from-zero division used by emb_pca_power is
    written to divide POSITIVE integers only, because Spark `div`
    truncates toward zero while DuckDB `//` floors — they disagree on
    negatives. Lock the three-way agreement: the Python driver-side
    form, the DuckDB SQL form, and plain math, over a signed grid
    including the exact-half boundary cases."""
    import duckdb

    from talknet_segmentation_batchprocessing_spark.queries.dataset_ops import (
        _rdiv_sql,
    )

    con = duckdb.connect()

    def rdiv_py(a: int, b: int) -> int:
        return (-((-2 * a + b) // (2 * b))) if a < 0 else ((2 * a + b) // (2 * b))

    cases = [
        (a, b)
        for a in list(range(-25, 26)) + [-10**15, 10**15, -999999, 999999]
        for b in (1, 2, 3, 7, 10, 100000)
    ]
    rows = con.execute(
        "SELECT " + _rdiv_sql("a", "b") + " FROM (SELECT "
        "unnest($1::BIGINT[]) AS a, unnest($2::BIGINT[]) AS b)",
        [[a for a, _ in cases], [b for _, b in cases]],
    ).fetchall()
    for (a, b), (got_sql,) in zip(cases, rows):
        want = rdiv_py(a, b)
        assert got_sql == want, (a, b, got_sql, want)
        # half-away-from-zero ground truth
        import math as _m

        frac = abs(a) / b
        truth = int(_m.floor(frac + 0.5))
        truth = -truth if a < 0 else truth
        if abs(a) < 10**9:  # float ground-truth only in exact range
            assert want == truth, (a, b, want, truth)


def test_headroom_guard_raises_loudly(spark, tmp_path):
    """Non-ANSI Spark sum on BIGINT wraps silently; emb_pca_power must
    refuse to run (naming the divisor knob) when n*d*qmax^2*W could
    reach 2^62, instead of returning a wrong principal direction."""
    import pytest

    # huge embedding magnitudes: qmax ~ 3e7 * 1024 ~ 3e10, so even a
    # handful of 4-dim rows blows the 2^62 bound (n*d*qmax^2*W ~ 1e27)
    rows = [([3.0e7, -2.9e7, 1.1e7, 2.2e7],) for _ in range(8)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    with pytest.raises(ValueError, match="headroom.*sp divisor"):
        registry.REGISTRY["emb_pca_power"].fn(spark, str(tmp_path))
