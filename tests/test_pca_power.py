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
