"""Weights-parity harness (round 6): IF a converted real checkpoint +
its golden torch activations are present on disk, assert the numpy
forwards (M1 s3fd_net, M3 talknet_forward) reproduce the reference
model's outputs on the fixed seeded inputs; skip with a reason
otherwise. Generate the artifacts off-sandbox with
scripts/make_golden.py (see operators/parity.py docstring).

Tolerance: the torch reference computes in float32, ours in float64 —
2e-3 absolute on the final activations absorbs the float32 round-trip
across ~100 layers while still catching any wiring/weight-mapping
error (which shifts outputs by O(1))."""

from __future__ import annotations

import os

import pytest

WEIGHTS_DIR = os.environ.get(
    "SPARK_GRAFT_WEIGHTS_DIR",
    os.path.join(os.path.dirname(__file__), "..", "weights"),
)

_TOL = 2e-3


def _artifacts(model: str) -> tuple[str, str]:
    w = os.path.join(WEIGHTS_DIR, f"{model}.npz")
    g = os.path.join(WEIGHTS_DIR, f"{model}_golden.npz")
    if not (os.path.exists(w) and os.path.exists(g)):
        pytest.skip(
            f"no {model} checkpoint artifacts in {WEIGHTS_DIR} "
            "(generate off-sandbox: scripts/make_golden.py, then set "
            "SPARK_GRAFT_WEIGHTS_DIR)"
        )
    return w, g


def test_talknet_forward_matches_reference_weights():
    from talknet_segmentation_batchprocessing_spark.operators.parity import (
        run_talknet_parity,
    )

    w, g = _artifacts("talknet")
    diffs = run_talknet_parity(w, g)
    assert diffs["scores"] < _TOL, f"talknet parity diffs {diffs}"


def test_s3fd_forward_matches_reference_weights():
    from talknet_segmentation_batchprocessing_spark.operators.parity import (
        run_s3fd_parity,
    )

    w, g = _artifacts("s3fd")
    diffs = run_s3fd_parity(w, g)
    assert max(diffs.values()) < _TOL, f"s3fd parity diffs {diffs}"


def test_parity_harness_runs_on_synthetic_weights(tmp_path):
    """The harness itself is exercised every round: synthesize npz
    weights from the seeded init, generate 'golden' activations with
    the SAME numpy forward, and require the round-trip diff to be
    exactly 0 — proving the loader, input spec, version stamp, and
    comparison plumbing all work before a real checkpoint ever lands."""
    import numpy as np

    from talknet_segmentation_batchprocessing_spark.operators import parity
    from talknet_segmentation_batchprocessing_spark.operators.checkpoint_convert import (
        save_npz_weights,
    )
    from talknet_segmentation_batchprocessing_spark.operators.s3fd_net import (
        forward,
        init_weights as s3fd_init,
    )
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        init_weights as tn_init,
        talknet_forward,
    )

    tn_w = tn_init(seed=7)
    save_npz_weights(str(tmp_path / "talknet.npz"), tn_w)
    mfcc, frames = parity.golden_inputs_talknet()
    np.savez(
        tmp_path / "talknet_golden.npz",
        scores=talknet_forward(tn_w, mfcc, frames),
        inputs_version=parity.INPUTS_VERSION,
    )
    diffs = parity.run_talknet_parity(
        str(tmp_path / "talknet.npz"), str(tmp_path / "talknet_golden.npz")
    )
    assert diffs["scores"] == 0.0

    s3_w = s3fd_init(seed=13)
    save_npz_weights(str(tmp_path / "s3fd.npz"), s3_w)
    loc, conf, _ = forward(s3_w, parity.golden_inputs_s3fd())
    np.savez(
        tmp_path / "s3fd_golden.npz",
        loc=loc,
        conf=conf,
        inputs_version=parity.INPUTS_VERSION,
    )
    diffs = parity.run_s3fd_parity(
        str(tmp_path / "s3fd.npz"), str(tmp_path / "s3fd_golden.npz")
    )
    assert max(diffs.values()) == 0.0


def test_parity_version_mismatch_fails_loudly(tmp_path):
    import numpy as np

    from talknet_segmentation_batchprocessing_spark.operators import parity
    from talknet_segmentation_batchprocessing_spark.operators.checkpoint_convert import (
        save_npz_weights,
    )
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        init_weights as tn_init,
    )

    save_npz_weights(str(tmp_path / "talknet.npz"), tn_init(seed=7))
    np.savez(
        tmp_path / "talknet_golden.npz",
        scores=np.zeros(3),
        inputs_version=parity.INPUTS_VERSION + 99,
    )
    with pytest.raises(ValueError, match="inputs_version"):
        parity.run_talknet_parity(
            str(tmp_path / "talknet.npz"), str(tmp_path / "talknet_golden.npz")
        )


def test_talknet_forward_matches_committed_regression_golden():
    """Cross-ROUND wiring pin: the synthetic round-trip test above
    regenerates its golden in the same run, so a forward-wiring change
    moves both sides and passes silently. This golden was generated
    once (round 7) from init_weights(seed=7) on the fixed parity
    inputs and is COMMITTED — any future change to the numpy forward's
    numerics fails here loudly. Not torch parity (that needs the
    off-sandbox artifacts); a drift detector. Tolerance: 1e-12
    relative. Bit-exactness is NOT portable — numpy matmul dispatches
    to whatever BLAS kernel matches the host CPU, and different
    blocking orders legally reorder float additions (observed 3e-14
    drift across machines). 1e-12 is ~100x that noise floor and ~1e4x
    tighter than any wiring bug (a transposed weight or dropped layer
    shifts scores by O(1))."""
    import numpy as np

    from talknet_segmentation_batchprocessing_spark.operators import parity
    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        init_weights as tn_init,
        talknet_forward,
    )

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "talknet_seed7_regression.npz"
    )
    with np.load(golden_path) as z:
        golden = {k: z[k] for k in z.files}
    assert int(np.asarray(golden["inputs_version"])) == parity.INPUTS_VERSION
    mfcc, frames = parity.golden_inputs_talknet()
    scores = talknet_forward(tn_init(seed=7), mfcc, frames)
    np.testing.assert_allclose(scores, golden["scores"], rtol=1e-12, atol=0)


def test_s3fd_forward_matches_committed_regression_golden():
    import numpy as np

    from talknet_segmentation_batchprocessing_spark.operators import parity
    from talknet_segmentation_batchprocessing_spark.operators.s3fd_net import (
        forward,
        init_weights as s3_init,
    )

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "s3fd_seed13_regression.npz"
    )
    with np.load(golden_path) as z:
        golden = {k: z[k] for k in z.files}
    assert int(np.asarray(golden["inputs_version"])) == parity.INPUTS_VERSION
    loc, conf, _ = forward(s3_init(seed=13), parity.golden_inputs_s3fd())
    # Same BLAS-portability rationale as the talknet golden above.
    np.testing.assert_allclose(loc, golden["loc"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(conf, golden["conf"], rtol=1e-12, atol=1e-15)
