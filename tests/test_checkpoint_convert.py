"""operators/checkpoint_convert.py — torch-checkpoint key remapping
(reference loadParameters semantics, talkNet.py:130-147) tested on
synthetic state_dicts; no torch required."""

from __future__ import annotations

import numpy as np
import pytest

from talknet_segmentation_batchprocessing_spark.operators import checkpoint_convert as cc
from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
    init_weights as talknet_init,
)


class _FakeTensor:
    """Duck-typed torch.Tensor: detach().cpu().numpy() chain."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self._arr


def test_remap_exact_module_prefix_unknown_and_mismatch():
    expected = {
        "lossAV.FC.weight": np.zeros((2, 256)),
        "lossAV.FC.bias": np.zeros(2),
        "lossA.FC.weight": np.zeros((2, 128)),
    }
    loaded = {
        # exact match
        "lossAV.FC.bias": np.ones(2),
        # DataParallel prefix -> stripped
        "module.lossAV.FC.weight": np.full((2, 256), 3.0),
        # unknown key -> skipped, reported
        "some.other.param": np.ones(4),
        # matched name, wrong shape -> skipped, reported
        "lossA.FC.weight": np.ones((2, 64)),
    }
    out, unknown, mismatched = cc.remap_state_dict(loaded, expected)
    assert unknown == ["some.other.param"]
    assert mismatched == ["lossA.FC.weight"]
    np.testing.assert_array_equal(out["lossAV.FC.bias"], np.ones(2))
    np.testing.assert_array_equal(out["lossAV.FC.weight"], np.full((2, 256), 3.0))
    # mismatched param keeps its initialization (copy_ semantics)
    np.testing.assert_array_equal(out["lossA.FC.weight"], np.zeros((2, 128)))


def test_remap_accepts_tensor_like_values():
    expected = {"w": np.zeros((2, 2))}
    out, unknown, mismatched = cc.remap_state_dict(
        {"module.w": _FakeTensor(np.eye(2))}, expected
    )
    assert not unknown and not mismatched
    np.testing.assert_array_equal(out["w"], np.eye(2))
    assert out["w"].dtype == np.float64


def test_full_talknet_state_dict_roundtrip(tmp_path):
    """A synthetic checkpoint covering EVERY talknet_forward param with
    module. prefixes survives remap + npz roundtrip bit-exactly."""
    rng = np.random.default_rng(3)
    expected = talknet_init(seed=7)
    loaded = {f"module.{k}": rng.standard_normal(v.shape) for k, v in expected.items()}
    out, unknown, mismatched = cc.remap_state_dict(loaded, expected)
    assert not unknown and not mismatched
    for k in expected:
        np.testing.assert_array_equal(out[k], loaded[f"module.{k}"])
    p = tmp_path / "talknet.npz"
    cc.save_npz_weights(str(p), out)
    back = cc.load_npz_weights(str(p))
    assert set(back) == set(out)
    for k in out:
        np.testing.assert_array_equal(back[k], out[k])


def test_convert_requires_torch_with_clear_error(tmp_path):
    pytest.importorskip_reason = None
    try:
        import torch  # noqa: F401

        pytest.skip("torch present; guarded path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="requires torch"):
        cc.convert_talknet("/nonexistent.model", str(tmp_path / "o.npz"))
