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


def test_convert_talknet_end_to_end_without_torch(tmp_path):
    """Round 5: the conversion path no longer needs torch at all — a
    zip-format .model crafted to the torch spec converts through
    convert_talknet straight to the engine's npz in THIS image."""
    import numpy as np

    from talknet_segmentation_batchprocessing_spark.operators.talknet_forward import (
        init_weights,
    )

    expected = init_weights()  # convert_talknet's own default init
    name, ref = next(iter(expected.items()))
    crafted = (np.arange(ref.size, dtype="float32").reshape(ref.shape) / 100.0)
    src = str(tmp_path / "pretrain_TalkNet.model")
    _craft_torch_zip(
        src,
        [
            (f"module.{name}", crafted, None),
            ("totally.unknown.key", np.zeros(3, dtype="float32"), None),
        ],
    )
    out = str(tmp_path / "talknet.npz")
    unknown, mismatched = cc.convert_talknet(src, out)
    assert unknown == ["totally.unknown.key"] and mismatched == []
    weights = cc.load_npz_weights(out)
    np.testing.assert_allclose(weights[name], crafted.astype("float64"))
    # untouched params keep their init, per the reference's tolerant load
    for k, v in expected.items():
        if k != name:
            np.testing.assert_array_equal(weights[k], np.asarray(v))


def _craft_torch_zip(path, tensors):
    """Write a spec-exact torch>=1.6 zip checkpoint WITHOUT torch:
    fake torch modules are registered just long enough for stdlib
    pickle to emit the same GLOBAL opcodes torch's writer does
    (torch._utils._rebuild_tensor_v2, torch.FloatStorage, ...), and a
    Pickler.persistent_id hook emits the ('storage', type, key,
    location, numel) persistent ids; raw element bytes land under
    archive/data/<key>."""
    import io
    import pickle
    import sys
    import types
    import zipfile
    from collections import OrderedDict

    import numpy as np

    storage_names = {
        np.dtype("float32"): "FloatStorage",
        np.dtype("float64"): "DoubleStorage",
        np.dtype("int64"): "LongStorage",
    }

    fake_torch = types.ModuleType("torch")
    fake_utils = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(storage, offset, size, stride, rg, hooks):
        raise AssertionError("writer-side placeholder, never called")

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    fake_utils._rebuild_tensor_v2 = _rebuild_tensor_v2

    storage_classes = {}
    for sname in set(storage_names.values()):
        cls = type(sname, (), {"__module__": "torch", "__qualname__": sname})
        setattr(fake_torch, sname, cls)
        storage_classes[sname] = cls

    class _Tensor:
        def __init__(self, key, arr, offset, size, stride):
            self.key, self.arr = key, arr
            self.offset, self.size, self.stride = offset, size, stride

        def __reduce_ex__(self, proto):
            storage = _Storage(self.key, self.arr)
            return (
                _rebuild_tensor_v2,
                (storage, self.offset, self.size, self.stride, False, OrderedDict()),
            )

    class _Storage:
        def __init__(self, key, arr):
            self.key, self.arr = key, arr

    class _P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _Storage):
                scls = storage_classes[storage_names[obj.arr.dtype]]
                return ("storage", scls, obj.key, "cpu", int(obj.arr.size))
            return None

    sys.modules["torch"] = fake_torch
    sys.modules["torch._utils"] = fake_utils
    try:
        state = OrderedDict()
        blobs = {}
        for i, (name, arr, view) in enumerate(tensors):
            key = str(i)
            blobs[key] = np.ascontiguousarray(arr).tobytes()
            if view is None:
                offset, size = 0, list(arr.shape)
                stride = [int(s // arr.itemsize) for s in arr.strides]
            else:
                offset, size, stride = view
            state[name] = _Tensor(key, arr, offset, size, stride)
        buf = io.BytesIO()
        _P(buf, protocol=2).dump(state)
    finally:
        del sys.modules["torch"], sys.modules["torch._utils"]

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/version", "3")
        zf.writestr("archive/data.pkl", buf.getvalue())
        for key, blob in blobs.items():
            zf.writestr(f"archive/data/{key}", blob)


def test_load_torch_zip_without_torch(tmp_path):
    """The pure-numpy reader parses a spec-exact torch zip checkpoint:
    contiguous float32/float64/int64 tensors, a strided+offset view,
    and a module.-prefixed key flowing through remap_state_dict."""
    import numpy as np

    from talknet_segmentation_batchprocessing_spark.operators.checkpoint_convert import (
        load_torch_zip,
        remap_state_dict,
    )

    rng = np.random.default_rng(11)
    w = rng.normal(size=(3, 4)).astype("float32")
    b = rng.normal(size=(7,)).astype("float64")
    idx = np.arange(10, dtype="int64")
    base = np.arange(12, dtype="float32")
    path = str(tmp_path / "ckpt.model")
    _craft_torch_zip(
        path,
        [
            ("module.fc.weight", w, None),
            ("fc.bias", b, None),
            ("buf.index", idx, None),
            # offset-2, every-other-element view of base: [2, 4, 6, 8]
            ("view.t", base, (2, [4], [2])),
        ],
    )

    got = load_torch_zip(path)
    np.testing.assert_array_equal(got["module.fc.weight"], w)
    np.testing.assert_array_equal(got["fc.bias"], b)
    np.testing.assert_array_equal(got["buf.index"], idx)
    np.testing.assert_array_equal(got["view.t"], base[2:10:2])

    expected = {
        "fc.weight": np.zeros((3, 4)),
        "fc.bias": np.zeros(7),
    }
    weights, unknown, mismatched = remap_state_dict(got, expected)
    np.testing.assert_allclose(weights["fc.weight"], w.astype("float64"))
    np.testing.assert_allclose(weights["fc.bias"], b)
    assert set(unknown) == {"buf.index", "view.t"}
    assert mismatched == []


def test_load_torch_zip_rejects_legacy(tmp_path):
    import pickle

    import pytest

    from talknet_segmentation_batchprocessing_spark.operators.checkpoint_convert import (
        load_torch_zip,
    )

    p = tmp_path / "legacy.model"
    p.write_bytes(pickle.dumps({"a": 1}))
    with pytest.raises(ValueError, match="zip-format"):
        load_torch_zip(str(p))
