"""M4 companion: convert real torch checkpoints to the npz weight
dicts this engine's numpy forwards consume.

The reference loads ``pretrain_TalkNet.model`` with a tolerant key
match (talkNet.py:130-147): keys absent from the model are retried
with ``module.`` stripped (DataParallel artifacts), unknown keys are
skipped with a warning, and shape mismatches are skipped. This module
re-implements exactly that contract over plain mappings, so:

- with torch installed, ``convert_talknet`` / ``convert_s3fd`` read a
  real ``.model`` / ``.pth`` file and write an ``.npz`` whose keys are
  the engine's state_dict-shaped weight names
  (operators/talknet_forward.init_weights,
  operators/s3fd_net.init_weights);
- without torch (this image), ``remap_state_dict`` is fully testable
  on synthetic dicts, and ``load_npz_weights`` is the runtime path
  that feeds operators/inference.broadcast_weights.

Torch is import-guarded like PyAV (sources/media_ingest.py pattern):
importing this module never requires it; only reading a torch-pickled
file does.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np


def _to_numpy(v) -> np.ndarray:
    """Tensor-or-array -> float64 ndarray without importing torch."""
    if hasattr(v, "detach"):  # torch.Tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float64)


def remap_state_dict(
    loaded: Mapping[str, object],
    expected: Mapping[str, np.ndarray],
) -> tuple[dict[str, np.ndarray], list[str], list[str]]:
    """Reference loadParameters semantics (talkNet.py:130-147) over
    plain mappings.

    For each loaded key: exact match wins; else retry with
    ``module.`` stripped; else record as unknown. A matched key whose
    shape differs from the expected parameter is recorded as
    mismatched and skipped. Returns ``(weights, unknown, mismatched)``
    where ``weights`` starts from ``expected`` (so params absent from
    the checkpoint keep their initialization, exactly like
    ``selfState.copy_`` only overwriting matches).
    """
    out = {k: np.asarray(v, dtype=np.float64) for k, v in expected.items()}
    unknown: list[str] = []
    mismatched: list[str] = []
    for orig_name, param in loaded.items():
        name = orig_name
        if name not in out:
            name = name.replace("module.", "")
            if name not in out:
                unknown.append(orig_name)
                continue
        arr = _to_numpy(param)
        if out[name].shape != arr.shape:
            mismatched.append(orig_name)
            continue
        out[name] = arr
    return out, unknown, mismatched


_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


def load_torch_zip(path: str) -> dict[str, np.ndarray]:
    """Pure-numpy reader for the torch >= 1.6 ZIP checkpoint format —
    no torch import, so the conversion path runs in this image.

    The format is public and simple: a zip holding
    ``<archive>/data.pkl`` (the pickled object graph, where each
    tensor is a ``torch._utils._rebuild_tensor_v2(storage, offset,
    size, stride, ...)`` call and each storage is a pickle PERSISTENT
    ID ``('storage', <StorageType>, <key>, <location>, <numel>)``)
    plus ``<archive>/data/<key>`` files of raw little-endian element
    bytes. A custom ``Unpickler`` maps the torch globals to local
    shims: storages resolve to (dtype, key) handles, and the rebuild
    call slices ``np.frombuffer`` of the zip member with
    element-strides — torch never touches memory.

    Legacy (pre-1.6, non-zip) files raise with a clear message.
    """
    import io
    import pickle
    import zipfile

    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path} is not a torch zip-format checkpoint (pre-1.6 "
            "legacy pickle streams are not supported by the no-torch "
            "reader; re-save with a modern torch)"
        )
    zf = zipfile.ZipFile(path)
    pkl_name = next(
        n for n in zf.namelist() if n == "data.pkl" or n.endswith("/data.pkl")
    )
    prefix = pkl_name[: -len("data.pkl")]

    class _Shim:
        """Inert stand-in for any torch global the pickle references."""

        def __init__(self, name: str):
            self.name = name

        def __call__(self, *a, **k):  # e.g. dtype objects, OrderedDict hooks
            return self

    def _rebuild_tensor_v2(storage, offset, size, stride, *_args):
        dtype, key = storage
        arr = np.frombuffer(zf.read(f"{prefix}data/{key}"), dtype=dtype)
        itemsize = arr.dtype.itemsize  # torch strides/offsets are in ELEMENTS
        out = np.lib.stride_tricks.as_strided(
            arr[offset:],
            shape=tuple(int(s) for s in size),
            strides=tuple(int(s) * itemsize for s in stride),
        )
        return out.copy()  # own the memory; drop the buffer view

    def _rebuild_parameter(tensor, *_args):
        return tensor

    # Checkpoints are untrusted input: never fall through to the default
    # find_class (which would let a crafted pickle import os.system etc.).
    # Allow exactly the torch rebuild hooks we implement, inert shims for
    # other torch globals (dtypes, storage classes), and OrderedDict.
    _ALLOWED_STDLIB = {("collections", "OrderedDict")}

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if module == "torch._utils" and name == "_rebuild_parameter":
                return _rebuild_parameter
            if module.startswith("torch"):
                return _Shim(name)
            if (module, name) in _ALLOWED_STDLIB:
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"checkpoint pickle references disallowed global "
                f"{module}.{name}; only torch rebuild hooks and "
                f"collections.OrderedDict are permitted"
            )

        def persistent_load(self, pid):
            kind, st, key = pid[0], pid[1], pid[2]
            if kind != "storage":  # pragma: no cover - format guard
                raise ValueError(f"unknown persistent id kind: {kind!r}")
            name = st.name if isinstance(st, _Shim) else str(st)
            name = name.rsplit(".", 1)[-1]
            if name not in _STORAGE_DTYPES:
                raise ValueError(
                    f"unsupported torch storage type {name!r}; the "
                    "no-torch reader handles "
                    f"{sorted(_STORAGE_DTYPES)} (numpy-representable "
                    "dtypes only — re-save bfloat16/complex weights as "
                    "float32 before converting)"
                )
            return (_STORAGE_DTYPES[name], key)

    state = _Unpickler(io.BytesIO(zf.read(pkl_name))).load()
    if hasattr(state, "state_dict"):  # a full module was pickled
        state = state.state_dict()
    return {k: v for k, v in dict(state).items() if isinstance(v, np.ndarray)}


def _torch_load(path: str) -> Mapping[str, object]:
    try:
        import torch  # noqa: PLC0415
    except ImportError:
        # no torch in this image: the pure-numpy zip reader handles the
        # modern (>= 1.6) checkpoint format end-to-end
        return load_torch_zip(path)
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):  # a full module was pickled
        state = state.state_dict()
    return state


def save_npz_weights(path: str, weights: Mapping[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in weights.items()})


def load_npz_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def convert_talknet(in_path: str, out_path: str) -> tuple[list[str], list[str]]:
    """pretrain_TalkNet.model (talkNet.saveParameters output) ->
    npz keyed for operators/talknet_forward. Returns (unknown,
    mismatched) key lists for the caller to log."""
    from .talknet_forward import init_weights

    weights, unknown, mismatched = remap_state_dict(
        _torch_load(in_path), init_weights()
    )
    save_npz_weights(out_path, weights)
    return unknown, mismatched


def convert_s3fd(in_path: str, out_path: str) -> tuple[list[str], list[str]]:
    """S3FD face-detector state_dict (model/faceDetector/s3fd weights)
    -> npz keyed for operators/s3fd_net."""
    from .s3fd_net import init_weights

    weights, unknown, mismatched = remap_state_dict(
        _torch_load(in_path), init_weights()
    )
    save_npz_weights(out_path, weights)
    return unknown, mismatched
