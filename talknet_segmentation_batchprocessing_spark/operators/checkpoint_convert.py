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


def _torch_load(path: str) -> Mapping[str, object]:
    try:
        import torch  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - torch absent in CI image
        raise ImportError(
            "converting a torch checkpoint requires torch; install it or "
            "convert on a machine that has it, then ship the .npz"
        ) from e
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
