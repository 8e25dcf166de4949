"""Weights-parity harness (round 6): make M1/M3 numeric parity
against the reference's RELEASED weights executable the day a
checkpoint lands, instead of aspirational.

The numpy forwards (operators/s3fd_net.py, operators/talknet_forward.py)
are architecture-exact and state_dict-keyed, but this container has no
torch and no checkpoint blob (the reference fetches
``pretrain_TalkNet.model`` at demoTalkNet.py:58-61 and quotes the
mAP 92.3 band in FAQ.md:23), so end-to-end numeric parity cannot run
here. The workflow this module enables:

1. Off-sandbox, wherever torch + the released checkpoints live::

       python scripts/make_golden.py talknet pretrain_TalkNet.model \
           golden/ --reference /path/to/reference_repo
       python scripts/make_golden.py s3fd sfd_face.pth golden/ \
           --reference /path/to/reference_repo

   converts the checkpoint to the engine's npz weight format AND runs
   the REFERENCE torch model on this module's fixed seeded inputs,
   storing the torch activations as ``*_golden.npz``.
2. Drop the produced ``talknet.npz`` + ``talknet_golden.npz`` (and/or
   ``s3fd.npz`` + ``s3fd_golden.npz``) into ``$SPARK_GRAFT_WEIGHTS_DIR``
   (default ``<repo>/weights``).
3. ``tests/test_weights_parity.py`` stops skipping and asserts the
   numpy forwards reproduce the torch activations within float32
   round-trip tolerance.

``INPUTS_VERSION`` is stamped into every golden file; bumping the
seeded inputs without regenerating goldens fails loudly instead of
comparing apples to oranges.
"""

from __future__ import annotations

import numpy as np

# Bump whenever golden_inputs_* change shape/seed/content.
INPUTS_VERSION = 1

_TALKNET_T = 25  # frames (1 s at 25 fps); mfcc rows = 4 * T (100 Hz)
_S3FD_HW = (64, 96)  # small enough for a quick CPU forward, floor-pool shape


def golden_inputs_talknet() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (mfcc, frames) for the TalkNet forward: mfcc
    ``(4*T, 13)`` float64 ~ N(0, 1) scaled into a plausible MFCC range,
    frames ``(T, 112, 112)`` integer grayscale in [0, 256)."""
    rng = np.random.Generator(np.random.PCG64(20260814))
    mfcc = rng.standard_normal((4 * _TALKNET_T, 13)) * 8.0
    frames = rng.integers(0, 256, size=(_TALKNET_T, 112, 112)).astype(np.float64)
    return mfcc, frames


def golden_inputs_s3fd() -> np.ndarray:
    """Deterministic HWC uint8 image for the S3FD forward."""
    rng = np.random.Generator(np.random.PCG64(20260815))
    h, w = _S3FD_HW
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def _check_version(golden: dict, path: str) -> None:
    v = int(np.asarray(golden.get("inputs_version", -1)))
    if v != INPUTS_VERSION:
        raise ValueError(
            f"{path}: golden inputs_version {v} != harness "
            f"INPUTS_VERSION {INPUTS_VERSION}; regenerate with "
            "scripts/make_golden.py"
        )


def run_talknet_parity(weights_path: str, golden_path: str) -> dict[str, float]:
    """Run the numpy TalkNet forward with converted real weights on the
    seeded inputs and return max-abs diffs vs the stored torch
    activations (keys: ``scores``)."""
    from .checkpoint_convert import load_npz_weights
    from .talknet_forward import talknet_forward

    w = load_npz_weights(weights_path)
    with np.load(golden_path) as z:
        golden = {k: z[k] for k in z.files}
    _check_version(golden, golden_path)
    mfcc, frames = golden_inputs_talknet()
    scores = talknet_forward(w, mfcc, frames)
    return {
        "scores": float(
            np.max(np.abs(scores - np.asarray(golden["scores"], dtype=np.float64)))
        )
    }


def run_s3fd_parity(weights_path: str, golden_path: str) -> dict[str, float]:
    """Run the numpy S3FD forward with converted real weights on the
    seeded image and return max-abs diffs vs the stored torch heads
    (keys: ``loc``, ``conf``)."""
    from .checkpoint_convert import load_npz_weights
    from .s3fd_net import forward

    w = load_npz_weights(weights_path)
    with np.load(golden_path) as z:
        golden = {k: z[k] for k in z.files}
    _check_version(golden, golden_path)
    loc, conf, _fmaps = forward(w, golden_inputs_s3fd())
    return {
        "loc": float(np.max(np.abs(loc - np.asarray(golden["loc"], np.float64)))),
        "conf": float(np.max(np.abs(conf - np.asarray(golden["conf"], np.float64)))),
    }
