"""Generate golden activations for the weights-parity harness.

Run OFF-SANDBOX, wherever torch + the reference repo + the released
checkpoints live (this container has none of the three)::

    python scripts/make_golden.py talknet pretrain_TalkNet.model out/ \
        --reference /path/to/reference_repo
    python scripts/make_golden.py s3fd sfd_face.pth out/ \
        --reference /path/to/reference_repo

For each model this (1) converts the torch checkpoint to the engine's
npz weight format (operators/checkpoint_convert.py) and (2) runs the
REFERENCE torch model on the fixed seeded inputs from
operators/parity.py, saving the torch activations as
``<model>_golden.npz``. Copy both files into
``$SPARK_GRAFT_WEIGHTS_DIR`` and ``tests/test_weights_parity.py``
asserts the numpy forwards reproduce them.

Reference call chain reproduced for TalkNet (demoTalkNet.py:255-270):
``forward_audio_frontend -> forward_visual_frontend ->
forward_cross_attention -> forward_audio_visual_backend ->
lossAV.forward(x, labels=None)`` giving per-frame speaking scores;
for S3FD (model/faceDetector/s3fd/nets.py): the raw ``(loc, conf)``
heads on the preprocessed image, conf softmaxed.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from talknet_segmentation_batchprocessing_spark.operators import parity  # noqa: E402


def _require_torch():
    try:
        import torch  # noqa: F401

        return torch
    except ImportError as e:  # pragma: no cover - generator is off-sandbox
        raise SystemExit(
            "make_golden.py needs torch; run it off-sandbox "
            "(see operators/parity.py docstring)"
        ) from e


def golden_talknet(checkpoint: str, outdir: str, reference: str) -> None:
    torch = _require_torch()
    sys.path.insert(0, reference)
    from talkNet import talkNet  # reference repo module

    from talknet_segmentation_batchprocessing_spark.operators.checkpoint_convert import (
        convert_talknet,
    )

    unknown, mismatched = convert_talknet(
        checkpoint, os.path.join(outdir, "talknet.npz")
    )
    if unknown or mismatched:
        print(f"convert_talknet: unknown={unknown} mismatched={mismatched}")

    s = talkNet()  # auto-selects device (talkNet.py:19-23)
    s.loadParameters(checkpoint)
    s.eval()
    mfcc, frames = parity.golden_inputs_talknet()
    with torch.no_grad():
        a = torch.FloatTensor(mfcc).unsqueeze(0).to(s.device)
        v = torch.FloatTensor(frames).unsqueeze(0).to(s.device)
        ea = s.model.forward_audio_frontend(a)
        ev = s.model.forward_visual_frontend(v)
        ea, ev = s.model.forward_cross_attention(ea, ev)
        out = s.model.forward_audio_visual_backend(ea, ev)
        scores = s.lossAV.forward(out, None)
    np.savez(
        os.path.join(outdir, "talknet_golden.npz"),
        scores=np.asarray(scores, dtype=np.float64).reshape(-1),
        inputs_version=parity.INPUTS_VERSION,
    )
    print("wrote talknet.npz + talknet_golden.npz")


def golden_s3fd(checkpoint: str, outdir: str, reference: str) -> None:
    torch = _require_torch()
    sys.path.insert(0, reference)
    from model.faceDetector.s3fd.nets import S3FDNet  # reference repo module

    from talknet_segmentation_batchprocessing_spark.operators.checkpoint_convert import (
        convert_s3fd,
    )
    from talknet_segmentation_batchprocessing_spark.operators.s3fd_net import preprocess

    convert_s3fd(checkpoint, os.path.join(outdir, "s3fd.npz"))

    net = S3FDNet()
    net.load_state_dict(torch.load(checkpoint, map_location="cpu"))
    net.eval()
    img = parity.golden_inputs_s3fd()
    with torch.no_grad():
        x = torch.FloatTensor(preprocess(img))
        loc, conf = net(x)[:2]
    np.savez(
        os.path.join(outdir, "s3fd_golden.npz"),
        loc=np.asarray(loc, dtype=np.float64),
        conf=np.asarray(conf, dtype=np.float64),
        inputs_version=parity.INPUTS_VERSION,
    )
    print("wrote s3fd.npz + s3fd_golden.npz")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["talknet", "s3fd"])
    p.add_argument("checkpoint")
    p.add_argument("outdir")
    p.add_argument("--reference", required=True, help="path to the reference repo")
    a = p.parse_args()
    os.makedirs(a.outdir, exist_ok=True)
    (golden_talknet if a.model == "talknet" else golden_s3fd)(
        a.checkpoint, a.outdir, a.reference
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
