#!/usr/bin/env python
"""Convert a real torch checkpoint to the engine's npz weight format.

Usage:
    python scripts/convert_checkpoint.py talknet pretrain_TalkNet.model talknet.npz
    python scripts/convert_checkpoint.py s3fd sfd_face.pth s3fd.npz

Requires torch only at conversion time (the engine itself never does):
convert once wherever torch lives, then ship the .npz — the numpy
forwards (operators/talknet_forward, operators/s3fd_net) consume it via
checkpoint_convert.load_npz_weights + inference.broadcast_weights.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from talknet_segmentation_batchprocessing_spark.operators import checkpoint_convert as cc  # noqa: E402


def main() -> int:
    if len(sys.argv) != 4 or sys.argv[1] not in ("talknet", "s3fd"):
        print(__doc__)
        return 2
    kind, src, dst = sys.argv[1:]
    fn = cc.convert_talknet if kind == "talknet" else cc.convert_s3fd
    unknown, mismatched = fn(src, dst)
    for k in unknown:
        print(f"{k} is not in the model.")
    for k in mismatched:
        print(f"Wrong parameter length: {k}")
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
