"""M2: content-based scene detection over the frames table.

Reference: PySceneDetect ``ContentDetector`` with a fallback single
full-video scene when nothing is detected (demoTalkNet.py:93-110).
ContentDetector thresholds the mean absolute frame-to-frame content
delta; here the metric is mean |gray_t - gray_{t-1}| over (downsampled)
pixels — a sequential scan per video, so an ``applyInPandas`` kernel
per video_id, emitting the SCENES schema (end_frame exclusive).

The relational analog (change-point islands on a precomputed metric
column) is the oracle-checked ``m2_scene_change_islands`` query; this
kernel is the media-side producer of that metric.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SCENES_SCHEMA = "video_id string, scene_id int, start_frame int, end_frame int"


def _to_gray(buf: bytes, height: int, width: int) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.uint8)
    if height and width and len(a) >= height * width:
        return a[: height * width].reshape(height, width).astype(np.float64)
    return a.astype(np.float64)[None, :]


def detect_scenes_video(
    pdf: pd.DataFrame,
    threshold: float = 27.0,
    min_scene_len: int = 15,
) -> pd.DataFrame:
    """One video's frames -> scene list (ContentDetector semantics:
    a cut where the content delta exceeds ``threshold``, scenes at
    least ``min_scene_len`` frames; whole video when no cuts)."""
    video_id = pdf["video_id"].iloc[0]
    p = pdf.sort_values("frame_idx")
    frames = p["frame_idx"].to_numpy()
    cuts = []
    prev = None
    last_cut = frames[0] if len(frames) else 0
    for r in p.itertuples(index=False):
        img = _to_gray(r.image, getattr(r, "height", 0) or 0, getattr(r, "width", 0) or 0)
        if prev is not None and prev.shape == img.shape:
            delta = float(np.mean(np.abs(img - prev)))
            if delta > threshold and (r.frame_idx - last_cut) >= min_scene_len:
                cuts.append(int(r.frame_idx))
                last_cut = r.frame_idx
        prev = img
    bounds = [int(frames[0])] + cuts + [int(frames[-1]) + 1] if len(frames) else [0, 0]
    rows = [
        (video_id, i, bounds[i], bounds[i + 1])
        for i in range(len(bounds) - 1)
        if bounds[i + 1] > bounds[i]
    ]
    if not rows and len(frames):  # fallback single full-video scene
        rows = [(video_id, 0, int(frames[0]), int(frames[-1]) + 1)]
    return pd.DataFrame(rows, columns=["video_id", "scene_id", "start_frame", "end_frame"])


def detect_scenes(
    frames: DataFrame, threshold: float = 27.0, min_scene_len: int = 15
) -> DataFrame:
    """M2 entry point: frames(video_id, frame_idx, image[, height,
    width]) -> scenes, one kernel task per video."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(frames)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return detect_scenes_video(pdf, threshold, min_scene_len)

    return frames.groupBy("video_id").applyInPandas(fn, SCENES_SCHEMA)
