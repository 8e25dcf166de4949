"""operators/featurize.py unit tests: per-track MFCC slicing across
audio chunk boundaries, wrap-pad tails, and the face-crop join arm."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _tracks(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "track_id", "frame_idx"])
    )


def test_track_mfcc_spans_chunk_boundary(spark):
    from talknet_segmentation_batchprocessing_spark.operators.featurize import (
        track_mfcc_features,
    )

    rng = np.random.default_rng(5)
    sr = 16000
    # two 1-second chunks; a track spanning frames 20..30 crosses the
    # 1 s boundary (frame 25)
    audio = spark.createDataFrame(
        pd.DataFrame(
            {
                "video_id": ["v", "v"],
                "chunk_idx": [0, 1],
                "sr": [sr, sr],
                "samples": [
                    rng.integers(-1000, 1000, sr, dtype=np.int16),
                    rng.integers(-1000, 1000, sr, dtype=np.int16),
                ],
            }
        )
    )
    tracks = _tracks(spark, [("v", 0, f) for f in range(20, 31)])
    out = track_mfcc_features(tracks, audio).toPandas()
    assert len(out) == 11
    assert sorted(out.frame_idx) == list(range(20, 31))
    assert all(len(m) == 52 for m in out.mfcc)
    # deterministic
    out2 = track_mfcc_features(tracks, audio).toPandas()
    a = out.sort_values("frame_idx").reset_index(drop=True)
    b = out2.sort_values("frame_idx").reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a.mfcc, b.mfcc))


def test_track_mfcc_wrap_pads_short_tail(spark):
    from talknet_segmentation_batchprocessing_spark.operators.featurize import (
        track_mfcc_features,
    )

    sr = 16000
    # only 0.2 s of audio but the track runs to frame 24 (~1 s):
    # the MFCC rows wrap-pad (X7) instead of running out
    audio = spark.createDataFrame(
        pd.DataFrame(
            {
                "video_id": ["v"],
                "chunk_idx": [0],
                "sr": [sr],
                "samples": [np.arange(3200, dtype=np.int16)],
            }
        )
    )
    tracks = _tracks(spark, [("v", 3, f) for f in range(0, 25)])
    out = track_mfcc_features(tracks, audio).toPandas()
    assert len(out) == 25
    assert all(len(m) == 52 and np.isfinite(m).all() for m in out.mfcc)


def test_track_faces_features_joins_and_crops(spark):
    from talknet_segmentation_batchprocessing_spark.operators.featurize import (
        track_faces_features,
    )

    rng = np.random.default_rng(6)
    frames = spark.createDataFrame(
        pd.DataFrame(
            {
                "video_id": ["v"] * 4,
                "frame_idx": [0, 1, 2, 3],
                "image": [
                    rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
                    for _ in range(4)
                ],
            }
        )
    )
    # two tracks sharing frame 1
    tracks = _tracks(spark, [("v", 0, 0), ("v", 0, 1), ("v", 1, 1), ("v", 1, 2)])
    out = track_faces_features(tracks, frames).toPandas()
    assert len(out) == 4
    assert all(len(f) == 112 * 112 for f in out.face)
    # the two tracks see the SAME crop for the shared frame
    shared = out[out.frame_idx == 1]
    assert len(shared) == 2
    np.testing.assert_array_equal(shared.face.iloc[0], shared.face.iloc[1])
