"""Visualization overlay sink (demoTalkNet.py:344-371): numpy paint
kernel pinned against the cv2.rectangle semantics it replaces, the
+/-2-frame smoothing quirk (upper bound len-1 — last element excluded
from tail windows), and the distributed mapInPandas pass end-to-end on
a vanilla frames/faces pair."""

from __future__ import annotations

import numpy as np
import pytest

from talknet_segmentation_batchprocessing_spark.sources.overlay_sink import (
    face_color,
    overlay_frames,
    paint_box,
    paint_overlay,
    smooth_scores,
    write_overlay_video,
)


def test_smooth_scores_reference_formula():
    s = np.arange(10, dtype=float)
    got = smooth_scores(s)
    for i in range(10):
        lo, hi = max(i - 2, 0), min(i + 3, 9)
        np.testing.assert_allclose(got[i], s[lo:hi].mean())
    # tail quirk: the last element NEVER contributes — even to itself
    assert got[9] == s[7:9].mean() != s[7:10].mean()


def test_smooth_scores_len1_is_nan_like_reference():
    # numpy.mean(score[0:0]) in the reference -> nan; nan >= 0 is
    # False so the face paints red
    out = smooth_scores(np.array([5.0]))
    assert np.isnan(out[0])
    assert face_color(out[0]) == (0, 0, 255)


def test_face_color_sign_rule():
    assert face_color(0.0) == (0, 255, 0)  # speaking: green
    assert face_color(3.2) == (0, 255, 0)
    assert face_color(-0.1) == (0, 0, 255)  # silent: red


def test_paint_box_border_band_and_interior_untouched():
    img = np.zeros((60, 60, 3), dtype=np.uint8)
    paint_box(img, x=30, y=30, s=15, score=1.0)
    # center of the box interior stays untouched
    assert (img[30, 30] == 0).all()
    # the box edge line itself is painted green
    assert tuple(img[15, 30]) == (0, 255, 0)
    # band extends ~thickness/2 outward and inward of the edge
    assert tuple(img[15 - 4, 30]) == (0, 255, 0)
    assert tuple(img[15 + 4, 30]) == (0, 255, 0)
    # well inside (past the inner band) untouched
    assert (img[25, 30] == 0).all()


def test_paint_box_clips_at_frame_edges():
    img = np.zeros((40, 40, 3), dtype=np.uint8)
    # box centered near the corner — cv2 clips silently, so must we
    paint_box(img, x=2, y=2, s=10, score=-1.0)
    # the visible part of the right edge line (x=12) is painted; the
    # inner hole (which covers (0,0) for this mostly-off-frame box)
    # stays black — identical to cv2's silent clip
    assert tuple(img[0, 12]) == (0, 0, 255)
    assert (img[0, 0] == 0).all()
    # fully off-frame box is a no-op
    img2 = np.zeros((40, 40, 3), dtype=np.uint8)
    paint_box(img2, x=-200, y=-200, s=10, score=1.0)
    assert img2.sum() == 0


def test_paint_overlay_deterministic():
    img = np.full((50, 50, 3), 127, dtype=np.uint8)
    faces = [{"x": 25, "y": 25, "s": 10, "score": 1.0}]
    a, _ = paint_overlay(img.copy(), faces)
    b, _ = paint_overlay(img.copy(), faces)
    np.testing.assert_array_equal(a, b)


def test_overlay_frames_end_to_end(spark, tmp_path):
    frames = spark.createDataFrame(
        [("v1", i, None) for i in range(6)] + [("v2", 0, None)],
        "video_id string, frame_idx bigint, image binary",
    )
    faces = spark.createDataFrame(
        [
            ("v1", 0, 0, 20.0, 20.0, 8.0, 1.5),
            ("v1", 0, 1, 40.0, 40.0, 6.0, -0.5),
            ("v1", 3, 0, 22.0, 20.0, 8.0, 2.0),
        ],
        "video_id string, frame_idx bigint, track_id bigint, "
        "x double, y double, s double, score_smooth double",
    )
    m = overlay_frames(frames, faces, height=64, width=64)
    rows = {(r.video_id, r.frame_idx): r for r in m.collect()}
    assert len(rows) == 7
    assert rows[("v1", 0)].n_faces == 2
    assert rows[("v1", 3)].n_faces == 1
    assert rows[("v1", 1)].n_faces == 0
    # faceless frames of the same synth size hash identically; painted
    # frames differ from them and from each other
    assert rows[("v1", 1)].image_sha256 == rows[("v2", 0)].image_sha256
    assert rows[("v1", 0)].image_sha256 != rows[("v1", 1)].image_sha256
    assert rows[("v1", 0)].image_sha256 != rows[("v1", 3)].image_sha256
    # deterministic across runs
    m2 = overlay_frames(frames, faces, height=64, width=64)
    assert {(r.video_id, r.frame_idx): r.image_sha256 for r in m2.collect()} == {
        k: v.image_sha256 for k, v in rows.items()
    }

    out = str(tmp_path / "overlay_manifest")
    write_overlay_video(m, out)
    back = spark.read.parquet(out)
    assert back.count() == 7


def test_overlay_matches_cv2_rectangle_if_available():
    cv2 = pytest.importorskip("cv2")
    img_np = np.zeros((80, 80, 3), dtype=np.uint8)
    paint_box(img_np, x=40, y=40, s=20, score=1.0)
    img_cv = np.zeros((80, 80, 3), dtype=np.uint8)
    cv2.rectangle(img_cv, (20, 20), (60, 60), (0, 255, 0), 10)
    assert (img_np == img_cv).mean() > 0.99
