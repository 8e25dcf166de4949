"""Property + pinning tests for operators/s3fd_post.py — the pure-numpy
S3FD post-processing (priors, box decode, two-stage NMS).

Parity targets (fresh implementations, verified against the published
formulas, not copied): reference model/faceDetector/s3fd/box_utils.py
(nms_ 7-38, nms 60-126, Detect.forward 129-173, PriorBox.forward
176-217) and __init__.py:38-66 (detect_faces walk + final NMS).
"""

from __future__ import annotations

from itertools import product

import numpy as np
import pytest

from talknet_segmentation_batchprocessing_spark.operators.s3fd_post import (
    MIN_SIZES,
    STEPS,
    collect_detections,
    decode,
    detect_faces_from_heads,
    detect_post,
    encode,
    feature_map_sizes,
    nms_greedy,
    nms_topk,
    prior_boxes,
)


def reference_priorbox_loop(imh, imw, feature_maps, min_sizes=MIN_SIZES, steps=STEPS):
    """The reference PriorBox.forward per-cell loop (box_utils.py:194-211)
    re-stated with plain Python floats — the independent oracle the
    vectorized implementation must match bit-for-bit."""
    mean = []
    for k, (feath, featw) in enumerate(feature_maps):
        for i, j in product(range(feath), range(featw)):
            f_kw = imw / steps[k]
            f_kh = imh / steps[k]
            cx = (j + 0.5) / f_kw
            cy = (i + 0.5) / f_kh
            s_kw = min_sizes[k] / imw
            s_kh = min_sizes[k] / imh
            mean += [cx, cy, s_kw, s_kh]
    return np.asarray(mean, dtype=np.float64).reshape(-1, 4)


class TestPriors:
    def test_feature_map_sizes_are_ceil_of_stride(self):
        assert feature_map_sizes(100, 60) == [
            (25, 15), (13, 8), (7, 4), (4, 2), (2, 1), (1, 1)
        ]

    def test_matches_reference_loop_bitwise(self):
        imh, imw = 96, 64
        fmaps = feature_map_sizes(imh, imw)
        got = prior_boxes((imh, imw))
        want = reference_priorbox_loop(imh, imw, fmaps)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_prior_count_is_sum_of_grid_cells(self):
        imh, imw = 270, 480  # 0.25 * 1080p, the facedetScale=0.25 shape
        fmaps = feature_map_sizes(imh, imw)
        got = prior_boxes((imh, imw))
        assert got.shape == (sum(h * w for h, w in fmaps), 4)

    def test_clip_bounds_priors(self):
        out = prior_boxes((8, 8), clip=True)
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestDecode:
    def test_zero_offsets_recover_priors_as_corners(self):
        priors = np.array([[0.5, 0.5, 0.2, 0.4]])
        got = decode(np.zeros((1, 4)), priors)
        np.testing.assert_allclose(got, [[0.4, 0.3, 0.6, 0.7]], atol=1e-12)

    def test_decode_pinned_values(self):
        # By the formula (box_utils.py:54-58): cx = 0.5 + 1.0*0.1*0.2 = 0.52,
        # cy = 0.5 + (-1)*0.1*0.2 = 0.48, w = 0.2*exp(0.5*0.2) ≈ 0.221034,
        # h = 0.2*exp(-0.5*0.2) ≈ 0.180967.
        priors = np.array([[0.5, 0.5, 0.2, 0.2]])
        loc = np.array([[1.0, -1.0, 0.5, -0.5]])
        got = decode(loc, priors)
        w = 0.2 * np.exp(0.1)
        h = 0.2 * np.exp(-0.1)
        want = [[0.52 - w / 2, 0.48 - h / 2, 0.52 + w / 2, 0.48 + h / 2]]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(7)
        priors = prior_boxes((64, 64))
        n = priors.shape[0]
        # random valid corner boxes near their priors
        cxcy = priors[:, :2] + rng.uniform(-0.05, 0.05, (n, 2))
        wh = priors[:, 2:] * rng.uniform(0.5, 2.0, (n, 2))
        boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=1)
        back = decode(encode(boxes, priors), priors)
        np.testing.assert_allclose(back, boxes, atol=1e-9)


def _iou_matrix(boxes):
    x1, y1, x2, y2 = boxes.T
    area = (x2 - x1) * (y2 - y1)
    xx1 = np.maximum(x1[:, None], x1[None, :])
    yy1 = np.maximum(y1[:, None], y1[None, :])
    xx2 = np.minimum(x2[:, None], x2[None, :])
    yy2 = np.minimum(y2[:, None], y2[None, :])
    inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
    return inter / (area[:, None] + area[None, :] - inter)


def _random_dets(rng, n, lo=0.0, hi=100.0):
    x1 = rng.uniform(lo, hi - 5, n)
    y1 = rng.uniform(lo, hi - 5, n)
    w = rng.uniform(2, 40, n)
    h = rng.uniform(2, 40, n)
    scores = rng.permutation(n) / n + rng.uniform(0, 1e-6, n)  # distinct
    return np.stack([x1, y1, x1 + w, y1 + h, scores], axis=1)


class TestNms:
    def test_greedy_pinned(self):
        # b0 and b1 overlap heavily (IoU 0.6 > 0.4 -> b1 suppressed by b0);
        # b2 is disjoint; b3 overlaps b2 exactly (suppressed).
        dets = np.array([
            [0.0, 0.0, 10.0, 10.0, 0.9],
            [0.0, 0.0, 10.0, 8.0, 0.8],
            [50.0, 50.0, 60.0, 60.0, 0.7],
            [50.0, 50.0, 60.0, 60.0, 0.6],
        ])
        np.testing.assert_array_equal(nms_greedy(dets, 0.4), [0, 2])
        # permissive threshold: only the exact-duplicate b3 (IoU 1.0) drops
        np.testing.assert_array_equal(nms_greedy(dets, 0.95), [0, 1, 2])

    def test_greedy_empty(self):
        assert nms_greedy(np.empty((0, 5)), 0.1).size == 0

    def test_greedy_keep_set_properties(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            dets = _random_dets(rng, 60)
            thresh = rng.uniform(0.05, 0.6)
            keep = nms_greedy(dets, thresh)
            iou = _iou_matrix(dets[:, :4])
            scores = dets[:, 4]
            # kept boxes are mutually below-threshold: the higher-scoring
            # of any kept pair would have suppressed the lower otherwise
            for a in range(len(keep)):
                for b in range(a + 1, len(keep)):
                    assert iou[keep[a], keep[b]] <= thresh
            # every dropped box overlaps some higher-scoring kept box
            dropped = set(range(len(dets))) - set(keep.tolist())
            for d in dropped:
                assert any(
                    iou[d, k] > thresh and scores[k] > scores[d] for k in keep
                )

    def test_topk_matches_greedy_when_unconstrained(self):
        # With top_k >= n the ascending-sort walk (box_utils.py:60-126)
        # and py_cpu_nms (box_utils.py:7-38) visit candidates in the same
        # score-descending order; the keep SEQUENCE must coincide.
        rng = np.random.default_rng(23)
        for _ in range(20):
            dets = _random_dets(rng, 50)
            thresh = rng.uniform(0.1, 0.6)
            keep_g = nms_greedy(dets, thresh)
            keep_t, count = nms_topk(dets[:, :4], dets[:, 4], thresh, top_k=500)
            np.testing.assert_array_equal(keep_t[:count], keep_g)

    def test_topk_truncates_candidates(self):
        # 5 disjoint boxes; top_k=3 considers only the 3 best scores.
        boxes = np.array(
            [[i * 20.0, 0.0, i * 20.0 + 10.0, 10.0] for i in range(5)]
        )
        scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
        keep, count = nms_topk(boxes, scores, overlap=0.5, top_k=3)
        assert count == 3
        np.testing.assert_array_equal(keep[:count], [0, 1, 2])

    def test_topk_union_formula_keeps_exact_boundary(self):
        # IoU exactly == overlap is KEPT (`<=` rule, box_utils.py:124).
        boxes = np.array([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 15.0, 10.0]])
        scores = np.array([0.9, 0.8])
        iou = _iou_matrix(boxes)[0, 1]  # 50/150 = 1/3
        keep, count = nms_topk(boxes, scores, overlap=iou, top_k=10)
        assert count == 2

    def test_topk_empty(self):
        keep, count = nms_topk(np.empty((0, 4)), np.empty(0))
        assert count == 0


class TestDetectPost:
    def _heads_for_boxes(self, priors, box_idx, boxes, conf):
        """Craft (loc, conf) heads where `box_idx` priors regress exactly
        onto `boxes` with confidence `conf`; all else background."""
        n = priors.shape[0]
        loc = np.zeros((1, n, 4))
        conf_data = np.zeros((1, n, 2))
        conf_data[0, :, 0] = 1.0
        loc[0, box_idx] = encode(boxes, priors[box_idx])
        conf_data[0, box_idx, 1] = conf
        conf_data[0, box_idx, 0] = 1.0 - np.asarray(conf)
        return loc, conf_data

    def test_output_shape_and_padding(self):
        priors = prior_boxes((32, 32))
        loc = np.zeros((1, priors.shape[0], 4))
        conf = np.zeros((1, priors.shape[0], 2))
        conf[0, :, 0] = 1.0
        out = detect_post(loc, conf, priors, top_k=10)
        assert out.shape == (1, 2, 10, 5)
        assert np.all(out == 0)  # nothing above conf_thresh -> all pad

    def test_recovers_planted_boxes_in_score_order(self):
        priors = prior_boxes((64, 64))
        planted = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]])
        idx = [3, priors.shape[0] - 7]
        loc, conf = self._heads_for_boxes(priors, idx, planted, [0.7, 0.95])
        out = detect_post(loc, conf, priors, top_k=5)
        # class 1 rows, score-descending: the 0.95 box first
        np.testing.assert_allclose(out[0, 1, 0, 0], 0.95)
        np.testing.assert_allclose(out[0, 1, 0, 1:], planted[1], atol=1e-9)
        np.testing.assert_allclose(out[0, 1, 1, 0], 0.7)
        np.testing.assert_allclose(out[0, 1, 1, 1:], planted[0], atol=1e-9)
        assert np.all(out[0, 1, 2:] == 0)
        assert np.all(out[0, 0] == 0)  # background class never filled

    def test_collect_walk_stops_at_pad_and_scales(self):
        det = np.zeros((1, 2, 4, 5))
        det[0, 1, 0] = [0.9, 0.1, 0.2, 0.3, 0.4]
        det[0, 1, 1] = [0.85, 0.5, 0.5, 0.6, 0.6]
        # row 2 BELOW conf_th: walk must stop and never see row 3
        det[0, 1, 2] = [0.5, 0.0, 0.0, 1.0, 1.0]
        det[0, 1, 3] = [0.99, 0.0, 0.0, 1.0, 1.0]
        got = collect_detections(det, w=100, h=200, conf_th=0.8, final_nms=0.1)
        assert got.shape == (2, 5)
        np.testing.assert_allclose(got[0], [10.0, 40.0, 30.0, 80.0, 0.9])
        np.testing.assert_allclose(got[1], [50.0, 100.0, 60.0, 120.0, 0.85])

    def test_collect_empty(self):
        got = collect_detections(np.zeros((1, 2, 4, 5)), 100, 100)
        assert got.shape == (0, 5)

    def test_end_to_end_heads_to_pixels(self):
        h, w = 96, 128
        priors = prior_boxes((h, w))
        planted = np.array([[0.10, 0.20, 0.35, 0.55], [0.60, 0.10, 0.85, 0.45]])
        idx = [11, priors.shape[0] // 2]
        loc, conf = self._heads_for_boxes(priors, idx, planted, [0.9, 0.96])
        got = detect_faces_from_heads(loc, conf, (h, w), conf_th=0.8)
        assert got.shape == (2, 5)
        scale = np.array([w, h, w, h], dtype=float)
        np.testing.assert_allclose(got[0, :4], planted[1] * scale, atol=1e-6)
        np.testing.assert_allclose(got[0, 4], 0.96)
        np.testing.assert_allclose(got[1, :4], planted[0] * scale, atol=1e-6)
        np.testing.assert_allclose(got[1, 4], 0.9)

    def test_end_to_end_final_nms_dedups_across_duplicate_priors(self):
        # two priors regressed onto (nearly) the same box -> the final
        # cross-scale NMS at IoU 0.1 keeps only the higher score
        h, w = 64, 64
        priors = prior_boxes((h, w))
        planted = np.array([[0.3, 0.3, 0.6, 0.6], [0.301, 0.3, 0.601, 0.6]])
        loc, conf = self._heads_for_boxes(priors, [5, 300], planted, [0.9, 0.85])
        got = detect_faces_from_heads(loc, conf, (h, w), conf_th=0.8)
        assert got.shape == (1, 5)
        np.testing.assert_allclose(got[0, 4], 0.9)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
