"""M1: S3FD post-processing — priors, box decode, two-stage NMS — as
pure numpy, semantically matching the reference implementation
(model/faceDetector/s3fd/box_utils.py:41-217 and __init__.py:32-66)
without torch. The convolutional trunk (nets.py:28-174) is real numpy
too since round 3 (operators/s3fd_net.py — VGG16 + dilated fc6/fc7 +
L2Norm + extras + maxout heads); everything after the network's
(loc, conf) heads is real and property-tested here.

Pipeline (reference __init__.py:detect_faces):

1. ``prior_boxes``        — anchor grid per feature map (PriorBox.forward)
2. ``decode``             — center-offset regression -> corner boxes
3. ``detect_post``        — per-class conf mask + per-image sorted NMS
                            (Detect.forward, box_utils.py:142-173)
4. ``collect_detections`` — conf_th walk + pixel scaling + final greedy
                            cross-scale NMS at IoU 0.1 (__init__.py:52-64)

In the engine these run inside the Arrow batch of ``detect_faces``
(operators/inference.py) — one numpy pass per frame, no torch, no
Python-per-prior loops beyond the sequential NMS the algorithm demands.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

VARIANCES = (0.1, 0.2)
MIN_SIZES = (16, 32, 64, 128, 256, 512)
STEPS = (4, 8, 16, 32, 64, 128)


def feature_map_sizes(imh: int, imw: int, steps: Sequence[int] = STEPS) -> list[tuple[int, int]]:
    """S3FD's detection heads stride the input by ``steps``; each map is
    ceil(side/step) cells (nets.py conv strides)."""
    return [(int(np.ceil(imh / s)), int(np.ceil(imw / s))) for s in steps]


def prior_boxes(
    input_size: tuple[int, int],
    feature_maps: Sequence[tuple[int, int]] | None = None,
    min_sizes: Sequence[int] = MIN_SIZES,
    steps: Sequence[int] = STEPS,
    clip: bool = False,
) -> np.ndarray:
    """Anchor priors in center-offset form, one per feature-map cell
    (box_utils.py:176-217 PriorBox.forward): center ``(j+0.5)/f_kw``
    normalized to [0,1], size ``min_size/image_side``.

    Vectorized over the cell grid — the reference's per-cell Python
    ``product`` loop costs ~40 ms per frame at 4800 priors; meshgrid is
    ~100x cheaper and bit-identical.
    """
    imh, imw = input_size
    if feature_maps is None:
        feature_maps = feature_map_sizes(imh, imw, steps)
    chunks = []
    for k, (feath, featw) in enumerate(feature_maps):
        f_kw = imw / steps[k]
        f_kh = imh / steps[k]
        jj, ii = np.meshgrid(np.arange(featw), np.arange(feath))  # row-major (i,j)
        cx = (jj + 0.5) / f_kw
        cy = (ii + 0.5) / f_kh
        s_kw = min_sizes[k] / imw
        s_kh = min_sizes[k] / imh
        chunk = np.stack(
            [cx.ravel(), cy.ravel(), np.full(cx.size, s_kw), np.full(cx.size, s_kh)],
            axis=1,
        )
        chunks.append(chunk)
    out = np.concatenate(chunks, axis=0)
    if clip:
        out = np.clip(out, 0.0, 1.0)
    return out


def encode(boxes: np.ndarray, priors: np.ndarray, variances: Sequence[float] = VARIANCES) -> np.ndarray:
    """Inverse of ``decode`` (the training-time encoding the reference
    alludes to in box_utils.py:42-44) — used by tests to verify decode
    is its exact inverse."""
    cxcy = (boxes[:, :2] + boxes[:, 2:]) / 2
    wh = boxes[:, 2:] - boxes[:, :2]
    g_cxcy = (cxcy - priors[:, :2]) / (variances[0] * priors[:, 2:])
    g_wh = np.log(wh / priors[:, 2:]) / variances[1]
    return np.concatenate([g_cxcy, g_wh], axis=1)


def decode(loc: np.ndarray, priors: np.ndarray, variances: Sequence[float] = VARIANCES) -> np.ndarray:
    """Regression offsets -> corner-form boxes (box_utils.py:41-59)."""
    boxes = np.concatenate(
        (
            priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
        ),
        axis=1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def nms_topk(
    boxes: np.ndarray, scores: np.ndarray, overlap: float = 0.5, top_k: int = 200
) -> tuple[np.ndarray, int]:
    """Detector-internal NMS (box_utils.py:62-126): ascending score
    sort, keep the top_k candidates, then repeatedly take the highest
    remaining score and drop candidates with IoU > overlap — note the
    reference's union formula ``(rem_areas - inter) + area[i]`` and
    ``IoU <= overlap`` keep-rule, both preserved exactly.

    Returns (keep, count): ``keep[:count]`` are indices into ``boxes``.
    """
    keep = np.zeros(scores.shape[0], dtype=np.int64)
    if boxes.size == 0:
        return keep, 0
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    idx = np.argsort(scores, kind="stable")  # ascending, ties by index
    idx = idx[-top_k:]
    count = 0
    while idx.size > 0:
        i = idx[-1]
        keep[count] = i
        count += 1
        if idx.size == 1:
            break
        idx = idx[:-1]
        xx1 = np.maximum(x1[idx], x1[i])
        yy1 = np.maximum(y1[idx], y1[i])
        xx2 = np.minimum(x2[idx], x2[i])
        yy2 = np.minimum(y2[idx], y2[i])
        w = np.clip(xx2 - xx1, 0.0, None)
        h = np.clip(yy2 - yy1, 0.0, None)
        inter = w * h
        union = (area[idx] - inter) + area[i]
        iou = inter / union
        idx = idx[iou <= overlap]
    return keep, count


def nms_greedy(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Cross-scale greedy NMS over (x1,y1,x2,y2,score) rows
    (box_utils.py:7-38 ``nms_``): classic py_cpu_nms with
    ``ovr <= thresh`` survivors. Returns kept row indices in
    score-descending order."""
    if dets.size == 0:
        return np.empty(0, dtype=np.int64)
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort(kind="stable")[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1)
        h = np.maximum(0.0, yy2 - yy1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return np.asarray(keep, dtype=np.int64)


def detect_post(
    loc_data: np.ndarray,
    conf_data: np.ndarray,
    prior_data: np.ndarray,
    num_classes: int = 2,
    top_k: int = 750,
    nms_thresh: float = 0.3,
    conf_thresh: float = 0.05,
    variance: Sequence[float] = VARIANCES,
    nms_top_k: int = 5000,
) -> np.ndarray:
    """Detect.forward (box_utils.py:129-173): decode every prior, then
    per image and per non-background class: confidence mask, sorted NMS,
    emit (score, x1, y1, x2, y2) padded to ``top_k`` rows.

    loc_data: (num, priors, 4); conf_data: (num, priors, classes) or
    (num, priors*classes); prior_data: (priors, 4).
    """
    num = loc_data.shape[0]
    num_priors = prior_data.shape[0]
    conf_preds = conf_data.reshape(num, num_priors, num_classes).transpose(0, 2, 1)
    output = np.zeros((num, num_classes, top_k, 5))
    for i in range(num):
        boxes_all = decode(loc_data[i].reshape(-1, 4), prior_data, variance)
        for cl in range(1, num_classes):
            c_mask = conf_preds[i, cl] > conf_thresh
            scores = conf_preds[i, cl][c_mask]
            if scores.size == 0:
                continue
            boxes = boxes_all[c_mask]
            ids, count = nms_topk(boxes, scores, nms_thresh, nms_top_k)
            count = min(count, top_k)
            sel = ids[:count]
            output[i, cl, :count] = np.concatenate(
                (scores[sel, None], boxes[sel]), axis=1
            )
    return output


def collect_detections(
    detections: np.ndarray,
    w: int,
    h: int,
    conf_th: float = 0.8,
    final_nms: float = 0.1,
) -> np.ndarray:
    """The driver loop of S3FD.detect_faces (__init__.py:52-64): walk
    each class's ranked rows while score > conf_th (rows are NMS-output
    order, score-descending, zero-padded — the walk stops at the pad),
    scale normalized corners to pixels, then a final greedy NMS at IoU
    0.1 across scales/classes. Returns (n, 5) [x1,y1,x2,y2,score]."""
    scale = np.array([w, h, w, h], dtype=np.float64)
    rows = []
    for i in range(detections.shape[1]):
        j = 0
        while j < detections.shape[2] and detections[0, i, j, 0] > conf_th:
            score = detections[0, i, j, 0]
            pt = detections[0, i, j, 1:] * scale
            rows.append((pt[0], pt[1], pt[2], pt[3], score))
            j += 1
    bboxes = np.array(rows, dtype=np.float64).reshape(-1, 5)
    keep = nms_greedy(bboxes, final_nms)
    return bboxes[keep]


def detect_faces_from_heads(
    loc_data: np.ndarray,
    conf_data: np.ndarray,
    input_size: tuple[int, int],
    conf_th: float = 0.8,
    feature_maps: Sequence[tuple[int, int]] | None = None,
    **detect_kwargs,
) -> np.ndarray:
    """End-to-end post-processing: network heads -> pixel-space boxes.
    ``input_size`` is (h, w) of the frame fed to the net (scales=[1]
    path of __init__.py:38-64). A real conv forward passes the ACTUAL
    head grid sizes as ``feature_maps`` (nets.py:155-159) — torch floor
    pooling diverges from ceil(side/step) on sizes not divisible by
    128, and the prior count must follow the net."""
    h, w = input_size
    priors = prior_boxes((h, w), feature_maps=feature_maps)
    det = detect_post(loc_data, conf_data, priors, **detect_kwargs)
    return collect_detections(det, w, h, conf_th=conf_th)
