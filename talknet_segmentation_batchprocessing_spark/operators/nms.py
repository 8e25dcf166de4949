"""W6: greedy non-maximum suppression — sequential per frame
(model/faceDetector/s3fd/box_utils.py:7-38: sort by conf desc, keep the
best box, drop overlaps with IoU > threshold, repeat).

Spark mapping: the candidate cap (top_k per frame) is relational
(`row_number() <= k`, see queries.windows.w6_topk_candidates); the
suppression loop itself runs in ``applyInPandas`` per
``(video_id, frame_idx)`` — small groups, embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

NMS_SCHEMA = (
    "video_id string, frame_idx int, det_id int, "
    "x1 double, y1 double, x2 double, y2 double, conf double"
)


def nms_frame(pdf: pd.DataFrame, overlap: float = 0.1) -> pd.DataFrame:
    """Greedy NMS for one frame's boxes (box_utils.py:7-38 semantics:
    keep highest-conf box, suppress boxes with IoU > overlap, repeat;
    default overlap 0.1 as in visualization NMS; detector-internal
    variant uses 0.3)."""
    if pdf.empty:
        return pdf.iloc[0:0]
    p = pdf.sort_values(["conf", "det_id"], ascending=[False, True]).reset_index(drop=True)
    boxes = p[["x1", "y1", "x2", "y2"]].to_numpy(dtype=float)
    alive = np.ones(len(p), dtype=bool)
    keep: list[int] = []
    for i in range(len(p)):
        if not alive[i]:
            continue
        keep.append(i)
        xa = np.maximum(boxes[i, 0], boxes[:, 0])
        ya = np.maximum(boxes[i, 1], boxes[:, 1])
        xb = np.minimum(boxes[i, 2], boxes[:, 2])
        yb = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(0.0, xb - xa) * np.maximum(0.0, yb - ya)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter)
        alive &= iou <= overlap
        alive[i] = False
    return p.iloc[keep][["video_id", "frame_idx", "det_id", "x1", "y1", "x2", "y2", "conf"]]


def nms(detections: DataFrame, overlap: float = 0.1, top_k: int | None = None) -> DataFrame:
    """W6 entry point. Optional relational pre-cap: keep only the top_k
    highest-conf candidates per frame BEFORE the Python kernel (the
    detector does the same with top_k=750 of 5000 candidates,
    box_utils.py:129-140) — this bounds every task's work.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..deploy import ensure_worker_imports

    ensure_worker_imports(detections)

    if top_k is not None:
        w = Window.partitionBy("video_id", "frame_idx").orderBy(F.desc("conf"), "det_id")
        detections = (
            detections.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_k)
            .drop("_rn")
        )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return nms_frame(pdf, overlap)

    return detections.groupBy("video_id", "frame_idx").applyInPandas(fn, NMS_SCHEMA)
