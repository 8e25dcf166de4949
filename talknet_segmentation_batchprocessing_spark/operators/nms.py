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


def nms_expr(
    detections: DataFrame, overlap: float = 0.1, top_k: int | None = None
) -> DataFrame:
    """W6 greedy NMS as a pure-JVM fold — same rows as :func:`nms`.

    Round-12 optimization (guide §4.1): ``groupBy().applyInPandas``
    ships every frame's boxes to a Python worker and pays pandas
    per-GROUP overhead on thousands of tiny frames; the greedy loop
    over a conf-sorted candidate list is exactly an ``aggregate()``
    fold (keep a candidate iff every already-kept box has IoU <=
    overlap — the standard equivalence with suppress-and-advance,
    since only KEPT boxes ever suppress). One collect_list aggregation
    replaces the top-k window AND the applyInPandas exchange, and no
    Python boundary remains in the plan.

    Exactness contract (pinned by tests/test_nms_expr_parity.py):

    - sort: array_sort comparator reproduces the kernel's
      (conf DESC, det_id ASC); the top-k cap is slice() of that order,
      identical to the row_number window the kernel path used.
    - IoU: same IEEE ops in the kernel's order —
      inter = max(0, min(x2) - max(x1)) * max(0, min(y2) - max(y1)),
      denominator (area_kept + area_cand) - inter.
    - suppression: keep iff forall(kept, iou <= overlap) — NOT
      "not exists(iou > overlap)". A degenerate zero-area pair makes
      the division 0/0: numpy yields NaN (mask False -> suppressed),
      DuckDB yields NULL (list_filter drops -> suppressed); here
      try_divide yields NULL (plain / throws under Spark 4 ANSI),
      forall goes NULL, and the CASE's ELSE suppresses — all three
      engines agree on suppression.
    - ``conf`` must be non-NULL and non-NaN (ADVICE r12): the sort
      comparator's CASE branches all fail on NaN/NULL conf, so such
      boxes would interleave by det_id where the pandas kernel sorts
      NaN conf LAST — the parity contract is only defined on real
      confidences. Every in-repo caller computes conf (w6_nms_greedy,
      the media pipeline), and the S3FD post-processing that feeds
      this operator clamps scores to [0, 1]; callers with external
      detections must filter NULL/NaN conf first.
    """
    from pyspark.sql import functions as F

    box_t = (
        "struct<x1: double, y1: double, x2: double, y2: double,"
        " conf: double, det_id: int>"
    )
    sort_cmp = (
        "(l, r) -> CASE WHEN l.conf > r.conf THEN -1 "
        "WHEN l.conf < r.conf THEN 1 "
        "WHEN l.det_id < r.det_id THEN -1 "
        "WHEN l.det_id > r.det_id THEN 1 ELSE 0 END"
    )
    cap = f"slice(_sorted, 1, {int(top_k)})" if top_k is not None else "_sorted"
    iou = (
        "try_divide("
        "(greatest(0.0D, least(k.x2, b.x2) - greatest(k.x1, b.x1))"
        " * greatest(0.0D, least(k.y2, b.y2) - greatest(k.y1, b.y1))), "
        "(((k.x2 - k.x1) * (k.y2 - k.y1)"
        " + (b.x2 - b.x1) * (b.y2 - b.y1))"
        " - (greatest(0.0D, least(k.x2, b.x2) - greatest(k.x1, b.x1))"
        " * greatest(0.0D, least(k.y2, b.y2) - greatest(k.y1, b.y1)))))"
    )
    kept = (
        f"aggregate({cap}, cast(array() as array<{box_t}>), "
        f"(acc, b) -> CASE WHEN forall(acc, k -> {iou} <= {float(overlap)!r}D) "
        "THEN array_append(acc, b) ELSE acc END)"
    )
    grouped = detections.groupBy("video_id", "frame_idx").agg(
        F.expr(
            "array_sort(collect_list(struct(x1, y1, x2, y2, conf, det_id)), "
            f"{sort_cmp})"
        ).alias("_sorted")
    )
    return (
        grouped.select(
            "video_id", "frame_idx", F.explode(F.expr(kept)).alias("_b")
        )
        .select(
            "video_id",
            "frame_idx",
            F.col("_b.det_id").alias("det_id"),
            F.col("_b.x1").alias("x1"),
            F.col("_b.y1").alias("y1"),
            F.col("_b.x2").alias("x2"),
            F.col("_b.y2").alias("y2"),
            F.col("_b.conf").alias("conf"),
        )
    )
