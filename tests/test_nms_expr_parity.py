"""nms_expr (JVM fold, round-12) must emit exactly the rows of the
applyInPandas greedy kernel it replaced in w6_nms_greedy — including
tie handling, the top-k cap boundary, and degenerate (zero-area) boxes
whose NaN IoU must SUPPRESS (numpy's ``iou <= overlap`` mask semantics,
which ``forall(...iou <= tau)`` mirrors and ``not exists(iou > tau)``
would not)."""

from __future__ import annotations

import pandas as pd
import pytest

from talknet_segmentation_batchprocessing_spark.operators.nms import nms, nms_expr


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(["video_id", "frame_idx", "det_id"])
        .reset_index(drop=True)
        .astype({"det_id": "int64"})
    )


ROWS = [
    # frame 0: chain suppression — b suppressed by a, c overlaps b but
    # not a, so c survives (the fold-vs-loop equivalence case)
    ("v0", 0, 1, 0.0, 0.0, 10.0, 10.0, 0.9),
    ("v0", 0, 2, 1.0, 1.0, 11.0, 11.0, 0.8),
    ("v0", 0, 3, 8.5, 8.5, 18.0, 18.0, 0.7),
    # frame 1: conf tie broken by det_id
    ("v0", 1, 5, 0.0, 0.0, 10.0, 10.0, 0.5),
    ("v0", 1, 4, 0.5, 0.5, 10.5, 10.5, 0.5),
    # frame 2: disjoint boxes, all kept
    ("v1", 0, 1, 0.0, 0.0, 1.0, 1.0, 0.3),
    ("v1", 0, 2, 5.0, 5.0, 6.0, 6.0, 0.2),
    # frame 3: degenerate zero-area box against itself -> NaN IoU path
    ("v1", 1, 7, 2.0, 2.0, 2.0, 2.0, 0.9),
    ("v1", 1, 8, 2.0, 2.0, 2.0, 2.0, 0.8),
]
SCHEMA = (
    "video_id string, frame_idx int, det_id int, "
    "x1 double, y1 double, x2 double, y2 double, conf double"
)


@pytest.mark.parametrize("overlap,top_k", [(0.1, None), (0.3, 2), (0.3, 10)])
def test_nms_expr_matches_kernel(spark, overlap, top_k):
    dets = spark.createDataFrame(ROWS, SCHEMA)
    a = _canon(nms(dets, overlap=overlap, top_k=top_k))
    b = _canon(nms_expr(dets, overlap=overlap, top_k=top_k))
    pd.testing.assert_frame_equal(a, b)


def test_nms_expr_many_random_frames(spark):
    """Seeded bulk parity: hundreds of frames with colliding boxes."""
    import random

    rng = random.Random(12)
    rows = []
    for f in range(120):
        for d in range(rng.randint(1, 12)):
            x1 = rng.uniform(0, 40)
            y1 = rng.uniform(0, 40)
            rows.append(
                (
                    f"v{f % 3}",
                    f,
                    d,
                    x1,
                    y1,
                    x1 + rng.uniform(1, 30),
                    y1 + rng.uniform(1, 30),
                    round(rng.uniform(0, 1), 2),
                )
            )
    dets = spark.createDataFrame(rows, SCHEMA)
    a = _canon(nms(dets, overlap=0.3, top_k=10))
    b = _canon(nms_expr(dets, overlap=0.3, top_k=10))
    pd.testing.assert_frame_equal(a, b)


def test_nms_expr_plan_has_no_python_stage(spark):
    dets = spark.createDataFrame(ROWS, SCHEMA)
    plan = nms_expr(dets, overlap=0.3, top_k=10)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "EvalPython" not in plan
