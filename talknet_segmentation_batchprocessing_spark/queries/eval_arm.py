"""Phase-5 eval arm (SURVEY.md §7): the reference's two evaluation
harnesses as single in-engine queries — no subprocess, no pandas.

- ``ava_map_eval``: GT-prediction uid join (J1) + bbox tolerance
  validation (J2/X16) + VOC average precision (A6)
  (utils/get_ava_active_speaker_performance.py end-to-end).
- ``columbia_f1_eval``: per-frame best-IoU spatial match with the
  one-sided IoU variant (J5/X1) + per-speaker ACC/F1 (A5)
  (demoTalkNet.py:372-437 end-to-end).

Synthetic shaping: lineitem linenumber 1 rows play groundtruth,
linenumber 2 rows play predictions, sharing l_orderkey as the frame/uid
key — the same construction as queries.joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geometry import iou_one_sided
from ..functions.rounding import stable_round
from ..operators.aggregates import average_precision, per_speaker_f1
from ..operators.windows import top_per_group
from ..plans.two_phase import parquet_rows
from ..registry import load, query

_AVA_ORACLE = """
WITH gt AS (
  -- (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem;
  -- aggregate to one row per uid so the join is validated-1:1 like the
  -- reference (script:105-108) and window ties stay deterministic
  SELECT l_orderkey AS uid, max(l_extendedprice) AS box,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS is_positive
  FROM lineitem WHERE l_linenumber = 1 GROUP BY l_orderkey
), pred AS (
  SELECT l_orderkey AS uid, max(l_extendedprice) AS box, max(l_quantity) AS score
  FROM lineitem WHERE l_linenumber = 2 GROUP BY l_orderkey
), joined AS (
  SELECT g.uid, g.is_positive, p.score,
         CASE WHEN abs(g.box - p.box) > 1e-9 THEN 1 ELSE 0 END AS box_mismatch
  FROM gt g JOIN pred p ON g.uid = p.uid
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, uid) AS rnk FROM joined
), cum AS (
  SELECT *,
         sum(is_positive) OVER (ORDER BY score DESC, uid ROWS UNBOUNDED PRECEDING) AS tp,
         sum(is_positive) OVER () AS pos
  FROM ranked
), pr AS (
  SELECT uid, score, box_mismatch, tp * 1.0 / rnk AS prec, tp * 1.0 / pos AS rec FROM cum
), sm AS (
  SELECT *,
         max(prec) OVER (ORDER BY score DESC, uid
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sprec,
         rec - coalesce(lag(rec) OVER (ORDER BY score DESC, uid), 0.0) AS dr
  FROM pr
)
SELECT floor((sum(dr * sprec)) * 1e6 + 0.5) / 1e6 AS ap,
       CAST(sum(box_mismatch) AS BIGINT) AS n_box_mismatch,
       count(*) AS n_scored
FROM sm
"""


@query(
    "ava_map_eval",
    oracle=_AVA_ORACLE,
    doc="Eval arm: AVA mAP harness in one query — J1 uid equi-join, J2 "
    "bbox |a-b|>1e-9 validation count (X16), A6 VOC AP window pipeline "
    "(utils/get_ava_active_speaker_performance.py:85-177); replaces the "
    "reference's per-epoch subprocess (talkNet.py:117-124)",
    tags=("J1", "J2", "A6", "X16", "flagship"),
)
def ava_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # aggregate to one row per uid — (orderkey, linenumber) duplicates
    # exist in the synthetic table; the reference requires the uid join
    # to be 1:1 (script:105-108)
    gt = (
        li.filter(F.col("l_linenumber") == 1)
        .groupBy(F.col("l_orderkey").alias("uid"))
        .agg(
            F.max("l_extendedprice").alias("gbox"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("is_positive"),
        )
    )
    pred = (
        li.filter(F.col("l_linenumber") == 2)
        .groupBy(F.col("l_orderkey").alias("uid"))
        .agg(
            F.max("l_extendedprice").alias("pbox"),
            F.max("l_quantity").alias("score"),
        )
    )
    joined = gt.join(pred, "uid").select(
        "uid",
        "is_positive",
        "score",
        (F.abs(F.col("gbox") - F.col("pbox")) > 1e-9).cast("int").alias("box_mismatch"),
    )
    # ONE linear plan: the validation counts ride the AP pipeline's
    # final ungrouped aggregate (box_mismatch is carried through the
    # window stages untouched), so the join is computed exactly once —
    # no crossJoin of 1-row frames, no persist, no eager count action.
    # n_upper: one row per distinct l_orderkey ≤ lineitem footer rows
    # (grouped rollup of a scan, 1:1-validated join).
    return average_precision(
        joined,
        "score",
        "is_positive",
        tiebreak_cols=("uid",),
        n_upper=parquet_rows(sf_dir, "lineitem"),
        extra_aggs=(
            F.sum("box_mismatch").cast("bigint").alias("n_box_mismatch"),
            F.count("*").alias("n_scored"),
        ),
    )


_COL_ORACLE = """
WITH gt AS (
  SELECT l_orderkey AS frame_id,
         CAST(l_orderkey % 5 AS VARCHAR) AS speaker_id,
         l_discount * 100 AS ax1, l_tax * 100 AS ay1,
         l_discount * 100 + l_quantity AS ax2, l_tax * 100 + l_quantity AS ay2,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS gt
  FROM lineitem WHERE l_linenumber = 1
), faces AS (
  SELECT l_orderkey AS frame_id, l_suppkey,
         l_discount * 100 AS bx1, l_tax * 100 AS by1,
         l_discount * 100 + l_quantity AS bx2, l_tax * 100 + l_quantity AS by2,
         l_quantity - 25.0 AS score
  FROM lineitem WHERE l_linenumber = 2
), pairs AS (
  SELECT g.frame_id, g.speaker_id, g.gt, f.l_suppkey, f.score,
         greatest(0, least(ax2, bx2) - greatest(ax1, bx1))
           * greatest(0, least(ay2, by2) - greatest(ay1, by1))
           / ((ax2 - ax1) * (ay2 - ay1)) AS iou1
  FROM gt g JOIN faces f ON g.frame_id = f.frame_id
), best AS (
  SELECT frame_id, speaker_id, gt, score FROM (
    SELECT *, row_number() OVER (PARTITION BY frame_id, speaker_id
                                 ORDER BY iou1 DESC, l_suppkey, score) AS rn
    FROM pairs WHERE iou1 > 0.5
  ) WHERE rn = 1
), scored AS (
  SELECT g.speaker_id,
         CASE WHEN coalesce(b.score, 0.0) > 0 THEN 1 ELSE 0 END AS pred,
         g.gt
  FROM gt g LEFT JOIN best b ON g.frame_id = b.frame_id AND g.speaker_id = b.speaker_id
)
SELECT speaker_id, count(*) AS n,
       CAST(sum(CASE WHEN pred = 1 AND gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN pred = 1 AND gt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN pred = 0 AND gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN pred = gt THEN 1 ELSE 0 END) AS BIGINT) AS correct,
       floor((sum(CASE WHEN pred = gt THEN 1 ELSE 0 END) / (1.0 * count(*))) * 1e6 + 0.5) / 1e6 AS accuracy,
       floor((CASE WHEN 2 * sum(CASE WHEN pred = 1 AND gt = 1 THEN 1 ELSE 0 END)
                       + sum(CASE WHEN pred = 1 AND gt = 0 THEN 1 ELSE 0 END)
                       + sum(CASE WHEN pred = 0 AND gt = 1 THEN 1 ELSE 0 END) > 0
             THEN 2.0 * sum(CASE WHEN pred = 1 AND gt = 1 THEN 1 ELSE 0 END)
                  / (2.0 * sum(CASE WHEN pred = 1 AND gt = 1 THEN 1 ELSE 0 END)
                     + sum(CASE WHEN pred = 1 AND gt = 0 THEN 1 ELSE 0 END)
                     + sum(CASE WHEN pred = 0 AND gt = 1 THEN 1 ELSE 0 END))
             ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS f1
FROM scored GROUP BY speaker_id
"""


@query(
    "columbia_f1_eval",
    oracle=_COL_ORACLE,
    doc="Eval arm: Columbia ASD harness in one query — one-sided IoU "
    "spatial match inter/area_gt > 0.5 (X1 evalCol variant, "
    "demoTalkNet.py:141-142,402-419), top-1 per (frame, speaker), "
    "missing->score 0, then per-speaker ACC/F1 (A5, "
    "demoTalkNet.py:425-437)",
    tags=("J5", "A5", "X1", "flagship"),
)
def columbia_f1_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    gt = li.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("frame_id"),
        (F.col("l_orderkey") % 5).cast("string").alias("speaker_id"),
        (F.col("l_discount") * 100).alias("ax1"),
        (F.col("l_tax") * 100).alias("ay1"),
        (F.col("l_discount") * 100 + F.col("l_quantity")).alias("ax2"),
        (F.col("l_tax") * 100 + F.col("l_quantity")).alias("ay2"),
        (F.col("l_returnflag") == "R").cast("int").alias("gt"),
    )
    faces = li.filter(F.col("l_linenumber") == 2).select(
        F.col("l_orderkey").alias("frame_id"),
        "l_suppkey",
        (F.col("l_discount") * 100).alias("bx1"),
        (F.col("l_tax") * 100).alias("by1"),
        (F.col("l_discount") * 100 + F.col("l_quantity")).alias("bx2"),
        (F.col("l_tax") * 100 + F.col("l_quantity")).alias("by2"),
        (F.col("l_quantity") - 25.0).alias("score"),
    )
    pairs = gt.join(faces, "frame_id").withColumn(
        "iou1", iou_one_sided("ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2")
    )
    best = top_per_group(
        pairs.filter(F.col("iou1") > 0.5),
        ["frame_id", "speaker_id"],
        # score ends the key: duplicate (orderkey, linenumber) rows can
        # tie on (iou1, suppkey) while carrying different scores
        [F.desc("iou1"), F.col("l_suppkey"), F.col("score")],
        k=1,
    ).select("frame_id", "speaker_id", "score")
    scored = (
        gt.select("frame_id", "speaker_id", "gt")
        .join(best, ["frame_id", "speaker_id"], "left")
        .select(
            "speaker_id",
            (F.coalesce(F.col("score"), F.lit(0.0))).alias("score"),
            "gt",
        )
    )
    return per_speaker_f1(scored, "speaker_id", "gt", "score")


@query(
    "x3_crop_geometry",
    oracle="""
SELECT l_orderkey, l_linenumber,
       -- (1.0 + 2.0*0.4) / (1.0 + 0.4), never literal 1.8 / 1.4: the
       -- literals are different doubles than the computed sums and
       -- floor() would diverge from the Spark-side crop_rect arithmetic
       CAST(floor(s * (1.0 + 2.0 * 0.4)) AS INTEGER) AS pad,
       CAST(floor(cy + floor(s * (1.0 + 2.0 * 0.4)) - s) AS INTEGER) AS row0,
       CAST(floor(cy + floor(s * (1.0 + 2.0 * 0.4)) + s * (1.0 + 2.0 * 0.4)) AS INTEGER) AS row1,
       CAST(floor(cx + floor(s * (1.0 + 2.0 * 0.4)) - s * (1.0 + 0.4)) AS INTEGER) AS col0,
       CAST(floor(cx + floor(s * (1.0 + 2.0 * 0.4)) + s * (1.0 + 0.4)) AS INTEGER) AS col1
FROM (
  SELECT l_orderkey, l_linenumber,
         (l_discount * 100 + (l_discount * 100 + l_quantity)) / 2 AS cx,
         (l_tax * 100 + (l_tax * 100 + l_quantity)) / 2 AS cy,
         greatest(l_quantity, l_quantity) / 2 AS s
  FROM lineitem
)
""",
    doc="X3 padded crop-window geometry (demoTalkNet.py:193-202): "
    "bsi=int(s*(1+2*cs)), rows [my-bs, my+bs*(1+2cs)), cols "
    "[mx-bs*(1+cs), mx+bs*(1+cs)) with cs=0.40 — the crop_rect "
    "operator's columns; pixel work stays in the image UDF",
    tags=("X3",),
)
def x3_crop_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geometry import box_center_size, crop_rect

    li = load(spark, sf_dir, "lineitem")
    x1 = F.col("l_discount") * 100
    y1 = F.col("l_tax") * 100
    x2 = x1 + F.col("l_quantity")
    y2 = y1 + F.col("l_quantity")
    cx, cy, s = box_center_size(x1, y1, x2, y2)
    rect = crop_rect(cx, cy, s, crop_scale=0.40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rect["pad"].alias("pad"),
        rect["row0"].alias("row0"),
        rect["row1"].alias("row1"),
        rect["col0"].alias("col0"),
        rect["col1"].alias("col1"),
    )


@query(
    "x15_softmax_argmax",
    oracle="""
SELECT l_orderkey, l_linenumber,
       floor((exp(l_discount) / (exp(l_discount) + exp(l_tax))) * 1e6 + 0.5) / 1e6 AS pred_score,
       CASE WHEN l_discount > l_tax THEN 1 ELSE 0 END AS pred_label
FROM lineitem
""",
    doc="X15 softmax class-1 score + argmax label (loss.py:14-24: "
    "predScore = softmax(x)[:,1], predLabel = argmax)",
    tags=("X15",),
)
def x15_softmax_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # two pseudo-logits; class-1 = l_discount
    e1 = F.exp(F.col("l_discount"))
    e0 = F.exp(F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        stable_round(e1 / (e1 + e0), 6).alias("pred_score"),
        (F.col("l_discount") > F.col("l_tax")).cast("int").alias("pred_label"),
    )
