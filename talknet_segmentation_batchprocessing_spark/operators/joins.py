"""Join operators (SURVEY.md §2.3).

Scale posture: Catalyst picks the physical join; we only force
``broadcast`` where one side is a dimension (the reference's merges are
all tiny-side pandas merges). The spatial/theta joins (J5) are
frame-equi-joins first — the non-equi IoU predicate applies AFTER the
equi condition, so they execute as hash joins with a residual filter,
never as cartesian products.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import iou, iou_one_sided


def merge_groundtruth_predictions(
    gt: DataFrame,
    pred: DataFrame,
    uid_cols: Sequence[str] = ("frame_timestamp", "entity_id"),
) -> DataFrame:
    """J1: 1:1 equi-join of groundtruth and predictions on the synthetic
    ``uid = concat(frame_timestamp, ':', entity_id)`` key
    (utils/get_ava_active_speaker_performance.py:85,117-124).

    Columns are suffixed ``_groundtruth`` / ``_prediction`` like the
    pandas merge. 1:1-ness is validated by :func:`validate_one_to_one`.
    """
    mk = lambda df: df.withColumn(  # noqa: E731
        "uid", F.concat_ws(":", *[F.col(c).cast("string") for c in uid_cols])
    )
    g = mk(gt)
    p = mk(pred)
    shared = (set(g.columns) & set(p.columns)) - {"uid"}
    for c in shared:
        g = g.withColumnRenamed(c, f"{c}_groundtruth")
        p = p.withColumnRenamed(c, f"{c}_prediction")
    return g.join(p, "uid", "inner")


def validate_one_to_one(gt: DataFrame, pred: DataFrame, merged: DataFrame, key: str = "uid") -> None:
    """J1 validation: row counts equal and join preserves cardinality
    (script:105-108,119-124). Raises ValueError on violation."""
    ng, np_, nm = gt.count(), pred.count(), merged.count()
    if ng != np_:
        raise ValueError(f"groundtruth ({ng}) and predictions ({np_}) row counts differ")
    if nm != ng:
        raise ValueError(f"join is not 1:1 ({nm} merged rows for {ng} inputs)")


def bbox_match_violations(merged: DataFrame, tol: float = 1e-9) -> DataFrame:
    """J2: post-join elementwise box equality check
    (script:127-142): rows where any of the 4 box coords differ by more
    than ``tol``. An empty result means the merge is valid.
    """
    conds = [
        F.abs(F.col(f"entity_box_{c}_groundtruth") - F.col(f"entity_box_{c}_prediction")) > F.lit(tol)
        for c in ("x1", "y1", "x2", "y2")
    ]
    bad = conds[0]
    for c in conds[1:]:
        bad = bad | c
    return merged.filter(bad)


def join_tracks_scores(tracks: DataFrame, scores: DataFrame) -> DataFrame:
    """J3: the reference's positional ``zip(scores, tracks)``
    (extractSpeakingSegments.py:91) — in our model both tables carry the
    surrogate key (video_id, track_id, frame_idx), so this is a plain
    equi-join."""
    return tracks.join(scores, ["video_id", "track_id", "frame_idx"], "inner")


def faces_per_frame(tracks_scored: DataFrame) -> DataFrame:
    """J4: invert tracks to per-frame face lists for overlay/eval
    (demoTalkNet.py:344-352): group by frame, collect the faces."""
    return (
        tracks_scored.groupBy("video_id", "frame_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("track_id", "score", "cx", "cy", "size"))
            ).alias("faces")
        )
    )


def spatial_best_match(
    gt: DataFrame,
    faces: DataFrame,
    frame_col: str = "frame_idx",
    iou_threshold: float = 0.5,
    one_sided: bool = True,
    gt_box: Sequence[str] = ("x1", "y1", "x2", "y2"),
    face_box: Sequence[str] = ("fx1", "fy1", "fx2", "fy2"),
    gt_key: Sequence[str] = ("speaker_id", "frame_idx"),
) -> DataFrame:
    """J5: per frame, match every GT box to the detected face with max
    IoU among those with ``IoU > threshold``; unmatched GT gets score 0
    (demoTalkNet.py:402-419; one-sided IoU per evalCol mode).

    Plan shape: equi-join on the frame key (hash join) + residual IoU
    predicate + ``row_number() = 1`` per GT + left join back for the
    missing->0 default. No cartesian product.
    """
    iou_fn = iou_one_sided if one_sided else iou
    j = gt.join(faces, frame_col, "inner").withColumn(
        "iou", iou_fn(*gt_box, *face_box)
    ).filter(F.col("iou") > F.lit(iou_threshold))
    w = Window.partitionBy(*gt_key).orderBy(F.desc("iou"), "track_id")
    best = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    matched = best.select(*gt_key, "track_id", "iou", "score")
    return (
        gt.join(matched, list(gt_key), "left")
        .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
    )


def anti_equality_pair(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    out_col: str = "noise_key",
) -> DataFrame:
    """J7: pair every key with a deterministic *other* key from the pool
    (dataLoader.py:15-17 picks a random non-self key for SNR mixing).

    Relational form: self-join on ``a.key != b.key`` + seeded ordering +
    top-1 per key. Deterministic given the seed (xxhash64 ordering).
    """
    pool = df.select(F.col(key_col).alias("_other")).distinct()
    j = df.join(pool, F.col(key_col) != F.col("_other"), "inner")
    w = Window.partitionBy(key_col).orderBy(
        F.xxhash64(F.col(key_col), F.col("_other"), F.lit(seed)), F.col("_other")
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_other", out_col)
    )


def length_constrained_pair(
    left: DataFrame,
    right: DataFrame,
    left_len: str,
    right_len: str,
    left_key: str,
    right_key: str,
    seed: int = 42,
) -> DataFrame:
    """J8: for each left row pick one right row with
    ``right.length >= left.length`` (TalkSet/generate_TalkSet.py:219-224
    resamples until the speech clip is long enough).

    Theta join + seeded top-1 per left row. At scale the length
    predicate should be banded (join on a coarse length bucket first) to
    bound fan-out; at reference scale the plain theta join suffices.
    """
    j = left.join(right, F.col(right_len) >= F.col(left_len), "inner")
    w = Window.partitionBy(left_key).orderBy(
        F.xxhash64(F.col(left_key), F.col(right_key), F.lit(seed)), F.col(right_key)
    )
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    how: str = "inner",
) -> DataFrame:
    """Generic interval-overlap theta join (the relational skeleton under
    J5/J6): equi on ``keys`` then ``a_start < b_end AND b_start < a_end``.
    """
    cond = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    return a.join(b, on=list(keys), how="inner").filter(cond) if keys else a.join(b, cond, how)
