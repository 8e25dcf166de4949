"""Streaming surface tests: the batch segmentation operator applied per
micro-batch (foreachBatch), and the session-window extension."""

from __future__ import annotations

import pandas as pd


def test_foreach_batch_segments(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.streaming.pipeline import (
        foreach_batch_segments,
        stream_scores,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    scores = spark.createDataFrame(
        [("v", 0, f, 1.0 if f < 20 else -1.0) for f in range(40)],
        "video_id string, track_id int, frame_idx int, score double",
    )
    scores.coalesce(1).write.mode("overwrite").parquet(str(drop / "batch0"))

    collected: list[pd.DataFrame] = []

    def sink(df, batch_id):
        collected.append(df.toPandas())

    q = foreach_batch_segments(
        stream_scores(spark, str(drop / "batch0")),
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    assert collected, "no micro-batch arrived"
    segs = pd.concat(collected)
    assert len(segs) == 1
    row = segs.iloc[0]
    assert (row.start_frame, row.end_frame) == (0, 20)


def test_session_window_segments_batch_semantics(spark):
    """session_window works identically on a batch frame — verify gap
    merging: frames 0-9 and 11-19 speak with a 1-frame silent gap at 10;
    gap_s=0.04 (=1 frame) keeps them as TWO sessions, gap_s=0.1 merges."""
    from talknet_segmentation_batchprocessing_spark.streaming.pipeline import (
        session_window_segments,
    )
    from pyspark.sql import functions as F

    rows = [
        ("v", 0, f, -1.0 if f == 10 else 1.0) for f in range(20)
    ]
    df = spark.createDataFrame(
        rows, "video_id string, track_id int, frame_idx int, score double"
    ).withColumn(
        "event_time", F.timestamp_seconds(F.col("frame_idx") / 25.0)
    )
    two = session_window_segments(df, gap_s=0.04).toPandas()
    assert len(two) == 2
    one = session_window_segments(df, gap_s=0.1).toPandas()
    assert len(one) == 1
    assert one.n_frames[0] == 19  # frame 10 excluded by the threshold
