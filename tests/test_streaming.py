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


def test_stateful_segments_across_microbatches(spark, tmp_path):
    """A speaking run spanning two micro-batch files must merge into one
    segment — the case foreachBatch cannot handle."""
    import time

    from talknet_segmentation_batchprocessing_spark.schemas import SCORES
    from talknet_segmentation_batchprocessing_spark.streaming.stateful import (
        stateful_segments,
    )

    drop = tmp_path / "scores"
    drop.mkdir()
    # batch file 1: frames 0-29, speaking 10..29 (run OPEN at the end)
    b1 = [("v", 0, f, 1.0 if f >= 10 else -1.0) for f in range(30)]
    # batch file 2: frames 30-59, speaking continues to 39, silent after
    b2 = [("v", 0, f, 1.0 if f < 40 else -1.0) for f in range(30, 60)]
    spark.createDataFrame(b1, SCORES).coalesce(1).write.parquet(str(drop / "f1"))
    time.sleep(1.1)  # distinct mod times -> deterministic file order
    spark.createDataFrame(b2, SCORES).coalesce(1).write.parquet(str(drop / "f2"))

    stream = (
        spark.readStream.schema(SCORES)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drop / "*"))
    )
    segs = stateful_segments(stream, threshold=0.0, min_duration_s=0.5)
    q = (
        segs.writeStream.format("memory")
        .queryName("segs_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from segs_out").toPandas()
    # one merged segment 10..40 (exclusive), 30 frames, spanning batches
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.start_frame, row.end_frame, row.n_frames) == (10, 40, 30)


def test_stateful_segments_match_batch_on_sparse_frames(spark, tmp_path):
    """Frame-numbering gaps must NOT split a run (batch islands are
    row-wise) and the min-length filter is on SPAN, not row count —
    the stateful operator must agree with extract_segments exactly."""
    from talknet_segmentation_batchprocessing_spark.operators.segmentation import (
        extract_segments,
    )
    from talknet_segmentation_batchprocessing_spark.schemas import SCORES
    from talknet_segmentation_batchprocessing_spark.streaming.stateful import (
        stateful_segments,
    )

    # speaking rows only at even frames 10..28 (10 rows, span 19), then a
    # silent row at 29 closing the run; span 19 >= 12 keeps it even though
    # a count-based filter with min_frames=12 would also keep 10 < 12 -> drop
    rows = [("v", 0, f, 1.0) for f in range(10, 29, 2)] + [("v", 0, 29, -1.0)]
    drop = tmp_path / "scores"
    drop.mkdir()
    spark.createDataFrame(rows, SCORES).coalesce(1).write.parquet(str(drop / "f1"))

    batch = (
        extract_segments(
            spark.createDataFrame(rows, SCORES), threshold=0.0, min_duration_s=0.5
        )
        .select("start_frame", "end_frame")
        .toPandas()
    )
    assert [tuple(r) for r in batch.itertuples(index=False)] == [(10, 29)]

    stream = spark.readStream.schema(SCORES).parquet(str(drop / "*"))
    q = (
        stateful_segments(stream, threshold=0.0, min_duration_s=0.5)
        .writeStream.format("memory")
        .queryName("segs_sparse")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from segs_sparse").toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.start_frame, row.end_frame, row.n_frames) == (10, 29, 19)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """First arrival of each content hash survives; duplicates inside
    the watermark horizon are dropped, across micro-batches."""
    from pyspark.sql import functions as F

    from talknet_segmentation_batchprocessing_spark.streaming.pipeline import (
        streaming_dedup,
    )

    schema = "doc_id long, text string, event_time timestamp"
    drop = tmp_path / "docs"
    drop.mkdir()
    b0 = [(0, "alpha", "2026-01-01 00:00:00"), (1, "beta", "2026-01-01 00:00:01")]
    b1 = [
        (2, "alpha", "2026-01-01 00:00:02"),  # duplicate content, new id
        (3, "gamma", "2026-01-01 00:00:03"),
        (1, "beta", "2026-01-01 00:00:04"),   # full duplicate row
    ]
    from datetime import datetime

    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(
            [(d, t, datetime.fromisoformat(ts)) for d, t, ts in rows], schema
        ).coalesce(1).write.parquet(str(drop / f"b{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
        .withColumn("content_hash", F.xxhash64("text"))
    )
    q = (
        streaming_dedup(stream, watermark_s=3600)
        .writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_docs").toPandas()
    assert sorted(out.text.tolist()) == ["alpha", "beta", "gamma"]
    # the FIRST arrival won: alpha kept doc_id 0, not 2
    assert int(out.loc[out.text == "alpha", "doc_id"].iloc[0]) == 0


def test_stateful_enrich_latest_across_batches(spark, tmp_path):
    """Streaming as-of (streaming/enrich.py): a view in micro-batch 1
    matches clicks in batch 2; same-ts view does NOT match (strict
    priority); later view supersedes earlier one."""
    from talknet_segmentation_batchprocessing_spark.streaming.enrich import (
        stateful_enrich_latest,
    )

    schema = "user_id long, event_id long, event_type string, ts double"
    drop = tmp_path / "events"
    drop.mkdir()
    b1 = [
        (1, 10, "view", 100.0),
        (1, 11, "click", 100.0),   # same ts as view 10 -> NOT prior
        (1, 12, "click", 105.0),   # matches view 10
        (2, 20, "click", 50.0),    # no view yet -> null
    ]
    b2 = [
        (1, 13, "view", 110.0),
        (1, 14, "click", 120.0),   # matches view 13 (supersedes 10)
        (2, 21, "view", 60.0),
        (2, 22, "click", 61.0),    # matches view 21 from same batch
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(drop / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(drop / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
    )
    q = (
        stateful_enrich_latest(stream)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        int(r.event_id): (
            None if r.prior_view_id is None else int(r.prior_view_id),
            r.gap_s,
        )
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == {
        11: (None, None),
        12: (10, 5.0),
        20: (None, None),
        14: (13, 10.0),
        22: (21, 1.0),
    }


def test_sliding_window_counts_matches_batch(spark, tmp_path):
    """Streaming sliding windows agree with the batch w11 expansion on
    a bounded input (availableNow drains everything, so no rows are
    late and every window closes)."""
    import datetime as dt

    from talknet_segmentation_batchprocessing_spark.streaming.pipeline import (
        sliding_window_counts,
    )

    schema = "event_time timestamp, event_type string, value double"
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(seconds=s), "click" if (s // 300) % 2 else "view", float(s))
        for s in range(0, 7200, 300)
    ]
    drop = tmp_path / "ev"
    drop.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(drop / "b0"))

    stream = spark.readStream.schema(schema).parquet(str(drop / "*"))
    # complete mode: append would emit only watermark-closed windows,
    # and a single bounded drain never advances the watermark past the
    # tail windows — complete shows every window for the comparison
    q = (
        sliding_window_counts(stream)
        .writeStream.format("memory")
        .queryName("slide")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT win_start, event_type, n, sum_value FROM slide"
    ).toPandas()

    # batch expansion: each event in the 2 windows covering it
    import pandas as pd

    recs = []
    for t, et, v in rows:
        slot = int(t.timestamp()) // 1800
        for k in range(2):
            recs.append(((slot - k) * 1800, et, v))
    want = (
        pd.DataFrame(recs, columns=["ws", "event_type", "value"])
        .groupby(["ws", "event_type"])
        .agg(n=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    got["ws"] = got.win_start.map(lambda x: int(x.timestamp()))
    merged = want.merge(
        got[["ws", "event_type", "n", "sum_value"]],
        on=["ws", "event_type"],
        suffixes=("_want", "_got"),
        how="outer",
    )
    assert len(merged) == len(want) == len(got)
    assert (merged.n_want == merged.n_got).all()
    assert (abs(merged.sum_value_want - merged.sum_value_got) < 1e-9).all()


def test_funnel_fold_sorts_across_arrow_chunks():
    """ADVICE r4: applyInPandasWithState delivers one group's
    micro-batch as MULTIPLE arrow chunks; the fold must sort the
    concatenation, not each chunk. A click arriving in an earlier
    chunk than the view it follows must still fold in time order."""
    import pandas as pd

    from talknet_segmentation_batchprocessing_spark.streaming.funnel import (
        _fold_batch,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    # chunk 1 carries the LATER events (click@20, purchase@30), chunk 2
    # the view@10 — per-chunk sorting would fold click before view and
    # reject it (t1 is None), ending at stage 1 instead of 3
    c1 = pd.DataFrame({"us": [20, 30], "event_type": ["click", "purchase"]})
    c2 = pd.DataFrame({"us": [10], "event_type": ["view"]})
    state = _FakeState()
    out = list(_fold_batch((7,), iter([c1, c2]), state))
    assert state._v == (10, 20, 30)
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.user_id, row.stage) == (7, 3)
    assert (row.t1_us, row.t2_us, row.t3_us) == (10, 20, 30)


def test_throttle_fold_sorts_across_arrow_chunks():
    """Same chunk-order hazard as the funnel: ranks must follow
    (us, event_id) across the WHOLE micro-batch. With chunk 1 carrying
    the later events, per-chunk processing would admit them first and
    drop the true first-arrivals."""
    import pandas as pd

    from talknet_segmentation_batchprocessing_spark.streaming.throttle import (
        BUCKET_US,
        _throttle_group,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    # five events in ONE bucket; chunk 1 has the LAST two, chunk 2 the
    # first three. Correct verdicts: events 1-3 kept, 4-5 dropped.
    c1 = pd.DataFrame({"us": [400, 500], "event_id": [4, 5]})
    c2 = pd.DataFrame({"us": [100, 200, 300], "event_id": [1, 2, 3]})
    state = _FakeState()
    out = pd.concat(list(_throttle_group((9,), iter([c1, c2]), state)))
    out = out.sort_values("event_id").reset_index(drop=True)
    assert list(out["rn"]) == [1, 2, 3, 4, 5]
    assert list(out["kept"]) == [True, True, True, False, False]
    assert state._v == (100 // BUCKET_US, 5)
    # bucket advance resets the counter (next micro-batch, later bucket)
    c3 = pd.DataFrame({"us": [BUCKET_US + 50], "event_id": [6]})
    out2 = pd.concat(list(_throttle_group((9,), iter([c3]), state)))
    assert list(out2["rn"]) == [1] and list(out2["kept"]) == [True]
    assert state._v == ((BUCKET_US + 50) // BUCKET_US, 1)


def test_smooth_folds_sort_across_arrow_chunks():
    """Forward fill and EMA must order (us, event_id) across the WHOLE
    micro-batch: chunk 1 carrying the later events would otherwise
    fill/decay in the wrong order."""
    import pandas as pd

    from talknet_segmentation_batchprocessing_spark.streaming.smooth import (
        _ema_group,
        _ffill_group,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    # ffill: null at t=300 must take the t=200 observation (arriving in
    # the LATER chunk), not the stale t=100 one
    c1 = pd.DataFrame({"us": [100, 300], "event_id": [1, 3], "v": [1.0, None]})
    c2 = pd.DataFrame({"us": [200], "event_id": [2], "v": [2.0]})
    st = _FakeState()
    out = pd.concat(list(_ffill_group((5,), iter([c1, c2]), st)))
    out = out.sort_values("event_id").reset_index(drop=True)
    assert list(out["value_filled"]) == [1.0, 2.0, 2.0]
    assert list(out["was_filled"]) == [False, False, True]
    assert st._v == (True, 2.0)

    # EMA: fold order [1, 2, 4] -> newest weighs 1: 4 + 2/2 + 1/4
    e1 = pd.DataFrame({"us": [300], "event_id": [3], "value": [4.0]})
    e2 = pd.DataFrame({"us": [100, 200], "event_id": [1, 2], "value": [1.0, 2.0]})
    st2 = _FakeState()
    out2 = pd.concat(list(_ema_group((5,), iter([e1, e2]), st2)))
    out2 = out2.sort_values("event_id").reset_index(drop=True)
    # per-event ema over growing window: [1]/1, (1/2+2)/1.5, (1/4+1+4)/1.75
    assert list(out2["n_in_window"]) == [1, 2, 3]
    assert out2["ema"].iloc[2] == (4.0 + 2.0 / 2 + 1.0 / 4) / (2 - 2.0 ** (1 - 3))
    assert st2._v[0] == 3 and st2._v[1:4] == (1.0, 2.0, 4.0)
