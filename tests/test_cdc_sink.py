"""streaming/cdc_sink.py: change stream -> versioned-table MERGE per
micro-batch, equal to the batch merge of the same updates."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.sources.upsert import (
    current_version,
    init_table,
    read_table,
)
from talknet_segmentation_batchprocessing_spark.streaming.cdc_sink import (
    collapse_latest,
    streaming_merge_sink,
)

SCHEMA = "k long, v long, seq long"


def test_collapse_latest_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 3), (1, 15, 2), (2, 5, 1)], SCHEMA
    )
    got = {
        r["k"]: r["v"]
        for r in collapse_latest(df, "k", ["seq"]).collect()
    }
    assert got == {1: 20, 2: 5}


def test_streaming_merge_applies_batches_in_order(spark, tmp_path):
    table = str(tmp_path / "tbl")
    base = spark.createDataFrame([(k, 0, 0) for k in range(5)], SCHEMA)
    init_table(base, table)

    drop = tmp_path / "updates"
    drop.mkdir()
    # batch 0: update k=1 twice (seq 1 then 2 — the collapse case) and
    # insert k=10
    spark.createDataFrame(
        [(1, 111, 1), (1, 222, 2), (10, 1000, 1)], SCHEMA
    ).coalesce(1).write.parquet(str(drop / "b0"))
    time.sleep(1.1)
    # batch 1: update k=1 again and k=10
    spark.createDataFrame(
        [(1, 333, 3), (10, 1001, 2)], SCHEMA
    ).coalesce(1).write.parquet(str(drop / "b1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drop / "*"))
    )
    q = streaming_merge_sink(
        stream, table, on="k", order_cols=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    # two micro-batches -> two merges -> version 2
    assert current_version(table) == 2
    final = {r["k"]: r["v"] for r in read_table(spark, table).collect()}
    assert final[1] == 333  # latest across batches won
    assert final[10] == 1001
    assert final[0] == 0 and len(final) == 6

    # restart with the same checkpoint: no new files -> no new version
    q2 = streaming_merge_sink(
        (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(drop / "*"))
        ),
        table, on="k", order_cols=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(300)
    assert current_version(table) == 2, "replay must not re-apply batches"


def test_scd2_sink_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash after merge, before checkpoint
    commit) re-merges the same (user_id, version) keys to the same
    values: the table content is unchanged — only the version counter
    advances."""
    from talknet_segmentation_batchprocessing_spark.sources.upsert import (
        merge_into,
    )

    table = str(tmp_path / "scd2_tbl")
    schema = (
        "user_id long, version long, event_type string, "
        "valid_from_us long, valid_to_us long, n_events long, "
        "uid_ver string"
    )
    init_table(spark.createDataFrame([], schema), table)
    batch = spark.createDataFrame(
        [
            (1, 1, "view", 100, 200, 3, "1:1"),
            (1, 2, "click", 200, -1, 1, "1:2"),
            (2, 1, "view", 150, -1, 5, "2:1"),
        ],
        schema,
    )
    merge_into(spark, table, batch, on="uid_ver")
    v1 = current_version(table)
    first = sorted(
        tuple(r) for r in read_table(spark, table).drop("merge_action").collect()
    )
    merge_into(spark, table, batch, on="uid_ver")  # the replay
    v2 = current_version(table)
    second = sorted(
        tuple(r) for r in read_table(spark, table).drop("merge_action").collect()
    )
    assert second == first
    assert v2 == v1 + 1  # a new version was published, same content
