"""MERGE INTO / versioned upsert: semantics + crash-safe publish."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.sources.upsert import (
    current_version,
    init_table,
    merge_frames,
    merge_into,
    read_table,
)


def test_merge_frames_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k long, s string, v long"
    )
    got = {r.k: r for r in merge_frames(target, updates, "k").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].s, got[1].v, got[1].merge_action) == ("a", 10, "kept")
    assert (got[2].s, got[2].v, got[2].merge_action) == ("B", 200, "updated")
    assert (got[3].merge_action) == "kept"
    assert (got[4].s, got[4].v, got[4].merge_action) == ("d", 40, "inserted")


def test_versioned_merge_into_and_atomic_pointer(spark, tmp_path):
    table = str(tmp_path / "tbl")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert init_table(base, table) == 0
    assert current_version(table) == 0

    up1 = spark.range(90, 110).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    assert merge_into(spark, table, up1, "k") == 1
    t1 = read_table(spark, table)
    assert t1.count() == 110
    assert t1.filter("v = -1").count() == 20
    assert t1.filter("k < 90 AND v = -1").count() == 0

    # both versions coexist on disk; the pointer decides what readers see
    assert os.path.isdir(os.path.join(table, "v0"))
    assert os.path.isdir(os.path.join(table, "v1"))
    assert spark.read.parquet(os.path.join(table, "v0")).count() == 100

    # crash between data write and publish: a stray v2 dir with no
    # pointer update must be invisible to readers
    spark.range(0, 5).select(F.col("id").alias("k"), F.col("id").alias("v")).write.parquet(
        os.path.join(table, "v2")
    )
    assert current_version(table) == 1
    assert read_table(spark, table).count() == 110


def test_merge_frames_update_can_set_null(spark):
    """ADVICE r4: matched rows take the update's values INCLUDING
    explicit NULLs — per-column coalesce would silently keep 'b'."""
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, s string, v long"
    )
    updates = spark.createDataFrame([(2, None, 200)], "k long, s string, v long")
    got = {r.k: r for r in merge_frames(target, updates, "k").collect()}
    assert got[2].s is None and got[2].v == 200
    assert got[2].merge_action == "updated"
    assert (got[1].s, got[1].merge_action) == ("a", "kept")


def test_merge_into_rejects_duplicate_update_keys(spark, tmp_path):
    """SQL MERGE raises on multiple matches; merge_into enforces it."""
    import pytest

    table = str(tmp_path / "tbl")
    init_table(
        spark.createDataFrame([(1, 10)], "k long, v long"), table
    )
    dup = spark.createDataFrame([(1, 11), (1, 12)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate"):
        merge_into(spark, table, dup, "k")
    # failed merge publishes nothing
    assert current_version(table) == 0


def test_publish_is_single_winner(spark, tmp_path):
    """Two racing merges that both computed v1: the second publish of
    the SAME version must fail loudly (O_EXCL commit marker), never
    silently overwrite the winner's pointer/files."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.upsert import _publish

    table = str(tmp_path / "tbl")
    init_table(spark.createDataFrame([(1, 10)], "k long, v long"), table)
    _publish(table, 1)
    with pytest.raises(FileExistsError):
        _publish(table, 1)
    assert current_version(table) == 1
