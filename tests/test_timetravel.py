"""sources/timetravel.py: time-travel reads, DELETE, change data feed,
and vacuum over the versioned parquet tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.sources.timetravel import (
    delete_where,
    list_versions,
    read_version,
    table_changes,
    vacuum,
)
from talknet_segmentation_batchprocessing_spark.sources.upsert import (
    current_version,
    init_table,
    merge_into,
    read_table,
)


@pytest.fixture
def table(spark, tmp_path):
    """v0: keys 0..9 with v=k*10, n nullable; v1: update k=3 (v=999),
    set k=4's n to NULL, insert k=100; v2: delete k<2."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, k * 10, f"n{k}") for k in range(10)], "k long, v long, n string"
    )
    init_table(df, t)
    upd = spark.createDataFrame(
        [(3, 999, "n3"), (4, 40, None), (100, 1000, "new")],
        "k long, v long, n string",
    )
    merge_into(spark, t, upd, on="k")
    delete_where(spark, t, "k < 2")
    return t


def test_time_travel_reads_each_version(spark, table):
    assert current_version(table) == 2
    assert read_version(spark, table, 0).count() == 10
    assert read_version(spark, table, 1).count() == 11
    assert read_version(spark, table, 2).count() == 9
    # latest == pointer read
    assert read_table(spark, table).count() == 9
    with pytest.raises(ValueError):
        read_version(spark, table, 3)


def test_delete_where_publishes_new_version(spark, table):
    keys = {r["k"] for r in read_table(spark, table).collect()}
    assert 0 not in keys and 1 not in keys and 100 in keys


def test_change_feed_classifies_insert_update_delete(spark, table):
    cdf = table_changes(spark, table, 0, 1, on="k").toPandas()
    by = {r.k: r for r in cdf.itertuples()}
    assert set(by) == {3, 4, 100}, "unchanged keys must be omitted"
    assert by[3].change_type == "updated" and by[3].v == 999
    # value -> NULL must register as an update (null-safe compare)
    assert by[4].change_type == "updated" and by[4].n is None
    assert by[100].change_type == "inserted" and by[100].v == 1000

    cdf2 = table_changes(spark, table, 1, 2, on="k").toPandas()
    by2 = {r.k: r for r in cdf2.itertuples()}
    assert set(by2) == {0, 1}
    # deletes carry the OLD payload
    assert by2[0].change_type == "deleted" and by2[0].v == 0
    assert by2[1].change_type == "deleted" and by2[1].v == 10


def test_change_feed_is_reversible(spark, table):
    """Diffing backwards swaps inserts and deletes."""
    fwd = table_changes(spark, table, 1, 2, on="k").toPandas()
    rev = table_changes(spark, table, 2, 1, on="k").toPandas()
    assert sorted(fwd["k"]) == sorted(rev["k"])
    assert set(fwd["change_type"]) == {"deleted"}
    assert set(rev["change_type"]) == {"inserted"}


def test_vacuum_retention_and_pinned_reader_error(spark, table):
    removed = vacuum(table, keep_last=2)
    assert removed == [0]
    assert list_versions(table) == [1, 2]
    assert not os.path.isdir(os.path.join(table, "v0"))
    # latest reads fine; a reader pinned to the vacuumed version fails
    # with the retention explanation
    assert read_table(spark, table).count() == 9
    with pytest.raises(FileNotFoundError, match="vacuum"):
        read_version(spark, table, 0).count()
    # published version is never eligible however aggressive keep_last
    assert vacuum(table, keep_last=1) == [1]
    assert list_versions(table) == [2]
    with pytest.raises(ValueError):
        vacuum(table, keep_last=0)


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL/Delta DELETE semantics: rows where the predicate evaluates
    to NULL are KEPT, not deleted (only TRUE rows go)."""
    t = str(tmp_path / "nulltbl")
    df = spark.createDataFrame(
        [(0, 5), (1, None), (2, 200)], "k long, v long"
    )
    init_table(df, t)
    delete_where(spark, t, "v < 100")
    kept = {r["k"] for r in read_table(spark, t).collect()}
    # k=0 (v=5, TRUE) deleted; k=1 (v NULL -> predicate NULL) kept;
    # k=2 (FALSE) kept
    assert kept == {1, 2}
