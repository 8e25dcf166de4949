"""Bucketed parquet tables: the co-located-join storage layout.

At 100 TB the dominant join cost is the shuffle of the big fact table.
Spark's bucketing (hive-style ``bucketBy`` on saveAsTable) pre-hashes
rows into a fixed number of buckets per table file-set; two tables
bucketed on the SAME key with the SAME bucket count join with ZERO
exchange on either side — the sort-merge join reads matching buckets
directly (``spark.sql.sources.bucketing.enabled``, on by default).
``sortBy`` additionally pre-sorts within buckets so the join skips its
sort too.

This is the storage-level sibling of plans/two_phase (compute-level)
and plans/skew (runtime-level): pay the shuffle ONCE at write time,
amortized over every subsequent join/aggregation on the key. The
reference engine has no analog (single-node, in-memory); this is pure
Spark-first scale posture.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. ``path`` makes it external (kept out of the default
    warehouse); bucketed writes REQUIRE ``saveAsTable`` — bucket
    metadata lives in the catalog, not the files."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet layout (``partitionBy`` directories):
    the pruning sibling of bucketing. A filter on a partition column
    never opens the other directories — the scan's PartitionFilters
    eliminate them at planning time, so a per-language (or per-day)
    query reads that partition's bytes only, at any corpus size.
    Choose LOW-cardinality columns (lang, date, source); per-key
    directories with millions of keys create a small-file problem."""
    df.write.format("parquet").mode(mode).partitionBy(*partition_cols).save(path)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left: str, right: str, on: Sequence[str]
) -> tuple[bool, str]:
    """Diagnostic: join the two catalog tables on ``on`` and report
    whether the executed plan contains any Exchange (it must not when
    both sides are bucketed on the join key with equal bucket counts).
    Returns (shuffle_free, plan_string)."""
    j = spark.table(left).join(spark.table(right), list(on))
    plan = j._jdf.queryExecution().executedPlan().toString()
    return ("Exchange" not in plan), plan
