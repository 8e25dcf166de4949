"""sources/compaction.py: small-file OPTIMIZE pass with atomic publish."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.sources.compaction import (
    compact,
    table_files,
)
from talknet_segmentation_batchprocessing_spark.sources.upsert import (
    current_version,
    init_table,
    read_table,
)


def test_compact_many_small_files(spark, tmp_path):
    table = str(tmp_path / "tbl")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # 40 tiny files — the streaming-sink accretion shape
    init_table(df.repartition(40), table)
    assert len(table_files(table, 0)) == 40

    new_v = compact(spark, table, target_file_bytes=10**9)
    assert new_v == 1 and current_version(table) == 1
    files = table_files(table, 1)
    assert len(files) == 1  # everything fits one target-sized file

    back = read_table(spark, table)
    assert back.count() == 10_000
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(10_000))
    # old version still on disk for readers mid-scan; pointer moved
    assert os.path.isdir(os.path.join(table, "v0"))


def test_compact_sorted_gives_tight_footer_ranges(spark, tmp_path):
    table = str(tmp_path / "tbl")
    df = spark.range(0, 20_000).select(
        ((F.col("id") * 7919) % 20_000).alias("k"), F.col("id").alias("v")
    )
    init_table(df.repartition(16), table)
    compact(spark, table, target_file_bytes=120_000, sort_col="k")
    files = table_files(table, 1)
    assert len(files) >= 2
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ki = {md.schema.column(i).name: i for i in range(md.num_columns)}["k"]
        stats = [md.row_group(g).column(ki).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    # range-partitioned + sorted => file key ranges are disjoint, so a
    # selective predicate prunes all but one file on footer stats
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_compact_requires_published_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        compact(spark, str(tmp_path / "nope"))
