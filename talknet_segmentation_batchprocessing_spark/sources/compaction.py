"""Small-file compaction (the OPTIMIZE pass): rewrite a parquet table
of many small files into few right-sized ones, published atomically.

Streaming sinks, incremental upserts and per-trigger micro-batches all
accrete small files; at 100 TB the scan cost is dominated by per-file
open/footer overhead and the scheduler's task-per-split fan-out long
before data volume matters (10k x 1 MB files cost far more than
10 x 1 GB). Compaction is one narrow job — read, coalesce to a target
file size, write a NEW version directory — reusing the versioned
atomic-pointer publish from sources/upsert.py, so readers see the old
file-set or the new one, never a mix, and a crashed compaction leaves
only an unreferenced directory.

An optional sort column turns the pass into OPTIMIZE ... ZORDER's
little sibling: ``repartitionByRange + sortWithinPartitions`` on the
column gives every output file a tight min/max footer range on it
(one-dimensional clustering; use sources/zorder.py for two keys).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from .upsert import _claim, _publish, current_version

_TARGET_FILE_BYTES = 128 * 1024 * 1024  # the usual HDFS/parquet sweet spot


def table_files(table_dir: str, version: int) -> list[str]:
    return sorted(
        glob.glob(os.path.join(table_dir, f"v{version}", "*.parquet"))
    )


def compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = _TARGET_FILE_BYTES,
    sort_col: str | None = None,
) -> int:
    """Compact the table's latest version into max(1, ceil(bytes /
    target)) files and publish it as the next version. Returns the new
    version number. Row content is untouched — this is a pure layout
    rewrite."""
    v = current_version(table_dir)
    if v < 0:
        raise FileNotFoundError(f"no published version under {table_dir}")
    src = os.path.join(table_dir, f"v{v}")
    total = sum(os.path.getsize(f) for f in table_files(table_dir, v))
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src)
    if sort_col is not None:
        out: DataFrame = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(
            sort_col
        )
    elif n_files <= df.rdd.getNumPartitions():
        out = df.coalesce(n_files)
    else:
        # coalesce can only REDUCE partition count: an oversized single
        # file must be split back up, which needs a real repartition
        out = df.repartition(n_files)
    new_v = v + 1
    # claim BEFORE writing: a concurrent merge/compact that read the
    # same base version loses here, not after clobbering our files
    _claim(table_dir, new_v)
    out.write.mode("overwrite").parquet(os.path.join(table_dir, f"v{new_v}"))
    _publish(table_dir, new_v)
    return new_v
