"""Z-ordered parquet writes: multi-dimensional data skipping.

``write_zordered`` linearizes rows along the Morton curve of two key
columns (functions/zorder.z_value) and RANGE-partitions the write by
that value, so every output file covers a contiguous z-interval — a
tight bounding box in (x, y) space. Parquet min/max column statistics
then prune files for predicates on EITHER key, which a single-column
sort cannot do for the second key. This is the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout expressed as two plain Spark operators
(repartitionByRange + sortWithinPartitions); at 100 TB it is paid
once at write time and amortized over every later selective scan,
exactly like bucketing amortizes the join shuffle
(sources/bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.zorder import z_value


def write_zordered(
    df: DataFrame,
    path: str,
    x: str | Column,
    y: str | Column,
    bits: int = 12,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the z-value of (x, y). The z column is written too (as
    ``_z``) so readers can range-filter on the curve directly."""
    zed = df.withColumn("_z", z_value(x, y, bits))
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_z_ranges(path: str) -> list[tuple[int, int]]:
    """(min, max) of the ``_z`` column per parquet file under ``path``,
    read from the file FOOTER statistics (the same stats the scan's
    filter pushdown prunes on) — no data pages touched."""
    import glob
    import os

    import pyarrow.parquet as pq

    # union of flat and recursive matches: a mixed layout (top-level
    # files plus partition subdirs, e.g. mid-migration) must surface
    # every file — an either/or here silently dropped the nested ones
    files = sorted(
        set(glob.glob(os.path.join(path, "*.parquet")))
        | set(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        zi = {md.schema.column(i).name: i for i in range(md.num_columns)}["_z"]
        stats = [md.row_group(g).column(zi).statistics for g in range(md.num_row_groups)]
        # a row group written with statistics disabled (or an all-null
        # _z chunk) has statistics=None — fail loudly, the caller is
        # about to prune on numbers that do not exist
        if any(s is None or not s.has_min_max for s in stats):
            raise ValueError(f"{f}: _z row-group statistics missing; cannot prune")
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    return ranges
