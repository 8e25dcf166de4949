"""MERGE INTO / upsert for parquet tables, with versioned atomic publish.

Plain parquet has no transactions; the lakehouse trick is to never
mutate published files: each merge writes a complete NEW version
directory, then atomically swaps a tiny pointer file. Readers resolve
the pointer first, so they always see a complete version — a crashed
merge leaves a half-written ``v<N+1>`` directory that no pointer
references (same crash-safety discipline as sources/bootstrap.py's
download-then-rename). At 100 TB the rewrite cost is bounded by
partitioning the table and merging only affected partitions; the
pointer-swap publish is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_LATEST"


def merge_frames(target: DataFrame, updates: DataFrame, on: str) -> DataFrame:
    """MERGE semantics as one relational operator: full outer join on
    ``on``; matched rows take the update's values (INCLUDING explicit
    NULLs — the gate is the update side's key presence, not per-column
    coalesce, so ``UPDATE SET c = NULL`` works), unmatched updates
    insert, unmatched target rows carry over. Adds a ``merge_action``
    audit column ('kept' | 'updated' | 'inserted').

    Deviation from SQL MERGE: duplicate keys in ``updates`` fan the
    full-outer join out into duplicate output rows instead of raising
    a multiple-match error; :func:`merge_into` (the table-mutation
    path, where MERGE's error semantics matter) guards against this
    with an explicit uniqueness check."""
    cols = [c for c in target.columns if c != on]
    t = target.alias("t")
    u = updates.alias("u")
    matched = F.col(f"u.{on}").isNotNull()
    action = (
        F.when(F.col(f"t.{on}").isNull(), "inserted")
        .when(~matched, "kept")
        .otherwise("updated")
    )
    return t.join(u, F.col(f"t.{on}") == F.col(f"u.{on}"), "full_outer").select(
        F.coalesce(F.col(f"t.{on}"), F.col(f"u.{on}")).alias(on),
        *[
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ],
        action.alias("merge_action"),
    )


def current_version(table_dir: str) -> int:
    p = os.path.join(table_dir, _POINTER)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    v = current_version(table_dir)
    if v < 0:
        raise FileNotFoundError(f"no published version under {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v{v}"))


def init_table(df: DataFrame, table_dir: str) -> int:
    """Publish version 0 of a table."""
    os.makedirs(table_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, "v0"))
    _publish(table_dir, 0)
    return 0


def merge_into(
    spark: SparkSession, table_dir: str, updates: DataFrame, on: str
) -> int:
    """Merge ``updates`` into the table's latest version and publish a
    new version. Returns the new version number.

    Write order is crash-safe: the FULL v<N+1> data lands first (Spark
    writes to a _temporary dir and renames per-file, so a torn job
    leaves no pointer change), the pointer file is replaced LAST via
    os.replace (atomic on POSIX). A concurrent READER either sees
    v<N> or v<N+1>, never a mix.

    Concurrency contract: SINGLE WRITER. Publish is conditional — the
    pointer-advance loses (raises) if another merge published first
    (per-version commit marker created with O_EXCL), so a lost race
    fails loudly instead of silently deleting the winner's files.

    Duplicate keys in ``updates`` raise ValueError, matching SQL
    MERGE's multiple-match error (merge_frames alone would fan out)."""
    dup = updates.groupBy(on).count().filter(F.col("count") > 1)
    if not dup.isEmpty():
        raise ValueError(
            f"updates has duplicate values of merge key {on!r}; "
            "SQL MERGE raises on multiple matches"
        )
    v = current_version(table_dir)
    target = read_table(spark, table_dir)
    merged = merge_frames(target, updates, on).drop("merge_action")
    new_v = v + 1
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, f"v{new_v}"))
    _publish(table_dir, new_v)
    return new_v


def _publish(table_dir: str, version: int) -> None:
    """Atomically advance the pointer to ``version``, conditional on
    being the FIRST publisher of that version: an O_EXCL commit marker
    is the mutual-exclusion primitive (exactly-one-creator on POSIX),
    so two racing merges that both read v and both wrote v+1 data
    cannot both publish — the loser raises FileExistsError with its
    orphan data dir left unreferenced (same as a crashed merge)."""
    marker = os.path.join(table_dir, f"_COMMIT_v{version}")
    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_dir, _POINTER))
