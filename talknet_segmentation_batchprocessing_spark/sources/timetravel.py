"""Time travel, DELETE, change-data-feed and vacuum for the versioned
parquet tables of sources/upsert.py — the rest of the lakehouse
lifecycle around MERGE (upsert), OPTIMIZE (compaction) and ZORDER.

Every version directory is immutable once published, so time travel is
just reading ``v<N>`` directly, and the change feed between two
versions is a relational diff (full outer join on the merge key with
side-presence sentinels — the merge_frames discipline). Vacuum deletes
version directories strictly OLDER than a retention horizon; the
published version is never eligible, so readers resolving the pointer
are always safe, and a time-travel reader pinned to a vacuumed version
fails loudly with the retention explanation (exactly Delta's
contract).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import _claim, _publish, current_version, read_table


def read_version(spark: SparkSession, table_dir: str, version: int) -> DataFrame:
    """Time-travel read of a specific published version."""
    cur = current_version(table_dir)
    if cur < 0:
        raise FileNotFoundError(f"no published version under {table_dir}")
    if not 0 <= version <= cur:
        raise ValueError(
            f"version {version} out of range for {table_dir} (latest: {cur})"
        )
    p = os.path.join(table_dir, f"v{version}")
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"version {version} of {table_dir} was vacuumed (retention "
            f"removed it); earliest retained version is "
            f"{min(list_versions(table_dir), default=cur)}"
        )
    return spark.read.parquet(p)


def list_versions(table_dir: str) -> list[int]:
    """Version numbers that still have a directory on disk, ascending."""
    out = []
    for d in glob.glob(os.path.join(table_dir, "v*")):
        tail = os.path.basename(d)[1:]
        if tail.isdigit() and os.path.isdir(d):
            out.append(int(tail))
    return sorted(out)


def delete_where(spark: SparkSession, table_dir: str, condition) -> int:
    """DELETE FROM table WHERE condition, published as a new version
    (claim-before-write, same crash/race discipline as merge_into).
    ``condition`` is a Column or SQL string selecting rows to DELETE.

    SQL/Delta DELETE semantics: only rows where the predicate evaluates
    to TRUE are deleted; rows where it evaluates to NULL are KEPT (so a
    nullable-column predicate like ``v < 100`` retains NULL rows)."""
    if isinstance(condition, str):
        condition = F.expr(condition)
    v = current_version(table_dir)
    kept = read_table(spark, table_dir).filter(
        ~F.coalesce(condition, F.lit(False))
    )
    new_v = v + 1
    _claim(table_dir, new_v)
    kept.write.mode("overwrite").parquet(os.path.join(table_dir, f"v{new_v}"))
    _publish(table_dir, new_v)
    return new_v


def table_changes(
    spark: SparkSession, table_dir: str, v_from: int, v_to: int, on: str
) -> DataFrame:
    """Change data feed between two versions: one row per key whose
    presence or payload changed, with ``change_type`` in ('inserted',
    'deleted', 'updated') and the row payload (the NEW side for
    insert/update, the OLD side for delete). Unchanged keys are
    omitted. Payload comparison is null-safe struct equality, so
    NULL -> value and value -> NULL both register as updates.

    Shape: one full outer join keyed on ``on`` — at 100 TB both sides
    are the same bucketed table family, so the join co-locates; the
    diff never materializes unchanged rows past the filter."""
    if v_from == v_to:
        raise ValueError("v_from and v_to must differ")
    a = read_version(spark, table_dir, v_from)
    b = read_version(spark, table_dir, v_to)
    cols = [c for c in a.columns if c != on]
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"schema changed between v{v_from} and v{v_to}; change feed "
            "requires a stable column set"
        )
    ta = a.withColumn("_a_present", F.lit(True)).alias("a")
    tb = b.withColumn("_b_present", F.lit(True)).alias("b")
    a_here = F.col("a._a_present").isNotNull()
    b_here = F.col("b._b_present").isNotNull()
    same_payload = F.struct(*[F.col(f"a.{c}") for c in cols]).eqNullSafe(
        F.struct(*[F.col(f"b.{c}") for c in cols])
    )
    change = (
        F.when(~a_here, "inserted")
        .when(~b_here, "deleted")
        .when(~same_payload, "updated")
    )
    j = ta.join(tb, F.col(f"a.{on}") == F.col(f"b.{on}"), "full_outer")
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            F.when(b_here, F.col(f"b.{on}")).otherwise(F.col(f"a.{on}")).alias(on),
            "change_type",
            *[
                F.when(F.col("change_type") == "deleted", F.col(f"a.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
                for c in cols
            ],
        )
    )


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete version directories older than the newest ``keep_last``
    retained ones. The published version is never eligible (keep_last
    is clamped to >= 1), claims/pointer files are untouched, and the
    removal order is oldest-first so a crash mid-vacuum leaves a
    contiguous retained suffix. Returns the versions removed."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cur = current_version(table_dir)
    if cur < 0:
        raise FileNotFoundError(f"no published version under {table_dir}")
    horizon = cur - keep_last + 1
    removed = []
    for v in list_versions(table_dir):
        if v < horizon and v != cur:
            shutil.rmtree(os.path.join(table_dir, f"v{v}"))
            removed.append(v)
    return removed
