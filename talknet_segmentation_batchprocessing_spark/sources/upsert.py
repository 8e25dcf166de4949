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

Write protocol (optimistic, Delta-style): a writer CLAIMS version
``N+1`` with an O_EXCL marker file BEFORE writing any data — the
exactly-one-creator guarantee means a concurrent writer that read the
same base version fails at the claim, before it can clobber anything.
A claim that crashes pre-publish leaves an orphan ``_CLAIM_v<N+1>``
marker (the table stays readable at ``v<N>``); :func:`recover` clears
claims above the published pointer once the operator has confirmed no
writer is in flight.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_LATEST"


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed this version first (or crashed holding
    the claim — see :func:`recover`)."""


def merge_frames(target: DataFrame, updates: DataFrame, on: str) -> DataFrame:
    """MERGE semantics as one relational operator: full outer join on
    ``on``; matched rows take the update's values (INCLUDING explicit
    NULLs — the gate is side PRESENCE, not per-column coalesce, so
    ``UPDATE SET c = NULL`` works and NULL-KEYED rows on either side
    keep their own payload), unmatched updates insert, unmatched
    target rows carry over. Adds a ``merge_action`` audit column
    ('kept' | 'updated' | 'inserted').

    Deviation from SQL MERGE: duplicate keys in ``updates`` fan the
    full-outer join out into duplicate output rows instead of raising
    a multiple-match error; :func:`merge_into` (the table-mutation
    path, where MERGE's error semantics matter) guards against this
    with an explicit uniqueness check."""
    cols = [c for c in target.columns if c != on]
    # side-presence sentinels: a NULL merge key never joins, so key
    # nullness cannot distinguish "row absent from this side" from
    # "row present with a NULL key" — the sentinel can
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    u = updates.withColumn("_u_present", F.lit(True)).alias("u")
    t_here = F.col("t._t_present").isNotNull()
    u_here = F.col("u._u_present").isNotNull()
    action = (
        F.when(~t_here, "inserted").when(~u_here, "kept").otherwise("updated")
    )
    return t.join(u, F.col(f"t.{on}") == F.col(f"u.{on}"), "full_outer").select(
        F.when(u_here, F.col(f"u.{on}")).otherwise(F.col(f"t.{on}")).alias(on),
        *[
            F.when(u_here, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
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
    _claim(table_dir, 0)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, "v0"))
    _publish(table_dir, 0)
    return 0


def merge_into(
    spark: SparkSession, table_dir: str, updates: DataFrame, on: str
) -> int:
    """Merge ``updates`` into the table's latest version and publish a
    new version. Returns the new version number.

    Order of operations is both race- and crash-safe:
    1. CLAIM ``v<N+1>`` via O_EXCL marker — a concurrent merge that
       read the same base loses HERE, before any data could be
       clobbered (lost-update prevention, not just lost-publish);
    2. write the full ``v<N+1>`` data (Spark lands files under a
       _temporary dir and renames, so a torn job changes nothing a
       reader can resolve);
    3. atomically swap the pointer (os.replace, POSIX-atomic).
    A concurrent READER either sees v<N> or v<N+1>, never a mix. A
    crash between 1 and 3 leaves the table readable at v<N> with an
    orphan claim; clear it with :func:`recover`.

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
    _claim(table_dir, new_v)
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, f"v{new_v}"))
    _publish(table_dir, new_v)
    return new_v


def recover(table_dir: str) -> list[int]:
    """Remove claim markers ABOVE the published pointer — the debris of
    a writer that crashed between claim and publish. Only call after
    confirming no writer is in flight (the markers are what protects a
    live one). Returns the versions whose claims were cleared."""
    v = current_version(table_dir)
    cleared = []
    for m in glob.glob(os.path.join(table_dir, "_CLAIM_v*")):
        mv = int(os.path.basename(m)[len("_CLAIM_v"):])
        if mv > v:
            os.remove(m)
            cleared.append(mv)
    return sorted(cleared)


def _claim(table_dir: str, version: int) -> None:
    """Claim ``version`` with an O_EXCL marker (exactly-one-creator on
    POSIX) BEFORE any data is written — the loser of a race fails
    loudly here with the winner's files untouched."""
    marker = os.path.join(table_dir, f"_CLAIM_v{version}")
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        raise ConcurrentWriteError(
            f"version {version} of {table_dir} is already claimed — "
            "either a concurrent writer is in flight, or a previous "
            "writer crashed pre-publish (run recover() after confirming "
            "no writer is active)"
        ) from e
    os.close(fd)


def _publish(table_dir: str, version: int) -> None:
    """Atomically advance the pointer to ``version`` (os.replace)."""
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_dir, _POINTER))
