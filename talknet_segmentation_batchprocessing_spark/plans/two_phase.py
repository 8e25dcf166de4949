"""Two-phase global ordered computations (rank / cumsum / lead).

A bare ``Window.orderBy(...)`` moves EVERY row to one partition
("WindowExec: No Partition Defined") — the single worst scale hazard
in a window pipeline: correct at sf0.1, dead at 100 TB.

These helpers express the same total order in two phases, the classic
distributed prefix pattern:

1. **Range-bucket** the rows on the primary sort key: boundaries come
   from one ``percentile_approx`` aggregate (Greenwald–Khanna,
   deterministic) broadcast back as a 1-row cross join; the bucket id
   is a pure higher-order-function expression (ties always share a
   bucket, so bucket order extends to a total order with any
   within-bucket tiebreak).
2. **Per-bucket offsets** — counts / sums / head rows per bucket, a
   tiny aggregate (#buckets rows) whose exclusive prefix is computed
   with a broadcast theta self-join (#buckets² pairs, trivial) and
   broadcast-joined back — turn each bucket-local ``row_number`` /
   running sum into its global value.

The whole computation is ONE lazy plan: no ``collect()``, no separate
quantile job, no driver round trips — Spark runs the boundary and
offset subplans as broadcast-exchange stages inside the single action
that consumes the result. The main pass does ONE hash shuffle on the
bucket id, which parallelizes across the cluster instead of
serializing on a single task.

All keys must be non-null and numeric (castable to double with order
preserved — fine below 2^53, which covers every key in this engine).

Each helper persists its input (tracked, so the registry sweep
releases it): the boundary, offset, and main subplans then share ONE
materialization of the upstream plan — which for callers like the
eval-arm AP is itself a join pipeline — instead of recomputing it per
subtree. That is also the 100 TB posture: cheap rescans of cached
narrow data beat three scans of the raw join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..registry import track_persist

_BUCKET = "_tp_bucket"


def _order(key_col: str, tiebreak_cols: Sequence[str], descending: bool) -> list[Column]:
    head = F.desc(key_col) if descending else F.asc(key_col)
    return [head] + [F.col(c) for c in tiebreak_cols]


def with_range_bucket(
    df: DataFrame,
    key_col: str,
    descending: bool = False,
    n_buckets: int | None = None,
    bucket_col: str = _BUCKET,
) -> DataFrame:
    """Attach a range-bucket id that is monotone non-decreasing along
    the (key_col, descending) sort order; equal keys share a bucket.

    ``percentile_approx`` picks the boundaries as a 1-row aggregate that
    is broadcast-cross-joined back (no driver action); the id is
    ``size(filter(boundaries, b -> b beyond key))`` — a higher-order
    function over a ≤(n_buckets-1)-element array, fully codegen'd.
    """
    df = track_persist(df)
    nb = n_buckets or df.sparkSession.sparkContext.defaultParallelism
    probs = [i / nb for i in range(1, nb)]
    # ONE driver action: the quantile pass doubles as the cache
    # materializer, so the offset/main subplans (which run as
    # concurrent broadcast-exchange stages inside the caller's single
    # action) all read the cache instead of racing to recompute the
    # (often join-heavy) upstream plan. The boundaries become literals,
    # which keeps the bucket id a pure codegen expression.
    bnds = sorted(set(df.stat.approxQuantile(key_col, probs, 1.0 / (10 * nb))))
    if not bnds:
        return df.withColumn(bucket_col, F.lit(0))
    key = F.col(key_col).cast("double")
    # bucket id = #boundaries the key has passed, as a plain sum of
    # comparisons against literals (NOT a filter() higher-order
    # function: a lambda capturing an outer column trips a Catalyst
    # column-pruning bug under the offsets self-join, losing the key
    # attribute from one branch at execution time).
    terms = [
        ((key < F.lit(x)) if descending else (key > F.lit(x))).cast("int")
        for x in bnds
    ]
    bucket = terms[0]
    for t in terms[1:]:
        bucket = bucket + t
    return df.withColumn(bucket_col, bucket)


def bucket_prefix(
    stats: DataFrame,
    cols: dict[str, str],
    totals: dict[str, str] | None = None,
) -> DataFrame:
    """Exclusive prefix sums over a tiny per-bucket aggregate frame.

    ``stats`` has one row per bucket; for each ``value_col -> out_col``
    in ``cols``, emit ``out_col = sum(value_col) over buckets with
    strictly smaller id`` (0 when none); ``totals`` adds grand totals
    as extra columns. Computed with ONE broadcast cross join of the
    tiny frame with itself (#buckets² ≤ ~1k pairs) + conditional
    aggregation — a constant-partition window would fold to Exchange
    SinglePartition and re-trigger the very WindowExec warning this
    module exists to remove.
    """
    earlier = stats.select(
        F.col(_BUCKET).alias("_tp_b2"),
        *[F.col(c).alias(f"_tp_e_{c}") for c in {*cols, *(totals or {})}],
    )
    joined = stats.select(_BUCKET).join(F.broadcast(earlier), how="cross")
    before = F.col("_tp_b2") < F.col(_BUCKET)
    aggs = [
        F.coalesce(F.sum(F.when(before, F.col(f"_tp_e_{c}"))), F.lit(0)).alias(out)
        for c, out in cols.items()
    ]
    for c, out in (totals or {}).items():
        aggs.append(F.sum(f"_tp_e_{c}").alias(out))
    return joined.groupBy(_BUCKET).agg(*aggs)


def global_rank(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = False,
    out_col: str = "rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY key [DESC], tiebreaks)`` without a
    single-partition window: bucket-local row_number + per-bucket count
    offsets. Result column is int (same type as row_number)."""
    b = with_range_bucket(df, key_col, descending, n_buckets)
    stats = b.groupBy(_BUCKET).agg(F.count("*").alias("_tp_cnt"))
    off = bucket_prefix(stats, {"_tp_cnt": "_tp_off"})
    w = Window.partitionBy(_BUCKET).orderBy(*_order(key_col, tiebreak_cols, descending))
    return (
        b.join(F.broadcast(off), _BUCKET)
        .withColumn(out_col, (F.col("_tp_off") + F.row_number().over(w)).cast("int"))
        .drop(_BUCKET, "_tp_off")
    )


def global_cumsum(
    df: DataFrame,
    key_col: str,
    value_col: str | Column,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = False,
    out_col: str = "cum",
    n_buckets: int | None = None,
) -> DataFrame:
    """Running ``sum(value) OVER (ORDER BY key [DESC], tiebreaks ROWS
    UNBOUNDED PRECEDING)`` as bucket-local running sum + per-bucket sum
    offsets."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    b = with_range_bucket(df, key_col, descending, n_buckets).withColumn("_tp_v", val)
    stats = b.groupBy(_BUCKET).agg(F.sum("_tp_v").alias("_tp_s"))
    off = bucket_prefix(stats, {"_tp_s": "_tp_off"})
    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(*_order(key_col, tiebreak_cols, descending))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off), _BUCKET)
        .withColumn(out_col, F.col("_tp_off") + F.sum("_tp_v").over(w))
        .drop(_BUCKET, "_tp_v", "_tp_off")
    )


def global_lead(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: Sequence[str],
    lead_cols: Sequence[str],
    descending: bool = False,
    out_prefix: str = "_next_",
    n_buckets: int | None = None,
) -> DataFrame:
    """``lead(col) OVER (ORDER BY key, tiebreaks)`` for several columns:
    bucket-local lead, with each bucket's trailing row patched from the
    next non-empty bucket's head row (min-by over the tiny heads frame,
    broadcast back)."""
    b = with_range_bucket(df, key_col, descending, n_buckets)
    order = _order(key_col, list(tiebreak_cols), descending)
    # Head row per bucket = first row in sort order. Encode the sort
    # order directly in the struct (negated key for descending) so min()
    # picks the true head even among tied keys.
    key_sort = (-F.col(key_col)).alias("_tp_k") if descending else F.col(key_col).alias("_tp_k")
    # Unique field aliases: a lead col may also be a tiebreak, and
    # duplicate struct field names make `.field` access ambiguous.
    sort_struct = F.struct(
        key_sort,
        *[F.col(t).alias(f"_tp_t{i}") for i, t in enumerate(tiebreak_cols)],
        *[F.col(c).alias(f"_tp_l{i}") for i, c in enumerate(lead_cols)],
    )
    heads = b.groupBy(_BUCKET).agg(F.min(sort_struct).alias("_tp_h"))
    # Next non-empty bucket's head via min_by over a broadcast theta
    # self-join of the tiny heads frame (a constant-partition window
    # would fold to Exchange SinglePartition + the WindowExec warning).
    later = heads.select(F.col(_BUCKET).alias("_tp_b2"), F.col("_tp_h").alias("_tp_h2"))
    nxt = (
        heads.join(F.broadcast(later), F.col("_tp_b2") > F.col(_BUCKET), "left")
        .groupBy(_BUCKET)
        .agg(F.min_by("_tp_h2", "_tp_b2").alias("_tp_nh"))
    )
    w = Window.partitionBy(_BUCKET).orderBy(*order)
    out = b.join(F.broadcast(nxt), _BUCKET, "left")
    for i, c in enumerate(lead_cols):
        out = out.withColumn(
            out_prefix + c, F.coalesce(F.lead(c).over(w), F.col(f"_tp_nh._tp_l{i}"))
        )
    return out.drop(_BUCKET, "_tp_nh")
