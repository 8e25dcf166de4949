"""Two-phase global ordered computations (rank / cumsum / lead).

A bare ``Window.orderBy(...)`` moves EVERY row to one partition
("WindowExec: No Partition Defined") — the single worst scale hazard
in a window pipeline: correct at sf0.1, dead at 100 TB.

These helpers express the same total order in two phases, the classic
distributed prefix pattern:

1. **Range-bucket** the rows on the primary sort key: boundaries come
   from one ``approxQuantile`` pass, the bucket id is a pure column
   expression (ties always share a bucket, so bucket order extends to
   a total order with any within-bucket tiebreak).
2. **Per-bucket offsets** — counts / sums / maxes per bucket, a tiny
   aggregate (#buckets rows) collected to the driver and re-emitted as
   a literal map — turn each bucket-local ``row_number`` / running sum
   into its global value.

Cost: two lightweight extra passes (quantiles + offsets) and ONE hash
shuffle on the bucket id for the main pass, which parallelizes across
the cluster instead of serializing on a single task.

All keys must be non-null and numeric (castable to double with order
preserved — fine below 2^53, which covers every key in this engine).

Each helper persists its input before the quantile pass (tracked, so
the registry sweep releases it): the three passes then share ONE
materialization of the upstream plan — which for callers like the
eval-arm AP is itself a join pipeline — instead of recomputing it per
pass. That is also the 100 TB posture: two passes over cached narrow
data beat three scans of the raw join.
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

    ``approxQuantile`` (Greenwald–Khanna, deterministic, one pass) picks
    the boundaries; the id is ``size(filter(boundaries, b -> b beyond
    key))`` — a literal-array higher-order function, fully codegen'd.

    The input is persisted (sweep-tracked) so the quantile pass, the
    caller's offsets pass, and the main pass all read one
    materialization of the upstream plan.
    """
    df = track_persist(df)
    nb = n_buckets or df.sparkSession.sparkContext.defaultParallelism
    probs = [i / nb for i in range(1, nb)]
    bnds = sorted(set(df.stat.approxQuantile(key_col, probs, 1.0 / (10 * nb))))
    if not bnds:
        return df.withColumn(bucket_col, F.lit(0))
    arr = F.lit(bnds)
    key = F.col(key_col).cast("double")
    if descending:
        bucket = F.size(F.filter(arr, lambda b: b > key))
    else:
        bucket = F.size(F.filter(arr, lambda b: b < key))
    return df.withColumn(bucket_col, bucket)


def _offset_map(pairs: dict[int, float | int], default: float | int = 0) -> Column:
    """bucket id -> offset as a literal map lookup (<= n_buckets
    entries, no join needed)."""
    if not pairs:
        return F.lit(default)
    flat: list[Column] = []
    for k, v in pairs.items():
        flat += [F.lit(k), F.lit(v)]
    return F.coalesce(F.element_at(F.create_map(*flat), F.col(_BUCKET)), F.lit(default))


def _exclusive_prefix(per_bucket: dict[int, float | int]) -> dict[int, float | int]:
    out: dict[int, float | int] = {}
    acc: float | int = 0
    for b in sorted(per_bucket):
        out[b] = acc
        acc += per_bucket[b]
    return out


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
    counts = {
        r[_BUCKET]: r["cnt"]
        for r in b.groupBy(_BUCKET).agg(F.count("*").alias("cnt")).collect()
    }
    off = _offset_map(_exclusive_prefix(counts))
    w = Window.partitionBy(_BUCKET).orderBy(*_order(key_col, tiebreak_cols, descending))
    return b.withColumn(
        out_col, (off + F.row_number().over(w)).cast("int")
    ).drop(_BUCKET)


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
    sums = {
        r[_BUCKET]: r["s"]
        for r in b.groupBy(_BUCKET).agg(F.sum("_tp_v").alias("s")).collect()
    }
    off = _offset_map(_exclusive_prefix(sums))
    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(*_order(key_col, tiebreak_cols, descending))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.withColumn(out_col, off + F.sum("_tp_v").over(w)).drop(_BUCKET, "_tp_v")


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
    next non-empty bucket's head row (a #buckets-sized driver pass)."""
    b = with_range_bucket(df, key_col, descending, n_buckets)
    order = _order(key_col, list(tiebreak_cols), descending)
    # Head row per bucket = min/max struct in sort order.
    sort_struct = F.struct(key_col, *tiebreak_cols, *lead_cols)
    agg = F.min(sort_struct) if not descending else F.max(sort_struct)
    heads = {
        r[_BUCKET]: r["h"] for r in b.groupBy(_BUCKET).agg(agg.alias("h")).collect()
    }
    # next_head[b] = head of the first non-empty bucket after b.
    next_head: dict[int, object] = {}
    pending: list[int] = []
    for bid in sorted(heads):
        for p in pending:
            next_head[p] = heads[bid]
        pending = [bid]
    w = Window.partitionBy(_BUCKET).orderBy(*order)
    out = b
    for c in lead_cols:
        patch = _offset_map({k: v[c] for k, v in next_head.items()}, default=None)
        out = out.withColumn(
            out_prefix + c, F.coalesce(F.lead(c).over(w), patch)
        )
    return out.drop(_BUCKET)
