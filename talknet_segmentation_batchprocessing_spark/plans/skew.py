"""Skew mitigation (SURVEY.md §4: the long-video / hot-key straggler).

AQE's skew-join handling covers sort-merge joins automatically
(enabled in session.get_spark); these helpers cover the cases AQE
does not: skewed aggregations and skewed windows, via explicit
salting — partial aggregate on (key, salt), then final merge on key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt from a stable row hash (no rand(): reruns and
    retried tasks must agree), spreading each hot key over n_salts
    subkeys."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates
    (sum/count/min/max): partial on (keys, salt), final on keys.

    ``aggs`` maps output name -> aggregate over the INPUT columns; the
    same aggregate must be re-applicable to its own partials (sum→sum,
    count→sum, min→min, max→max) — pass ``final_aggs`` semantics via
    these four; avg should be expressed as sum+count.
    """
    partial = df.transform(with_salt, n_salts).groupBy(*group_cols, "_salt").agg(
        *[a.alias(n) for n, a in aggs.items()]
    )
    remerge = {
        n: (F.sum(n) if "count" in n or "sum" in n else F.max(n) if "max" in n else F.min(n) if "min" in n else F.sum(n))
        for n in aggs
    }
    return partial.groupBy(*group_cols).agg(*[c.alias(n) for n, c in remerge.items()])


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key equi-join: replicate the small side across salts and
    join on (keys, salt) so one hot key spreads over n_salts tasks.
    (Only needed when the small side is too big for a plain broadcast
    but the key histogram is skewed; with a true dim table, plain
    ``F.broadcast`` wins.)"""
    keys = list(on)
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    small_rep = small.crossJoin(F.broadcast(salts))
    big_s = with_salt(big, n_salts)
    return big_s.join(small_rep, keys + ["_salt"]).drop("_salt")
