"""Watermarked stream-stream interval join — the last §2.9 streaming
family the engine lacked: TWO live streams joined on key + time range,
with watermarks bounding both sides' state.

Semantics (the attribution shape every event pipeline needs): each
click joins every view by the SAME user whose event time falls in
``[click_ts - max_lag, click_ts)`` — strictly prior, mirroring the
as-of tie rule of ``j9_asof_join``/streaming/enrich.py, but keeping
ALL views in the window instead of only the latest (that makes it a
genuine stream-stream join rather than a keyed-state lookup).

Spark-first: this is exactly the built-in watermarked interval join
(both inputs ``withWatermark``, join condition = key equality + event
-time range). Spark derives the state-retention bound from the range
itself — view state older than ``max_lag + watermark`` is evicted, so
executor state is O(events inside the lag window), never O(stream).
Inner join by default; ``how='left_outer'`` emits unmatched clicks
once their watermark passes — supported because both sides are
watermarked AND the condition carries the time bound.

The batch twin (:func:`batch_interval_join`) runs the identical
condition as a plain join for row-for-row parity tests on the driver
events table (tests/test_streaming_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_LAG_S = 300
DEFAULT_WATERMARK = "10 minutes"


def _cond(max_lag_s: int):
    return F.expr(
        f"c_user = v_user AND v_ts >= c_ts - INTERVAL {int(max_lag_s)} SECONDS "
        "AND v_ts < c_ts"
    )


def _prep(clicks: DataFrame, views: DataFrame, watermark: str):
    # watermarks require TIMESTAMP (not TIMESTAMP_NTZ): hop the cast —
    # value-preserving with the session tz pinned UTC; applied on the
    # batch twin too so both sides compute on identical values
    def side(df, key, id_alias, ts_alias):
        out = df.select(
            F.col("user_id").alias(key),
            F.col("event_id").alias(id_alias),
            F.col("ts").cast("timestamp").alias(ts_alias),
        )
        return out.withWatermark(ts_alias, watermark) if df.isStreaming else out

    return (
        side(clicks, "c_user", "click_id", "c_ts"),
        side(views, "v_user", "view_id", "v_ts"),
    )


def _project(joined: DataFrame) -> DataFrame:
    # integer-microsecond lag (the engine's timestamp-delta convention:
    # exact on both any-engine twin and here, no double-seconds ulp)
    lag_us = (
        F.unix_micros(F.col("c_ts")) - F.unix_micros(F.col("v_ts"))
    ).cast("bigint")
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.col("view_id"),
        lag_us.alias("lag_us"),
    )


def stream_interval_join(
    clicks: DataFrame,
    views: DataFrame,
    max_lag_s: int = DEFAULT_MAX_LAG_S,
    watermark: str = DEFAULT_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames (schema: user_id, event_id, ts) —
    every (click, strictly-prior view within max_lag) pair."""
    c, v = _prep(clicks, views, watermark)
    # how='left_outer': unmatched clicks surface with null view_id/lag
    # once the view-side watermark passes c_ts
    return _project(c.join(v, _cond(max_lag_s), how))


def batch_interval_join(
    clicks: DataFrame, views: DataFrame, max_lag_s: int = DEFAULT_MAX_LAG_S
) -> DataFrame:
    """The batch twin: identical condition, plain join. At scale this
    is the j10 chunking rewrite's territory; for parity tests the
    direct form is the ground truth."""
    c, v = _prep(clicks, views, watermark="")
    return _project(c.join(v, _cond(max_lag_s)))
