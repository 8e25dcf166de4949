"""Streaming OHLC candles: w16 as a NATIVE watermarked windowed
aggregation — no custom state operator at all.

The batch query's whole trick (open/close as min/max over the
(ts_us, event_id, value) struct, exact integer-ppm value sum) is
partial-aggregation-friendly, which is exactly what Structured
Streaming's incremental windowed aggregation needs: each micro-batch
folds into the standing per-(user, window) accumulator with the same
associative merges, so the emitted candle is bit-identical to the
batch one. This is the native-operator-first principle applied to
streams — where a built-in windowed agg can express the semantics,
no applyInPandasWithState is involved and the state store holds one
accumulator row per open window, evicted by the watermark.

Append mode + watermark: a candle emits once, when its window closes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "1 hour"


def streaming_ohlc(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, value, ts) -> one candle per
    (user_id, closed 1-hour window), identical to the batch
    w16_ohlc_candles row for the same bucket."""
    e = (
        event_stream.filter(F.col("value").isNotNull())
        # parquet TIMESTAMP_NTZ -> TimestampType: watermarks require an
        # event-time TimestampType column (session tz pinned UTC makes
        # the hop value-preserving, the j9/w9 rule)
        .withColumn("ets", F.col("ts").cast("timestamp"))
        .withColumn("us", F.unix_micros(F.col("ets")))
        .withColumn(
            "qv", F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
        )
        .withWatermark("ets", WATERMARK)
    )
    first_s = F.min(F.struct("us", "event_id", "value"))
    last_s = F.max(F.struct("us", "event_id", "value"))
    p = F.lit(1e6)
    agg = e.groupBy("user_id", F.window("ets", "1 hour").alias("w")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.floor(first_s.getField("value") * p + F.lit(0.5)) / p).alias("open"),
        (F.floor(F.max("value") * p + F.lit(0.5)) / p).alias("high"),
        (F.floor(F.min("value") * p + F.lit(0.5)) / p).alias("low"),
        (F.floor(last_s.getField("value") * p + F.lit(0.5)) / p).alias("close"),
        F.sum("qv").cast("bigint").alias("sum_value_ppm"),
    )
    return agg.select(
        "user_id",
        (F.unix_micros(F.col("w.start")) / F.lit(3_600_000_000))
        .cast("bigint")
        .alias("bucket"),
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "sum_value_ppm",
    )
