"""Streaming CDC apply: a change stream merged into a versioned
parquet table per micro-batch (the Delta "streaming MERGE" pattern).

Each micro-batch is first collapsed to ONE row per key — latest by the
declared ordering columns (a CDC batch can easily carry several
updates to the same key; SQL MERGE would raise, and applying them all
would be order-dependent) — then applied through
sources/upsert.merge_into, inheriting its claim-before-write race and
crash discipline. foreachBatch runs the function exactly once per
batch id on successful checkpointing; a replayed batch after crash
re-merges the same collapsed rows, which is idempotent for CDC upserts
(same keys, same final values), so the table converges to the same
version content.

State is nothing at all: the table IS the state; restart safety comes
from the sink's checkpoint + the idempotent merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.upsert import merge_into


def collapse_latest(updates: DataFrame, on: str, order_cols: list[str]) -> DataFrame:
    """One row per key: the last row under ``order_cols`` (ascending,
    deterministic — include a unique id as the final tiebreak)."""
    w = Window.partitionBy(on).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_merge_sink(
    update_stream: DataFrame,
    table_dir: str,
    on: str,
    order_cols: list[str],
    checkpoint_dir: str,
):
    """Start a foreachBatch query applying the update stream to the
    versioned table at ``table_dir``. Returns the StreamingQuery."""

    def _apply(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        latest = collapse_latest(batch, on, order_cols)
        merge_into(batch.sparkSession, table_dir, latest, on=on)

    return (
        update_stream.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
