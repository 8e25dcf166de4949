"""Streaming SCD2: u7_scd2_history's dimension-history build as an
online operator.

Per-user state is the OPEN validity interval — (current attribute
value, valid_from_us, event count, version counter) — exactly what the
batch gaps-and-islands spine carries forward row to row: each arriving
event either extends the open interval (same attribute) or CLOSES it —
emitting the finished [valid_from, valid_to) row — and opens the next
one. The emitted closed rows equal the batch ``u7_scd2_history`` rows
with ``is_current = false``; the one open interval per user lives in
state (it is the batch query's ``is_current = true`` row, final only
when the stream ends — a dimension table's current row is by nature
unfinished).

O(4 scalars) state per user, no watermark needed: state only ever
replaces itself (the same bound class as streaming/transitions.py).
Same ordering contract as the other stateful operators: per-user
(event-time, event_id) order across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, version long, event_type string, "
    "valid_from_us long, valid_to_us long, n_events long"
)
STATE_SCHEMA = "cur_type string, from_us long, n_events long, version long"


def _fold_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    cur = state.get if state.exists else None  # (type, from_us, n, ver)

    out: list[tuple] = []
    chunks = list(pdfs)
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        for us, typ in zip(p["us"], p["event_type"]):
            us = int(us)
            if cur is None:
                cur = (typ, us, 1, 1)
            elif typ == cur[0]:
                cur = (cur[0], cur[1], cur[2] + 1, cur[3])
            else:
                out.append((user_id, cur[3], cur[0], cur[1], us, cur[2]))
                cur = (typ, us, 1, cur[3] + 1)
    if cur is not None:
        state.update(tuple(cur))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "version",
                "event_type",
                "valid_from_us",
                "valid_to_us",
                "n_events",
            ],
        )


def streaming_scd2(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, event_type, ts) -> one row per
    CLOSED validity interval; equals batch u7_scd2_history rows with
    is_current = false. The open interval per user stays in state."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _fold_batch,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# full changelog variant + versioned-table sink: the complete streaming
# dimension-maintenance story
# ---------------------------------------------------------------------------

# valid_to_us of a still-open interval. Arrow-safe: a nullable long
# with per-row None degrades to float64 through pandas, so the open
# row carries a sentinel instead of NULL. Long.MIN_VALUE sits outside
# any representable unix_micros timestamp (including pre-1970, where
# unix_micros is legitimately negative — -1 would collide with an
# interval closed at 1969-12-31T23:59:59.999999).
OPEN_SENTINEL = -(2**63)


def _fold_batch_full(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Like _fold_batch, but ALSO emits the user's batch-end OPEN
    interval (valid_to_us = OPEN_SENTINEL) whenever the batch touched
    this user — an upsert record for the dimension table's current
    row. Keys (user_id, version) are unique within a batch: versions
    closed in-batch emit once as closed, and the single open version
    is distinct from all of them."""
    (user_id,) = key
    cur = state.get if state.exists else None

    out: list[tuple] = []
    chunks = list(pdfs)
    touched = False
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        touched = len(p) > 0
        for us, typ in zip(p["us"], p["event_type"]):
            us = int(us)
            if cur is None:
                cur = (typ, us, 1, 1)
            elif typ == cur[0]:
                cur = (cur[0], cur[1], cur[2] + 1, cur[3])
            else:
                out.append((user_id, cur[3], cur[0], cur[1], us, cur[2]))
                cur = (typ, us, 1, cur[3] + 1)
    if cur is not None:
        state.update(tuple(cur))
        if touched:
            out.append(
                (user_id, cur[3], cur[0], cur[1], OPEN_SENTINEL, cur[2])
            )
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "version",
                "event_type",
                "valid_from_us",
                "valid_to_us",
                "n_events",
            ],
        )


def streaming_scd2_changelog(event_stream: DataFrame) -> DataFrame:
    """events stream -> SCD2 changelog: closed intervals (final) plus
    the updated open interval per touched user per batch. Merged into
    a table keyed (user_id, version), the table converges to exactly
    the batch ``u7_scd2_history`` output."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _fold_batch_full,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scd2_merge_sink(
    changelog: DataFrame, table_dir: str, checkpoint_dir: str
):
    """Start a foreachBatch query merging the SCD2 changelog into the
    versioned parquet table at ``table_dir`` keyed (user_id, version).
    Closed rows are immutable once written; open rows are overwritten
    by later open-row updates and finally by their closing row —
    replayed batches re-merge the same keys to the same values, so the
    sink is idempotent (the cdc_sink crash discipline). Returns the
    StreamingQuery."""
    from ..sources.upsert import merge_into

    def _apply(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        keyed = batch.withColumn(
            "uid_ver",
            F.concat_ws(":", F.col("user_id"), F.col("version")),
        )
        merge_into(batch.sparkSession, table_dir, keyed, on="uid_ver")

    return (
        changelog.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
