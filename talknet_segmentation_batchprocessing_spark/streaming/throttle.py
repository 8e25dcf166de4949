"""Stateful streaming rate limiter: w17_rate_limit's per-event
verdict as a continuous operator.

The batch query's decision for an event is a pure function of
(user, event-time bucket, arrival rank within the bucket) — so the
streaming operator carries exactly that accumulator as per-user
``GroupState``: the bucket currently being filled and how many events
it has admitted. Events arrive in event-time order per user (same
contract as streaming/funnel.py; out-of-order delivery needs a
watermark + sort buffer in front), so buckets only ever advance:
state is O(2 longs) per user regardless of stream length, and a
bucket's counter resets the moment the first event of the next bucket
arrives.

Emits one verdict row per event (kept / dropped + the rank that
decided it); aggregating verdicts per user reproduces the batch
w17_rate_limit report exactly (tests/test_streaming_parity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_N = 3  # admitted events per (user, bucket) — w17's constant
BUCKET_US = 600_000_000  # 10-minute tumbling buckets — w17's constant

OUTPUT_SCHEMA = (
    "user_id long, event_id long, bucket long, rn long, kept boolean"
)
STATE_SCHEMA = "bucket long, n long"


def _throttle_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        cur_bucket, n = state.get
    else:
        cur_bucket, n = None, 0

    # Concatenate ALL arrow chunks before sorting (the funnel
    # chunk-order lesson): ranks must follow (us, event_id) across the
    # whole micro-batch, not per chunk.
    chunks = list(pdfs)
    out_uid, out_eid, out_bucket, out_rn, out_kept = [], [], [], [], []
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        for us, eid in zip(p["us"], p["event_id"]):
            bucket = int(us) // BUCKET_US
            if cur_bucket is None or bucket != cur_bucket:
                cur_bucket, n = bucket, 0
            n += 1
            out_uid.append(user_id)
            out_eid.append(int(eid))
            out_bucket.append(bucket)
            out_rn.append(n)
            out_kept.append(n <= RATE_N)
    state.update((cur_bucket if cur_bucket is not None else -1, n))
    if out_uid:
        yield pd.DataFrame(
            {
                "user_id": pd.Series(out_uid, dtype="int64"),
                "event_id": pd.Series(out_eid, dtype="int64"),
                "bucket": pd.Series(out_bucket, dtype="int64"),
                "rn": pd.Series(out_rn, dtype="int64"),
                "kept": pd.Series(out_kept, dtype="bool"),
            }
        )


def streaming_rate_limit(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts timestamp) -> one verdict
    row per event. Per-user aggregation of the verdicts equals the
    batch ``w17_rate_limit`` report."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _throttle_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
