"""Stateful streaming funnel: w12's view -> click -> purchase tracker.

Per-user state is exactly the batch fold's accumulator — three
timestamps (micros) — so the streaming operator IS the batch
algorithm with the fold's accumulator promoted to ``GroupState``:
each micro-batch folds its (sorted) events into the standing
(t1, t2, t3) with the identical strict-after rules, and a row is
emitted whenever the user's reached stage ADVANCES (stage-1 'entered
funnel', 2 'clicked', 3 'converted'). O(3 longs) state per user, no
watermark needed for the state itself (it only ever fills in).

Same ordering caveat as stateful_segments: events must arrive
in event-time order per user across micro-batches (within a batch
they are sorted here); out-of-order delivery needs a watermark +
sort buffer in front.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, stage int, t1_us long, t2_us long, t3_us long"
STATE_SCHEMA = "t1 long, t2 long, t3 long"

_STEPS = ("view", "click", "purchase")


def _fold_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        t1, t2, t3 = state.get
    else:
        t1, t2, t3 = None, None, None

    def stage():
        return sum(t is not None for t in (t1, t2, t3))

    before = stage()
    # applyInPandasWithState delivers ONE group's micro-batch rows as
    # multiple arrow chunks (maxRecordsPerBatch); sorting each chunk
    # independently would fold a later-chunk 'view' after an
    # earlier-chunk 'click' out of time order. Concatenate first, sort
    # once — per-user event counts are small by the same O(3 longs)
    # state argument, so the combined frame is bounded.
    chunks = list(pdfs)
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_type"])
        for us, typ in zip(p["us"], p["event_type"]):
            us = int(us)
            # identical strict-after rules as the batch fold
            if t1 is None and typ == "view":
                t1 = us
            elif t2 is None and t1 is not None and typ == "click" and us > t1:
                t2 = us
            elif t3 is None and t2 is not None and typ == "purchase" and us > t2:
                t3 = us
    state.update((t1, t2, t3))
    after = stage()
    if after > before:
        yield pd.DataFrame(
            [(user_id, after, t1, t2, t3)],
            columns=["user_id", "stage", "t1_us", "t2_us", "t3_us"],
        )


def streaming_funnel(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_type, ts timestamp) -> a row per
    user each time their funnel stage advances; the latest row per
    user equals the batch ``w12_funnel_steps`` result."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.filter(F.col("event_type").isin(list(_STEPS))).select(
        "user_id",
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
