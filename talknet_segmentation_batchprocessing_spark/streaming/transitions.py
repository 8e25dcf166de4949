"""Stateful streaming transition extraction: w22's Markov pair counts
as an online operator.

Per-user state is one tuple — the last seen event's (us, event_id,
event_type) — exactly the information the batch lead() window carries:
each arriving event emits the (src, dst) transition from the remembered
predecessor and becomes the new predecessor. The downstream
``groupBy(src, dst).count()`` of all emissions equals the batch
``w22_markov_transitions`` pair counts (the probability normalization
is a stateless projection over those counts).

O(3 scalars) state per user, no watermark needed (state only ever
replaces itself). Same ordering caveat as the other stateful
operators: per-user (event-time, event_id) order across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, src string, dst string, dst_us long"
STATE_SCHEMA = "last_us long, last_eid long, last_type string"


def _fold_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    last = state.get if state.exists else None

    out: list[tuple] = []
    chunks = list(pdfs)
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        for us, eid, typ in zip(p["us"], p["event_id"], p["event_type"]):
            us, eid = int(us), int(eid)
            if last is not None:
                out.append((user_id, last[2], typ, us))
            last = (us, eid, typ)
    if last is not None:
        state.update(tuple(last))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "src", "dst", "dst_us"])


def streaming_transitions(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, event_type, ts) -> one row per
    consecutive per-user event pair; groupBy(src, dst).count() over all
    emissions equals the batch w22 pair counts."""
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
