"""Stateful streaming engagement counters: w24's DAU/WAU as an online
operator.

Per-user state is the set of distinct ACTIVITY DAYS seen so far —
exactly the deduped (user, day) frame the batch query builds first.
Each arriving event that opens a NEW activity day for its user emits
one ('dau', day) increment plus one ('wau', cov_day) increment for
every trailing-window day the new activity newly covers (days already
covered by the user's other activity days emit nothing — the
batch query's second DISTINCT). Because every (user, kind, day) emits
AT MOST ONCE, the plain ``groupBy(kind, day).count()`` of all
emissions equals the batch ``w24_active_users`` DAU and WAU columns
exactly; stickiness is a stateless projection over those counts.

State is one int array per user, bounded by the user's distinct
activity days inside the retention horizon; production deployments
evict days older than watermark - window from the array (they can
never mint a new covered day), keeping state O(window) per active
user. Same ordering contract as the other stateful operators here:
per-user event-time order across micro-batches.

Cites: batch twin queries/windows.py w24_active_users (the
coverage-explode rule this operator implements incrementally).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINDOW_DAYS = 7

OUTPUT_SCHEMA = "user_id long, kind string, day long"
STATE_SCHEMA = "days array<long>"


def _coverage(days: set[int]) -> set[int]:
    out: set[int] = set()
    for d in days:
        out.update(range(d, d + WINDOW_DAYS))
    return out


def _fold_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    days: set[int] = set(state.get[0]) if state.exists else set()

    out: list[tuple] = []
    chunks = list(pdfs)
    if chunks:
        p = pd.concat(chunks).sort_values(["day", "event_id"])
        for day in p["day"]:
            day = int(day)
            if day in days:
                continue
            before = _coverage(days)
            days.add(day)
            out.append((user_id, "dau", day))
            for cd in sorted(_coverage(days) - before):
                out.append((user_id, "wau", cd))
    if days:
        state.update((sorted(days),))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "kind", "day"])


def streaming_active_users(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts) -> at most one
    (user_id, 'dau', day) and one (user_id, 'wau', day) row each;
    groupBy(kind, day).count() over all emissions equals the batch
    w24_active_users dau/wau columns."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        ),
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _fold_batch,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
