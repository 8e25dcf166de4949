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
activity days inside the retention horizon: the operator registers an
event-time watermark (``WATERMARK_DELAY``) and, after folding each
micro-batch, evicts days at or below ``watermark_day - WINDOW_DAYS``
from the array — a retained day d' only affects the coverage of a new
day d when d' > d - WINDOW_DAYS, and the watermark contract bounds
new days to d >= watermark_day, so evicted days can never mint a new
covered day. State is therefore O(delay + window) distinct days per
active user, not the user's full history. Same ordering contract as
the other stateful operators here: per-user event-time order across
micro-batches.

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
WATERMARK_DELAY = "1 day"
_DAY_MS = 86_400_000

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
        # coverage is built ONCE per micro-batch and maintained
        # incrementally: each new day contributes exactly its
        # not-yet-covered slice of range(d, d + W), so a batch with k
        # new days costs O(|days| * W + k * W), not O(k * |days| * W)
        cov = _coverage(days)
        for day in p["day"]:
            day = int(day)
            if day in days:
                continue
            days.add(day)
            out.append((user_id, "dau", day))
            for cd in range(day, day + WINDOW_DAYS):
                if cd not in cov:
                    cov.add(cd)
                    out.append((user_id, "wau", cd))
    # watermark eviction: a retained day d' only affects a new day d
    # when d' > d - WINDOW_DAYS, and the watermark bounds new days to
    # d >= wm_day — so days at or below wm_day - WINDOW_DAYS are dead
    # weight and are dropped, keeping state O(delay + window) per user
    try:
        wm_ms = state.getCurrentWatermarkMs()
    except Exception:  # batch-mode harnesses without a watermark
        wm_ms = 0
    if wm_ms > 0:
        horizon = wm_ms // _DAY_MS - WINDOW_DAYS
        days = {d for d in days if d > horizon}
    if days:
        state.update((sorted(days),))
    elif state.exists:
        state.remove()
    if out:
        yield pd.DataFrame(out, columns=["user_id", "kind", "day"])


def streaming_active_users(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts) -> at most one
    (user_id, 'dau', day) and one (user_id, 'wau', day) row each;
    groupBy(kind, day).count() over all emissions equals the batch
    w24_active_users dau/wau columns."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = (
        event_stream.select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        .withWatermark("ts", WATERMARK_DELAY)
        .select(
            "user_id",
            "event_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _fold_batch,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
