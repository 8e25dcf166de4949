"""Stateful streaming as-of enrichment — the streaming sibling of the
batch ``j9_asof_join`` (queries/joins.py): every click is emitted with
the user's most recent STRICTLY-prior view, using
``applyInPandasWithState`` to carry the last-seen view per user across
micro-batches.

State is O(1) per user (one id + one timestamp); a click arriving in
micro-batch N matches a view from any earlier batch. Within each
micro-batch rows are processed in event-time order with clicks before
views at equal timestamps — the exact tie rule of the batch operator
(a view at the click's own timestamp is NOT prior). Ties among views
at the same timestamp keep the max event_id, mirroring the batch
dedup. Out-of-order arrival ACROSS batches can't retro-match (the
already-emitted click is immutable) — same contract as the other
stateful operators here: in-order per key, or put a watermark + sort
stage in front.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts double, prior_view_id long, gap_s double"
)
STATE_SCHEMA = "last_view_id long, last_view_ts double"


def _enrich_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        lv_id, lv_ts = state.get
    else:
        lv_id, lv_ts = None, None
    out = []
    for pdf in pdfs:
        p = pdf.copy()
        # clicks (0) before views (1) at equal ts => strict priority
        p["_tag"] = (p["event_type"] == "view").astype(int)
        p = p.sort_values(["ts", "_tag", "event_id"])
        for r in p.itertuples():
            ts = float(r.ts)
            if r.event_type == "view":
                if (
                    lv_ts is None
                    or ts > lv_ts
                    or (ts == lv_ts and int(r.event_id) > lv_id)
                ):
                    lv_id, lv_ts = int(r.event_id), ts
            elif r.event_type == "click":
                if lv_ts is not None and lv_ts < ts:
                    # Exact-integer-microsecond rounding, mirroring the
                    # batch twin j9_asof_join (round 3): the double-
                    # seconds form floor((ts-lv_ts)*1e3+0.5)/1e3 flips
                    # in the last ulp on half-millisecond gaps, because
                    # the SUBTRACTION is inexact. Both timestamps are
                    # exact microseconds, so convert each to integer us
                    # first; the difference and the half-up millisecond
                    # rounding are then exact integer arithmetic.
                    us_gap = round(ts * 1e6) - round(lv_ts * 1e6)
                    gap = ((us_gap + 500) // 1000) / 1e3
                    out.append((user_id, int(r.event_id), ts, lv_id, gap))
                else:
                    out.append((user_id, int(r.event_id), ts, None, None))
    if lv_ts is not None:
        state.update((lv_id, lv_ts))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "prior_view_id", "gap_s"]
        )


def stateful_enrich_latest(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, event_type, ts[double seconds])
    -> enriched click stream with the latest strictly-prior view."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    return event_stream.groupBy("user_id").applyInPandasWithState(
        _enrich_batch,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
