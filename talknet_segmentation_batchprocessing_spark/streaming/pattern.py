"""Stateful streaming CEP: w15's ERROR CLICK+ PURCHASE pattern.

The batch operator (queries/windows.w15_event_pattern) finds the
pattern as maximal click runs with an error predecessor and purchase
successor. The equivalent ONLINE state machine per user is tiny — the
current partial match ``(err_us, n_clicks)``:

- ``error``    -> start a new partial (the run will attach to the LAST
                  error before the clicks, which is exactly what the
                  batch predecessor-join picks);
- ``click``    -> extend the partial's click count;
- ``purchase`` -> if the partial has >= 1 click, EMIT the match and
                  clear (AFTER MATCH SKIP PAST LAST ROW), else clear;
- anything else (view/search/signup/null) -> clear — contiguity is
  the pattern's requirement, so any interleaved symbol breaks it.

O(2 longs) state per user; a match row is emitted the moment its
closing purchase arrives. Same cross-batch ordering caveat as the
other stateful siblings: events must arrive in event-time order per
user across micro-batches (within a batch they are sorted here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_clicks long, span_us long"
)
STATE_SCHEMA = "err_us long, n_clicks long"


def _fold_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        err_us, n_clicks = state.get
    else:
        err_us, n_clicks = None, 0

    out = []
    chunks = list(pdfs)
    if chunks:
        # one group's micro-batch may span several arrow chunks —
        # concatenate BEFORE sorting (the funnel's round-4 lesson);
        # (us, event_id) mirrors the batch row_number ordering
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        for us, typ in zip(p["us"], p["event_type"]):
            us = int(us)
            if typ == "error":
                err_us, n_clicks = us, 0
            elif typ == "click":
                if err_us is not None:
                    n_clicks += 1
            elif typ == "purchase":
                if err_us is not None and n_clicks >= 1:
                    out.append(
                        (user_id, err_us, us, n_clicks, us - err_us)
                    )
                err_us, n_clicks = None, 0
            else:
                err_us, n_clicks = None, 0
    state.update((err_us, n_clicks))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "start_us", "end_us", "n_clicks", "span_us"],
        )


def streaming_event_pattern(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, event_type, ts) -> one row per
    completed ERROR CLICK+ PURCHASE match, equal to the batch
    ``w15_event_pattern`` rows."""
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
