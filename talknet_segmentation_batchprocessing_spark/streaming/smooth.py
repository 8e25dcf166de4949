"""Stateful streaming smoothers: w18_ema_decay and w19_forward_fill
as continuous operators.

Both batch queries are CAUSAL — each row's output depends only on its
own and EARLIER rows of the same user — so their streaming twins carry
exactly the batch fold's lookback as per-user ``GroupState``:

- forward fill: the last observed non-null value (1 double + 1 flag);
- EMA: the last up-to-8 observed values in order (a fixed ring of 8
  doubles + a count) — the batch window frame IS the state.

Same per-user event-time-order contract as streaming/funnel.py and
throttle.py (out-of-order delivery needs a watermark + sort buffer in
front); within a micro-batch, chunks are concatenated then sorted once
(the funnel chunk-order lesson). State is O(1) per user by
construction for both.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_HORIZON = 8  # = w18's window

FFILL_OUTPUT_SCHEMA = (
    "user_id long, event_id long, value_raw double, value_filled double,"
    " was_filled boolean"
)
FFILL_STATE_SCHEMA = "has_obs boolean, last double"

EMA_OUTPUT_SCHEMA = "user_id long, event_id long, n_in_window long, ema double"
# fixed ring: count + 8 slots (slot 0 = oldest of the window)
EMA_STATE_SCHEMA = "n long, " + ", ".join(f"v{i} double" for i in range(EMA_HORIZON))


def _ffill_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    has_obs, last = state.get if state.exists else (False, 0.0)
    chunks = list(pdfs)
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        rows = []
        for eid, v in zip(p["event_id"], p["v"]):
            raw = None if pd.isna(v) else float(v)
            if raw is not None:
                has_obs, last = True, raw
            rows.append(
                (
                    user_id,
                    int(eid),
                    raw,
                    last if has_obs else None,
                    raw is None and has_obs,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "event_id",
                "value_raw",
                "value_filled",
                "was_filled",
            ],
        )
    state.update((has_obs, last))


def streaming_forward_fill(event_stream: DataFrame) -> DataFrame:
    """events stream -> one row per event with the batch
    ``w19_forward_fill`` columns (same synthesized event_id % 7 gaps)."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _ffill_group,
        outputStructType=FFILL_OUTPUT_SCHEMA,
        stateStructType=FFILL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ema_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        st = state.get
        n, ring = int(st[0]), list(st[1:])
    else:
        n, ring = 0, [0.0] * EMA_HORIZON
    window = ring[:n]  # oldest -> newest
    chunks = list(pdfs)
    if chunks:
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        rows = []
        for eid, v in zip(p["event_id"], p["value"]):
            if pd.isna(v):  # batch twin filters nulls before windowing
                continue
            window.append(float(v))
            if len(window) > EMA_HORIZON:
                window.pop(0)
            # identical fold to the batch query: acc/2 + x, oldest first
            acc = 0.0
            for x in window:
                acc = acc / 2 + x
            norm = 2.0 - 2.0 ** (1 - len(window))
            rows.append((user_id, int(eid), len(window), acc / norm))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "n_in_window", "ema"]
            )
    n = len(window)
    ring = window + [0.0] * (EMA_HORIZON - n)
    state.update(tuple([n] + ring))


def streaming_ema_decay(event_stream: DataFrame) -> DataFrame:
    """events stream -> one row per non-null-value event with the batch
    ``w18_ema_decay`` columns; the ring of the last 8 observations is
    the only state."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _ema_group,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
