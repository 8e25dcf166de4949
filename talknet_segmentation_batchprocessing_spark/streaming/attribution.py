"""Stateful streaming multi-touch attribution: w21's credit assignment
as an online operator.

Per-user state is the pending-touch buffer — exactly the information
the batch query's forward-min window carries implicitly: every touch
(view/click/signup) waits for the user's NEXT purchase. On a purchase,
all buffered touches within the 7-day lookback receive linear 1/k
credit (integer ppm, the batch grid) and the buffer clears (a touch
binds to its next purchase ONLY, exactly like the batch frame that
starts at 1 FOLLOWING); touches older than 7 days relative to the
user's newest event can never earn credit and are evicted, so state is
bounded by one lookback window of touches per user.

Emission unit: one row per (conversion, channel) with the channel's
touch count, summed ppm credit, and whether the channel owns the
first/last touch — a downstream ``groupBy(event_type)`` of all
emissions reproduces the batch ``w21_attribution_linear`` totals
(tests/test_streaming_parity.py pins this).

Same ordering caveat as the other stateful operators: events must
arrive in (event-time, event_id) order per user ACROSS micro-batches
(within a batch they are sorted here); out-of-order delivery needs a
watermark + sort buffer in front.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, conv_us long, event_type string, "
    "n_touches long, credit_ppm long, first_touch boolean, last_touch boolean"
)
STATE_SCHEMA = "touch_us array<long>, touch_type array<string>"

WINDOW_US = 7 * 86_400_000_000  # the batch query's 7-day lookback
TOUCH_TYPES = ("view", "click", "signup")


def _credit_ppm(k: int) -> int:
    """Round-half-up 1e6 / k — the batch query's integer grid."""
    return (2 * 1_000_000 + k) // (2 * k)


def _fold_batch(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        t_us, t_ty = list(state.get[0]), list(state.get[1])
    else:
        t_us, t_ty = [], []

    out: list[tuple] = []
    chunks = list(pdfs)
    if chunks:
        # concat-before-sort (the funnel chunk-order rule): arrow may
        # deliver one group's batch as several chunks
        p = pd.concat(chunks).sort_values(["us", "event_id"])
        for us, eid, typ in zip(p["us"], p["event_id"], p["event_type"]):
            us = int(us)
            if typ in TOUCH_TYPES:
                t_us.append(us)
                t_ty.append(typ)
            elif typ == "purchase":
                eligible = [
                    (u, ty)
                    for u, ty in zip(t_us, t_ty)
                    if us - u <= WINDOW_US
                ]
                if eligible:
                    k = len(eligible)
                    ppm = _credit_ppm(k)
                    # buffer is already in (us, event_id) arrival order,
                    # so endpoints are positional
                    first_ty = eligible[0][1]
                    last_ty = eligible[-1][1]
                    per_ch: dict[str, list] = {}
                    for _, ty in eligible:
                        per_ch.setdefault(ty, [0, 0])[0] += 1
                        per_ch[ty][1] += ppm
                    for ty, (n, total_ppm) in sorted(per_ch.items()):
                        out.append(
                            (
                                user_id,
                                us,
                                ty,
                                n,
                                total_ppm,
                                ty == first_ty,
                                ty == last_ty,
                            )
                        )
                # every pending touch bound to THIS purchase (eligible
                # or expired) — next-purchase-only semantics
                t_us, t_ty = [], []
            # evict unreachable touches: older than the lookback behind
            # the newest event time ever seen for this user
            while t_us and us - t_us[0] > WINDOW_US:
                t_us.pop(0)
                t_ty.pop(0)

    state.update((t_us, t_ty))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "conv_us",
                "event_type",
                "n_touches",
                "credit_ppm",
                "first_touch",
                "last_touch",
            ],
        )


def streaming_attribution(event_stream: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, event_type, ts) -> one row per
    (conversion, channel) with linear ppm credit + endpoint flags; the
    groupBy(event_type) rollup of all emissions equals the batch
    ``w21_attribution_linear``."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(event_stream)
    e = event_stream.filter(
        F.col("event_type").isin([*TOUCH_TYPES, "purchase"])
    ).select(
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
