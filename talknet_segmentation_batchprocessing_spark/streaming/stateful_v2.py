"""Spark 4 ``transformWithStateInPandas`` segmentation — the modern
stateful-processor API sibling of streaming/stateful.py.

Same semantics, different surface: ``applyInPandasWithState`` hands
each micro-batch a GroupState to read/write; the Spark 4 API inverts
control — a ``StatefulProcessor`` object owns typed state handles
(ValueState here) created in ``init`` and receives per-key row
batches in ``handleInputRows``. The processor form composes better
(multiple typed states, timers, TTL) and is the API Spark is moving
stateful work to; both are kept because the v1 operator runs on any
state store while this one requires the RocksDB provider
(``spark.sql.streaming.stateStore.providerClass``) AND a working
``google.protobuf`` (the state-IPC wire format — absent in this test
image, so the end-to-end tests are skip-gated and the processor logic
is pinned against the v1 kernel through a fake state handle).

Run semantics (identical to stateful.py, mirror of the batch W1
operator): an island is a maximal run of speaking ROWS, a closed run
is kept iff its SPAN (exclusive end - start) >= min_frames, frames at
or before the last processed frame are dropped as duplicate
deliveries, and open runs persist across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import IntegerType, StructField, StructType

OUTPUT_SCHEMA = (
    "video_id string, track_id int, start_frame int, end_frame int, n_frames int"
)
_RUN_STATE = StructType(
    [
        StructField("open_start", IntegerType()),
        StructField("open_end", IntegerType()),  # EXCLUSIVE, = max+1
        StructField("last_frame", IntegerType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class SegmentProcessor(StatefulProcessor):
    """Per-(video, track) incremental gaps-and-islands."""

    def __init__(self, threshold: float, min_frames: int):
        self._threshold = threshold
        self._min_frames = min_frames

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._run = handle.getValueState("open_run", _RUN_STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        video_id, track_id = key[0], int(key[1])
        if self._run.exists():
            open_start, open_end, last_frame = self._run.get()
        else:
            open_start, open_end, last_frame = -1, -1, -1
        out = []

        def close_run():
            nonlocal open_start, open_end
            span = open_end - open_start
            if open_start >= 0 and span >= self._min_frames:
                out.append((video_id, track_id, open_start, open_end, span))
            open_start, open_end = -1, -1

        for pdf in rows:
            p = pdf.sort_values("frame_idx")
            for frame, score in zip(p["frame_idx"], p["score"]):
                frame = int(frame)
                if frame <= last_frame:
                    continue  # duplicate delivery
                if score > self._threshold:
                    if open_start < 0:
                        open_start = frame
                    open_end = frame + 1
                else:
                    close_run()
                last_frame = frame
        self._run.update((open_start, open_end, last_frame))
        if out:
            yield pd.DataFrame(
                out,
                columns=["video_id", "track_id", "start_frame", "end_frame", "n_frames"],
            )

    def close(self) -> None:
        pass


def stateful_segments_v2(
    score_stream: DataFrame,
    threshold: float = 0.0,
    min_duration_s: float = 0.5,
    fps: float = 25.0,
) -> DataFrame:
    """scores stream (video_id, track_id, frame_idx, score) ->
    closed-segment stream via transformWithStateInPandas. The session
    must use the RocksDB state store provider (ROCKSDB_PROVIDER)."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(score_stream)
    proc = SegmentProcessor(threshold, int(min_duration_s * fps))
    return score_stream.groupBy("video_id", "track_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
