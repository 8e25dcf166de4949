"""Custom stateful streaming operator: incremental gaps-and-islands
segmentation with ``applyInPandasWithState``.

``foreachBatch`` (streaming/pipeline.py) is correct only when a whole
track arrives in one micro-batch. This operator keeps per-(video,
track) state — the currently-open speaking run and the last processed
frame — so runs spanning micro-batches merge exactly as the batch W1
operator would, and closed segments are emitted as soon as the run
closes. State is O(1) per track (a handful of ints), so a billion
tracks cost gigabytes, not the stream.

Semantics mirror the batch operator (operators/segmentation.py) row
for row: an island is a maximal run of speaking ROWS — a jump in frame
numbering does NOT split a run (batch ``lag`` is over rows, not
frames) — and a closed run is kept iff its SPAN ``end - start =
max_frame + 1 - min_frame`` is at least ``min_frames`` (the reference
filters on span, extractSpeakingSegments.py:98-99, not row count).

Frames must arrive in order within a track (the scorer emits them that
way; out-of-order input would need a watermark + sort buffer stage in
front). Rows at or before the last processed frame are dropped as
duplicate deliveries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "video_id string, track_id int, start_frame int, end_frame int, n_frames int"
)
# open_end is EXCLUSIVE (last speaking frame + 1), matching W1's
# ``max(frame) + 1`` segment ends
STATE_SCHEMA = "open_start int, open_end int, last_frame int"


def _segment_batch(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float,
    min_frames: int,
):
    video_id, track_id = key
    if state.exists:
        open_start, open_end, last_frame = state.get
    else:
        open_start, open_end, last_frame = -1, -1, -1
    out = []

    def close_run():
        nonlocal open_start, open_end
        span = open_end - open_start
        if open_start >= 0 and span >= min_frames:
            out.append((video_id, track_id, open_start, open_end, span))
        open_start, open_end = -1, -1

    for pdf in pdfs:
        p = pdf.sort_values("frame_idx")
        for frame, score in zip(p["frame_idx"], p["score"]):
            frame = int(frame)
            if frame <= last_frame:
                continue  # duplicate delivery
            if score > threshold:
                # continue the open run across any frame-numbering gap,
                # exactly like the batch row-wise islands
                if open_start < 0:
                    open_start = frame
                open_end = frame + 1
            else:
                close_run()
            last_frame = frame
    state.update((open_start, open_end, last_frame))
    if out:
        yield pd.DataFrame(
            out,
            columns=["video_id", "track_id", "start_frame", "end_frame", "n_frames"],
        )


def stateful_segments(
    score_stream: DataFrame,
    threshold: float = 0.0,
    min_duration_s: float = 0.5,
    fps: float = 25.0,
) -> DataFrame:
    """scores stream (video_id, track_id, frame_idx, score) ->
    closed-segment stream; open runs persist across micro-batches."""
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(score_stream)
    min_frames = int(min_duration_s * fps)

    def fn(key, pdfs, state):
        return _segment_batch(key, pdfs, state, threshold, min_frames)

    return score_stream.groupBy("video_id", "track_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
