"""Custom stateful streaming operator: incremental gaps-and-islands
segmentation with ``applyInPandasWithState``.

``foreachBatch`` (streaming/pipeline.py) is correct only when a whole
track arrives in one micro-batch. This operator keeps per-(video,
track) state — the currently-open speaking run and the last processed
frame — so runs spanning micro-batches merge exactly as the batch W1
operator would, and closed segments are emitted as soon as the run
closes. State is O(1) per track (a handful of ints), so a billion
tracks cost gigabytes, not the stream.

Frames must arrive in order within a track (the scorer emits them that
way; out-of-order input would need a watermark + sort buffer stage in
front).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "video_id string, track_id int, start_frame int, end_frame int, n_frames int"
)
STATE_SCHEMA = "open_start int, open_len int, last_frame int"


def _segment_batch(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float,
    min_frames: int,
):
    video_id, track_id = key
    if state.exists:
        open_start, open_len, last_frame = state.get
    else:
        open_start, open_len, last_frame = -1, 0, -1
    out = []

    def close_run():
        nonlocal open_start, open_len
        if open_start >= 0 and open_len >= min_frames:
            out.append(
                (video_id, track_id, open_start, open_start + open_len, open_len)
            )
        open_start, open_len = -1, 0

    for pdf in pdfs:
        p = pdf.sort_values("frame_idx")
        for frame, score in zip(p["frame_idx"], p["score"]):
            frame = int(frame)
            if frame <= last_frame:
                continue  # duplicate delivery
            speaking = score > threshold
            if speaking:
                if open_start >= 0 and frame == last_frame + 1:
                    open_len += 1
                else:
                    close_run()
                    open_start, open_len = frame, 1
            else:
                close_run()
            last_frame = frame
    state.update((open_start, open_len, last_frame))
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
