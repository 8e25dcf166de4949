"""S10/S11: segment media sink + summary report.

The reference extracts each speaking segment as ``.avi``+``.wav`` via
three ffmpeg calls (video slice, audio slice, mux —
extractSpeakingSegments.py:63-139) and writes ``summary.txt``
(extractSpeakingSegments.py:151-175). Here the sink runs
``foreachPartition`` over the segments table — each executor cuts its
own partition's segments; nothing round-trips the driver. The cutter
is pluggable (no ffmpeg in this image); the default records intents,
which is also what unit tests assert on.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import stable_round

# cutter signature: (video_path, start_s, duration_s, out_base) -> None
Cutter = Callable[[str, float, float, str], None]


def manifest_cutter(out_dir: str) -> Cutter:
    """Default cutter: writes one ``.json`` intent per segment instead
    of invoking ffmpeg — the '-ss/-t -c copy' stream-copy call
    (extractSpeakingSegments.py:129-139) slots in here unchanged."""

    def cut(video_path: str, start_s: float, duration_s: float, out_base: str) -> None:
        import json

        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{out_base}.json"), "w") as f:
            json.dump(
                {
                    "video": video_path,
                    "ss": start_s,
                    "t": duration_s,
                    "cmd": "ffmpeg -y -ss {ss} -t {t} -i {video} -c copy",
                },
                f,
            )

    return cut


def write_segment_media(
    segments: DataFrame,
    video_paths: DataFrame,
    cutter: Cutter,
) -> None:
    """S10: cut every segment of every video, executor-side.

    ``video_paths(video_id, path)`` is a small dim — broadcast join, so
    the sink input stays partitioned by the segments' own layout.
    Output naming follows the reference's ``%05d`` pattern
    (extractSpeakingSegments.py:108,120-121).
    """
    rows = segments.join(F.broadcast(video_paths), "video_id").select(
        "video_id", "track_id", "seg_id", "start_ts", "duration", "path"
    )

    def run(part: Iterable) -> None:
        for r in part:
            base = f"{r.video_id}_t{r.track_id:05d}_s{r.seg_id:05d}"
            cutter(r.path, float(r.start_ts), float(r.duration), base)

    rows.foreachPartition(run)


def summary_report(segments: DataFrame) -> DataFrame:
    """S11: the summary.txt content as a table — per (video, track):
    segment count, total speaking seconds, span
    (extractSpeakingSegments.py:151-175)."""
    return (
        segments.groupBy("video_id", "track_id")
        .agg(
            F.count("*").alias("n_segments"),
            stable_round(F.sum("duration"), 2).alias("total_speaking_s"),
            F.min("start_ts").alias("first_start_ts"),
            F.max("end_ts").alias("last_end_ts"),
        )
        .orderBy("video_id", "track_id")
    )


def format_summary(summary_rows: Iterable) -> str:
    """Render the table to the reference's human-readable layout."""
    lines = []
    for r in summary_rows:
        lines.append(
            f"video {r.video_id} track {r.track_id}: "
            f"{r.n_segments} segment(s), {r.total_speaking_s:.2f}s speaking "
            f"({r.first_start_ts:.2f}s - {r.last_end_ts:.2f}s)"
        )
    return "\n".join(lines)
