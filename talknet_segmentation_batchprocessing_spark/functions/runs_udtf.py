"""W1 as a Python UDTF (Spark 4 `@udtf`): one (track, scores[]) row in,
N speaking-run rows out — the table-function formulation of
extractSpeakingSegments.py:44-61.

The relational islands form (queries/windows.w1_speaking_segments) is
the production path; this UDTF exists for the API surface a user
porting per-row generator logic expects (`LATERAL udtf(...)` in SQL),
and because run extraction over an already-assembled array is the
natural shape INSIDE media shells, where the track's scores arrive as
one array per row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="run_idx int, start_pos int, end_pos int, n_events int")
class SpeakingRuns:
    """Maximal runs of values strictly above a threshold; ends
    exclusive (W1's ``max(frame)+1``), runs shorter than ``min_run``
    dropped (F6)."""

    def eval(self, values, threshold: float, min_run: int):  # noqa: D102
        if values is None:
            return
        run_idx = 0
        start = None
        for i, v in enumerate(values):
            speaking = v is not None and float(v) > threshold
            if speaking and start is None:
                start = i
            elif not speaking and start is not None:
                if i - start >= min_run:
                    yield (run_idx, start, i, i - start)
                    run_idx += 1
                start = None
        if start is not None and len(values) - start >= min_run:
            yield (run_idx, start, len(values), len(values) - start)
