"""Word k-shingle construction over a MATERIALIZED token-array column.

One implementation shared by the dedup family (extensions._doc_shingles,
3-shingles) and the contamination check (dataset_ops, 5-shingles):
zip_with of the array against its tails — one pass per row, no per-doc
window sort, and no lambda capture of an unmaterialized expression
(which would re-evaluate the split per element, the O(len^2) trap hit
twice in round 4)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_shingles(tokens_col: str | Column, k: int) -> Column:
    """Array of k-word shingles (space-joined) from an ARRAY COLUMN of
    tokens. Caller must pass a bound column (e.g. the output of a
    prior ``select(split(...).alias(...))``), not a raw expression,
    and must pre-filter rows with fewer than ``k`` tokens."""
    w = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = F.size(w) - (k - 1)  # number of k-shingles
    joined = F.slice(w, 1, m)
    for i in range(1, k):
        joined = F.zip_with(
            joined, F.slice(w, i + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return joined
