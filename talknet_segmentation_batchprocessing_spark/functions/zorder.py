"""Z-order (Morton) curve value for multi-dimensional data skipping.

A 100 TB table filtered on TWO columns can only prune files on one of
them if the layout is sorted linearly; interleaving the bits of both
keys into one z-value and range-sorting the write by it gives every
file a tight bounding BOX in (x, y) space, so parquet min/max stats
prune on either predicate (the Delta/Iceberg OPTIMIZE ZORDER layout,
built here from plain Spark expressions).

The interleave is a fixed sum of shift/mask terms — pure integer
bitwise arithmetic, whole-stage-codegen-friendly, and bit-identical
in any engine (the DuckDB twin is generated from the same terms).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(x: str | Column, y: str | Column, bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of non-negative ints x and y:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def z_value_sql(x: str, y: str, bits: int = 12) -> str:
    """The identical interleave as ANSI SQL (DuckDB oracle twin):
    same terms, same order, integer arithmetic only."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
