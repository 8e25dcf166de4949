"""JSONL (newline-delimited JSON) source & sink — the de-facto
interchange format of pretraining corpora (each line one document).

Reading uses Spark's native JSON datasource with an EXPLICIT schema:
schema inference re-reads the whole input (a second 100 TB scan) and
silently widens types; a pinned schema makes the scan single-pass and
the column pruning/predicate pushdown behave like parquet's (Spark
prunes parsed fields via Catalyst once a select is present). Writing
serializes rows JVM-side with ``to_json`` over a column struct — no
Python in the loop — and lands one file per partition, optionally
gzip-compressed (gzip JSONL is splittable per FILE, not per block, so
the writer's partition count decides read parallelism downstream:
repartition before writing if the consumer needs more splits).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    columns: Sequence[str] | None = None,
    compression: str | None = None,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as JSONL, one JSON object per line.

    Field order in each line follows ``columns`` (default: the frame's
    column order) so output is byte-deterministic given a fixed row
    order. ``num_files`` repartitions before the write — set it to
    control downstream read parallelism for gzip output.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    out = df.select(F.to_json(F.struct(*cols)).alias("value"))
    if num_files is not None:
        out = out.repartition(num_files)
    writer = out.write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.text(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read JSONL with a pinned schema (never inference — see module
    docstring).

    ``mode`` is Spark's JSON parse mode: PERMISSIVE nulls bad fields,
    DROPMALFORMED drops bad lines, FAILFAST raises. With PERMISSIVE a
    ``corrupt_col`` name adds Spark's _corrupt_record column under
    that name so malformed lines are auditable instead of silent
    (the quarantine pattern: ``df.filter(col(corrupt).isNotNull())``
    is the reject stream).
    """
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).json(path)
