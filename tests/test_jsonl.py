"""JSONL source/sink round-trip + malformed-line quarantine."""

from __future__ import annotations

import glob
import gzip
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from talknet_segmentation_batchprocessing_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _doc_fingerprint(df):
    """Order-insensitive content hash over all columns."""
    return (
        df.select(
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("\x1f", *sorted(df.columns))), 1, 12
                    ),
                    16,
                    10,
                ).cast("bigint")
            ).alias("fp")
        ).collect()[0][0]
    )


def test_roundtrip_preserves_content(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, num_files=4)
    back = read_jsonl(spark, out, DOC_SCHEMA).select(*docs.columns)
    assert back.count() == docs.count()
    assert _doc_fingerprint(back) == _doc_fingerprint(docs)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in docs.schema.fields
    ]


def test_written_lines_are_plain_jsonl(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    out = str(tmp_path / "plain")
    write_jsonl(docs, out, num_files=1)
    [part] = glob.glob(f"{out}/part-*.txt") or glob.glob(f"{out}/part-*")
    lines = open(part).read().splitlines()
    assert len(lines) == 10
    row = json.loads(lines[0])
    assert set(row) <= {"doc_id", "text", "lang", "source", "n_chars"}


def test_gzip_output_readable(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(25)
    out = str(tmp_path / "gz")
    write_jsonl(docs, out, compression="gzip", num_files=2)
    parts = glob.glob(f"{out}/part-*.gz")
    assert len(parts) == 2
    with gzip.open(parts[0], "rt") as f:
        json.loads(f.readline())
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.count() == 25


def test_permissive_quarantines_malformed_lines(spark, tmp_path):
    p = tmp_path / "bad" / "data.jsonl"
    p.parent.mkdir()
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{broken json\n"
        '{"doc_id": 2, "text": "fine", "lang": "fr", "source": "s", "n_chars": 4}\n'
    )
    df = read_jsonl(spark, str(p.parent), DOC_SCHEMA, corrupt_col="_bad").cache()
    assert df.count() == 3
    bad = df.filter(F.col("_bad").isNotNull())
    assert bad.count() == 1
    assert bad.collect()[0]["_bad"].startswith("{broken")
    good = df.filter(F.col("_bad").isNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    df.unpersist()


def test_dropmalformed_drops_bad_lines(spark, tmp_path):
    p = tmp_path / "bad2" / "data.jsonl"
    p.parent.mkdir()
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "not json at all\n"
    )
    df = read_jsonl(spark, str(p.parent), DOC_SCHEMA, mode="DROPMALFORMED")
    assert [r["doc_id"] for r in df.collect()] == [1]


def test_failfast_raises(spark, tmp_path):
    p = tmp_path / "bad3" / "data.jsonl"
    p.parent.mkdir()
    p.write_text("{broken\n")
    with pytest.raises(Exception):
        read_jsonl(spark, str(p.parent), DOC_SCHEMA, mode="FAILFAST").collect()


def test_unicode_and_nulls_survive(spark, tmp_path):
    rows = [
        (1, "héllo wörld ünïcode 你好", "de", "s", 20),
        (2, None, None, "s", None),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = str(tmp_path / "uni")
    write_jsonl(df, out, num_files=1)
    back = read_jsonl(spark, out, DOC_SCHEMA)
    got = {r["doc_id"]: r for r in back.collect()}
    assert got[1]["text"] == "héllo wörld ünïcode 你好"
    # to_json omits null fields; the pinned schema reads them back as null
    assert got[2]["text"] is None and got[2]["n_chars"] is None
