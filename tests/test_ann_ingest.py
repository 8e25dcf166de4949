"""Streaming ANN index ingest (streaming/ann_ingest.py): embeddings
arriving as a stream land in the on-disk IVF index against frozen seed
centroids, and the search result converges to the batch-built index —
plus the replay-idempotence crash discipline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.registry import load
from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
    append_ivf_index,
    build_ivf_index,
    search_ivf_index,
)
from talknet_segmentation_batchprocessing_spark.streaming.ann_ingest import (
    ann_index_sink,
)

from .conftest import SF_SMOKE


def _emb(spark):
    return load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _queries(spark):
    return (
        load(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )


def _search(spark, path):
    return sorted(
        tuple(r)
        for r in search_ivf_index(spark, path, _queries(spark), k=3, nprobe=2)
        .collect()
    )


def test_streamed_ingest_converges_to_batch_index(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)  # the k-means sample stays inside the seed

    # reference: the registered batch query's answer
    from talknet_segmentation_batchprocessing_spark.queries.extensions import (
        sim_ivf_topk,
    )

    want = sorted(
        tuple(r)
        for r in sim_ivf_topk(spark, SF_SMOKE)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .collect()
    )

    # seed index, then stream the delta in >=2 micro-batches
    path = str(tmp_path / "stream_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    drop = tmp_path / "delta"
    drop.mkdir()
    delta = emb.filter(F.col("vec_id") >= cut)
    half = cut + (n - cut) // 2
    delta.filter(F.col("vec_id") < half).coalesce(1).write.parquet(
        str(drop / "b0")
    )
    delta.filter(F.col("vec_id") >= half).coalesce(1).write.parquet(
        str(drop / "b1")
    )
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
    )
    q = ann_index_sink(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = _search(spark, path)
    assert got == want and len(got) > 0

    # every micro-batch landed under its own partition level; the seed
    # kept batch_id=-1 and cent_id stayed the OUTER level (pruning)
    vec_root = os.path.join(path, "vectors")
    cents = [d for d in os.listdir(vec_root) if d.startswith("cent_id=")]
    assert cents
    bids = {
        b
        for c in cents
        for b in os.listdir(os.path.join(vec_root, c))
        if b.startswith("batch_id=")
    }
    assert "batch_id=-1" in bids and len(bids) >= 3


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Crash-after-write-before-commit replays the micro-batch: the
    dynamic partition overwrite rewrites exactly that batch's
    partitions to the same content — search results and total row
    count are unchanged."""
    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "replay_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    delta = emb.filter(F.col("vec_id") >= cut)

    append_ivf_index(delta, path, batch_id=0)
    first = _search(spark, path)
    rows_first = spark.read.parquet(os.path.join(path, "vectors")).count()

    append_ivf_index(delta, path, batch_id=0)  # the replay
    assert _search(spark, path) == first
    assert (
        spark.read.parquet(os.path.join(path, "vectors")).count() == rows_first
    ), "replay duplicated vectors instead of overwriting its partition"


def test_compaction_collapses_stream_fragments(spark, tmp_path):
    """After streaming ingest, each probed list is fragmented across
    batch files; compact_ivf_index rewrites to one file per list with
    IDENTICAL search results, and the batch_id level is gone."""
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        compact_ivf_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "compact_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    # three appends -> three batch partitions per touched list
    third = (n - cut) // 3
    for i in range(3):
        lo = cut + i * third
        hi = cut + (i + 1) * third if i < 2 else n
        append_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path,
            batch_id=i,
        )
    before_rows = spark.read.parquet(os.path.join(path, "vectors")).count()
    want = _search(spark, path)

    files_before, files_after = compact_ivf_index(spark, path)
    assert files_after < files_before

    vec_root = os.path.join(path, "vectors")
    cents = [d for d in os.listdir(vec_root) if d.startswith("cent_id=")]
    assert cents
    for c in cents:
        entries = os.listdir(os.path.join(vec_root, c))
        assert not any(e.startswith("batch_id=") for e in entries)
        assert sum(1 for e in entries if e.endswith(".parquet")) == 1

    assert spark.read.parquet(vec_root).count() == before_rows
    assert _search(spark, path) == want
