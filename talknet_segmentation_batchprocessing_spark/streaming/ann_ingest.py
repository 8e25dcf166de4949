"""Streaming ANN index ingest: continuous embedding arrival into the
on-disk IVF index (sources/ivf_index.py).

The production shape this re-expresses: a crawl keeps producing new
documents whose embeddings must become searchable without rebuilding
the index — FAISS's IndexIVF.add driven by Structured Streaming. The
coarse quantizer is FROZEN at seed time (its training sample predates
the stream by construction), so each micro-batch is pure assignment +
list append: embarrassingly parallel against broadcast centroids, no
state store needed.

Crash discipline (the cdc_sink pattern): each micro-batch lands under
its own ``batch_id`` partition level via dynamic partition overwrite,
so a batch replayed after a crash-between-write-and-commit rewrites
exactly its own partitions to the same content — the index converges
to the batch-built one under any chunking or replay
(tests/test_ann_ingest.py pins stream-ingested == full rebuild).
cent_id stays the outer partition level, so probe-time pruning is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ann_index_sink(vectors: DataFrame, index_path: str, checkpoint_dir: str):
    """Start an availableNow foreachBatch query appending each
    micro-batch of (vec_id, v) vectors into the IVF index at
    ``index_path`` (seeded beforehand with
    ``build_ivf_index(..., batch_id=-1)`` — micro-batch epochs start
    at 0, so the seed partition can never collide). Returns the
    StreamingQuery."""
    from ..sources.ivf_index import append_ivf_index

    def _apply(batch: DataFrame, bid: int) -> None:
        if batch.isEmpty():
            return
        append_ivf_index(batch, index_path, batch_id=int(bid))

    return (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ann_monitored_ingest(
    spark,
    schema,
    source_glob: str,
    index_path: str,
    monitor_path: str,
    checkpoint_root: str,
    max_files_per_trigger: int = 1,
):
    """The REAL deployment in one call: start BOTH sinks over one file
    source — the index ingest (:func:`ann_index_sink`) and the drift
    monitor (streaming/ann_drift.py), each with its own checkpoint
    under ``checkpoint_root`` — and record the seed drift baseline in
    the monitor first (streaming/ann_drift.seed_drift_baseline), so
    monitor_rebuild_decision works from the first micro-batch and
    survives later compaction. Returns (index_query, monitor_query);
    await both. Each sink gets its OWN readStream over the same glob:
    two independent queries with independent checkpoints is the
    Structured Streaming posture for two sinks of one source (a single
    query cannot drive two foreachBatch sinks), and the monitor's
    row-count agreement with the index under crash/replay is pinned in
    tests/test_index_lifecycle_e2e.py."""
    import os

    from .ann_drift import ann_drift_monitor_sink, seed_drift_baseline

    seed_drift_baseline(spark, index_path, monitor_path)

    def _source():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_glob)
        )

    iq = ann_index_sink(
        _source(), index_path, os.path.join(checkpoint_root, "index")
    )
    mq = ann_drift_monitor_sink(
        _source(),
        index_path,
        monitor_path,
        os.path.join(checkpoint_root, "monitor"),
    )
    return iq, mq


def ann_pq_index_sink(vectors: DataFrame, index_path: str, checkpoint_dir: str):
    """Streaming ingest for the COMPRESSED index — the layout that
    matters at 100 TB, because only (vec_id, code0..code3) rows ever
    reach disk: each micro-batch of (vec_id, v) vectors is
    coarse-assigned and PQ-encoded against the quantizers FROZEN at
    seed time (seeded beforehand with ``build_ivfpq_index(...,
    batch_id=-1)``) and lands under its own (cent_id, batch_id)
    partitions via dynamic partition overwrite — replay-idempotent
    exactly like :func:`ann_index_sink`, and a replay older than a
    compaction epoch is refused rather than silently duplicated.
    Returns the StreamingQuery."""
    from ..sources.ivf_index import append_ivfpq_index

    def _apply(batch: DataFrame, bid: int) -> None:
        if batch.isEmpty():
            return
        append_ivfpq_index(batch, index_path, batch_id=int(bid))

    return (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
