"""Streaming centroid-drift monitor: the continuous sibling of the
``sim_ivf_drift_audit`` batch query (queries/extensions.py).

The incremental ANN index freezes its coarse quantizer at seed time
(streaming/ann_ingest.py), so recall decays silently as the arriving
distribution drifts away from the centroids. The batch audit answers
"has the corpus drifted?" after the fact; this monitor answers it AS
THE STREAM ARRIVES: every micro-batch of embeddings is assigned to the
frozen stored centroids (broadcast — the same bounded K rows the
ingest sink uses) and one summary row per batch lands in a monitor
table. A rising assignment distance across batch_ids is the rebuild
trigger; the operator reads the monitor, not the corpus.

Statelessness is the point: the summary is a pure per-batch aggregate
against broadcast constants — no state store, no watermark, nothing
grows with stream length. Cross-engine/cross-partitioning determinism
follows the engine's integer-grid rule: per-vector cosines quantize to
a 1e9 grid (BIGINT) before the order-free sum/min/count, and the mean
is an integer division — so the streamed rows equal the batch-computed
rows bit for bit under any chunking (tests/test_ann_drift.py), and
replay rewrites its own batch_id partition to identical content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_drift_stats(
    spark: SparkSession, vectors: DataFrame, index_path: str
) -> DataFrame:
    """(vec_id, v) frame -> ONE summary row of assignment-cosine stats
    against the index's stored (frozen) centroids: n_vecs,
    mean_cos_ppb, p_min_cos_ppb. Shared by the streaming sink (per
    micro-batch) and the parity tests (whole-delta twin)."""
    from ..sources.ivf_index import rank_centroids

    cent = spark.read.parquet(os.path.join(index_path, "centroids"))
    best = (
        rank_centroids(vectors.select("vec_id", "v"), cent)
        .filter(F.col("rn") == 1)
        # 1e9 grid BEFORE aggregation: BIGINT sum/min are order-free,
        # so stream chunking cannot move the result
        .select(
            F.floor(F.col("cc") * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias("cc_ppb")
        )
    )
    return best.agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.expr("sum(cc_ppb) div count(*)").cast("bigint").alias("mean_cos_ppb"),
        F.min("cc_ppb").alias("min_cos_ppb"),
    )


def ann_drift_monitor_sink(
    vectors: DataFrame, index_path: str, monitor_path: str, checkpoint_dir: str
):
    """Start an availableNow foreachBatch query appending one summary
    row per micro-batch of (vec_id, v) vectors to the monitor table at
    ``monitor_path``, partitioned by batch_id via dynamic partition
    overwrite — replay rewrites exactly its own row (idempotent, the
    ann_ingest crash discipline). Returns the StreamingQuery.

    Run it over the same source feeding :func:`ann_index_sink` (or as
    a second sink of one stream): the monitor then tracks exactly what
    entered the index."""

    def _apply(batch: DataFrame, bid: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        (
            batch_drift_stats(spark, batch, index_path)
            .withColumn("batch_id", F.lit(int(bid)))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(monitor_path)
        )

    return (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
