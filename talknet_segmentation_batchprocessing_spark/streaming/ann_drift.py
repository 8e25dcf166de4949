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


# ppb twin of queries/extensions.py's _REBUILD_GAP (0.05 on the 6-dp
# grid): rebuild when the recent mean assignment cosine falls this far
# below the seed cohort's
REBUILD_GAP_PPB = 50_000_000


def monitor_rebuild_decision(
    spark: SparkSession,
    index_path: str,
    monitor_path: str,
    recent_batches: int = 3,
    gap_threshold_ppb: int = REBUILD_GAP_PPB,
) -> DataFrame:
    """The monitor's consumer — what sim_ivf_rebuild_decision is for
    the batch corpus, this is for the STREAM: read the drift-monitor
    table, pool the most recent ``recent_batches`` micro-batch rows
    (n_vecs-weighted mean on the integer ppb grid), compare against
    the SEED cohort band (batch_id=-1 partitions of the index's own
    vectors layout, scored by the shared batch_drift_stats), and emit
    ONE row: (seed_mean_cos_ppb, recent_mean_cos_ppb, gap_ppb,
    n_recent_batches, should_rebuild). Reads the monitor summaries and
    K centroids plus one bounded seed-partition scan — never the
    streamed corpus; should_rebuild = gap beyond the threshold means
    the frozen quantizer no longer represents the arriving
    distribution: rebuild the index (fresh generation, epoch cleared)
    and resume the stream on a fresh checkpoint. The lifecycle e2e
    (tests/test_index_lifecycle_e2e.py) drives exactly that sequence."""
    from ..sources.ivf_index import _live_layout

    seed = (
        spark.read.parquet(_live_layout(index_path, "vectors"))
        .filter(F.col("batch_id") == -1)
        .select("vec_id", "v")
    )
    seed_stats = batch_drift_stats(spark, seed, index_path).select(
        F.col("mean_cos_ppb").alias("seed_mean_cos_ppb")
    )
    mon = spark.read.parquet(monitor_path)
    recent_ids = [
        r[0]
        for r in mon.select("batch_id")
        .distinct()
        .orderBy(F.desc("batch_id"))
        .limit(recent_batches)
        .collect()  # bounded: recent_batches ids
    ]
    recent = (
        mon.filter(F.col("batch_id").isin(recent_ids))
        .agg(
            F.expr("sum(mean_cos_ppb * n_vecs) div sum(n_vecs)")
            .cast("bigint")
            .alias("recent_mean_cos_ppb"),
            F.count("*").cast("bigint").alias("n_recent_batches"),
        )
    )
    gap = F.col("seed_mean_cos_ppb") - F.col("recent_mean_cos_ppb")
    return (
        recent.crossJoin(F.broadcast(seed_stats))
        .select(
            "seed_mean_cos_ppb",
            "recent_mean_cos_ppb",
            gap.alias("gap_ppb"),
            "n_recent_batches",
            (gap > F.lit(int(gap_threshold_ppb))).alias("should_rebuild"),
        )
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
