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


def _seed_band_vectors(vecs: DataFrame) -> DataFrame:
    """The seed rows the baseline band is computed over: HELD-OUT
    vectors (vec_id >= the k-means sample bound) whenever any exist.
    The training sample scores in-sample-optimistically against its
    own centroids, which biases the baseline upward — negligibly when
    the seed is millions of rows, fatally at small scale, and in every
    case the arriving micro-batches the band is compared against are
    out-of-sample, so held-out-vs-out-of-sample is the unbiased
    comparison. Falls back to the whole seed when it fits entirely
    inside the sample (nothing held out to measure)."""
    from ..queries.extensions import _IVF_SAMPLE

    held_out = vecs.filter(F.col("vec_id") >= _IVF_SAMPLE)
    if held_out.limit(1).count() == 0:
        return vecs
    return held_out


def _seed_layout(spark: SparkSession, index_path: str) -> tuple[DataFrame, bool]:
    """(seed vectors of the index's live layout, whether the layout
    carries a batch level). THE one definition of 'the seed rows' for
    both the baseline writer and the decision fallback — two copies of
    this recipe could silently diverge on what the band means.

    Raises loudly for the codes-only IVF+PQ layout (centroids /
    codebooks / codes — raw vectors are never stored, that IS the
    compression): its band cannot be recomputed from the index, it
    must be seeded from the source vectors via
    ``seed_drift_baseline(..., seed_vectors=...)``. Without this guard
    the read surfaces as a raw path-not-found AnalysisException —
    exactly the silent-ish failure the monitor's raises-not-NULLs
    contract exists to prevent."""
    from ..sources.ivf_index import _live_layout

    vec_path = _live_layout(index_path, "vectors")
    if not os.path.isdir(vec_path):
        if os.path.isdir(_live_layout(index_path, "codes")):
            raise RuntimeError(
                f"index {index_path} is a codes-only IVF+PQ layout "
                "(centroids/codebooks/codes — raw vectors are never "
                "stored), so its seed band cannot be recomputed from "
                "the index itself. Seed the monitor from the SOURCE "
                "vectors: seed_drift_baseline(spark, index_path, "
                "monitor_path, seed_vectors=<the seed (vec_id, v) "
                "frame>) — batch_drift_stats scores against the stored "
                "centroids only, so the monitor works unchanged once "
                "the baseline row exists."
            )
        raise RuntimeError(
            f"index {index_path} has no vectors/ layout (and no codes/ "
            "layout either) — not a seeded IVF index. Build it first "
            "(build_ivf_index / build_ivfpq_index)."
        )
    vecs = spark.read.parquet(vec_path)
    has_level = "batch_id" in vecs.columns
    if has_level:
        vecs = vecs.filter(F.col("batch_id") == -1)
    return vecs.select("vec_id", "v"), has_level


def seed_drift_baseline(
    spark: SparkSession,
    index_path: str,
    monitor_path: str,
    seed_vectors: DataFrame | None = None,
) -> None:
    """Record the SEED cohort's drift band in the monitor table as its
    ``batch_id=-1`` row (the same convention the index layout uses for
    the seed partition). Call once after seeding the index — and again
    after every rebuild — alongside starting the sinks. The baseline
    must live in the MONITOR, not be recomputed from the index's seed
    partitions, because compaction folds batch_id=-1 into the epoch
    partition — a decision that scanned the index for its baseline
    would go blind at exactly the point the compaction docs tell the
    operator to compact. The band is computed over the seed's HELD-OUT
    rows (:func:`_seed_band_vectors`) so it is comparable to the
    out-of-sample micro-batches it will be held against. Idempotent
    (dynamic overwrite of its own partition), so re-seeding after a
    rebuild just refreshes the row.

    Called with NO seed partitions left (post-compaction resume,
    before any rebuild): if the monitor already holds a baseline row
    it is KEPT (same generation, still valid) and this is a no-op;
    with no existing row either, this raises — overwriting a good
    baseline with a NULL row would permanently blind the decision,
    which is the exact failure the monitor-resident baseline exists
    to prevent.

    ``seed_vectors``: the seed (vec_id, v) frame, REQUIRED for the
    codes-only IVF+PQ layout (raw vectors never touch its disk, so the
    band cannot be recomputed from the index — pass the same frame you
    seeded ``build_ivfpq_index`` with). Optional for the flat layout,
    where it overrides the index scan (useful when the source is
    cheaper to read than the index)."""
    if seed_vectors is not None:
        vecs = seed_vectors.select("vec_id", "v")
    else:
        vecs, _has_level = _seed_layout(spark, index_path)
    band = _seed_band_vectors(vecs)
    stats = batch_drift_stats(spark, band, index_path).collect()[0]
    if stats["mean_cos_ppb"] is None or int(stats["n_vecs"]) == 0:
        try:
            existing = (
                spark.read.parquet(monitor_path)
                .filter(F.col("batch_id") == -1)
                .limit(1)
                .collect()
            )
        except Exception:
            existing = []
        if existing and existing[0]["mean_cos_ppb"] is not None:
            return  # post-compaction resume: the recorded row stands
        raise RuntimeError(
            f"index {index_path} has no seed vectors to compute a "
            "baseline from (compaction folds the batch_id=-1 seed "
            "partition into the epoch partition) and the monitor "
            f"{monitor_path} holds no prior baseline row. Seed the "
            "baseline BEFORE compacting, or rebuild the index to "
            "start a fresh generation."
        )
    spark.createDataFrame(
        [
            (
                int(stats["n_vecs"]),
                int(stats["mean_cos_ppb"]),
                int(stats["min_cos_ppb"]),
                -1,
            )
        ],
        "n_vecs bigint, mean_cos_ppb bigint, min_cos_ppb bigint, "
        "batch_id int",
    ).coalesce(1).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(monitor_path)


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
    the SEED cohort band (the monitor's own batch_id=-1 row, written
    by :func:`seed_drift_baseline`; falls back to scoring the index's
    batch_id=-1 seed partitions for monitors seeded before that row
    existed — only for layouts whose batch level can identify the
    seed cohort), and emit ONE row: (seed_mean_cos_ppb,
    recent_mean_cos_ppb, gap_ppb, n_recent_batches, should_rebuild).
    Reads ONLY bounded summaries — never the streamed corpus;
    should_rebuild = gap beyond the threshold means the frozen
    quantizer no longer represents the arriving distribution: rebuild
    the index (fresh generation, epoch cleared), re-run
    seed_drift_baseline, and resume the stream on a fresh checkpoint
    AND a fresh monitor path — the old monitor's summaries were scored
    against the old centroids, so pooling them under the new baseline
    reads a stale gap until the recent window refills (the lifecycle
    e2e starts monitor2 for generation 2 for exactly this reason).
    Raises rather than returning NULLs when no baseline or no streamed
    rows exist — a silent NULL here is a drift monitor that never
    fires. The lifecycle e2e (tests/test_index_lifecycle_e2e.py)
    drives the whole sequence across a compaction."""
    mon = spark.read.parquet(monitor_path)
    seed_rows = mon.filter(F.col("batch_id") == -1).limit(2).collect()
    if seed_rows:
        if seed_rows[0]["mean_cos_ppb"] is None:
            raise RuntimeError(
                f"the monitor {monitor_path} baseline row (batch_id=-1) "
                "carries a NULL band — it was written against an empty "
                "seed. Rebuild the index (fresh generation) and re-run "
                "seed_drift_baseline."
            )
        seed_mean = int(seed_rows[0]["mean_cos_ppb"])
    else:
        vecs, has_level = _seed_layout(spark, index_path)
        if not has_level:
            # a single-level layout cannot distinguish seed rows from
            # later appends: pooling them would fold the drifted data
            # into its own baseline and the decision would never fire
            raise RuntimeError(
                f"no seed baseline: monitor {monitor_path} has no "
                f"batch_id=-1 row and the index {index_path} layout "
                "has no batch level to identify the seed cohort by. "
                "Run seed_drift_baseline at seed time (it records the "
                "band while the layout is all-seed)."
            )
        fallback = batch_drift_stats(
            spark, _seed_band_vectors(vecs), index_path
        ).collect()[0]
        if fallback["mean_cos_ppb"] is None:
            raise RuntimeError(
                f"no seed baseline: monitor {monitor_path} has no "
                "batch_id=-1 row and the index layout holds no "
                "batch_id=-1 seed partitions (compaction folds them "
                "into the epoch partition). Run seed_drift_baseline "
                "at seed time — and after every rebuild — so the "
                "baseline survives compaction."
            )
        seed_mean = int(fallback["mean_cos_ppb"])
    seed_stats = spark.createDataFrame(
        [(seed_mean,)], "seed_mean_cos_ppb bigint"
    )
    # n_vecs > 0: an all-empty micro-batch row carries no band (its
    # mean is NULL), and pooling over only such rows would divide by a
    # zero weight and surface should_rebuild=NULL — violating the
    # raises-instead-of-NULLs contract. Empty batches don't say
    # anything about drift; pool the most recent batches that carried
    # vectors instead.
    recent_ids = [
        r[0]
        for r in mon.filter((F.col("batch_id") >= 0) & (F.col("n_vecs") > 0))
        .select("batch_id")
        .distinct()
        .orderBy(F.desc("batch_id"))
        .limit(recent_batches)
        .collect()  # bounded: recent_batches ids
    ]
    if not recent_ids:
        raise RuntimeError(
            f"no streamed monitor rows in {monitor_path}: the decision "
            "needs at least one micro-batch summary (batch_id >= 0) "
            "with n_vecs > 0 — empty micro-batches carry no band."
        )
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
