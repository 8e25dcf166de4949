"""Streaming centroid-drift monitor (streaming/ann_drift.py): per
micro-batch assignment-cosine summaries against the frozen index
centroids, bit-equal to the batch twin under any chunking, with the
replay-idempotence crash discipline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.registry import load
from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
    build_ivf_index,
)
from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
    ann_drift_monitor_sink,
    batch_drift_stats,
)

from .conftest import SF_SMOKE


def _emb(spark):
    return load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _seeded_index(spark, emb, tmp_path):
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "drift_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    return path, cut, n


def test_streamed_monitor_equals_batch_twin(spark, tmp_path):
    emb = _emb(spark)
    path, cut, n = _seeded_index(spark, emb, tmp_path)
    delta = emb.filter(F.col("vec_id") >= cut)
    half = cut + (n - cut) // 2
    chunks = [
        delta.filter(F.col("vec_id") < half),
        delta.filter(F.col("vec_id") >= half),
    ]

    drop = tmp_path / "drift_delta"
    drop.mkdir()
    for i, ch in enumerate(chunks):
        ch.coalesce(1).write.parquet(str(drop / f"b{i}"))
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
    )
    monitor = str(tmp_path / "monitor")
    q = ann_drift_monitor_sink(stream, path, monitor, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        int(r["batch_id"]): (
            int(r["n_vecs"]),
            int(r["mean_cos_ppb"]),
            int(r["min_cos_ppb"]),
        )
        for r in spark.read.parquet(monitor).collect()
    }
    assert set(got) == {0, 1}
    # file-order of the two drop files decides which chunk became
    # batch 0 — compare as a multiset of summary rows
    want = {
        (
            int(r["n_vecs"]),
            int(r["mean_cos_ppb"]),
            int(r["min_cos_ppb"]),
        )
        for ch in chunks
        for r in batch_drift_stats(spark, ch, path).collect()
    }
    assert set(got.values()) == want
    assert all(v[0] > 0 for v in got.values())

    # the monitor is the rebuild signal: its rows must be comparable
    # to the seed cohort's own stats (same grid, same centroids)
    seed_row = batch_drift_stats(
        spark, emb.filter(F.col("vec_id") < cut), path
    ).collect()[0]
    assert int(seed_row["n_vecs"]) == cut


def test_monitor_replay_is_idempotent(spark, tmp_path):
    emb = _emb(spark)
    path, cut, n = _seeded_index(spark, emb, tmp_path)
    delta = emb.filter(F.col("vec_id") >= cut)
    monitor = str(tmp_path / "monitor")

    stats = batch_drift_stats(spark, delta, path)
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(monitor)
    )
    first = sorted(tuple(r) for r in spark.read.parquet(monitor).collect())
    # the replay: same batch id, same content -> same single row
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(monitor)
    )
    after = sorted(tuple(r) for r in spark.read.parquet(monitor).collect())
    assert after == first and len(after) == 1


def test_chunking_invariance_of_grid_stats(spark, tmp_path):
    """The 1e9-grid design claim directly: stats of the union equal
    the count-weighted merge of per-chunk stats (BIGINT sums are
    associative), so no chunking of the stream can move the mean."""
    emb = _emb(spark)
    path, cut, n = _seeded_index(spark, emb, tmp_path)
    delta = emb.filter(F.col("vec_id") >= cut)
    third = cut + (n - cut) // 3
    parts = [
        delta.filter(F.col("vec_id") < third),
        delta.filter(F.col("vec_id") >= third),
    ]
    whole = batch_drift_stats(spark, delta, path).collect()[0]
    rows = [batch_drift_stats(spark, p, path).collect()[0] for p in parts]
    n_sum = sum(int(r["n_vecs"]) for r in rows)
    weighted = sum(int(r["n_vecs"]) * int(r["mean_cos_ppb"]) for r in rows)
    assert int(whole["n_vecs"]) == n_sum
    # per-chunk means lose < 1 ppb each to integer division
    assert abs(weighted // n_sum - int(whole["mean_cos_ppb"])) <= 1
    assert int(whole["min_cos_ppb"]) == min(int(r["min_cos_ppb"]) for r in rows)


def test_seed_baseline_is_held_out_and_survives_seed_partition_loss(
    spark, tmp_path
):
    """seed_drift_baseline writes the monitor's batch_id=-1 row from
    the seed's HELD-OUT rows (the k-means sample scores in-sample-
    optimistically), and the decision reads THAT row — so deleting the
    index's seed partitions (what compaction effectively does) cannot
    blind it."""
    import shutil

    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
        seed_drift_baseline,
    )

    emb = _emb(spark)
    path = str(tmp_path / "baseline_index")
    build_ivf_index(emb, path, batch_id=-1)
    monitor = str(tmp_path / "monitor")
    seed_drift_baseline(spark, path, monitor)

    # the recorded band equals the held-out twin, not the whole-seed
    held_out = batch_drift_stats(
        spark, emb.filter(F.col("vec_id") >= 256), path
    ).collect()[0]
    whole = batch_drift_stats(spark, emb, path).collect()[0]
    row = (
        spark.read.parquet(monitor)
        .filter(F.col("batch_id") == -1)
        .collect()[0]
    )
    assert int(row["mean_cos_ppb"]) == int(held_out["mean_cos_ppb"])
    assert int(row["mean_cos_ppb"]) != int(whole["mean_cos_ppb"])
    assert int(row["n_vecs"]) == int(held_out["n_vecs"])

    # one streamed summary row, then destroy the index's seed
    # partitions — the decision must still answer from the monitor
    delta = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "v"
    )
    stats = batch_drift_stats(spark, delta, path)
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(monitor)
    )
    vec_root = os.path.join(path, "vectors")
    for d in os.listdir(vec_root):
        sub = os.path.join(vec_root, d)
        if os.path.isdir(sub):
            for b in os.listdir(sub):
                if b == "batch_id=-1":
                    shutil.rmtree(os.path.join(sub, b))
    dec = monitor_rebuild_decision(spark, path, monitor).collect()[0]
    assert dec["should_rebuild"] is not None
    assert int(dec["seed_mean_cos_ppb"]) == int(held_out["mean_cos_ppb"])


def test_decision_raises_instead_of_nulling(spark, tmp_path):
    """No baseline anywhere (no monitor batch_id=-1 row, no index seed
    partitions) or no streamed rows -> a LOUD error, never a NULL
    should_rebuild (a silent NULL is a drift monitor that never
    fires)."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
        seed_drift_baseline,
    )

    emb = _emb(spark)
    path = str(tmp_path / "raise_index")
    build_ivf_index(emb, path)  # single-level layout, no batch_id=-1
    monitor = str(tmp_path / "monitor")

    # monitor with a streamed row but no baseline, index single-level:
    # the fallback still finds held-out rows in the flat layout — so
    # first check the no-streamed-rows error with a baseline present
    seed_drift_baseline(spark, path, monitor)
    with pytest.raises(RuntimeError, match="no streamed monitor rows"):
        monitor_rebuild_decision(spark, path, monitor).collect()

    # now a monitor whose only row is streamed, against an index whose
    # layout holds NO vectors at all below the live dir -> no baseline
    import shutil

    path2 = str(tmp_path / "raise_index2")
    build_ivf_index(emb, path2, batch_id=-1)
    monitor2 = str(tmp_path / "monitor2")
    stats = batch_drift_stats(spark, emb, path2)
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(monitor2)
    )
    vec_root = os.path.join(path2, "vectors")
    for d in os.listdir(vec_root):
        sub = os.path.join(vec_root, d)
        if os.path.isdir(sub):
            for b in os.listdir(sub):
                if b == "batch_id=-1":
                    shutil.rmtree(os.path.join(sub, b))
    # drop one streamed partition in so the layout isn't empty
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        append_ivf_index,
    )

    append_ivf_index(
        emb.select((F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "v"),
        path2,
        batch_id=0,
    )
    with pytest.raises(RuntimeError, match="no seed baseline"):
        monitor_rebuild_decision(spark, path2, monitor2).collect()


def test_rebaseline_after_compaction_is_a_noop_not_a_wipe(spark, tmp_path):
    """Re-running seed_drift_baseline after compaction (the
    ann_monitored_ingest resume posture) must KEEP the recorded
    baseline — overwriting it with a NULL band computed from the
    now-folded seed partition would permanently blind the decision.
    With no prior row to keep, it raises instead."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        append_ivf_index,
        compact_ivf_index,
    )
    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
        seed_drift_baseline,
    )

    emb = _emb(spark)
    path = str(tmp_path / "rebase_index")
    build_ivf_index(emb, path, batch_id=-1)
    monitor = str(tmp_path / "monitor")
    seed_drift_baseline(spark, path, monitor)
    want = (
        spark.read.parquet(monitor)
        .filter(F.col("batch_id") == -1)
        .collect()[0]
    )

    delta = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "v"
    )
    append_ivf_index(delta, path, batch_id=0)
    stats = batch_drift_stats(spark, delta, path)
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(monitor)
    )
    compact_ivf_index(spark, path)  # folds batch_id=-1 into the epoch

    seed_drift_baseline(spark, path, monitor)  # resume: must be a no-op
    got = (
        spark.read.parquet(monitor)
        .filter(F.col("batch_id") == -1)
        .collect()[0]
    )
    assert (int(got["n_vecs"]), int(got["mean_cos_ppb"])) == (
        int(want["n_vecs"]),
        int(want["mean_cos_ppb"]),
    )
    dec = monitor_rebuild_decision(spark, path, monitor).collect()[0]
    assert dec["should_rebuild"] is not None

    # a FRESH monitor against the compacted index has nothing to keep
    with pytest.raises(RuntimeError, match="no seed vectors"):
        seed_drift_baseline(spark, path, str(tmp_path / "monitor_fresh"))


def test_fallback_refuses_single_level_layout_with_appends(spark, tmp_path):
    """Decision fallback on a batch-less layout must refuse, not pool:
    appended rows in a single-level layout are indistinguishable from
    the seed, and pooling drifted appends into their own baseline
    makes the decision never fire."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        append_ivf_index,
    )
    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
    )

    emb = _emb(spark)
    path = str(tmp_path / "flat_index")
    build_ivf_index(emb, path)  # single-level
    append_ivf_index(
        emb.select((F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "v"),
        path,
    )
    monitor = str(tmp_path / "monitor")
    stats = batch_drift_stats(spark, emb, path)
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(monitor)
    )
    with pytest.raises(RuntimeError, match="no batch level"):
        monitor_rebuild_decision(spark, path, monitor).collect()


def test_pq_layout_baseline_needs_source_vectors(spark, tmp_path):
    """The codes-only IVF+PQ layout stores no raw vectors (that IS the
    compression): seeding a baseline from the index must raise the
    designed loud error — not a raw path-not-found AnalysisException —
    and passing the source vectors explicitly closes the whole
    monitor -> decision loop against the PQ index, because
    batch_drift_stats scores against the stored centroids only
    (ADVICE r11)."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        build_ivfpq_index,
    )
    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
        seed_drift_baseline,
    )

    emb = _emb(spark)
    path = str(tmp_path / "pq_index")
    build_ivfpq_index(spark, emb, path, batch_id=-1)
    monitor = str(tmp_path / "monitor")

    with pytest.raises(RuntimeError, match="codes-only"):
        seed_drift_baseline(spark, path, monitor)

    # the documented recipe: band from the SOURCE seed vectors
    seed_drift_baseline(spark, path, monitor, seed_vectors=emb)
    stats = batch_drift_stats(spark, emb, path)
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(monitor)
    )
    dec = monitor_rebuild_decision(spark, path, monitor).collect()[0]
    assert dec["should_rebuild"] is not None

    # the decision FALLBACK (fresh monitor, no baseline row) hits the
    # same loud guard
    monitor2 = str(tmp_path / "monitor2")
    (
        stats.withColumn("batch_id", F.lit(0))
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(monitor2)
    )
    with pytest.raises(RuntimeError, match="codes-only"):
        monitor_rebuild_decision(spark, path, monitor2).collect()


def test_decision_skips_empty_batch_rows(spark, tmp_path):
    """n_vecs=0 monitor rows (all-empty micro-batches) carry no band:
    pooling ONLY over them must raise the no-streamed-rows error (not
    surface should_rebuild=NULL through a zero-weight division), and a
    zero row newer than a real row is skipped so the real rows pool
    (ADVICE r11)."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
        seed_drift_baseline,
    )

    emb = _emb(spark)
    path, cut, n = _seeded_index(spark, emb, tmp_path)
    monitor = str(tmp_path / "monitor")
    seed_drift_baseline(spark, path, monitor)

    schema = (
        "n_vecs bigint, mean_cos_ppb bigint, min_cos_ppb bigint, "
        "batch_id int"
    )

    # only an empty-batch row streamed -> loud error, not NULL verdict
    spark.createDataFrame([(0, None, None, 0)], schema).coalesce(
        1
    ).write.mode("append").partitionBy("batch_id").parquet(monitor)
    with pytest.raises(RuntimeError, match="no streamed monitor rows"):
        monitor_rebuild_decision(spark, path, monitor).collect()

    # a real row older than the empty one: the empty row is skipped
    # and the real row pools to a non-NULL verdict
    real = batch_drift_stats(
        spark, emb.filter(F.col("vec_id") >= cut), path
    ).collect()[0]
    spark.createDataFrame(
        [
            (
                int(real["n_vecs"]),
                int(real["mean_cos_ppb"]),
                int(real["min_cos_ppb"]),
                1,
            ),
            (0, None, None, 2),
        ],
        schema,
    ).coalesce(1).write.mode("append").partitionBy("batch_id").parquet(
        monitor
    )
    dec = monitor_rebuild_decision(
        spark, path, monitor, recent_batches=1
    ).collect()[0]
    assert dec["should_rebuild"] is not None
    assert int(dec["recent_mean_cos_ppb"]) == int(real["mean_cos_ppb"])
