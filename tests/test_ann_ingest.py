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
    IDENTICAL search results. The batch LEVEL survives (uniform
    partition depth so later micro-batches append normally) but all
    folded batches collapse into the single baseline partition at the
    epoch id."""
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
        # everything folded into ONE baseline batch partition (at the
        # epoch id = max folded batch), one file inside it
        bdirs = [e for e in entries if e.startswith("batch_id=")]
        assert bdirs == ["batch_id=2"]
        inner = os.listdir(os.path.join(vec_root, c, bdirs[0]))
        assert sum(1 for e in inner if e.endswith(".parquet")) == 1

    assert spark.read.parquet(vec_root).count() == before_rows
    assert _search(spark, path) == want

    # uniform depth means the stream continues normally past the epoch
    append_ivf_index(
        emb.filter(F.col("vec_id") >= n), path, batch_id=3
    )  # empty delta, but exercises the layout write path
    assert _search(spark, path) == want


def _pq_queries(spark):
    return (
        load(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )


def _pq_search(spark, path):
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        search_ivfpq_index,
    )

    return sorted(
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, _pq_queries(spark), k=5, nprobe=2
        ).collect()
    )


def test_pq_streamed_ingest_converges_to_batch_index(spark, tmp_path):
    """Stream-ingested IVF+PQ (codes only on disk) == the registered
    sim_ivfpq_topk answer: both quantizers are frozen at seed time and
    the seed contains the coarse AND PQ training samples, so append
    equals rebuild bit for bit."""
    from talknet_segmentation_batchprocessing_spark.queries.dataset_ops import (
        sim_ivfpq_topk,
    )
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        build_ivfpq_index,
    )
    from talknet_segmentation_batchprocessing_spark.streaming.ann_ingest import (
        ann_pq_index_sink,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)  # contains both 256-vector training samples

    want = sorted(
        tuple(r)
        for r in sim_ivfpq_topk(spark, SF_SMOKE)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
        .collect()
    )

    path = str(tmp_path / "pq_stream_index")
    build_ivfpq_index(spark, emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    drop = tmp_path / "pq_delta"
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
    q = ann_pq_index_sink(stream, path, str(tmp_path / "pq_ckpt"))
    q.awaitTermination()

    got = _pq_search(spark, path)
    assert got == want and len(got) > 0

    # codes landed under (cent_id outer, batch_id inner); raw vectors
    # were never written anywhere in the index
    code_root = os.path.join(path, "codes")
    cents = [d for d in os.listdir(code_root) if d.startswith("cent_id=")]
    assert cents
    bids = {
        b
        for c in cents
        for b in os.listdir(os.path.join(code_root, c))
        if b.startswith("batch_id=")
    }
    assert "batch_id=-1" in bids and len(bids) >= 3
    assert "v" not in spark.read.parquet(code_root).columns


def test_pq_replayed_batch_is_idempotent(spark, tmp_path):
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        append_ivfpq_index,
        build_ivfpq_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "pq_replay_index")
    build_ivfpq_index(spark, emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    delta = emb.filter(F.col("vec_id") >= cut)

    append_ivfpq_index(delta, path, batch_id=0)
    first = _pq_search(spark, path)
    rows_first = spark.read.parquet(os.path.join(path, "codes")).count()

    append_ivfpq_index(delta, path, batch_id=0)  # the replay
    assert _pq_search(spark, path) == first
    assert (
        spark.read.parquet(os.path.join(path, "codes")).count() == rows_first
    ), "replay duplicated codes instead of overwriting its partition"


def test_post_compaction_replay_is_refused(spark, tmp_path):
    """Compaction closes the replay window: a micro-batch replayed from
    a pre-compaction checkpoint is REFUSED (its batch partitions are
    gone, so overwriting them is impossible and appending would
    duplicate) — and the index still equals the batch-built answer."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        compact_ivf_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "epoch_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    delta = emb.filter(F.col("vec_id") >= cut)
    half = cut + (n - cut) // 2
    append_ivf_index(delta.filter(F.col("vec_id") < half), path, batch_id=0)
    append_ivf_index(delta.filter(F.col("vec_id") >= half), path, batch_id=1)
    want = _search(spark, path)
    rows = spark.read.parquet(os.path.join(path, "vectors")).count()

    compact_ivf_index(spark, path)
    with open(os.path.join(path, "_COMPACTION_EPOCH")) as f:
        assert int(f.read().strip()) == 1

    # a crashed-before-commit checkpoint replays batch 1 post-compaction
    with pytest.raises(RuntimeError, match="compaction epoch"):
        append_ivf_index(delta.filter(F.col("vec_id") >= half), path, batch_id=1)

    # refused means nothing was written: still the batch-built answer
    assert _search(spark, path) == want
    assert spark.read.parquet(os.path.join(path, "vectors")).count() == rows

    # ...and the stream continues normally past the marker
    append_ivf_index(
        delta.filter(F.col("vec_id") >= half).limit(0), path, batch_id=2
    )


def test_compaction_crash_window_recovers(spark, tmp_path):
    """Crash between the two renames of the compaction swap leaves no
    live vectors dir and a complete ``.old``. A SEARCH answers from the
    old layout WITHOUT touching disk (a reader that healed could race a
    healthy compactor's own swap renames); the next WRITE operation
    heals by moving the old layout back."""
    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "crash_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    append_ivf_index(emb.filter(F.col("vec_id") >= cut), path, batch_id=0)
    want = _search(spark, path)

    vec_root = os.path.join(path, "vectors")
    os.rename(vec_root, vec_root + ".old")  # the crash window state
    # read path: correct answer, zero disk mutation
    assert _search(spark, path) == want
    assert os.path.isdir(vec_root + ".old") and not os.path.exists(vec_root)
    # write path: heals, then appends
    append_ivf_index(emb.filter(F.col("vec_id") >= cut).limit(0), path, batch_id=1)
    assert os.path.isdir(vec_root) and not os.path.exists(vec_root + ".old")
    assert _search(spark, path) == want


def test_pq_compaction_collapses_fragments_and_closes_replay(spark, tmp_path):
    """The codes layout compacts exactly like the flat one: one file
    per list, identical search results, batch level gone — and the
    epoch marker refuses a post-compaction replay."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "pq_compact_index")
    build_ivfpq_index(spark, emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    delta = emb.filter(F.col("vec_id") >= cut)
    half = cut + (n - cut) // 2
    append_ivfpq_index(delta.filter(F.col("vec_id") < half), path, batch_id=0)
    append_ivfpq_index(delta.filter(F.col("vec_id") >= half), path, batch_id=1)
    before_rows = spark.read.parquet(os.path.join(path, "codes")).count()
    want = _pq_search(spark, path)

    files_before, files_after = compact_ivfpq_index(spark, path)
    assert files_after < files_before

    code_root = os.path.join(path, "codes")
    cents = [d for d in os.listdir(code_root) if d.startswith("cent_id=")]
    assert cents
    for c in cents:
        entries = os.listdir(os.path.join(code_root, c))
        bdirs = [e for e in entries if e.startswith("batch_id=")]
        assert bdirs == ["batch_id=1"]
        inner = os.listdir(os.path.join(code_root, c, bdirs[0]))
        assert sum(1 for e in inner if e.endswith(".parquet")) == 1

    assert spark.read.parquet(code_root).count() == before_rows
    assert _pq_search(spark, path) == want

    with pytest.raises(RuntimeError, match="compaction epoch"):
        append_ivfpq_index(delta.filter(F.col("vec_id") >= half), path, batch_id=1)
    assert _pq_search(spark, path) == want


def test_rebuild_clears_compaction_epoch(spark, tmp_path):
    """A full rebuild starts a fresh stream generation: the previous
    generation's compaction epoch must not refuse the new stream's
    early batches."""
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        compact_ivf_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "regen_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    append_ivf_index(emb.filter(F.col("vec_id") >= cut), path, batch_id=0)
    compact_ivf_index(spark, path)
    assert os.path.exists(os.path.join(path, "_COMPACTION_EPOCH"))

    # rebuild in place -> fresh generation, batch numbering restarts
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    assert not os.path.exists(os.path.join(path, "_COMPACTION_EPOCH"))
    append_ivf_index(emb.filter(F.col("vec_id") >= cut), path, batch_id=0)


def test_compact_never_streamed_layout_writes_no_epoch(spark, tmp_path):
    """Compacting a batch-built index (no batch_id level) must NOT
    create a compaction epoch marker: there is no replay window to
    close, and a marker at -1 would refuse the documented seed
    convention batch_id=-1 forever after."""
    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        compact_ivf_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "pure_batch_index")
    build_ivf_index(emb, path)  # no batch_id: single-level layout
    want = _search(spark, path)

    compact_ivf_index(spark, path)
    assert not os.path.exists(os.path.join(path, "_COMPACTION_EPOCH"))
    assert _search(spark, path) == want


def _fake_checkpoint(tmp_path, name, commits, offsets):
    cp = tmp_path / name
    (cp / "commits").mkdir(parents=True)
    (cp / "offsets").mkdir(parents=True)
    for b in commits:
        (cp / "commits" / str(b)).write_text("v1\n{}")
    for b in offsets:
        (cp / "offsets" / str(b)).write_text("v1\n{}")
    return str(cp)


def test_compact_refuses_uncommitted_inflight_batch(spark, tmp_path):
    """Given the ingest sink's checkpoint dir, compaction verifies the
    stopped-on-a-committed-batch precondition: a batch that STARTED
    (offsets) but never COMMITTED will be replayed on resume, so
    folding its part-files now would corrupt the baseline and then
    refuse the legitimate replay. Both detection channels fire: the
    checkpoint's offsets>commits gap, and stray batch partitions on
    disk beyond the last commit."""
    import pytest

    from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
        compact_ivf_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "guarded_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    append_ivf_index(emb.filter(F.col("vec_id") >= cut), path, batch_id=0)
    want = _search(spark, path)

    # channel 1: offsets ahead of commits (crash mid-batch-1)
    cp = _fake_checkpoint(tmp_path, "cp_inflight", commits=[0], offsets=[0, 1])
    with pytest.raises(RuntimeError, match="in-flight micro-batch"):
        compact_ivf_index(spark, path, checkpoint_dir=cp)

    # channel 2: disk holds batch_id=0 but the checkpoint never
    # committed it (crash between write and commit, offsets rewound)
    cp2 = _fake_checkpoint(tmp_path, "cp_stray", commits=[], offsets=[])
    with pytest.raises(RuntimeError, match="beyond the last commit"):
        compact_ivf_index(spark, path, checkpoint_dir=cp2)

    # refusal left the layout untouched
    assert _search(spark, path) == want
    assert not os.path.exists(os.path.join(path, "_COMPACTION_EPOCH"))

    # consistent checkpoint: compaction proceeds and closes the window
    cp3 = _fake_checkpoint(tmp_path, "cp_clean", commits=[0], offsets=[0])
    files_before, files_after = compact_ivf_index(spark, path, checkpoint_dir=cp3)
    assert files_after <= files_before
    assert _search(spark, path) == want
    with open(os.path.join(path, "_COMPACTION_EPOCH")) as f:
        assert int(f.read().strip()) == 0


def test_monitored_ingest_composes_both_sinks(spark, tmp_path):
    """ann_monitored_ingest: one call seeds the drift baseline and
    starts both sinks; after draining, the index holds the streamed
    vectors, the monitor holds the baseline row plus one summary per
    batch in row-count agreement, and the rebuild decision answers."""
    from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
        monitor_rebuild_decision,
    )
    from talknet_segmentation_batchprocessing_spark.streaming.ann_ingest import (
        ann_monitored_ingest,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = max(256, n // 2)
    path = str(tmp_path / "mon_ingest_index")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)

    drop = tmp_path / "feed"
    drop.mkdir()
    delta = emb.filter(F.col("vec_id") >= cut)
    half = cut + (n - cut) // 2
    delta.filter(F.col("vec_id") < half).coalesce(1).write.parquet(
        str(drop / "b0")
    )
    delta.filter(F.col("vec_id") >= half).coalesce(1).write.parquet(
        str(drop / "b1")
    )

    monitor = str(tmp_path / "monitor")
    iq, mq = ann_monitored_ingest(
        spark,
        delta.schema,
        str(drop / "*"),
        path,
        monitor,
        str(tmp_path / "ckpt"),
    )
    iq.awaitTermination()
    mq.awaitTermination()

    streamed = (
        spark.read.parquet(os.path.join(path, "vectors"))
        .filter(F.col("batch_id") >= 0)
        .count()
    )
    mon = spark.read.parquet(monitor)
    assert mon.filter(F.col("batch_id") == -1).count() == 1  # the baseline
    got = mon.filter(F.col("batch_id") >= 0).agg(F.sum("n_vecs")).collect()[0][0]
    assert int(got) == streamed == delta.count()
    dec = monitor_rebuild_decision(spark, path, monitor).collect()[0]
    assert dec["should_rebuild"] is not None and int(dec["n_recent_batches"]) >= 1
