"""The full on-disk ANN index lifecycle, end to end in one test:

seed-build -> streaming ingest (2 micro-batches) -> drift monitor ->
compaction (replay window closes) -> stale replay REFUSED, index
unchanged -> post-compaction appends continue -> full rebuild clears
the epoch -> fresh stream generation ingests from batch 0 -> final
search still equals the registered full-corpus answer.

Each arc is covered by its own focused test elsewhere
(tests/test_ann_ingest.py, tests/test_ann_drift.py); this one pins
that the arcs COMPOSE — the operational story an operator actually
runs over weeks, compressed into one corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark.registry import load
from talknet_segmentation_batchprocessing_spark.sources.ivf_index import (
    append_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    search_ivf_index,
)
from talknet_segmentation_batchprocessing_spark.streaming.ann_drift import (
    batch_drift_stats,
)

from .conftest import SF_SMOKE


def test_index_lifecycle_end_to_end(spark, tmp_path):
    emb = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    cut = max(256, n // 2)
    q3 = cut + (n - cut) // 3
    q6 = cut + 2 * (n - cut) // 3
    path = str(tmp_path / "lifecycle_index")

    queries = (
        load(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )

    def search():
        return sorted(
            tuple(r)
            for r in search_ivf_index(spark, path, queries, k=3, nprobe=2)
            .collect()
        )

    # the registered full-corpus answer is the invariant the whole
    # lifecycle must preserve
    from talknet_segmentation_batchprocessing_spark.queries.extensions import (
        sim_ivf_topk,
    )

    want_full = sorted(
        tuple(r)
        for r in sim_ivf_topk(spark, SF_SMOKE)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .collect()
    )

    # 1) seed + two micro-batch appends (the streaming sink's writes)
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    append_ivf_index(
        emb.filter((F.col("vec_id") >= cut) & (F.col("vec_id") < q3)),
        path,
        batch_id=0,
    )
    append_ivf_index(
        emb.filter((F.col("vec_id") >= q3) & (F.col("vec_id") < q6)),
        path,
        batch_id=1,
    )

    # 2) drift monitor over an arriving batch is comparable to the
    # seed cohort (same centroids, same grid)
    seed_stats = batch_drift_stats(
        spark, emb.filter(F.col("vec_id") < cut), path
    ).collect()[0]
    arr_stats = batch_drift_stats(
        spark,
        emb.filter((F.col("vec_id") >= cut) & (F.col("vec_id") < q6)),
        path,
    ).collect()[0]
    assert int(seed_stats["n_vecs"]) == cut
    assert int(arr_stats["n_vecs"]) == q6 - cut
    assert int(arr_stats["mean_cos_ppb"]) > 0

    # 3) compact: replay window closes at epoch 1
    before = search()
    compact_ivf_index(spark, path)
    assert search() == before
    with open(os.path.join(path, "_COMPACTION_EPOCH")) as f:
        assert int(f.read().strip()) == 1

    # 4) a stale checkpoint's replay of batch 1 is refused, index intact
    with pytest.raises(RuntimeError, match="compaction epoch"):
        append_ivf_index(
            emb.filter((F.col("vec_id") >= q3) & (F.col("vec_id") < q6)),
            path,
            batch_id=1,
        )
    assert search() == before

    # 5) the stream continues past the marker with the rest of the data
    append_ivf_index(emb.filter(F.col("vec_id") >= q6), path, batch_id=2)
    assert search() == want_full

    # 6) drift says rebuild -> full rebuild clears the epoch and starts
    # a fresh generation whose numbering restarts at 0
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path, batch_id=-1)
    assert not os.path.exists(os.path.join(path, "_COMPACTION_EPOCH"))
    append_ivf_index(emb.filter(F.col("vec_id") >= cut), path, batch_id=0)
    assert search() == want_full
