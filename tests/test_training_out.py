"""Ship-it step: curated corpus -> hive-partitioned training shards."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from talknet_segmentation_batchprocessing_spark import registry
from talknet_segmentation_batchprocessing_spark.sources.training_out import (
    write_training_shards,
)

from .conftest import SF_SMOKE

registry._ensure_loaded()


def test_write_training_shards_layout_and_counts(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(spark, SF_SMOKE, out, n_shards=4).collect()

    kept = registry.REGISTRY["curation_pipeline"].fn(spark, SF_SMOKE)
    n_kept = kept.count()
    assert n_kept > 0
    assert sum(r.n_docs for r in manifest) == n_kept

    # hive layout with both partition levels present
    dirs = glob.glob(os.path.join(out, "split=*", "shard=*"))
    assert dirs, "expected split=/shard= partition dirs"

    back = spark.read.parquet(out)
    # partition pruning works: one split+shard reads a subset
    s0 = manifest[0]
    sub = back.filter((F.col("split") == s0.split) & (F.col("shard") == s0.shard))
    assert sub.count() == s0.n_docs

    # within-shard positions are a dense 1..n sequence (training order)
    pos = sorted(r.pos for r in sub.select("pos").collect())
    assert pos == list(range(1, s0.n_docs + 1))

    # deterministic: a second run reproduces the same assignment
    out2 = str(tmp_path / "shards2")
    write_training_shards(spark, SF_SMOKE, out2, n_shards=4)
    a = spark.read.parquet(out).orderBy("doc_id").collect()
    b = spark.read.parquet(out2).orderBy("doc_id").collect()
    assert a == b
