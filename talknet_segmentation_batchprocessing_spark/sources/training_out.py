"""The ship-it step: write the curated corpus as training shards.

Composes the capstone ``curation_pipeline`` (dedup ∩ quality ∩
not-contaminated + split) with the deterministic seed-salted shard
assignment of ``shuffle_shard_assign`` and lands the result as
``split=<s>/shard=<k>/`` hive-partitioned parquet — the layout a
training loader consumes (each worker reads its shard's files in
``pos`` order; partition pruning gives split/shard selection for
free). Returns the audit manifest (rows per split x shard) a pipeline
records next to the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, Window


def write_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Run the curation capstone, assign deterministic shards and
    within-shard order, write hive-partitioned parquet, and return
    the per-(split, shard) manifest."""
    from ..queries.dataset_ops import curation_pipeline

    kept = curation_pipeline(spark, sf_dir)  # doc_id, lang, n_tokens, split
    skey = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id"))), 1, 12), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("split", "shard").orderBy("skey", "doc_id")
    sharded = (
        kept.withColumn("skey", skey)
        .withColumn("shard", F.col("skey") % n_shards)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "lang", "n_tokens", "pos", "split", "shard")
    )
    (
        sharded.repartition("split", "shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(out_dir)
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("split", "shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )
