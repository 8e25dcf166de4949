"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (W1 gaps-and-islands speaking
segmentation) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
full oracle-checked inventory from
``talknet_segmentation_batchprocessing_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from talknet_segmentation_batchprocessing_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry._ensure_loaded()
    # release_persisted: repeated entry() calls in a long-lived session
    # must not accumulate caches left by earlier queries
    registry.release_persisted()
    return registry.REGISTRY["w1_speaking_segments"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; rows-only
    sequential kernels (greedy tracking J6, greedy NMS W6) are omitted
    by design."""
    return registry.all_oracles()
