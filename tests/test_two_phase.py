"""plans/two_phase.py: randomized equivalence against the naive
single-partition window forms — heavy ties (equal keys MUST share a
bucket so any tiebreak stays within a partition-local window),
negative keys, and both sort directions."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F


def _frame(spark, seed, n=800, n_keys=25):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "key": rng.integers(-n_keys, n_keys, size=n).astype(float),
            "val": rng.standard_normal(n).round(3),
        }
    )
    return spark.createDataFrame(pdf).repartition(8)


def test_global_rank_matches_naive(spark):
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import global_rank
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    for desc in (False, True):
        df = _frame(spark, seed=1)
        got = (
            global_rank(df, "key", ["id"], descending=desc, out_col="rn", n_buckets=7)
            .select("id", "rn")
            .toPandas()
            .sort_values("id")
        )
        order = [F.desc("key") if desc else F.asc("key"), F.col("id")]
        want = (
            df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
            .select("id", "rn")
            .toPandas()
            .sort_values("id")
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
        release_persisted()


def test_global_cumsum_matches_naive(spark):
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import global_cumsum
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    df = _frame(spark, seed=2)
    got = (
        global_cumsum(df, "key", "val", ["id"], out_col="cum", n_buckets=7)
        .select("id", "cum")
        .toPandas()
        .sort_values("id")
    )
    w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.withColumn("cum", F.sum("val").over(w))
        .select("id", "cum")
        .toPandas()
        .sort_values("id")
    )
    np.testing.assert_allclose(
        got.cum.to_numpy(), want.cum.to_numpy(), rtol=0, atol=1e-9
    )
    release_persisted()


def test_global_lead_matches_naive(spark):
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import global_lead
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    for desc in (False, True):
        df = _frame(spark, seed=3)
        got = (
            global_lead(df, "key", ["id"], ["val", "id"], descending=desc, n_buckets=7)
            .select("id", "_next_val", "_next_id")
            .toPandas()
            .sort_values("id")
        )
        order = [F.desc("key") if desc else F.asc("key"), F.col("id")]
        w = Window.orderBy(*order)
        want = (
            df.withColumn("_next_val", F.lead("val").over(w))
            .withColumn("_next_id", F.lead("id").over(w))
            .select("id", "_next_val", "_next_id")
            .toPandas()
            .sort_values("id")
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False,
        )
        release_persisted()
