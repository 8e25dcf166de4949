"""plans/two_phase.py: randomized equivalence against the naive
single-partition window forms — heavy ties (equal keys MUST share a
bucket so any tiebreak stays within a partition-local window),
negative keys, and both sort directions.

Every test runs BOTH adaptive paths: the default (800 rows sits below
CROSSOVER_ROWS, so the one-phase opaque-partition window runs) and a
forced two-phase pass with CROSSOVER_ROWS patched to 0.
"""

from __future__ import annotations

import contextlib

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


@contextlib.contextmanager
def _crossover(value):
    from talknet_segmentation_batchprocessing_spark.plans import two_phase

    old = two_phase.CROSSOVER_ROWS
    two_phase.CROSSOVER_ROWS = value
    try:
        yield
    finally:
        two_phase.CROSSOVER_ROWS = old


def _both_paths():
    # (label, crossover): default exercises the one-phase branch at
    # n=800; 0 forces the bucketed two-phase branch.
    yield "one-phase", None
    yield "two-phase", 0


def test_global_rank_matches_naive(spark):
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import global_rank
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    for _label, xo in _both_paths():
        with _crossover(xo) if xo is not None else contextlib.nullcontext():
            for desc in (False, True):
                df = _frame(spark, seed=1)
                got = (
                    global_rank(
                        df, "key", ["id"], descending=desc, out_col="rn", n_buckets=7
                    )
                    .select("id", "rn")
                    .toPandas()
                    .sort_values("id")
                )
                order = [F.desc("key") if desc else F.asc("key"), F.col("id")]
                # the helper emits BIGINT (the two-phase offset sum can
                # cross 2^31), so the naive row_number is cast to match
                want = (
                    df.withColumn(
                        "rn",
                        F.row_number().over(Window.orderBy(*order)).cast("bigint"),
                    )
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

    for _label, xo in _both_paths():
        with _crossover(xo) if xo is not None else contextlib.nullcontext():
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

    for _label, xo in _both_paths():
        with _crossover(xo) if xo is not None else contextlib.nullcontext():
            for desc in (False, True):
                df = _frame(spark, seed=3)
                got = (
                    global_lead(
                        df, "key", ["id"], ["val", "id"], descending=desc, n_buckets=7
                    )
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
                    got.reset_index(drop=True),
                    want.reset_index(drop=True),
                    check_dtype=False,
                )
                release_persisted()


def test_one_phase_keeps_real_partition_spec(spark):
    """The one-phase path must NOT fold to an empty window partition
    spec (the 'No Partition Defined' single-partition hazard): the
    opaque partition column survives into the physical plan."""
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import global_rank
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    df = _frame(spark, seed=4)
    out = global_rank(df, "key", ["id"], out_col="rn")
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "_tp_p" in physical, physical
    release_persisted()


def test_ap_zero_positives_null(spark):
    """ANSI guard: zero positives must yield a NULL AP (oracle x/0
    semantics), not DIVIDE_BY_ZERO — on both adaptive paths."""
    from talknet_segmentation_batchprocessing_spark.operators.aggregates import (
        average_precision,
    )
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    pdf = pd.DataFrame(
        {"uid": [f"u{i}" for i in range(20)], "score": np.linspace(0, 1, 20),
         "is_positive": [0] * 20}
    )
    for _label, xo in _both_paths():
        with _crossover(xo) if xo is not None else contextlib.nullcontext():
            df = spark.createDataFrame(pdf)
            rows = average_precision(df, "score", "is_positive").collect()
            assert len(rows) == 1 and rows[0]["ap"] is None, (_label, rows)
            release_persisted()


def test_parquet_rows_footer_counts():
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import parquet_rows

    import duckdb

    n = parquet_rows("/root/testdata/sf0.001", "events", "orders")
    want = duckdb.sql(
        "SELECT (SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet'))"
        " + (SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/orders.parquet'))"
    ).fetchone()[0]
    assert n == want
    assert parquet_rows("/root/testdata/sf0.001", "no_such_table") is None


def test_n_upper_hint_skips_action_and_persist(spark):
    """Below the crossover a proven bound must trigger ZERO Spark jobs
    inside prepare_keyed (no persist, no count/quantile action) while
    the result stays identical to the measured path."""
    from talknet_segmentation_batchprocessing_spark.plans import two_phase
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import (
        global_rank,
        prepare_keyed,
    )
    from talknet_segmentation_batchprocessing_spark import registry
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    release_persisted()
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 37 % 101).cast("double").alias("key")
    )
    n_persisted_before = len(registry._PERSISTED)
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    out_df, n, bnds = prepare_keyed(df, "key", n_upper=1000)
    assert n == 1000 and bnds == []
    assert len(registry._PERSISTED) == n_persisted_before  # no persist
    assert len(tracker.getJobIdsForGroup() or []) == jobs_before  # no job

    hinted = global_rank(df, "key", tiebreak_cols=("id",), n_upper=1000).toPandas()
    release_persisted()
    measured = global_rank(df, "key", tiebreak_cols=("id",)).toPandas()
    release_persisted()
    pd.testing.assert_frame_equal(
        hinted.sort_values("id").reset_index(drop=True),
        measured.sort_values("id").reset_index(drop=True),
    )


def test_n_upper_above_crossover_falls_back_to_measured(spark):
    """A bound ABOVE the crossover proves nothing: the exact count must
    run and (with the forced tiny crossover) pick the two-phase plan."""
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import global_rank
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 17).cast("double").alias("key")
    )
    with _crossover(0):
        out = global_rank(
            df, "key", tiebreak_cols=("id",), n_upper=10**9
        ).toPandas()
    release_persisted()
    naive = (
        df.toPandas()
        .sort_values(["key", "id"])
        .assign(rn=range(1, 501))
        .sort_values("id")
        .reset_index(drop=True)
    )
    got = out.sort_values("id").reset_index(drop=True)
    assert (got["rn"].to_numpy() == naive["rn"].to_numpy()).all()


def test_edge_cases_empty_all_tied_single_row(spark):
    """Degenerate shapes through BOTH phase paths: empty input, every
    key identical (all ties -> one bucket), and a single row."""
    from talknet_segmentation_batchprocessing_spark.plans.two_phase import (
        global_cumsum,
        global_lead,
        global_rank,
    )
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    schema = "id long, key double"
    empty = spark.createDataFrame([], schema)
    tied = spark.createDataFrame([(i, 7.0) for i in range(20)], schema)
    single = spark.createDataFrame([(1, 3.0)], schema)

    for crossover in (None, 0):
        ctx = _crossover(crossover) if crossover is not None else contextlib.nullcontext()
        with ctx:
            assert global_rank(empty, "key", ("id",)).count() == 0
            release_persisted()
            r = global_rank(tied, "key", ("id",)).toPandas().sort_values("id")
            assert r["rn"].tolist() == list(range(1, 21))
            release_persisted()
            c = global_cumsum(single, "key", "key").toPandas()
            assert c["cum"].tolist() == [3.0]
            release_persisted()
            ld = global_lead(tied, "key", ("id",), lead_cols=("id",)).toPandas()
            led = ld.sort_values("id")["_next_id"].tolist()
            assert led[:-1] == list(range(1, 20)) and pd.isna(led[-1])
            release_persisted()
