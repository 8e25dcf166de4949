"""F1-F11 projection/filter/predicate queries (SURVEY.md §2.2).

Each one keeps the filter expressible as a pushable predicate —
`.explain` shows PushedFilters reaching the parquet scan for F1/F7/F8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..registry import load, query


@query(
    "f1_confidence_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 45.0
""",
    doc="F1 strict-> confidence threshold (demoTalkNet.py:121 conf_th=0.9); "
    "predicate pushed to the parquet scan",
    tags=("F1",),
)
def f1_confidence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 45.0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "f2_arithmetic_filter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       floor(l_extendedprice / l_quantity * 100.0 + 0.5) / 100.0 AS unit_price
FROM lineitem WHERE l_extendedprice / l_quantity >= 1500.0
""",
    doc="F2 arithmetic predicate (shot length end-start >= minTrack, "
    "demoTalkNet.py:521)",
    tags=("F2",),
)
def f2_arithmetic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    # floor(x*100+0.5)/100 instead of round(): Spark rounds via BigDecimal
    # HALF_UP on the exact binary double while DuckDB rounds on the decimal
    # string, so borderline doubles differ; this expression is pure IEEE
    # double arithmetic and bit-identical on both engines.
    return li.filter(unit >= 1500.0).select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(unit * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)).alias("unit_price"),
    )


@query(
    "f3_having_count",
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(*) > 10
""",
    doc="F3 track-length filter: GROUP BY ... HAVING count(*) > minTrack "
    "(demoTalkNet.py:167 len(track) > minTrack)",
    tags=("F3",),
)
def f3_having_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 10)
    )


@query(
    "f4_having_greatest_avg",
    oracle="""
SELECT l_partkey,
       floor((avg(l_quantity)) * 1e3 + 0.5) / 1e3 AS mean_w,
       floor((avg(l_discount * 100)) * 1e3 + 0.5) / 1e3 AS mean_h
FROM lineitem GROUP BY l_partkey
HAVING greatest(avg(l_quantity), avg(l_discount * 100)) > 25.0
""",
    doc="F4 face-size filter: HAVING greatest(avg(w), avg(h)) > minFaceSize "
    "(demoTalkNet.py:176)",
    tags=("F4", "A2"),
)
def f4_having_greatest_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.avg("l_quantity").alias("_w"),
            F.avg(F.col("l_discount") * 100).alias("_h"),
        )
        .filter(F.greatest(F.col("_w"), F.col("_h")) > 25.0)
        .select(
            "l_partkey",
            stable_round("_w", 3).alias("mean_w"),
            stable_round("_h", 3).alias("mean_h"),
        )
    )


@query(
    "f7_isin_filter",
    oracle="""
SELECT event_id, user_id, event_type FROM events
WHERE event_type IN ('click', 'purchase')
""",
    doc="F7 label partition filter: WHERE label_id IN (...) "
    "(utils/tools.py:110-112)",
    tags=("F7",),
)
def f7_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type"
    )


@query(
    "f8_range_filter",
    oracle="""
SELECT event_id, user_id, value FROM events
WHERE value BETWEEN 10.0 AND 20.0
""",
    doc="F8 clip-duration range filter (TalkSet/generate_TalkSet.py:42-45 "
    "end-start <= 3s)",
    tags=("F8", "S3"),
)
def f8_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value").between(10.0, 20.0)).select(
        "event_id", "user_id", "value"
    )


@query(
    "f9_ordered_limit",
    oracle="SELECT event_id, ts FROM events ORDER BY event_id LIMIT 1000",
    doc="F9 row limit (TalkSet/generate_TalkSet.py:33,46 first-30000 lines); "
    "pinned to a total order for determinism",
    tags=("F9",),
)
def f9_ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.orderBy("event_id").limit(1000).select("event_id", "ts")


@query(
    "f10_least_cap",
    oracle="""
SELECT l_orderkey, l_linenumber, least(l_quantity, 25.0) AS capped_qty
FROM lineitem
""",
    doc="F10 length cap via LEAST (TalkSet/generate_TalkSet.py:376-387 "
    "6 s clamp)",
    tags=("F10",),
)
def f10_least_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("capped_qty"),
    )


@query(
    "f11_project_rename",
    oracle="""
SELECT o_orderkey AS okey, o_totalprice AS score,
       'SPEAKING_AUDIBLE' AS label
FROM orders
""",
    doc="F11 column drop/rename + constant label injection "
    "(talkNet.py:112-114 predictions csv shaping)",
    tags=("F11", "S9"),
)
def f11_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("score"),
        F.lit("SPEAKING_AUDIBLE").alias("label"),
    )
