"""TPC-H-shaped relational benchmark queries beyond the q1/q3/q5 trio
(queries/aggregates.py): the remaining canonical OLAP join/agg postures
expressible over the reduced testdata schema (no partsupp table; no
commitdate/receiptdate/shipmode/container/phone columns — each query
notes its adaptation).

Why these matter for the engine: every TPC-H query class exercises a
distinct physical posture a 100 TB deployment hits daily —

- q6: pure scan-agg (predicate pushdown + whole-stage codegen, zero
  shuffle beyond the final 1-row combine);
- q4: EXISTS -> left-semi join (never materializes the fan-out);
- q7/q8: snowflake joins with broadcast dimension chains and
  conditional aggregation;
- q10/q18: fact-fact joins feeding TopK (TakeOrderedAndProject, no
  global sort);
- q13: LEFT OUTER + double aggregation (the count-of-counts shape);
- q14/q19: broadcast dim join with conditional / disjunctive
  predicates (codegen-friendly CASE WHEN, OR-of-conjunctions);
- q15: aggregate -> global-max -> join-back (scalar-subquery shape
  done as a 1-row broadcast, not a driver collect);
- q17: per-group average threshold (window/groupBy join-back instead
  of a correlated subquery — Catalyst cannot decorrelate what we can
  simply never correlate);
- q21: the classic EXISTS/NOT-EXISTS double self-join, rewritten as
  ONE groupBy over the order — two fewer shuffles of the fact table;
- q22: anti-join + global-average scalar (broadcast, not collect);
- q2/q9/q11/q16/q20 (derived-partsupp family, see _PARTSUPP_SQL):
  per-group-min join-back snowflake (q2), the compound-key fact-fact
  join (q9 — the hardest join in TPC-H), HAVING-vs-global-scalar
  (q11), count-distinct + NOT-IN anti-join (q16), and the nested
  EXISTS-over-aggregate chain as a window over one grouped pass
  (q20).

- q12: fact-fact join feeding complementary conditional counts per
  class (CASE WHEN inside sum, one codegen pass).

With these, all 22 canonical TPC-H query classes are covered: 19
here + q1/q3/q5 in queries/aggregates.py.

All money aggregates ride the exact 1e6 integer grid (the q1
sum_disc_price rule, see _REV_PPM_SQL in aggregates.py) so BIGINT
associativity makes Spark/DuckDB hashes identical; quantities ride a
1e2 grid. Every ranking carries a deterministic final tie-break key.

Scale posture: dimension chains (region/nation, part at 1/5 of
customer cardinality... still SF-linear) are broadcast ONLY when
constant-size; SF-linear sides are left to AQE exactly as q3/q5 do —
a forced broadcast of a filtered fact is the classic SF100 driver-OOM
(ADVICE r6). Reference parity: the reference engine has no TPC-H
suite; these queries document the engine's general-OLAP completeness
(SURVEY.md §2 extension families), oracled like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import load, query
from .aggregates import _REV_PPM_SQL, _rev_ppm_col

# quantity grid: l_quantity is float with <=2 decimals in the data;
# quantize to 1e2 BEFORE summing so the total is an exact BIGINT
_QTY_PPC_SQL = "CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT)"


def _qty_ppc_col():
    return F.floor(F.col("l_quantity") * F.lit(1e2) + F.lit(0.5)).cast("bigint")


# ---------------------------------------------------------------- q6


@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       floor(CAST(sum(CAST(floor(l_extendedprice * l_discount * 1e6 + 0.5)
                           AS BIGINT)) AS BIGINT) / 1e4 + 0.5) / 1e2 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H-Q6-shaped forecast revenue change: the canonical pure "
    "scan-aggregate. All three predicates push to the parquet scan "
    "(PushedFilters in the plan), the projection prunes to 3 columns, "
    "and the only exchange is the final single-row combine — the "
    "query Catalyst should execute as one codegen stage, and does",
    tags=("A1", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_rev = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            (
                F.floor(F.sum(disc_rev).cast("bigint") / F.lit(1e4) + F.lit(0.5))
                / F.lit(1e2)
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------- q4

_Q4_LO = "1996-07-01"
_Q4_HI = "1996-10-01"


@query(
    "q4_order_priority",
    oracle=f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_HI} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
    doc="TPC-H-Q4-shaped order priority checking (adapted: the schema "
    "has no commit/receipt dates, so 'late' means a lineitem shipped "
    ">30 days after the order date). The EXISTS is a LEFT SEMI join — "
    "Spark never materializes the order x lineitem fan-out, and the "
    "duplicate-eliminating semantics come from the join type, not a "
    "distinct. Both sides are SF-linear: no broadcast is forced, AQE "
    "decides (q3's rule)",
    tags=("J7", "join"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        # timestamp + INTERVAL, not date_add: date_add truncates the
        # time-of-day before adding, diverging from the oracle's
        # '+ INTERVAL 30 DAY' whenever order timestamps are not
        # midnight-aligned
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


# ---------------------------------------------------------------- q7

_Q7_R1 = "ASIA"
_Q7_R2 = "EUROPE"


@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_region, cust_region, l_year,
       floor(CAST(sum(rev_ppm) AS BIGINT) / 1e4 + 0.5) / 1e2 AS revenue
FROM (
  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         {_REV_PPM_SQL} AS rev_ppm
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE ((r1.r_name = '{_Q7_R1}' AND r2.r_name = '{_Q7_R2}')
      OR (r1.r_name = '{_Q7_R2}' AND r2.r_name = '{_Q7_R1}'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_region, cust_region, l_year
""",
    doc="TPC-H-Q7-shaped volume shipping between two trading partners "
    "(adapted to REGION granularity: the testdata's nation-level "
    "trade volume is too sparse to exercise the query below sf0.01, "
    "so the two partners are regions — same posture, one more "
    "broadcast hop in the dim chain). The disjunctive pair predicate "
    "is applied as two BROADCAST joins against the region->nation "
    "chain (supplier and customer sides independently filtered to "
    "the 2-region set, the pair disjunction checked after both names "
    "are attached) — the classic Q7 plan that keeps the fact-side "
    "join tree free of the OR. Grouped on (supp_region, cust_region, "
    "year): 4 output rows, map-side combined",
    tags=("A1", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = [_Q7_R1, _Q7_R2]
    reg = load(spark, sf_dir, "region").filter(F.col("r_name").isin(pair))
    nat = load(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.select("n_nationkey", F.col("r_name").alias("supp_region"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_region")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("n2_key"),
                    F.col("r_name").alias("cust_region"),
                )
            ),
            F.col("c_nationkey") == F.col("n2_key"),
        )
        .select("c_custkey", "cust_region")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _rev_ppm_col().alias("rev_ppm"),
        )
    )
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_region") == _Q7_R1) & (F.col("cust_region") == _Q7_R2))
            | ((F.col("supp_region") == _Q7_R2) & (F.col("cust_region") == _Q7_R1))
        )
    )
    return j.groupBy("supp_region", "cust_region", "l_year").agg(
        (
            F.floor(F.sum("rev_ppm").cast("bigint") / F.lit(1e4) + F.lit(0.5))
            / F.lit(1e2)
        ).alias("revenue")
    )


# ---------------------------------------------------------------- q8

_Q8_REGION = "AMERICA"
_Q8_NATION = "NATION_1"
_Q8_TYPE = "ECONOMY"


@query(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       floor(CAST(sum(CASE WHEN nation = '{_Q8_NATION}' THEN rev_ppm ELSE 0 END)
                  AS BIGINT) * 1e4
             / CAST(sum(rev_ppm) AS BIGINT) + 0.5) / 1e4 AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {_REV_PPM_SQL} AS rev_ppm,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = '{_Q8_REGION}'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND p.p_type = '{_Q8_TYPE}'
) all_nations
GROUP BY o_year
""",
    doc="TPC-H-Q8-shaped national market share: the deepest snowflake "
    "in the suite (8-way). The region->nation chain broadcasts "
    "(constant-size); the type-filtered part side is SF-linear so its "
    "join strategy is left to AQE (broadcast while small, shuffle at "
    "scale); the share is a single conditional aggregation over "
    "the joined facts — no second pass, no self-join. The ratio is "
    "computed on BIGINT ppm totals and rounded to 1e-4 on both "
    "engines so the division cannot split hashes",
    tags=("A4", "join"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q8_REGION)
        .select("r_regionkey")
    )
    nat_cust = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nat_cust), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    nat_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat_supp), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("bigint").alias("o_year"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_ppm_col().alias("rev_ppm")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
    )
    num = F.sum(
        F.when(F.col("nation") == _Q8_NATION, F.col("rev_ppm")).otherwise(F.lit(0))
    ).cast("bigint")
    den = F.sum("rev_ppm").cast("bigint")
    return j.groupBy("o_year").agg(
        (F.floor(num * F.lit(1e4) / den + F.lit(0.5)) / F.lit(1e4)).alias("mkt_share")
    )


# --------------------------------------------------------------- q10

_Q10_LO = "1996-10-01"
_Q10_HI = "1997-01-01"


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       floor(CAST(sum(rev_ppm) AS BIGINT) / 1e4 + 0.5) / 1e2 AS revenue,
       c_acctbal, n_name
FROM (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         {_REV_PPM_SQL} AS rev_ppm
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{_Q10_HI} 00:00:00'
    AND l.l_returnflag = 'R'
) t
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY CAST(sum(rev_ppm) AS BIGINT) DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H-Q10-shaped returned item reporting: fact-fact join "
    "(quarter-filtered orders x returnflag-filtered lineitem) grouped "
    "by customer, top-20 by revenue. The ranking is TakeOrdered on "
    "the exact BIGINT ppm total with c_custkey as the deterministic "
    "tie-break (TPC-H's own ORDER BY revenue alone would be "
    "cross-engine-unstable); the nation name rides a broadcast. "
    "The limit collapses to TakeOrderedAndProject — no global sort",
    tags=("W5", "join", "bench"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_ppm_col().alias("rev_ppm"))
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    )
    g = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum("rev_ppm").cast("bigint").alias("rev_total")
    )
    return (
        g.orderBy(F.col("rev_total").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.floor(F.col("rev_total") / F.lit(1e4) + F.lit(0.5)) / F.lit(1e2)).alias(
                "revenue"
            ),
            "c_acctbal",
            "n_name",
        )
    )


# --------------------------------------------------------------- q13


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
    doc="TPC-H-Q13-shaped customer order-count distribution (adapted: "
    "the schema has no o_comment, so the anti-pattern filter is "
    "priority <> 1-URGENT). The LEFT OUTER join keeps zero-order "
    "customers (count(o_orderkey) counts non-NULLs, so they land in "
    "the c_count=0 bucket — the whole point of Q13), then a second "
    "count-of-counts aggregation. Two shuffles by construction; the "
    "second one is tiny (distinct order counts)",
    tags=("A3", "join"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


# --------------------------------------------------------------- q14

_Q14_LO = "1996-03-01"
_Q14_HI = "1996-04-01"


@query(
    "q14_promo_effect",
    oracle=f"""
SELECT floor(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_ppm ELSE 0 END)
                  AS BIGINT) * 1e6
             / CAST(sum(rev_ppm) AS BIGINT) + 0.5) / 1e4 AS promo_revenue
FROM (
  SELECT p.p_type, {_REV_PPM_SQL} AS rev_ppm
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{_Q14_HI} 00:00:00'
) t
""",
    doc="TPC-H-Q14-shaped promo revenue share (p_type here is a single "
    "word, so the PROMO%% prefix match is equality). part is SF-linear "
    "so AQE picks its join strategy (broadcast while small, shuffle at "
    "scale); the month filter pushes to the lineitem scan; the "
    "percentage is one conditional aggregation over BIGINT ppm "
    "totals, rounded to 1e-4 on both engines",
    tags=("A4", "join"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp"))
        )
        .select("l_partkey", _rev_ppm_col().alias("rev_ppm"))
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_ppm")).otherwise(F.lit(0))
    ).cast("bigint")
    den = F.sum("rev_ppm").cast("bigint")
    return j.agg(
        (F.floor(num * F.lit(1e6) / den + F.lit(0.5)) / F.lit(1e4)).alias(
            "promo_revenue"
        )
    )


# --------------------------------------------------------------- q15

_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_PPM_SQL}) AS BIGINT) AS total_ppm
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{_Q15_HI} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       floor(r.total_ppm / 1e4 + 0.5) / 1e2 AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_ppm = (SELECT max(total_ppm) FROM revenue)
""",
    doc="TPC-H-Q15-shaped top supplier: quarterly revenue per supplier, "
    "then the rows matching the global max. The scalar subquery is a "
    "1-row broadcast join of max(total_ppm) back onto the aggregate — "
    "never a driver collect — and the max is taken on the exact "
    "BIGINT ppm total so the equality cannot be split by float "
    "rounding. The revenue aggregate is computed once and reused for "
    "both sides (Spark reuses the exchange)",
    tags=("W5", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
        )
        .select("l_suppkey", _rev_ppm_col().alias("rev_ppm"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum("rev_ppm").cast("bigint").alias("total_ppm")
    )
    mx = revenue.agg(F.max("total_ppm").alias("max_ppm"))
    top = revenue.join(
        F.broadcast(mx), revenue.total_ppm == F.col("max_ppm")
    ).select("supplier_no", "total_ppm")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(supp, top.supplier_no == supp.s_suppkey).select(
        "s_suppkey",
        "s_name",
        (F.floor(F.col("total_ppm") / F.lit(1e4) + F.lit(0.5)) / F.lit(1e2)).alias(
            "total_revenue"
        ),
    )


# --------------------------------------------------------------- q17

_Q17_BRAND = "Brand#23"


@query(
    "q17_small_qty_revenue",
    oracle=f"""
WITH li AS (
  SELECT l.l_partkey, {_QTY_PPC_SQL} AS qty_ppc,
         CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT) AS price_ppc
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = '{_Q17_BRAND}' AND p.p_size <= 10
),
thresh AS (
  SELECT l_partkey,
         CAST(floor(0.2 * avg(qty_ppc) + 0.5) AS BIGINT) AS lim_ppc
  FROM li GROUP BY l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_small,
       floor(CAST(sum(li.price_ppc) AS BIGINT) / 7.0 / 1e0 + 0.5) / 1e2
         AS avg_yearly
FROM li JOIN thresh ON li.l_partkey = thresh.l_partkey
WHERE li.qty_ppc < thresh.lim_ppc
""",
    doc="TPC-H-Q17-shaped small-quantity-order revenue (adapted: no "
    "p_container column, so the part filter is brand + size<=10). "
    "The classic correlated subquery (qty < 0.2*avg(qty) per part) "
    "is decorrelated by construction: ONE groupBy computes the "
    "per-part threshold, then a partkey-equi join-back. The filtered "
    "part set and thresh are brand-bounded but still SF-linear, so "
    "their join strategy is AQE's call (broadcast while small); both "
    "the li CTE and thresh stay narrow (2-3 columns). The 0.2*avg "
    "threshold is floored onto the same 1e2 "
    "integer grid as the quantities so the strict < compares exact "
    "integers on both engines",
    tags=("A2", "join"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == _Q17_BRAND) & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            _qty_ppc_col().alias("qty_ppc"),
            F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
            .cast("bigint")
            .alias("price_ppc"),
        )
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.floor(F.lit(0.2) * F.avg("qty_ppc") + F.lit(0.5))
        .cast("bigint")
        .alias("lim_ppc")
    )
    small = li.join(
        thresh,
        (li.l_partkey == F.col("t_partkey")) & (li.qty_ppc < F.col("lim_ppc")),
    )
    return small.agg(
        F.count("*").cast("bigint").alias("n_small"),
        (
            F.floor(F.sum("price_ppc").cast("bigint") / F.lit(7.0) + F.lit(0.5))
            / F.lit(1e2)
        ).alias("avg_yearly"),
    )


# --------------------------------------------------------------- q18

_Q18_QTY_PPC = 350 * 100  # sum(l_quantity) > 350 on the 1e2 grid


@query(
    "q18_large_volume_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum({_QTY_PPC_SQL}) AS BIGINT) AS qty_ppc
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum({_QTY_PPC_SQL}) AS BIGINT) > {_Q18_QTY_PPC}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       floor(big.qty_ppc / 1e0 + 0.5) / 1e2 AS total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
    doc="TPC-H-Q18-shaped large-volume customers: the IN-subquery over "
    "a HAVING aggregate is computed directly as the driving side — "
    "aggregate lineitem once, HAVING-filter (map-side combined, the "
    "filter kills ~all groups), then join the small survivor set to "
    "orders and customer. AQE broadcasts the survivor side at any "
    "SF because the HAVING is what bounds it, not the table size. "
    "Top-100 by totalprice with orderkey tie-break = TakeOrdered",
    tags=("F3", "join", "bench"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", _qty_ppc_col().alias("qty_ppc")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_ppc").cast("bigint").alias("qty_ppc"))
        .filter(F.col("qty_ppc") > _Q18_QTY_PPC)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        j.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.floor(F.col("qty_ppc") + F.lit(0.5)) / F.lit(1e2)).alias("total_qty"),
        )
    )


# --------------------------------------------------------------- q19


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       floor(CAST(sum(rev_ppm) AS BIGINT) / 1e4 + 0.5) / 1e2 AS revenue
FROM (
  SELECT {_REV_PPM_SQL} AS rev_ppm
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         AND l.l_quantity >= 1 AND l.l_quantity <= 11)
     OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         AND l.l_quantity >= 10 AND l.l_quantity <= 20)
     OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity >= 20 AND l.l_quantity <= 30)
) t
""",
    doc="TPC-H-Q19-shaped disjunctive discounted revenue (adapted: no "
    "p_container/l_shipinstruct, so each disjunct is brand + size "
    "band + quantity band). The OR-of-conjunctions mixes columns "
    "from both sides, so it cannot become a join key — the correct "
    "plan is an equi-join on partkey (part side pre-filtered to the "
    "union of the three brand/size boxes — that single-side residue "
    "IS pushable; SF-linear, so AQE picks the join strategy) "
    "with the cross-side disjunction "
    "as a post-join filter inside codegen. Catalyst does exactly "
    "this given the declarative form",
    tags=("F7", "join"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load(spark, sf_dir, "part")
        .filter(
            ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
            | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
            | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev_ppm_col().alias("rev_ppm")
    )
    j = li.join(part, li.l_partkey == part.p_partkey).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_items"),
        (
            F.floor(F.sum("rev_ppm").cast("bigint") / F.lit(1e4) + F.lit(0.5))
            / F.lit(1e2)
        ).alias("revenue"),
    )


# --------------------------------------------------------------- q21

_Q21_LATE_DAYS = 60


@query(
    "q21_waiting_suppliers",
    oracle=f"""
WITH marked AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
),
per_supp AS (
  SELECT l_orderkey, l_suppkey, max(is_late) AS supp_late
  FROM marked GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_supps,
         CAST(sum(supp_late) AS BIGINT) AS n_late_supps
  FROM per_supp GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_supp ps
JOIN per_order po ON ps.l_orderkey = po.l_orderkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE ps.supp_late = 1 AND po.n_supps > 1 AND po.n_late_supps = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
    doc="TPC-H-Q21-shaped suppliers who kept orders waiting (adapted: "
    "'late' = shipped >60 days after the order date; no receipt/"
    "commit dates in the schema). The classic formulation is an "
    "EXISTS + NOT-EXISTS double self-join on lineitem — three scans "
    "of the biggest table. Spark-first rewrite: ONE scan, groupBy "
    "(orderkey, suppkey), then an orderkey-partitioned window "
    "computing n_supps and n_late_supps OVER the per-supplier rows "
    "(a window, not a second aggregate branch, so the plan has "
    "exactly ONE lineitem scan — a re-aggregation branch would scan "
    "the fact twice under AQE); the sole-late-supplier condition is "
    "then a flat filter (supp_late=1, n_supps>1, n_late_supps=1). "
    "The semantics are provably identical (EXISTS another supp <=> "
    "n_supps>1; NOT EXISTS another late supp <=> n_late_supps=1)",
    tags=("J7", "join", "bench"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    marked = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_late"),
    )
    per_supp = marked.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    w = Window.partitionBy("l_orderkey")
    culprit = (
        per_supp.withColumn("n_supps", F.count("*").over(w).cast("bigint"))
        .withColumn("n_late_supps", F.sum("supp_late").over(w).cast("bigint"))
        .filter(
            (F.col("supp_late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        culprit.join(supp, culprit.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------- q22

# TPC-H Q22 selects customers with no orders in the last 7 years; in
# this testdata every customer has SOME order, so the lapse cutoff is
# what makes the anti-join non-vacuous (29 idle customers at sf0.01).
_Q22_LAPSE = "1999-01-01"


@query(
    "q22_sales_opportunity",
    oracle=f"""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT))
              // count(*) AS BIGINT) AS abal_ppc
  FROM customer WHERE c_acctbal > 0.0
),
rich_idle AS (
  SELECT c.c_nationkey,
         CAST(floor(c.c_acctbal * 1e2 + 0.5) AS BIGINT) AS bal_ppc
  FROM customer c, avg_bal
  WHERE CAST(floor(c.c_acctbal * 1e2 + 0.5) AS BIGINT) > avg_bal.abal_ppc
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{_Q22_LAPSE} 00:00:00')
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       floor(CAST(sum(bal_ppc) AS BIGINT) / 1e0 + 0.5) / 1e2 AS totacctbal
FROM rich_idle GROUP BY c_nationkey
""",
    doc="TPC-H-Q22-shaped global sales opportunity: above-average-"
    "balance customers with no orders since the lapse date (Q22's "
    "own 'no orders for 7 years' clause; adapted: no c_phone, so the "
    "country-code grouping is c_nationkey directly). Three postures "
    "in one: the scalar average is a 1-row broadcast (never a "
    "collect), the lapsed-customer NOT EXISTS is a LEFT ANTI join "
    "against the date-filtered orders projection (the filter pushes "
    "to the scan BEFORE the anti-join), and the balance comparison "
    "happens on the exact 1e2 integer grid with the average computed "
    "as BIGINT sum div count — no double summation anywhere, so the "
    "strict > is engine-stable",
    tags=("U3", "join"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5))
        .cast("bigint")
        .alias("bal_ppc"),
        "c_acctbal",
    )
    # average on the quantized grid via exact BIGINT sum/count integer
    # division — avg() over raw doubles is combine-order-dependent in
    # the low bits, so floor(avg*1e2+0.5) can flip by one ulp between
    # engines and move boundary customers across the strict '>'
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT))"
                " div count(*) AS BIGINT)"
            ).alias("abal_ppc")
        )
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_LAPSE).cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(avg_bal), F.col("bal_ppc") > F.col("abal_ppc"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("numcust"),
        (F.floor(F.sum("bal_ppc").cast("bigint") + F.lit(0.5)) / F.lit(1e2)).alias(
            "totacctbal"
        ),
    )


# ------------------------------------------------- derived partsupp
# The testdata has no partsupp table; the five remaining TPC-H classes
# (q2/q9/q11/q16/q20) all revolve around it. The relationship it
# encodes — which supplier supplies which part, at what cost — is
# recoverable from lineitem: the distinct (l_partkey, l_suppkey)
# pairs, with min(l_extendedprice) as the supply-cost analog and the
# total shipped quantity as the availqty analog. Both ride exact
# integer grids (1e2) so every downstream aggregate is
# engine-stable BIGINT arithmetic. ONE map-side-combinable groupBy of
# the fact table — linear, 100 TB-safe — shared by all five queries.

_PARTSUPP_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(floor(min(l_extendedprice) * 1e2 + 0.5) AS BIGINT) AS ps_cost_ppc,
         CAST(sum({_QTY_PPC_SQL}) AS BIGINT) AS ps_qty_ppc
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.floor(F.min("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
        .cast("bigint")
        .alias("ps_cost_ppc"),
        F.sum(_qty_ppc_col()).cast("bigint").alias("ps_qty_ppc"),
    )


# ---------------------------------------------------------------- q2

_Q2_REGION = "EUROPE"
_Q2_TYPE = "LARGE"
_Q2_MAX_SIZE = 5


@query(
    "q2_min_cost_supplier",
    oracle=f"""
WITH ps AS ({_PARTSUPP_SQL}),
eligible AS (
  SELECT p.p_partkey, ps.ps_suppkey, ps.ps_cost_ppc,
         s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN part p ON p.p_partkey = ps.ps_partkey
   AND p.p_type = '{_Q2_TYPE}' AND p.p_size <= {_Q2_MAX_SIZE}
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_Q2_REGION}'
),
mn AS (
  SELECT p_partkey, min(ps_cost_ppc) AS min_cost_ppc
  FROM eligible GROUP BY p_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey,
       floor(e.ps_cost_ppc + 0.5) / 1e2 AS supply_cost
FROM eligible e
JOIN mn ON e.p_partkey = mn.p_partkey AND e.ps_cost_ppc = mn.min_cost_ppc
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, e.p_partkey
LIMIT 100
""",
    doc="TPC-H-Q2-shaped minimum-cost supplier (adapted: supply cost "
    "is the min lineitem price per (part, supplier) from the derived "
    "partsupp — see _PARTSUPP_SQL). The correlated min-cost subquery "
    "is decorrelated by construction: a partkey-partitioned window "
    "takes the per-part min over region-eligible suppliers in ONE "
    "pass (a groupBy + join-back would duplicate the eligible "
    "subtree into two plan branches), and the equality filter on the "
    "exact BIGINT cost keeps the argmin rows. Region->nation chain "
    "broadcasts; supplier/part sides are SF-linear so AQE picks "
    "their strategy; final top-100 is TakeOrdered with a full "
    "deterministic tie-break",
    tags=("J8", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q2_REGION)
        .select("r_regionkey")
    )
    nat = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE))
        .select("p_partkey")
    )
    ps = _derived_partsupp(spark, sf_dir)
    eligible = (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(supp, ps.ps_suppkey == supp.s_suppkey)
        .select("p_partkey", "ps_suppkey", "ps_cost_ppc", "s_name", "s_acctbal", "n_name")
    )
    # per-part min as a partkey window, not a groupBy + join-back: the
    # join-back form duplicates the whole eligible subtree into two
    # plan branches (9 shuffles measured); the window is one pass over
    # the same partitioning and keeps exactly the min-cost rows
    w = Window.partitionBy("p_partkey")
    top = eligible.withColumn(
        "min_cost_ppc", F.min("ps_cost_ppc").over(w)
    ).filter(F.col("ps_cost_ppc") == F.col("min_cost_ppc"))
    return (
        top.orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.floor(F.col("ps_cost_ppc") + F.lit(0.5)) / F.lit(1e2)).alias(
                "supply_cost"
            ),
        )
    )


# ---------------------------------------------------------------- q9

_Q9_WORD = "red"


@query(
    "q9_product_type_profit",
    oracle=f"""
WITH ps AS ({_PARTSUPP_SQL})
SELECT nation, o_year,
       floor(CAST(sum(profit_ppm) AS BIGINT) / 1e4 + 0.5) / 1e2 AS profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {_REV_PPM_SQL}
           - ps.ps_cost_ppc * {_QTY_PPC_SQL} * 100 AS profit_ppm
  FROM lineitem l
  JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%{_Q9_WORD}%'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
) profit
GROUP BY nation, o_year
""",
    doc="TPC-H-Q9-shaped product-type profit (adapted: profit = "
    "discounted revenue minus supply-cost x quantity, with the "
    "derived-partsupp min price as the cost analog; the p_name LIKE "
    "filter keeps Q9's non-indexable name predicate). The posture is "
    "the hardest join in TPC-H: a fact-fact equi-join of lineitem "
    "against the (partkey, suppkey)-keyed partsupp aggregate, both "
    "SF-linear, shuffled on the compound key — plus four more "
    "dimensions riding broadcast/AQE. All profit arithmetic is exact "
    "BIGINT on the 1e6 ppm grid (cost 1e2 x qty 1e2 x 100), so the "
    "nation/year rollup is engine-stable",
    tags=("A1", "join", "bench"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(_Q9_WORD))
        .select("p_partkey")
    )
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _rev_ppm_col().alias("rev_ppm"),
        _qty_ppc_col().alias("qty_ppc"),
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            "nation",
            "o_year",
            (
                F.col("rev_ppm")
                - F.col("ps_cost_ppc") * F.col("qty_ppc") * F.lit(100)
            ).alias("profit_ppm"),
        )
    )
    return j.groupBy("nation", "o_year").agg(
        (
            F.floor(F.sum("profit_ppm").cast("bigint") / F.lit(1e4) + F.lit(0.5))
            / F.lit(1e2)
        ).alias("profit")
    )


# --------------------------------------------------------------- q11

_Q11_NATION = "NATION_3"
_Q11_MEAN_MULT = 2  # keep parts worth more than 2x the mean part value


@query(
    "q11_important_stock",
    oracle=f"""
WITH ps AS ({_PARTSUPP_SQL}),
byp AS (
  SELECT ps.ps_partkey,
         CAST(sum(ps.ps_cost_ppc * ps.ps_qty_ppc) AS BIGINT) AS value4
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{_Q11_NATION}'
  GROUP BY ps.ps_partkey
),
tot AS (SELECT CAST(sum(value4) AS BIGINT) AS total4,
               CAST(count(*) AS BIGINT) AS n_parts FROM byp)
SELECT byp.ps_partkey, floor(byp.value4 / 1e2 + 0.5) / 1e2 AS part_value
FROM byp, tot
WHERE byp.value4 > {_Q11_MEAN_MULT} * (tot.total4 // tot.n_parts)
""",
    doc="TPC-H-Q11-shaped important stock identification: per-part "
    "inventory value (cost x quantity on the exact 1e4 integer grid) "
    "for one nation's suppliers, keeping parts above a multiple of "
    "the MEAN part value. TPC-H's own fraction scales by 1/SF so the "
    "row count stays stable as parts grow; a mean-relative threshold "
    "achieves the same SF-invariance without knowing SF (a fixed "
    "fraction-of-total returned 0 rows already at sf0.1). The "
    "HAVING-against-a-scalar-subquery is a 1-row broadcast join back "
    "onto the per-part aggregate — never a driver collect — and the "
    "threshold is exact integer division on both engines (BIGINT "
    "div), immune to float rounding. The per-part aggregate subtree "
    "is byte-identical on both branches, so Spark reuses the "
    "exchange (one lineitem scan at execution)",
    tags=("F3", "join"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == _Q11_NATION)
        .select("n_nationkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    ps = _derived_partsupp(spark, sf_dir)
    byp = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_ppc") * F.col("ps_qty_ppc"))
            .cast("bigint")
            .alias("value4")
        )
    )
    tot = byp.agg(
        F.sum("value4").cast("bigint").alias("total4"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    return (
        byp.join(
            F.broadcast(tot),
            F.col("value4")
            > F.lit(_Q11_MEAN_MULT) * F.expr("total4 div n_parts"),
        )
        .select(
            "ps_partkey",
            (F.floor(F.col("value4") / F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).alias(
                "part_value"
            ),
        )
    )


# --------------------------------------------------------------- q16

_Q16_SIZES = [1, 4, 9, 14, 19, 24, 30, 36]


@query(
    "q16_supplier_part_count",
    oracle=f"""
WITH ps AS ({_PARTSUPP_SQL})
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#23'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H-Q16-shaped supplier diversity count (adapted: the "
    "'customer complaints' exclusion is suppliers with negative "
    "account balance — the schema has no s_comment). Postures: "
    "negated predicates stay on the part scan, the NOT IN compiles "
    "to a LEFT ANTI join (null-safe because s_suppkey is non-null), "
    "and count(DISTINCT suppkey) per (brand, type, size) is Spark's "
    "two-phase distinct aggregate — partial per partition, no "
    "row-level distinct materialization",
    tags=("A8", "join"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#23")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(_Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = _derived_partsupp(spark, sf_dir)
    kept = ps.join(
        bad_supp, ps.ps_suppkey == bad_supp.s_suppkey, "left_anti"
    ).join(part, F.col("ps_partkey") == part.p_partkey)
    return kept.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt")
    )


# --------------------------------------------------------------- q20

_Q20_LO = "1996-01-01"
_Q20_HI = "1997-01-01"
_Q20_BRAND = "Brand#12"


@query(
    "q20_dominant_suppliers",
    oracle=f"""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum({_QTY_PPC_SQL}) AS BIGINT) AS qty_ppc,
         CAST(sum(CAST(sum({_QTY_PPC_SQL}) AS BIGINT))
              OVER (PARTITION BY l_partkey) AS BIGINT) AS part_qty_ppc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q20_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{_Q20_HI} 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT DISTINCT sh.l_suppkey
  FROM shipped sh
  JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_brand = '{_Q20_BRAND}'
  WHERE 2 * sh.qty_ppc > sh.part_qty_ppc
)
SELECT s.s_name, n.n_name, s.s_acctbal
FROM supplier s
JOIN dominant d ON d.l_suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
""",
    doc="TPC-H-Q20-shaped dominant-supplier selection (adapted: Q20's "
    "'availqty > half of shipped quantity' becomes 'this supplier "
    "shipped more than half of the part's total for the year' — the "
    "same nested EXISTS-over-aggregate chain). Spark-first: ONE "
    "lineitem scan aggregated per (part, supplier), the per-part "
    "total as a partkey-partitioned window OVER that aggregate "
    "(cardinality = supplier pairs, never raw rows; same trick as "
    "q21), the half test as exact integer cross-multiplication, then "
    "a distinct-supplier semi set joined to supplier/nation. The "
    "date filter pushes to the scan",
    tags=("J7", "join"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", _qty_ppc_col().alias("qty_ppc"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty_ppc").cast("bigint").alias("qty_ppc")
    )
    w = Window.partitionBy("l_partkey")
    shipped = shipped.withColumn(
        "part_qty_ppc", F.sum("qty_ppc").over(w).cast("bigint")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q20_BRAND)
        .select("p_partkey")
    )
    dominant = (
        shipped.join(part, shipped.l_partkey == part.p_partkey)
        .filter(F.lit(2) * F.col("qty_ppc") > F.col("part_qty_ppc"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name", "s_acctbal")
    )


# --------------------------------------------------------------- q12

_Q12_LO = "1996-01-01"
_Q12_HI = "1997-01-01"
_Q12_HIGH = ["1-URGENT", "2-HIGH"]


@query(
    "q12_shipping_modes",
    oracle=f"""
SELECT l.l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{_Q12_HI} 00:00:00'
GROUP BY l.l_linestatus
""",
    doc="TPC-H-Q12-shaped shipping-priority split (adapted: the schema "
    "has no l_shipmode/commit/receipt dates, so the class column is "
    "l_linestatus and 'received in the year' is the shipdate year). "
    "The posture is Q12's exactly: a fact-fact equi-join feeding two "
    "complementary conditional counts per class — CASE WHEN inside "
    "sum, one pass, whole-stage codegen; the year filter pushes to "
    "the lineitem scan and both sides are SF-linear (AQE decides the "
    "join strategy)",
    tags=("A4", "join"),
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
        )
        .select("l_orderkey", F.col("l_linestatus").alias("ship_class"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin(_Q12_HIGH)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )
