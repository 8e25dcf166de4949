"""J1-J8 join queries (SURVEY.md §2.3).

Physical-plan posture: dimension joins (customer, supplier, nation)
broadcast; the spatial J5 join is an equi-join on the frame key with a
residual IoU predicate — never a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.geometry import iou
from ..operators.windows import top_per_group
from ..functions.rounding import stable_round
from ..plans.two_phase import global_lead, global_rank, parquet_rows
from ..registry import load, query

# Synthetic boxes derived from lineitem rows: linenumber 1 rows are the
# "groundtruth" boxes of frame l_orderkey, linenumber 2 rows the
# "detections" — pure column arithmetic, identical on both sides.
_BOX_A = """
SELECT l_orderkey AS frame_id,
       l_discount * 100 AS ax1, l_tax * 100 AS ay1,
       l_discount * 100 + l_quantity AS ax2, l_tax * 100 + l_quantity AS ay2
FROM lineitem WHERE l_linenumber = 1
"""
_BOX_B = """
SELECT l_orderkey AS frame_id, l_suppkey,
       l_discount * 100 AS bx1, l_tax * 100 AS by1,
       l_discount * 100 + l_quantity AS bx2, l_tax * 100 + l_quantity AS by2
FROM lineitem WHERE l_linenumber = 2
"""


def _boxes_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("frame_id"),
        (F.col("l_discount") * 100).alias("ax1"),
        (F.col("l_tax") * 100).alias("ay1"),
        (F.col("l_discount") * 100 + F.col("l_quantity")).alias("ax2"),
        (F.col("l_tax") * 100 + F.col("l_quantity")).alias("ay2"),
    )


def _boxes_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 2).select(
        F.col("l_orderkey").alias("frame_id"),
        "l_suppkey",
        (F.col("l_discount") * 100).alias("bx1"),
        (F.col("l_tax") * 100).alias("by1"),
        (F.col("l_discount") * 100 + F.col("l_quantity")).alias("bx2"),
        (F.col("l_tax") * 100 + F.col("l_quantity")).alias("by2"),
    )


@query(
    "j1_equijoin_ranked",
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice,
       CAST(row_number() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INTEGER) AS pos
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
    doc="J1 GT-prediction 1:1 equi-join + sort desc by score "
    "(get_ava_active_speaker_performance.py:117-124); customer side "
    "broadcast (dimension)",
    tags=("J1", "W8"),
)
def j1_equijoin_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    # Global rank without a single-partition window: range-bucket on the
    # score + bucket-local row_number + broadcast count offsets.
    # Upper bound from the orders footer: c_custkey is unique (TPC-H
    # PK), so the broadcast FK join is 1:1 and never expands rows —
    # below the crossover the eager persist+count action is skipped.
    ranked = global_rank(
        j.select("o_orderkey", "c_name", "o_totalprice"),
        "o_totalprice",
        tiebreak_cols=("o_orderkey",),
        descending=True,
        out_col="pos",
        n_upper=parquet_rows(sf_dir, "orders"),
    )
    return ranked.select("o_orderkey", "c_name", "o_totalprice", "pos")


@query(
    "j2_tolerance_check",
    oracle="""
SELECT a.l_orderkey, floor((abs(a.l_extendedprice - b.l_extendedprice)) * 1e2 + 0.5) / 1e2 AS price_gap
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = 1 AND b.l_linenumber = 2
WHERE abs(a.l_extendedprice - b.l_extendedprice) > 1000.0
""",
    doc="J2 post-join elementwise tolerance check "
    "(get_ava_active_speaker_performance.py:127-142 bbox equality, X16)",
    tags=("J2", "X16"),
)
def j2_tolerance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select("l_orderkey", F.col("l_extendedprice").alias("pa"))
    b = li.filter(F.col("l_linenumber") == 2).select("l_orderkey", F.col("l_extendedprice").alias("pb"))
    gap = F.abs(F.col("pa") - F.col("pb"))
    return (
        a.join(b, "l_orderkey")
        .filter(gap > 1000.0)
        .select("l_orderkey", stable_round(gap, 2).alias("price_gap"))
    )


@query(
    "j3_surrogate_equijoin",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, s.s_name
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
""",
    doc="J3 track-score positional zip as surrogate-key equi-join "
    "(extractSpeakingSegments.py:91); supplier broadcast",
    tags=("J3",),
)
def j3_surrogate_equijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    return li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "s_name"
    )


@query(
    "j4_group_collect",
    oracle="""
SELECT l_orderkey,
       string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS items,
       count(*) AS n_items
FROM lineitem GROUP BY l_orderkey
""",
    doc="J4 frame-face inversion: per-frame collected face list "
    "(demoTalkNet.py:344-352), as deterministic sorted collect",
    tags=("J4",),
)
def j4_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.sort_array(F.collect_list("l_linenumber")), ",").alias("items"),
        F.count("*").alias("n_items"),
    )


_J5_ORACLE = f"""
WITH a AS ({_BOX_A}), b AS ({_BOX_B}), pairs AS (
  SELECT a.frame_id, b.l_suppkey,
         greatest(0, least(ax2, bx2) - greatest(ax1, bx1))
           * greatest(0, least(ay2, by2) - greatest(ay1, by1)) AS inter,
         (ax2 - ax1) * (ay2 - ay1) AS area_a,
         (bx2 - bx1) * (by2 - by1) AS area_b
  FROM a JOIN b ON a.frame_id = b.frame_id
), scored AS (
  SELECT frame_id, l_suppkey, inter / (area_a + area_b - inter) AS iou
  FROM pairs WHERE inter / (area_a + area_b - inter) > 0.1
), best AS (
  SELECT frame_id, l_suppkey, iou,
         row_number() OVER (PARTITION BY frame_id ORDER BY iou DESC, l_suppkey) AS rn
  FROM scored
)
SELECT a.frame_id,
       b.l_suppkey AS matched_supp,
       floor((coalesce(b.iou, 0.0)) * 1e6 + 0.5) / 1e6 AS best_iou
FROM a LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON a.frame_id = b.frame_id
"""


@query(
    "j5_spatial_best_match",
    oracle=_J5_ORACLE,
    doc="J5 GT-face spatial match: equi-join on frame + IoU>thr residual "
    "predicate + top-1-per-group + left join with missing->0 "
    "(demoTalkNet.py:402-419)",
    tags=("J5", "W5", "X1"),
)
def j5_spatial_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _boxes_a(spark, sf_dir)
    b = _boxes_b(spark, sf_dir)
    pairs = a.join(b, "frame_id").withColumn(
        "iou", iou("ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2")
    )
    scored = pairs.filter(F.col("iou") > 0.1)
    best = top_per_group(
        scored, ["frame_id"], [F.desc("iou"), F.col("l_suppkey")], k=1
    ).select("frame_id", F.col("l_suppkey").alias("matched_supp"), "iou")
    return (
        a.select("frame_id")
        .join(best, "frame_id", "left")
        .select(
            "frame_id",
            "matched_supp",
            stable_round(F.coalesce(F.col("iou"), F.lit(0.0)), 6).alias("best_iou"),
        )
    )


@query(
    "j7_anti_equality_pair",
    oracle="""
WITH pool AS (SELECT s_suppkey FROM supplier), pairs AS (
  SELECT a.s_suppkey, b.s_suppkey AS other_key,
         ((b.s_suppkey - a.s_suppkey) % 100 + 100) % 100 AS dist
  FROM pool a JOIN pool b ON a.s_suppkey <> b.s_suppkey
)
SELECT s_suppkey, other_key AS noise_key FROM (
  SELECT s_suppkey, other_key,
         row_number() OVER (PARTITION BY s_suppkey ORDER BY dist, other_key) AS rn
  FROM pairs
) WHERE rn = 1
""",
    doc="J7 audio-noise pairing: anti-equality self-join + deterministic "
    "pick of another pool member (dataLoader.py:15-17 random non-self key; "
    "cyclic-next rule replaces the RNG for reproducibility)",
    tags=("J7", "U3"),
)
def j7_anti_equality_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier").select("s_suppkey")
    b = sup.select(F.col("s_suppkey").alias("other_key"))
    pairs = sup.join(b, F.col("s_suppkey") != F.col("other_key"))
    dist = ((F.col("other_key") - F.col("s_suppkey")) % 100 + 100) % 100
    w = Window.partitionBy("s_suppkey").orderBy(dist.alias("dist"), F.col("other_key"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_suppkey", F.col("other_key").alias("noise_key"))
    )


@query(
    "j8_length_constrained_pick",
    oracle="""
SELECT p_partkey, donor_key, donor_size FROM (
  SELECT a.p_partkey, b.p_partkey AS b_key, b.p_size,
         row_number() OVER (PARTITION BY a.p_partkey
                            ORDER BY b.p_size, b.p_partkey) AS rn
  FROM part a JOIN part b
    ON b.p_size >= a.p_size AND b.p_partkey <> a.p_partkey
) AS t(p_partkey, donor_key, donor_size, rn) WHERE rn = 1
""",
    doc="J8 length-constrained pairing: theta join length>=length + "
    "smallest-qualifying pick (TalkSet/generate_TalkSet.py:219-224 "
    "resample-until-long-enough, deterministic rule replaces RNG)",
    tags=("J8",),
)
def j8_length_constrained_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window form of the theta join (the oracle keeps the O(n^2) SQL):
    # in (size, key) order, the smallest qualifying donor for a row is
    # either its size-group's head (when that head is another row) or
    # simply the next row in the global order (same size with larger
    # key, or the next size group — both qualify). O(n log n) instead
    # of the quadratic size>= self-join, which is the difference
    # between a dim-table trick and a job that cannot finish at 100 TB.
    # The global lead itself is two-phase (bucket-local + next-bucket
    # head patch) so no single-partition window remains.
    part = load(spark, sf_dir, "part").select("p_partkey", "p_size")
    head = F.min("p_partkey").over(Window.partitionBy("p_size"))
    led = global_lead(
        part, "p_size", ("p_partkey",), lead_cols=("p_partkey", "p_size"),
        n_upper=parquet_rows(sf_dir, "part"),
    )
    is_head = F.col("p_partkey") == head
    donor_key = F.when(~is_head, head).otherwise(F.col("_next_p_partkey"))
    donor_size = F.when(~is_head, F.col("p_size")).otherwise(F.col("_next_p_size"))
    return (
        led.select(
            "p_partkey",
            donor_key.alias("donor_key"),
            donor_size.alias("donor_size"),
        )
        .filter(F.col("donor_key").isNotNull())
    )


_J9_ORACLE = """
WITH v AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, v.view_id AS prior_view_id,
       ((date_diff('microsecond', v.ts, c.ts) + 500) // 1000) / 1e3 AS gap_s
FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts > v.ts
"""


@query(
    "j9_asof_join",
    oracle=_J9_ORACLE,
    doc="AS-OF join: each click matched to the user's most recent "
    "STRICTLY-prior view (the canonical event-attribution shape; the "
    "reference's closest relative is the J2 nearest-in-time tolerance "
    "check). Spark lacks a native ASOF: union both streams tagged, "
    "then last(view, ignorenulls) over a per-user (ts, tag) order "
    "with a rows-to-(-1) frame — one shuffle, linear per partition, "
    "no range self-join blowup. Views are deduped to one per "
    "(user, ts) so tie-handling is deterministic on both engines",
    tags=("J9", "ext"),
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    c = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    # tag 0 = click, 1 = view: at equal ts the view sorts AFTER the
    # click, and the window frame stops at -1 (strictly before the
    # current row), giving the strict c.ts > v.ts semantics.
    u = c.select(
        "user_id", "ts", F.lit(0).alias("_tag"), "event_id",
        F.lit(None).cast("long").alias("view_id"),
    ).unionByName(
        v.select(
            "user_id", "ts", F.lit(1).alias("_tag"),
            F.lit(None).cast("long").alias("event_id"), "view_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Gap in INTEGER microseconds, rounded to ms with integer div:
    # double seconds lose the half-millisecond boundary (a 62039.2705s
    # gap has no exact double, so floor(x*1e3+0.5) flips per engine's
    # last ulp — observed at sf0.1), while (us+500) div 1000 is exact
    # on both engines and the final /1e3 of an integer ms count is a
    # correctly-rounded single operation.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    matched = (
        u.withColumn("prior_view_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn(
            "_view_ts_us",
            F.last(F.when(F.col("_tag") == 1, ts_us), ignorenulls=True).over(w),
        )
        .filter(F.col("_tag") == 0)
    )
    gap_ms = F.expr("(unix_micros(cast(ts as timestamp)) - _view_ts_us + 500) div 1000")
    return matched.select(
        "event_id",
        "user_id",
        "prior_view_id",
        (gap_ms / F.lit(1e3)).alias("gap_s"),
    )


_IV_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z (testdata epoch)
_IV_SPACING_US = 6 * 3600 * 1_000_000  # one interval every 6 h
_IV_LEN_US = 90 * 60 * 1_000_000  # each 90 min long
_IV_N = 120  # covers the 30-day events span
# chunk width == interval length: every interval overlaps <= 2 chunks
_IV_BUCKET_US = _IV_LEN_US

_INTERVAL_JOIN_ORACLE = f"""
WITH iv AS (
  SELECT CAST(i AS BIGINT) AS interval_id,
         {_IV_EPOCH_US} + i * {_IV_SPACING_US} AS start_us,
         {_IV_EPOCH_US} + i * {_IV_SPACING_US} + {_IV_LEN_US} AS end_us
  FROM (SELECT unnest(range(0, {_IV_N})) AS i)
),
e AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events)
SELECT e.event_id, e.event_type, iv.interval_id,
       (e.us - iv.start_us) // 1000 AS offset_ms
FROM e JOIN iv ON e.us >= iv.start_us AND e.us < iv.end_us
"""


@query(
    "j10_interval_join",
    oracle=_INTERVAL_JOIN_ORACLE,
    doc="Range (interval containment) join — the custom join Spark "
    "lacks natively: each event matched to the deterministic "
    "maintenance window containing it, WITHOUT a cross product. "
    "Strategy is the classic chunking rewrite: pick a chunk width <= "
    "the minimum interval length, explode each interval to the <= 2 "
    "chunks it overlaps, equi-join events on chunk id, then apply the "
    "exact containment predicate. The oracle runs the plain theta "
    "join — agreement proves the rewrite. At 100 TB the equi-join "
    "hash-partitions on chunk (intervals here broadcast at 240 rows); "
    "skewed chunks fall to AQE skew handling like any equi-join",
    tags=("J10", "ext"),
)
def j10_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = spark.range(0, _IV_N).select(
        F.col("id").cast("bigint").alias("interval_id"),
        (F.lit(_IV_EPOCH_US) + F.col("id") * _IV_SPACING_US).alias("start_us"),
        (F.lit(_IV_EPOCH_US) + F.col("id") * _IV_SPACING_US + _IV_LEN_US).alias(
            "end_us"
        ),
    )
    # each interval overlaps chunk(start) and chunk(end-1); distinct in
    # case they coincide
    iv_chunks = iv.select(
        "interval_id",
        "start_us",
        "end_us",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"start_us div {_IV_BUCKET_US}"),
                    F.expr(f"(end_us - 1) div {_IV_BUCKET_US}"),
                )
            )
        ).alias("chunk"),
    )
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    ec = e.withColumn("chunk", F.expr(f"us div {_IV_BUCKET_US}"))
    return (
        ec.join(F.broadcast(iv_chunks), "chunk")
        .filter((F.col("us") >= F.col("start_us")) & (F.col("us") < F.col("end_us")))
        .select(
            "event_id",
            "event_type",
            "interval_id",
            F.expr("(us - start_us) div 1000").alias("offset_ms"),
        )
    )
