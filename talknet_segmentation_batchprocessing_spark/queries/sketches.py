"""Cardinality sketches with EXACT cross-engine oracles.

At 100 TB nobody counts distincts exactly on the hot path — they keep
a mergeable sketch per partition and combine. Spark's built-in
``approx_count_distinct`` (HLL++) can't be oracle-checked against
DuckDB (different hash + bias tables), so these queries implement the
two classic sketches from deterministic md5-derived hashes, making the
estimate itself bit-identical on both engines while keeping the real
sketch properties (one aggregation pass, mergeable partials, fixed
memory per group):

- **KMV** (k-minimum-values, Bar-Yossef et al. 2002): keep the k
  smallest normalized hash values per group; estimate distinct count
  as (k-1)/h_(k). Mergeable: union the value sets, re-take k smallest.
- **HLL** (Flajolet et al. 2007): 2^p registers, each holding the max
  leading-zero run of hashes landing in it; harmonic-mean estimate.
  Mergeable: element-wise register max. The rho (leading-zero) count
  is computed via BINARY STRING position — exact integer/string ops on
  both engines, never floating log2 (which flips at powers of two).

Both queries also compute the exact distinct count and the relative
error, so the result doubles as an accuracy audit of the sketch at the
test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..registry import load, query, track_persist

# value hash: first 12 hex digits of md5 as bigint — [0, 2^48), the
# same deterministic family every dedup/sampling query uses. The
# sketched domain is per-language distinct word 3-SHINGLES (3-9k per
# language in the testdata — the regime where both sketch estimators
# actually estimate; raw tokens have a ~31-word synthetic vocabulary,
# which would leave KMV in its exact fallback and HLL far below its
# valid range).
_SQL_TOK_HASH = "CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT)"
_HASH_SPACE = float(1 << 48)

_KMV_K = 64

# distinct (lang, shingle) pairs — the DuckDB twin of _lang_shingles
_SQL_LANG_SHINGLES = """
  SELECT DISTINCT lang, unnest(list_transform(range(1, len(w) - 1),
                 i -> array_to_string(w[i:i+2], ' '))) AS tok
  FROM (SELECT lang, string_split(lower(text), ' ') AS w FROM documents)
  WHERE len(w) >= 3
"""


def _tok_hash(col: str = "tok"):
    return F.conv(F.substring(F.md5(F.col(col)), 1, 12), 16, 10).cast("bigint")


def _lang_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.shingles import word_shingles

    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    d = docs.select("lang", F.split(F.lower("text"), " ").alias("w")).filter(
        F.size("w") >= 3
    )
    return d.select("lang", F.explode(word_shingles("w", 3)).alias("tok")).distinct()


_KMV_ORACLE = f"""
WITH toks AS ({_SQL_LANG_SHINGLES}),
hashed AS (
  SELECT DISTINCT lang, {_SQL_TOK_HASH} AS h FROM toks
),
ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM hashed
),
exact AS (SELECT lang, count(*) AS n_exact FROM hashed GROUP BY lang),
kth AS (
  SELECT lang, max(h) AS hk, count(*) AS n_kept
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY lang
)
SELECT e.lang, e.n_exact,
       CAST(CASE WHEN k.n_kept < {_KMV_K} THEN e.n_exact
            ELSE floor(({_KMV_K} - 1) * {_HASH_SPACE} / k.hk + 0.5) END AS BIGINT)
         AS n_est,
       floor(abs(CAST(CASE WHEN k.n_kept < {_KMV_K} THEN e.n_exact
                 ELSE floor(({_KMV_K} - 1) * {_HASH_SPACE} / k.hk + 0.5) END AS BIGINT)
                 - e.n_exact) * 1.0 / e.n_exact * 1e6 + 0.5) / 1e6 AS rel_err
FROM exact e JOIN kth k ON k.lang = e.lang
"""


@query(
    "sketch_kmv_distinct",
    oracle=_KMV_ORACLE,
    doc="KMV distinct-count sketch per language: k smallest md5 hash "
    "values of the distinct token set; estimate = (k-1)/h_(k) "
    "(normalized). When a group has fewer than k distinct values the "
    "sketch IS the exact answer. One distinct pass + a per-group "
    "top-k — at scale the k-smallest set is a partial aggregate "
    "(each partition keeps its own k smallest, merge keeps k "
    "smallest of the union), so the shuffle carries k values per "
    "group, never the token stream. Exact integer/ratio arithmetic; "
    "estimate is bit-identical on both engines",
    tags=("sketch", "dataset", "ext"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _lang_shingles(spark, sf_dir)
    hashed = track_persist(
        toks.select("lang", _tok_hash().alias("h")).distinct()
    )
    exact = hashed.groupBy("lang").agg(F.count("*").alias("n_exact"))
    w = Window.partitionBy("lang").orderBy("h")
    kth = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("lang")
        .agg(F.max("h").alias("hk"), F.count("*").alias("n_kept"))
    )
    est = F.when(F.col("n_kept") < _KMV_K, F.col("n_exact")).otherwise(
        F.floor((_KMV_K - 1) * F.lit(_HASH_SPACE) / F.col("hk") + 0.5)
    ).cast("bigint")
    return (
        exact.join(kth, "lang")
        .withColumn("n_est", est)
        .select(
            "lang",
            "n_exact",
            "n_est",
            stable_round(
                F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
    )


_HLL_P = 10  # 2^10 = 1024 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 38  # 48-bit hash minus 10 register-index bits
# alpha_m for m >= 128 (Flajolet et al. 2007)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)

# rho via binary STRING: lpad the 38 value bits, find the first '1'.
# strpos/instr returns 0 when w == 0 -> rho = WBITS + 1 by the HLL
# definition (all-zero suffix), handled with the max-run fallback.
_SQL_RHO = (
    f"CASE WHEN (h // {_HLL_M}) = 0 THEN {_HLL_WBITS + 1} "
    f"ELSE strpos(lpad(bin(h // {_HLL_M}), {_HLL_WBITS}, '0'), '1') END"
)
_SPARK_RHO = (
    f"CASE WHEN (h div {_HLL_M}) = 0 THEN {_HLL_WBITS + 1} "
    f"ELSE instr(lpad(bin(h div {_HLL_M}), {_HLL_WBITS}, '0'), '1') END"
)

_HLL_ORACLE = f"""
WITH toks AS ({_SQL_LANG_SHINGLES}),
hashed AS (
  SELECT DISTINCT lang, {_SQL_TOK_HASH} AS h FROM toks
),
regs AS (
  SELECT lang, h % {_HLL_M} AS reg, max({_SQL_RHO}) AS rho
  FROM hashed GROUP BY lang, h % {_HLL_M}
),
est AS (
  SELECT lang,
         CAST(floor(CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}
              / (sum(power(2.0, -rho)) + ({_HLL_M} - count(*)) * 1.0) + 0.5)
           AS BIGINT) AS n_est
  FROM regs GROUP BY lang
),
exact AS (SELECT lang, count(*) AS n_exact FROM hashed GROUP BY lang)
SELECT e.lang, e.n_exact, s.n_est,
       floor(abs(s.n_est - e.n_exact) * 1.0 / e.n_exact * 1e6 + 0.5) / 1e6 AS rel_err
FROM exact e JOIN est s ON s.lang = e.lang
"""


@query(
    "sketch_hll_distinct",
    oracle=_HLL_ORACLE,
    doc="HyperLogLog distinct-count sketch per language: 1024 "
    "registers keyed by the low hash bits, each holding the max "
    "leading-zero run (rho) of the high bits; raw harmonic-mean "
    "estimate (empty registers contribute 2^0, the textbook raw "
    "formula without the small/large-range corrections). rho comes "
    "from BINARY-STRING position, not floating log2, and the "
    "2^-rho sums are dyadic rationals added exactly in double "
    "(sum <= m, grid 2^-39 -> 49 bits < 53), so the estimate is "
    "bit-identical on both engines. One groupBy(group, register) "
    "pass, mergeable by register max — THE cardinality sketch shape "
    "for 100 TB scans (Spark's approx_count_distinct is the same "
    "algorithm with an uncheckable hash)",
    tags=("sketch", "dataset", "ext"),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _lang_shingles(spark, sf_dir)
    hashed = track_persist(
        toks.select("lang", _tok_hash().alias("h")).distinct()
    )
    regs = hashed.groupBy(
        "lang", (F.col("h") % _HLL_M).alias("reg")
    ).agg(F.max(F.expr(_SPARK_RHO)).alias("rho"))
    est = regs.groupBy("lang").agg(
        F.floor(
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(1.0)
            )
            + 0.5
        )
        .cast("bigint")
        .alias("n_est")
    )
    exact = hashed.groupBy("lang").agg(F.count("*").alias("n_exact"))
    return exact.join(est, "lang").select(
        "lang",
        "n_exact",
        "n_est",
        stable_round(
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


_QS_RATE_PCT = 10  # deterministic 10% row sample
_SQL_EID_HASH = "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)"

_QUANTILE_ORACLE = f"""
WITH s AS (
  SELECT event_type, value,
         {_SQL_EID_HASH} % 100 < {_QS_RATE_PCT} AS in_sample
  FROM events
),
ex AS (
  SELECT event_type, count(*) AS n,
         quantile_cont(value, 0.5) AS p50_exact,
         quantile_cont(value, 0.9) AS p90_exact
  FROM s GROUP BY event_type
),
sm AS (
  SELECT event_type,
         quantile_cont(value, 0.5) AS p50_est,
         quantile_cont(value, 0.9) AS p90_est
  FROM s WHERE in_sample GROUP BY event_type
)
SELECT e.event_type, e.n,
       floor(e.p50_exact * 1e4 + 0.5) / 1e4 AS p50_exact,
       floor(s.p50_est * 1e4 + 0.5) / 1e4 AS p50_est,
       floor(e.p90_exact * 1e4 + 0.5) / 1e4 AS p90_exact,
       floor(s.p90_est * 1e4 + 0.5) / 1e4 AS p90_est,
       floor(abs(s.p90_est - e.p90_exact) * 1e4 + 0.5) / 1e4 AS p90_abs_err
FROM ex e JOIN sm s ON s.event_type = e.event_type
"""


@query(
    "sketch_quantile_sampled",
    oracle=_QUANTILE_ORACLE,
    doc="Sampled quantiles vs exact — the approximate-query-processing "
    "shape for percentiles at scale: the exact per-group percentile "
    "aggregate buffers EVERY value (memory grows with the group), "
    "while the md5-hash 10% sample bounds the buffer at rate x group "
    "and is deterministic (same rows every run, both engines). Spark "
    "percentile() and DuckDB quantile_cont() share the continuous "
    "interpolation definition (verified bit-identical), stable-rounded "
    "anyway. Output carries exact + estimate + absolute error per "
    "group, so the sample rate's accuracy is audited in-query",
    tags=("sketch", "dataset", "ext"),
)
def sketch_quantile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    in_sample = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint") % 100 < _QS_RATE_PCT
    )
    s = ev.select("event_type", "value", in_sample.alias("in_sample"))
    ex = s.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile("value", 0.5).alias("p50_exact"),
        F.percentile("value", 0.9).alias("p90_exact"),
    )
    sm = (
        s.filter("in_sample")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50_est"),
            F.percentile("value", 0.9).alias("p90_est"),
        )
    )
    return ex.join(sm, "event_type").select(
        "event_type",
        "n",
        stable_round("p50_exact", 4).alias("p50_exact"),
        stable_round("p50_est", 4).alias("p50_est"),
        stable_round("p90_exact", 4).alias("p90_exact"),
        stable_round("p90_est", 4).alias("p90_est"),
        stable_round(F.abs(F.col("p90_est") - F.col("p90_exact")), 4).alias(
            "p90_abs_err"
        ),
    )


_CM_D = 4    # hash rows
_CM_W = 512  # counters per row

# word-shingle OCCURRENCES (with multiplicity — frequencies, not the
# distinct set the KMV/HLL queries sketch)
_SQL_SHINGLE_OCC = """
  SELECT unnest(list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' '))) AS tok
  FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
  WHERE len(w) >= 3
"""

_SQL_CM_HASH = (
    "CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 12)) AS BIGINT)"
    f" % {_CM_W}"
)

_COUNTMIN_ORACLE = f"""
WITH toks AS ({_SQL_SHINGLE_OCC}),
rows_ AS (SELECT unnest(range(0, {_CM_D})) AS i),
cells AS (
  SELECT i, {_SQL_CM_HASH} AS h, count(*) AS c
  FROM toks CROSS JOIN rows_ GROUP BY 1, 2
),
dtoks AS (SELECT DISTINCT tok FROM toks),
est AS (
  SELECT t.tok, min(c.c) AS n_est
  FROM dtoks t CROSS JOIN rows_ AS r
  JOIN cells c ON c.i = r.i AND c.h = (
    CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || t.tok), 1, 12)) AS BIGINT)
    % {_CM_W})
  GROUP BY t.tok
),
exact AS (SELECT tok, count(*) AS n_exact FROM toks GROUP BY tok)
SELECT e.tok, s.n_est, e.n_exact, s.n_est - e.n_exact AS overestimate
FROM exact e JOIN est s ON s.tok = e.tok
ORDER BY s.n_est DESC, e.tok
LIMIT 10
"""


@query(
    "sketch_countmin_topk",
    oracle=_COUNTMIN_ORACLE,
    doc=f"Count-Min frequency sketch + heavy hitters: {_CM_D} md5-salted "
    f"hash rows x {_CM_W} counters built in ONE map-side-combinable "
    "aggregation over the shingle occurrence stream (the shuffle "
    "carries at most d*w counters per partition, never tokens); each "
    "distinct shingle's estimate is the MIN over its d counters — the "
    "classic conservative overestimate, exposed in the overestimate "
    "audit column (always >= 0 by construction). Top-10 heavy hitters "
    "by estimate via TakeOrderedAndProject, ties broken by token. At "
    "100 TB the candidate set for the top-k comes from per-partition "
    "heavy hitters (SpaceSaving-style) instead of estimating every "
    "distinct token; the sketch build is identical. Bit-identical "
    "md5-derived hashing on both engines",
    tags=("sketch", "dataset", "ext"),
)
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.shingles import word_shingles

    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = track_persist(
        docs.select(F.split(F.lower("text"), " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(F.explode(word_shingles("w", 3)).alias("tok"))
    )
    rows = F.broadcast(
        spark.range(0, _CM_D).select(F.col("id").alias("i"))
    )
    cm_hash = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("tok"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % _CM_W
    )
    cells = track_persist(
        toks.crossJoin(rows)
        .select("i", cm_hash.alias("h"))
        .groupBy("i", "h")
        .agg(F.count("*").alias("c"))
    )
    est = (
        toks.distinct()
        .crossJoin(rows)
        .select("tok", "i", cm_hash.alias("h"))
        .join(F.broadcast(cells), ["i", "h"])
        .groupBy("tok")
        .agg(F.min("c").alias("n_est"))
    )
    exact = toks.groupBy("tok").agg(F.count("*").alias("n_exact"))
    return (
        exact.join(est, "tok")
        .select(
            "tok",
            "n_est",
            "n_exact",
            (F.col("n_est") - F.col("n_exact")).alias("overestimate"),
        )
        .orderBy(F.desc("n_est"), "tok")
        .limit(10)
    )
