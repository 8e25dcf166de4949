"""Streaming DSIR scoring — fit offline, score online.

The production deployment shape of ``dsir_importance_weights``
(queries/dataset_ops.py): the hashed-bigram target/raw count tables and
the keep threshold are FIT once in batch (the counts are capped at
``_DSIR_BUCKETS`` integers each, KB-sized however large the fit
corpus; the threshold is two BIGINTs), then every arriving document is
scored STATELESSLY — no state store, no watermark, no shuffle: the
per-doc importance log-weight is a sequential fold over the document's
own bigram array against the broadcast count literals, and keep is the
fitted exact-integer multiply-compare.

Bit-parity with the batch query is by construction, not by tolerance:
the fit ships exact INTEGER counts (never floats) into the streaming
plan, so every ln() runs on the same exact inputs inside the same JVM
expression evaluator, and the fold order is bigram position order —
identical to the batch query's position-sorted fold. The SAME
expression builder scores the fit corpus (to derive the threshold) and
the stream, so the two paths cannot drift. Documents with bigrams
unseen at fit time score them through the same add-one smoothing
(count 0) — the batch query never encounters that case (it scores its
own fit corpus), but it is exactly DSIR's defined behavior for
out-of-vocabulary features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..queries.dataset_ops import _DSIR_BUCKETS, _DSIR_TARGET


def _scored_frame(
    docs: DataFrame, tc: list[int], rc: list[int], t_tot: int, r_tot: int
) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_feats, s, m_fixed), stateless.

    Works identically on a static or a streaming frame — tokenize,
    bigram fids (the batch query's md5 hash), position-ordered fold of
    per-feature log-ratios looked up in the broadcast count arrays,
    then the length-normalized 1e6-grid statistic the keep threshold
    uses.

    The count tables travel as DATA, not as plan literals: a single
    1-row lookup frame carrying the two exact-integer count arrays is
    broadcast-equi-joined (constant key) onto every document. Embedding
    them as ``F.array(F.lit(...))`` literals put 2 x _DSIR_BUCKETS
    expressions into every micro-batch's analyzed plan and codegen;
    the broadcast row keeps the plan O(1) while ``element_at`` reads
    the same exact BIGINT counts, so the fold's ln() inputs — and
    therefore the bit-parity-with-batch contract — are unchanged.
    """
    b = _DSIR_BUCKETS
    spark = docs.sparkSession
    lookup = spark.createDataFrame(
        [(1, [int(x) for x in tc], [int(x) for x in rc])],
        "jk int, tc_arr array<bigint>, rc_arr array<bigint>",
    )
    tc_arr = F.col("tc_arr")
    rc_arr = F.col("rc_arr")
    # exact integer -> double conversions; the batch query adds the
    # bucket count to the BIGINT total in double space the same way
    ln_tb = F.log(F.lit(float(t_tot + b)))
    ln_rb = F.log(F.lit(float(r_tot + b)))

    def ratio(f: Column) -> Column:
        idx = (f + 1).cast("int")
        return (
            F.log(F.element_at(tc_arr, idx).cast("double") + F.lit(1.0)) - ln_tb
        ) - (
            F.log(F.element_at(rc_arr, idx).cast("double") + F.lit(1.0)) - ln_rb
        )

    t = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 2)
    fids = F.expr(
        "transform(sequence(0, size(toks) - 2), "
        "i -> CAST(conv(substring(md5(concat(element_at(toks, i + 1), ' ', "
        f"element_at(toks, i + 2))), 1, 12), 16, 10) AS BIGINT) % {b})"
    )
    return (
        t.select("doc_id", fids.alias("fids"))
        .withColumn("jk", F.lit(1))
        .join(F.broadcast(lookup), "jk")
        .select(
            "doc_id",
            F.size("fids").cast("bigint").alias("n_feats"),
            F.aggregate(
                "fids", F.lit(0.0), lambda acc, f: acc + ratio(f)
            ).alias("s"),
        )
        .select(
            "doc_id",
            "n_feats",
            "s",
            F.floor(F.col("s") / F.col("n_feats") * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("m_fixed"),
        )
    )


def fit_dsir(
    spark: SparkSession, sf_dir: str
) -> tuple[list[int], list[int], int, int, int, int]:
    """Batch-fit: hashed-bigram distributions + the keep threshold.

    Returns (tc, rc, t_tot, r_tot, m_total, n_docs). The count collect
    is the documented bounded-collect class — exactly ``_DSIR_BUCKETS``
    rows regardless of corpus size; the threshold is one 1-row
    aggregate over the scored fit corpus.
    """
    from ..registry import load

    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    t = docs.select(
        "source", F.split(F.lower("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 2)
    bg = t.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2), "
                "i -> concat(element_at(toks, i + 1), ' ', "
                "element_at(toks, i + 2)))"
            )
        ).alias("bigram"),
    ).select(
        "source",
        (
            F.conv(F.substring(F.md5("bigram"), 1, 12), 16, 10).cast("bigint")
            % _DSIR_BUCKETS
        ).alias("fid"),
    )
    counts = (
        bg.groupBy("fid")
        .agg(
            F.count("*").alias("rc"),
            F.count(F.when(F.col("source") == _DSIR_TARGET, 1)).alias("tc"),
        )
        .collect()
    )
    rc = [0] * _DSIR_BUCKETS
    tc = [0] * _DSIR_BUCKETS
    for row in counts:
        rc[int(row["fid"])] = int(row["rc"])
        tc[int(row["fid"])] = int(row["tc"])
    t_tot, r_tot = sum(tc), sum(rc)

    thr = (
        _scored_frame(docs.select("doc_id", "text"), tc, rc, t_tot, r_tot)
        .agg(
            F.sum("m_fixed").cast("bigint").alias("m_total"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .collect()[0]
    )
    return tc, rc, t_tot, r_tot, int(thr["m_total"]), int(thr["n_docs"])


def streaming_dsir_scorer(
    doc_stream: DataFrame,
    tc: list[int],
    rc: list[int],
    t_tot: int,
    r_tot: int,
    m_total: int,
    n_docs: int,
) -> DataFrame:
    """Score a document stream against the fitted distributions.

    Emits (doc_id, n_feats, dsir_logw, keep) with the batch query's
    exact values for any doc in the fit corpus; keep uses the FITTED
    threshold (m_fixed * n_docs_fit > m_total_fit), the online analog
    of the batch query's corpus-mean rule.
    """
    scored = _scored_frame(doc_stream, tc, rc, t_tot, r_tot)
    return scored.select(
        "doc_id",
        "n_feats",
        stable_round("s", 4).alias("dsir_logw"),
        (F.col("m_fixed") * F.lit(int(n_docs)) > F.lit(int(m_total))).alias(
            "keep"
        ),
    )
