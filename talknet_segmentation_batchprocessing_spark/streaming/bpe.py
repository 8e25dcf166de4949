"""Streaming BPE token pricing — train offline, tokenize online.

The production deployment shape of ``bpe_encode_corpus``
(queries/dataset_ops.py): the merge table is TRAINED once in batch
(``_bpe_train`` — a map-side-combinable word count plus a bounded
driver loop over the capped vocabulary; the result is 20 string
pairs), then every arriving document is priced STATELESSLY — no state
store, no watermark, no shuffle: per document, each word runs the
learned merges in order through ``bpe_token_count_col``'s chained
in-row string folds, and the per-doc n_words / n_tokens /
fertility_ppm are a row-local aggregate over the word array.

Bit-parity with the batch query is by construction: the SAME column
expression tokenizes both (exact string ops and BIGINT arithmetic —
nothing to drift). The batch query is vocabulary-first (distinct
words once, join back); the stream prices each document on arrival,
which re-tokenizes repeated words — the latency-over-throughput trade
streaming pricing makes, with identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dataset_ops import _bpe_train, bpe_token_count_col


def fit_bpe(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Batch-fit: the learned merge table (rank, left, right, merged,
    pair_count) — _bpe_train verbatim, exposed under the streaming
    fit/score naming convention."""
    return _bpe_train(spark, sf_dir)


def streaming_bpe_pricer(doc_stream: DataFrame, merges: list[tuple]) -> DataFrame:
    """(doc_id, text) stream -> (doc_id, n_words, n_tokens,
    fertility_ppm), stateless; rows equal the batch
    ``bpe_encode_corpus`` output for any doc in both corpora."""
    words = F.filter(
        F.split(F.lower("text"), " "), lambda w: w != F.lit("")
    )
    t = doc_stream.select("doc_id", words.alias("ws")).filter(
        F.size("ws") >= 1
    )
    per_word = F.transform(
        F.col("ws"), lambda w: bpe_token_count_col(w, merges)
    )
    scored = t.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        F.aggregate(
            per_word, F.lit(0).cast("bigint"), lambda acc, n: acc + n
        ).alias("n_tokens"),
    )
    return scored.select(
        "doc_id",
        "n_words",
        "n_tokens",
        F.expr("(2 * n_tokens * 1000000 + n_words) div (2 * n_words)")
        .cast("bigint")
        .alias("fertility_ppm"),
    )
