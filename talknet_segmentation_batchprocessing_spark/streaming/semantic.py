"""Streaming semantic near-dup flagging — the streaming arm of
``dedup_semantic_keep_lsh`` (queries/extensions.py), built on the same
round-7 exact-fold LSH kernel (functions/lsh.py).

A live embedding stream (e.g. vectors minted as a crawl lands) is
flagged against a STATIC corpus LSH index: arriving vectors hash into
their sign-LSH band buckets executor-side (one matmul per Arrow batch,
borderline signs re-folded — identical bits to the batch pipeline),
stream-static-join the index on (band, bucket), and candidates alone
are exact-cosine verified with the sequential fold. Duplicate flags
across bands collapse in one watermark-bounded window aggregate.

State posture: bucketing and the stream-static join are STATELESS (the
index is a plain cached DataFrame — no stream state grows with corpus
size); the only stateful operator is the final window dedup, whose
state is (arrival rate x horizon) — the same bound as streaming_dedup.
Batch parity: every transformation here is mode-agnostic, so the same
function applied to a batch DataFrame is the ground truth the stream
is pinned against (tests/test_streaming_parity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT_FOLD = (
    "aggregate(zip_with(v, cv, (x, y) -> x * y), cast(0.0 as double), "
    "(acc, x) -> acc + x)"
)
_NORM_FOLD = (
    "sqrt(aggregate(transform({col}, x -> x * x), cast(0.0 as double), "
    "(acc, x) -> acc + x))"
)

_STREAM_SIG_SCHEMA = (
    "vec_id long, event_time timestamp, band int, bucket long, "
    "v array<double>, nrm double"
)


def corpus_lsh_index(emb: DataFrame, bands: int, bits: int) -> DataFrame:
    """(vec_id, v) -> (band, bucket, corpus_id, cv, cnrm): the static
    side of the stream-static join. Buckets come from the shared
    exact-sign kernel; bits should follow the batch pipeline's
    adaptive rule (ceil(log2(n/target))) computed on THIS corpus."""
    from ..functions.lsh import band_pack_expr, sign_signatures

    sigs = sign_signatures(emb, bands * bits)
    sig = sigs.select(
        F.col("vec_id").alias("corpus_id"),
        F.posexplode(F.expr(band_pack_expr(bands, bits))).alias("band", "bucket"),
    )
    payload = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("v").alias("cv"),
        F.expr(_NORM_FOLD.format(col="v")).alias("cnrm"),
    )
    return sig.join(payload, "corpus_id").select(
        "band", "bucket", "corpus_id", "cv", "cnrm"
    )


def _stream_signatures(vec_stream: DataFrame, bands: int, bits: int) -> DataFrame:
    """Streaming-safe bucketing: one stateless mapInPandas emitting one
    row per (vector, band) with the vector payload and exact-fold norm
    carried through — the same sign discipline as
    functions/lsh.sign_signatures (BLAS matmul, borderline re-fold)."""
    n_j = bands * bits

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from talknet_segmentation_batchprocessing_spark.functions.lsh import (
            fold_norms,
            sign_matrix,
        )

        w = 1 << np.arange(bits, dtype=np.int64)  # bit weights

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            # THE shared kernel — same hyperplanes, same borderline
            # re-fold as the batch pipeline (functions/lsh.py)
            signs = sign_matrix(V, n_j)
            buckets = signs.reshape(len(V), bands, bits) @ w  # (n, bands)
            nrm = fold_norms(V)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), bands),
                    "event_time": np.repeat(
                        pdf["event_time"].to_numpy(), bands
                    ),
                    "band": np.tile(np.arange(bands, dtype=np.int32), len(V)),
                    "bucket": buckets.reshape(-1),
                    "v": [V[k] for k in range(len(V)) for _ in range(bands)],
                    "nrm": np.repeat(nrm, bands),
                }
            )

    return vec_stream.select("vec_id", "event_time", "v").mapInPandas(
        fn, _STREAM_SIG_SCHEMA
    )


def streaming_semantic_flag(
    vec_stream: DataFrame,
    index: DataFrame,
    bands: int,
    bits: int,
    threshold: float = 0.45,
    watermark_s: int = 3600,
) -> DataFrame:
    """Continuous SemDeDup flagging (see module docstring).

    Input stream schema: ``vec_id, v (array<double>), event_time``.
    Output: ``vec_id, corpus_id, cos_sim`` — one row per flagged
    near-dup pair; vectors with no emitted row are semantically novel.
    """
    from ..deploy import ensure_worker_imports

    ensure_worker_imports(vec_stream)
    sigs = _stream_signatures(vec_stream, bands, bits)
    joined = sigs.join(index, ["band", "bucket"]).filter(
        F.col("vec_id") != F.col("corpus_id")
    )
    cs = F.try_divide(F.expr(_DOT_FOLD), F.col("nrm") * F.col("cnrm"))
    hits = joined.withColumn("cs", cs).filter(F.col("cs") > threshold)
    # collapse multi-band duplicates: cs is exact-fold identical per
    # band, so min == the value; watermark bounds the dedup state
    return (
        hits.withWatermark("event_time", f"{watermark_s} seconds")
        .groupBy(
            F.window("event_time", f"{watermark_s} seconds").alias("win"),
            "vec_id",
            "corpus_id",
        )
        .agg(F.min("cs").alias("cos_sim"))
        .select("vec_id", "corpus_id", "cos_sim")
    )
