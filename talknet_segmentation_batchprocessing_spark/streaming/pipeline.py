"""Streaming surface (SURVEY.md §2.9).

The reference's only streaming source is a sequential iterator
(batchProcessVideos.py:111-124) with no watermarks or event-time
windows. Its segmentation (W1) is the batch analog of *session
windows* (a gap of one below-threshold frame closes a session) and
its clip batching (W9) of *tumbling windows*. This module exposes:

- ``stream_scores``: file-source readStream over a scores drop-folder
  (new parquet files appear as tracks finish scoring);
- ``foreach_batch_segments``: the exact batch ``extract_segments``
  operator applied per micro-batch via ``foreachBatch`` — one code
  path for batch and streaming, the Spark-idiomatic way to reuse an
  operator that needs full-track ordering;
- ``session_window_segments``: the declared extension — incremental
  event-time session windows with a watermark, for the true
  low-latency path (segments emitted while the track is still
  streaming, closed after ``gap_s`` of silence);
- ``streaming_dedup``: watermark-bounded exact dedup of a document
  stream — the streaming arm of ``dedup_exact`` for continuous
  ingestion, with O(watermark-window) state instead of O(history);
- ``streaming_incremental_dedup``: the streaming arm of the batch
  ``dedup_incremental`` query — arriving docs stream-static-join a
  pre-built corpus shingle index, so near-dup flags are emitted
  continuously as the crawl lands instead of in a nightly batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.segmentation import extract_segments
from ..schemas import SCORES


def stream_scores(spark: SparkSession, drop_folder: str) -> DataFrame:
    """readStream on a parquet drop-folder of scores rows."""
    return (
        spark.readStream.schema(SCORES)
        .option("maxFilesPerTrigger", 64)
        .parquet(drop_folder)
    )


def foreach_batch_segments(
    stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    threshold: float = 0.0,
    min_duration_s: float = 0.5,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Run the batch segmentation operator per micro-batch.

    Correct when each track's scores arrive within one file (the
    reference writes scores.pckl per video atomically — same contract);
    cross-batch tracks need ``session_window_segments`` instead.
    """

    def run(batch_df: DataFrame, batch_id: int) -> None:
        sink(extract_segments(batch_df, threshold, min_duration_s), batch_id)

    w = stream.writeStream.foreachBatch(run).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_dedup(
    doc_stream: DataFrame,
    key_cols: tuple[str, ...] = ("content_hash",),
    event_time_col: str = "event_time",
    watermark_s: float = 3600.0,
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each key,
    drop repeats that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` is the scale-honest form: state
    holds only keys younger than the watermark (late duplicates beyond
    it are already impossible by the watermark contract), so state is
    bounded by the ingest rate x horizon, not by corpus history. Keys
    should be a digest (e.g. ``xxhash64(text)``), never the full text —
    state stores the key columns.
    """
    return doc_stream.withWatermark(
        event_time_col, f"{int(watermark_s)} seconds"
    ).dropDuplicatesWithinWatermark([*key_cols])


def session_window_segments(
    scored_events: DataFrame,
    gap_s: float = 0.04,  # one 25fps frame of silence closes the run
    watermark_s: float = 2.0,
    threshold: float = 0.0,
) -> DataFrame:
    """Extension surface: incremental session windows over an
    event-time score stream (event_time timestamp, video_id, track_id,
    score). Speaking frames within ``gap_s`` of each other merge into
    one session; the watermark bounds state for late data."""
    speaking = scored_events.filter(F.col("score") > threshold)
    return (
        speaking.withWatermark("event_time", f"{watermark_s} seconds")
        .groupBy(
            "video_id",
            "track_id",
            F.session_window("event_time", f"{gap_s} seconds").alias("w"),
        )
        .agg(F.count("*").alias("n_frames"), F.avg("score").alias("mean_score"))
        .select(
            "video_id",
            "track_id",
            F.col("w.start").alias("start_time"),
            F.col("w.end").alias("end_time"),
            "n_frames",
            "mean_score",
        )
    )


def sliding_window_counts(
    event_stream: DataFrame,
    ts_col: str = "event_time",
    size_s: int = 3600,
    slide_s: int = 1800,
    watermark_s: int = 3600,
) -> DataFrame:
    """Watermarked sliding-window aggregation — the streaming twin of
    the batch ``w11_sliding_window`` query (each event lands in
    size/slide overlapping windows; late rows beyond the watermark are
    dropped, closed windows emit once). With ``session_window_segments``
    (session) and the ``foreachBatch`` tumbling clip path, all three
    time-window families run on streams with the same semantics as
    their batch queries."""
    return (
        event_stream.withWatermark(ts_col, f"{watermark_s} seconds")
        .groupBy(
            F.window(ts_col, f"{size_s} seconds", f"{slide_s} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def corpus_shingle_index(docs: DataFrame, k: int = 3) -> DataFrame:
    """Static corpus shingle index for ``streaming_incremental_dedup``:
    (corpus_id, shingle, nb) where nb is the corpus doc's distinct
    shingle count. At 100 TB this is written ONCE as a bucketed
    parquet table (bucket by shingle) and re-read per micro-batch —
    the per-batch cost then scales with the batch, not the corpus."""
    d = docs.select(
        F.col("doc_id").alias("corpus_id"),
        F.split(F.lower("text"), " ").alias("w"),
    ).filter(F.size("w") >= k)
    from ..functions.shingles import word_shingles

    sh = d.select(
        "corpus_id",
        F.explode(F.array_distinct(word_shingles("w", k))).alias("shingle"),
    )
    nb = sh.groupBy("corpus_id").agg(F.count("*").alias("nb"))
    return sh.join(nb, "corpus_id")


def streaming_incremental_dedup(
    doc_stream: DataFrame,
    corpus_index: DataFrame,
    k: int = 3,
    threshold: float = 0.2,
    watermark_s: int = 3600,
) -> DataFrame:
    """Continuous incremental dedup — the streaming twin of the batch
    ``dedup_incremental`` query (queries/extensions.py): every arriving
    document's distinct word k-shingles JOIN the STATIC corpus shingle
    index (a stream-static equi-join — no state on the corpus side),
    per-(doc, corpus-doc) overlaps aggregate within a watermark-bounded
    event-time window, and pairs reaching Jaccard >= ``threshold`` are
    emitted as near-dup flags.

    Input stream schema: ``doc_id, text, event_time (timestamp)``.
    Output: ``doc_id, corpus_id, jaccard`` — distinct ``doc_id``s are
    the duplicates; docs with no emitted row are novel.

    Scale/state posture: the shingle explode and the join are
    stateless; the only stateful operator is the windowed count, whose
    state is (arrival-rate x horizon) — bounded, exactly like
    ``streaming_dedup``. The corpus index is the same frame the batch
    query builds, so batch backfill and live stream share one
    definition of "duplicate".
    """
    from ..functions.shingles import word_shingles

    toks = doc_stream.select(
        "doc_id",
        "event_time",
        F.split(F.lower("text"), " ").alias("w"),
    ).filter(F.size("w") >= k)
    sh = toks.select(
        "doc_id",
        "event_time",
        F.array_distinct(word_shingles("w", k)).alias("sh"),
    ).select(
        "doc_id",
        "event_time",
        F.size("sh").alias("na"),
        F.explode("sh").alias("shingle"),
    )
    joined = sh.join(corpus_index, "shingle")  # stream-static
    overlaps = (
        joined.withWatermark("event_time", f"{watermark_s} seconds")
        .groupBy(
            F.window("event_time", f"{watermark_s} seconds").alias("win"),
            "doc_id",
            "corpus_id",
            "na",
            "nb",
        )
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return overlaps.filter(jac >= threshold).select(
        "doc_id", "corpus_id", jac.alias("jaccard")
    )


def streaming_hll_registers(
    value_stream: DataFrame,
    group_col: str = "lang",
    value_col: str = "tok",
) -> DataFrame:
    """Continuous HyperLogLog: maintain the register table of
    ``sketch_hll_distinct`` over a stream of values.

    Because HLL merge is an element-wise register MAX, the streaming
    aggregation is just ``groupBy(group, register).max(rho)`` in
    update mode — each micro-batch folds into the standing registers
    exactly like a partition's partial sketch folds into the final
    one. State is bounded BY CONSTRUCTION at m=1024 rows per group
    (no watermark needed: registers never grow, they only max), which
    is the whole point of sketching a 100 TB stream: distinct-count
    state in O(m), not O(distincts). The estimate is read off the
    register table at any time with the same harmonic-mean formula as
    the batch query.
    """
    from ..queries.sketches import _HLL_M, _SPARK_RHO, _tok_hash

    hashed = value_stream.select(
        F.col(group_col).alias("grp"), _tok_hash(value_col).alias("h")
    )
    return hashed.groupBy(
        "grp", (F.col("h") % _HLL_M).alias("reg")
    ).agg(F.max(F.expr(_SPARK_RHO)).alias("rho"))


def streaming_countmin_cells(token_stream: DataFrame) -> DataFrame:
    """Continuous Count-Min: maintain the d x w counter table of
    ``sketch_countmin_topk`` over a stream of token occurrences.

    Count-Min merge is element-wise counter ADDITION, so the streaming
    aggregation is ``groupBy(i, h).count()`` in update mode — each
    micro-batch's partial counters fold into the standing cells
    exactly like map-side partials fold in the batch build. State is
    bounded BY CONSTRUCTION at d*w cells (no watermark needed:
    counters only ever add), which is the sketch's point on an
    unbounded stream: frequency state in O(d*w), not O(distinct
    tokens). Any token's estimate is read off the standing table as
    min over its d cells, identical to the batch query.
    """
    from ..queries.sketches import _CM_D, _CM_W

    spark = token_stream.sparkSession
    rows = F.broadcast(spark.range(0, _CM_D).select(F.col("id").alias("i")))
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
    return (
        token_stream.select("tok")
        .crossJoin(rows)
        .select("i", cm_hash.alias("h"))
        .groupBy("i", "h")
        .agg(F.count("*").alias("c"))
    )


def streaming_kmv_minima(token_stream: DataFrame, group_col: str = "lang") -> DataFrame:
    """Continuous KMV: maintain sketch_kmv_distinct's k-minimum-values
    per group over a stream of tokens.

    KMV merge is union-then-retake-k-smallest, so per-group state is
    BOUNDED at k hash values by construction — distinct-count state in
    O(k) on an unbounded stream (the third mergeable sketch family
    next to the HLL registers and Count-Min cells). Each micro-batch
    folds its token hashes into the standing minima via GroupState; a
    row (n_kept, hk) is emitted whenever the sketch improves (n_kept
    grows, or hk shrinks once full), and the standing row per group —
    max n_kept, then min hk — equals the batch sketch exactly. The
    estimate reads off as (k-1) * 2^48 / hk, identical to the batch
    query's formula.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..deploy import ensure_worker_imports
    from ..queries.sketches import _KMV_K, _tok_hash

    ensure_worker_imports(token_stream)

    def _fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (grp,) = key
        prev = list(state.get[0]) if state.exists else []
        vals = set(prev)
        for pdf in pdfs:
            vals.update(int(h) for h in pdf["h"])
        merged = sorted(vals)[:_KMV_K]
        state.update((merged,))
        if merged != prev:
            yield pd.DataFrame(
                [(grp, len(merged), merged[-1])],
                columns=["grp", "n_kept", "hk"],
            )

    hashed = token_stream.select(
        F.col(group_col).alias("grp"), _tok_hash("tok").alias("h")
    )
    return hashed.groupBy("grp").applyInPandasWithState(
        _fold,
        outputStructType="grp string, n_kept long, hk long",
        stateStructType="vals array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
