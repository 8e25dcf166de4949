"""Perceptual image near-duplicate detection — the dedup family's
image modality (round-12 VERDICT ask #1).

Pipeline (the LAION/DataComp preprocessing shape):

    pixels -> 64-bit perceptual hash (4x16-bit bands)
           -> band equi-join candidates (multi-index hashing)
           -> exact Hamming verify (<= tau)
           -> star connected components -> canonical keep

Two hash front-ends feed ONE shared relational tail
(:func:`hamming_cluster_bands`):

- **Real pixels**: ``functions.phash.image_phash_bands`` — DCT pHash
  over decoded bytes (pure-numpy JPEG decoder, mapInPandas shell).
  Driven end-to-end on the committed MJPEG fixture in
  tests/test_image_phash.py — real bytes, no optional wheels.
- **Oracle-checkable surrogate** (the registered query): the
  documents table has no pixel column, so ``dedup_image_phash``
  derives each document's "image" deterministically from its TEXT —
  a fixed 65-cell raster over the leading characters (the textual
  analog of pHash's fixed 32x32 window; see ``_TEXT_CHUNK_W``), one
  md5-derived intensity per cell, dHash bits (cell > next cell),
  packed into the same 4x16-bit bands. Every step is exact integer
  arithmetic, so
  DuckDB replays it bit for bit and the ENTIRE relational tail —
  banding, Hamming verify, CC, canonical keep — sits under the
  value-hash gate. The same convention as the multimodal family's
  deterministic fake decoders: the kernel is swapped, the Spark-side
  machinery under test is real.

Candidate recall is PROVEN, not sampled: with 4 bands of 16 bits, two
hashes within Hamming distance tau share at least one band exactly
whenever tau < 4 (pigeonhole — each differing bit ruins at most one
band), so at the default tau=3 the band join finds every qualifying
pair and the oracle's identical band-join is equivalent to all-pairs
(pinned by tests/test_image_phash.py against a brute-force pass).
The tau=2 / width-3 operating point is MEASURED on this corpus, not
guessed: 100% precision and recall against the ground-truth
truncation pairs at sf0.001/sf0.01, 256 true vs 4 false at sf0.1
(constants' comments record the sweep).

Scale posture (100 TB): the hash frame is 5 ints per image — the band
self-join is the MinHash-LSH shuffle shape, partitioned by (band_k,
band_value). 16-bit bands give 65536 buckets per band; at billions of
images widen the bands (m bands of 64/m bits keep the pigeonhole
guarantee for tau < m) so bucket occupancy, and with it the per-bucket
quadratic verify, stays bounded — the exact knob FAISS-style
multi-index hashing tunes. Verification joins narrow by doc_id; the
CC tail is the skew-safe star algorithm shared with every other dedup
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import load, query, track_persist

# 4 bands x 16 bits: pigeonhole guarantees band-join recall for
# tau < 4 (see module docstring). Raising tau past 3 REQUIRES more
# bands, not just a bigger number here — hamming_cluster_bands
# asserts that.
PHASH_BANDS = 4
# tau=2 measured on the corpus: precision/recall both 100% at
# sf0.001/sf0.01 (25/25 truncation pairs, 0 false) and 256 true /
# 4 false at sf0.1 — tau=3 admits 3-174 false pairs depending on
# chunk width. Recorded here so the choice is a measurement, not a
# guess.
PHASH_TAU = 2
_TEXT_CELLS = 65  # 64 dHash bits need 65 box intervals
# FIXED chunk width (a 195-char viewport), not length-relative: the
# corpus's near-dups are suffix truncations, and length-relative
# chunk bounds shift under any length change, scattering a 4-char
# truncation across all 64 bits (measured: zero pairs found). A fixed
# raster is also what a real image hash sees — pHash's 32x32 window
# discards detail beyond its resolution exactly like this viewport
# ignores text beyond char 195. Width 3 measured best (see PHASH_TAU
# note): longer widths leave short docs with too few occupied cells,
# and the empty-cell-dominated tails of unrelated short docs then
# collide.
_TEXT_CHUNK_W = 3


def hamming_cluster_bands(
    nodes: DataFrame, hashes: DataFrame, tau: int = PHASH_TAU
) -> DataFrame:
    """(doc_id, b0..b3) -> (doc_id, component): near-duplicate
    clusters under Hamming distance <= tau over the banded 64-bit
    hashes. Candidates come from a single long-form self-equi-join on
    (band index, band value) — the multi-index-hashing bucket join,
    never all pairs; the exact Hamming check runs on candidates only;
    components are the shared skew-safe star algorithm."""
    assert tau < PHASH_BANDS, (
        f"tau={tau} needs > {tau} bands for guaranteed recall "
        f"(pigeonhole); with {PHASH_BANDS} bands the band join can "
        "miss qualifying pairs — widen the banding instead"
    )
    from ..operators.graph import connected_components_star

    long = hashes.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.col(f"b{k}").alias("v")
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", F.col("bv.k").alias("k"), F.col("bv.v").alias("v"))
    a = long.select(F.col("doc_id").alias("doc_a"), "k", "v")
    b = long.select(F.col("doc_id").alias("doc_b"), "k", "v")
    cand = (
        a.join(b, ["k", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"ha{k}") for k in range(PHASH_BANDS)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"hb{k}") for k in range(PHASH_BANDS)],
    )
    ham = F.expr(
        " + ".join(f"bit_count(ha{k} ^ hb{k})" for k in range(PHASH_BANDS))
    )
    edges = (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .filter(ham <= F.lit(int(tau)))
        .select("doc_a", "doc_b")
    )
    return connected_components_star(nodes, edges, edges_distinct=True)


def text_surrogate_phash_bands(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, b0..b3): the deterministic
    image-surrogate perceptual hash (module docstring) — a fixed
    65-cell raster over the first 195 chars, one md5 intensity per
    cell, dHash neighbor-compare bits. Exact integer arithmetic only,
    so the DuckDB oracle reproduces it bit for bit.

    ONE shuffle to the hash frame: the doc_id repartition feeds the
    explode, the lead() window, and the final groupBy without further
    exchanges (all doc_id-keyed)."""
    spark = docs.sparkSession
    cells = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0), F.lit(_TEXT_CELLS - 1))
        ).alias("c"),
    )
    chunk = F.expr(
        f"substr(text, 1 + c * {_TEXT_CHUNK_W}, {_TEXT_CHUNK_W})"
    )
    inten = (
        F.conv(F.substring(F.md5(chunk), 1, 6), 16, 10).cast("bigint")
        % 256
    )
    cells = cells.select("doc_id", "c", inten.alias("h"))
    w = Window.partitionBy("doc_id").orderBy("c")
    bits = (
        cells.select(
            "doc_id",
            "c",
            (F.col("h") > F.lead("h", 1).over(w))
            .cast("bigint")
            .alias("bit"),
        )
        .filter(F.col("c") < 64)
    )
    weight = F.expr("shiftleft(CAST(1 AS BIGINT), c % 16)")
    return bits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr("c div 16") == k, F.col("bit") * weight)
                .otherwise(0)
            )
            .cast("bigint")
            .alias(f"b{k}")
            for k in range(PHASH_BANDS)
        ]
    )


_IMAGE_PHASH_ORACLE = f"""
WITH RECURSIVE
base AS (SELECT doc_id, text FROM documents),
cells AS (
  SELECT b.doc_id, t.c,
         CAST(('0x' || substr(md5(substr(b.text,
                1 + t.c * {_TEXT_CHUNK_W}, {_TEXT_CHUNK_W})),
                1, 6)) AS BIGINT) % 256 AS h
  FROM base b CROSS JOIN range(0, {_TEXT_CELLS}) t(c)
),
bits AS (
  SELECT doc_id, c,
         CASE WHEN h > lead(h) OVER (PARTITION BY doc_id ORDER BY c)
              THEN 1 ELSE 0 END AS bit
  FROM cells
),
hashes AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN c // 16 = 0 THEN bit * (1 << (c % 16)) ELSE 0 END) AS BIGINT) AS b0,
    CAST(sum(CASE WHEN c // 16 = 1 THEN bit * (1 << (c % 16)) ELSE 0 END) AS BIGINT) AS b1,
    CAST(sum(CASE WHEN c // 16 = 2 THEN bit * (1 << (c % 16)) ELSE 0 END) AS BIGINT) AS b2,
    CAST(sum(CASE WHEN c // 16 = 3 THEN bit * (1 << (c % 16)) ELSE 0 END) AS BIGINT) AS b3
  FROM bits WHERE c < 64 GROUP BY doc_id
),
lng AS (
  SELECT doc_id, 0 AS k, b0 AS v FROM hashes
  UNION ALL SELECT doc_id, 1, b1 FROM hashes
  UNION ALL SELECT doc_id, 2, b2 FROM hashes
  UNION ALL SELECT doc_id, 3, b3 FROM hashes
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM lng x JOIN lng y ON x.k = y.k AND x.v = y.v
                        AND x.doc_id < y.doc_id
),
ham AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN hashes ha ON ha.doc_id = c.doc_a
  JOIN hashes hb ON hb.doc_id = c.doc_b
  WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
      + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
      <= {PHASH_TAU}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ham
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM ham
),
cc(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.doc_id
)
SELECT doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id,
       (min(lbl) = doc_id) AS is_canonical
FROM cc GROUP BY doc_id
"""


@query(
    "dedup_image_phash",
    oracle=_IMAGE_PHASH_ORACLE,
    doc="Perceptual image near-dup dedup — the dedup family's image "
    "modality: 64-bit perceptual hash as 4x16-bit bands, multi-index "
    "band equi-join candidates (recall PROVEN by pigeonhole for "
    "tau<=3, not sampled), exact Hamming verify on candidates only, "
    "star CC, canonical keep. The registered surface hashes a "
    "deterministic text-surrogate image (oracle-exact integer "
    "arithmetic); the real-pixel front-end is "
    "functions.phash.image_phash_bands (DCT pHash over the pure-numpy "
    "JPEG decoder), e2e-tested on the committed MJPEG fixture through "
    "THIS same relational tail",
    tags=("dedup", "image", "ext"),
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hashes = track_persist(text_surrogate_phash_bands(docs))
    out = hamming_cluster_bands(
        docs.select("doc_id"), hashes, PHASH_TAU
    )
    return out.select(
        "doc_id",
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("doc_id")).alias("is_canonical"),
    )
