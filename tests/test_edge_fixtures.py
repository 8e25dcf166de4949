"""Edge-case hardening sweep (VERDICT r4 Next #9): every round-4/5
query runs on an ADVERSARIAL tiny fixture — empty/short/duplicate/
unicode/null-text documents, null event types and props, broken JSON,
same-timestamp (zero-gap) events, single-event users, a zero vector —
and its Spark result must still agree with its DuckDB oracle exactly
(same canon + dtype comparison the driver gate uses). The sf tables
only exercise the happy path; these shapes are where engines silently
diverge (0/0, null group keys, empty aggregates).
"""

from __future__ import annotations

import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from talknet_segmentation_batchprocessing_spark import registry
from talknet_segmentation_batchprocessing_spark.oracle_compare import (
    canon,
    dtype_map,
)

registry._ensure_loaded()

SF_SRC = "/root/testdata/sf0.001"

# round-4/5 additions: the queries this sweep hardens
EDGE_QUERIES = [
    "w12_funnel_steps",
    "w14_cohort_retention",
    "j10_interval_join",
    "agg_time_rollup",
    "u5_merge_upsert",
    "dedup_char_ngram",
    "dedup_exact_substring",
    "doc_chunk_overlap",
    "text_sentence_stats",
    "text_bigram_topk",
    "x20_variant_json",
    "ts_sax_similarity",
    "dedup_incremental",
    "emb_cluster_balance",
    "emb_dim_stats",
    "shuffle_shard_assign",
    "sample_weighted_hash",
    "sketch_kmv_distinct",
    "sketch_hll_distinct",
    "sketch_quantile_sampled",
    "sim_recall_eval",
    "text_langid_confusion",
    "dedup_semantic_keep",
    "dedup_keep_canonical",
    "curation_pipeline",
    "graph_triangle_count",
    "x21_zorder_value",
    # round-5 additions
    "dedup_semantic_keep_lsh",
    "sketch_countmin_topk",
    "w15_event_pattern",
    "dedup_containment",
    "dedup_keep_lsh_recall",
    "graph_pagerank",
    "contamination_bloom",
    "sketch_kmv_setops",  # corpus B (src10+) is EMPTY on this fixture
    "sketch_hll_merge",
    "text_gopher_rules",
    "text_perplexity_bucket",
    "dedup_cluster_stats",
    # round-6 additions
    "pack_token_sequences",
    "dedup_line_corpus",
    "talkset_generate",
    "dedup_edit_distance",  # unicode docs hit the byte-vs-char guard
    "bpe_merge_step",
    "emb_kmeans_assign",  # zero/identical/antipodal vectors, n > k ties
    "basket_pair_lift",  # empty result below support thresholds
    "events_anomaly_mad",  # null values, single-event users (MAD=0)
    "text_bigram_logprob",  # empty/null/single-token docs drop out identically
    "sim_maxsim_groups",  # zero vector excluded, identical/antipodal pairs
    "w16_ohlc_candles",  # null values, same-timestamp ties, singleton buckets
    # round-6 curation-audit + timeseries additions
    "mix_temperature_sampling",  # null/tiny sources, empty-text docs
    "curation_rule_attribution",  # docs dropping out of the token CTE
    "emb_matryoshka_recall",  # zero vector / zero truncated prefix excluded
    "dataset_card_stats",  # null text (md5 null) drops identically
    "dedup_threshold_sweep",  # empty edge set -> all-zero curve
    "w17_rate_limit",  # same-timestamp ties, singleton buckets
    "w18_ema_decay",  # null values, singleton windows, zero-gap ties
    "text_classifier_score",  # empty/null/unicode docs drop out identically
    "shard_balance_audit",  # tiny corpus -> empty shards absent on both
    "sim_knn_graph_lsh",  # zero vector excluded, singleton buckets emit nothing
    "w19_forward_fill",  # leading nulls stay null, singleton users, zero-gap ties
    "w20_conversion_latency",  # zero converted users -> empty report on both
    "emb_norm_outliers",  # zero vector (norm 0), near-equal norms
    "classifier_auc_eval",  # tiny corpus: heavy margin ties, one-class risk
    "classifier_decile_lift",  # ntile over fewer docs than bins
    "emb_covariance_pairs",  # zero/identical/antipodal vectors, const dims
    "emb_pca_power",  # zero vectors contribute nothing; tiny-corpus iterate
    "w21_attribution_linear",  # purchase-first users, zero-gap ties, no touches
    "w22_markov_transitions",  # single-event users, null types, zero-gap ties
    # round-7 additions
    "dsir_importance_weights",  # empty/null/single-token docs drop out identically
    "w23_rfm_segments",  # 3 purchase users, percentile thresholds over tiny n
    "ext_unpivot",  # null-valued pivot cells melt identically
    "doc_ngram_novelty",  # dup docs score 0 novel, sub-shingle docs drop
    "curation_dsir_vs_rules",  # both parents on the adversarial corpus
    "sample_weighted_reservoir",  # zero/null n_chars excluded; k > corpus
    "w24_active_users",  # single-day corpus, duplicate-timestamp users
    "quality_ensemble_vote",  # three parents on empty/null/unicode docs
    "u6_intersect",  # empty intersection side, null event types
    "text_token_fertility",  # null text/lang, empty and unicode docs
    # sim_rrf_fusion and sim_ivfpq_topk/_recall are NOT edge-swept:
    # their sim_pq_topk parent trains an 8-codeword codebook, undefined
    # on this 10-vector fixture (7 distinct codewords -> element_at out
    # of bounds on BOTH engines — a documented precondition of PQ,
    # n >> k, not an engine divergence; the fusion/routing layers are
    # pure integer/rank arithmetic over the parents' outputs and are
    # oracle-checked at sf0.001/0.01/0.1)
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _edge_events() -> pa.Table:
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []

    def ev(eid, sec, uid, typ, val, props):
        rows.append((eid, t0 + pd.Timedelta(seconds=sec), uid, typ, val, props))

    # u1: single 'view' only (funnel stage 1, singleton session)
    ev(1, 0, 1, "view", 1.0, '{"k": 1}')
    # u2: purchase only — never enters the funnel
    ev(2, 10, 2, "purchase", 2.0, '{"k": 2}')
    # u3: click BEFORE view, then view, then click — order rules matter
    ev(3, 0, 3, "click", None, None)
    ev(4, 5, 3, "view", 3.0, '{"k": 3, "nested": {"a": 1}}')
    ev(5, 9, 3, "click", 3.5, "{bad json")
    # u4: view and click at the SAME timestamp (strict-after rejects),
    # purchase later
    ev(6, 20, 4, "view", 4.0, "")
    ev(7, 20, 4, "click", 4.1, "[]")
    ev(8, 30, 4, "purchase", 4.2, '{"k": null}')
    # u5: clean full funnel
    ev(9, 40, 5, "view", 5.0, '{"k": 5}')
    ev(10, 50, 5, "click", 5.1, '{"k": 5}')
    ev(11, 60, 5, "purchase", 5.2, '{"k": 5}')
    # u6: NULL event_type + a view
    ev(12, 70, 6, None, None, '{"k": 6}')
    ev(13, 71, 6, "view", 6.0, '{"k": 6}')
    # u7: duplicate timestamps, repeated types, zero-length intervals
    for i in range(4):
        ev(14 + i, 80, 7, "error", 7.0, '{"k": 7}')
    # u8: long-gap user (session boundary material), types outside funnel
    ev(18, 100, 8, "search", 8.0, '{"k": 8}')
    ev(19, 4000, 8, "search", 8.5, '{"k": 8}')
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    return pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)


def _edge_documents() -> pa.Table:
    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, "", "en", "src0"),  # empty text
        (1, "tiny", "en", "src0"),  # below gram width
        (2, "   \t  ", "en", "src1"),  # whitespace only
        (3, shared + " alpha beta gamma delta epsilon zeta", "en", "src1"),
        (4, shared + " one two three four five six seven", "en", "src2"),  # near-dup of 3
        (5, "duplicate body duplicate body duplicate body!", "fr", "src2"),
        (6, "duplicate body duplicate body duplicate body!", "fr", "src0"),  # exact dup of 5
        (7, "héllo wörld ünïcode text that exceeds thirty-two chars easily", "de", "src1"),
        (8, "solitary", "xx", "src2"),  # single-doc language
        (9, None, "en", "src0"),  # null text
        (10, "word " * 20, None, "src1"),  # null lang
        (11, "sentences. more sentences! questions? yes. end", "es", "src2"),
        # long docs sharing a span positioned far past any fixed
        # position cap (round-5 review: the oracle's old 800-position
        # range silently diverged from the uncapped engine)
        (12, "x" * 900 + " " + "lorem ipsum dolor sit amet " * 20 + "tail one", "en", "src0"),
        (13, "z" * 1000 + " " + "lorem ipsum dolor sit amet " * 20 + "tail two", "en", "src1"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].map(lambda t: len(t) if isinstance(t, str) else None)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    return pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)


def _edge_embeddings() -> pa.Table:
    rng = np.random.default_rng(7)
    dim = 64
    vecs = []
    base = rng.normal(size=dim).astype("float32")
    vecs.append((0, np.zeros(dim, dtype="float32"), 0))  # zero vector
    vecs.append((1, base, 1))
    vecs.append((2, base.copy(), 1))  # identical to 1
    vecs.append((3, -base, 2))  # antipodal
    vecs.append((4, (base * 1e-6).astype("float32"), 2))  # tiny magnitude
    for i in range(5, 10):
        vecs.append((i, rng.normal(size=dim).astype("float32"), i % 3))
    pdf = pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"])
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    return pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    for t in TABLES:
        if t in ("events", "documents", "embeddings"):
            continue
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(_edge_events(), str(d / "events.parquet"))
    pq.write_table(_edge_documents(), str(d / "documents.parquet"))
    pq.write_table(_edge_embeddings(), str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(edge_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_fixture_parity(name, spark, edge_dir, duck):
    spec = registry.REGISTRY[name]
    registry.release_persisted()
    sdf_raw = spec.fn(spark, edge_dir).toPandas()
    odf_raw = duck.execute(spec.oracle).df()
    sdf, odf = canon(sdf_raw), canon(odf_raw)
    assert list(sdf.columns) == list(odf.columns), (
        f"{name}: cols {list(sdf.columns)} vs {list(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    smap, omap = dtype_map(sdf_raw), dtype_map(odf_raw)
    diff = {
        c: (smap.get(c), omap.get(c))
        for c in set(smap) | set(omap)
        if smap.get(c) != omap.get(c)
    }
    assert not diff, f"{name}: dtype mismatch {diff}"
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        eq = (a == b) | (a.isna() & b.isna())
        assert eq.all(), (
            f"{name}.{c}: first diff at row {int(eq.idxmin())}: "
            f"{a[~eq].head(3).tolist()} vs {b[~eq].head(3).tolist()}"
        )
