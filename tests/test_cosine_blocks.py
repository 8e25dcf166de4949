"""dedup_embedding_cosine's multi-block path: the parity suite only
ever sees n_blocks == 1 (500 rows < _COS_TILE_ROWS), which is exactly
where a cross-block enumeration bug hides. Force small tiles and check
the blocked result equals the single-block (oracle-verified) result —
in particular pairs whose smaller vec_id hashes into the HIGHER block
index, which an orientation-dependent mask would drop."""

from __future__ import annotations

import pandas as pd

from .conftest import SF_SMOKE


def _run(spark, tile):
    from talknet_segmentation_batchprocessing_spark.queries import extensions
    from talknet_segmentation_batchprocessing_spark.registry import release_persisted

    old = extensions._COS_TILE_ROWS
    extensions._COS_TILE_ROWS = tile
    try:
        df = (
            extensions.dedup_embedding_cosine(spark, SF_SMOKE)
            .toPandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
    finally:
        extensions._COS_TILE_ROWS = old
        release_persisted()
    return df


def test_blocked_equals_single_block(spark):
    from talknet_segmentation_batchprocessing_spark.registry import load

    single = _run(spark, 10**9)  # one block: the oracle-verified path
    blocked = _run(spark, 64)  # e.g. 500 rows -> 8 blocks, 36 groups
    assert len(single) > 0, "fixture became vacuous"
    pd.testing.assert_frame_equal(single, blocked)
    # cross-block pairs must exist for the test to mean anything, and
    # BOTH orientations of (vec_id % n_blocks) must appear — the old
    # bug dropped exactly the pairs whose smaller id sat in the higher
    # block, so an 'or' here would be tautological.
    n = load(spark, SF_SMOKE, "embeddings").count()
    n_blocks = -(-n // 64)
    cross = blocked[
        blocked.vec_a % n_blocks != blocked.vec_b % n_blocks
    ]
    assert len(cross) > 0
    assert (cross.vec_a % n_blocks > cross.vec_b % n_blocks).any() and (
        cross.vec_a % n_blocks < cross.vec_b % n_blocks
    ).any()


def test_chunked_slabs_equal_unchunked(spark):
    from talknet_segmentation_batchprocessing_spark.queries import extensions

    old = extensions._COS_CHUNK
    extensions._COS_CHUNK = 7  # force many ragged slabs
    try:
        blocked = _run(spark, 64)
    finally:
        extensions._COS_CHUNK = old
    single = _run(spark, 10**9)
    pd.testing.assert_frame_equal(single, blocked)
