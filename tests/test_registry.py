"""Registry lifecycle: persisted frames from one query are released
when the next registry query starts, so a long sweep (the driver's
70-query correctness gate, repeated entry() calls) holds at most one
query's caches instead of accumulating all of them."""

from __future__ import annotations

from talknet_segmentation_batchprocessing_spark import registry

from .conftest import SF_SMOKE


def test_sweep_releases_prior_query_caches(spark):
    qs = registry.all_queries()

    # minhash LSH persists its shingle + signature frames
    qs["dedup_minhash_lsh"](spark, SF_SMOKE).count()
    assert len(registry._PERSISTED) > 0

    # the next wrapped query releases them before running; uid concat
    # itself persists nothing, so the tracked list must drain to empty
    qs["x12_uid_concat"](spark, SF_SMOKE).count()
    assert registry._PERSISTED == []


def test_entry_releases_prior_caches(spark, monkeypatch):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    qs = registry.all_queries()
    qs["dedup_minhash_lsh"](spark, SF_SMOKE).count()
    assert len(registry._PERSISTED) > 0
    entrymod.entry(spark).count()
    assert registry._PERSISTED == []


def test_driver_window_occupies_first_50_slots():
    """The driver verifies the FIRST 50 registered queries; the curated
    window must occupy exactly those slots, in order."""
    from talknet_segmentation_batchprocessing_spark import registry

    registry._ensure_loaded()
    names = list(registry.REGISTRY)
    assert len(registry._DRIVER_WINDOW) == 50
    assert names[:50] == registry._DRIVER_WINDOW
    # every registered query has an oracle except the one by-design
    # sequential kernel
    no_oracle = [n for n, s in registry.REGISTRY.items() if s.oracle is None]
    assert no_oracle == ["j6_greedy_tracking"]


def test_registered_fn_names_match_query_names():
    """Guard against the decorator-slip class of bug: inserting a
    helper between @query(...) and its intended function silently
    registers the helper (which then receives (spark, sf_dir) and
    explodes at run time). Every registered fn must be the function
    the name says it is."""
    from talknet_segmentation_batchprocessing_spark import registry

    registry._ensure_loaded()
    mismatched = {
        name: spec.fn.__name__
        for name, spec in registry.REGISTRY.items()
        if spec.fn.__name__ != name
    }
    assert not mismatched, f"@query decorator attached to the wrong def: {mismatched}"


def test_register_views_sql_surface(spark):
    """session.register_views exposes every table to plain spark.sql
    with the oracle-matching names."""
    from talknet_segmentation_batchprocessing_spark.session import register_views

    from .conftest import SF_SMOKE

    names = register_views(spark, SF_SMOKE)
    assert "documents" in names and "lineitem" in names
    n_docs = spark.sql("SELECT count(*) AS n FROM documents").collect()[0]["n"]
    assert n_docs > 0
    j = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customer c "
        "ON o.o_custkey = c.c_custkey"
    ).collect()[0]["n"]
    assert j > 0
