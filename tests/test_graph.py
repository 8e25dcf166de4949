"""operators/graph.py: large-star/small-star connected components
pinned against an exact driver-side union-find on seeded random
graphs, including the shapes that stress each algorithm: a long path
(worst case for hash-min's diameter bound) and a giant star (worst
case for label hot-spots)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def union_find_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node of component
    comp: dict[int, int] = {}
    roots: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        roots.setdefault(r, min(r, v))
        roots[r] = min(roots[r], v)
    for v in range(n_nodes):
        comp[v] = roots[find(v)]
    return comp


def _run(spark, n_nodes, edges):
    from talknet_segmentation_batchprocessing_spark.operators.graph import (
        connected_components_star,
    )

    nodes = spark.createDataFrame(pd.DataFrame({"node": range(n_nodes)}))
    if edges:
        e = spark.createDataFrame(pd.DataFrame(edges, columns=["u", "v"]))
    else:
        e = spark.createDataFrame(pd.DataFrame({"u": [], "v": []}), "u long, v long")
    # both sides of the adaptive switch must agree exactly: the
    # driver-side union-find fast path (default at these sizes) and
    # the distributed star rounds (forced via local_threshold=0)
    got = connected_components_star(nodes, e).toPandas()
    got_star = connected_components_star(nodes, e, local_threshold=0).toPandas()
    m = got.merge(got_star, on="node", suffixes=("_local", "_star"))
    assert (m["component_local"] == m["component_star"]).all()
    want = union_find_components(n_nodes, edges)
    assert len(got) == n_nodes
    mismatch = {
        int(r.node): (int(r.component), want[int(r.node)])
        for r in got.itertuples()
        if int(r.component) != want[int(r.node)]
    }
    assert not mismatch, f"{len(mismatch)} wrong labels, e.g. {list(mismatch.items())[:5]}"


def test_star_cc_random_graphs(spark):
    rng = np.random.default_rng(42)
    for trial in range(3):
        n = 120
        m = int(rng.integers(30, 160))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        _run(spark, n, edges)


def test_star_cc_long_path(spark):
    # path 0-1-2-...-79: diameter 79 — hash-min needs 79 rounds, the
    # star algorithm converges logarithmically
    edges = [(i, i + 1) for i in range(79)]
    _run(spark, 80, edges)


def test_star_cc_giant_star_and_singletons(spark):
    # node 50 connected to everything below 50; 51..99 singletons
    edges = [(50, i) for i in range(50)]
    _run(spark, 100, edges)


def test_star_cc_no_edges(spark):
    _run(spark, 10, [])


def test_triangle_degree_orientation_skewed_star(spark):
    """VERDICT r4 Next #5: degree orientation on a skewed hub graph.
    Hub 0 touches all 40 spokes plus the spokes form a few triangles
    with the hub and with each other; the oriented enumeration must
    count each triangle exactly once per participating node, matching
    a brute-force count."""
    from itertools import combinations

    import pandas as pd
    from pyspark.sql import functions as F

    # hub star + a chord chain among spokes => hub triangles
    edges = [(0, i) for i in range(1, 41)]
    edges += [(i, i + 1) for i in range(1, 40, 2)]  # chords: (1,2),(3,4)...
    edges += [(5, 9), (9, 13), (5, 13)]  # an off-hub triangle
    eset = {tuple(sorted(e)) for e in edges}
    nodes = sorted({x for e in eset for x in e})
    want: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1

    # drive the registered query's enumeration directly on this graph
    # by monkeypatching its edge source
    from talknet_segmentation_batchprocessing_spark.queries import extensions

    e_df = spark.createDataFrame(
        pd.DataFrame(sorted(eset), columns=["doc_a", "doc_b"]).astype("int64")
    ).localCheckpoint()
    orig = extensions._near_dup_edges
    extensions._near_dup_edges = lambda s, d: e_df
    try:
        got = {
            int(r.node): int(r.n_triangles)
            for r in extensions.graph_triangle_count(spark, "unused").collect()
        }
    finally:
        extensions._near_dup_edges = orig
    assert got == want
