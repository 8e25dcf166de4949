"""Distributed connected components: large-star / small-star.

The hash-min label propagation in ``dedup_cc_clusters`` converges in
O(component diameter) rounds and shuffles every node's label each
round — fine for near-dup graphs (small diameters), but a giant
component makes the hot label a shuffle hot-spot. The alternating
star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) bounds skew: each round only re-points edges at
per-node minima, converges in O(log n) rounds on any graph, and every
aggregation key is a node (never a component label), so no single key
accumulates a component's worth of traffic.

- **large-star**: per node u, m = min(Γ(u) ∪ {u}); re-point every
  strictly-larger neighbor at m.
- **small-star**: orient edges high->low; per node u, m = min of its
  low neighbors ∪ {u}; point u and all its low neighbors at m.

Fixpoint: the edge set stops changing; every surviving edge then goes
node -> component-min (a star), and isolated centers label themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("_m"))
    )
    # No distinct here: duplicate (u, m) pairs cost one extra shuffle
    # to remove, while the consumer (_small_star) is duplicate-proof —
    # its min-aggregates ignore multiplicity and its output IS
    # distinct'ed. One shuffle per round saved.
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    orient = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = (
        orient.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("_m"))
    )
    j = orient.join(m, "u")
    out = j.select(F.col("v").alias("u"), F.col("_m").alias("v")).unionAll(
        m.select("u", F.col("_m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 50,
    edges_distinct: bool = False,
) -> DataFrame:
    """nodes(node) + edges(u, v) -> (node, component) with component =
    min node id of the component (singletons label themselves).

    Each round is two groupBy-min + join passes over the shrinking
    edge list; ``localCheckpoint`` cuts lineage per round — LAZY, so
    the round's signature aggregate doubles as the materializing
    action: ONE job per round instead of checkpoint-then-aggregate
    (the per-round fixed cost dominated the sf0.1 wall). Convergence
    is screened with a cheap (count, sum) signature of the oriented
    edge set, then CONFIRMED exactly: equal signatures do not imply
    equal edge sets ({(3,1),(4,2)} vs {(4,1),(3,2)} collide), so a
    signature match triggers one ``exceptAll`` emptiness check against
    the previous round's (checkpointed, so cheap) frame before
    stopping. Exhausting ``max_rounds`` without a fixpoint raises —
    silently returning unconverged labels would be a wrong answer.
    """
    e = edges.select(
        F.col(edges.columns[0]).cast("long").alias("u"),
        F.col(edges.columns[1]).cast("long").alias("v"),
    ).filter(F.col("u") != F.col("v"))
    # edges_distinct: callers whose edge list is an aggregation output
    # (e.g. the Jaccard pair pipeline's groupBy) skip one shuffle here;
    # the algorithm tolerates duplicates either way (min-aggregates),
    # only the convergence signature needs a duplicate-free frame, and
    # every post-round frame is distinct by construction.
    if not edges_distinct:
        e = e.distinct()
    e = e.localCheckpoint()
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        prev_e = e
        # eager=False: the signature .collect() below is the action
        # that materializes this round's checkpoint, so the round runs
        # one job, and the NEXT round's double read of ``e`` (the
        # symmetrized union) hits stored partitions, not recompute.
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        row = e.agg(
            F.count("*").alias("n"), F.sum("u").alias("su"), F.sum("v").alias("sv")
        ).collect()[0]
        sig = (row["n"], row["su"], row["sv"])
        if sig == prev_sig and e.exceptAll(prev_e).isEmpty():
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_rounds} rounds"
        )
    node_col = nodes.columns[0]
    comp = e.select(F.col("u").alias(node_col), F.col("v").alias("component"))
    return (
        nodes.select(F.col(node_col).cast("long").alias(node_col))
        .join(comp, node_col, "left")
        .select(
            node_col,
            F.coalesce(F.col("component"), F.col(node_col)).alias("component"),
        )
    )
