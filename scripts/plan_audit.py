#!/usr/bin/env python
"""Generate PLANS.md: physical-plan posture of every registered query.

For each query, counts the plan features that matter at 100 TB:
broadcast vs sort-merge joins, exchanges, single-partition exchanges
(only acceptable feeding a final ≤few-row aggregate), and nested-loop
joins (only acceptable against broadcast-tiny sides). Run after
changing any query:

    python scripts/plan_audit.py   # rewrites PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from talknet_segmentation_batchprocessing_spark import registry  # noqa: E402
from talknet_segmentation_batchprocessing_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _count(plan: str, *patterns: str) -> int:
    """Count EXECUTED operators matching any pattern: the plan string
    repeats a cached relation's entire child plan under every
    InMemoryTableScan that reads it, so raw substring counts inflate
    multi-consumer plans (round-4 triangle query: 67 text exchanges,
    18 executed). Operators carry a stable ``plan_id`` — dedup on it;
    lines without one (pre-AQE fragments) count per occurrence."""
    import re

    ids: set[str] = set()
    noid: set[str] = set()
    for line in plan.splitlines():
        if any(p in line for p in patterns):
            m = re.search(r"plan_id=(\d+)", line)
            if m:
                ids.add(m.group(1))
            else:
                # pre-AQE fragments inside cached-relation subtrees have
                # no plan_id but repeat VERBATIM (same expr ids AND the
                # same tree-position prefix) at every scan of the cache.
                # Dedup on the RAW line — keeping the indentation/branch
                # prefix distinguishes same-text operators sitting at
                # different positions of different subtrees.
                noid.add(line)
    return len(ids) + len(noid)


def _existing_rows(path: str) -> tuple[dict[str, tuple], int]:
    """Parse a previously generated PLANS.md back into (name -> row,
    unparsed-row count), so ``--only name1,name2`` can refresh specific
    rows without re-running all registered queries (~25 min). The
    merged output is re-emitted in REGISTRY order, so new debuts slot
    into their proper position. Rows that don't split into exactly 6
    cells are counted, not silently dropped — a dropped row would be
    re-audited as a 'debut', masking a corrupt prior file."""
    rows: dict[str, tuple] = {}
    bad = 0
    try:
        with open(path) as f:
            for line in f:
                if not line.startswith("| ") or line.startswith("| query |"):
                    continue
                if set(line.strip()) <= {"|", "-", " "}:
                    continue  # the header separator row
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if len(cells) == 6:
                    rows[cells[0]] = tuple(cells)
                else:
                    bad += 1
    except FileNotFoundError:
        pass
    return rows, bad


def _stale_modules(out_path: str, only: set[str], reg) -> list[str]:
    """Package modules edited AFTER the prior PLANS.md was generated
    but NOT owned by any --only query: their queries' reused rows may
    be stale, because plan shape can change through shared helpers
    (round 10's global_rank BIGINT change touched 5 queries via
    plans/two_phase.py). Returns repo-relative paths to warn about."""
    try:
        plans_mtime = os.path.getmtime(out_path)
    except OSError:
        return []
    named_files = set()
    for n in only:
        mod = sys.modules.get(reg.REGISTRY[n].fn.__module__)
        if mod is not None and getattr(mod, "__file__", None):
            named_files.add(os.path.abspath(mod.__file__))
    pkg_root = os.path.dirname(os.path.abspath(reg.__file__))
    repo_root = os.path.dirname(pkg_root)
    stale = []
    for r, _d, fs in os.walk(pkg_root):
        for f in fs:
            if not f.endswith(".py"):
                continue
            p = os.path.join(r, f)
            if os.path.abspath(p) in named_files:
                continue
            if os.path.getmtime(p) > plans_mtime:
                stale.append(os.path.relpath(p, repo_root))
    return sorted(stale)


def main() -> int:
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()
    out_path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        unknown = only - set(registry.REGISTRY)
        if unknown:
            print(f"--only names unknown queries: {sorted(unknown)}")
            return 2
    prior: dict[str, tuple] = {}
    if only:
        prior, n_bad = _existing_rows(out_path)
        if n_bad:
            print(
                f"WARNING: {n_bad} prior PLANS.md row(s) failed to parse "
                "and will be re-audited if named (or re-emitted as debuts)"
            )
        stale = _stale_modules(out_path, only, registry)
        if stale:
            print(
                f"WARNING: {len(stale)} package module(s) changed since "
                "the last full audit but are outside the --only queries' "
                "modules — reused rows may be stale through shared "
                f"helpers: {', '.join(stale[:8])}"
                + (" ..." if len(stale) > 8 else "")
            )
    rows = []
    for name, spec in registry.REGISTRY.items():
        if only is not None and name not in only:
            if name in prior:
                rows.append(prior[name])
                continue
            # a registered query with no prior row is a new debut: it
            # must be audited even in --only mode, never silently
            # dropped (the drift the enforcement test exists to catch)
        registry.release_persisted()
        try:
            plan = (
                spec.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            )
            rows.append(
                (
                    name,
                    _count(plan, "BroadcastHashJoin"),
                    _count(plan, "SortMergeJoin"),
                    _count(
                        plan,
                        "Exchange hashpartitioning",
                        "Exchange rangepartitioning",
                    ),
                    _count(plan, "Exchange SinglePartition"),
                    _count(plan, "BroadcastNestedLoopJoin", "CartesianProduct"),
                )
            )
        except Exception as e:  # noqa: BLE001
            rows.append((name, "ERR", str(e)[:60], "", "", ""))
    out = [
        "# PLANS — physical-plan audit (generated by scripts/plan_audit.py)",
        "",
        f"Every registered query's executed plan at sf0.01 ({len(rows)} queries).",
        "Columns: broadcast hash joins / sort-merge joins (large-large only) /",
        "shuffles / single-partition exchanges (final tiny aggregates only) /",
        "nested-loop joins (broadcast-tiny sides only: literal boundary rows,",
        "per-bucket offset frames, 1-row totals, ensemble constants).",
        "Counts are EXECUTED operators (deduplicated by plan_id, and by",
        "verbatim line for pre-AQE cached-relation fragments): the plan text",
        "repeats a cached relation's child plan under every scan of it, so",
        "raw substring counts overstate multi-consumer queries.",
        "Adaptive-CC queries (dedup_cc_*, dedup_keep_canonical,",
        "dedup_semantic_keep*) run their candidate-pair pipeline and the",
        "union-find/star rounds EAGERLY when the DataFrame is built (the",
        "edge table is checkpoint-materialized); the audited plan is the",
        "final label-join phase, not that upstream work — see the",
        "dedup_ngram_jaccard / dedup_embedding_cosine rows for the",
        "candidate pipelines' own plans.",
        "",
        "| query | BHJ | SMJ | shuffles | 1-part | NLJ |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append("| " + " | ".join(str(x) for x in r) + " |")
    with open(out_path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"PLANS.md written: {len(rows)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
