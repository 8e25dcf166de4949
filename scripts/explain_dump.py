#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named queries to plans/<tag>/.

Usage:
    python scripts/explain_dump.py --tag r12 --suffix before q1 q2 ...

Writes plans/<tag>/<query>_<suffix>.txt for each named query (the
optimization-round evidence files: the judge checks plan claims against
these). Runs at sf0.1 by default (the bench scale) so the captured plan
is the one the bench times; override with SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from talknet_segmentation_batchprocessing_spark import registry  # noqa: E402
from talknet_segmentation_batchprocessing_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="explain-dump")
    registry._ensure_loaded()
    unknown = set(args.names) - set(registry.REGISTRY)
    assert not unknown, f"unknown queries: {sorted(unknown)}"

    for name in args.names:
        spark.catalog.clearCache()
        # session-scoped graph tables would make the captured plan a
        # cache-hit scan instead of the full build path the bench times
        for t in spark.catalog.listTables():
            if t.name.startswith(("graph_oriented_edges", "graph_sym_edges")):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        df = registry.REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
