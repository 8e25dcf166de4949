#!/usr/bin/env python
"""Local mirror of the driver's correctness gate at the driver's scale.

Runs the FIRST N (default 50) registered queries — the same
registration-order window the driver checks — at sf0.01 (the driver's
SF), comparing each Spark result against its DuckDB oracle on row
count, sorted column names, and exact values. Prints one status line
per query and a JSON summary; exits non-zero on any mismatch.

Usage:
    python scripts/driver_sweep.py            # first 50 at sf0.01
    python scripts/driver_sweep.py --all      # every registered query
    SWEEP_SF_DIR=/root/testdata/sf0.001 python scripts/driver_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from talknet_segmentation_batchprocessing_spark import registry  # noqa: E402
from talknet_segmentation_batchprocessing_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


from talknet_segmentation_batchprocessing_spark.oracle_compare import (  # noqa: E402
    canon as _canon,
    dtype_class as _dtype_class,
    dtype_map as _dtype_map,
)


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    limit = None if "--all" in sys.argv else 50

    registry._ensure_loaded()
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        if i + 1 >= len(sys.argv):
            print("usage: driver_sweep.py --only name1,name2,...")
            return 2
        wanted = sys.argv[i + 1].split(",")
        unknown = [n for n in wanted if n not in registry.REGISTRY]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 2
        names = wanted
    else:
        names = list(registry.REGISTRY)[:limit]

    spark = get_spark(app_name="driver-sweep")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        spec = registry.REGISTRY[name]
        t0 = time.perf_counter()
        try:
            registry.release_persisted()
            sdf_raw = spec.fn(spark, sf_dir).toPandas()
            sdf = _canon(sdf_raw)
            if spec.oracle is None:
                results[name] = {"status": "no_oracle", "spark_rows": len(sdf)}
                print(f"  NO-ORACLE {name}: {len(sdf)} rows")
                continue
            odf_raw = duck.execute(spec.oracle).df()
            odf = _canon(odf_raw)
            # dtype honesty: compare coarse dtype classes BEFORE _canon
            # coerces them away — this is what splits the driver's hash
            # even when every value is equal (VERDICT r3 #1/#2).
            smap, omap = _dtype_map(sdf_raw), _dtype_map(odf_raw)
            ok_dtypes = all(
                smap.get(c) == omap.get(c) for c in set(smap) | set(omap)
            )
            ok_cols = list(sdf.columns) == list(odf.columns)
            ok_rows = len(sdf) == len(odf)
            ok_vals = ok_cols and ok_rows
            if ok_vals:
                for c in sdf.columns:
                    a, b = sdf[c], odf[c]
                    eq = (a == b) | (a.isna() & b.isna())
                    if not eq.all():
                        ok_vals = False
                        break
            status = (
                "PASS" if (ok_cols and ok_rows and ok_vals and ok_dtypes) else "FAIL"
            )
            if status == "FAIL":
                n_fail += 1
            results[name] = {
                "status": status,
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
                "cols": ok_cols,
                "vals": ok_vals,
                "dtypes": ok_dtypes,
            }
            detail = ""
            if not ok_dtypes:
                diff = {
                    c: (smap.get(c), omap.get(c))
                    for c in sorted(set(smap) | set(omap))
                    if smap.get(c) != omap.get(c)
                }
                detail = f" dtype_diff={diff}"
            print(
                f"  {status} {name}: {len(sdf)}/{len(odf)} rows"
                f" cols={ok_cols} vals={ok_vals} dtypes={ok_dtypes}{detail}"
                f" ({time.perf_counter() - t0:.1f}s)"
            )
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            n_fail += 1
            results[name] = {"status": "ERROR", "err": str(e)[:300]}
            print(f"  ERROR {name}: {str(e)[:200]}")

    print(json.dumps({"checked": len(names), "failed": n_fail, "sf_dir": sf_dir}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
