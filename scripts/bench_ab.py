#!/usr/bin/env python
"""One controlled A/B for the bench's round-over-round creep
(VERDICT r10 Next #1): the normalized median has read ~1.10-1.13x for
two rounds while the pass protocol silently changed underneath it.
This runs the SAME headline set at the SAME pass count two ways:

  A) one long session (bench.py's default posture, ~6000 stages in
     one JVM), and
  B) fresh sessions per ~40-query group (each group its own
     subprocess, so JVM-global state — codegen caches, catalog,
     listener queues — starts cold every time),

normalizes each side by its own same-run calibration, and reports the
per-query ratio fresh/long. A median meaningfully BELOW 1.0 means the
long session accumulates overhead (harness drift, fix bench.py to
restart per group); a median at ~1.0 means the creep is measurement
bias (pass-count/min-of-N on a stall-prone host) or real engine drift
to bisect per family.

Usage:
    python scripts/bench_ab.py            # sf0.1, groups of 40
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/bench_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = 40


def _run(args: list[str], out_path: str) -> dict:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a stale detail file from a previous A/B must never stand in for
    # a crashed run's output — remove it before the subprocess starts
    if os.path.exists(out_path):
        os.remove(out_path)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--out", out_path]
        + args,
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    if not os.path.exists(out_path):
        raise RuntimeError(
            f"bench run produced no detail file (rc {proc.returncode}):\n"
            + proc.stdout[-1000:]
            + proc.stderr[-1000:]
        )
    with open(out_path) as f:
        return json.load(f)


def main() -> int:
    import bench  # noqa: E402  (repo root on sys.path)

    headline = bench._headline()
    groups = [headline[i : i + GROUP] for i in range(0, len(headline), GROUP)]

    print(f"A: one long session over {len(headline)} queries ...")
    a = _run([], "/tmp/bench_ab_long.json")
    a_norm = {q: t / a["calib_sec"] for q, t in a["queries"].items()}

    print(f"B: {len(groups)} fresh sessions of <= {GROUP} queries ...")
    b_norm: dict[str, float] = {}
    b_calibs = []
    for i, g in enumerate(groups):
        d = _run(["--only", ",".join(g)], f"/tmp/bench_ab_fresh_{i}.json")
        b_calibs.append(d["calib_sec"])
        for q, t in d["queries"].items():
            b_norm[q] = t / d["calib_sec"]
        print(f"  group {i}: {len(d['queries'])} queries, "
              f"calib {d['calib_sec']}")

    common = sorted(set(a_norm) & set(b_norm))
    ratios = {q: round(b_norm[q] / a_norm[q], 3) for q in common}
    vals = sorted(ratios.values())
    med = vals[len(vals) // 2] if vals else None
    worst = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:8])
    best = dict(sorted(ratios.items(), key=lambda kv: kv[1])[:8])
    out = {
        "metric": "bench_ab_fresh_vs_long",
        "n_queries": len(common),
        "n_passes": a.get("n_passes"),
        "median_ratio_fresh_over_long": med,
        "long_calib_sec": a["calib_sec"],
        "fresh_calib_secs": b_calibs,
        "worst_fresh_vs_long": worst,
        "best_fresh_vs_long": best,
        "ratios": ratios,
        "note": "ratio < 1 = fresh sessions faster = long-session "
        "accumulation; ~1 = no harness drift, creep is protocol/host",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "AB_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    summary = {k: out[k] for k in (
        "metric", "n_queries", "median_ratio_fresh_over_long",
        "long_calib_sec",
    )}
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
