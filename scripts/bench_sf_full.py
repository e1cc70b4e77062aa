"""Full-suite 10x headroom measurement (round-4 verdict #3).

BENCH_SF1.json covers the 14 headline + round-4 keys; ~70 keys had never
been measured at 10x data. This script times EVERY queries() key at sf0.1
and at sf1 (scripts/make_sf.py, 10x rows, same JVM, local[32], min-of-2 —
bench.py's timing discipline) and writes BENCH_SF1_FULL.json with per-query
ratios against the verdict's <= ~12 bar.

Known exception, carried not re-run: `dedup_semantic` is the documented
fixed-k oracle twin whose 10x behavior was already measured at 695.2 s
(99.4x) in BENCH_SF1.json — re-measuring an intentional quadratic twin
burns ~25 min for no new information. Its scale-path sibling
`dedup_semantic_scaled` IS measured here.

Usage: python scripts/make_sf.py /dev/shm/sf1 && \
       python scripts/bench_sf_full.py --sf1-dir /dev/shm/sf1
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pttcrawler_spark.session import get_spark  # noqa: E402

# fixed-k quadratic oracle twin: 10x cost measured once in BENCH_SF1.json
CARRIED = {"dedup_semantic": {"sf1_seconds": 695.202, "ratio": 99.4,
                              "source": "BENCH_SF1.json (round 4)"}}


def time_keys(spark, qmap, names, sf_dir: str, runs: int = 2,
              label: str = "") -> dict[str, float]:
    out: dict[str, float] = {}
    for i, name in enumerate(names):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            bench._noop_run(qmap[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"[{label}] {i + 1}/{len(names)} {name}: {out[name]:.3f}s",
              flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir", default="/dev/shm/sf1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_FULL.json"))
    args = ap.parse_args()

    from pttcrawler_spark import suite
    spark = get_spark(args.cpus, app_name="bench_sf_full")
    qmap = suite.queries()
    names = sorted(qmap)
    measured = [n for n in names if n not in CARRIED]

    bench._noop_run(qmap["p1_point_lookup"](spark, args.sf01_dir))  # warmup

    t01 = time_keys(spark, qmap, names, args.sf01_dir, label="sf0.1")
    t1 = time_keys(spark, qmap, measured, args.sf1_dir, label="sf1")
    ratios = {k: round(t1[k] / max(t01[k], 1e-9), 2) for k in measured}
    over_bar = sorted((k for k in measured if ratios[k] > 12),
                      key=lambda k: -ratios[k])
    result = {
        "metric": "sf1_vs_sf0.1_full_suite",
        "cpus": args.cpus,
        "data_factor": 10,
        "n_keys": len(names),
        "n_measured_at_sf1": len(measured),
        "carried": CARRIED,
        "sf0.1_seconds": t01,
        "sf1_seconds": t1,
        "ratio_sf1_over_sf0.1": ratios,
        "total_sf0.1": round(sum(t01.values()), 3),
        "total_sf1_measured": round(sum(t1.values()), 3),
        "max_ratio_measured": max(ratios.values()),
        "argmax_ratio": max(ratios, key=ratios.get),
        "over_bar_keys": over_bar,
        "pass_bar": "every per-query ratio <= ~12 (10x data, linear plans); "
                    "dedup_semantic carried from BENCH_SF1.json as the "
                    "documented fixed-k quadratic twin",
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("total_sf0.1", "total_sf1_measured",
                       "max_ratio_measured", "argmax_ratio",
                       "over_bar_keys")}))
    spark.stop()


if __name__ == "__main__":
    main()
