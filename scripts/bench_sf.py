"""10x scale-factor headroom measurement (round-3 verdict #6).

Runs the headline suite at sf0.1 AND at a deterministically scaled sf1
(scripts/make_sf.py, 10x rows) in the SAME JVM/config (local[32], min-of-2
per query, identical to bench.py's timing discipline) and writes
BENCH_SF1.json with per-query times plus the sf1/sf0.1 ratio. The pass bar
from the verdict: every ratio <= ~12 (linear-with-overhead); a quadratic
plan (e.g. an LSH bucket blowup or a per-char explode sort going superlinear)
would show up as a ratio far above the data growth.

Usage: python scripts/bench_sf.py [--sf1-dir /dev/shm/sf1] [--out BENCH_SF1.json]
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


def time_suite(spark, qmap, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in bench.HEADLINE:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            bench._noop_run(qmap[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir", default=os.path.join(
        bench.SCRATCH or "/tmp", "spark_graft_sf1"))
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1.json"))
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.sf1_dir, "lineitem.parquet")):
        from scripts.make_sf import scale
        scale(args.sf01_dir, args.sf1_dir, 10)

    from pttcrawler_spark import suite
    spark = get_spark(args.cpus, app_name="bench_sf1")
    qmap = suite.queries()
    bench._noop_run(qmap["p1_point_lookup"](spark, args.sf01_dir))  # warmup

    t01 = time_suite(spark, qmap, args.sf01_dir)
    t1 = time_suite(spark, qmap, args.sf1_dir)
    ratios = {k: round(t1[k] / max(t01[k], 1e-9), 2) for k in t01}
    result = {
        "metric": "sf1_vs_sf0.1_headline",
        "cpus": args.cpus,
        "data_factor": 10,
        "sf0.1_seconds": t01,
        "sf1_seconds": t1,
        "ratio_sf1_over_sf0.1": ratios,
        "total_sf0.1": round(sum(t01.values()), 3),
        "total_sf1": round(sum(t1.values()), 3),
        "max_ratio": max(ratios.values()),
        "pass_bar": "every per-query ratio <= ~12 (10x data, linear plans)",
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
