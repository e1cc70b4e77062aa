#!/usr/bin/env python
"""Scale-headroom evidence (round-3 verdict #6): run the headline suite at
sf1 (10× sf0.1, derived by scripts/make_sf1.py) next to sf0.1 in the same
JVM and commit per-query timings + ratios to BENCH_SF1.json.

The plans are asserted shuffle-minimal (tests/test_plan_quality.py); this
run shows they HOLD their ratios at 10× — a quadratic surprise (e.g. an
explode whose intermediate outgrows its inputs) surfaces here first. A
healthy ratio is ≲ ~12 (10× data + sub-linear constant amortization noise).

Usage: python scripts/make_sf1.py /dev/shm/sf1 && \
       python scripts/bench_sf1.py /dev/shm/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF01 = "/root/testdata/sf0.1"


def run(spark, qmap, names, sf_dir) -> dict[str, float]:
    out = {}
    for name in names:
        best = None
        for _ in range(2):  # min-of-2, same discipline as bench.py
            t0 = time.perf_counter()
            (qmap[name](spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1"
    import bench
    from pttcrawler_spark import suite
    from pttcrawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus, app_name="bench_sf1")
    qmap = suite.queries()
    (qmap["p1_point_lookup"](spark, SF01)
     .write.format("noop").mode("overwrite").save())  # warmup

    t01 = run(spark, qmap, bench.HEADLINE, SF01)
    t1 = run(spark, qmap, bench.HEADLINE, sf1_dir)
    ratios = {k: round(t1[k] / max(t01[k], 1e-9), 2) for k in bench.HEADLINE}
    result = {
        "metric": "headline_sf1_over_sf0.1_ratio",
        "cpus": cpus,
        "sf0.1_seconds": t01,
        "sf1_seconds": t1,
        "ratio": ratios,
        "total_sf0.1": round(sum(t01.values()), 3),
        "total_sf1": round(sum(t1.values()), 3),
        "total_ratio": round(sum(t1.values()) / sum(t01.values()), 2),
        "max_ratio": max(ratios.values()),
        "note": "sf1 = 10 key-shifted replicas of sf0.1 "
                "(scripts/make_sf1.py); timing evidence only",
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_SF1.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("total_sf0.1", "total_sf1", "total_ratio",
                       "max_ratio")}))
    spark.stop()


if __name__ == "__main__":
    main()
