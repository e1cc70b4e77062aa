#!/usr/bin/env python
"""A/B bisect of bench-worker JVM config on the scaling corpus.

Built to bisect an apparent round-3 config regression (run B at 43913d0
sustained 1407/4943/8454 URLs/s; later runs ~2x slower at every level).
RESOLVED: the host itself was ~2.3x slower at high thread counts in the
slow runs — its own pure-CPU microbench fell from 241 to ~102 Mops at 32
threads — and the committed config (G1 bounded young, uncompressed cache)
wins on a healthy host (2->8 sustained 0.948, BENCH_SCALING.json). Keep
this script for the next time the host muddies an A/B: it re-runs ONE
level (default local[8]) under named config variants on a shared
pre-generated corpus, with a host-CPU probe before each, so config and
host effects separate.

Usage: python scripts/bench_ab.py [corpus_dir] [variant ...]
Writes /tmp/bench_ab_results.json incrementally.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

RUNB_GC = "-XX:+AlwaysPreTouch -XX:+UseParallelGC -Xmn{xmn}g"
G1_GC = ("-XX:+AlwaysPreTouch -XX:+UseG1GC "
         "-XX:+UnlockExperimentalVMOptions -XX:G1MaxNewSizePercent=10")

# heap per run-B formula: 4 + 1.5*cores; xmn = half
VARIANTS = {
    # committed round-2/3 config
    "v0_current": {},
    # full run-B worker config
    "v1_runB": {"SPARK_GRAFT_BENCH_JAVA_OPTS": RUNB_GC,
                "SPARK_GRAFT_CACHE_COMPRESSED": "true",
                "SPARK_GRAFT_DRIVER_MEM": "{runb_heap}g"},
    # run-B GC + heap only (cache compression stays off)
    "v2_runB_gc": {"SPARK_GRAFT_BENCH_JAVA_OPTS": RUNB_GC,
                   "SPARK_GRAFT_DRIVER_MEM": "{runb_heap}g"},
    # current G1 config + compressed cache
    "v3_g1_compressed": {"SPARK_GRAFT_CACHE_COMPRESSED": "true"},
    # current G1 config + run-B heap sizing
    "v4_g1_bigheap": {"SPARK_GRAFT_DRIVER_MEM": "{runb_heap}g"},
}


def run(cores: int, corpus: str, names: list[str]) -> dict:
    out_path = "/tmp/bench_ab_results.json"
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    runb_heap = 4 + (3 * cores) // 2
    xmn = runb_heap // 2
    for name in names:
        env = {k: v.format(runb_heap=runb_heap, xmn=xmn)
               for k, v in VARIANTS[name].items()}
        saved = {k: os.environ.get(k) for k in
                 ("SPARK_GRAFT_BENCH_JAVA_OPTS", "SPARK_GRAFT_CACHE_COMPRESSED",
                  "SPARK_GRAFT_DRIVER_MEM")}
        for k in saved:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            cpu = bench.cpu_sustained_bench(levels=(cores,), seconds=10.0)
            r = bench._run_worker(cores, bench.SITE_SCALING, corpus)
            r.pop("batch_stats", None)
            results[f"{name}@{cores}"] = {
                "host_cpu_Mops": cpu[str(cores)], "env": env, **r}
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        json.dump(results, open(out_path, "w"), indent=2)
        print(f"== {name}@{cores}: sustained "
              f"{results[f'{name}@{cores}']['sustained_urls_per_sec']} "
              f"(host cpu {cpu[str(cores)]} Mops)", flush=True)
    return results


if __name__ == "__main__":
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/r3_corpus/corpus"
    cores = int(os.environ.get("AB_CORES", "8"))
    names = sys.argv[2:] or list(VARIANTS)
    run(cores, corpus, names)
