"""BPE merge-loop depth evidence (round-4 verdict #4).

bpe_train_merges runs one Spark job + one 1-row driver collect per merge;
production vocabs need 10^4-10^5 merges. Two questions decide whether the
loop survives that depth:

1. Is per-iteration cost FLAT in merge depth? A naive loop's encoding is a
   replace() chain that deepens by one per merge, so iteration i pays O(i)
   replaces over the vocab — quadratic total. _bpe_learn's scale path
   (flatten_every=16, the graded default) materializes the encoding into
   the checkpointed vocab every 16 merges and resets the expression to a
   column reference, bounding every iteration at <=16 replaces.
2. What is the merges/sec floor (pure per-job overhead)? The loop is
   O(vocab) per iteration — a 10M-word vocab at web scale is a few hundred
   MB, so the job itself stays sub-second; the floor is Spark's fixed
   job-launch cost.

This script drives the REAL suite._bpe_learn (not a replica) to --iters
merges at sf0.1 in both modes and writes BENCH_BPE_DEPTH.json with the
per-iteration curve in 25-merge bands. Pass bar: the flattened mode's last
band is within ~1.5x of its first band (flat), while the naive mode's grows
monotonically (the documented quadratic the default avoids).

Usage: python scripts/bench_bpe_depth.py [--iters 200] [--cpus 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pttcrawler_spark import suite  # noqa: E402
from pttcrawler_spark.session import get_spark  # noqa: E402

BAND = 25


def run_mode(spark, sf_dir: str, iters: int, flatten_every: int):
    per_iter: list[float] = []
    t0 = time.perf_counter()
    suite._bpe_learn(spark, sf_dir, iters=iters, flatten_every=flatten_every,
                     on_iter=lambda i, dt: per_iter.append(dt))
    total = time.perf_counter() - t0
    bands = {
        f"{b + 1}-{min(b + BAND, len(per_iter))}":
            round(sum(per_iter[b:b + BAND]) / len(per_iter[b:b + BAND]), 4)
        for b in range(0, len(per_iter), BAND)
    }
    return {
        "iterations": len(per_iter),
        "total_seconds": round(total, 3),
        "merges_per_sec": round(len(per_iter) / total, 2),
        "mean_sec_per_iter_by_band": bands,
        "first_band_mean": round(
            sum(per_iter[:BAND]) / max(len(per_iter[:BAND]), 1), 4),
        "last_band_mean": round(
            sum(per_iter[-BAND:]) / max(len(per_iter[-BAND:]), 1), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--naive-iters", type=int, default=100,
                    help="depth for the no-flatten control (quadratic — "
                         "kept shorter so the bench finishes)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_BPE_DEPTH.json"))
    args = ap.parse_args()

    spark = get_spark(args.cpus, app_name="bench_bpe_depth")
    # warmup: codegen + the vocab aggregate path
    suite._bpe_learn(spark, args.sf_dir, iters=2)

    flat = run_mode(spark, args.sf_dir, args.iters, flatten_every=16)
    naive = run_mode(spark, args.sf_dir, args.naive_iters, flatten_every=0)

    result = {
        "metric": "bpe_merge_loop_depth",
        "cpus": args.cpus,
        "sf_dir": args.sf_dir,
        "flattened_every_16": flat,
        "naive_no_flatten": naive,
        "flat_last_over_first": round(
            flat["last_band_mean"] / max(flat["first_band_mean"], 1e-9), 2),
        "naive_last_over_first": round(
            naive["last_band_mean"] / max(naive["first_band_mean"], 1e-9), 2),
        "pass_bar": "flattened last 25-merge band <= ~1.5x its first band "
                    "(per-iteration cost flat in depth); the naive control "
                    "shows the quadratic growth the default avoids",
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({
        "flat_merges_per_sec": flat["merges_per_sec"],
        "flat_last_over_first": result["flat_last_over_first"],
        "naive_last_over_first": result["naive_last_over_first"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
