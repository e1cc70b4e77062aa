"""One-off profiler: run the scaling-corpus crawl at chosen core counts in
fresh pinned worker JVMs (exactly like bench.py --scaling) and print the
steady-window phase medians — the commit-tail measurement loop for
VERDICT item 4 (commit phase <= 35% of steady batch wall at local[32])."""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main() -> None:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "32").split(",")]
    from pttcrawler_spark.session import get_spark
    spark = get_spark(8, app_name="profile_corpus_gen")
    tmp = tempfile.mkdtemp(prefix="profile_corpus_", dir=bench.SCRATCH)
    corpus_path = os.path.join(tmp, "corpus")
    try:
        bench.prepare_corpus(spark, bench.SITE_SCALING, corpus_path)
        spark.stop()
        for cores in levels:
            r = bench._run_worker(cores, bench.SITE_SCALING, corpus_path)
            stats = r.pop("batch_stats", [])
            print(json.dumps({
                "cores": cores,
                "sustained_urls_per_sec": r["sustained_urls_per_sec"],
                "median_batch_urls_per_sec": r["median_batch_urls_per_sec"],
                "steady_phase_medians_s": r.get("steady_phase_medians_s"),
                "steady_task_metrics": r.get("steady_task_metrics"),
            }, indent=1), flush=True)
            for b in stats:
                if b.get("phase_s"):
                    print(json.dumps({"batch": b.get("batch_id"),
                                      "fetched": b.get("fetched"),
                                      "wall_s": b.get("wall_s"),
                                      "phase_s": b["phase_s"]}), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
