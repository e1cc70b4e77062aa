"""Plan-quality report generator: dumps the physical plans of the headline
suite queries to PLANS.md so plan regressions are reviewable in diffs
(pushdown/pruning/broadcast evidence next to each query).

Run: ``python -m pttcrawler_spark.plans.report [sf_dir]``.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

HEADLINE_FOR_PLANS = [
    "flagship_tw_report", "j3_four_way", "p4_date_cutoff", "p6_in_list_semi",
    "j2_left_anti", "a3_push_tally", "w1_latest_version",
    "dedup_minhash_lsh", "ann_ivf_label", "stream_sessionize",
]

_CHECKS = [
    ("PushedFilters: [^\\]]*[A-Za-z]", "filter pushdown reaches the scan"),
    ("BroadcastHashJoin", "dim joins broadcast"),
    ("ReadSchema", "column pruning visible"),
]


def plan_of(spark, name: str, sf_dir: str) -> str:
    from pttcrawler_spark import suite
    df = suite.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def generate(spark, sf_dir: str = "/root/testdata/sf0.001",
             out_path: str = "PLANS.md") -> str:
    parts = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated against `{sf_dir}` (plan shape, not timings — see",
        "`tests/test_plan_quality.py` for the enforced assertions and",
        "`BENCH_SCALING.json` for measured throughput).",
        "",
    ]
    for name in HEADLINE_FOR_PLANS:
        plan = plan_of(spark, name, sf_dir)
        evid = [desc for pat, desc in _CHECKS if re.search(pat, plan)]
        parts.append(f"## {name}")
        if evid:
            parts.append("Evidence: " + "; ".join(evid) + ".")
        parts.append("```\n" + plan.strip() + "\n```")
        parts.append("")
    text = "\n".join(parts)
    with open(out_path, "w") as fh:
        fh.write(text)
    return out_path


if __name__ == "__main__":
    from pttcrawler_spark.session import get_spark
    generate(get_spark(4, shuffle_partitions=4),
             sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
