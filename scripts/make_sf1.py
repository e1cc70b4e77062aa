#!/usr/bin/env python
"""Derive a bench-only sf1 dataset (10× sf0.1) for scale-headroom evidence.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only). For the
round-3 verdict's headroom ask ("run the headline suite at sf1 once and
commit per-query timings next to sf0.1") we derive sf1 = 10 key-shifted
replicas of sf0.1, preserving every intra-replica join relationship
(orders↔lineitem↔customer↔supplier keys are offset together) — TIMING data
only, never used for correctness oracles.

Two derivations keep the workload shape LINEAR in the replica count instead
of quadratic, matching what a real 10× corpus looks like:

- documents: each replica's text gets a one-token replica suffix — word
  shingles inside a replica are untouched (within-replica dup structure
  preserved) while cross-replica texts stop being byte-identical (10
  identical copies of every doc would grow every LSH bucket 10× and the
  candidate-pair count ~100×, a shape no real corpus has).
- embeddings: each replica's vector is cyclically rotated by its replica id
  — within-replica cosine structure is exactly preserved (rotation is an
  isometry applied to both sides of every within-replica pair), across
  replicas vectors decorrelate.

Usage: python scripts/make_sf1.py [out_dir]   (default /dev/shm/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# key columns to shift per table: {table: {col: stride}} — stride > max key
# in sf0.1 so replicas never collide; FK pairs share strides so joins stay
# within a replica.
K = {
    "region": {"r_regionkey": 100},
    "nation": {"n_nationkey": 100, "n_regionkey": 100},
    "customer": {"c_custkey": 10_000_000, "c_nationkey": 100},
    "supplier": {"s_suppkey": 10_000_000, "s_nationkey": 100},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 10_000_000,
                 "l_suppkey": 10_000_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


def replicate(spark, name: str, out: str) -> None:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))
    r = df.crossJoin(F.broadcast(reps))
    for col, stride in K.get(name, {}).items():
        r = r.withColumn(col, (F.col(col) + F.col("_rep") * stride)
                         .cast(dict(df.dtypes)[col]))
    if name == "documents":
        r = r.withColumn(
            "text", F.concat_ws(" ", F.col("text"),
                                F.concat(F.lit("zrep"),
                                         F.col("_rep").cast("string"))))
    if name == "embeddings":
        # cyclic rotation by _rep: slice(v, rep+1, n-rep) ++ slice(v, 1, rep)
        n = F.size("embedding")
        r = r.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.concat(F.slice("embedding", F.col("_rep") + 1,
                                 n - F.col("_rep")),
                         F.slice("embedding", 1, F.col("_rep")))))
    (r.drop("_rep").repartition(32)
     .write.mode("overwrite").parquet(f"{out}/{name}.parquet"))
    print(f"  {name}: {df.count()} -> x{REPLICAS}", flush=True)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1"
    from pttcrawler_spark.session import get_spark
    spark = get_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="make_sf1")
    from pttcrawler_spark import suite
    for name in suite.TABLES:
        replicate(spark, name, out)
    spark.stop()
    print(f"sf1 written to {out}")


if __name__ == "__main__":
    main()
