"""Scale-safe deterministic global sequence numbers.

The reference assigns SQLite autoincrement ids in encounter order
(models/base.py, crawler/article.py:159-167). The naive distributed analog —
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY — funnels every row
through one task: correct, but a scale-killer at 10^10 rows.

``with_global_seq`` produces the identical numbering without a
single-partition sort (the zipWithIndex pattern, expressed declaratively):

1. range-repartition on the order key → partition p holds the p-th key range;
2. rank within each partition (parallel window, partitioned by
   ``spark_partition_id()``);
3. per-partition counts (one row per partition) get a prefix-sum offset via a
   window over ≤ num_partitions rows, broadcast-joined back.

Range boundaries come from sampling, and Spark does NOT reliably reuse the
range Exchange between the counts subtree and the ranked subtree (verified:
two independent rangepartitioning exchanges in the executed plan) — two
executions could sample different boundaries, desynchronizing offsets from
ranks. The ranked frame is therefore persisted (MEMORY_AND_DISK): one
materialization, both subtrees read the same pids. Call it on a NARROW
projection (keys + order cols) and join the seq back — the cache then costs
O(rows × few columns), not the full payload width.

The only single-partition exchange left is the offsets prefix-sum window,
which runs over ≤ num_partitions rows (1000 executors → 1000 rows) — bounded
by cluster size, not data size. tests/test_plan_quality.py asserts no OTHER
single-partition exchange exists on the data path.

Requires ``order_cols`` to be a total order (unique key) — with duplicate
keys the rank of tied rows at a partition boundary is arbitrary.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_seq(df: DataFrame, order_cols, out_col: str,
                    num_partitions: int | None = None,
                    barrier: bool = True) -> DataFrame:
    """Add ``out_col`` = 1..N in the total order of ``order_cols`` (strings
    or Column sort expressions, e.g. ``F.col("priority").desc()``).

    ``barrier=True`` (default) caps the result with a lazy localCheckpoint:
    the join below references ``ranked`` TWICE, so composing seqs without a
    barrier doubles the logical plan per level — observed as exponential
    Catalyst re-planning time and an OOM in explainString once store +
    user-enrich stacked four seqs. The barrier makes consumers see one
    compact leaf. (On a cluster with executor loss concerns, swap for a
    reliable ``checkpoint()`` against the checkpoint dir.) Set
    ``barrier=False`` only to inspect the full physical plan."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]

    ranked = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(
            Window.partitionBy("_pid").orderBy(*cols)).cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one row per partition; the prefix-sum window runs over ≤ n rows
    offsets = (
        ranked.groupBy("_pid").agg(F.count("*").alias("_cnt"))
        .withColumn("_off", F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).cast("long"))
        .select("_pid", "_off")
    )
    out = (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_off")
    )
    return out.localCheckpoint(eager=False) if barrier else out
