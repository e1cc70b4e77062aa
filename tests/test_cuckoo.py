"""Cuckoo filter: membership, deletion, and no-false-negative guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from pttcrawler_spark.operators.cuckoo import CuckooState


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))


def test_membership_and_fp(spark):
    n = 3000
    cf = CuckooState(partitions=4, buckets_per_partition=1 << 11)
    cf.rebuild(_hashes(spark, 0, n))
    maybe, new = cf.split(_hashes(spark, 0, n))
    assert new.count() == 0                     # no false negatives
    maybe2, _ = cf.split(_hashes(spark, n, 2 * n))
    assert maybe2.count() / n < 0.01            # 16-bit fp ⇒ ~2^-13/bucket-pair


def test_delete_then_lookup(spark):
    cf = CuckooState(partitions=2, buckets_per_partition=1 << 10)
    cf.rebuild(_hashes(spark, 0, 500))
    cf.remove(_hashes(spark, 0, 250))
    maybe_kept, new_kept = cf.split(_hashes(spark, 250, 500))
    assert new_kept.count() == 0                # survivors still present
    maybe_gone, new_gone = cf.split(_hashes(spark, 0, 250))
    # deleted keys should mostly be gone (fp collisions may retain a few)
    assert new_gone.count() > 240
    stats = cf.blobs.agg(F.sum("n_items"), F.sum("n_deleted")).collect()[0]
    assert stats[1] >= 240 and stats[0] <= 260
