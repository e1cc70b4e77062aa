"""Distributed connected components — the O(log n)-round scale path.

Alternating large-star / small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) over a DataFrame edge list:

- ``large-star``: per node u over its SYMMETRIC neighbourhood,
  m(u) = min(Γ(u) ∪ {u}); every strictly larger neighbour v > u is re-wired
  to (v, m(u)) — long chains collapse toward small ids.
- ``small-star``: edges oriented large→small; per node u over its smaller
  neighbourhood N(u), m(u) = min(N(u) ∪ {u}); emit (v, m(u)) for
  v ∈ N(u) ∪ {u} — partial stars re-root at their minimum.

Each round is a groupBy(min) + equi-join per star — pure shuffles on the
node key, no driver-side data, no cartesian anywhere — and converges in
O(log n) rounds on any graph (vs O(diameter) for naive min-label
propagation, which a 10^10-edge path graph would make unbounded). Lineage is
truncated per round with an eager ``localCheckpoint`` so round k+1 plans
against a compact cached leaf (the same O(1)-plan-depth device the crawl
loop uses). Convergence is detected by an aggregate edge checksum
(count + sum of xxhash64(u,v)) — one tiny job per round, never a collect of
the edge set itself.

Used by ``suite.dedup_cluster_cc`` (near-dup clustering over the MinHash-LSH
pair graph); cross-checked there against a DuckDB WITH RECURSIVE transitive
closure, and here (tests/test_cc.py) against a pure-Python union-find on
seeded random graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean(edges: DataFrame) -> DataFrame:
    return edges.where(F.col("u") != F.col("v")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every symmetric pair (u, v) with v > u."""
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (adj.groupBy("u").agg(F.min("v").alias("mn"))
         .select("u", F.least("u", "mn").alias("m")))
    return _clean(adj.join(m, "u")
                  .where(F.col("v") > F.col("u"))
                  .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient large→small; (v, m(u)) for v ∈ N(u) ∪ {u}."""
    o = _clean(edges.select(F.greatest("u", "v").alias("u"),
                            F.least("u", "v").alias("v")))
    m = (o.groupBy("u").agg(F.min("v").alias("mn"))
         .select("u", F.least("u", "mn").alias("m")))
    j = o.join(m, "u")
    re_wired = j.select(F.col("v").alias("u"), F.col("m").alias("v"))
    anchors = m.select("u", F.col("m").alias("v"))
    return _clean(re_wired.unionByName(anchors))


def _checksum(edges: DataFrame) -> tuple:
    # bit_xor over per-edge hashes: order-insensitive and overflow-free
    # (ANSI mode would fault an integer SUM of 64-bit hashes)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h")
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """Edge list → (node, component) map; component = min node id in the
    component. ``edges`` may be directed/duplicated/self-looped — it is
    cleaned first. Isolated nodes (absent from the edge list) are absent
    from the result; union them in as singleton components if needed."""
    raw = edges.select(F.col(src).cast("long").alias("u"),
                       F.col(dst).cast("long").alias("v"))
    # nodes come from the RAW list: a node whose only edge is a self-loop
    # still exists (as its own singleton component)
    nodes = (raw.select("u")
             .unionByName(raw.select(F.col("v").alias("u")))
             .distinct().localCheckpoint())
    e = _clean(raw)
    e = e.localCheckpoint()
    prev = _checksum(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # converged: stars — every surviving edge points a node at its root
    root = e.groupBy("u").agg(F.min("v").alias("component"))
    return (nodes.join(root, "u", "left")
            .select(F.col("u").alias("node"),
                    F.least(F.coalesce("component", F.col("u")), F.col("u"))
                    .alias("component")))
