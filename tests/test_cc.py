"""operators/cc.py (large-star/small-star connected components) vs a pure
Python union-find oracle on seeded random graphs — including shapes that
punish naive propagation (long paths) and the algorithm's edge cases
(self-loops, duplicate/directed edges, singletons-in-edge-list)."""

from __future__ import annotations

import random

import pytest

from pttcrawler_spark.operators.cc import connected_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node in component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _check(spark, edges):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    exp = _union_find(edges, nodes)
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    assert got == exp


def test_random_graphs(spark):
    rng = random.Random(1234)
    for n, m in ((30, 15), (60, 80), (120, 60)):
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        _check(spark, edges)


def test_long_path(spark):
    # a 64-node path: diameter 63 — naive propagation needs 63 rounds,
    # star-contraction must converge in O(log n)
    edges = [(i, i + 1) for i in range(63)]
    _check(spark, edges)


def test_two_chains_and_ring(spark):
    edges = ([(i, i + 1) for i in range(0, 9)]            # chain 0-9
             + [(i, i + 1) for i in range(20, 29)]        # chain 20-29
             + [(i, (i + 1 - 40) % 12 + 40) for i in range(40, 52)])  # ring
    _check(spark, edges)


def test_dirty_input(spark):
    # self-loops, duplicates, both directions — must not crash or mislabel
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (3, 3), (7, 8)]
    _check(spark, edges)


def test_star_already(spark):
    edges = [(0, i) for i in range(1, 10)]
    _check(spark, edges)
