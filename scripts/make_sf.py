"""Deterministically scale the driver's sf0.1 parquet tables by an integer
factor — the input for BENCH_SF1.json's 10x headroom measurement (round-3
verdict #6: show every headline query's sf1/sf0.1 time ratio stays ~linear).

Design constraints (why this is not a naive UNION-of-copies):

* Keys are REPLICA-OFFSET (+ r * 10_000_000, far above any sf0.1 key) so
  joins keep TPC-H-ish fan-outs: each replica is a self-contained universe
  referencing the shared region/nation dims, exactly like growing the
  customer/order population 10x. NATION_19's share (the flagship report's
  skew) is preserved by construction.
* Document TEXT gets every word suffixed with the replica number (replica 0
  keeps the original bytes). Replicas must NOT be near-duplicates of each
  other: 10 verbatim copies of each doc would grow every MinHash-LSH bucket
  10x and the candidate-pair count 100x — a quadratic explosion that says
  nothing about the engine's 10x-data behavior. Word-suffixing keeps each
  replica's INTERNAL near-dup structure identical to the original (pairs
  scale exactly 10x) while making cross-replica Jaccard ~0.
* Embeddings get a tiny per-replica shift on every component (+r * 1e-3) so
  ANN neighbor structure is replicated, not degenerate (2000 identical
  copies of each vector would make top-k ties meaningless).
* Everything is a pure function of (sf0.1 bytes, factor) — no RNG, no time.

Usage: python scripts/make_sf.py OUT_DIR [--factor 10] [--src /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import os

import duckdb

K = 10_000_000  # replica key offset; sf0.1 keys top out around 6e5


def scale(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')")
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({factor})) AS r")

    word_sfx = (r"CASE WHEN r = 0 THEN text "
                r"ELSE regexp_replace(text, '(\S+)', '\1_' || r, 'g') END")
    jobs = {
        # shared dims: the 25-nation / 5-region universe is the schema, not
        # the data volume — every replica references the same dims
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""SELECT c_custkey + r*{K} AS c_custkey, c_name,
                        c_nationkey, c_acctbal, c_mktsegment
                        FROM customer, reps""",
        "supplier": f"""SELECT s_suppkey + r*{K} AS s_suppkey, s_name,
                        s_nationkey, s_acctbal FROM supplier, reps""",
        "part": f"""SELECT p_partkey + r*{K} AS p_partkey, p_name, p_brand,
                    p_type, p_size, p_retailprice FROM part, reps""",
        "orders": f"""SELECT o_orderkey + r*{K} AS o_orderkey,
                      o_custkey + r*{K} AS o_custkey, o_orderstatus,
                      o_totalprice, o_orderdate, o_orderpriority
                      FROM orders, reps""",
        "lineitem": f"""SELECT l_orderkey + r*{K} AS l_orderkey,
                        l_partkey + r*{K} AS l_partkey,
                        l_suppkey + r*{K} AS l_suppkey, l_linenumber,
                        l_quantity, l_extendedprice, l_discount, l_tax,
                        l_returnflag, l_linestatus, l_shipdate
                        FROM lineitem, reps""",
        "events": f"""SELECT event_id + r*{K} AS event_id, ts,
                      user_id + r*{K} AS user_id, event_type, value, props
                      FROM events, reps""",
        "documents": f"""SELECT doc_id + r*{K} AS doc_id,
                         {word_sfx} AS text, lang, source,
                         length({word_sfx}) AS n_chars
                         FROM documents, reps""",
        "embeddings": f"""SELECT vec_id + r*{K} AS vec_id,
                          list_transform(embedding,
                              x -> CAST(x + r * 0.001 AS FLOAT)) AS embedding,
                          label FROM embeddings, reps""",
    }
    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET, "
                    f"COMPRESSION SNAPPY, ROW_GROUP_SIZE 122880)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    scale(args.src, args.out, args.factor)
