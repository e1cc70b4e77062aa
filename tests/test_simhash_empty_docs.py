"""Round-3 ADVICE guard: text_simhash must emit a fingerprint row for EVERY
document, including NULL / empty / whitespace-only text.

The round-3 rewrite (explode + 64 grouped bit sums) originally used plain
explode(), which emits no rows for an empty/NULL token array — the doc
silently vanished while the DuckDB oracle kept an all-zeros row for it.
sf0.01 has no such docs (min trimmed length 48), so the driver gate can't
catch a regression here; this test builds a corpus that can.

Semantics pinned (both engines agree by construction):
* NULL text       -> NULL token array -> every bit sum NULL -> all-zeros row
* ''  and '   '   -> trim+split yields [''] -> fingerprint of md5('') —
  a real (shared) fingerprint, NOT all-zeros, identical in Spark and DuckDB
"""

from __future__ import annotations

import duckdb

from pttcrawler_spark import suite


def test_simhash_keeps_empty_and_null_docs(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {r["doc_id"]: r["simhash"]
           for r in suite.text_simhash(spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3, 4, 5}, "every doc must keep a row"
    assert got[2] == "0" * 64, "NULL text -> all-zeros fingerprint"
    assert got[3] == got[4] != "0" * 64, (
        "empty/whitespace text -> the shared md5('') fingerprint")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'")
    exp = {d: s for d, s in con.execute(suite.ORACLE_SQL["text_simhash"]).fetchall()}
    assert got == exp, "Spark fingerprints must match the DuckDB oracle bit-for-bit"
