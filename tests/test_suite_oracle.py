"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf0.01 parquet, compare
row count + schema (column names) + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pttcrawler_spark import suite

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    for name in suite.TABLES:
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(4)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(suite.ORACLE_SQL.keys()))
def test_query_matches_oracle(name, spark, con):
    q = suite.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    exp = con.execute(suite.ORACLE_SQL[name]).df()

    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"

    # The driver's value-hash is representation-sensitive: DuckDB HUGEINT
    # (un-cast sum(int)) lands in pandas as float64/object while Spark's sum
    # is int64 — values "equal" but hashes differ (round-1 lesson). Guard by
    # requiring the same dtype *kind* per column (int vs float vs object);
    # width differences (int32 vs int64) are fine.
    for c in sorted(got.columns):
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        assert gk == ek, (
            f"{name}.{c}: dtype-kind {got[c].dtype} (spark) vs "
            f"{exp[c].dtype} (oracle) — un-cast HUGEINT sum? CAST AS BIGINT")

    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        if gv and isinstance(gv[0], float):
            assert all(
                (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-6
                for a, b in zip(gv, ev)), f"{name}.{c}"
        else:
            assert gv == ev, f"{name}.{c}: first diff " + str(
                next(((a, b) for a, b in zip(gv, ev) if a != b), None))


def test_all_queries_have_impl():
    q = suite.queries()
    missing = [k for k in suite.ORACLE_SQL if k not in q]
    assert not missing
