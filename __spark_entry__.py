"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship TW-IP-style report (SURVEY.md §3.3, query.py:78-118
analog) on /root/testdata/sf0.001.
queries()/oracle_sql(): the full operator battery — see
pttcrawler_spark/suite.py for per-query SURVEY §2 citations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pttcrawler_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.flagship_tw_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLE_SQL)
