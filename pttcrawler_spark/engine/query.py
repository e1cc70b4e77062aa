"""The TW-vs-foreign-IP report — reference `query.py:78-118` as one plan.

Semantics preserved exactly:
- Article side: article ⋈ latest-history (A5: the SQLite bare-column
  GROUP BY Article.id after ORDER BY ArticleHistory.id resolves to one
  history per article → row_number over desc(history_id)) ⋈ board (filter)
  ⋈ ip_asn — an INNER join: articles whose post_ip has no ip_asn row are
  silently dropped from the tally (query.py:87-93).
- Push side: pushes of those history ids (IN-list → left_semi) ⋈ ip_asn
  inner on push_ip (query.py:107-109).
- TW_IP = CASE country_code WHEN 'TW' THEN True ELSE False (query.py:83-85);
  NULL country codes therefore count as NOT-TW.
- THE DATE RANGE IS NEVER APPLIED — the reference takes --date-range
  (required) but only echoes it into the output rows (query.py:100, 116).
  Reproduced as-is; ``apply_date_filter=True`` opts into the fixed variant.
- Zero counts render as the string '0' via `count or '0'`
  (query.py:99, 115); counts are emitted as strings to match.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEADER = ["Type", "Board", "Start date", "End date", "TW Ip", "Not TW Ip"]


def tw_ip_report(t: dict[str, DataFrame], board_name: str,
                 start_date: datetime | None = None,
                 end_date: datetime | None = None,
                 apply_date_filter: bool = False) -> DataFrame:
    hist = t["article_history"]
    w = Window.partitionBy("article_id").orderBy(F.col("id").desc())
    latest = (hist.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1)
              .select(F.col("id").alias("history_id"), "article_id"))

    board = t["board"].where(F.col("name") == board_name) \
        .select(F.col("id").alias("board_id"))
    asn = t["ip_asn"].select("ip", "asn_country_code")
    tw = F.when(F.col("asn_country_code") == "TW", 1).otherwise(0)

    art = (
        t["article"]
        .join(F.broadcast(board), "board_id")
        .join(latest, t["article"].id == latest.article_id)
        .join(asn, F.col("post_ip") == F.col("ip"))  # INNER: no-asn rows drop
    )
    if apply_date_filter and (start_date or end_date):
        if start_date:
            art = art.where(F.col("post_datetime") >= F.lit(start_date))
        if end_date:
            art = art.where(F.col("post_datetime") <= F.lit(end_date))

    push = (
        t["push"]
        .join(art.select("history_id"),
              t["push"].article_history_id == F.col("history_id"), "left_semi")
        .join(asn, F.col("push_ip") == F.col("ip"))
    )

    sd = str(start_date) if start_date else ""
    ed = str(end_date) if end_date else ""

    def tally(df: DataFrame, typ: str) -> DataFrame:
        return df.agg(
            F.coalesce(F.sum(tw), F.lit(0)).alias("_tw"),
            F.coalesce(F.sum(1 - tw), F.lit(0)).alias("_not"),
        ).select(
            F.lit(typ).alias(HEADER[0]),
            F.lit(board_name).alias(HEADER[1]),
            F.lit(sd).alias(HEADER[2]),
            F.lit(ed).alias(HEADER[3]),
            F.col("_tw").cast("string").alias(HEADER[4]),   # 0 → '0' quirk
            F.col("_not").cast("string").alias(HEADER[5]),
        )

    return tally(art, "Article").unionByName(tally(push, "Push"))


def write_report_csv(report: DataFrame, output_folder: str,
                     export_date: datetime | None = None) -> str:
    """query.py:137-146 csv sink: Ptt_query_{YYYY-MM-DD}.csv with the
    6-column header row. Single small result → coalesce(1) is fine."""
    stamp = (export_date or datetime.now()).strftime("%Y-%m-%d")
    path = f"{output_folder}/Ptt_query_{stamp}_csv"
    report.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return path


def write_report_ods(report: DataFrame, output_folder: str,
                     export_date: datetime | None = None) -> str:
    """query.py:129-135 ods sink: one sheet named 'Query' (header row first,
    like _get_export_rows' data[0]) in Ptt_query_{YYYY-MM-DD}.ods."""
    from pathlib import Path

    from .ods import write_ods

    stamp = (export_date or datetime.now()).strftime("%Y-%m-%d")
    Path(output_folder).mkdir(parents=True, exist_ok=True)
    path = f"{output_folder}/Ptt_query_{stamp}.ods"

    def _rows():
        yield report.columns
        for row in report.toLocalIterator():
            yield [row[c] for c in report.columns]

    write_ods(path, {"Query": _rows()})
    return path
