"""Export sheets (S9/S10): the reference's `export.py` as declarative plans.

The reference builds three sheets with N+1 per-row ORM lookups
(export.py:44-125: per-article ip_asn `.first()`, per-push lookup, per-user
lookup) and writes csv/json/ods (export.py:260-296). Here each sheet is ONE
DataFrame: dims and ip_asn broadcast-left-joined, latest-history/order
semantics as windows, '' coalescing and date formats exactly as the
reference emits them (str(datetime) and '%m/%d %H:%M:%S', export.py:101).

Column quirks preserved:
- the article sheet's misspelled headers ('Atricle.*', 'Atricle.cotent' —
  export.py:46-50) — byte-faithful headers matter for drop-in users;
- the push sheet's ASN column order differs from the article sheet's
  (asn, cidr, country, date, description, registry — export.py:90-95);
- users without a last_record export as all-'' rows (export.py:119-124).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ARTICLE_HEADER = [
    "Atricle.web_id", "Article.board", "Atricle.author", "Atricle.title",
    "Atricle.cotent", "Atricle.post_ip", "Atricle.post_ip.asn",
    "Atricle.post_ip.asn_date", "Atricle.post_ip.asn_registry",
    "Atricle.post_ip.asn_cidr", "Atricle.post_ip.asn_country_code",
    "Atricle.post_ip.asn_description", "Article.post_datetime",
    "Article.last_modified_time",
]
PUSH_HEADER = [
    "Push.article_web_id", "Push.username", "Push.tag", "Push.content",
    "Push.ip", "Push.ip.asn", "Push.ip.asn_cidr", "Push.ip.asn_country_code",
    "Push.ip.asn_date", "Push.ip.asn_description", "Push.ip.asn_registry",
    "Push.datatime",
]
USER_HEADER = [
    "User.username", "User.login_times", "User.valid_article_count",
    "User.last_login_datetime", "User.last_login_ip",
    "User.last_login_ip.asn", "User.last_login_ip.asn_date",
    "User.last_login_ip.asn_registry", "User.last_login_ip.asn_cidr",
    "User.last_login_ip.asn_country_code", "User.last_login_ip.asn_description",
]


def _s(col) -> F.Column:
    """`x or ''` / str(x or '') — the reference's universal cell coercion."""
    return F.coalesce(F.col(col).cast("string"), F.lit(""))


def _sz(col) -> F.Column:
    """`x or ''` for NUMERIC cells: the reference's `or` treats 0 as falsy
    (export.py: `user.login_times or ''`), so 0 renders as '' too."""
    c = F.col(col)
    return F.when(c.isNull() | (c == 0), F.lit("")).otherwise(c.cast("string"))


def _ts(col) -> F.Column:
    # str(datetime) → 'YYYY-MM-DD HH:MM:SS'; None → ''
    return F.coalesce(F.date_format(col, "yyyy-MM-dd HH:mm:ss"), F.lit(""))


def _latest_history(article_history: DataFrame) -> DataFrame:
    """history[0] = newest by start_at desc (models/article.py:54-55; W1)."""
    w = Window.partitionBy("article_id").orderBy(
        F.col("start_at").desc(), F.col("id").desc())
    return (article_history.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def article_sheet(t: dict[str, DataFrame]) -> DataFrame:
    """export.py:59-81 — ordered by post_datetime (W8), encounter-order ties."""
    art = t["article"]
    hist = _latest_history(t["article_history"])
    asn = t["ip_asn"]
    found = F.col("ip").isNotNull()
    df = (
        art.join(F.broadcast(t["board"].select(F.col("id").alias("board_id"),
                                               F.col("name").alias("_board"))),
                 "board_id", "left")
        .join(F.broadcast(t["user"].select(F.col("id").alias("user_id"),
                                           F.col("username").alias("_author"))),
              "user_id", "left")
        .join(hist.select(F.col("article_id"), "title", "content", "end_at"),
              F.col("id") == F.col("article_id"), "left")
        .join(F.broadcast(asn), F.col("post_ip") == asn.ip, "left")
    )
    out = df.select(
        F.col("web_id").alias(ARTICLE_HEADER[0]),
        F.coalesce("_board", F.lit("")).alias(ARTICLE_HEADER[1]),
        F.coalesce("_author", F.lit("")).alias(ARTICLE_HEADER[2]),
        F.coalesce("title", F.lit("")).alias(ARTICLE_HEADER[3]),
        F.coalesce("content", F.lit("")).alias(ARTICLE_HEADER[4]),
        # found → ip_asn.ip; miss → article.post_ip (export.py:72-76)
        F.when(found, _s("ip")).otherwise(F.coalesce("post_ip", F.lit("")))
        .alias(ARTICLE_HEADER[5]),
        F.when(found, _s("asn")).otherwise(F.lit("")).alias(ARTICLE_HEADER[6]),
        F.when(found, _ts("asn_date")).otherwise(F.lit("")).alias(ARTICLE_HEADER[7]),
        F.when(found, _s("asn_registry")).otherwise(F.lit("")).alias(ARTICLE_HEADER[8]),
        F.when(found, _s("asn_cidr")).otherwise(F.lit("")).alias(ARTICLE_HEADER[9]),
        F.when(found, _s("asn_country_code")).otherwise(F.lit("")).alias(ARTICLE_HEADER[10]),
        F.when(found, _s("asn_description")).otherwise(F.lit("")).alias(ARTICLE_HEADER[11]),
        _ts("post_datetime").alias(ARTICLE_HEADER[12]),
        _ts("end_at").alias(ARTICLE_HEADER[13]),
        F.col("post_datetime").alias("_ord1"), F.col("id").alias("_ord2"),
    )
    return out.orderBy(F.col("_ord1").asc_nulls_first(), F.col("_ord2").asc()) \
        .drop("_ord1", "_ord2")


def push_sheet(t: dict[str, DataFrame]) -> DataFrame:
    """export.py:83-105 — pushes of each article's latest history, article
    export order then floor."""
    hist = _latest_history(t["article_history"]).select(
        F.col("id").alias("article_history_id"), "article_id")
    art = t["article"].select(F.col("id").alias("article_id"), "web_id",
                              "post_datetime")
    asn = t["ip_asn"]
    found = F.col("ip").isNotNull()
    df = (
        t["push"].join(hist, "article_history_id")
        .join(art, "article_id")
        .join(F.broadcast(t["user"].select(F.col("id").alias("push_user_id"),
                                           F.col("username").alias("_pushuser"))),
              "push_user_id", "left")
        .join(F.broadcast(asn), F.col("push_ip") == asn.ip, "left")
    )
    out = df.select(
        F.col("web_id").alias(PUSH_HEADER[0]),
        F.coalesce("_pushuser", F.lit("")).alias(PUSH_HEADER[1]),
        F.coalesce("push_tag", F.lit("")).alias(PUSH_HEADER[2]),
        F.coalesce("push_content", F.lit("")).alias(PUSH_HEADER[3]),
        F.when(found, _s("ip")).otherwise(F.coalesce("push_ip", F.lit("")))
        .alias(PUSH_HEADER[4]),
        F.when(found, _s("asn")).otherwise(F.lit("")).alias(PUSH_HEADER[5]),
        F.when(found, _s("asn_cidr")).otherwise(F.lit("")).alias(PUSH_HEADER[6]),
        F.when(found, _s("asn_country_code")).otherwise(F.lit("")).alias(PUSH_HEADER[7]),
        F.when(found, _ts("asn_date")).otherwise(F.lit("")).alias(PUSH_HEADER[8]),
        F.when(found, _s("asn_description")).otherwise(F.lit("")).alias(PUSH_HEADER[9]),
        F.when(found, _s("asn_registry")).otherwise(F.lit("")).alias(PUSH_HEADER[10]),
        # '%m/%d %H:%M:%S' (export.py:101); None → ''
        F.coalesce(F.date_format("push_datetime", "MM/dd HH:mm:ss"), F.lit(""))
        .alias(PUSH_HEADER[11]),
        F.col("post_datetime").alias("_ord1"), F.col("article_id").alias("_ord2"),
        F.col("floor").alias("_ord3"),
    )
    return out.orderBy(F.col("_ord1").asc_nulls_first(), "_ord2", "_ord3") \
        .drop("_ord1", "_ord2", "_ord3")


def user_sheet(t: dict[str, DataFrame]) -> DataFrame:
    """export.py:107-124 — users in id order; no last_record → all-'' row."""
    users = t["user"]
    rec = t.get("user_last_record")
    if rec is not None:
        w = Window.partitionBy("user_id").orderBy(F.col("created_at").desc())
        latest = (rec.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1)
                  .select("user_id", "last_login_datetime", "last_login_ip"))
        asn = t["ip_asn"]
        df = (users.join(latest, users.id == latest.user_id, "left")
              .join(F.broadcast(asn), F.col("last_login_ip") == asn.ip, "left"))
        has = F.col("last_login_datetime").isNotNull()
        out = df.select(
            F.when(has, _s("username")).otherwise(F.lit("")).alias(USER_HEADER[0]),
            F.when(has, _sz("login_times")).otherwise(F.lit("")).alias(USER_HEADER[1]),
            F.when(has, _sz("valid_article_count")).otherwise(F.lit("")).alias(USER_HEADER[2]),
            F.when(has, _ts("last_login_datetime")).otherwise(F.lit("")).alias(USER_HEADER[3]),
            F.when(has, _s("last_login_ip")).otherwise(F.lit("")).alias(USER_HEADER[4]),
            F.when(has, _s("asn")).otherwise(F.lit("")).alias(USER_HEADER[5]),
            F.when(has, _ts("asn_date")).otherwise(F.lit("")).alias(USER_HEADER[6]),
            F.when(has, _s("asn_registry")).otherwise(F.lit("")).alias(USER_HEADER[7]),
            F.when(has, _s("asn_cidr")).otherwise(F.lit("")).alias(USER_HEADER[8]),
            F.when(has, _s("asn_country_code")).otherwise(F.lit("")).alias(USER_HEADER[9]),
            F.when(has, _s("asn_description")).otherwise(F.lit("")).alias(USER_HEADER[10]),
            F.col("id").alias("_ord"),
        )
    else:
        out = users.select(
            *[F.lit("").alias(h) for h in USER_HEADER],
            F.col("id").alias("_ord"))
    return out.orderBy("_ord").drop("_ord")


def export_sheets(t: dict[str, DataFrame], out_dir: str, fmt: str = "csv") -> dict[str, str]:
    """Write the three sheets (S10 csv / S11 ods / S9 json).
    Returns sheet → path (ods: one shared file, like the reference's single
    Ptt_report .ods holding all sheets — export.py:287-296)."""
    sheets = {"Article": article_sheet(t), "Push": push_sheet(t),
              "User": user_sheet(t)}
    paths = {}
    if fmt == "ods":
        from .ods import write_ods
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        path = str(Path(out_dir) / "Ptt_report.ods")
        # header row first, then rows streamed through the driver one
        # partition at a time (toLocalIterator) — the sheet plans above stay
        # distributed; only the single-file serialization is sequential,
        # which is inherent to the one-file report artifact
        def _rows(df):
            yield df.columns
            for row in df.toLocalIterator():
                yield [row[c] for c in df.columns]

        write_ods(path, {name: _rows(df) for name, df in sheets.items()})
        return {name: path for name in sheets}
    for name, df in sheets.items():
        path = str(Path(out_dir) / f"{name.lower()}_{fmt}")
        # single ordered output file per sheet, like the reference's one
        # .csv/.json per sheet (export.py:272-296); at scale drop the
        # coalesce and let readers take the directory
        w = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(path)
        elif fmt == "json":
            w.json(path)
        else:
            raise ValueError(f"unsupported fmt {fmt!r}")
        paths[name] = path
    return paths
