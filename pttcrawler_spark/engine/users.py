"""User-record enrichment — the `python -m crawler user` analog (S4/F9/W2/W6).

The reference screen-scrapes term.ptt.cc per user over a queue ordered
(login_times asc, id asc) (crawler/user.py:157-158, W6), regex-parses the
buffer (:255-263, F9), then upserts the user's counters and appends a
user_last_record row (:171-204). Here:

- the fetch queue is the same W6 ordering as a window rank;
- the scrape is pure Column regexp work over a (username, buffer) DataFrame
  — the buffer source is pluggable (tests inject synth.users buffers via a
  mapInPandas stage, a real deployment would put its terminal driver there);
- the upsert is a MERGE-shaped join update (no row-at-a-time ORM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.seq import with_global_seq

# crawler/user.py:255 — kept verbatim (Java and Python agree on these
# classes for this ASCII-digit + CJK text)
RE_BUFFER = (r"[\w\W]*《登入次數》(\d*)\D*次\D*《有效文章》\D*(\d*)[\w\W]*"
             r"《上次上站》\D*([\d]{1,2}\/[\d]{1,2}\/[\d]{4}\W*[\d]{1,2}:"
             r"\W*[\d]{1,2}:\W*[\d]{1,2}\W*\w*)\D*《上次故鄉》([\d.]*)")
RE_DT = r"([\d]{1,2}/[\d]{1,2}/[\d]{4})\s*([\d]{1,2}:[\d]{1,2}:[\d]{1,2})"


def fetch_queue(user: DataFrame) -> DataFrame:
    """W6: the crawl order of the user module (login_times asc, id asc) —
    scale-safe global rank (no single-partition window)."""
    return (with_global_seq(user, [F.col("login_times").asc(),
                                   F.col("id").asc()], "_rank")
            .withColumn("fetch_rank", F.col("_rank").cast("int"))
            .drop("_rank"))


def scrape_buffers(buffers: DataFrame) -> DataFrame:
    """(username, buffer) → parsed record rows; unparseable buffers are
    DROPPED like the reference's `if search_result:` skip
    (crawler/user.py:267-278). All-Column regexp — no Python."""
    b = F.col("buffer")
    matched = b.rlike(RE_BUFFER)
    dt_raw = F.regexp_extract(b, RE_BUFFER, 3)
    dt = F.try_to_timestamp(
        F.concat(F.regexp_extract(dt_raw, RE_DT, 1), F.lit(" "),
                 F.regexp_extract(dt_raw, RE_DT, 2)),
        F.lit("M/d/yyyy H:m:s"))  # '%m/%d/%Y %H:%M:%S %a', crawler/user.py:184
    return (
        buffers.where(matched)
        .select(
            "username",
            F.regexp_extract(b, RE_BUFFER, 1).cast("int").alias("login_times"),
            F.regexp_extract(b, RE_BUFFER, 2).cast("int").alias("valid_article_count"),
            dt.alias("last_login_datetime"),
            F.nullif(F.regexp_extract(b, RE_BUFFER, 4), F.lit("")).alias("last_login_ip"),
        )
    )


def apply_user_records(tables: dict[str, DataFrame], scraped: DataFrame,
                       base_record_ts=None) -> dict[str, DataFrame]:
    """MERGE the scraped records into the store (crawler/user.py:171-204):
    existing users get login_times/valid_article_count updated; usernames not
    yet in the user table are get_or_create'd with the next ids
    (crawler/user.py:173-178, username order for determinism); every record
    APPENDS a user_last_record row (crawler/user.py:198-204 — a second run
    adds rows, ids continuing after the existing max); non-empty ips are
    touched into ip_asn. Returns a NEW tables dict (inputs untouched)."""
    user = tables["user"]
    upd = scraped.select(
        F.col("username").alias("_un"),
        F.col("login_times").alias("_lt"),
        F.col("valid_article_count").alias("_vc"))
    updated = (
        user.join(F.broadcast(upd), user.username == F.col("_un"), "left")
        .select(
            "id", "username",
            F.coalesce("_lt", "login_times").alias("login_times"),
            F.coalesce("_vc", "valid_article_count").alias("valid_article_count"),
        )
    )
    # get_or_create: scraped usernames missing from the table become new user
    # rows with ids continuing after the current max
    max_uid = user.agg(F.coalesce(F.max("id"), F.lit(0)).alias("_max_uid"))
    new_users = (
        with_global_seq(
            scraped.join(user.select("username"), "username", "left_anti")
            .select("username", "login_times", "valid_article_count"),
            ["username"], "_seq")
        .crossJoin(F.broadcast(max_uid))
        .select((F.col("_max_uid") + F.col("_seq")).cast("int").alias("id"),
                "username", "login_times", "valid_article_count")
    )
    user2 = updated.unionByName(new_users)

    prior = tables.get("user_last_record")
    base_rid = (prior.agg(F.coalesce(F.max("id"), F.lit(0)).alias("_max_rid"))
                if prior is not None else None)
    new_records = (
        scraped.join(user2.select(F.col("username"), F.col("id").alias("user_id")),
                     "username")
        .select("user_id", "last_login_datetime", "last_login_ip")
        .withColumn("created_at",
                    F.coalesce(F.lit(base_record_ts).cast("timestamp"),
                               F.col("last_login_datetime")))
    )
    new_records = with_global_seq(new_records, ["user_id"], "_seq")
    if base_rid is not None:
        new_records = (new_records.crossJoin(F.broadcast(base_rid))
                       .withColumn("id", (F.col("_max_rid") + F.col("_seq"))
                                   .cast("int"))
                       .drop("_seq", "_max_rid"))
        last_record = prior.unionByName(
            new_records.select(*prior.columns))
    else:
        new_records = (new_records
                       .withColumn("id", F.col("_seq").cast("int"))
                       .drop("_seq"))
        last_record = new_records
    ips = (new_records.where(F.col("last_login_ip").isNotNull())
           .select(F.col("last_login_ip").alias("ip")).distinct())
    new_ips = ips.join(tables["ip_asn"].select("ip"), "ip", "left_anti")
    asn_cols = [c for c in tables["ip_asn"].columns if c != "ip"]
    ip_asn2 = tables["ip_asn"].unionByName(
        new_ips.select("ip", *[F.lit(None).cast(tables["ip_asn"].schema[c].dataType)
                               .alias(c) for c in asn_cols]))
    out = dict(tables)
    out["user"] = user2
    out["user_last_record"] = last_record
    out["ip_asn"] = ip_asn2
    return out


def synth_buffers(user: DataFrame, seed: int = 42) -> DataFrame:
    """Test/bench buffer source: deterministic synth terminal screens
    (synth/users.py) via mapInPandas — the S4 fetch stand-in."""
    import pandas as pd

    from ..synth import users as SU

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "username": pdf["username"],
                "buffer": [SU.user_buffer(u, seed) for u in pdf["username"]],
            })

    return user.select("username").mapInPandas(
        gen, schema="username string, buffer string")
