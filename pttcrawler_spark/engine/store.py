"""Relational store materialization with DETERMINISTIC surrogate ids.

The reference's ids are SQLite autoincrement in encounter order
(models/article.py:11-13, 35-37; user ids assigned on first get_or_create,
crawler/article.py:159-167, 220-231). A distributed engine cannot use
monotonically_increasing_id (task-order dependent); instead the canonical
fetch order is reconstructed AS DATA from the frontier
(board_rank, batch_id, priority desc, discovery_seq, url) and every id is a
row_number over it — so exports byte-compare with the single-threaded oracle
(SURVEY.md §7.0.2).

Scale note: every global encounter-order id here goes through
``operators.seq.with_global_seq`` — range-partitioned rank + per-partition
prefix-sum offsets (the zipWithIndex pattern) — NOT a single-partition
``row_number() OVER (ORDER BY ...)``. Same deterministic numbering, no
single-partition Exchange on the data path (tests/test_plan_quality.py
asserts this). Wide frames (history rows with content) get their seq on a
narrow key projection and join it back.

history start_at/end_at use the oracle's logical clock
(BASE_TS + fetch_seq seconds) replacing the reference's datetime.now().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.seq import with_global_seq
from ..oracle.simulator import BASE_TS
from .crawl import CrawlResult


def fetch_events(result: CrawlResult) -> DataFrame:
    """All fetched frontier rows with their global fetch_seq (oracle parity:
    boards sequentially, within board the per-host order)."""
    fetched = result.frontier().where(F.col("status") == "fetched")
    return with_global_seq(
        fetched,
        [F.col("board_rank").asc(), F.col("batch_id").asc(),
         F.col("priority").desc(), F.col("discovery_seq").asc(),
         F.col("url").asc()],
        "fetch_seq")


def logical_ts_col(seq: F.Column) -> F.Column:
    return F.lit(BASE_TS).cast("timestamp") + F.make_interval(secs=seq.cast("double"))


def build_relational(result: CrawlResult,
                     version_rotate: int = 30) -> dict[str, DataFrame]:
    """Crawl outputs → the reference's seven tables, ids in encounter order.

    SCD-2 versions: under --upgrade recrawl (mark_for_recrawl) the same
    web_id appears once per fetch in parsed_articles; version order is the
    output batch (order as DATA via the batch partition column). The newest
    ``version_rotate`` versions are kept (crawler/article.py:256-259,
    VersionRotate=30); dropped histories cascade their pushes
    (db_migration 6794412e2720 ON DELETE CASCADE). Closed versions get
    end_at = next version's start_at (crawler/article.py:196-207).
    Exact reference id parity holds for add-mode crawls; after recrawls ids
    remain deterministic but reflect the refetch order (the frontier keeps
    the last fetch's batch)."""
    ev = fetch_events(result).select("url", "kind", "board", "board_rank", "fetch_seq")
    parsed = result.table("parsed_articles", with_batch=True)
    pushes_raw = result.table("parsed_pushes", with_batch=True)
    aidx = result.table("article_index")

    # board: get_or_create at crawl start, seed order (crawler/article.py:417)
    board = (
        ev.groupBy("board").agg(F.min("board_rank").alias("r"))
        .withColumn("id", F.row_number().over(Window.orderBy("r")).cast("int"))
        .select("id", F.col("board").alias("name"))
    )

    # articles with their fetch_seq (join back on web_id via url suffix)
    art_ev = (
        ev.where(F.col("kind") == "article")
        .withColumn("web_id",
                    F.regexp_replace(F.element_at(F.split(F.col("url"), "/"), -1),
                                     r"\.html", ""))
        .select("web_id", "fetch_seq")
    )
    w_ver = Window.partitionBy("web_id").orderBy(F.col("batch").asc())
    versions = parsed.withColumn("version", F.row_number().over(w_ver).cast("int"))
    arts = (versions.where(F.col("version") == 1).drop("version", "batch")
            .join(art_ev, "web_id"))
    # article_id = DENSE rank in fetch order over parse-OK articles only
    # (parse errors / date-dropped pages are fetched events with no parsed
    # row — they must not leave id gaps). Seq on the narrow (web_id,
    # fetch_seq) projection; column pruning keeps the range shuffle narrow.
    aid = with_global_seq(arts.select("web_id", "fetch_seq"),
                          ["fetch_seq"], "_aseq")
    arts = arts.join(aid.select("web_id", F.col("_aseq").cast("int")
                                .alias("article_id")), "web_id")

    # user: first-encounter order — author at (fetch_seq, 0), push user at
    # (fetch_seq, floor) (crawler/article.py:159-167, 210-231)
    author_ev = arts.select(
        F.col("author_username").alias("username"),
        F.col("fetch_seq"), F.lit(0).alias("pos"))
    push_ev = (
        pushes_raw.join(arts.select("web_id", "fetch_seq"), "web_id")
        .select(F.coalesce(F.col("push_username"), F.lit("")).alias("username"),
                "fetch_seq", F.col("floor").alias("pos"))
    )
    user = (
        author_ev.unionByName(push_ev)
        .groupBy("username")
        .agg(F.min(F.struct("fetch_seq", "pos")).alias("first_ev"))
    )
    user = (
        with_global_seq(user, [F.col("first_ev.fetch_seq"),
                               F.col("first_ev.pos")], "_useq")
        .select(F.col("_useq").cast("int").alias("id"), "username",
                F.lit(0).alias("login_times"),
                F.lit(0).alias("valid_article_count"))
    )

    article = (
        arts.join(user.select(F.col("username").alias("author_username"),
                              F.col("id").alias("user_id")), "author_username")
        .join(board.select(F.col("name").alias("board"), F.col("id").alias("board_id")),
              "board")
        .select(F.col("article_id").alias("id"), "web_id", "user_id", "board_id",
                "post_datetime", "post_ip")
    )

    # SCD-2 histories: one row per kept version; id = encounter order
    # (fetch order, then version); rotation keeps the NEWEST version_rotate
    # versions per article (W5); end_at of a closed version = start_at of
    # its successor (crawler/article.py:196-207)
    hist_src = versions.join(
        arts.select("web_id", "article_id", "fetch_seq"), "web_id")
    w_rot = Window.partitionBy("article_id").orderBy(F.col("version").desc())
    hist_src = (hist_src.withColumn("_newest_rank", F.row_number().over(w_rot))
                .where(F.col("_newest_rank") <= version_rotate)
                .drop("_newest_rank"))
    start_at = logical_ts_col(F.col("fetch_seq") + (F.col("version") - 1))
    w_next = Window.partitionBy("article_id").orderBy("version")
    hist_src = (hist_src.withColumn("start_at", start_at)
                .withColumn("end_at", F.coalesce(F.lead("start_at").over(w_next),
                                                 F.col("start_at"))))
    # history id in (fetch order, version) — seq on the narrow key projection
    # (wide content rows never enter the range shuffle), joined back
    hid = with_global_seq(
        hist_src.select("web_id", "version", "fetch_seq"),
        ["fetch_seq", "version"], "_hseq")
    article_history = (
        hist_src.join(hid.select("web_id", "version",
                                 F.col("_hseq").cast("int").alias("id")),
                      ["web_id", "version"])
        .select("id", "article_id", "title", "content", "start_at", "end_at",
                "web_id", "batch")
    )

    # pushes attach to the history VERSION fetched in their batch; pushes of
    # rotation-dropped histories cascade away (inner join on kept histories)
    hist_key = article_history.select(
        F.col("id").alias("article_history_id"), "web_id", "batch",
        F.col("article_id").alias("_aid"))
    push = (
        pushes_raw.join(hist_key, ["web_id", "batch"])
        .join(arts.select("web_id", "fetch_seq"), "web_id")
        .join(user.select(F.col("username").alias("push_username_key"),
                          F.col("id").alias("push_user_id")),
              F.coalesce(F.col("push_username"), F.lit("")) == F.col("push_username_key"),
              "left")
    )
    pid = with_global_seq(
        push.select("article_history_id", "floor"),
        ["article_history_id", "floor"], "_pseq")
    push = (
        push.join(pid.select("article_history_id", "floor",
                             F.col("_pseq").cast("int").alias("id")),
                  ["article_history_id", "floor"])
        .select("id", "article_history_id", "floor",
                "push_tag", "push_user_id", "push_content", "push_ip",
                "push_datetime")
    )
    article_history = article_history.drop("web_id", "batch")

    # ip_asn rows created empty at crawl time (crawler/article.py:184-195,
    # 236-247): article ip if non-null, push ip if truthy ('' excluded)
    ip_art = article.where(F.col("post_ip").isNotNull()).select(F.col("post_ip").alias("ip"))
    ip_push = push.where(F.col("push_ip").isNotNull() & (F.col("push_ip") != "")) \
        .select(F.col("push_ip").alias("ip"))
    ip_asn = (
        ip_art.unionByName(ip_push).distinct()
        .select("ip", *[F.lit(None).cast("string").alias(c) for c in
                        ("asn", "asn_registry", "asn_cidr", "asn_country_code",
                         "asn_description", "asn_raw")],
                F.lit(None).cast("timestamp").alias("asn_date"))
    )

    # article_index upsert-by-web_id (bulk_update, models/base.py:98-107):
    # last write wins; our corpus lists each article on one page → distinct
    article_index = (
        aidx.join(board.select(F.col("name").alias("board"), F.col("id").alias("board_id")),
                  "board")
        .groupBy("web_id").agg(F.max("board_id").alias("board_id"),
                               F.max("index").alias("index"))
    )

    return {
        "board": board,
        "user": user,
        "ip_asn": ip_asn,
        "article_index": article_index,
        "article": article,
        "article_history": article_history,
        "push": push,
    }


# --- S5: deterministic synthetic ASN enrichment (crawler/asn.py:46-64) -----
def _fnv(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def synth_asn_lookup(ip: str) -> dict:
    """Pure stand-in for ipwhois IPASN.lookup (network source unavailable);
    deterministic per ip so engine and test oracle agree by construction."""
    h = _fnv(ip)
    cc = ["TW", "US", "JP", None][h % 4]
    asn = f"AS{h % 64000}"
    return {
        "ip": ip,
        "asn": asn,
        "asn_registry": ["apnic", "arin", "ripencc"][h % 3],
        "asn_cidr": ".".join(ip.split(".")[:3] + ["0"]) + "/24",
        "asn_country_code": cc,
        "asn_description": f"SYNTH-{asn}",
        "asn_raw": None,
        "asn_date": None,
    }


def ipwhois_asn_lookup(ip: str) -> dict:
    """REAL whois ASN lookup via ipwhois — same row shape as
    synth_asn_lookup, same field handling as the reference
    (crawler/asn.py:52-58: IPASN(Net(ip)).lookup() + '%Y-%m-%d' asn_date
    parse). ipwhois isn't installed in this sandbox (and needs network), so
    this import-gates; pass ``lookup=ipwhois_asn_lookup`` to enrich_ip_asn
    in a connected deployment."""
    import datetime as _dt

    try:
        from ipwhois.asn import IPASN  # noqa: PLC0415
        from ipwhois.net import Net  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - sandbox has no ipwhois
        raise RuntimeError(
            "ipwhois is not installed; install it (and allow network egress "
            "from executors) or use the default synthetic lookup") from e
    result = {"ip": ip, "asn_raw": None}
    result.update(IPASN(Net(ip)).lookup())
    if result.get("asn_date"):
        result["asn_date"] = _dt.datetime.strptime(result["asn_date"],
                                                   "%Y-%m-%d")
    return {k: result.get(k) for k in
            ("ip", "asn", "asn_registry", "asn_cidr", "asn_country_code",
             "asn_description", "asn_raw", "asn_date")}


def enrich_ip_asn(ip_asn: DataFrame, lookup=None) -> DataFrame:
    """mapInPandas enrichment over distinct IPs — ordered by asn queue
    semantics are irrelevant here (ip is the PK); batched like the
    reference's 100-row flushes (crawler/asn.py:60-62).

    ``lookup`` is the per-ip resolver: default deterministic synth (sandbox);
    ``ipwhois_asn_lookup`` for the reference's real whois path. Each Arrow
    batch resolves ~100s of ips per executor task, so real-network latency
    overlaps across partitions instead of serializing like the reference's
    one-ip-at-a-time loop."""
    import pandas as pd

    lookup = lookup or synth_asn_lookup

    def enrich(batches):
        for pdf in batches:
            rows = [lookup(ip) for ip in pdf["ip"]]
            out = pd.DataFrame(rows)
            yield out

    schema = ("ip string, asn string, asn_registry string, asn_cidr string, "
              "asn_country_code string, asn_description string, asn_raw string, "
              "asn_date timestamp")
    return ip_asn.select("ip").mapInPandas(enrich, schema=schema)


def article_documents(result: CrawlResult) -> DataFrame:
    """S9: the reference's nested per-article JSON document
    (crawler/article.py:371-382) — board, article_id (=web_id),
    article_title, author (raw 'user (nick)'), date, content, ip,
    message_count struct, messages array (floor order). The date field is the
    RAW metaline string carried through parse (post_date_raw), byte-identical
    to the reference even for ctime-style space-padded or unparseable dates.
    Write with ``df.write.json`` for the per-page JSON sink analog
    (crawler/article.py:91-100)."""
    parsed = result.table("parsed_articles")
    pushes = result.table("parsed_pushes")

    tag = F.col("m.push_tag")
    msgs = (
        pushes.groupBy("web_id").agg(
            F.array_sort(F.collect_list(F.struct(
                "floor", "push_tag", "push_username", "push_content",
                "push_ipdatetime"))).alias("_m"))
        .select(
            "web_id",
            F.transform("_m", lambda m: F.struct(
                m.push_tag.alias("push_tag"),
                m.push_username.alias("push_userid"),
                m.push_content.alias("push_content"),
                m.push_ipdatetime.alias("push_ipdatetime"))).alias("messages"),
            F.aggregate(
                "_m", F.struct(F.lit(0).alias("push"), F.lit(0).alias("boo"),
                               F.lit(0).alias("neutral")),
                lambda acc, m: F.struct(
                    (acc.push + F.when(m.push_tag == "推", 1).otherwise(0)).alias("push"),
                    (acc.boo + F.when(m.push_tag == "噓", 1).otherwise(0)).alias("boo"),
                    (acc.neutral + F.when(~m.push_tag.isin("推", "噓"), 1)
                     .otherwise(0)).alias("neutral"))).alias("_c"),
        )
    )
    _ = tag
    author_raw = F.when(
        F.col("author_nickname").isNotNull(),
        F.concat(F.col("author_username"), F.lit(" ("),
                 F.col("author_nickname"), F.lit(")"))
    ).otherwise(F.col("author_username"))
    return (
        parsed.join(msgs, "web_id", "left")
        .select(
            F.col("board"),
            F.col("web_id").alias("article_id"),
            F.col("title").alias("article_title"),
            author_raw.alias("author"),
            F.coalesce("post_date_raw", F.lit("")).alias("date"),
            "content",
            F.col("post_ip").alias("ip"),
            F.struct(
                (F.coalesce(F.col("_c.push"), F.lit(0))
                 + F.coalesce(F.col("_c.boo"), F.lit(0))
                 + F.coalesce(F.col("_c.neutral"), F.lit(0))).alias("all"),
                (F.coalesce(F.col("_c.push"), F.lit(0))
                 - F.coalesce(F.col("_c.boo"), F.lit(0))).alias("count"),
                F.coalesce(F.col("_c.push"), F.lit(0)).alias("push"),
                F.coalesce(F.col("_c.boo"), F.lit(0)).alias("boo"),
                F.coalesce(F.col("_c.neutral"), F.lit(0)).alias("neutral"),
            ).alias("message_count"),
            F.coalesce("messages", F.array()).alias("messages"),
        )
    )
