"""Fixed StructType schemas for every table the engine manages.

The reference declares its schema twice (SQLAlchemy models + Alembic
migrations — models/article.py, models/user.py, models/asn.py,
db_migration/versions/*); we declare it once, here. Relational tables mirror
the reference store; frontier/seen/politeness/lineage are engine state per
SURVEY.md §1.4/FIXTURES.md §3; ``IMAGES`` is the authoritative payload shape
from BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --- payload (BASELINE.json input_hint) -----------------------------------
IMAGES = T.StructType([
    _f("image_id", T.StringType(), False),
    _f("bytes", T.BinaryType(), False),
    _f("w", T.IntegerType(), False),
    _f("h", T.IntegerType(), False),
    _f("fmt", T.StringType(), False),
    _f("caption", T.StringType(), False),
    _f("phash", T.LongType(), False),
])

# --- relational mirror of the reference store (models/article.py:9-137,
# models/user.py:9-50, models/asn.py:7-24) ----------------------------------
BOARD = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("name", T.StringType(), False),
])

ARTICLE_INDEX = T.StructType([
    _f("web_id", T.StringType(), False),
    _f("board_id", T.IntegerType(), False),
    _f("index", T.IntegerType(), False),
])

ARTICLE = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("web_id", T.StringType(), False),
    _f("user_id", T.IntegerType(), True),
    _f("board_id", T.IntegerType(), True),
    _f("post_datetime", T.TimestampType(), True),   # nullable per 3af39c6792c0:21-25
    _f("post_ip", T.StringType(), True),
])

ARTICLE_HISTORY = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("article_id", T.IntegerType(), False),
    _f("title", T.StringType(), True),
    _f("content", T.StringType(), False),
    _f("start_at", T.TimestampType(), False),
    _f("end_at", T.TimestampType(), False),
])

PUSH = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("article_history_id", T.IntegerType(), False),
    _f("floor", T.IntegerType(), False),            # 1-based, crawler/article.py:211,228
    _f("push_tag", T.StringType(), False),
    _f("push_user_id", T.IntegerType(), True),
    _f("push_content", T.StringType(), True),
    _f("push_ip", T.StringType(), True),
    _f("push_datetime", T.TimestampType(), True),
])

USER = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("username", T.StringType(), False),
    _f("login_times", T.IntegerType(), True),
    _f("valid_article_count", T.IntegerType(), True),
])

USER_LAST_RECORD = T.StructType([
    _f("id", T.IntegerType(), False),
    _f("user_id", T.IntegerType(), False),
    _f("last_login_datetime", T.TimestampType(), False),
    _f("last_login_ip", T.StringType(), False),
    _f("created_at", T.TimestampType(), False),
])

IP_ASN = T.StructType([
    _f("ip", T.StringType(), False),
    _f("asn", T.StringType(), True),
    _f("asn_date", T.TimestampType(), True),
    _f("asn_registry", T.StringType(), True),
    _f("asn_cidr", T.StringType(), True),
    _f("asn_country_code", T.StringType(), True),
    _f("asn_description", T.StringType(), True),
    _f("asn_raw", T.StringType(), True),
])

# --- engine state (FIXTURES.md §3) -----------------------------------------
FRONTIER = T.StructType([
    _f("url", T.StringType(), False),
    _f("url_hash", T.LongType(), False),       # xxhash64 of canonical URL
    _f("url_hash32", T.IntegerType(), False),  # murmur3_x86_32 (F.hash)
    _f("host", T.StringType(), False),
    _f("host_salt", T.IntegerType(), False),   # murmur3(host) % P, kills skew
    _f("kind", T.StringType(), False),         # 'index' | 'article'
    _f("board", T.StringType(), False),
    _f("page_index", T.IntegerType(), False),
    _f("dom_pos", T.IntegerType(), False),     # DOM order within the page
    _f("priority", T.LongType(), False),       # higher first
    _f("discovery_seq", T.LongType(), False),  # logical ts, deterministic
    _f("status", T.StringType(), False),       # pending|fetched|deferred|failed
    _f("retry_count", T.IntegerType(), False),
    _f("batch_id", T.LongType(), False),       # batch that last touched the row
])

URL_SEEN = T.StructType([
    _f("url", T.StringType(), False),
    _f("url_hash", T.LongType(), False),
])

BLOOM_PART = T.StructType([
    _f("partition_id", T.IntegerType(), False),
    _f("bloom_bytes", T.BinaryType(), False),
    _f("n_items", T.LongType(), False),
    _f("n_bits", T.LongType(), False),
    _f("n_hashes", T.IntegerType(), False),
])

POLITENESS = T.StructType([
    _f("host", T.StringType(), False),
    _f("tokens", T.DoubleType(), False),
    _f("last_refill_seq", T.LongType(), False),
    _f("delay_s", T.DoubleType(), False),      # config_example.ini:14 default 2.0
    _f("robots_rules", T.StringType(), True),
    _f("robots_fetched_seq", T.LongType(), True),
])

LINEAGE_METRICS = T.StructType([
    _f("batch_id", T.LongType(), False),
    _f("partition_id", T.IntegerType(), False),
    _f("host", T.StringType(), False),
    _f("fetched", T.LongType(), False),
    _f("deduped", T.LongType(), False),
    _f("deferred", T.LongType(), False),
    _f("failed", T.LongType(), False),
])

# --- fetched/parsed output of the article parse stage (the UDTF analog of
# crawler/article.py:265-384: one page → 1 article row + N push rows) -------
PARSED_ARTICLE = T.StructType([
    _f("web_id", T.StringType(), False),
    _f("board", T.StringType(), False),
    _f("author_username", T.StringType(), True),
    _f("author_nickname", T.StringType(), True),
    _f("title", T.StringType(), True),
    _f("post_datetime", T.TimestampType(), True),
    _f("post_ip", T.StringType(), True),
    _f("content", T.StringType(), True),
    _f("image_id", T.StringType(), True),
    _f("caption", T.StringType(), True),
    _f("phash", T.LongType(), True),
    _f("fetch_seq", T.LongType(), False),
])

PARSED_PUSH = T.StructType([
    _f("web_id", T.StringType(), False),
    _f("floor", T.IntegerType(), False),
    _f("push_tag", T.StringType(), False),
    _f("push_username", T.StringType(), True),
    _f("push_content", T.StringType(), True),
    _f("push_ip", T.StringType(), True),
    _f("push_datetime", T.TimestampType(), True),
])
