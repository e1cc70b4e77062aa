"""User-record enrichment tests (engine/users.py): W6 queue order, F9 buffer
scrape parity vs a pure-Python re application of the same pattern, the
MERGE upsert, and the now-filled user export sheet."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pttcrawler_spark.engine import export as E
from pttcrawler_spark.engine import store as S
from pttcrawler_spark.engine import users as U
from pttcrawler_spark.synth import users as SU


@pytest.fixture(scope="module")
def rel(spark, crawled):
    t = S.build_relational(crawled)
    t["ip_asn"] = S.enrich_ip_asn(t["ip_asn"])
    return {k: v.cache() for k, v in t.items()}


def test_fetch_queue_w6_order(rel):
    q = U.fetch_queue(rel["user"]).toPandas().sort_values("fetch_rank")
    keys = list(zip(q.login_times, q.id))
    assert keys == sorted(keys)


def test_scrape_matches_python_re(spark, rel):
    buffers = U.synth_buffers(rel["user"]).cache()
    got = U.scrape_buffers(buffers).toPandas().set_index("username")
    pdf = buffers.toPandas()
    pat = re.compile(U.RE_BUFFER)
    n_err = 0
    for r in pdf.itertuples(index=False):
        m = pat.match(r.buffer)
        if not m:
            n_err += 1
            assert r.username not in got.index
            continue
        row = got.loc[r.username]
        assert row["login_times"] == int(m.group(1))
        assert row["valid_article_count"] == int(m.group(2))
        assert row["last_login_ip"] == m.group(4)
        # datetime: '%m/%d/%Y %H:%M:%S %a' (crawler/user.py:184-185)
        from datetime import datetime
        exp = datetime.strptime(m.group(3).strip(), "%m/%d/%Y %H:%M:%S %a")
        assert row["last_login_datetime"] == exp
    assert n_err > 0  # the error-screen path is exercised
    assert len(got) == len(pdf) - n_err


def test_apply_user_records_merge(spark, rel):
    buffers = U.synth_buffers(rel["user"])
    scraped = U.scrape_buffers(buffers).cache()
    out = {k: v.cache() for k, v in U.apply_user_records(rel, scraped).items()}

    u2 = out["user"].toPandas().set_index("username")
    sc = scraped.toPandas().set_index("username")
    for un, row in sc.iterrows():
        assert u2.loc[un, "login_times"] == row["login_times"]
        assert u2.loc[un, "valid_article_count"] == row["valid_article_count"]
    # untouched users keep their original counters (0 from the crawl store)
    untouched = set(u2.index) - set(sc.index)
    assert all(u2.loc[list(untouched), "login_times"] == 0)
    # one last_record per scraped user; new ips landed in ip_asn
    lr = out["user_last_record"].toPandas()
    assert len(lr) == len(sc)
    ips = set(out["ip_asn"].toPandas().ip)
    assert set(lr.last_login_ip.dropna()) <= ips

    # the user export sheet is now filled for scraped users (export.py:107-118)
    sheet = E.user_sheet(out).toPandas()
    filled = sheet[sheet["User.last_login_ip"] != ""]
    assert len(filled) == len(sc)
    assert (filled["User.login_times"] != "").all()


def test_apply_user_records_appends_on_second_run(spark, rel):
    """crawler/user.py:198-204 adds a UserLastRecord per RUN — a second
    enrichment must append rows with ids continuing after the existing max,
    not replace the history."""
    scraped = U.scrape_buffers(U.synth_buffers(rel["user"])).cache()
    # between real runs the store is persisted (parquet/Iceberg); cache is
    # the in-test analog — without it every assert re-executes run 1's graph
    once = {k: v.cache() for k, v in U.apply_user_records(rel, scraped).items()}
    twice = U.apply_user_records(once, scraped)

    lr1 = once["user_last_record"].toPandas()
    lr2 = twice["user_last_record"].toPandas()
    assert len(lr2) == 2 * len(lr1)
    assert sorted(lr2.id) == list(range(1, 2 * len(lr1) + 1))
    # run-1 rows survive untouched
    merged = lr2[lr2.id <= len(lr1)].sort_values("id").reset_index(drop=True)
    assert merged["user_id"].tolist() == \
        lr1.sort_values("id")["user_id"].tolist()


def test_apply_user_records_creates_unknown_users(spark, rel):
    """crawler/user.py:173-178 get_or_creates users missing from the table —
    scraped records for unknown usernames append new user rows with next ids
    and still land a last_record row."""
    extra = spark.createDataFrame(
        [("zz_newuser_1",), ("zz_newuser_2",)], "username string")
    scraped = U.scrape_buffers(U.synth_buffers(rel["user"].select("username")
                                               .union(extra))).cache()
    out = {k: v.cache() for k, v in U.apply_user_records(rel, scraped).items()}

    u2 = out["user"].toPandas()
    base = rel["user"].toPandas()
    known_sc = set(scraped.toPandas().username)
    new_names = sorted(known_sc - set(base.username))
    got_new = u2[~u2.username.isin(base.username)].sort_values("username")
    assert got_new.username.tolist() == new_names
    # ids continue after the existing max, in username order
    assert sorted(got_new.id) == list(
        range(base.id.max() + 1, base.id.max() + 1 + len(new_names)))
    # new users carry their scraped counters and got a last_record row
    lr = out["user_last_record"].toPandas()
    assert set(got_new.id) <= set(lr.user_id)
