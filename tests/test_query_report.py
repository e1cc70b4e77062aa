"""TW-IP report tests (engine/query.py) vs a hand-computed oracle over the
simulator's tables — including the reference's quirks (inner ASN join drops
no-asn rows; the date range is echoed, never applied)."""

from __future__ import annotations

import pytest

from pttcrawler_spark.engine import query as Q
from pttcrawler_spark.engine import store as S


@pytest.fixture(scope="module")
def rel(spark, crawled):
    t = S.build_relational(crawled)
    t["ip_asn"] = S.enrich_ip_asn(t["ip_asn"])
    return {k: v.cache() for k, v in t.items()}


def _expected(oracle, board_name):
    """Pure-pandas recomputation with the same semantics."""
    t = oracle.tables()
    asn_cc = {r["ip"]: S.synth_asn_lookup(r["ip"])["asn_country_code"]
              for r in t["ip_asn"].to_dict("records")}
    boards = t["board"].set_index("name")["id"]
    arts = t["article"]
    arts = arts[arts.board_id == boards[board_name]]
    hist = t["article_history"].sort_values("id").groupby("article_id").last()
    hist_ids = set()
    a_tw = a_not = 0
    hid_by_article = t["article_history"].sort_values("id") \
        .groupby("article_id")["id"].max()
    for _, a in arts.iterrows():
        if a.post_ip not in asn_cc:
            continue  # inner join drop
        hist_ids.add(int(hid_by_article[a.id]))
        if asn_cc[a.post_ip] == "TW":
            a_tw += 1
        else:
            a_not += 1
    p_tw = p_not = 0
    for _, p in t["push"].iterrows():
        if p.article_history_id in hist_ids and p.push_ip in asn_cc:
            if asn_cc[p.push_ip] == "TW":
                p_tw += 1
            else:
                p_not += 1
    _ = hist
    return a_tw, a_not, p_tw, p_not


def test_report_matches_manual_oracle(rel, oracle, site_cfg):
    board = site_cfg.board_name(0)
    rows = Q.tw_ip_report(rel, board).toPandas().set_index("Type")
    a_tw, a_not, p_tw, p_not = _expected(oracle, board)
    assert rows.loc["Article", "TW Ip"] == str(a_tw)
    assert rows.loc["Article", "Not TW Ip"] == str(a_not)
    assert rows.loc["Push", "TW Ip"] == str(p_tw)
    assert rows.loc["Push", "Not TW Ip"] == str(p_not)
    assert list(rows.columns) == Q.HEADER[1:]


def test_date_range_echoed_not_applied(rel, site_cfg):
    """query.py:87-116: the required --date-range never filters anything."""
    from datetime import datetime
    board = site_cfg.board_name(0)
    base = Q.tw_ip_report(rel, board).toPandas()
    dated = Q.tw_ip_report(rel, board,
                           datetime(1990, 1, 1), datetime(1990, 1, 2)).toPandas()
    # counts identical despite an impossible range...
    assert (base[["TW Ip", "Not TW Ip"]].values ==
            dated[["TW Ip", "Not TW Ip"]].values).all()
    # ...but the range IS echoed into the rows
    assert (dated["Start date"] == "1990-01-01 00:00:00").all()
    # the fixed variant actually filters
    fixed = Q.tw_ip_report(rel, board, datetime(1990, 1, 1),
                           datetime(1990, 1, 2), apply_date_filter=True).toPandas()
    assert (fixed["TW Ip"] == "0").all() and (fixed["Not TW Ip"] == "0").all()


def test_unknown_board_zero_rows(rel):
    rows = Q.tw_ip_report(rel, "no_such_board").toPandas()
    assert (rows["TW Ip"] == "0").all() and (rows["Not TW Ip"] == "0").all()


def test_query_report_ods_sink(rel, site_cfg, tmp_path):
    """query.py:129-135: one 'Query' sheet in Ptt_query_{date}.ods, header
    row first, cell-identical to the report DataFrame."""
    from datetime import datetime

    from pttcrawler_spark.engine.ods import read_ods

    board = site_cfg.board_name(0)
    rep = Q.tw_ip_report(rel, board)
    path = Q.write_report_ods(rep, str(tmp_path), datetime(2026, 8, 17))
    assert path.endswith("Ptt_query_2026-08-17.ods")
    book = read_ods(path)
    assert list(book) == ["Query"]
    rows = book["Query"]
    assert rows[0] == Q.HEADER
    expect = [[row[c] for c in rep.columns] for row in rep.collect()]
    assert rows[1:] == expect
