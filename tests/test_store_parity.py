"""M2: deterministic relational tables — engine vs oracle, id-for-id."""

from __future__ import annotations

import pandas as pd

from pttcrawler_spark.engine import store as S


def _norm(pdf: pd.DataFrame, key) -> pd.DataFrame:
    return pdf.sort_values(key).reset_index(drop=True)


def test_board_user_ids_match(crawled, oracle):
    tables = S.build_relational(crawled)
    ora = oracle.tables()

    b = _norm(tables["board"].toPandas(), "id")
    ob = _norm(ora["board"], "id")
    assert b["id"].tolist() == ob["id"].tolist()
    assert b["name"].tolist() == ob["name"].tolist()

    u = _norm(tables["user"].toPandas(), "id")
    ou = _norm(ora["user"], "id")
    assert u["id"].tolist() == ou["id"].tolist()
    assert u["username"].tolist() == ou["username"].tolist()


def test_article_and_history_match(crawled, oracle):
    tables = S.build_relational(crawled)
    ora = oracle.tables()

    a = _norm(tables["article"].toPandas(), "id")
    oa = _norm(ora["article"], "id")
    for col in ["id", "web_id", "user_id", "board_id", "post_ip"]:
        assert a[col].tolist() == oa[col].tolist(), col
    assert a["post_datetime"].tolist() == oa["post_datetime"].tolist()

    h = _norm(tables["article_history"].toPandas(), "id")
    oh = _norm(ora["article_history"], "id")
    for col in ["id", "article_id", "title", "content"]:
        assert h[col].tolist() == oh[col].tolist(), col
    # logical clock: start_at = BASE_TS + fetch_seq
    assert h["start_at"].tolist() == oh["start_at"].tolist()
    assert h["end_at"].tolist() == oh["end_at"].tolist()


def test_push_table_matches(crawled, oracle):
    tables = S.build_relational(crawled)
    ora = oracle.tables()
    p = _norm(tables["push"].toPandas(), "id")
    op = _norm(ora["push"], "id")
    for col in ["id", "article_history_id", "floor", "push_tag", "push_user_id",
                "push_content", "push_ip"]:
        assert p[col].tolist() == op[col].tolist(), col
    assert [x if pd.notna(x) else None for x in p["push_datetime"]] == \
        [x for x in op["push_datetime"]]


def test_ip_asn_set_matches(crawled, oracle):
    tables = S.build_relational(crawled)
    ora = oracle.tables()
    assert set(tables["ip_asn"].toPandas()["ip"]) == set(ora["ip_asn"]["ip"])


def test_article_index_matches(crawled, oracle):
    tables = S.build_relational(crawled)
    ora = oracle.tables()
    e = _norm(tables["article_index"].toPandas(), "web_id")
    o = _norm(ora["article_index"], "web_id")
    assert e["web_id"].tolist() == o["web_id"].tolist()
    assert e["index"].tolist() == o["index"].tolist()
    assert e["board_id"].tolist() == o["board_id"].tolist()


def test_asn_enrichment_deterministic(crawled, spark):
    tables = S.build_relational(crawled)
    enriched = S.enrich_ip_asn(tables["ip_asn"]).toPandas()
    assert len(enriched) == tables["ip_asn"].count()
    # pure-function parity with the driver-side implementation
    for _, row in enriched.head(20).iterrows():
        exp = S.synth_asn_lookup(row["ip"])
        assert row["asn"] == exp["asn"]
        assert (row["asn_country_code"] == exp["asn_country_code"]) or (
            pd.isna(row["asn_country_code"]) and exp["asn_country_code"] is None)
    assert enriched["asn_country_code"].dropna().isin(["TW", "US", "JP"]).all()
