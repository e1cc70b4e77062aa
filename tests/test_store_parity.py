"""M2: deterministic relational tables — engine vs oracle, id-for-id."""

from __future__ import annotations

import pandas as pd
import pytest

from pttcrawler_spark.engine import store as S


@pytest.fixture(scope="module")
def tables(crawled):
    t = S.build_relational(crawled)
    return {k: v.cache() for k, v in t.items()}


def _norm(pdf: pd.DataFrame, key) -> pd.DataFrame:
    return pdf.sort_values(key).reset_index(drop=True)


def test_board_user_ids_match(tables, oracle):
    ora = oracle.tables()

    b = _norm(tables["board"].toPandas(), "id")
    ob = _norm(ora["board"], "id")
    assert b["id"].tolist() == ob["id"].tolist()
    assert b["name"].tolist() == ob["name"].tolist()

    u = _norm(tables["user"].toPandas(), "id")
    ou = _norm(ora["user"], "id")
    assert u["id"].tolist() == ou["id"].tolist()
    assert u["username"].tolist() == ou["username"].tolist()


def test_article_and_history_match(tables, oracle):
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


def test_push_table_matches(tables, oracle):
    ora = oracle.tables()
    p = _norm(tables["push"].toPandas(), "id")
    op = _norm(ora["push"], "id")
    for col in ["id", "article_history_id", "floor", "push_tag", "push_user_id",
                "push_content", "push_ip"]:
        assert p[col].tolist() == op[col].tolist(), col
    assert [x if pd.notna(x) else None for x in p["push_datetime"]] == \
        [x for x in op["push_datetime"]]


def test_ip_asn_set_matches(tables, oracle):
    ora = oracle.tables()
    assert set(tables["ip_asn"].toPandas()["ip"]) == set(ora["ip_asn"]["ip"])


def test_article_index_matches(tables, oracle):
    ora = oracle.tables()
    e = _norm(tables["article_index"].toPandas(), "web_id")
    o = _norm(ora["article_index"], "web_id")
    assert e["web_id"].tolist() == o["web_id"].tolist()
    assert e["index"].tolist() == o["index"].tolist()
    assert e["board_id"].tolist() == o["board_id"].tolist()


def test_asn_enrichment_deterministic(tables, spark):
    enriched = S.enrich_ip_asn(tables["ip_asn"]).toPandas()
    assert len(enriched) == tables["ip_asn"].count()
    # pure-function parity with the driver-side implementation
    for _, row in enriched.head(20).iterrows():
        exp = S.synth_asn_lookup(row["ip"])
        assert row["asn"] == exp["asn"]
        assert (row["asn_country_code"] == exp["asn_country_code"]) or (
            pd.isna(row["asn_country_code"]) and exp["asn_country_code"] is None)
    assert enriched["asn_country_code"].dropna().isin(["TW", "US", "JP"]).all()


def test_asn_enrichment_pluggable_lookup(tables):
    """The real-whois path (crawler/asn.py:52-58) plugs in through the same
    interface; exercised with a stub resolver (no ipwhois/network in the
    sandbox — ipwhois_asn_lookup itself import-gates with a clear error)."""
    def stub(ip):
        out = S.synth_asn_lookup(ip)
        out["asn_description"] = f"REAL-{ip}"
        return out

    enriched = S.enrich_ip_asn(tables["ip_asn"], lookup=stub).toPandas()
    assert (enriched["asn_description"] == "REAL-" + enriched["ip"]).all()
    with pytest.raises(RuntimeError, match="ipwhois is not installed"):
        S.ipwhois_asn_lookup("8.8.8.8")


def test_article_documents_match_oracle(spark, crawled, oracle, corpus_pdf, site_cfg):
    """S9: the nested JSON document (crawler/article.py:371-382) field-for-
    field against the oracle parser's dicts, messages in page order."""
    from pttcrawler_spark.engine.store import article_documents
    from pttcrawler_spark.oracle import parse as OP

    docs = article_documents(crawled).toPandas().set_index("article_id")
    # oracle documents straight from the reference-faithful parser
    arts = corpus_pdf[corpus_pdf.kind == "article"]
    n_checked = 0
    for r in arts.itertuples(index=False):
        rec = OP.parse_article(r.html, r.web_id, r.board)
        if rec.get("error"):
            assert r.web_id not in docs.index
            continue
        d = docs.loc[r.web_id]
        assert d["article_title"] == rec["article_title"]
        assert d["date"] == rec["date"]  # RAW metaline string, byte-for-byte
        assert d["content"] == rec["content"]
        assert (d["ip"] or None) == rec["ip"]
        mc = d["message_count"]
        assert mc["all"] == rec["message_count"]["all"]
        assert mc["count"] == rec["message_count"]["count"]
        assert mc["push"] == rec["message_count"]["push"]
        msgs = list(d["messages"])
        assert len(msgs) == len(rec["messages"])
        for got, exp in zip(msgs, rec["messages"]):
            assert got["push_tag"] == exp["push_tag"]
            assert got["push_userid"] == exp["push_userid"]
            assert got["push_content"] == exp["push_content"]
            assert got["push_ipdatetime"] == exp["push_ipdatetime"]
        n_checked += 1
    assert n_checked > 0

    # json sink round-trip (crawler/article.py:91-100 analog)
    import shutil
    import tempfile
    out = tempfile.mkdtemp(prefix="docs_json_")
    try:
        article_documents(crawled).coalesce(1).write.mode("overwrite").json(out + "/docs")
        back = spark.read.json(out + "/docs")
        assert back.count() == len(docs)
        assert "message_count" in back.columns and "messages" in back.columns
    finally:
        shutil.rmtree(out, ignore_errors=True)
