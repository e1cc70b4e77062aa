"""M0: codec invariants, corpus determinism, oracle crawl semantics."""

from __future__ import annotations

import numpy as np

from pttcrawler_spark.synth import images as img
from pttcrawler_spark.synth.site import SiteConfig, generate_site_pandas
from pttcrawler_spark.oracle import parse as P


def test_codec_lossless_roundtrip():
    px = img.make_pixels("M.123.A.001", 32, 32)
    assert px.shape == (32, 32, 3)
    out = img.decode(img.encode(px, "png"))
    assert np.array_equal(px, out)
    assert img.psnr(px, out) == float("inf")


def test_codec_lossy_psnr_gate():
    px = img.make_pixels("M.456.A.002", 32, 32)
    out = img.decode(img.encode(px, "jpeg"))
    p = img.psnr(px, out)
    assert 40.0 <= p < 60.0, p  # BASELINE.json input_hint: PSNR >= 40 dB


def test_phash_deterministic_and_discriminative():
    a = img.phash64(img.make_pixels("A", 32, 32))
    assert a == img.phash64(img.make_pixels("A", 32, 32))
    b = img.phash64(img.make_pixels("B", 32, 32))
    assert img.hamming64(a, b) > 0


def test_corpus_deterministic(site_cfg, corpus_pdf):
    again = generate_site_pandas(site_cfg)
    assert corpus_pdf["url"].tolist() == again["url"].tolist()
    assert (corpus_pdf["html"] == again["html"]).all()


def test_get_last_page_semantics(corpus_pdf, site_cfg):
    board = site_cfg.board_name(0)
    boot = corpus_pdf[corpus_pdf.url.str.endswith(f"/bbs/{board}/index.html")].iloc[0]
    # index.html aliases page 3, whose ‹ link points to index2 → last = 3
    assert P.get_last_page(boot.html) == site_cfg.pages_per_board
    page1 = corpus_pdf[corpus_pdf.url.str.endswith(f"/bbs/{board}/index1.html")].iloc[0]
    assert P.get_last_page(page1.html) == 1  # no ‹ link → default 1


def test_index_entries_skip_deleted_and_pinned(corpus_pdf, site_cfg):
    board = site_cfg.board_name(0)
    page = corpus_pdf[corpus_pdf.url.str.endswith(f"/bbs/{board}/index2.html")].iloc[0]
    entries = P.parse_index_entries(page.html)
    assert 0 < len(entries) <= site_cfg.articles_per_page
    assert all("PIN" not in wid for wid, _ in entries)  # r-list-sep truncates


def test_oracle_order_descending_pages(oracle, site_cfg):
    ev = oracle.fetch_events_df()
    b0 = site_cfg.host(site_cfg.board_name(0))
    seqs = ev[ev.host == b0]
    idx_urls = [u for u in seqs.url if "index" in u]
    # bootstrap index.html, then index3, index2, index1
    assert idx_urls[0].endswith("index.html")
    assert [int(u.split("index")[-1].split(".")[0]) for u in idx_urls[1:]] == [3, 2, 1]
    # articles interleave between their page and the next page
    kinds = seqs.kind.tolist()
    assert kinds[0] == "index" and kinds[1] == "index"


def test_oracle_tables_shape(oracle, site_cfg):
    t = oracle.tables()
    n_articles = len(t["article"])
    assert n_articles > 0
    assert len(t["article_history"]) == n_articles  # one version per article (add mode)
    assert set(t["article"].web_id) == set(
        w for w in t["article_index"].web_id if w in set(t["article"].web_id))
    # ids are 1..N in encounter order
    assert t["article"].id.tolist() == list(range(1, n_articles + 1))
    assert t["push"].floor.min() >= 1
    # push datetimes carry the %M:%S quirk → year 1900
    years = {d.year for d in t["push"].push_datetime if d is not None}
    assert years == {1900}


def test_oracle_push_tag_tally(oracle):
    t = oracle.tables()
    tags = set(t["push"].push_tag.unique())
    assert tags <= {"推", "噓", "→"}


def test_date_early_stop(corpus_pdf, site_cfg):
    from datetime import datetime

    from pttcrawler_spark.oracle.simulator import OracleSimulator

    # a start_date in the middle of the corpus date range → crawl stops early
    sim = OracleSimulator(corpus_pdf, site_cfg)
    sim.crawl_board(site_cfg.board_name(0), start_date=datetime(2025, 8, 1, 2, 0, 0))
    full = OracleSimulator(corpus_pdf, site_cfg)
    full.crawl_board(site_cfg.board_name(0))
    assert len(sim.articles) <= len(full.articles)
