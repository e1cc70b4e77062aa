"""Pipelined (post-commit) verify: equivalence with the inline stage and
crash-repair semantics.

The async path (CrawlConfig.verify_async, default ON) runs the north-rule
verify as a follow-on job per batch over the COMMITTED images +
parsed_articles tables instead of a write inside the commit barrier. Its
row set and verdicts must be identical to the inline stage, and a kill
between a batch's _COMMIT marker and its payload_verify write must heal on
resume (engine/verify.repair_missing_verify).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from conftest import seeds_for
from pttcrawler_spark.engine import crawl as C
from pttcrawler_spark.engine import verify as V


def _run(spark, corpus_pdf, site_cfg, **cfg_kwargs):
    corpus = spark.createDataFrame(corpus_pdf)
    out = tempfile.mkdtemp(prefix="crawl_va_")
    res = C.crawl(spark, corpus, seeds_for(site_cfg), out,
                  C.CrawlConfig(delay_s=2.0, batch_seconds=20.0, **cfg_kwargs))
    return res, out


def _pv(res):
    pdf = res.table("payload_verify").toPandas()
    return pdf.sort_values("image_id").reset_index(drop=True)


def test_async_matches_inline(spark, corpus_pdf, site_cfg):
    res_a, out_a = _run(spark, corpus_pdf, site_cfg, verify_async=True)
    res_i, out_i = _run(spark, corpus_pdf, site_cfg, verify_async=False)
    try:
        a, i = _pv(res_a), _pv(res_i)
        assert len(a) > 0
        assert a.equals(i), "async verify diverged from inline stage"
        # derived-data trust marker: every async verify dir has _SUCCESS
        for p in (Path(out_a) / "tables" / "payload_verify").glob("batch=*"):
            assert (p / "_SUCCESS").exists()
    finally:
        shutil.rmtree(out_a, ignore_errors=True)
        shutil.rmtree(out_i, ignore_errors=True)


def test_repair_after_kill_between_marker_and_verify(spark, corpus_pdf, site_cfg):
    res, out = _run(spark, corpus_pdf, site_cfg, verify_async=True)
    try:
        want = _pv(res)
        pv_base = Path(out) / "tables" / "payload_verify"
        dirs = sorted(pv_base.glob("batch=*"))
        assert dirs, "no verify dirs written"
        # simulate a kill after batch N's marker but before (or during) its
        # verify write: one dir missing entirely, one interrupted (_SUCCESS
        # gone — Spark writes it last, so a partial dir has no marker)
        shutil.rmtree(dirs[-1])
        if len(dirs) > 1:
            (dirs[0] / "_SUCCESS").unlink()
        committed = max(int(p.name.split("=")[1])
                        for p in (Path(out) / "state").glob("batch=*")
                        if (p / "_COMMIT.json").exists())
        repaired = V.repair_missing_verify(spark, out, committed)
        assert int(dirs[-1].name.split("=")[1]) in repaired
        got = _pv(res)
        assert got.equals(want), "repair did not reproduce the verify table"
        # idempotent: a second repair pass finds nothing to do
        assert V.repair_missing_verify(spark, out, committed) == []
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_resume_heals_missing_verify(spark, corpus_pdf, site_cfg):
    """crawl(resume=True) itself performs the repair before crawling on."""
    corpus = spark.createDataFrame(corpus_pdf)
    out = tempfile.mkdtemp(prefix="crawl_va_resume_")
    try:
        cfg = C.CrawlConfig(delay_s=2.0, batch_seconds=20.0, max_batches=3)
        C.crawl(spark, corpus, seeds_for(site_cfg), out, cfg)
        pv_base = Path(out) / "tables" / "payload_verify"
        dirs = sorted(pv_base.glob("batch=*"))
        if dirs:  # first batches may be bootstrap/index-only
            shutil.rmtree(dirs[-1])
        res2 = C.crawl(spark, corpus, seeds_for(site_cfg), out,
                       C.CrawlConfig(delay_s=2.0, batch_seconds=20.0),
                       resume=True)
        # every batch with an images dir has a _SUCCESS-complete verify dir
        img_batches = {p.name for p in (Path(out) / "tables" / "images").glob("batch=*")}
        for name in img_batches:
            assert (pv_base / name / "_SUCCESS").exists(), name
        pdf = res2.table("payload_verify").toPandas()
        assert len(pdf) > 0
        assert pdf["pixel_ok"].all() and pdf["caption_ok"].all()
    finally:
        shutil.rmtree(out, ignore_errors=True)
