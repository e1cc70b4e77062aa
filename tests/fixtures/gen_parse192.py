"""Regenerate parse192.parquet — the DuckDB oracle side-table for the
``f6_content_clean`` / ``f7_transcription`` suite entries.

Driver-side, pure Python, NO Spark: over a fixed 192-slot synthetic site
(4 boards x 2 pages x 24 articles — slots cover the normal / transcription /
broken page mix), render each article page with synth.site and parse it with
the reference-faithful pure-Python oracle parser (oracle/parse.parse_article)
— the independent twin of the distributed Column-expression parser
(functions/parse.parse_articles) the suite queries run. Deleted slots are
skipped on both sides (synth.site.is_deleted).

Run from the repo root:  python tests/fixtures/gen_parse192.py
"""

import hashlib
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pttcrawler_spark.oracle import parse as OP  # noqa: E402
from pttcrawler_spark.synth import site as SS  # noqa: E402

# MUST match pttcrawler_spark.suite.PARSE_SITE
CFG = SS.SiteConfig(n_boards=4, pages_per_board=2, articles_per_page=24)


def main() -> None:
    rows = []
    arts = CFG.articles_per_page
    pages = CFG.pages_per_board
    for slot in range(CFG.n_boards * pages * arts):
        b, rem = divmod(slot, pages * arts)
        page0, pos = divmod(rem, arts)
        page = page0 + 1
        if SS.is_deleted(CFG, b, page, pos):
            continue
        board = CFG.board_name(b)
        wid = SS.web_id_for(CFG, b, page, pos)
        html = SS.article_page_html(CFG, b, page, pos)
        rec = OP.parse_article(html, wid, board)
        rows.append({
            "slot": slot,
            "web_id": wid,
            "title": rec["article_title"],
            "content_md5": hashlib.md5(
                rec["content"].encode("utf-8")).hexdigest(),
            "ip": rec["ip"],
            "date_raw": rec["date"],
            "parse_error": rec["error"],
        })
    out = pd.DataFrame(rows)
    out["slot"] = out["slot"].astype("int64")
    path = os.path.join(os.path.dirname(__file__), "parse192.parquet")
    out.to_parquet(path, index=False)
    n_err = out["parse_error"].notna().sum()
    print(f"wrote {path}: {len(out)} rows ({n_err} parse errors)")


if __name__ == "__main__":
    main()
