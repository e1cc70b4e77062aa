"""Pure-Python single-node crawl simulator — the golden oracle.

Replays the reference's exact crawl semantics over the synthetic corpus:
board → getLastPage → index pages DESCENDING (crawler/article.py:419-511,
crawler/article_index.py:119-174) → per page, entries in DOM order truncated
at r-list-sep → fetch + parse each article → relational tables with
autoincrement ids in ENCOUNTER order (models/article.py:11-13).

The reference's wall-clock `datetime.now()` for history start/end_at is
replaced by a logical clock (BASE_TS + fetch_seq seconds) so oracle and
engine are bit-comparable. The reference's `time.sleep` politeness becomes a
logical per-host budget: it affects WHICH batch a URL lands in, never the
per-host ORDER (prefix admission), which is the property the engine must
reproduce.

Outputs: fetch_events (seq, host, url, kind), url_seen set, and the seven
relational tables as pandas DataFrames.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from ..synth.site import SiteConfig
from . import parse as P

BASE_TS = datetime(2025, 8, 10, 0, 0, 0)


def logical_ts(seq: int) -> datetime:
    return BASE_TS + timedelta(seconds=int(seq))


class OracleSimulator:
    """Single-threaded crawl over a corpus DataFrame (synth.site.PAGES_DDL)."""

    def __init__(self, corpus: pd.DataFrame, cfg: SiteConfig):
        self.cfg = cfg
        self.pages = {r.url: r for r in corpus.itertuples(index=False)}
        self.fetch_events: list[dict] = []
        self.url_seen: set[str] = set()
        self.seq = 0
        # relational store, autoincrement per table in encounter order
        self.boards: dict[str, int] = {}
        self.users: dict[str, int] = {}
        self.ip_asn: dict[str, int] = {}
        self.article_index: dict[str, dict] = {}
        self.articles: dict[str, dict] = {}
        self.histories: list[dict] = []
        self.pushes: list[dict] = []

    # -- store helpers (get_or_create semantics, models/base.py:54-65) ------
    def _board_id(self, name: str) -> int:
        return self.boards.setdefault(name, len(self.boards) + 1)

    def _user_id(self, username: str) -> int:
        return self.users.setdefault(username, len(self.users) + 1)

    def _ip_touch(self, ip: str) -> None:
        if ip:
            self.ip_asn.setdefault(ip, len(self.ip_asn) + 1)

    def _fetch(self, url: str, kind: str, host: str):
        self.seq += 1
        self.fetch_events.append({"seq": self.seq, "host": host, "url": url, "kind": kind})
        self.url_seen.add(url)
        row = self.pages.get(url)
        if row is None:
            raise KeyError(f"404: {url}")
        return row

    # -- the crawl (mirrors _crawling_from_arg) ------------------------------
    def crawl_board(self, board: str, start_index: int = 1,
                    end_index: int | None = None, start_date: datetime | None = None):
        host = self.cfg.host(board)
        base = self.cfg.base_url(board)
        board_id = self._board_id(board)

        if end_index is None:
            boot = self._fetch(f"{base}/bbs/{board}/index.html", "index", host)
            end_index = P.get_last_page(boot.html)

        last_page = end_index
        while last_page >= start_index:
            idx_row = self._fetch(f"{base}/bbs/{board}/index{last_page}.html", "index", host)
            entries = P.parse_index_entries(idx_row.html)
            for web_id, _href in entries:
                self.article_index[web_id] = {
                    "web_id": web_id, "board_id": board_id, "index": last_page}

            records = []
            for web_id, href in entries:
                url = f"{base}{href}"
                art_row = self._fetch(url, "article", host)
                rec = P.parse_article(art_row.html, web_id, board)
                if rec.get("error"):
                    # parse raised → caught per-article → never appended
                    # (crawler/article.py:472-483); the fetch still happened
                    continue
                rec["fetch_seq"] = self.seq
                rec["payload"] = {
                    "image_id": art_row.web_id, "bytes": art_row.image_bytes,
                    "w": art_row.w, "h": art_row.h, "fmt": art_row.fmt,
                    "caption": art_row.caption, "phash": art_row.phash}
                records.append(rec)

            if start_date is not None:  # P4 early-stop, crawler/article.py:486-503
                kept, total = [], len(records)
                for rec in records:
                    dt = P.parse_post_datetime(rec["date"])
                    if dt is None:
                        total -= 1
                    elif start_date <= dt:
                        kept.append(rec)
                if len(kept) < total:
                    start_index = last_page  # stop after this page
                    records = kept

            self._output_database(records)
            last_page -= 1

    def _output_database(self, records: list[dict]):
        """Mirror of _output_database (crawler/article.py:142-261), add mode."""
        for rec in records:
            if rec.get("error"):
                continue  # PostException → caught+logged → skipped
                # (crawler/article.py:313, 472-483)
            author_username = P.parse_author(rec["author"]) or ""
            if rec["article_id"] in self.articles:
                continue  # skip existing (crawler/article.py:152-157)
            user_id = self._user_id(author_username)
            board_id = self._board_id(rec["board"])
            post_dt = P.parse_post_datetime(rec["date"])
            article_id = len(self.articles) + 1
            self.articles[rec["article_id"]] = {
                "id": article_id, "web_id": rec["article_id"], "user_id": user_id,
                "board_id": board_id, "post_datetime": post_dt, "post_ip": rec["ip"]}
            self._ip_touch(rec["ip"])
            ts = logical_ts(rec["fetch_seq"])
            history_id = len(self.histories) + 1
            self.histories.append({
                "id": history_id, "article_id": article_id,
                "title": rec["article_title"], "content": rec["content"],
                "start_at": ts, "end_at": ts})
            for floor, msg in enumerate(rec["messages"]):
                push_uid = self._user_id(msg["push_userid"] or "")
                push_ip, push_dt = P.parse_push_ipdatetime(msg["push_ipdatetime"])
                self.pushes.append({
                    "id": len(self.pushes) + 1,
                    "article_history_id": history_id, "floor": floor + 1,
                    "push_tag": msg["push_tag"], "push_user_id": push_uid,
                    "push_content": msg["push_content"],
                    "push_ip": push_ip, "push_datetime": push_dt})
                if push_ip:
                    self._ip_touch(push_ip)

    # -- exports -------------------------------------------------------------
    def fetch_events_df(self) -> pd.DataFrame:
        return pd.DataFrame(self.fetch_events)

    def tables(self) -> dict[str, pd.DataFrame]:
        return {
            "board": pd.DataFrame(
                [{"id": v, "name": k} for k, v in self.boards.items()]),
            "user": pd.DataFrame(
                [{"id": v, "username": k, "login_times": 0, "valid_article_count": 0}
                 for k, v in self.users.items()]),
            "ip_asn": pd.DataFrame([{"ip": k} for k in self.ip_asn]),
            "article_index": pd.DataFrame(list(self.article_index.values())),
            "article": pd.DataFrame(list(self.articles.values())),
            "article_history": pd.DataFrame(self.histories),
            "push": pd.DataFrame(self.pushes),
        }


def run_oracle(corpus: pd.DataFrame, cfg: SiteConfig,
               boards: list[str] | None = None,
               start_date: datetime | None = None) -> OracleSimulator:
    sim = OracleSimulator(corpus, cfg)
    for b in boards or [cfg.board_name(i) for i in range(cfg.n_boards)]:
        sim.crawl_board(b, start_date=start_date)
    return sim
