"""Crawl-loop bench over the REAL HTTP source (round-4 verdict #8).

sources/http_fetch.py is parity-tested on small corpora; this runs the full
crawl loop with `fetcher=` real sockets — executor tasks issuing actual
GETs through requests.Session against a local threaded http.server that
serves the materialized synthetic site (~10k URLs) — and commits sustained
URLs/s plus the parity verdict, closing the last simulated/real gap.

Parity gate (asserted before any timing is reported):
- per-host fetch order identical to the pure-Python oracle simulator, and
- the URL-seen set identical to the oracle's.

Throughput methodology mirrors bench.py:crawl_corpus: sustained = steady
drain batches (>= 50% of peak, first warm-up batch dropped), median batch
rate reported alongside (this VM shows occasional multi-second stalls).
The absolute number is a LOWER bound on engine throughput: the single
ThreadingTCPServer is a GIL-bound Python process sharing the host with the
32 executor threads, so the server, not the engine, is the ceiling here —
the point is that the loop sustains thousands of REAL requests/s with
parity intact, not to beat the simulated-corpus figure.

Writes BENCH_HTTP_CRAWL.json.

Usage: python scripts/bench_http_crawl.py [--cpus 32]
"""
from __future__ import annotations

import argparse
import http.server
import json
import os
import shutil
import socketserver
import sys
import tempfile
import threading
import time
from pathlib import Path
from urllib.parse import urlparse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pttcrawler_spark.engine import crawl as C  # noqa: E402
from pttcrawler_spark.oracle.simulator import run_oracle  # noqa: E402
from pttcrawler_spark.session import get_spark  # noqa: E402
from pttcrawler_spark.sources import http_fetch as H  # noqa: E402
from pttcrawler_spark.synth.site import (SiteConfig,  # noqa: E402
                                         generate_site_pandas)

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _seeds(cfg):
    return [(cfg.board_name(i),
             f"{cfg.base_url(cfg.board_name(i))}/bbs/{cfg.board_name(i)}"
             f"/index.html")
            for i in range(cfg.n_boards)]


def serve_site(pdf, root: Path) -> tuple[socketserver.TCPServer, int]:
    for r in pdf.itertuples(index=False):
        p = urlparse(r.url)
        path = root / p.netloc / p.path.lstrip("/")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(r.html, encoding="utf-8")

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):  # quiet
            pass

    httpd = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    httpd.daemon_threads = True
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    return httpd, httpd.server_address[1]


def _rewrite(port):
    def rw(url: str) -> str:
        p = urlparse(url)
        return f"http://127.0.0.1:{port}/{p.netloc}{p.path}"
    return rw


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--boards", type=int, default=8)
    ap.add_argument("--pages", type=int, default=25)
    ap.add_argument("--per-page", type=int, default=50)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCH_HTTP_CRAWL.json"))
    args = ap.parse_args()

    cfg = SiteConfig(n_boards=args.boards, pages_per_board=args.pages,
                     articles_per_page=args.per_page)
    print("generating site...", flush=True)
    pdf = generate_site_pandas(cfg)
    print(f"site: {len(pdf)} pages", flush=True)
    root = Path(tempfile.mkdtemp(prefix="http_bench_site_", dir=SCRATCH))
    out = tempfile.mkdtemp(prefix="http_bench_out_", dir=SCRATCH)
    httpd = None
    spark = None
    try:
        httpd, port = serve_site(pdf, root)
        print("running oracle simulator...", flush=True)
        sim = run_oracle(pdf, cfg)

        spark = get_spark(args.cpus, app_name="bench_http_crawl")
        fetcher = H.fetcher_for(timeout=30.0, url_rewrite=_rewrite(port))
        ccfg = C.CrawlConfig(delay_s=0.01, batch_seconds=60.0,
                             verify_payload=False)
        t0 = time.perf_counter()
        res = C.crawl(spark, None, _seeds(cfg), out, ccfg, fetcher=fetcher)
        wall = time.perf_counter() - t0

        # ---- parity gate: real-socket crawl == oracle ----
        eng = res.fetch_order().toPandas().sort_values(["host", "ord"])
        ora = sim.fetch_events_df()
        for host in ora.host.unique():
            assert eng[eng.host == host].url.tolist() == \
                ora[ora.host == host].url.tolist(), f"order diverged: {host}"
        seen = set(res.url_seen().toPandas().url)
        assert seen == sim.url_seen, (
            f"url_seen diverged: +{len(seen - sim.url_seen)} "
            f"-{len(sim.url_seen - seen)}")
        n_fetched = res.frontier().where("status = 'fetched'").count()

        # ---- throughput (bench.py steady-batch methodology) ----
        peak = max((b["fetched"] for b in res.batch_stats), default=0)
        steady = [b for b in res.batch_stats
                  if peak > 0 and b["fetched"] >= peak / 2]
        if len(steady) >= 3:
            steady = steady[1:]  # drop the JIT/Arrow warm-up batch
        sustained = (sum(b["fetched"] for b in steady)
                     / max(sum(b["wall_s"] for b in steady), 1e-9))
        rates = sorted(b["fetched"] / b["wall_s"]
                       for b in steady if b["wall_s"] > 0)
        median = rates[len(rates) // 2] if rates else 0.0

        result = {
            "metric": "crawl_real_http_source",
            "cpus": args.cpus,
            "site_pages": int(len(pdf)),
            "hosts": args.boards,
            "urls_fetched": int(n_fetched),
            "wall_s": round(wall, 3),
            "urls_per_sec": round(n_fetched / wall, 2),
            "sustained_urls_per_sec": round(sustained, 2),
            "median_batch_urls_per_sec": round(median, 2),
            "batches": res.final_batch + 1,
            "parity": {"fetch_order_per_host": True, "url_seen_set": True},
            "note": "real sockets end-to-end (requests.Session in "
                    "mapInPandas executor tasks against a local threaded "
                    "http.server); the GIL-bound server shares the host "
                    "with the executors, so this is a lower bound on "
                    "engine throughput",
            "batch_stats": res.batch_stats,
        }
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps({k: result[k] for k in
                          ("site_pages", "urls_fetched", "wall_s",
                           "urls_per_sec", "sustained_urls_per_sec",
                           "median_batch_urls_per_sec", "batches")}))
    finally:
        if httpd is not None:
            httpd.shutdown()
        if spark is not None:
            spark.stop()
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
