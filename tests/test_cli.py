"""End-to-end CLI test: drive crawl → export → query → user → asn through
`python -m pttcrawler_spark` subprocesses, the reference's
`python -m crawler ...` surface (crawler/__main__.py:57-78,
crawler_arg.py:38-68, export.py:311-338, query.py:137-146)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parents[1])


def run_cli(*argv: str, timeout: int = 420) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pttcrawler_spark", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    """One crawled store shared by the downstream-command tests."""
    d = tmp_path_factory.mktemp("cli_store")
    store = str(d / "store")
    cp = run_cli("article", "--board-name", "board00", "--add",
                 "--index", "1", "2",
                 "--synth", "2,2,3", "--store", store, "--cores", "4",
                 "--json-folder", str(d / "json"))
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "crawled:" in cp.stdout
    return store


def test_article_crawl_and_json(store, tmp_path):
    # json documents landed (config Output=both default → --json-folder honored)
    json_dirs = list(Path(store).parent.glob("json*/articles_board00"))
    assert json_dirs, "json sink directory missing"
    assert any(p.name.startswith("part-") for p in json_dirs[0].iterdir())


def test_export_csv(store, tmp_path):
    out = tmp_path / "exp"
    cp = run_cli("export", "--format", "csv", "--output-folder", str(out),
                 "--store", store, "--cores", "4")
    assert cp.returncode == 0, cp.stderr[-2000:]
    for sheet in ("Article", "Push", "User"):
        assert f"{sheet}:" in cp.stdout
    csvs = list(out.rglob("part-*.csv"))
    assert len(csvs) >= 3


def test_export_ods(store, tmp_path):
    """S11 through the CLI: one real .ods report file, all three sheets
    (reference export.py:287-296)."""
    cp = run_cli("export", "--format", "ods",
                 "--output-folder", str(tmp_path / "ods"),
                 "--store", store, "--cores", "4")
    assert cp.returncode == 0, cp.stderr[-2000:]
    from pttcrawler_spark.engine.ods import read_ods
    path = cp.stdout.strip().splitlines()[-1].split(": ", 1)[1]
    assert path.endswith("Ptt_report.ods")
    book = read_ods(path)
    assert list(book) == ["Article", "Push", "User"]
    assert all(len(rows) >= 1 for rows in book.values())


def test_query_console(store):
    cp = run_cli("query", "--board-name", "board00",
                 "--date-range", "2025-01-01", "2025-12-31",
                 "--store", store, "--cores", "4")
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "Article" in cp.stdout and "Push" in cp.stdout


def test_user_database_queue(store):
    cp = run_cli("user", "--database", "--store", store, "--cores", "4")
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "user records appended:" in cp.stdout


def test_asn_ip_list():
    cp = run_cli("asn", "--ip-list", "1.2.3.4,5.6.7.8", "--cores", "2")
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "1.2.3.4" in cp.stdout and "5.6.7.8" in cp.stdout


def test_migrate_cli_roundtrip(store):
    # fresh stores are STAMPED HEAD at creation (engine/migrate.
    # stamp_new_store, round-3 ADVICE): `current` reports the truth
    # immediately and upgrade is a clean no-op — no directory re-walk. The
    # no-marker => r1_initial fallback now applies only to genuinely
    # pre-revision stores (tests/test_migrate.py::old_store).
    cp = run_cli("migrate", "--store", store, "current")
    assert cp.returncode == 0 and cp.stdout.strip() == "r4_robots_nullable"
    cp = run_cli("migrate", "--store", store, "--cores", "2", "upgrade")
    assert cp.returncode == 0, cp.stderr[-2000:]
    assert "already at r4_robots_nullable" in cp.stdout
    cp = run_cli("migrate", "--store", store, "current")
    assert cp.stdout.strip() == "r4_robots_nullable"


def test_bad_args_rejected():
    # mutually-exclusive input group enforced like crawler_arg.py
    cp = run_cli("article", "--board-name", "b", "--add",
                 "--start-date", "2025-01-01", "--database", "--synth", "1,1,1")
    assert cp.returncode != 0
    cp2 = run_cli("article", "--board-name", "b", "--synth", "1,1,1")
    assert cp2.returncode != 0  # missing --add/--upgrade
