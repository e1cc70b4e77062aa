"""Job-registry scheduling surface (schedule.py) — the crontab analog
(/root/reference/schedule.py:68-110): upsert keyed by (module, args),
dom.every cycle arithmetic, remove, and the due-runner. Pure driver-side —
no Spark session needed."""

from __future__ import annotations

import datetime as dt

from pttcrawler_spark import schedule as SCH
from pttcrawler_spark.cli import main as cli_main


def test_update_is_upsert_keyed_by_module_args(tmp_path):
    store = str(tmp_path)
    SCH.update_job(store, "article", "--board-name b --add",
                   dt.datetime(2026, 8, 1, 3, 30), 2)
    SCH.update_job(store, "article", "--board-name OTHER --add",
                   dt.datetime(2026, 8, 1, 4, 0), 3)
    # same key → replaces, not appends (schedule.py:90-95 set_command path)
    SCH.update_job(store, "article", "--board-name b --add",
                   dt.datetime(2026, 8, 2, 5, 15), 7)
    jobs = {j.key(): j for j in SCH.load_jobs(store)}
    assert len(jobs) == 2
    j = jobs[("article", "--board-name b --add")]
    assert (j.hour, j.minute, j.dom_every, j.start_day) == (5, 15, 7, 2)


def test_remove_job(tmp_path):
    store = str(tmp_path)
    SCH.update_job(store, "asn", "--ip-list 1.2.3.4",
                   dt.datetime(2026, 8, 1, 0, 0), 1)
    assert SCH.remove_job(store, "asn", "--ip-list 1.2.3.4") is True
    assert SCH.remove_job(store, "asn", "--ip-list 1.2.3.4") is False
    assert SCH.load_jobs(store) == []


def test_next_run_dom_cycle():
    j = SCH.JobSpec(module="article", args="", minute=30, hour=3,
                    dom_every=2, start_day=1)
    # day phase: odd days (1 % 2 == 1)
    after = dt.datetime(2026, 8, 1, 3, 30)   # exactly a firing → next one
    assert SCH.next_run(j, after) == dt.datetime(2026, 8, 3, 3, 30)
    assert SCH.next_run(j, dt.datetime(2026, 8, 1, 2, 0)) == \
        dt.datetime(2026, 8, 1, 3, 30)
    # daily job fires every day at hour:minute
    daily = SCH.JobSpec(module="user", args="", minute=0, hour=12,
                        dom_every=1, start_day=5)
    assert SCH.next_run(daily, dt.datetime(2026, 8, 7, 13, 0)) == \
        dt.datetime(2026, 8, 8, 12, 0)


def test_run_due_fires_and_records(tmp_path):
    store = str(tmp_path)
    SCH.update_job(store, "asn", "--ip-list 1.2.3.4 --cores 2",
                   dt.datetime(2026, 8, 1, 3, 0), 1)
    ran = []
    fired = SCH.run_due(store, now=dt.datetime(2026, 8, 2, 3, 5),
                        runner=lambda argv: ran.append(argv))
    assert len(fired) == 1
    assert ran == [["asn", "--ip-list", "1.2.3.4", "--cores", "2"]]
    # immediately re-running: nothing due until the next cycle
    fired2 = SCH.run_due(store, now=dt.datetime(2026, 8, 2, 3, 6),
                         runner=lambda argv: ran.append(argv))
    assert fired2 == [] and len(ran) == 1
    # next day it fires again
    fired3 = SCH.run_due(store, now=dt.datetime(2026, 8, 3, 3, 5),
                         runner=lambda argv: ran.append(argv))
    assert len(fired3) == 1 and len(ran) == 2


def test_cli_schedule_roundtrip(tmp_path, capsys):
    store = str(tmp_path / "store")
    rc = cli_main(["schedule", "--store", store, "update", "article",
                   "-c", "2", "-s", "2026-08-01 03:30",
                   "--args", "--board-name b --add --synth 1,1,1"])
    assert rc == 0
    assert "30 3 */2" in capsys.readouterr().out
    rc = cli_main(["schedule", "--store", store, "list"])
    assert rc == 0
    assert "article" in capsys.readouterr().out
    rc = cli_main(["schedule", "--store", store, "remove", "article",
                   "--args", "--board-name b --add --synth 1,1,1"])
    assert rc == 0
    assert "removed" in capsys.readouterr().out
