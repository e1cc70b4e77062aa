"""Iceberg-layout snapshot state for the crawl loop.

Iceberg jars aren't in this image, so we implement the same durability
contract at the Parquet level: each micro-batch writes a snapshot directory
``state/batch=N/{frontier,politeness,metrics}`` and commits it by writing
``_COMMIT.json`` LAST (rename-free single-file commit — the marker either
exists or the snapshot is invisible). Output tables are append-only
per-batch directories ``tables/<name>/batch=N`` written with overwrite mode,
so replaying a batch after a crash is idempotent. Resume = load the highest
committed snapshot and ignore orphan (uncommitted) batch dirs.

On a real cluster this maps 1:1 onto Iceberg snapshots + MERGE INTO; the
frontier rewrite-per-batch here becomes a merge-on-read delta there.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

STATE = "state"
TABLES = "tables"


@dataclass
class Snapshot:
    batch_id: int
    frontier: DataFrame
    politeness: DataFrame


def _batch_dir(out_dir: str, batch_id: int) -> Path:
    return Path(out_dir) / STATE / f"batch={batch_id}"


def commit_snapshot(out_dir: str, batch_id: int, frontier: DataFrame,
                    politeness: DataFrame, metrics: DataFrame | None,
                    extra: dict | None = None) -> None:
    d = _batch_dir(out_dir, batch_id)
    # orphan from a killed run: drop only the stale marker; the overwrite
    # writes below replace the data dirs (a pre-written bloom/cuckoo subdir
    # from THIS batch must survive — it is committed by the same marker)
    marker = d / "_COMMIT.json"
    if marker.exists():
        marker.unlink()
    frontier.write.mode("overwrite").parquet(str(d / "frontier"))
    politeness.write.mode("overwrite").parquet(str(d / "politeness"))
    if metrics is not None:
        metrics.write.mode("overwrite").parquet(str(d / "metrics"))
    payload = {"batch_id": batch_id, "committed_at": time.time(), **(extra or {})}
    (d / "_COMMIT.json").write_text(json.dumps(payload))


def latest_committed(out_dir: str) -> int | None:
    state = Path(out_dir) / STATE
    if not state.exists():
        return None
    ids = [
        int(p.name.split("=")[1])
        for p in state.iterdir()
        if p.name.startswith("batch=") and (p / "_COMMIT.json").exists()
    ]
    return max(ids) if ids else None


def load_snapshot(spark: SparkSession, out_dir: str) -> Snapshot | None:
    bid = latest_committed(out_dir)
    if bid is None:
        return None
    d = _batch_dir(out_dir, bid)
    return Snapshot(
        batch_id=bid,
        frontier=spark.read.parquet(str(d / "frontier")),
        politeness=spark.read.parquet(str(d / "politeness")),
    )


def write_table_batch(df: DataFrame, out_dir: str, name: str, batch_id: int) -> None:
    df.write.mode("overwrite").parquet(str(Path(out_dir) / TABLES / name / f"batch={batch_id}"))


def read_table(spark: SparkSession, out_dir: str, name: str,
               max_batch: int | None = None) -> DataFrame | None:
    base = Path(out_dir) / TABLES / name
    if not base.exists():
        return None
    dirs = sorted(base.glob("batch=*"), key=lambda p: int(p.name.split("=")[1]))
    if max_batch is not None:  # resume: ignore orphan batches beyond the commit
        dirs = [p for p in dirs if int(p.name.split("=")[1]) <= max_batch]
    if not dirs:
        return None
    return spark.read.parquet(*[str(p) for p in dirs])


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame | None:
    state = Path(out_dir) / STATE
    dirs = [p / "metrics" for p in state.glob("batch=*")
            if (p / "_COMMIT.json").exists() and (p / "metrics").exists()]
    if not dirs:
        return None
    return spark.read.parquet(*[str(p) for p in dirs])
