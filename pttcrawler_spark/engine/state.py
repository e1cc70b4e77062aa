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
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

STATE = "state"
TABLES = "tables"


def _sized(df: DataFrame) -> DataFrame:
    """AQE-sized write: the REBALANCE hint inserts a shuffle whose output
    partitions AQE coalesces/splits to the advisory size, so file count
    tracks data size — one file for a 256-row politeness table now, ~64 MB
    files for a 10^10-row frontier on a cluster. Without this every tiny
    state write emits `shuffle.partitions` near-empty files, and the
    per-file open/footer/codec cost dominates the batch (measured: ~3 s of
    a 7 s steady batch at local[32])."""
    return df.hint("rebalance")


@dataclass
class Snapshot:
    batch_id: int
    frontier: DataFrame
    politeness: DataFrame


def _batch_dir(out_dir: str, batch_id: int) -> Path:
    return Path(out_dir) / STATE / f"batch={batch_id}"


def commit_batch(out_dir: str, batch_id: int, frontier: DataFrame,
                 politeness: DataFrame, metrics: DataFrame | None = None,
                 tables: dict[str, DataFrame] | None = None,
                 extra: dict | None = None) -> None:
    """Write ALL of a batch's outputs (state + output tables), marker LAST.

    The writes are independent Spark jobs, so they are submitted from a
    driver-side thread pool and run concurrently — on a mostly-idle local[32]
    this overlaps ~8 small job latencies into ~1 (measured: steady batch
    7 s → ~4 s). Durability is unchanged: every write is an idempotent
    overwrite into the batch directory and the _COMMIT.json marker is only
    written after every write has succeeded — a crash mid-batch leaves an
    uncommitted orphan that resume overwrites.
    """
    d = _batch_dir(out_dir, batch_id)
    # orphan from a killed run: drop only the stale marker; the overwrite
    # writes below replace the data dirs (a pre-written bloom/cuckoo subdir
    # from THIS batch must survive — it is committed by the same marker)
    marker = d / "_COMMIT.json"
    if marker.exists():
        marker.unlink()
    # state tables are small → REBALANCE into size-appropriate files.
    # Output tables (image payloads!) keep their natural partitioning from
    # the fetch scan — a rebalance would shuffle every image byte a second
    # time — and use snappy: the payload bytes are already codec-compressed,
    # so heavier codecs only burn CPU on incompressible data.
    jobs: list[tuple[str, DataFrame, bool]] = [
        (str(d / "frontier"), frontier, True),
        (str(d / "politeness"), politeness, True),
    ]
    if metrics is not None:
        jobs.append((str(d / "metrics"), metrics, True))
    for name, df in (tables or {}).items():
        jobs.append((str(Path(out_dir) / TABLES / name / f"batch={batch_id}"), df, False))

    debug = os.environ.get("SPARK_GRAFT_DEBUG_TIMING") == "1"

    def _write(item: tuple[str, DataFrame, bool]) -> None:
        path, df, is_state = item
        t0 = time.perf_counter()
        if is_state:
            _sized(df).write.mode("overwrite").parquet(path)
        else:
            df.write.mode("overwrite").option("compression", "snappy").parquet(path)
        if debug:
            print(f"        [write] {Path(path).name if 'batch=' not in Path(path).name else Path(path).parent.name}: "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)

    with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
        list(ex.map(_write, jobs))  # list() re-raises the first failure
    payload = {"batch_id": batch_id, "committed_at": time.time(), **(extra or {})}
    (d / "_COMMIT.json").write_text(json.dumps(payload))


def commit_snapshot(out_dir: str, batch_id: int, frontier: DataFrame,
                    politeness: DataFrame, metrics: DataFrame | None,
                    extra: dict | None = None) -> None:
    commit_batch(out_dir, batch_id, frontier, politeness, metrics, extra=extra)


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
    _sized(df).write.mode("overwrite").parquet(
        str(Path(out_dir) / TABLES / name / f"batch={batch_id}"))


def read_table(spark: SparkSession, out_dir: str, name: str,
               max_batch: int | None = None,
               with_batch: bool = False) -> DataFrame | None:
    """Union of the per-batch output dirs. ``with_batch=True`` reads via
    basePath so the ``batch=N`` directory becomes a ``batch`` column —
    version ORDER AS DATA for SCD-2 consumers (engine/store.py)."""
    base = Path(out_dir) / TABLES / name
    if not base.exists():
        return None
    dirs = sorted(base.glob("batch=*"), key=lambda p: int(p.name.split("=")[1]))
    if max_batch is not None:  # resume: ignore orphan batches beyond the commit
        dirs = [p for p in dirs if int(p.name.split("=")[1]) <= max_batch]
    if not dirs:
        return None
    if with_batch:
        return (spark.read.option("basePath", str(base))
                .parquet(*[str(p) for p in dirs]))
    return spark.read.parquet(*[str(p) for p in dirs])


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame | None:
    state = Path(out_dir) / STATE
    dirs = [p / "metrics" for p in state.glob("batch=*")
            if (p / "_COMMIT.json").exists() and (p / "metrics").exists()]
    if not dirs:
        return None
    return spark.read.parquet(*[str(p) for p in dirs])
