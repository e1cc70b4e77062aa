"""Per-host politeness: token bucket + robots rules.

Reference analog: `time.sleep(DELAY_TIME)` per article / `NEXT_PAGE_DELAY_TIME`
per index page in a single thread (crawler/article.py:480, 512, 554;
config_example.ini:14-15). Distributed re-expression: each micro-batch
advances a LOGICAL clock by `batch_seconds`; a per-host token bucket
(capacity = burst, refill = batch_seconds/delay_s) admits the top-k pending
URLs per host in (priority desc, discovery_seq asc) order; the rest are
DEFERRED to the next batch. Politeness therefore affects WHICH batch a URL
lands in, never its per-host order — the invariant the order-parity tests
pin.

Two implementations with identical admission semantics (tests assert this):

- ``admit_window``: pure Catalyst — rank() window per host + join with the
  state table + filter(rank <= floor(tokens)). Whole-stage-codegen'd,
  spill-safe, the default.
- ``admit_apply_in_pandas``: groupBy(host).applyInPandas, the north-rule
  shape; also evaluates robots.txt disallow rules (genuinely procedural).

Skew note (10^10 scale): a host can only ever be admitted ``ceil(tokens)``
rows per batch, so both paths pre-truncate each host's group to the top
``ceil(tokens)`` rows with a window BEFORE any per-group materialization —
a hot host with 10^9 pending URLs never builds a 10^9-row pandas group.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def order_cols():
    return [F.col("priority").desc(), F.col("discovery_seq").asc(),
            F.col("url").asc()]  # url as the total-order tiebreak


def _host_window() -> Window:
    return Window.partitionBy("host").orderBy(*order_cols())


def refill(state: DataFrame, batch_seconds: float, capacity: float) -> DataFrame:
    """tokens ← min(capacity, tokens + batch_seconds/delay_s)."""
    return state.withColumn(
        "tokens",
        F.least(F.lit(float(capacity)),
                F.col("tokens") + F.lit(float(batch_seconds)) / F.col("delay_s")),
    )


def admit_window(pending: DataFrame, state: DataFrame,
                 strict_barrier: bool = False,
                 max_budget: int | None = None) -> DataFrame:
    """Returns pending + boolean ``admit``; state must carry current tokens.

    rank <= floor(tokens): the bucket spends whole tokens only, fractional
    balance carries to the next batch (classic token bucket).

    Discovery barrier: admission for a host STOPS after the first
    index/bootstrap row in the prefix — that row spawns higher-priority work
    (its articles / its page range) that must be fetched before anything
    currently ranked below it, exactly like the reference's sequential loop
    (crawler/article.py:419-511 fetches a page's articles before the next
    index page). Without the barrier, index p-1 could be admitted in the
    same batch as index p, ahead of page p's yet-undiscovered articles.

    ``max_budget`` — hot-host scale path. The exact plan ranks EVERY pending
    row per host, so a host holding 10^9 frontier rows fully sorts inside
    one window partition (measured 1.8x the uniform wall-time at 90%
    single-host skew). When the caller knows a LITERAL upper bound on any
    host's per-batch budget (the token bucket's burst capacity — a config
    scalar, so the engine always does), rows ranked past ``max_budget``
    can never be admitted, and filtering ``rank <= lit(cap)`` lets Catalyst
    insert WindowGroupLimit (SPARK-37099): each map task keeps only its
    top-cap rows per host BEFORE the host shuffle, so the reducer sorts
    O(cap x map_tasks) rows per host, never the host's full backlog. The
    admit flags (identical bits — rank > cap implies rank > budget, and a
    barrier index past cap cannot gate any admissible rank) are computed on
    that top-cap slice and joined back to pending by url (unique in a
    deduped frontier); AQE broadcasts the O(cap x hosts) flag side while it
    fits and falls back to a skew-free url equi-join beyond that.
    """
    ranked = pending.withColumn("_rank", F.row_number().over(_host_window()))
    if max_budget is not None:
        top = ranked.where(F.col("_rank") <= F.lit(int(max_budget)))
        flags = _admit_flags(top, state, strict_barrier).select("url", "admit")
        return (pending.join(flags, "url", "left")
                .withColumn("admit",
                            F.coalesce(F.col("admit"), F.lit(False))))
    return _admit_flags(ranked, state, strict_barrier)


def _admit_flags(ranked: DataFrame, state: DataFrame,
                 strict_barrier: bool) -> DataFrame:
    """Token-bucket + discovery-barrier admit bit over per-host ranked rows
    (shared by the exact and WindowGroupLimit-capped admit_window paths)."""
    first_idx = (
        ranked.where(F.col("kind") != "article")
        .groupBy("host").agg(F.min("_rank").alias("_first_idx"))
    )
    st = state.select("host", F.floor("tokens").alias("_budget"))
    fi = F.coalesce(F.col("_first_idx"), F.lit(1 << 62))
    # strict barrier (start-date early-stop mode): the next index page may
    # NOT ride in the same batch as the preceding page's articles — its
    # fetch must wait until the date-filter verdict on those articles is in
    # (crawler/article.py:486-503 stops BEFORE fetching the next index page)
    barrier = F.when(F.lit(strict_barrier) & (fi > 1), fi - 1).otherwise(fi)
    return (
        ranked.join(F.broadcast(st), "host", "left")
        .join(F.broadcast(first_idx), "host", "left")
        .withColumn(
            "admit",
            (F.col("_rank") <= F.coalesce(F.col("_budget"), F.lit(0)))
            & (F.col("_rank") <= barrier),
        )
        .drop("_rank", "_budget", "_first_idx")
    )


def admit_apply_in_pandas(pending: DataFrame, state: DataFrame,
                          robots: dict[str, list[str]] | None = None,
                          strict_barrier: bool = False) -> DataFrame:
    """North-rule shape: groupBy(host).applyInPandas token bucket.

    robots: host → list of disallowed path prefixes; disallowed rows get
    admit=False and robots_blocked=True (the engine marks them failed).
    """
    robots = robots or {}
    cap_w = _host_window()
    st = state.select("host", "tokens")
    # Pin the host-shuffle partition count BEFORE the window. The admitted
    # set is tiny in BYTES (<= ceil(tokens) rows per host), so AQE's
    # byte-based coalescing folds an ENSURE_REQUIREMENTS host exchange into
    # ONE partition — and per-group cost here is Python-side (one pandas
    # call per host), which bytes don't predict: at 10^5 hosts a single
    # worker serializes ~10^5 group calls (measured ~12 min/action
    # coalesced vs seconds fanned out). An explicit repartition(n, host) is
    # exempt from AQE coalescing, and placed HERE it is the ONLY host
    # exchange in the chain: the rank window, the broadcast state join, and
    # the groupBy.applyInPandas all have their ClusteredDistribution(host)
    # satisfied by it, so EnsureRequirements inserts no coalescible
    # exchange anywhere on the path. (Pinning AFTER the window does not
    # survive AQE: at runtime the re-planner merges the user shuffle into
    # the window's same-key ENSURE_REQUIREMENTS exchange and coalesces it
    # — measured as a 1-task pandas stage at 10^5 hosts.)
    n_shuffle = int(pending.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    pending = pending.repartition(n_shuffle, "host")
    # pre-truncate per host: nothing beyond ceil(tokens) can be admitted
    ranked = (
        pending.withColumn("_rank", F.row_number().over(cap_w))
        .join(F.broadcast(st), "host", "left")
        .withColumn("_tokens", F.coalesce(F.col("tokens"), F.lit(0.0)))
        .drop("tokens")
    )
    capped = ranked.where(F.col("_rank") <= F.ceil("_tokens"))
    overflow = ranked.where(F.col("_rank") > F.ceil("_tokens"))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pending.schema.fields
    ) + ", admit boolean, robots_blocked boolean"

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["priority", "discovery_seq", "url"],
                              ascending=[False, True, True]).reset_index(drop=True)
        host = pdf["host"].iloc[0] if len(pdf) else ""
        disallow = robots.get(host, [])
        blocked = pd.Series(False, index=pdf.index)
        if disallow:  # path regex only when the host HAS rules (hot-path cost)
            path = pdf["url"].str.replace(r"^[a-z+.-]+://[^/]*", "", regex=True)
            for pref in disallow:
                blocked |= path.str.startswith(pref)
        budget = int(math.floor(pdf["_tokens"].iloc[0])) if len(pdf) else 0
        admit = pd.Series(False, index=pdf.index)
        spent = 0
        for i in pdf.index:
            if blocked[i]:
                continue
            if spent < budget:
                if strict_barrier and pdf["kind"][i] != "article" and spent > 0:
                    break  # strict: next index waits for the date verdict
                admit[i] = True
                spent += 1
                if pdf["kind"][i] != "article":
                    break  # discovery barrier (see admit_window docstring)
            else:
                break  # prefix admission: order is priority-sorted
        pdf = pdf.assign(admit=admit, robots_blocked=blocked)
        return pdf.drop(columns=["_rank", "_tokens"])

    result = capped.groupBy("host").applyInPandas(bucket, schema=out_schema)
    return result.unionByName(
        overflow.drop("_rank", "_tokens")
        .withColumn("admit", F.lit(False))
        .withColumn("robots_blocked", F.lit(False))
    )


def spend(state: DataFrame, admitted_counts: DataFrame) -> DataFrame:
    """tokens ← tokens − admitted(host); admitted_counts: (host, n_admitted)."""
    return (
        state.join(admitted_counts, "host", "left")
        .withColumn("tokens", F.col("tokens") - F.coalesce(F.col("n_admitted"), F.lit(0)).cast("double"))
        .drop("n_admitted")
    )
