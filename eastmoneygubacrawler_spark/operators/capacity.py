"""P6/P7 — host capacity scoring (the data-plane analog of the reference's
proxy pool).

The reference maintains a Redis hash of proxy→score: +5 on success, −10 on
failure, evicted below 30, new entries start at 100 scaled by RTT
(core/proxy_manager.py:227-244, 467-474).  The proxies exist to spread load
over a rate-limiting host; in a distributed crawler the same bookkeeping
applies per *host*: a failure budget that throttles/suspends hosts that keep
failing (bans, decoys, outages).

Spark translation: the sequential ±updates commute (score = base + 5·ok −
10·fail), so one aggregation per round merged into the capacity table — no
sequential state.  ``suspended`` hosts get politeness budget 0 next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_SCORE = 100
SUCCESS_DELTA = 5  # core/proxy_manager.py:233
FAILURE_DELTA = -10  # core/proxy_manager.py:239
EVICT_BELOW = 30  # core/proxy_manager.py:242
MAX_SCORE = 100


def round_host_scores(fetch_results: DataFrame) -> DataFrame:
    """Per-host score delta from one round's fetch outcomes.

    fetch_results: (host, ok: boolean) one row per fetch attempt.
    """
    return fetch_results.groupBy("host").agg(
        F.sum(F.when(F.col("ok"), SUCCESS_DELTA).otherwise(FAILURE_DELTA)).alias(
            "delta"
        ),
        F.count("*").alias("attempts"),
        F.sum(F.col("ok").cast("long")).alias("successes"),
    )


def merge_capacity(capacity_prev: DataFrame | None, deltas: DataFrame) -> DataFrame:
    """MERGE round deltas into the capacity table; clamp to [0, MAX_SCORE];
    hosts below EVICT_BELOW are suspended (politeness budget 0)."""
    if capacity_prev is None:
        merged = deltas.withColumn("score", F.lit(BASE_SCORE) + F.col("delta"))
    else:
        merged = (
            capacity_prev.select("host", F.col("score").alias("prev_score"))
            .join(deltas, on="host", how="full_outer")
            .withColumn(
                "score",
                F.coalesce(F.col("prev_score"), F.lit(BASE_SCORE))
                + F.coalesce(F.col("delta"), F.lit(0)),
            )
        )
    return merged.select(
        "host",
        F.least(F.greatest(F.col("score"), F.lit(0)), F.lit(MAX_SCORE)).alias("score"),
        (F.col("score") < EVICT_BELOW).alias("suspended"),
    )


def healthy_hosts(capacity: DataFrame) -> DataFrame:
    """A7 analog: rank by score desc, keep the top half (the reference samples
    proxies from the top half of the pool, core/proxy_manager.py:188-197)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("host"))
    return (
        capacity.filter(~F.col("suspended"))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.5)
        .drop("pr")
    )
