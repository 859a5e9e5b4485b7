"""Custom stateful streaming operator: per-host consecutive-failure streaks.

The streaming form of the engine's J4/A8 streak algebra (duplicate-page
horizon / max-streak): a crawl-event stream is grouped by host and an
``applyInPandasWithState`` operator carries each host's running
consecutive-failure count ACROSS micro-batches, emitting an alert row
whenever the streak reaches the threshold — the live circuit-breaker the
reference approximates with its proxy score decay (core/proxy_manager.py:
227-244, −10 per failure, suspend <30).

State = one long per host.  Events inside a batch are processed in ``ts``
order; the alert carries the streak length and the timestamp that tripped
it.  With ``Trigger.availableNow`` the same operator runs as a batch
catch-up, and the checkpoint proves state survives across separate runs
(tests/test_sources_streaming_plans.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("streak", LongType()),
        StructField("tripped_at", TimestampType()),
    ]
)
STATE_SCHEMA = StructType([StructField("streak", LongType())])


def host_failure_streaks(events: DataFrame, threshold: int = 3) -> DataFrame:
    """events (host, ts, status, …) → alert rows when a host's consecutive
    failures reach ``threshold`` (and again on every further failure while
    the streak persists — the caller throttles)."""

    def _track(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        streak = state.get[0] if state.exists else 0
        alerts: list[tuple] = []
        for pdf in pdfs:
            for _, row in pdf.sort_values("ts").iterrows():
                if row["status"] == "ok":
                    streak = 0
                else:
                    streak += 1
                    if streak >= threshold:
                        alerts.append((host, streak, row["ts"]))
        state.update((int(streak),))
        yield pd.DataFrame(alerts, columns=["host", "streak", "tripped_at"])

    return events.groupBy("host").applyInPandasWithState(
        _track,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streak_monitor_once(
    spark, events_dir: str, out_dir: str, checkpoint_dir: str, threshold: int = 3
) -> None:
    """Drain available events (availableNow) through the stateful operator
    into a parquet alert sink; re-invocations resume host state from the
    checkpoint (the poll-loop form, T1)."""
    from .metrics_stream import EVENT_SCHEMA

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(events_dir)
    )
    q = (
        host_failure_streaks(stream, threshold)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
