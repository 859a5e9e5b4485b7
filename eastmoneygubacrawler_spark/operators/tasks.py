"""S10: task-queue semantics as data (reference archive/task_scheduler_api.py).

The reference runs a SQL priority queue: ``_get_next_task`` (:203-213) picks
the single pending task with the lowest (queue_position, id) joined to its
active config, and status transitions (pending → running → completed/failed)
are row updates.  The dataflow analog keeps the queue as a table and makes
every transition a pure projection — no driver loop owns the queue:

- ``next_task``: the reference's exact ORDER BY … LIMIT 1, as a join +
  deterministic rank (oracle-checked; at scale, ``claim_batch`` is the
  useful form — one task per distributed worker slot).
- ``claim_batch``: top-N pending tasks flip to running, everything else
  unchanged — one window + one projection, idempotent on replay.
- ``complete``: running → completed/failed by task_id set.

Status lives in the SnapshotStore like the frontier (snapshot table); a
killed scheduler resumes from the last committed queue state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pending_ranked(queue: DataFrame, configs: DataFrame) -> DataFrame:
    """pending ∧ active-config tasks, ranked by (queue_position, id) —
    the reference's ORDER BY (archive/task_scheduler_api.py:210-212)."""
    w = Window.orderBy(F.asc("queue_position"), F.asc("id"))
    return (
        queue.filter(F.col("status") == "pending")
        .join(
            configs.filter(F.col("is_active") == 1).select(
                F.col("id").alias("task_config_id"), "task_name", "crawler_type"
            ),
            on="task_config_id",
        )
        .withColumn("claim_rank", F.row_number().over(w))
    )


def next_task(queue: DataFrame, configs: DataFrame) -> DataFrame:
    """The single next task (LIMIT 1 analog).  The global window is bounded
    by the queue table (operational metadata, thousands of rows) — the same
    bounded-input argument as _seed_ranks."""
    return _pending_ranked(queue, configs).filter(F.col("claim_rank") == 1).select(
        "id", "task_config_id", "queue_position", "task_name", "crawler_type"
    )


def claim_batch(queue: DataFrame, configs: DataFrame, n: int) -> DataFrame:
    """Flip the top-``n`` pending tasks to running; returns the full queue
    with updated statuses (commit as the new snapshot)."""
    claimed = (
        _pending_ranked(queue, configs)
        .filter(F.col("claim_rank") <= n)
        .select(F.col("id").alias("_cid"))
    )
    return (
        queue.join(F.broadcast(claimed), on=F.col("id") == F.col("_cid"), how="left")
        .withColumn(
            "status",
            F.when(F.col("_cid").isNotNull(), F.lit("running")).otherwise(
                F.col("status")
            ),
        )
        .drop("_cid")
    )


def complete(queue: DataFrame, task_ids: DataFrame, ok: bool = True) -> DataFrame:
    """running → completed/failed for the given (id) set."""
    new_status = "completed" if ok else "failed"
    return (
        queue.join(
            F.broadcast(task_ids.select(F.col("id").alias("_did"))),
            on=F.col("id") == F.col("_did"),
            how="left",
        )
        .withColumn(
            "status",
            F.when(
                F.col("_did").isNotNull() & (F.col("status") == "running"),
                F.lit(new_status),
            ).otherwise(F.col("status")),
        )
        .drop("_did")
    )
