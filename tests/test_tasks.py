"""S10 task-queue operators (archive/task_scheduler_api.py analog)."""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.operators.tasks import (
    claim_batch,
    complete,
    next_task,
)


def _fixtures(spark):
    queue = spark.createDataFrame(
        [
            (1, 10, 5, "pending"),
            (2, 10, 1, "pending"),
            (3, 11, 1, "pending"),   # inactive config → never claimable
            (4, 10, 1, "completed"),
            (5, 10, 2, "running"),
        ],
        ["id", "task_config_id", "queue_position", "status"],
    )
    configs = spark.createDataFrame(
        [(10, "crawl_guba", "guba", 1), (11, "old", "guba", 0)],
        ["id", "task_name", "crawler_type", "is_active"],
    )
    return queue, configs


def test_next_task_order_and_filters(spark):
    queue, configs = _fixtures(spark)
    got = next_task(queue, configs).collect()
    # lowest (queue_position, id) among pending+active: id=2 (pos 1) beats
    # id=1 (pos 5); id=3 excluded (inactive config); 4/5 not pending
    assert [(r.id, r.task_name) for r in got] == [(2, "crawl_guba")]


def test_claim_batch_flips_top_n_only(spark):
    queue, configs = _fixtures(spark)
    out = claim_batch(queue, configs, n=1)
    st = {r.id: r.status for r in out.collect()}
    assert st == {1: "pending", 2: "running", 3: "pending", 4: "completed", 5: "running"}
    # idempotent on replay: claiming again flips the next one, not re-flips
    out2 = claim_batch(out, configs, n=1)
    st2 = {r.id: r.status for r in out2.collect()}
    assert st2[1] == "running" and st2[2] == "running"


def test_complete_transitions_running_only(spark):
    queue, configs = _fixtures(spark)
    done = spark.createDataFrame([(5,), (4,)], ["id"])
    st = {r.id: r.status for r in complete(queue, done, ok=False).collect()}
    assert st[5] == "failed"
    assert st[4] == "completed"  # not running → untouched
