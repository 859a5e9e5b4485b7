"""P6 host-capacity scoring (proxy-pool analog)."""

from eastmoneygubacrawler_spark.operators.capacity import (
    healthy_hosts,
    merge_capacity,
    round_host_scores,
)


def test_scores_and_eviction(spark):
    rows = (
        [("good.com", True)] * 10
        + [("flaky.com", True)] * 2 + [("flaky.com", False)] * 3
        + [("bad.com", False)] * 8
    )
    deltas = round_host_scores(spark.createDataFrame(rows, ["host", "ok"]))
    cap = merge_capacity(None, deltas)
    by_host = {r.host: (r.score, r.suspended) for r in cap.collect()}
    assert by_host["good.com"] == (100, False)  # clamped at max
    assert by_host["flaky.com"] == (80, False)  # 100 + 10 - 30
    assert by_host["bad.com"] == (20, True)  # 100 - 80 → below 30 ⇒ suspended


def test_merge_is_incremental(spark):
    d1 = round_host_scores(
        spark.createDataFrame([("h.com", False)] * 5, ["host", "ok"])
    )
    cap1 = merge_capacity(None, d1)
    d2 = round_host_scores(
        spark.createDataFrame([("h.com", False)] * 3 + [("new.com", True)], ["host", "ok"])
    )
    cap2 = merge_capacity(cap1, d2)
    by_host = {r.host: (r.score, r.suspended) for r in cap2.collect()}
    assert by_host["h.com"] == (20, True)  # 50 then -30
    assert by_host["new.com"] == (100, False)


def test_healthy_hosts_top_half(spark):
    cap = spark.createDataFrame(
        [("a", 100, False), ("b", 90, False), ("c", 80, False), ("d", 70, False),
         ("e", 10, True)],
        ["host", "score", "suspended"],
    )
    top = sorted(r.host for r in healthy_hosts(cap).collect())
    assert top == ["a", "b"]
