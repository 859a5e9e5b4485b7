"""P9 UA rotation as data (reference core/user_agent_manager.py:16-121):
blacklist availability + reset, sequential round-robin, seeded 'random'
with avoid-consecutive."""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.operators.useragents import (
    assign_user_agents,
    available_user_agents,
)


def _uas(spark, n=5):
    return spark.range(n).select(
        F.concat(F.lit("UA-"), F.col("id").cast("string")).alias("ua"),
        F.col("id").alias("ua_rank"),
    )


def test_blacklist_filters_and_expires(spark):
    uas = _uas(spark)
    bl = spark.createDataFrame(
        [("UA-1", 9e9), ("UA-3", 10.0)], "ua string, until_ts double"
    )
    avail = available_user_agents(uas, bl, now_ts=100.0)
    rows = {r.ua: r.ua_slot for r in avail.collect()}
    # UA-1 still blacklisted; UA-3 expired; slots contiguous in rank order
    assert rows == {"UA-0": 0, "UA-2": 1, "UA-3": 2, "UA-4": 3}


def test_all_blacklisted_resets(spark):
    """core/user_agent_manager.py:100-103: everything blacklisted ⇒ reset."""
    uas = _uas(spark, 3)
    bl = spark.createDataFrame(
        [("UA-0", 9e9), ("UA-1", 9e9), ("UA-2", 9e9)], "ua string, until_ts double"
    )
    avail = available_user_agents(uas, bl, now_ts=0.0)
    assert avail.count() == 3  # full list again


def test_sequential_round_robin(spark):
    uas = _uas(spark, 3)
    avail = available_user_agents(uas)
    rows = spark.createDataFrame(
        [(i, f"http://h.com/{i}", "h") for i in range(7)],
        "okey long, url string, host string",
    )
    got = assign_user_agents(
        rows, avail, mode="sequential", order_cols=["okey"], n_partitions=4
    )
    by_key = {r.okey: r.ua for r in got.collect()}
    assert by_key == {i: f"UA-{i % 3}" for i in range(7)}


def test_random_mode_avoids_consecutive_raw_repeat(spark):
    uas = _uas(spark, 4)
    avail = available_user_agents(uas)
    rows = spark.createDataFrame(
        [(i, f"http://h{i % 2}.com/{i}", f"h{i % 2}") for i in range(60)],
        "okey long, url string, host string",
    )
    got = assign_user_agents(rows, avail, mode="random", order_cols=["okey"])
    # deterministic across runs
    again = assign_user_agents(rows, avail, mode="random", order_cols=["okey"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))
    # reconstruct the raw picks host-by-host and check the adjusted rule
    import hashlib

    by_host: dict = {}
    for r in sorted(got.collect(), key=lambda r: (r.host, r.okey)):
        h = hashlib.md5(r.url.encode()).hexdigest()
        raw = int(h[:2], 16) % 4
        prev_raw = by_host.get(r.host)
        want = (raw + 1) % 4 if raw == prev_raw else raw
        assert r.ua == f"UA-{want}", (r.okey, r.ua, want)
        by_host[r.host] = raw
