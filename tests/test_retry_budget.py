"""Cross-round retry (R1-R5), MERGE-on-refetch (S6), and politeness budget."""

import pytest
from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
from eastmoneygubacrawler_spark.fixtures import (
    FixtureConfig,
    build_corpus,
    simulate_reference_crawl,
)
from eastmoneygubacrawler_spark.schema import PAGES, ROBOTS, SEEDS
from eastmoneygubacrawler_spark.storage import SnapshotStore


@pytest.fixture(scope="module")
def small_corpus():
    return build_corpus(FixtureConfig(n_stocks=2, max_count=120, adversarial=False))


def _dfs(spark, corpus):
    pages = spark.createDataFrame(corpus["pages"], PAGES)
    seeds = spark.createDataFrame(corpus["seeds"], SEEDS)
    robots = spark.createDataFrame(corpus["robots"], ROBOTS)
    return pages, seeds, robots


def test_failed_text_fetch_retried_next_round(spark, small_corpus, tmp_path):
    pages, seeds, robots = _dfs(spark, small_corpus)
    golden = simulate_reference_crawl(small_corpus)
    # pick a post URL that normally gets text, and hide its page in round 0
    target = next(p["url"] for p in golden["posts"] if p["full_text"])
    pages_broken = pages.filter(F.col("url") != target)

    store = SnapshotStore(str(tmp_path / "s"))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False, max_attempts=5)

    run_crawl(spark, store, pages_broken, seeds, robots, None, cfg)
    posts = store.load(spark, "posts")
    row = posts.filter(F.col("url") == target).collect()
    assert row and all(r.full_text is None for r in row)
    frontier = store.load(spark, "frontier")
    fr = frontier.filter((F.col("url") == target) & (F.col("depth") == 1)).collect()
    assert len(fr) == 1 and fr[0].status == "retry" and fr[0].attempts == 1

    # round 1: the page is reachable now → text merged into the existing row
    run_crawl(spark, store, pages, seeds, robots, None, cfg)
    posts2 = store.load(spark, "posts")
    row2 = posts2.filter(F.col("url") == target).collect()
    expected_text = next(p["full_text"] for p in golden["posts"] if p["url"] == target)
    assert row2 and row2[0].full_text == expected_text
    # retry row resolved
    fr2 = store.load(spark, "frontier").filter(
        (F.col("url") == target) & (F.col("depth") == 1)
    ).collect()
    assert fr2 == []
    # seen now contains the url
    assert store.load(spark, "seen").filter(F.col("url") == target).count() == 1


def test_permanent_failure_after_max_attempts(spark, small_corpus, tmp_path):
    pages, seeds, robots = _dfs(spark, small_corpus)
    golden = simulate_reference_crawl(small_corpus)
    target = next(p["url"] for p in golden["posts"] if p["full_text"])
    pages_broken = pages.filter(F.col("url") != target)
    store = SnapshotStore(str(tmp_path / "s"))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False, max_attempts=2)

    run_crawl(spark, store, pages_broken, seeds, robots, None, cfg)
    run_crawl(spark, store, pages_broken, seeds, robots, None, cfg)
    # terminally-failed rows leave the O(active) frontier snapshot for the
    # append-only frontier_failed table (never rewritten round-over-round)
    fr = store.load(spark, "frontier").filter(
        (F.col("url") == target) & (F.col("depth") == 1)
    ).collect()
    assert fr == []
    ff = store.load(spark, "frontier_failed").filter(
        (F.col("url") == target) & (F.col("depth") == 1)
    ).collect()
    assert len(ff) == 1 and ff[0].status == "failed" and ff[0].attempts == 2
    # a further round does NOT refetch it, and appends no duplicate row
    run_crawl(spark, store, pages_broken, seeds, robots, None, cfg)
    assert store.load(spark, "frontier").filter(
        (F.col("url") == target) & (F.col("depth") == 1)
    ).collect() == []
    ff3 = store.load(spark, "frontier_failed").filter(
        (F.col("url") == target) & (F.col("depth") == 1)
    ).collect()
    assert len(ff3) == 1 and ff3[0].status == "failed"


def test_small_list_budget_multiwave_same_final_state(spark, small_corpus, tmp_path):
    pages, seeds, robots = _dfs(spark, small_corpus)
    cfg_unlimited = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False)
    s1 = SnapshotStore(str(tmp_path / "u"))
    m1 = run_crawl(spark, s1, pages, seeds, robots, None, cfg_unlimited)

    cfg_budget = CrawlConfig(
        n_shards=8, fetch_partitions=8, use_bloom=False, budget_per_host=3,
        text_budget_per_host=1_000_000,
    )
    s2 = SnapshotStore(str(tmp_path / "b"))
    m2 = run_crawl(spark, s2, pages, seeds, robots, None, cfg_budget)
    # list waves were budgeted: more waves than the unlimited run
    assert m2["waves"] > m1["waves"]

    def posts_tbl(store):
        return sorted(
            map(tuple, store.load(spark, "posts").select(
                "stock_code", "content_type", "url_id", "crawl_seq", "full_text"
            ).collect())
        )

    assert posts_tbl(s1) == posts_tbl(s2)


def test_politeness_table_drives_per_host_budget(spark, tmp_path):
    """P5: per-site intervals from the politeness table override the default
    (core/user_agent_config.py:123-135): a huge guba delay caps list fetches
    per round; other hosts are unaffected."""
    from eastmoneygubacrawler_spark.schema import POLITENESS

    corpus = build_corpus(FixtureConfig(n_stocks=1, max_count=240, adversarial=False))
    pages, seeds, robots = _dfs(spark, corpus)
    politeness = spark.createDataFrame(
        [("guba.eastmoney.com", 1800.0, 60.0, 20)], POLITENESS
    )  # delay 1800s of a 3600s round ⇒ 2 list pages per wave
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False)
    store = SnapshotStore(str(tmp_path / "pol"))
    m = run_crawl(spark, store, pages, seeds, robots, politeness, cfg)
    # 1 stock × 3 types × 3 pages = 9 list pages at 2/wave ⇒ ≥5 waves
    assert m["waves"] >= 5
    golden = simulate_reference_crawl(corpus)
    got = store.load(spark, "posts").count()
    assert got == len(golden["posts"])  # budget paces, never drops


def test_text_budget_pending_carryover(spark, tmp_path):
    corpus = build_corpus(FixtureConfig(n_stocks=1, max_count=12, adversarial=False))
    pages, seeds, robots = _dfs(spark, corpus)
    cfg = CrawlConfig(
        n_shards=8, fetch_partitions=8, use_bloom=False, text_budget_per_host=10
    )
    store = SnapshotStore(str(tmp_path / "p"))
    run_crawl(spark, store, pages, seeds, robots, None, cfg)
    pending0 = store.load(spark, "frontier").filter("status = 'pending'").count()
    assert pending0 > 0  # ~36 post urls, budget 10/round
    for _ in range(8):
        if store.load(spark, "frontier").filter("status = 'pending'").count() == 0:
            break
        run_crawl(spark, store, pages, seeds, robots, None, cfg)
    assert store.load(spark, "frontier").filter("status = 'pending'").count() == 0
    golden = simulate_reference_crawl(corpus)
    exp_full = sum(1 for p in golden["posts"] if p["full_text"] is not None)
    got_full = store.load(spark, "posts").filter(F.col("full_text").isNotNull()).count()
    assert got_full == exp_full
