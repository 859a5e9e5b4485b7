"""Distributed big-corpus generator: counts, determinism, byte-identity."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def big_dir(spark, tmp_path_factory):
    from eastmoneygubacrawler_spark.fixtures.bigcorpus import build_big_corpus

    out = str(tmp_path_factory.mktemp("big"))
    info = build_big_corpus(spark, n_stocks=3, items_per_type=170, out_dir=out)
    assert info["expected_posts"] == 3 * 3 * 170
    return out


def test_counts_and_schema(spark, big_dir):
    pages = spark.read.parquet(f"{big_dir}/pages.parquet")
    n_posts = pages.filter(F.col("text").isNotNull()).count()
    assert n_posts == 3 * 3 * 170  # distinct post urls (incl caifuhao art urls)
    # list pages: ceil(170/80) = 3 per (stock, type)
    n_lists = pages.filter(F.col("url").contains("/list,")).count()
    assert n_lists == 3 * 3 * 3
    seeds = spark.read.parquet(f"{big_dir}/seeds.parquet")
    assert seeds.count() == 3


def test_extraction_byte_identity_on_sample(spark, big_dir):
    from eastmoneygubacrawler_spark.functions.extract import extract_text_udf

    pages = spark.read.parquet(f"{big_dir}/pages.parquet").filter(
        F.col("text").isNotNull()
    ).limit(200)
    bad = (
        pages.select("url", "text", extract_text_udf(F.col("url"), F.col("html")).alias("e"))
        .filter(F.col("e.text") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_crawl_over_big_corpus_matches_expected_counts(spark, big_dir, tmp_path):
    from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
    from eastmoneygubacrawler_spark.storage import SnapshotStore

    pages = spark.read.parquet(f"{big_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{big_dir}/seeds.parquet")
    robots = spark.read.parquet(f"{big_dir}/robots.parquet")
    store = SnapshotStore(str(tmp_path / "s"))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False, max_depth=1)
    m = run_crawl(spark, store, pages, seeds, robots, None, cfg)
    assert m["posts_new"] == 3 * 3 * 170
    posts = store.load(spark, "posts")
    assert posts.filter(F.col("full_text").isNull()).count() == 0
    seqs = [r.crawl_seq for r in posts.select("crawl_seq").collect()]
    assert sorted(seqs) == list(range(1, 3 * 3 * 170 + 1))

def test_depth2_comment_pages_crawl(spark, tmp_path):
    """comment_every > 0 materializes replylist pages (generator.py contract)
    and a max_depth=2 crawl over the big corpus lands every reply with the
    X9-inferred year — the depth-2 pipeline exercised on the SCALING corpus
    shape, not just the driver-side fixture (r5 verdict item 3)."""
    from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
    from eastmoneygubacrawler_spark.fixtures.bigcorpus import (
        _comment_count,
        _item_fields,
        build_big_corpus,
    )
    from eastmoneygubacrawler_spark.fixtures.generator import make_replies
    from eastmoneygubacrawler_spark.storage import SnapshotStore

    out = str(tmp_path / "bigc")
    info = build_big_corpus(
        spark, n_stocks=2, items_per_type=33, out_dir=out, comment_every=8
    )
    exp_cc = {i: _comment_count(i, 8) for i in range(33)}
    assert info["expected_comments"] == 2 * 3 * sum(exp_cc.values())
    assert info["expected_comments"] > 0

    pages = spark.read.parquet(f"{out}/pages.parquet")
    n_cpages = pages.filter(F.col("url").contains("replylist")).count()
    exp_cpages = 2 * 3 * sum(-(-c // 30) for c in exp_cc.values() if c)
    assert n_cpages == exp_cpages

    store = SnapshotStore(str(tmp_path / "s2"))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False, max_depth=2)
    run_crawl(spark, store, pages,
              spark.read.parquet(f"{out}/seeds.parquet"),
              spark.read.parquet(f"{out}/robots.parquet"), None, cfg)
    com = store.load(spark, "comments")
    assert com.count() == info["expected_comments"]

    # X9 golden: inferred times must equal make_replies' expected_time
    stock = "600000"
    item = _item_fields(stock, "report", 8, comment_every=8)
    golden = {
        r["reply_id"]: r["expected_time"]
        for r in make_replies(item["post_id"], exp_cc[8], 2026)
    }
    got = {
        r.reply_id: r.reply_time
        for r in com.filter(
            (F.col("stock_code") == stock) & (F.col("post_url_id") == item["post_id"])
        ).collect()
    }
    assert got == golden
