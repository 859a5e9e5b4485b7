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
