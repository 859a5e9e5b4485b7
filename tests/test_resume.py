"""Resumability: a killed run replays its round and converges to the exact
same state (north rule: 'resumable from checkpoint with per-partition
lineage + metrics')."""

import os
import shutil

from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
from eastmoneygubacrawler_spark.storage import SnapshotStore


def _tables(spark, store):
    posts = store.load(spark, "posts")
    seen = store.load(spark, "seen")
    return (
        sorted(map(tuple, posts.select(
            "stock_code", "content_type", "url_id", "url", "crawl_seq",
            "full_text", "full_text_time").collect())),
        sorted(r.url for r in seen.collect()),
    )


def test_snapshot_store_atomicity(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    assert store.current_round() == -1
    df = spark.range(5)
    store.commit(0, {"t": df})
    assert store.current_round() == 0
    assert store.load(spark, "t").count() == 5
    # garbage written without a pointer flip is invisible
    os.makedirs(store.root + "/data/t/r000001", exist_ok=True)
    with open(store.root + "/data/t/r000001/garbage", "w") as f:
        f.write("partial write from a killed run")
    assert store.current_round() == 0
    assert store.load(spark, "t").count() == 5


def test_kill_and_resume_identical_state(
    spark, corpus_dir, tmp_path, tmp_path_factory
):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    cfg = CrawlConfig(n_shards=16, fetch_partitions=8, use_bloom=False)

    # full run: round 0 then round 1 (recrawl)
    full = SnapshotStore(str(tmp_path / "full"))
    run_crawl(spark, full, pages, seeds, robots, None, cfg)
    checkpoint_src = str(tmp_path / "full_after_r0")
    shutil.copytree(full.root, checkpoint_src)  # state as committed after r0
    run_crawl(spark, full, pages, seeds, robots, None, cfg)
    expected = _tables(spark, full)

    # "killed during round 1": restart from the round-0 checkpoint and replay
    resumed = SnapshotStore(checkpoint_src)
    assert resumed.current_round() == 0
    run_crawl(spark, resumed, pages, seeds, robots, None, cfg)
    assert _tables(spark, resumed) == expected
