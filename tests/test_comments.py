"""Depth-2 paginated comments: parser, pipeline, year inference in-pipeline."""

import pytest
from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
from eastmoneygubacrawler_spark.fixtures import (
    FixtureConfig,
    build_corpus,
    simulate_reference_crawl,
)
from eastmoneygubacrawler_spark.fixtures.generator import (
    comment_page_html,
    make_replies,
)
from eastmoneygubacrawler_spark.functions.extract import parse_reply_page_py
from eastmoneygubacrawler_spark.schema import PAGES, ROBOTS, SEEDS
from eastmoneygubacrawler_spark.storage import SnapshotStore


def test_parse_reply_page():
    replies = make_replies("6000001000001", 45, 2026)
    page1 = [{k: v for k, v in r.items() if k != "expected_time"} for r in replies[:30]]
    res = parse_reply_page_py(comment_page_html(45, page1).encode())
    assert res["status"] == "ok" and res["count"] == 45
    assert len(res["items"]) == 30
    assert res["items"][0]["reply_id"] == replies[0]["reply_id"]
    assert res["items"][5]["item_seq"] == 5
    assert parse_reply_page_py(b"<html>nothing</html>")["status"] == "no_json"
    assert parse_reply_page_py("请验证".encode())["status"] == "captcha"


def test_make_replies_cross_year_inference_golden():
    from eastmoneygubacrawler_spark.operators.year_infer import infer_year_python

    replies = make_replies("x", 60, 2026)  # 60 × ~20d ≈ 3.3 years back
    raws = [r["reply_time"] for r in replies]
    expected = [r["expected_time"] for r in replies]
    assert infer_year_python(raws, 2026) == expected
    years = {e[:4] for e in expected}
    assert len(years) >= 3  # really crosses multiple year boundaries


@pytest.fixture(scope="module")
def crawl_with_comments(spark, tmp_path_factory):
    corpus = build_corpus(FixtureConfig(n_stocks=2, max_count=120, adversarial=False))
    pages = spark.createDataFrame(corpus["pages"], PAGES)
    seeds = spark.createDataFrame(corpus["seeds"], SEEDS)
    robots = spark.createDataFrame(corpus["robots"], ROBOTS)
    store = SnapshotStore(str(tmp_path_factory.mktemp("cstore")))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False)
    run_crawl(spark, store, pages, seeds, robots, None, cfg)
    golden = simulate_reference_crawl(corpus)
    return store, golden, (pages, seeds, robots, cfg)


def test_comments_match_simulator(spark, crawl_with_comments):
    store, golden, _ = crawl_with_comments
    got = {
        (r.stock_code, r.content_type, r.post_url_id, r.reply_id): r
        for r in store.load(spark, "comments").collect()
    }
    exp = {
        (c["stock_code"], c["content_type"], c["post_url_id"], c["reply_id"]): c
        for c in golden["comments"]
    }
    assert len(golden["comments"]) > 100
    assert set(got) == set(exp)
    for k, c in exp.items():
        r = got[k]
        assert r.reply_text == c["reply_text"], k
        assert r.reply_user == c["reply_user"], k
        assert r.reply_time_raw == c["reply_time_raw"], k
        assert r.reply_time == c["reply_time"], k  # year-inferred in-pipeline
        assert (r.page, r.item_seq) == (c["page"], c["item_seq"]), k


def test_comment_pages_in_seen_set(spark, crawl_with_comments):
    store, golden, _ = crawl_with_comments
    seen = {r.url for r in store.load(spark, "seen").collect()}
    assert seen == golden["seen_urls"]
    assert any("/replylist," in u for u in seen)


def test_comments_recrawl_idempotent(spark, crawl_with_comments):
    store, golden, (pages, seeds, robots, cfg) = crawl_with_comments
    n_before = store.load(spark, "comments").count()
    m = run_crawl(spark, store, pages, seeds, robots, None, cfg)
    assert store.load(spark, "comments").count() == n_before


def test_comment_late_retry_sees_full_window(spark, tmp_path):
    """r4 verdict item 1: the X9 window union is pruned to THIS round's
    touched posts (O(delta), not O(comment corpus)) — and a retried page
    landing a round late must still infer against the complete stored state
    of its post.  Break the LAST reply page of a multi-page post in round 0;
    round 1 refetches it, and its rows' inferred years must equal the
    full-sequence golden (they only do if the window saw the stored earlier
    pages).  Untouched posts must not be re-emitted."""
    corpus = build_corpus(FixtureConfig(n_stocks=2, max_count=120, adversarial=False))
    golden = simulate_reference_crawl(corpus)
    last_page = {}
    for c in golden["comments"]:
        k = (c["stock_code"], c["content_type"], c["post_url_id"])
        last_page[k] = max(last_page.get(k, 1), c["page"])
    target_key = max(last_page, key=last_page.get)
    assert last_page[target_key] >= 2, "fixture must have a multi-page post"
    stock, ctype, pid = target_key
    target_url = (
        f"https://guba.eastmoney.com/replylist,{stock},{pid}_"
        f"{last_page[target_key]}.html"
    )
    assert any(p["url"] == target_url for p in corpus["pages"])

    pages_full = spark.createDataFrame(corpus["pages"], PAGES)
    pages_broken = pages_full.filter(F.col("url") != target_url)
    seeds = spark.createDataFrame(corpus["seeds"], SEEDS)
    robots = spark.createDataFrame(corpus["robots"], ROBOTS)
    store = SnapshotStore(str(tmp_path / "s"))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=8, use_bloom=False)

    run_crawl(spark, store, pages_broken, seeds, robots, None, cfg)  # r0: miss
    n_r0 = store.load(spark, "comments").count()
    assert n_r0 < len(golden["comments"])
    run_crawl(spark, store, pages_full, seeds, robots, None, cfg)    # r1: late

    got = {
        (r.stock_code, r.content_type, r.post_url_id, r.reply_id): r
        for r in store.load(spark, "comments").collect()
    }
    exp = {
        (c["stock_code"], c["content_type"], c["post_url_id"], c["reply_id"]): c
        for c in golden["comments"]
    }
    assert set(got) == set(exp)  # complete, no duplicates
    for k, c in exp.items():
        assert got[k].reply_time == c["reply_time"], k
    # the late page's rows really were the round-1 delta (everything else
    # committed in round 0 and was not touched again)
    late = [r for r in got.values()
            if (r.stock_code, r.content_type, r.post_url_id) == target_key
            and r.page == last_page[target_key]]
    assert late and all(r.round == 1 for r in late)
    untouched = [r for r in got.values()
                 if (r.stock_code, r.content_type, r.post_url_id) != target_key]
    assert untouched and all(r.round == 0 for r in untouched)
