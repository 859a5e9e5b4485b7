"""Fixed StructType schemas for every engine table.

The reference is schemaless (Python dicts into MongoDB; record constructed at
core/crawler.py:598-619).  We pin the implicit schema explicitly; the
``pages`` shape is the authoritative input contract from BASELINE.json
``input_hint``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages (BASELINE.json input_hint).
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),  # ground-truth extraction oracle
        StructField("lang", StringType(), True),
    ]
)

# Seed list (reference: core/stock_loader.py:35-84 builds List[str] of codes).
SEEDS = StructType(
    [
        StructField("stock_code", StringType(), False),
        StructField("name", StringType(), True),
        StructField("market", StringType(), True),
    ]
)

# Politeness budget config (reference: per-site intervals
# core/user_agent_config.py:123-135, global QPS archive/full_text_CrawlerAsync.py:152).
POLITENESS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("delay_s", DoubleType(), True),
        StructField("max_qps", DoubleType(), True),
        StructField("max_concurrency", IntegerType(), True),
    ]
)

# robots.txt rules per host (new operator — reference has no robots handling).
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("rules", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Frontier: the distributed URL queue.  Replaces the reference's Redis list
# (storage/database_client.py:176-187) + MySQL task queue
# (archive/task_scheduler_api.py:203-213) + in-memory future_map
# (core/crawler.py:778-801).
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),  # xxhash64(canonical url)
        StructField("host", StringType(), False),
        StructField("salt", IntegerType(), False),  # skew-salt bucket
        StructField("depth", IntegerType(), False),  # 0=list, 1=post, 2=comments
        StructField("stock_code", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("page", IntegerType(), True),
        StructField("post_url_id", StringType(), True),  # depth-2 rows only
        # canonical crawl-order components (SURVEY.md §2.6)
        StructField("host_rank", LongType(), True),
        StructField("type_rank", IntegerType(), True),
        StructField("item_seq", IntegerType(), True),
        StructField("status", StringType(), False),  # pending|fetched|failed|retry|pruned
        StructField("attempts", IntegerType(), False),
        StructField("round", IntegerType(), False),  # round enqueued
        StructField("expected_count", LongType(), True),  # probe total_count (F4)
    ]
)

# Output posts table (reference record schema, SURVEY.md §1.1;
# core/crawler.py:598-619).
POSTS = StructType(
    [
        StructField("stock_code", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("title", StringType(), True),
        StructField("url", StringType(), True),
        StructField("url_id", StringType(), True),
        StructField("read_count", LongType(), True),
        StructField("comment_count", LongType(), True),
        StructField("publish_time", StringType(), True),
        StructField("author", StringType(), True),
        StructField("grade", StringType(), True),
        StructField("institution", StringType(), True),
        StructField("notice_type", StringType(), True),
        StructField("summary", StringType(), True),
        StructField("source", StringType(), True),
        StructField("full_text", StringType(), True),
        StructField("full_text_time", StringType(), True),
        StructField("crawl_seq", LongType(), True),  # canonical order position
        StructField("round", IntegerType(), True),
    ]
)

# Seen-set table: replaces the Mongo compound unique index
# (core/crawler.py:726-733).  Sharded by pmod(url_hash, n_shards).
SEEN = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("round", IntegerType(), False),
    ]
)

# Per-round, per-partition lineage + counters (north rule: "per-partition
# lineage + metrics"; reference analog: round stats core/scheduler.py:238-243).
CRAWL_LOG = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("host", StringType(), True),
        StructField("fetched", LongType(), True),
        StructField("new_urls", LongType(), True),
        StructField("bytes", LongType(), True),
        StructField("wall_ms", LongType(), True),
    ]
)

# Parsed list-page item struct (output of the list-page parser UDF; the
# article_list JSON item fields consumed at core/crawler.py:585-614).
LIST_ITEM = StructType(
    [
        StructField("post_id", StringType(), True),
        StructField("post_title", StringType(), True),
        StructField("art_url", StringType(), True),
        StructField("post_click_count", LongType(), True),
        StructField("post_comment_count", LongType(), True),
        StructField("post_publish_time", StringType(), True),
        StructField("user_nickname", StringType(), True),
        StructField("grade_type", StringType(), True),
        StructField("institution", StringType(), True),
        StructField("notice_type", StringType(), True),
        StructField("item_seq", IntegerType(), True),
    ]
)

# Output of parse_list_page UDF (X1 + F3/F4/F5 fused).
LIST_PARSE_RESULT = StructType(
    [
        StructField("count", LongType(), True),
        StructField("items", ArrayType(LIST_ITEM), True),
        StructField("status", StringType(), True),
        # ok | no_data | captcha | no_json | bad_nickname | count_deviation
        StructField("all_nick_ok", BooleanType(), True),
    ]
)

# Output of extract_text UDF (X6/X7/X8 + F7 fused).
TEXT_EXTRACT_RESULT = StructType(
    [
        StructField("text", StringType(), True),
        StructField("post_time", StringType(), True),
        StructField("status", StringType(), True),  # ok | fund | no_time | no_content
    ]
)

# Comments (depth-2).  The reference's comment crawler module is missing from
# its repo (enhanced_comment_crawler.py imported at archive/main_controller
# .py:18 but absent); this contract is engine-defined per FIXTURES.md §1.4:
# comment pages paginate like list pages (30 replies/page), reply times are
# year-less "MM-DD HH:MM" resolved by the X9 year-inference window.
COMMENTS = StructType(
    [
        StructField("stock_code", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("post_url_id", StringType(), True),
        StructField("reply_id", StringType(), False),
        StructField("reply_user", StringType(), True),
        StructField("reply_text", StringType(), True),
        StructField("reply_time_raw", StringType(), True),  # "MM-DD HH:MM"
        StructField("reply_time", StringType(), True),  # year-inferred
        StructField("page", IntegerType(), True),
        StructField("item_seq", IntegerType(), True),
        StructField("round", IntegerType(), True),
    ]
)

REPLY_ITEM = StructType(
    [
        StructField("reply_id", StringType(), True),
        StructField("reply_user", StringType(), True),
        StructField("reply_text", StringType(), True),
        StructField("reply_time", StringType(), True),
        StructField("item_seq", IntegerType(), True),
    ]
)

REPLY_PARSE_RESULT = StructType(
    [
        StructField("count", LongType(), True),
        StructField("items", ArrayType(REPLY_ITEM), True),
        StructField("status", StringType(), True),  # ok | no_json | captcha
    ]
)

# Multimodal blob table (training-data pipeline; binary payload + typed meta).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
