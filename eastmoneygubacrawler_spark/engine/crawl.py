"""The crawl-round driver: one call = one reference "round" (full crawl pass).

Pipeline per round (the Spark shape of core/crawler.py:723-871 +
archive/main_controller.py's stage-1/stage-2 split, SURVEY.md §3.1):

  seeds ─ filter F1, sort O1 ─→ probes (page-1 per stock×type)
      ─ fetch+parse UDF1, skip rules F3/F4/F5 ─→ total_pages (X2)
      ─ explode pages 1..N (X3) ─→ list frontier
  wave loop (politeness budget per host, canonical-order ranks O1-O4):
      fetch ⋈ pages → parse UDF1 → first-occurrence dedup + store anti-join
      (J1) → per-page new counts (J2) → duplicate-page horizon (J4) prunes
      the remaining frontier
  items ─ project F9 ─→ new posts rows, crawl_seq = row_number over the
      canonical key (host_rank, type_rank, page, item_seq)
  depth-1: post URLs (X4) ─ robots gate ─ seen-set (bloom + exact anti-join)
      ─ politeness waves ─ fetch → extract_text UDF2 (byte-identity) ─→
      MERGE full_text into posts (S6 analog)
  atomic commit: posts, seen, frontier, crawl_log (SnapshotStore)

Determinism: the crawl order is computed as data, so results are independent
of physical execution order — equality with the reference's sequential loop
is proven against the fixtures' pure-Python simulator in tests.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..functions.extract import extract_text_udf, parse_list_page_udf
from ..operators import frontier as FR
from ..operators import seen as SE
from ..storage.backend import SnapshotStore

POSTS_KEY = ["stock_code", "content_type", "url_id"]


@dataclass
class CrawlConfig:
    n_shards: int = 64
    n_salts: int = 16
    fetch_partitions: int = 32
    budget_per_host: int = 1_000_000_000  # pages per host per wave
    duplicate_page_threshold: int = 2  # core/crawler.py:104
    max_attempts: int = 5  # core/crawler.py:496 (tenacity budget)
    apply_robots: bool = True
    use_bloom: bool = True
    bloom_fpp: float = 0.01
    max_waves: int = 64


def _seed_ranks(seeds: DataFrame) -> DataFrame:
    """F1 seed filter + O1 deterministic order → host_rank per stock."""
    filtered = seeds.filter(
        ~(F.upper(F.col("name")).contains("ST") | F.col("name").contains("退"))
    )
    w = Window.orderBy("stock_code")
    return (
        filtered.select(U.zfill_code(F.col("stock_code")).alias("stock_code"))
        .distinct()
        .withColumn("host_rank", F.row_number().over(w).cast("long") - 1)
    )


def _with_url_identity(df: DataFrame, n_salts: int) -> DataFrame:
    return (
        df.withColumn("url", U.canonicalize_url(F.col("url")))
        .withColumn("url_hash", U.url_hash(F.col("url")))
        .withColumn("host", U.url_host(F.col("url")))
        .withColumn("salt", U.salt_for(F.col("url"), n_salts))
    )


def run_crawl(
    spark: SparkSession,
    store: SnapshotStore,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame | None = None,
    politeness: DataFrame | None = None,
    cfg: CrawlConfig | None = None,
) -> dict:
    """Run one crawl round; commits state atomically; returns metrics."""
    cfg = cfg or CrawlConfig()
    t0 = time.time()
    round_id = store.current_round() + 1

    posts_prev = store.load(spark, "posts")
    seen_prev = store.load(spark, "seen")

    from .fetch import FixtureFetcher

    fetcher = FixtureFetcher(pages)

    # ---- probe stage -------------------------------------------------------
    ranks = _seed_ranks(seeds)
    ctypes = spark.createDataFrame(
        [("news", 0), ("report", 1), ("notice", 2)], ["content_type", "type_rank"]
    )
    probes = (
        ranks.crossJoin(F.broadcast(ctypes))
        .withColumn("page", F.lit(1))
        .withColumn(
            "url", U.list_page_url(F.col("stock_code"), F.col("content_type"), F.col("page"))
        )
    )
    probe_res = (
        fetcher.fetch(probes)
        .withColumn("p", parse_list_page_udf(F.col("html"), F.lit(None).cast("long")))
        .select(
            "stock_code", "content_type", "host_rank", "type_rank", "url",
            F.col("p.count").alias("total_count"),
            F.col("p.status").alias("probe_status"),
            F.col("p.all_nick_ok").alias("all_nick_ok"),
            F.col("html").isNull().alias("fetch_failed"),
        )
        .cache()
    )

    # probe skip rules: bad nickname / captcha / no_json / fetch miss ⇒ the
    # whole (stock, type) is skipped this round (core/crawler.py:281-389)
    valid_probes = probe_res.filter(
        (~F.col("fetch_failed"))
        & F.col("probe_status").isin("ok", "no_data")
        & (F.col("all_nick_ok").isNull() | F.col("all_nick_ok"))
    ).withColumn("total_pages", U.total_pages(F.col("total_count")))

    # probe fetches count as consumed URLs (the probe really fetched page 1);
    # page-1 rows can never exceed a horizon (streak needs ≥2 prior pages)
    probe_seen = valid_probes.select(
        "stock_code", "content_type", F.lit(1).alias("page"), "url"
    ).distinct()

    # ---- list-page frontier -------------------------------------------------
    list_frontier = (
        valid_probes.filter(F.col("total_pages") > 0)
        .withColumn("page", F.explode(F.sequence(F.lit(1), F.col("total_pages"))))
        .withColumn(
            "url", U.list_page_url(F.col("stock_code"), F.col("content_type"), F.col("page"))
        )
        .withColumn("item_seq", F.lit(None).cast("int"))
        .select(
            "url", "stock_code", "content_type", "page",
            "host_rank", "type_rank", "item_seq",
            F.col("total_count").alias("expected_count"),
        )
    )
    list_frontier = _with_url_identity(list_frontier, cfg.n_salts).cache()

    posts_keys_prev = (
        posts_prev.select(*POSTS_KEY) if posts_prev is not None else None
    )

    # ---- wave loop over list pages ------------------------------------------
    pending = list_frontier
    all_items = None
    page_stats_acc = None
    horizons = None
    list_seen_pages = probe_seen
    waves = 0
    list_fetched_rows = 0
    lineage_frames = []

    while waves < cfg.max_waves:
        waves += 1
        if horizons is not None:
            pending = FR.prune_beyond_horizon(pending, horizons)
        batch = FR.politeness_schedule(pending, cfg.budget_per_host).cache()
        n_batch = batch.count()
        if n_batch == 0:
            break
        pending = pending.join(
            batch.select("url"), on="url", how="left_anti"
        )

        fetched = (
            fetcher.fetch(
                batch.repartition(cfg.fetch_partitions, F.col("host"), F.col("salt"))
            )
            .withColumn("partition_id", F.spark_partition_id())
            .withColumn("p", parse_list_page_udf(F.col("html"), F.col("expected_count")))
            .cache()
        )
        list_fetched_rows += n_batch
        lineage_frames.append(
            fetched.groupBy("partition_id", "host")
            .agg(
                F.count("*").alias("fetched"),
                F.sum(F.size(F.coalesce(F.col("p.items"), F.array()))).alias("new_urls"),
                F.sum(F.length(F.col("html")).cast("long")).alias("bytes"),
            )
            .withColumn("stage", F.lit("list_fetch"))
            .withColumn("round", F.lit(round_id))
        )

        page_rows = fetched.select(
            "stock_code", "content_type", "page", "host_rank", "type_rank",
            "url", "expected_count",
            F.col("p.status").alias("status"),
            F.col("p.items").alias("items"),
            (F.col("html").isNotNull() & F.col("p.status").isin("ok", "no_data")).alias("ok"),
        ).cache()

        # consumed list pages → seen candidates (horizon-filtered at the end:
        # pages speculatively fetched past the early-stop are never consumed,
        # matching the reference's future-cancellation core/crawler.py:855-859)
        list_seen_pages = list_seen_pages.unionByName(
            page_rows.filter(F.col("ok")).select(
                "stock_code", "content_type", "page", "url"
            )
        )

        items = (
            page_rows.filter(F.col("ok"))
            .select(
                "stock_code", "content_type", "page", "host_rank", "type_rank",
                F.explode(F.coalesce(F.col("items"), F.array())).alias("it"),
            )
            .select(
                "stock_code", "content_type", "page", "host_rank", "type_rank",
                F.col("it.post_id").alias("url_id"),
                F.col("it.post_title").alias("title"),
                F.col("it.art_url").alias("art_url"),
                F.col("it.post_click_count").alias("read_count"),
                F.col("it.post_comment_count").alias("comment_count"),
                F.col("it.post_publish_time").alias("publish_time"),
                F.col("it.user_nickname").alias("author"),
                F.col("it.grade_type").alias("grade"),
                F.col("it.institution").alias("institution"),
                F.col("it.notice_type").alias("notice_type"),
                F.col("it.item_seq").alias("item_seq"),
            )
        )
        all_items = items if all_items is None else all_items.unionByName(items)

        # first-occurrence within everything seen so far this round
        w_first = Window.partitionBy(*POSTS_KEY).orderBy("page", "item_seq")
        firsts = (
            all_items.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if posts_keys_prev is not None:
            firsts = firsts.join(posts_keys_prev, on=POSTS_KEY, how="left_anti")
        firsts = firsts.cache()

        new_counts = firsts.groupBy("stock_code", "content_type", "page").agg(
            F.count("*").alias("new_count")
        )
        stats = (
            page_rows.select("stock_code", "content_type", "page", "ok")
            .join(new_counts, on=["stock_code", "content_type", "page"], how="left")
            .withColumn("new_count", F.coalesce(F.col("new_count"), F.lit(0)))
        )
        page_stats_acc = (
            stats if page_stats_acc is None else page_stats_acc.unionByName(stats)
        )
        horizons = FR.duplicate_page_horizon(
            page_stats_acc, cfg.duplicate_page_threshold
        ).cache()
        new_items_final = firsts  # refreshed each wave (cumulative)

    if all_items is None:
        new_items_final = None
        posts_new = spark.createDataFrame([], "stock_code string")
    # apply the final horizon to the cumulative first-occurrence items
    if all_items is not None:
        if horizons is not None:
            new_items_final = FR.prune_beyond_horizon(new_items_final, horizons)

        # ---- project new posts rows (F9) + canonical crawl_seq -------------
        # crawl_seq continues across rounds (insertion order, like Mongo _id
        # order under the reference's sequential loop); two-phase distributed
        # rank — no single-partition global window at 10^10 scale
        from ..operators.order import global_row_number

        prev_count = posts_prev.count() if posts_prev is not None else 0
        posts_new = (
            new_items_final.withColumn(
                "url", U.post_url(F.col("stock_code"), F.col("url_id"), F.col("art_url"))
            )
            .withColumn("summary", F.col("title"))  # core/crawler.py:615
            .withColumn("source", F.lit("official"))
            .withColumn("round", F.lit(round_id))
        )
        posts_new = global_row_number(
            posts_new,
            ["host_rank", "type_rank", "page", "item_seq"],
            out_col="crawl_seq",
            start=prev_count + 1,
            n_partitions=cfg.fetch_partitions,
        )

    posts_new = posts_new.cache()
    n_posts_new = posts_new.count()

    # ---- depth-1: full-text fetch -------------------------------------------
    if n_posts_new > 0:
        post_urls = (
            posts_new.select(
                "url", "host_rank", "type_rank", "page", "item_seq"
            )
            .groupBy("url")
            .agg(
                F.min("host_rank").alias("host_rank"),
                F.min("type_rank").alias("type_rank"),
                F.min("page").alias("page"),
                F.min("item_seq").alias("item_seq"),
            )
        )
        post_urls = _with_url_identity(post_urls, cfg.n_salts)
        if cfg.apply_robots and robots is not None:
            post_urls = FR.robots_gate(post_urls, robots)
        # seen gate: bloom front-filter + exact anti-join
        if seen_prev is not None:
            if cfg.use_bloom:
                shards = SE.build_bloom_shards(
                    seen_prev, cfg.n_shards, fpp=cfg.bloom_fpp
                )
                post_urls = SE.filter_unseen_with_bloom(
                    post_urls, seen_prev, shards, cfg.n_shards
                )
            else:
                post_urls = SE.filter_unseen(post_urls, seen_prev)

        scheduled = FR.politeness_schedule(post_urls, cfg.budget_per_host)
        fetched_posts = (
            fetcher.fetch(
                scheduled.repartition(cfg.fetch_partitions, F.col("host"), F.col("salt"))
            )
            .withColumn("partition_id", F.spark_partition_id())
            .withColumn("e", extract_text_udf(F.col("url"), F.col("html")))
            .select(
                "url", "host", "partition_id",
                F.length(F.col("html")).cast("long").alias("bytes"),
                F.col("e.text").alias("full_text"),
                F.col("e.post_time").alias("full_text_time"),
                F.col("e.status").alias("extract_status"),
            )
            .cache()
        )
        lineage_frames.append(
            fetched_posts.groupBy("partition_id", "host")
            .agg(
                F.count("*").alias("fetched"),
                F.sum((F.col("extract_status").isin("ok", "fund")).cast("long")).alias(
                    "new_urls"
                ),
                F.sum("bytes").alias("bytes"),
            )
            .withColumn("stage", F.lit("text_fetch"))
            .withColumn("round", F.lit(round_id))
        )
        text_ok = fetched_posts.filter(
            F.col("extract_status").isin("ok", "fund")
        ).select("url", "full_text", "full_text_time")
        n_text_fetched = fetched_posts.count()

        posts_new = (
            posts_new.join(text_ok, on="url", how="left")
        )
        post_seen_urls = text_ok.select("url")
    else:
        n_text_fetched = 0
        post_seen_urls = spark.createDataFrame([], "url string")
        posts_new = posts_new.withColumn("full_text", F.lit(None).cast("string")) \
            .withColumn("full_text_time", F.lit(None).cast("string")) if n_posts_new else posts_new

    # ---- assemble final tables ----------------------------------------------
    from ..schema import POSTS

    posts_cols = [f.name for f in POSTS.fields]
    if n_posts_new > 0:
        posts_out = posts_new.select(
            *[
                F.col(c).cast(dict((f.name, f.dataType) for f in POSTS.fields)[c])
                .alias(c)
                for c in posts_cols
            ]
        )
        posts_final = (
            posts_prev.unionByName(posts_out) if posts_prev is not None else posts_out
        )
    else:
        posts_final = posts_prev if posts_prev is not None else spark.createDataFrame([], POSTS)

    if horizons is not None:
        list_seen_pages = FR.prune_beyond_horizon(list_seen_pages, horizons)
    seen_new = (
        list_seen_pages.select("url").unionByName(post_seen_urls)
        .distinct()
        .withColumn("url", U.canonicalize_url(F.col("url")))
        .withColumn("url_hash", U.url_hash(F.col("url")))
        .transform(lambda d: SE.with_shard(d, cfg.n_shards))
        .withColumn("round", F.lit(round_id))
        .select("url_hash", "url", "shard", "round")
    )
    if seen_prev is not None:
        seen_new = seen_new.join(
            seen_prev.select("url"), on="url", how="left_anti"
        ).select("url_hash", "url", "shard", "round")
        seen_final = seen_prev.unionByName(seen_new)
    else:
        seen_final = seen_new

    if lineage_frames:
        crawl_log = lineage_frames[0]
        for fr in lineage_frames[1:]:
            crawl_log = crawl_log.unionByName(fr)
        crawl_log = crawl_log.withColumn(
            "wall_ms", F.lit(int((time.time() - t0) * 1000))
        ).select(
            "round", "stage", "partition_id", "host", "fetched", "new_urls",
            "bytes", "wall_ms",
        )
        log_prev = store.load(spark, "crawl_log")
        if log_prev is not None:
            crawl_log = log_prev.unionByName(crawl_log)
    else:
        from ..schema import CRAWL_LOG

        crawl_log = spark.createDataFrame([], CRAWL_LOG)

    # frontier final state (for resume/lineage inspection)
    frontier_out = list_frontier.select(
        "url", "url_hash", "host", "salt",
        F.lit(0).alias("depth"), "stock_code", "content_type", "page",
        "host_rank", "type_rank", "item_seq",
        F.lit("fetched").alias("status"), F.lit(1).alias("attempts"),
        F.lit(round_id).alias("round"),
        F.col("expected_count").cast("long").alias("expected_count"),
    )

    store.commit(
        round_id,
        {
            "posts": posts_final,
            "seen": seen_final,
            "crawl_log": crawl_log,
            "frontier": frontier_out,
        },
    )

    wall_s = time.time() - t0
    urls_fetched = list_fetched_rows + n_text_fetched + probe_res.count()
    return {
        "round": round_id,
        "waves": waves,
        "posts_new": n_posts_new,
        "urls_fetched": urls_fetched,
        "wall_s": wall_s,
        "throughput_urls_per_s": urls_fetched / wall_s if wall_s > 0 else 0.0,
    }
