"""spark-submit entry point for cluster runs.

Packaging (north rule: "run via spark-submit --py-files on a multi-executor
cluster"):

    cd /root/repo && zip -qr /tmp/egs.zip eastmoneygubacrawler_spark
    spark-submit --master <cluster> \
        --py-files /tmp/egs.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        eastmoneygubacrawler_spark/engine/main.py \
        --pages s3://bucket/pages --seeds s3://bucket/seeds \
        --store s3://bucket/crawl_state --rounds 3

The job is master-agnostic: everything below is plain DataFrame code; the
store commits atomically per round, so a pre-empted executor or a killed
driver resumes from the last committed round on the next invocation.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet path: pages table")
    ap.add_argument("--seeds", required=True, help="parquet path: seeds table")
    ap.add_argument("--robots", default=None, help="parquet path: robots table")
    ap.add_argument("--politeness", default=None)
    ap.add_argument("--store", required=True, help="snapshot store root")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--budget-per-host", type=int, default=1_000_000_000)
    ap.add_argument("--n-shards", type=int, default=256)
    ap.add_argument("--n-salts", type=int, default=64)
    ap.add_argument("--fetch-partitions", type=int, default=0, help="0 = defaultParallelism")
    ap.add_argument(
        "--text-fetch-mode", default="auto",
        choices=["auto", "join", "scan_extract"],
        help="depth-1 strategy: scan_extract fuses extraction into the pages "
             "scan (html never shuffles) — measured 2x at real-web html sizes",
    )
    ap.add_argument(
        "--seen-filter", default="bloom", choices=["bloom", "cuckoo"],
        help="approximate-membership front-filter flavor",
    )
    ap.add_argument(
        "--maintain-every", type=int, default=0,
        help="run store compaction + gc every K rounds (0 = never; the T5 "
             "maintenance step)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Absolute imports: spark-submit executes this file as a top-level script
    # (``__package__`` is empty), so relative imports would raise ImportError.
    # The package itself arrives on sys.path via ``--py-files egs.zip``.
    from eastmoneygubacrawler_spark.engine.crawl import CrawlConfig, run_crawl
    from eastmoneygubacrawler_spark.session import apply_engine_conf
    from eastmoneygubacrawler_spark.storage.backend import SnapshotStore

    # Master / executor sizing come from spark-submit; only engine semantics
    # (Beijing session tz, AQE, Arrow batching) are pinned here so a cluster
    # run matches the tested local engine bit-for-bit.
    spark = apply_engine_conf(SparkSession.builder.appName("egs-crawl")).getOrCreate()
    fetch_parts = args.fetch_partitions or spark.sparkContext.defaultParallelism
    cfg = CrawlConfig(
        n_shards=args.n_shards,
        n_salts=args.n_salts,
        fetch_partitions=fetch_parts,
        budget_per_host=args.budget_per_host,
        text_fetch_mode=args.text_fetch_mode,
        seen_filter=args.seen_filter,
    )
    store = SnapshotStore(args.store)
    pages = spark.read.parquet(args.pages)
    seeds = spark.read.parquet(args.seeds)
    robots = spark.read.parquet(args.robots) if args.robots else None
    politeness = spark.read.parquet(args.politeness) if args.politeness else None

    for i in range(args.rounds):
        metrics = run_crawl(spark, store, pages, seeds, robots, politeness, cfg)
        print(json.dumps(metrics))
        if args.maintain_every and (i + 1) % args.maintain_every == 0:
            print(json.dumps({"maintenance": store.maintain(spark)}))


if __name__ == "__main__":
    main()
