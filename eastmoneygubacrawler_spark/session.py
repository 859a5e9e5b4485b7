"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB-design / local-test split: AQE on (runtime
re-planning, skew-join splitting), Arrow on (all our UDFs are pandas UDFs),
shuffle partitions sized to the local core count but overridable via
``SPARK_GRAFT_CPUS`` / explicit argument for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def apply_engine_conf(builder: "SparkSession.Builder") -> "SparkSession.Builder":
    """Engine-semantics configs, master-agnostic.

    Everything the crawl semantics and plan shape depend on, WITHOUT touching
    ``spark.master`` / shuffle partitions / driver memory — those belong to
    the deployment (spark-submit flags on a cluster, :func:`get_spark` for
    local runs).  The spark-submit entry point (engine/main.py) applies this
    to a bare builder so a cluster run computes the same timestamps and plans
    as the tested local engine.
    """
    return (
        builder
        # AQE: runtime shuffle re-planning, skew-join splitting, small-partition
        # coalescing — load-bearing for the single-dominant-host skew case.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true) ON PURPOSE: pinning a
        # fixed advisoryPartitionSizeInBytes makes AQE coalesce every
        # post-shuffle stage to the same partition count regardless of
        # cluster size, silently running consumer stages at small-cluster
        # parallelism (measured: 8% composite throughput at 8 cores,
        # BENCH/scaling_2_to_8_r3.json) — partition count must scale with
        # the cluster, not with a byte size.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # All custom logic is Arrow-batched pandas UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Timestamps in the data model are Beijing time (reference:
        # core/crawler.py:509-511 uses UTC+8 wall clock).  SEMANTIC, not a
        # tuning knob: publish-time extraction and the X9 year-inference
        # window are defined in this zone.
        .config("spark.sql.session.timeZone", "Asia/Shanghai")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet codec: zstd over the snappy default.  Measured on the
        # posts-shaped delta (1.44M rows, ~1.8KB text col): 40% fewer bytes
        # (526 vs 881 MB) and a FASTER write wherever the writer is
        # bandwidth-bound (8 cores: 2.2 vs 3.2 s; at 2 cores it costs ~15%
        # CPU, 1 s of a 270 s wall).  At the 100TB design point commit
        # writes go to remote storage, so bytes-on-the-wire dominate and
        # the smaller codec wins twice (write and every later scan).
        .config("spark.sql.parquet.compression.codec", "zstd")
    )


def get_spark(
    app_name: str = "eastmoneygubacrawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = apply_engine_conf(
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
