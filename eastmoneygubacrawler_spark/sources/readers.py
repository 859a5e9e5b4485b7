"""Source/sink operators (SURVEY.md §2.1).

- ``load_seeds``: S1 — seed table load + the ST/退 filter + zero-pad
  (core/stock_loader.py:35-84, 61-66; core/crawler.py:84-90).
- ``load_seed_file``: S2 — one stock code per line
  (archive/batch_crawler.py:26-37).
- ``read_pages``: the engine's input scan; column-pruned and filter-pushed —
  callers pass the columns they need so the parquet reader never materializes
  ``html`` for metadata-only passes.
- ``write_posts_csv``: S9 — the reference's commented-out CSV sink
  (core/crawler.py:144-146).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import zfill_code


def load_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Seed parquet → filtered, zero-padded stock codes (F1 + X13)."""
    seeds = spark.read.parquet(path)
    return (
        # literal 'ST'/'st'/'退' substrings only (core/stock_loader.py:61-66);
        # upper(name) would also drop mixed-case 'St...' names the reference keeps
        seeds.filter(
            ~(
                F.col("name").contains("ST")
                | F.col("name").contains("st")
                | F.col("name").contains("退")
            )
        )
        .withColumn("stock_code", zfill_code(F.col("stock_code")))
    )


def load_seed_file(spark: SparkSession, path: str) -> DataFrame:
    """S2: text file, one code per line; blanks/comments dropped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("stock_code"))
        .filter((F.length("stock_code") > 0) & ~F.col("stock_code").startswith("#"))
        .withColumn("stock_code", zfill_code(F.col("stock_code")))
        .distinct()
    )


def read_pages(
    spark: SparkSession, path: str, columns: list[str] | None = None,
    hosts: list[str] | None = None,
) -> DataFrame:
    """Pages scan with explicit column pruning + host predicate pushdown.

    At 100 TB the difference between ``select(url)`` and a full-row scan is
    the whole job: pass ``columns`` so ReadSchema stays minimal, and
    ``hosts`` so the partition/row-group filter reaches the scan.
    """
    df = spark.read.parquet(path)
    if hosts:
        df = df.filter(F.parse_url(F.col("url"), F.lit("HOST")).isin(hosts))
    if columns:
        df = df.select(*columns)
    return df


def write_posts_csv(posts: DataFrame, path: str) -> None:
    """S9: CSV sink (flat schema; binary-free columns only)."""
    flat = posts.select(
        "stock_code", "content_type", "url_id", "url", "title",
        "read_count", "comment_count", "publish_time", "crawl_seq",
    )
    flat.write.mode("overwrite").option("header", "true").csv(path)
