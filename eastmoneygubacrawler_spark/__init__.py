"""eastmoneygubacrawler_spark — a PySpark-native distributed crawl frontier.

A from-scratch rebuild of the capabilities of the reference crawler
(Fucov/EastMoneyGuBaCrawler, a sequential threaded scraper) as an idiomatic
Spark DataFrame engine:

- URL frontier + fetch scheduler over Common-Crawl-style ``pages`` tables
  (url, warc_ts, html, text, lang), designed for a 10^10-URL frontier.
- Canonical-URL seen-set: exact anti-join + sharded bloom front-filter.
- Per-host politeness priority queue with skew salting and robots gating.
- Vectorized (Arrow / pandas-UDF) list-page parsing, link extraction and
  full-text extraction that is byte-identical to the reference extractor.
- Checkpointed, resumable rounds with per-partition lineage metrics.
- Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text quality analysis,
  multimodal column plumbing.

Everything is pyspark.sql DataFrame ops plus a handful of pandas UDFs; no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
