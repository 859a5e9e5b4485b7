"""Fetch stage abstraction.

In the sandbox the "web" is the ``pages`` table (BASELINE.json input_hint), so
a fetch is a join: scheduled URLs ⋈ pages on url.  The scheduled side is a
bounded politeness batch, so Spark broadcasts it against the (100 TB-scale)
pages scan and the join prunes to exactly the requested rows.

On a real crawl the same interface is an HTTP fetch inside ``mapInPandas``
(one Arrow batch of URLs per partition, per-host token-bucket pacing inside
the worker — the reference's AsyncHttpClient, archive/full_text_CrawlerAsync
.py:64-143).  That path needs network access and is a documented stub here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FixtureFetcher:
    """Fetch = lookup join against a pages table (html column).

    Join strategy matters enormously here: a sort-merge join shuffles the
    page *payloads* (html bytes — the dominant data volume) twice.  A
    politeness batch is bounded (budget × hosts), so we broadcast the
    scheduled URL set instead: the pages scan streams through a broadcast
    hash join and html is never shuffled.  Misses (fetch failures) are
    recovered with a second, column-pruned scan (url only) — Catalyst prunes
    the html column out of that scan entirely.

    ``broadcast_scheduled=False`` falls back to the shuffle join for
    unbounded batches.

    **Uniqueness contract**: ``pages`` must have one row per url (the engine's
    own commit path guarantees this; duplicate urls would duplicate fetched
    rows and skew the J4 horizon streaks and J2 new-count accounting).  Pass
    ``unique_urls=False`` for untrusted inputs: one row per url is then picked
    deterministically (min md5(html)) at the cost of shuffling the pages scan
    once — keep the default on the 100 TB path.
    """

    def __init__(
        self,
        pages: DataFrame,
        broadcast_scheduled: bool = True,
        unique_urls: bool = True,
    ):
        # only the columns a fetch returns; lets Catalyst prune the scan
        p = pages.select("url", "html")
        if not unique_urls:
            p = p.groupBy("url").agg(
                F.min_by("html", F.md5(F.col("html"))).alias("html")
            )
        self.pages = p
        self.broadcast_scheduled = broadcast_scheduled

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        """Returns ``scheduled`` with an ``html`` column (null ⇒ fetch failed)."""
        if not self.broadcast_scheduled:
            return scheduled.join(self.pages, on="url", how="left")
        hits = self.pages.join(F.broadcast(scheduled), on="url", how="inner")
        misses = scheduled.join(
            self.pages.select("url"), on="url", how="left_anti"
        ).withColumn("html", F.lit(None).cast("binary"))
        return hits.unionByName(misses)


class HttpFetcher:
    """Real-network fetch via mapInPandas + requests; NOT available in the
    sandbox (no network).  Kept as the documented production seam: per-host
    partitions (salted_repartition) each run a token-bucket-paced session,
    matching the reference's politeness knobs (delay, QPS, per-host
    concurrency — BASELINE.md)."""

    def __init__(self, politeness: DataFrame | None = None, timeout_s: float = 10.0):
        self.politeness = politeness
        self.timeout_s = timeout_s

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "network fetch is stubbed in the sandbox; use FixtureFetcher"
        )


def with_fetch_lineage(fetched: DataFrame) -> DataFrame:
    """Tag each fetched row with its executing partition for crawl_log."""
    return fetched.withColumn("partition_id", F.spark_partition_id())
