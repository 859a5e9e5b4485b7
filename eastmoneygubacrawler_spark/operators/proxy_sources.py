"""S8: config-driven multi-source proxy reader (the data-plane model of
core/proxy_manager.py:124-160 + 275-388).

The reference iterates a config list of proxy sources; each source is either
a JSON API (items under ``data``/``list``/``proxies``, fields ``ip``/``host``
+ ``port`` — :360-370) or a free-text page scraped with the X16 regex
(:373-374).  Here the config IS a DataFrame and the whole sweep is one plan:

  sources(name, url, kind) ── fetch (FixtureFetcher join / HttpFetcher)
      ── kind='json': from_json over the three array paths, coalesced
      ── kind='text': regexp_extract_all (functions/signing.extract_ip_ports)
      ──→ (source, proxy) rows, deduped per source

Everything is Catalyst (from_json coerces numeric ports to string, verified
in tests); no Python in the parse path.  The output feeds the capacity
table (operators/capacity.py — P6/P7 scoring) exactly as the reference's
raw_list feeds its verify/score loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.signing import extract_ip_ports

_ITEM = "array<struct<ip:string,host:string,port:string>>"
_PAYLOAD_SCHEMA = f"data {_ITEM}, list {_ITEM}, proxies {_ITEM}"


def parse_proxy_payloads(
    fetched: DataFrame, source_col: str = "name",
    body_col: str = "body", kind_col: str = "kind",
) -> DataFrame:
    """(source, kind, body) → (source, proxy) rows.

    ``kind='json'``: items under data|list|proxies with ip|host + port
    (numeric or string).  ``kind='text'``: X16 regex over the page text.
    Rows without a usable ip/port are dropped, duplicates deduped per source
    (the reference accumulates into one raw_list).
    """
    src = F.col(source_col).alias("source")
    j = F.from_json(F.col(body_col), _PAYLOAD_SCHEMA)
    items = F.coalesce(j["data"], j["list"], j["proxies"], F.array())
    json_rows = (
        fetched.filter(F.col(kind_col) == "json")
        .select(src, F.explode(items).alias("it"))
        .select(
            "source",
            F.concat(
                F.coalesce(F.col("it.ip"), F.col("it.host")),
                F.lit(":"),
                F.col("it.port"),
            ).alias("proxy"),
        )
        .filter(F.col("proxy").isNotNull())
    )
    text_rows = (
        fetched.filter(F.col(kind_col) == "text")
        .select(src, F.explode(extract_ip_ports(F.col(body_col))).alias("proxy"))
    )
    return json_rows.unionByName(text_rows).distinct()


def fetch_proxy_sources(sources: DataFrame, fetcher) -> DataFrame:
    """Full sweep: fetch every configured source url, parse per its kind.

    ``sources``: (name, url, kind); ``fetcher``: engine.fetch.FixtureFetcher
    or HttpFetcher.  Fetch misses (null html) parse to zero rows, matching
    the reference's silent per-source except/continue.
    """
    fetched = fetcher.fetch(sources).withColumn(
        "body", F.col("html").cast("string")
    )
    return parse_proxy_payloads(fetched)
