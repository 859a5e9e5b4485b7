"""Distributed guba-corpus generator for scale benchmarks.

The pure-Python generator (generator.py) builds the corpus on the driver —
right for golden tests, hopeless for millions of pages.  This variant renders
every page inside executors (applyInPandas / mapInPandas) from deterministic
metadata: all item fields derive from ``Random(f"{stock}|{ctype}|{i}")``, so
the list-page renderer and the post-page renderer agree without any driver
state, and any corpus size is reproducible from (n_stocks, items_per_type).

This is also the shape of a real 100 TB ingest: metadata fans out as a
DataFrame, payload synthesis/fetch happens Arrow-batched in the executors.
"""

from __future__ import annotations

import datetime as dt

import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .generator import (
    CAIFUHAO_HOST,
    COMMENT_PAGE_SIZE,
    GUBA_HOST,
    PAGE_SIZE,
    _NICKS,
    _paragraphs,
    _sentence,
    caifuhao_expected_text,
    caifuhao_post_html,
    comment_page_html,
    comment_url,
    guba_expected_text,
    guba_post_html,
    list_page_html,
    list_url,
    make_replies,
)

_BASE_TS = dt.datetime(2026, 2, 28, 23, 0, 0)
_TCODE = {"news": "1", "report": "2", "notice": "3"}
_BASE_YEAR = _BASE_TS.year


def _comment_count(i: int, comment_every: int) -> int:
    """Deterministic reply count, pure formula (no rng draw, so corpora built
    with comment_every=0 stay byte-identical to pre-depth-2 builds): every
    ``comment_every``-th post carries 1..60 replies (≤2 reply pages at
    30/page), the rest none."""
    if not comment_every or i % comment_every:
        return 0
    return ((i * 7919) % 60) + 1


def _item_fields(stock: str, ctype: str, i: int, comment_every: int = 0) -> dict:
    rng = random.Random(f"{stock}|{ctype}|{i}")
    post_id = f"{stock}{_TCODE[ctype]}{i:06d}"
    ts = _BASE_TS - dt.timedelta(minutes=13 * i)
    art_url = None
    if ctype == "news" and rng.random() < 0.15:
        art_url = f"//{CAIFUHAO_HOST}/news/{post_id}.html"
    item = {
        "post_id": post_id,
        "post_title": _sentence(rng, 3, 8),
        "Art_Url": art_url,
        "post_click_count": rng.randint(0, 99999),
        # comment pages exist only when comment_every > 0 (depth-2 scaling
        # studies); default 0 keeps max_depth=1 corpora free of dangling
        # reply URLs and byte-identical to earlier rounds
        "post_comment_count": _comment_count(i, comment_every),
        "post_publish_time": ts.strftime("%Y-%m-%d %H:%M:%S"),
        "user_nickname": rng.choice(_NICKS),
    }
    return item


def _canonical(stock: str, item: dict) -> str:
    art = item.get("Art_Url")
    if art:
        return "http:" + art if art.startswith("//") else art
    return f"https://{GUBA_HOST}/news,{stock},{item['post_id']}.html"


def build_big_corpus(
    spark: SparkSession, n_stocks: int, items_per_type: int, out_dir: str,
    post_pad_bytes: int = 0, comment_every: int = 0,
) -> dict:
    """Writes pages.parquet / seeds.parquet / robots.parquet under out_dir.

    ``post_pad_bytes``: append ~that many bytes of INCOMPRESSIBLE base64
    noise to every post page, inside a display:none div that extraction
    never selects (post_content/article-body win the cascade first) — the
    fat-html regime of real web pages (50-200 KB), for measuring shuffle-
    bytes-dominated fetch strategies at realistic html:text ratios."""
    total_count = items_per_type

    stocks = spark.range(n_stocks).select(
        F.lpad((F.lit(600000) + F.col("id") * 7).cast("string"), 6, "0").alias(
            "stock_code"
        )
    )
    ctypes = spark.createDataFrame(
        [(c,) for c in ("news", "report", "notice")], ["content_type"]
    )
    items_meta = (
        stocks.crossJoin(ctypes)
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(items_per_type - 1))))
        .withColumn("page", (F.floor(F.col("i") / PAGE_SIZE) + 1).cast("int"))
    )

    # ---- list pages: one applyInPandas task per (stock, type, page) --------
    def _render_list(batch: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch:
            out = []
            for (stock, ctype, page), grp in pdf.groupby(
                ["stock_code", "content_type", "page"]
            ):
                items = [
                    _item_fields(stock, ctype, int(i), comment_every)
                    for i in sorted(grp["i"])
                ]
                html = list_page_html(total_count, items)
                out.append((list_url(stock, ctype, int(page)), html.encode("utf-8")))
            yield pd.DataFrame(out, columns=["url", "html"])

    n_parts = spark.sparkContext.defaultParallelism * 2
    list_pages = (
        items_meta.repartition(n_parts, "stock_code", "content_type", "page")
        .mapInPandas(_render_list, "url string, html binary")
        .withColumn("warc_ts", F.lit(_BASE_TS))
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit("zh"))
    )

    # ---- post pages: mapInPandas over item rows ------------------------------
    def _render_posts(batch: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch:
            out = []
            for stock, ctype, i in zip(
                pdf["stock_code"], pdf["content_type"], pdf["i"]
            ):
                item = _item_fields(stock, ctype, int(i))
                url = _canonical(stock, item)
                rng = random.Random(f"page|{url}")
                pub = item["post_publish_time"]
                paras = _paragraphs(rng, 12, 28)  # realistic article length
                if "caifuhao" in url:
                    html = caifuhao_post_html(pub, paras, variant="cfh_web")
                    text = caifuhao_expected_text(paras)
                else:
                    html = guba_post_html(pub, paras, variant="post_content")
                    text = guba_expected_text(paras)
                if post_pad_bytes:
                    import base64

                    import numpy as np

                    noise = base64.b64encode(
                        np.random.default_rng(
                            abs(hash(url)) % (2**32)
                        ).bytes(post_pad_bytes * 3 // 4)
                    ).decode("ascii")
                    html += f'<div style="display:none">{noise}</div>'
                out.append((url, html.encode("utf-8"), text))
            yield pd.DataFrame(out, columns=["url", "html", "text"])

    post_pages = (
        items_meta.repartition(n_parts, "stock_code", "content_type", "i")
        .mapInPandas(_render_posts, "url string, html binary, text string")
        .dropDuplicates(["url"])
        .withColumn("warc_ts", F.lit(_BASE_TS))
        .withColumn("lang", F.lit("zh"))
    )

    cols = ["url", "warc_ts", "html", "text", "lang"]
    pages = list_pages.select(*cols).unionByName(post_pages.select(*cols))

    # ---- depth-2 comment pages (replylist): mapInPandas over commented items
    # Same distributed shape as the post renderer: metadata fans out, the
    # replylist JSON payload (generator.py contract, FIXTURES.md §1.4) is
    # rendered Arrow-batched in executors.  Only every comment_every-th item
    # carries replies, so the renderer prunes rows cheaply in Python.
    if comment_every:
        def _render_comments(batch: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batch:
                out = []
                for stock, ctype, i in zip(
                    pdf["stock_code"], pdf["content_type"], pdf["i"]
                ):
                    cc = _comment_count(int(i), comment_every)
                    if cc <= 0:
                        continue
                    post_id = f"{stock}{_TCODE[ctype]}{int(i):06d}"
                    replies = make_replies(post_id, cc, _BASE_YEAR)
                    n_cpages = -(-cc // COMMENT_PAGE_SIZE)
                    for cp in range(1, n_cpages + 1):
                        chunk = replies[
                            (cp - 1) * COMMENT_PAGE_SIZE : cp * COMMENT_PAGE_SIZE
                        ]
                        payload = [
                            {k: v for k, v in r.items() if k != "expected_time"}
                            for r in chunk
                        ]
                        out.append(
                            (
                                comment_url(stock, post_id, cp),
                                comment_page_html(cc, payload).encode("utf-8"),
                            )
                        )
                if out:
                    yield pd.DataFrame(out, columns=["url", "html"])

        comment_pages = (
            items_meta.repartition(n_parts, "stock_code", "content_type", "i")
            .mapInPandas(_render_comments, "url string, html binary")
            .withColumn("warc_ts", F.lit(_BASE_TS))
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("lang", F.lit("zh"))
        )
        pages = pages.unionByName(comment_pages.select(*cols))

    pages.write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")

    seeds = stocks.withColumn("name", F.concat(F.lit("测试股"), F.col("stock_code"))) \
        .withColumn("market", F.lit("SH"))
    seeds.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/seeds.parquet")

    robots = spark.createDataFrame(
        [
            (GUBA_HOST, "User-agent: *\nDisallow: /private/\n"),
            (CAIFUHAO_HOST, "User-agent: *\nDisallow:\n"),
        ],
        ["host", "rules"],
    )
    robots.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/robots.parquet")

    expected_comments = 0
    if comment_every:
        expected_comments = n_stocks * 3 * sum(
            _comment_count(i, comment_every) for i in range(items_per_type)
        )
    return {
        "n_stocks": n_stocks,
        "items_per_type": items_per_type,
        "expected_posts": n_stocks * 3 * items_per_type,
        "comment_every": comment_every,
        "expected_comments": expected_comments,
    }
