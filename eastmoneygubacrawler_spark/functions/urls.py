"""URL operators as native Column expressions (whole-stage-codegen path).

Reference behaviors reproduced:
- post-URL canonicalization (core/crawler.py:592-596;
  archive/full_text_CrawlerAsync.py:226-227,316-319): prefix
  ``http://guba.eastmoney.com`` to ``/news...`` paths, ``http:`` to
  ``//caifuhao...`` protocol-relative URLs, synthesize
  ``https://guba.eastmoney.com/news,{code},{post_id}.html`` when no Art_Url.
- url_id extraction (archive/main_class.py:466-469):
  ``href.split(',')[-1].replace('.html','').strip()``.
- list-URL generation (core/crawler.py:513-521): page 1 has no ``_{page}``
  suffix.
- zero-padded stock code (core/crawler.py:84-90).

All expressions are pure Catalyst (no UDFs) so predicate pushdown, constant
folding and codegen apply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TYPE_CODE = {"news": "1", "report": "2", "notice": "3"}
TYPE_RANK = {"news": 0, "report": 1, "notice": 2}  # fixed order core/crawler.py:746
PAGE_SIZE = 80  # items per list page, hardcoded in reference core/crawler.py:351


def zfill_code(code: Column) -> Column:
    """6-digit zero-pad (core/crawler.py:84-90)."""
    return F.lpad(code.cast("string"), 6, "0")


def canonicalize_url(url: Column) -> Column:
    """Canonical absolute URL (X4).

    - ``/news...`` relative path → ``http://guba.eastmoney.com`` prefix
      (archive/full_text_CrawlerAsync.py:226-227)
    - ``//caifuhao...`` protocol-relative → ``http:`` prefix (:316-319)
    - strip surrounding whitespace; drop a single trailing ``/`` after the
      host is untouched (reference never rewrites beyond the above).
    """
    u = F.trim(url)
    return (
        F.when(u.startswith("/news"), F.concat(F.lit("http://guba.eastmoney.com"), u))
        .when(u.startswith("//"), F.concat(F.lit("http:"), u))
        .otherwise(u)
    )


def url_host(url: Column) -> Column:
    """Host component of an absolute URL (for politeness partitioning)."""
    return F.parse_url(url, F.lit("HOST"))


def url_hash(url: Column) -> Column:
    """64-bit key of the canonical URL — the seen-set key (J1 analog)."""
    return F.xxhash64(url)


def url_id_from_href(href: Column) -> Column:
    """X5: ``href.split(',')[-1].replace('.html','').strip()``."""
    tail = F.element_at(F.split(href, ","), -1)
    return F.trim(F.regexp_replace(tail, r"\.html", ""))


def list_page_url(stock_code: Column, content_type: Column, page: Column) -> Column:
    """X3: ``https://guba.eastmoney.com/list,{code},{1|2|3},f[_{page}].html``."""
    type_code = (
        F.when(content_type == "news", F.lit("1"))
        .when(content_type == "report", F.lit("2"))
        .otherwise(F.lit("3"))
    )
    base = F.format_string(
        "https://guba.eastmoney.com/list,%s,%s,f", stock_code, type_code
    )
    return F.when(page == 1, F.concat(base, F.lit(".html"))).otherwise(
        F.format_string("%s_%d.html", base, page)
    )


def post_url(stock_code: Column, post_id: Column, art_url: Column) -> Column:
    """X4 synthesis: Art_Url if present else news URL (core/crawler.py:592-596)."""
    return canonicalize_url(
        F.coalesce(
            art_url,
            F.format_string(
                "https://guba.eastmoney.com/news,%s,%s.html", stock_code, post_id
            ),
        )
    )


def total_pages(total_count: Column) -> Column:
    """X2: ``ceil(count / 80)`` (core/crawler.py:347-355)."""
    return F.ceil(total_count / F.lit(PAGE_SIZE)).cast("int")


def is_last_page(page: Column, total_count: Column) -> Column:
    """F8: ``page*80 >= total_count`` (core/crawler.py:652-656)."""
    return (page.cast("long") * PAGE_SIZE) >= total_count


def type_rank(content_type: Column) -> Column:
    """O2: fixed content-type order news→report→notice (core/crawler.py:746)."""
    return (
        F.when(content_type == "news", F.lit(0))
        .when(content_type == "report", F.lit(1))
        .when(content_type == "notice", F.lit(2))
        .otherwise(F.lit(9))
    )


COMMENT_PAGE_SIZE = 30  # engine-defined depth-2 contract (FIXTURES.md §1.4)


def comment_page_url(stock_code: Column, post_url_id: Column, page: Column) -> Column:
    """Depth-2 reply-list URL (engine-defined; the reference's comment module
    is absent from its repo — archive/main_controller.py:18)."""
    return F.format_string(
        "https://guba.eastmoney.com/replylist,%s,%s_%d.html",
        stock_code, post_url_id, page,
    )


def comment_total_pages(comment_count: Column) -> Column:
    return F.ceil(comment_count / F.lit(COMMENT_PAGE_SIZE)).cast("int")


def salt_for(url: Column, n_salts: int) -> Column:
    """P8: deterministic skew-salt bucket for a dominant host."""
    return F.pmod(F.xxhash64(url), F.lit(n_salts)).cast("int")
