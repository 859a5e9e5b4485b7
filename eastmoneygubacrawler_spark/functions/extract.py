"""Vectorized parse/extract operators (the engine's only UDF surface).

Three pandas-UDF families (SURVEY.md §2.10); everything else in the engine is
built-in Catalyst expressions:

1. ``parse_list_page_udf`` — X1 article_list JSON extractor fused with the
   validation predicates F3 (listitem/captcha), F4 (count deviation), F5
   (nickname suffix).  Reference: core/crawler.py:530-577,297-355.
2. ``extract_text_udf`` — X6 guba full-text + X7 caifuhao full-text + X8
   publish-time extraction + F7 fund-page detection, byte-identical to
   archive/full_text_CrawlerAsync.py:212-400.
3. ``extract_links_udf`` — generic vectorized link extraction (north-star
   "vectorized link extraction"); in the reference link discovery is the
   article_list parse (core/crawler.py:583-621), this generalizes to any page.

All are Arrow-batched; the per-row logic lives in plain-Python helpers
(`*_py`) that are unit-tested directly against fixture HTML.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..schema import LIST_PARSE_RESULT, TEXT_EXTRACT_RESULT
from .htmlmini import parse_html

# ---------------------------------------------------------------------------
# X1 + F3/F4/F5: list-page parser


def _decode(html) -> str:
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="ignore")
    return html or ""


def parse_list_page_py(html, expected_total_count=None) -> dict:
    """Parse a guba list page; mirror of core/crawler.py:530-577.

    Returns dict(count, items, status, all_nick_ok) matching
    schema.LIST_PARSE_RESULT.  Status values:
      ok | no_data | captcha | no_json | count_deviation
    ``all_nick_ok`` carries F5 (nickname suffix check, core/crawler.py:320-345)
    separately because the reference only *rejects* on it during the probe.
    """
    text = _decode(html)
    empty = {"count": None, "items": None, "all_nick_ok": None}

    root = parse_html(text)
    article_list_data = None
    for script in root.find_all("script"):
        s = script.string
        if s and "var article_list" in s:
            start = s.find("{")
            if start != -1:
                try:
                    article_list_data, _ = json.JSONDecoder().raw_decode(s[start:])
                    break
                except Exception:
                    continue

    if not article_list_data or "re" not in article_list_data:
        # F3 bot-block check runs ONLY after the JSON parse fails: the
        # reference treats '验证' as anti-crawl only when no article_list is
        # present (core/crawler.py:455-459 get_soup checks it when 'listitem'
        # is absent; get_data raises only on missing JSON).  A valid page
        # whose post titles contain 验证 (e.g. 验证码 in financial text) must
        # parse normally.
        if "验证" in text or "captcha" in text.lower():
            return {**empty, "status": "captcha"}
        # core/crawler.py:557-558: "没有相关数据" ⇒ legitimately empty
        if "没有相关数据" in text:
            return {"count": 0, "items": [], "status": "no_data", "all_nick_ok": True}
        return {**empty, "status": "no_json"}

    count = int(article_list_data.get("count", 0))

    # F4 anti-crawl count-deviation check (core/crawler.py:569-577)
    if expected_total_count is not None and expected_total_count > 0:
        if abs(count - expected_total_count) > 100:
            return {"count": count, "items": None, "status": "count_deviation",
                    "all_nick_ok": None}

    items_raw = article_list_data["re"] or []

    # F5 nickname-suffix validation (core/crawler.py:320-345)
    all_nick_ok = all(
        (item.get("user_nickname") or "").endswith("资讯") for item in items_raw
    )

    items = []
    for seq, item in enumerate(items_raw):
        post_id = item.get("post_id")
        title = item.get("post_title")
        # F6: drop items lacking post_id/post_title (core/crawler.py:585-589)
        if not post_id or not title:
            continue
        items.append(
            {
                "post_id": str(post_id),
                "post_title": str(title),
                "art_url": item.get("Art_Url"),
                "post_click_count": _as_long(item.get("post_click_count", 0)),
                "post_comment_count": _as_long(item.get("post_comment_count", 0)),
                "post_publish_time": item.get("post_publish_time"),
                "user_nickname": item.get("user_nickname"),
                "grade_type": item.get("grade_type"),
                "institution": item.get("institution"),
                "notice_type": item.get("notice_type"),
                "item_seq": seq,
            }
        )
    return {"count": count, "items": items, "status": "ok", "all_nick_ok": all_nick_ok}


def _as_long(v):
    """X12: int-cast with default 0 (archive/main_class.py:471-480)."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return 0


# ---------------------------------------------------------------------------
# X6/X7/X8 + F7: full-text extraction (byte-identity invariant)

_TIME_SELECTORS = [
    "div.time", "span.time", "div.publish-time",
    "div.date", "time", '[class*="time"]', '[class*="date"]',
]
_CONTENT_SELECTORS = [
    "div.newstext", "div#post_content", "div.content",
    "div.article-content", "div.main-content", "article",
    "div.text-content", 'div[class*="content"]', 'div[id*="content"]',
    ".rich-text", ".article-body",
]
_CAIFUHAO_TIME_SELECTOR = (
    "div.grid_wrapper > div.grid > div.g_content > "
    "div.article.page-article > div.article-head > "
    "div.article-meta > span:nth-child(2)"
)


def _cascade_time(root) -> str:
    """Fallback time-selector cascade (full_text_CrawlerAsync.py:244-257)."""
    for selector in _TIME_SELECTORS:
        elements = root.select(selector)
        if elements:
            for elem in elements:
                t = elem.get_text(strip=True)
                if t and any(ch.isdigit() for ch in t):
                    return t
    return ""


def _extract_guba(root) -> tuple:
    """Guba post branch (full_text_CrawlerAsync.py:226-312)."""
    post_time = ""
    time_tag = root.find("div", {"class": "time"})
    if time_tag is not None:
        post_time = time_tag.text.strip()
    else:
        # F7 fund-page detector (:240-242)
        li = root.find("li")
        fund_link = li.find("a", href="//fund.eastmoney.com") if li else None
        if fund_link is not None and "天天基金" in fund_link.text:
            return "天天基金", "-1", "fund"
        post_time = _cascade_time(root)
        if not post_time:
            return None, None, "no_time"

    content_tag = root.find("div", {"id": "post_content"}) or root.find(
        "div", {"class": "newstext"}
    )
    if content_tag is not None:
        full_text = " ".join(content_tag.get_text(strip=True).split())
        if not full_text:
            return None, post_time, "empty"
        return full_text, post_time, "ok"

    # selector cascade; NOTE reference keeps the *last* non-empty max if none
    # exceeded 50 chars (full_text_CrawlerAsync.py:276-307)
    content = None
    for selector in _CONTENT_SELECTORS:
        elements = root.select(selector)
        if elements:
            texts = [elem.get_text(strip=True) for elem in elements]
            if texts:
                content = max(texts, key=len)
                if len(content) > 50:
                    break
    if content:
        return " ".join(content.split()), post_time, "ok"

    body = root.find("body")
    if body is not None:
        for tag in body.find_all(["nav", "header", "footer", "aside", "script", "style"]):
            tag.decompose()
        content = body.get_text(strip=True)
        if content and len(content) >= 50:
            return " ".join(content.split()), post_time, "ok"
    return None, post_time, "no_content"


def _caifuhao_type3(article_body) -> str | None:
    """Decompose-variant (full_text_CrawlerAsync.py:383-400)."""
    try:
        for unwanted in article_body.select("span.guba_stock, img, script, style"):
            unwanted.decompose()
        paragraphs = []
        for p in article_body.find_all("p"):
            t = p.get_text(strip=True)
            if t:
                paragraphs.append(t)
        return "\n".join(paragraphs)
    except Exception:
        return None


def _extract_caifuhao(root) -> tuple:
    """Caifuhao branch (full_text_CrawlerAsync.py:315-381)."""
    article = root.select_one("div.article-body")
    if article is None:
        return None, None, "no_content"
    full_text = None
    xeditor = article.select_one("div.xeditor_content.cfh_web")
    if xeditor is None:
        xeditor = article.select_one("div.xeditor_content.app_h5_article")
    if xeditor is not None:
        p_texts = [
            p.get_text(strip=True)
            for p in xeditor.find_all("p")
            if p.get_text(strip=True)
        ]
        full_text = "\n".join(p_texts)
    else:
        full_text = _caifuhao_type3(article)

    element = root.select_one(_CAIFUHAO_TIME_SELECTOR)
    if element is not None:
        post_time = element.get_text(strip=True)
    else:
        post_time = _cascade_time(root) or "-1"

    if not full_text:
        return None, post_time, "empty"
    return full_text, post_time, "ok"


def extract_text_py(url: str, html) -> tuple:
    """Full-text extraction; mirror of _async_get_full_text
    (archive/full_text_CrawlerAsync.py:212-312) returning
    (text, post_time, status)."""
    if html is None:
        return None, None, "no_html"
    root = parse_html(_decode(html))
    url = url or ""
    if "caifuhao" in url:
        return _extract_caifuhao(root)
    if "/new" in url or "guba.eastmoney.com" in url:
        return _extract_guba(root)
    return None, None, "unsupported"


# ---------------------------------------------------------------------------
# Reply-page parser (depth-2; engine-defined contract, FIXTURES.md §1.4 —
# same script-JSON shape as list pages, key ``var reply_list``)


def parse_reply_page_py(html) -> dict:
    text = _decode(html)
    root = parse_html(text)
    data = None
    for script in root.find_all("script"):
        s = script.string
        if s and "var reply_list" in s:
            start = s.find("{")
            if start != -1:
                try:
                    data, _ = json.JSONDecoder().raw_decode(s[start:])
                    break
                except Exception:
                    continue
    if not data or "re" not in data:
        # same check order as parse_list_page_py: anti-crawl only when the
        # JSON parse fails (reply text itself may legitimately contain 验证)
        if "验证" in text or "captcha" in text.lower():
            return {"count": None, "items": None, "status": "captcha"}
        return {"count": None, "items": None, "status": "no_json"}
    items = []
    for seq, it in enumerate(data["re"] or []):
        rid = it.get("reply_id")
        if not rid:
            continue
        items.append(
            {
                "reply_id": str(rid),
                "reply_user": it.get("reply_user"),
                "reply_text": it.get("reply_text"),
                "reply_time": it.get("reply_time"),
                "item_seq": seq,
            }
        )
    return {"count": int(data.get("count", 0)), "items": items, "status": "ok"}


# ---------------------------------------------------------------------------
# Generic vectorized link extraction


def extract_links_py(html, base_host: str = "") -> list:
    """All <a href> values on a page, canonicalized like X4."""
    root = parse_html(_decode(html))
    out = []
    for a in root.find_all("a"):
        href = (a.attrs.get("href") or "").strip()
        if not href or href.startswith(("javascript:", "#", "mailto:")):
            continue
        if href.startswith("/news"):
            href = "http://guba.eastmoney.com" + href
        elif href.startswith("//"):
            href = "http:" + href
        elif href.startswith("/") and base_host:
            href = f"https://{base_host}{href}"
        out.append(href)
    return out


# ---------------------------------------------------------------------------
# pandas UDF wrappers (Arrow batches)


@F.pandas_udf(LIST_PARSE_RESULT)
def parse_list_page_udf(html: pd.Series, expected: pd.Series) -> pd.DataFrame:
    rows = [
        parse_list_page_py(h, None if pd.isna(e) else int(e))
        for h, e in zip(html, expected)
    ]
    return pd.DataFrame(rows, columns=["count", "items", "status", "all_nick_ok"])


@F.pandas_udf(TEXT_EXTRACT_RESULT)
def extract_text_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    rows = [extract_text_py(u, h) for u, h in zip(url, html)]
    return pd.DataFrame(rows, columns=["text", "post_time", "status"])


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_links_py(h) for h in html])


def _reply_parse_result_type():
    from ..schema import REPLY_PARSE_RESULT

    return REPLY_PARSE_RESULT


@F.pandas_udf(_reply_parse_result_type())
def parse_reply_page_udf(html: pd.Series) -> pd.DataFrame:
    rows = [parse_reply_page_py(h) for h in html]
    return pd.DataFrame(rows, columns=["count", "items", "status"])
