"""Pure-Python simulator of the reference crawler's sequential semantics.

This is the golden oracle for the crawl-engine tests: an independent,
~150-line re-statement of exactly what the reference does, in the order it
does it, derived from:

- seed order: sorted ascending, ST/退 filtered (core/scheduler.py:202-217;
  core/stock_loader.py:61-66)
- content-type order: news → report → notice (core/crawler.py:746)
- probe: page 1 → total_pages = ceil(count/80); bad-nickname probe page ⇒
  whole type skipped after retries (core/crawler.py:253-389); count==0 ⇒
  skipped (core/crawler.py:753-756)
- strict page-order consumption 1..N (core/crawler.py:796-801)
- per-page item insertion deduped by (stock_code, content_type, url_id)
  (Mongo unique index, core/crawler.py:726-733,818-827)
- duplicate-page early stop: 2 consecutive pages with 0 new rows ⇒ remaining
  pages cancelled (core/crawler.py:829-859); failed pages (None) don't count
  toward the streak (core/crawler.py:804-808); empty pages ([]) do
- stage 2: full-text fetch per post URL in insertion (queue FIFO) order
  (archive/full_text_CrawlerAsync.py:423-445), robots-gated (engine-defined;
  the reference has no robots handling)

The simulator consumes the *logical site truth* from the fixture generator
(never the engine's parsers), so engine-vs-simulator agreement is a real
cross-implementation check.
"""

from __future__ import annotations

import math

PAGE_SIZE = 80
CTYPES = ["news", "report", "notice"]
DUPLICATE_PAGE_THRESHOLD = 2  # core/crawler.py:104


def canonical_post_url(stock: str, item: dict) -> str:
    raw = item.get("Art_Url")
    if raw:
        u = raw.strip()
        if u.startswith("/news"):
            return "http://guba.eastmoney.com" + u
        if u.startswith("//"):
            return "http:" + u
        return u
    return f"https://guba.eastmoney.com/news,{stock},{item['post_id']}.html"


def _seed_order(seeds: list[dict]) -> list[str]:
    """F1 + O1: filter literal ST/st/退 substrings (core/stock_loader.py:61-66),
    sort ascending."""
    codes = [
        s["stock_code"]
        for s in seeds
        if "ST" not in (s.get("name") or "")
        and "st" not in (s.get("name") or "")
        and "退" not in (s.get("name") or "")
    ]
    return sorted(codes)


def simulate_reference_crawl(
    corpus: dict,
    apply_robots: bool = True,
    preexisting_keys: set | None = None,
) -> dict:
    """Simulate one full crawl round.

    ``preexisting_keys`` models a recrawl: (stock, ctype, url_id) already in
    the store from a previous round (drives the J4 early stop).

    Returns dict:
      posts: list of dicts in exact insertion order (with crawl_seq)
      seen_urls: set of successfully fetched URLs (list + post pages)
      fetch_order: list of URLs in fetch/consumption order
      skipped_types: {(stock, ctype): reason}
    """
    site = corpus["site"]
    robots_denied = corpus.get("robots_denied", set()) if apply_robots else set()
    from .generator import list_url  # local import to avoid cycle

    expected_extract = corpus.get("expected_extract", {})

    seen_keys = set(preexisting_keys or ())
    posts: list[dict] = []
    seen_urls: set[str] = set()
    fetch_order: list[str] = []
    skipped: dict = {}

    for host_rank, stock in enumerate(_seed_order(corpus["seeds"])):
        for type_rank, ctype in enumerate(CTYPES):
            info = site.get((stock, ctype))
            if info is None:
                continue
            count = info["count"]
            page_status = info["page_status"]

            # --- probe (get_total_pages, core/crawler.py:253-389)
            if page_status.get(1) == "bad_nick":
                skipped[(stock, ctype)] = "bad_nick_probe"
                continue
            if page_status.get(1) in ("captcha", "decoy"):
                skipped[(stock, ctype)] = "probe_failed"
                continue
            total_pages = math.ceil(count / PAGE_SIZE)
            if total_pages == 0:
                # probe still fetched page 1 ("没有相关数据" page)
                u = list_url(stock, ctype, 1)
                fetch_order.append(u)
                seen_urls.add(u)
                skipped[(stock, ctype)] = "zero_pages"
                continue
            u1 = list_url(stock, ctype, 1)
            fetch_order.append(u1)
            seen_urls.add(u1)

            # --- ordered page consumption with early stop
            streak = 0
            for page in range(1, total_pages + 1):
                st = page_status.get(page, "ok")
                u = list_url(stock, ctype, page)
                fetch_order.append(u)
                if st in ("captcha", "decoy"):
                    # page permanently fails after retries ⇒ skipped, no
                    # streak change (core/crawler.py:804-808)
                    continue
                seen_urls.add(u)
                items = info["pages"].get(page, []) if st == "ok" else []
                new_count = 0
                for seq, item in enumerate(items):
                    key = (stock, ctype, str(item["post_id"]))
                    if key in seen_keys:
                        continue
                    seen_keys.add(key)
                    new_count += 1
                    url = canonical_post_url(stock, item)
                    title = item["post_title"]
                    posts.append(
                        {
                            "stock_code": stock,
                            "content_type": ctype,
                            "title": title,
                            "url": url,
                            "url_id": str(item["post_id"]),
                            "read_count": int(item.get("post_click_count") or 0),
                            "comment_count": int(item.get("post_comment_count") or 0),
                            "publish_time": item.get("post_publish_time"),
                            "author": item.get("user_nickname"),
                            "grade": item.get("grade_type"),
                            "institution": item.get("institution"),
                            "notice_type": item.get("notice_type"),
                            "summary": title,
                            "source": "official",
                            "host_rank": host_rank,
                            "type_rank": type_rank,
                            "page": page,
                            "item_seq": seq,
                        }
                    )
                if new_count == 0:
                    streak += 1
                else:
                    streak = 0
                if streak >= DUPLICATE_PAGE_THRESHOLD:
                    break  # cancel remaining pages (core/crawler.py:850-859)

    # --- stage 2: full-text fetch in insertion order (FIFO queue)
    for i, post in enumerate(posts):
        post["crawl_seq"] = i + 1
        url = post["url"]
        exp = expected_extract.get(url)
        if url in robots_denied:
            post["full_text"] = None
            post["full_text_time"] = None
            continue
        fetch_order.append(url)
        if exp is None:
            post["full_text"] = None
            post["full_text_time"] = None
            continue
        seen_urls.add(url)
        post["full_text"] = exp["text"]
        post["full_text_time"] = exp["time"]

    # --- stage 3: paginated comments (engine-defined; FIXTURES.md §1.4) ------
    from .generator import COMMENT_PAGE_SIZE, comment_url

    expected_comments = corpus.get("expected_comments", {})
    comments: list[dict] = []
    for post in posts:
        cc = post["comment_count"]
        if cc <= 0:
            continue
        key = (post["stock_code"], post["content_type"], post["url_id"])
        replies = expected_comments.get(key)
        if replies is None:
            continue
        n_cpages = -(-cc // COMMENT_PAGE_SIZE)
        for cp in range(1, n_cpages + 1):
            u = comment_url(post["stock_code"], post["url_id"], cp)
            fetch_order.append(u)
            seen_urls.add(u)
            chunk = replies[(cp - 1) * COMMENT_PAGE_SIZE : cp * COMMENT_PAGE_SIZE]
            for seq, r in enumerate(chunk):
                comments.append(
                    {
                        "stock_code": post["stock_code"],
                        "content_type": post["content_type"],
                        "post_url_id": post["url_id"],
                        "reply_id": r["reply_id"],
                        "reply_user": r["reply_user"],
                        "reply_text": r["reply_text"],
                        "reply_time_raw": r["reply_time"],
                        "reply_time": r["expected_time"],
                        "page": cp,
                        "item_seq": seq,
                    }
                )

    return {
        "posts": posts,
        "seen_urls": seen_urls,
        "fetch_order": fetch_order,
        "skipped_types": skipped,
        "comments": comments,
    }
