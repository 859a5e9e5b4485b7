"""Deterministic guba-shaped fixture corpus (no external data; seeded).

Builds the ``pages(url, warc_ts, html, text, lang)`` input table plus seeds /
robots / politeness config tables, with ground-truth ``text`` computed by
*string math over the source paragraphs* (independent of the engine's HTML
parser) so the byte-identity test is a real cross-check, not a tautology.

Page families and adversarial variants follow FIXTURES.md §1 and the reference
behaviors they exercise:
- list pages with ``var article_list`` JSON (core/crawler.py:530-553), 80
  items per page (core/crawler.py:351), nicknames ending 资讯
  (core/crawler.py:320-345), literal ``listitem`` token (core/crawler.py:454);
- captcha page (验证), count-deviation decoy (>100 off), bad-nickname probe,
  empty last page, 没有相关数据 page;
- guba post pages (div.time + div#post_content, plus fallback-selector and
  body-fallback variants, fund page) — archive/full_text_CrawlerAsync.py:226-312;
- caifuhao pages (article-body xeditor_content cfh_web / app_h5_article /
  decompose variant) — archive/full_text_CrawlerAsync.py:326-400.
"""

from __future__ import annotations

import datetime as dt
import json
import random
from dataclasses import dataclass, field

PAGE_SIZE = 80

_WORDS = (
    "市场 行情 涨停 业绩 公告 财报 增长 营收 利润 股东 回购 分红 机构 调研 "
    "预期 风险 板块 资金 流入 成交 放量 突破 支撑 压力 估值 配置 周期 景气 "
    "产能 订单 出口 需求 供给 库存 价格 毛利 研发 专利 合作 协议 中标 项目"
).split()

_NICKS = ["东方财富资讯", "市场快报资讯", "每日证券资讯", "财经晚间资讯"]
_GRADES = ["买入", "增持", "中性", "减持"]
_INSTS = ["中金公司", "中信证券", "国泰君安", "华泰证券"]
_NOTICE_TYPES = ["年报", "季报", "停牌", "复牌", "分红"]

GUBA_HOST = "guba.eastmoney.com"
CAIFUHAO_HOST = "caifuhao.eastmoney.com"

COMMENT_PAGE_SIZE = 30  # engine-defined (FIXTURES.md §1.4)


def comment_url(stock: str, post_id: str, page: int) -> str:
    return f"https://{GUBA_HOST}/replylist,{stock},{post_id}_{page}.html"


def comment_page_html(count: int, replies: list[dict]) -> str:
    payload = json.dumps({"count": count, "re": replies}, ensure_ascii=False)
    return (
        "<html><head><script>var reply_list = "
        + payload
        + ";</script></head><body><div class='replylist'>replylist</div></body></html>"
    )


def make_replies(post_id: str, count: int, base_year: int) -> list[dict]:
    """Deterministic replies for a post; year-less times walking back 20 days
    per reply (crosses year boundaries → exercises X9 inference).  Returns
    dicts with both the raw page fields and the expected inferred time."""
    rng = random.Random(f"comments|{post_id}")
    t = dt.datetime(base_year, 1, 15, 10, 0) - dt.timedelta(hours=rng.randint(0, 72))
    out = []
    for j in range(count):
        raw = t.strftime("%m-%d %H:%M")
        out.append(
            {
                "reply_id": f"{post_id}r{j:04d}",
                "reply_user": f"用户{rng.randint(1, 9999)}",
                "reply_text": _sentence(rng, 3, 12),
                "reply_time": raw,
                "expected_time": f"{t.year}-{raw}",
            }
        )
        t -= dt.timedelta(days=20, hours=rng.randint(0, 10))
    return out


@dataclass
class FixtureConfig:
    seed: int = 42
    n_stocks: int = 5
    # per (stock, content_type): item count upper bound → ≤ max_count/80 pages
    max_count: int = 320
    caifuhao_frac: float = 0.15
    robots_deny_frac: float = 0.05
    adversarial: bool = True
    base_year: int = 2026
    scale: int = 1  # multiplies n_stocks for bench corpora
    stocks: list = field(default_factory=list)  # override seed codes


def _sentence(rng: random.Random, lo=4, hi=12) -> str:
    return "".join(rng.choices(_WORDS, k=rng.randint(lo, hi)))


def _paragraphs(rng: random.Random, n_lo=2, n_hi=6) -> list[str]:
    return [_sentence(rng, 6, 18) + "。" for _ in range(rng.randint(n_lo, n_hi))]


# ---------------------------------------------------------------------------
# ground-truth text computation (string math; mirrors what bs4 semantics
# produce for the exact HTML we template below)


def guba_expected_text(paragraphs: list[str]) -> str:
    # post_content contains one text node per <p>; get_text(strip=True)
    # concatenates stripped chunks with no separator, then the extractor
    # applies ' '.join(split()).
    joined = "".join(p.strip() for p in paragraphs if p.strip())
    return " ".join(joined.split())


def caifuhao_expected_text(paragraphs: list[str]) -> str:
    # '\n'.join of per-<p> get_text(strip=True), empties dropped.
    return "\n".join(p.strip() for p in paragraphs if p.strip())


def caifuhao_decompose_expected_text(para_segments: list[list[str]]) -> str:
    # each paragraph is segments interleaved with decomposed spans; stripped
    # segments concatenate with no separator.
    out = []
    for segs in para_segments:
        t = "".join(s.strip() for s in segs if s.strip())
        if t:
            out.append(t)
    return "\n".join(out)


# ---------------------------------------------------------------------------
# HTML templates


def list_page_html(count: int, items: list[dict], captcha=False, no_data=False) -> str:
    if captcha:
        return "<html><body><div>请完成验证后继续访问</div></body></html>"
    if no_data:
        return (
            "<html><body><div class='listitem'>没有相关数据</div></body></html>"
        )
    payload = json.dumps({"count": count, "re": items}, ensure_ascii=False)
    rows = "".join(
        f"<div class='listitem'><a href='{it.get('Art_Url') or ''}'>{it['post_title']}</a></div>"
        for it in items[:3]
    )
    return (
        "<html><head><script>var article_list = "
        + payload
        + ";</script></head><body><div class='articlelistnew'>listitem"
        + rows
        + "</div></body></html>"
    )


def guba_post_html(time_str: str, paragraphs: list[str], variant: str = "post_content") -> str:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    if variant == "post_content":
        core = f'<div id="post_content">{body}</div>'
        time_part = f'<div class="time">{time_str}</div>'
    elif variant == "newstext":
        core = f'<div class="newstext">{body}</div>'
        time_part = f'<div class="time">{time_str}</div>'
    elif variant == "cascade":
        # exercises the content-selector cascade (div.article-content) and
        # the time-selector cascade (span.time)
        core = f'<div class="article-content">{body}</div>'
        time_part = f'<span class="time">发布于 {time_str}</span>'
    elif variant == "body_fallback":
        core = f"<div class='randombox'>{body}</div>"
        time_part = f'<div class="publish-time">{time_str}</div>'
        return (
            "<html><body><nav>首页 行情 数据</nav><header>股吧</header>"
            f"{time_part}{core}"
            "<footer>免责声明</footer><script>var x=1;</script></body></html>"
        )
    else:
        raise ValueError(variant)
    return (
        "<html><body><div class='zwcontent'>"
        f"{time_part}{core}"
        "</div></body></html>"
    )


def fund_post_html() -> str:
    return (
        "<html><body><ul><li><a href='//fund.eastmoney.com'>天天基金网</a></li></ul>"
        "<div>基金页面占位</div></body></html>"
    )


def caifuhao_post_html(time_str: str, paragraphs, variant: str = "cfh_web") -> str:
    meta = (
        '<div class="grid_wrapper"><div class="grid"><div class="g_content">'
        '<div class="article page-article"><div class="article-head">'
        f'<div class="article-meta"><span>作者</span><span>{time_str}</span></div>'
        "</div>"
    )
    closing = "</div></div></div></div>"
    if variant in ("cfh_web", "app_h5_article"):
        body = "".join(f"<p>{p}</p>" for p in paragraphs)
        cls = "cfh_web" if variant == "cfh_web" else "app_h5_article"
        article = (
            '<div class="article-body">'
            f'<div class="xeditor_content {cls}">{body}</div></div>'
        )
    elif variant == "decompose":
        # paragraphs: list[list[str]] text segments with spans between
        ps = []
        for segs in paragraphs:
            inner = '<span class="guba_stock">SH600519</span>'.join(segs)
            ps.append(f"<p>{inner}<img src='x.png'/></p>")
        article = f'<div class="article-body">{"".join(ps)}</div>'
    else:
        raise ValueError(variant)
    return f"<html><body>{meta}{article}{closing}</body></html>"


# ---------------------------------------------------------------------------
# corpus builder


def _make_items(rng, stock, ctype, count, base_ts, cfg, robots_denied):
    """The logical item list for a (stock, content_type): what the site
    'contains'.  Deterministic; post_ids unique per (stock, ctype)."""
    tcode = {"news": "1", "report": "2", "notice": "3"}[ctype]
    items = []
    for i in range(count):
        post_id = f"{stock}{tcode}{i:06d}"
        ts = base_ts - dt.timedelta(minutes=13 * i)
        art_url = None
        if ctype == "news" and rng.random() < cfg.caifuhao_frac:
            art_url = f"//{CAIFUHAO_HOST}/news/{post_id}.html"
        elif ctype == "news" and rng.random() < cfg.robots_deny_frac:
            art_url = f"https://{GUBA_HOST}/private/news,{stock},{post_id}.html"
            robots_denied.add(f"https://{GUBA_HOST}/private/news,{stock},{post_id}.html")
        item = {
            "post_id": post_id,
            "post_title": _sentence(rng, 3, 8),
            "Art_Url": art_url,
            "post_click_count": rng.randint(0, 99999),
            # ~30% of posts carry comments (≤3 reply pages at 30/page)
            "post_comment_count": rng.randint(1, 90) if rng.random() < 0.3 else 0,
            "post_publish_time": ts.strftime("%Y-%m-%d %H:%M:%S"),
            "user_nickname": rng.choice(_NICKS),
        }
        if ctype == "report":
            item["grade_type"] = rng.choice(_GRADES)
            item["institution"] = rng.choice(_INSTS)
        if ctype == "notice":
            item["notice_type"] = rng.choice(_NOTICE_TYPES)
        items.append(item)
    return items


def canonical_post_url(stock: str, item: dict) -> str:
    raw = item.get("Art_Url")
    if raw:
        u = raw.strip()
        if u.startswith("/news"):
            return "http://guba.eastmoney.com" + u
        if u.startswith("//"):
            return "http:" + u
        return u
    return f"https://{GUBA_HOST}/news,{stock},{item['post_id']}.html"


def list_url(stock: str, ctype: str, page: int) -> str:
    tcode = {"news": "1", "report": "2", "notice": "3"}[ctype]
    base = f"https://{GUBA_HOST}/list,{stock},{tcode},f"
    return f"{base}.html" if page == 1 else f"{base}_{page}.html"


def build_corpus(cfg: FixtureConfig) -> dict:
    """Returns dict with keys: seeds, pages, robots, politeness, site, meta.

    ``site`` is the logical truth the simulator consumes:
      {(stock, ctype): {"count": int, "pages": {page: [items]}, "page_status":
        {page: ok|captcha|decoy|empty}}}
    ``pages`` rows: (url, warc_ts, html_bytes, text_or_None, lang)
    """
    rng = random.Random(cfg.seed)
    n_stocks = cfg.n_stocks * cfg.scale
    stocks = cfg.stocks or [f"{600000 + 7 * i:06d}" for i in range(n_stocks)]

    seeds = []
    for i, s in enumerate(stocks):
        name = f"测试股{i}"
        seeds.append({"stock_code": s, "name": name, "market": "SH" if s >= "600000" else "SZ"})
    if cfg.adversarial:
        # F1 seed-filter rows: ST / 退 names must be dropped
        seeds.append({"stock_code": "600999", "name": "ST测试", "market": "SH"})
        seeds.append({"stock_code": "600998", "name": "退市测试", "market": "SH"})

    warc0 = dt.datetime(cfg.base_year, 3, 1, 12, 0, 0)
    base_ts = dt.datetime(cfg.base_year, 2, 28, 23, 0, 0)
    robots_denied: set[str] = set()

    site = {}
    pages_rows = []
    posts_seen_urls = set()

    expected_extract: dict[str, dict] = {}
    expected_comments: dict[tuple, list] = {}

    ctypes = ["news", "report", "notice"]
    for si, stock in enumerate(stocks):
        for ctype in ctypes:
            key = (stock, ctype)
            count = rng.randint(1, cfg.max_count)
            # adversarial slots pinned to specific (stock, type) cells; counts
            # forced so each variant has enough pages to trigger
            page_status = {}
            if cfg.adversarial and si == 0 and ctype == "notice":
                count = 0  # 没有相关数据 → probe yields 0 pages, type skipped
            if cfg.adversarial and si == 0 and ctype == "news":
                # 6 pages; pages ≥3 repeat page-1 items ⇒ streak fires at
                # page 4, pages 5-6 must be cancelled (J4 horizon)
                count = 6 * PAGE_SIZE
            if cfg.adversarial and si == 1 and ctype == "report":
                count = 2 * PAGE_SIZE  # 2 pages → empty last page
            if cfg.adversarial and si == 2 and ctype == "notice":
                count = 3 * PAGE_SIZE  # 3 pages → captcha on page 2
            if cfg.adversarial and si == 3 and ctype == "report":
                count = 3 * PAGE_SIZE  # 3 pages → decoy count on page 2
            if cfg.adversarial and si == 4 and ctype == "report":
                count = 2 * PAGE_SIZE  # probe page bad nicknames → type skipped
            items = _make_items(rng, stock, ctype, count, base_ts, cfg, robots_denied)
            n_pages = -(-count // PAGE_SIZE) if count else 0

            # slice items into pages
            page_items = {
                p: items[(p - 1) * PAGE_SIZE : p * PAGE_SIZE]
                for p in range(1, n_pages + 1)
            }

            if cfg.adversarial and si == 0 and ctype == "news" and n_pages >= 1:
                # duplicate tail: repeat page-1 items on pages ≥3 → J4 horizon
                for p in range(3, n_pages + 1):
                    page_items[p] = page_items[1][: len(page_items[p])]
            if cfg.adversarial and si == 1 and ctype == "report" and n_pages >= 2:
                page_status[n_pages] = "empty"  # empty last page (R3 tolerance)
            if cfg.adversarial and si == 2 and ctype == "notice" and n_pages >= 2:
                page_status[2] = "captcha"
            if cfg.adversarial and si == 3 and ctype == "report" and n_pages >= 2:
                page_status[2] = "decoy"  # count deviation > 100
            if cfg.adversarial and si == 4 and ctype == "report":
                page_status[1] = "bad_nick"  # probe rejects whole type

            site[key] = {"count": count, "pages": page_items, "page_status": page_status}

            # materialize list-page HTML rows
            for p in range(1, n_pages + 1):
                status = page_status.get(p, "ok")
                its = page_items[p]
                if status == "captcha":
                    html = list_page_html(0, [], captcha=True)
                elif status == "decoy":
                    html = list_page_html(count + 500, its)
                elif status == "empty":
                    html = list_page_html(count, [])
                elif status == "bad_nick":
                    bad = [dict(it, user_nickname="普通用户") for it in its]
                    html = list_page_html(count, bad)
                else:
                    html = list_page_html(count, its)
                pages_rows.append(
                    {
                        "url": list_url(stock, ctype, p),
                        "warc_ts": warc0,
                        "html": html.encode("utf-8"),
                        "text": None,
                        "lang": "zh",
                    }
                )
            if count == 0:
                pages_rows.append(
                    {
                        "url": list_url(stock, ctype, 1),
                        "warc_ts": warc0,
                        "html": list_page_html(0, [], no_data=True).encode("utf-8"),
                        "text": None,
                        "lang": "zh",
                    }
                )

            # materialize post pages for every distinct canonical URL
            for p in sorted(page_items):
                if page_status.get(p) in ("captcha", "decoy", "bad_nick", "empty"):
                    continue
                for it in page_items[p]:
                    url = canonical_post_url(stock, it)
                    if url in posts_seen_urls:
                        continue
                    posts_seen_urls.add(url)
                    row, exp = _post_page_row(rng, url, it, warc0, cfg)
                    pages_rows.append(row)
                    expected_extract[url] = exp
                    # depth-2: paginated comment pages (engine-defined)
                    cc = it["post_comment_count"]
                    if cc > 0:
                        replies = make_replies(it["post_id"], cc, cfg.base_year)
                        expected_comments[(stock, ctype, it["post_id"])] = replies
                        n_cpages = -(-cc // COMMENT_PAGE_SIZE)
                        for cp in range(1, n_cpages + 1):
                            chunk = replies[
                                (cp - 1) * COMMENT_PAGE_SIZE : cp * COMMENT_PAGE_SIZE
                            ]
                            page_payload = [
                                {k: v for k, v in r.items() if k != "expected_time"}
                                for r in chunk
                            ]
                            pages_rows.append(
                                {
                                    "url": comment_url(stock, it["post_id"], cp),
                                    "warc_ts": warc0,
                                    "html": comment_page_html(cc, page_payload).encode(
                                        "utf-8"
                                    ),
                                    "text": None,
                                    "lang": "zh",
                                }
                            )

    robots = [
        {
            "host": GUBA_HOST,
            "rules": "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n",
        },
        {"host": CAIFUHAO_HOST, "rules": "User-agent: *\nDisallow:\n"},
    ]
    politeness = [
        {"host": GUBA_HOST, "delay_s": 2.0, "max_qps": 60.0, "max_concurrency": 20},
        {"host": CAIFUHAO_HOST, "delay_s": 0.5, "max_qps": 60.0, "max_concurrency": 20},
    ]

    return {
        "seeds": seeds,
        "pages": pages_rows,
        "robots": robots,
        "politeness": politeness,
        "site": site,
        "robots_denied": robots_denied,
        "stocks": stocks,
        "expected_extract": expected_extract,
        "expected_comments": expected_comments,
    }


def _post_page_row(rng, url: str, item: dict, warc_ts, cfg):
    """Returns (pages_row, expected_extract) for one post URL."""
    pub = item["post_publish_time"]
    if "/private/" in url:
        # robots-denied page exists but must never be fetched; ground truth
        # deliberately poisoned so any fetch shows up as a mismatch
        return (
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": b"<html><body>ROBOTS DENIED - MUST NOT FETCH</body></html>",
                "text": None,
                "lang": "zh",
            },
            {"text": None, "time": None, "status": "robots_denied"},
        )
    if "caifuhao" in url:
        roll = rng.random()
        if roll < 0.15:
            segs = [
                [_sentence(rng, 4, 9), _sentence(rng, 4, 9)]
                for _ in range(rng.randint(2, 4))
            ]
            html = caifuhao_post_html(pub, segs, variant="decompose")
            text = caifuhao_decompose_expected_text(segs)
        else:
            paras = _paragraphs(rng)
            variant = "cfh_web" if roll < 0.7 else "app_h5_article"
            html = caifuhao_post_html(pub, paras, variant=variant)
            text = caifuhao_expected_text(paras)
        return (
            {"url": url, "warc_ts": warc_ts, "html": html.encode("utf-8"),
             "text": text, "lang": "zh"},
            {"text": text, "time": pub, "status": "ok"},
        )
    # guba post page
    roll = rng.random()
    if roll < 0.02:
        return (
            {"url": url, "warc_ts": warc_ts,
             "html": fund_post_html().encode("utf-8"),
             "text": "天天基金", "lang": "zh"},
            {"text": "天天基金", "time": "-1", "status": "fund"},
        )
    paras = _paragraphs(rng)
    if roll < 0.70:
        variant = "post_content"
    elif roll < 0.85:
        variant = "newstext"
    elif roll < 0.95:
        variant = "cascade"
    else:
        variant = "body_fallback"
    if variant == "body_fallback":
        # reference body-fallback requires ≥50 chars of body text
        # (archive/full_text_CrawlerAsync.py:303-309); pad deterministically
        while sum(len(p.strip()) for p in paras) < 60:
            paras.append(_sentence(rng, 8, 14) + "。")
    html = guba_post_html(pub, paras, variant=variant)
    if variant == "body_fallback":
        # body minus nav/header/footer/script: remaining text nodes are the
        # time div text + paragraphs, concatenated stripped, then split-joined
        joined = "".join([pub.strip()] + [p.strip() for p in paras])
        text = " ".join(joined.split())
        time_exp = pub  # via 'div.publish-time' cascade selector
    elif variant == "cascade":
        # content cascade: 'div.article-content' is taken only if its text
        # exceeds 50 chars; otherwise the loop continues and
        # 'div[class*="content"]' matches the zwcontent wrapper, whose text
        # (time span + paragraphs) wins max-by-len — reference behavior at
        # archive/full_text_CrawlerAsync.py:286-307
        inner = guba_expected_text(paras)
        if len("".join(p.strip() for p in paras if p.strip())) > 50:
            text = inner
        else:
            wrapper = "".join([f"发布于 {pub}"] + [p.strip() for p in paras])
            text = " ".join(wrapper.split())
        time_exp = f"发布于 {pub}"  # via 'span.time' cascade selector
    else:
        text = guba_expected_text(paras)
        time_exp = pub  # via <div class="time">
    return (
        {"url": url, "warc_ts": warc_ts, "html": html.encode("utf-8"),
         "text": text, "lang": "zh"},
        {"text": text, "time": time_exp, "status": "ok"},
    )


# ---------------------------------------------------------------------------
# parquet writer


def write_corpus(spark, cfg: FixtureConfig, outdir: str) -> dict:
    """Materialize the corpus as parquet under ``outdir``; returns the corpus."""
    import os

    from ..schema import PAGES, POLITENESS, ROBOTS, SEEDS

    corpus = build_corpus(cfg)
    os.makedirs(outdir, exist_ok=True)
    spark.createDataFrame(corpus["pages"], PAGES).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{outdir}/pages.parquet")
    spark.createDataFrame(corpus["seeds"], SEEDS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{outdir}/seeds.parquet")
    spark.createDataFrame(corpus["robots"], ROBOTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{outdir}/robots.parquet")
    spark.createDataFrame(corpus["politeness"], POLITENESS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{outdir}/politeness.parquet")
    return corpus
