"""Extraction operators: list-page parser and full-text byte-identity."""

import json

from eastmoneygubacrawler_spark.fixtures.generator import (
    FixtureConfig,
    build_corpus,
    caifuhao_post_html,
    fund_post_html,
    guba_post_html,
    list_page_html,
)
from eastmoneygubacrawler_spark.functions.extract import (
    extract_links_py,
    extract_text_py,
    parse_list_page_py,
)


def _items(n, nick="测试资讯"):
    return [
        {
            "post_id": f"10{i:04d}",
            "post_title": f"标题{i}",
            "Art_Url": None,
            "post_click_count": i * 7,
            "post_comment_count": i,
            "post_publish_time": "2026-02-01 08:00:00",
            "user_nickname": nick,
        }
        for i in range(n)
    ]


class TestParseListPage:
    def test_ok(self):
        html = list_page_html(165, _items(80))
        res = parse_list_page_py(html.encode())
        assert res["status"] == "ok"
        assert res["count"] == 165
        assert len(res["items"]) == 80
        assert res["all_nick_ok"] is True
        assert res["items"][0]["post_id"] == "100000"
        assert res["items"][5]["item_seq"] == 5

    def test_captcha(self):
        res = parse_list_page_py(list_page_html(0, [], captcha=True))
        assert res["status"] == "captcha"

    def test_no_data(self):
        res = parse_list_page_py(list_page_html(0, [], no_data=True))
        assert res["status"] == "no_data"
        assert res["count"] == 0 and res["items"] == []

    def test_no_json(self):
        res = parse_list_page_py("<html><body>listitem nothing here</body></html>")
        assert res["status"] == "no_json"

    def test_count_deviation(self):
        html = list_page_html(700, _items(10))
        assert parse_list_page_py(html, expected_total_count=165)["status"] == "count_deviation"
        assert parse_list_page_py(html, expected_total_count=650)["status"] == "ok"

    def test_bad_nickname_flagged(self):
        html = list_page_html(80, _items(10, nick="普通用户"))
        res = parse_list_page_py(html)
        assert res["status"] == "ok" and res["all_nick_ok"] is False

    def test_items_missing_fields_dropped(self):
        items = _items(3)
        items[1]["post_title"] = None
        html = list_page_html(3, items)
        res = parse_list_page_py(html)
        assert [it["post_id"] for it in res["items"]] == ["100000", "100002"]

    def test_raw_decode_with_trailing_js(self):
        payload = json.dumps({"count": 42, "re": _items(2)}, ensure_ascii=False)
        html = (
            "<script>var article_list = " + payload +
            "; var other = 1; console.log('x');</script><div>listitem</div>"
        )
        res = parse_list_page_py(html)
        assert res["status"] == "ok" and res["count"] == 42 and len(res["items"]) == 2


class TestExtractText:
    def test_guba_post_content(self):
        paras = ["  第一段 内容。 ", "第二段内容。"]
        html = guba_post_html("2026-02-01 08:00:00", paras, variant="post_content")
        text, t, st = extract_text_py("https://guba.eastmoney.com/news,600000,1.html", html.encode())
        assert st == "ok"
        assert t == "2026-02-01 08:00:00"
        assert text == "第一段 内容。第二段内容。"

    def test_guba_newstext_variant(self):
        html = guba_post_html("2026-02-01 08:00:00", ["正文内容甲。", "正文内容乙。"], variant="newstext")
        text, t, st = extract_text_py("https://guba.eastmoney.com/news,600000,2.html", html.encode())
        assert st == "ok" and text == "正文内容甲。正文内容乙。"

    def test_guba_cascade_variant(self):
        paras = ["很长的一段正文内容需要超过五十个字符才能通过级联选择器的长度检查" * 2]
        html = guba_post_html("2026-02-01 09:30:00", paras, variant="cascade")
        text, t, st = extract_text_py("https://guba.eastmoney.com/news,600000,3.html", html.encode())
        assert st == "ok"
        assert t == "发布于 2026-02-01 09:30:00"
        assert text == paras[0]

    def test_fund_page(self):
        text, t, st = extract_text_py(
            "https://guba.eastmoney.com/news,600000,4.html", fund_post_html().encode()
        )
        assert (text, t, st) == ("天天基金", "-1", "fund")

    def test_caifuhao_cfh_web(self):
        paras = ["段落一。", "段落二。", "段落三。"]
        html = caifuhao_post_html("2026-02-01 10:00", paras, variant="cfh_web")
        text, t, st = extract_text_py("http://caifuhao.eastmoney.com/news/1.html", html.encode())
        assert st == "ok"
        assert text == "段落一。\n段落二。\n段落三。"
        assert t == "2026-02-01 10:00"

    def test_caifuhao_decompose(self):
        segs = [["前半", "后半"], ["单段"]]
        html = caifuhao_post_html("2026-02-01 10:00", segs, variant="decompose")
        text, t, st = extract_text_py("http://caifuhao.eastmoney.com/news/2.html", html.encode())
        assert st == "ok"
        assert text == "前半后半\n单段"

    def test_no_time_fails(self):
        html = "<html><body><div id='post_content'>内容</div></body></html>"
        _, _, st = extract_text_py("https://guba.eastmoney.com/news,600000,5.html", html.encode())
        assert st == "no_time"

    def test_body_fallback(self):
        html = guba_post_html("2026-02-01 11:00:00", ["正文段落甲甲甲甲。", "正文段落乙乙乙乙。" * 5],
                              variant="body_fallback")
        text, t, st = extract_text_py("https://guba.eastmoney.com/news,600000,6.html", html.encode())
        assert st == "ok"
        assert t == "2026-02-01 11:00:00"
        assert text.startswith("2026-02-01 11:00:00")


class TestByteIdentityOnCorpus:
    """Every fixture post page: engine extraction == generator ground truth."""

    def test_all_pages_byte_identical(self):
        corpus = build_corpus(FixtureConfig())
        checked = 0
        for row in corpus["pages"]:
            if row["text"] is None:
                continue
            text, t, st = extract_text_py(row["url"], row["html"])
            assert st in ("ok", "fund"), (row["url"], st)
            assert text == row["text"], row["url"]
            exp = corpus["expected_extract"][row["url"]]
            assert t == exp["time"], row["url"]
            checked += 1
        assert checked > 500  # corpus is non-trivial


def test_extract_links():
    html = (
        "<a href='/news,600000,1.html'>a</a>"
        "<a href='//caifuhao.eastmoney.com/news/2.html'>b</a>"
        "<a href='javascript:void(0)'>c</a>"
        "<a href='https://guba.eastmoney.com/list,600000,1,f.html'>d</a>"
    )
    links = extract_links_py(html)
    assert links == [
        "http://guba.eastmoney.com/news,600000,1.html",
        "http://caifuhao.eastmoney.com/news/2.html",
        "https://guba.eastmoney.com/list,600000,1,f.html",
    ]


class TestCaptchaCheckOrder:
    def test_valid_page_with_captcha_word_in_title_parses_ok(self):
        """'验证' in post titles must NOT mark the page bot-blocked: the check
        runs only when no article_list JSON is found (core/crawler.py order)."""
        items = _items(3)
        items[1]["post_title"] = "验证码新政解读"
        res = parse_list_page_py(list_page_html(3, items).encode())
        assert res["status"] == "ok"
        assert len(res["items"]) == 3
        assert res["items"][1]["post_title"] == "验证码新政解读"

    def test_blocked_page_still_captcha(self):
        res = parse_list_page_py("<html><body>请完成验证</body></html>")
        assert res["status"] == "captcha"

    def test_reply_page_with_captcha_word_in_text_parses_ok(self):
        from eastmoneygubacrawler_spark.functions.extract import parse_reply_page_py

        payload = json.dumps(
            {"count": 1, "re": [{"reply_id": "r1", "reply_user": "u",
                                 "reply_text": "需要验证一下", "reply_time": "02-01 08:00"}]},
            ensure_ascii=False,
        )
        html = f"<html><script>var reply_list = {payload};</script></html>"
        res = parse_reply_page_py(html.encode())
        assert res["status"] == "ok"
        assert res["items"][0]["reply_text"] == "需要验证一下"
