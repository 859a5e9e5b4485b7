"""Unit tests for the bs4-compatible mini DOM."""

from eastmoneygubacrawler_spark.functions.htmlmini import parse_html


def test_basic_tree_and_get_text():
    root = parse_html("<html><body><div id='a'>hello <b>world</b>!</div></body></html>")
    div = root.find("div", {"id": "a"})
    assert div is not None
    assert div.get_text() == "hello world!"
    assert div.get_text(strip=True) == "helloworld!"


def test_get_text_strip_drops_empty_chunks():
    root = parse_html("<div> <p> a </p>\n  <p>  </p> <p>b</p> </div>")
    div = root.find("div")
    assert div.get_text(strip=True) == "ab"


def test_string_accessor_on_script():
    root = parse_html("<html><head><script>var article_list = {\"count\": 5};</script></head></html>")
    scripts = root.find_all("script")
    assert len(scripts) == 1
    assert 'var article_list' in scripts[0].string


def test_find_by_class_token():
    root = parse_html("<div class='time zwfbtime'>2026-01-01 10:00:00</div>")
    assert root.find("div", {"class": "time"}).text == "2026-01-01 10:00:00"
    assert root.find("div", {"class": "zwfbtime"}) is not None
    assert root.find("div", {"class": "nope"}) is None


def test_find_attr_exact():
    root = parse_html("<ul><li><a href='//fund.eastmoney.com'>天天基金网</a></li></ul>")
    li = root.find("li")
    a = li.find("a", href="//fund.eastmoney.com")
    assert a is not None and "天天基金" in a.text


def test_select_class_and_id():
    html = """<div class='article-body'>
      <div class='xeditor_content cfh_web'><p>one</p><p>two</p></div>
    </div><div id='post_content'>body</div>"""
    root = parse_html(html)
    assert root.select_one("div.article-body") is not None
    x = root.select_one("div.xeditor_content.cfh_web")
    assert x is not None
    assert [p.get_text(strip=True) for p in x.find_all("p")] == ["one", "two"]
    assert root.select_one("div#post_content").text == "body"


def test_select_attr_contains():
    root = parse_html("<div class='publish-time-box'>x</div><span class='mydate'>y</span>")
    assert [n.text for n in root.select('[class*="time"]')] == ["x"]
    assert [n.text for n in root.select('[class*="date"]')] == ["y"]


def test_select_child_and_nth_child():
    html = """<div class="grid_wrapper"><div class="grid"><div class="g_content">
      <div class="article page-article"><div class="article-head">
      <div class="article-meta"><span>author</span><span>2026-02-01 08:30</span></div>
      </div></div></div></div></div>"""
    root = parse_html(html)
    sel = ("div.grid_wrapper > div.grid > div.g_content > "
           "div.article.page-article > div.article-head > "
           "div.article-meta > span:nth-child(2)")
    el = root.select_one(sel)
    assert el is not None and el.get_text(strip=True) == "2026-02-01 08:30"


def test_select_group_and_decompose():
    root = parse_html(
        "<div class='a'><span class='guba_stock'>SH1</span>text<img src='x'/>"
        "<script>s</script>more</div>"
    )
    div = root.find("div")
    for n in div.select("span.guba_stock, img, script, style"):
        n.decompose()
    assert div.get_text(strip=True) == "textmore"


def test_void_and_self_closing():
    root = parse_html("<p>a<br>b</p><p>c</p>")
    ps = root.find_all("p")
    assert len(ps) == 2
    assert ps[0].get_text() == "ab"


def test_implicit_p_close():
    root = parse_html("<div><p>one<p>two</div>")
    assert [p.get_text() for p in root.find_all("p")] == ["one", "two"]


def test_bytes_input_decoded_utf8_ignore():
    root = parse_html("<div>中文</div>".encode("utf-8") + b"\xff\xfe")
    assert root.find("div").text == "中文"
