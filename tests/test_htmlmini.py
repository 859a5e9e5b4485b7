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


# -- fast-tokenizer equivalence ---------------------------------------------
# parse_html tries a single-pass tokenizer first (htmlmini._fast_feed) and
# falls back to the stdlib HTMLParser outside its replicated subset.  These
# tests pin the equivalence contract: on inputs the fast path ACCEPTS, the
# tree must be identical to the stdlib builder's, node for node.

def _tree_sig(node):
    sig = [node.tag, sorted(node.attrs.items())]
    for c in node.children:
        sig.append(c if isinstance(c, str) else _tree_sig(c))
    return sig


def _stdlib_tree(s):
    import eastmoneygubacrawler_spark.functions.htmlmini as hm

    b = hm._TreeBuilder()
    b.feed(s)
    b.close()
    return b.finish()


def _fast_tree(s):
    import eastmoneygubacrawler_spark.functions.htmlmini as hm

    b = hm._TreeBuilder()
    try:
        ok = hm._fast_feed(s, b)
    except Exception:
        ok = False
    return b.finish() if ok else None


def test_fast_tokenizer_differential_fuzz():
    import random

    rng = random.Random(20260817)
    toks = [
        "<div>", "</div>", '<div class="time">', "<p>", "</p>", "<br>",
        '<span id="a">', "</span>", "text&amp;x ", "汉字 ", "<script>",
        "</script>", 'var x="<div>";', '<img src="u"/>', "<a href='x'>",
        "</a>", "<!-- c -->", "<!DOCTYPE html>", "<ul><li>item",
        "</li></ul>", "&lt;tag&gt;", '<div id="post_content">',
        "a &#60; b ", '<DIV CLASS="Time">', "</DIV>", "< notag", "<b>",
        "</b>", "&incomplete", "<style>", "</style>", ".x{a:b}",
        '<input type="text" value="a&amp;b">', "<td nowrap>", "</td>",
        "<div data-x = bare >", "</section>",
    ]
    n_fast = 0
    for _ in range(1500):
        s = "".join(rng.choice(toks) for _ in range(rng.randint(1, 30)))
        fast = _fast_tree(s)
        if fast is None:
            continue  # fallback path: stdlib parses it by construction
        n_fast += 1
        assert _tree_sig(fast) == _tree_sig(_stdlib_tree(s)), repr(s)
    assert n_fast > 500  # the fast path must actually cover most inputs


def test_fast_tokenizer_pathological_endings():
    cases = [
        "<", "a<", "<di", "<div", "<div ", "<div x", "x&", "&amp", "</",
        "</d", "</div", "<script>x", "<script>x</script", "<!", "<!-",
        "<!--", "<!-- x --", "<![CDATA[x]]>", "<?pi", "<?pi>", "a<>b",
        "</ div>", "</div >", "<p/>", '<a b=">">c</a>',
        "<script>a<b</script>c", "<style>p{}</style>t",
    ]
    for s in cases:
        fast = _fast_tree(s)
        if fast is not None:
            assert _tree_sig(fast) == _tree_sig(_stdlib_tree(s)), repr(s)


def test_fast_tokenizer_covers_fixture_pages():
    # the corpus the engine actually crawls must ride the fast path (the
    # fallback doubles parse cost); adversarial pages included
    import eastmoneygubacrawler_spark.functions.htmlmini as hm
    from eastmoneygubacrawler_spark.fixtures.generator import (
        FixtureConfig, build_corpus,
    )

    corpus = build_corpus(
        FixtureConfig(n_stocks=2, max_count=60, adversarial=True)
    )
    n_fallback = 0
    for p in corpus["pages"]:
        html = p["html"]
        if isinstance(html, (bytes, bytearray)):
            html = bytes(html).decode("utf-8", errors="ignore")
        b = hm._TreeBuilder()
        try:
            ok = hm._fast_feed(html, b)
        except Exception:
            ok = False
        if not ok:
            n_fallback += 1
    assert n_fallback == 0
