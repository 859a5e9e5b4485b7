"""Property-based tests (hypothesis) for URL canonicalization — SURVEY §5.5."""

from hypothesis import given, settings
from hypothesis import strategies as st

from eastmoneygubacrawler_spark.fixtures.generator import canonical_post_url

url_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), whitelist_characters="/.,-_:"),
    min_size=1, max_size=60,
)


@given(st.text(min_size=1, max_size=12, alphabet="0123456789"))
@settings(max_examples=50, deadline=None)
def test_synthesized_url_roundtrips_post_id(post_id):
    url = canonical_post_url("600519", {"post_id": post_id, "Art_Url": None})
    assert url == f"https://guba.eastmoney.com/news,600519,{post_id}.html"
    tail = url.split(",")[-1].replace(".html", "").strip()  # X5 extraction
    assert tail == post_id


@given(url_text)
@settings(max_examples=100, deadline=None)
def test_canonicalization_idempotent(raw):
    """canonical(canonical(u)) == canonical(u) for the reference's rewrite
    rules (prefix /news paths, protocol-relative //)."""

    def canon(u):
        u = u.strip()
        if u.startswith("/news"):
            return "http://guba.eastmoney.com" + u
        if u.startswith("//"):
            return "http:" + u
        return u

    assert canon(canon(raw)) == canon(raw)


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_art_url_passthrough_absolute(art):
    """Absolute Art_Urls pass through modulo the whitespace trim (X4 strips
    surrounding whitespace; no double-prefixing ever)."""
    raw = "https://x.com/" + art
    if raw.strip().startswith(("/news", "//")):
        return
    url = canonical_post_url("000001", {"post_id": "1", "Art_Url": raw})
    assert url == raw.strip()
    assert not url.startswith("http:http")  # never double-prefixed
