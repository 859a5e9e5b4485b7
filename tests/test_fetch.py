"""FixtureFetcher: broadcast-join fetch ≡ shuffle-join fetch."""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.engine.fetch import FixtureFetcher


def test_broadcast_and_shuffle_fetch_equivalent(spark):
    pages = spark.createDataFrame(
        [(f"https://h/{i}", bytes([i % 250]) * 10) for i in range(500)],
        ["url", "html"],
    )
    scheduled = spark.createDataFrame(
        [(f"https://h/{i}", i) for i in range(400, 600)], ["url", "meta"]
    )
    bc = FixtureFetcher(pages, broadcast_scheduled=True).fetch(scheduled)
    sj = FixtureFetcher(pages, broadcast_scheduled=False).fetch(scheduled)

    def norm(df):
        return sorted(
            (r.url, r.meta, bytes(r.html) if r.html is not None else None)
            for r in df.collect()
        )

    assert norm(bc) == norm(sj)
    # misses (urls 500-599) present with null html
    misses = [r for r in bc.collect() if r.html is None]
    assert len(misses) == 100


def test_broadcast_fetch_does_not_shuffle_html(spark):
    """The html column must come straight off the scan through a broadcast
    hash join — no Exchange above the pages side."""
    pages = spark.range(1000).select(
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
        F.encode(F.concat(F.lit("x"), F.col("id")), "utf-8").alias("html"),
    )
    scheduled = spark.range(50).select(
        F.concat(F.lit("https://h/"), F.col("id")).alias("url")
    )
    out = FixtureFetcher(pages).fetch(scheduled)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_unique_urls_false_dedups_deterministically(spark):
    """Duplicate urls in pages: unique_urls=False picks min-md5(html) row."""
    pages = spark.createDataFrame(
        [("https://h/1", b"bbbb"), ("https://h/1", b"aaaa"), ("https://h/2", b"c")],
        ["url", "html"],
    )
    scheduled = spark.createDataFrame([("https://h/1",), ("https://h/2",)], ["url"])
    out = FixtureFetcher(pages, unique_urls=False).fetch(scheduled).collect()
    got = {r.url: bytes(r.html) for r in out}
    assert len(out) == 2
    import hashlib

    expect = min([b"bbbb", b"aaaa"], key=lambda b: hashlib.md5(b).hexdigest())
    assert got["https://h/1"] == expect
