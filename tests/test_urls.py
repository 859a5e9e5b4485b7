"""URL operators as Catalyst expressions (X2-X5, X13, F8, O2)."""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.functions import urls as U


def test_canonicalize_url(spark):
    df = spark.createDataFrame(
        [
            ("/news,600519,123.html",),
            ("//caifuhao.eastmoney.com/news/9.html",),
            ("https://guba.eastmoney.com/news,600519,5.html",),
            ("  https://x.com/a  ",),
        ],
        ["url"],
    )
    out = [r[0] for r in df.select(U.canonicalize_url(F.col("url"))).collect()]
    assert out == [
        "http://guba.eastmoney.com/news,600519,123.html",
        "http://caifuhao.eastmoney.com/news/9.html",
        "https://guba.eastmoney.com/news,600519,5.html",
        "https://x.com/a",
    ]


def test_url_id_from_href(spark):
    df = spark.createDataFrame([("/news,600519,1234567890.html",), ("/news,600519,77.html ",)], ["href"])
    out = [r[0] for r in df.select(U.url_id_from_href(F.col("href"))).collect()]
    assert out == ["1234567890", "77"]


def test_list_page_url(spark):
    df = spark.createDataFrame(
        [("600519", "news", 1), ("600519", "report", 3), ("000001", "notice", 2)],
        ["code", "ctype", "page"],
    )
    out = [
        r[0]
        for r in df.select(
            U.list_page_url(F.col("code"), F.col("ctype"), F.col("page"))
        ).collect()
    ]
    assert out == [
        "https://guba.eastmoney.com/list,600519,1,f.html",
        "https://guba.eastmoney.com/list,600519,2,f_3.html",
        "https://guba.eastmoney.com/list,000001,3,f_2.html",
    ]


def test_post_url_synthesis(spark):
    df = spark.createDataFrame(
        [("600519", "99", None), ("600519", "77", "//caifuhao.eastmoney.com/news/77.html")],
        ["code", "pid", "art"],
    )
    out = [
        r[0]
        for r in df.select(U.post_url(F.col("code"), F.col("pid"), F.col("art"))).collect()
    ]
    assert out == [
        "https://guba.eastmoney.com/news,600519,99.html",
        "http://caifuhao.eastmoney.com/news/77.html",
    ]


def test_total_pages_and_last_page(spark):
    df = spark.createDataFrame([(0,), (1,), (80,), (81,), (165,)], ["cnt"])
    out = [r[0] for r in df.select(U.total_pages(F.col("cnt"))).collect()]
    assert out == [0, 1, 1, 2, 3]
    df2 = spark.createDataFrame([(1, 165), (2, 165), (3, 165)], ["page", "cnt"])
    lp = [r[0] for r in df2.select(U.is_last_page(F.col("page"), F.col("cnt"))).collect()]
    assert lp == [False, False, True]


def test_zfill_and_type_rank_and_host(spark):
    df = spark.createDataFrame([(519, "news"), (600519, "notice")], ["code", "ctype"])
    rows = df.select(
        U.zfill_code(F.col("code")).alias("z"),
        U.type_rank(F.col("ctype")).alias("tr"),
    ).collect()
    assert [(r.z, r.tr) for r in rows] == [("000519", 0), ("600519", 2)]
    hosts = spark.createDataFrame(
        [("https://guba.eastmoney.com/a/b.html",), ("http://caifuhao.eastmoney.com/x",)], ["url"]
    )
    out = [r[0] for r in hosts.select(U.url_host(F.col("url"))).collect()]
    assert out == ["guba.eastmoney.com", "caifuhao.eastmoney.com"]


def test_udfs_smoke(spark, corpus):
    """parse_list_page_udf + extract_text_udf run Arrow-batched over fixture rows."""
    from eastmoneygubacrawler_spark.functions.extract import (
        extract_text_udf,
        parse_list_page_udf,
    )
    from eastmoneygubacrawler_spark.schema import PAGES

    pages = spark.createDataFrame(corpus["pages"][:200], PAGES)
    lists = pages.filter(F.col("url").contains("/list,"))
    parsed = lists.select(
        "url", parse_list_page_udf(F.col("html"), F.lit(None).cast("long")).alias("p")
    )
    ok = parsed.filter(F.col("p.status") == "ok")
    n_items = ok.select(F.explode("p.items").alias("it")).count()
    assert n_items > 0

    posts = pages.filter(F.col("text").isNotNull()).limit(50)
    extracted = posts.select(
        "url", "text", extract_text_udf(F.col("url"), F.col("html")).alias("e")
    )
    mismatches = extracted.filter(F.col("e.text") != F.col("text")).count()
    assert mismatches == 0
