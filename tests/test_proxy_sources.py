"""S8 config-driven multi-source proxy reader (core/proxy_manager.py analog)."""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.engine.fetch import FixtureFetcher
from eastmoneygubacrawler_spark.operators.proxy_sources import (
    fetch_proxy_sources,
    parse_proxy_payloads,
)


def test_parse_all_payload_shapes(spark):
    rows = [
        ("a", "json", '{"data":[{"ip":"1.2.3.4","port":8080}]}'),           # numeric port
        ("b", "json", '{"list":[{"host":"5.6.7.8","port":"9999"}]}'),       # host + str port
        ("c", "json", '{"proxies":[{"ip":"9.9.9.9","port":80},{"port":1}]}'),  # null ip dropped
        ("d", "json", "not json at all"),                                   # parse miss → 0 rows
        ("e", "text", "x 7.7.7.7:3128 y 8.8.8.8：1080 z 1.2.3 bad"),        # regex incl. fullwidth
        ("f", "text", "no proxies here"),
    ]
    df = spark.createDataFrame(rows, ["name", "kind", "body"])
    got = sorted((r.source, r.proxy) for r in parse_proxy_payloads(df).collect())
    assert got == [
        ("a", "1.2.3.4:8080"),
        ("b", "5.6.7.8:9999"),
        ("c", "9.9.9.9:80"),
        ("e", "7.7.7.7:3128"),
        ("e", "8.8.8.8：1080"),
    ]


def test_fetch_proxy_sources_end_to_end(spark):
    """Config table → fetch (fixture join) → parse; fetch misses yield 0 rows
    (the reference's silent per-source except/continue)."""
    pages = spark.createDataFrame(
        [
            ("http://api.one/get", b'{"data":[{"ip":"1.1.1.1","port":81}]}'),
            ("http://free.two/list", "page 2.2.2.2:82 tail".encode()),
        ],
        ["url", "html"],
    )
    sources = spark.createDataFrame(
        [
            ("one", "http://api.one/get", "json"),
            ("two", "http://free.two/list", "text"),
            ("down", "http://gone.three/x", "json"),  # fetch miss
        ],
        ["name", "url", "kind"],
    )
    got = sorted(
        (r.source, r.proxy)
        for r in fetch_proxy_sources(sources, FixtureFetcher(pages)).collect()
    )
    assert got == [("one", "1.1.1.1:81"), ("two", "2.2.2.2:82")]


def test_parse_is_pure_catalyst(spark):
    """No Python UDF in the json parse path (text path uses regexp only too)."""
    df = spark.createDataFrame([("a", "json", "{}")], ["name", "kind", "body"])
    out = parse_proxy_payloads(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "extended"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
