"""X15 KDL HMAC-SHA1 signature + X16 IP-scraper regex (S8 vendor plumbing)."""

import base64
import hashlib
import hmac

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.functions.signing import (
    extract_ip_ports,
    kdl_raw_string,
    kdl_signature_udf,
)


def test_extract_ip_ports_both_colons(spark):
    df = spark.createDataFrame(
        [("ok 1.2.3.4:8080 and 5.6.7.8：9999 but not 1.2.3 or x:80",)], ["t"]
    )
    got = df.select(extract_ip_ports(F.col("t")).alias("ips")).collect()[0].ips
    assert got == ["1.2.3.4:8080", "5.6.7.8：9999"]


def test_kdl_signature_matches_reference_construction(spark):
    """Exact mirror of core/proxy_manager.py:246-273: raw = upper(method) +
    path + '?' + sorted k=v query, HMAC-SHA1, base64."""
    secret = "test_secret_key"
    params = {"secret_id": "abc", "num": "5", "format": "json"}
    query = "&".join(f"{k}={params[k]}" for k in sorted(params))
    raw = "GET" + "/api/getdps" + "?" + query
    expect = base64.b64encode(
        hmac.new(secret.encode("utf8"), raw.encode("utf8"), hashlib.sha1).digest()
    ).decode("utf-8")

    df = spark.createDataFrame([("get", "/api/getdps", query)], ["m", "p", "q"])
    out = df.select(
        kdl_signature_udf(secret)(
            kdl_raw_string(F.col("m"), F.col("p"), F.col("q"))
        ).alias("sig")
    ).collect()
    assert out[0].sig == expect
