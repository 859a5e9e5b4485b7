"""Proxy-vendor plumbing functions (S8 family).

- ``extract_ip_ports``: X16 — the free-proxy-source IP scraper regex
  (reference core/proxy_manager.py:373-374: ``\\d+\\.\\d+\\.\\d+\\.\\d+[:：]\\d+``,
  note the fullwidth-colon variant).  Pure Catalyst ``regexp_extract_all``.
- ``kdl_signature_udf``: X15 — the KDL API HMAC-SHA1 request signature
  (reference core/proxy_manager.py:246-273): raw string is
  ``upper(method) + path + '?' + '&'.join(k=v sorted by key)``, signed
  HMAC-SHA1 with the vendor secret, base64-encoded.  Spark has no builtin
  HMAC, so this is an Arrow-batched pandas UDF over Python ``hmac`` — it is
  vendor API plumbing, never a hot-path operator.
"""

from __future__ import annotations

import base64
import hashlib
import hmac

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

IP_PORT_PATTERN = r"\d+\.\d+\.\d+\.\d+[:：]\d+"


def extract_ip_ports(col):
    """X16: all ip:port tokens in a text column (array<string>)."""
    return F.regexp_extract_all(col, F.lit(IP_PORT_PATTERN), 0)


def kdl_raw_string(method, path, query_sorted):
    """The signing raw string as a Catalyst expression:
    upper(method) + path + '?' + query (query must already be key-sorted
    ``k=v&k=v``, exactly core/proxy_manager.py:253-261)."""
    return F.concat(F.upper(method), path, F.lit("?"), query_sorted)


def kdl_signature_udf(secret_key: str):
    """X15: base64(HMAC-SHA1(secret, raw_string)) as a pandas UDF."""
    key = secret_key.encode("utf8")

    @F.pandas_udf(StringType())
    def _sign(raw: pd.Series) -> pd.Series:
        return raw.map(
            lambda s: base64.b64encode(
                hmac.new(key, (s or "").encode("utf8"), hashlib.sha1).digest()
            ).decode("utf-8")
        )

    return _sign
