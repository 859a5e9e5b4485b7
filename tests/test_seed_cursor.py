"""F2 resume cursor + O1 crawl order direction (core/scheduler.py:202-217)."""

from eastmoneygubacrawler_spark.engine.crawl import _seed_ranks
from eastmoneygubacrawler_spark.schema import SEEDS


def _seeds(spark):
    rows = [
        ("600001", "甲", "SH"), ("600020", "乙", "SH"), ("600300", "丙", "SH"),
        ("600999", "ST丁", "SH"), ("000042", "戊", "SZ"), ("42", "己", "SZ"),
    ]
    return spark.createDataFrame(rows, SEEDS)


def test_asc_order_and_padding(spark):
    got = [
        (r.stock_code, r.host_rank)
        for r in _seed_ranks(_seeds(spark)).orderBy("host_rank").collect()
    ]
    assert got == [
        ("000042", 0), ("600001", 1), ("600020", 2), ("600300", 3),
    ]  # ST dropped, "42" zero-padded and deduped into 000042


def test_start_code_cursor_asc(spark):
    got = sorted(
        r.stock_code
        for r in _seed_ranks(_seeds(spark), start_code="600010").collect()
    )
    assert got == ["600020", "600300"]


def test_start_code_cursor_desc(spark):
    ranks = _seed_ranks(_seeds(spark), start_code="600020", crawl_order="desc")
    got = [(r.stock_code, r.host_rank) for r in ranks.orderBy("host_rank").collect()]
    assert got == [("600020", 0), ("600001", 1), ("000042", 2)]


def test_st_filter_literal_substrings_only(spark):
    """Reference drops literal 'ST'/'st'/'退' only (core/stock_loader.py:61-66):
    mixed-case 'St'/'sT' names must be KEPT."""
    rows = [
        ("600001", "St股份", "SH"),   # kept: neither 'ST' nor 'st' substring
        ("600002", "sT科技", "SH"),   # kept
        ("600003", "ST甲", "SH"),     # dropped
        ("600004", "bst乙", "SH"),    # dropped ('st' substring)
        ("600005", "退市丙", "SH"),   # dropped
        ("600006", "正常", "SH"),     # kept
    ]
    seeds = spark.createDataFrame(rows, SEEDS)
    got = sorted(r.stock_code for r in _seed_ranks(seeds).collect())
    assert got == ["600001", "600002", "600006"]
