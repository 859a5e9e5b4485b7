"""X9 year-inference window vs the reference's sequential state machine."""

import random

from eastmoneygubacrawler_spark.operators.year_infer import (
    infer_year,
    infer_year_python,
)


def _run_spark(spark, raws, start_year=2026):
    rows = [(i, r) for i, r in enumerate(raws)]
    df = spark.createDataFrame(rows, ["seq", "publish_time_raw"])
    out = infer_year(
        df, partition_cols=[], order_cols=["seq"], start_year=start_year
    )
    return [r.publish_time for r in out.orderBy("seq").collect()]


def test_two_year_boundaries(spark):
    raws = [
        "01-21 15:30", "01-05 09:00", "12-31 23:59",  # 12 > 1+3 → 2025
        "11-02 08:00", "05-01 12:00", "12-25 00:01",  # 12 > 5+3 → 2024
        "12-01 10:00",
    ]
    assert _run_spark(spark, raws) == infer_year_python(raws, 2026)
    assert _run_spark(spark, raws)[2].startswith("2025-")
    assert _run_spark(spark, raws)[5].startswith("2024-")


def test_no_boundary_when_within_3_months(spark):
    raws = ["06-01 10:00", "08-15 10:00", "09-01 10:00"]  # +2, +1 → no decrement
    out = _run_spark(spark, raws)
    assert all(o.startswith("2026-") for o in out)


def test_unparseable_passthrough(spark):
    raws = ["01-10 08:00", "garbage", "12-01 08:00"]
    out = _run_spark(spark, raws)
    exp = infer_year_python(raws, 2026)
    assert out == exp
    assert out[1] == "garbage"


def test_randomized_sequences_match_reference(spark):
    rng = random.Random(7)
    for trial in range(5):
        months = [rng.randint(1, 12) for _ in range(40)]
        raws = [f"{m:02d}-{rng.randint(1, 28):02d} 12:00" for m in months]
        assert _run_spark(spark, raws) == infer_year_python(raws, 2026), trial


def test_partitioned_independent_state(spark):
    """State resets per (stock, type) — reference resets per content_type
    (core/crawler.py:764-766)."""
    rows = [
        ("a", 0, "01-01 01:00"),
        ("a", 1, "12-01 01:00"),  # → 2025 in partition a
        ("b", 0, "12-01 01:00"),  # fresh state in partition b → 2026
        ("b", 1, "11-01 01:00"),
    ]
    df = spark.createDataFrame(rows, ["grp", "seq", "publish_time_raw"])
    out = infer_year(df, partition_cols=["grp"], order_cols=["seq"], start_year=2026)
    got = {(r.grp, r.seq): r.publish_time for r in out.collect()}
    assert got[("a", 1)].startswith("2025-")
    assert got[("b", 0)].startswith("2026-")
