"""Text-analysis expressions: token count, lang-ID, quality, fingerprint."""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.functions import textfn as T

SF = "/root/testdata/sf0.001"


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  x ",), ("",), ("one",)], ["text"]
    )
    out = [r[0] for r in df.select(T.token_count(F.col("text"))).collect()]
    assert out == [3, 1, 0, 1]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog and runs to the hills",),
            ("市场行情涨停业绩公告财报增长营收利润股东回购分红",),
            ("xyzzy qwerty plugh foobar bazqux",),
        ],
        ["text"],
    )
    out = [r[0] for r in df.select(T.lang_id(F.col("text"))).collect()]
    assert out == ["en", "zh", "other"]


def test_quality_score_range_and_order(spark):
    good = "the quick brown fox jumps over the lazy dog " * 8
    bad = "!!! ??? ... ;;; ::: !!!"
    df = spark.createDataFrame([(good,), (bad,)], ["text"])
    scores = [r[0] for r in df.select(T.quality_score(F.col("text"))).collect()]
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_doc_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], ["text"]
    )
    fps = [r[0] for r in df.select(T.doc_fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_over_documents_table(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tok"),
        T.lang_id(F.col("text")).alias("pred_lang"),
        T.quality_score(F.col("text")).alias("quality"),
        T.doc_fingerprint(F.col("text")).alias("fp"),
    )
    rows = out.collect()
    assert len(rows) == 500
    assert all(r.n_tok > 0 for r in rows)
    # documents are English word salad → heuristic shouldn't say zh
    assert all(r.pred_lang != "zh" for r in rows)
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert len({r.fp for r in rows}) == 500


def test_bpe_ish_tokens(spark):
    from eastmoneygubacrawler_spark.functions.textfn import (
        bpe_ish_token_count,
        bpe_ish_tokens,
    )

    df = spark.createDataFrame(
        [("It's 2026: 东财 stocks rose 3.5%!",)], ["text"]
    )
    row = df.select(
        bpe_ish_tokens(F.col("text")).alias("t"),
        bpe_ish_token_count(F.col("text")).alias("n"),
    ).collect()[0]
    assert row.t == [
        "It", "'s", " 2026", ":", " 东财", " stocks", " rose", " 3", ".", "5", "%!",
    ]
    assert row.n == 11
