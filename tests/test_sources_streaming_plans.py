"""Sources (S1/S2/S9), streaming metrics (§2.9), and plan-quality audits."""

import json
import os

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.plans.audit import (
    assert_no_row_udf,
    assert_pushed_filters,
    assert_read_schema_only,
    explain_str,
)
from eastmoneygubacrawler_spark.sources import (
    load_seed_file,
    load_seeds,
    read_pages,
    write_posts_csv,
)


def test_load_seeds_filters_and_pads(spark, corpus_dir):
    seeds = load_seeds(spark, f"{corpus_dir}/seeds.parquet")
    rows = seeds.collect()
    assert all("ST" not in r["name"].upper() and "退" not in r["name"] for r in rows)
    assert all(len(r.stock_code) == 6 for r in rows)


def test_load_seed_file(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("600519\n# comment\n519\n\n600519\n")
    rows = sorted(r.stock_code for r in load_seed_file(spark, str(p)).collect())
    assert rows == ["000519", "600519"]


def test_write_posts_csv(spark, tmp_path):
    from eastmoneygubacrawler_spark.schema import POSTS

    df = spark.createDataFrame(
        [("600519", "news", "1", "http://u", "t", 1, 2, "2026-01-01 00:00:00",
          None, None, None, None, "t", "official", None, None, 1, 0)],
        POSTS,
    )
    out = str(tmp_path / "csv")
    write_posts_csv(df, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 1 and "url_id" in back.columns


def test_read_pages_pushdown_and_pruning(spark, corpus_dir):
    df = read_pages(spark, f"{corpus_dir}/pages.parquet", columns=["url", "lang"])
    df2 = df.filter(F.col("lang") == "zh")
    assert_pushed_filters(df2, "lang")
    assert_read_schema_only(df2, {"url", "lang"})
    assert_no_row_udf(df2)


def test_crawl_plan_has_no_row_udfs(spark, corpus_dir):
    """The fetch+parse stage plan: Arrow-batched UDFs only."""
    from eastmoneygubacrawler_spark.functions.extract import parse_list_page_udf

    pages = read_pages(spark, f"{corpus_dir}/pages.parquet")
    plan_df = pages.filter(F.col("url").contains("/list,")).select(
        "url", parse_list_page_udf(F.col("html"), F.lit(None).cast("long")).alias("p")
    )
    assert_no_row_udf(plan_df)
    assert "ArrowEvalPython" in explain_str(plan_df, "extended")


def test_streaming_metrics_available_now(spark, tmp_path):
    from eastmoneygubacrawler_spark.streaming import run_metrics_stream_once

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    rows = []
    for i in range(100):
        rows.append(
            {
                "url": f"https://guba.eastmoney.com/p{i}.html",
                "host": "guba.eastmoney.com" if i % 4 else "caifuhao.eastmoney.com",
                "ts": f"2026-03-01T12:{i % 60:02d}:00.000Z",
                "status": "ok" if i % 5 else "retry",
                "bytes": 1000 + i,
            }
        )
    # flush event far past the data: closes all 12:xx windows at the watermark
    rows.append({"url": "f", "host": "flush.example.com",
                 "ts": "2026-03-01T14:00:00.000Z", "status": "ok", "bytes": 0})
    with open(f"{events_dir}/batch1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_metrics_stream_once(spark, events_dir, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() > 0
    agg = got.groupBy("host").agg(F.sum("fetched").alias("n")).collect()
    by_host = {r.host: r.n for r in agg}
    assert by_host["guba.eastmoney.com"] == 75
    assert by_host["caifuhao.eastmoney.com"] == 25

    # poll-loop semantics: new file → second availableNow run ingests only it
    with open(f"{events_dir}/batch2.json", "w") as f:
        f.write(json.dumps({
            "url": "https://guba.eastmoney.com/x.html", "host": "guba.eastmoney.com",
            "ts": "2026-03-01T16:00:00.000Z", "status": "ok", "bytes": 1,
        }) + "\n" + json.dumps({
            "url": "f2", "host": "flush.example.com",
            "ts": "2026-03-01T18:00:00.000Z", "status": "ok", "bytes": 0,
        }))
    run_metrics_stream_once(spark, events_dir, out, ckpt)
    agg2 = spark.read.parquet(out).groupBy("host").agg(F.sum("fetched").alias("n")).collect()
    assert {r.host: r.n for r in agg2}["guba.eastmoney.com"] == 76


def test_stateful_streak_monitor_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: the per-host failure streak carries across
    SEPARATE availableNow runs via the checkpoint — batch 1 ends at streak 2
    (no alert at threshold 3); batch 2 adds one more failure and must trip."""
    import json

    from eastmoneygubacrawler_spark.streaming.state_stream import (
        run_streak_monitor_once,
    )

    events_dir = tmp_path / "events"
    out_dir = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    events_dir.mkdir()

    def write_batch(name, rows):
        with open(events_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_batch("b1.json", [
        {"url": "u1", "host": "h1", "ts": "2026-02-01T08:00:00", "status": "fail", "bytes": 0},
        {"url": "u2", "host": "h1", "ts": "2026-02-01T08:00:01", "status": "fail", "bytes": 0},
        {"url": "u3", "host": "h2", "ts": "2026-02-01T08:00:02", "status": "ok", "bytes": 5},
    ])
    run_streak_monitor_once(spark, str(events_dir), out_dir, ckpt, threshold=3)
    assert spark.read.parquet(out_dir).count() == 0  # streak 2 < 3

    write_batch("b2.json", [
        {"url": "u4", "host": "h1", "ts": "2026-02-01T08:01:00", "status": "fail", "bytes": 0},
        {"url": "u5", "host": "h2", "ts": "2026-02-01T08:01:01", "status": "fail", "bytes": 0},
    ])
    run_streak_monitor_once(spark, str(events_dir), out_dir, ckpt, threshold=3)
    alerts = [(r.host, r.streak) for r in spark.read.parquet(out_dir).collect()]
    # h1 trips at 3 ONLY if state (streak 2) survived the restart; h2 is at 1
    assert alerts == [("h1", 3)]
