"""Round-7 auxiliary benchmarks (bench.py is frozen for measurement; extra
instrumentation lives here per the optimization-round rules).

Modes:
  python bench_extra.py --stages     # noop-isolated stage profile of the
                                     # minhash-LSH pipeline + winnow timings
                                     # (guide §1.4: noop sink, §1.5: labels)
  python bench_extra.py --crawl      # crawl-round phase walls, median of N
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _spark():
    from eastmoneygubacrawler_spark.session import get_spark

    s = get_spark("egs-bench-extra", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, fn, reps=3):
    runs = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t = time.time()
        fn()
        runs.append(round(time.time() - t, 3))
        spark.sparkContext.setJobDescription(None)
    runs.sort()
    return {"label": label, "median_s": runs[len(runs) // 2], "runs": runs}


def main_stages() -> None:
    from pyspark.sql import functions as F

    from eastmoneygubacrawler_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        winnow_fingerprints,
        word_shingles,
    )

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # warm codegen/python workers once, untimed
    minhash_lsh_pairs(docs, k=16, bands=8, n=3, threshold=0.2).count()
    rows = [
        _timed(spark, "minhash_lsh: full",
               lambda: minhash_lsh_pairs(docs, k=16, bands=8, n=3,
                                         threshold=0.2).count()),
        _timed(spark, "minhash_lsh stage: shingles",
               lambda: _noop(word_shingles(docs, 3))),
        _timed(spark, "minhash_lsh stage: signatures",
               lambda: _noop(minhash_signatures(docs, 16, 3))),
        _timed(spark, "winnow k=5 w=4",
               lambda: winnow_fingerprints(docs, 5, 4).count()),
        _timed(spark, "winnow k=25 w=50",
               lambda: winnow_fingerprints(docs, 25, 50).count()),
    ]
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "stages": rows}))
    spark.stop()


def main_crawl(reps: int = 3) -> None:
    import bench

    spark = _spark()
    bench.run_crawl_bench(spark)  # warm
    rows = []
    for _ in range(reps):
        t = time.time()
        m = bench.run_crawl_bench(spark)
        rows.append({"wall_s": round(time.time() - t, 3), "phases": m["phases"],
                     "waves": m["waves"]})
    print(json.dumps({"cpus": CPUS, "runs": rows}))
    spark.stop()


if __name__ == "__main__":
    if "--crawl" in sys.argv:
        main_crawl()
    else:
        main_stages()
