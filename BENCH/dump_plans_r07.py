"""Dump .explain("formatted") plans for the declared queries into
plans/r07/<query>_<suffix>.txt (suffix = before/after).

Usage: python BENCH/dump_plans_r07.py before [query ...]
Skips crawl_fixture_round (multi-job engine pipeline, not one plan) unless
explicitly requested.
"""

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKIP = {"crawl_fixture_round"}


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from eastmoneygubacrawler_spark.session import get_spark

    spark = get_spark("egs-plans-r07", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(HERE, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    qs = E.queries()
    names = sorted(only) if only else sorted(set(qs) - SKIP)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
