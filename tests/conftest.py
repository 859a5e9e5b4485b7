import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eastmoneygubacrawler_spark.fixtures import FixtureConfig, build_corpus  # noqa: E402
from eastmoneygubacrawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="egs-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return build_corpus(FixtureConfig())


@pytest.fixture(scope="session")
def corpus_dir(spark, corpus, tmp_path_factory):
    from eastmoneygubacrawler_spark.schema import PAGES, POLITENESS, ROBOTS, SEEDS

    out = str(tmp_path_factory.mktemp("fixture_corpus"))
    spark.createDataFrame(corpus["pages"], PAGES).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{out}/pages.parquet")
    spark.createDataFrame(corpus["seeds"], SEEDS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/seeds.parquet")
    spark.createDataFrame(corpus["robots"], ROBOTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/robots.parquet")
    spark.createDataFrame(corpus["politeness"], POLITENESS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/politeness.parquet")
    return out
