"""Partitioned cuckoo-filter seen set: no false negatives, bounded fp,
delete support, two-layer ≡ exact, engine path ≡ exact path."""

import numpy as np
from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.operators.cuckoo import (
    build_cuckoo_shards,
    build_table,
    contains,
    cuckoo_maybe_seen,
    delete,
    filter_unseen_with_cuckoo,
)
from eastmoneygubacrawler_spark.operators.seen import filter_unseen


def _hashes(n, seed=7):
    return np.random.default_rng(seed).integers(
        -(2**63), 2**63 - 1, size=n, dtype=np.int64
    )


def test_numpy_no_false_negatives_and_fp_bound():
    keys = _hashes(20_000)
    table = build_table(keys)
    assert contains(table, keys).all()  # no false negatives, ever
    other = _hashes(20_000, seed=99)
    fresh = other[~np.isin(other, keys)]
    fp = contains(table, fresh).mean()
    assert fp < 0.05, fp  # 8-bit fp, 2 buckets x 4 slots ⇒ ~3% worst case


def test_numpy_delete_support():
    """The bloom-impossible op: remove keys, the rest still all present."""
    keys = _hashes(5_000)
    table = build_table(keys)
    gone, kept = keys[:1000], keys[1000:]
    assert delete(table, gone) == 1000
    assert contains(table, kept).all()  # deletes never break other keys
    # deleted keys mostly gone (residual hits = fp collisions only)
    assert contains(table, gone).mean() < 0.05


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"]).withColumn(
        "url_hash", F.xxhash64("url")
    )


def test_two_layer_filter_equals_exact(spark):
    n_shards = 8
    seen = _urls_df(spark, [f"https://s.com/{i}" for i in range(2000)])
    cands = _urls_df(spark, [f"https://s.com/{i}" for i in range(1000, 3000)])
    shards = build_cuckoo_shards(seen, n_shards)
    assert shards.columns == ["shard", "m", "table"]
    via_cuckoo = sorted(
        r.url for r in filter_unseen_with_cuckoo(cands, seen, shards, n_shards).collect()
    )
    via_exact = sorted(r.url for r in filter_unseen(cands, seen).collect())
    assert via_cuckoo == via_exact
    # and no seen url is ever flagged new at the filter layer
    flagged = cuckoo_maybe_seen(seen, shards, n_shards)
    assert flagged.filter("NOT maybe_seen").count() == 0


def test_engine_cuckoo_path_equals_exact_path(spark, tmp_path):
    from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
    from eastmoneygubacrawler_spark.fixtures import FixtureConfig, build_corpus
    from eastmoneygubacrawler_spark.schema import PAGES, ROBOTS, SEEDS
    from eastmoneygubacrawler_spark.storage import SnapshotStore

    corpus = build_corpus(FixtureConfig(n_stocks=2, max_count=60, adversarial=False))
    pages = spark.createDataFrame(corpus["pages"], PAGES)
    seeds = spark.createDataFrame(corpus["seeds"], SEEDS)
    robots = spark.createDataFrame(corpus["robots"], ROBOTS)

    def run(use_bloom, flavor, name):
        store = SnapshotStore(str(tmp_path / name))
        cfg = CrawlConfig(
            n_shards=8, fetch_partitions=4, use_bloom=use_bloom,
            seen_filter=flavor, max_depth=1,
        )
        run_crawl(spark, store, pages, seeds, robots, None, cfg)
        run_crawl(spark, store, pages, seeds, robots, None, cfg)
        posts = sorted(
            map(tuple, store.load(spark, "posts").select(
                "stock_code", "content_type", "url_id", "crawl_seq", "full_text"
            ).collect())
        )
        return posts, sorted(r.url for r in store.load(spark, "seen").collect())

    assert run(True, "cuckoo", "ck") == run(False, "bloom", "exact")


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=400, unique=True,
    ),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_cuckoo_properties_random_sets(keys, data):
    """Property: inserted keys are ALWAYS contained; deleting any subset
    never evicts the rest."""
    h = np.array(keys, dtype=np.int64)
    table = build_table(h)
    assert contains(table, h).all()
    n_del = data.draw(st.integers(min_value=0, max_value=len(keys)))
    gone, kept = h[:n_del], h[n_del:]
    assert delete(table, gone) == n_del
    if len(kept):
        assert contains(table, kept).all()
