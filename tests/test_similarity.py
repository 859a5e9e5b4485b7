"""Embedding similarity search: brute-force exact + LSH recall."""

import pytest
from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.operators.similarity import (
    cosine_expr,
    topk_brute,
    topk_lsh,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_cosine_expr_self_is_one(spark, emb):
    row = emb.limit(1)
    v = row.select(cosine_expr(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert abs(v[0].c - 1.0) < 1e-9


def test_topk_brute(spark, emb, queries):
    res = topk_brute(emb, queries, k=10)
    rows = res.collect()
    assert len(rows) == 50  # 5 queries × 10
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine, r.vec_id))
    for q, lst in by_q.items():
        lst.sort()
        cosines = [c for _, c, _ in lst]
        assert cosines == sorted(cosines, reverse=True)
        assert all(v != q for _, _, v in lst)  # self excluded


def test_topk_lsh_recall_vs_brute(spark, emb, queries):
    brute = topk_brute(emb, queries, k=10).collect()
    approx = topk_lsh(emb, queries, k=10, n_planes=6, probes=6, n_tables=4, dim=64).collect()
    b = {}
    for r in brute:
        b.setdefault(r.query_id, set()).add(r.vec_id)
    a = {}
    for r in approx:
        a.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(b[q] & a.get(q, set())) / len(b[q]) for q in b]
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe LSH on 500 vecs


def test_lsh_scores_are_exact_for_returned_rows(spark, emb, queries):
    """LSH may miss candidates but never mis-scores them."""
    brute = {(r.query_id, r.vec_id): r.cosine for r in topk_brute(emb, queries, k=50).collect()}
    for r in topk_lsh(emb, queries, k=10, n_planes=6, probes=6, n_tables=4, dim=64).collect():
        key = (r.query_id, r.vec_id)
        if key in brute:
            assert abs(brute[key] - r.cosine) < 1e-9


def test_topk_ivf_recall_vs_brute(spark):
    """IVF cluster-probe top-k: recall ≥ 0.6 vs exact brute force (same bar
    as the LSH path), deterministic across runs."""
    from eastmoneygubacrawler_spark.operators.ivf import topk_ivf
    from eastmoneygubacrawler_spark.operators.similarity import topk_brute

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r.query_id, r.vec_id)
        for r in topk_brute(emb, queries, k=5).collect()
    }
    ivf1 = {
        (r.query_id, r.vec_id)
        for r in topk_ivf(emb, queries, k=5, n_clusters=8, n_probe=3).collect()
    }
    ivf2 = {
        (r.query_id, r.vec_id)
        for r in topk_ivf(emb, queries, k=5, n_clusters=8, n_probe=3).collect()
    }
    assert ivf1 == ivf2  # deterministic index
    recall = len(ivf1 & brute) / len(brute)
    assert recall >= 0.6, recall
