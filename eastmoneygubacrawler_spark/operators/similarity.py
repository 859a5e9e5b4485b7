"""Similarity search over embedding columns (array<float>).

- ``cosine_expr``: pure-Catalyst cosine (zip_with/aggregate, double math) —
  no Python in the hot path.
- ``topk_brute``: exact top-k per query — broadcast the (small) query set
  against the (huge) corpus, one window per query.  The correctness baseline.
- ``topk_lsh``: random-hyperplane LSH — signatures computed in one vectorized
  pandas UDF (numpy matmul over Arrow batches), candidates restricted to
  bucket-mates (multi-probe via per-plane flips), exact cosine re-rank.
  At 10^9 vectors the bucket join replaces the corpus-wide scan; recall is
  tunable with n_planes/probes (tested ≥ 0.6 vs brute force here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def cosine_expr(a, b):
    """cosine(a, b) as a Catalyst expression (double precision)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def topk_brute(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` per row of ``queries``.

    queries: (query_id, embedding).  Output: (query_id, vec_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("qvec"))
    )
    scored = (
        corpus.select(id_col, vec_col)
        .crossJoin(q)
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cosine", F.round(cosine_expr(F.col(vec_col), F.col("qvec")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signature_udf(planes: np.ndarray):
    """pandas UDF: embedding -> packed sign-bit signature (long)."""

    @F.pandas_udf(LongType())
    def _sig(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        bits = mat.astype(np.float64) @ planes.T > 0  # (batch, n_planes)
        weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return _sig


def topk_lsh(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_planes: int = 6, probes: int = 6, n_tables: int = 4,
    dim: int = 64, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: hyperplane-bucketed candidates, exact re-rank.

    Standard L-table construction: ``n_tables`` independent plane sets; a
    candidate collides if it shares a bucket in ANY table.  Multi-probe: each
    query also probes the buckets at hamming distance 1 (flip one plane bit).
    Recall is tuned by (n_planes, probes, n_tables); candidates scale with
    bucket density, not corpus size — the 10^9-vector path.
    """
    corpus_v = corpus.select(id_col, vec_col)
    q_v = queries.select(F.col(query_id_col), F.col(vec_col).alias("qvec"))

    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        sig = lsh_signature_udf(planes)
        corpus_sig = corpus_v.withColumn("bucket", sig(F.col(vec_col)))
        q_sig = q_v.withColumn("bucket0", sig(F.col("qvec")))
        probe_buckets = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(1 << j)).cast("long")
                for j in range(min(probes, n_planes))
            ],
        )
        q_probes = q_sig.select(
            query_id_col, "qvec", F.explode(probe_buckets).alias("bucket")
        )
        pairs = (
            corpus_sig.join(F.broadcast(q_probes), on="bucket")
            .filter(F.col(query_id_col) != F.col(id_col))
            .select(query_id_col, id_col, vec_col, "qvec")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)

    cand = cand.distinct().withColumn(
        "cosine", F.round(cosine_expr(F.col(vec_col), F.col("qvec")), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
