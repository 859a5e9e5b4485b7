"""IVF (inverted-file) approximate nearest neighbor — the second scale path
next to hyperplane LSH (similarity.py), per the training-data brief.

Classic two-stage design (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — coarse-quantizer half, no PQ codes needed at
this feature size):

1. **fit**: k-means coarse centroids learned DISTRIBUTED — assignment is one
   vectorized numpy matmul per Arrow batch (pandas UDF), the update is a
   pure-Catalyst element-wise mean (posexplode → groupBy(cluster, dim) →
   avg).  Only the k×dim centroid matrix itself (a few KB — model
   parameters, not data) returns to the driver between Lloyd iterations,
   exactly like spark.ml's treeAggregate loop.
2. **probe**: corpus rows carry their cluster id; each query probes its
   ``n_probe`` nearest centroids, candidates = cluster-mates only
   (candidates ∝ corpus/k × n_probe, never the full scan), exact cosine
   re-ranks.

Deterministic: seeded init, fixed iteration count — same input ⇒ same index.
Recall tuned by (n_clusters, n_probe); tested ≥ the LSH path's bar vs brute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _assign_udf(centroids: np.ndarray):
    """cluster id = argmax cosine(vec, centroid) — centroids pre-normalized."""

    @F.pandas_udf(IntegerType())
    def _assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ centroids.T, axis=1).astype(np.int32))

    return _assign


def kmeans_fit(
    corpus: DataFrame, n_clusters: int = 16, iters: int = 4,
    dim: int = 64, seed: int = 42, vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means (cosine): seeded random init, ``iters`` Lloyd steps.

    Per step: assignment via the matmul UDF; the new centroid of each
    cluster is the element-wise mean (posexplode + groupBy — one shuffle of
    (cluster, dim, value) triples), renormalized.  Empty clusters keep their
    previous centroid.  The k×dim result (a few KB) is the returned model.
    """
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_clusters, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    vecs = corpus.select(vec_col)
    for _ in range(iters):
        assigned = vecs.withColumn("cluster", _assign_udf(centroids)(F.col(vec_col)))
        means = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
        )
        # k×dim rows of model parameters — the one driver-side transfer/step
        mp = means.toPandas()
        new = centroids.copy()
        for c, grp in mp.groupby("cluster"):
            vals = grp.sort_values("d")["m"].to_numpy()
            n = np.linalg.norm(vals)
            if n > 1e-12:
                new[int(c)] = vals / n
        centroids = new
    return centroids


def topk_ivf(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_clusters: int = 16, n_probe: int = 4, iters: int = 4,
    dim: int = 64, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: IVF cluster-mates as candidates, exact re-rank.

    Output schema matches topk_brute/topk_lsh: (query_id, vec_id, cosine,
    rank) — interchangeable scale paths."""
    from .similarity import cosine_expr

    centroids = kmeans_fit(corpus, n_clusters, iters, dim, seed, vec_col)
    assign = _assign_udf(centroids)
    corpus_c = corpus.select(id_col, vec_col).withColumn(
        "cluster", assign(F.col(vec_col))
    )

    # each query probes its n_probe nearest centroids
    @F.pandas_udf("array<int>")
    def _probe_clusters(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ centroids.T), axis=1)[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qvec"))
    q_probes = q.select(
        query_id_col, "qvec", F.explode(_probe_clusters(F.col("qvec"))).alias("cluster")
    )
    cand = (
        corpus_c.join(F.broadcast(q_probes), on="cluster")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cosine", F.round(cosine_expr(F.col(vec_col), F.col("qvec")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
