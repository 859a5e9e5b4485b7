"""Generator-truth oracle for the approximate-ANN queries (r4 verdict item 4).

The LSH and IVF pipelines are deterministic end-to-end (seeded hyperplanes,
seeded k-means init, fixed iteration count, explicit tie-breaks), so their
expected top-k can be computed independently in numpy/pure-python and
parquet-registered as a DuckDB oracle — graduating ``ann_topk_lsh`` /
``ann_topk_ivf`` from rows-only to full hash gates.  The bench recall floors
stay as quality tripwires; this file is the *exactness* cross-check.

Float-faithfulness notes (what makes the hashes match bit-for-bit):
- Catalyst's ``aggregate`` lambda is a sequential left fold in array order;
  ``_seq_dot``/``_seq_sq`` reproduce that order in float64 instead of using
  numpy's pairwise-block summation.
- ``F.round(x, 6)`` on a double is java.math.BigDecimal.valueOf(x) (shortest
  decimal repr) setScale(6, HALF_UP); ``_round6`` reproduces exactly that via
  ``Decimal(repr(x))``.
- Signature / assignment matmuls mirror the engine's own numpy calls
  (float64, same functions), so sign bits and argmax agree.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def load_embeddings(path: str):
    """(ids int64 array, embeddings float64 matrix) from a parquet table."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, emb


def _round6(x: float) -> float:
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _seq_dot(mat: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Row-wise dot with strictly sequential (left-to-right) accumulation —
    the IEEE-754 order Catalyst's fold uses; vectorized across rows only."""
    acc = np.zeros(mat.shape[0])
    for j in range(mat.shape[1]):
        acc = acc + mat[:, j] * v[j]
    return acc


def _seq_sq(mat: np.ndarray) -> np.ndarray:
    acc = np.zeros(mat.shape[0])
    for j in range(mat.shape[1]):
        acc = acc + mat[:, j] * mat[:, j]
    return acc


def _rank_topk(ids, cosines, k):
    """(vec_id, cosine, rank) rows ordered by (-cosine, vec_id) — the same
    tie-break as the engine's row_number window."""
    order = sorted(range(len(ids)), key=lambda i: (-cosines[i], ids[i]))[:k]
    return [(int(ids[i]), cosines[i], r + 1) for r, i in enumerate(order)]


def _exact_rerank(ids, emb, qid, qvec, cand_idx, k):
    sub = emb[cand_idx]
    cos = _seq_dot(sub, qvec) / (
        np.sqrt(_seq_sq(sub)) * np.sqrt(_seq_sq(qvec[None, :]))[0]
    )
    cos = [_round6(c) for c in cos]
    return [
        (int(qid), vid, c, r)
        for vid, c, r in _rank_topk(ids[cand_idx], cos, k)
    ]


def _hyperplanes(dim, n_planes, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def expected_topk_lsh(
    ids, emb, query_mask, k=5, n_planes=6, probes=6, n_tables=4,
    dim=64, seed=42,
):
    """Replicates operators/similarity.topk_lsh: per-table sign-bit buckets,
    hamming-1 multi-probe, union of bucket-mates, exact cosine re-rank."""
    rows = []
    all_planes = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    buckets = [
        ((emb @ p.T > 0) @ weights).astype(np.int64) for p in all_planes
    ]
    q_idx = np.nonzero(query_mask)[0]
    for qi in q_idx:
        qid = ids[qi]
        cand = np.zeros(len(ids), dtype=bool)
        for t in range(n_tables):
            b0 = buckets[t][qi]
            probe = {int(b0)} | {
                int(b0 ^ (1 << j)) for j in range(min(probes, n_planes))
            }
            cand |= np.isin(buckets[t], list(probe))
        cand &= ids != qid
        idx = np.nonzero(cand)[0]
        rows.extend(_exact_rerank(ids, emb, qid, emb[qi], idx, k))
    return rows


def expected_topk_ivf(
    ids, emb, query_mask, k=5, n_clusters=8, n_probe=3, iters=4,
    dim=64, seed=42,
):
    """Replicates operators/ivf.topk_ivf: seeded spherical k-means (numpy
    mirror of the distributed Lloyd loop), n_probe nearest clusters,
    cluster-mates re-ranked exactly."""
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_clusters, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    def _assign(c):
        normed = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
        )
        return np.argmax(normed @ c.T, axis=1).astype(np.int32)

    for _ in range(iters):
        a = _assign(centroids)
        new = centroids.copy()
        for c in range(n_clusters):
            mask = a == c
            if mask.any():
                vals = emb[mask].mean(axis=0)
                n = np.linalg.norm(vals)
                if n > 1e-12:
                    new[c] = vals / n
        centroids = new

    assigned = _assign(centroids)
    normed = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    rows = []
    for qi in np.nonzero(query_mask)[0]:
        qid = ids[qi]
        probe = np.argsort(-(normed[qi] @ centroids.T))[:n_probe]
        cand = np.isin(assigned, probe) & (ids != qid)
        rows.extend(_exact_rerank(ids, emb, qid, emb[qi], np.nonzero(cand)[0], k))
    return rows
