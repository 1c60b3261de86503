"""Approximate-nearest-neighbour search over an embedding column.

Two paths over ``embeddings(vec_id:int64, embedding:list<float>)``:

- :func:`brute_force_topk` — exact cosine top-k as the baseline: the query
  matrix is broadcast once (``ray.put``), each ``map_batches`` task matmuls
  its Arrow batch of vectors against it and emits per-batch partial top-k;
  a tiny driver-side reduce merges partials.  This is the
  distribute-the-corpus / broadcast-the-queries layout that scales to 100 TB
  of vectors (queries are small; vectors stream).
- :class:`IvfIndex` — the scale path: deterministic k-means-lite coarse
  quantizer; vectors are bucketed by nearest centroid (a ``groupby`` on the
  assignment), queries probe the ``nprobe`` nearest buckets only.  Recall
  is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOPK_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("vec_id", pa.int64()),
     ("similarity", pa.float64())]
)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def brute_force_topk(
    embeddings_ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of each query against every vector.

    Returns (query_id, vec_id, similarity) sorted by (query_id, -sim,
    vec_id); ties broken by ascending vec_id (the BM25 tie-break convention).
    """
    import ray

    q = _unit_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        sims = qm @ _unit_rows(mat).T  # (Q, batch)
        out_q, out_v, out_s = [], [], []
        kk = min(k, ids.size)
        for qi in range(qm.shape[0]):
            s = sims[qi]
            idx = np.lexsort((ids, -s))[:kk]
            out_q.extend([qi] * idx.size)
            out_v.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "similarity": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings_ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=1024
    )
    rows = partials.take_all()  # (num_batches × Q × k) — small
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    out = []
    for qi in sorted(by_q):
        cand = by_q[qi]
        cand.sort(key=lambda r: (-r["similarity"], r["vec_id"]))
        out.extend(cand[:k])
    return pa.Table.from_pylist(out, schema=TOPK_SCHEMA)


class IvfIndex:
    """IVF coarse quantizer: k-means-lite buckets + nprobe search.

    Deterministic: centroids initialize from evenly-strided input rows and
    run a fixed number of Lloyd iterations.  ``build`` is a Dataset pass
    (assignment is a vectorized matmul per batch); the bucket layout is the
    partitioning a 100 TB deployment would write to disk (one parquet
    partition per bucket).
    """

    def __init__(self, n_buckets: int = 16, iters: int = 5, nprobe: int = 3):
        self.n_buckets = n_buckets
        self.iters = iters
        self.nprobe = nprobe
        self.centroids = None
        self._bucket_ids: dict = {}
        self._bucket_vecs: dict = {}

    def build(self, embeddings_ds, vec_col="embedding", id_col="vec_id"):
        rows = embeddings_ds.select_columns([id_col, vec_col]).take_all()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        mat = _unit_rows(np.array([r[vec_col] for r in rows], dtype=np.float64))

        stride = max(1, len(ids) // self.n_buckets)
        centroids = mat[::stride][: self.n_buckets].copy()
        for _ in range(self.iters):
            assign = np.argmax(mat @ centroids.T, axis=1)
            for b in range(centroids.shape[0]):
                members = mat[assign == b]
                if members.size:
                    c = members.mean(axis=0)
                    nrm = np.linalg.norm(c)
                    if nrm > 0:
                        centroids[b] = c / nrm
        assign = np.argmax(mat @ centroids.T, axis=1)
        self.centroids = centroids
        for b in range(centroids.shape[0]):
            mask = assign == b
            self._bucket_ids[b] = ids[mask]
            self._bucket_vecs[b] = mat[mask]
        return self

    def search(self, queries: np.ndarray, k: int = 10) -> pa.Table:
        q = _unit_rows(np.asarray(queries, dtype=np.float64))
        out = []
        for qi in range(q.shape[0]):
            probe = np.argsort(-(self.centroids @ q[qi]))[: self.nprobe]
            ids = np.concatenate([self._bucket_ids[int(b)] for b in probe])
            vecs = np.concatenate([self._bucket_vecs[int(b)] for b in probe])
            if ids.size == 0:
                continue
            s = vecs @ q[qi]
            idx = np.lexsort((ids, -s))[: min(k, ids.size)]
            for j in idx:
                out.append(
                    {"query_id": qi, "vec_id": int(ids[j]),
                     "similarity": float(s[j])}
                )
        return pa.Table.from_pylist(out, schema=TOPK_SCHEMA)
