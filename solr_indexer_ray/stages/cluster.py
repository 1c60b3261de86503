"""Search-result clustering — the Solr ClusteringComponent analogue.

Solr's clustering component (carrot2) groups the current result page
into labeled clusters server-side; the reference reaches it the same
way it reaches every other handler (raw GETs,
``/root/reference/solrindexer/search.py:211-237``).  Here the result
set clusters over the corpus's embedding column with a deterministic
spherical k-means: RNG-free farthest-point init, Lloyd
iterations with cosine assignment, empty clusters re-seeded from the
farthest point — RNG-free, so reruns are identical and tests can pin
outputs.

Scale shape: this is the QUERY-side component — it clusters one result
page (top-N hits), so the vectors involved are bounded by N and the
math runs driver-side on a (N, dim) matrix.  Corpus-scale clustering is
:class:`..stages.ann.IvfIndex` (sample-trained centroids, map_batches
assignment, partitioned bucket layout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from solr_indexer_ray.stages.ann import _unit_rows, vectors_to_matrix

__all__ = ["cluster_results", "kmeans_deterministic"]


def kmeans_deterministic(mat: np.ndarray, k: int, iters: int = 10):
    """Deterministic spherical k-means over unit rows: farthest-point
    init (k-means++ made RNG-free: seed with row 0, then repeatedly take
    the point least similar to its nearest chosen centroid), cosine
    assignment (argmax dot), mean-renormalize update, empty clusters
    re-seeded with the point farthest from its centroid.  Returns
    ``(labels, centroids)``."""
    n = mat.shape[0]
    k = min(k, n)
    if k == 0:
        return np.zeros(0, dtype=np.int64), np.zeros((0, mat.shape[1]))
    chosen = [0]
    best_sim = mat @ mat[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, mat @ mat[nxt])
    centroids = mat[chosen].copy()
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        sims = mat @ centroids.T
        labels = np.argmax(sims, axis=1)
        best = sims[np.arange(n), labels]
        for b in range(k):
            members = mat[labels == b]
            if members.size:
                c = members.mean(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 0:
                    centroids[b] = c / nrm
            else:  # re-seed: farthest point from its assigned centroid
                far = int(np.argmin(best))
                centroids[b] = mat[far]
                best[far] = 1.0
    sims = mat @ centroids.T
    labels = np.argmax(sims, axis=1)
    return labels.astype(np.int64), centroids


def cluster_results(engine, query: str, embeddings, k_clusters: int = 5,
                    top_n: int = 50, iters: int = 10,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    label_terms: int = 0) -> pa.Table:
    """Cluster a query's top ``top_n`` hits by their embeddings (Solr
    ClusteringComponent shape: clusters of the current result page).

    ``embeddings`` is a parquet path/dir or a pyarrow-readable dataset
    whose ``id_col`` aligns with the engine's doc ids; hits without an
    embedding are skipped.  Returns ``(cluster, size, position, doc_id,
    score, sim)`` rows — clusters ordered by best-hit rank (Solr lists
    clusters by their top document), members by rank inside each,
    ``sim`` = cosine similarity to the cluster centroid.

    ``label_terms`` > 0 adds a carrot2-style ``label`` column: each
    cluster labeled by its ``label_terms`` most DISTINCTIVE terms —
    member docs as the JLH foreground vs the whole index as background
    (``SearchEngine.significant_terms_for_ids``), space-joined in score
    order.  No stored content needed: labels derive from the postings.
    """
    hits = engine.search(query, k=top_n, fl=["doc_id"])
    ids = hits["doc_id"].to_pylist()
    scores = dict(zip(ids, hits["score"].to_pylist()))

    def _empty() -> pa.Table:
        cols = {"cluster": pa.array([], pa.int64()),
                "size": pa.array([], pa.int64()),
                "position": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "sim": pa.array([], pa.float64())}
        if label_terms > 0:
            cols["label"] = pa.array([], pa.string())
        return pa.table(cols)

    if not ids:
        return _empty()
    ds = (pads.dataset(embeddings) if isinstance(embeddings, str)
          else embeddings)
    t = ds.to_table(columns=[id_col, vec_col],
                    filter=pc.field(id_col).isin(ids))
    have = t[id_col].to_pylist()
    mat_by_id = dict(zip(have, vectors_to_matrix(t[vec_col])))
    kept = [d for d in ids if d in mat_by_id]  # rank order preserved
    if not kept:  # hits exist but none has an embedding row
        return _empty()
    mat = _unit_rows(np.array([mat_by_id[d] for d in kept]))
    labels, centroids = kmeans_deterministic(mat, k_clusters, iters)
    sims = (mat * centroids[labels]).sum(axis=1)
    # clusters ordered by their best (lowest-rank) member
    order: dict = {}
    for rank, lb in enumerate(labels):
        order.setdefault(int(lb), rank)
    cluster_rank = {lb: i for i, (lb, _) in enumerate(
        sorted(order.items(), key=lambda kv: kv[1])
    )}
    sizes = np.bincount(labels, minlength=centroids.shape[0])
    rows = []
    pos: dict = {}
    for rank, (d, lb) in enumerate(zip(kept, labels)):
        c = cluster_rank[int(lb)]
        p = pos.get(c, 0)
        pos[c] = p + 1
        rows.append({"cluster": c, "size": int(sizes[lb]),
                     "position": p, "doc_id": int(d),
                     "score": float(scores[d]),
                     "sim": float(sims[rank])})
    rows.sort(key=lambda r: (r["cluster"], r["position"]))
    schema = [("cluster", pa.int64()), ("size", pa.int64()),
              ("position", pa.int64()), ("doc_id", pa.int64()),
              ("score", pa.float64()), ("sim", pa.float64())]
    if label_terms > 0:
        members: dict = {}
        for d, lb in zip(kept, labels):
            members.setdefault(cluster_rank[int(lb)], []).append(int(d))
        lab = {}
        for c, docs in members.items():
            t = engine.significant_terms_for_ids(
                np.asarray(docs, dtype=np.int64), limit=label_terms,
                min_doc_freq=1,
            )
            lab[c] = " ".join(t["term"].to_pylist())
        for r in rows:
            r["label"] = lab.get(r["cluster"], "")
        schema.append(("label", pa.string()))
    return pa.Table.from_pylist(rows, schema=pa.schema(schema))
