"""Approximate-nearest-neighbour search over an embedding column.

Two paths over ``embeddings(vec_id:int64, embedding:list<float>)``:

- :func:`brute_force_topk` — exact cosine top-k as the baseline: the query
  matrix is broadcast once (``ray.put``), each ``map_batches`` task matmuls
  its Arrow batch of vectors against it and emits per-batch partial top-k;
  a tiny driver-side reduce merges partials.  This is the
  distribute-the-corpus / broadcast-the-queries layout that scales to 100 TB
  of vectors (queries are small; vectors stream).
- :class:`IvfIndex` — the scale path: a PARTITIONED on-disk IVF index.
  Centroids are trained on a bounded sample (never the full dataset),
  assignment is a broadcast-centroid ``map_batches`` pass, and the bucketed
  vectors are written as hive-partitioned parquet
  (``buckets/bucket=B/*.parquet``).  ``search`` prunes at the read: only the
  ``nprobe`` probed bucket partitions are opened (``PathPartitionFilter``),
  and the scoring pass is the same partial-top-k ``map_batches`` shape as
  the brute-force path.  Nothing materializes the full vector set on the
  driver at any point.

Recall is tested against the brute-force baseline; with
``nprobe == n_buckets`` the IVF path is exact (it scans every partition),
which is what the oracle-checked ``ann_ivf_topk`` contract entry uses.
"""

from __future__ import annotations

import os
import tempfile

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


def vectors_to_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, dim) float64 matrix, zero-copy where
    possible (flatten the child values array and reshape — no per-row
    ``to_pylist``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        vals = col.values.to_numpy(zero_copy_only=False)
        off = col.offset * dim
        return (
            vals[off:off + len(col) * dim]
            .reshape(len(col), dim)
            .astype(np.float64, copy=False)
        )
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if widths.size and (widths == widths[0]).all():
            vals = col.values.to_numpy(zero_copy_only=False)
            vals = vals[offsets[0]:offsets[-1]]
            return (
                vals.reshape(widths.size, int(widths[0]))
                .astype(np.float64, copy=False)
            )
    return np.array(col.to_pylist(), dtype=np.float64)


def _matrix_to_list_array(mat: np.ndarray) -> pa.Array:
    """(n, dim) matrix -> fixed-size-list<float64> array, zero-copy."""
    return pa.FixedSizeListArray.from_arrays(
        pa.array(np.ascontiguousarray(mat).ravel(), pa.float64()),
        mat.shape[1] if mat.ndim == 2 else 0,
    )


def _partial_topk_table(
    sims: np.ndarray, ids: np.ndarray, k: int
) -> pa.Table:
    """Per-batch partial top-k rows for every query: sims is (Q, n).

    Exact (similarity desc, vec_id asc) top-k: argpartition finds the
    k-th similarity, boundary ties are kept and resolved by the lexsort
    over the (small) candidate slice — O(n + k log k) per query instead
    of a full O(n log n) lexsort."""
    out_q, out_v, out_s = [], [], []
    kk = min(k, ids.size)
    for qi in range(sims.shape[0]):
        s = sims[qi]
        if ids.size > 2 * kk > 0:
            kth = -np.partition(-s, kk - 1)[kk - 1]
            if np.isneginf(kth):
                cand = np.flatnonzero(~np.isneginf(s))
            else:
                cand = np.flatnonzero(s >= kth)
            order = np.lexsort((ids[cand], -s[cand]))[:kk]
            idx = cand[order]
        else:
            idx = np.lexsort((ids, -s))[:kk]
        if np.isneginf(s[idx]).any():  # drop masked (unprobed) rows
            idx = idx[~np.isneginf(s[idx])]
        out_q.append(np.full(idx.size, qi, np.int64))
        out_v.append(ids[idx].astype(np.int64))
        out_s.append(s[idx].astype(np.float64))
    if out_q:
        q_all = np.concatenate(out_q)
        v_all = np.concatenate(out_v)
        s_all = np.concatenate(out_s)
    else:
        q_all = v_all = np.empty(0, np.int64)
        s_all = np.empty(0, np.float64)
    return pa.table(
        {
            "query_id": pa.array(q_all, pa.int64()),
            "vec_id": pa.array(v_all, pa.int64()),
            "similarity": pa.array(s_all, pa.float64()),
        }
    )


def _merge_partials(rows: list[dict], k: int) -> pa.Table:
    """Driver-side reduce of (num_tasks × Q × k) partial rows — small."""
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    out = []
    for qi in sorted(by_q):
        cand = by_q[qi]
        cand.sort(key=lambda r: (-r["similarity"], r["vec_id"]))
        out.extend(cand[:k])
    return pa.Table.from_pylist(out, schema=TOPK_SCHEMA)


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
        mat = vectors_to_matrix(batch[vec_col])
        sims = qm @ _unit_rows(mat).T  # (Q, batch)
        return _partial_topk_table(sims, ids, k)

    partials = embeddings_ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=1024
    )
    return _merge_partials(partials.take_all(), k)


def train_centroids(
    embeddings_ds,
    n_buckets: int,
    iters: int = 5,
    train_sample: int = 4096,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means-lite coarse quantizer trained on a bounded
    sample (the first ``train_sample`` rows — faiss-style sample training;
    never the full dataset).  Centroids are unit-normalized so assignment
    argmax(v·c) is cosine assignment."""
    sample = (
        embeddings_ds.select_columns([vec_col]).limit(train_sample).take_all()
    )
    mat = _unit_rows(np.array([r[vec_col] for r in sample], dtype=np.float64))
    stride = max(1, mat.shape[0] // n_buckets)
    centroids = mat[::stride][:n_buckets].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for b in range(centroids.shape[0]):
            members = mat[assign == b]
            if members.size:
                c = members.mean(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 0:
                    centroids[b] = c / nrm
    return centroids


class IvfIndex:
    """Partitioned IVF index: ``buckets/bucket=B/*.parquet`` on disk.

    ``build`` is three bounded steps — sample-train centroids, broadcast
    them and assign via ``map_batches`` (vectorized matmul per batch), then
    ``write_parquet(partition_cols=["bucket"])`` so the streaming executor
    writes each bucket partition as blocks finish.  ``search`` reads ONLY
    the probed partitions (path-based partition pruning) and reduces
    per-batch partial top-k on the driver.  Driver memory is O(centroids +
    sample + Q×k), independent of corpus size.
    """

    def __init__(
        self,
        n_buckets: int = 16,
        iters: int = 5,
        nprobe: int = 3,
        index_dir: str | None = None,
        train_sample: int = 4096,
    ):
        self.n_buckets = n_buckets
        self.iters = iters
        self.nprobe = nprobe
        self.train_sample = train_sample
        self.index_dir = index_dir or tempfile.mkdtemp(prefix="ivf-")
        self.centroids: np.ndarray | None = None
        self.id_col = "vec_id"
        self.vec_col = "embedding"

    # -- persistence -------------------------------------------------------
    @property
    def _bucket_root(self) -> str:
        return os.path.join(self.index_dir, "buckets")

    def _save_meta(self) -> None:
        import pyarrow.parquet as pq

        meta = pa.table(
            {
                "centroid": _matrix_to_list_array(self.centroids),
                "nprobe": pa.array(
                    [self.nprobe] * len(self.centroids), pa.int64()
                ),
            }
        )
        pq.write_table(meta, os.path.join(self.index_dir, "centroids.parquet"))

    @classmethod
    def load(cls, index_dir: str) -> "IvfIndex":
        import pyarrow.parquet as pq

        meta = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        cent = vectors_to_matrix(meta["centroid"])
        idx = cls(
            n_buckets=cent.shape[0],
            nprobe=int(meta["nprobe"][0].as_py()),
            index_dir=index_dir,
        )
        idx.centroids = cent
        return idx

    # -- build -------------------------------------------------------------
    def build(self, embeddings_ds, vec_col="embedding", id_col="vec_id"):
        import ray

        self.id_col, self.vec_col = id_col, vec_col
        self.centroids = train_centroids(
            embeddings_ds, self.n_buckets, self.iters,
            self.train_sample, vec_col,
        )
        cent_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            mat = _unit_rows(vectors_to_matrix(batch[vec_col]))
            bucket = np.argmax(mat @ cent.T, axis=1)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
                    vec_col: _matrix_to_list_array(mat),
                }
            )

        (
            embeddings_ds.select_columns([id_col, vec_col])
            .map_batches(assign, batch_format="pyarrow", batch_size=4096)
            .write_parquet(self._bucket_root, partition_cols=["bucket"])
        )
        self._save_meta()
        return self

    # -- search ------------------------------------------------------------
    #: query-batch size at/above which search() fans out as a Ray Data
    #: job instead of probing in-process (the Ray job has ~1-2 s fixed
    #: scheduling overhead — right for offline fan-out over huge
    #: buckets, wrong for serving-style small batches)
    RAY_QUERY_THRESHOLD = 64
    #: in-process bucket cache cap (BYTES of ids+vectors); the cache
    #: drops when exceeded and a single bucket larger than the cap is
    #: served uncached, so a serving engine's resident working set
    #: stays bounded regardless of vector dimensionality
    CACHE_BYTES = 1 << 30

    def search(self, queries: np.ndarray, k: int = 10,
               mode: str = "auto") -> pa.Table:
        """Probe the ``nprobe`` nearest buckets per query.

        ``mode="local"`` reads the probed bucket partitions in-process
        (pyarrow partition-pruned reads, per-bucket LRU cache) and
        scores them with one matmul — the serving path, ~ms warm.
        ``mode="ray"`` streams the probed partitions through a
        ``map_batches`` partial-top-k job — the offline fan-out path for
        bucket sets that dwarf one worker's memory.  ``"auto"`` picks
        ray for query batches of ``RAY_QUERY_THRESHOLD``+ queries.
        Both paths return identical rows (same scoring, same
        (similarity desc, vec_id asc) tie-break).
        """
        if mode not in ("auto", "local", "ray"):
            raise ValueError(f"bad search mode {mode!r}")
        q = _unit_rows(np.asarray(queries, dtype=np.float64))
        # (Q, n_buckets) probe mask: top-nprobe centroids per query
        cscore = q @ self.centroids.T
        nb = self.centroids.shape[0]
        nprobe = min(self.nprobe, nb)
        probe = np.argsort(-cscore, axis=1)[:, :nprobe]
        probe_mask = np.zeros((q.shape[0], nb), dtype=bool)
        probe_mask[np.arange(q.shape[0])[:, None], probe] = True
        wanted = {int(b) for b in np.unique(probe)}
        if mode == "local" or (mode == "auto"
                               and q.shape[0] < self.RAY_QUERY_THRESHOLD):
            return self._search_local(q, probe_mask, wanted, k)
        return self._search_ray(q, probe_mask, wanted, k)

    def _load_bucket(self, b: int):
        """(ids, unit matrix) of one bucket partition, LRU-ish cached."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        cache = getattr(self, "_bucket_cache", None)
        if cache is None:
            cache = self._bucket_cache = {}
            self._bucket_cache_bytes = 0
        hit = cache.get(b)
        if hit is not None:
            return hit
        ds = pads.dataset(self._bucket_root, partitioning="hive")
        t = ds.to_table(
            columns=[self.id_col, self.vec_col],
            filter=pc.field("bucket") == b,
        )
        ids = t[self.id_col].to_numpy().astype(np.int64)
        mat = vectors_to_matrix(t[self.vec_col])
        nbytes = ids.nbytes + mat.nbytes
        if nbytes > self.CACHE_BYTES:
            return ids, mat  # oversized bucket: serve uncached
        if self._bucket_cache_bytes + nbytes > self.CACHE_BYTES:
            cache.clear()
            self._bucket_cache_bytes = 0
        cache[b] = (ids, mat)
        self._bucket_cache_bytes += nbytes
        return cache[b]

    def _search_local(self, q, probe_mask, wanted, k: int) -> pa.Table:
        parts = [self._load_bucket(b) for b in sorted(wanted)]
        parts = [(i, m, b) for (i, m), b in zip(parts, sorted(wanted))
                 if i.size]
        if not parts:
            return pa.Table.from_pylist([], schema=TOPK_SCHEMA)
        ids = np.concatenate([i for i, _m, _b in parts])
        mat = np.vstack([m for _i, m, _b in parts])
        row_bucket = np.concatenate(
            [np.full(i.size, b, np.int64) for i, _m, b in parts]
        )
        sims = q @ mat.T  # vectors stored unit-normalized
        sims = np.where(probe_mask[:, row_bucket], sims, -np.inf)
        # every candidate row is present, so the "partial" IS the final
        # (same ordering contract as _merge_partials)
        return _partial_topk_table(sims, ids, k)

    def _search_ray(self, q, probe_mask, wanted, k: int) -> pa.Table:
        import ray
        import ray.data
        import pyarrow.compute as pc
        from ray.data.datasource.partitioning import PathPartitionFilter

        ds = ray.data.read_parquet(
            self._bucket_root,
            partition_filter=PathPartitionFilter.of(
                lambda d: int(d["bucket"]) in wanted
            ),
        )
        ref = ray.put((q, probe_mask))
        id_col, vec_col = self.id_col, self.vec_col

        def partial(batch: pa.Table) -> pa.Table:
            qm, mask = ray.get(ref)
            ids = batch[id_col].to_numpy()
            # hive partition values may come back as strings
            buckets = pc.cast(
                batch["bucket"], pa.int64()
            ).to_numpy(zero_copy_only=False)
            mat = vectors_to_matrix(batch[vec_col])
            sims = qm @ mat.T  # vectors stored unit-normalized
            sims = np.where(mask[:, buckets], sims, -np.inf)
            return _partial_topk_table(sims, ids, k)

        partials = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        )
        return _merge_partials(partials.take_all(), k)
