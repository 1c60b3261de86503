"""Deduplication operators over a document Dataset.

Five dedup modes, each expressed Ray-Data-first (hash-partitioned groupbys,
broadcast small sides, no driver-side row loops on the large input):

- :func:`exact_dedup`           sha256(content) hash-partition + first-wins
- :func:`ngram_jaccard_pairs`   exact n-gram Jaccard via shingle equi-join
- :func:`minhash_lsh_pairs`     shingle→minhash→band→bucket groupby
- :func:`simhash_pairs`         simhash + banded buckets + hamming verify
- :func:`embedding_dup_pairs`   cosine near-dup via broadcast matrix

Reference precedent: exact identity dedup exists only as Solr upsert-by-id
(SURVEY.md §2.8); the content-level modes are the training-data extensions
the north brief requires.  All hashing primitives are in
:mod:`solr_indexer_ray.functions.hashing` (deterministic, seeded).
"""

from __future__ import annotations

import logging
import os
from functools import lru_cache as _lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LOG = logging.getLogger(__name__)

from solr_indexer_ray.functions.hashing import (
    band_keys_batch,
    minhash_params,
    minhash_signatures_batch,
    sha256_hex,
    shingle_hashes,
    simhash_band_keys,
)
from solr_indexer_ray.functions.tokenize import simple_analyzer

PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("similarity", pa.float64())]
)


def _empty_pairs(extra_cols: tuple = ()) -> pa.Table:
    cols = {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
    }
    for name in extra_cols:
        cols[name] = pa.array([], pa.float64() if name == "similarity"
                              else pa.int64())
    return pa.table(cols)


def _pair_columns(ds) -> tuple:
    """Collect a candidate-pair Dataset to driver numpy columns WITHOUT
    per-row Python dicts: fetch the underlying Arrow blocks by reference
    and concatenate the two int64 columns (rows with null ``id_a`` —
    boundary sentinels from the sorted-block pass — are dropped).

    Driver cost is two int64 arrays (16 bytes/pair), not O(pairs) dict
    objects (VERDICT r4 item 2, minimum form).
    """
    import ray

    a_parts, b_parts = [], []
    for tbl in ray.get(ds.to_arrow_refs()):
        if tbl.num_rows == 0:
            continue
        if tbl["id_a"].null_count:
            tbl = tbl.filter(pc.is_valid(tbl["id_a"]))
            if tbl.num_rows == 0:
                continue
        a_parts.append(
            tbl["id_a"].combine_chunks().to_numpy().astype(np.int64)
        )
        b_parts.append(
            tbl["id_b"].combine_chunks().to_numpy().astype(np.int64)
        )
    if not a_parts:
        empty = np.empty(0, np.int64)
        return empty, empty
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _bucket_pairs(ids: np.ndarray, clique_cap: int, what: str, key) -> tuple:
    """Candidate (a, b) arrays for one LSH bucket.

    Buckets up to ``clique_cap`` emit the full clique (max recall, O(B²)
    bounded by the cap).  Larger buckets emit STAR pairs — every id paired
    with the bucket min — O(B) with the same union-find connectivity, so a
    mass-duplicated boilerplate bucket (millions of copies at 100 TB)
    costs B-1 pairs instead of B(B-1)/2 (VERDICT r3 item 1)."""
    if ids.size <= clique_cap:
        ia, ib = np.triu_indices(ids.size, k=1)
        return ids[ia], ids[ib]
    _LOG.warning(
        "%s: bucket %r has %d docs > clique_cap=%d; emitting star pairs "
        "(connectivity-preserving, O(B) not O(B^2))",
        what, key, ids.size, clique_cap,
    )
    return np.full(ids.size - 1, ids[0], dtype=ids.dtype), ids[1:]


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (per-byte table lookup)."""
    return _POP8[x.view(np.uint8).reshape(x.size, 8)].sum(axis=1)


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivors of exact-content dedup: min id per sha256(content).

    hash-partition by content hash (``groupby`` shuffle) + per-group
    first-wins; returns a Dataset of (sha256, doc_id) survivors.
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [sha256_hex(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {"sha256": pa.array(hashes, pa.string()), id_col: batch[id_col]}
        )

    def keep_first(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        return pa.table(
            {
                "sha256": group["sha256"][:1],
                id_col: pa.array([int(ids.min())], pa.int64()),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("sha256")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def exact_dup_dropped_ids(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Ids DROPPED by exact-content dedup: every id except the min per
    sha256(content) group.  Singleton groups emit nothing, so the result
    is bounded by the number of actual duplicate rows — the side to
    broadcast at corpus scale (the keep set is O(corpus); the dropped
    set is O(dups))."""
    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [sha256_hex(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {"sha256": pa.array(hashes, pa.string()), id_col: batch[id_col]}
        )

    def drop_rest(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        dead = np.sort(ids)[1:]
        return pa.table({id_col: pa.array(dead, pa.int64())})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("sha256")
        .map_groups(drop_rest, batch_format="pyarrow")
    )


# --------------------------------------------------------------------- #
# shingle explode (shared by jaccard + minhash verify)
# --------------------------------------------------------------------- #
def _task_pool_kwargs(concurrency) -> dict:
    """map_batches kwargs for the vectorized hasher kernels.

    These kernels hold no real state (hash params are lru_cached at module
    level per worker), so they run as PLAIN TASKS: warm Ray workers, no
    actor cold-start, elastic up to the whole cluster — the scalable
    default that a fixed pool (the old hardcoded ``concurrency=2``) and
    even a cluster-sized actor pool (per-job actor spin-up) both lose to.
    An explicit ``concurrency`` caps concurrent tasks instead.
    """
    return {} if concurrency is None else {"concurrency": concurrency}


def _explode_shingles(batch: pa.Table, *, text_col: str, id_col: str,
                      n: int) -> pa.Table:
    """doc rows -> (shingle_hash, doc_id, n_shingles) rows."""
    sh_out, id_out, cnt_out = [], [], []
    for text, did in zip(
        batch[text_col].to_pylist(), batch[id_col].to_pylist()
    ):
        sh = shingle_hashes(simple_analyzer(text or ""), n)
        sh_out.append(sh.astype(np.int64))
        id_out.append(np.full(sh.size, did, dtype=np.int64))
        cnt_out.append(np.full(sh.size, sh.size, dtype=np.int64))
    if not sh_out:
        sh_all = np.empty(0, np.int64)
        id_all = cnt_all = sh_all
    else:
        sh_all = np.concatenate(sh_out)
        id_all = np.concatenate(id_out)
        cnt_all = np.concatenate(cnt_out)
    return pa.table(
        {
            "shingle": pa.array(sh_all, pa.int64()),
            "doc_id": pa.array(id_all, pa.int64()),
            "n_shingles": pa.array(cnt_all, pa.int64()),
        }
    )


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    hot_shingle_cap: int | None = 512,
    concurrency=None,
):
    """EXACT n-gram Jaccard near-dup pairs via shingle equi-join.

    No LSH approximation: docs sharing >=1 shingle become candidate pairs
    (``groupby(shingle)``), pair intersection counts come from a second
    grouped count, and union sizes from the carried per-doc shingle counts —
    so the result is exactly ``{(a,b): J(a,b) >= threshold}``.  This is the
    oracle-checkable dedup mode (the SQL oracle runs the same equi-join,
    with ``hot_shingle_cap=None``).

    ``hot_shingle_cap``: shingles appearing in more than this many docs are
    SKIPPED (each is a warning-logged O(df²) candidate-pair bomb — one
    boilerplate license-header shingle at 100 TB would otherwise emit
    trillions of pairs while adding only common-boilerplate evidence).
    Defaults ON (512) as the safe pipeline entry point; pass ``None`` for
    the exact mode when the corpus is known to be cap-free — skipping a
    shingle can only lower intersection counts, so the capped mode
    under-reports similarity for pairs sharing hot shingles, never
    over-reports pairs.

    ``concurrency``: ``None`` (default) runs the shingle explode as an
    elastic task pool (see :func:`_task_pool_kwargs`); an int caps it.
    """
    exploded = ds.map_batches(
        _explode_shingles,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "n": n},
        batch_format="pyarrow",
        **_task_pool_kwargs(concurrency),
    )

    def pairs_in_group(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        counts = dict(
            zip(group["doc_id"].to_pylist(), group["n_shingles"].to_pylist())
        )
        hot = hot_shingle_cap is not None and ids.size > hot_shingle_cap
        if hot:
            _LOG.warning(
                "ngram_jaccard: skipping hot shingle %d (df=%d > cap=%d); "
                "pairs sharing only this shingle are dropped",
                int(group["shingle"][0].as_py()), ids.size, hot_shingle_cap,
            )
        if ids.size < 2 or hot:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "n_a": pa.array([], pa.int64()),
                 "n_b": pa.array([], pa.int64())}
            )
        ia, ib = np.triu_indices(ids.size, k=1)
        return pa.table(
            {
                "id_a": pa.array(ids[ia], pa.int64()),
                "id_b": pa.array(ids[ib], pa.int64()),
                "n_a": pa.array([counts[int(i)] for i in ids[ia]], pa.int64()),
                "n_b": pa.array([counts[int(i)] for i in ids[ib]], pa.int64()),
            }
        )

    candidate_pairs = exploded.groupby("shingle").map_groups(
        pairs_in_group, batch_format="pyarrow"
    )

    def score_pairs(group: pa.Table) -> pa.Table:
        inter = group.num_rows  # one row per shared shingle
        n_a = group["n_a"][0].as_py()
        n_b = group["n_b"][0].as_py()
        union = n_a + n_b - inter
        sim = inter / union if union else 1.0
        if sim < threshold:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "similarity": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "id_a": group["id_a"][:1],
                "id_b": group["id_b"][:1],
                "similarity": pa.array([sim], pa.float64()),
            }
        )

    return candidate_pairs.groupby(["id_a", "id_b"]).map_groups(
        score_pairs, batch_format="pyarrow"
    )


# --------------------------------------------------------------------- #
# MinHash + LSH
# --------------------------------------------------------------------- #
@_lru_cache(maxsize=32)
def _cached_minhash_params(num_perm: int, seed: int):
    return minhash_params(num_perm, seed)


def _minhash_batch(batch: pa.Table, *, text_col, id_col, n, num_perm,
                   bands, seed) -> pa.Table:
    """doc rows -> (band_key, doc_id) rows, vectorized across the whole
    batch: per-doc shingle arrays -> one reduceat minhash -> one band-mix
    matmul; no per-doc Python beyond tokenize+shingle (memoized token
    hashes).  Permutation params are lru_cached per worker process."""
    a, b = _cached_minhash_params(num_perm, seed)
    sh_list = [
        shingle_hashes(simple_analyzer(t or ""), n)
        for t in batch[text_col].to_pylist()
    ]
    sigs = minhash_signatures_batch(sh_list, a, b)
    keys = band_keys_batch(sigs, bands)  # (n_docs, bands) int64
    ids = batch[id_col].to_numpy()
    return pa.table(
        {"band_key": pa.array(keys.ravel(), pa.int64()),
         "doc_id": pa.array(np.repeat(ids, bands), pa.int64())}
    )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    concurrency=None,
    clique_cap: int = 64,
):
    """MinHash+LSH near-dup candidates with exact-Jaccard verification.

    shingle→minhash→band→bucket ``groupby(band_key)`` produces candidate
    pairs; each candidate is then verified with EXACT Jaccard recomputed
    from the candidate docs' shingles — fully distributed (see below).
    Returns a Dataset of verified pairs ``(id_a, id_b, similarity >=
    threshold)``.  Unlike :func:`ngram_jaccard_pairs` this can miss pairs
    (LSH recall < 1), but candidate generation is O(docs), not
    O(shared-shingle df²) — the scale path.  Band/row choice:
    P(candidate) = 1-(1-J^r)^b with r=num_perm/bands.

    Scale shape (VERDICT r3 items 1+2):

    - Buckets larger than ``clique_cap`` emit STAR candidate pairs (every
      doc × the bucket-min doc) instead of the full clique — O(B) per
      bucket with identical union-find connectivity, so a single
      mass-duplicated boilerplate file at 100 TB costs B-1 candidates,
      not B(B-1)/2.  Buckets within the cap keep the clique (max recall).
    - Exact verification is DISTRIBUTED: only the candidate (id_a, id_b)
      int pairs touch the driver (O(candidates), star-bounded); the
      corpus then streams ONCE through a shingle-explode keyed by pair,
      and a ``groupby(pair)`` computes each pair's exact Jaccard from the
      two docs' shingles.  No per-doc shingle sets are ever held on the
      driver.
    """
    import ray
    import ray.data as rd

    hashed = ds.map_batches(
        _minhash_batch,
        fn_kwargs={
            "text_col": text_col, "id_col": id_col, "n": n,
            "num_perm": num_perm, "bands": bands, "seed": 1,
        },
        batch_format="pyarrow",
        **_task_pool_kwargs(concurrency),
    )

    # Candidate extraction: ONE range-partitioned sort shuffle, then a
    # vectorized per-block pass.  Within each sorted block every interior
    # bucket is complete, so singleton buckets (the overwhelming
    # majority) are dropped by a numpy unique/count — NO per-group Python
    # call per singleton (a groupby().map_groups() here costs one Python
    # call per band key, ~10^13 of them at 100 TB).  Buckets that may
    # span a block boundary (the block's min/max key) pass through as
    # leftover rows — tiny (2 keys per block) — and resolve in a second
    # groupby over just those rows, so a mass-duplicated bucket larger
    # than a block still aggregates distributed.
    mixed_schema = pa.schema(
        [("band_key", pa.int64()), ("doc_id", pa.int64()),
         ("id_a", pa.int64()), ("id_b", pa.int64())]
    )

    def block_pairs(batch: pa.Table) -> pa.Table:
        keys = batch["band_key"].to_numpy()
        if keys.size == 0:
            return mixed_schema.empty_table()
        ids = batch["doc_id"].to_numpy()
        boundary = (keys == keys[0]) | (keys == keys[-1])
        uk, starts, cnts = np.unique(
            keys, return_index=True, return_counts=True
        )
        out_a, out_b = [], []
        # python loop ONLY over duplicated interior buckets (rare)
        for j in np.flatnonzero(cnts >= 2):
            s = starts[j]
            if boundary[s]:
                continue
            gids = np.unique(ids[s:s + cnts[j]])
            if gids.size < 2:
                continue
            a, b = _bucket_pairs(gids, clique_cap, "minhash_lsh",
                                 int(uk[j]))
            out_a.append(a)
            out_b.append(b)
        n_left = int(boundary.sum())
        a_all = (np.concatenate(out_a) if out_a
                 else np.empty(0, np.int64)).astype(np.int64)
        b_all = (np.concatenate(out_b) if out_b
                 else np.empty(0, np.int64)).astype(np.int64)
        null_left = pa.nulls(n_left, pa.int64())
        null_pairs = pa.nulls(a_all.size, pa.int64())
        return pa.table(
            {
                "band_key": pa.concat_arrays(
                    [pa.array(keys[boundary], pa.int64()), null_pairs]
                ),
                "doc_id": pa.concat_arrays(
                    [pa.array(ids[boundary], pa.int64()), null_pairs]
                ),
                "id_a": pa.concat_arrays(
                    [null_left, pa.array(a_all, pa.int64())]
                ),
                "id_b": pa.concat_arrays(
                    [null_left, pa.array(b_all, pa.int64())]
                ),
            },
            schema=mixed_schema,
        )

    # mixed is TINY (pairs + per-block boundary rows); materializing it
    # is bounded by the candidate count, never O(corpus).
    mixed = (
        hashed.sort("band_key")
        .map_batches(block_pairs, batch_size=None, batch_format="pyarrow")
        .materialize()
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        if ids.size < 2:
            return _empty_pairs()
        a, b = _bucket_pairs(
            ids, clique_cap, "minhash_lsh",
            group["band_key"][0].as_py(),
        )
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    leftover_pairs = (
        mixed.map_batches(
            lambda t: t.filter(pc.is_valid(t["doc_id"])),
            batch_format="pyarrow",
        )
        .groupby("band_key")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    # Only the candidate id pairs reach the driver (two int64 numpy
    # columns, star-bounded — O(docs·bands) worst case); the per-doc
    # shingle state stays remote.  Cross-band duplicate pairs dedup here
    # with one np.unique — no extra shuffle job.
    mixed_a, mixed_b = _pair_columns(mixed)
    left_a, left_b = _pair_columns(leftover_pairs)
    pair_a = np.concatenate([mixed_a, left_a])
    pair_b = np.concatenate([mixed_b, left_b])
    if pair_a.size == 0:
        return rd.from_arrow(pa.Table.from_pylist([], schema=PAIR_SCHEMA))

    uniq = np.unique(np.stack([pair_a, pair_b], axis=1), axis=0)
    pair_a, pair_b = uniq[:, 0].copy(), uniq[:, 1].copy()
    # CSR membership index (doc -> pair indices) — sorted numpy, no
    # Python dict: broadcastable and O(pairs) ints on the driver.
    nodes = np.concatenate([pair_a, pair_b])
    ks = np.tile(np.arange(pair_a.size, dtype=np.int64), 2)
    order = np.argsort(nodes, kind="stable")
    nodes_sorted, ks_sorted = nodes[order], ks[order]
    mem_nodes, starts = np.unique(nodes_sorted, return_index=True)
    ends = np.append(starts[1:], nodes_sorted.size)
    mem_ref = ray.put((pair_a, pair_b, mem_nodes, starts, ends, ks_sorted))

    row_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("doc_id", pa.int64()), ("shingle", pa.int64()),
         ("n_shingles", pa.int64()), ("is_real", pa.bool_())]
    )

    def explode_by_pair(batch: pa.Table):
        """Per candidate doc: one sentinel row per pair membership (so a
        pair group always sees both docs, even zero-shingle ones) plus
        its shingle rows replicated per membership.  Yields chunks so a
        hub doc (bucket min with many partners) cannot inflate one
        output block."""
        a_arr, b_arr, mem_nodes, starts, ends, ks_sorted = ray.get(mem_ref)
        cols: dict = {name: [] for name in row_schema.names}
        n_rows = 0
        for text, did in zip(
            batch[text_col].to_pylist(), batch[id_col].to_pylist()
        ):
            j = int(np.searchsorted(mem_nodes, int(did)))
            if j >= mem_nodes.size or mem_nodes[j] != did:
                continue
            ks = ks_sorted[starts[j]:ends[j]]
            sh = shingle_hashes(
                simple_analyzer(text or ""), n
            ).astype(np.int64)
            for k in ks:
                m = sh.size + 1  # shingles + sentinel
                cols["id_a"].append(np.full(m, a_arr[k]))
                cols["id_b"].append(np.full(m, b_arr[k]))
                cols["doc_id"].append(np.full(m, did, dtype=np.int64))
                cols["shingle"].append(
                    np.concatenate([sh, np.zeros(1, np.int64)])
                )
                cols["n_shingles"].append(
                    np.full(m, sh.size, dtype=np.int64)
                )
                cols["is_real"].append(
                    np.concatenate(
                        [np.ones(sh.size, bool), np.zeros(1, bool)]
                    )
                )
                n_rows += m
                if n_rows >= 65536:
                    yield pa.table(
                        {c: np.concatenate(v) for c, v in cols.items()},
                        schema=row_schema,
                    )
                    cols = {name: [] for name in row_schema.names}
                    n_rows = 0
        if n_rows:
            yield pa.table(
                {c: np.concatenate(v) for c, v in cols.items()},
                schema=row_schema,
            )

    def verify(group: pa.Table) -> pa.Table:
        a = group["id_a"][0].as_py()
        b = group["id_b"][0].as_py()
        docs = group["doc_id"].to_numpy()
        real = group["is_real"].to_numpy()
        sh = group["shingle"].to_numpy()
        ns = group["n_shingles"].to_numpy()
        a_side = docs == a
        if not a_side.any() or a_side.all():
            # candidate doc missing from the corpus stream: unverifiable
            return _empty_pairs(("similarity",))
        n_a = int(ns[a_side][0])
        n_b = int(ns[~a_side][0])
        inter = np.intersect1d(
            sh[a_side & real], sh[~a_side & real]
        ).size
        union = n_a + n_b - inter
        sim = 1.0 if union == 0 else inter / union
        if sim < threshold:
            return _empty_pairs(("similarity",))
        return pa.table(
            {
                "id_a": pa.array([a], pa.int64()),
                "id_b": pa.array([b], pa.int64()),
                "similarity": pa.array([sim], pa.float64()),
            }
        )

    return (
        ds.map_batches(explode_by_pair, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(verify, batch_format="pyarrow")
    )


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #
_SHIFTS64 = np.arange(64, dtype=np.uint64)


def _simhash64_vec(th: np.ndarray, w: np.ndarray) -> int:
    """Vectorized :func:`simhash64` over per-distinct-token hashes ``th``
    with counts ``w`` — identical output, no Python loop over tokens."""
    if th.size == 0:
        return 0
    bits = ((th[:, None] >> _SHIFTS64[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = ((2 * bits - 1) * w[:, None].astype(np.int64)).sum(axis=0)
    return int(
        ((votes > 0).astype(np.uint64) << _SHIFTS64).sum(dtype=np.uint64)
    )


def _simhash_batch(batch: pa.Table, *, text_col, id_col,
                   bands) -> pa.Table:
    keys, ids, sigs = [], [], []
    from solr_indexer_ray.functions.hashing import token_hashes

    for text, did in zip(
        batch[text_col].to_pylist(), batch[id_col].to_pylist()
    ):
        th, w = np.unique(
            token_hashes(simple_analyzer(text or "")), return_counts=True
        )
        sig = _simhash64_vec(th, w)
        for key in simhash_band_keys(sig, bands):
            keys.append(key)
            ids.append(did)
            sigs.append(sig - (1 << 63))  # store as signed int64
    return pa.table(
        {
            "band_key": pa.array(keys, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array(sigs, pa.int64()),
        }
    )


def simhash_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    concurrency=None,
    clique_cap: int = 256,
):
    """SimHash near-dup pairs: banded bucket groupby + hamming verification.

    Pigeonhole guarantee: any pair within hamming distance < ``bands``
    shares at least one band bucket, so recall is exact for
    ``max_hamming < bands`` — for buckets within ``clique_cap``.  Larger
    buckets (mass-duplicated boilerplate at 100 TB) emit STAR pairs (every
    doc × the bucket-min doc, O(B) not O(B²)) with a logged warning; the
    union-find components downstream stay connected through the hub
    (VERDICT r3 item 1).  Hamming verification is vectorized
    (XOR + byte-table popcount), no Python pair loop.
    """
    hashed = ds.map_batches(
        _simhash_batch,
        fn_kwargs={
            "text_col": text_col, "id_col": id_col, "bands": bands,
        },
        batch_format="pyarrow",
        **_task_pool_kwargs(concurrency),
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        sigs = group["sig"].to_numpy()
        order = np.argsort(ids)
        ids, sigs = ids[order], sigs[order]
        uniq, first = np.unique(ids, return_index=True)
        if uniq.size < 2:
            return _empty_pairs(("similarity",))
        # stored signed (sig - 2^63) == bit pattern sig XOR 2^63, so the
        # uint64 view XORs to the true signature XOR — popcount is exact
        bits = sigs[first].view(np.uint64)
        if uniq.size <= clique_cap:
            ia, ib = np.triu_indices(uniq.size, k=1)
        else:
            _LOG.warning(
                "simhash: bucket %r has %d docs > clique_cap=%d; emitting "
                "star pairs (connectivity-preserving, O(B) not O(B^2))",
                group["band_key"][0].as_py(), uniq.size, clique_cap,
            )
            ia = np.zeros(uniq.size - 1, dtype=np.int64)
            ib = np.arange(1, uniq.size, dtype=np.int64)
        d = _popcount64(bits[ia] ^ bits[ib])
        keep = d <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(uniq[ia[keep]], pa.int64()),
                "id_b": pa.array(uniq[ib[keep]], pa.int64()),
                "similarity": pa.array(1.0 - d[keep] / 64.0, pa.float64()),
            }
        )

    return (
        hashed.groupby("band_key")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )


# --------------------------------------------------------------------- #
# embedding cosine near-dup
# --------------------------------------------------------------------- #
#: ``embedding_dup_pairs(method="auto")`` switches exact -> IVF above
#: this row count: the exact mode broadcasts the whole matrix and does
#: O(N²) work, safe only at small N (VERDICT r3 item 4).
EXACT_DUP_MAX_ROWS = 50_000


def embedding_dup_pairs(
    embeddings_ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    method: str = "auto",
    n_buckets: int = 32,
    assign_probes: int = 2,
    train_sample: int = 4096,
):
    """Cosine near-dup pairs over an embedding column.

    ``method="auto"`` (default): exact when the input has at most
    ``EXACT_DUP_MAX_ROWS`` rows, else IVF with a logged notice — so a
    caller with defaults can never trigger the O(N²) broadcast at corpus
    scale (VERDICT r3 item 4).  Pass ``method="exact"`` to opt into the
    quadratic mode explicitly at any size.

    ``method="exact"`` (the oracle-checked mode): materialize the embedding
    matrix ONCE, broadcast it via ``ray.put``, then fan the O(N²) similarity
    work out as ``map_batches`` over row chunks — each task matmuls its
    chunk against the broadcast matrix (O(N²/P) per task), emitting only
    pairs with ``id_a < id_b`` and cosine >= threshold.  Exact but the
    broadcast side is the whole matrix — small-N only.

    ``method="ivf"`` (the scale path): IVF-bucketed candidate generation —
    centroids trained on a bounded sample (``stages.ann.train_centroids``),
    each vector multi-assigned to its ``assign_probes`` nearest buckets via
    ``map_batches`` (replication raises recall: near-dups co-locate in at
    least one bucket with high probability), then a ``groupby(bucket)``
    computes exact in-bucket cosine pairs.  Precision is exact (every
    emitted pair's cosine is computed from the true vectors); recall < 1
    for pairs whose vectors never share a probed bucket.  Nothing
    materializes the corpus on the driver.
    """
    if method == "auto":
        n = embeddings_ds.count()
        if n > EXACT_DUP_MAX_ROWS:
            _LOG.warning(
                "embedding_dup_pairs: %d rows > EXACT_DUP_MAX_ROWS=%d; "
                "auto-switching to method='ivf' (pass method='exact' to "
                "force the O(N^2) broadcast mode)",
                n, EXACT_DUP_MAX_ROWS,
            )
            method = "ivf"
        else:
            method = "exact"
    if method == "ivf":
        return _embedding_dup_pairs_ivf(
            embeddings_ds, vec_col, id_col, threshold,
            n_buckets, assign_probes, train_sample,
        )
    if method != "exact":
        raise ValueError(f"unknown method: {method!r}")

    import ray

    from solr_indexer_ray.stages.ann import vectors_to_matrix

    rows_tbl = pa.Table.from_pylist(
        embeddings_ds.select_columns([id_col, vec_col]).take_all()
    )
    ids = rows_tbl[id_col].to_numpy()
    mat = vectors_to_matrix(rows_tbl[vec_col])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    ref = ray.put((ids, unit))

    def chunk_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(ref)
        pos = {int(v): i for i, v in enumerate(all_ids)}
        rows_idx = np.array([pos[int(v)] for v in batch[id_col].to_pylist()])
        sims = all_unit[rows_idx] @ all_unit.T  # (chunk, N)
        out_a, out_b, out_s = [], [], []
        for r, gi in enumerate(rows_idx):
            mask = sims[r] >= threshold
            for gj in np.flatnonzero(mask):
                if all_ids[gi] < all_ids[gj]:
                    out_a.append(int(all_ids[gi]))
                    out_b.append(int(all_ids[gj]))
                    out_s.append(float(sims[r, gj]))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "similarity": pa.array(out_s, pa.float64()),
            }
        )

    return embeddings_ds.select_columns([id_col]).map_batches(
        chunk_pairs, batch_format="pyarrow", batch_size=256
    )


def _embedding_dup_pairs_ivf(
    embeddings_ds, vec_col, id_col, threshold,
    n_buckets, assign_probes, train_sample,
):
    """IVF-bucketed candidate generation for :func:`embedding_dup_pairs`."""
    import ray

    from solr_indexer_ray.stages.ann import (
        _unit_rows,
        train_centroids,
        vectors_to_matrix,
        _matrix_to_list_array,
    )

    centroids = train_centroids(
        embeddings_ds, n_buckets, train_sample=train_sample, vec_col=vec_col
    )
    cent_ref = ray.put(centroids)
    probes = min(assign_probes, centroids.shape[0])

    def assign_multi(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = _unit_rows(vectors_to_matrix(batch[vec_col]))
        sims = mat @ cent.T  # (n, n_buckets)
        top = np.argsort(-sims, axis=1)[:, :probes]  # (n, p)
        n = mat.shape[0]
        rep_idx = np.repeat(np.arange(n), probes)
        return pa.table(
            {
                "bucket": pa.array(top.ravel().astype(np.int64), pa.int64()),
                id_col: batch[id_col].take(pa.array(rep_idx)),
                vec_col: _matrix_to_list_array(mat[rep_idx]),
            }
        )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        uniq, first = np.unique(ids, return_index=True)
        mat = vectors_to_matrix(group[vec_col])[order][first]
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table(
            {
                "id_a": pa.array(uniq[ia].astype(np.int64), pa.int64()),
                "id_b": pa.array(uniq[ib].astype(np.int64), pa.int64()),
                "similarity": pa.array(sims[ia, ib], pa.float64()),
            }
        )

    return (
        embeddings_ds.select_columns([id_col, vec_col])
        .map_batches(assign_multi, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )


# --------------------------------------------------------------------- #
# near-dup survivor selection (the "cleaned corpus" step)
# --------------------------------------------------------------------- #
def component_dropped_ids(pair_rows) -> set:
    """Ids to DROP: union-find over (id_a, id_b) pair rows, keeping the
    MIN id per connected component (deterministic survivor rule)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in pair_rows:
        a, b = find(int(r["id_a"])), find(int(r["id_b"]))
        if a != b:
            if a > b:
                a, b = b, a
            parent[b] = a
    comps: dict = {}
    for x in list(parent) + [
        int(r[c]) for r in pair_rows for c in ("id_a", "id_b")
    ]:
        comps.setdefault(find(x), set()).add(x)
    dropped = set()
    for root, members in comps.items():
        keep = min(members)
        dropped |= {m for m in members if m != keep}
    return dropped


#: Above this candidate-pair count, :func:`near_dedup_survivors` switches
#: from driver union-find to :func:`distributed_dropped_ids` (iterative
#: min-label propagation) so the pair set never materializes on the
#: driver (VERDICT r4 item 2: a 100 TB corpus at 30-50 % dup rate puts
#: O(dup-pairs) objects on the driver otherwise).
DRIVER_CC_MAX_PAIRS = 200_000


_I64_MAX = np.iinfo(np.int64).max


def _fold_sorted_labels(t: pa.Table) -> pa.Table:
    """Per-block min-fold of a node-SORTED (node, label, is_self) message
    table: one row per node segment with the new label (min over all
    messages), the old label (min over self rows), and a ``suspect`` flag
    on the block's first/last segments — the only segments a block
    boundary can split (fixed up exactly by the tiny cross-block
    correction pass in :func:`distributed_dropped_ids`)."""
    if t.num_rows == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
                "old": pa.array([], pa.int64()),
                "suspect": pa.array([], pa.bool_()),
            }
        )
    nodes = t["node"].to_numpy()
    labs = t["label"].to_numpy()
    selfs = t["is_self"].to_numpy().astype(bool)
    b = np.empty(nodes.size, dtype=bool)
    b[0] = True
    np.not_equal(nodes[1:], nodes[:-1], out=b[1:])
    st = np.flatnonzero(b)
    new = np.minimum.reduceat(labs, st)
    old = np.minimum.reduceat(np.where(selfs, labs, _I64_MAX), st)
    suspect = np.zeros(st.size, dtype=bool)
    suspect[0] = True
    suspect[-1] = True
    return pa.table(
        {
            "node": nodes[st],
            "label": new,
            "old": old,
            "suspect": suspect,
        }
    )


def distributed_dropped_ids(pairs, max_rounds: int = 100):
    """Distributed connected components over a near-dup pair Dataset:
    iterative min-label propagation, entirely in Ray Data — the pair set
    NEVER materializes on the driver.

    Per round: an ATTACH pass copies each node's current label onto its
    outgoing (symmetric) edges, producing a (neighbour, label) message
    per edge, and a FOLD pass takes the min incoming label per node.
    Both are ``sort("node")`` + a vectorized per-block segment pass
    (``np.minimum.reduceat`` / ``np.repeat``) — ~20x faster than
    ``groupby().aggregate(Min)`` at the same row count, and no
    ``Dataset.join`` (Ray 2.49's hash join mis-handles empty
    partitions).  A block boundary can split at most one node segment
    per block edge, so each pass flags its first/last segments and a
    driver-side correction folds just those O(blocks) rows — never
    O(pairs) driver state.

    Labels are monotone non-increasing, so ``changed = new < old`` summed
    per round detects the fixpoint with a scalar aggregate.  Convergence
    is O(component diameter) rounds; LSH dup components are near-cliques
    / hub stars (``clique_cap`` emits hub pairs), so the diameter is
    small in practice — ``max_rounds`` is a guard, not a budget.

    Returns a Dataset with one column ``doc_id``: the ids to DROP (every
    component member except the component-min id — the same survivor
    rule as :func:`component_dropped_ids`).
    """
    import ray.data as rd

    def to_edges(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table(
            {
                "node": pa.chunked_array([a, b]).combine_chunks(),
                "nbr": pa.chunked_array([b, a]).combine_chunks(),
            }
        )

    edges = (
        pairs.select_columns(["id_a", "id_b"])
        .map_batches(to_edges, batch_format="pyarrow")
        .materialize()
    )

    def _self_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "label": t["label"],
                "is_self": pa.array(
                    np.ones(t.num_rows, dtype=bool)
                ),
            }
        )

    def _fold(msg_ds):
        """Exact distributed min-fold -> materialized (node, label,
        changed) labels dataset; only O(blocks) suspect rows touch the
        driver."""
        import ray

        folded = (
            msg_ds.sort("node")
            .map_batches(_fold_sorted_labels, batch_format="pyarrow")
            .materialize()
        )
        clean = folded.map_batches(
            lambda t: t.filter(pc.invert(t["suspect"])),
            batch_format="pyarrow",
        )
        # suspects: <= 2 segments per block — the reference-precedent
        # scale of driver-collected state (tiny, like the parent-id set)
        sus = pa.concat_tables(
            [t for t in ray.get(
                folded.map_batches(
                    lambda t: t.filter(t["suspect"]),
                    batch_format="pyarrow",
                ).to_arrow_refs()
            ) if t.num_rows]
            or [_fold_sorted_labels(pa.table(
                {"node": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64()),
                 "is_self": pa.array([], pa.bool_())}))]
        )
        out_parts = [clean]
        if sus.num_rows:
            n = sus["node"].to_numpy()
            l = sus["label"].to_numpy()
            o = sus["old"].to_numpy()
            order = np.argsort(n, kind="stable")
            n, l, o = n[order], l[order], o[order]
            bb = np.empty(n.size, dtype=bool)
            bb[0] = True
            np.not_equal(n[1:], n[:-1], out=bb[1:])
            st = np.flatnonzero(bb)
            fixed = pa.table(
                {
                    "node": n[st],
                    "label": np.minimum.reduceat(l, st),
                    "old": np.minimum.reduceat(o, st),
                    "suspect": np.zeros(st.size, dtype=bool),
                }
            )
            out_parts.append(rd.from_arrow(fixed))
        labels = out_parts[0] if len(out_parts) == 1 else \
            out_parts[0].union(*out_parts[1:])
        return labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": t["label"],
                    "changed": pc.cast(
                        pc.less(t["label"], t["old"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    # round 0: label(v) = min(v, neighbours of v)
    labels = _fold(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": t["nbr"],
                    "is_self": pa.array(
                        np.zeros(t.num_rows, dtype=bool)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).union(
            edges.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "label": t["node"],
                        "is_self": pa.array(
                            np.ones(t.num_rows, dtype=bool)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    )

    def _attach(lab_cols):
        """Label-attach WITHOUT Dataset.join (Ray 2.49's hash join
        mis-handles empty partitions): union label rows with edge rows,
        sort by node, then one vectorized pass per block repeats each
        node's label onto its edge rows — block-boundary segments are
        resolved by a tiny O(blocks) driver correction collected in a
        first pass (the label row of a boundary node may sit in the
        adjacent block).

        POINTER JUMPING: alongside the graph edges, each (node, label)
        pair also rides as a label-edge (label -> node), so every node
        receives label(label(node)) each round — min-label propagation
        converges in O(log diameter) rounds instead of O(diameter)."""
        import ray

        label_edges = lab_cols.map_batches(
            lambda t: pa.table({"node": t["label"], "nbr": t["node"]}),
            batch_format="pyarrow",
        )
        edge_rows = edges.union(label_edges).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "nbr": t["nbr"],
                    "label": pa.nulls(t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        lab_rows = lab_cols.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "nbr": pa.nulls(t.num_rows, pa.int64()),
                    "label": t["label"],
                }
            ),
            batch_format="pyarrow",
        )
        mixed = edge_rows.union(lab_rows).sort("node").materialize()

        def boundary_candidates(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())}
                )
            nodes = t["node"].to_numpy()
            lab = pc.fill_null(t["label"], _I64_MAX).combine_chunks() \
                .to_numpy()
            b = np.empty(nodes.size, dtype=bool)
            b[0] = True
            np.not_equal(nodes[1:], nodes[:-1], out=b[1:])
            st = np.flatnonzero(b)
            mins = np.minimum.reduceat(lab, st)
            sel = np.unique([0, st.size - 1])
            return pa.table(
                {"node": nodes[st[sel]], "label": mins[sel]}
            )

        bnd = pa.concat_tables(
            [tb for tb in ray.get(
                mixed.map_batches(
                    boundary_candidates, batch_format="pyarrow"
                ).to_arrow_refs()
            ) if tb.num_rows]
            or [pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})]
        )
        if bnd.num_rows:
            bn = bnd["node"].to_numpy()
            bl = bnd["label"].to_numpy()
            order = np.argsort(bn, kind="stable")
            bn, bl = bn[order], bl[order]
            bb = np.empty(bn.size, dtype=bool)
            bb[0] = True
            np.not_equal(bn[1:], bn[:-1], out=bb[1:])
            bst = np.flatnonzero(bb)
            corr_nodes = bn[bst]
            corr_labels = np.minimum.reduceat(bl, bst)
        else:
            corr_nodes = np.empty(0, np.int64)
            corr_labels = np.empty(0, np.int64)
        corr_ref = ray.put((corr_nodes, corr_labels))

        def emit(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64()),
                     "is_self": pa.array([], pa.bool_())}
                )
            cn, cl = ray.get(corr_ref)
            nodes = t["node"].to_numpy()
            lab = pc.fill_null(t["label"], _I64_MAX).combine_chunks() \
                .to_numpy()
            nbr_valid = pc.is_valid(t["nbr"]).to_numpy(
                zero_copy_only=False
            )
            nbr = pc.fill_null(t["nbr"], -1).combine_chunks().to_numpy()
            b = np.empty(nodes.size, dtype=bool)
            b[0] = True
            np.not_equal(nodes[1:], nodes[:-1], out=b[1:])
            st = np.flatnonzero(b)
            seg_lab = np.minimum.reduceat(lab, st)
            # first/last segments: label row may live in the next block
            for si in {0, st.size - 1}:
                j = np.searchsorted(cn, nodes[st[si]])
                if j < cn.size and cn[j] == nodes[st[si]]:
                    seg_lab[si] = min(seg_lab[si], cl[j])
            seg_len = np.diff(np.append(st, nodes.size))
            row_lab = np.repeat(seg_lab, seg_len)
            m = nbr_valid
            return pa.table(
                {
                    "node": nbr[m],
                    "label": row_lab[m],
                    "is_self": np.zeros(int(m.sum()), dtype=bool),
                }
            )

        return mixed.map_batches(emit, batch_format="pyarrow")

    for rnd in range(max_rounds):
        n_changed = labels.sum("changed")
        _LOG.debug("distributed_cc round %d: %s labels changed",
                   rnd, n_changed)
        if not n_changed:
            break
        lab_cols = labels.select_columns(["node", "label"])
        msgs = _attach(lab_cols)
        labels = _fold(msgs.union(lab_cols.map_batches(
            _self_rows, batch_format="pyarrow"
        )))

    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(
                pc.not_equal(t["node"], t["label"])
            )["node"]}
        ),
        batch_format="pyarrow",
    )


def near_dedup_survivors(ds, pairs, id_col: str = "doc_id",
                         max_driver_pairs: int = DRIVER_CC_MAX_PAIRS):
    """Collapse near-duplicate groups to ONE survivor each: connected
    components over the near-dup pair graph (any pair generator above),
    keep the MIN id per component, drop the rest.

    Scale shape: below ``max_driver_pairs`` candidate pairs, union-find
    runs on the driver (fast path — two int64 columns, no dict rows);
    above it, :func:`distributed_dropped_ids` runs min-label propagation
    in Ray Data so the pair set never touches the driver.  Either way
    the dropped-id set broadcasts once (``ray.put``, sorted) and each
    corpus batch filters with ``searchsorted`` — no corpus shuffle, the
    corpus streams.
    """
    import ray

    if hasattr(pairs, "count"):
        n_pairs = pairs.count()
        if n_pairs > max_driver_pairs:
            dropped_ds = distributed_dropped_ids(pairs)
            dead = np.sort(
                np.concatenate(
                    [t["doc_id"].combine_chunks().to_numpy()
                     for t in ray.get(dropped_ds.to_arrow_refs())
                     if t.num_rows]
                    or [np.empty(0, np.int64)]
                ).astype(np.int64)
            )
        else:
            rows = pairs.take_all()
            dead = np.array(
                sorted(component_dropped_ids(rows)), dtype=np.int64
            )
    else:
        dead = np.array(
            sorted(component_dropped_ids(pairs.to_pylist())),
            dtype=np.int64,
        )
    ref = ray.put(dead)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch[id_col].to_numpy()
        if d.size:
            pos = np.searchsorted(d, ids)
            pos[pos == d.size] = 0
            dead_mask = d[pos] == ids
        else:
            dead_mask = np.zeros(ids.size, dtype=bool)
        return batch.filter(pa.array(~dead_mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def dedup_corpus(
    input_path,
    output_dir: str,
    mode: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
):
    """End-to-end corpus dedup pipeline: read parquet -> pair generation
    (``mode``: exact | jaccard | minhash | simhash) -> survivor selection
    -> STREAMING partitioned parquet write (one file per output block, so
    a failed run resumes by re-running — never one giant file).

    The corpus streams through ``map_batches`` filters end-to-end; only
    the pair set / survivor-id set (small by construction) touches the
    driver.  Returns {"kept": n, "dropped": n, "dest": path}.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(input_path)
    n_total = ds.count()
    if mode == "exact":
        # broadcast the DROPPED side: bounded by the duplicate count,
        # not the corpus (the keep set is O(corpus) — never ship that)
        dropped_rows = exact_dup_dropped_ids(
            ds, text_col=text_col, id_col=id_col
        )
        dead = np.array(
            sorted(r[id_col] for r in dropped_rows.take_all()),
            dtype=np.int64,
        )
        ref = ray.put(dead)

        def keep(batch: pa.Table) -> pa.Table:
            d = ray.get(ref)
            ids = batch[id_col].to_numpy()
            if d.size:
                pos = np.searchsorted(d, ids)
                pos[pos == d.size] = 0
                mask = d[pos] == ids
            else:
                mask = np.zeros(ids.size, dtype=bool)
            return batch.filter(pa.array(~mask))

        out = ds.map_batches(keep, batch_format="pyarrow")
    else:
        gen = {
            "jaccard": ngram_jaccard_pairs,
            "minhash": minhash_lsh_pairs,
            "simhash": simhash_pairs,
        }.get(mode)
        if gen is None:
            raise ValueError(
                f"unknown dedup mode {mode!r} "
                "(valid: exact, jaccard, minhash, simhash)"
            )
        pairs = gen(ds, text_col=text_col, id_col=id_col, **kwargs)
        out = near_dedup_survivors(ds, pairs, id_col=id_col)
    out.write_parquet(output_dir)
    kept = rd.read_parquet(output_dir).count()
    return {
        "kept": int(kept),
        "dropped": int(n_total - kept),
        "dest": os.fspath(output_dir),
        "mode": mode,
    }
