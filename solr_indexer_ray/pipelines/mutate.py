"""Index mutations: deletes, atomic partial updates, upsert semantics.

Reference analogues:

- delete by id / by query: ``/root/reference/solrindexer/mmd.py:1507-1522``,
  ``solrindexer/search.py:306-328`` — Solr deletes matching docs.  A batch
  engine can't cheaply rewrite immutable postings, so deletes are
  **tombstones**: a small ``tombstones.parquet`` table of doc ids that every
  read path (search, get, count) anti-joins against.  Compaction =
  rebuilding the affected partitions (documented scale path).
- atomic partial update (``set_parent_flag`` ``solrindexer/tools.py:93-103``):
  an **overlay** table ``overlays.parquet`` of (doc_id, column, value)
  merged over stored fields at read time — read-modify-write of a column
  without touching the base parquet.
- parent/child integrity pass (``solrindexer/cli.py:360-394``,
  ``solrindexer/tools.py:106-136`` resolve_parent_ids): collect the distinct
  referenced parent ids (small), semi-join them against the docs table
  (broadcast — the set is tiny relative to the corpus), flag found parents,
  report missing ones as unresolved warnings.
- upsert-by-key (Solr uniqueKey semantics — re-indexing a file replaces the
  doc): last-write-wins dedup by ``(repo, path)``; shadowed older rows are
  tombstoned.  "Latest" = highest doc_id, i.e. latest position in the
  deterministic input order.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from solr_indexer_ray.pipelines.search import SearchEngine

TOMBSTONES = "tombstones.parquet"
OVERLAYS = "overlays.parquet"


def _read_tombstones(index_dir: str) -> set:
    path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.exists(path):
        return set()
    return set(pq.read_table(path, columns=["doc_id"])["doc_id"].to_pylist())


def _write_tombstones(index_dir: str, ids: set) -> None:
    path = os.path.join(index_dir, TOMBSTONES)
    table = pa.table({"doc_id": pa.array(sorted(ids), pa.int64())})
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def delete_by_id(index_dir: str, doc_ids) -> dict:
    """Tombstone docs by id; reports which ids did not exist.

    Reference: existence check before delete (``solrindexer/mmd.py:1459-1468``).
    """
    engine = SearchEngine(index_dir)
    requested = set(int(d) for d in doc_ids)
    present = engine.present
    existing = {d for d in requested if 0 <= d < engine.doc_space and present[d]}
    missing = sorted(requested - existing)
    tombs = _read_tombstones(index_dir)
    already = sorted(existing & tombs)
    tombs |= existing
    _write_tombstones(index_dir, tombs)
    return {
        "deleted": sorted(existing),
        "missing": missing,
        "already_deleted": already,
    }


def match_ids(engine: SearchEngine, query: str) -> np.ndarray:
    """ALL doc ids matching a query (no top-k) — used by delete-by-query."""
    from solr_indexer_ray.functions.queryparse import parse_query

    parsed = parse_query(query, engine.registry.analyzer_for(None))
    excluded = engine._excluded_mask(parsed)
    if not parsed.terms:
        hits = engine._match_all(parsed, excluded, k=engine.doc_space)
        return np.array([d for d, _ in hits], dtype=np.int64)
    postings = engine.lookup_postings(parsed.terms)
    seen = np.zeros(engine.doc_space, dtype=np.int32)
    for tp in postings.values():
        seen[tp.doc_ids] += 1
    required = len(postings) if parsed.conjunctive else 1
    cand = np.flatnonzero(seen >= required) if postings else np.array([], np.int64)
    if excluded is not None and cand.size:
        cand = cand[~excluded[cand]]
    return cand.astype(np.int64)


def delete_by_query(index_dir: str, query: str) -> dict:
    """Search-then-delete (reference: ``solrindexer/search.py:306-328``)."""
    engine = SearchEngine(index_dir)
    ids = match_ids(engine, query)
    tombs = _read_tombstones(index_dir)
    tombs |= set(int(i) for i in ids)
    _write_tombstones(index_dir, tombs)
    return {"query": query, "deleted": int(ids.size)}


# --------------------------------------------------------------------- #
# overlays (atomic partial update)
# --------------------------------------------------------------------- #
def apply_overlay(index_dir: str, updates) -> None:
    """Append (doc_id, column, value) overlay rows; values JSON-encoded.

    Reference analogue: Solr atomic update ``{"field": {"set": v}}``
    (``solrindexer/tools.py:93-103``).
    """
    path = os.path.join(index_dir, OVERLAYS)
    rows = [
        {
            "doc_id": int(u["doc_id"]),
            "column": str(u["column"]),
            "value": json.dumps(u["value"]),
        }
        for u in updates
    ]
    new = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("column", pa.string()), ("value", pa.string())]
        ),
    )
    if os.path.exists(path):
        new = pa.concat_tables([pq.read_table(path), new])
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(new, tmp)
    os.replace(tmp, path)


def mark_parents(index_dir: str, parent_keys) -> dict:
    """Parent/child integrity pass (reference J2/J3).

    ``parent_keys``: iterable of (repo, path) keys referenced by children
    (the reference collects referenced parent ids during the run and
    resolves them afterwards, ``solrindexer/cli.py:360-394``).  The distinct
    key set is small -> broadcast semi-join against the docs table; found
    parents get an ``isParent=true`` overlay (skipped if already flagged),
    missing ones are returned as unresolved warnings
    (``solrindexer/mmd.py:1544-1555`` warn contract).
    """
    keys = sorted(set((r, p) for r, p in parent_keys))
    docs = pads.dataset(os.path.join(index_dir, "docs"))
    expr = None
    for r, p in keys:
        e = (pc.field("repo") == r) & (pc.field("path") == p)
        expr = e if expr is None else expr | e
    found_tbl = (
        docs.to_table(columns=["doc_id", "repo", "path"], filter=expr)
        if expr is not None
        else pa.table({"doc_id": [], "repo": [], "path": []})
    )
    found_keys = set(
        zip(found_tbl["repo"].to_pylist(), found_tbl["path"].to_pylist())
    )
    missing = [k for k in keys if k not in found_keys]

    engine = SearchEngine(index_dir)
    overlays = engine._load_overlays()
    updates = []
    already = 0
    for did in set(found_tbl["doc_id"].to_pylist()):
        if overlays.get(did, {}).get("isParent") is True:
            already += 1
            continue
        updates.append({"doc_id": did, "column": "isParent", "value": True})
    if updates:
        apply_overlay(index_dir, updates)
    return {
        "flagged": len(updates),
        "already_flagged": already,
        "unresolved": missing,
    }


# --------------------------------------------------------------------- #
# upsert semantics
# --------------------------------------------------------------------- #
def apply_upsert_semantics(index_dir: str, key_cols=("repo", "path")) -> dict:
    """Last-write-wins dedup by key: tombstone all but the max-doc_id row
    per key (Solr uniqueKey upsert semantics, SURVEY.md §2.8).

    Runs as a Ray Data grouped aggregate over the docs table — the same
    hash-shuffle machinery an engine-level dedup uses at scale.
    """
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(index_dir, "docs"), columns=[*key_cols, "doc_id"]
    )

    def shadowed(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        keep = ids.max()
        dead = ids[ids != keep]
        return pa.table({"doc_id": pa.array(np.sort(dead), pa.int64())})

    dead = docs.groupby(list(key_cols)).map_groups(
        shadowed, batch_format="pyarrow"
    )
    dead_ids = set(
        int(i) for b in dead.iter_batches(batch_format="pyarrow")
        for i in b["doc_id"].to_pylist()
    )
    tombs = _read_tombstones(index_dir)
    _write_tombstones(index_dir, tombs | dead_ids)
    return {"shadowed": len(dead_ids)}
