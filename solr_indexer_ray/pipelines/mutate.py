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
    """ALL doc ids matching a query (no top-k) — used by delete-by-query.
    Full clause semantics (terms/phrases/prefixes/filters) live on the
    engine; kept as a module function for back-compat."""
    return engine.match_ids(query)


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


#: Solr atomic-update verbs (Updating Parts of Documents).  The reference
#: only ever uses ``set`` (``solrindexer/tools.py:93-103`` set_parent_flag);
#: the rest complete the Solr surface a reference user has available.
ATOMIC_VERBS = ("set", "add", "add-distinct", "remove", "removeregex", "inc")


def _as_list(v):
    if v is None:
        return []
    return list(v) if isinstance(v, (list, tuple)) else [v]


def _apply_verb(verb: str, base, operand):
    """One Solr atomic-update verb against the current effective value.

    Semantics follow Solr's "Updating Parts of Documents":
    - ``set``: replace (``null`` removes the field);
    - ``add`` / ``add-distinct``: append to a multivalued field (a scalar
      base is promoted to a one-element list first);
    - ``remove``: drop every occurrence of the operand value(s); an
      emptied field is removed (``None``);
    - ``removeregex``: drop values fully matching any of the operand
      regexes;
    - ``inc``: numeric increment (an absent field counts as 0).
    """
    import re as _re

    if verb == "set":
        return operand
    if verb == "inc":
        cur = 0 if base is None else base
        if not isinstance(cur, (int, float)) or isinstance(cur, bool):
            raise TypeError(f"inc on non-numeric value {cur!r}")
        new = cur + operand
        # int+int stays int (Solr pint/plong semantics)
        return int(new) if isinstance(cur, int) and isinstance(operand, int) else new
    values = _as_list(base)
    if verb == "add":
        return values + _as_list(operand)
    if verb == "add-distinct":
        out = list(values)
        for v in _as_list(operand):
            if v not in out:
                out.append(v)
        return out
    if verb == "remove":
        drop = set(map(str, _as_list(operand)))
        out = [v for v in values if str(v) not in drop]
        return out if out else None
    if verb == "removeregex":
        pats = [_re.compile(p) for p in _as_list(operand)]
        out = [v for v in values if not any(p.fullmatch(str(v)) for p in pats)]
        return out if out else None
    raise ValueError(f"unknown atomic-update verb {verb!r} "
                     f"(supported: {ATOMIC_VERBS})")


def atomic_update(index_dir: str, updates) -> dict:
    """Solr atomic partial updates with the full verb set.

    ``updates``: Solr JSON-update shape — each item is
    ``{"doc_id": id, "<field>": {"<verb>": operand}, ...}`` (verbs in
    :data:`ATOMIC_VERBS`; several fields per item, several verbs per
    field applied in given order).  Like Solr, the update is
    read-apply-reindex: the current effective value (stored field merged
    with prior overlays) is read, the verb applied, and the result
    written as a ``set`` overlay.  Docs that don't exist (or are
    tombstoned) are reported in ``missing`` and skipped — the
    reference's warn-don't-create contract for absent update targets
    (``solrindexer/mmd.py:1544-1555``).
    """
    engine = SearchEngine(index_dir)
    parsed = []
    for u in updates:
        u = dict(u)
        did = int(u.pop("doc_id"))
        fields = {}
        for fld, verbs in u.items():
            if not isinstance(verbs, dict):
                verbs = {"set": verbs}  # bare value = set (convenience)
            for verb in verbs:
                if verb not in ATOMIC_VERBS:
                    raise ValueError(
                        f"unknown atomic-update verb {verb!r} for field "
                        f"{fld!r} (supported: {ATOMIC_VERBS})")
            fields[fld] = verbs
        parsed.append((did, fields))

    present = engine.present
    tombs = engine.tombstones
    requested = sorted({d for d, _ in parsed})
    existing = {d for d in requested
                if 0 <= d < engine.doc_space and present[d] and d not in tombs}
    missing = sorted(set(requested) - existing)

    # one batched stored-field read for every (existing doc, stored field)
    stored_needed = sorted(
        {f for did, fields in parsed if did in existing for f in fields}
        & set(engine.stored_fields)
    )
    base_rows: dict = {d: {} for d in existing}
    if stored_needed and existing:
        t = engine._docs_ds.to_table(
            columns=["doc_id", *stored_needed],
            filter=pc.field("doc_id").isin(sorted(existing)),
        )
        for row in t.to_pylist():
            base_rows[row["doc_id"]] = row
    overlays = engine._load_overlays()

    new_overlays = []
    updated = []
    for did, fields in parsed:
        if did not in existing:
            continue
        doc_over = overlays.get(did, {})
        for fld, verbs in fields.items():
            if fld in doc_over:          # prior overlay wins over stored
                cur = doc_over[fld]
            else:
                cur = base_rows.get(did, {}).get(fld)
            for verb, operand in verbs.items():
                cur = _apply_verb(verb, cur, operand)
            doc_over = {**doc_over, fld: cur}
            new_overlays.append({"doc_id": did, "column": fld, "value": cur})
        overlays[did] = doc_over         # later updates in this call compose
        updated.append(did)
    if new_overlays:
        apply_overlay(index_dir, new_overlays)
    return {"updated": sorted(set(updated)), "missing": missing}


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
# compaction
# --------------------------------------------------------------------- #
def _purge_spill_file(path: str, dead_ids) -> bool:
    """Drop tombstoned doc ids from one raw-postings spill file.

    Returns True if the file changed.  Fully columnar (the stage-2
    fast-path idiom): flatten the posting lists once, mask dead postings
    with a dense doc-id lookup, re-segment with a cumsum of the keep mask,
    and rebuild the list columns zero-copy with ``ListArray.from_arrays``.
    Terms whose postings become empty are dropped entirely; the original
    (term, range_id) file order is preserved by construction.
    """
    tbl = pq.read_table(path)
    if tbl.num_rows == 0:
        return False
    with_pos = "positions" in tbl.column_names
    docs_col = tbl["doc_ids"].combine_chunks()
    flat_docs = docs_col.flatten().to_numpy(zero_copy_only=False)
    offsets = docs_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    dead = np.asarray(dead_ids, dtype=np.int64)
    hi = int(max(flat_docs.max(initial=0), dead.max(initial=0))) + 1
    dead_mask = np.zeros(hi, dtype=bool)
    dead_mask[dead] = True
    keep = ~dead_mask[flat_docs]
    if keep.all():
        return False
    # per-row surviving-posting counts via keep-cumsum (empty-safe where
    # reduceat is not), then the new list offsets
    csum = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
    new_len = csum[offsets[1:]] - csum[offsets[:-1]]
    row_keep = new_len > 0
    new_offsets = pa.array(
        np.concatenate(([0], np.cumsum(new_len[row_keep]))).astype(np.int32),
        pa.int32(),
    )
    kmask = pa.array(keep)
    cols = {
        "term": tbl["term"].filter(pa.array(row_keep)),
        "range_id": tbl["range_id"].filter(pa.array(row_keep)),
        "doc_ids": pa.ListArray.from_arrays(
            new_offsets, pa.array(flat_docs[keep], pa.int64())
        ),
        "tfs": pa.ListArray.from_arrays(
            new_offsets,
            pa.array(
                tbl["tfs"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)[keep],
                pa.int32(),
            ),
        ),
        "norms": pa.ListArray.from_arrays(
            new_offsets,
            pa.array(
                tbl["norms"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)[keep],
                pa.int32(),
            ),
        ),
    }
    if with_pos:
        # positions: one delta-varint blob per row, segments restart per
        # posting — dropping a dead posting's byte segment keeps the
        # format valid with NO re-encode.  Per-posting byte extents come
        # from one continuation-bit scan over the file's concatenated
        # blobs (every row blob ends on a terminal byte, so the global
        # value counter aligns with the per-posting value boundaries).
        pos_col = tbl["positions"].combine_chunks()
        if pos_col.offset != 0:  # defensive: re-materialize at offset 0
            pos_col = pos_col.take(
                pa.array(np.arange(len(pos_col), dtype=np.int64))
            )
        bufs = pos_col.buffers()
        row_boff = np.frombuffer(
            bufs[1], dtype=np.int32, count=len(pos_col) + 1
        ).astype(np.int64)
        base = int(row_boff[0])
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)[base:int(row_boff[-1])]
            if bufs[2] is not None else np.empty(0, np.uint8)
        )
        flat_tfs = (
            tbl["tfs"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        voff = np.concatenate(([0], np.cumsum(flat_tfs)))
        term_count = np.cumsum(data < 0x80, dtype=np.int64)
        pends = np.zeros(voff.size, dtype=np.int64)
        if data.size:
            pends[1:] = np.searchsorted(term_count, voff[1:], "left") + 1
        seg_starts, seg_stops = pends[:-1][keep], pends[1:][keep]
        seg_lens = seg_stops - seg_starts
        total = int(seg_lens.sum())
        gidx = (
            np.repeat(seg_starts, seg_lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(
                np.concatenate(([0], np.cumsum(seg_lens)[:-1])), seg_lens
            )
        )
        new_data = data[gidx]
        # new per-row byte lengths: sum of kept postings' segment bytes
        seg_all = (pends[1:] - pends[:-1]) * keep
        scs = np.concatenate(([0], np.cumsum(seg_all, dtype=np.int64)))
        new_row_len = scs[offsets[1:]] - scs[offsets[:-1]]
        nboffs = np.concatenate(
            ([0], np.cumsum(new_row_len[row_keep]))
        ).astype(np.int32)
        cols["positions"] = pa.Array.from_buffers(
            pa.binary(), int(row_keep.sum()),
            [None, pa.py_buffer(nboffs.tobytes()),
             pa.py_buffer(new_data.tobytes())],
        )
    out = pa.table(cols, schema=tbl.schema)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return True


def compact_index(index_dir: str) -> dict:
    """Physically remove tombstoned docs (reference analogue: Solr deletes
    become physical at segment merge).  Rewrites affected docs parts and
    raw-postings spills (so later incremental extensions cannot resurrect
    deleted docs), re-runs the per-shard merge, recomputes stats, clears
    tombstones and dead overlays.  Doc ids keep their slots (gaps are fine
    — the engine addresses by ``doc_id_space``); work is proportional to
    the index, which is what compaction means.
    """
    import ray.data as rd

    from solr_indexer_ray.pipelines.build import _run_stage2
    from solr_indexer_ray.state.manifest import BuildManifest

    manifest = BuildManifest(index_dir)
    manifest.acquire_lock()  # single writer (same lock as build/extend)
    try:
        return _compact_locked(index_dir, manifest)
    finally:
        manifest.release_lock()


def _compact_locked(index_dir: str, manifest) -> dict:
    import ray.data as rd

    from solr_indexer_ray.pipelines.build import _run_stage2

    stats = manifest.read_stats()
    tombs = _read_tombstones(index_dir)
    if not tombs:
        return {"removed": 0, "stats": stats}
    _require_spills(index_dir, stats, "compact")
    dead = np.fromiter(tombs, dtype=np.int64)

    # 1. rewrite docs parts dropping dead rows (parallel over part files)
    docs_dir = os.path.join(index_dir, "docs")
    doc_files = sorted(
        os.path.join(docs_dir, f)
        for f in os.listdir(docs_dir)
        if f.endswith(".parquet")
    )

    def purge_docs(batch: dict) -> pa.Table:
        fsums: dict = {}
        removed = 0
        kept_docs = 0
        kept_dl = 0
        for path in batch["path"]:
            t = pq.read_table(str(path))
            keep = ~np.isin(t["doc_id"].to_numpy(), dead)
            if not keep.all():
                t = t.filter(pa.array(keep))
                tmp = f"{path}.tmp.{os.getpid()}"
                pq.write_table(t, tmp)
                os.replace(tmp, str(path))
                removed += int((~keep).sum())
            kept_docs += t.num_rows
            kept_dl += int(pc.sum(t["doclen"]).as_py() or 0)
            for f in afields:  # per-analyzed-field stats follow the purge
                col = t[f"doclen_{f}"]
                acc = fsums.setdefault(f, [0, 0])
                acc[0] += int(pc.sum(col).as_py() or 0)
                acc[1] += int(
                    pc.sum(pc.greater(col, 0).cast(pa.int64())).as_py() or 0
                )
        import json as _json

        return pa.table(
            {
                "removed": pa.array([removed], pa.int64()),
                "kept_docs": pa.array([kept_docs], pa.int64()),
                "kept_dl": pa.array([kept_dl], pa.int64()),
                "field_sums_json": pa.array(
                    [_json.dumps(fsums)], pa.string()
                ),
            }
        )

    afields = [
        s.split(":", 1)[0] for s in stats.get("analyzed_fields") or []
    ]
    res = (
        rd.from_items([{"path": p} for p in doc_files])
        .map_batches(purge_docs, batch_size=1, batch_format="numpy", num_cpus=1)
        .take_all()
    )
    removed = sum(r["removed"] for r in res)
    n_docs = sum(r["kept_docs"] for r in res)
    sum_dl = sum(r["kept_dl"] for r in res)
    field_stats: dict = {}
    for r in res:
        for f, (sdl, nd) in json.loads(
            r.get("field_sums_json") or "{}"
        ).items():
            acc = field_stats.setdefault(f, {"sum_dl": 0, "n_docs": 0})
            acc["sum_dl"] += int(sdl)
            acc["n_docs"] += int(nd)
    for f, acc in field_stats.items():
        acc["avgdl"] = (
            acc["sum_dl"] / acc["n_docs"] if acc["n_docs"] else 0.0
        )

    # 2. rewrite raw-postings spills (parallel over shard dirs)
    raw_dir = os.path.join(index_dir, "postings_raw")
    shard_dirs = sorted(
        os.path.join(raw_dir, d)
        for d in os.listdir(raw_dir)
        if d.startswith("shard=")
    )

    def purge_shard(batch: dict) -> pa.Table:
        n = 0
        for d in batch["dir"]:
            for f in sorted(os.listdir(str(d))):
                if f.endswith(".parquet"):
                    n += _purge_spill_file(os.path.join(str(d), f), dead)
        return pa.table({"changed": pa.array([n], pa.int64())})

    (
        rd.from_items([{"dir": d} for d in shard_dirs])
        .map_batches(purge_shard, batch_size=1, batch_format="numpy", num_cpus=1)
        .take_all()
    )

    # 3. re-merge postings
    merged = _run_stage2(
        index_dir, int(stats["n_shards"]), int(stats["block_size"]),
        compression=str(stats.get("compression", "zstd")),
    )
    n_term_rows = sum(r["n_terms"] for r in merged)

    # 4. drop dead overlays, clear tombstones, commit new stats
    overlays_path = os.path.join(index_dir, OVERLAYS)
    if os.path.exists(overlays_path):
        t = pq.read_table(overlays_path)
        keep = ~np.isin(t["doc_id"].to_numpy(), dead)
        if not keep.all():
            tmp = f"{overlays_path}.tmp.{os.getpid()}"
            pq.write_table(t.filter(pa.array(keep)), tmp)
            os.replace(tmp, overlays_path)
    tomb_path = os.path.join(index_dir, TOMBSTONES)
    if os.path.exists(tomb_path):
        os.remove(tomb_path)

    new_stats = dict(
        stats,
        generation=int(stats.get("generation", 1)) + 1,
        n_docs=int(n_docs),
        sum_dl=int(sum_dl),
        avgdl=(float(sum_dl) / n_docs) if n_docs else 0.0,
        n_term_rows=int(n_term_rows),
        field_stats=field_stats or stats.get("field_stats", {}),
    )
    manifest.commit(new_stats)
    return {"removed": int(removed), "stats": manifest.read_stats()}


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
# --------------------------------------------------------------------- #
# backup / restore (Solr replication-handler backup analogue)
# --------------------------------------------------------------------- #
def backup_index(index_dir: str, dest: str, verify: bool = True) -> dict:
    """Consistent snapshot of a committed index (Solr: replication handler
    ``command=backup``).  Takes the build lock (no writer mutates files
    mid-copy), optionally fsck-verifies first, copies atomically into
    ``dest`` (tmp dir + rename), and stamps a backup manifest."""
    import shutil
    import time as _time

    from solr_indexer_ray.state.manifest import BuildManifest

    manifest = BuildManifest(index_dir)
    if not manifest.is_committed():
        raise FileNotFoundError(f"no committed index at {index_dir}")
    manifest.acquire_lock()
    try:
        if verify:
            from solr_indexer_ray.pipelines.fsck import check_index

            res = check_index(index_dir)
            if not res["ok"]:
                raise RuntimeError(
                    f"refusing to back up a corrupt index: {res['problems'][:3]}"
                )
        dest = os.fspath(dest)
        if os.path.exists(dest):
            raise FileExistsError(f"backup destination exists: {dest}")
        tmp = f"{dest}.tmp.{os.getpid()}"
        shutil.copytree(
            index_dir, tmp,
            ignore=shutil.ignore_patterns(".build_lock", "*.tmp.*"),
        )
        stats = manifest.read_stats()
        with open(os.path.join(tmp, "backup.json"), "w") as f:
            json.dump(
                {"source": os.path.abspath(index_dir),
                 "n_docs": stats["n_docs"],
                 "taken_at": _time.time()}, f,
            )
        os.replace(tmp, dest)
        return {"dest": dest, "n_docs": int(stats["n_docs"])}
    finally:
        manifest.release_lock()


def restore_index(backup_dir: str, index_dir: str,
                  overwrite: bool = False) -> dict:
    """Restore a backup into ``index_dir`` (Solr ``command=restore``)."""
    import shutil

    from solr_indexer_ray.state.manifest import BuildManifest

    if not os.path.exists(os.path.join(backup_dir, "stats.json")):
        raise FileNotFoundError(f"{backup_dir} is not an index backup")
    if os.path.exists(index_dir):
        if not overwrite:
            raise FileExistsError(f"{index_dir} exists (use overwrite)")
        shutil.rmtree(index_dir)
    tmp = f"{os.fspath(index_dir)}.tmp.{os.getpid()}"
    shutil.copytree(backup_dir, tmp)
    for junk in ("backup.json",):
        p = os.path.join(tmp, junk)
        if os.path.exists(p):
            os.unlink(p)
    os.replace(tmp, index_dir)
    stats = BuildManifest(index_dir).read_stats()
    return {"index": os.fspath(index_dir), "n_docs": int(stats["n_docs"])}


# --------------------------------------------------------------------- #
# spill GC
# --------------------------------------------------------------------- #
def drop_spills(index_dir: str) -> dict:
    """Reclaim the raw-postings spills of a committed index.

    The spills (``postings_raw/``) are the map-side shuffle artifacts the
    build keeps so ``extend_index`` can re-merge boundary ranges and
    ``compact_index`` can rebuild postings without re-tokenizing — at
    ~5x the merged-postings size (BASELINE.md storage table).  An index
    that has stopped growing can drop them: queries only read the merged
    ``postings/`` + ``docs/``, so search/facet/export/backup are
    unaffected.  After GC, extend and compact REFUSE with a clear error
    (re-index or restore a pre-GC backup to mutate again).  Recorded in
    stats as ``spills_dropped`` (generation bump = Solr commit).
    """
    import shutil

    from solr_indexer_ray.state.manifest import BuildManifest

    manifest = BuildManifest(index_dir)
    if not manifest.is_committed():
        raise FileNotFoundError(f"no committed index at {index_dir}")
    manifest.acquire_lock()
    try:
        raw_dir = os.path.join(index_dir, "postings_raw")
        freed = 0
        if os.path.isdir(raw_dir):
            for root, _dirs, files in os.walk(raw_dir):
                for f in files:
                    try:
                        freed += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            shutil.rmtree(raw_dir)
        stats = manifest.read_stats()
        stats["spills_dropped"] = True
        stats["generation"] = int(stats.get("generation", 1)) + 1
        manifest.commit(stats)
        return {"freed_bytes": int(freed), "index": os.fspath(index_dir)}
    finally:
        manifest.release_lock()


def _require_spills(index_dir: str, stats: dict, op: str) -> None:
    """Extend/compact need the raw spills; refuse cleanly after GC."""
    if stats.get("spills_dropped") or not os.path.isdir(
        os.path.join(index_dir, "postings_raw")
    ):
        raise RuntimeError(
            f"cannot {op} {index_dir}: raw postings spills were dropped "
            "(drop_spills / cli gc); re-index from source or restore a "
            "pre-GC backup to mutate this index"
        )
