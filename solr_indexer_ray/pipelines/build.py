"""Distributed inverted-index build — the flagship pipeline.

Reference analogue: ``indexdata`` bulk ingestion
(``/root/reference/solrindexer/cli.py`` + ``solrindexer/indexer.py:470-690``)
— but where the reference converts documents and POSTs them to Solr (which
owns the inverted index), this pipeline builds the index itself:

Stage 1 (``map_batches`` over read units, stateful actor pool):
    one task per parquet row group; reads the unit, computes per-row
    ``sha256(content)`` (the per-row integrity invariant; reference
    analogue: checksum field ``solrindexer/mmd.py:851-858``), tokenizes with
    the per-lang analyzer, writes the unit's slice of the ``docs`` table
    (stored fields + doclen + Lucene SmallFloat norm byte), and writes
    SPIMI-style *partial postings* grouped by ``(term, doc-range)`` —
    in-memory term->postings dict per unit, flushed sorted, exactly the
    SPIMI discipline (reference precedent: per-chunk buffered flush,
    ``solrindexer/indexer.py:517-551``).  Every output is written atomically
    (tmp+rename) and recorded in a per-unit manifest entry with lineage +
    metrics, so an interrupted build **resumes** by skipping complete units.

Stage 2 (shuffle):
    ``read_parquet(postings_raw) -> groupby(shard, range_id) ->
    map_groups(merge)``.  The merge concatenates each term's partial lists
    (disjoint, per-unit doc-id intervals -> sort-by-first + concat, no full
    re-sort), delta-varint-packs doc ids, varint-packs tfs, and attaches
    per-block block-max metadata ``(last_doc_id, max_tf, min_norm)`` for
    WAND pruning.  Grouping by ``(hash(term) % S, doc-range)`` rather than
    raw term (a) amortizes per-group overhead over many terms and (b) caps
    any group's memory at one doc-range — the salted-shuffle skew handling
    the north rule demands for stop-word-heavy terms.

Commit:
    corpus stats (N, avgdl as exact ``sum_dl / N`` — Lucene semantics:
    sumTotalTermFreq / docCount) + analyzer pin are published atomically via
    ``stats.json`` (reference analogue: explicit Solr hard commit,
    ``solrindexer/mmd.py:1303-1304``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from solr_indexer_ray.config import DEFAULT_CONFIG, IndexConfig
from solr_indexer_ray.functions.hashing import term_shard, term_shards_of_array
from solr_indexer_ray.functions.smallfloat import encode_lengths
from solr_indexer_ray.functions.tokenize import AnalyzerRegistry, tokenize_unit
from solr_indexer_ray.functions.varint import (
    decode_positions,
    encode_doc_ids,
    encode_positions,
    segmented_delta_encode,
    varint_byte_offsets,
    varint_encode,
)
from solr_indexer_ray.sources.parquet_units import list_units, read_unit
from solr_indexer_ray.state.manifest import BuildManifest

#: Positional builds pack (shard, tid, doc, pos) into one int64 and plain-
#: sort it when the key fits 63 bits (tests flip this off to A/B the
#: general stable-argsort path — outputs must be byte-identical).
_FUSE_POSITIONAL = True

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("sha256", pa.string()),
        ("doclen", pa.int32()),
        ("norm", pa.uint8()),
    ]
)

RAW_POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("range_id", pa.int64()),
        ("doc_ids", pa.list_(pa.int64())),
        ("tfs", pa.list_(pa.int32())),
        ("norms", pa.list_(pa.int32())),
    ]
)

#: with ``config.store_positions``: positions ride along PRE-ENCODED as
#: one delta-varint blob per (term, doc-range) row — segments restart per
#: posting (lengths == tfs), i.e. ALREADY the merged-postings position
#: format.  Stage 2 then merges a term's positions by concatenating its
#: parts' blobs (no decode, no re-encode), and the spill reads a binary
#: column instead of a nested list<list<int32>> (~4x smaller on disk
#: pre-compression, far cheaper to deserialize).
RAW_POSTINGS_POS_SCHEMA = RAW_POSTINGS_SCHEMA.append(
    pa.field("positions", pa.binary())
)

ERRORS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("stage", pa.string()),
        ("message", pa.string()),
    ]
)

MERGED_POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("range_id", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_ids", pa.binary()),
        ("tfs", pa.binary()),
        #: delta-varint token positions, one segment per posting; segment
        #: lengths are the tfs (tf == number of positions), so the stream
        #: needs no count prefix.  NULL when built without positions.
        ("positions", pa.binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_norm", pa.list_(pa.int32())),
    ]
)



def _filter_chain_stats(config: IndexConfig) -> dict:
    """stats.json entries pinning the token-filter chain (empty = none)."""
    from solr_indexer_ray.functions.filters import FilterChain

    return FilterChain(config.filters, config.stopwords).to_stats()


def _atomic_write_table(table: pa.Table, path: str, **kw) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


_EMPTY_SHA = hashlib.sha256(b"").hexdigest()


def _sha256_column(col) -> list:
    """Hex sha256 per row of a UTF-8 string column, hashed directly off
    the Arrow data buffer (offset slices of one memoryview) — skips the
    str-decode + re-encode round trip of the ``to_pylist`` path.  Null
    rows hash as empty string (reference ``(c or "")`` behavior)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        if ch.offset != 0 or not pa.types.is_string(ch.type):
            out.extend(
                hashlib.sha256((c or "").encode("utf-8")).hexdigest()
                for c in ch.to_pylist()
            )
            continue
        bufs = ch.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1)
        data = memoryview(bufs[2]) if bufs[2] is not None else \
            memoryview(b"")
        if ch.null_count:
            valid = ch.is_valid().to_numpy(zero_copy_only=False)
        else:
            valid = None
        for i in range(n):
            if valid is not None and not valid[i]:
                out.append(_EMPTY_SHA)
            else:
                out.append(
                    hashlib.sha256(
                        data[offsets[i]:offsets[i + 1]]
                    ).hexdigest()
                )
    return out


class UnitIndexer:
    """Stage-1 actor: tokenizer state built once per actor (SURVEY.md ST1/ST6).

    ``__call__`` consumes a batch of unit-descriptor rows (batch_size=1 ->
    one row group per task) and returns one manifest/metrics row per unit.
    """

    def __init__(self, index_dir: str, config: IndexConfig | None = None,
                 registry: AnalyzerRegistry | None = None,
                 doc_enricher=None):
        self.config = config or DEFAULT_CONFIG
        self.registry = registry or AnalyzerRegistry(self.config.default_analyzer)
        from solr_indexer_ray.functions.filters import FilterChain

        self.chain = FilterChain(self.config.filters, self.config.stopwords)
        self.manifest = BuildManifest(index_dir)
        self.index_dir = os.fspath(index_dir)
        #: optional stored-fields enrichment hook applied to each unit's
        #: docs table before write (reference: thumbnail-generator class
        #: injected into ``index_record``, ``solrindexer/mmd.py:1334-1390``
        #: ST4).  Must return a table with the same row count.
        self.doc_enricher = doc_enricher

    def __call__(self, batch: dict) -> pa.Table:
        rows_out = []
        n = len(batch["unit_id"])
        for i in range(n):
            unit = {k: batch[k][i] for k in batch}
            rows_out.append(self._process_unit(unit))
        return pa.Table.from_pylist(rows_out)

    # -- per-unit work -----------------------------------------------------
    def _process_unit(self, unit: dict) -> dict:
        uid = int(unit["unit_id"])
        t0 = time.perf_counter()
        if self.config.checkpoint and self.manifest.unit_complete(uid):
            entry = self.manifest.read_unit(uid)
            entry["skipped"] = True
            return _entry_to_row(entry)

        n_shards = int(unit["n_shards"])
        extra = list(self.config.extra_stored)
        afields = [
            tuple(s.split(":", 1)) for s in self.config.analyzed_fields
        ]
        asrcs = [s for _, s in afields]
        base_cols = ["repo", "path", "commit", "lang", "content", *extra]
        table = read_unit(
            unit,
            columns=base_cols
            + [s for s in asrcs if s not in base_cols],
        )
        langs = table["lang"].to_pylist()
        doc_ids = table["doc_id"].to_numpy()

        # per-row integrity invariant: sha256(content) — hashed straight
        # off the Arrow UTF-8 data buffer (offset slices of one
        # memoryview), skipping the str-decode + re-encode round trip the
        # to_pylist() path would pay on every byte of the corpus
        shas = _sha256_column(table["content"])
        n_rows = table.num_rows

        # tokenize the whole unit vectorized: Arrow RE2 kernels + one
        # dictionary_encode do split/lower/intern with zero per-token
        # Python (functions.tokenize.tokenize_unit; per-row analyzers
        # remain the reference implementation, equality property-tested)
        store_pos = self.config.store_positions
        tids_flat, doclens64, term_list = tokenize_unit(
            table["content"], langs, self.registry
        )
        if self.chain:
            from solr_indexer_ray.functions.filters import apply_chain_to_unit

            tids_flat, doclens64, term_list = apply_chain_to_unit(
                tids_flat, doclens64, term_list, self.chain
            )
        doclens = doclens64.astype(np.int32)

        norms = encode_lengths(doclens)

        # extra analyzed fields (Lucene per-field postings + norms; Solr
        # copyField into a second text field): each source column
        # tokenizes with the DEFAULT analyzer, its terms join the same
        # postings stream prefixed "<field>\\x1f", and the posting norms
        # carry the FIELD's SmallFloat length — per-field BM25 falls out
        # of the shared spill/merge machinery untouched.
        ndocs0 = n_rows
        field_doclens: dict = {}
        field_norms: dict = {}
        streams = [(tids_flat, doclens64)]
        term_list = list(term_list)
        fld_of_tid_blocks = [np.zeros(len(term_list), dtype=np.int32)]
        norm_rows = [norms]
        for fi, (fname, src) in enumerate(afields):
            f_tids, f_dl, f_terms = tokenize_unit(
                table[src], [None] * ndocs0, self.registry
            )
            if self.chain:
                from solr_indexer_ray.functions.filters import (
                    apply_chain_to_unit,
                )

                f_tids, f_dl, f_terms = apply_chain_to_unit(
                    f_tids, f_dl, f_terms, self.chain
                )
            field_doclens[fname] = f_dl.astype(np.int32)
            f_norm = encode_lengths(f_dl.astype(np.int32))
            field_norms[fname] = f_norm
            streams.append((f_tids + len(term_list), f_dl))
            term_list.extend(f"{fname}\x1f{t}" for t in f_terms)
            fld_of_tid_blocks.append(
                np.full(len(f_terms), fi + 1, dtype=np.int32)
            )
            norm_rows.append(f_norm)
        fld_of_tid = np.concatenate(fld_of_tid_blocks)
        norm_matrix = np.stack(norm_rows) if afields else None

        # inline validation (config.validate): invalid rows keep their
        # doc-id slot but are routed to the errors side-channel and
        # excluded from docs + postings (reference: warn-don't-block,
        # failures recorded never raised).
        valid = np.ones(n_rows, dtype=bool)
        error_rows: list = []
        if self.config.validate:
            from solr_indexer_ray.stages.validate import validate_row

            repos = table["repo"].to_pylist()
            paths = table["path"].to_pylist()
            commits = table["commit"].to_pylist()
            for i in range(n_rows):
                st, msg = validate_row(
                    repos[i], paths[i], commits[i], int(doclens[i])
                )
                if st is not None:
                    valid[i] = False
                    error_rows.append(
                        {
                            "doc_id": int(doc_ids[i]),
                            "repo": repos[i], "path": paths[i],
                            "commit": commits[i], "stage": st, "message": msg,
                        }
                    )

        # ---- vectorized SPIMI aggregation over the whole unit ------------
        # postings = runs of equal (tid, doc) in the stably-sorted token
        # stream; positions fall out of the same sort (stable -> ascending
        # token position within each run).  No per-posting Python.
        dpr = self.config.docs_per_range
        ndocs = n_rows
        tid_parts, idx_parts, pos_parts = [], [], []
        for s_tids, s_dl in streams:  # content first, then analyzed fields
            s_dl64 = s_dl.astype(np.int64)
            s_idx = np.repeat(np.arange(ndocs, dtype=np.int64), s_dl64)
            tid_parts.append(s_tids)
            idx_parts.append(s_idx)
            if store_pos:  # positions cost two O(tokens) arrays — skip
                s_off = np.concatenate(([0], np.cumsum(s_dl64)))
                s_pos = (
                    np.arange(s_tids.size, dtype=np.int64)
                    - np.repeat(s_off[:-1], s_dl64)
                )
                pos_parts.append(s_pos)
        #: the unit's term dictionary as ONE Arrow string array — term
        #: strings for spills / shard hashing flow through Arrow kernels
        #: (take, binary_join_element_wise) and buffer-slice crc32, never
        #: per-term Python objects (page-fault-heavy hosts punish the
        #: 10^4-10^5 tiny allocations a bigram vocabulary would cost).
        term_arr = pa.array(term_list, pa.string())
        if self.config.store_bigrams and tid_parts[0].size:
            # next-word index (IndexConfig.store_bigrams): a synthetic
            # ``a\x1eb`` term per adjacent CONTENT-stream pair within a
            # doc; its tf IS the exact 2-term phrase frequency and its
            # postings ride the same spill/merge machinery untouched.
            import pyarrow.compute as _pc

            c_tids, c_idx = tid_parts[0], idx_parts[0]
            nv = len(term_list)
            same = c_idx[:-1] == c_idx[1:]
            if self.config.bigram_first:
                # common-word nextword index: only pairs whose FIRST
                # token is in the pinned list (query routing applies the
                # same list, so absence still means zero occurrences)
                first_set = set(self.config.bigram_first)
                lead_ok = np.fromiter(
                    (t in first_set for t in term_list), bool, nv
                )
                same = same & lead_ok[c_tids[:-1]]
            pair = c_tids[:-1][same] * nv + c_tids[1:][same]
            uniq, btids = np.unique(pair, return_inverse=True)
            bterm_arr = _pc.binary_join_element_wise(
                term_arr.take(pa.array((uniq // nv).astype(np.int64))),
                term_arr.take(pa.array((uniq % nv).astype(np.int64))),
                "\x1e",
            )
            term_arr = pa.concat_arrays(
                [term_arr, bterm_arr.cast(pa.string())]
            )
            tid_parts.append(btids.astype(np.int64) + nv)
            idx_parts.append(c_idx[:-1][same])
            if store_pos:
                # bigram position = the pair's first-token position (lets
                # future n>2 chains verify adjacency over bigram postings)
                pos_parts.append(pos_parts[0][:-1][same])
            if norm_matrix is not None:
                # bigram postings carry the CONTENT field's norms
                fld_of_tid = np.concatenate(
                    [fld_of_tid, np.zeros(len(uniq), np.int32)]
                )

        pos_in_doc = None
        if len(tid_parts) == 1:
            tids, docidx = tid_parts[0], idx_parts[0]
            if store_pos:
                pos_in_doc = pos_parts[0]
        else:
            tids = np.concatenate(tid_parts)
            docidx = np.concatenate(idx_parts)
            if store_pos:
                pos_in_doc = np.concatenate(pos_parts)
        if not valid.all():
            keep = valid[docidx]
            tids, docidx = tids[keep], docidx[keep]
            if store_pos:
                pos_in_doc = pos_in_doc[keep]

        # Positional fast path (r4 kernel-cut parity for positions, VERDICT
        # r4 item 3): pack (shard, tid, doc, pos) into ONE int64 and plain-
        # sort it — no stable argsort permutation, no position gather, and
        # the spill-side (shard, tid, range) lexsort + re-gather below
        # collapse to slicing because the fused sort already emits postings
        # in shard-major order.  Requires the packed key to fit 63 bits and
        # unit doc_ids ascending (dense assignment makes them so); both are
        # checked, with the general argsort path as fallback.
        n_terms = len(term_arr)
        use_fused = False
        shards_by_tid = None
        if _FUSE_POSITIONAL and store_pos and ndocs and n_terms and tids.size:
            maxpos = int(pos_in_doc.max())
            bits_pos = max(1, maxpos.bit_length())
            shards_by_tid = term_shards_of_array(term_arr, n_shards)
            key_max = (
                (int(shards_by_tid.max()) * n_terms + (n_terms - 1))
                * ndocs + (ndocs - 1)
            )
            use_fused = (
                key_max < (1 << (62 - bits_pos))
                and bool(np.all(np.diff(doc_ids) >= 0))
            )
        if use_fused:
            fused_tid_key = shards_by_tid * n_terms + np.arange(
                n_terms, dtype=np.int64
            )
            key = (
                (fused_tid_key[tids] * ndocs + docidx) << bits_pos
            ) | pos_in_doc
            key.sort()
            positions_flat = (key & ((1 << bits_pos) - 1)).astype(np.int32)
            ksort = key >> bits_pos  # (shard*n_terms + tid)*ndocs + doc
        else:
            key = tids * ndocs + docidx
            if store_pos:
                # stable argsort: equal (tid, doc) runs keep ascending token
                # position, and ``order`` gathers the position stream
                order = np.argsort(key, kind="stable")
                ksort = key[order]
            else:
                # no positions -> only the sorted keys are consumed
                # downstream; plain sort skips the O(tokens) index array
                # + gather
                ksort = np.sort(key)
        if ksort.size:
            bnd = np.empty(ksort.size, dtype=bool)
            bnd[0] = True
            np.not_equal(ksort[1:], ksort[:-1], out=bnd[1:])
            pstart = np.flatnonzero(bnd)
        else:
            pstart = np.empty(0, np.int64)
        p_tf = np.diff(np.append(pstart, ksort.size)).astype(np.int32)
        if use_fused:
            c1 = ksort[pstart]
            p_doc = c1 % ndocs
            st = c1 // ndocs
            p_tid = st % n_terms
            p_shard_fused = st // n_terms
        else:
            p_tid = ksort[pstart] // ndocs if ndocs else ksort[pstart]
            p_doc = ksort[pstart] % ndocs if ndocs else ksort[pstart]
        p_docid = doc_ids[p_doc].astype(np.int64)
        if norm_matrix is None:
            p_norm = norms[p_doc].astype(np.int32)
        else:  # posting norm = the norm of the posting's FIELD
            p_norm = norm_matrix[fld_of_tid[p_tid], p_doc].astype(np.int32)
        p_rid = p_docid // dpr
        if store_pos and not use_fused:
            # grouped by posting (stable sort keeps pos ascending)
            positions_flat = pos_in_doc[order].astype(np.int32)

        # docs slice (valid rows only; invalid rows live in errors/)
        doc_cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "repo": table["repo"],
            "path": table["path"],
            "commit": table["commit"],
            "lang": table["lang"],
            "sha256": pa.array(shas, pa.string()),
            "doclen": pa.array(doclens, pa.int32()),
            "norm": pa.array(norms, pa.uint8()),
        }
        docs_schema = DOCS_SCHEMA
        if self.config.store_content:
            # Solr stored="true" body field (reference stores the full
            # document in Solr: mmd_xml_file) — fl=content + highlighting
            doc_cols["content"] = table["content"]
            docs_schema = DOCS_SCHEMA.append(pa.field("content", pa.string()))
        for name in extra:  # extra stored fields, input types verbatim
            doc_cols[name] = table[name]
            docs_schema = docs_schema.append(
                pa.field(name, table.schema.field(name).type)
            )
        for fname, _src in afields:  # per-field lengths + norms (dense)
            doc_cols[f"doclen_{fname}"] = pa.array(
                field_doclens[fname], pa.int32()
            )
            doc_cols[f"norm_{fname}"] = pa.array(
                field_norms[fname], pa.uint8()
            )
            docs_schema = docs_schema.append(
                pa.field(f"doclen_{fname}", pa.int32())
            ).append(pa.field(f"norm_{fname}", pa.uint8()))
        docs_table = pa.table(doc_cols, schema=docs_schema)
        if not valid.all():
            docs_table = docs_table.filter(pa.array(valid))
        if self.doc_enricher is not None:
            # The enricher sees post-validation rows only (invalid rows are
            # already routed to errors/ and must not reach enrichment, the
            # same way the reference's thumbnail generator only runs on
            # records that passed MMD checks).  Row-count guard compares
            # against the filtered table, not the raw unit size.
            expected_rows = docs_table.num_rows
            docs_table = self.doc_enricher(docs_table)
            if docs_table.num_rows != expected_rows:
                raise ValueError("doc_enricher must preserve row count")
        docs_rel = f"docs/part-{uid:06d}.parquet"
        _atomic_write_table(docs_table, os.path.join(self.index_dir, docs_rel),
                            compression=self.config.compression)

        # raw postings spill, partitioned by term shard (the map side of the
        # postings shuffle): one file per shard this unit touches.  Rows are
        # (term, doc-range) groups; list columns are built zero-copy from
        # the sorted posting arrays (ListArray.from_arrays — no per-row
        # Python list materialization).
        post_rels = []
        n_postings = int(p_tid.size)
        if n_postings:
            if use_fused:
                # fused sort already emitted (shard, tid, doc-asc) order;
                # doc_ids ascending => range_id ascending within each term.
                # No lexsort, no gathers — the position stream is final.
                s_tid, s_rid, s_shard = p_tid, p_rid, p_shard_fused
                s_tf, s_docid, s_norm = p_tf, p_docid, p_norm
                s_positions = positions_flat
                out_off = np.concatenate(
                    ([0], np.cumsum(s_tf, dtype=np.int64))
                )
            else:
                # term_arr: tid -> term (first-appearance order)
                if shards_by_tid is None:
                    shards_by_tid = term_shards_of_array(term_arr, n_shards)
                p_shard = shards_by_tid[p_tid]
                order2 = np.lexsort((p_rid, p_tid, p_shard))
                s_tid = p_tid[order2]
                s_rid = p_rid[order2]
                s_shard = p_shard[order2]
                s_tf = p_tf[order2]
                s_docid = p_docid[order2]
                s_norm = p_norm[order2]
                if store_pos:
                    in_off = np.concatenate(
                        ([0], np.cumsum(p_tf, dtype=np.int64))
                    )
                    lengths = s_tf.astype(np.int64)
                    out_off = np.concatenate(([0], np.cumsum(lengths)))
                    w = (
                        np.arange(int(lengths.sum()), dtype=np.int64)
                        - np.repeat(out_off[:-1], lengths)
                    )
                    s_positions = positions_flat[
                        np.repeat(in_off[order2], lengths) + w
                    ]
            # (shard, term, range) group boundaries over sorted postings
            gb = np.empty(n_postings, dtype=bool)
            gb[0] = True
            gb[1:] = (
                (s_tid[1:] != s_tid[:-1])
                | (s_rid[1:] != s_rid[:-1])
                | (s_shard[1:] != s_shard[:-1])
            )
            gstart = np.flatnonzero(gb)
            gcount = np.diff(np.append(gstart, n_postings))
            post_off = np.concatenate(([0], np.cumsum(gcount)))
            g_tid, g_rid, g_shard = s_tid[gstart], s_rid[gstart], s_shard[gstart]
            if store_pos:
                # encode the unit's WHOLE position stream once (deltas
                # restart per posting), then slice per-row blobs by byte
                # offsets at the row boundaries
                pos_deltas = segmented_delta_encode(
                    s_tf.astype(np.int64), s_positions
                )
                pos_blob = varint_encode(pos_deltas)
                row_boff = varint_byte_offsets(
                    pos_deltas, out_off[post_off]
                )
            # shard runs are contiguous (primary sort key)
            sb = np.empty(gstart.size, dtype=bool)
            sb[0] = True
            sb[1:] = g_shard[1:] != g_shard[:-1]
            sstart = np.flatnonzero(sb)
            for a, b in zip(sstart, np.append(sstart[1:], gstart.size)):
                s = int(g_shard[a])
                plo, phi = int(post_off[a]), int(post_off[b])
                offs = (post_off[a:b + 1] - plo).astype(np.int32)
                cols = {
                    "term": term_arr.take(
                        pa.array(g_tid[a:b], pa.int64())
                    ),
                    "range_id": pa.array(g_rid[a:b], pa.int64()),
                    "doc_ids": pa.ListArray.from_arrays(
                        pa.array(offs, pa.int32()),
                        pa.array(s_docid[plo:phi], pa.int64()),
                    ),
                    "tfs": pa.ListArray.from_arrays(
                        pa.array(offs, pa.int32()),
                        pa.array(s_tf[plo:phi], pa.int32()),
                    ),
                    "norms": pa.ListArray.from_arrays(
                        pa.array(offs, pa.int32()),
                        pa.array(s_norm[plo:phi], pa.int32()),
                    ),
                }
                if store_pos:
                    blo, bhi = int(row_boff[a]), int(row_boff[b])
                    boffs = (row_boff[a:b + 1] - blo).astype(np.int32)
                    cols["positions"] = pa.Array.from_buffers(
                        pa.binary(), b - a,
                        [None, pa.py_buffer(boffs.tobytes()),
                         pa.py_buffer(pos_blob[blo:bhi])],
                    )
                post_table = pa.table(
                    cols,
                    schema=RAW_POSTINGS_POS_SCHEMA if store_pos
                    else RAW_POSTINGS_SCHEMA,
                )
                rel = f"postings_raw/shard={s}/unit-{uid:06d}.parquet"
                os.makedirs(
                    os.path.join(self.index_dir, f"postings_raw/shard={s}"),
                    exist_ok=True,
                )
                _atomic_write_table(
                    post_table, os.path.join(self.index_dir, rel),
                    compression=self.config.compression,
                )
                post_rels.append(rel)

        if error_rows:
            os.makedirs(os.path.join(self.index_dir, "errors"), exist_ok=True)
            err_rel = f"errors/part-{uid:06d}.parquet"
            _atomic_write_table(
                pa.Table.from_pylist(error_rows, schema=ERRORS_SCHEMA),
                os.path.join(self.index_dir, err_rel),
            )
            post_rels.append(err_rel)

        entry = {
            "lineage": {
                "file": str(unit["file"]),
                "row_group": int(unit["row_group"]),
                "row_offset": int(unit["row_offset"]),
                "num_rows": int(unit["num_rows"]),
                "content_digest": hashlib.sha256(
                    "".join(shas).encode()
                ).hexdigest(),
            },
            "outputs": [docs_rel, *post_rels],
            "n_docs": int(valid.sum()),
            "n_rows": n_rows,
            "n_failed": len(error_rows),
            "sum_dl": int(doclens[valid].sum()),
            # per-analyzed-field partials: sumTotalLength + docCount
            # (Lucene: docs with >= 1 term in the field)
            "field_sums": {
                f: {
                    "sum_dl": int(field_doclens[f][valid].sum()),
                    "n_docs": int((field_doclens[f][valid] > 0).sum()),
                }
                for f, _ in afields
            },
            "n_terms_partial": int(gstart.size) if n_postings else 0,
            "metrics": {
                "wall_s": round(time.perf_counter() - t0, 4),
                "n_tokens": int(doclens.sum()),
            },
            "skipped": False,
        }
        if self.config.checkpoint:
            self.manifest.write_unit(uid, entry)
        return _entry_to_row(dict(entry, unit_id=uid))


def _entry_to_row(entry: dict) -> dict:
    return {
        "unit_id": int(entry["unit_id"]),
        "n_docs": int(entry["n_docs"]),
        "n_rows": int(entry.get("n_rows", entry["n_docs"])),
        "n_failed": int(entry.get("n_failed", 0)),
        "sum_dl": int(entry["sum_dl"]),
        "skipped": bool(entry.get("skipped", False)),
        "wall_s": float(entry.get("metrics", {}).get("wall_s", 0.0)),
        # nested dict -> JSON so the partial rides a flat Arrow column
        "field_sums_json": json.dumps(entry.get("field_sums", {})),
    }


def _merge_term_parts(parts: list, block_size: int) -> dict:
    """Merge one term's partial posting lists (one per unit) into a packed
    row.  Partials cover disjoint, internally-sorted doc-id intervals, so
    ordering partials by first doc id and concatenating yields the sorted
    posting list without a re-sort.  Each part is
    ``(doc_ids, tfs, norms[, pos_flat])`` — ``pos_flat`` the part's
    concatenated per-posting position lists (lengths == tfs)."""
    parts.sort(key=lambda p: int(p[0][0]))
    with_pos = len(parts[0]) > 3
    doc_ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    norms = np.concatenate([p[2] for p in parts])
    pos_flat = (
        np.concatenate([p[3] for p in parts]) if with_pos else None
    )
    if doc_ids.size > 1 and not (np.diff(doc_ids) > 0).all():
        # overlapping units should not happen; fall back to full sort
        srt = np.argsort(doc_ids, kind="stable")
        if with_pos:  # reorder per-posting segments with the docs
            offs = np.concatenate(([0], np.cumsum(tfs)))
            pos_flat = np.concatenate(
                [pos_flat[offs[j]:offs[j + 1]] for j in srt]
            ) if pos_flat.size else pos_flat
        doc_ids, tfs, norms = doc_ids[srt], tfs[srt], norms[srt]

    nb = (doc_ids.size + block_size - 1) // block_size
    return {
        "positions": encode_positions(tfs, pos_flat) if with_pos else None,
        "df": int(doc_ids.size),
        "cf": int(tfs.sum()),
        "doc_ids": encode_doc_ids(doc_ids),
        "tfs": varint_encode(tfs),
        "block_last": [
            int(doc_ids[min((b + 1) * block_size, doc_ids.size) - 1])
            for b in range(nb)
        ],
        "block_max_tf": [
            int(tfs[b * block_size:(b + 1) * block_size].max())
            for b in range(nb)
        ],
        "block_min_norm": [
            int(norms[b * block_size:(b + 1) * block_size].min())
            for b in range(nb)
        ],
    }


class ShardMerger:
    """Stage-2 task: the reduce side of the explicit postings shuffle.

    One task per term shard; reads the shard's per-unit spill files (written
    map-side by :class:`UnitIndexer` — no all-to-all through the object
    store, the filesystem IS the shuffle, which also makes stage 2 trivially
    resumable and node-local at scale), merges each (term, doc-range)'s
    partial lists, and writes ``postings/shard=S/range-R.parquet`` with
    terms sorted (parquet row-group stats then prune term lookups; the hive
    ``shard=`` layout prunes across files).
    """

    def __init__(self, index_dir: str, block_size: int, min_range: int = 0,
                 compression: str = "zstd"):
        self.index_dir = os.fspath(index_dir)
        self.block_size = block_size
        self.compression = compression
        #: incremental extension: ranges below min_range are untouched on
        #: disk and skipped; the boundary range re-merges old + new spills.
        self.min_range = min_range

    def __call__(self, batch: dict) -> pa.Table:
        rows = [self._merge_shard(int(s)) for s in batch["shard"]]
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("shard", pa.int64()), ("n_terms", pa.int64()),
                 ("n_files", pa.int64())]
            ),
        )

    def _merge_shard(self, shard: int) -> dict:
        src = os.path.join(self.index_dir, "postings_raw", f"shard={shard}")
        if not os.path.isdir(src):
            return {"shard": shard, "n_terms": 0, "n_files": 0}
        import pyarrow.dataset as pads

        flt = (
            (pads.field("range_id") >= self.min_range)
            if self.min_range > 0 else None
        )
        tbl = pads.dataset(src).to_table(filter=flt)
        import pyarrow.compute as pc

        order = pc.sort_indices(
            tbl,
            sort_keys=[("range_id", "ascending"), ("term", "ascending")],
        )
        tbl = tbl.take(order)
        terms = tbl["term"].to_pylist()
        ranges = tbl["range_id"].to_pylist()
        ids_col = tbl["doc_ids"].combine_chunks()
        tfs_col = tbl["tfs"].combine_chunks()
        norms_col = tbl["norms"].combine_chunks()
        pos_col = (
            tbl["positions"].combine_chunks()
            if "positions" in tbl.column_names else None
        )

        out_dir = os.path.join(self.index_dir, "postings", f"shard={shard}")
        os.makedirs(out_dir, exist_ok=True)

        n_terms = 0
        n_files = 0
        i = 0
        n = tbl.num_rows
        while i < n:  # per doc-range
            rid = ranges[i]
            r0 = i
            while i < n and ranges[i] == rid:
                i += 1
            range_tbl = self._merge_range(
                terms, r0, i, ids_col, tfs_col, norms_col, pos_col, int(rid)
            )
            rel = os.path.join(out_dir, f"range-{int(rid):06d}.parquet")
            _atomic_write_table(range_tbl, rel, row_group_size=512,
                                compression=self.compression)
            n_terms += range_tbl.num_rows
            n_files += 1
        return {"shard": shard, "n_terms": n_terms, "n_files": n_files}

    def _merge_range(self, terms, r0, r1, ids_col, tfs_col, norms_col,
                     pos_col, rid) -> pa.Table:
        """Merge one doc-range's spill rows [r0, r1) into the packed table.

        ONE vectorized pass over the whole range, multi-part (hot) terms
        included: rows are permuted so each term's parts sit contiguously
        ordered by first doc id (one ``lexsort``), every stream is
        gathered once, doc-id deltas restart per TERM (parts cover
        disjoint intervals so the concatenation is already sorted),
        position deltas restart per POSTING, and the range's streams are
        varint-packed ONCE then sliced into per-term blobs by byte
        offsets (``varint_byte_offsets``).  Block metadata reduces via
        ``np.*.reduceat`` at block boundaries laid out per term.  A term
        whose concatenated doc ids are NOT strictly increasing (units
        overlapping a range — shouldn't happen) falls back to the exact
        per-term ``_merge_term_parts`` path.
        """
        import pyarrow.compute as pc

        nrow = r1 - r0
        ids_slice = ids_col.slice(r0, nrow)
        tfs_slice = tfs_col.slice(r0, nrow)
        norms_slice = norms_col.slice(r0, nrow)
        counts = np.asarray(pc.list_value_length(ids_slice).to_numpy(),
                            dtype=np.int64)
        flat_ids = np.asarray(pc.list_flatten(ids_slice).to_numpy(),
                              dtype=np.int64)
        flat_tfs = np.asarray(pc.list_flatten(tfs_slice).to_numpy(),
                              dtype=np.int64)
        flat_norms = np.asarray(pc.list_flatten(norms_slice).to_numpy(),
                                dtype=np.int64)
        row_starts = np.concatenate(([0], np.cumsum(counts)))

        # term-run boundaries within the range (spill rows sorted by term)
        runs: list = []  # (term, start_row, end_row) — absolute rows
        j = r0
        while j < r1:
            t0 = terms[j]
            s = j
            while j < r1 and terms[j] == t0:
                j += 1
            runs.append((t0, s, j))
        run_lens = np.asarray([e - s for _, s, e in runs], dtype=np.int64)
        row_cum = np.concatenate(([0], np.cumsum(run_lens)))
        run_id = np.repeat(np.arange(len(runs), dtype=np.int64), run_lens)

        # permute rows: term-contiguous, parts ordered by first doc id
        firsts = (
            flat_ids[np.minimum(row_starts[:-1], flat_ids.size - 1)]
            if flat_ids.size else np.zeros(nrow, np.int64)
        )
        perm = np.lexsort((firsts, run_id))
        identity = bool((perm == np.arange(perm.size)).all())
        if not identity:
            g_counts = counts[perm]
            g_starts = np.concatenate(([0], np.cumsum(g_counts)))
            gidx = (
                np.repeat(row_starts[perm], g_counts)
                + np.arange(int(g_counts.sum()), dtype=np.int64)
                - np.repeat(g_starts[:-1], g_counts)
            )
            flat_ids = flat_ids[gidx]
            flat_tfs = flat_tfs[gidx]
            flat_norms = flat_norms[gidx]

        # per-term value extents
        df = np.add.reduceat(counts, np.concatenate(([0], np.cumsum(
            run_lens)[:-1]))) if len(runs) else np.zeros(0, np.int64)
        t_starts = np.concatenate(([0], np.cumsum(df)))

        # strict-increase check per term (parts must tile disjointly)
        ok = np.ones(len(runs), dtype=bool)
        if flat_ids.size > 1:
            nondec = np.flatnonzero(np.diff(flat_ids) <= 0) + 1
            # a break is fine exactly at a term boundary
            bad = nondec[~np.isin(nondec, t_starts)]
            if bad.size:
                ok[np.unique(np.searchsorted(
                    t_starts, bad, side="right") - 1)] = False

        # doc-id deltas restart per term; positions restart per posting
        id_deltas = np.empty_like(flat_ids)
        if flat_ids.size:
            id_deltas[0] = flat_ids[0]
            np.subtract(flat_ids[1:], flat_ids[:-1], out=id_deltas[1:])
            ts = t_starts[:-1][df > 0]
            id_deltas[ts] = flat_ids[ts]
        # a bad term's negative deltas would break uint64 packing — mask
        # them to 0 in the shared stream (its blob is replaced below)
        if not ok.all():
            for ri in np.flatnonzero(~ok):
                id_deltas[t_starts[ri]:t_starts[ri + 1]] = 0
        id_blob = varint_encode(id_deltas.view(np.uint64))
        # byte offsets ONLY at term boundaries (multi-byte deltas are
        # rare, so no per-value byte-length cumsum is materialized)
        id_boff = varint_byte_offsets(id_deltas, t_starts)
        tf_blob = varint_encode(flat_tfs.view(np.uint64))
        tf_boff = varint_byte_offsets(flat_tfs, t_starts)
        cf = (np.add.reduceat(flat_tfs, t_starts[:-1])
              if flat_tfs.size else np.zeros(len(runs), np.int64))

        # positions: spill rows carry PRE-ENCODED per-posting delta-varint
        # blobs (already the merged format), so a term's merged positions
        # are just its parts' blobs back to back — no decode, no re-encode
        pos_data = pos_boff = None
        if pos_col is not None:
            bufs = pos_col.buffers()
            if pos_col.offset != 0:
                raise AssertionError("combined binary column has offset")
            pos_boff = np.frombuffer(
                bufs[1], dtype=np.int32, count=len(pos_col) + 1
            ).astype(np.int64)
            pos_data = (
                memoryview(bufs[2]) if bufs[2] is not None
                else memoryview(b"")
            )

        # block boundaries laid out per term: ceil(df/bs) blocks each
        bs = self.block_size
        nb = (df + bs - 1) // bs
        b_off = np.concatenate(([0], np.cumsum(nb)))
        if nb.sum():
            bstarts = (
                np.repeat(t_starts[:-1], nb)
                + (np.arange(int(nb.sum()), dtype=np.int64)
                   - np.repeat(b_off[:-1], nb)) * bs
            )
            bends = np.minimum(bstarts + bs, np.repeat(t_starts[1:], nb))
            bmax = np.maximum.reduceat(flat_tfs, bstarts)
            bmin = np.minimum.reduceat(flat_norms, bstarts)
            blast = flat_ids[bends - 1]
        else:
            bmax = bmin = blast = np.zeros(0, np.int64)
        bmax_l = bmax.tolist()
        bmin_l = bmin.tolist()
        blast_l = blast.tolist()

        rows: list = []
        for ri, (term, s, e) in enumerate(runs):
            if ok[ri]:
                if pos_data is None:
                    pblob = None
                elif identity or e - s == 1:
                    pblob = bytes(pos_data[pos_boff[s]:pos_boff[e]])
                else:
                    lrows = perm[row_cum[ri]:row_cum[ri + 1]] + r0
                    pblob = b"".join(
                        pos_data[pos_boff[x]:pos_boff[x + 1]]
                        for x in lrows
                    )
                merged = {
                    "df": int(df[ri]),
                    "cf": int(cf[ri]),
                    "doc_ids": id_blob[id_boff[ri]:id_boff[ri + 1]],
                    "tfs": tf_blob[tf_boff[ri]:tf_boff[ri + 1]],
                    "positions": pblob,
                    "block_last": blast_l[b_off[ri]:b_off[ri + 1]],
                    "block_max_tf": bmax_l[b_off[ri]:b_off[ri + 1]],
                    "block_min_norm": bmin_l[b_off[ri]:b_off[ri + 1]],
                }
            else:
                parts = []
                for x in range(s, e):
                    tfs_x = np.asarray(tfs_col[x].values)
                    part = (
                        np.asarray(ids_col[x].values),
                        tfs_x,
                        np.asarray(norms_col[x].values),
                    )
                    if pos_data is not None:
                        flat, _ = decode_positions(
                            bytes(pos_data[pos_boff[x]:pos_boff[x + 1]]),
                            tfs_x.astype(np.int64),
                        )
                        part = (*part, flat)
                    parts.append(part)
                merged = _merge_term_parts(parts, self.block_size)
            merged["term"] = term
            merged["range_id"] = rid
            rows.append(merged)
        return pa.Table.from_pylist(rows, schema=MERGED_POSTINGS_SCHEMA)


# Stages run as Ray TASKS, not actor pools: the expensive per-worker state
# (compiled regexes, identifier-expansion cache) lives at module level and
# survives across tasks on warm workers, while tasks avoid the
# per-execution actor-pool spawn cost and scale elastically.  Stage
# callables stay classes (UnitIndexer/ShardMerger) for direct testing.
def _run_stage1(unit_rows, index_dir, config, registry, doc_enricher) -> list:
    def run_units(batch: dict) -> pa.Table:
        return UnitIndexer(index_dir, config, registry, doc_enricher)(batch)

    ds = rd.from_items(unit_rows).map_batches(
        run_units, batch_size=1, batch_format="numpy", num_cpus=1
    )
    rows = ds.take_all()  # small: one row per unit
    _LAST_STAGE_STATS["stage1"] = ds.stats()
    return rows


def _run_stage2(index_dir, n_shards, block_size, min_range: int = 0,
                compression: str = "zstd") -> list:
    def run_merge(batch: dict) -> pa.Table:
        return ShardMerger(index_dir, block_size, min_range, compression)(batch)

    ds = rd.from_items([{"shard": s} for s in range(n_shards)]).map_batches(
        run_merge, batch_size=1, batch_format="numpy", num_cpus=1
    )
    rows = ds.take_all()
    _LAST_STAGE_STATS["stage2"] = ds.stats()
    return rows


#: last run's ``Dataset.stats()`` per stage — recorded into the committed
#: stats (truncated) so per-stage wall/cpu breakdowns are inspectable after
#: the fact (reference analogue: per-stage timers, solrindexer/indexer.py:
#: 674-682; also the brief's "read ds.stats() and iterate" discipline).
_LAST_STAGE_STATS: dict = {}


def build_index(
    input_paths,
    index_dir: str,
    config: IndexConfig | None = None,
    registry: AnalyzerRegistry | None = None,
    overwrite: bool = False,
    doc_enricher=None,
) -> dict:
    """Run the full build; returns the committed stats dict.

    Resume semantics: with ``config.checkpoint`` (default), rerunning after
    an interruption skips completed stage-1 units; stage 2 re-runs from the
    checkpointed raw postings.  ``overwrite=True`` clears the index dir.
    """
    config = config or DEFAULT_CONFIG
    registry = registry or AnalyzerRegistry(config.default_analyzer)
    index_dir = os.fspath(index_dir)
    if overwrite and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    manifest = BuildManifest(index_dir)
    manifest.ensure_dirs()
    # single-writer discipline (Lucene write.lock analogue): concurrent
    # builds against one index dir fail fast instead of corrupting it
    manifest.acquire_lock()
    try:
        return _build_index_locked(
            input_paths, index_dir, config, registry, doc_enricher, manifest
        )
    finally:
        manifest.release_lock()


def _build_index_locked(input_paths, index_dir, config, registry,
                        doc_enricher, manifest) -> dict:
    t0 = time.perf_counter()
    units = list_units(input_paths)
    if not units:
        raise ValueError(f"no parquet inputs under {input_paths!r}")

    import ray

    # ray.cluster_resources() raises before init; under lazy auto-init
    # (RAY_ADDRESS=local, no explicit ray.init yet) estimate from the host
    # and let the first Dataset job trigger the init
    cpus = (int(ray.cluster_resources().get("CPU", 4))
            if ray.is_initialized() else (os.cpu_count() or 4))
    # shard count for the explicit postings shuffle: enough reduce tasks for
    # parallelism, few enough that the map-side spill stays coarse
    # (<= units × shards files total).
    n_shards = max(8, min(64, cpus * 2, len(units) * 2))

    unit_rows = [dict(u.to_row(), n_shards=n_shards) for u in units]
    unit_results = _run_stage1(unit_rows, index_dir, config, registry,
                               doc_enricher)
    t1 = time.perf_counter()

    n_docs = sum(r["n_docs"] for r in unit_results)
    n_failed = sum(r["n_failed"] for r in unit_results)
    sum_dl = sum(r["sum_dl"] for r in unit_results)
    field_stats: dict = {}
    for r in unit_results:
        for f, s in json.loads(r.get("field_sums_json") or "{}").items():
            acc = field_stats.setdefault(f, {"sum_dl": 0, "n_docs": 0})
            acc["sum_dl"] += int(s["sum_dl"])
            acc["n_docs"] += int(s["n_docs"])
    for f, acc in field_stats.items():
        acc["avgdl"] = (
            acc["sum_dl"] / acc["n_docs"] if acc["n_docs"] else 0.0
        )
    doc_id_space = sum(u.num_rows for u in units) if units else 0
    doc_id_space = max(doc_id_space, units[-1].row_offset + units[-1].num_rows)

    # ---- stage 2: per-shard reduce of the spilled postings ---------------
    postings_dir = os.path.join(index_dir, "postings")
    if os.path.isdir(postings_dir):
        shutil.rmtree(postings_dir)
    os.makedirs(postings_dir, exist_ok=True)

    merged_manifest = _run_stage2(index_dir, n_shards, config.block_size,
                                  compression=config.compression)
    t2 = time.perf_counter()

    # ---- commit ---------------------------------------------------------
    n_term_rows = sum(r["n_terms"] for r in merged_manifest)
    stats = {
        "n_docs": int(n_docs),
        "n_failed": int(n_failed),
        "doc_id_space": int(doc_id_space),
        "sum_dl": int(sum_dl),
        "avgdl": (float(sum_dl) / n_docs) if n_docs else 0.0,
        "n_term_rows": int(n_term_rows),
        "n_units": len(units),
        "n_shards": n_shards,
        "docs_per_range": config.docs_per_range,
        "block_size": config.block_size,
        "store_positions": bool(config.store_positions),
        "store_bigrams": bool(config.store_bigrams),
        "bigram_first": sorted(config.bigram_first or ()),
        "compression": config.compression,
        "generation": 1,  # Solr commit generation; bumped by every commit
        "store_content": bool(config.store_content),
        "extra_stored": list(config.extra_stored),
        "analyzed_fields": list(config.analyzed_fields),
        "field_stats": field_stats,
        "k1": config.k1,
        "b": config.b,
        "analyzer_default": registry.default,
        "analyzer_lang_map": registry.lang_map,
        **_filter_chain_stats(config),
        "timings": {
            "stage1_s": round(t1 - t0, 3),
            "stage2_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
        },
        "ray_stats": {
            k: v[:1500] for k, v in _LAST_STAGE_STATS.items()
        },
    }
    manifest.commit(stats)
    return manifest.read_stats()


def extend_index(
    input_paths,
    index_dir: str,
    config: IndexConfig | None = None,
    doc_enricher=None,
) -> dict:
    """Incrementally index NEW inputs into a committed index.

    The reference's primary operating mode is exactly this — continuously
    adding documents to a live Solr core (``indexdata`` runs against an
    existing core; upsert by id, ``solrindexer/indexer.py:470-690``).  Here:

    - new units get doc ids continuing after the existing ``doc_id_space``
      (deterministic: sorted new inputs, prefix sums);
    - index-shape parameters (shards, doc ranges, block size, k1/b,
      analyzer pin) come from the committed stats — they define the layout
      and MUST NOT change between extensions;
    - stage 2 re-merges only doc ranges >= the boundary range: fully-old
      ranges are untouched on disk, the boundary range re-merges old + new
      spills (kept in ``postings_raw``), new ranges are fresh.  Work is
      proportional to the NEW data, not the index size.

    Note: BM25 stats (N, avgdl, df) change with every extension, so scores
    for old queries legitimately shift — same as a Solr commit.
    """
    config = config or DEFAULT_CONFIG
    index_dir = os.fspath(index_dir)
    manifest = BuildManifest(index_dir)
    if not manifest.is_committed():
        raise FileNotFoundError(f"no committed index at {index_dir}")
    manifest.acquire_lock()
    try:
        return _extend_index_locked(input_paths, index_dir, config,
                                    doc_enricher, manifest)
    finally:
        manifest.release_lock()


def _extend_index_locked(input_paths, index_dir, config, doc_enricher,
                         manifest) -> dict:
    old = manifest.read_stats()
    from solr_indexer_ray.pipelines.mutate import _require_spills

    _require_spills(index_dir, old, "extend")
    registry = AnalyzerRegistry(
        old["analyzer_default"], overrides=old["analyzer_lang_map"]
    )
    import dataclasses

    config = dataclasses.replace(
        config,
        docs_per_range=int(old["docs_per_range"]),
        block_size=int(old["block_size"]),
        k1=float(old["k1"]),
        b=float(old["b"]),
        store_positions=bool(old.get("store_positions", False)),
        store_bigrams=bool(old.get("store_bigrams", False)),
        bigram_first=tuple(old.get("bigram_first") or ()),
        compression=str(old.get("compression", "zstd")),
        store_content=bool(old.get("store_content", False)),
        extra_stored=tuple(old.get("extra_stored", ()) or ()),
        analyzed_fields=tuple(old.get("analyzed_fields", ()) or ()),
        filters=tuple(old.get("filters", ()) or ()),
        stopwords=(
            tuple(old["stopwords"]) if old.get("stopwords") is not None
            else None
        ),
    )
    n_shards = int(old["n_shards"])
    base = int(old["doc_id_space"])

    t0 = time.perf_counter()
    units = list_units(input_paths)
    if not units:
        raise ValueError(f"no parquet inputs under {input_paths!r}")
    prev_units = manifest.read_all_units()
    if not prev_units and int(old.get("n_units", 0)) > 0:
        raise ValueError(
            "extend_index requires a checkpointed index "
            "(built with config.checkpoint=True)"
        )
    # idempotence: inputs already in the index (by lineage) are skipped —
    # extending twice with the same files must not duplicate docs.  A true
    # re-index of changed content goes through upsert/rebuild instead.
    seen_lineage = {
        (u["lineage"]["file"], u["lineage"]["row_group"]) for u in prev_units
    }
    units = [u for u in units if (u.file, u.row_group) not in seen_lineage]
    if not units:
        return manifest.read_stats()
    from solr_indexer_ray.sources.parquet_units import ReadUnit

    # re-pack offsets over the surviving units (dense continuation after
    # the existing doc-id space), fresh unit ids after the existing ones
    next_uid = (
        max(int(u["unit_id"]) for u in prev_units) + 1 if prev_units else 0
    )
    shifted = []
    offset = 0
    for i, u in enumerate(units):
        shifted.append(
            ReadUnit(next_uid + i, u.file, u.row_group, base + offset,
                     u.num_rows)
        )
        offset += u.num_rows
    unit_rows = [dict(u.to_row(), n_shards=n_shards) for u in shifted]
    unit_results = _run_stage1(unit_rows, index_dir, config, registry,
                               doc_enricher)
    t1 = time.perf_counter()

    min_range = base // config.docs_per_range
    merged = _run_stage2(index_dir, n_shards, config.block_size, min_range,
                         compression=config.compression)
    t2 = time.perf_counter()

    new_docs = sum(r["n_docs"] for r in unit_results)
    new_failed = sum(r["n_failed"] for r in unit_results)
    new_dl = sum(r["sum_dl"] for r in unit_results)
    n_docs = int(old["n_docs"]) + new_docs
    sum_dl = int(old["sum_dl"]) + new_dl
    field_stats = {
        f: dict(s) for f, s in (old.get("field_stats") or {}).items()
    }
    for r in unit_results:
        for f, s in json.loads(r.get("field_sums_json") or "{}").items():
            acc = field_stats.setdefault(f, {"sum_dl": 0, "n_docs": 0})
            acc["sum_dl"] = int(acc["sum_dl"]) + int(s["sum_dl"])
            acc["n_docs"] = int(acc["n_docs"]) + int(s["n_docs"])
    for f, acc in field_stats.items():
        acc["avgdl"] = (
            acc["sum_dl"] / acc["n_docs"] if acc["n_docs"] else 0.0
        )

    # recount term rows from parquet footers (metadata-only)
    n_term_rows = 0
    postings_dir = os.path.join(index_dir, "postings")
    for root, _, files in os.walk(postings_dir):
        for f in files:
            if f.endswith(".parquet"):
                n_term_rows += pq.ParquetFile(
                    os.path.join(root, f)
                ).metadata.num_rows

    stats = dict(
        old,
        generation=int(old.get("generation", 1)) + 1,
        n_docs=n_docs,
        n_failed=int(old.get("n_failed", 0)) + new_failed,
        doc_id_space=base + sum(u.num_rows for u in units),
        sum_dl=sum_dl,
        avgdl=(float(sum_dl) / n_docs) if n_docs else 0.0,
        n_term_rows=int(n_term_rows),
        n_units=int(old["n_units"]) + len(units),
        field_stats=field_stats,
        timings={
            "stage1_s": round(t1 - t0, 3),
            "stage2_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
        },
    )
    manifest.commit(stats)
    return manifest.read_stats()
