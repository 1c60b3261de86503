"""Resident serving pool — the steady-state query-deployment shape.

The per-job distributed paths (``rd.from_items(...).map_batches(
BatchSearcher)`` and ``search_partitioned``) spawn a fresh worker pool per
call: the right shape for batch jobs, but a serving deployment keeps its
engines resident.  ``SearchService`` holds N actors, each with ONE warm
:class:`~solr_indexer_ray.pipelines.search.SearchEngine` (stats, norms,
term/df caches loaded once per actor lifetime — reference analogue: one
pysolr session per worker process reused across requests,
``solrindexer/indexer.py:83-88`` ST5), and round-robins query batches
across them.  bench.py's ``dist_warm_qps`` row measures exactly this shape
at ~2-4x the per-job ``dist_qps`` number (the difference is process spawn
+ import + engine init, paid once here instead of per job).

The service never calls ``ray.init()`` — actor creation auto-initialises
under an existing session (tests / bench / CLI / driver own the session).
"""

from __future__ import annotations

import ray


@ray.remote
class _ServingActor:
    """One resident engine; a plain ``ray.remote`` actor so the pool
    survives across queries (Ray Data actor pools are per-job)."""

    def __init__(self, index_dir: str, synonyms=None):
        from solr_indexer_ray.pipelines.search import SearchEngine

        self.engine = SearchEngine(index_dir, synonyms=synonyms)
        self.engine.norms  # eager warm-up, once per actor

    def search_many(self, queries, k, fl, kwargs):
        return [
            self.engine.search(q, k=k, fl=fl, **kwargs) for q in queries
        ]


class SearchService:
    """Round-robin query service over a resident actor pool.

    >>> with SearchService(index_dir, pool=8) as svc:
    ...     hits = svc.search('"def index" read', k=10)      # one pa.Table
    ...     all_hits = svc.search_many(queries, k=10)        # ordered list

    Results are the engine's own tables, bit-identical to
    ``SearchEngine(index_dir).search(...)`` (tested).  ``pool`` x
    ``num_cpus`` should be sized to the node like any actor-pool stage.
    """

    def __init__(self, index_dir: str, pool: int = 8, synonyms=None,
                 num_cpus: float = 1):
        if pool < 1:
            raise ValueError("pool must be >= 1")
        self._actors = [
            _ServingActor.options(num_cpus=num_cpus).remote(
                index_dir, synonyms=synonyms
            )
            for _ in range(pool)
        ]
        self._rr = 0
        self._closed = False

    # -- queries ----------------------------------------------------------
    def search(self, query: str, k: int = 10, fl=None, **kwargs):
        """One query -> the engine's result table (blocking)."""
        return self.search_many([query], k=k, fl=fl, **kwargs)[0]

    def search_many(self, queries, k: int = 10, fl=None,
                    chunk: int = 64, **kwargs) -> list:
        """Many queries -> ordered list of result tables.

        Queries are chunked and dispatched round-robin across the pool;
        all chunks run concurrently and results reassemble in input
        order."""
        if self._closed:
            raise RuntimeError("SearchService is closed")
        queries = list(queries)
        refs, spans = [], []
        for i in range(0, len(queries), chunk):
            part = queries[i:i + chunk]
            actor = self._actors[self._rr % len(self._actors)]
            self._rr += 1
            refs.append(actor.search_many.remote(part, k, fl, kwargs))
            spans.append((i, len(part)))
        out: list = [None] * len(queries)
        for (i, n), tables in zip(spans, ray.get(refs)):
            out[i:i + n] = tables
        return out

    # -- lifecycle ---------------------------------------------------------
    def close(self) -> None:
        if not self._closed:
            for a in self._actors:
                ray.kill(a)
            self._actors = []
            self._closed = True

    def __enter__(self) -> "SearchService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


@ray.remote
class _RangeActor:
    """Resident per-range scorer: owns a RangeScorer and a FIXED subset
    of doc ranges — the shard-resident shape of a multi-node serving
    deployment (each node holds its ranges' postings/norms warm; no
    actor ever touches another's partition)."""

    def __init__(self, index_dir: str, range_ids):
        from solr_indexer_ray.pipelines.search import RangeScorer

        self.scorer = RangeScorer(index_dir)
        self.range_ids = list(range_ids)

    def score(self, base_item: dict, excl_by_range: dict, k: int) -> list:
        self.scorer.k = k
        rows: list = []
        for r in self.range_ids:
            batch = {
                kk: [vv] for kk, vv in dict(
                    base_item, range_id=r,
                    excl=excl_by_range.get(r, []),
                ).items()
            }
            rows.extend(self.scorer(batch).to_pylist())
        # local k-cut before shipping (ranges are disjoint, so the
        # global top-k needs at most k rows from each actor)
        rows.sort(key=lambda x: (-x["score"], x["doc_id"]))
        return rows[:k]


class PartitionedSearchService:
    """Resident form of the per-range distributed protocol
    (:func:`~solr_indexer_ray.pipelines.search.search_partitioned`).

    ``SearchService`` replicates the WHOLE index into every actor —
    right for single-node serving, impossible when the index outgrows
    one machine.  This service instead partitions the doc ranges across
    a resident actor pool (each actor's RangeScorer touches only its
    ranges' postings/norms — the layout a multi-node cluster pins per
    node), and the driver does only the clause scout (df-only metadata
    read) and the k-way merge of per-actor top-k partials.  Results are
    bit-identical to ``search_partitioned`` / the single engine
    (tested).

    Query shapes the wire protocol can't ship (grouped boolean trees,
    match-all, score-shaping params) fall back to the per-job
    ``search_partitioned`` path, which handles them distributed or
    single-engine as documented there.

    Mutations (delete / extend / compact) follow the engine-wide
    invalidation rule: construct a NEW service after committing them
    (Solr's searcher-reopen-on-commit discipline) — a resident pool
    built before a mutation serves the pre-mutation view.
    """

    def __init__(self, index_dir: str, pool: int = 8, synonyms=None,
                 num_cpus: float = 1):
        from solr_indexer_ray.pipelines.search import SearchEngine

        if pool < 1:
            raise ValueError("pool must be >= 1")
        self.index_dir = index_dir
        #: driver-side engine: query parsing + the df-only clause scout
        #: (never reads postings blobs — lookup_dfs)
        self.engine = SearchEngine(index_dir, synonyms=synonyms)
        self._synonyms = synonyms
        dpr = int(self.engine.stats["docs_per_range"])
        n_ranges = (self.engine.doc_space + dpr - 1) // dpr
        self._dpr = dpr
        pool = min(pool, max(1, n_ranges))
        self._actors = [
            _RangeActor.options(num_cpus=num_cpus).remote(
                index_dir, list(range(p, n_ranges, pool))
            )
            for p in range(pool)
        ]
        self._closed = False

    def search(self, query: str, k: int = 10, fq=None):
        """Top-k for one query -> ``(doc_id, score)`` table, bit-identical
        to ``search_partitioned(index_dir, query, k=k, fq=fq)``."""
        import json

        import pyarrow as pa

        from solr_indexer_ray.pipelines.search import (
            _distributed_clauses,
            _fq_excluded_by_range,
            search_partitioned,
        )

        if self._closed:
            raise RuntimeError("PartitionedSearchService is closed")
        engine = self.engine
        parsed = engine._parse(query)
        clauses = _distributed_clauses(engine, parsed, query)
        if clauses is None:
            # tree / match-all / single-engine shapes: per-job path
            # (same synonym map — fallbacks must not change semantics)
            return search_partitioned(self.index_dir, query, k=k, fq=fq,
                                      synonyms=self._synonyms)
        if clauses == "zero":
            return pa.Table.from_pylist(
                [], schema=pa.schema(
                    [("doc_id", pa.int64()), ("score", pa.float64())]
                ),
            )
        (terms, idfs, phrases, prefix_groups, fuzzy_groups, near_groups,
         syn_groups, extras) = clauses
        excl = _fq_excluded_by_range(engine, fq, self._dpr)
        for d_ in engine.tombstones:
            excl.setdefault(d_ // self._dpr, []).append(int(d_))
        base = {
            "terms": terms,
            "idfs": idfs,
            "prohibited": sorted(set(parsed.prohibited)),
            "filter_keys": sorted(parsed.filters),
            "filter_vals": [
                parsed.filters[f] for f in sorted(parsed.filters)
            ],
            "conjunctive": parsed.conjunctive,
            "min_should": int(parsed.min_should),
            "phrases_json": json.dumps(phrases),
            "prefix_groups_json": json.dumps(prefix_groups),
            "fuzzy_groups_json": json.dumps(fuzzy_groups),
            "near_groups_json": json.dumps(near_groups),
            "syn_groups_json": json.dumps(syn_groups),
            "extras_json": json.dumps(extras),
        }
        partials: list = []
        for chunk in ray.get([
            a.score.remote(base, excl, k) for a in self._actors
        ]):
            partials.extend(chunk)
        partials.sort(key=lambda r: (-r["score"], r["doc_id"]))
        return pa.Table.from_pylist(
            partials[:k],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("score", pa.float64())]
            ),
        )

    def close(self) -> None:
        if not self._closed:
            for a in self._actors:
                ray.kill(a)
            self._actors = []
            self._closed = True

    def __enter__(self) -> "PartitionedSearchService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
