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
