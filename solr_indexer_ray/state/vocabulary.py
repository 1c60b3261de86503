"""Vocabulary backends (ST2): pluggable controlled-vocabulary loaders
with a versioned TTL disk cache and corruption recovery.

Reference parity (``/root/reference/solrindexer/vocabulary.py:260-504``,
tested there in ``tests/test_vocabulary.py:277-420``):

- three backends behind one interface + a string-keyed factory with the
  reference's fallback rule (``native`` without a file falls back to the
  remote/cached backend);
- the remote backend caches per-vocabulary concept sets in memory, then
  on disk as VERSIONED entries under a cache dir, refreshing only past
  ``cache_ttl`` seconds; corrupt or version-mismatched cache files are
  deleted and refetched, never raised; failed/empty fetches are NOT
  cached to disk; an uncreatable cache dir disables disk caching but the
  backend keeps working.

Differences by design: entries persist as JSON, not pickle (a corrupt or
attacker-writable cache file must never execute code), and the "remote"
fetch is an injected callable — this sandbox has no network, and at
cluster scale the fetch runs ONCE on the driver anyway: concept sets
broadcast via ``ray.put`` and every ``map_batches`` task checks
membership against the broadcast set (J5), never fetching per task.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import tempfile
import time

_LOG = logging.getLogger(__name__)


class VocabularyBackend:
    """Interface: per-vocabulary concept sets + membership checks."""

    def get_concepts(self, vocab: str) -> frozenset:
        raise NotImplementedError

    def search(self, vocab: str, value: str) -> bool:
        return value in self.get_concepts(vocab)


class FileVocabulary(VocabularyBackend):
    """``native`` backend: concept sets from a local file, loaded once.

    Accepts JSON (``{"vocab": ["concept", ...]}``) or a parquet table of
    ``(vocab:string, concept:string)`` rows — the engine-native format a
    100 TB deployment would ship alongside the job.
    """

    def __init__(self, path: str):
        self.path = os.fspath(path)
        if not os.path.exists(self.path):
            raise FileNotFoundError(f"vocabulary file not found: {self.path}")
        self._sets: dict = {}
        if self.path.endswith(".json"):
            with open(self.path) as f:
                data = json.load(f)
            if not isinstance(data, dict):
                raise ValueError(f"{self.path}: expected a JSON object")
            self._sets = {k: frozenset(v) for k, v in data.items()}
        else:
            import pyarrow.parquet as pq

            t = pq.read_table(self.path, columns=["vocab", "concept"])
            for vocab, concept in zip(
                t["vocab"].to_pylist(), t["concept"].to_pylist()
            ):
                self._sets.setdefault(vocab, set()).add(concept)
            self._sets = {k: frozenset(v) for k, v in self._sets.items()}

    def get_concepts(self, vocab: str) -> frozenset:
        return self._sets.get(vocab, frozenset())


class LegacyVocabulary(VocabularyBackend):
    """Best-effort legacy backend: no concept enumeration (the reference's
    legacy-metvocab mode returns empty sets, ``vocabulary.py:243-258``)."""

    def get_concepts(self, vocab: str) -> frozenset:
        _LOG.debug("legacy vocabulary backend: no concepts for %s", vocab)
        return frozenset()


class CachedVocabulary(VocabularyBackend):
    """Fetcher-backed vocabulary with mem + versioned TTL disk cache.

    ``fetcher(vocab) -> iterable[str]`` stands in for the reference's
    Skosmos REST fetch; everything around it mirrors the reference's
    cache discipline exactly (see module docstring).
    """

    _CACHE_DIR_NAME = "solr_indexer_ray_vocab"
    #: bump to invalidate all on-disk entries after schema changes
    CACHE_VERSION = 1

    def __init__(self, fetcher, cache_ttl: float = 86400.0,
                 cache_dir: str | None = None, clock=time.time):
        self.fetcher = fetcher
        self.cache_ttl = float(cache_ttl)
        self._clock = clock
        self._mem: dict = {}
        base = cache_dir or os.path.join(
            tempfile.gettempdir(), self._CACHE_DIR_NAME
        )
        try:
            os.makedirs(base, exist_ok=True)
            self._cache_dir = base
        except OSError as exc:
            _LOG.warning(
                "could not create vocab cache dir %s: %s — disk cache "
                "disabled", base, exc,
            )
            self._cache_dir = None

    # -- disk cache --------------------------------------------------------
    def _cache_path(self, vocab: str) -> str | None:
        if self._cache_dir is None:
            return None
        digest = hashlib.sha256(vocab.encode()).hexdigest()[:24]
        return os.path.join(
            self._cache_dir, f"v{self.CACHE_VERSION}_{digest}.json"
        )

    def _read_disk(self, vocab: str):
        path = self._cache_path(vocab)
        if path is None or not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                entry = json.load(f)
            if entry.get("version") != self.CACHE_VERSION:
                return None
            age = self._clock() - float(entry["fetched_at"])
            if age >= self.cache_ttl:
                _LOG.debug("vocab cache stale (%.0fs): %s", age, vocab)
                return None
            return frozenset(entry["concepts"])
        except Exception as exc:
            # corruption recovery: delete and refetch, never raise
            _LOG.warning(
                "corrupt vocab cache file %s (%s) — will refetch", path, exc
            )
            try:
                os.unlink(path)
            except OSError:
                pass
            return None

    def _write_disk(self, vocab: str, concepts: frozenset) -> None:
        path = self._cache_path(vocab)
        if path is None:
            return
        entry = {
            "version": self.CACHE_VERSION,
            "fetched_at": self._clock(),
            "concepts": sorted(concepts),
        }
        try:
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(entry, f)
            os.replace(tmp, path)
        except OSError as exc:
            _LOG.warning("could not write vocab cache %s: %s", path, exc)

    # -- lookup ------------------------------------------------------------
    def get_concepts(self, vocab: str) -> frozenset:
        if vocab in self._mem:
            return self._mem[vocab]
        cached = self._read_disk(vocab)
        if cached is not None:
            self._mem[vocab] = cached
            return cached
        try:
            concepts = frozenset(self.fetcher(vocab))
        except Exception as exc:
            # reference behavior: lookup failure degrades to an empty set
            # (warn-don't-block), and failures are never cached to disk
            _LOG.warning("vocabulary fetch failed for %s: %s", vocab, exc)
            concepts = frozenset()
        self._mem[vocab] = concepts
        if concepts:  # don't persist failed/empty results
            self._write_disk(vocab, concepts)
        return concepts


def create_vocabulary_backend(
    path: str | None = None,
    backend: str = "native",
    fetcher=None,
    cache_ttl: float = 86400.0,
    cache_dir: str | None = None,
) -> VocabularyBackend:
    """String-keyed factory (reference ``create_vocabulary_loader``,
    ``vocabulary.py:447-504``): ``native`` (file), ``cached`` (fetcher +
    TTL disk cache), ``legacy`` (best-effort empty).  ``native`` without
    a file falls back to the cached backend — the reference's fallback
    rule — and raises only when no fetcher is available either."""
    if backend == "legacy":
        return LegacyVocabulary()
    if backend == "native":
        if path is not None:
            return FileVocabulary(path)
        if fetcher is not None:
            _LOG.info("no vocabulary file; falling back to cached backend")
            return CachedVocabulary(fetcher, cache_ttl, cache_dir)
        raise ValueError(
            "native vocabulary backend needs a file path (or a fetcher "
            "to fall back to)"
        )
    if backend == "cached":
        if fetcher is None:
            raise ValueError("cached vocabulary backend needs a fetcher")
        return CachedVocabulary(fetcher, cache_ttl, cache_dir)
    raise ValueError(
        f"unknown vocabulary backend: {backend!r} "
        "(valid: 'native', 'cached', 'legacy')"
    )
