"""Vocabulary backends (ST2): versioned TTL disk cache, corruption
recovery, factory fallback — reference parity with
``solrindexer/vocabulary.py:260-504`` / ``tests/test_vocabulary.py``."""

import json
import os

import pytest

from solr_indexer_ray.state.vocabulary import (
    CachedVocabulary,
    FileVocabulary,
    LegacyVocabulary,
    create_vocabulary_backend,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


class CountingFetcher:
    def __init__(self, sets, fail=False):
        self.sets = sets
        self.fail = fail
        self.calls = 0

    def __call__(self, vocab):
        self.calls += 1
        if self.fail:
            raise ConnectionError("endpoint down")
        return self.sets.get(vocab, set())


SETS = {"langs": {"python", "go"}, "topics": {"ocean", "ice"}}


class TestCachedVocabulary:
    def test_fetch_then_mem_cache(self, tmp_path):
        f = CountingFetcher(SETS)
        v = CachedVocabulary(f, cache_dir=str(tmp_path))
        assert v.get_concepts("langs") == {"python", "go"}
        assert v.search("langs", "go") and not v.search("langs", "rust")
        v.get_concepts("langs")
        assert f.calls == 1  # memory hit, no refetch

    def test_disk_warm_start_across_instances(self, tmp_path):
        f1 = CountingFetcher(SETS)
        CachedVocabulary(f1, cache_dir=str(tmp_path)).get_concepts("langs")
        f2 = CountingFetcher(SETS)
        v2 = CachedVocabulary(f2, cache_dir=str(tmp_path))
        assert v2.get_concepts("langs") == {"python", "go"}
        assert f2.calls == 0  # served from disk

    def test_ttl_expiry_refetches(self, tmp_path):
        clock = FakeClock(1000.0)
        f = CountingFetcher(SETS)
        v = CachedVocabulary(f, cache_ttl=100.0, cache_dir=str(tmp_path),
                             clock=clock)
        v.get_concepts("langs")
        clock.t += 50
        v2 = CachedVocabulary(f, cache_ttl=100.0, cache_dir=str(tmp_path),
                              clock=clock)
        v2.get_concepts("langs")
        assert f.calls == 1  # still fresh
        clock.t += 100
        v3 = CachedVocabulary(f, cache_ttl=100.0, cache_dir=str(tmp_path),
                              clock=clock)
        v3.get_concepts("langs")
        assert f.calls == 2  # stale entry refetched

    def test_corrupt_cache_recovers_and_replaces(self, tmp_path):
        f = CountingFetcher(SETS)
        v = CachedVocabulary(f, cache_dir=str(tmp_path))
        v.get_concepts("langs")
        (cache_file,) = [
            p for p in os.listdir(tmp_path) if p.endswith(".json")
        ]
        with open(tmp_path / cache_file, "w") as fh:
            fh.write("{ not json !!!")
        f2 = CountingFetcher(SETS)
        v2 = CachedVocabulary(f2, cache_dir=str(tmp_path))
        assert v2.get_concepts("langs") == {"python", "go"}
        assert f2.calls == 1  # corrupt entry refetched...
        entry = json.load(open(tmp_path / cache_file))
        assert set(entry["concepts"]) == {"python", "go"}  # ...and replaced

    def test_version_bump_invalidates(self, tmp_path):
        f = CountingFetcher(SETS)
        v = CachedVocabulary(f, cache_dir=str(tmp_path))
        v.get_concepts("langs")
        (cache_file,) = [
            p for p in os.listdir(tmp_path) if p.endswith(".json")
        ]
        entry = json.load(open(tmp_path / cache_file))
        entry["version"] = CachedVocabulary.CACHE_VERSION - 1
        json.dump(entry, open(tmp_path / cache_file, "w"))
        f2 = CountingFetcher(SETS)
        CachedVocabulary(f2, cache_dir=str(tmp_path)).get_concepts("langs")
        assert f2.calls == 1

    def test_failed_fetch_degrades_and_not_cached(self, tmp_path):
        f = CountingFetcher(SETS, fail=True)
        v = CachedVocabulary(f, cache_dir=str(tmp_path))
        assert v.get_concepts("langs") == frozenset()  # warn-don't-block
        assert not [p for p in os.listdir(tmp_path) if p.endswith(".json")]
        # memory-caches the failure for THIS instance only
        v.get_concepts("langs")
        assert f.calls == 1
        # a fresh instance (next run) retries the endpoint
        f.fail = False
        v2 = CachedVocabulary(f, cache_dir=str(tmp_path))
        assert v2.get_concepts("langs") == {"python", "go"}

    def test_uncreatable_cache_dir_disables_disk_only(self, tmp_path):
        blocker = tmp_path / "file"
        blocker.write_text("x")
        f = CountingFetcher(SETS)
        v = CachedVocabulary(f, cache_dir=str(blocker / "sub"))
        assert v._cache_dir is None
        assert v.get_concepts("langs") == {"python", "go"}  # still works


class TestFileVocabulary:
    def test_json_file(self, tmp_path):
        p = tmp_path / "vocab.json"
        p.write_text(json.dumps({"langs": ["python", "go"]}))
        v = FileVocabulary(str(p))
        assert v.search("langs", "python")
        assert v.get_concepts("nope") == frozenset()

    def test_parquet_file(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = tmp_path / "vocab.parquet"
        pq.write_table(
            pa.table(
                {"vocab": ["a", "a", "b"], "concept": ["x", "y", "z"]}
            ),
            p,
        )
        v = FileVocabulary(str(p))
        assert v.get_concepts("a") == {"x", "y"}
        assert v.search("b", "z")

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            FileVocabulary(str(tmp_path / "nope.json"))


class TestFactory:
    def test_native_with_path(self, tmp_path):
        p = tmp_path / "v.json"
        p.write_text(json.dumps({"a": ["x"]}))
        assert isinstance(
            create_vocabulary_backend(path=str(p)), FileVocabulary
        )

    def test_native_falls_back_to_cached(self, tmp_path):
        b = create_vocabulary_backend(
            backend="native", fetcher=CountingFetcher(SETS),
            cache_dir=str(tmp_path),
        )
        assert isinstance(b, CachedVocabulary)

    def test_native_without_anything_raises(self):
        with pytest.raises(ValueError, match="needs a file path"):
            create_vocabulary_backend(backend="native")

    def test_legacy_and_unknown(self):
        assert isinstance(
            create_vocabulary_backend(backend="legacy"), LegacyVocabulary
        )
        with pytest.raises(ValueError, match="unknown vocabulary backend"):
            create_vocabulary_backend(backend="wat")


class TestValidatorIntegration:
    def test_controlled_vocab_from_backend(self, tmp_path):
        import pyarrow as pa

        from solr_indexer_ray.stages.validate import (
            ControlledVocabulary,
            CorpusValidator,
        )

        fetcher = CountingFetcher({"lang": {"python"}})
        backend = CachedVocabulary(fetcher, cache_dir=str(tmp_path))
        vocab = ControlledVocabulary.from_backend("lang", backend)
        seen = []
        v = CorpusValidator(
            lang_vocab=vocab,
            on_warning=lambda key, msg, stage: seen.append(stage),
        )
        batch = pa.Table.from_pylist(
            [
                {"repo": "r", "path": "p", "commit": "a" * 40,
                 "lang": "python", "content": "ok tokens"},
                {"repo": "r", "path": "q", "commit": "a" * 40,
                 "lang": "golang", "content": "ok tokens"},
            ]
        )
        out = v(batch)
        assert out["valid"].to_pylist() == [True, True]  # warn-don't-block
        assert seen == ["vocabulary"]
        assert fetcher.calls == 1  # resolved once, broadcastable
