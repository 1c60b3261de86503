"""Inline validation during index build (config.validate=True)."""

import os

import pyarrow.dataset as pads
import pytest

from solr_indexer_ray.config import IndexConfig
from solr_indexer_ray.pipelines.build import build_index
from solr_indexer_ray.pipelines.search import SearchEngine


@pytest.fixture(scope="module")
def validated_index(small_corpus_path, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("vidx") / "idx")
    config = IndexConfig(docs_per_range=128, concurrency=2, validate=True)
    stats = build_index(small_corpus_path, index_dir, config=config)
    return index_dir, stats


class TestInlineValidation:
    def test_invalid_rows_routed_to_errors(self, validated_index, small_corpus):
        index_dir, stats = validated_index
        assert stats["n_failed"] >= 3  # empty / whitespace / punct edge rows
        assert stats["n_docs"] + stats["n_failed"] == small_corpus.num_rows
        assert stats["doc_id_space"] == small_corpus.num_rows
        errors = pads.dataset(os.path.join(index_dir, "errors")).to_table()
        assert errors.num_rows == stats["n_failed"]
        assert set(errors["stage"].to_pylist()) <= {
            "required", "id-format", "empty-content",
        }

    def test_invalid_ids_keep_slots_but_absent(self, validated_index):
        index_dir, stats = validated_index
        eng = SearchEngine(index_dir)
        errors = pads.dataset(os.path.join(index_dir, "errors")).to_table()
        for did in errors["doc_id"].to_pylist():
            assert not eng.present[did]
            assert eng.get(did) is None
        assert int(eng.present.sum()) == stats["n_docs"]

    def test_search_works_and_avgdl_over_valid_only(self, validated_index):
        index_dir, stats = validated_index
        eng = SearchEngine(index_dir)
        t = eng.search("def index", k=5, fl=["doc_id"])
        assert t.num_rows == 5
        assert stats["avgdl"] == stats["sum_dl"] / stats["n_docs"]

    def test_exit_code_partial(self, validated_index):
        from solr_indexer_ray.stages.validate import determine_exit_code

        _, stats = validated_index
        assert determine_exit_code(stats["n_docs"], stats["n_failed"]) == 3
