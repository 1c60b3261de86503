"""Analyzer unit tests (pinned tokenization semantics)."""

import duckdb
import pytest

from solr_indexer_ray.functions.tokenize import (
    AnalyzerRegistry,
    code_analyzer,
    simple_analyzer,
)


class TestSimpleAnalyzer:
    def test_basic(self):
        assert simple_analyzer("Hello, World!") == ["hello", "world"]

    def test_empty_and_token_free(self):
        assert simple_analyzer("") == []
        assert simple_analyzer("   \n\t ") == []
        assert simple_analyzer("!!! ??? ---") == []

    def test_alnum_runs(self):
        assert simple_analyzer("foo_bar v2.0") == ["foo", "bar", "v2", "0"]

    def test_matches_duckdb_regexp_split(self):
        """The simple analyzer must match the oracle-SQL tokenization
        verbatim (FIXTURES.md §4)."""
        texts = [
            "The quick brown fox", "foo_bar  baz-qux", "a1 B2 c3!",
            "", "  ", "x", "naïve café 北京",
        ]
        con = duckdb.connect()
        for t in texts:
            sql = con.execute(
                "select list_filter(regexp_split_to_array(lower(?), "
                "'[^a-z0-9]+'), x -> x <> '')",
                [t],
            ).fetchone()[0]
            assert simple_analyzer(t) == sql, t


class TestCodeAnalyzer:
    def test_snake_case(self):
        assert code_analyzer("parse_doc_id") == ["parse", "doc", "id"]

    def test_camel_case(self):
        assert code_analyzer("readFileSync") == ["read", "file", "sync"]
        assert code_analyzer("HTTPServer") == ["http", "server"]

    def test_mixed_code(self):
        toks = code_analyzer("def tokenStream(max_count): return 42")
        assert toks == ["def", "token", "stream", "max", "count", "return", "42"]

    def test_plain_lower_kept_whole(self):
        assert code_analyzer("import numpy") == ["import", "numpy"]


class TestRegistry:
    def test_lang_routing(self):
        reg = AnalyzerRegistry()
        assert reg.analyzer_name("python") == "code"
        assert reg.analyzer_name("markdown") == "simple"
        assert reg.analyzer_name(None) == "simple"

    def test_overrides(self):
        reg = AnalyzerRegistry(overrides={"python": "simple"})
        assert reg.analyzer_name("python") == "simple"

    def test_unknown_default_raises(self):
        with pytest.raises(KeyError):
            AnalyzerRegistry("nope")
