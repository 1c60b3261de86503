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


class TestVectorizedUnitTokenizer:
    """tokenize_unit (Arrow RE2 block path) must produce EXACTLY the
    per-row analyzers' token streams — the per-row functions are the
    reference implementation shared with the query engine and oracle."""

    def _check(self, texts, langs, registry):
        import numpy as np
        import pyarrow as pa

        from solr_indexer_ray.functions.tokenize import tokenize_unit

        tids, lens, terms = tokenize_unit(pa.array(texts), langs, registry)
        off = np.concatenate(([0], np.cumsum(lens)))
        for i, (text, lang) in enumerate(zip(texts, langs)):
            want = registry.tokenize(text or "", lang)
            got = [terms[t] for t in tids[off[i]:off[i + 1]]]
            assert got == want, (text, lang, got, want)

    def test_simple_block(self):
        from solr_indexer_ray.functions.tokenize import AnalyzerRegistry

        reg = AnalyzerRegistry("simple", overrides={})
        texts = ["Hello, World! 42", "", "  ", "a-b_c", None, "ümlaut ÜP"]
        self._check(texts, ["en"] * len(texts), reg)

    def test_code_block_adversarial(self):
        from solr_indexer_ray.functions.tokenize import AnalyzerRegistry

        reg = AnalyzerRegistry("simple")  # python/java routed to code
        texts = [
            "HTTPServer9 fooBar_baz 9xyz abc9d _9x -9x 12abc34def x9A 9_",
            "def readFile(path): return XMLParser2000.parse(path)",
            "__init__ __MACRO__ A B Z9 z9 9Z",
            "9 99x x99 _ __ 9_9 a_9b_C",
            "",
            "camelCaseXYZAbc HTTPSConnection2x",
        ]
        self._check(texts, ["python"] * len(texts), reg)

    def test_mixed_langs_unified_vocab(self):
        from solr_indexer_ray.functions.tokenize import AnalyzerRegistry

        reg = AnalyzerRegistry("simple")
        texts = ["fooBar baz", "Foo-bar BAZ", "getX setX", "x y z"]
        langs = ["python", "en", "java", "en"]
        self._check(texts, langs, reg)

    def test_plugin_analyzer_fallback(self):
        from solr_indexer_ray.functions.tokenize import (
            AnalyzerRegistry,
            register_analyzer,
        )

        register_analyzer("shout", lambda text: [t.upper() for t in text.split()])
        try:
            reg = AnalyzerRegistry("simple", overrides={"kl": "shout"})
            texts = ["foo bar", "Baz qux", "plain Text"]
            self._check(texts, ["kl", "en", "kl"], reg)
        finally:
            AnalyzerRegistry.ANALYZERS.pop("shout")

    def test_property_random_code_strings(self):
        import random

        from solr_indexer_ray.functions.tokenize import AnalyzerRegistry

        rng = random.Random(13)
        alphabet = "aB9_ -xYZ\t.(0)Qr\n"
        reg = AnalyzerRegistry("simple")
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
            for _ in range(300)
        ]
        langs = [rng.choice(["python", "en", "go"]) for _ in texts]
        self._check(texts, langs, reg)
