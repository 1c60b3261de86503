"""Lucene range filters — ``field:[lo TO hi]`` with exclusive ``{}``
bounds and ``*`` open ends over metadata strings and the numeric
``doclen`` field; negation; rank identity vs the oracle."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.config import IndexConfig
from solr_indexer_ray.functions.queryparse import parse_query
from solr_indexer_ray.pipelines.build import build_index
from solr_indexer_ray.pipelines.oracle import BruteForceBM25
from solr_indexer_ray.pipelines.search import SearchEngine, search_partitioned
from solr_indexer_ray.sources.corpus import generate_corpus


def _analyze(s):
    return s.lower().split()


class TestParser:
    def test_inclusive(self):
        p = parse_query("doclen:[10 TO 20] x", _analyze)
        (rf,) = p.range_filters
        assert (rf.field, rf.lo, rf.hi, rf.lo_incl, rf.hi_incl) == (
            "doclen", "10", "20", True, True
        )
        assert p.terms == ["x"]

    def test_exclusive_and_mixed(self):
        (rf,) = parse_query("doclen:{10 TO 20}", _analyze).range_filters
        assert (rf.lo_incl, rf.hi_incl) == (False, False)
        (rf,) = parse_query("lang:[a TO b}", _analyze).range_filters
        assert (rf.lo_incl, rf.hi_incl) == (True, False)

    def test_open_ends(self):
        (rf,) = parse_query("doclen:[* TO 20]", _analyze).range_filters
        assert rf.lo is None and rf.hi == "20"

    def test_negated(self):
        p = parse_query("-doclen:[10 TO 20] x", _analyze)
        assert p.neg_range_filters and not p.range_filters

    def test_unsupported_field(self):
        with pytest.raises(ValueError, match="unsupported field"):
            parse_query("nosuch:[1 TO 2]", _analyze)

    def test_bad_numeric_bound(self):
        with pytest.raises(ValueError):
            parse_query("doclen:[x TO 2]", _analyze)

    def test_matches_semantics(self):
        (rf,) = parse_query("doclen:{10 TO 20]", _analyze).range_filters
        assert not rf.matches(10) and rf.matches(11) and rf.matches(20)
        assert not rf.matches(21) and not rf.matches(None)


QUERIES = [
    "doclen:[30 TO 90] read",
    "doclen:{30 TO 90} read",
    "doclen:[* TO 50]",
    "-doclen:[30 TO *] read",
    "lang:[go TO python] def",
    "path:[src/mod1 TO src/mod3} def",
    "doclen:[30 TO 90] AND read merge",
    'doclen:[10 TO 200] "def index"',
    "doclen:[30 TO 90] pars*",
]


@pytest.fixture(scope="module")
def ridx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ridx")
    corpus = generate_corpus(150, seed=11, mean_tokens=40)
    pq.write_table(corpus, str(d / "c.parquet"), row_group_size=32)
    cfg = IndexConfig(docs_per_range=64, block_size=16, store_positions=True)
    build_index(str(d / "c.parquet"), str(d / "idx"), config=cfg)
    ids = pa.array(range(corpus.num_rows), pa.int64())
    return str(d / "idx"), corpus.append_column("doc_id", ids)


class TestRangeRankIdentity:
    def test_vs_oracle(self, ridx):
        idx, corpus = ridx
        oracle = BruteForceBM25(corpus)
        eng = SearchEngine(idx)
        for q in QUERIES:
            got = eng.search(q, k=12, fl=["doc_id"])
            exp = oracle.search(q, k=12)
            assert got["doc_id"].to_pylist() == [d for d, _ in exp], q
            assert got["score"].to_pylist() == [s for _, s in exp], q

    def test_partitioned_falls_back_identically(self, ridx):
        idx, _ = ridx
        eng = SearchEngine(idx)
        for q in QUERIES[:4]:
            p = search_partitioned(idx, q, k=10)
            s = eng.search(q, k=10, fl=["doc_id"])
            assert p["doc_id"].to_pylist() == s["doc_id"].to_pylist(), q

    def test_doclen_is_token_count_not_chars(self, ridx):
        idx, corpus = ridx
        eng = SearchEngine(idx)
        t = eng.search("doclen:[40 TO 40]", k=200, fl=["doc_id", "doclen"])
        assert all(v == 40 for v in t["doclen"].to_pylist())

    def test_facet_with_range_filter(self, ridx):
        idx, corpus = ridx
        eng = SearchEngine(idx)
        buckets = dict(eng.facet("doclen:[* TO 50]", ["lang"])["lang"])
        oracle = BruteForceBM25(corpus)
        hits = {d for d, _ in oracle.search("doclen:[* TO 50]", k=10**9)}
        langs = corpus["lang"].to_pylist()
        for lang, cnt in buckets.items():
            assert cnt == sum(
                1 for i, l in enumerate(langs)
                if l == lang and corpus["doc_id"][i].as_py() in hits
            ), lang
