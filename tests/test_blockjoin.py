"""Block-join query parsers ({!parent}/{!child}) over flat rows with an
explicit child->parent reference column — the reference's own
parent/child shape (related_dataset_id + post-pass semi-join)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.config import IndexConfig
from solr_indexer_ray.pipelines.build import build_index
from solr_indexer_ray.pipelines.oracle import BruteForceBM25
from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def bjidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("bjidx")
    corpus = generate_corpus(150, seed=31, mean_tokens=40)
    n = corpus.num_rows
    # every 5th doc is a parent; children reference the preceding parent
    ptype = ["parent" if i % 5 == 0 else "child" for i in range(n)]
    nodekey = [f"n{i}" for i in range(n)]
    pref = [None if i % 5 == 0 else f"n{(i // 5) * 5}" for i in range(n)]
    corpus = corpus.append_column("ptype", pa.array(ptype, pa.string()))
    corpus = corpus.append_column("nodekey",
                                  pa.array(nodekey, pa.string()))
    corpus = corpus.append_column("pref", pa.array(pref, pa.string()))
    pq.write_table(corpus, str(d / "c.parquet"), row_group_size=32)
    build_index(str(d / "c.parquet"), str(d / "idx"),
                config=IndexConfig(
                    docs_per_range=64,
                    extra_stored=("ptype", "nodekey", "pref"),
                ))
    ids = pa.array(range(n), pa.int64())
    return str(d / "idx"), corpus.append_column("doc_id", ids)


def _matches(corpus, oracle, q):
    return {d for d, _ in oracle.search(q, k=10**9)}


class TestBlockJoin:
    @pytest.mark.parametrize("childq", ["merge", "def read", "pars*"])
    def test_parent_of_matching_children(self, bjidx, childq):
        idx, corpus = bjidx
        eng = SearchEngine(idx)
        got = eng.match_ids(
            f"{{!parent which='ptype:parent' key=nodekey ref=pref}}"
            f"{childq}"
        ).tolist()
        oracle = BruteForceBM25(corpus)
        child_hits = _matches(corpus, oracle, childq)
        prefs = corpus["pref"].to_pylist()
        keys = corpus["nodekey"].to_pylist()
        ptypes = corpus["ptype"].to_pylist()
        wanted_keys = {prefs[d] for d in child_hits
                       if prefs[d] is not None}
        exp = sorted(
            i for i in range(corpus.num_rows)
            if ptypes[i] == "parent" and keys[i] in wanted_keys
        )
        assert got == exp

    @pytest.mark.parametrize("parentq", ["merge", "def value"])
    def test_children_of_matching_parents(self, bjidx, parentq):
        idx, corpus = bjidx
        eng = SearchEngine(idx)
        got = eng.match_ids(
            f"{{!child of='ptype:parent' key=nodekey ref=pref}}"
            f"{parentq}"
        ).tolist()
        oracle = BruteForceBM25(corpus)
        phits = _matches(corpus, oracle, parentq)
        ptypes = corpus["ptype"].to_pylist()
        keys = corpus["nodekey"].to_pylist()
        prefs = corpus["pref"].to_pylist()
        pkeys = {keys[d] for d in phits if ptypes[d] == "parent"}
        exp = sorted(
            i for i in range(corpus.num_rows)
            if ptypes[i] == "child" and prefs[i] in pkeys
        )
        assert got == exp

    def test_as_fq(self, bjidx):
        idx, _ = bjidx
        eng = SearchEngine(idx)
        bj = "{!parent which='ptype:parent' key=nodekey ref=pref}merge"
        allowed = set(eng.match_ids(bj).tolist())
        t = eng.search("def read", k=100, fl=["doc_id"], fq=[bj])
        assert set(t["doc_id"].to_pylist()) <= allowed

    def test_errors(self, bjidx):
        idx, _ = bjidx
        eng = SearchEngine(idx)
        with pytest.raises(ValueError, match="requires key="):
            eng.match_ids("{!parent which='ptype:parent'}merge")
        with pytest.raises(ValueError, match="requires which="):
            eng.match_ids("{!parent key=nodekey ref=pref}merge")

    def test_main_query_constant_score(self, bjidx):
        """{!parent}/{!child} as the MAIN query routes through the
        constant-score directive branch of SearchEngine.search()
        (ADVICE r2: previously parsed as literal tokens)."""
        idx, _ = bjidx
        eng = SearchEngine(idx)
        bj = "{!parent which='ptype:parent' key=nodekey ref=pref}merge"
        exp = eng.match_ids(bj).tolist()
        t = eng.search(bj, k=10)
        assert t["doc_id"].to_pylist() == exp[:10]
        assert set(t["score"].to_pylist()) <= {1.0}
        # start paging + fq compose
        t2 = eng.search(bj, k=5, start=5)
        assert t2["doc_id"].to_pylist() == exp[5:10]
        t3 = eng.search(bj, k=100, fq=["lang:python"])
        allowed = set(eng.match_ids("lang:python").tolist())
        assert set(t3["doc_id"].to_pylist()) == set(exp) & allowed
        # rank params are rejected, same as the other directives
        with pytest.raises(ValueError, match="constant-score"):
            eng.search(bj, k=5, sort="doclen desc")

    def test_main_query_child_side(self, bjidx):
        idx, _ = bjidx
        eng = SearchEngine(idx)
        bj = "{!child of='ptype:parent' key=nodekey ref=pref}merge"
        exp = eng.match_ids(bj).tolist()
        t = eng.search(bj, k=10**6)
        assert t["doc_id"].to_pylist() == exp
