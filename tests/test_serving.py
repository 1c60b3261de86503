"""SearchService — the resident serving pool (pipelines/serving.py).

Results must be bit-identical to a local SearchEngine; the pool is
round-robin over persistent actors (the steady-state shape bench.py's
``dist_warm_qps`` row measures)."""

import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.config import IndexConfig
from solr_indexer_ray.pipelines.build import build_index
from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.pipelines.serving import SearchService
from solr_indexer_ray.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def serve_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("serveidx")
    corpus = generate_corpus(150, seed=13, mean_tokens=40)
    pq.write_table(corpus, str(d / "c.parquet"), row_group_size=32)
    build_index(str(d / "c.parquet"), str(d / "idx"),
                config=IndexConfig(docs_per_range=64, block_size=16,
                                   store_positions=True,
                                   store_bigrams=True))
    return str(d / "idx")


QUERIES = [
    "parse read", "def AND merge", 'lang:python sort^2', "-join stream",
    '"def read"', "pars*", "merg~1", "(read OR parse) AND sort",
    "doclen:[30 TO 200] read",
]


class TestSearchService:
    def test_identical_to_local_engine(self, serve_index):
        eng = SearchEngine(serve_index)
        with SearchService(serve_index, pool=3) as svc:
            got = svc.search_many(QUERIES, k=10, fl=["doc_id"])
            for q, t in zip(QUERIES, got):
                ref = eng.search(q, k=10, fl=["doc_id"])
                assert t["doc_id"].to_pylist() == \
                    ref["doc_id"].to_pylist(), q
                assert t["score"].to_pylist() == \
                    ref["score"].to_pylist(), q

    def test_single_query_and_kwargs(self, serve_index):
        eng = SearchEngine(serve_index)
        with SearchService(serve_index, pool=2) as svc:
            t = svc.search("parse read", k=5, fl=["doc_id"],
                           fq=["lang:python"])
            ref = eng.search("parse read", k=5, fl=["doc_id"],
                             fq=["lang:python"])
            assert t["doc_id"].to_pylist() == ref["doc_id"].to_pylist()
            assert t["score"].to_pylist() == ref["score"].to_pylist()

    def test_order_preserved_across_chunks(self, serve_index):
        # chunk=2 over 9 queries across 3 actors: reassembly must keep
        # input order
        with SearchService(serve_index, pool=3) as svc:
            got = svc.search_many(QUERIES, k=3, fl=["doc_id"], chunk=2)
            assert len(got) == len(QUERIES)
            eng = SearchEngine(serve_index)
            for q, t in zip(QUERIES, got):
                assert t["doc_id"].to_pylist() == eng.search(
                    q, k=3, fl=["doc_id"]
                )["doc_id"].to_pylist(), q

    def test_closed_service_raises(self, serve_index):
        svc = SearchService(serve_index, pool=1)
        svc.close()
        with pytest.raises(RuntimeError, match="closed"):
            svc.search("read")
        svc.close()  # idempotent
