"""Solr streaming expressions compiled to Ray Data pipelines
(pipelines/streaming.py): parser, every expression type vs pandas
ground truth, and join/rollup shapes."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest

from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.pipelines.streaming import (
    Node,
    StreamExprError,
    compile_stream_expr,
    parse_stream_expr,
)


class TestParser:
    def test_nested_with_kwargs(self):
        n = parse_stream_expr(
            'top(search(docs, q="def read", fl="doc_id,lang"), '
            'n=5, sort="doc_id asc")'
        )
        assert n.name == "top"
        assert isinstance(n.args[0], Node)
        assert n.args[0].name == "search"
        assert n.args[0].args == ["docs"]
        assert n.args[0].kwargs == {"q": "def read", "fl": "doc_id,lang"}
        assert n.kwargs["n"] == 5.0
        assert n.kwargs["sort"] == "doc_id asc"

    def test_quoted_commas_and_escapes(self):
        n = parse_stream_expr('search(c, q="a, \\"b\\"", fl="doc_id")')
        assert n.kwargs["q"] == 'a, "b"'

    def test_metric_args(self):
        n = parse_stream_expr(
            'rollup(search(c, q="x", fl="lang"), over="lang", '
            "sum(doclen), count(*))"
        )
        metrics = n.args[1:]
        assert [m.name for m in metrics] == ["sum", "count"]
        assert metrics[0].args == ["doclen"]
        assert metrics[1].args == ["*"]

    @pytest.mark.parametrize("bad", [
        "nope", "f(", 'f(a=)', 'top(search(c, q="x", fl="y") extra',
    ])
    def test_errors(self, bad):
        with pytest.raises(StreamExprError):
            parse_stream_expr(bad)


@pytest.fixture(scope="module")
def sidx(built_index):
    return built_index[0]


def _docs_frame(idx, cols):
    eng = SearchEngine(idx)
    return eng._docs_ds.to_table(columns=cols).to_pandas()


class TestCompile:
    def test_search_full_export_streams_match_set(self, sidx):
        eng = SearchEngine(sidx)
        ds = compile_stream_expr(
            'search(docs, q="def read", fl="doc_id,lang")', sidx
        )
        rows = ds.take_all()
        assert sorted(r["doc_id"] for r in rows) == sorted(
            eng.match_ids("def read").tolist()
        )
        assert set(rows[0]) == {"doc_id", "lang"}

    def test_search_rows_and_score(self, sidx):
        eng = SearchEngine(sidx)
        ds = compile_stream_expr(
            'search(docs, q="def read", fl="doc_id,score", rows=5)', sidx
        )
        rows = ds.take_all()
        top = eng.search("def read", k=5, fl=["doc_id"])
        assert [r["doc_id"] for r in rows] == top["doc_id"].to_pylist()
        assert [r["score"] for r in rows] == top["score"].to_pylist()

    def test_select_rename(self, sidx):
        ds = compile_stream_expr(
            'select(search(docs, q="def read", fl="doc_id,doclen"), '
            '"doc_id", "doclen as len")', sidx
        )
        rows = ds.take_all()
        assert set(rows[0]) == {"doc_id", "len"}

    def test_top_sorted(self, sidx):
        eng = SearchEngine(sidx)
        ds = compile_stream_expr(
            'top(search(docs, q="def read", fl="doc_id,doclen"), '
            'n=7, sort="doclen desc, doc_id asc")', sidx
        )
        rows = ds.take_all()
        ids = eng.match_ids("def read")
        df = _docs_frame(sidx, ["doc_id", "doclen"])
        df = df[df.doc_id.isin(ids)].sort_values(
            ["doclen", "doc_id"], ascending=[False, True]
        ).head(7)
        assert [r["doc_id"] for r in rows] == df["doc_id"].tolist()

    def test_unique_keeps_min_doc(self, sidx):
        ds = compile_stream_expr(
            'unique(search(docs, q="def read", fl="doc_id,lang"), '
            'over="lang")', sidx
        )
        rows = ds.take_all()
        eng = SearchEngine(sidx)
        ids = set(eng.match_ids("def read").tolist())
        df = _docs_frame(sidx, ["doc_id", "lang"])
        df = df[df.doc_id.isin(ids)]
        exp = df.groupby("lang", dropna=False)["doc_id"].min()
        got = {r["lang"]: r["doc_id"] for r in rows}
        assert got == exp.to_dict()

    def test_rollup_vs_pandas(self, sidx):
        ds = compile_stream_expr(
            'rollup(search(docs, q="def read", fl="lang,doclen,doc_id"),'
            ' over="lang", sum(doclen), count(*), avg(doclen))', sidx
        )
        rows = {r["lang"]: r for r in ds.take_all()}
        eng = SearchEngine(sidx)
        ids = set(eng.match_ids("def read").tolist())
        df = _docs_frame(sidx, ["doc_id", "lang", "doclen"])
        df = df[df.doc_id.isin(ids)]
        for lang, g in df.groupby("lang"):
            assert rows[lang]["sum(doclen)"] == g.doclen.sum()
            assert rows[lang]["count(*)"] == len(g)
            assert rows[lang]["avg(doclen)"] == pytest.approx(
                g.doclen.mean()
            )

    def test_inner_join(self, sidx):
        ds = compile_stream_expr(
            'innerJoin('
            ' search(docs, q="def read", fl="doc_id,lang"),'
            ' search(docs, q="merge", fl="doc_id,doclen"),'
            ' on="doc_id")', sidx, num_partitions=2
        )
        rows = ds.take_all()
        eng = SearchEngine(sidx)
        both = (set(eng.match_ids("def read").tolist())
                & set(eng.match_ids("merge").tolist()))
        assert sorted(r["doc_id"] for r in rows) == sorted(both)
        assert {"lang", "doclen"} <= set(rows[0]) if rows else True

    def test_left_outer_join(self, sidx):
        ds = compile_stream_expr(
            'leftOuterJoin('
            ' search(docs, q="def read", fl="doc_id,lang"),'
            ' search(docs, q="merge", fl="doc_id,doclen"),'
            ' on="doc_id")', sidx, num_partitions=2
        )
        rows = ds.take_all()
        eng = SearchEngine(sidx)
        left = set(eng.match_ids("def read").tolist())
        right = set(eng.match_ids("merge").tolist())
        assert sorted(r["doc_id"] for r in rows) == sorted(left)
        for r in rows:
            if r["doc_id"] not in right:
                assert r["doclen"] is None or (
                    isinstance(r["doclen"], float)
                    and np.isnan(r["doclen"])
                )

    def test_merge_union_sort(self, sidx):
        ds = compile_stream_expr(
            'merge('
            ' search(docs, q="lang:go def", fl="doc_id"),'
            ' search(docs, q="lang:c def", fl="doc_id"),'
            ' on="doc_id asc")', sidx
        )
        rows = [r["doc_id"] for r in ds.take_all()]
        eng = SearchEngine(sidx)
        exp = sorted(eng.match_ids("lang:go def").tolist()
                     + eng.match_ids("lang:c def").tolist())
        assert rows == exp

    def test_intersect_and_complement(self, sidx):
        eng = SearchEngine(sidx)
        left = set(eng.match_ids("def read").tolist())
        right = set(eng.match_ids("merge").tolist())
        inter = compile_stream_expr(
            'intersect(search(docs, q="def read", fl="doc_id,lang"), '
            'search(docs, q="merge", fl="doc_id"), on="doc_id")', sidx
        ).take_all()
        assert sorted(r["doc_id"] for r in inter) == sorted(left & right)
        comp = compile_stream_expr(
            'complement(search(docs, q="def read", fl="doc_id"), '
            'search(docs, q="merge", fl="doc_id"), on="doc_id")', sidx
        ).take_all()
        assert sorted(r["doc_id"] for r in comp) == sorted(left - right)

    def test_fetch_enriches(self, sidx):
        rows = compile_stream_expr(
            'fetch(top(search(docs, q="def read", fl="doc_id,score"), '
            'n=5, sort="score desc, doc_id asc"), docs, on="doc_id", '
            'fl="lang,doclen")', sidx, num_partitions=2
        ).take_all()
        assert len(rows) == 5
        df = _docs_frame(sidx, ["doc_id", "lang", "doclen"])
        m = df.set_index("doc_id")
        for r in rows:
            assert r["lang"] == m.loc[r["doc_id"], "lang"]
            assert r["doclen"] == m.loc[r["doc_id"], "doclen"]

    def test_stats_scalar_tuple(self, sidx):
        rows = compile_stream_expr(
            'stats(docs, q="def read", sum(doclen), count(*), '
            "avg(doclen))", sidx
        ).take_all()
        assert len(rows) == 1
        eng = SearchEngine(sidx)
        ids = set(eng.match_ids("def read").tolist())
        df = _docs_frame(sidx, ["doc_id", "doclen"])
        df = df[df.doc_id.isin(ids)]
        assert rows[0]["sum(doclen)"] == df.doclen.sum()
        assert rows[0]["count(*)"] == len(df)
        assert rows[0]["avg(doclen)"] == pytest.approx(df.doclen.mean())

    def test_facet_stream(self, sidx):
        rows = compile_stream_expr(
            'facet(docs, q="def read", buckets="lang", '
            'bucketSorts="count(*) desc, lang asc", bucketSizeLimit=3, '
            "count(*), sum(doclen))", sidx
        ).take_all()
        assert len(rows) <= 3
        eng = SearchEngine(sidx)
        ids = set(eng.match_ids("def read").tolist())
        df = _docs_frame(sidx, ["doc_id", "lang", "doclen"])
        df = df[df.doc_id.isin(ids)]
        counts = df.groupby("lang").size().sort_values(ascending=False)
        assert [r["count(*)"] for r in rows] == counts.head(3).tolist()
        for r in rows:
            g = df[df.lang == r["lang"]]
            assert r["sum(doclen)"] == g.doclen.sum()

    def test_significant_terms_stream(self, sidx):
        rows = compile_stream_expr(
            'significantTerms(docs, q="lang:python def", limit=5, '
            "minDocFreq=2)", sidx
        ).take_all()
        eng = SearchEngine(sidx)
        t = eng.significant_terms("lang:python def", limit=5,
                                  min_doc_freq=2)
        assert [r["term"] for r in rows] == t["term"].to_pylist()
        assert [r["score"] for r in rows] == t["score"].to_pylist()

    def test_nodes_one_hop(self, sidx):
        rows = compile_stream_expr(
            'nodes(docs, search(docs, q="merge", fl="doc_id,repo"), '
            'walk="repo->repo", gather="lang")', sidx
        ).take_all()
        eng = SearchEngine(sidx)
        ids = set(eng.match_ids("merge").tolist())
        df = _docs_frame(sidx, ["doc_id", "repo", "lang"])
        repos = set(df[df.doc_id.isin(ids)].repo)
        hop = df[df.repo.isin(repos)]
        exp = hop.groupby("lang").size().to_dict()
        assert {r["node"]: r["count(*)"] for r in rows} == exp

    def test_nodes_two_hops_nested(self, sidx):
        # langs reachable from repos reachable from the match's langs
        rows = compile_stream_expr(
            'nodes(docs, nodes(docs, '
            'search(docs, q="merge", fl="doc_id,lang"), '
            'walk="lang->lang", gather="repo"), '
            'walk="node->repo", gather="lang")', sidx
        ).take_all()
        assert rows and all("node" in r for r in rows)

    def test_collection_map_and_errors(self, sidx):
        with pytest.raises(StreamExprError, match="unknown collection"):
            compile_stream_expr(
                'search(nope, q="x", fl="doc_id")', {"docs": sidx}
            )
        with pytest.raises(StreamExprError, match="unsupported"):
            compile_stream_expr('frobnicate(x)', sidx)
        with pytest.raises(StreamExprError, match="requires q="):
            compile_stream_expr('search(docs, fl="doc_id")', sidx)


def test_timeseries_stream(sidx, tmp_path_factory):
    """timeseries() buckets equal range_facet's over the same field."""
    from datetime import datetime, timedelta

    import pyarrow.parquet as pq

    from solr_indexer_ray.config import IndexConfig
    from solr_indexer_ray.pipelines.build import build_index
    from solr_indexer_ray.sources.corpus import generate_corpus

    corpus = generate_corpus(100, seed=5, mean_tokens=30)
    base = datetime(2024, 6, 1)
    corpus = corpus.append_column(
        "mtime",
        pa.array([base + timedelta(hours=2 * i)
                  for i in range(corpus.num_rows)], pa.timestamp("us")),
    )
    d = tmp_path_factory.mktemp("tsidx")
    pq.write_table(corpus, str(d / "c.parquet"), row_group_size=32)
    build_index(str(d / "c.parquet"), str(d / "idx"),
                config=IndexConfig(concurrency=1,
                                   extra_stored=("mtime",)))
    rows = compile_stream_expr(
        'timeseries(docs, q="def", field="mtime", '
        'start="2024-06-01T00:00:00Z", end="2024-06-04T00:00:00Z", '
        'gap="+1DAY")', str(d / "idx")
    ).take_all()
    exp = SearchEngine(str(d / "idx")).range_facet(
        "def", "mtime", "2024-06-01T00:00:00Z", "2024-06-04T00:00:00Z",
        "+1DAY")
    assert [(r["bucket"], r["count(*)"]) for r in rows] == exp["buckets"]


def test_scored_full_export_streams(sidx):
    """Scored full exports stream (broadcast dense scores) and match the
    ranked engine's (doc_id -> score) map exactly."""
    eng = SearchEngine(sidx)
    rows = compile_stream_expr(
        'search(docs, q="def read", fl="doc_id,score,lang")', sidx
    ).take_all()
    full = eng.search("def read", k=eng.doc_space, fl=["doc_id"])
    exp = dict(zip(full["doc_id"].to_pylist(),
                   full["score"].to_pylist()))
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got == exp
    assert all(set(r) == {"doc_id", "score", "lang"} for r in rows)


def test_cross_collection_join(built_index, tmp_path_factory):
    """One expression joins across TWO different indexes via the
    collections mapping (Solr-style multi-collection streaming)."""
    import pyarrow.parquet as pq

    from solr_indexer_ray.config import IndexConfig
    from solr_indexer_ray.pipelines.build import build_index
    from solr_indexer_ray.sources.corpus import generate_corpus

    idx_a = built_index[0]
    d = tmp_path_factory.mktemp("xcoll")
    corpus_b = generate_corpus(60, seed=51, mean_tokens=30,
                               with_edge_rows=False)
    pq.write_table(corpus_b, str(d / "b.parquet"), row_group_size=32)
    build_index(str(d / "b.parquet"), str(d / "idx_b"),
                config=IndexConfig(concurrency=1))
    rows = compile_stream_expr(
        'innerJoin(search(a, q="def", fl="doc_id,lang"), '
        'search(b, q="def", fl="doc_id,doclen"), on="doc_id")',
        {"a": idx_a, "b": str(d / "idx_b")}, num_partitions=2,
    ).take_all()
    ea, eb = SearchEngine(idx_a), SearchEngine(str(d / "idx_b"))
    exp = (set(ea.match_ids("def").tolist())
           & set(eb.match_ids("def").tolist()))
    assert sorted(r["doc_id"] for r in rows) == sorted(exp)
