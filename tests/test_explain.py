"""Solr debugQuery analogue (`SearchEngine.explain`) + `facet.query`."""

import numpy as np
import pytest

from solr_indexer_ray.pipelines.search import SearchEngine


class TestExplain:
    def test_score_exact_and_clauses_sum(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        q = "parse read^2 merge"
        t = e.search(q, k=5, fl=["doc_id"])
        for d, s in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
            ex = e.explain(q, d)
            assert ex["matches"]
            assert ex["score"] == s          # exact: same accumulator
            assert sum(c for _, c in ex["clauses"]) == pytest.approx(
                s, rel=1e-12
            )

    def test_boost_shows_in_contribution(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        t = e.search("read", k=1, fl=["doc_id"])
        d = t["doc_id"][0].as_py()
        plain = dict(e.explain("read", d)["clauses"])["term:read"]
        boosted = dict(e.explain("read^3", d)["clauses"])["term:read"]
        assert boosted == pytest.approx(3 * plain, rel=1e-12)

    def test_non_match_conjunctive(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        d = int(e.search("parse", k=1, fl=["doc_id"])["doc_id"][0].as_py())
        ex = e.explain("zzqqzz AND parse", d)
        assert not ex["matches"] and ex["score"] == 0.0
        # evidence kept: the matched clause still listed
        assert any(n == "term:parse" for n, _ in ex["clauses"])

    def test_excluded_doc(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        d = int(e.search("parse", k=1, fl=["doc_id"])["doc_id"][0].as_py())
        assert not e.explain("parse -parse", d)["matches"]

    def test_multiterm_clauses(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        q = "par* /me.ge/ w?ndow"
        t = e.search(q, k=1, fl=["doc_id"])
        assert t.num_rows
        d = t["doc_id"][0].as_py()
        ex = e.explain(q, d)
        kinds = {n.split(":")[0] for n, _ in ex["clauses"]}
        assert kinds <= {"prefix", "regex", "wildcard"} and kinds
        assert ex["score"] == t["score"][0].as_py()

    def test_grouped_raises(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        with pytest.raises(ValueError, match="flat"):
            e.explain("(a OR b) AND c", 0)


class TestFacetQuery:
    def test_counts_match_manual_intersection(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        subs = ["lang:python", "doclen:[40 TO 120]", "merge"]
        out = e.facet_query("parse", subs)
        base = set(e.match_ids("parse").tolist())
        for sub in subs:
            want = len(base & set(e.match_ids(sub).tolist()))
            assert out[sub] == want, sub

    def test_fq_restricts_base(self, built_index):
        index_dir, _ = built_index
        e = SearchEngine(index_dir)
        full = e.facet_query("parse", ["merge"])["merge"]
        restricted = e.facet_query("parse", ["merge"],
                                   fq=["lang:python"])["merge"]
        assert restricted <= full
