"""Learning-to-rank rescoring (Solr LTR LinearModel analogue):
weighted feature model over the top-N window, tail preserved."""

import numpy as np
import pytest

from solr_indexer_ray.pipelines.search import SearchEngine

MODEL = {
    "type": "linear",
    "features": [
        {"name": "bm25", "type": "originalScore"},
        {"name": "decay", "type": "function",
         "expr": "recip(doclen,1,1000,1000)"},
        {"name": "is_py", "type": "query", "q": "lang:python"},
        {"name": "aux", "type": "queryScore", "q": "merge"},
        {"name": "bias", "type": "value", "value": 0.25},
    ],
    "weights": {"bm25": 1.0, "decay": 3.0, "is_py": 0.5,
                "aux": 2.0, "bias": 1.0},
}


class TestLtr:
    def test_vs_brute_force(self, built_index):
        idx, _ = built_index
        eng = SearchEngine(idx)
        q, n = "def read", 25
        got = eng.ltr_search(q, MODEL, k=n, rerank_docs=n)
        main = eng.search(q, k=n, fl=["doc_id"])
        ids = main["doc_id"].to_pylist()
        ms = dict(zip(ids, main["score"].to_pylist()))
        aux = eng.search("merge", k=10**6, fl=["doc_id"])
        am = dict(zip(aux["doc_id"].to_pylist(),
                      aux["score"].to_pylist()))
        pyset = set(eng.match_ids("lang:python").tolist())
        dl = eng.func_column("doclen")
        exp = []
        for d in ids:
            s = (1.0 * ms[d]
                 + 3.0 * (1000.0 / (dl[d] + 1000.0))
                 + 0.5 * (1.0 if d in pyset else 0.0)
                 + 2.0 * am.get(d, 0.0)
                 + 1.0 * 0.25)
            exp.append((d, s))
        exp.sort(key=lambda t: (-t[1], t[0]))
        assert got["doc_id"].to_pylist() == [d for d, _ in exp]
        for g, (_, e) in zip(got["score"].to_pylist(), exp):
            assert g == pytest.approx(e, rel=1e-12)

    def test_original_score_identity(self, built_index):
        idx, _ = built_index
        eng = SearchEngine(idx)
        model = {"type": "linear",
                 "features": [{"name": "s", "type": "originalScore"}],
                 "weights": {"s": 1.0}}
        got = eng.ltr_search("def read", model, k=10, rerank_docs=500)
        base = eng.search("def read", k=10, fl=got.column_names[:-1])
        assert got["doc_id"].to_pylist() == base["doc_id"].to_pylist()
        assert got["score"].to_pylist() == pytest.approx(
            base["score"].to_pylist()
        )

    def test_tail_preserved(self, built_index):
        idx, _ = built_index
        eng = SearchEngine(idx)
        base = eng.search("def read", k=20, fl=["doc_id"])
        got = eng.ltr_search("def read", MODEL, k=20, rerank_docs=5)
        assert (got["doc_id"].to_pylist()[5:]
                == base["doc_id"].to_pylist()[5:])
        assert (got["score"].to_pylist()[5:]
                == base["score"].to_pylist()[5:])

    def test_round_scores(self, built_index):
        idx, _ = built_index
        t = SearchEngine(idx).ltr_search("def read", MODEL, k=10,
                                         rerank_docs=10, round_scores=4)
        for s in t["score"].to_pylist():
            assert round(s, 4) == pytest.approx(s, abs=1e-9)

    def test_model_validation(self, built_index):
        idx, _ = built_index
        eng = SearchEngine(idx)
        with pytest.raises(ValueError, match="unknown LTR model type"):
            eng.ltr_search("def", {"type": "lambdamart",
                                   "features": [], "weights": {}})
        with pytest.raises(ValueError, match="no weight"):
            eng.ltr_search("def", {
                "features": [{"name": "x", "type": "originalScore"}],
                "weights": {}})
        with pytest.raises(ValueError, match="unknown LTR feature"):
            eng.ltr_search("def", {
                "features": [{"name": "x", "type": "nope"}],
                "weights": {"x": 1.0}})

    def test_fq_and_start(self, built_index):
        """ADVICE r2: --ltr-model used to silently drop fq/start.  fq
        filters the main match set BEFORE the rescoring window (same as
        rerank_search); start pages the rescored ranking."""
        idx, _ = built_index
        eng = SearchEngine(idx)
        q, n = "def read", 25
        got = eng.ltr_search(q, MODEL, k=n, rerank_docs=n,
                             fq=["lang:python"])
        allowed = set(eng.match_ids("lang:python").tolist())
        ids = got["doc_id"].to_pylist()
        assert ids and set(ids) <= allowed
        # identical to rescoring the fq-filtered main ranking by hand
        main = eng.search(q, k=n, fl=["doc_id"], fq=["lang:python"])
        assert set(ids) <= set(main["doc_id"].to_pylist())
        # start paging: rows [5, 10) of the start=0 ranking
        full = eng.ltr_search(q, MODEL, k=10, rerank_docs=n)
        page = eng.ltr_search(q, MODEL, k=5, rerank_docs=n, start=5)
        assert (page["doc_id"].to_pylist()
                == full["doc_id"].to_pylist()[5:10])
        with pytest.raises(ValueError, match="start"):
            eng.ltr_search(q, MODEL, k=5, start=-1)


TREE_MODEL = {
    "type": "trees",
    "features": [
        {"name": "bm25", "type": "originalScore"},
        {"name": "len", "type": "function", "expr": "doclen"},
        {"name": "is_py", "type": "query", "q": "lang:python"},
    ],
    "trees": [
        {"weight": 2.0, "root": {
            "feature": "len", "threshold": 60,
            "left": {"value": 1.0},
            "right": {"feature": "is_py", "threshold": 0.5,
                      "left": {"value": 0.2}, "right": {"value": 0.7}},
        }},
        {"weight": 1.0, "root": {
            "feature": "bm25", "threshold": 1.0,
            "left": {"value": 0.0}, "right": {"value": 3.0},
        }},
    ],
}


class TestLtrTrees:
    """Solr MultipleAdditiveTreesModel (lambdaMART ensemble format):
    vectorized tree evaluation vs a per-doc Python reference."""

    @staticmethod
    def _eval_ref(node, feats):
        while "value" not in node:
            node = (node["left"]
                    if feats[node["feature"]] <= float(node["threshold"])
                    else node["right"])
        return float(node["value"])

    def test_vs_scalar_reference(self, built_index):
        idx, _ = built_index
        eng = SearchEngine(idx)
        q, n = "def read", 30
        got = eng.ltr_search(q, TREE_MODEL, k=n, rerank_docs=n)
        main = eng.search(q, k=n, fl=["doc_id", "doclen", "lang"])
        py = set(eng.match_ids("lang:python").tolist())
        exp = []
        for did, s, dl, lang in zip(main["doc_id"].to_pylist(),
                                    main["score"].to_pylist(),
                                    main["doclen"].to_pylist(),
                                    main["lang"].to_pylist()):
            feats = {"bm25": s, "len": float(dl),
                     "is_py": 1.0 if did in py else 0.0}
            total = sum(
                t["weight"] * self._eval_ref(t["root"], feats)
                for t in TREE_MODEL["trees"]
            )
            exp.append((did, total))
        exp.sort(key=lambda p: (-p[1], p[0]))
        assert got["doc_id"].to_pylist() == [d for d, _ in exp][:n]
        assert got["score"].to_pylist() == pytest.approx(
            [s for _, s in exp][:n])

    def test_validation(self, built_index):
        idx, _ = built_index
        eng = SearchEngine(idx)
        with pytest.raises(ValueError, match="trees list"):
            eng.ltr_search("def", {"type": "trees",
                                   "features": TREE_MODEL["features"]})
        with pytest.raises(ValueError, match="undeclared feature"):
            eng.ltr_search("def", {
                "type": "trees",
                "features": [{"name": "bm25", "type": "originalScore"}],
                "trees": [{"root": {"feature": "nope", "threshold": 1,
                                    "left": {"value": 0},
                                    "right": {"value": 1}}}]})
        with pytest.raises(ValueError, match="missing 'left'"):
            eng.ltr_search("def", {
                "type": "trees",
                "features": [{"name": "bm25", "type": "originalScore"}],
                "trees": [{"root": {"feature": "bm25", "threshold": 1,
                                    "right": {"value": 1}}}]})
        # linear models still demand weights
        with pytest.raises(ValueError, match="no weight"):
            eng.ltr_search("def", {
                "features": [{"name": "bm25", "type": "originalScore"}]})
