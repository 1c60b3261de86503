"""Significant terms (Solr SignificantTermsQParser analogue, JLH
scoring): foreground-vs-background term significance over a match set."""

import numpy as np
import pytest

from solr_indexer_ray.pipelines.search import SearchEngine


def brute_significant(corpus_table, registry, match_ids, limit, min_df,
                      max_df_frac):
    docs = corpus_table["content"].to_pylist()
    langs = corpus_table["lang"].to_pylist()
    n = len(docs)
    term_docs: dict = {}
    for i, (text, lang) in enumerate(zip(docs, langs)):
        for t in set(registry.tokenize(text or "", lang)):
            term_docs.setdefault(t, set()).add(i)
    fg_ids = set(match_ids)
    fg_size, bg_size = len(fg_ids), n
    rows = []
    for t, ds_ in term_docs.items():
        bg = len(ds_)
        if bg < min_df or bg > max_df_frac * bg_size:
            continue
        fg = len(ds_ & fg_ids)
        if fg == 0:
            continue
        fg_pct, bg_pct = fg / fg_size, bg / bg_size
        score = ((fg_pct - bg_pct) * (fg_pct / bg_pct)
                 if fg_pct > bg_pct else 0.0)
        rows.append((t, fg, bg, score))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:limit]


class TestSignificantTerms:
    @pytest.mark.parametrize("q,min_df,max_frac", [
        ("lang:python def", 3, 0.5),
        ("merge", 2, 0.9),
        ("def read", 5, 0.4),
    ])
    def test_vs_brute_force(self, built_index, small_corpus, q, min_df,
                            max_frac):
        idx, _ = built_index
        engine = SearchEngine(idx)
        got = engine.significant_terms(q, limit=15, min_doc_freq=min_df,
                                       max_doc_freq=max_frac)
        exp = brute_significant(
            small_corpus, engine.registry,
            engine.match_ids(q).tolist(), 15, min_df, max_frac,
        )
        got_rows = list(zip(got["term"].to_pylist(),
                            got["fg"].to_pylist(),
                            got["bg"].to_pylist()))
        assert got_rows == [(t, fg, bg) for t, fg, bg, _ in exp]
        for g, (_, _, _, s) in zip(got["score"].to_pylist(), exp):
            assert g == pytest.approx(s, rel=1e-12)

    def test_bounds_respected(self, built_index):
        idx, _ = built_index
        engine = SearchEngine(idx)
        t = engine.significant_terms("def read", limit=50,
                                     min_doc_freq=10, max_doc_freq=0.2)
        n = engine.n_docs
        for bg in t["bg"].to_pylist():
            assert 10 <= bg <= 0.2 * n

    def test_no_match_empty(self, built_index):
        idx, _ = built_index
        t = SearchEngine(idx).significant_terms("zzznotaterm")
        assert t.num_rows == 0

    def test_foreground_enrichment_found(self, built_index):
        # terms significantly enriched in python files should rank a
        # python-ish token above a uniform one
        idx, _ = built_index
        t = SearchEngine(idx).significant_terms("lang:python def",
                                                limit=30,
                                                min_doc_freq=2)
        assert t.num_rows > 0
        scores = t["score"].to_pylist()
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)
