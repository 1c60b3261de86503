"""Stats-component percentiles (Solr stats.field {!percentiles=...}):
exact linear-interpolated quantiles over the match set, single-engine
and histogram-partial distributed."""

import numpy as np
import pytest

from solr_indexer_ray.pipelines.search import (
    SearchEngine,
    _weighted_percentiles,
    stats_partitioned,
)

PS = [5.0, 25.0, 50.0, 75.0, 95.0, 99.0]


class TestWeightedPercentiles:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_numpy_linear(self, seed):
        rng = np.random.RandomState(seed)
        vals = rng.randint(0, 40, size=200)
        v, c = np.unique(vals, return_counts=True)
        got = _weighted_percentiles(v.astype(float), c, PS)
        exp = np.percentile(vals, PS)  # default 'linear'
        assert got == pytest.approx(exp.tolist(), rel=1e-12)

    def test_empty(self):
        assert _weighted_percentiles(np.array([]), np.array([]),
                                     [50]) == [None]

    def test_single_value(self):
        got = _weighted_percentiles(np.array([7.0]), np.array([3]),
                                    [0, 50, 100])
        assert got == [7.0, 7.0, 7.0]


class TestFieldStatsPercentiles:
    def _match_doclens(self, engine, q):
        ids = engine.match_ids(q)
        t = engine._docs_ds.to_table(columns=["doc_id", "doclen"])
        m = dict(zip(t["doc_id"].to_pylist(), t["doclen"].to_pylist()))
        return np.array([m[i] for i in ids], dtype=float)

    @pytest.mark.parametrize("q", ["def read", "*:*", "lang:python def"])
    def test_vs_numpy(self, built_index, q):
        idx, _ = built_index
        engine = SearchEngine(idx)
        out = engine.field_stats(q, "doclen", percentiles=PS)
        vals = self._match_doclens(engine, q)
        exp = np.percentile(vals, PS)
        got = [out["percentiles"][str(p)] for p in PS]
        assert got == pytest.approx(exp.tolist(), rel=1e-12)
        # base stats unchanged by the percentiles request
        base = engine.field_stats(q, "doclen")
        assert {k: v for k, v in out.items() if k != "percentiles"} == base

    @pytest.mark.parametrize("q", ["def read", "value -return", "pars*"])
    def test_distributed_identity(self, built_index, q):
        idx, _ = built_index
        single = SearchEngine(idx).field_stats(q, "doclen",
                                               percentiles=PS)
        dist = stats_partitioned(idx, q, "doclen", percentiles=PS)
        assert dist == single

    def test_no_match(self, built_index):
        idx, _ = built_index
        out = SearchEngine(idx).field_stats("zzznotaterm", "doclen",
                                            percentiles=[50])
        assert out["count"] == 0 and out["percentiles"]["50"] is None
        dist = stats_partitioned(idx, "zzznotaterm", "doclen",
                                 percentiles=[50])
        assert dist["count"] == 0 and dist["percentiles"]["50"] is None

    def test_non_numeric_rejected(self, built_index):
        idx, _ = built_index
        with pytest.raises(ValueError, match="numeric"):
            SearchEngine(idx).field_stats("def", "lang",
                                          percentiles=[50])
