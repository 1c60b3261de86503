"""Hybrid BM25 + embedding-cosine retrieval with RRF / weighted fusion
(`stages/hybrid.py`).  Beyond-reference training-data operator; the
reference delegates relevance to a single Solr BM25 ranking
(/root/reference/solrindexer/search.py:125-140)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.stages.hybrid import (
    FUSE_N,
    RRF_K,
    _ranked_ids,
    _round_half_away,
    hybrid_search,
)

DIM = 16


@pytest.fixture(scope="module")
def emb_ds(built_index):
    """Deterministic embeddings row-aligned with the built index docs."""
    index_dir, stats = built_index
    n = SearchEngine(index_dir).n_docs
    rng = np.random.default_rng(42)
    mat = rng.standard_normal((n, DIM)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [mat[i].tolist() for i in range(n)],
                pa.list_(pa.float32()),
            ),
        }
    )
    return ray.data.from_arrow(tbl), mat


def _queries(mat, texts):
    return [(qi, q, mat[qi].astype(np.float64)) for qi, q in enumerate(texts)]


def _brute_ranks(engine, emb_mat, text_q, qvec, fuse_n=FUSE_N):
    """Independent rank computation: full BM25 via the engine, cosine via
    a direct numpy matmul — the reference for the fusion arithmetic."""
    t = engine.search(text_q, k=engine.n_docs, fl=["doc_id"])
    t_ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    t_s = _round_half_away(
        np.asarray(t["score"].to_pylist(), dtype=np.float64), 4
    )
    unit = emb_mat.astype(np.float64)
    unit = unit / np.linalg.norm(unit, axis=1)[:, None]
    qv = qvec / np.linalg.norm(qvec)
    sims = _round_half_away(unit @ qv, 4)
    v_ids = np.arange(len(sims), dtype=np.int64)
    return (
        _ranked_ids(t_ids, t_s, fuse_n),
        _ranked_ids(v_ids, sims, fuse_n),
    )


class TestRRF:
    def test_fused_scores_match_independent_ranks(self, built_index, emb_ds):
        index_dir, _ = built_index
        ds, mat = emb_ds
        engine = SearchEngine(index_dir)
        queries = _queries(mat, ["parse merge", "read window"])
        out = hybrid_search(index_dir, ds, queries, k=10, exact_ranks=True)
        assert out.num_rows == 20
        for qi, (_, text_q, qvec) in enumerate(queries):
            tr, vr = _brute_ranks(engine, mat, text_q, qvec)
            got = {
                r["doc_id"]: r["rrf_r"]
                for r in out.to_pylist()
                if r["query_id"] == qi
            }
            for d, s in got.items():
                want = 0.0
                if d in tr:
                    want += 1.0 / (RRF_K + tr[d])
                if d in vr:
                    want += 1.0 / (RRF_K + vr[d])
                assert s == round(want, 6), (qi, d)

    def test_topk_is_the_global_fusion_topk(self, built_index, emb_ds):
        index_dir, _ = built_index
        ds, mat = emb_ds
        engine = SearchEngine(index_dir)
        q = _queries(mat, ["parse merge"])
        out = hybrid_search(index_dir, ds, q, k=5, exact_ranks=True)
        tr, vr = _brute_ranks(engine, mat, "parse merge", mat[0])
        fused = {
            d: round(
                (1.0 / (RRF_K + tr[d]) if d in tr else 0.0)
                + (1.0 / (RRF_K + vr[d]) if d in vr else 0.0), 6)
            for d in set(tr) | set(vr)
        }
        want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = [(r["doc_id"], r["rrf_r"]) for r in out.to_pylist()]
        assert got == want

    def test_vector_only_doc_still_ranked(self, built_index, emb_ds):
        """A doc absent from the text match set fuses on its vector rank
        alone (the cross-modal recall RRF exists for)."""
        index_dir, _ = built_index
        ds, mat = emb_ds
        engine = SearchEngine(index_dir)
        q = _queries(mat, ["zzzznotaterm"])  # empty text match set
        out = hybrid_search(index_dir, ds, q, k=10, exact_ranks=True)
        assert out.num_rows == 10
        # pure vector ranking: rrf = 1/(60+r) for r=1..10
        got = out["rrf_r"].to_pylist()
        assert got == [round(1.0 / (RRF_K + r), 6) for r in range(1, 11)]

    def test_production_topn_matches_exact_off_boundary(
        self, built_index, emb_ds
    ):
        """With fuse_n >= n_docs the top-n retrieval path and the
        full-rank path are identical (no truncation boundary)."""
        index_dir, _ = built_index
        ds, mat = emb_ds
        n = SearchEngine(index_dir).n_docs
        q = _queries(mat, ["parse merge"])
        a = hybrid_search(index_dir, ds, q, k=10, fuse_n=n, exact_ranks=True)
        b = hybrid_search(index_dir, ds, q, k=10, fuse_n=n, exact_ranks=False)
        assert a.to_pylist() == b.to_pylist()

    def test_distributed_identical(self, built_index, emb_ds):
        index_dir, _ = built_index
        ds, mat = emb_ds
        q = _queries(mat, ["parse merge", "read window"])
        a = hybrid_search(index_dir, ds, q, k=10, exact_ranks=True)
        b = hybrid_search(
            index_dir, ds, q, k=10, exact_ranks=True, distributed=True
        )
        assert a.to_pylist() == b.to_pylist()


class TestWeighted:
    def test_weighted_sum(self, built_index, emb_ds):
        index_dir, _ = built_index
        ds, mat = emb_ds
        engine = SearchEngine(index_dir)
        q = _queries(mat, ["parse merge"])
        out = hybrid_search(
            index_dir, ds, q, k=10, method="weighted",
            w_text=0.3, w_vec=0.7, exact_ranks=True,
        )
        t = engine.search("parse merge", k=engine.n_docs, fl=["doc_id"])
        t_by = dict(
            zip(
                t["doc_id"].to_pylist(),
                _round_half_away(
                    np.asarray(t["score"].to_pylist(), np.float64), 4
                ).tolist(),
            )
        )
        unit = mat.astype(np.float64)
        unit = unit / np.linalg.norm(unit, axis=1)[:, None]
        qv = mat[0].astype(np.float64)
        sims = _round_half_away(unit @ (qv / np.linalg.norm(qv)), 4)
        for r in out.to_pylist():
            d = r["doc_id"]
            want = round(0.3 * t_by.get(d, 0.0) + 0.7 * float(sims[d]), 6)
            assert r["rrf_r"] == want

    def test_unknown_method_raises(self, built_index, emb_ds):
        index_dir, _ = built_index
        ds, mat = emb_ds
        with pytest.raises(ValueError, match="fusion method"):
            hybrid_search(index_dir, ds, _queries(mat, ["x"]), method="nope")


class TestIvfHybrid:
    def test_ivf_dense_side_full_probe_equals_brute(
        self, built_index, emb_ds, tmp_path
    ):
        """With nprobe == n_buckets the IVF probe is exact, so IVF-backed
        hybrid equals the brute-force-dense hybrid."""
        from solr_indexer_ray.stages.ann import IvfIndex

        index_dir, _ = built_index
        ds, mat = emb_ds
        ivf = IvfIndex(n_buckets=4, nprobe=4,
                       index_dir=str(tmp_path / "ivf"))
        ivf.build(ds)
        q = _queries(mat, ["parse merge"])
        a = hybrid_search(index_dir, ds, q, k=10, ann_index=ivf)
        b = hybrid_search(index_dir, ds, q, k=10)
        assert a.to_pylist() == b.to_pylist()

    def test_exact_ranks_with_ivf_rejected(self, built_index, emb_ds,
                                           tmp_path):
        from solr_indexer_ray.stages.ann import IvfIndex

        index_dir, _ = built_index
        ds, mat = emb_ds
        ivf = IvfIndex(n_buckets=4, nprobe=1,
                       index_dir=str(tmp_path / "ivf2"))
        ivf.build(ds)
        with pytest.raises(ValueError, match="exact_ranks"):
            hybrid_search(index_dir, ds, _queries(mat, ["x"]),
                          ann_index=ivf, exact_ranks=True)

    def test_persisted_ivf_auto_discovered(self, built_index, emb_ds,
                                           tmp_path):
        """r3 default: a persisted IvfIndex at {index_dir}/ann_ivf is
        probed automatically when no ann_index is passed; exact_ranks
        still bypasses it (the brute-force oracle mode)."""
        from solr_indexer_ray.stages.ann import IvfIndex
        from solr_indexer_ray.stages.hybrid import build_hybrid_ann

        index_dir, _ = built_index
        ds, mat = emb_ds
        engine = SearchEngine(index_dir)
        # the shared built_index must stay ANN-free for the other tests:
        # stage the ann_ivf dir elsewhere and pass the engine explicitly
        fake_root = str(tmp_path / "idxroot")
        built = build_hybrid_ann(fake_root, ds, n_buckets=4, nprobe=4)
        assert isinstance(built, IvfIndex)
        q = _queries(mat, ["parse merge"])
        auto = hybrid_search(fake_root, ds, q, k=10, engine=engine)
        explicit = hybrid_search(index_dir, ds, q, k=10, engine=engine,
                                 ann_index=built)
        assert auto.to_pylist() == explicit.to_pylist()
        # full probe (nprobe == n_buckets) is exact -> matches brute
        brute = hybrid_search(index_dir, ds, q, k=10, engine=engine)
        assert auto.to_pylist() == brute.to_pylist()
        # exact_ranks ignores the persisted index instead of raising
        exact = hybrid_search(fake_root, ds, q, k=10, engine=engine,
                              exact_ranks=True)
        assert exact.num_rows == 10
