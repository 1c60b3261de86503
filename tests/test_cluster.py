"""Search-result clustering (Solr ClusteringComponent analogue):
deterministic spherical k-means over result embeddings."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.stages.cluster import (
    cluster_results,
    kmeans_deterministic,
)


class TestKmeans:
    def test_separable_blobs(self):
        rng = np.random.RandomState(3)
        base = np.eye(3)
        mat = np.concatenate([
            base[i] + rng.normal(0, 0.05, size=(20, 3))
            for i in range(3)
        ])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        labels, cents = kmeans_deterministic(mat, 3)
        # each blob maps to exactly one cluster
        for i in range(3):
            blob = labels[i * 20:(i + 1) * 20]
            assert len(set(blob.tolist())) == 1
        assert len({labels[0], labels[20], labels[40]}) == 3

    def test_deterministic_rerun(self):
        rng = np.random.RandomState(5)
        mat = rng.normal(size=(50, 8))
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        l1, c1 = kmeans_deterministic(mat, 5)
        l2, c2 = kmeans_deterministic(mat, 5)
        assert (l1 == l2).all() and np.array_equal(c1, c2)

    def test_k_exceeds_n(self):
        mat = np.eye(3)
        labels, cents = kmeans_deterministic(mat, 10)
        assert cents.shape[0] == 3 and len(set(labels.tolist())) == 3

    def test_empty(self):
        labels, cents = kmeans_deterministic(np.zeros((0, 4)), 3)
        assert labels.size == 0 and cents.shape[0] == 0


@pytest.fixture(scope="module")
def cl_embeddings(built_index, tmp_path_factory):
    """Embeddings aligned to the session index: doc_id % 3 picks one of
    three well-separated directions (plus a deterministic wobble), and
    every 13th doc has NO embedding."""
    idx, stats = built_index
    n = stats["n_docs"]
    base = np.eye(4)[:3]
    rows = []
    for d in range(n):
        if d % 13 == 5:
            continue
        wob = np.array([((d * 31) % 7) / 100.0, ((d * 17) % 5) / 100.0,
                        ((d * 11) % 3) / 100.0, 0.3])
        v = base[d % 3] + wob * 0.1
        rows.append({"vec_id": d, "embedding": (v / np.linalg.norm(v)).tolist()})
    path = str(tmp_path_factory.mktemp("clemb") / "emb.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


class TestClusterResults:
    def test_partition_and_order(self, built_index, cl_embeddings):
        idx, _ = built_index
        eng = SearchEngine(idx)
        t = cluster_results(eng, "def read", cl_embeddings,
                            k_clusters=3, top_n=30)
        hits = eng.search("def read", k=30, fl=["doc_id"])
        expected = [d for d in hits["doc_id"].to_pylist()
                    if d % 13 != 5]
        assert sorted(t["doc_id"].to_pylist()) == sorted(expected)
        # clusters group by doc_id % 3 (the planted structure)
        bycl: dict = {}
        for r in t.to_pylist():
            bycl.setdefault(r["cluster"], set()).add(r["doc_id"] % 3)
        for members in bycl.values():
            assert len(members) == 1
        # cluster 0 contains the top hit; members ordered by rank
        assert t["cluster"].to_pylist()[0] == 0
        assert t["doc_id"].to_pylist()[0] == expected[0]
        for c in set(t["cluster"].to_pylist()):
            sub = [r for r in t.to_pylist() if r["cluster"] == c]
            assert [r["position"] for r in sub] == list(range(len(sub)))
            ranks = [expected.index(r["doc_id"]) for r in sub]
            assert ranks == sorted(ranks)
            assert all(r["size"] == len(sub) for r in sub)
        for s in t["sim"].to_pylist():
            assert -1.0 - 1e-9 <= s <= 1.0 + 1e-9

    def test_deterministic(self, built_index, cl_embeddings):
        idx, _ = built_index
        eng = SearchEngine(idx)
        a = cluster_results(eng, "merge", cl_embeddings, k_clusters=3)
        b = cluster_results(eng, "merge", cl_embeddings, k_clusters=3)
        assert a.to_pylist() == b.to_pylist()

    def test_no_hits(self, built_index, cl_embeddings):
        idx, _ = built_index
        t = cluster_results(SearchEngine(idx), "zzznotaterm",
                            cl_embeddings)
        assert t.num_rows == 0

    def test_labels(self, built_index, cl_embeddings):
        """carrot2-style labels: each cluster labeled by its most
        distinctive terms (JLH over member docs vs the index)."""
        idx, _ = built_index
        eng = SearchEngine(idx)
        t = cluster_results(eng, "merge", cl_embeddings, k_clusters=3,
                            label_terms=3)
        assert "label" in t.column_names
        rows = t.to_pylist()
        by_c = {}
        for r in rows:
            by_c.setdefault(r["cluster"], r["label"])
            assert r["label"] == by_c[r["cluster"]]  # same per cluster
            assert 1 <= len(r["label"].split()) <= 3
        # labels equal the significant-terms of exactly the member set
        import numpy as np
        for c, lab in by_c.items():
            docs = [r["doc_id"] for r in rows if r["cluster"] == c]
            sig = eng.significant_terms_for_ids(
                np.asarray(docs), limit=3, min_doc_freq=1)
            assert lab == " ".join(sig["term"].to_pylist())
        # no-labels mode keeps the original schema
        t2 = cluster_results(eng, "merge", cl_embeddings, k_clusters=3)
        assert "label" not in t2.column_names
