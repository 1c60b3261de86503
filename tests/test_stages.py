"""Stage tests: validation/errors, dedup family, ANN, multimodal plumbing."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from solr_indexer_ray.functions.hashing import jaccard, shingle_hashes
from solr_indexer_ray.functions.tokenize import simple_analyzer


def _docs_ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestValidate:
    @pytest.fixture()
    def validated(self, small_corpus):
        from solr_indexer_ray.stages.validate import split_errors, validate_corpus

        ds = rd.from_arrow(small_corpus)
        v = validate_corpus(ds)
        return split_errors(v)

    def test_split(self, validated, small_corpus):
        valid, errors = validated
        n_ok, n_err = valid.count(), errors.count()
        assert n_ok + n_err == small_corpus.num_rows
        assert n_err >= 3  # empty, whitespace, punct-only edge rows

    def test_error_stages(self, validated):
        _, errors = validated
        stages = set(r["stage"] for r in errors.take_all())
        assert "empty-content" in stages

    def test_failure_summary(self, validated):
        from solr_indexer_ray.stages.validate import failure_summary

        _, errors = validated
        g = failure_summary(errors)
        assert set(g.columns) == {"stage", "n_records", "n_files", "fraction"}
        assert g["fraction"].sum() == pytest.approx(1.0)

    def test_warn_dont_block(self):
        from solr_indexer_ray.stages.validate import split_errors, validate_corpus

        ds = _docs_ds(
            [{"repo": "r", "path": "p", "commit": "a" * 40,
              "lang": "klingon", "content": "some tokens here"}]
        )
        valid, errors = split_errors(validate_corpus(ds))
        rows = valid.take_all()
        assert len(rows) == 1 and errors.count() == 0
        assert "klingon" in rows[0]["warning"]


class TestExactDedup:
    def test_survivors(self):
        from solr_indexer_ray.stages.dedup import exact_dedup

        ds = _docs_ds(
            [
                {"doc_id": 0, "text": "same text"},
                {"doc_id": 1, "text": "same text"},
                {"doc_id": 2, "text": "other"},
            ]
        )
        out = {r["doc_id"] for r in exact_dedup(ds).take_all()}
        assert out == {0, 2}

    def test_dropped_ids_complement_survivors(self):
        """exact_dup_dropped_ids (the broadcast-small side at scale) is
        the exact complement of exact_dedup's survivors."""
        from solr_indexer_ray.stages.dedup import (
            exact_dedup,
            exact_dup_dropped_ids,
        )

        rows = [
            {"doc_id": 0, "text": "same text"},
            {"doc_id": 1, "text": "same text"},
            {"doc_id": 2, "text": "other"},
            {"doc_id": 3, "text": "same text"},
            {"doc_id": 4, "text": "third"},
        ]
        ds = _docs_ds(rows)
        keep = {r["doc_id"] for r in exact_dedup(ds).take_all()}
        drop = {r["doc_id"] for r in exact_dup_dropped_ids(ds).take_all()}
        assert keep == {0, 2, 4}
        assert drop == {1, 3}
        assert keep | drop == {r["doc_id"] for r in rows}
        assert not (keep & drop)


class TestJaccardPairs:
    ROWS = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy cat"},
        {"doc_id": 2, "text": "completely different content about databases"},
        {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog"},
    ]

    def brute_force(self, n=3, threshold=0.4):
        sets = {
            r["doc_id"]: set(shingle_hashes(simple_analyzer(r["text"]), n).tolist())
            for r in self.ROWS
        }
        out = {}
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                j = jaccard(sets[a], sets[b])
                if j >= threshold:
                    out[(a, b)] = j
        return out

    def test_exact_equi_join_matches_brute_force(self):
        from solr_indexer_ray.stages.dedup import ngram_jaccard_pairs

        got = {
            (r["id_a"], r["id_b"]): r["similarity"]
            for r in ngram_jaccard_pairs(
                _docs_ds(self.ROWS), threshold=0.4
            ).take_all()
        }
        expect = self.brute_force()
        assert set(got) == set(expect)
        for k in got:
            assert got[k] == pytest.approx(expect[k])

    def test_minhash_lsh_finds_high_sim_pairs(self):
        from solr_indexer_ray.stages.dedup import minhash_lsh_pairs

        got = minhash_lsh_pairs(
            _docs_ds(self.ROWS), threshold=0.8, num_perm=128, bands=32
        ).take_all()
        pairs = {(r["id_a"], r["id_b"]) for r in got}
        assert (0, 3) in pairs  # exact dup -> jaccard 1.0
        for r in got:
            assert r["similarity"] >= 0.8

    def test_simhash_pairs(self):
        from solr_indexer_ray.stages.dedup import simhash_pairs

        got = simhash_pairs(_docs_ds(self.ROWS), max_hamming=3).take_all()
        pairs = {(r["id_a"], r["id_b"]) for r in got}
        assert (0, 3) in pairs
        assert all(r["similarity"] >= 1 - 3 / 64 for r in got)


class TestEmbeddingOps:
    @pytest.fixture(scope="class")
    def emb_ds(self):
        rng = np.random.default_rng(3)
        base = rng.normal(size=(20, 8))
        rows = []
        for i, v in enumerate(base):
            rows.append({"vec_id": i, "embedding": v.tolist()})
        # a near-duplicate of vector 0
        rows.append(
            {"vec_id": 99, "embedding": (base[0] + 1e-4).tolist()}
        )
        return rd.from_arrow(pa.Table.from_pylist(rows))

    def test_embedding_dup_pairs(self, emb_ds):
        from solr_indexer_ray.stages.dedup import embedding_dup_pairs

        got = embedding_dup_pairs(emb_ds, threshold=0.999).take_all()
        pairs = {(r["id_a"], r["id_b"]) for r in got}
        assert (0, 99) in pairs

    def test_brute_force_topk_matches_numpy(self, emb_ds):
        from solr_indexer_ray.stages.ann import brute_force_topk

        rows = emb_ds.take_all()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows])
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        q = mat[:2]
        got = brute_force_topk(emb_ds, q, k=5).to_pylist()
        qunit = q / np.linalg.norm(q, axis=1)[:, None]
        sims = qunit @ unit.T
        for qi in range(2):
            expect_idx = np.lexsort((ids, -sims[qi]))[:5]
            expect = [int(ids[j]) for j in expect_idx]
            mine = [r["vec_id"] for r in got if r["query_id"] == qi]
            assert mine == expect

    def test_embedding_dup_pairs_ivf(self, emb_ds):
        from solr_indexer_ray.stages.dedup import embedding_dup_pairs

        exact = {
            (r["id_a"], r["id_b"]): r["similarity"]
            for r in embedding_dup_pairs(emb_ds, threshold=0.999).take_all()
        }
        ivf = {
            (r["id_a"], r["id_b"]): r["similarity"]
            for r in embedding_dup_pairs(
                emb_ds, threshold=0.999, method="ivf",
                n_buckets=4, assign_probes=2,
            ).take_all()
        }
        assert (0, 99) in ivf  # near-identical vectors co-locate
        # precision is exact: every ivf pair is a true pair at true cosine
        for k, sim in ivf.items():
            assert k in exact
            assert sim == pytest.approx(exact[k])

    def test_ivf_full_probe_is_exact(self, emb_ds, tmp_path):
        """nprobe == n_buckets scans every partition -> brute-force-equal
        (the property the oracle-checked ann_ivf_topk contract rests on)."""
        from solr_indexer_ray.stages.ann import IvfIndex, brute_force_topk

        rows = emb_ds.take_all()
        q = np.array([r["embedding"] for r in rows[:3]])
        exact = brute_force_topk(emb_ds, q, k=7).to_pylist()
        ivf = IvfIndex(
            n_buckets=4, nprobe=4, index_dir=str(tmp_path / "ivf")
        ).build(emb_ds)
        got = ivf.search(q, k=7).to_pylist()
        assert [(r["query_id"], r["vec_id"]) for r in got] == [
            (r["query_id"], r["vec_id"]) for r in exact
        ]
        for a, b in zip(got, exact):
            assert a["similarity"] == pytest.approx(b["similarity"])

    def test_ivf_persist_load_and_partition_layout(self, emb_ds, tmp_path):
        import os

        from solr_indexer_ray.stages.ann import IvfIndex

        idx_dir = str(tmp_path / "ivf2")
        IvfIndex(n_buckets=4, nprobe=2, index_dir=idx_dir).build(emb_ds)
        # hive-partitioned bucket layout on disk
        parts = sorted(
            d for d in os.listdir(os.path.join(idx_dir, "buckets"))
            if d.startswith("bucket=")
        )
        assert len(parts) >= 2
        rows = emb_ds.take_all()
        q = np.array([r["embedding"] for r in rows[:2]])
        reloaded = IvfIndex.load(idx_dir)
        got = reloaded.search(q, k=3).to_pylist()
        assert len(got) == 6
        # query 0 IS vector 0: its own bucket is always probed first
        assert got[0]["vec_id"] == 0
        assert got[0]["similarity"] == pytest.approx(1.0)

    def test_ivf_local_vs_ray_parity(self, emb_ds, tmp_path):
        """search(mode="local") (in-process partition-pruned probe, the
        serving path) returns exactly the rows of the Ray Data fan-out
        path — same scoring, same tie-breaks."""
        from solr_indexer_ray.stages.ann import IvfIndex

        rows = emb_ds.take_all()
        q = np.array([r["embedding"] for r in rows[:4]])
        ivf = IvfIndex(
            n_buckets=4, nprobe=2, index_dir=str(tmp_path / "ivfp")
        ).build(emb_ds)
        loc = ivf.search(q, k=5, mode="local").to_pylist()
        ray_ = ivf.search(q, k=5, mode="ray").to_pylist()
        assert loc == ray_
        # warm cache: repeated local probes don't re-read partitions
        again = ivf.search(q, k=5, mode="local").to_pylist()
        assert again == loc
        import pytest as _pt
        with _pt.raises(ValueError, match="mode"):
            ivf.search(q, k=5, mode="nope")

    def test_ivf_recall(self, emb_ds):
        from solr_indexer_ray.stages.ann import IvfIndex, brute_force_topk

        rows = emb_ds.take_all()
        q = np.array([r["embedding"] for r in rows[:5]])
        exact = brute_force_topk(emb_ds, q, k=5).to_pylist()
        ivf = IvfIndex(n_buckets=4, nprobe=2).build(emb_ds)
        approx = ivf.search(q, k=5).to_pylist()
        # recall@5 over 5 queries must be high for tiny data
        hits = 0
        for qi in range(5):
            e = {r["vec_id"] for r in exact if r["query_id"] == qi}
            a = {r["vec_id"] for r in approx if r["query_id"] == qi}
            hits += len(e & a)
        assert hits / 25 >= 0.6


class TestMultimodal:
    def test_decode_plumbing(self):
        from solr_indexer_ray.stages import multimodal

        table = multimodal.fake_media_table(10)
        ds = rd.from_arrow(table)
        out = multimodal.decode_media(ds, concurrency=2, batch_size=4)
        rows = sorted(out.take_all(), key=lambda r: r["media_id"])
        assert len(rows) == 10
        for r in rows:
            assert r["width"] >= 8 and r["height"] >= 8
            assert len(r["features"]) == multimodal.FEATURE_BINS
            assert abs(sum(r["features"]) - 1.0) < 1e-3
            assert "data" not in r  # heavy bytes dropped after decode

    def test_decode_deterministic(self):
        from solr_indexer_ray.stages import multimodal

        t1 = multimodal.fake_media_table(5)
        t2 = multimodal.fake_media_table(5)
        assert t1.equals(t2)
        stage = multimodal.DecodeImageStage()
        assert stage(t1).equals(stage(t2))

    def test_strict_raises_on_unknown_blob(self):
        from solr_indexer_ray.stages.multimodal import DecodeImageStage

        stage = DecodeImageStage(strict=True)
        if stage.pil is None:
            import pyarrow as pa

            bad = pa.table(
                {"media_id": [0], "kind": ["image"], "mime": ["x"],
                 "data": [b"not-a-real-image"]}
            )
            with pytest.raises(NotImplementedError):
                stage(bad)

    def test_resize_stub(self):
        from solr_indexer_ray.stages import multimodal

        table = multimodal.fake_media_table(3)
        stage = multimodal.ResizeImageStage(16, 16)
        if stage.pil is None:
            out = stage(table)
            for blob in out["data"].to_pylist():
                import struct

                w, h = struct.unpack(
                    "<II", blob[len(multimodal.MAGIC):len(multimodal.MAGIC) + 8]
                )
                assert (w, h) == (16, 16)

    def test_resize_synthetic_path_with_decoder_present(self):
        """Round-1 ADVICE bug: installing Pillow made ResizeImageStage
        raise unconditionally.  Synthetic blobs must take the synthetic
        path regardless of whether a real decoder is importable."""
        import struct

        from solr_indexer_ray.stages import multimodal

        stage = multimodal.ResizeImageStage(4, 4)
        stage.pil = object()  # simulate an importable Pillow
        out = stage(multimodal.fake_media_table(3))
        for blob in out["data"].to_pylist():
            w, h = struct.unpack(
                "<II", blob[len(multimodal.MAGIC):len(multimodal.MAGIC) + 8]
            )
            assert (w, h) == (4, 4)

    def test_decode_synthetic_path_with_decoder_present(self):
        from solr_indexer_ray.stages import multimodal

        stage = multimodal.DecodeImageStage()
        stage.pil = object()  # a real decoder must not break fake blobs
        t = multimodal.fake_media_table(3)
        out = stage(t)
        assert out["width"].to_pylist() == [
            struct_w for struct_w in
            multimodal.DecodeImageStage()(t)["width"].to_pylist()
        ]


class TestFrameSampleAndFeatures:
    """Video frame-sample + standalone feature extraction (the rest of
    the brief's multimodal list beyond decode/resize)."""

    def test_frame_sample_plumbing(self):
        from solr_indexer_ray.stages import multimodal

        vids = multimodal.fake_video_table(6, seed=3)
        ds = rd.from_arrow(vids)
        out = multimodal.sample_frames(ds, n_samples=3, concurrency=2,
                                       batch_size=2)
        rows = sorted(out.take_all(),
                      key=lambda r: (r["media_id"], r["frame_index"]))
        assert rows
        by_vid = {}
        for r in rows:
            by_vid.setdefault(r["media_id"], []).append(r["frame_index"])
            # sampled frames are valid image blobs
            assert r["data"][:len(multimodal.MAGIC)] == multimodal.MAGIC
            assert r["kind"] == "image"
        for mid, idxs in by_vid.items():
            n = struct.unpack(
                "<III", vids["data"][mid].as_py()[8:20])[0]
            assert 1 <= len(idxs) <= 3
            assert idxs[0] == 0 and idxs[-1] == n - 1  # uniform span
            assert idxs == sorted(set(idxs))

    def test_frames_compose_with_decode(self):
        from solr_indexer_ray.stages import multimodal

        stage = multimodal.FrameSampleStage(n_samples=2)
        frames = stage(multimodal.fake_video_table(3, seed=1))
        decoded = multimodal.DecodeImageStage()(frames)
        assert decoded.num_rows == frames.num_rows
        assert "features" in decoded.column_names

    def test_frame_sample_deterministic_and_strict(self):
        from solr_indexer_ray.stages import multimodal

        stage = multimodal.FrameSampleStage(n_samples=4)
        t = multimodal.fake_video_table(4, seed=9)
        assert stage(t).equals(stage(t))
        if multimodal._try_import_video() is None:
            bad = pa.table(
                {"media_id": [0], "kind": ["video"], "mime": ["x"],
                 "data": [b"not-a-video"]},
                schema=multimodal.MEDIA_SCHEMA.remove(0).insert(
                    0, pa.field("media_id", pa.int64())),
            )
            with pytest.raises(NotImplementedError):
                multimodal.FrameSampleStage(n_samples=2, strict=True)(bad)
            # non-strict: skipped, empty output
            assert multimodal.FrameSampleStage(n_samples=2)(bad)\
                .num_rows == 0
        with pytest.raises(ValueError):
            multimodal.FrameSampleStage(n_samples=0)

    def test_feature_extract_ann_ready(self):
        from solr_indexer_ray.stages import multimodal
        from solr_indexer_ray.stages.ann import brute_force_topk

        imgs = multimodal.fake_media_table(12, seed=5)
        ds = rd.from_arrow(imgs)
        out = multimodal.extract_features(ds, bins=8, concurrency=2,
                                          batch_size=4)
        rows = sorted(out.take_all(), key=lambda r: r["media_id"])
        assert len(rows) == 12
        mat = np.array([r["embedding"] for r in rows])
        assert mat.shape == (12, 8)
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)
        # ANN composition: each embedding's nearest neighbour is itself
        emb_ds = rd.from_items(
            [{"vec_id": r["media_id"], "embedding": r["embedding"]}
             for r in rows]
        )
        top = brute_force_topk(emb_ds, mat[:3], k=1).to_pylist()
        assert [r["vec_id"] for r in top] == [0, 1, 2]
        with pytest.raises(ValueError):
            multimodal.FeatureExtractStage(bins=1)


class TestNearDedupSurvivors:
    def test_union_find_components(self):
        from solr_indexer_ray.stages.dedup import component_dropped_ids

        pairs = [
            {"id_a": 0, "id_b": 5},      # comp {0,5} -> keep 0
            {"id_a": 2, "id_b": 3},      # chain {2,3,4} -> keep 2
            {"id_a": 3, "id_b": 4},
            {"id_a": 9, "id_b": 7},      # order-independent -> keep 7
        ]
        assert component_dropped_ids(pairs) == {5, 3, 4, 9}

    def test_survivor_filter_streams(self):
        from solr_indexer_ray.stages.dedup import near_dedup_survivors

        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(10)]),
        }))
        pairs = pa.Table.from_pylist(
            [{"id_a": 1, "id_b": 4}, {"id_a": 4, "id_b": 8}]
        )
        out = near_dedup_survivors(docs, pairs)
        ids = sorted(r["doc_id"] for r in out.take_all())
        assert ids == [0, 1, 2, 3, 5, 6, 7, 9]  # 4 and 8 collapsed into 1


class TestLshStressBoilerplateBucket:
    """VERDICT r3 item 1 done-criterion: a mass-duplicated boilerplate
    bucket (20k copies of one doc) must flow through the LSH pair
    generators with O(B) STAR pairs — not the O(B²) clique — and no
    per-doc state on the driver."""

    N = 20_000
    TEXT = ("apache license version two point zero redistribution and use "
            "in source and binary forms with or without modification")

    @pytest.fixture(scope="class")
    def boiler_ds(self):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(self.N), pa.int64()),
            "text": pa.array([self.TEXT] * self.N),
        })).repartition(8)

    def test_minhash_star_pairs(self, boiler_ds):
        import time

        from solr_indexer_ray.stages.dedup import (
            minhash_lsh_pairs,
            near_dedup_survivors,
        )

        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(
            boiler_ds, threshold=0.5, num_perm=32, bands=8, clique_cap=64,
        )
        got = pairs.take_all()
        elapsed = time.monotonic() - t0
        # star shape: every bucket is the same 20k-doc set -> B-1 unique
        # pairs (hub = min doc id), NOT B(B-1)/2 ~ 2e8
        assert len(got) == self.N - 1
        assert all(r["similarity"] == 1.0 for r in got)
        assert {r["id_a"] for r in got} == {0}
        # generous bound for a contended shared host; the clique would
        # need ~2e8 pair rows and minutes-to-hours
        assert elapsed < 300
        survivors = near_dedup_survivors(boiler_ds, pairs)
        assert survivors.count() == 1

    def test_simhash_star_pairs(self, boiler_ds):
        from solr_indexer_ray.stages.dedup import simhash_pairs

        got = simhash_pairs(
            boiler_ds, max_hamming=3, bands=4, clique_cap=64
        ).take_all()
        assert len(got) == self.N - 1
        assert {r["id_a"] for r in got} == {0}
        assert all(r["similarity"] == 1.0 for r in got)


class TestDedupCorpusPipeline:
    def test_end_to_end_exact_and_jaccard(self, tmp_path):
        import pyarrow.parquet as pq

        from solr_indexer_ray.stages.dedup import dedup_corpus

        rows = [
            {"doc_id": i, "text": f"unique document number {i} content",
             "lang": "en"}
            for i in range(20)
        ]
        rows.append({"doc_id": 20,
                     "text": "unique document number 7 content",
                     "lang": "en"})  # exact dup of 7
        src = tmp_path / "docs.parquet"
        pq.write_table(pa.Table.from_pylist(rows), src)

        res = dedup_corpus(str(src), str(tmp_path / "out1"), mode="exact")
        assert res["kept"] == 20 and res["dropped"] == 1
        kept = pq.read_table(str(tmp_path / "out1"))
        assert 20 not in kept["doc_id"].to_pylist()  # dup collapsed to 7
        assert 7 in kept["doc_id"].to_pylist()

        res2 = dedup_corpus(str(src), str(tmp_path / "out2"),
                            mode="jaccard", threshold=0.5,
                            hot_shingle_cap=None)
        assert res2["kept"] == 20 and res2["dropped"] == 1

    def test_unknown_mode_raises(self, tmp_path):
        import pyarrow.parquet as pq

        from solr_indexer_ray.stages.dedup import dedup_corpus

        src = tmp_path / "d.parquet"
        pq.write_table(
            pa.table({"doc_id": [0], "text": ["x"]}), src
        )
        with pytest.raises(ValueError, match="unknown dedup mode"):
            dedup_corpus(str(src), str(tmp_path / "o"), mode="nope")


class TestPiiScrub:
    CASES = [
        ("contact bob.smith+x@example.co.uk or 10.0.0.1",
         "contact <EMAIL> or <IP>", {"n_email": 1, "n_ipv4": 1}),
        ("call +47 22-33 44 55 now", "call <PHONE> now", {"n_phone": 1}),
        ('API_KEY = "abcdef123456789"', "API_KEY=<SECRET>", {"n_secret": 1}),
        ("token: 'shhh-very-secret' PASSWORD=\"hunter2hunter2\"",
         "token=<SECRET> PASSWORD=<SECRET>", {"n_secret": 2}),
        # conservative: bare digit runs / short +numbers are NOT phones,
        # version-ish dotted numbers are NOT IPs
        ("no pii 1.2 3.4.5 short+1 v1.2.3", "no pii 1.2 3.4.5 short+1 v1.2.3",
         {}),
        ("", "", {}),
        (None, "", {}),
    ]

    def test_scrub_and_counts(self):
        from solr_indexer_ray.stages.pii import PiiScrubber

        t = pa.table({
            "doc_id": pa.array(range(len(self.CASES)), pa.int64()),
            "text": pa.array([c[0] for c in self.CASES], pa.string()),
        })
        out = PiiScrubber()(t).to_pylist()
        for row, (_, want_text, want_counts) in zip(out, self.CASES):
            assert row["text"] == want_text
            for k in ("n_email", "n_ipv4", "n_phone", "n_secret"):
                assert row[k] == want_counts.get(k, 0), (k, row)

    def test_streams_over_dataset(self):
        import ray.data as rd

        from solr_indexer_ray.stages.pii import scrub_pii

        ds = rd.from_items(
            [{"doc_id": i, "text": f"mail{i}@x.io plus text"}
             for i in range(50)]
        )
        out = pa.Table.from_pylist(scrub_pii(ds).take_all())
        assert out.num_rows == 50
        assert set(out["n_email"].to_pylist()) == {1}
        assert all("<EMAIL>" in t for t in out["text"].to_pylist())
