"""Mergeable sketch aggregates: HLL, KMV, Misra-Gries, histogram quantiles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from solr_indexer_ray.stages.sketch import (
    HistogramSketch,
    heavy_hitters,
    hash_column,
    hll_sketch,
    kmv_sketch,
    quantile_histogram,
    splitmix64,
)


def _ds(values, col="v"):
    return rd.from_arrow(pa.table({col: values}))


class TestHashing:
    def test_splitmix64_deterministic_and_dispersed(self):
        x = np.arange(10000, dtype=np.uint64)
        h = splitmix64(x)
        assert np.array_equal(h, splitmix64(x))
        assert len(np.unique(h)) == 10000
        # top bits well spread: each of 16 buckets within 3x of uniform
        buckets = np.bincount((h >> np.uint64(60)).astype(int), minlength=16)
        assert buckets.min() > 10000 / 16 / 3

    def test_hash_column_ints_vs_strings_and_nulls(self):
        ints = pa.array([1, 2, None, 2], pa.int64())
        # null ints hash via their sentinel; no crash, stable
        h1 = hash_column(pa.table({"v": ints})["v"])
        assert h1[1] == h1[3]
        strs = pa.array(["a", "b", None, "a"], pa.string())
        h2 = hash_column(pa.table({"v": strs})["v"])
        assert h2[0] == h2[3] and h2[0] != h2[1]


class TestHll:
    def test_estimate_within_bound(self):
        n = 20000
        ds = _ds(pa.array((np.arange(n) % 7919).astype("int64")))
        sk = hll_sketch(ds, "v", p=12)
        est = sk.estimate()
        assert abs(est - 7919) / 7919 < 0.05  # ~3 sigma at p=12

    def test_merge_equals_whole(self):
        a = np.arange(5000, dtype=np.int64)
        b = np.arange(2500, 7500, dtype=np.int64)
        sk_a = hll_sketch(_ds(pa.array(a)), "v", p=10)
        sk_b = hll_sketch(_ds(pa.array(b)), "v", p=10)
        whole = hll_sketch(_ds(pa.array(np.concatenate([a, b]))), "v", p=10)
        merged = sk_a.merge(sk_b)
        assert np.array_equal(merged.registers, whole.registers)

    def test_small_range_exactish(self):
        ds = _ds(pa.array(list(range(40)) * 10, pa.int64()))
        est = hll_sketch(ds, "v", p=12).estimate()
        assert abs(est - 40) < 2  # linear-counting regime


class TestKmv:
    def test_fast_matches_brute_force(self):
        vals = np.arange(3000, dtype=np.int64) % 997
        ds = _ds(pa.array(vals))
        sketch, est = kmv_sketch(ds, "v", k=128)
        # brute force: 128 smallest distinct hashes
        h = hash_column(pa.table({"v": pa.array(np.unique(vals))})["v"])
        want = np.sort(h)[:128]
        got = np.asarray(sketch["h"].to_pylist(), dtype=np.uint64)
        assert np.array_equal(got, want)
        assert abs(est - 997) / 997 < 0.25

    def test_under_k_is_exact(self):
        ds = _ds(pa.array(["a", "b", "c"] * 100))
        sketch, est = kmv_sketch(ds, "v", k=64)
        assert sketch.num_rows == 3 and est == 3.0

    def test_sha_mode_matches_sorted_sha(self):
        import hashlib

        vals = [str(i * 17 % 301) for i in range(301)]
        ds = _ds(pa.array(vals * 3))
        sketch, _ = kmv_sketch(ds, "v", k=32, hash="sha256")
        want = sorted(hashlib.sha256(v.encode()).hexdigest() for v in set(vals))[:32]
        assert sketch["h"].to_pylist() == want


class TestHeavyHitters:
    def test_exact_above_threshold(self):
        # skewed: value i appears (i+1)^2 times, i in 0..49
        vals = [str(i) for i in range(50) for _ in range((i + 1) ** 2)]
        ds = _ds(pa.array(vals))
        k = 16
        out = heavy_hitters(ds, "v", k=k)
        n = len(vals)
        want = sorted(
            ((str(i), (i + 1) ** 2) for i in range(50)
             if (i + 1) ** 2 > n / (k + 1)),
            key=lambda t: (-t[1], t[0]),
        )
        got = list(zip(out["value"].to_pylist(), out["n"].to_pylist()))
        assert got == want

    def test_compression_path_keeps_guarantee(self):
        # cardinality >> k forces MG compression; one heavy value must
        # survive with its EXACT count
        vals = [f"rare{i}" for i in range(5000)] + ["heavy"] * 2000
        ds = _ds(pa.array(vals))
        out = heavy_hitters(ds, "v", k=8)
        d = dict(zip(out["value"].to_pylist(), out["n"].to_pylist()))
        assert d == {"heavy": 2000}

    def test_nulls_ignored(self):
        ds = _ds(pa.array(["x", None, "x", "y"], pa.string()))
        out = heavy_hitters(ds, "v", k=4, min_share=0.4)
        assert dict(zip(out["value"].to_pylist(),
                        out["n"].to_pylist())) == {"x": 2}


class TestQuantileHistogram:
    def test_quantiles_within_bin_width(self):
        rng = np.random.default_rng(5)
        x = rng.normal(50, 10, size=20000).astype(np.float64)
        ds = _ds(pa.array(x))
        sk = quantile_histogram(ds, "v", lo=0.0, hi=100.0, n_bins=1000)
        width = 0.1
        for q in (0.125, 0.5, 0.875):
            exact = np.quantile(x.clip(0, 100), q)
            assert abs(sk.quantile(q) - exact) <= 2 * width

    def test_merge_is_sum(self):
        a = np.arange(100, dtype=np.float64)
        b = np.arange(50, 150, dtype=np.float64)
        sk_a = quantile_histogram(_ds(pa.array(a)), "v", 0, 200, 40)
        sk_b = quantile_histogram(_ds(pa.array(b)), "v", 0, 200, 40)
        whole = quantile_histogram(
            _ds(pa.array(np.concatenate([a, b]))), "v", 0, 200, 40)
        merged = HistogramSketch(
            0.0, 200.0, sk_a.counts + sk_b.counts, sk_a.n + sk_b.n)
        assert np.array_equal(merged.counts, whole.counts)
        assert merged.quantile(0.5) == whole.quantile(0.5)

    def test_clipping_and_empty(self):
        sk = quantile_histogram(
            _ds(pa.array([-5.0, 500.0, 1.0])), "v", 0, 10, 10)
        # -5 clips into bin 0, 500 into the last bin; 1.0 lands in bin 1
        assert sk.counts[0] == 1 and sk.counts[1] == 1 and sk.counts[-1] == 1
        empty = quantile_histogram(
            _ds(pa.array([], pa.float64())), "v", 0, 10, 10)
        assert np.isnan(empty.quantile(0.5))
