"""Mergeable sketch aggregates: HyperLogLog, KMV, Misra-Gries, histogram
quantiles.

The reference has no approximate aggregates (SURVEY.md §2.6: "no
sketches"), but a 100 TB engine needs cardinality / heavy-hitter /
quantile answers without a full shuffle.  Every sketch here follows the
same Ray-Data-native shape: one vectorized ``map_batches`` stage emits a
tiny per-block partial (a register array, a min-hash set, a counter
table, a histogram), and the driver merges the partials — a combiner
aggregation whose reduce side is O(sketch size), never O(data).

Determinism: hashes are splitmix64 (ints) / FNV-1a 64 (strings) — fixed,
process-stable — so every estimate is reproducible run-to-run and
testable against brute force.  ``kmv_sketch(hash="sha256")`` swaps in
hex-encoded sha256, which DuckDB shares, making the sketch CONTENT
value-checkable by a SQL oracle (``ORDER BY sha256(v) LIMIT k``).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --------------------------------------------------------------------- #
# hashing
# --------------------------------------------------------------------- #
def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — uint64 in, uint64 out."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_column(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hashes of a column: splitmix64 for integers; FNV-1a 64 for
    strings, computed once per DISTINCT value via dictionary encoding
    (the per-batch Python cost is O(unique), not O(rows))."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return splitmix64(vals.view(np.uint64))
    from solr_indexer_ray.functions.textstats import fnv1a64

    d = pc.dictionary_encode(pc.fill_null(arr.cast(pa.string()), ""))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = np.fromiter(
        (fnv1a64(v) for v in d.dictionary.to_pylist()),
        dtype=np.uint64, count=len(d.dictionary),
    )
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uniq[idx]


# --------------------------------------------------------------------- #
# HyperLogLog
# --------------------------------------------------------------------- #
@dataclass
class HllSketch:
    p: int
    registers: np.ndarray  # (2^p,) uint8

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        return HllSketch(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        """Classic HLL estimator with small-range (linear counting)
        correction — Flajolet et al. 2007."""
        m = float(self.registers.size)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        z = 1.0 / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        e = alpha * m * m * z
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return float(e)


def hll_sketch(ds, col: str, p: int = 12) -> HllSketch:
    """Distributed distinct-count sketch: per-block register partials
    (one (2^p,) uint8 row each), driver max-merge.  Standard error
    ~1.04/sqrt(2^p) (~1.6% at p=12); memory 4 KiB per block partial."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_column(batch[col])
        regs = np.zeros(m, dtype=np.uint8)
        if h.size:
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
            # exact leading-zero count via 32-bit halves (both < 2^53,
            # so float log2 is exact — no rounding across bit boundaries)
            hi = (rest >> np.uint64(32)).astype(np.float64)
            lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
            lz = np.where(
                hi > 0,
                31 - np.floor(np.log2(np.maximum(hi, 1.0))),
                63 - np.floor(np.log2(np.maximum(lo, 1.0))),
            ).astype(np.int64)
            rho = np.clip(lz + 1, 1, 64 - p + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rho)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    out = ds.map_batches(partial, batch_format="pyarrow")
    regs = np.zeros(m, dtype=np.uint8)
    for b in out.iter_batches(batch_format="pyarrow"):
        for buf in b["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
    return HllSketch(p, regs)


# --------------------------------------------------------------------- #
# KMV (k minimum values): distinct estimate + deterministic uniform sample
# --------------------------------------------------------------------- #
def kmv_sketch(ds, col: str, k: int = 256, hash: str = "fast"):
    """K-minimum-values sketch over DISTINCT column values.

    Per block: hash the values, keep the k smallest distinct (hash,
    value) pairs; driver merge: global k smallest by hash.  Doubles as a
    deterministic uniform sample of the distinct values.  Returns
    ``(table(h, value), estimate)`` where estimate = (k-1)/v_k scaled to
    the hash space (or exact |seen| when fewer than k distinct).

    ``hash="sha256"`` uses hex sha256 of the value's string form — the
    hash DuckDB shares, so the sketch content has a SQL oracle
    (``SELECT DISTINCT v ... ORDER BY sha256(v) LIMIT k``).
    """
    use_sha = hash == "sha256"

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        svals = arr.cast(pa.string())
        if use_sha:
            uniq = pc.unique(svals).to_pylist()
            pairs = sorted(
                (hashlib.sha256((v or "").encode()).hexdigest(), v)
                for v in uniq
            )[:k]
            return pa.table({
                "h": pa.array([p[0] for p in pairs], pa.string()),
                "value": pa.array([p[1] for p in pairs], pa.string()),
            })
        h = hash_column(batch[col])
        hu, first = np.unique(h, return_index=True)
        take = min(k, hu.size)
        sel = first[:take]  # np.unique sorts by hash already
        return pa.table({
            "h": pa.array(h[sel], pa.uint64()),
            "value": svals.take(pa.array(sel.astype(np.int64))),
        })

    parts = pa.Table.from_pylist(
        ds.map_batches(partial, batch_format="pyarrow").take_all(),
        schema=pa.schema([
            ("h", pa.string() if use_sha else pa.uint64()),
            ("value", pa.string()),
        ]),
    )
    # global merge: distinct by hash, k smallest
    order = pc.sort_indices(parts, sort_keys=[("h", "ascending")])
    parts = parts.take(order)
    hvals = parts["h"].to_pylist()
    keep, seen = [], set()
    for i, hv in enumerate(hvals):
        if hv not in seen:
            seen.add(hv)
            keep.append(i)
        if len(keep) == k:
            break
    sketch = parts.take(pa.array(keep, pa.int64()))
    n = sketch.num_rows
    if n < k:
        estimate = float(n)  # sketch holds every distinct value: exact
    elif use_sha:
        vk = int(sketch["h"][n - 1].as_py()[:16], 16)  # top 64 bits
        estimate = (k - 1) / (vk / float(1 << 64))
    else:
        vk = int(sketch["h"][n - 1].as_py())
        estimate = (k - 1) / (vk / float(1 << 64))
    return sketch, estimate


# --------------------------------------------------------------------- #
# Misra-Gries heavy hitters (+ exact recount)
# --------------------------------------------------------------------- #
def heavy_hitters(ds, col: str, k: int = 64, min_share: float | None = None):
    """Frequent values above a frequency threshold, EXACTLY.

    Two passes, neither a full shuffle:

    1. Misra-Gries candidates: per-block exact value counts (a combiner
       — tiny when the column is low-cardinality, bounded by block size
       otherwise), merged driver-side with MG compression to ≤ k
       counters.  Guarantee: every value with true count > N/(k+1)
       survives (no false negatives).
    2. Exact recount of the ≤ k candidates via a broadcast ``is_in``
       filter + per-block partial counts — removes MG's overcounts.

    Output: values with exact count > N * min_share (default share:
    1/(k+1), the MG guarantee line), count desc / value asc.  Because
    the output is exactly "all values above the threshold", it has a
    plain SQL oracle (GROUP BY ... HAVING) despite the sketch route.
    """
    from ray.data.aggregate import Count

    if min_share is None:
        min_share = 1.0 / (k + 1)

    def partial_counts(batch: pa.Table) -> pa.Table:
        sv = batch[col].combine_chunks().cast(pa.string()).drop_null()
        vc = pc.value_counts(sv)
        return pa.table({
            "value": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    parts = ds.map_batches(partial_counts, batch_format="pyarrow").take_all()
    counters: dict = {}
    total = 0
    for row in parts:
        v, n = row["value"], int(row["n"])
        counters[v] = counters.get(v, 0) + n
        total += n
        if len(counters) > 4 * k:  # MG compression: decrement-and-drop
            m = sorted(counters.values())[len(counters) - k]
            counters = {
                key: c - m for key, c in counters.items() if c > m
            }
    if len(counters) > k:
        m = sorted(counters.values())[len(counters) - k]
        counters = {key: c - m for key, c in counters.items() if c > m}
    candidates = sorted(counters)

    # pass 2: exact recount of the candidate set (broadcast filter)
    import ray.data as rd

    def recount(batch: pa.Table) -> pa.Table:
        sv = batch[col].combine_chunks().cast(pa.string())
        mask = pc.is_in(sv, value_set=pa.array(candidates, pa.string()))
        vc = pc.value_counts(sv.filter(mask))
        return pa.table({
            "value": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    exact: dict = {}
    for row in ds.map_batches(recount, batch_format="pyarrow").take_all():
        exact[row["value"]] = exact.get(row["value"], 0) + int(row["n"])
    thresh = total * min_share
    rows = sorted(
        ((v, c) for v, c in exact.items() if c > thresh),
        key=lambda t: (-t[1], t[0]),
    )
    return pa.table({
        "value": pa.array([v for v, _ in rows], pa.string()),
        "n": pa.array([c for _, c in rows], pa.int64()),
    })


# --------------------------------------------------------------------- #
# fixed-width histogram quantiles
# --------------------------------------------------------------------- #
@dataclass
class HistogramSketch:
    lo: float
    hi: float
    counts: np.ndarray  # (n_bins,) int64, clipped at the edges
    n: int

    def quantile(self, q: float) -> float:
        """Upper edge of the first bin where the cumulative count reaches
        ``q * n`` — deterministic, mergeable, resolution = bin width."""
        if self.n == 0:
            return float("nan")
        target = q * self.n
        cum = np.cumsum(self.counts)
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, self.counts.size - 1)
        width = (self.hi - self.lo) / self.counts.size
        return self.lo + (i + 1) * width


def quantile_histogram(ds, col: str, lo: float, hi: float,
                       n_bins: int = 1024) -> HistogramSketch:
    """Distributed quantile sketch: per-block fixed-width histograms
    (one int64 row each), driver sum-merge.  Values outside [lo, hi]
    clip into the edge bins."""
    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().cast(pa.float64()).drop_null()
        x = v.to_numpy(zero_copy_only=False)
        width = (hi - lo) / n_bins
        idx = np.clip(((x - lo) / width).astype(np.int64), 0, n_bins - 1)
        counts = np.bincount(idx, minlength=n_bins).astype(np.int64)
        return pa.table({
            "counts": pa.array([counts.tobytes()], pa.binary()),
            "n": pa.array([x.size], pa.int64()),
        })

    counts = np.zeros(n_bins, dtype=np.int64)
    n = 0
    out = ds.map_batches(partial, batch_format="pyarrow")
    for b in out.iter_batches(batch_format="pyarrow"):
        for buf, bn in zip(b["counts"].to_pylist(), b["n"].to_pylist()):
            counts += np.frombuffer(buf, dtype=np.int64)
            n += int(bn)
    return HistogramSketch(float(lo), float(hi), counts, n)
