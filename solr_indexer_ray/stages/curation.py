"""Training-data curation operators: benchmark decontamination and
deterministic mixture sampling.

Two standard steps of an LLM data pipeline the reference has no analogue
for (beyond-reference per the brief; the reference's closest precedent is
validation-gated ingestion, ``/root/reference/solrindexer/indexer.py:132-389``):

- :func:`decontaminate` — flag/drop corpus docs sharing n-gram shingles
  with an evaluation benchmark (the GPT-3/PaLM-style 8-gram to 13-gram
  overlap rule).  Ray shape: the BENCHMARK side is small by definition →
  its distinct shingle-hash set collects once and broadcasts via
  ``ray.put``; the corpus STREAMS through a ``map_batches`` flagger
  (sorted-array ``searchsorted`` membership, no shuffle, no corpus
  materialization).
- :func:`sample_mixture` — per-domain weighted subsampling to a target
  mixture (domain reweighting).  Acceptance is a pure function of the
  row key — ``md5(doc_id)`` mapped to [0, 1) against the domain's rate —
  so the sample is deterministic, resumable, and exactly reproducible by
  the DuckDB oracle (no RNG state anywhere).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from solr_indexer_ray.functions.hashing import shingle_hashes
from solr_indexer_ray.functions.tokenize import simple_analyzer


def benchmark_shingles(benchmark_ds, text_col: str = "text",
                       n: int = 8) -> np.ndarray:
    """Distinct sorted shingle hashes of the benchmark set (small side).

    Streams the benchmark through per-batch shingling; only the distinct
    hash set (bounded by the benchmark's total n-gram count) reaches the
    driver.
    """
    def shingle_batch(batch: pa.Table) -> pa.Table:
        out = [
            shingle_hashes(simple_analyzer(t or ""), n)
            for t in batch[text_col].to_pylist()
        ]
        flat = (
            np.unique(np.concatenate(out)) if out
            else np.empty(0, np.uint64)
        )
        return pa.table({"shingle": pa.array(flat, pa.uint64())})

    parts = benchmark_ds.map_batches(
        shingle_batch, batch_format="pyarrow"
    ).take_all()
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.array([r["shingle"] for r in parts], np.uint64))


def decontaminate(
    ds,
    benchmark_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_matches: int = 1,
    mode: str = "flag",
):
    """Flag (or drop) corpus docs overlapping the benchmark by >=
    ``min_matches`` distinct n-gram shingles.

    ``mode="flag"`` returns ``(id_col, n_matched, contaminated)`` rows;
    ``mode="drop"`` returns the clean subset of the input rows.  The
    benchmark shingle set broadcasts once; each corpus batch runs a
    vectorized ``searchsorted`` membership — the corpus never shuffles.
    """
    import ray

    if mode not in ("flag", "drop"):
        raise ValueError(f"unknown mode: {mode!r}")
    bench = np.sort(benchmark_shingles(benchmark_ds, text_col, n))
    ref = ray.put(bench)

    def matched_counts(batch: pa.Table) -> np.ndarray:
        b = ray.get(ref)
        out = np.zeros(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            sh = shingle_hashes(simple_analyzer(t or ""), n)
            if sh.size and b.size:
                idx = np.searchsorted(b, sh)
                idx[idx == b.size] = 0
                out[i] = int((b[idx] == sh).sum())
        return out

    if mode == "drop":
        def keep_clean(batch: pa.Table) -> pa.Table:
            m = matched_counts(batch)
            return batch.filter(pa.array(m < min_matches))

        return ds.map_batches(keep_clean, batch_format="pyarrow")

    def flag(batch: pa.Table) -> pa.Table:
        m = matched_counts(batch)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_matched": pa.array(m, pa.int64()),
                "contaminated": pa.array(m >= min_matches, pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def accept_fraction(doc_id: int) -> float:
    """Deterministic uniform-[0,1) acceptance coordinate of a row:
    the first 8 hex digits of md5(str(doc_id)) / 2^32 — the same value
    DuckDB computes as ``('0x' || substr(md5(id::VARCHAR),1,8))::UINT64
    / 4294967296.0``, so samples are oracle-reproducible."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def sample_mixture(
    ds,
    rates: dict,
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
):
    """Deterministic per-domain subsampling: keep a row iff
    ``accept_fraction(id) < rate[key]`` (``default_rate`` for unlisted
    domains).  A pure row-local filter — streams, no shuffle, exactly
    resumable, and domain proportions converge to the configured
    mixture."""
    for k, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keys = batch[key_col].to_pylist()
        mask = np.array(
            [
                accept_fraction(i) < rates.get(k, default_rate)
                for i, k in zip(ids, keys)
            ],
            dtype=bool,
        )
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
