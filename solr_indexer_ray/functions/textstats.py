"""Text-analysis kernels for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

These extend the reference's per-record derived-field pattern (the ~18
``_extract_*`` projections of ``/root/reference/solrindexer/mmd.py``) to the
operations a large-scale corpus pipeline needs.  Every formula here is
deliberately simple and **deterministic**, and the starred ones are
reproducible in ANSI SQL so the driver's DuckDB oracle can verify them
(FIXTURES.md §4):

- ``token_count``*          — simple-analyzer token count
- ``punct_ratio``*          — share of chars outside ``[a-zA-Z0-9 ]``
- ``stopword_ratio``*       — share of tokens in the English stop set
- ``quality_score``*        — three discrete gates summed (SQL CASE-exact)
- ``lang_id``*              — distinct marker-word hits per language,
                              argmax with alphabetical tie-break
- ``fingerprint``           — order-sensitive polynomial rolling hash over
                              tokens (FNV-1a 64 per token, mod 2^61-1);
                              not SQL-expressible, verified in pytest
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solr_indexer_ray.functions.tokenize import simple_analyzer

STOPWORDS = (
    "the", "and", "of", "a", "to", "in", "is", "that", "it", "for",
)

#: marker words per language for the n-gram/stopword language heuristic;
#: scoring = number of DISTINCT markers present (set semantics — matches
#: SQL ``len(list_intersect(tokens, markers))``)
LANG_MARKERS = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por"),
    "fr": ("le", "la", "les", "et", "des", "une", "est", "dans"),
}

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
MERSENNE61 = (1 << 61) - 1
FP_BASE = 1_000_003


def fnv1a64(token: str) -> int:
    """FNV-1a 64-bit hash of a token (pure python, deterministic)."""
    h = FNV_OFFSET
    for byte in token.encode("utf-8"):
        h ^= byte
        h = (h * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def fingerprint(tokens) -> int:
    """Order-sensitive rolling hash: ``Σ fnv(tok_i)·B^i  mod 2^61-1``.

    A reordering-sensitive document fingerprint (reference analogue of the
    per-record checksum, ``solrindexer/mmd.py:851-858``, but over the
    *analyzed* token stream so formatting changes don't alter it).
    """
    h = 0
    power = 1
    for t in tokens:
        h = (h + (fnv1a64(t) % MERSENNE61) * power) % MERSENNE61
        power = (power * FP_BASE) % MERSENNE61
    return h


def punct_ratio(text: str) -> float:
    """Share of characters outside ``[a-zA-Z0-9 ]`` (0 for empty text)."""
    if not text:
        return 0.0
    clean = sum(1 for c in text if c.isascii() and (c.isalnum() or c == " "))
    return (len(text) - clean) / len(text)


def stopword_ratio(tokens) -> float:
    if not tokens:
        return 0.0
    stop = set(STOPWORDS)
    return sum(1 for t in tokens if t in stop) / len(tokens)


def quality_score(n_tokens: int, punct: float, stop: float) -> float:
    """Three discrete gates (SQL-CASE-exact, no float formula drift):
    0.5 if 10<=n_tokens<=1000, +0.25 if punct<0.1, +0.25 if 0.05<=stop<=0.6.
    """
    score = 0.0
    if 10 <= n_tokens <= 1000:
        score += 0.5
    if punct < 0.1:
        score += 0.25
    if 0.05 <= stop <= 0.6:
        score += 0.25
    return score


def repetition_stats(tokens) -> tuple:
    """Gopher-style repetition signals -> (dup_token_fraction,
    top_token_fraction): 1 - distinct/total, and the most frequent
    token's share.  High values mark boilerplate/spam for filtering."""
    n = len(tokens)
    if n == 0:
        return 0.0, 0.0
    counts: dict = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    return 1.0 - len(counts) / n, max(counts.values()) / n


def lang_id(tokens) -> str:
    """Marker-word language heuristic: count DISTINCT markers present per
    language; argmax, ties broken alphabetically; 'und' when nothing hits."""
    tokset = set(tokens)
    best_lang, best_hits = "und", 0
    for lang in sorted(LANG_MARKERS):
        hits = len(tokset & set(LANG_MARKERS[lang]))
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized-over-rows batch kernel appending all starred columns.

    Designed for ``map_batches(..., batch_format='pyarrow')`` over the
    ``documents`` table (or the corpus with ``text_col='content'``).
    """
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_tokens = np.zeros(n, dtype=np.int64)
    punct = np.zeros(n, dtype=np.float64)
    stop = np.zeros(n, dtype=np.float64)
    quality = np.zeros(n, dtype=np.float64)
    langs = [None] * n
    fps = np.zeros(n, dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = simple_analyzer(text or "")
        n_tokens[i] = len(toks)
        punct[i] = punct_ratio(text or "")
        stop[i] = stopword_ratio(toks)
        quality[i] = quality_score(len(toks), punct[i], stop[i])
        langs[i] = lang_id(toks)
        fps[i] = fingerprint(toks)
    for name, arr in (
        ("n_tokens", pa.array(n_tokens, pa.int64())),
        ("punct_ratio", pa.array(punct, pa.float64())),
        ("stopword_ratio", pa.array(stop, pa.float64())),
        ("quality_score", pa.array(quality, pa.float64())),
        ("lang_guess", pa.array(langs, pa.string())),
        ("fingerprint", pa.array(fps.astype(np.int64), pa.int64())),
    ):
        batch = batch.append_column(name, arr)
    return batch
