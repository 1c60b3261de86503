"""Content hashing, shingling, MinHash, SimHash — dedup primitives.

All deterministic, no native hash libs: token/shingle hashing is FNV-1a 64
(:mod:`solr_indexer_ray.functions.textstats`), MinHash permutations are the
standard universal-hash family ``(a·x + b) mod p`` over a Mersenne prime.
The reference has no near-dedup (SURVEY.md §2.8) — exact identity there is
Solr's upsert-by-id; these primitives extend that to content-level identity
for training-data pipelines.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

from solr_indexer_ray.functions.textstats import fnv1a64

MERSENNE61 = (1 << 61) - 1


def term_shard(term: str, n_shards: int) -> int:
    """Deterministic, process-stable term shard (NOT Python ``hash``, which
    is salted per process) — the postings shuffle/layout key."""
    return zlib.crc32(term.encode("utf-8")) % n_shards


def sha256_hex(text: str) -> str:
    """Per-row content integrity hash (reference analogue: checksum field,
    ``solrindexer/mmd.py:851-858``)."""
    return hashlib.sha256((text or "").encode("utf-8")).hexdigest()


def shingle_hashes(tokens, n: int = 3) -> np.ndarray:
    """Distinct hashed n-gram shingles of a token sequence (uint64).

    Documents shorter than ``n`` tokens hash their full token tuple once, so
    short docs still participate in dedup.
    """
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < n:
        grams = [" ".join(tokens)]
    else:
        grams = {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}
    return np.fromiter(
        (fnv1a64(g) for g in grams), dtype=np.uint64, count=len(grams)
    )


#: MinHash works in the Mersenne-31 field: operands < 2^31 so every
#: ``a·x + b`` fits in uint64 and the whole signature computes as one
#: vectorized (num_perm × num_shingles) broadcast — no Python loop over
#: shingles, no big-int fallback.  31-bit hash space is ample for
#: similarity estimation (collision prob ~ n/2^31 per pair).
MERSENNE31 = (1 << 31) - 1


def minhash_params(num_perm: int, seed: int = 1) -> tuple:
    """Deterministic (a, b) coefficient vectors for the permutation family."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: ``min over shingles of (a·x + b) mod 2^31-1``."""
    num_perm = a.size
    if shingles.size == 0:
        return np.full(num_perm, MERSENNE31, dtype=np.uint64)
    x = shingles.astype(np.uint64) % np.uint64(MERSENNE31)
    # (num_perm, num_shingles) broadcast, all in uint64 without overflow
    v = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(MERSENNE31)
    return v.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list:
    """LSH banding: hash each contiguous band of the signature to a bucket
    key ``(band_index, band_hash)`` encoded as a string."""
    rows = sig.size // bands
    out = []
    for bi in range(bands):
        chunk = sig[bi * rows:(bi + 1) * rows]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        out.append(f"{bi}:{h}")
    return out


def simhash64(token_counts: dict) -> int:
    """64-bit SimHash over weighted token hashes."""
    votes = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok, w in token_counts.items():
        h = np.uint64(fnv1a64(tok))
        bits = (h >> shifts) & np.uint64(1)
        votes += np.where(bits.astype(bool), w, -w)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")


def simhash_band_keys(sig: int, bands: int = 4) -> list:
    """Split the 64-bit simhash into ``bands`` chunks; near-dups (hamming
    distance < bands) share at least one chunk (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"{bi}:{(sig >> (bi * width)) & mask:x}" for bi in range(bands)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
