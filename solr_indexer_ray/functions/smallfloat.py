"""Lucene SmallFloat document-length ("norm") quantization.

Lucene stores each document's field length as ONE byte per document
(``SmallFloat.intToByte4``) and decodes it at scoring time
(``SmallFloat.byte4ToInt``).  BM25 scores therefore depend on the *lossy*
decoded length, not the true length — to be rank-identical with Lucene/Solr
BM25 (the reference's ranking backend, consumed over HTTP in
``/root/reference/solrindexer/search.py:125-140``) we must replicate the
quantization exactly.  Algorithm re-implemented from the public Lucene
documentation/source semantics (org.apache.lucene.util.SmallFloat, Lucene 8+):

- values 0..NUM_FREE_VALUES-1 are stored exactly;
- larger values keep 4 significant bits (a 3-bit mantissa with an implicit
  leading bit plus a shift), a "float-like" encoding that preserves ordering.

``NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 24``.
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # 255 - long_to_int4(2**31 - 1) == 255 - 231


def long_to_int4(i: int) -> int:
    """Scalar reference implementation (Lucene ``SmallFloat.longToInt4``)."""
    if i < 0:
        raise ValueError("only positive values supported")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    """Scalar inverse (Lucene ``SmallFloat.int4ToLong``)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode a positive int (document length) into an unsigned norm byte."""
    if i < 0:
        raise ValueError("only positive values supported")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned norm byte back to the (lossy) document length."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# Precomputed decode table: norm byte (0..255) -> decoded length.
DECODE_TABLE: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.int64
)


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``int_to_byte4`` over an int array -> uint8 norm bytes.

    Uses ``np.frexp`` for bit_length (exact for values < 2**53; document
    lengths are far below that).
    """
    v = np.asarray(lengths, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("only positive lengths supported")
    out = np.empty(v.shape, dtype=np.uint8)

    small = v < NUM_FREE_VALUES
    out[small] = v[small]

    big = ~small
    if big.any():
        w = v[big] - NUM_FREE_VALUES
        # bit_length(w): frexp returns (m, e) with w = m * 2**e, 0.5 <= m < 1
        nbits = np.frexp(w.astype(np.float64))[1]
        sub = nbits < 4  # w in [0, 7]
        enc = np.empty(w.shape, dtype=np.int64)
        enc[sub] = w[sub]
        norm = ~sub
        shift = nbits[norm] - 4
        enc[norm] = ((w[norm] >> shift) & 0x07) | ((shift + 1) << 3)
        out[big] = (NUM_FREE_VALUES + enc).astype(np.uint8)
    return out


def decode_norms(norms: np.ndarray) -> np.ndarray:
    """Vectorized decode: uint8 norm bytes -> int64 lossy lengths."""
    return DECODE_TABLE[np.asarray(norms, dtype=np.uint8)]
