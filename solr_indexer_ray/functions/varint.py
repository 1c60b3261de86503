"""Vectorized LEB128 varint + delta codecs for posting lists.

Posting doc-id lists are stored delta-encoded then varint-packed into a
single Arrow ``binary`` value per (term, doc-range) row; term frequencies are
varint-packed directly.  Pure-numpy group-by-byte-position implementation —
no per-value Python loop (the loops below are over *byte positions* (<=10)
not values), which keeps encode/decode throughput in the tens of millions of
integers per second, fast enough that index build time is dominated by
tokenization, not the codec (SURVEY.md §7.3 "Compression in Python").
"""

from __future__ import annotations

import numpy as np

_SHIFTS = [np.uint64(7 * j) for j in range(10)]


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array to LEB128 varint bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    vmax = int(v.max())
    if vmax < 0x80:
        # all-1-byte fast path: one cast, no length bookkeeping (dense
        # gap streams and most position deltas land here)
        return v.astype(np.uint8).tobytes()
    # bytes per value by threshold comparisons — only as many passes as
    # the LARGEST value needs (no float frexp conversion), and uint8
    # bookkeeping throughout: fresh page-faulted allocations dominate
    # kernel cost on this class of host, so intermediates stay 1 byte
    # per value wherever the math allows
    nbytes = np.ones(v.size, dtype=np.uint8)
    max_len = 1
    bound = 0x80
    while bound <= vmax:
        nbytes += v >= bound
        bound <<= 7
        max_len += 1
    offsets = np.cumsum(nbytes, dtype=np.int64)
    total = int(offsets[-1])
    offsets -= nbytes  # in-place: reuse the cumsum buffer
    out = np.zeros(total, dtype=np.uint8)
    # first byte of EVERY value: low-byte cast (== & 0x7F after masking)
    first = v.astype(np.uint8)
    first &= 0x7F
    first |= (nbytes > 1).view(np.uint8) << np.uint8(7)
    out[offsets] = first
    for j in range(1, max_len):
        m = nbytes > j
        chunk = (v[m] >> _SHIFTS[j]).astype(np.uint8)
        chunk &= 0x7F
        chunk |= (nbytes[m] - np.uint8(1) > j).view(np.uint8) << np.uint8(7)
        out[offsets[m] + j] = chunk
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 varint bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if int(b.max()) < 0x80:
        # all-1-byte fast path: dense postings delta to tiny gaps and most
        # position deltas are < 128, so whole streams decode as one pass
        # (no continuation bits set -> the bytes ARE the values; the max()
        # reduction avoids materializing a bit-mask temp)
        return b.astype(np.uint64)
    cont = b >= 0x80
    if not cont[-1] and not (cont[:-1] & cont[1:]).any():
        # (a trailing continuation byte — truncated stream — falls to the
        # general path, which drops the partial value like before)
        # <=2-byte fast path (values < 2^14 — position streams whose
        # only multi-byte entries are segment-first absolutes): combine
        # each continuation byte into its terminal neighbour by a sparse
        # scatter, then compress terminals — uint16 temps throughout, no
        # per-value int64 index arrays
        v = (b & 0x7F).astype(np.uint16)
        idx = np.flatnonzero(cont)
        if idx.size:
            # reads hit continuation slots, writes hit terminal slots —
            # disjoint, so adjacent 2-byte values can't interfere
            v[idx + 1] = (v[idx + 1] << 7) | v[idx]
        return v[~cont].astype(np.uint64)
    ends = np.flatnonzero(~cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    # gather each value's FIRST byte, then mask/widen only the gathered
    # n_values array (never a full-stream uint64 payload copy); assemble
    # ONLY the (rare) multi-byte values — gap streams are overwhelmingly
    # 1-byte, so the j>=1 passes should not pay full-stream masked gathers
    out = (b[starts] & 0x7F).astype(np.uint64)
    multi = np.flatnonzero(lengths > 1)
    if multi.size:
        mlen = lengths[multi]
        mstart = starts[multi]
        for j in range(1, int(mlen.max())):
            m = mlen > j
            out[multi[m]] |= (
                (b[mstart[m] + j] & 0x7F).astype(np.uint64) << _SHIFTS[j]
            )
    return out


def varint_cumsum(buf: bytes) -> np.ndarray:
    """Cumulative sum of the decoded varint stream as int64.

    For all-1-byte streams (the common position-delta case) the raw
    bytes feed ``cumsum`` directly — no intermediate uint64 payload is
    ever materialized.  (A chunked-thread variant was measured and
    reverted: ``np.cumsum`` holds the GIL, unlike searchsorted/gather,
    so chunking bought nothing.)"""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    if int(b.max()) < 0x80:
        return np.cumsum(b, dtype=np.int64)
    return np.cumsum(varint_decode(buf), dtype=np.int64)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """First value + successive gaps; input must be strictly increasing."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    return np.concatenate(([v[0]], np.diff(v))).astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` -> int64 doc ids."""
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64).astype(np.int64)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Strictly-increasing doc ids -> delta-varint bytes."""
    return varint_encode(delta_encode(doc_ids))


def decode_doc_ids(buf: bytes) -> np.ndarray:
    """Delta-varint bytes -> int64 doc ids."""
    return delta_decode(varint_decode(buf))


def encode_positions(counts: np.ndarray, flat: np.ndarray) -> bytes:
    """Per-posting delta-encode concatenated position lists -> varint bytes.

    ``flat`` is all positions concatenated in posting order; ``counts`` the
    per-posting list lengths (== tfs).  Each segment restarts the delta at
    its absolute first position.
    """
    flat = np.asarray(flat, dtype=np.int64)
    if flat.size == 0:
        return b""
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=deltas[1:])
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    deltas[starts] = flat[starts]
    return varint_encode(deltas)


def decode_positions(buf: bytes, counts: np.ndarray):
    """Inverse of :func:`encode_positions` -> (flat positions, offsets).

    Fully vectorized: cumulative sum over the whole delta stream, then each
    segment is rebased by subtracting the running total before its start.
    """
    deltas = varint_decode(buf).astype(np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    if deltas.size == 0:
        return deltas, offsets
    cs = np.cumsum(deltas)
    starts = offsets[:-1]
    base = cs[starts] - deltas[starts]
    flat = cs - np.repeat(base, counts)
    return flat, offsets

def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (ceil(bit_length/7), min 1) — lets a
    caller slice one big :func:`varint_encode` stream into per-segment
    blobs without re-encoding."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.int64)
    # threshold comparisons, only as many passes as the LARGEST value
    # needs — mirrors varint_encode's bookkeeping (the float frexp form
    # paid an 8-byte conversion pass even when every value was 1 byte)
    nbytes = np.ones(v.size, dtype=np.int64)
    vmax = int(v.max())
    bound = 0x80
    while bound <= vmax:
        nbytes += v >= bound
        bound <<= 7
    return nbytes


def varint_byte_offsets(values: np.ndarray, at: np.ndarray) -> np.ndarray:
    """Byte offsets into ``varint_encode(values)``'s stream at the given
    value indices — WITHOUT materializing a per-value byte-length cumsum.

    offset(i) = i + (extra bytes of every multi-byte value before i); the
    multi-byte values are rare in delta streams, so the extras are summed
    over just their positions and looked up per boundary by searchsorted.
    """
    v = np.asarray(values, dtype=np.uint64)
    at = np.asarray(at, dtype=np.int64)
    big = np.flatnonzero(v >= 0x80)
    if big.size == 0:
        return at.astype(np.int64, copy=True)
    vb = v[big]
    extra = np.ones(big.size, dtype=np.int64)  # 2nd byte of every big value
    vmax = int(vb.max())
    bound = 0x4000
    while bound <= vmax:
        extra += vb >= bound
        bound <<= 7
    cum = np.cumsum(extra)
    pos = np.searchsorted(big, at)
    out = at.copy()
    nz = pos > 0
    out[nz] += cum[pos[nz] - 1]
    return out


def segmented_delta_encode(counts: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Per-segment delta encoding (each segment restarts at its absolute
    first value) — the shared primitive behind doc-id and position packing."""
    flat = np.asarray(flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if flat.size == 0:
        return flat.astype(np.uint64)
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=deltas[1:])
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    starts = starts[counts > 0]
    deltas[starts] = flat[starts]
    # nonnegative int64 -> uint64 is a bit-identical reinterpret; the
    # view saves a full-stream copy on the position path
    return deltas.view(np.uint64)
