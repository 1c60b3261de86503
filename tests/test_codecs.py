"""Unit tests: SmallFloat norms and varint/delta posting codecs."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_indexer_ray.functions import smallfloat as sf
from solr_indexer_ray.functions import varint as vi


class TestSmallFloat:
    def test_small_values_exact(self):
        for i in range(sf.NUM_FREE_VALUES):
            assert sf.byte4_to_int(sf.int_to_byte4(i)) == i

    def test_monotone_and_lossy(self):
        prev = -1
        for i in range(0, 100000, 7):
            b = sf.int_to_byte4(i)
            assert 0 <= b <= 255
            dec = sf.byte4_to_int(b)
            assert dec <= i  # decode rounds down
            assert dec >= prev
            prev = dec

    def test_known_boundaries(self):
        # first non-exact value
        assert sf.int_to_byte4(23) == 23
        assert sf.byte4_to_int(sf.int_to_byte4(23)) == 23
        # int4 codec: 4 significant bits preserved
        assert sf.long_to_int4(2**31 - 1) == 231
        assert sf.NUM_FREE_VALUES == 24

    def test_vectorized_matches_scalar(self):
        lengths = np.array(
            [0, 1, 23, 24, 25, 31, 32, 100, 1000, 12345, 10**6, 2**30]
        )
        enc = sf.encode_lengths(lengths)
        for i, v in enumerate(lengths):
            assert enc[i] == sf.int_to_byte4(int(v)), v
        dec = sf.decode_norms(enc)
        for i, v in enumerate(lengths):
            assert dec[i] == sf.byte4_to_int(sf.int_to_byte4(int(v)))

    @given(st.integers(min_value=0, max_value=2**31 - 1))
    @settings(max_examples=300, deadline=None)
    def test_roundtrip_bound(self, i):
        dec = sf.byte4_to_int(sf.int_to_byte4(i))
        assert 0 <= dec <= i
        # 4 significant bits -> relative error < 1/8 above the exact range
        if i >= sf.NUM_FREE_VALUES:
            assert dec > i - max(1, i // 7)


class TestVarint:
    def test_empty(self):
        assert vi.varint_encode(np.array([], dtype=np.int64)) == b""
        assert vi.varint_decode(b"").size == 0

    def test_roundtrip_known(self):
        vals = np.array([0, 1, 127, 128, 300, 2**21 - 1, 2**21, 2**40])
        assert (vi.varint_decode(vi.varint_encode(vals)) == vals).all()

    @given(
        st.lists(st.integers(min_value=0, max_value=2**53 - 1), max_size=200)
    )
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_random(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        out = vi.varint_decode(vi.varint_encode(arr))
        assert (out == arr).all()

    def test_doc_id_delta_roundtrip(self):
        ids = np.cumsum(
            np.random.default_rng(0).integers(1, 1000, size=5000)
        ).astype(np.int64)
        buf = vi.encode_doc_ids(ids)
        assert (vi.decode_doc_ids(buf) == ids).all()
        # delta-varint compresses well for dense ids
        assert len(buf) < ids.size * 3

    def test_delta_requires_increasing_output_ok(self):
        ids = np.array([5])
        assert (vi.decode_doc_ids(vi.encode_doc_ids(ids)) == ids).all()


class TestVarintFastPaths:
    def test_two_byte_boundaries(self):
        # the <=2-byte specialization: adjacent 2-byte values, 1/2-byte
        # interleaves, and the 14-bit boundary that exits it
        for vals in ([128], [128, 129], [127, 128, 16383],
                     [16383] * 5, [0, 16383, 1, 128, 127],
                     [16384], [5, 16384, 130]):
            arr = np.asarray(vals, dtype=np.uint64)
            assert np.array_equal(
                vi.varint_decode(vi.varint_encode(arr)), arr
            ), vals

    def test_varint_cumsum_matches_decode(self):
        rng = np.random.default_rng(9)
        for hi in (127, 300, 16383, 1 << 20):
            arr = rng.integers(0, hi + 1, 500).astype(np.uint64)
            buf = vi.varint_encode(arr)
            assert np.array_equal(
                vi.varint_cumsum(buf),
                np.cumsum(vi.varint_decode(buf), dtype=np.int64),
            ), hi
        assert vi.varint_cumsum(b"").size == 0
