"""SmallFloat intToByte4/byte4ToInt conformance (Lucene 8.x norm encoding)."""

from __future__ import annotations

import numpy as np

from engine import smallfloat as sf


def test_exact_below_40():
    # values < 24 are free; with the 4-bit float, everything up to 39 encodes exactly
    for i in range(40):
        assert sf.byte4_to_int(sf.int_to_byte4(i)) == i


def test_monotone_and_idempotent():
    prev = -1
    for b in range(256):
        v = sf.byte4_to_int(b)
        assert v > prev
        prev = v
        assert sf.int_to_byte4(v) == b  # decode->encode is identity on representable values


def test_quantization_buckets():
    # each value maps to the largest representable value <= it
    for i in [0, 1, 23, 24, 39, 40, 41, 100, 255, 1000, 65535, 10**6, 2**31 - 1]:
        b = sf.int_to_byte4(i)
        lo = sf.byte4_to_int(b)
        assert lo <= i
        if b < 255:
            assert sf.byte4_to_int(b + 1) > i


def test_vectorized_matches_scalar():
    vals = np.concatenate([
        np.arange(0, 5000),
        np.array([10**5, 10**6, 2**20 - 1, 2**20, 2**25, 2**31 - 1]),
    ])
    enc = sf.encode_lengths(vals)
    expected = np.array([sf.int_to_byte4(int(v)) for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(enc, expected)
    dec = sf.decode_norms(enc)
    expected_dec = np.array([sf.byte4_to_int(int(b)) for b in expected])
    np.testing.assert_array_equal(dec, expected_dec)
