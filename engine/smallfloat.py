"""Lossy small-int encoding for document-length norms.

Reimplements the public Lucene 8.x ``SmallFloat.intToByte4`` /
``byte4ToInt`` scheme (SURVEY.md §1.1 "Norms"; upstream
``lucene/core/.../util/SmallFloat.java`` [U]): a monotone map from a
non-negative int to one byte — values below 24 are exact, larger
values keep 3 mantissa bits + an implicit leading bit (a 4-bit
"float"). BM25 scores against the *decoded* lossy length, so rank
parity with the reference requires this exact table (SURVEY.md §7
"hard parts").
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"only positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode doc length -> norm byte (0..255, monotone)."""
    if i < 0:
        raise ValueError(f"only positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode norm byte (0..255) -> quantized doc length."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# Decode table indexed by the norm byte — the scorer's LENGTH_TABLE.
LENGTH_TABLE: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.int64
)

# Values below this encode exactly through a byte (encode table bound).
_ENC_TABLE_MAX = 1 << 20
_ENC_TABLE: np.ndarray | None = None


def _enc_table() -> np.ndarray:
    global _ENC_TABLE
    if _ENC_TABLE is None:
        v = np.arange(_ENC_TABLE_MAX, dtype=np.int64)
        _ENC_TABLE = encode_lengths_slow(v)
    return _ENC_TABLE


def encode_lengths_slow(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array (any magnitude)."""
    i = np.asarray(lengths, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("negative doc length")
    out = np.empty(i.shape, dtype=np.uint8)
    small = i < NUM_FREE_VALUES
    out[small] = i[small].astype(np.uint8)
    big = ~small
    if np.any(big):
        x = i[big] - NUM_FREE_VALUES
        # num_bits via frexp: exact for ints < 2**53
        _, exp = np.frexp(x.astype(np.float64))
        num_bits = exp.astype(np.int64)  # bit_length(x) for x > 0; 0 for x == 0
        sub = num_bits < 4
        enc = np.where(sub, x, 0)
        shift = np.maximum(num_bits - 4, 0)
        normal = ((x >> shift) & 0x07) | ((shift + 1) << 3)
        enc = np.where(sub, enc, normal)
        out[big] = (NUM_FREE_VALUES + enc).astype(np.uint8)
    return out


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Fast table-based encode for typical doc lengths (< 2**20)."""
    i = np.asarray(lengths, dtype=np.int64)
    if i.size == 0:
        return np.empty(0, dtype=np.uint8)
    if int(i.max()) < _ENC_TABLE_MAX and int(i.min()) >= 0:
        return _enc_table()[i]
    return encode_lengths_slow(i)


def decode_norms(norms: np.ndarray) -> np.ndarray:
    """norm bytes (uint8 array) -> quantized doc lengths (int64)."""
    return LENGTH_TABLE[np.asarray(norms, dtype=np.uint8)]
