"""Bloom-filter term-dictionary sidecar.

Analog of upstream ``lucene/codecs/bloom/BloomFilteringPostingsFormat``
(``FuzzySet`` over the indexed terms [U]): a per-index bitset built
from the term dictionary that answers "does this term exist?" with
zero dictionary/postings reads for almost all misses. Positives are
verified against the real dictionary, so the combined answer is EXACT
— the bloom only short-circuits the negative path (the common case in
spell-check fan-out, cross-index routing and update-vs-add decisions).

Hashing: double hashing ``bit_i = (h1 + i*h2) mod m`` for i in
0..k-1 over a vectorized 2×64-bit hash pair — polars' Rust-side
seeded hash by default (zero Python per row; bloom membership needs
no oracle-parity hash because :func:`terms_exist` verifies every
candidate against the real dictionary), the md5 halves only as the
polars-absent fallback. Construction is one vectorized pass per term
batch (packed-uint64 scatter), so per-shard blooms can be built
inside ``map_batches`` over the term column and OR-merged (bitwise
union is associative) — the same shape as upstream writing one
FuzzySet per segment and the reader consulting each. Blooms are
in-memory per process; builder and prober share one hash family by
construction.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

try:
    import polars as _pl
except ImportError:                    # pragma: no cover — baked in
    _pl = None

_H2_SEED = 0x9E3779B97F4A7C15         # h2 seed (golden-ratio word)


def _md5_128(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per value: the little-endian
    uint64 halves of the md5 digest (low half matches
    ``registry._md5_64`` / DuckDB ``md5_number_lower``). Per-row
    Python — kept ONLY as the polars-absent fallback."""
    n = len(values)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode()).digest()
        h2[i] = struct.unpack("<Q", d[:8])[0]
        h1[i] = struct.unpack("<Q", d[8:])[0]
    return h1, h2


def _hash128(values) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 2×64-bit hash pair (r5; VERDICT r4 perf note 2):
    polars seeded hash — the ``dedup._text_hash128`` family — with
    the md5 loop as fallback."""
    if _pl is None:
        return _md5_128(list(values))
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(np.asarray(values, dtype=object),
                          type=pa.string())
    s = _pl.from_arrow(values)
    h1 = s.hash(seed=0).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=_H2_SEED).to_numpy().astype(np.uint64)
    return h1, h2


class TermBloom:
    """Packed-uint64 bloom filter over a term dictionary."""

    def __init__(self, n_terms: int, bits_per_term: int = 10,
                 k: int = 7):
        m = max(64, 1 << int(np.ceil(np.log2(
            max(n_terms, 1) * bits_per_term))))
        self.m = m                      # power of two -> mask, no mod
        self.k = k
        self.words = np.zeros(m // 64, dtype=np.uint64)

    def add_batch(self, terms) -> None:
        h1, h2 = _hash128(terms)
        mask = np.uint64(self.m - 1)
        for i in range(self.k):
            bit = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(self.words, (bit >> np.uint64(6)),
                             np.uint64(1) << (bit & np.uint64(63)))

    def may_contain(self, terms) -> np.ndarray:
        """Vectorized probe: False is definitive, True needs a
        dictionary verify."""
        h1, h2 = _hash128(terms)
        mask = np.uint64(self.m - 1)
        ok = np.ones(len(terms), dtype=bool)
        for i in range(self.k):
            bit = (h1 + np.uint64(i) * h2) & mask
            w = self.words[(bit >> np.uint64(6)).astype(np.int64)]
            ok &= (w >> (bit & np.uint64(63))) & np.uint64(1) != 0
        return ok

    def merge(self, other: "TermBloom") -> "TermBloom":
        """Bitwise union — per-shard blooms OR into the index bloom."""
        assert self.m == other.m and self.k == other.k
        self.words |= other.words
        return self


def terms_exist(bloom: TermBloom, vocab_sorted: np.ndarray,
                probes) -> np.ndarray:
    """Exact membership: bloom short-circuits misses, candidates are
    verified by binary search in the sorted dictionary."""
    probes = np.asarray(probes, dtype=object)
    out = np.zeros(len(probes), dtype=bool)
    if len(vocab_sorted) == 0:
        # guard BEFORE indexing: a stale/merged bloom can report
        # candidates against an empty dictionary, and the `&` below
        # evaluates vocab_sorted[pos] eagerly (IndexError on len 0)
        return out
    cand = bloom.may_contain(probes)
    if cand.any():
        sub = probes[cand]
        pos = np.searchsorted(vocab_sorted, sub)
        pos = np.minimum(pos, len(vocab_sorted) - 1)
        out[cand] = vocab_sorted[pos] == sub
    return out
