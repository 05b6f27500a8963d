"""Codec property tests (FIXTURES.md F5): VByte/delta round-trip, block directory."""

from __future__ import annotations

import numpy as np
import pytest

from engine import codec


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("n", [0, 1, 5, 127, 128, 129, 1000, 10000])
def test_vbyte_roundtrip(n):
    vals = RNG.integers(0, 2**31 - 1, size=n)
    buf = codec.vbyte_encode(vals)
    out, end = codec.vbyte_decode(buf, n)
    assert end == len(buf)
    np.testing.assert_array_equal(out, vals)


def test_vbyte_boundary_values():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 2**31 - 1])
    buf = codec.vbyte_encode(vals)
    # 0..127 -> 1 byte, 128..16383 -> 2 bytes, etc.
    assert len(buf) == 1 + 1 + 1 + 2 + 2 + 3 + 3 + 4 + 5
    out, _ = codec.vbyte_decode(buf, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_delta_roundtrip():
    a = np.unique(RNG.integers(0, 10**9, size=5000))
    np.testing.assert_array_equal(codec.delta_decode(codec.delta_encode(a)), a)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 257, 10000])
def test_encode_postings_roundtrip(n):
    doc_ids = np.sort(RNG.choice(10 * n, size=n, replace=False)).astype(np.int64)
    tfs = RNG.integers(1, 20, size=n).astype(np.int64)
    norms = RNG.integers(0, 256, size=n).astype(np.uint8)
    positions = np.concatenate(
        [np.sort(RNG.choice(500, size=int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    enc = codec.encode_postings(doc_ids, tfs, norms, positions)

    assert enc.df == n
    assert enc.cf == int(tfs.sum())

    docs, tfs2, norms2 = codec.decode_all(enc)
    np.testing.assert_array_equal(docs, doc_ids)
    np.testing.assert_array_equal(tfs2, tfs)
    np.testing.assert_array_equal(norms2, norms)

    # per-block decode matches the slice of the full list
    nblocks = (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    assert enc.blk_last_doc.size == nblocks
    for b in range(nblocks):
        s, e = b * codec.BLOCK_SIZE, min((b + 1) * codec.BLOCK_SIZE, n)
        bdocs, btfs = codec.decode_block(
            enc.docs, enc.tfs, enc.blk_doc_off, enc.blk_tf_off, enc.blk_last_doc, b, n
        )
        np.testing.assert_array_equal(bdocs, doc_ids[s:e])
        np.testing.assert_array_equal(btfs, tfs[s:e])
        assert enc.blk_last_doc[b] == doc_ids[e - 1]
        assert enc.blk_max_tf[b] == tfs[s:e].max()
        assert enc.blk_min_norm[b] == norms[s:e].min()

    # positions round-trip
    plists = codec.decode_positions(enc.poss, tfs)
    cuts = np.concatenate(([0], np.cumsum(tfs)))
    for i, pl in enumerate(plists):
        np.testing.assert_array_equal(pl, positions[cuts[i]:cuts[i + 1]])


def test_encode_postings_empty_raises():
    with pytest.raises(ValueError):
        codec.encode_postings(np.array([]), np.array([]), np.array([]), np.array([]))
