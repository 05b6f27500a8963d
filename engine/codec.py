"""Posting-list codec: delta + variable-byte, 128-doc blocks, block-max metadata.

Ray-native re-expression of the reference's postings format (SURVEY.md
§2.3): docIDs and positions are delta-encoded then VByte-encoded (the
7-bits-per-byte, continuation-bit scheme of upstream
``DataOutput#writeVInt`` [U]); every 128 postings a block-directory
entry records ``(last_doc, byte offsets, max_tf, min_norm)`` — serving
both skip-list ``advance()`` and block-max WAND pruning (upstream
``MultiLevelSkipListWriter`` / ``Lucene50ScoreSkipReader`` [U]).
Storing ``(max_tf, min_norm)`` per block keeps the bound independent
of the BM25 parameters (k1, b stay query-time knobs), analogous to the
reference's competitive (freq, norm) impact pairs.

All encode/decode paths are numpy-vectorized; blobs live in Arrow
``binary`` cells so index shards are plain Parquet.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------- VByte

def vbyte_encode_with_ends(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """VByte-encode a non-negative int array (vectorized).

    Low 7 bits first; high bit set on every byte except the last of
    each value (same layout as the reference's writeVInt). Also
    returns the cumulative byte offset AFTER each value — callers use
    it to cut block boundaries out of one encoded stream instead of
    encoding block-by-block.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # all-1-byte fast path (typical tf / position-delta / dense-doc
    # streams): no length table, no scatter, two allocations total —
    # matters on this box where large temporaries stall on THP faults
    if bool((v < np.uint64(128)).all()):
        return v.astype(np.uint8).tobytes(), \
            np.arange(1, v.size + 1, dtype=np.int64)
    # bytes needed per value: ceil(bit_length / 7), min 1
    _, exp = np.frexp(v.astype(np.float64))
    nbits = np.maximum(exp.astype(np.int64), 1)
    nbytes = (nbits + 6) // 7
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for p in range(max_b):
        mask = nbytes > p
        chunk = ((v[mask] >> np.uint64(7 * p)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > p).astype(np.uint8) << 7
        out[starts[mask] + p] = chunk | cont
    return out.tobytes(), ends


def vbyte_encode(values: np.ndarray) -> bytes:
    return vbyte_encode_with_ends(values)[0]


def vbyte_decode(buf: bytes | memoryview | np.ndarray, count: int,
                 offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``count`` VByte values starting at byte ``offset``.

    Returns (values int64 array, byte offset after the last value).
    """
    if count == 0:
        return np.empty(0, dtype=np.int64), offset
    # a uint64 VByte value is at most 10 bytes, so `count` values live
    # inside the next count*10 bytes — bounding the view keeps a
    # mid-stream block decode O(block), not O(remaining stream)
    b = np.frombuffer(buf, dtype=np.uint8)[offset:offset + count * 10]
    is_last = b < 128
    # all-1-byte fast path: the first `count` bytes ARE the values
    if count <= len(b) and bool(is_last[:count].all()):
        return b[:count].astype(np.int64), offset + count
    ends = np.flatnonzero(is_last)
    if ends.size < count:
        raise ValueError("truncated vbyte stream")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    max_b = int(lengths.max())
    for p in range(max_b):
        mask = lengths > p
        vals[mask] |= (b[starts[mask] + p] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * p)
    return vals.astype(np.int64), offset + int(ends[-1]) + 1


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly/weakly increasing int array -> deltas (first kept as-is)."""
    a = np.asarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return a
    d = np.empty_like(a)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.int64))


# ------------------------------------------------------------- FOR codec
#
# Frame-of-Reference bitpacking, the reference's packed-ints block
# format (upstream ``Lucene50PostingsFormat`` / ``ForUtil`` [U]): every
# full 128-value block stores one width byte w = max bit length in the
# block, then the 128 values packed at w bits each (little-endian bit
# order within the stream); the final partial block stays VByte, the
# analog of upstream's vInt tail block. Positions always stay VByte
# (our position blocks align to POSTING blocks, not to 128-position
# frames, so fixed-width framing would not apply cleanly — documented
# boundary vs upstream, which frames positions separately).

def _bit_widths(maxima: np.ndarray) -> np.ndarray:
    """Bit length per value, clamped to [1, 63].

    Inputs are non-negative int64 (< 2^63), so 63 bits always suffice;
    the clamp also absorbs frexp's float-rounding overestimate near
    2^53+ (one extra bit, harmless for size, unsafe only past 63)."""
    _, exp = np.frexp(np.asarray(maxima, dtype=np.uint64).astype(np.float64))
    return np.clip(exp.astype(np.int64), 1, 63)


def for_encode_stream(values: np.ndarray, blk_start: np.ndarray,
                      blk_end: np.ndarray) -> tuple[bytes, np.ndarray]:
    """FOR-encode a stream tiled by blocks [blk_start[i], blk_end[i]).

    Blocks must tile ``values`` exactly and in order (the layout both
    posting encoders produce). Returns (blob, per-block byte start
    offsets, len nblocks+1 with the total last) — vectorized across
    blocks: one pack per distinct width, one VByte encode for all
    partial tails.
    """
    v = np.asarray(values, dtype=np.uint64)
    blk_start = np.asarray(blk_start, dtype=np.int64)
    blk_end = np.asarray(blk_end, dtype=np.int64)
    nblk = len(blk_start)
    if nblk == 0 or v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nvals = blk_end - blk_start
    full = nvals == BLOCK_SIZE

    widths = np.zeros(nblk, dtype=np.int64)
    if full.any():
        maxima = np.maximum.reduceat(v, blk_start)  # blocks tile the stream
        widths[full] = _bit_widths(maxima[full])

    # partial tails: ONE global VByte encode, per-block byte lengths
    tail_lens = np.zeros(nblk, dtype=np.int64)
    if (~full).any():
        p = np.flatnonzero(~full)
        lens = nvals[p]
        cml = np.concatenate(([0], np.cumsum(lens)))
        idx = (np.arange(cml[-1]) - np.repeat(cml[:-1], lens)
               + np.repeat(blk_start[p], lens))
        tail_blob, tail_ends = vbyte_encode_with_ends(v[idx])
        tail_bytes = np.frombuffer(tail_blob, dtype=np.uint8)
        tail_cut = np.concatenate(([0], tail_ends[cml[1:] - 1]))
        tail_lens[p] = np.diff(tail_cut)

    # 1 width byte + 128*w/8 == 16*w packed bytes per full block
    blk_bytes = tail_lens.copy()
    blk_bytes[full] = 1 + 16 * widths[full]
    offs = np.concatenate(([0], np.cumsum(blk_bytes)))
    out = np.zeros(int(offs[-1]), dtype=np.uint8)

    if full.any():
        f = np.flatnonzero(full)
        out[offs[f]] = widths[f].astype(np.uint8)
        for wv in np.unique(widths[f]):
            wb = f[widths[f] == wv]
            vals = v[blk_start[wb][:, None]
                     + np.arange(BLOCK_SIZE, dtype=np.int64)]
            bits = np.empty((len(wb), BLOCK_SIZE * wv), dtype=np.uint8)
            for k in range(int(wv)):
                bits[:, k::wv] = ((vals >> np.uint64(k))
                                  & np.uint64(1)).astype(np.uint8)
            packed = np.packbits(bits, axis=1, bitorder="little")
            dst = offs[wb][:, None] + 1 + np.arange(16 * wv,
                                                    dtype=np.int64)
            out[dst] = packed

    if (~full).any():
        dst = (np.repeat(offs[p], tail_lens[p])
               + (np.arange(int(tail_lens[p].sum()))
                  - np.repeat(np.cumsum(tail_lens[p]) - tail_lens[p],
                              tail_lens[p])))
        out[dst] = tail_bytes
    return out.tobytes(), offs


def for_decode_block(blob, offset: int, n: int) -> np.ndarray:
    """Decode one block at byte ``offset`` holding ``n`` values."""
    b = np.frombuffer(blob, dtype=np.uint8)
    if n < BLOCK_SIZE:
        vals, _ = vbyte_decode(blob, n, offset)
        return vals
    w = int(b[offset])
    return _for_unpack(b, np.array([offset + 1], dtype=np.int64),
                       w).ravel()


def _for_unpack(b: np.ndarray, data_start: np.ndarray,
                w: int) -> np.ndarray:
    """Unpack full 128-value FOR blocks at the given packed-data byte
    starts -> (n_blocks, 128) int64. One 8-byte gather + shift + mask
    per value (no per-bit matrices): value i's bits live at bit
    [i*w, i*w+w) of its block's packed region, so an unaligned uint64
    load at byte (i*w)>>3 shifted by (i*w)&7 exposes them — valid for
    w <= 57 (shift<=7 keeps w+7 <= 64); wider blocks (rare: >57-bit
    deltas) fall back to a per-bit loop."""
    nb = len(data_start)
    nbytes = 16 * w
    pad = (-nbytes) % 8 + 8
    if nb == 1:  # single block (the BMW skip path): contiguous slice
        s = int(data_start[0])
        row = np.zeros((1, nbytes + pad), dtype=np.uint8)
        row[0, :nbytes] = b[s:s + nbytes]
        rows = row
    else:
        rows = b[data_start[:, None] + np.arange(nbytes, dtype=np.int64)]
        rows = np.concatenate(
            [rows, np.zeros((nb, pad), dtype=np.uint8)], axis=1)
    R = rows.view(np.uint64)            # (nb, words) little-endian host
    q, r, rsh, rz, mask = _for_unpack_tabs(w)
    lo = R[:, q] >> r
    hi = R[:, q + 1] << rsh
    hi[:, rz] = 0                       # r==0: value fits entirely in lo
    return ((lo | hi) & mask).astype(np.int64)


def _for_unpack_tabs(w: int):
    """Memoized per-width unpack tables (constant for a given w)."""
    tabs = _FOR_TABS.get(w)
    if tabs is None:
        bitpos = np.arange(BLOCK_SIZE, dtype=np.int64) * w
        q = bitpos >> 6
        r = (bitpos & 63).astype(np.uint64)
        rsh = (np.uint64(64) - r) & np.uint64(63)
        tabs = (q, r, rsh, r == np.uint64(0), np.uint64((1 << w) - 1))
        _FOR_TABS[w] = tabs
    return tabs


_FOR_TABS: dict[int, tuple] = {}


def for_decode_stream(blob, count: int, blk_off: np.ndarray) -> np.ndarray:
    """Decode a whole FOR stream given per-block byte offsets.

    Vectorized by distinct width: all blocks of one width unpack in a
    single numpy pass, so a warm full decode costs O(#distinct widths)
    kernels, not O(#blocks) Python iterations.
    """
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(blob, dtype=np.uint8)
    blk_off = np.asarray(blk_off, dtype=np.int64)
    n_full = count // BLOCK_SIZE
    out = np.empty(count, dtype=np.int64)
    if n_full:
        widths = b[blk_off[:n_full]].astype(np.int64)
        for wv in np.unique(widths):
            blocks = np.flatnonzero(widths == wv)
            vals = _for_unpack(b, blk_off[blocks] + 1, int(wv))
            out[(blocks[:, None] * BLOCK_SIZE
                 + np.arange(BLOCK_SIZE, dtype=np.int64))] = vals
    rem = count - n_full * BLOCK_SIZE
    if rem:
        tail, _ = vbyte_decode(blob, rem, int(blk_off[n_full]))
        out[n_full * BLOCK_SIZE:] = tail
    return out


def decode_stream(blob, count: int, codec: str,
                  blk_off: np.ndarray | None = None) -> np.ndarray:
    """Full-stream decode under either codec (offset 0)."""
    if codec == "for":
        return for_decode_stream(blob, count, blk_off)
    vals, _ = vbyte_decode(blob, count, 0)
    return vals


# ------------------------------------------------------- encoded postings

@dataclass
class EncodedPostings:
    """One term's merged posting list, block-encoded.

    ``docs``/``tfs``/``poss`` are VByte blobs; ``norms`` is one raw
    byte per posting (norm offset for block b is just b*128). Block
    directory arrays are parallel, one entry per 128-posting block.
    """

    df: int
    cf: int
    docs: bytes
    tfs: bytes
    norms: bytes
    poss: bytes
    blk_last_doc: np.ndarray   # int64, last docID of each block
    blk_doc_off: np.ndarray    # int32, byte offset of block start in `docs`
    blk_tf_off: np.ndarray     # int32
    blk_pos_off: np.ndarray    # int32
    blk_max_tf: np.ndarray     # int32
    blk_min_norm: np.ndarray   # uint8 (min norm byte == min quantized length)
    codec: str = "vbyte"       # docs/tfs stream codec ("vbyte" | "for")


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                    positions: np.ndarray | None = None,
                    codec: str = "vbyte") -> EncodedPostings:
    """Encode one term's postings.

    ``doc_ids`` strictly increasing; ``positions`` (optional) is the
    flat concatenation of each posting's position list (lengths given
    by ``tfs``), each per-posting list delta-encoded from 0.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)
    if positions is None:
        positions = np.empty(0, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        raise ValueError("empty posting list")
    if n > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("doc_ids must be strictly increasing")

    # per-posting position deltas: reset the delta chain at each posting
    if positions.size:
        pos_deltas = delta_encode(positions)
        pos_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        pos_deltas[pos_starts] = positions[pos_starts]
    else:
        pos_deltas = positions

    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_bounds = np.minimum.reduce(
        [np.arange(1, nblocks + 1) * BLOCK_SIZE, np.full(nblocks, n)])
    blk_starts = np.arange(nblocks) * BLOCK_SIZE

    # doc deltas are relative to the previous posting; a block's first
    # delta is thus relative to the previous block's last_doc, which the
    # directory stores — blocks decode independently.
    doc_deltas = delta_encode(doc_ids)

    # ONE vectorized encode per stream; block byte offsets cut from the
    # per-value cumulative ends (identical bytes to per-block encoding
    # since VByte is per-value)
    poss_blob, pos_ends = vbyte_encode_with_ends(pos_deltas)
    pos_cuts = np.concatenate(([0], np.cumsum(tfs)))

    def _offsets(ends: np.ndarray, value_starts: np.ndarray) -> np.ndarray:
        out = np.zeros(len(value_starts), dtype=np.int64)
        nz = value_starts > 0
        if ends.size:
            out[nz] = ends[value_starts[nz] - 1]
        return out

    if codec == "for":
        docs_blob, d_offs = for_encode_stream(doc_deltas, blk_starts,
                                              blk_bounds)
        tfs_blob, t_offs = for_encode_stream(tfs, blk_starts, blk_bounds)
        doc_off, tf_off = d_offs[:-1], t_offs[:-1]
    else:
        docs_blob, doc_ends = vbyte_encode_with_ends(doc_deltas)
        tfs_blob, tf_ends = vbyte_encode_with_ends(tfs)
        doc_off = _offsets(doc_ends, blk_starts)
        tf_off = _offsets(tf_ends, blk_starts)
    pos_off = _offsets(pos_ends, pos_cuts[blk_starts])

    # block-max metadata
    max_tf = np.maximum.reduceat(tfs, blk_starts).astype(np.int32)
    min_norm = np.minimum.reduceat(norms, blk_starts).astype(np.uint8)
    last_doc = doc_ids[blk_bounds - 1]

    return EncodedPostings(
        df=int(n),
        cf=int(tfs.sum()),
        docs=docs_blob,
        tfs=tfs_blob,
        norms=norms.tobytes(),
        poss=poss_blob,
        blk_last_doc=last_doc.astype(np.int64),
        blk_doc_off=doc_off.astype(np.int32),
        blk_tf_off=tf_off.astype(np.int32),
        blk_pos_off=pos_off.astype(np.int32),
        blk_max_tf=max_tf,
        blk_min_norm=min_norm,
        codec=codec,
    )


@dataclass
class MultiEncodedPostings:
    """Many terms' posting lists encoded as shared streams.

    Bit-identical to per-group :func:`encode_postings` (VByte is
    per-value, so one global encode + byte-slicing at group bounds
    yields the same blob bytes), but every array below is built with a
    constant number of numpy kernels regardless of group count — the
    whole point at a ≥10^5-term dictionary where a per-term Python
    encode loop dominates the merge stage.

    Per-group cell i of each stream spans bytes
    ``[blob_offs[i], blob_offs[i+1])``; block-directory arrays are
    global with per-group block ranges ``[blk_offs[i], blk_offs[i+1])``.
    """

    n_groups: int
    df: np.ndarray             # int64 per group
    cf: np.ndarray             # int64 per group
    min_doc: np.ndarray        # int64 per group
    docs: bytes
    docs_offs: np.ndarray      # int64 per group+1, byte bounds into docs
    tfs: bytes
    tfs_offs: np.ndarray
    norms: bytes
    norms_offs: np.ndarray
    poss: bytes
    poss_offs: np.ndarray
    blk_offs: np.ndarray       # int64 per group+1, block-index bounds
    blk_last_doc: np.ndarray   # int64 global
    blk_doc_off: np.ndarray    # int32 global (byte offset within group blob)
    blk_tf_off: np.ndarray
    blk_pos_off: np.ndarray
    blk_max_tf: np.ndarray     # int32 global
    blk_min_norm: np.ndarray   # uint8 global
    codec: str = "vbyte"       # docs/tfs stream codec ("vbyte" | "for")


def encode_postings_multi(offsets: np.ndarray, doc_ids: np.ndarray,
                          tfs: np.ndarray, norms: np.ndarray,
                          positions: np.ndarray | None = None,
                          codec: str = "vbyte") -> MultiEncodedPostings:
    """Encode many groups' postings in one vectorized pass.

    ``offsets`` (int64, len n_groups+1) bound each group's postings in
    the concatenated ``doc_ids``/``tfs``/``norms``; within each group
    doc_ids must be strictly increasing. ``positions`` is the flat
    token stream (posting lengths = tfs), absolute values.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)
    ng = len(offsets) - 1
    n = doc_ids.size
    if ng <= 0 or n == 0:
        raise ValueError("empty multi-group posting set")
    gstart = offsets[:-1]
    gdf = np.diff(offsets)
    if (gdf <= 0).any():
        raise ValueError("every group needs >= 1 posting")

    # deltas with a reset (absolute value) at each group start
    deltas = np.empty_like(doc_ids)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    deltas[gstart] = doc_ids[gstart]
    inner = np.ones(n, dtype=bool)
    inner[gstart] = False
    if (deltas[inner] <= 0).any():
        raise ValueError("doc_ids must be strictly increasing per group")

    def _byte_at(ends: np.ndarray, value_idx: np.ndarray) -> np.ndarray:
        """Byte offset where value ``value_idx`` starts in the stream."""
        out = np.zeros(len(value_idx), dtype=np.int64)
        nz = value_idx > 0
        if ends.size:
            out[nz] = ends[value_idx[nz] - 1]
        return out

    # per-posting token starts (global), for positions + pos offsets
    tok_cuts = np.concatenate(([0], np.cumsum(tfs)))  # len n+1
    if positions is not None and np.asarray(positions).size:
        positions = np.asarray(positions, dtype=np.int64)
        pos_deltas = np.empty_like(positions)
        pos_deltas[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=pos_deltas[1:])
        pos_deltas[tok_cuts[:-1]] = positions[tok_cuts[:-1]]  # posting reset
        poss_blob, pos_ends = vbyte_encode_with_ends(pos_deltas)
        has_pos = True
    else:
        poss_blob, pos_ends = b"", np.empty(0, dtype=np.int64)
        has_pos = False

    # ---- block directory, all groups at once ----
    nblk = (gdf + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_offs = np.concatenate(([0], np.cumsum(nblk)))
    total_blk = int(blk_offs[-1])
    blk_group = np.repeat(np.arange(ng, dtype=np.int64), nblk)
    blk_local = np.arange(total_blk, dtype=np.int64) - blk_offs[blk_group]
    blk_start = gstart[blk_group] + blk_local * BLOCK_SIZE
    blk_end = np.minimum(blk_start + BLOCK_SIZE, offsets[1:][blk_group])
    # consecutive blocks tile the posting stream exactly (group bounds
    # coincide with block bounds), so global reduceat segments are the
    # per-block ranges
    blk_max_tf = np.maximum.reduceat(tfs, blk_start).astype(np.int32)
    blk_min_norm = np.minimum.reduceat(norms, blk_start).astype(np.uint8)
    blk_last_doc = doc_ids[blk_end - 1].astype(np.int64)

    if codec == "for":
        # every group starts on a block boundary, so per-group blob
        # bounds are just the first-block byte starts
        docs_blob, d_offs = for_encode_stream(deltas, blk_start, blk_end)
        tfs_blob, t_offs = for_encode_stream(tfs, blk_start, blk_end)
        g_doc_base = d_offs[blk_offs[:-1]]
        g_tf_base = t_offs[blk_offs[:-1]]
        blk_doc_off = (d_offs[:-1] - g_doc_base[blk_group]).astype(np.int32)
        blk_tf_off = (t_offs[:-1] - g_tf_base[blk_group]).astype(np.int32)
        docs_offs = np.concatenate((g_doc_base, d_offs[-1:]))
        tfs_offs = np.concatenate((g_tf_base, t_offs[-1:]))
    else:
        docs_blob, doc_ends = vbyte_encode_with_ends(deltas)
        tfs_blob, tf_ends = vbyte_encode_with_ends(tfs)
        g_doc_base = _byte_at(doc_ends, gstart)
        g_tf_base = _byte_at(tf_ends, gstart)
        blk_doc_off = (_byte_at(doc_ends, blk_start)
                       - g_doc_base[blk_group]).astype(np.int32)
        blk_tf_off = (_byte_at(tf_ends, blk_start)
                      - g_tf_base[blk_group]).astype(np.int32)
        docs_offs = np.concatenate((g_doc_base, doc_ends[-1:]))
        tfs_offs = np.concatenate((g_tf_base, tf_ends[-1:]))
    norms_offs = offsets.copy()  # 1 byte per posting

    if has_pos:
        g_tok_start = tok_cuts[gstart]
        g_pos_base = _byte_at(pos_ends, g_tok_start)
        blk_pos_off = (_byte_at(pos_ends, tok_cuts[blk_start])
                       - g_pos_base[blk_group]).astype(np.int32)
        poss_offs = np.concatenate((g_pos_base, pos_ends[-1:]))
    else:
        blk_pos_off = np.zeros(total_blk, dtype=np.int32)
        poss_offs = np.zeros(ng + 1, dtype=np.int64)

    cf = np.add.reduceat(tfs, gstart).astype(np.int64)
    return MultiEncodedPostings(
        n_groups=ng,
        df=gdf.astype(np.int64),
        cf=cf,
        min_doc=doc_ids[gstart].astype(np.int64),
        docs=docs_blob, docs_offs=docs_offs,
        tfs=tfs_blob, tfs_offs=tfs_offs,
        norms=norms.tobytes(), norms_offs=norms_offs,
        poss=poss_blob, poss_offs=poss_offs,
        blk_offs=blk_offs,
        blk_last_doc=blk_last_doc,
        blk_doc_off=blk_doc_off,
        blk_tf_off=blk_tf_off,
        blk_pos_off=blk_pos_off,
        blk_max_tf=blk_max_tf,
        blk_min_norm=blk_min_norm,
        codec=codec,
    )


def _decode_block_vals(blob, off: int, n: int, codec: str) -> np.ndarray:
    if codec == "for":
        return for_decode_block(blob, off, n)
    vals, _ = vbyte_decode(blob, n, off)
    return vals


def decode_block_docs(docs_blob, blk_doc_off, blk_last_doc, b: int,
                      df: int, codec: str = "vbyte") -> np.ndarray:
    """Decode block ``b``'s docIDs (without tfs/positions).

    Block-start deltas are relative to the previous block's last doc,
    which the directory carries — so any block decodes independently.
    """
    n = min(BLOCK_SIZE, df - b * BLOCK_SIZE)
    deltas = _decode_block_vals(docs_blob, int(blk_doc_off[b]), n, codec)
    out = np.cumsum(deltas)
    if b > 0:
        out += int(blk_last_doc[b - 1])
    return out


def decode_block(docs_blob, tfs_blob, blk_doc_off, blk_tf_off, blk_last_doc,
                 b: int, df: int,
                 codec: str = "vbyte") -> tuple[np.ndarray, np.ndarray]:
    """Decode block ``b`` -> (doc_ids, tfs)."""
    n = min(BLOCK_SIZE, df - b * BLOCK_SIZE)
    deltas = _decode_block_vals(docs_blob, int(blk_doc_off[b]), n, codec)
    docs = np.cumsum(deltas)
    if b > 0:
        docs += int(blk_last_doc[b - 1])
    tfs = _decode_block_vals(tfs_blob, int(blk_tf_off[b]), n, codec)
    return docs, tfs


def decode_all(enc_or_row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list -> (doc_ids, tfs, norms).

    Accepts an :class:`EncodedPostings` or a dict-like index row with
    the same field names.
    """
    if isinstance(enc_or_row, EncodedPostings):
        get = lambda k: getattr(enc_or_row, k)  # noqa: E731
        codec = enc_or_row.codec
    else:
        get = lambda k: enc_or_row[k]           # noqa: E731
        codec = enc_or_row.get("codec", "vbyte") \
            if hasattr(enc_or_row, "get") else "vbyte"
    df = int(get("df"))
    blk_off = None
    if codec == "for":
        blk_off = np.frombuffer(get("blk_doc_off"), dtype=np.int32) \
            if isinstance(get("blk_doc_off"), (bytes, bytearray)) \
            else get("blk_doc_off")
    deltas = decode_stream(get("docs"), df, codec, blk_off)
    docs = np.cumsum(deltas)
    if codec == "for":
        tf_off = np.frombuffer(get("blk_tf_off"), dtype=np.int32) \
            if isinstance(get("blk_tf_off"), (bytes, bytearray)) \
            else get("blk_tf_off")
        tfs = decode_stream(get("tfs"), df, codec, tf_off)
    else:
        tfs = decode_stream(get("tfs"), df, codec)
    norms = np.frombuffer(get("norms"), dtype=np.uint8)
    return docs, tfs, norms


def decode_positions(poss_blob, tfs: np.ndarray) -> list[np.ndarray]:
    """Decode the full positions stream -> per-posting position arrays."""
    total = int(np.asarray(tfs).sum())
    flat, _ = vbyte_decode(poss_blob, total, 0)
    cuts = np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]
    out = []
    start = 0
    for end in list(cuts) + [total]:
        seg = flat[start:end]
        out.append(np.cumsum(seg))
        start = end
    return out
