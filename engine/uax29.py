"""UAX#29 word-break segmentation, batch-vectorized over codepoints.

The full-Unicode tier of StandardTokenizer (upstream
``L/analysis/standard/StandardTokenizerImpl.jflex``, generated from
the UAX#29 word-break rules [U]). The ASCII tier
(``tokenizer="standard"``) stays the default; this module backs
``tokenizer="uax29"``.

Implementation notes:

- The rule set is UAX#29's WB1–WB16 over a word-break property table
  derived at first use from ``unicodedata`` categories plus explicit
  ranges for Han / Hiragana / Katakana / Hebrew / regional
  indicators and the Mid*/quote singletons (the property values a
  stock CPython can't look up directly). Like upstream,
  Extend/Format characters are transparent (WB4) and stay attached
  to the token that precedes them.
- Token emission follows StandardTokenizer: a segment becomes a token
  iff it contains at least one letter / digit / katakana / ideograph;
  Han and Hiragana code points emit one token per character (their
  UAX#29 default — no rule chains them), Katakana and Hangul emit
  runs.
- Everything is numpy straight off the Arrow utf-8 buffer: lead-byte
  masking + shifted gathers decode the codepoints, property lookup is
  one table gather, every WB rule is a shifted boolean expression,
  and token strings are BYTE SLICES of the original buffer — no
  Python string objects anywhere.

Documented conformance boundary: dictionary-based CJK segmentation
(ICU) and the Unicode-version drift of the property table are out of
scope. Emoji ZWJ sequences hold together per WB3c (ZWJ ×
Extended_Pictographic, Unicode-15 emoji-data ranges pinned below),
and segments of Extended_Pictographic characters emit as emoji
tokens — the ICUTokenizer emoji-token behavior (upstream LUCENE-8013
``icu/.../ICUTokenizer`` [U]).
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

OTHER = 0
ALETTER = 1
HEBREW = 2
NUMERIC = 3
KATAKANA = 4
MIDLETTER = 5
MIDNUM = 6
MIDNUMLET = 7
SQ = 8
DQ = 9
EXTNUMLET = 10
EXTEND = 11
FORMAT = 12
RI = 13
IDEO = 14
HIRAGANA = 15

_HAN_RANGES = [
    (0x2E80, 0x2EFF), (0x3005, 0x3005), (0x3007, 0x3007),
    (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF), (0x2A700, 0x2EBEF), (0x2F800, 0x2FA1F),
]
_KATAKANA_RANGES = [
    (0x30A1, 0x30FA), (0x30FC, 0x30FF), (0x31F0, 0x31FF),
    (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF9F),
    # FF9E/FF9F (halfwidth voiced marks) are WordBreak=Katakana
    # (WordBreak.txt), so ｶﾞ stays one run for CJKWidthFilter
]
_HIRAGANA_RANGES = [(0x3041, 0x3096), (0x309D, 0x309F)]
_HEBREW_RANGES = [(0x05D0, 0x05EA), (0x05EF, 0x05F2), (0xFB1D, 0xFB1D),
                  (0xFB1F, 0xFB28), (0xFB2A, 0xFB4F)]
_RI_RANGE = (0x1F1E6, 0x1F1FF)

_MIDLETTER = {0x003A, 0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13,
              0xFE55, 0xFF1A}
_MIDNUM = {0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C,
           0x07F8, 0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C,
           0xFF1B}
_MIDNUMLET = {0x002E, 0x2018, 0x2024, 0xFE52, 0xFF07, 0xFF0E}
_MNL_2019 = 0x2019            # right single quote is MidNumLet
_SQ_CP = 0x0027
_DQ_CP = 0x0022
_ZWJ_CP = 0x200D

# Extended_Pictographic ranges (Unicode 15 emoji-data.txt, pinned —
# the WB3c operand and the emoji-token segment class)
_EP_RANGES = [
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C),
    (0x2049, 0x2049), (0x2122, 0x2122), (0x2139, 0x2139),
    (0x2194, 0x2199), (0x21A9, 0x21AA), (0x231A, 0x231B),
    (0x2328, 0x2328), (0x23CF, 0x23CF), (0x23E9, 0x23F3),
    (0x23F8, 0x23FA), (0x24C2, 0x24C2), (0x25AA, 0x25AB),
    (0x25B6, 0x25B6), (0x25C0, 0x25C0), (0x25FB, 0x25FE),
    (0x2600, 0x2605), (0x2607, 0x2612), (0x2614, 0x2685),
    (0x2690, 0x2705), (0x2708, 0x2712), (0x2714, 0x2714),
    (0x2716, 0x2716), (0x271D, 0x271D), (0x2721, 0x2721),
    (0x2728, 0x2728), (0x2733, 0x2734), (0x2744, 0x2744),
    (0x2747, 0x2747), (0x274C, 0x274C), (0x274E, 0x274E),
    (0x2753, 0x2755), (0x2757, 0x2757), (0x2763, 0x2767),
    (0x2795, 0x2797), (0x27A1, 0x27A1), (0x27B0, 0x27B0),
    (0x27BF, 0x27BF), (0x2934, 0x2935), (0x2B05, 0x2B07),
    (0x2B1B, 0x2B1C), (0x2B50, 0x2B50), (0x2B55, 0x2B55),
    (0x3030, 0x3030), (0x303D, 0x303D), (0x3297, 0x3297),
    (0x3299, 0x3299), (0x1F000, 0x1F0FF), (0x1F10D, 0x1F10F),
    (0x1F12F, 0x1F12F), (0x1F16C, 0x1F171), (0x1F17E, 0x1F17F),
    (0x1F18E, 0x1F18E), (0x1F191, 0x1F19A), (0x1F1AD, 0x1F1E5),
    (0x1F201, 0x1F20F), (0x1F21A, 0x1F21A), (0x1F22F, 0x1F22F),
    (0x1F232, 0x1F23A), (0x1F23C, 0x1F23F), (0x1F249, 0x1F3FA),
    (0x1F400, 0x1F53D), (0x1F546, 0x1F64F), (0x1F680, 0x1F6FF),
    (0x1F774, 0x1F77F), (0x1F7D5, 0x1F7FF), (0x1F80C, 0x1F80F),
    (0x1F848, 0x1F84F), (0x1F85A, 0x1F85F), (0x1F888, 0x1F88F),
    (0x1F8AE, 0x1F8FF), (0x1F90C, 0x1F93A), (0x1F93C, 0x1F945),
    (0x1F947, 0x1FAFF), (0x1FC00, 0x1FFFD),
]

_PROPS: np.ndarray | None = None
_EP: np.ndarray | None = None


def _build_props() -> np.ndarray:
    """uint8 word-break property per code point (1.1 MB, built once
    per process on first uax29 use — actors pay it in __init__)."""
    n = sys.maxunicode + 1
    p = np.zeros(n, dtype=np.uint8)
    cat = unicodedata.category
    # category pass (letters, digits, marks, format, connectors)
    for cp in range(n):
        c = cat(chr(cp))
        c0 = c[0]
        if c0 == "L" or c == "Nl":
            p[cp] = ALETTER
        elif c == "Nd":
            p[cp] = NUMERIC
        elif c in ("Mn", "Mc", "Me"):
            p[cp] = EXTEND
        elif c == "Cf":
            p[cp] = FORMAT
        elif c == "Pc":
            p[cp] = EXTNUMLET
    # script overrides
    for lo, hi in _HAN_RANGES:
        p[lo:hi + 1] = IDEO
    for lo, hi in _HIRAGANA_RANGES:
        p[lo:hi + 1] = HIRAGANA
    for lo, hi in _KATAKANA_RANGES:
        p[lo:hi + 1] = KATAKANA
    for lo, hi in _HEBREW_RANGES:
        p[lo:hi + 1] = HEBREW
    p[_RI_RANGE[0]:_RI_RANGE[1] + 1] = RI
    # singletons
    for cp in _MIDLETTER:
        p[cp] = MIDLETTER
    for cp in _MIDNUM:
        p[cp] = MIDNUM
    for cp in _MIDNUMLET:
        p[cp] = MIDNUMLET
    p[_MNL_2019] = MIDNUMLET
    p[_SQ_CP] = SQ
    p[_DQ_CP] = DQ
    p[_ZWJ_CP] = EXTEND           # WB4-transparent; WB3c handled in
    #                               original codepoint space
    p[0x202F] = EXTNUMLET         # narrow no-break space
    p[0x1F3FB:0x1F3FF + 1] = EXTEND   # emoji modifiers (WordBreak.txt
    #                                   Extend; category Sk would miss)
    return p


def _props() -> np.ndarray:
    global _PROPS
    if _PROPS is None:
        _PROPS = _build_props()
    return _PROPS


def _ep_table() -> np.ndarray:
    """bool per codepoint: Extended_Pictographic (pinned ranges)."""
    global _EP
    if _EP is None:
        t = np.zeros(sys.maxunicode + 1, dtype=bool)
        for lo, hi in _EP_RANGES:
            t[lo:hi + 1] = True
        _EP = t
    return _EP


_AH = (1 << ALETTER) | (1 << HEBREW)
_MID_LET = (1 << MIDLETTER) | (1 << MIDNUMLET) | (1 << SQ)
_MID_NUM = (1 << MIDNUM) | (1 << MIDNUMLET) | (1 << SQ)
_AHNK = _AH | (1 << NUMERIC) | (1 << KATAKANA)
_WORDISH = _AHNK | (1 << IDEO) | (1 << HIRAGANA) | (1 << RI)


def _in(mask: int, p: np.ndarray) -> np.ndarray:
    return ((np.int64(mask) >> p) & 1).astype(bool)


def _mask_table(mask: int) -> np.ndarray:
    """bool[16] membership table for a property bitmask — class tests
    become one fancy-index gather instead of shift+and+astype passes
    (the rule evaluation's former hot spot: 11 `_in` calls per batch
    at 2 array passes each)."""
    return np.array([bool((mask >> v) & 1) for v in range(16)],
                    dtype=bool)


_AH_T = _mask_table(_AH)
_MID_LET_T = _mask_table(_MID_LET)
_MID_NUM_T = _mask_table(_MID_NUM)
_AHNK_T = _mask_table(_AHNK)
_ENL_T = _mask_table(_AHNK | (1 << EXTNUMLET))
_WORDISH_T = _mask_table(_WORDISH)


def _decode_utf8_batch(texts: pa.Array
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """Vectorized utf-8 → codepoints straight off the Arrow buffer:
    (cp int64[n_cp], byte_start int64[n_cp] into the values buffer,
    doc cp-offsets int64[n_docs+1], raw byte buffer uint8). Zero
    Python string objects — lead bytes are located with one mask and
    the 1–4-byte forms decoded with shifted gathers."""
    bufs = texts.buffers()
    boffs = np.frombuffer(bufs[1], dtype=np.int32)[
        texts.offset: texts.offset + len(texts) + 1].astype(np.int64)
    raw = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(boffs[0]), int(boffs[-1])
    buf = raw[lo:hi]
    boffs = boffs - lo
    n_b = len(buf)
    if n_b == 0:
        z = np.zeros(len(texts) + 1, dtype=np.int64)
        return (np.empty(0, np.int64), np.empty(0, np.int64), z, buf)
    lead = (buf & 0xC0) != 0x80
    idx = np.flatnonzero(lead)                  # cp start bytes
    cp = buf[idx].astype(np.int64)              # ASCII fast path
    multi = cp >= 0x80
    if multi.any():
        # decode only the multibyte codepoints (pad 3 bytes so the
        # +1..+3 gathers stay in bounds; valid utf-8 never reads it)
        bp = np.concatenate([buf, np.zeros(3, dtype=np.uint8)])
        mi = idx[multi]
        b0 = cp[multi]
        b1 = bp[mi + 1].astype(np.int64)
        b2 = bp[mi + 2].astype(np.int64)
        b3 = bp[mi + 3].astype(np.int64)
        cp[multi] = np.where(
            b0 < 0xE0,
            ((b0 & 0x1F) << 6) | (b1 & 0x3F),
            np.where(b0 < 0xF0,
                     ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6)
                     | (b2 & 0x3F),
                     ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12)
                     | ((b2 & 0x3F) << 6) | (b3 & 0x3F)))
    doc_cp_off = np.searchsorted(idx, boffs)
    return cp, idx, doc_cp_off, buf


def segment_batch(texts: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Tokenize a string column → ``list<string>`` per row."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    cp, byte_start, doc_off, buf = _decode_utf8_batch(texts)
    doc_chars = np.diff(doc_off)
    empty_lists = pa.ListArray.from_arrays(
        pa.array(np.zeros(n_docs + 1, dtype=np.int32)),
        pa.array([], type=pa.string()))
    if not len(cp):
        return empty_lists
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), doc_chars)

    P = _props()[cp]
    # WB4: Extend/Format are transparent — collapse them out, they
    # attach to the preceding character's token
    vis = ~((P == EXTEND) | (P == FORMAT))
    vi = np.flatnonzero(vis)
    if not len(vi):
        return empty_lists
    p = P[vi]                     # uint8: class tests are table gathers
    d = doc_of[vi]
    m = len(p)
    pad = np.uint8(OTHER)
    prev = np.concatenate(([pad], p[:-1]))
    nxt = np.concatenate((p[1:], [pad]))
    # [:m] guards the m == 1 batch: the 2-pad prefix would otherwise
    # exceed the stream and broadcast every rule mask to length 2
    pprev = np.concatenate(([pad, pad], p[:-2]))[:m]
    # same-doc masks for context positions
    sd_prev = np.concatenate(([False], d[1:] == d[:-1]))
    sd_next = np.concatenate((d[:-1] == d[1:], [False]))
    sd_pprev = np.concatenate(([False, False], d[2:] == d[:-2]))[:m]

    # rule groups run only when their trigger classes exist in the
    # batch (absent class → the whole term is all-False): plain-text
    # batches skip the Hebrew/Mid*/Katakana/ExtendNumLet passes
    has = np.bincount(p, minlength=16).astype(bool)
    has_mid_let = has[MIDLETTER] or has[MIDNUMLET] or has[SQ]
    has_mid_num = has[MIDNUM] or has[MIDNUMLET] or has[SQ]

    ah_p, ah_c = _AH_T[prev], _AH_T[p]
    num_p, num_c = prev == NUMERIC, p == NUMERIC
    nb = ah_p & ah_c                                           # WB5
    nb |= ah_p & num_c                                         # WB9
    nb |= num_p & ah_c                                         # WB10
    nb |= num_p & num_c                                        # WB8
    if has_mid_let:
        nb |= ah_p & _MID_LET_T[p] & _AH_T[nxt] & sd_next      # WB6
        nb |= (_MID_LET_T[prev] & ah_c
               & _AH_T[pprev] & sd_pprev)                      # WB7
    if has[HEBREW]:
        nb |= (prev == HEBREW) & (p == SQ)                     # WB7a
        nb |= ((prev == HEBREW) & (p == DQ)
               & (nxt == HEBREW) & sd_next)                    # WB7b
        nb |= ((prev == DQ) & (p == HEBREW)
               & (pprev == HEBREW) & sd_pprev)                 # WB7c
    if has_mid_num:
        nb |= (_MID_NUM_T[prev] & num_c
               & (pprev == NUMERIC) & sd_pprev)                # WB11
        nb |= (num_p & _MID_NUM_T[p]
               & (nxt == NUMERIC) & sd_next)                   # WB12
    if has[KATAKANA]:
        nb |= (prev == KATAKANA) & (p == KATAKANA)             # WB13
    if has[EXTNUMLET]:
        nb |= _ENL_T[prev] & (p == EXTNUMLET)                  # WB13a
        nb |= (prev == EXTNUMLET) & _AHNK_T[p]                 # WB13b
    # WB3c: ZWJ × Extended_Pictographic — evaluated in ORIGINAL
    # codepoint space (the ZWJ itself is WB4-transparent, so in the
    # collapsed stream it has already attached to the preceding
    # cluster; gluing the FOLLOWING pictograph here chains full emoji
    # ZWJ sequences into one segment)
    ep_c = _ep_table()[cp[vi]]
    if ep_c.any():
        prev_orig = np.maximum(vi - 1, 0)
        zwj_prev = (vi > 0) & (cp[prev_orig] == _ZWJ_CP) \
            & (doc_of[prev_orig] == d)
        nb = nb | (zwj_prev & ep_c)
    # WB15/16: no break between regional-indicator PAIRS only
    ri = p == RI
    if ri.any():
        idx = np.arange(m, dtype=np.int64)
        # first index of each RI run, propagated across the run
        first = np.maximum.accumulate(np.where(
            ri & np.concatenate(([True], ~ri[:-1])), idx, -1))
        pos_in_run = idx - first
        ri_pair = ri & np.concatenate(([False], ri[:-1])) \
            & (pos_in_run % 2 == 1)
        nb = nb | ri_pair
    nb &= sd_prev                      # never join across documents
    brk = ~nb
    brk[0] = True

    # segments → tokens: keep segments containing a word character
    # or a pictograph (emoji tokens, the ICUTokenizer LUCENE-8013
    # behavior — an EP segment emits as ONE token)
    seg_id = np.cumsum(brk) - 1
    wordish = _WORDISH_T[p] | ep_c
    n_seg = int(seg_id[-1]) + 1
    seg_keep = np.bincount(seg_id[wordish],
                           minlength=n_seg).astype(bool)
    seg_first = np.flatnonzero(brk)             # collapsed index
    seg_last = np.append(seg_first[1:], m) - 1
    kept = np.flatnonzero(seg_keep)
    if not len(kept):
        return empty_lists
    # original spans: from first char to just before the next
    # collapsed char (keeps trailing Extend/Format attached)
    o_start = vi[seg_first[kept]]
    nxt_col = seg_last[kept] + 1
    o_end = np.where(nxt_col < m, vi[np.minimum(nxt_col, m - 1)],
                     doc_off[d[seg_first[kept]] + 1])
    # clamp: attached trail must not cross the document end
    o_end = np.minimum(o_end, doc_off[d[seg_first[kept]] + 1])

    tok_doc = d[seg_first[kept]]
    # token text = a BYTE slice of the original values buffer (token
    # spans are contiguous in the source): gather raw utf-8 bytes,
    # build the StringArray from buffers — no decode round-trip
    total_cp = len(cp)
    b_start = byte_start[o_start]
    b_end = np.where(o_end < total_cp,
                     byte_start[np.minimum(o_end, total_cp - 1)],
                     len(buf))
    # o_end < total_cp but pointing at the next doc's first cp is
    # fine: byte_start of that cp == this doc's end byte
    ln = b_end - b_start
    byte_off = np.zeros(len(ln) + 1, dtype=np.int64)
    np.cumsum(ln, out=byte_off[1:])
    pos = (np.arange(int(byte_off[-1]), dtype=np.int64)
           - np.repeat(byte_off[:-1], ln) + np.repeat(b_start, ln))
    data = buf[pos].tobytes()
    values = pa.StringArray.from_buffers(
        len(ln),
        pa.py_buffer(byte_off.astype(np.int32).tobytes()),
        pa.py_buffer(data))
    # per-doc list offsets (tokens are in doc order by construction)
    tok_per_doc = np.bincount(tok_doc, minlength=n_docs)
    l_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(tok_per_doc, out=l_off[1:])
    return pa.ListArray.from_arrays(
        pa.array(l_off, type=pa.int64()).cast(pa.int32()), values)
