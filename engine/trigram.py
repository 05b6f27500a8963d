"""Trigram (character 3-gram) term-dictionary sidecar.

Stand-in for upstream's compiled-automaton ∩ FST term-dictionary
intersection (``lucene/core/src/java/org/apache/lucene/util/automaton/
CompiledAutomaton.java`` + ``FuzzyQuery``'s intersect [U]): every term
in a bucket's dictionary contributes its distinct character trigrams
to an inverted trigram → term-ordinal postings table. Fuzzy, wildcard
and regexp expansion then touch only the terms sharing the query's
required trigrams instead of scanning a 10⁹-term dictionary.

Persisted as a per-bucket build-time sidecar (``_trigram.sidecar``
inside the bucket shard directory — parquet format, but the leading
underscore keeps pyarrow dataset discovery away from it and the
non-``.parquet`` suffix keeps it out of postings-file globs). It is
(re)written by every path that rewrites a bucket shard (fresh merge,
segment append, forceMerge), rides along snapshot/replica file copies
for free, and carries the term count in its schema metadata so a
reader can detect a stale sidecar and fall back to an in-memory
rebuild — which is itself fully vectorized (no Python loop over the
vocabulary; the round-3 per-actor ``for t in vocabulary()`` scan is
gone).

Encoding: a character trigram (c0, c1, c2) packs into one int64 as
``c0<<42 | c1<<21 | c2`` (codepoints < 0x110000 < 2^21), so the whole
postings table is two int64 columns and every probe is a searchsorted.
Construction decodes utf-8 straight off the Arrow buffer
(:func:`engine.uax29._decode_utf8_batch`) — one numpy pass over the
bucket's concatenated term bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SIDECAR_NAME = "_trigram.sidecar"

_EMPTY = np.empty(0, dtype=np.int64)
_S1 = np.int64(42)
_S2 = np.int64(21)


def encode_gram_codes(s: str) -> np.ndarray:
    """Distinct int64 codes of the character trigrams of one (short,
    query-side) string. Empty for len < 3."""
    if len(s) < 3:
        return _EMPTY
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int64)
    g = (cp[:-2] << _S1) | (cp[1:-1] << _S2) | cp[2:]
    return np.unique(g)


def gram_term_pairs(terms: pa.Array | pa.ChunkedArray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (gram_code, term_ordinal) pairs over a sorted-unique
    term array, sorted by (gram, ordinal). Ordinal = position in
    ``terms``. Fully vectorized: utf-8 → codepoints off the Arrow
    buffer, one shift/or pass for the codes, lexsort + boundary-diff
    dedupe."""
    from engine.uax29 import _decode_utf8_batch

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return _EMPTY, _EMPTY
    cp, _bs, offs, _raw = _decode_utf8_batch(terms)
    n_cp = len(cp)
    if n_cp < 3:
        return _EMPTY, _EMPTY
    lens = np.diff(offs)
    term_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    cp = cp.astype(np.int64, copy=False)
    g = (cp[:-2] << _S1) | (cp[1:-1] << _S2) | cp[2:]
    # a window starting at concatenated position p belongs to term
    # t = term_of[p] and is valid iff all 3 chars sit inside t:
    # p + 3 <= offs[t + 1]
    head = term_of[:n_cp - 2]
    valid = np.arange(n_cp - 2, dtype=np.int64) + 3 <= offs[1:][head]
    idx = np.flatnonzero(valid)
    if not len(idx):
        return _EMPTY, _EMPTY
    g = g[idx]
    o = head[idx]
    order = np.lexsort((o, g))
    g, o = g[order], o[order]
    keep = np.empty(len(g), dtype=bool)
    keep[:1] = True
    keep[1:] = (g[1:] != g[:-1]) | (o[1:] != o[:-1])
    return g[keep], o[keep]


def sorted_unique_terms(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Sorted-unique of a string column, Arrow-side. UTF-8 bytewise
    order == codepoint order, so this matches ``sorted(set(...))``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    u = pc.unique(col)
    return pc.take(u, pc.array_sort_indices(u))


class TrigramIndex:
    """CSR trigram → term-ordinal postings over one sorted term
    dictionary (one bucket's, or an in-memory vocabulary's)."""

    __slots__ = ("grams", "offsets", "ords", "n_terms")

    def __init__(self, grams: np.ndarray, offsets: np.ndarray,
                 ords: np.ndarray, n_terms: int):
        self.grams = grams
        self.offsets = offsets
        self.ords = ords
        self.n_terms = n_terms

    @classmethod
    def from_pairs(cls, g: np.ndarray, o: np.ndarray,
                   n_terms: int) -> "TrigramIndex":
        g = np.asarray(g, dtype=np.int64)
        o = np.asarray(o, dtype=np.int64)
        if not len(g):
            return cls(_EMPTY, np.zeros(1, dtype=np.int64), _EMPTY,
                       n_terms)
        bnd = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])))
        offsets = np.concatenate(
            (bnd, [len(g)])).astype(np.int64)
        return cls(g[bnd], offsets, o, n_terms)

    @classmethod
    def from_terms(cls, terms: pa.Array | pa.ChunkedArray
                   ) -> "TrigramIndex":
        g, o = gram_term_pairs(terms)
        return cls.from_pairs(g, o, len(terms))

    def postings(self, code: int) -> np.ndarray:
        """Sorted term ordinals containing the trigram ``code``."""
        i = int(np.searchsorted(self.grams, code))
        if i >= len(self.grams) or self.grams[i] != code:
            return _EMPTY
        return self.ords[self.offsets[i]:self.offsets[i + 1]]


def write_sidecar(shard_dir: str,
                  term_col: pa.Array | pa.ChunkedArray | None = None
                  ) -> int:
    """Build + atomically write the bucket's trigram sidecar; returns
    the pair count (0 = empty bucket, no sidecar written). Called by
    every bucket-shard writer. ``term_col`` lets a merge pass the
    just-built in-memory term column instead of re-reading the file
    it wrote; multi-file paths (segment append, exorcise) omit it and
    the terms are read back from the shard."""
    if not os.path.isdir(shard_dir):
        return 0
    path = os.path.join(shard_dir, SIDECAR_NAME)
    if term_col is None:
        files = [os.path.join(shard_dir, f)
                 for f in sorted(os.listdir(shard_dir))
                 if f.endswith(".parquet")]
        if not files:
            if os.path.exists(path):
                os.remove(path)
            return 0
        term_col = pq.read_table(files, columns=["term"])["term"]
    terms = sorted_unique_terms(term_col)
    if not len(terms):
        if os.path.exists(path):
            os.remove(path)
        return 0
    g, o = gram_term_pairs(terms)
    tab = pa.table({"gram": g, "ord": o}).replace_schema_metadata(
        {b"n_terms": str(len(terms)).encode()})
    tmp = path + ".tmp"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)
    return len(g)


def load_sidecar(shard_dir: str, n_terms: int) -> TrigramIndex | None:
    """Load the bucket's sidecar if present AND consistent with the
    current dictionary size (``n_terms`` guards against a stale
    sidecar after an out-of-band shard rewrite); None → caller builds
    in memory."""
    path = os.path.join(shard_dir, SIDECAR_NAME)
    if not os.path.exists(path):
        return None
    try:
        tab = pq.read_table(path)
        meta = tab.schema.metadata or {}
        if int(meta.get(b"n_terms", b"-1")) != n_terms:
            return None
        return TrigramIndex.from_pairs(
            tab["gram"].to_numpy(), tab["ord"].to_numpy(), n_terms)
    except Exception:            # noqa: BLE001 — corrupt sidecar
        return None
