"""Analysis chain: tokenize → lowercase → stopwords → Porter stem.

Ray-native re-expression of the reference's ``StandardAnalyzer``-style
chain (SURVEY.md §2.2; upstream ``L/analysis/standard/StandardTokenizer.java``,
``core/LowerCaseFilter.java``, ``core/StopFilter.java``,
``en/PorterStemFilter.java`` [U]).  The whole chain is vectorized over an
Arrow batch: ``pc.utf8_lower`` + ``pc.split_pattern_regex`` run in C++,
stop filtering is a single ``pc.is_in`` over the flat token array, and
stemming touches only the *unique* tokens of the batch (memoized per
actor), so per-token Python work is O(vocabulary), not O(corpus).

Conformance boundary (documented per SURVEY.md §2.2): tokens are ASCII
alphanumeric runs (``[A-Za-z0-9]+``); on the fixture corpora this matches
UAX#29 word-break output because the corpora contain no intra-word
punctuation (``don't``, ``3.14``) or non-ASCII letters.  The DuckDB oracle
reproduces the same rule with ``regexp_split_to_array(lower(text),
'[^a-z0-9]+')``.

Position semantics (parity-critical, SURVEY.md §7 "hard parts"): a
token's position is its index in the pre-stop-filter stream, so removed
stopwords leave **position gaps** exactly as the reference's
``StopFilter`` increments ``positionIncrement``.  Document length (the
BM25 norm) counts only *emitted* tokens, i.e. stopwords excluded, as in
the reference's ``FieldInvertState.length``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.porter import stem

# The reference's default English stopword set (upstream
# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET, 33 words).
ENGLISH_STOP_WORDS = frozenset({
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with",
})

TOKEN_SPLIT_REGEX = r"[^A-Za-z0-9]+"


class Analyzer:
    """The analysis chain as a reusable, Ray-actor-friendly object.

    Construction compiles the stopword table and seeds the stem memo —
    done once per actor (``map_batches(cls, concurrency=...)``), then
    ``analyze_flat`` runs per batch.
    """

    def __init__(self, stop_words: frozenset[str] | None = ENGLISH_STOP_WORDS,
                 stemming: bool = True):
        self.stop_words = stop_words if stop_words is not None else frozenset()
        self._stop_arr = pa.array(sorted(self.stop_words), type=pa.string())
        self.stemming = stemming
        self._stem_memo: dict[str, str] = {}

    def _stem_unique(self, uniq: np.ndarray) -> np.ndarray:
        memo = self._stem_memo
        out = np.empty(uniq.shape, dtype=object)
        for i, tok in enumerate(uniq):
            s = memo.get(tok)
            if s is None:
                s = stem(tok)
                memo[tok] = s
            out[i] = s
        return out

    def analyze_encoded(self, texts: pa.Array | pa.ChunkedArray):
        """Analyze a column of documents, dictionary-encoded.

        Returns ``(offsets, codes, vocab, positions, doc_lens)``:
        ``codes`` (int64 ndarray) are indices into ``vocab`` (object
        ndarray of unique analyzed terms, sorted), cut per document by
        ``offsets``; ``positions``/``doc_lens`` as in
        :meth:`analyze_flat`. Dictionary encoding happens in Arrow
        (hash-based, no object-array sort) and stemming touches only
        the vocabulary — per-token Python work is O(vocab), not
        O(corpus).
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        lowered = pc.utf8_lower(texts)
        token_lists = pc.split_pattern_regex(lowered, TOKEN_SPLIT_REGEX)
        # flat view: Arrow list array -> (value offsets, values)
        token_lists = token_lists.combine_chunks() if isinstance(
            token_lists, pa.ChunkedArray) else token_lists
        raw_offsets = token_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = token_lists.values
        # null docs produce no slot movement in offsets; treat as empty
        nonempty = pc.not_equal(flat, "")
        if self.stop_words:
            keep_arrow = pc.and_(nonempty, pc.invert(pc.is_in(flat, value_set=self._stop_arr)))
        else:
            keep_arrow = nonempty
        keep = keep_arrow.to_numpy(zero_copy_only=False)

        # token positions: index within the doc counting ONLY non-empty
        # raw tokens (empties are split artifacts, not positions), with
        # stopwords consuming a position (the gap semantics).
        ne = nonempty.to_numpy(zero_copy_only=False)
        pos_all = np.cumsum(ne).astype(np.int64)  # 1-based among non-empty
        # rebase per doc: subtract the cumsum at the doc start
        doc_base = np.zeros(len(ne) + 1, dtype=np.int64)
        doc_base[1:] = pos_all
        start_base = doc_base[raw_offsets[:-1]]
        token_doc = np.repeat(np.arange(n_docs, dtype=np.int64),
                              np.diff(raw_offsets))
        positions_all = (pos_all - 1 - start_base[token_doc]).astype(np.int32)

        kept = flat.filter(keep_arrow)
        positions = positions_all[keep]
        kept_doc = token_doc[keep]
        doc_lens = np.bincount(kept_doc, minlength=n_docs).astype(np.int32)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(doc_lens, out=offsets[1:])

        # Arrow hash-based dictionary encode: no object-array sort
        dict_arr = pc.dictionary_encode(kept)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(dict_arr.dictionary.to_pandas(), dtype=object)

        if self.stemming and vocab.size:
            vocab = self._stem_unique(vocab)
        if vocab.size:
            # normalize: sorted unique vocab (stemming may alias terms)
            uniq, inv = np.unique(vocab, return_inverse=True)
            vocab = uniq
            codes = inv[codes]
        return offsets, codes, vocab, positions, doc_lens

    def analyze_flat(self, texts: pa.Array | pa.ChunkedArray):
        """Analyze a column of documents.

        Returns ``(offsets, terms, positions, doc_lens)`` where
        ``offsets`` (int64, n_docs+1) cuts the flat ``terms`` (object
        ndarray) / ``positions`` (int32 ndarray) arrays per document,
        and ``doc_lens`` (int32) is the emitted-token count per doc.
        """
        offsets, codes, vocab, positions, doc_lens = \
            self.analyze_encoded(texts)
        terms = vocab[codes] if len(codes) else np.empty(0, dtype=object)
        return offsets, terms, positions, doc_lens

    def analyze_text(self, text: str) -> list[tuple[str, int]]:
        """Single-string convenience: ``[(term, position), ...]``."""
        offsets, terms, positions, _ = self.analyze_flat(pa.array([text]))
        return list(zip(terms.tolist(), positions.tolist()))

    def query_terms(self, text: str) -> list[str]:
        """Analyze a query string -> term list (duplicates preserved)."""
        return [t for t, _ in self.analyze_text(text)]
