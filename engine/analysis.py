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
        # Split the ORIGINAL text (case doesn't affect [^A-Za-z0-9]
        # boundaries) and dictionary-encode the cased tokens straight
        # away — every downstream per-token decision (empty, stopword,
        # lowercase, stem) then happens on the tiny vocabulary and is
        # broadcast back through int codes. This keeps the corpus-sized
        # memory traffic to one split + one hash pass.
        token_lists = pc.split_pattern_regex(texts, TOKEN_SPLIT_REGEX)
        token_lists = token_lists.combine_chunks() if isinstance(
            token_lists, pa.ChunkedArray) else token_lists
        raw_offsets = token_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_arr = pc.dictionary_encode(token_lists.values)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        raw_codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cased_vocab = dict_arr.dictionary
        vocab_lower = pc.utf8_lower(cased_vocab)

        # per-vocab-entry masks, broadcast via codes
        v_nonempty = np.asarray(
            pc.not_equal(cased_vocab, "").to_numpy(zero_copy_only=False))
        if self.stop_words:
            v_stop = pc.is_in(vocab_lower, value_set=self._stop_arr) \
                .to_numpy(zero_copy_only=False)
            v_keep = v_nonempty & ~v_stop
        else:
            v_keep = v_nonempty
        ne = v_nonempty[raw_codes]
        keep = v_keep[raw_codes]

        # token positions: index within the doc counting ONLY non-empty
        # raw tokens (empties are split artifacts, not positions), with
        # stopwords consuming a position (the gap semantics).
        pos_all = np.cumsum(ne).astype(np.int64)  # 1-based among non-empty
        doc_base = np.zeros(len(ne) + 1, dtype=np.int64)
        doc_base[1:] = pos_all
        start_base = doc_base[raw_offsets[:-1]]
        token_doc = np.repeat(np.arange(n_docs, dtype=np.int64),
                              np.diff(raw_offsets))
        positions_all = (pos_all - 1 - start_base[token_doc]).astype(np.int32)

        positions = positions_all[keep]
        kept_doc = token_doc[keep]
        doc_lens = np.bincount(kept_doc, minlength=n_docs).astype(np.int32)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(doc_lens, out=offsets[1:])

        # analyzed vocabulary: lowercase (+stem), then unique-remap so
        # codes point into a sorted vocab of analyzed terms
        vocab = np.asarray(vocab_lower.to_pandas(), dtype=object)
        if self.stemming and vocab.size:
            vocab = self._stem_unique(vocab)
        codes = raw_codes[keep]
        if vocab.size:
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
