"""Analyzer conformance (FIXTURES.md F4): goldens incl. stopword position gaps."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from engine.analysis import Analyzer, ENGLISH_STOP_WORDS


@pytest.fixture(scope="module")
def an():
    return Analyzer()


def test_stop_word_set_is_reference_33(an):
    assert len(ENGLISH_STOP_WORDS) == 33


def test_basic_lowercase_and_split(an):
    assert an.analyze_text("Hello World") == [("hello", 0), ("world", 1)]


def test_punctuation_splits(an):
    assert an.analyze_text("end. (start)") == [("end", 0), ("start", 1)]


def test_stopword_position_gap(an):
    # "the" consumes position 0; "quick" lands at 1, "fox" at 3
    out = an.analyze_text("The quick the fox")
    assert out == [("quick", 1), ("fox", 3)]


def test_stemming(an):
    assert an.analyze_text("running connections") == [("run", 0), ("connect", 1)]


def test_stopword_only_doc(an):
    assert an.analyze_text("the of and to") == []


def test_empty_and_numbers(an):
    assert an.analyze_text("") == []
    assert an.analyze_text("abc123 42") == [("abc123", 0), ("42", 1)]


def test_no_stem_mode():
    a2 = Analyzer(stemming=False)
    assert a2.analyze_text("running") == [("running", 0)]


def test_no_stop_mode():
    a3 = Analyzer(stop_words=None, stemming=False)
    assert a3.analyze_text("the fox") == [("the", 0), ("fox", 1)]


def test_batch_offsets_and_doclens(an):
    texts = pa.array(["The quick fox", "", "running runs ran", "the of"])
    offsets, terms, positions, doc_lens = an.analyze_flat(texts)
    np.testing.assert_array_equal(doc_lens, [2, 0, 3, 0])
    np.testing.assert_array_equal(offsets, [0, 2, 2, 5, 5])
    assert terms.tolist() == ["quick", "fox", "run", "run", "ran"]
    np.testing.assert_array_equal(positions, [1, 2, 0, 1, 2])


def test_batch_matches_single(an):
    docs = ["Connection refused at host", "the THE The", "Stemming stems stemmed!"]
    offsets, terms, positions, _ = an.analyze_flat(pa.array(docs))
    for i, d in enumerate(docs):
        seg = slice(offsets[i], offsets[i + 1])
        assert list(zip(terms[seg].tolist(),
                        positions[seg].tolist())) == an.analyze_text(d)
