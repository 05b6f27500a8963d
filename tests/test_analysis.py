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


def test_synonym_filter_golden():
    from engine.analysis import Analyzer, SynonymFilter

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[SynonymFilter({"fast": "quick", "rapid": "quick"})])
    toks = a.analyze_text("Fast cars are rapid and quick")
    assert toks == [("quick", 0), ("cars", 1), ("are", 2),
                    ("quick", 3), ("and", 4), ("quick", 5)]


def test_shingle_filter_golden():
    from engine.analysis import Analyzer, ShingleFilter

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[ShingleFilter(2, 2, "_", output_unigrams=True)])
    toks = a.analyze_text("a b c")
    assert toks == [("a", 0), ("a_b", 0), ("b", 1), ("b_c", 1), ("c", 2)]

    only = Analyzer(stop_words=None, stemming=False,
                    filters=[ShingleFilter(2, 3, "_",
                                           output_unigrams=False)])
    toks2 = only.analyze_text("a b c d")
    assert toks2 == [("a_b", 0), ("a_b_c", 0), ("b_c", 1), ("b_c_d", 1),
                     ("c_d", 2)]
    # one-token doc yields no shingles; doc_lens reflects emitted count
    offs, terms, pos, lens = only.analyze_flat(
        __import__("pyarrow").array(["single", "x y"]))
    assert lens.tolist() == [0, 1] and list(terms) == ["x_y"]


def test_filter_chain_order_and_config_roundtrip():
    from engine.analysis import Analyzer, build_filter
    from engine.build import IndexConfig

    specs = ({"type": "synonym", "mapping": {"fast": "quick"}},
             {"type": "shingle", "min_size": 2, "max_size": 2,
              "sep": "_", "output_unigrams": False})
    cfg = IndexConfig(filters=specs)
    cfg2 = IndexConfig.from_json(cfg.to_json())
    assert tuple(cfg2.filters) == tuple(specs)

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[build_filter(s) for s in specs])
    # synonym applies BEFORE shingling (ordered chain)
    assert a.analyze_text("fast car") == [("quick_car", 0)]


def test_ngram_filter_golden():
    from engine.analysis import Analyzer, NGramFilter

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[NGramFilter(2, 3)])
    toks = a.analyze_text("abcd xy")
    # token "abcd": 2-grams ab bc cd + 3-grams abc bcd, all at pos 0;
    # token "xy": 2-gram xy at pos 1 (len < 3 -> no 3-gram)
    assert sorted(toks) == sorted(
        [("ab", 0), ("bc", 0), ("cd", 0), ("abc", 0), ("bcd", 0),
         ("xy", 1)])
    keep = Analyzer(stop_words=None, stemming=False,
                    filters=[NGramFilter(2, 2, preserve_original=True)])
    assert ("abcd", 0) in keep.analyze_text("abcd")


def test_ascii_folding_with_unicode_tokenizer():
    from engine.analysis import Analyzer, AsciiFoldingFilter

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[AsciiFoldingFilter()], unicode_tokens=True)
    toks = a.analyze_text("Café NAÏVE Ärger plain")
    assert toks == [("cafe", 0), ("naive", 1), ("arger", 2),
                    ("plain", 3)]
    # without the unicode tokenizer, accented chars split tokens —
    # the documented ASCII conformance boundary
    b = Analyzer(stop_words=None, stemming=False,
                 filters=[AsciiFoldingFilter()])
    assert ("cafe", 0) not in b.analyze_text("Café")


def test_unicode_tokens_config_roundtrip():
    from engine.build import IndexConfig

    cfg = IndexConfig(unicode_tokens=True,
                      filters=({"type": "ascii_folding"},))
    cfg2 = IndexConfig.from_json(cfg.to_json())
    assert cfg2.unicode_tokens and cfg2.filters == cfg.filters


def test_htmlstrip_char_filter():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, char_filters=({"type": "htmlstrip"},))
    toks = [t for t, _ in a.analyze_text(
        '<div id="x">Hello &amp; <b>world</b> &#38; more</div>')]
    assert toks == ["hello", "world", "more"]


def test_mapping_char_filter_order_and_partial_words():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, char_filters=(
        {"type": "mapping", "mapping": {"colour": "color", "ab": "x"}},))
    toks = [t for t, _ in a.analyze_text("colour abab abc")]
    assert toks == ["color", "xx", "xc"]


def test_char_filter_config_roundtrip():
    from engine.build import IndexConfig

    cfg = IndexConfig(char_filters=(
        {"type": "mapping", "mapping": {"a": "b"}},))
    assert IndexConfig.from_json(cfg.to_json()).char_filters == \
        cfg.char_filters


def test_edge_ngram_filter():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, filters=(
        {"type": "edge_ngram", "min_gram": 2, "max_gram": 3},))
    toks = [t for t, _ in a.analyze_text("sparkle go x")]
    assert toks == ["sp", "spa", "go"]


def test_metaphone_golden():
    from engine.analysis import Analyzer, metaphone

    # published-rule goldens: digraphs, silent letters, boundary rules
    assert metaphone("smith") == metaphone("smyth") == "SM0"
    assert metaphone("knight") == metaphone("night") == "NT"
    assert metaphone("philip") == metaphone("filip") == "FLP"
    assert metaphone("school") == "SKL"      # -sch- → K
    assert metaphone("xavier") == "SFR"      # initial x → s
    assert metaphone("ghost") == "KST"       # gh before vowel → K
    assert metaphone("night") == "NT"        # gh before consonant silent
    assert metaphone("dodge") == "TJ"        # -dge- → J, g consumed
    assert metaphone("sign") == "SN"         # -gn- silent
    assert metaphone("lamb") == "LM"         # trailing -mb → M
    assert metaphone("watch") == "WX"        # -tch: t silent, ch → X
    assert metaphone("honest") == "HNST"     # initial h kept
    assert metaphone("away") == "AW"         # trailing y silent
    assert metaphone("back") == "BK"         # k after c silent
    assert metaphone("accept", max_len=5) == "AKSPT"
    assert metaphone("accept") == "AKSP"     # Solr/commons default cap 4
    # filter: alpha tokens encode, digit-bearing tokens pass through
    a = Analyzer(None, False, filters=({"type": "metaphone"},))
    assert [t for t, _ in a.analyze_text("knight night x9")] == \
        ["NT", "NT", "x9"]


def test_path_hierarchy_filter_golden():
    from engine.analysis import Analyzer, PathHierarchyFilter, build_filter

    a = Analyzer(None, False, tokenizer="keyword", filters=(
        {"type": "path_hierarchy", "delimiter": "/"},))
    out = a.analyze_text("src0/en/len2")
    # every ancestor prefix, all stacked at the token's position
    assert out == [("src0", 0), ("src0/en", 0), ("src0/en/len2", 0)]
    # no delimiter -> the token passes through whole
    assert [t for t, _ in a.analyze_text("plain")] == ["plain"]
    # skip drops leading components (upstream's skip arg)
    s = Analyzer(None, False, tokenizer="keyword", filters=(
        {"type": "path_hierarchy", "delimiter": "/", "skip": 1},))
    assert [t for t, _ in s.analyze_text("a/b/c")] == ["b", "b/c"]
    # config roundtrip through the spec factory
    f = build_filter(PathHierarchyFilter("|", 2).spec())
    assert (f.delimiter, f.skip) == ("|", 2)


def test_analyze_multivalued_position_gap():
    import pyarrow as pa

    from engine.analysis import Analyzer

    a = Analyzer(None, False)
    lists = pa.array(
        [["big cat", "sat down"], ["one"], [], ["x y z", "", "q"]],
        type=pa.list_(pa.string()))
    off, codes, vocab, pos, lens = a.analyze_multivalued(lists, gap=100)
    terms = vocab[codes]
    # norms: total emitted tokens across a row's values
    assert lens.tolist() == [4, 1, 0, 4]
    assert off.tolist() == [0, 4, 5, 5, 9]
    # doc 0: second value bases at last pos + 1 + gap = 2 + 100
    assert terms[:4].tolist() == ["big", "cat", "sat", "down"]
    assert pos[:4].tolist() == [0, 1, 102, 103]
    assert pos[4] == 0
    # doc 3: the EMPTY middle value emits nothing but still adds gap
    assert terms[5:9].tolist() == ["x", "y", "z", "q"]
    assert pos[5:9].tolist() == [0, 1, 2, 203]
    # stopword holes count toward the next value's base (gap
    # semantics: position of last EMITTED token anchors the jump)
    s = Analyzer(frozenset({"the"}), False)
    _, c2, v2, p2, l2 = s.analyze_multivalued(
        pa.array([["the cat", "sat"]], type=pa.list_(pa.string())),
        gap=10)
    assert v2[c2].tolist() == ["cat", "sat"]
    assert p2.tolist() == [1, 12]      # cat at 1 (hole at 0); 1+1+10


def test_analyze_multivalued_singleton_equals_plain():
    """A list column of single-element values must analyze exactly like
    the plain string column (the gap never fires) — for the full chain
    including stop/stem."""
    import pyarrow as pa

    from engine.analysis import Analyzer

    texts = ["The running Spark merges windows", "", "one two the three",
             "punct,   and; spaces!"]
    a = Analyzer()          # default chain: stop + stem
    plain = a.analyze_encoded(pa.array(texts))
    multi = a.analyze_multivalued(
        pa.array([[t] for t in texts], type=pa.list_(pa.string())),
        gap=100)
    for p, m in zip(plain, multi):
        import numpy as np
        assert np.array_equal(np.asarray(p, dtype=object),
                              np.asarray(m, dtype=object))


def test_length_filter_keeps_positions():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, filters=(
        {"type": "length", "min_len": 3, "max_len": 5},))
    out = a.analyze_text("go spark merge reviewing ox cat")
    assert out == [("spark", 1), ("merge", 2), ("cat", 5)]


def test_analyze_text_fast_path_matches():
    """Single-string fast path ≡ Arrow batch path for every plain
    config (stop/stem on and off, odd whitespace/punct/empties)."""
    import pyarrow as pa

    from engine.analysis import Analyzer

    samples = [
        "", "   ", "The quick-brown FOX; and 42 running dogs!!",
        "a the of", "running runner runs", "x", "..y..",
        "Connection connected CONNECTING", "tab\tnew\nline",
    ]
    for stop in (None, True):
        for stemming in (False, True):
            from engine.analysis import ENGLISH_STOP_WORDS

            sw = ENGLISH_STOP_WORDS if stop else None
            a = Analyzer(sw, stemming)
            for s in samples:
                fast = a.analyze_text(s)
                offsets, terms, positions, _ = a.analyze_flat(
                    pa.array([s]))
                slow = list(zip(terms.tolist(), positions.tolist()))
                assert fast == slow, (s, stop, stemming, fast, slow)


def test_soundex_known_codes():
    """Published American Soundex vectors (NARA examples) incl. the
    h/w merge (Ashcraft) and vowel-separation (Tymczak) rules."""
    from engine.analysis import soundex

    for t, want in [("robert", "r163"), ("rupert", "r163"),
                    ("ashcraft", "a261"), ("ashcroft", "a261"),
                    ("tymczak", "t522"), ("pfister", "p236"),
                    ("honeyman", "h555"), ("jackson", "j250"),
                    ("a", "a000"), ("lee", "l000")]:
        assert soundex(t) == want, t


def test_soundex_filter_passthrough_digits():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, filters=({"type": "soundex"},))
    out = a.analyze_text("robert x42 rupert")
    assert out == [("r163", 0), ("x42", 1), ("r163", 2)]


def test_pattern_replace_filter():
    from engine.analysis import Analyzer

    a = Analyzer(None, False, filters=(
        {"type": "pattern_replace", "pattern": "[0-9]+",
         "replacement": "#"},))
    out = a.analyze_text("v1 log2024x plain")
    assert [t for t, _ in out] == ["v#", "log#x", "plain"]


def test_new_filters_config_roundtrip():
    from engine.analysis import build_filter

    for spec in ({"type": "soundex"},
                 {"type": "pattern_replace", "pattern": "a+",
                  "replacement": "a"}):
        assert build_filter(spec).spec() == spec


def test_common_grams_filter_golden():
    from engine.analysis import Analyzer, CommonGramsFilter, build_filter

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[CommonGramsFilter(["the", "a"])])
    # bigram emitted whenever EITHER adjacent token is common, at the
    # first token's position; unigrams always pass through
    toks = a.analyze_text("the quick fox a dog")
    assert toks == [("the", 0), ("the_quick", 0), ("quick", 1),
                    ("fox", 2), ("fox_a", 2), ("a", 3), ("a_dog", 3),
                    ("dog", 4)]
    # no common word adjacent -> stream unchanged
    assert a.analyze_text("quick fox") == [("quick", 0), ("fox", 1)]
    spec = CommonGramsFilter(["the", "a"]).spec()
    assert build_filter(spec).spec() == spec


def test_minhash_token_filter_golden():
    import hashlib
    import struct

    from engine.analysis import Analyzer, MinHashTokenFilter, build_filter

    def h64(t):
        return struct.unpack("<Q", hashlib.md5(t.encode()).digest()[8:])[0]

    a = Analyzer(stop_words=None, stemming=False,
                 filters=[MinHashTokenFilter(k=2)])
    toks = a.analyze_text("b a b c")
    want = sorted(h64(t) for t in {"a", "b", "c"})[:2]
    assert toks == [(str(want[0]), 0), (str(want[1]), 1)]
    # fewer distinct terms than k -> fewer tokens
    assert len(a.analyze_text("x x x")) == 1
    spec = MinHashTokenFilter(3).spec()
    assert build_filter(spec).spec() == spec


def test_word_delimiter_golden():
    from engine.analysis import Analyzer

    a = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "word_delimiter",
                           "preserve_original": False},))
    toks = sorted(a.analyze_text("plain sku123x x9 42"))
    # positions: every part keeps its source token's position
    assert toks == sorted([("plain", 0), ("sku", 1), ("123", 1),
                           ("x", 1), ("x", 2), ("9", 2), ("42", 3)])
    b = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "word_delimiter",
                           "preserve_original": True},))
    toks2 = sorted(b.analyze_text("sku123x"))
    assert toks2 == sorted([("sku123x", 0), ("sku", 0), ("123", 0),
                            ("x", 0)])


def test_truncate_and_reverse_filters_golden():
    from engine.analysis import Analyzer

    t = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "truncate", "length": 4},))
    assert t.analyze_text("Hello worlds ab") == \
        [("hell", 0), ("worl", 1), ("ab", 2)]
    r = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "reverse_string"},))
    assert r.analyze_text("abc de") == [("cba", 0), ("ed", 1)]


def test_limit_token_count_filter():
    import pyarrow as pa

    from engine.analysis import Analyzer

    a = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "limit_count", "max_count": 2},))
    off, terms, pos, lens = a.analyze_flat(
        pa.array(["one two three four", "solo", ""]))
    assert lens.tolist() == [2, 1, 0]
    assert terms.tolist() == ["one", "two", "solo"]
    assert pos.tolist() == [0, 1, 0]
    # stopwords consume positions BEFORE the limit filter sees the
    # stream: the filter keeps the first 2 EMITTED tokens
    b = Analyzer(stemming=False,
                 filters=({"type": "limit_count", "max_count": 2},))
    assert b.analyze_text("the quick brown fox") == \
        [("quick", 1), ("brown", 2)]


def test_stem_filter_keyword_marker_protect():
    from engine.analysis import Analyzer

    a = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "stem", "protect": ["running"]},))
    assert a.analyze_text("running jumps dogs") == \
        [("running", 0), ("jump", 1), ("dog", 2)]
    # without the protect list the stemmer applies everywhere
    b = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "stem"},))
    assert b.analyze_text("running jumps")[0] == ("run", 0)


def test_keyword_tokenizer_and_trim():
    import pyarrow as pa

    from engine.analysis import Analyzer

    a = Analyzer(stop_words=None, stemming=False, tokenizer="keyword",
                 filters=({"type": "trim"},))
    off, terms, pos, lens = a.analyze_flat(
        pa.array(["  Hello World  ", "", "   ", None, "x"]))
    assert lens.tolist() == [1, 0, 0, 0, 1]
    assert terms.tolist() == ["hello world", "x"]
    assert pos.tolist() == [0, 0]


def test_whitespace_and_letter_tokenizers():
    from engine.analysis import Analyzer

    w = Analyzer(stop_words=None, stemming=False, tokenizer="whitespace")
    assert w.analyze_text("Hello, world! it's x") == \
        [("hello,", 0), ("world!", 1), ("it's", 2), ("x", 3)]
    le = Analyzer(stop_words=None, stemming=False, tokenizer="letter")
    assert le.analyze_text("abc123def gh") == \
        [("abc", 0), ("def", 1), ("gh", 2)]


def test_tokenizer_config_roundtrip():
    from engine.build import IndexConfig

    cfg = IndexConfig(tokenizer="whitespace",
                      filters=({"type": "trim"},))
    cfg2 = IndexConfig.from_json(cfg.to_json())
    assert cfg2.tokenizer == "whitespace"
    # legacy manifests (no tokenizer key) load as standard
    d = cfg.to_json()
    del d["tokenizer"]
    assert IndexConfig.from_json(d).tokenizer == "standard"


def test_keyword_repeat_filter_golden():
    """KeywordRepeat -> inner rewrite -> RemoveDuplicates: both the
    original and the rewrite emit at the SAME position; identical
    pairs collapse; doc length ignores the stacked copy
    (discountOverlaps)."""
    from engine.analysis import Analyzer

    a = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "keyword_repeat",
                           "inner": {"type": "truncate", "length": 4}},))
    # 'hello' -> hello+hell (differs); 'ab' -> collapses to one token
    got = sorted(a.analyze_text("hello ab"))
    assert got == [("ab", 1), ("hell", 0), ("hello", 0)]
    # Porter stem inner: original and stem stacked at one position
    s = Analyzer(stop_words=None, stemming=False,
                 filters=({"type": "keyword_repeat",
                           "inner": {"type": "stem"}},))
    got = sorted(s.analyze_text("running"))
    assert got == [("run", 0), ("running", 0)]
    # doc_lens is the emitted-token count (the filter-chain contract,
    # discountOverlaps=false boundary): stacked copies count
    import numpy as np
    import pyarrow as pa
    lens = a.analyze_flat(pa.array(["hello ab hello", "abc de"]))[3]
    assert list(lens) == [5, 2]       # hello+hell twice + ab; no stacks


class TestUAX29Tokenizer:
    """Golden UAX#29 word-break fixtures (upstream
    ``StandardTokenizerImpl.jflex`` [U]) — mixed-script cases beyond
    the registry oracle's regex-replayable subset."""

    GOLDEN = [
        # ASCII + MidLetter / MidNumLet / Single_Quote joins
        ("can't stop, won't e.g. a:b", ["can't", "stop", "won't",
                                        "e.g", "a:b"]),
        # numeric separators (WB8/11/12): . and , join digits
        ("pi is 3.14159 and 1,000,000 items",
         ["pi", "is", "3.14159", "and", "1,000,000", "items"]),
        # mid chars do NOT join across letter/digit class (a.1 splits)
        ("a.1 1.a", ["a", "1", "1", "a"]),
        # ExtendNumLet underscore joins letters, digits, katakana
        ("foo_bar _lead trail_ a_1", ["foo_bar", "_lead", "trail_",
                                      "a_1"]),
        # accented latin + combining mark (e + U+0301 stays attached)
        ("naïve café über", ["naïve", "café", "über"]),
        # Han + Hiragana per character, Katakana runs
        ("日本語のテキスト", ["日", "本", "語", "の", "テキスト"]),
        # Hangul syllable runs (ALetter)
        ("한국어 텍스트", ["한국어", "텍스트"]),
        # Hebrew with single/double quote rules (WB7a/7b/7c)
        ("צה\"ל מ'", ["צה\"ל", "מ'"]),
        # mixed letter+digit runs join directly (WB9/10)
        ("abc123def 42x x42", ["abc123def", "42x", "x42"]),
        # punctuation-only and whitespace emit nothing
        ("... --- !!!", []),
        # regional indicator pairs (WB15): flags pair up two-by-two
        ("\U0001F1FA\U0001F1F8\U0001F1E9\U0001F1EA x",
         ["\U0001F1FA\U0001F1F8", "\U0001F1E9\U0001F1EA", "x"]),
    ]

    def test_golden_segments(self):
        import pyarrow as pa

        from engine.uax29 import segment_batch

        got = segment_batch(
            pa.array([t for t, _ in self.GOLDEN])).to_pylist()
        for (txt, want), toks in zip(self.GOLDEN, got):
            assert toks == want, (txt, toks, want)

    def test_analyzer_tier_end_to_end(self):
        """tokenizer='uax29' through the full analyzer chain:
        lowercase applies, positions count emitted tokens."""
        import pyarrow as pa

        from engine.analysis import Analyzer

        a = Analyzer(stop_words=None, stemming=False,
                     tokenizer="uax29")
        offs, terms, pos, lens = a.analyze_flat(
            pa.array(["Grüße 日本語 Can't", ""]))
        assert terms.tolist() == ["grüße", "日", "本", "語", "can't"]
        assert pos.tolist() == [0, 1, 2, 3, 4]
        assert lens.tolist() == [5, 0]

    def test_batch_boundaries_do_not_leak(self):
        """Tokens never join across document boundaries."""
        import pyarrow as pa

        from engine.uax29 import segment_batch

        out = segment_batch(pa.array(["abc", "def", "日", "本"]))
        assert out.to_pylist() == [["abc"], ["def"], ["日"], ["本"]]


def test_elision_and_decimal_digit_filters():
    """ElisionFilter strips the FIRST elided article only;
    DecimalDigitFilter folds any-script decimal digits to ASCII."""
    import pyarrow as pa

    from engine.analysis import Analyzer

    a = Analyzer(stop_words=None, stemming=False, tokenizer="uax29",
                 filters=({"type": "elision"},
                          {"type": "decimal_digit"}))
    _, terms, _, _ = a.analyze_flat(pa.array([
        "L'homme et l'idée d'aujourd'hui", "room ٤٢ and ４２ here"]))
    assert terms.tolist() == ["homme", "et", "idée", "aujourd'hui",
                              "room", "42", "and", "42", "here"]


def test_max_token_length_splits():
    """StandardTokenizer maxTokenLen semantics: over-long runs SPLIT
    into consecutive chunks (not truncated), positions advance per
    chunk; default 255; zero effect on normal text."""
    import pyarrow as pa

    from engine.analysis import Analyzer

    long = "x" * 600
    a = Analyzer(stop_words=None, stemming=False)
    offs, terms, pos, lens = a.analyze_flat(
        pa.array([f"start {long} end"]))
    assert terms.tolist() == ["start", "x" * 255, "x" * 255, "x" * 90,
                              "end"]
    assert pos.tolist() == [0, 1, 2, 3, 4]
    # single-string fast path agrees
    assert [t for t, _ in a.analyze_text(f"start {long} end")] == \
        terms.tolist()
    # custom cap
    b = Analyzer(stop_words=None, stemming=False, max_token_len=4)
    _, t2, _, _ = b.analyze_flat(pa.array(["abcdefgh ij"]))
    assert t2.tolist() == ["abcd", "efgh", "ij"]


def test_uax29_sliced_and_null_arrays():
    """Buffer-level decode must honor Arrow array offsets (sliced
    inputs) and null rows — the classic zero-copy hazards."""
    import pyarrow as pa

    from engine.uax29 import segment_batch

    base = pa.array(["skip me", "naïve fox", None, "日本 ok",
                     "🇺🇸🇩🇪 end", "tail"])
    sliced = base.slice(1, 4)
    got = segment_batch(sliced).to_pylist()
    assert got == [["naïve", "fox"], [], ["日", "本", "ok"],
                   ["🇺🇸", "🇩🇪", "end"]]
    # slice starting mid-array with multibyte before it
    s2 = base.slice(3, 2)
    assert segment_batch(s2).to_pylist() == [["日", "本", "ok"],
                                             ["🇺🇸", "🇩🇪", "end"]]


def test_dict_segment_dp_least_cost():
    """DP segmentation: piece count is OPTIMAL (checked against a
    brute-force enumeration over random small runs/lexicons), the
    garden-path case beats greedy, ties go to the longer earlier
    piece, and pieces always reassemble the run."""
    import itertools
    import random

    from engine.analysis import DictSegmentDPFilter, DictSegmentFilter

    lex = ["中国", "国人民"]
    g = DictSegmentFilter(lex)._segment("中国人民")
    d = DictSegmentDPFilter(lex)._segment("中国人民")
    assert [w for _, w in g] == ["中国", "人", "民"]
    assert [w for _, w in d] == ["中", "国人民"]
    # tie → longer earlier piece: run abc, lex {ab, bc}: both cost 2
    t = DictSegmentDPFilter(["ab", "bc"])._segment("abc")
    assert [w for _, w in t] == ["ab", "c"]

    def brute_min(run, sset, maxlen):
        best = len(run)
        n = len(run)
        # enumerate all cut sets
        for bits in itertools.product([0, 1], repeat=n - 1):
            cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
            parts = [run[a:b] for a, b in zip(cuts, cuts[1:])]
            if all(len(p) == 1 or p in sset for p in parts):
                best = min(best, len(parts))
        return best

    rng = random.Random(5)
    alpha = "xyzw"
    for _ in range(60):
        words = {"".join(rng.choices(alpha, k=rng.randint(2, 3)))
                 for _ in range(rng.randint(1, 4))}
        f = DictSegmentDPFilter(words)
        run = "".join(rng.choices(alpha, k=rng.randint(1, 9)))
        segs = f._segment(run)
        assert "".join(w for _, w in segs) == run
        assert [o for o, _ in segs] == \
            [sum(len(w) for _, w in segs[:i]) for i in range(len(segs))]
        assert len(segs) == brute_min(run, f._set, f._maxlen), (
            run, sorted(words), segs)


def test_uax_url_email_sentinel_batch_scan():
    """r5 single-scan tokenizer: one findall over \\x01-joined docs
    must equal the per-row scan, including empty docs, docs made of
    only separators, and the \\x01-collision fallback."""
    import pyarrow as pa

    from engine.analysis import Analyzer, UAX_COMBINED_RX
    import re

    a = Analyzer(None, False, tokenizer="uax_url_email")
    docs = ["see http://x.y/z?a=1 now", "", "mail me@host.org!",
            "...", "a b c", "only.words.here and x@y.zz",
            "\x01 embedded sentinel http://q.r/s"]
    out = a.analyze_encoded(pa.array(docs))
    offsets, codes, vocab, _pos, lens = out
    rx = re.compile(UAX_COMBINED_RX)
    want = [[t.lower() for t in rx.findall(d.replace("\x01", " "))
             ] for d in docs]
    # fallback path keeps \x01 out of tokens (no class admits it)
    got = [[vocab[c] for c in codes[offsets[i]:offsets[i + 1]]]
           for i in range(len(docs))]
    assert [sorted(g) for g in got] == [sorted(w) for w in want]
    assert lens.tolist() == [len(w) for w in want]


def test_char_filter_offset_maps_htmlstrip():
    """HTMLStrip apply_with_offsets: same output as the vectorized
    apply(), and every filtered offset maps back to the raw position
    of the same character (upstream correctOffset contract)."""
    import pyarrow as pa

    from engine.analysis import HTMLStripCharFilter

    f = HTMLStripCharFilter()
    raw = '<p class="x">ab &amp; cd</p> tail &#38; <br/>end'
    filtered, correct = f.apply_with_offsets(raw)
    assert filtered == f.apply(pa.array([raw]))[0].as_py()
    for i, ch in enumerate(filtered):
        o = correct(i)
        if ch != " ":            # replacement spaces map to region starts
            assert raw[o] == ch, (i, ch, o, raw[o])
    # exclusive end offset just past the final char
    assert correct(len(filtered)) == len(raw)


def test_htmlstrip_blocks_and_cdata():
    """r5 state-machine stages: script/style bodies and comments strip
    AS UNITS, CDATA unwraps to its content; Arrow and per-string paths
    agree; offsets survive the 4-stage composition."""
    import pyarrow as pa

    from engine.analysis import HTMLStripCharFilter

    f = HTMLStripCharFilter()
    raw = ('<div><script type="t">var spark = 1;</script>body spark'
           '<!-- spark hidden --><style>p{x:y}</style>'
           '<![CDATA[kept &amp;data]]>tail</div>')
    got = f.apply(pa.array([raw]))[0].as_py()
    # decoy occurrences inside script/comment are gone; cdata kept
    assert got.count("spark") == 1
    assert "var" not in got and "hidden" not in got and "x:y" not in got
    assert "kept" in got and "data" in got
    # cdata content is still subject to the entity stage (documented)
    assert "&amp;" not in got
    filtered, correct = f.apply_with_offsets(raw)
    assert filtered == got
    p = filtered.find("spark")
    o = correct(p)
    assert raw[o:o + 5] == "spark" and o == raw.find("body spark") + 5
    for i, ch in enumerate(filtered):
        if ch != " ":
            assert raw[correct(i)] == ch, (i, ch)
    assert correct(len(filtered)) == len(raw)
    # multiline script bodies strip too ((?s) flag)
    ml = "<script>\nline1\nline2\n</script>ok"
    assert f.apply(pa.array([ml]))[0].as_py() == " ok"
    # unterminated block consumes to EOF (upstream's to-EOF states)
    un = "keep <script>var leak = 1;"
    assert f.apply(pa.array([un]))[0].as_py() == "keep  "
    f2, c2 = f.apply_with_offsets(un)
    assert f2 == "keep  " and un[c2(0)] == "k"
    # unterminated comment / CDATA opener
    assert f.apply(pa.array(["a<!--never closed"]))[0].as_py() == "a "
    assert f.apply(pa.array(["a<![CDATA[kept to eof"]))[0].as_py() \
        == "akept to eof"


def test_htmlstrip_sql_template_parity():
    """The SQL four-stage strip template must equal the engine filter
    character for character on block/CDATA-bearing text."""
    import duckdb
    import pyarrow as pa

    from engine.analysis import HTMLStripCharFilter
    from engine.registry import _SQL_STRIP_FULL_TPL

    f = HTMLStripCharFilter()
    rows = [
        '<div><script type="t">var q = spark;</script>hit spark'
        '<!-- c --><style>s{}</style><![CDATA[cd &amp;x]]>t</div>',
        "plain text no markup",
        "<SCRIPT>upper case</SCRIPT>mix<Style>s</stylE>ok",
        "a<![CDATA[]]>b<!---->c",
        "nested <script>a<!--b--></script>d",
        "unterminated <script>to eof",
        "open <style>never closed",
        "cmt <!--dangling",
        "cd <![CDATA[rest kept",
        "multi\n<script>a\nb</script>\nline",
    ]
    expr = _SQL_STRIP_FULL_TPL.format(col="t")
    got_sql = [r[0] for r in duckdb.connect().execute(
        "SELECT " + expr + " FROM (SELECT unnest(?) AS t)",
        [rows]).fetchall()]
    got_arrow = f.apply(pa.array(rows)).to_pylist()
    assert got_sql == got_arrow
    for raw, want in zip(rows, got_arrow):
        assert f.apply_with_offsets(raw)[0] == want


def test_htmlstrip_fuzz_three_way_parity():
    """Random markup soup (tags, dangling openers, entities, CDATA,
    nesting, newlines): the Arrow kernel, the per-string offset path,
    and the SQL template must agree character for character, and
    every surviving char must map back to itself."""
    import random

    import duckdb
    import pyarrow as pa

    from engine.analysis import HTMLStripCharFilter
    from engine.registry import _SQL_STRIP_FULL_TPL

    rng = random.Random(17)
    pieces = ["a", "b", " ", "\n", "<", ">", "&", ";", "&amp;",
              "&#38;", "<p>", "</p>", "<script>", "</script>",
              "<script x=1>", "<style>", "</style>", "<!--", "-->",
              "<![CDATA[", "]]>", "spark", "<br/>", "&nope", "#9;"]
    rows = ["".join(rng.choices(pieces, k=rng.randint(1, 14)))
            for _ in range(300)]
    f = HTMLStripCharFilter()
    got_arrow = f.apply(pa.array(rows)).to_pylist()
    expr = _SQL_STRIP_FULL_TPL.format(col="t")
    got_sql = [r[0] for r in duckdb.connect().execute(
        "SELECT " + expr + " FROM (SELECT unnest(?) AS t)",
        [rows]).fetchall()]
    assert got_sql == got_arrow
    for raw, want in zip(rows, got_arrow):
        filtered, correct = f.apply_with_offsets(raw)
        assert filtered == want, raw
        last = -1
        for i, ch in enumerate(filtered):
            o = correct(i)
            assert o >= last, (raw, i)      # monotone map
            last = o
            if ch != " ":
                assert raw[o] == ch, (raw, i, ch)
        assert correct(len(filtered)) <= len(raw)


def test_char_filter_offset_maps_mapping():
    """MappingCharFilter with length-changing rewrites keeps the
    offset map consistent with sequential vectorized replaces."""
    import pyarrow as pa

    from engine.analysis import MappingCharFilter

    f = MappingCharFilter({"spark": "flink!", "&": "and"})
    raw = "spark & spark streams"
    filtered, correct = f.apply_with_offsets(raw)
    assert filtered == f.apply(pa.array([raw]))[0].as_py()
    assert filtered == "flink! and flink! streams"
    # 'streams' survives both rewrites: its chars map to raw offsets
    p = filtered.find("streams")
    o = correct(p)
    assert raw[o:o + len("streams")] == "streams"


def test_char_filter_offsets_chain_composes():
    from engine.analysis import (HTMLStripCharFilter,
                                 MappingCharFilter,
                                 char_filter_offsets)

    chain = [HTMLStripCharFilter(), MappingCharFilter({"qq": "q"})]
    raw = "<b>one</b> qq two"
    filtered, correct = char_filter_offsets(chain, raw)
    assert filtered == " one  q two"
    p = filtered.find("two")
    o = correct(p)
    assert raw[o:o + 3] == "two"


def test_uax29_wb3c_emoji_zwj_sequences():
    """WB3c (ZWJ × Extended_Pictographic): published emoji ZWJ
    sequences hold as ONE token; EP segments emit as emoji tokens
    (ICUTokenizer LUCENE-8013 behavior); RI pairing and letter
    boundaries unchanged."""
    import pyarrow as pa

    from engine.uax29 import segment_batch

    def toks(s):
        return segment_batch(pa.array([s])).to_pylist()[0]

    fam = "\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466"
    assert toks(f"family {fam} end") == ["family", fam, "end"]
    flag = "\U0001F3F3️‍\U0001F308"      # VS16 + ZWJ chain
    assert toks(f"flag {flag} here") == ["flag", flag, "here"]
    thumbs = "\U0001F44D\U0001F3FD"                # skin-tone Extend
    assert toks(f"ok {thumbs}") == ["ok", thumbs]
    kiss = ("\U0001F469‍❤️‍"
            "\U0001F48B‍\U0001F468")
    assert toks(f"kiss {kiss} seq") == ["kiss", kiss, "seq"]
    # regional indicators still pair, never chain
    assert toks("us \U0001F1FA\U0001F1F8\U0001F1E9\U0001F1EA x") == \
        ["us", "\U0001F1FA\U0001F1F8", "\U0001F1E9\U0001F1EA", "x"]
    # a bare pictograph is its own token; letters break off it
    assert toks("mix ☕ and \U0001F9EAx") == \
        ["mix", "☕", "and", "\U0001F9EA", "x"]


def test_uax29_single_codepoint_batch():
    """Regression: a batch whose total visible stream is ONE codepoint
    crashed segment_batch (the 2-pad pprev context array broadcast
    every rule mask to length 2)."""
    import pyarrow as pa

    from engine.uax29 import segment_batch

    assert segment_batch(pa.array(["a"])).to_pylist() == [["a"]]
    assert segment_batch(pa.array(["語"])).to_pylist() == [["語"]]
    assert segment_batch(pa.array([""])).to_pylist() == [[]]
    assert segment_batch(pa.array([".", "b"])).to_pylist() == \
        [[], ["b"]]


def test_cjk_bigram_filter_golden():
    """CJKBigramFilter (CJKAnalyzer default): overlapping bigrams
    over position-adjacent Han/Hiragana singles (joining across
    spaces like upstream's posInc-1 gaps), isolated singles survive,
    Katakana runs pass through, output_unigrams keeps the singles."""
    from engine.analysis import Analyzer

    a = Analyzer(None, False, tokenizer="uax29",
                 filters=({"type": "cjk_bigram"},))
    assert a.analyze_text("日本語の解析 test") == [
        ("日本", 0), ("本語", 1), ("語の", 2), ("の解", 3),
        ("解析", 4), ("test", 6)]
    assert a.analyze_text("日 本") == [("日本", 0)]     # across space
    assert a.analyze_text("abc 語 def") == [
        ("abc", 0), ("語", 1), ("def", 2)]              # isolated
    assert a.analyze_text("カタカナ 日本") == [
        ("カタカナ", 0), ("日本", 1)]                   # run intact
    au = Analyzer(None, False, tokenizer="uax29",
                  filters=({"type": "cjk_bigram",
                            "output_unigrams": True},))
    assert au.analyze_text("日本語") == [
        ("日本", 0), ("日", 0), ("本語", 1), ("本", 1), ("語", 2)]


def test_cjk_width_filter_golden():
    """CJKWidthFilter: halfwidth kana → fullwidth with voiced-mark
    composition; fullwidth ASCII → basic Latin; standalone marks map
    to their fullwidth forms; the voiced-mark chars stay inside one
    Katakana run (WordBreak.txt classes FF9E/FF9F as Katakana)."""
    from engine.analysis import Analyzer

    a = Analyzer(None, False, tokenizer="uax29",
                 filters=({"type": "cjk_width"},))

    def toks(s):
        return [t for t, _ in a.analyze_text(s)]

    assert toks("ｶﾞｷﾞｭｳ ﾃﾞｰﾀ") == ["ガギュウ", "データ"]
    assert toks("ﾊﾟﾝﾀﾞ ｳﾞｧｲｵﾘﾝ") == ["パンダ", "ヴァイオリン"]
    assert toks("ｆｕｌｌｗｉｄｔｈ ５６７ ascii") == \
        ["fullwidth", "567", "ascii"]
    assert toks("ﾄｳｷｮｳ") == ["トウキョウ"]


def test_dict_segment_filter_golden():
    """DictSegmentFilter (greedy forward max-match over a lexicon):
    longest word wins, unmatched chars pass as singles, runs join
    across spaces (position adjacency), non-CJK tokens untouched."""
    from engine.analysis import Analyzer

    lex = ["日本", "日本語", "解析", "検索", "大規模"]
    a = Analyzer(None, False, tokenizer="uax29",
                 filters=({"type": "dict_segment", "words": lex},))
    assert a.analyze_text("日本語の解析") == [
        ("日本語", 0), ("の", 3), ("解析", 4)]
    assert a.analyze_text("日本 の 検索 data") == [
        ("日本", 0), ("の", 2), ("検索", 3), ("data", 5)]
    assert a.analyze_text("大規模検索") == [
        ("大規模", 0), ("検索", 3)]
    assert [t for t, _ in a.analyze_text("カタカナ 語")] == \
        ["カタカナ", "語"]
