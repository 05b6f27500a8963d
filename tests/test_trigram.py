"""Trigram term-dictionary sidecar (engine/trigram.py): vectorized
construction parity vs a per-term Python reference, build-time sidecar
emission on every shard-writing path, reader consumption with zero
inline rebuilds, and the stale-sidecar fallback guard."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.trigram import (SIDECAR_NAME, TrigramIndex,
                            encode_gram_codes, gram_term_pairs,
                            load_sidecar, sorted_unique_terms,
                            write_sidecar)


def _py_pairs(terms: list[str]) -> set[tuple[int, int]]:
    """Per-term Python reference for (gram_code, ordinal) pairs."""
    out = set()
    for i, t in enumerate(terms):
        for j in range(len(t) - 2):
            g = t[j:j + 3]
            code = (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])
            out.add((code, i))
    return out


@pytest.mark.parametrize("terms", [
    [],
    ["ab"],                      # all below trigram length
    ["abc"],
    ["abc", "abcd", "bcde", "xyzzy"],
    ["café", "naïve", "日本語のテスト", "ZWJ‍🧪", "aaa", "aaaa"],
    ["", "a", "ab", "abc", "ab", "abc"],      # dupes + shorts mixed
])
def test_gram_term_pairs_matches_python_reference(terms):
    arr = sorted_unique_terms(pa.array(terms, type=pa.string()))
    g, o = gram_term_pairs(arr)
    got = set(zip(g.tolist(), o.tolist()))
    assert got == _py_pairs(arr.to_pylist())
    # sorted by (gram, ord) and distinct
    assert len(got) == len(g)
    order = np.lexsort((o, g))
    assert np.array_equal(order, np.arange(len(g)))


def test_encode_gram_codes_matches_pairs():
    s = "abcdeab"
    codes = encode_gram_codes(s)
    ref = {(ord(s[j]) << 42) | (ord(s[j + 1]) << 21) | ord(s[j + 2])
           for j in range(len(s) - 2)}
    assert set(codes.tolist()) == ref
    assert len(encode_gram_codes("ab")) == 0


def test_trigram_index_postings_roundtrip(tmp_path):
    terms = sorted_unique_terms(pa.array(
        ["quick", "quicken", "quickly", "brown", "braun"]))
    tri = TrigramIndex.from_terms(terms)
    qui = tri.postings(int(encode_gram_codes("qui")[0]))
    names = terms.to_pylist()
    assert [names[i] for i in qui] == ["quick", "quicken", "quickly"]
    assert len(tri.postings(0)) == 0
    # persist / reload through the sidecar writer
    d = str(tmp_path / "shard")
    os.makedirs(d)
    pq.write_table(pa.table({"term": terms,
                             "cf": [1] * len(terms)}),
                   os.path.join(d, "merged-0.parquet"))
    assert write_sidecar(d) > 0
    loaded = load_sidecar(d, len(terms))
    assert loaded is not None
    assert np.array_equal(loaded.grams, tri.grams)
    assert np.array_equal(loaded.ords, tri.ords)
    # stale guard: n_terms mismatch -> None (caller rebuilds inline)
    assert load_sidecar(d, len(terms) + 1) is None


def test_build_emits_sidecars_and_reader_consumes(smoke_index):
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    sides = glob.glob(os.path.join(idx, "**", SIDECAR_NAME),
                      recursive=True)
    assert sides, "build must emit per-bucket trigram sidecars"
    r = IndexReader(idx)
    vocab = r.vocabulary()
    probe = max(vocab, key=len)          # longest term: tight q-grams
    cands = r._fuzzy_candidates(probe, 1)
    assert probe in cands
    assert len(cands) < len(vocab)
    # the pinned round-4 contract: candidates came from the sidecars,
    # with ZERO in-reader trigram construction of any kind
    assert r.tri_sidecar_loads > 0
    assert r.tri_inline_builds == 0


def test_stale_sidecar_falls_back_to_inline_build(smoke_index,
                                                  tmp_path):
    import shutil

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    work = str(tmp_path / "stale")
    shutil.copytree(idx, work)
    # corrupt every sidecar's n_terms metadata
    for side in glob.glob(os.path.join(work, "**", SIDECAR_NAME),
                          recursive=True):
        t = pq.read_table(side).replace_schema_metadata(
            {b"n_terms": b"1"})
        pq.write_table(t, side)
    r_good = IndexReader(idx)
    r_stale = IndexReader(work)
    probe = max(r_good.vocabulary(), key=len)
    assert r_stale._fuzzy_candidates(probe, 1) == \
        r_good._fuzzy_candidates(probe, 1)
    assert r_stale.tri_inline_builds > 0
    assert r_stale.tri_sidecar_loads == 0


def test_preloaded_and_lazy_candidates_agree(smoke_index):
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    rp = IndexReader(idx, preload=True)
    probe = max(r.vocabulary(), key=len)
    assert r._fuzzy_candidates(probe, 1) == \
        rp._fuzzy_candidates(probe, 1)
    lit = probe[:4]
    assert r._dict_candidates(required=[lit]) == \
        rp._dict_candidates(required=[lit])
    # degenerate filters keep the full-vocabulary contract
    assert r._dict_candidates(required=["ab"]) == r.vocabulary()


@pytest.mark.parametrize("pattern", [
    "a.c", "..x", "qu...", "q.{2}rk", "[bf]ox", ".*x", "ab[cd]",
    "(ab|pre).*", "s..r.",
])
def test_regex_shape_prune_equals_full_scan(smoke_index, pattern):
    """Literal-free patterns: the shape filter (length bounds +
    anchored char classes via Arrow kernels) must be a superset of
    the true matches — pruned full-match == full-scan full-match."""
    import re

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    rx = re.compile(pattern)
    vocab = r.vocabulary()
    full = [t for t in vocab if rx.fullmatch(t)]
    cands = r._shape_candidates(IndexReader._regex_shape(pattern))
    assert [t for t in cands if rx.fullmatch(t)] == full


@pytest.mark.parametrize("pattern", ["?o?", "??x", "b*n", "*o?",
                                     "?ui*"])
def test_wildcard_shape_prune_equals_full_scan(smoke_index, pattern):
    import re

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    rx = re.compile("".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in pattern))
    vocab = r.vocabulary()
    full = [t for t in vocab if rx.fullmatch(t)]
    cands = r._shape_candidates(IndexReader._wildcard_shape(pattern))
    assert [t for t in cands if rx.fullmatch(t)] == full


def test_literal_free_patterns_touch_sublinear_dictionary(
        smoke_index):
    """The round-3 residual boundary (SCALE.md §2) is closed: a
    fixed-length literal-free regex and a ?-only wildcard both check
    far fewer terms than the vocabulary."""
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    nv = len(r.vocabulary())
    probe = max(r.vocabulary(), key=len)
    pat = probe[0] + "." * (len(probe) - 2) + probe[-1]
    r.dict_terms_checked = 0
    top = r.regexp_topk(pat, 10)
    assert top.num_rows > 0
    assert 0 < r.dict_terms_checked < nv
    wpat = "?" + probe[1:-1] + "?"
    r.dict_terms_checked = 0
    wtop = r.wildcard_topk(wpat, 10)
    assert wtop.num_rows > 0
    assert 0 < r.dict_terms_checked < nv


def test_nrt_ram_terms_visible_to_fuzzy(ray_session, tmp_path):
    from engine.build import IndexConfig, build_index
    from engine.nrt import NrtWriter

    d = str(tmp_path / "in")
    os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": [0, 1], "text": ["alpha bravo", "charlie delta"]}),
        os.path.join(d, "docs.parquet"))
    idx = str(tmp_path / "idx")
    build_index(d, idx, IndexConfig(
        text_col="text", conv_cols=None, doc_id_col="doc_id",
        n_buckets=2, stop_words=None, stemming=False))
    w = NrtWriter(idx)
    w.add_documents(pa.table({"doc_id": [2],
                              "text": ["bravado zulu"]}))
    r = w.reader()
    # "bravado" exists only in the RAM segment; fuzzy expansion over
    # the trigram sources must still surface it
    cands = r._dict_candidates(required=["rava"])
    assert "bravado" in cands
    assert "bravo" not in cands


def test_inline_ignorecase_flag_case_folds_pruning(smoke_index):
    """(?i) is invisible in the sre parse tree — literal pruning must
    still bail (trigram postings are case-sensitive), but r5's shape
    pruner now case-FOLDS its anchored classes instead of scanning,
    and must keep every match."""
    import re

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    probe = max(r.vocabulary(), key=len)
    pat = "(?i)" + probe.upper()
    assert IndexReader._required_literals(pat) == []
    shape = IndexReader._regex_shape(pat)
    assert shape is not None
    assert shape["pre"] and probe[0] in shape["pre"][0] \
        and probe[0].upper() in shape["pre"][0]
    rx = re.compile(pat)
    full = [t for t in r.vocabulary() if rx.fullmatch(t)]
    assert probe in full
    assert set(r.regexp_candidates(pat)) >= set(full)
    top = r.regexp_topk(pat, 10)
    assert top.num_rows > 0


def test_shape_prune_superset_property(smoke_index):
    """Property: for randomly composed simple regexes, the shape
    filter never loses a true match (pruned full-match == full-scan
    full-match)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    vocab = r.vocabulary()

    atom = st.one_of(
        st.sampled_from(list("abcdefgilmnopqrstu")),
        st.just("."),
        st.sampled_from(["[ab]", "[a-f]", "[^x]", "\\w"]))
    rep = st.sampled_from(["", "?", "*", "+", "{2}", "{1,3}"])
    piece = st.tuples(atom, rep).map(lambda t: t[0] + t[1])
    pattern_s = st.lists(piece, min_size=1, max_size=6).map("".join)

    @settings(max_examples=120, deadline=None)
    @given(pattern_s)
    def check(pattern):
        try:
            rx = re.compile(pattern)
        except re.error:
            return
        full = [t for t in vocab if rx.fullmatch(t)]
        cands = r._shape_candidates(IndexReader._regex_shape(pattern))
        assert [t for t in cands if rx.fullmatch(t)] == full, pattern

    check()


def test_scoped_ignorecase_group_keeps_matches(smoke_index):
    """(?i:...) groups set NO compiled flag, so literal extraction
    must bail on the scoped flag itself (r5 fix — previously the
    case-sensitive trigram probe dropped case-variant matches)."""
    import re

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    assert IndexReader._required_literals("(?i:spark)le") == []
    probe = max(r.vocabulary(), key=len)
    pat = f"(?i:{probe.upper()[:3]}){re.escape(probe[3:])}"
    rx = re.compile(pat)
    full = {t for t in r.vocabulary() if rx.fullmatch(t)}
    assert probe in full
    assert {t for t in r.regexp_candidates(pat)
            if rx.fullmatch(t)} == full


def test_regexp_candidates_routing_superset_property(smoke_index):
    """Property over the FULL r5 router (required-literal trigram →
    case-folded shape → NFA walk): for random patterns, optionally
    (?i)-prefixed and optionally repeat-headed/.*-tailed (forcing the
    vacuous-shape branch), the routed candidates never lose a true
    match, and vacuous patterns take the automaton path."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engine.query import IndexReader

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    vocab = r.vocabulary()

    atom = st.one_of(
        st.sampled_from(list("abcdefgilmnopqrstu")),
        st.just("."),
        st.sampled_from(["[ab]", "[a-f]", "[^x]", "\\w"]))
    rep = st.sampled_from(["", "?", "*", "+", "{2}", "{1,3}"])
    piece = st.tuples(atom, rep).map(lambda t: t[0] + t[1])
    body = st.lists(piece, min_size=1, max_size=5).map("".join)
    pattern_s = st.tuples(
        st.sampled_from(["", "(?i)"]),
        st.sampled_from(["", "(s|p|c)+", "(a|b)*"]),
        body,
        st.sampled_from(["", ".*"])).map(lambda t: "".join(t))

    @settings(max_examples=150, deadline=None)
    @given(pattern_s)
    def check(pattern):
        try:
            rx = re.compile(pattern)
        except re.error:
            return
        full = {t for t in vocab if rx.fullmatch(t)}
        cands = r.regexp_candidates(pattern)
        assert {t for t in cands if rx.fullmatch(t)} == full, pattern

    check()


def test_fuzzy_short_term_walk_matches_full_scan(smoke_index):
    """The Levenshtein-walk branch (vacuous q-gram bound) must return
    every in-distance term the full scan finds, for both metrics."""
    from engine.query import IndexReader, _levenshtein, _osa_distance

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    vocab = r.vocabulary()
    for term in ["pa", "ss", "aa", "scan"[:3]]:
        for k in (1, 2):
            walks0 = r.automaton_walks
            cands = set(r._fuzzy_candidates(term, k))
            assert r.automaton_walks == walks0 + 1
            for t in vocab:
                if _levenshtein(term, t, k) <= k or \
                        _osa_distance(term, t, k) <= k:
                    assert t in cands, (term, k, t)


def test_write_sidecar_in_memory_matches_readback(tmp_path):
    """The term_col fast path (merge passes its in-memory table) must
    produce a byte-identical sidecar to the read-back variant."""
    terms = pa.array(["alpha", "beta", "alphabet", "gamma"])
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (d1, d2):
        os.makedirs(d)
        pq.write_table(pa.table({"term": terms}),
                       os.path.join(d, "merged-0.parquet"))
    n1 = write_sidecar(d1)                    # read-back
    n2 = write_sidecar(d2, terms)             # in-memory
    assert n1 == n2 > 0
    t1 = pq.read_table(os.path.join(d1, SIDECAR_NAME))
    t2 = pq.read_table(os.path.join(d2, SIDECAR_NAME))
    assert t1.equals(t2)
    # an empty rewrite removes the stale sidecar
    assert write_sidecar(d2, pa.array([], type=pa.string())) == 0
    assert not os.path.exists(os.path.join(d2, SIDECAR_NAME))
