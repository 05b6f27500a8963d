"""NFA ∩ sorted-dictionary intersection (engine/automaton.py) — the
CompiledAutomaton-intersection analog: superset guarantee (the walk
never skips a true match), sublinear dictionary touch via seeks,
conservative widening/bail on unsupported constructs, and the r5
case-folded shape pruning in IndexReader (_fold_class exactness vs
re.IGNORECASE, (?i) patterns pruning instead of full-scanning)."""

from __future__ import annotations

import random
import re
import string

import numpy as np
import pytest

from engine.automaton import build_nfa, intersect_sorted
from engine.query import IndexReader


VOCAB = sorted(set(
    """spark scan spare square score stream system shape apple abxq
    abab ababxy cdxz cdabx zebra zzz merge window filter part query
    quey SPARK Spark sPare park İstanbul ſearch""".split()))
TERMS = np.asarray(VOCAB, dtype=object)


def _exact(pattern: str) -> set[str]:
    rx = re.compile(pattern)
    return {t for t in VOCAB if rx.fullmatch(t)}


@pytest.mark.parametrize("pattern", [
    "(ab|cd)+x.*", "(s|p|c)+a.*", "s..r.", "(?i)s..r.", "z+",
    "(?i)SPARK", "s(q|t)[a-z]*e", "a{2,4}b?x.*", ".*", "[^a-y]+",
    "(?i)ſEARCH", "(?i)(i|ı).*",
])
def test_superset_and_progress(pattern):
    nfa = build_nfa(pattern)
    assert nfa is not None
    cands, touched = intersect_sorted(nfa, TERMS)
    assert _exact(pattern) <= set(cands)
    assert touched <= len(TERMS)
    # candidates come out in dictionary order, no dupes
    assert cands == sorted(set(cands))


def test_seek_skips_dictionary():
    """A vacuous-shape pattern must touch a strict subset — the walk's
    whole point (VERDICT r4 item 1b)."""
    nfa = build_nfa("(ab|cd)+x.*")
    cands, touched = intersect_sorted(nfa, TERMS)
    assert set(cands) >= {"ababxy", "abxq", "cdabx", "cdxz"}
    assert touched < len(TERMS)


def test_unsupported_constructs_bail():
    assert build_nfa(r"(a)\1") is None          # backreference
    assert build_nfa("a{999}b") is None          # repeat beyond cap
    assert build_nfa("a[") is None               # unparseable


def test_lookaround_and_anchor_widen_to_superset():
    for pat in ["(?=s).*k", r"\bspark\b", "^spark$"]:
        nfa = build_nfa(pat)
        assert nfa is not None
        cands, _ = intersect_sorted(nfa, TERMS)
        assert _exact(pat) <= set(cands)


def test_superset_fuzz():
    rng = random.Random(42)
    alpha = "abcs"

    def rnd(depth=0):
        kind = rng.choice(
            ["lit", "lit", "any", "set", "star", "plus", "alt", "seq"]
            if depth < 3 else ["lit", "any", "set"])
        if kind == "lit":
            return rng.choice(alpha)
        if kind == "any":
            return "."
        if kind == "set":
            return "[" + "".join(sorted(set(rng.choices(alpha, k=2)))) + "]"
        if kind == "star":
            return "(" + rnd(depth + 1) + ")*"
        if kind == "plus":
            return "(" + rnd(depth + 1) + ")+"
        if kind == "alt":
            return "(" + rnd(depth + 1) + "|" + rnd(depth + 1) + ")"
        return rnd(depth + 1) + rnd(depth + 1)

    words = sorted(set("".join(rng.choices(alpha, k=rng.randint(1, 6)))
                       for _ in range(1500)))
    tnp = np.asarray(words, dtype=object)
    ran = 0
    for _ in range(120):
        pat = rnd()
        nfa = build_nfa(pat)
        if nfa is None:
            continue
        ran += 1
        cands, touched = intersect_sorted(nfa, tnp)
        rx = re.compile(pat)
        assert {t for t in words if rx.fullmatch(t)} <= set(cands), pat
        assert touched <= len(words)
    assert ran > 80


def test_superset_fuzz_ignorecase_unicode():
    """(?i) patterns against a vocabulary salted with the simple-fold
    specials (İ ı K ſ) — the class that forced r4 to full-scan."""
    rng = random.Random(99)
    alpha = "isk"
    words = sorted(set(
        ["İs", "ıs", "Kik", "ſik", "İ", "ı", "K", "ſ", "SIK", "sik"]
        + ["".join(rng.choices(alpha + "ISK", k=rng.randint(1, 4)))
           for _ in range(400)]))
    tnp = np.asarray(words, dtype=object)
    pats = ["(?i)i.*", "(?i)[^i]+", "(?i)[a-z]+", "(?i)(s|k)+",
            "(?i)ſ.*", "(?i)K", "(?i)s?i?k?", "(?i)[ik]s"]
    for pat in pats:
        nfa = build_nfa(pat)
        assert nfa is not None, pat
        cands, _ = intersect_sorted(nfa, tnp)
        rx = re.compile(pat)
        assert {t for t in words if rx.fullmatch(t)} <= set(cands), pat


# ----------------------------- Levenshtein NFA (short-fuzzy walk)

def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def _osa(a, b):
    m, n = len(a), len(b)
    D = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        D[i][0] = i
    for j in range(n + 1):
        D[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i][j] = min(D[i - 1][j] + 1, D[i][j - 1] + 1,
                          D[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] \
                    and a[i - 2] == b[j - 1]:
                D[i][j] = min(D[i][j], D[i - 2][j - 2] + 1)
    return D[m][n]


def test_lev_nfa_superset_both_metrics():
    """build_lev_nfa candidates must cover every term within
    max_edits under BOTH plain Levenshtein and OSA (the two metrics
    the engine verifies with) — fuzzed over random short terms."""
    from engine.automaton import build_lev_nfa

    rng = random.Random(3)
    alpha = "abc"
    words = sorted({"".join(rng.choices(alpha, k=rng.randint(1, 5)))
                    for _ in range(400)})
    tnp = np.asarray(words, dtype=object)
    for _ in range(80):
        term = "".join(rng.choices(alpha, k=rng.randint(1, 5)))
        k = rng.randint(1, 2)
        cands, touched = intersect_sorted(build_lev_nfa(term, k), tnp)
        cs = set(cands)
        for w in words:
            if _lev(term, w) <= k or _osa(term, w) <= k:
                assert w in cs, (term, k, w)
        assert touched <= len(words)


def test_lev_nfa_seeks_shared_prefix_dictionary():
    """On a dictionary with long shared prefixes the walk must skip
    nearly everything — the point of the seek (upstream
    LevenshteinAutomata ∩ FST)."""
    from engine.automaton import build_lev_nfa

    tail = sorted(f"{i:05x}tail" for i in range(3000))
    tnp = np.asarray(sorted(tail + ["ray", "run", "rag"]),
                     dtype=object)
    cands, touched = intersect_sorted(build_lev_nfa("ray", 2), tnp)
    assert {"ray", "rag"} <= set(cands)
    assert touched < 30, touched


# ------------------------- r5 case-folded shape pruning (IndexReader)

def test_fold_class_matches_re_ignorecase_exactly():
    """_fold_class must reproduce sre's simple fold for every ASCII
    char: the fold set of c == every codepoint matching (?i)c."""
    all_cp = "".join(chr(c) for c in range(0x3000))   # BMP head covers
    extra = "İıKſKſ"                        # the known extras
    probe = all_cp + extra
    for c in string.ascii_letters + string.digits + "_-":
        got = IndexReader._fold_class(frozenset((c,)))
        rx = re.compile("(?i)" + re.escape(c))
        exact = {x for x in set(probe) if rx.fullmatch(x)}
        assert got == exact, (c, got, exact)


def test_fold_class_nonascii_drops_constraint():
    assert IndexReader._fold_class(frozenset(("é",))) is None


def test_ci_shape_prunes_not_scans():
    """(?i) literal-free patterns now produce a usable shape (r4
    returned None → full scan)."""
    shape = IndexReader._regex_shape("(?i)S..R.")
    assert shape is not None
    assert shape["min_len"] == 5 and shape["max_len"] == 5
    assert shape["pre"][0] == frozenset("sSſ")
    assert shape["pre"][3] == frozenset("rR")


def test_vacuous_shape_detected_for_repeat_head():
    shape = IndexReader._regex_shape("(s|p|c)+a.*")
    assert shape["max_len"] is None
    assert not any(shape["pre"]) and not any(shape["suf"])
