"""Bounded automaton ∩ sorted-dictionary intersection.

The stand-in for upstream's compiled-automaton term intersection
(``lucene/core/.../util/automaton/CompiledAutomaton.java`` [U],
``IntersectTermsEnum`` [U]): a regex is compiled (via the stdlib
``re._parser`` tree) into a Thompson NFA over codepoint ranges, then
walked against a SORTED term dictionary with binary-search seeks — at
each non-viable prefix the walk computes the smallest lexicographic
successor string that any match could still start with and jumps the
dictionary there, so whole subtrees of the vocabulary are skipped
without being touched.  This closes the last full-dictionary-scan
class (SCALE.md residual #1): patterns whose shape is vacuous —
unbounded length AND no anchored character class, e.g.
``(ab|cd)+x.*`` — which neither the trigram intersection
(no >=3-char required literal) nor the Arrow shape filter
(``IndexReader._regex_shape``) can prune.

Conservative-superset semantics: every construct the NFA cannot model
exactly (``\\d``-style categories, lookarounds, mid-pattern anchors,
case-folded ranges) widens to "any character" / epsilon, so the walk
never skips a true match; callers always run the exact
``re.fullmatch`` predicate on the returned candidates.  Constructs
that cannot be widened safely (backreferences, huge counted repeats)
make :func:`build_nfa` return ``None`` and the caller falls back to
the shape filter / full scan.
"""
from __future__ import annotations

import re
import re._parser as sp

import numpy as np

_MAXCP = 0x10FFFF
_REP_CAP = 64          # counted-repeat expansion cap (then: bail)
_ANY = ((0, _MAXCP),)

_ASCII_UP = (ord("A"), ord("Z"))
_ASCII_LO = (ord("a"), ord("z"))


class _Unsupported(Exception):
    pass


def _norm(ranges):
    """Sort + merge inclusive (lo, hi) codepoint ranges."""
    rs = sorted((lo, hi) for lo, hi in ranges if lo <= hi)
    out = []
    for lo, hi in rs:
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


def _complement(ranges):
    out, cur = [], 0
    for lo, hi in ranges:
        if lo > cur:
            out.append((cur, lo - 1))
        cur = max(cur, hi + 1)
    if cur <= _MAXCP:
        out.append((cur, _MAXCP))
    return tuple(out)


# exact (?i) match sets for ASCII letters beyond {lower, upper},
# under sre's Unicode SIMPLE fold — verified complete by enumerating
# re.fullmatch('(?i)c', x) over every codepoint: only i/k/s pick up
# non-ASCII variants (İ ı / KELVIN SIGN K / LONG S ſ)
_ASCII_FOLD_EXTRA = {"i": "İı", "k": "K", "s": "ſ"}


def _fold_char(cp: int) -> tuple:
    """Codepoint ranges a ``(?i)`` literal ``cp`` can match. Exact
    for ASCII (enumerated extras above); non-ASCII widens to ANY —
    over-inclusion is superset-safe (callers re-check with
    ``re.fullmatch``), under-inclusion would skip true matches."""
    if cp > 127:
        return _ANY
    ch = chr(cp)
    cps = {ord(ch.lower()), ord(ch.upper())}
    cps.update(ord(x) for x in _ASCII_FOLD_EXTRA.get(ch.lower(), ""))
    return _norm((c, c) for c in cps)


def _in_ranges(items, fold: bool):
    """Ranges for an IN class; widens to _ANY on anything uncertain
    (CATEGORY members, non-ASCII case folding) — superset-safe."""
    negate = bool(items) and str(items[0][0]) == "NEGATE"
    if negate:
        items = items[1:]
        # complement of the RAW (unfolded) set ⊇ the exact (?i)
        # negation (folding would SHRINK the complement and could
        # skip true matches like 'ı' vs (?i)[^i])
        fold = False
    rs = []
    for iop, iav in items:
        m = str(iop)
        if m == "LITERAL":
            rs.extend(_fold_char(iav) if fold else [(iav, iav)])
        elif m == "RANGE":
            a, b = iav
            rs.append((a, b))
            if fold:
                if b > 127:
                    return _ANY
                # coarse ASCII fold: widen with both letter bands
                # plus the i/k/s simple-fold extras they imply
                if not (b < _ASCII_UP[0] or a > _ASCII_LO[1]):
                    rs.extend((_ASCII_UP, _ASCII_LO))
                    for ch in "iks":
                        rs.extend(_fold_char(ord(ch)))
        else:                      # CATEGORY etc.
            if negate:
                return None        # can't complement an unknown set
            return _ANY
    return _complement(_norm(rs)) if negate else _norm(rs)


class NFA:
    """Thompson NFA with memoized subset transitions and an ordered
    "smallest next char" query used by the dictionary seek."""

    def __init__(self, nodes, start, accept):
        self.nodes = nodes          # node -> (eps list, [(ranges, to)])
        self._eps_memo: dict = {}
        self._step_memo: dict = {}
        self.start = self._closure(frozenset((start,)))
        acc = set()
        for s in range(len(nodes)):
            if accept in self._closure(frozenset((s,))):
                acc.add(s)
        self.accepts = frozenset(acc)

    def _closure(self, states: frozenset) -> frozenset:
        got = self._eps_memo.get(states)
        if got is not None:
            return got
        seen = set(states)
        stack = list(states)
        while stack:
            for t in self.nodes[stack.pop()][0]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        out = frozenset(seen)
        self._eps_memo[states] = out
        return out

    def step(self, states: frozenset, ch: str) -> frozenset:
        key = (states, ch)
        got = self._step_memo.get(key)
        if got is not None:
            return got
        cp = ord(ch)
        nxt = set()
        for s in states:
            for ranges, to in self.nodes[s][1]:
                for lo, hi in ranges:
                    if lo <= cp <= hi:
                        nxt.add(to)
                        break
        out = self._closure(frozenset(nxt)) if nxt else frozenset()
        self._step_memo[key] = out
        return out

    def min_char_gt(self, states: frozenset, ch: str) -> str | None:
        """Smallest codepoint strictly greater than ``ch`` with a
        non-empty transition out of ``states`` (the seek pivot)."""
        cp = ord(ch)
        best = None
        for s in states:
            for ranges, _to in self.nodes[s][1]:
                for lo, hi in ranges:
                    if hi <= cp:
                        continue
                    cand = max(lo, cp + 1)
                    if best is None or cand < best:
                        best = cand
                    break              # ranges sorted: first is min
        return chr(best) if best is not None else None


def build_nfa(pattern: str) -> NFA | None:
    """Compile ``pattern`` to a conservative-superset NFA, or None
    when it contains a construct that cannot be widened safely."""
    try:
        rx = re.compile(pattern)
        tree = sp.parse(pattern)
    except Exception:              # noqa: BLE001 — unparseable
        return None
    fold_all = bool(rx.flags & re.IGNORECASE)
    nodes: list = []

    def new() -> int:
        nodes.append(([], []))
        return len(nodes) - 1

    def arc(frm: int, ranges, to: int) -> None:
        if ranges is None or not ranges:
            raise _Unsupported
        nodes[frm][1].append((ranges, to))

    def eps(frm: int, to: int) -> None:
        nodes[frm][0].append(to)

    def seq_into(seq, entry: int, fold: bool) -> int:
        cur = entry
        for op, av in seq:
            cur = frag(op, av, cur, fold)
        return cur

    def frag(op, av, entry: int, fold: bool) -> int:
        n = str(op)
        if n == "LITERAL":
            e = new()
            arc(entry, _fold_char(av) if fold else ((av, av),), e)
            return e
        if n == "NOT_LITERAL":
            # complement of the unfolded char ⊇ the exact (?i) set
            e = new()
            arc(entry, _complement(((av, av),)), e)
            return e
        if n in ("ANY", "CATEGORY"):
            e = new()
            arc(entry, _ANY, e)
            return e
        if n == "IN":
            e = new()
            arc(entry, _in_ranges(av, fold), e)
            return e
        if n == "SUBPATTERN":
            _g, addf, _delf, p = av
            return seq_into(p, entry,
                            fold or bool(addf & re.IGNORECASE))
        if n == "BRANCH":
            e = new()
            for alt in av[1]:
                s = new()
                eps(entry, s)
                eps(seq_into(alt, s, fold), e)
            return e
        if n in ("MAX_REPEAT", "MIN_REPEAT"):
            mn, mx, p = av
            if mn > _REP_CAP or (mx != sp.MAXREPEAT and mx > _REP_CAP):
                raise _Unsupported
            cur = entry
            for _ in range(mn):
                cur = seq_into(p, cur, fold)
            if mx == sp.MAXREPEAT:
                x = new()
                eps(cur, x)                       # zero more copies
                body_end = seq_into(p, cur, fold)
                eps(body_end, cur)                # loop
                return x
            for _ in range(mx - mn):
                x = new()
                eps(cur, x)                       # skip this copy
                eps(seq_into(p, cur, fold), x)
                cur = x
            return cur
        if n == "AT":
            return entry   # anchors: epsilon under fullmatch — superset
        if n in ("ASSERT", "ASSERT_NOT"):
            return entry   # lookarounds widen to epsilon — superset
        raise _Unsupported   # GROUPREF, ATOMIC_GROUP, ...

    start = new()
    try:
        accept = seq_into(tree, start, fold_all)
    except (_Unsupported, RecursionError):
        return None
    return NFA(nodes, start, accept)


def build_lev_nfa(term: str, max_edits: int) -> NFA:
    """Levenshtein NFA for ``term`` within ``max_edits`` — the
    upstream ``LevenshteinAutomata`` ∩ FST intersection analog
    (``L/util/automaton/LevenshteinAutomata.java`` [U]), for the
    dictionary walk when the q-gram count bound is vacuous (short
    terms). States are (position, edits); arcs: match, substitution
    (any), insertion (any); deletion is an epsilon; adjacent
    TRANSPOSITION arcs are always included, which makes the automaton
    a superset for BOTH metrics the engine verifies with — exact for
    OSA (``transpositions=true``, the Lucene default) and an
    over-accepting superset for plain Levenshtein (a swap the NFA
    takes as 1 edit costs 2 there) — callers re-check with the exact
    distance, so over-acceptance is safe and under-acceptance is
    impossible."""
    L, k = len(term), int(max_edits)
    nodes: list = []

    def new() -> int:
        nodes.append(([], []))
        return len(nodes) - 1

    grid = [[new() for _ in range(k + 1)] for _ in range(L + 1)]
    accept = new()
    cp = [ord(c) for c in term]
    for i in range(L + 1):
        for e in range(k + 1):
            n = grid[i][e]
            if i < L:
                nodes[n][1].append(
                    (((cp[i], cp[i]),), grid[i + 1][e]))   # match
            if e < k:
                if i < L:
                    nodes[n][1].append(
                        (_ANY, grid[i + 1][e + 1]))        # substitute
                    nodes[n][0].append(grid[i + 1][e + 1])  # delete
                nodes[n][1].append((_ANY, grid[i][e + 1]))  # insert
                if i + 1 < L and cp[i] != cp[i + 1]:
                    t = new()                               # transpose
                    nodes[n][1].append((((cp[i + 1], cp[i + 1]),), t))
                    nodes[t][1].append(
                        (((cp[i], cp[i]),), grid[i + 2][e + 1]))
            if i == L:
                nodes[n][0].append(accept)
    return NFA(nodes, grid[0][0], accept)


def intersect_sorted(nfa: NFA, terms_np: np.ndarray
                     ) -> tuple[list, int]:
    """Walk the NFA against a SORTED array of unique terms.

    Returns ``(candidates, touched)`` — ``candidates`` is a superset
    of the terms the exact regex fully matches; ``touched`` counts
    dictionary terms actually examined (the sublinearity metric
    mirrored by ``IndexReader.dict_terms_checked``).  Non-viable
    prefixes trigger a binary-search seek to the smallest possible
    successor, skipping the intervening dictionary range entirely.
    """
    out: list = []
    touched = 0
    n = len(terms_np)
    i = 0
    while i < n:
        t = terms_np[i]
        touched += 1
        stack = [nfa.start]
        died = -1
        for d, ch in enumerate(t):
            nxt = nfa.step(stack[-1], ch)
            if not nxt:
                died = d
                break
            stack.append(nxt)
        if died < 0:
            if stack[-1] & nfa.accepts:
                out.append(t)
            i += 1
            continue
        seek = None
        for d in range(died, -1, -1):
            c2 = nfa.min_char_gt(stack[d], t[d])
            if c2 is not None:
                seek = t[:d] + c2
                break
        if seek is None:
            break                      # nothing lexically later matches
        i = max(int(np.searchsorted(terms_np, seek)), i + 1)
    return out, touched
