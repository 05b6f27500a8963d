"""Classic Lucene query-string parser + compositional scorer.

Re-expresses the reference's string query surface (upstream
``L/queryparser/classic/QueryParser.jj`` / ``QueryParserBase.java``
[U]) over this engine's primitives: a hand-rolled tokenizer and
recursive-descent parser produce a small Query AST, and a vectorized
evaluator composes sparse ``(doc_ids, float32 scores)`` arrays through
nested BooleanQuery semantics — no per-row Python in the scoring path;
every leaf decodes postings once and every boolean node combines
children with ``np.searchsorted`` / fancy indexing.

Supported syntax (the classic parser's working set):

- bare terms (default-OR), ``+term`` (MUST), ``-term`` / ``NOT term``
  (MUST_NOT), ``a AND b`` / ``&&`` (promotes both sides to MUST),
  ``a OR b`` / ``||``
- grouping ``(...)`` incl. ``field:(...)``
- ``"exact phrase"`` and ``"sloppy phrase"~2``
- ``term^2.5`` boosts (terms, phrases, groups, expansions)
- ``fuzzy~`` / ``fuzzy~2`` (Levenshtein expansion)
- ``wild*card`` / ``wi?d`` wildcards, ``/regexp/``
- term ranges ``[alpha TO beta]`` (inclusive) / ``{alpha TO beta}``
  (exclusive), mixed brackets allowed
- ``field:term`` — resolved against a ``{field: IndexReader}`` map
  (multi-field indexes); a bare default field otherwise

Operator semantics follow ``QueryParserBase#addClause`` [U]: an
explicit ``+``/``-``/``NOT`` modifier wins; otherwise ``AND`` makes
the current clause MUST and retroactively promotes the preceding
SHOULD clause to MUST. ``parse(..., default_op="AND")`` is upstream
``setDefaultOperator(AND_OPERATOR)`` (Solr ``q.op=AND``): unmarked
clauses become MUST, and an explicit ``OR`` both leaves its clause
SHOULD and retroactively demotes the preceding non-prohibited MUST
clause to SHOULD — the exact upstream addClause quirk.

Scoring composition mirrors the engine's existing boolean path
(``IndexReader.boolean_topk``): per-term clause scores are exact
float32 (weight = f32(boost) × f32(idf), × the f32 tf ratio), boolean
nodes sum matching children in float64 and cast the node result to
float32 at the node boundary. Multi-term expansions (fuzzy / wildcard
/ regexp / range) are scoring rewrites — each dictionary match is one
SHOULD clause, exactly like ``wildcard_topk``. Phrase leaves reuse the
positional machinery of ``phrase_topk`` / ``sloppy_phrase_topk`` /
``span_near_topk``. A node-level boost multiplies the node's f32
scores by f32(boost) (one extra rounding vs Lucene's weight-fold,
documented here because SQL oracles mirror it exactly).

MUST_NOT-only queries match nothing (Lucene's pure-negation rule).
Deleted docs are masked once at the top (per-doc scores are
independent, so end-masking ≡ per-leaf masking).
"""

from __future__ import annotations

import math


def calculate_min_should_match(spec: str, n_clauses: int) -> int:
    """Solr's minimum-should-match spec grammar (upstream
    ``SolrPluginUtils.calculateMinShouldMatch`` / the dismax ``mm``
    param [U]; public documented grammar):

    - ``"3"`` — absolute count; ``"-2"`` — all but 2.
    - ``"75%"`` — floor of 75% of the clauses; ``"-25%"`` — all but
      floor(25%).
    - conditional list ``"2<-25% 9<3"`` — each ``N<spec`` applies when
      n_clauses > N; the HIGHEST matching N wins; n_clauses <= the
      smallest N means all clauses required.

    Result is clamped to [0, n_clauses] like upstream."""
    spec = spec.strip()
    if "<" in spec:
        result = n_clauses          # below every threshold: require all
        best_n = -1
        for part in spec.split():
            cond, _, sub = part.partition("<")
            n = int(cond)
            if n_clauses > n and n > best_n:
                best_n = n
                result = calculate_min_should_match(sub, n_clauses)
        return result
    if spec.endswith("%"):
        pct = int(spec[:-1])
        if pct < 0:
            return max(0, n_clauses - int(
                math.floor(-pct * n_clauses / 100.0)))
        return min(n_clauses, int(math.floor(pct * n_clauses / 100.0)))
    val = int(spec)
    if val < 0:
        return max(0, n_clauses + val)
    return min(n_clauses, val)

import re
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"
FILTER = "FILTER"   # Occur.FILTER: constrains like MUST, scores 0


# ----------------------------------------------------------------- AST

@dataclass
class TermQ:
    text: str
    field: str | None = None
    boost: float = 1.0


@dataclass
class PhraseQ:
    text: str
    slop: int = 0
    field: str | None = None
    boost: float = 1.0


@dataclass
class FuzzyQ:
    text: str
    max_edits: int = 2
    field: str | None = None
    boost: float = 1.0


@dataclass
class WildQ:
    pattern: str
    field: str | None = None
    boost: float = 1.0


@dataclass
class RegexpQ:
    pattern: str
    field: str | None = None
    boost: float = 1.0


@dataclass
class RangeQ:
    lo: str
    hi: str
    incl_lo: bool = True
    incl_hi: bool = True
    field: str | None = None
    boost: float = 1.0


@dataclass
class MatchAllQ:
    """``*:*`` — MatchAllDocsQuery (upstream
    ``L/search/MatchAllDocsQuery.java`` [U]; ``QueryParserBase`` maps
    the ``*:*`` syntax to it): every live doc at constant score =
    boost, no postings consulted."""
    boost: float = 1.0


@dataclass
class BoolQ:
    clauses: list[tuple[str, object]] = dc_field(default_factory=list)
    boost: float = 1.0
    min_should_match: int = 0


# --------------------------------------------------------------- lexer

_WORD_END = set(' \t\n()"')


class QueryParseError(ValueError):
    pass


def _tokenize(q: str) -> list[tuple[str, object]]:
    """Token stream: (kind, payload). Kinds: LP RP AND OR NOT PLUS
    MINUS WORD PHRASE REGEXP RANGE FIELD."""
    toks: list[tuple[str, object]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c in " \t\n":
            i += 1
            continue
        if c == "(":
            toks.append(("LP", None)); i += 1; continue
        if c == ")":
            # trailing boost on a group: )^2
            i += 1
            boost, i = _suffix_boost(q, i)
            toks.append(("RP", boost)); continue
        if q.startswith("&&", i):
            toks.append(("AND", None)); i += 2; continue
        if q.startswith("||", i):
            toks.append(("OR", None)); i += 2; continue
        if c == "!":
            toks.append(("NOT", None)); i += 1; continue
        if c == "+":
            toks.append(("PLUS", None)); i += 1; continue
        if c == "-":
            toks.append(("MINUS", None)); i += 1; continue
        if c == '"':
            j = i + 1
            while j < n and q[j] != '"':
                j += 1
            if j >= n:
                raise QueryParseError(f"unterminated phrase in {q!r}")
            body = q[i + 1:j]
            i = j + 1
            slop = 0
            if i < n and q[i] == "~":
                m = re.match(r"~(\d+)", q[i:])
                if m:
                    slop = int(m.group(1)); i += m.end()
            boost, i = _suffix_boost(q, i)
            toks.append(("PHRASE", (body, slop, boost))); continue
        if c == "/":
            j = i + 1
            while j < n and q[j] != "/":
                j += 1
            if j >= n:
                raise QueryParseError(f"unterminated regexp in {q!r}")
            body = q[i + 1:j]
            i = j + 1
            boost, i = _suffix_boost(q, i)
            toks.append(("REGEXP", (body, boost))); continue
        if c in "[{":
            m = re.match(r"[\[{]\s*(\S+)\s+TO\s+(\S+)\s*[\]}]",
                         q[i:], re.IGNORECASE)
            if not m:
                raise QueryParseError(f"bad range at {q[i:]!r}")
            incl_lo, incl_hi = c == "[", q[i + m.end() - 1] == "]"
            lo, hi = m.group(1), m.group(2)
            i += m.end()
            boost, i = _suffix_boost(q, i)
            toks.append(("RANGE", (lo, hi, incl_lo, incl_hi, boost)))
            continue
        # bare word (may carry field:, trailing ~ and ^)
        j = i
        while j < n and q[j] not in _WORD_END:
            j += 1
        word = q[i:j]
        i = j
        if word in ("AND", "OR", "NOT"):
            toks.append((word, None)); continue
        fld = None
        if ":" in word:
            fld, word = word.split(":", 1)
            if word and word[0] in "[{/":
                # field:[a TO b] / field:/re/ — re-lex past the colon
                i -= len(word)
                word = ""
            if not word:       # field:(...) / field:"..." / field:[..]
                toks.append(("FIELD", fld)); continue
        m = re.search(r"\^(\d+(?:\.\d+)?)$", word)
        boost = 1.0
        if m:
            boost = float(m.group(1)); word = word[:m.start()]
        edits = None
        m = re.search(r"~(\d?)$", word)
        if m:
            edits = int(m.group(1)) if m.group(1) else 2
            word = word[:m.start()]
        if not word:
            raise QueryParseError(f"empty term in {q!r}")
        toks.append(("WORD", (word, fld, boost, edits)))
    return toks


def _suffix_boost(q: str, i: int) -> tuple[float, int]:
    m = re.match(r"\^(\d+(?:\.\d+)?)", q[i:])
    return (float(m.group(1)), i + m.end()) if m else (1.0, i)


# -------------------------------------------------------------- parser

def parse(q: str, default_field: str | None = None,
          default_op: str = "OR"):
    """Parse a classic-syntax query string into a Query AST.
    ``default_op`` ∈ {"OR", "AND"} is upstream
    ``QueryParserBase#setDefaultOperator`` (Solr ``q.op``)."""
    toks = _tokenize(q)
    node, pos = _parse_bool(toks, 0, default_field, top=True,
                            default_op=default_op)
    if pos != len(toks):
        raise QueryParseError(f"unbalanced ')' in {q!r}")
    return node


def _parse_bool(toks, pos: int, fld: str | None, top: bool = False,
                default_op: str = "OR"):
    clauses: list[tuple[str, object]] = []
    conj = mod = None
    group_boost = 1.0
    closed = top
    while pos < len(toks):
        kind, payload = toks[pos]
        if kind == "RP":
            if top:
                raise QueryParseError("unbalanced ')'")
            group_boost = payload
            pos += 1
            closed = True
            break
        if kind in ("AND", "OR"):
            conj = kind; pos += 1; continue
        if kind in ("PLUS", "MINUS", "NOT"):
            mod = kind; pos += 1; continue
        node, pos = _parse_clause(toks, pos, fld, default_op)
        if mod == "PLUS":
            occur = MUST
        elif mod in ("MINUS", "NOT"):
            occur = MUST_NOT
        elif conj == "AND":
            occur = MUST
        elif conj == "OR":
            occur = SHOULD
        else:
            occur = MUST if default_op == "AND" else SHOULD
        if conj == "AND" and clauses and clauses[-1][0] == SHOULD:
            clauses[-1] = (MUST, clauses[-1][1])
        # upstream addClause: under AND_OPERATOR an explicit OR demotes
        # the preceding non-prohibited clause back to SHOULD
        if (conj == "OR" and default_op == "AND" and clauses
                and clauses[-1][0] == MUST):
            clauses[-1] = (SHOULD, clauses[-1][1])
        clauses.append((occur, node))
        conj = mod = None
    if not closed:
        raise QueryParseError("unbalanced '('")
    if not clauses:
        raise QueryParseError("empty query")
    if (len(clauses) == 1 and clauses[0][0] == SHOULD
            and group_boost == 1.0):
        return clauses[0][1], pos
    return BoolQ(clauses, boost=group_boost), pos


def _parse_clause(toks, pos: int, fld: str | None,
                  default_op: str = "OR"):
    if pos >= len(toks):
        # dangling 'field:' / modifier at end of input (upstream
        # QueryParser raises ParseException here)
        raise QueryParseError("unexpected end of query")
    kind, payload = toks[pos]
    if kind == "FIELD":
        return _parse_clause(toks, pos + 1, payload, default_op)
    if kind == "LP":
        return _parse_bool(toks, pos + 1, fld, default_op=default_op)
    if kind == "PHRASE":
        body, slop, boost = payload
        return PhraseQ(body, slop, fld, boost), pos + 1
    if kind == "REGEXP":
        body, boost = payload
        return RegexpQ(body.lower(), fld, boost), pos + 1
    if kind == "RANGE":
        lo, hi, ilo, ihi, boost = payload
        return RangeQ(lo.lower(), hi.lower(), ilo, ihi, fld,
                      boost), pos + 1
    if kind == "WORD":
        word, wf, boost, edits = payload
        f = wf if wf is not None else fld
        if word == "*" and f == "*":
            # *:* — upstream QueryParserBase special-cases the
            # all-fields all-terms wildcard to MatchAllDocsQuery
            return MatchAllQ(boost), pos + 1
        if edits is not None:
            return FuzzyQ(word.lower(), edits, f, boost), pos + 1
        if "*" in word or "?" in word:
            return WildQ(word.lower(), f, boost), pos + 1
        return TermQ(word, f, boost), pos + 1
    raise QueryParseError(f"unexpected token {kind}")


# ----------------------------------------------------------- evaluator

_EMPTY = (np.empty(0, np.int64), np.empty(0, np.float32))


def _node_boost(docs: np.ndarray, scores: np.ndarray, boost: float):
    if boost == 1.0:
        return docs, scores
    return docs, (np.float32(boost) * scores).astype(np.float32)


class Evaluator:
    """Evaluates a parsed AST against one reader per field.

    ``readers`` maps field name → IndexReader; key ``None`` is the
    default field. All readers must share the external doc-ID space
    (the multi-field build guarantees this)."""

    def __init__(self, readers):
        from engine.query import IndexReader
        if isinstance(readers, IndexReader):
            readers = {None: readers}
        self.readers = readers

    def _reader(self, field: str | None):
        if field in self.readers:
            return self.readers[field]
        if None in self.readers and field is None:
            return self.readers[None]
        raise QueryParseError(f"unknown field {field!r}")

    # each _eval_* returns (sorted unique doc_ids int64, f32 scores)

    def evaluate(self, node) -> tuple[np.ndarray, np.ndarray]:
        name = type(node).__name__
        return getattr(self, f"_eval_{name}")(node)

    def _term_clause(self, r, term: str, boost: float):
        """Raw (docs, f32 scores) for one analyzed term."""
        from engine.query import _clause_scores, idf
        subs = r.lookup([term])[term]
        if not subs:
            return _EMPTY
        docs, tfs, norms = r._clause_arrays(term, subs)
        w = np.float32(idf(r.N, len(docs)))
        if boost != 1.0:
            w = np.float32(np.float32(boost) * w)
        return docs, _clause_scores(tfs, norms, w, r.cache)

    def _union_sum(self, parts, boost: float = 1.0):
        """SHOULD-union of term clauses: f64 sum → f32 at the node."""
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _EMPTY
        if len(parts) == 1:
            docs, sc = parts[0]
            return _node_boost(docs, sc, boost)
        docs = np.concatenate([p[0] for p in parts])
        sc = np.concatenate([p[1] for p in parts]).astype(np.float64)
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, sc)
        return _node_boost(uniq, sums.astype(np.float32), boost)

    def _eval_MatchAllQ(self, n: MatchAllQ):
        # docIDs are dense 0..max_doc-1 by construction (docmap rank;
        # max_doc, not N — deletes shrink N but not the ID space); the
        # reader's delete mask is applied once at the top by node_topk
        r = next(iter(self.readers.values()))
        m = int(r.max_doc)
        return (np.arange(m, dtype=np.int64),
                np.full(m, np.float32(n.boost), dtype=np.float32))

    def _eval_TermQ(self, n: TermQ):
        r = self._reader(n.field)
        terms = r.analyzer.query_terms(n.text)
        if not terms:
            return _EMPTY
        # >1 analyzed token (rare): union-sum, like Lucene's per-
        # position boolean fallback
        return self._union_sum(
            [self._term_clause(r, t, n.boost) for t in terms])

    def _eval_FuzzyQ(self, n: FuzzyQ):
        from engine.query import _levenshtein
        r = self._reader(n.field)
        # trigram q-gram prefilter (superset; exact predicate below)
        ms = [t for t in r._fuzzy_candidates(n.text, n.max_edits)
              if _levenshtein(n.text, t, n.max_edits) <= n.max_edits]
        return self._union_sum(
            [self._term_clause(r, t, 1.0) for t in ms], n.boost)

    def _eval_WildQ(self, n: WildQ):
        r = self._reader(n.field)
        body = n.pattern[:-1] if n.pattern.endswith("*") else n.pattern
        if "*" not in body and "?" not in body:
            terms = r.expand_prefix(body)
        else:
            rx = re.compile("".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in n.pattern))
            lit = n.pattern.split("*", 1)[0].split("?", 1)[0]
            runs = [x for x in re.split(r"[*?]+", n.pattern)
                    if len(x) >= 3]
            cands = r._dict_candidates(required=runs) if runs \
                else (r.expand_prefix(lit) if lit
                      else r._shape_candidates(
                          r._wildcard_shape(n.pattern)))
            terms = [t for t in cands if rx.fullmatch(t)]
        return self._union_sum(
            [self._term_clause(r, t, 1.0) for t in terms], n.boost)

    def _eval_RegexpQ(self, n: RegexpQ):
        r = self._reader(n.field)
        rx = re.compile(n.pattern)
        terms = [t for t in r.regexp_candidates(n.pattern)
                 if rx.fullmatch(t)]
        return self._union_sum(
            [self._term_clause(r, t, 1.0) for t in terms], n.boost)

    def _eval_RangeQ(self, n: RangeQ):
        import bisect

        r = self._reader(n.field)
        vocab = r.vocabulary()       # sorted: the range is one slice
        lo_i = bisect.bisect_left(vocab, n.lo) if n.incl_lo \
            else bisect.bisect_right(vocab, n.lo)
        hi_i = bisect.bisect_right(vocab, n.hi) if n.incl_hi \
            else bisect.bisect_left(vocab, n.hi)
        terms = vocab[lo_i:hi_i]
        return self._union_sum(
            [self._term_clause(r, t, 1.0) for t in terms], n.boost)

    def _eval_PhraseQ(self, n: PhraseQ):
        r = self._reader(n.field)
        terms = r.analyzer.query_terms(n.text)
        if len(terms) == 1:
            return self._eval_TermQ(TermQ(terms[0], n.field, n.boost))
        big = 1 << 40
        if not terms:
            return _EMPTY
        if n.slop == 0:
            t = r.phrase_topk(n.text, k=big)
        elif len(terms) == 2:
            t = r.sloppy_phrase_topk(terms[0], terms[1], n.slop, k=big)
        else:
            t = r.span_near_topk(terms, n.slop, k=big)
        docs = t["doc_id"].to_numpy().astype(np.int64)
        sc = t["score"].to_numpy().astype(np.float32)
        order = np.argsort(docs)
        return _node_boost(docs[order], sc[order], n.boost)

    def _eval_SpanNearQ(self, n: SpanNearQ):
        r = self._reader(n.field)
        groups: list[list[str]] = []
        for a in n.args:
            if "*" in a or "?" in a:
                pat = a.lower()
                rx = re.compile("".join(
                    ".*" if c == "*" else "." if c == "?"
                    else re.escape(c) for c in pat))
                lit = re.split(r"[*?]", pat, 1)[0]
                cands = r.expand_prefix(lit) if lit \
                    else r._shape_candidates(r._wildcard_shape(pat))
                exp = [t for t in cands if rx.fullmatch(t)]
            else:
                exp = r.analyzer.query_terms(a)
            if not exp:
                return _EMPTY
            groups.append(sorted(set(exp)))
        big = 1 << 40
        if n.ordered:
            t = r.span_near_or_topk(groups, slop=n.dist - 1, k=big)
        else:
            if len(groups) != 2 or any(len(g) != 1 for g in groups):
                raise QueryParseError(
                    "surround: N needs exactly 2 plain terms")
            t = r.span_near_unordered_topk(
                groups[0][0], groups[1][0], slop=n.dist - 1, k=big)
        docs = t["doc_id"].to_numpy().astype(np.int64)
        sc = t["score"].to_numpy().astype(np.float32)
        order = np.argsort(docs)
        return _node_boost(docs[order], sc[order], n.boost)

    def _eval_BoolQ(self, n: BoolQ):
        must = [self.evaluate(c) for o, c in n.clauses if o == MUST]
        filt = [self.evaluate(c) for o, c in n.clauses if o == FILTER]
        should = [self.evaluate(c) for o, c in n.clauses if o == SHOULD]
        mnot = [self.evaluate(c) for o, c in n.clauses if o == MUST_NOT]
        if must or filt:
            req = must + filt
            cand = req[0][0]
            for d, _ in req[1:]:
                cand = np.intersect1d(cand, d, assume_unique=True)
        elif should:
            ne = [d for d, _ in should if len(d)]
            cand = np.unique(np.concatenate(ne)) if ne else \
                np.empty(0, np.int64)
        else:
            return _EMPTY        # pure negation matches nothing
        for d, _ in mnot:
            if len(d):
                cand = cand[~np.isin(cand, d, assume_unique=True)]
        if not len(cand):
            return _EMPTY
        sums = np.zeros(len(cand), dtype=np.float64)
        nmatch = np.zeros(len(cand), dtype=np.int32)
        for docs, sc in must + should:
            if not len(docs):
                continue
            idx = np.clip(np.searchsorted(docs, cand), 0, len(docs) - 1)
            hit = docs[idx] == cand
            sums[hit] += sc[idx[hit]].astype(np.float64)
        for docs, _ in should:
            if not len(docs):
                continue
            idx = np.clip(np.searchsorted(docs, cand), 0, len(docs) - 1)
            nmatch[docs[idx] == cand] += 1
        if n.min_should_match >= 1 and should:
            keep = nmatch >= n.min_should_match
            cand, sums = cand[keep], sums[keep]
            if not len(cand):
                return _EMPTY
        return _node_boost(cand, sums.astype(np.float32), n.boost)


# ------------------------------------------ Surround query parser
# (upstream ``L/queryparser/surround`` [U]: the legal/professional
# proximity grammar — infix/prefix distance operators ``nW`` (ordered,
# within n) and ``nN`` (unordered), n-ary AND/OR/NOT, parens, trailing
# truncation ``term*``. Distance queries rewrite to span queries
# exactly like upstream's DistanceQuery → SpanNearQuery rewrite.)

@dataclass
class SpanNearQ:
    """Surround distance node: raw args (term or wildcard pattern),
    expanded against the dictionary at evaluation time."""
    args: list[str]
    dist: int = 1
    ordered: bool = True
    field: str | None = None
    boost: float = 1.0


_SURROUND_OP = re.compile(r"(\d*)([WN])", re.IGNORECASE)


def surround_parse(q: str, default_field: str | None = None):
    """Parse surround syntax into the shared Query AST. Supported
    subset (documented): prefix-form ``nW(a, b, ...)`` / ``nN(a, b)``
    (bare ``W``/``N`` = distance 1), infix ``a 3W b``, n-ary
    left-associative AND/OR/NOT, parens, ``term*`` / ``te?m``
    truncation. Unordered ``N`` takes exactly two plain terms (the
    engine's unordered span pair matcher; conformance boundary)."""
    toks = re.findall(r"\(|\)|,|[^\s(),]+", q)
    pos = 0

    def at_op(i):
        if i >= len(toks):
            return None
        u = toks[i].upper()
        if u in ("AND", "OR", "NOT"):
            return u
        m = _SURROUND_OP.fullmatch(toks[i])
        # bare W/N followed by '(' is a prefix-form op, not infix
        if m and not (i + 1 < len(toks) and toks[i + 1] == "("):
            return m
        return None

    def leaf_args(node) -> list[str]:
        if isinstance(node, TermQ):
            return [node.text]
        if isinstance(node, WildQ):
            return [node.pattern]
        if isinstance(node, SpanNearQ):
            raise QueryParseError(
                "surround: nested distance ops need prefix form")
        raise QueryParseError("surround: distance op needs term args")

    def parse_prim():
        nonlocal pos
        if pos >= len(toks):
            raise QueryParseError("surround: unexpected end of query")
        t = toks[pos]
        m = _SURROUND_OP.fullmatch(t)
        if m and pos + 1 < len(toks) and toks[pos + 1] == "(":
            pos += 2
            args: list[str] = []
            while pos < len(toks) and toks[pos] != ")":
                if toks[pos] == ",":
                    pos += 1
                    continue
                if toks[pos] == "(":
                    raise QueryParseError(
                        "surround: distance args must be terms")
                args.append(toks[pos])
                pos += 1
            if pos >= len(toks):
                raise QueryParseError("surround: unbalanced '('")
            pos += 1
            if len(args) < 2:
                raise QueryParseError("surround: distance op needs "
                                      ">= 2 args")
            dist = int(m.group(1)) if m.group(1) else 1
            return SpanNearQ(args, dist, m.group(2).upper() == "W",
                             default_field)
        if t == "(":
            pos += 1
            node = parse_expr()
            if pos < len(toks) and toks[pos] == ")":
                pos += 1
                return node
            raise QueryParseError("surround: unbalanced '('")
        if t in (")", ","):
            raise QueryParseError(f"surround: unexpected {t!r}")
        pos += 1
        if "*" in t or "?" in t:
            return WildQ(t.lower(), default_field)
        return TermQ(t, default_field)

    def parse_expr():
        nonlocal pos
        node = parse_prim()
        while True:
            op = at_op(pos)
            if op is None:
                break
            pos += 1
            rhs = parse_prim()
            if op == "AND":
                if isinstance(node, BoolQ) and node.boost == 1.0 and \
                        all(o == MUST for o, _ in node.clauses):
                    node.clauses.append((MUST, rhs))
                else:
                    node = BoolQ([(MUST, node), (MUST, rhs)])
            elif op == "OR":
                if isinstance(node, BoolQ) and node.boost == 1.0 and \
                        all(o == SHOULD for o, _ in node.clauses):
                    node.clauses.append((SHOULD, rhs))
                else:
                    node = BoolQ([(SHOULD, node), (SHOULD, rhs)])
            elif op == "NOT":
                node = BoolQ([(MUST, node), (MUST_NOT, rhs)])
            else:                       # infix distance op
                dist = int(op.group(1)) if op.group(1) else 1
                node = SpanNearQ(leaf_args(node) + leaf_args(rhs),
                                 dist, op.group(2).upper() == "W",
                                 default_field)
        return node

    node = parse_expr()
    if pos != len(toks):
        raise QueryParseError(f"surround: trailing input in {q!r}")
    return node


def surround_topk(readers, query: str, k: int = 10,
                  default_field: str | None = None) -> pa.Table:
    """Surround parse → search (upstream
    ``L/queryparser/surround/query/SrndQuery`` rewrite path [U]).
    Boolean composition and the final collection follow the classic
    parser's Evaluator (same f32 cast discipline)."""
    from engine.query import _topdocs_table
    node = surround_parse(query, default_field)
    ev = Evaluator(readers)
    docs, scores = ev.evaluate(node)
    r0 = next(iter(ev.readers.values()))
    keep = r0._keep(docs)
    if keep is not None:
        docs, scores = docs[keep], scores[keep]
    if not len(docs):
        return _topdocs_table([], [])
    pos = scores > 0
    docs, scores = docs[pos], scores[pos]
    if not len(docs):
        return _topdocs_table([], [])
    order = np.lexsort((docs, -scores))[:k]
    return _topdocs_table(docs[order], scores[order],
                          total=int(pos.sum()))


# ------------------------------------------ SimpleQueryParser
# (upstream ``L/queryparser/simple/SimpleQueryParser.java`` [U]: the
# end-user-safe grammar — ``+`` AND, ``|`` OR, ``-`` NOT, ``"..."``
# phrase with ``~N`` slop, trailing ``*`` prefix, ``~N`` term fuzz,
# ``(...)`` precedence, ``\`` escape; precedence NOT > AND > OR;
# whitespace applies the default operator. The defining contract is
# that parsing NEVER throws: malformed input degrades — unterminated
# phrases run to end of string, unbalanced ``(`` closes at EOF, stray
# ``)`` and dangling operators are ignored — mirroring upstream's
# lenient recovery rather than classic QueryParser's ParseException.)

_SIMPLE_DELIMS = ' \t\n+|-"()'


def _simple_tokenize(q: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c in " \t\n":
            i += 1; continue
        if c == "+":
            toks.append(("AND", None)); i += 1; continue
        if c == "|":
            toks.append(("OR", None)); i += 1; continue
        if c == "-":
            toks.append(("NOT", None)); i += 1; continue
        if c == "(":
            toks.append(("LP", None)); i += 1; continue
        if c == ")":
            toks.append(("RP", None)); i += 1; continue
        if c == '"':
            j, buf = i + 1, []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1]); j += 2
                else:
                    buf.append(q[j]); j += 1
            i = j + 1 if j < n else n      # unterminated: degrade
            slop = 0
            m = re.match(r"~(\d+)", q[i:])
            if m:
                slop = int(m.group(1)); i += m.end()
            toks.append(("PHRASE", ("".join(buf), slop)))
            continue
        buf = []
        while i < n and q[i] not in _SIMPLE_DELIMS:
            if q[i] == "\\" and i + 1 < n:
                buf.append(q[i + 1]); i += 2
            else:
                buf.append(q[i]); i += 1
        word = "".join(buf)
        fuzz = None
        m = re.search(r"~(\d*)$", word)
        if m:
            fuzz = int(m.group(1)) if m.group(1) else 2
            word = word[:m.start()]
        prefix = word.endswith("*")
        if prefix:
            word = word.rstrip("*")
        if not word:
            continue                       # operator junk: degrade
        toks.append(("TERM", (word, fuzz, prefix)))
    return toks


def _sp_unary(toks, pos, fld, default_op):
    """One optionally-negated atom → (node_or_None, negated, pos)."""
    neg = False
    while pos < len(toks) and toks[pos][0] == "NOT":
        neg = not neg
        pos += 1
    if pos >= len(toks):
        return None, neg, pos              # dangling '-': degrade
    kind, payload = toks[pos]
    if kind == "LP":
        node, pos = _sp_or(toks, pos + 1, fld, default_op)
        if pos < len(toks) and toks[pos][0] == "RP":
            pos += 1                       # else unbalanced '(': EOF-close
        return node, neg, pos
    if kind == "PHRASE":
        body, slop = payload
        if not body.strip():
            return None, neg, pos + 1
        return PhraseQ(body, slop, fld), neg, pos + 1
    if kind == "TERM":
        word, fuzz, prefix = payload
        if fuzz is not None:
            return FuzzyQ(word.lower(), min(fuzz, 2), fld), neg, pos + 1
        if prefix:
            return WildQ(word.lower() + "*", fld), neg, pos + 1
        return TermQ(word, fld), neg, pos + 1
    # OR/AND/RP where an atom belongs: skip it (degrade)
    return None, neg, pos + 1


_ATOM_STARTS = ("TERM", "PHRASE", "LP", "NOT")


def _sp_and(toks, pos, fld, default_op):
    """AND-level chain → (positives, negatives, pos)."""
    pos_nodes: list = []
    neg_nodes: list = []
    node, neg, pos = _sp_unary(toks, pos, fld, default_op)
    if node is not None:
        (neg_nodes if neg else pos_nodes).append(node)
    while pos < len(toks):
        kind, _ = toks[pos]
        if kind == "AND":
            pos += 1
        elif default_op == "AND" and kind in _ATOM_STARTS:
            pass
        else:
            break
        node, neg, pos = _sp_unary(toks, pos, fld, default_op)
        if node is not None:
            (neg_nodes if neg else pos_nodes).append(node)
    return pos_nodes, neg_nodes, pos


def _sp_or(toks, pos, fld, default_op, top=False):
    """OR-level chain → (node_or_None, pos)."""
    should: list = []
    must: list = []
    mnot: list = []

    def _take(pos):
        ps, ns, pos = _sp_and(toks, pos, fld, default_op)
        if len(ps) == 1 and not ns:
            should.append(ps[0])
        elif ps:
            must.append(BoolQ([(MUST, p) for p in ps]
                              + [(MUST_NOT, m) for m in ns]))
        else:
            mnot.extend(ns)                # pure-negative AND group
        return pos

    pos = _take(pos)
    while pos < len(toks):
        kind, _ = toks[pos]
        if kind == "RP":
            if not top:
                break
            pos += 1                       # stray ')': degrade
            continue
        if kind == "OR":
            pos += 1
        elif kind in _ATOM_STARTS or kind == "AND":
            # whitespace default-op join (AND tokens are consumed by
            # _sp_and; a leading stray AND here degrades to a join)
            if kind == "AND":
                pos += 1
                if pos >= len(toks) or toks[pos][0] not in _ATOM_STARTS:
                    continue
        else:
            break
        pos = _take(pos)
    # an AND-composed sub-boolean that is the ONLY clause stays as-is
    nodes = should + must
    if not nodes and not mnot:
        return None, pos
    if len(nodes) == 1 and not mnot:
        return nodes[0], pos
    return BoolQ([(SHOULD, x) for x in nodes]
                 + [(MUST_NOT, x) for x in mnot]), pos


def simple_parse(q: str, default_field: str | None = None,
                 default_op: str = "OR"):
    """Parse SimpleQueryParser syntax; returns a Query AST or ``None``
    for an effectively-empty query. Never raises."""
    node, _ = _sp_or(_simple_tokenize(q), 0, default_field,
                     default_op, top=True)
    return node


def simple_parsed_topk(readers, query: str, k: int = 10,
                       default_field: str | None = None,
                       default_op: str = "OR") -> pa.Table:
    """SimpleQueryParser.parse() → IndexSearcher.search() in one call
    (upstream ``L/queryparser/simple/SimpleQueryParser`` [U]). Scoring
    composition is identical to ``parsed_topk`` (same Evaluator)."""
    from engine.query import _topdocs_table
    node = simple_parse(query, default_field, default_op=default_op)
    if node is None:
        return _topdocs_table([], [])
    ev = Evaluator(readers)
    docs, scores = ev.evaluate(node)
    r0 = next(iter(ev.readers.values()))
    keep = r0._keep(docs)
    if keep is not None:
        docs, scores = docs[keep], scores[keep]
    if not len(docs):
        return _topdocs_table([], [])
    pos = scores > 0
    docs, scores = docs[pos], scores[pos]
    if not len(docs):
        return _topdocs_table([], [])
    order = np.lexsort((docs, -scores))[:k]
    return _topdocs_table(docs[order], scores[order],
                          total=int(pos.sum()))


def fix_negative_query(node):
    """Solr's top-level pure-negative rewrite (upstream
    ``S/util/QueryUtils.java#fixNegativeQuery`` via ``makeQueryable``
    [U]): a boolean with ONLY prohibited clauses — which under
    Lucene's pure-negation rule matches nothing — gains a
    ``MatchAllDocsQuery`` MUST clause, so ``q=-term`` means "every
    doc except". Non-negative queries pass through unchanged."""
    if isinstance(node, BoolQ) and node.clauses and \
            all(o == MUST_NOT for o, _ in node.clauses):
        return BoolQ([(MUST, MatchAllQ())] + list(node.clauses),
                     boost=node.boost,
                     min_should_match=node.min_should_match)
    return node


def parsed_topk(readers, query: str, k: int = 10,
                default_field: str | None = None,
                min_should_match: int = 0,
                default_op: str = "OR",
                fix_negative: bool = False) -> pa.Table:
    """Parse ``query`` and return the top-k TopDocs table (rank,
    doc_id, score) — the classic ``QueryParser.parse() →
    IndexSearcher.search()`` path in one call. ``readers`` is an
    IndexReader or a {field: IndexReader} map; ``min_should_match``
    applies to the top-level boolean (Solr's ``mm``); ``default_op``
    is Solr's ``q.op``; ``fix_negative`` applies Solr's top-level
    pure-negative rewrite (Lucene-proper leaves such queries
    matching nothing, hence opt-in)."""
    node = parse(query, default_field, default_op=default_op)
    if fix_negative:
        node = fix_negative_query(node)
    if isinstance(node, BoolQ):
        node.min_should_match = min_should_match
    elif min_should_match > 1:
        node = BoolQ([(SHOULD, node)],
                     min_should_match=min_should_match)
    return node_topk(readers, node, k)


def node_topk(readers, node, k: int = 10) -> pa.Table:
    """Evaluate an already-built Query AST node (from the classic,
    surround, XML or JSON-DSL front-end) into a TopDocs table."""
    from engine.query import _topdocs_table
    ev = Evaluator(readers)
    docs, scores = ev.evaluate(node)
    r0 = next(iter(ev.readers.values()))
    keep = r0._keep(docs)
    if keep is not None:
        docs, scores = docs[keep], scores[keep]
    if not len(docs):
        return _topdocs_table([], [])
    pos = scores > 0
    docs, scores = docs[pos], scores[pos]
    if not len(docs):
        return _topdocs_table([], [])
    order = np.lexsort((docs, -scores))[:k]
    return _topdocs_table(docs[order], scores[order], total=int(pos.sum()))
