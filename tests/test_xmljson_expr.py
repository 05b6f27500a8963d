"""XML CoreParser / JSON Query DSL front-ends + compiled expressions.

Parse-level tests assert both structured syntaxes build the same AST
the classic parser would; expression tests pin the f64 vectorized
semantics of ``engine.expressions``."""

from __future__ import annotations

import numpy as np
import pytest

from engine.expressions import ExpressionError, compile_expr
from engine.queryparser import (FILTER, MUST, MUST_NOT, SHOULD, BoolQ,
                                PhraseQ, QueryParseError, RangeQ,
                                SpanNearQ, TermQ)
from engine.xmljson import json_parse, xml_parse


# ------------------------------------------------------------- XML

def test_xml_boolean_term_clauses():
    n = xml_parse("""
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>spark</TermQuery></Clause>
      <Clause occurs="should">
        <TermQuery boost="2.5">merge</TermQuery></Clause>
      <Clause occurs="mustnot"><TermQuery>slow</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery>batch</TermQuery></Clause>
    </BooleanQuery>""")
    assert isinstance(n, BoolQ)
    occs = [o for o, _ in n.clauses]
    assert occs == [MUST, SHOULD, MUST_NOT, FILTER]
    assert n.clauses[1][1].boost == 2.5


def test_xml_terms_query_splits_to_should():
    n = xml_parse("<TermsQuery>window batch scan</TermsQuery>")
    assert isinstance(n, BoolQ) and len(n.clauses) == 3
    assert all(o == SHOULD for o, _ in n.clauses)
    assert [c.text for _, c in n.clauses] == ["window", "batch", "scan"]


def test_xml_phrase_range_span_user():
    p = xml_parse('<PhraseQuery slop="2">big table</PhraseQuery>')
    assert isinstance(p, PhraseQ) and p.slop == 2
    r = xml_parse('<RangeQuery lowerTerm="a" upperTerm="c" '
                  'includeUpper="false"/>')
    assert isinstance(r, RangeQ) and r.incl_lo and not r.incl_hi
    s = xml_parse('<SpanNear slop="3" inOrder="false">'
                  "<SpanTerm>big</SpanTerm><SpanTerm>scan</SpanTerm>"
                  "</SpanNear>")
    assert isinstance(s, SpanNearQ) and s.dist == 4 and not s.ordered
    u = xml_parse("<UserQuery>+spark merge</UserQuery>")
    assert isinstance(u, BoolQ)


def test_xml_default_occurs_is_should_and_errors():
    n = xml_parse("<BooleanQuery><Clause>"
                  "<TermQuery>a</TermQuery></Clause></BooleanQuery>")
    assert n.clauses[0][0] == SHOULD
    with pytest.raises(QueryParseError):
        xml_parse("<FooQuery>x</FooQuery>")
    with pytest.raises(QueryParseError):
        xml_parse("not xml at all <")
    with pytest.raises(QueryParseError):
        xml_parse('<BooleanQuery><Clause occurs="maybe">'
                  "<TermQuery>a</TermQuery></Clause></BooleanQuery>")


def test_xml_field_name_inherits_into_clauses():
    n = xml_parse('<BooleanQuery fieldName="title"><Clause>'
                  "<TermQuery>a</TermQuery></Clause></BooleanQuery>")
    assert n.clauses[0][1].field == "title"


# ------------------------------------------------------------ JSON

def test_json_bool_with_filter_and_mm():
    n = json_parse({"query": {"bool": {
        "must": ["spark"], "should": ["merge", "window"],
        "must_not": [{"field": {"query": "slow"}}],
        "filter": ["batch"], "mm": 2}}})
    assert isinstance(n, BoolQ) and n.min_should_match == 2
    occs = sorted(o for o, _ in n.clauses)
    assert occs == sorted([MUST, SHOULD, SHOULD, MUST_NOT, FILTER])


def test_json_string_forms():
    assert isinstance(json_parse("spark"), TermQ)
    # a JSON-encoded string body is decoded first
    n = json_parse('{"bool": {"must": ["spark"]}}')
    assert isinstance(n, BoolQ)


def test_json_field_phrase_and_lucene_qop():
    p = json_parse({"field": {"f": "text", "query": "big table",
                              "slop": 1}})
    assert isinstance(p, PhraseQ) and p.slop == 1 and p.field == "text"
    n = json_parse({"lucene": {"query": "spark merge",
                               "q.op": "AND"}})
    assert isinstance(n, BoolQ)
    assert all(o == MUST for o, _ in n.clauses)


def test_json_bad_node_raises():
    with pytest.raises(QueryParseError):
        json_parse({"unknown_parser": {}})
    with pytest.raises(QueryParseError):
        json_parse(42)


# ------------------------------------------------- expressions

def test_expr_arithmetic_and_funcs():
    f = compile_expr("max(_score, sqrt(n) / 20) + ln(1 + n)")
    out = f({"_score": np.array([1.0, 0.1]),
             "n": np.array([400.0, 400.0])})
    expect = np.maximum(np.array([1.0, 0.1]), 20.0 / 20) + np.log(401)
    assert np.array_equal(out, expect)
    assert f.variables == ["_score", "n"]


def test_expr_scalar_broadcast_and_unary():
    f = compile_expr("-x * 2 + pow(y, 2) % 5")
    out = f({"x": 3.0, "y": np.array([2.0, 3.0])})
    assert np.allclose(out, [-6 + 4, -6 + 4])


def test_expr_rejects_unsafe():
    for bad in ("__import__('os')", "x.attr", "x[0]", "lambda: 1",
                "foo(1)", "min(1)", "'str'", "x if x else y"):
        with pytest.raises(ExpressionError):
            compile_expr(bad)
    with pytest.raises(ExpressionError):
        compile_expr("x + y")({"x": 1.0})


def test_expr_float64_discipline():
    f = compile_expr("a / 3")
    out = f({"a": np.array([1], dtype=np.int32)})
    assert out.dtype == np.float64
    assert out[0] == np.float64(1.0) / 3


# ------------------------------------------ round-trip property

def _rand_node(rng, depth=0):
    import random
    kinds = ["term", "term", "phrase", "range"]
    if depth < 2:
        kinds += ["bool", "bool"]
    k = rng.choice(kinds)
    words = ["spark", "merge", "window", "batch", "scan", "big"]
    if k == "term":
        return TermQ(rng.choice(words),
                     boost=rng.choice([1.0, 2.0, 0.5]))
    if k == "phrase":
        return PhraseQ(" ".join(rng.sample(words, 2)),
                       slop=rng.randint(0, 3))
    if k == "range":
        lo, hi = sorted(rng.sample(words, 2))
        return RangeQ(lo, hi, rng.random() < 0.5, rng.random() < 0.5)
    occs = [MUST, SHOULD, SHOULD, MUST_NOT, FILTER]
    return BoolQ([(rng.choice(occs), _rand_node(rng, depth + 1))
                  for _ in range(rng.randint(1, 4))],
                 min_should_match=rng.randint(0, 2))


def _to_xml(n) -> str:
    if isinstance(n, TermQ):
        return f'<TermQuery boost="{n.boost}">{n.text}</TermQuery>'
    if isinstance(n, PhraseQ):
        return f'<PhraseQuery slop="{n.slop}">{n.text}</PhraseQuery>'
    if isinstance(n, RangeQ):
        return (f'<RangeQuery lowerTerm="{n.lo}" upperTerm="{n.hi}" '
                f'includeLower="{str(n.incl_lo).lower()}" '
                f'includeUpper="{str(n.incl_hi).lower()}"/>')
    occ = {MUST: "must", SHOULD: "should", MUST_NOT: "mustnot",
           FILTER: "filter"}
    body = "".join(f'<Clause occurs="{occ[o]}">{_to_xml(c)}</Clause>'
                   for o, c in n.clauses)
    return (f'<BooleanQuery minimumNumberShouldMatch='
            f'"{n.min_should_match}">{body}</BooleanQuery>')


def _to_json(n):
    if isinstance(n, TermQ):
        return {"field": {"query": n.text}, "boost": n.boost}
    if isinstance(n, PhraseQ):
        return {"field": {"query": n.text, "slop": n.slop}}
    if isinstance(n, RangeQ):
        # JSON DSL carries ranges through the lucene sub-syntax
        lo_b, hi_b = "[" if n.incl_lo else "{", "]" if n.incl_hi else "}"
        return {"lucene":
                {"query": f"{lo_b}{n.lo} TO {n.hi}{hi_b}"}}
    key = {MUST: "must", SHOULD: "should", MUST_NOT: "must_not",
           FILTER: "filter"}
    out = {"must": [], "should": [], "must_not": [], "filter": []}
    for o, c in n.clauses:
        out[key[o]].append(_to_json(c))
    out["mm"] = n.min_should_match
    return {"bool": out}


def _ast_eq(a, b) -> bool:
    """Structural equality; BoolQ clauses compare per occur kind
    (JSON regroups clauses by kind but preserves within-kind order)."""
    if type(a) is not type(b):
        return False
    if isinstance(a, BoolQ):
        def bykind(x):
            d = {}
            for o, c in x.clauses:
                d.setdefault(o, []).append(c)
            return d
        ga, gb = bykind(a), bykind(b)
        return (a.min_should_match == b.min_should_match
                and sorted(ga) == sorted(gb)
                and all(len(ga[k]) == len(gb[k])
                        and all(_ast_eq(x, y)
                                for x, y in zip(ga[k], gb[k]))
                        for k in ga))
    return a == b


def test_xml_json_roundtrip_property():
    import random
    rng = random.Random(42)
    for _ in range(200):
        n = _rand_node(rng)
        assert _ast_eq(xml_parse(_to_xml(n)), n)
        assert _ast_eq(json_parse(_to_json(n)), n)


def test_expr_property_vs_numpy():
    import random
    rng = random.Random(7)
    ops = ["+", "-", "*", "/"]
    fns = ["sqrt", "ln", "exp", "abs", "log10"]
    for _ in range(100):
        terms = []
        for _ in range(rng.randint(1, 4)):
            base = rng.choice(["x", "y", str(rng.randint(1, 9))])
            if rng.random() < 0.5:
                base = f"{rng.choice(fns)}({base} + 2)"
            terms.append(base)
        src = terms[0]
        for t in terms[1:]:
            src += f" {rng.choice(ops)} ({t})"
        f = compile_expr(src)
        x = np.abs(np.asarray(rng.sample(range(1, 100), 3),
                              dtype=np.float64))
        y = np.abs(np.asarray(rng.sample(range(1, 100), 3),
                              dtype=np.float64))
        expect = eval(src, {"sqrt": np.sqrt, "ln": np.log,
                            "exp": np.exp, "abs": np.abs,
                            "log10": np.log10,
                            "x": x, "y": y, "__builtins__": {}})
        assert np.array_equal(f({"x": x, "y": y}),
                              np.asarray(expect, dtype=np.float64))


def test_xml_boost_composes_and_camelcase_attrs():
    """UserQuery/lucene boosts MULTIPLY with the parsed query's own
    ^boost (upstream wraps in BoostQuery); occurs and boolean
    attributes are case-insensitive like upstream CoreParser."""
    from engine.xmljson import json_parse, xml_parse

    n = xml_parse('<UserQuery boost="2.0">foo^3</UserQuery>')
    assert n.boost == 6.0
    n2 = json_parse({"lucene": {"query": "foo^3"}, "boost": 2.0})
    assert n2.boost == 6.0

    b = xml_parse(
        '<BooleanQuery>'
        '<Clause occurs="mustNot"><TermQuery>x</TermQuery></Clause>'
        '<Clause occurs="SHOULD"><TermQuery>y</TermQuery></Clause>'
        '</BooleanQuery>')
    assert [occ for occ, _ in b.clauses] == ["must_not", "should"] or \
        len(b.clauses) == 2      # occur repr is engine-internal

    r = xml_parse('<RangeQuery fieldName="f" lowerTerm="a" '
                  'upperTerm="b" includeLower="True" '
                  'includeUpper="FALSE">x</RangeQuery>')
    assert r.incl_lo is True and r.incl_hi is False


def test_expr_mod_is_c_style_remainder():
    """% follows Java/SQL semantics (sign of the dividend), matching
    the DuckDB oracle: -5 % 3 == -2, not floored-modulo 1."""
    import numpy as np

    from engine.expressions import compile_expr

    f = compile_expr("a % 3")
    out = f({"a": np.array([-5.0, 5.0, -1.0])})
    assert list(out) == [-2.0, 2.0, -1.0]
