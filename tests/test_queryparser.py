"""Classic query parser: AST shapes + evaluator equivalence.

Equivalence tests assert the parsed path reproduces the dedicated
engine methods bit-for-bit (same analyzed corpus, same f32 casts)."""

from __future__ import annotations

import numpy as np
import pytest

from engine.queryparser import (MUST, MUST_NOT, SHOULD, BoolQ, FuzzyQ,
                                PhraseQ, QueryParseError, RangeQ,
                                RegexpQ, TermQ, WildQ, parse)


# ----------------------------------------------------------- AST shape

def test_parse_single_term():
    n = parse("spark")
    assert isinstance(n, TermQ) and n.text == "spark" and n.boost == 1.0


def test_parse_default_or():
    n = parse("a b c")
    assert isinstance(n, BoolQ)
    assert [o for o, _ in n.clauses] == [SHOULD, SHOULD, SHOULD]


def test_parse_modifiers():
    n = parse("+a -b c NOT d")
    assert [o for o, _ in n.clauses] == [MUST, MUST_NOT, SHOULD, MUST_NOT]


def test_parse_and_promotes_both_sides():
    n = parse("a AND b")
    assert [o for o, _ in n.clauses] == [MUST, MUST]
    n = parse("a AND b OR c")
    assert [o for o, _ in n.clauses] == [MUST, MUST, SHOULD]
    n = parse("a && b")
    assert [o for o, _ in n.clauses] == [MUST, MUST]


def test_parse_and_not():
    n = parse("a AND NOT b")
    assert [o for o, _ in n.clauses] == [MUST, MUST_NOT]


def test_parse_default_op_and():
    # q.op=AND: unmarked clauses become MUST
    n = parse("a b c", default_op="AND")
    assert [o for o, _ in n.clauses] == [MUST, MUST, MUST]
    # explicit modifiers still win
    n = parse("a -b +c", default_op="AND")
    assert [o for o, _ in n.clauses] == [MUST, MUST_NOT, MUST]
    # explicit OR leaves its clause SHOULD and retroactively demotes
    # the preceding MUST (upstream addClause quirk under AND_OPERATOR)
    n = parse("a OR b", default_op="AND")
    assert [o for o, _ in n.clauses] == [SHOULD, SHOULD]
    n = parse("a b OR c", default_op="AND")
    assert [o for o, _ in n.clauses] == [MUST, SHOULD, SHOULD]
    # OR does not demote a prohibited clause
    n = parse("-a OR b", default_op="AND")
    assert [o for o, _ in n.clauses] == [MUST_NOT, SHOULD]
    # default_op recurses into groups
    n = parse("(a b) c", default_op="AND")
    assert [o for o, _ in n.clauses] == [MUST, MUST]
    inner = n.clauses[0][1]
    assert [o for o, _ in inner.clauses] == [MUST, MUST]


def test_parse_field_and_boost():
    n = parse("title:spark^2.5")
    assert isinstance(n, TermQ)
    assert n.field == "title" and n.boost == 2.5


def test_parse_phrase_slop_boost():
    n = parse('"part filter"~3^2')
    assert isinstance(n, PhraseQ)
    assert n.slop == 3 and n.boost == 2.0 and n.text == "part filter"


def test_parse_group_with_field_and_boost():
    n = parse("t:(a b)^4")
    assert isinstance(n, BoolQ) and n.boost == 4.0
    terms = [c for _, c in n.clauses]
    assert all(t.field == "t" for t in terms)


def test_parse_range_brackets():
    n = parse("[aa TO bb]")
    assert isinstance(n, RangeQ) and n.incl_lo and n.incl_hi
    n = parse("{aa TO bb}")
    assert not n.incl_lo and not n.incl_hi
    n = parse("f:[aa TO bb}")
    assert n.field == "f" and n.incl_lo and not n.incl_hi


def test_parse_fuzzy_wild_regexp():
    n = parse("roam~1")
    assert isinstance(n, FuzzyQ) and n.max_edits == 1
    assert parse("roam~").max_edits == 2
    assert isinstance(parse("wi*rd"), WildQ)
    assert isinstance(parse("wi?d"), WildQ)
    n = parse("/s.*t/")
    assert isinstance(n, RegexpQ) and n.pattern == "s.*t"


def test_parse_nested_groups():
    n = parse("+a (b (c d))")
    assert [o for o, _ in n.clauses] == [MUST, SHOULD]
    inner = n.clauses[1][1]
    assert isinstance(inner, BoolQ)
    assert isinstance(inner.clauses[1][1], BoolQ)


def test_parse_errors():
    for bad in ["", '"open phrase', "(a b", "a)", "/nope", "^2"]:
        with pytest.raises(QueryParseError):
            parse(bad)


# ----------------------------------------------- evaluator equivalence

@pytest.fixture(scope="module")
def reader(smoke_index):
    from engine.query import IndexReader

    idx, _, _ = smoke_index
    return IndexReader(idx)


def _terms(reader, text):
    return reader.analyzer.query_terms(text)


def _same(a, b):
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_parsed_disjunction_matches_brute(reader):
    q = "running connection index"
    _same(reader.parsed_topk(q, k=20), reader.brute_force_topk(q, 20))


def test_parsed_must_matches_boolean(reader):
    ts = _terms(reader, "running connection")
    assert len(ts) == 2
    _same(reader.parsed_topk(f"+{ts[0]} +{ts[1]}", k=15),
          reader.boolean_topk(must=ts, k=15))
    _same(reader.parsed_topk(f"{ts[0]} AND {ts[1]}", k=15),
          reader.boolean_topk(must=ts, k=15))


def test_parsed_must_not_matches_boolean(reader):
    ts = _terms(reader, "running connection index")
    _same(reader.parsed_topk(f"{ts[0]} {ts[1]} -{ts[2]}", k=15),
          reader.boolean_topk(should=ts[:2], must_not=[ts[2]], k=15))


def test_parsed_qop_and_matches_boolean(reader):
    ts = _terms(reader, "running connection")
    # bare terms under q.op=AND score as a conjunction
    _same(reader.parsed_topk(f"{ts[0]} {ts[1]}", k=15, default_op="AND"),
          reader.boolean_topk(must=ts, k=15))
    # explicit OR under q.op=AND restores the disjunction
    _same(reader.parsed_topk(f"{ts[0]} OR {ts[1]}", k=15,
                             default_op="AND"),
          reader.parsed_topk(f"{ts[0]} {ts[1]}", k=15))


def test_parsed_msm_matches_boolean(reader):
    ts = _terms(reader, "running connection index")
    _same(reader.parsed_topk(" ".join(ts), k=15, min_should_match=2),
          reader.boolean_topk(should=ts, k=15, min_should_match=2))


def test_parsed_boosts_match_boosted(reader):
    ts = _terms(reader, "running connection")
    _same(reader.parsed_topk(f"{ts[0]}^2 {ts[1]}^0.5", k=15),
          reader.boosted_topk({ts[0]: 2.0, ts[1]: 0.5}, k=15))


def test_parsed_phrase_matches_phrase(reader, smoke_corpus):
    import glob

    import pyarrow.parquet as pq

    corpus, _ = smoke_corpus
    text = pq.read_table(glob.glob(f"{corpus}/*.parquet")[0],
                         columns=["text"])["text"][0].as_py()
    toks = reader.analyzer.query_terms(text)
    # stopword removal leaves position gaps: pick a pair that is
    # consecutive in the INDEX positions, not just in the token list
    phrase = next(
        f"{a} {b}" for a, b in zip(toks, toks[1:])
        if reader.phrase_topk(f"{a} {b}", k=1).num_rows)
    got = reader.parsed_topk(f'"{phrase}"', k=10)
    assert got.num_rows > 0
    _same(got, reader.phrase_topk(phrase, k=10))
    # sloppy variant delegates to the 2-term sloppy matcher
    t0, t1 = phrase.split()
    _same(reader.parsed_topk(f'"{phrase}"~2', k=10),
          reader.sloppy_phrase_topk(t0, t1, slop=2, k=10))


def test_parsed_fuzzy_matches_fuzzy(reader):
    _same(reader.parsed_topk("zephr~1", k=10),
          reader.fuzzy_topk("zephr", k=10, max_edits=1))


def test_parsed_wildcard_matches_wildcard(reader):
    _same(reader.parsed_topk("ze*", k=10), reader.wildcard_topk("ze*", 10))
    _same(reader.parsed_topk("z?phyr", k=10),
          reader.wildcard_topk("z?phyr", 10))


def test_parsed_regexp_matches_regexp(reader):
    _same(reader.parsed_topk("/zep.*/", k=10),
          reader.regexp_topk("zep.*", k=10))


def test_parsed_range_matches_expansion(reader):
    vocab = reader.vocabulary()
    sel = [t for t in vocab if "za" <= t <= "zz"]
    assert sel
    _same(reader.parsed_topk("[za TO zz]", k=10),
          reader.boolean_topk(should=sel, k=10))
    # exclusive brackets drop the endpoints
    if len(sel) >= 3:
        excl = sel[1:-1]
        _same(reader.parsed_topk(f"{{{sel[0]} TO {sel[-1]}}}", k=10),
              reader.boolean_topk(should=excl, k=10))


def test_group_boost_scales_scores(reader):
    ts = _terms(reader, "running connection")
    plain = reader.parsed_topk(f"({ts[0]} {ts[1]})", k=15)
    boosted = reader.parsed_topk(f"({ts[0]} {ts[1]})^2", k=15)
    assert plain["doc_id"].to_pylist() == boosted["doc_id"].to_pylist()
    # power-of-two boost: f32 multiply is exact
    assert np.array_equal(boosted["score"].to_numpy(),
                          2 * plain["score"].to_numpy())


def test_pure_negation_matches_nothing(reader):
    ts = _terms(reader, "running")
    assert reader.parsed_topk(f"-{ts[0]}", k=10).num_rows == 0


def test_match_all_parses_and_hits_every_doc(reader):
    from engine.queryparser import MatchAllQ, parse

    assert isinstance(parse("*:*"), MatchAllQ)
    t = reader.parsed_topk("*:*", k=reader.max_doc + 5)
    # every live doc at constant score 1.0, collected in docID order
    assert t.num_rows == reader.N
    ids = t["doc_id"].to_pylist()
    assert ids == sorted(ids)
    assert set(t["score"].to_pylist()) == {1.0}


def test_match_all_boost_scales_constant_score(reader):
    t = reader.parsed_topk("(*:*)^2", k=5)
    assert set(t["score"].to_pylist()) == {2.0}


def test_fix_negative_rewrites_pure_negative(reader):
    from engine.queryparser import fix_negative_query, parse

    ts = _terms(reader, "running")
    # non-negative queries pass through untouched
    n = parse("spark merge")
    assert fix_negative_query(n) is n
    # -term with the Solr rewrite = complement of the term's matches
    neg = reader.parsed_topk(f"-{ts[0]}", k=reader.max_doc,
                             fix_negative=True)
    pos = reader.parsed_topk(ts[0], k=reader.max_doc)
    nids = set(neg["doc_id"].to_pylist())
    pids = set(pos["doc_id"].to_pylist())
    assert nids.isdisjoint(pids)
    assert nids | pids == set(range(reader.max_doc))
    assert set(neg["score"].to_pylist()) == {1.0}


def test_unknown_field_raises(reader):
    with pytest.raises(QueryParseError):
        reader.parsed_topk("nosuchfield:spark", k=5)


def test_query_engine_lucene_dispatch(ray_session, smoke_index):
    import pyarrow as pa

    from engine.query import QueryEngine

    idx, _, _ = smoke_index
    eng = QueryEngine(idx, resolve=False, preload=False)
    batch = pa.table({
        "query_id": pa.array([7], type=pa.int64()),
        "query_text": pa.array(["+run connect"]),
        "k": pa.array([5], type=pa.int64()),
        "query_type": pa.array(["lucene"]),
    })
    out = eng(batch)
    ref = eng.reader.parsed_topk("+run connect", k=5)
    assert out["doc_id"].to_pylist() == ref["doc_id"].to_pylist()


def test_parser_fuzz_never_crashes(ray_session, smoke_index):
    """Robustness: random syntax soup either parses (and then executes
    cleanly against a real reader) or raises QueryParseError — never
    any other exception. Mirrors upstream's parser fuzz suites."""
    import numpy as np

    from engine.query import IndexReader
    from engine.queryparser import QueryParseError, parse, parsed_topk

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    rng = np.random.default_rng(11)
    atoms = ["zephyr", "quark", "the", "+", "-", "NOT", "AND", "OR",
             "(", ")", '"', "~", "~2", "^2.5", "*", "?", "[", "]",
             "{", "}", "TO", ":", "/re.*x/", "wild*", "fu?z", " "]
    n_parsed = 0
    for i in range(400):
        q = "".join(rng.choice(atoms, size=rng.integers(1, 12)))
        op = "AND" if i % 2 else "OR"    # fuzz both default operators
        try:
            parse(q, default_op=op)
        except QueryParseError:
            continue
        n_parsed += 1
        try:
            parsed_topk(r, q, k=3, default_op=op)
        except QueryParseError:
            pass
    assert n_parsed > 20   # the fuzz actually exercises the evaluator


def test_calculate_min_should_match_grammar():
    """Solr mm-spec grammar (SolrPluginUtils.calculateMinShouldMatch),
    pinned against the documented reference-guide examples."""
    from engine.queryparser import calculate_min_should_match as mm

    assert mm("3", 5) == 3
    assert mm("-2", 5) == 3
    assert mm("75%", 4) == 3          # floor(3.0)
    assert mm("75%", 10) == 7         # floor(7.5)
    assert mm("-25%", 4) == 3         # all but floor(1.0)
    assert mm("-25%", 10) == 8        # all but floor(2.5)=2
    # conditional: <=2 clauses -> all; 3..9 -> all-but-25%; >9 -> 3
    spec = "2<-25% 9<3"
    assert mm(spec, 1) == 1
    assert mm(spec, 2) == 2
    assert mm(spec, 4) == 3
    assert mm(spec, 9) == 7           # 9 - floor(2.25)
    assert mm(spec, 10) == 3
    # clamping
    assert mm("8", 4) == 4
    assert mm("-8", 4) == 0


# ------------------------------------------------ SimpleQueryParser

def test_simple_parse_shapes():
    from engine.queryparser import simple_parse

    n = simple_parse("spark")
    assert isinstance(n, TermQ) and n.text == "spark"
    # whitespace = default OR
    n = simple_parse("a b c")
    assert isinstance(n, BoolQ)
    assert [o for o, _ in n.clauses] == [SHOULD, SHOULD, SHOULD]
    # + AND binds tighter than | OR:  a | b + c  ==  a OR (b AND c)
    n = simple_parse("a | b + c")
    assert [o for o, _ in n.clauses] == [SHOULD, SHOULD]
    sub = n.clauses[1][1]
    assert isinstance(sub, BoolQ)
    assert [o for o, _ in sub.clauses] == [MUST, MUST]
    # NOT binds tightest; folds as MUST_NOT into the enclosing node
    n = simple_parse("a + -b")
    assert [o for o, _ in n.clauses] == [MUST, MUST_NOT]
    n = simple_parse("a -b")
    assert (SHOULD, TermQ("a")) == n.clauses[0]
    assert n.clauses[1][0] == MUST_NOT
    # trailing * prefix, ~N fuzzy, phrase slop
    assert isinstance(simple_parse("wi*"), WildQ)
    f = simple_parse("quey~1")
    assert isinstance(f, FuzzyQ) and f.max_edits == 1
    assert simple_parse("quey~").max_edits == 2
    p = simple_parse('"a b"~3')
    assert isinstance(p, PhraseQ) and p.slop == 3
    # parens + default AND
    n = simple_parse("(a | b) c", default_op="AND")
    assert [o for o, _ in n.clauses] == [MUST, MUST]
    assert isinstance(n.clauses[0][1], BoolQ)


def test_simple_parse_never_raises():
    from engine.queryparser import simple_parse

    # the SimpleQueryParser contract: malformed input degrades, the
    # parser NEVER throws (upstream javadoc: "will never throw an
    # exception")
    for junk in ["", '"open phrase', "(a b", "a)", ")(", "+", "-",
                 "|", "a + | b", "---", "(((", '"""', "~", "^", "\\"]:
        simple_parse(junk)           # must not raise
    # unterminated phrase: rest of string is the phrase body
    p = simple_parse('"part filter')
    assert isinstance(p, PhraseQ) and p.text == "part filter"
    # unbalanced '(' closes at EOF
    n = simple_parse("(a b")
    assert isinstance(n, BoolQ) and len(n.clauses) == 2
    # escape makes operator chars literal
    t = simple_parse(r"a\+b")
    assert isinstance(t, TermQ) and t.text == "a+b"


def test_simple_parsed_equivalences(reader):
    from engine.queryparser import simple_parsed_topk

    ts = _terms(reader, "running connection index")
    # OR chain == brute disjunction
    _same(simple_parsed_topk(reader, " | ".join(ts), k=15),
          reader.brute_force_topk(" ".join(ts), 15))
    # whitespace default OR == the same
    _same(simple_parsed_topk(reader, " ".join(ts), k=15),
          reader.brute_force_topk(" ".join(ts), 15))
    # + chain == conjunction
    _same(simple_parsed_topk(reader, f"{ts[0]} + {ts[1]}", k=15),
          reader.boolean_topk(must=ts[:2], k=15))
    # default AND == conjunction
    _same(simple_parsed_topk(reader, f"{ts[0]} {ts[1]}",
                             k=15, default_op="AND"),
          reader.boolean_topk(must=ts[:2], k=15))
    # negation
    _same(simple_parsed_topk(reader, f"{ts[0]} {ts[1]} -{ts[2]}", k=15),
          reader.boolean_topk(should=ts[:2], must_not=[ts[2]], k=15))
    # prefix + fuzzy leaves match the classic parser's scoring rewrite
    _same(simple_parsed_topk(reader, "ze*", k=10),
          reader.wildcard_topk("ze*", 10))
    _same(simple_parsed_topk(reader, "zephr~1", k=10),
          reader.fuzzy_topk("zephr", k=10, max_edits=1))
    # pure negation matches nothing
    assert simple_parsed_topk(reader, f"-{ts[0]}", k=5).num_rows == 0


def test_simple_parser_fuzz_never_raises_anywhere(ray_session,
                                                  smoke_index):
    import numpy as np

    from engine.query import IndexReader
    from engine.queryparser import simple_parsed_topk

    idx, _, _ = smoke_index
    r = IndexReader(idx)
    rng = np.random.default_rng(23)
    atoms = ["zephyr", "quark", "the", "+", "-", "|", "(", ")", '"',
             "~", "~2", "*", "\\", " ", "run*", "fu~1"]
    for i in range(300):
        q = "".join(rng.choice(atoms, size=rng.integers(1, 12)))
        op = "AND" if i % 2 else "OR"
        # the WHOLE path (parse + evaluate) must never raise
        simple_parsed_topk(r, q, k=3, default_op=op)


# ------------------------------------------------ surround parser

def test_surround_parse_shapes():
    from engine.queryparser import SpanNearQ, surround_parse

    n = surround_parse("3W(a, b)")
    assert isinstance(n, SpanNearQ)
    assert n.args == ["a", "b"] and n.dist == 3 and n.ordered
    n = surround_parse("5N(a, b)")
    assert not n.ordered and n.dist == 5
    # bare W = distance 1; infix form; case-insensitive
    assert surround_parse("W(a, b)").dist == 1
    i = surround_parse("a 2w b")
    assert isinstance(i, SpanNearQ) and i.dist == 2 and i.ordered
    # n-ary AND stays flat; NOT nests
    b = surround_parse("a AND b AND c")
    assert [o for o, _ in b.clauses] == [MUST, MUST, MUST]
    b = surround_parse("a NOT b")
    assert [o for o, _ in b.clauses] == [MUST, MUST_NOT]
    # distance op composes under booleans
    b = surround_parse("3W(sp*, merge) AND window")
    assert [o for o, _ in b.clauses] == [MUST, MUST]
    assert isinstance(b.clauses[0][1], SpanNearQ)
    # malformed input raises QueryParseError (surround is strict,
    # unlike the simple parser)
    import pytest as _pt
    for bad in ["3W(a)", "W(a,", "a AND", "(a b", "a )", "3W(a, (b))"]:
        with _pt.raises(QueryParseError):
            surround_parse(bad)


def test_surround_matches_span_machinery(reader):
    """nW(x, y) ≡ ordered span_near_or; nN ≡ unordered pair matcher;
    boolean composition matches the evaluator's MUST law."""
    vocab = reader.vocabulary()
    pre = sorted(t for t in vocab if t.startswith("ze"))
    if pre:
        got = reader.surround_topk("3W(ze*, quark)", k=10)
        want = reader.span_near_or_topk([pre, ["quark"]], slop=2, k=10)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()
    got = reader.surround_topk("4N(zephyr, quark)", k=10)
    want = reader.span_near_unordered_topk("zephyr", "quark",
                                           slop=3, k=10)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()
