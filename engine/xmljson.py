"""Structured query syntaxes: Lucene XML CoreParser + Solr JSON DSL.

Two alternate front-ends over the shared Query AST in
``engine/queryparser.py`` — both produce the SAME node types
(``TermQ`` / ``PhraseQ`` / ``BoolQ`` / ``RangeQ`` / ``SpanNearQ`` …)
and evaluate through the same vectorized ``Evaluator``, so scoring
semantics (f32 clause weights, f64 node sums, one f32 cast per node)
are identical across the classic string parser, the XML parser and
the JSON DSL.

XML CoreParser (upstream ``L/queryparser/xml/CoreParser.java`` and
its builders ``TermQueryBuilder`` / ``TermsQueryBuilder`` /
``BooleanQueryBuilder`` / ``RangeQueryBuilder`` /
``SpanNearBuilder`` / ``UserInputQueryBuilder`` [U]). Supported
element working set:

- ``<BooleanQuery>`` with ``<Clause occurs="must|should|mustnot|
  filter">`` children (occurs default ``should``, as upstream)
- ``<TermQuery fieldName=.. boost=..>text</TermQuery>``
- ``<TermsQuery>`` — analyzer-split text, one SHOULD clause per term
  (upstream builds a BooleanQuery of SHOULD TermQuerys)
- ``<PhraseQuery slop=..>`` — positional match
- ``<RangeQuery lowerTerm=.. upperTerm=.. includeLower=..
  includeUpper=..>`` (term range)
- ``<SpanNear slop=.. inOrder=..>`` with ``<SpanTerm>`` children
- ``<UserQuery>`` — delegates to the classic string parser
  (upstream ``UserInputQueryBuilder`` wraps ``QueryParser``)
- ``<MatchAllDocsQuery/>`` (inside filter/mustnot contexts)

Solr JSON Query DSL (upstream Solr ``JsonQueryConverter`` / the
``{"query": ...}`` request API [U]). Supported node forms:

- a bare string — classic-parser syntax
- ``{"bool": {"must": [...], "should": [...], "must_not": [...],
  "filter": [...]}}`` — nested boolean; ``filter`` clauses constrain
  without scoring (``Occur.FILTER``)
- ``{"lucene": {"df": field, "query": str}}`` — classic parse
- ``{"field": {"f": field, "query": str}}`` — term, or positional
  phrase when the analyzed text has >1 token (upstream
  ``FieldQParserPlugin``)
- any node dict may carry ``"boost"``

Untrusted input discipline: both parsers only instantiate AST
dataclasses — no eval, no dynamic imports; XML uses stdlib
``xml.etree`` with DTD/entity expansion unavailable by construction
(``fromstring`` on the plain parser).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

from engine.queryparser import (
    FILTER, MUST, MUST_NOT, SHOULD,
    BoolQ, PhraseQ, QueryParseError, RangeQ, SpanNearQ, TermQ,
    parse as classic_parse,
)

_OCCURS = {"must": MUST, "should": SHOULD, "mustnot": MUST_NOT,
           "must_not": MUST_NOT, "filter": FILTER}


# ------------------------------------------------- XML CoreParser

def xml_parse(xml_text: str, default_field: str | None = None):
    """Parse a CoreParser XML query document into the shared AST."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise QueryParseError(f"bad query XML: {e}") from e
    return _xml_node(root, default_field)


def _xml_node(el: ET.Element, df: str | None):
    tag = el.tag
    boost = float(el.get("boost", "1.0"))
    fld = el.get("fieldName", df)
    text = (el.text or "").strip()
    if tag == "TermQuery":
        return TermQ(text, fld, boost)
    if tag == "TermsQuery":
        # upstream TermsQueryBuilder: analyzer-split → SHOULD clauses
        node = BoolQ([(SHOULD, TermQ(w, fld)) for w in text.split()],
                     boost=boost)
        return node
    if tag == "PhraseQuery":
        return PhraseQ(text, int(el.get("slop", "0")), fld, boost)
    if tag == "RangeQuery":
        # boolean attributes match upstream's case-insensitive parse
        # ('True' must not silently flip a bound to exclusive)
        return RangeQ(el.get("lowerTerm", ""), el.get("upperTerm", ""),
                      el.get("includeLower", "true").lower() == "true",
                      el.get("includeUpper", "true").lower() == "true",
                      fld, boost)
    if tag == "SpanNear":
        args = [(c.text or "").strip() for c in el
                if c.tag == "SpanTerm"]
        return SpanNearQ(args, dist=int(el.get("slop", "0")) + 1,
                         ordered=el.get("inOrder",
                                        "true").lower() == "true",
                         field=fld, boost=boost)
    if tag == "UserQuery":
        node = classic_parse(text, df)
        if boost != 1.0:
            # upstream wraps in BoostQuery: factors COMPOSE — the
            # parsed query's own ^boost must survive ('foo^3' under
            # boost=2 scores ×6, not ×2)
            node.boost *= boost
        return node
    if tag == "BooleanQuery":
        clauses = []
        for cl in el:
            if cl.tag != "Clause":
                raise QueryParseError(
                    f"BooleanQuery child must be Clause, got {cl.tag}")
            # upstream CoreParser documents camelCase 'mustNot' and
            # matches occurs case-insensitively
            occ = _OCCURS.get(cl.get("occurs", "should").lower())
            if occ is None:
                raise QueryParseError(
                    f"bad occurs {cl.get('occurs')!r}")
            kids = list(cl)
            if len(kids) != 1:
                raise QueryParseError("Clause needs exactly one query")
            clauses.append((occ, _xml_node(kids[0], fld)))
        return BoolQ(clauses, boost=boost,
                     min_should_match=int(
                         el.get("minimumNumberShouldMatch", "0")))
    raise QueryParseError(f"unsupported XML query element {tag!r}")


# ------------------------------------------------- Solr JSON DSL

def json_parse(dsl, default_field: str | None = None):
    """Parse a JSON Query DSL node (str, dict, or a full request
    ``{"query": ...}``) into the shared AST."""
    if isinstance(dsl, str):
        s = dsl.strip()
        if s.startswith("{"):
            dsl = json.loads(s)
        else:
            return classic_parse(s, default_field)
    if not isinstance(dsl, dict):
        raise QueryParseError(f"bad JSON DSL node: {dsl!r}")
    if "query" in dsl and not ("bool" in dsl or "lucene" in dsl
                               or "field" in dsl):
        return json_parse(dsl["query"], default_field)
    boost = float(dsl.get("boost", 1.0))
    if "bool" in dsl:
        b = dsl["bool"]
        clauses = []
        for key, occ in (("must", MUST), ("should", SHOULD),
                         ("must_not", MUST_NOT), ("filter", FILTER)):
            sub = b.get(key, [])
            if not isinstance(sub, list):
                sub = [sub]
            clauses += [(occ, json_parse(c, default_field))
                        for c in sub]
        return BoolQ(clauses, boost=boost,
                     min_should_match=int(b.get("mm", 0)))
    if "lucene" in dsl:
        p = dsl["lucene"]
        node = classic_parse(p["query"], p.get("df", default_field),
                             default_op=p.get("q.op", "OR"))
        if boost != 1.0:
            node.boost *= boost     # compose with the query's own ^boost
        return node
    if "field" in dsl:
        p = dsl["field"]
        fld = p.get("f", default_field)
        words = str(p["query"]).split()
        if len(words) > 1:
            return PhraseQ(p["query"], int(p.get("slop", 0)),
                           fld, boost)
        return TermQ(p["query"], fld, boost)
    raise QueryParseError(
        f"unsupported JSON DSL query type: {sorted(dsl)!r}")
