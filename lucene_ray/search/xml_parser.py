"""XML query syntax — the CoreParser analog
(lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:60-103, which registers one builder per element name).

Supported elements (the CoreParser core set, mapped onto the engine AST):

- ``<TermQuery fieldName="f" boost="2">text</TermQuery>``
  (TermQueryBuilder) — the text is ANALYZED with the shared analyzer when
  it targets an analyzed field; fieldName omitted = the default field.
- ``<TermsQuery fieldName="f">a b c</TermsQuery>`` (TermsQueryBuilder) —
  whitespace-split terms OR together.
- ``<BooleanQuery>`` with ``<Clause occurs="must|should|mustNot|filter">``
  children (BooleanQueryBuilder).
- ``<UserQuery>classic syntax</UserQuery>`` (UserInputQueryBuilder —
  hands off to the classic parser).
- ``<MatchAllDocsQuery/>``
- ``<ConstantScoreQuery boost="b">...</ConstantScoreQuery>``
- ``<DisjunctionMaxQuery tieBreaker="0.3">...</DisjunctionMaxQuery>``
- ``<RangeQuery fieldName="f" lowerTerm="a" upperTerm="b"
     includeLower="true" includeUpper="false"/>`` (lexicographic)
- ``<PointRangeQuery fieldName="col" lowerTerm="1" upperTerm="9"/>``
  (numeric doc-values range)
- Spans: ``<SpanTerm>``, ``<SpanNear slop="2" inOrder="true">``,
  ``<SpanOr>``, ``<SpanNot>`` (with ``<Include>``/``<Exclude>``),
  ``<SpanFirst end="3">``.

Unknown elements raise ValueError (CoreParser's unknown-element error).
Parsing uses the stdlib ElementTree — queries are trusted engine inputs,
exactly as CoreParser treats them.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_ray.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllQuery,
    NumericRangeQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)


def _boost(el) -> float:
    return float(el.get("boost", 1.0))


def _field_term(el, term: str, default_field: str | None) -> str:
    f = el.get("fieldName")
    return term if (not f or f == default_field) else f"{f}:{term}"


def parse_xml_query(xml: str, default_field: str = "content",
                    analyzer=None, text_fields: tuple = ()) -> Query:
    """Parse one XML query document into the engine AST.

    Behavior note (intentional divergence from the reference's
    TermQueryBuilder, which uses the raw element text verbatim with no
    analysis — queryparser/xml/builders/TermQueryBuilder.java): this parser
    ANALYZES TermQuery/SpanTerm text and raises ``ValueError`` when it
    yields more than one token, instead of silently using the first token
    (pre-round-4 behavior) or passing unanalyzed raw text. Multi-token
    input should use TermsQuery or UserQuery."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    tk = analyzer or CodeTokenizer()

    def build(el) -> Query:
        tag = el.tag
        if tag == "TermQuery":
            toks = tk((el.text or "").strip())
            if not toks:
                raise ValueError("empty TermQuery")
            if len(toks) > 1:
                raise ValueError(
                    f"TermQuery text analyzes to {len(toks)} tokens "
                    f"({toks!r}); use TermsQuery or UserQuery for "
                    "multi-token input")
            return TermQuery(_field_term(el, toks[0], default_field),
                             boost=_boost(el))
        if tag == "TermsQuery":
            toks = tk((el.text or "").strip())
            terms = [TermQuery(_field_term(el, t, default_field)) for t in toks]
            if not terms:
                raise ValueError("empty TermsQuery")
            if len(terms) == 1:
                return terms[0]
            return BooleanQuery(should=terms)
        if tag == "BooleanQuery":
            must, should, must_not, filt = [], [], [], []
            for c in el:
                if c.tag != "Clause":
                    raise ValueError(f"BooleanQuery child must be Clause, got {c.tag}")
                occ = c.get("occurs", "should")
                sub = build(c[0])
                {"must": must, "should": should, "mustNot": must_not,
                 "filter": filt}[occ].append(sub)
            return BooleanQuery(
                must=must, should=should, must_not=must_not, filter=filt,
                minimum_should_match=int(el.get("minimumNumberShouldMatch", 0)),
            )
        if tag == "UserQuery":
            return parse_query((el.text or "").strip(), analyzer=analyzer,
                               text_fields=text_fields)
        if tag == "MatchAllDocsQuery":
            return MatchAllQuery()
        if tag == "ConstantScoreQuery":
            return ConstantScoreQuery(build(el[0]), boost=_boost(el))
        if tag == "DisjunctionMaxQuery":
            return DisMaxQuery([build(c) for c in el],
                               tie_breaker=float(el.get("tieBreaker", 0.0)),
                               boost=_boost(el))
        if tag == "RangeQuery":
            lo, hi = el.get("lowerTerm"), el.get("upperTerm")
            return TermRangeQuery(
                lo, hi,
                include_lower=el.get("includeLower", "true") == "true",
                include_upper=el.get("includeUpper", "true") == "true",
                boost=_boost(el),
            )
        if tag == "PointRangeQuery":
            lo, hi = el.get("lowerTerm"), el.get("upperTerm")
            return NumericRangeQuery(
                el.get("fieldName"),
                int(lo) if lo is not None else None,
                int(hi) if hi is not None else None,
                boost=_boost(el),
            )
        if tag == "SpanTerm":
            toks = tk((el.text or "").strip())
            if not toks:
                raise ValueError("empty SpanTerm (text analyzed away)")
            if len(toks) > 1:
                raise ValueError(
                    f"SpanTerm text analyzes to {len(toks)} tokens "
                    f"({toks!r}); wrap each in its own SpanTerm")
            return SpanTermQuery(toks[0], boost=_boost(el))
        if tag == "SpanNear":
            return SpanNearQuery(
                [build(c) for c in el],
                slop=int(el.get("slop", 0)),
                in_order=el.get("inOrder", "true") == "true",
                boost=_boost(el),
            )
        if tag == "SpanOr":
            return SpanOrQuery([build(c) for c in el], boost=_boost(el))
        if tag == "SpanNot":
            inc = exc = None
            for c in el:
                if c.tag == "Include":
                    inc = build(c[0])
                elif c.tag == "Exclude":
                    exc = build(c[0])
            if inc is None or exc is None:
                raise ValueError("SpanNot needs Include and Exclude")
            return SpanNotQuery(inc, exc, boost=_boost(el))
        if tag == "SpanFirst":
            return SpanFirstQuery(build(el[0]), end=int(el.get("end", 1)),
                                  boost=_boost(el))
        raise ValueError(f"unknown XML query element: {tag!r}")

    return build(ET.fromstring(xml))
