"""ComplexPhraseQueryParser analog — phrases with embedded multi-term
elements (lucene/queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java:61).

A quoted phrase whose elements may be wildcards (``val*``, ``v?l``), fuzzy
terms (``jonathon~1``) or alternative groups (``(scan table)``) rewrites to
a SpanNearQuery over one span clause per position (ComplexPhraseQuery
.rewrite:334 ``new SpanNearQuery(allSpanClauses, slopFactor, inOrder)``):
plain terms become SpanTermQuery, multi-term elements expand against the
live term dictionary into a SpanOrQuery, groups union their alternatives.
The slop factor is used directly as the span slop, and ``in_order``
mirrors setInOrder (:74)."""

from __future__ import annotations

import re

from lucene_ray.search.query import (
    FuzzyQuery,
    Query,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    WildcardQuery,
)

_ELEM_RE = re.compile(r"\(([^)]*)\)|(\S+)")
_FUZZY_RE = re.compile(r"^(?P<t>[^~]+)~(?P<n>\d)?$")


class ComplexPhraseParseError(ValueError):
    pass


def _element_spans(tok: str, expand) -> Query:
    """One phrase position -> span clause."""
    m = _FUZZY_RE.match(tok)
    if m:
        n = int(m.group("n")) if m.group("n") else 2
        terms = expand(FuzzyQuery(m.group("t").lower(), max_edits=n))
        return _span_or(terms)
    if "*" in tok or "?" in tok:
        return _span_or(expand(WildcardQuery(tok.lower())))
    return SpanTermQuery(tok.lower())


def _span_or(terms) -> Query:
    terms = list(terms)
    if len(terms) == 1:
        return SpanTermQuery(terms[0])
    # empty expansion -> a clause that can never match (keeps AND semantics)
    return SpanOrQuery([SpanTermQuery(t) for t in terms] or
                       [SpanTermQuery("\0_no_match_\0")])


def complex_phrase_query(content: str, slop: int = 0, in_order: bool = True,
                         expand=None) -> Query:
    """Parse the CONTENTS of a complex phrase (the text between the quotes)
    into the rewritten span query. ``expand(multi_term_query) -> [terms]``
    resolves wildcard/fuzzy elements (pass reader.expand_multi_term)."""
    if expand is None:
        expand = lambda q: []
    clauses: list[Query] = []
    for grp, single in _ELEM_RE.findall(content):
        if single:
            clauses.append(_element_spans(single, expand))
        else:
            alts = grp.split()
            if not alts:
                raise ComplexPhraseParseError("empty group in phrase")
            subs = [_element_spans(t, expand) for t in alts]
            flat: list[Query] = []
            for s in subs:
                flat.extend(s.clauses if isinstance(s, SpanOrQuery) else [s])
            clauses.append(SpanOrQuery(flat) if len(flat) > 1 else flat[0])
    if not clauses:
        raise ComplexPhraseParseError("empty phrase")
    if len(clauses) == 1:
        return clauses[0]
    return SpanNearQuery(clauses, slop=slop, in_order=in_order)
