"""XML query syntax (queryparser/xml/CoreParser.java element set)."""

import numpy as np
import pytest

from lucene_ray.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllQuery,
    NumericRangeQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_ray.search.xml_parser import parse_xml_query


def test_term_and_terms():
    assert parse_xml_query("<TermQuery>Hello</TermQuery>") == TermQuery("hello")
    assert parse_xml_query(
        '<TermQuery fieldName="lang" boost="2.5">py</TermQuery>'
    ) == TermQuery("lang:py", boost=2.5)
    q = parse_xml_query("<TermsQuery>a b c</TermsQuery>")
    assert q == BooleanQuery(should=[TermQuery("a"), TermQuery("b"),
                                     TermQuery("c")])


def test_boolean_clauses():
    q = parse_xml_query(
        '<BooleanQuery minimumNumberShouldMatch="1">'
        '<Clause occurs="must"><TermQuery>x</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>y</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>z</TermQuery></Clause>'
        '<Clause occurs="filter"><MatchAllDocsQuery/></Clause>'
        "</BooleanQuery>")
    assert q.must == (TermQuery("x"),)
    assert q.should == (TermQuery("y"),)
    assert q.must_not == (TermQuery("z"),)
    assert q.filter == (MatchAllQuery(),)
    assert q.minimum_should_match == 1


def test_wrappers_and_ranges():
    q = parse_xml_query(
        '<ConstantScoreQuery boost="3"><TermQuery>t</TermQuery>'
        "</ConstantScoreQuery>")
    assert q == ConstantScoreQuery(TermQuery("t"), boost=3.0)
    q = parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.4">'
        "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
        "</DisjunctionMaxQuery>")
    assert isinstance(q, DisMaxQuery) and q.tie_breaker == 0.4
    q = parse_xml_query(
        '<RangeQuery lowerTerm="aa" upperTerm="bb" includeUpper="false"/>')
    assert q == TermRangeQuery("aa", "bb", include_lower=True,
                               include_upper=False)
    q = parse_xml_query(
        '<PointRangeQuery fieldName="n" lowerTerm="3" upperTerm="9"/>')
    assert q == NumericRangeQuery("n", 3, 9)


def test_spans_and_user_query():
    q = parse_xml_query(
        '<SpanNear slop="2" inOrder="false">'
        "<SpanTerm>a</SpanTerm><SpanOr><SpanTerm>b</SpanTerm>"
        "<SpanTerm>c</SpanTerm></SpanOr></SpanNear>")
    assert isinstance(q, SpanNearQuery) and not q.in_order and q.slop == 2
    assert isinstance(q.clauses[1], SpanOrQuery)
    q = parse_xml_query(
        "<SpanNot><Include><SpanTerm>a</SpanTerm></Include>"
        "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>")
    assert q == SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("b"))
    q = parse_xml_query('<SpanFirst end="3"><SpanTerm>a</SpanTerm></SpanFirst>')
    assert q == SpanFirstQuery(SpanTermQuery("a"), end=3)
    q = parse_xml_query("<UserQuery>x AND y</UserQuery>")
    assert isinstance(q, BooleanQuery) and q.must == (TermQuery("x"),
                                                      TermQuery("y"))


def test_unknown_element_raises():
    with pytest.raises(ValueError):
        parse_xml_query("<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")


def test_xml_end_to_end_equals_ast(ray_session, built_index):
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.searcher import Searcher

    index_dir, _m, _c = built_index
    s = Searcher(IndexReader(index_dir))
    xml = ('<BooleanQuery>'
           '<Clause occurs="must"><TermQuery>import</TermQuery></Clause>'
           '<Clause occurs="mustNot"><TermQuery>class</TermQuery></Clause>'
           "</BooleanQuery>")
    a = s.search(parse_xml_query(xml), 20, total_hits_threshold=None)
    b = s.search(BooleanQuery(must=[TermQuery("import")],
                              must_not=[TermQuery("class")]), 20,
                 total_hits_threshold=None)
    assert a.total_hits == b.total_hits
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
