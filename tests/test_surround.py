"""Surround parser (queryparser/surround dialect) — AST shape + behavior
vs the span machinery on the built fixture index."""

import numpy as np
import pytest

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_ray.search.searcher import Searcher
from lucene_ray.search.surround_parser import SurroundParseError, parse_surround


def test_infix_w_maps_to_ordered_slop():
    q = parse_surround("a 3W b")
    assert isinstance(q, SpanNearQuery)
    assert q.slop == 2 and q.in_order  # DistanceQuery.java:96 (dist - 1)
    assert [c.term for c in q.clauses] == ["a", "b"]


def test_prefix_n_default_distance():
    q = parse_surround("N(a, b, c)")
    assert isinstance(q, SpanNearQuery)
    assert q.slop == 0 and not q.in_order
    assert len(q.clauses) == 3


def test_case_insensitive_and_nested():
    q = parse_surround("2n(a, w(b, c))")
    assert isinstance(q, SpanNearQuery) and q.slop == 1 and not q.in_order
    inner = q.clauses[1]
    assert isinstance(inner, SpanNearQuery) and inner.slop == 0 and inner.in_order


def test_or_inside_distance_is_span_or():
    q = parse_surround("3W(a, or(b, c))")
    assert isinstance(q.clauses[1], SpanOrQuery)
    assert {c.term for c in q.clauses[1].clauses} == {"b", "c"}


def test_top_level_booleans_scored():
    q = parse_surround("and(a, or(b, c))")
    assert isinstance(q, BooleanQuery)
    assert isinstance(q.must[0], TermQuery)
    assert isinstance(q.must[1], BooleanQuery)
    n = parse_surround("a NOT b")
    assert isinstance(n, BooleanQuery) and len(n.must_not) == 1


def test_truncation_rules():
    q = parse_surround("tab* AND other")
    assert isinstance(q.must[0], WildcardQuery)
    with pytest.raises(SurroundParseError):
        parse_surround("ab*")  # MINIMUM_PREFIX_LENGTH = 3
    with pytest.raises(SurroundParseError):
        parse_surround("10X(a, b)")  # unknown operator in prefix position


def test_mixed_operators_require_parens():
    with pytest.raises(SurroundParseError):
        parse_surround("a AND b OR c")
    # but one operator kind chains freely
    q = parse_surround("a AND b AND c")
    assert len(q.must) == 3


def test_boost_wraps_constant_score():
    q = parse_surround("w(a, b)^2")
    # boost on a span result folds via ConstantScoreQuery at lowering
    assert isinstance(q, (ConstantScoreQuery, SpanNearQuery))


def test_distance_range_enforced():
    with pytest.raises(SurroundParseError):
        parse_surround("1W(a, b)")  # numeric prefix must be 2-99 (W alone = 1)


def test_surround_vs_span_machinery(built_index):
    """'x 2W y' must equal SpanNearQuery([x, y], slop=1, ordered) hits."""
    index_dir, _, _ = built_index
    s = Searcher(IndexReader(index_dir))
    via_parser = s.search(parse_surround("import 2W return"), 10**6)
    direct = s.search(
        SpanNearQuery([SpanTermQuery("import"), SpanTermQuery("return")],
                      slop=1, in_order=True), 10**6)
    np.testing.assert_array_equal(np.sort(via_parser.doc_ids),
                                  np.sort(direct.doc_ids))
    assert via_parser.total_hits > 0


def test_surround_truncation_expands_against_dictionary(built_index):
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    s = Searcher(reader)
    q = parse_surround("w(imp*, return)", expand=reader.expand_multi_term)
    td = s.search(q, 10**6)
    direct = s.search(
        SpanNearQuery([SpanTermQuery("import"), SpanTermQuery("return")],
                      slop=0, in_order=True), 10**6)
    # imp* expands to at least 'import'; hits must be a superset
    assert set(map(int, direct.doc_ids)) <= set(map(int, td.doc_ids))
