"""ComplexPhraseQueryParser analog — embedded wildcards/fuzzy/groups."""

import numpy as np
import pytest

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.complex_phrase import (
    ComplexPhraseParseError,
    complex_phrase_query,
)
from lucene_ray.search.query import (
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_ray.search.searcher import Searcher


def test_plain_terms_become_span_near():
    q = complex_phrase_query("a b c", slop=2, in_order=True)
    assert isinstance(q, SpanNearQuery) and q.slop == 2 and q.in_order
    assert all(isinstance(c, SpanTermQuery) for c in q.clauses)


def test_group_becomes_span_or():
    q = complex_phrase_query("(a b) c")
    assert isinstance(q.clauses[0], SpanOrQuery)
    assert {c.term for c in q.clauses[0].clauses} == {"a", "b"}


def test_wildcard_and_fuzzy_expand():
    exp = {"val*": ["value", "values"], "jon~1": ["jon", "join"]}

    def expand(node):
        from lucene_ray.search.query import FuzzyQuery, WildcardQuery

        if isinstance(node, WildcardQuery):
            return exp["val*"]
        if isinstance(node, FuzzyQuery):
            assert node.max_edits == 1
            return exp["jon~1"]
        raise AssertionError(node)

    q = complex_phrase_query("jon~1 val*", expand=expand)
    assert {c.term for c in q.clauses[0].clauses} == {"jon", "join"}
    assert {c.term for c in q.clauses[1].clauses} == {"value", "values"}


def test_empty_phrase_and_group_raise():
    with pytest.raises(ComplexPhraseParseError):
        complex_phrase_query("")
    with pytest.raises(ComplexPhraseParseError):
        complex_phrase_query("a () b")


def test_unordered_mode():
    q = complex_phrase_query("a b", slop=1, in_order=False)
    assert not q.in_order


def test_complex_phrase_vs_expanded_spans(built_index):
    """'imp* return' == SpanNear(SpanOr(expanded imp*), return)."""
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    s = Searcher(reader)
    q = complex_phrase_query("imp* return", slop=0, in_order=True,
                             expand=reader.expand_multi_term)
    got = s.search(q, 10**6)
    # manual: expansion must include 'import'; direct comparison on that term
    direct = s.search(
        SpanNearQuery([SpanTermQuery("import"), SpanTermQuery("return")],
                      slop=0, in_order=True), 10**6)
    assert set(map(int, direct.doc_ids)) <= set(map(int, got.doc_ids))
    assert got.total_hits >= direct.total_hits > 0
