"""Classic-parser syntax extensions: ^boost, ~fuzzy, [a TO b] ranges."""

import math

import numpy as np
import pytest

from lucene_ray.search.query import (
    FuzzyQuery,
    NumericRangeQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)


def test_boost_suffix():
    assert parse_query("import^2") == TermQuery("import", boost=2.0)
    assert parse_query("import^0.5") == TermQuery("import", boost=0.5)
    assert parse_query("uniq_1*^3") == PrefixQuery("uniq_1", boost=3.0)
    q = parse_query("lang:en^1.5")
    assert q == TermQuery("lang:en", boost=1.5)
    # a lone ^ with no valid float stays part of the term text path
    q = parse_query("a^b")
    assert isinstance(q, (TermQuery, PhraseQuery))


def test_fuzzy_suffix():
    assert parse_query("joib~1") == FuzzyQuery("joib", 1)
    assert parse_query("joib~") == FuzzyQuery("joib", 2)
    assert parse_query("joib~2^1.5") == FuzzyQuery("joib", 2, boost=1.5)
    # slop on phrases still wins over fuzzy parsing
    q = parse_query('"import return"~2')
    assert isinstance(q, PhraseQuery) and q.slop == 2


def test_numeric_field_range():
    q = parse_query("n_chars:[200 TO 400]")
    assert q == NumericRangeQuery("n_chars", 200, 400)
    q = parse_query("n_chars:{200 TO 400}")
    assert q == NumericRangeQuery("n_chars", 201, 399)
    q = parse_query("n_chars:[* TO 400]")
    assert q == NumericRangeQuery("n_chars", None, 400)
    q = parse_query("value:{0.5 TO 2.5]")
    assert q.col == "value" and q.upper == 2.5
    assert q.lower == math.nextafter(0.5, math.inf)
    q = parse_query("n_chars:[200 TO 400]^2")
    assert q == NumericRangeQuery("n_chars", 200, 400, boost=2.0)


def test_bare_term_range():
    q = parse_query("[apple TO orange]")
    assert q == TermRangeQuery("apple", "orange", True, True)
    q = parse_query("{apple TO orange}")
    assert q == TermRangeQuery("apple", "orange", False, False)
    q = parse_query("[APPLE TO Orange]")  # endpoints lowercased
    assert q == TermRangeQuery("apple", "orange", True, True)


def test_range_in_boolean():
    q = parse_query("import AND n_chars:[200 TO 400]")
    assert TermQuery("import") in q.must
    assert NumericRangeQuery("n_chars", 200, 400) in q.must


@pytest.fixture(scope="module")
def searcher(built_index):
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.searcher import Searcher

    index_dir, _, _ = built_index
    return Searcher(IndexReader(index_dir))


def test_boost_changes_scores_identically_to_ast(searcher):
    plain = searcher.search(parse_query("import"), 10)
    boosted = searcher.search(parse_query("import^2"), 10)
    ast = searcher.search(TermQuery("import", boost=2.0), 10)
    assert np.array_equal(boosted.doc_ids, ast.doc_ids)
    assert np.array_equal(boosted.scores, ast.scores)
    assert np.array_equal(plain.doc_ids, boosted.doc_ids)
    assert not np.array_equal(plain.scores, boosted.scores)


def test_parsed_range_end_to_end(ray_session):
    from lucene_ray.pipelines.fulltext import documents_index, _all_matches, _orig_ids

    sf = "/root/testdata/sf0.001"
    reader = documents_index(sf)
    got = _orig_ids(sf, _all_matches(
        sf, parse_query("join AND n_chars:[200 TO 400]"), reader), reader)
    import duckdb

    want = duckdb.sql(
        f"WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text),"
        f" '[^a-z0-9_]+')) AS tok FROM read_parquet('{sf}/documents.parquet'))"
        f" SELECT DISTINCT t.doc_id FROM toks t JOIN read_parquet("
        f"'{sf}/documents.parquet') d USING (doc_id) WHERE t.tok = 'join'"
        f" AND d.n_chars BETWEEN 200 AND 400 ORDER BY doc_id"
    ).fetchall()
    assert got.column("doc_id").to_pylist() == [r[0] for r in want]
