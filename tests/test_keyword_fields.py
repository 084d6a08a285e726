"""Keyword fields (StringField analog): atomic field:value terms in the
shared postings, per-field dictionary namespaces, unchanged content-field
scoring."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.check import check_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import (
    BooleanQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    parse_query,
)
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=150, partitions_per_segment=2, chunk_size=64)


@pytest.fixture(scope="module")
def kw_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("kw")
    corpus = make_corpus(400, seed=33)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=100)
    plain = str(d / "plain")
    build_index(src, plain, IndexConfig(**CFG))
    kw = str(d / "kw")
    build_index(src, kw, IndexConfig(**CFG, keyword_cols=("lang",)))
    return corpus, plain, kw


def test_keyword_term_hits(kw_index):
    corpus, _, kw = kw_index
    s = Searcher(IndexReader(kw))
    langs = corpus.column("lang").to_pylist()
    for lang in ["py", "java"]:
        td = s.search(TermQuery(f"lang:{lang}"), 10**9, total_hits_threshold=None)
        assert td.total_hits == sum(1 for l in langs if l == lang)


def test_keyword_and_content_boolean(kw_index):
    corpus, _, kw = kw_index
    s = Searcher(IndexReader(kw))
    q = parse_query("lang:py AND import")
    td = s.search(q, 10**9, total_hits_threshold=None)
    langs = corpus.column("lang").to_pylist()
    texts = corpus.column("content").to_pylist()
    import re

    exp = sum(
        1 for l, t in zip(langs, texts)
        if l == "py" and "import" in re.split(r"[^a-z0-9_]+", t.lower())
    )
    assert td.total_hits == exp


def test_content_scoring_unchanged_by_keywords(kw_index):
    """Adding keyword fields must not move content-field BM25 scores
    (lengths/norms/collection stats exclude keyword terms)."""
    _, plain, kw = kw_index
    sp = Searcher(IndexReader(plain))
    sk = Searcher(IndexReader(kw))
    for term in ["import", "return", "def"]:
        a = sp.search(TermQuery(term), 10)
        b = sk.search(TermQuery(term), 10)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, term)
        np.testing.assert_array_equal(a.scores, b.scores, term)


def test_multiterm_expansion_scoped_to_content_field(kw_index):
    """Prefix/range scans over the DEFAULT field must not leak keyword
    terms ('lang:java' must not match prefix 'la' or range scans)."""
    _, plain, kw = kw_index
    sp = Searcher(IndexReader(plain))
    sk = Searcher(IndexReader(kw))
    for q in [PrefixQuery("la"), TermRangeQuery("import", "le"),
              PrefixQuery("j"), TermRangeQuery("a", "z")]:
        a = sp.search(q, 10**9, total_hits_threshold=None)
        b = sk.search(q, 10**9, total_hits_threshold=None)
        assert a.total_hits == b.total_hits, q
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, str(q))


def test_keyword_index_checkindex_clean(kw_index):
    _, _, kw = kw_index
    assert check_index(kw)["status"] == "OK"
