"""DecodedPostingsCache: bounded eviction + search-identity under reuse."""

import numpy as np
import pytest

from lucene_ray.search.executor import DecodedPostingsCache, TermPostings


def _tp(n):
    return TermPostings(docs=np.arange(n, dtype=np.int64),
                        freqs=np.ones(n, dtype=np.int64),
                        pos_chunks=None)


def test_entry_bound_evicts_oldest():
    c = DecodedPostingsCache(max_entries=3, max_bytes=1 << 30)
    for i in range(5):
        c.put((0, f"t{i}"), _tp(10))
    assert c.get((0, "t0")) is None and c.get((0, "t1")) is None
    assert c.get((0, "t4")) is not None
    assert len(c._d) == 3


def test_byte_bound_evicts():
    c = DecodedPostingsCache(max_entries=100, max_bytes=10 * 16 * 2)
    c.put((0, "a"), _tp(10))
    c.put((0, "b"), _tp(10))
    c.put((0, "c"), _tp(10))  # exceeds 2x entries worth of bytes
    assert c.get((0, "a")) is None
    assert c.get((0, "c")) is not None
    assert c._bytes <= 10 * 16 * 2


def test_put_is_idempotent():
    c = DecodedPostingsCache()
    tp = _tp(4)
    c.put((1, "x"), tp)
    c.put((1, "x"), tp)
    assert c._bytes == tp.docs.nbytes + tp.freqs.nbytes


def test_searcher_reuse_identical_results(built_index):
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    warm = Searcher(reader)
    queries = [
        TermQuery("import"),
        PhraseQuery(("new", "string")),
        BooleanQuery(should=(TermQuery("import"), TermQuery("return"))),
    ]
    for q in queries:  # fill the shared cache
        warm.search(q, 10)
    for q in queries:
        a = warm.search(q, 10)  # served from cached decodes
        b = Searcher(IndexReader(index_dir)).search(q, 10)  # cold
        assert np.array_equal(a.doc_ids, b.doc_ids)
        assert np.array_equal(a.scores, b.scores)
        assert a.total_hits == b.total_hits
