"""Distributed serving parity: the QueryShard actor-pool path must return
exactly what the single-process Searcher returns (same merge tie-break)."""

import numpy as np

from lucene_ray.fixtures import query_to_ast, reference_queries
from lucene_ray.index.reader import IndexReader
from lucene_ray.pipelines.bulk_search import ShardPool, bulk_search
from lucene_ray.search.searcher import Searcher


def test_bulk_search_matches_inline(ray_session, built_index):
    index_dir, _, _ = built_index
    searcher = Searcher(IndexReader(index_dir))
    battery = [(spec["qid"], query_to_ast(spec)) for spec in reference_queries()]
    dist = bulk_search(index_dir, battery, k=10, total_hits_threshold=None,
                       concurrency=2)
    for qid, q in battery:
        inline = searcher.search(q, 10)
        got = dist[qid]
        np.testing.assert_array_equal(got.doc_ids, inline.doc_ids, err_msg=f"q{qid}")
        np.testing.assert_array_equal(got.scores, inline.scores, err_msg=f"q{qid}")
        assert got.total_hits == inline.total_hits, f"q{qid}"


def test_shard_pool_search_matches_inline(ray_session, built_index):
    """The long-lived actor-pool path (what the contract pipelines use)
    must be rank+score identical to the driver Searcher."""
    index_dir, _, _ = built_index
    searcher = Searcher(IndexReader(index_dir))
    battery = [(spec["qid"], query_to_ast(spec)) for spec in reference_queries()]
    pool = ShardPool(index_dir, concurrency=2)
    dist = pool.search(battery, k=10, total_hits_threshold=None)
    for qid, q in battery:
        inline = searcher.search(q, 10)
        got = dist[qid]
        np.testing.assert_array_equal(got.doc_ids, inline.doc_ids, err_msg=f"q{qid}")
        np.testing.assert_array_equal(got.scores, inline.scores, err_msg=f"q{qid}")
        assert got.total_hits == inline.total_hits, f"q{qid}"


def test_shard_pool_match_equals_exhaustive(ray_session, built_index):
    index_dir, _, _ = built_index
    searcher = Searcher(IndexReader(index_dir))
    battery = [(spec["qid"], query_to_ast(spec)) for spec in reference_queries()[:6]]
    pool = ShardPool(index_dir, concurrency=2)
    got = pool.match(battery)
    for qid, q in battery:
        td = searcher.search(q, 10**9, total_hits_threshold=None)
        np.testing.assert_array_equal(
            got[qid], np.sort(td.doc_ids), err_msg=f"q{qid}"
        )
