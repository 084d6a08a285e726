"""Deletes / upserts (live-docs tombstones) + compaction expunge.

Invariants:
- deleting docs filters them from every query path (exhaustive, pruned
  top-k, multiterm, phrase, match-all) WITHOUT moving surviving docs'
  scores (stats still include deleted docs until rewrite — Lucene NRT
  delete semantics);
- delete -> compact(expunge) returns identical results with smaller
  postings;
- upsert (delete-by-key + add) replaces documents under their key.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus, query_to_ast, reference_queries
from lucene_ray.index.build import (
    IndexConfig,
    build_index,
    compact_segments,
    delete_by_term,
    load_tombstones,
    upsert_documents,
)
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import BooleanQuery, MatchAllQuery, TermQuery
from lucene_ray.search.searcher import Searcher

CFG = dict(
    target_rows_per_partition=150,
    partitions_per_segment=2,
    chunk_size=64,
    hot_df_threshold=250,
    n_salts=2,
)


@pytest.fixture(scope="module")
def deleted_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("del")
    corpus = make_corpus(600, seed=42)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=150)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(**CFG))

    # snapshot results BEFORE any delete
    searcher = Searcher(IndexReader(idx))
    before = {}
    queries = [query_to_ast(s) for s in reference_queries()[:8]]
    for qi, q in enumerate(queries):
        td = searcher.search(q, 10**9, total_hits_threshold=None)
        before[qi] = (td.doc_ids.copy(), td.scores.copy())

    # delete every 5th doc by its path key (deterministic 20%)
    paths = corpus.column("path").to_pylist()
    dele = paths[::5]
    delete_by_term(idx, "path", dele)
    deleted_gids = set(int(g) for g in load_tombstones(idx))
    assert deleted_gids, "fixture must actually delete something"
    return idx, queries, before, deleted_gids, src, corpus


def test_deletes_filter_hits_without_moving_scores(deleted_index):
    idx, queries, before, deleted_gids, _, _ = deleted_index
    s = Searcher(IndexReader(idx))
    for qi, q in enumerate(queries):
        td = s.search(q, 10**9, total_hits_threshold=None)
        exp_ids, exp_scores = [], []
        for g, sc in zip(*before[qi]):
            if int(g) not in deleted_gids:
                exp_ids.append(int(g))
                exp_scores.append(sc)
        np.testing.assert_array_equal(td.doc_ids, np.array(exp_ids, np.uint64), str(q))
        np.testing.assert_array_equal(td.scores, np.array(exp_scores, np.float32), str(q))
        assert td.total_hits == len(exp_ids)


def test_deletes_respected_by_pruned_topk(deleted_index):
    idx, queries, before, deleted_gids, _, _ = deleted_index
    s = Searcher(IndexReader(idx))
    for q in queries:
        pruned = s.search(q, 10, total_hits_threshold=1)
        exact = s.search(q, 10, total_hits_threshold=None)
        np.testing.assert_array_equal(pruned.doc_ids, exact.doc_ids, str(q))
        np.testing.assert_array_equal(pruned.scores, exact.scores, str(q))
        assert not any(int(g) in deleted_gids for g in pruned.doc_ids)


def test_matchall_count_excludes_deleted(deleted_index):
    idx, _, _, deleted_gids, _, _ = deleted_index
    s = Searcher(IndexReader(idx))
    assert s.count(MatchAllQuery()) == 600 - len(deleted_gids)


def test_compaction_expunges_deletes_same_results(deleted_index, tmp_path):
    idx, queries, _, deleted_gids, _, _ = deleted_index
    s1 = Searcher(IndexReader(idx))
    before = [s1.search(q, 10**9, total_hits_threshold=None) for q in queries]
    import pyarrow.dataset as pads

    def postings_rows():
        return pads.dataset(os.path.join(idx, "postings"), format="parquet") \
            .to_table(columns=["count"])

    rows_before = int(np.asarray(postings_rows().column("count")).sum())
    m = IndexReader(idx).manifest
    segs = [s["seg"] for s in m.segments]
    compact_segments(idx, segs, expunge_deletes=True)
    rows_after = int(np.asarray(postings_rows().column("count")).sum())
    assert rows_after < rows_before  # dead postings really squeezed out

    s2 = Searcher(IndexReader(idx))
    for q, b in zip(queries, before):
        a = s2.search(q, 10**9, total_hits_threshold=None)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, str(q))
        np.testing.assert_array_equal(a.scores, b.scores, str(q))
    # match-all still excludes deleted docs (mask retained after expunge)
    assert s2.count(MatchAllQuery()) == 600 - len(deleted_gids)


def test_upsert_replaces_by_key(ray_session, tmp_path):
    corpus = make_corpus(300, seed=1)
    d = tmp_path
    src = str(d / "base.parquet")
    pq.write_table(corpus, src, row_group_size=100)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(**CFG))

    # new versions of the first 5 docs (same path key, new content)
    paths = corpus.column("path").to_pylist()[:5]
    new = pa.table({
        "repo": pa.array(["r"] * 5),
        "path": pa.array(paths),
        "commit": pa.array(["c2"] * 5),
        "lang": pa.array(["py"] * 5),
        "content": pa.array([f"upserted_token_{i} fresh content" for i in range(5)]),
    })
    up_src = str(d / "upsert.parquet")
    pq.write_table(new, up_src)
    m = upsert_documents(idx, up_src, key_col="path")
    assert len(m.tombstones) == 1

    s = Searcher(IndexReader(idx))
    # the new tokens are findable
    td = s.search(TermQuery("upserted_token_0"), 10)
    assert td.total_hits == 1
    # the old version of an upserted doc is gone: look up its path
    reader = IndexReader(idx)
    hit_rows = reader.lookup_docs(td.doc_ids, columns=["path", "commit"])
    assert hit_rows.column("path").to_pylist() == [paths[0]]
    assert hit_rows.column("commit").to_pylist() == ["c2"]
    # searching a token unique to the OLD content of doc 0 must miss it
    old_tokens = corpus.column("content")[0].as_py().split()
    uniq = [t for t in old_tokens if t.startswith("uniq_")]
    if uniq:
        td_old = s.search(TermQuery(uniq[0].lower()), 10**9, total_hits_threshold=None)
        old_paths = reader.lookup_docs(td_old.doc_ids, columns=["path"]) \
            .column("path").to_pylist() if len(td_old.doc_ids) else []
        assert paths[0] not in old_paths
