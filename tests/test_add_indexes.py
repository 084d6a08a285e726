"""IndexWriter.addIndexes(Directory...) analog: merge whole indexes by
re-pid'ing their durable Stage-A artifacts (IndexWriter.java:3191)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import (
    IndexConfig,
    add_indexes,
    build_index,
    delete_by_term,
)
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import TermQuery, parse_query
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=100, partitions_per_segment=2,
           chunk_size=64)


def _td_table(idx, q):
    s = Searcher(IndexReader(idx))
    td = s.search(q, 10**9, total_hits_threshold=None)
    order = np.argsort(td.doc_ids)
    return td.doc_ids[order], td.scores[order]


def test_add_indexes_equals_monolithic(ray_session, tmp_path):
    src_a = str(tmp_path / "a.parquet")
    src_b = str(tmp_path / "b.parquet")
    pq.write_table(make_corpus(200, seed=1), src_a, row_group_size=100)
    pq.write_table(make_corpus(150, seed=2), src_b, row_group_size=100)

    idx_a = str(tmp_path / "idx_a")
    idx_b = str(tmp_path / "idx_b")
    idx_mono = str(tmp_path / "idx_mono")
    build_index(src_a, idx_a, IndexConfig(**CFG))
    build_index(src_b, idx_b, IndexConfig(**CFG))
    build_index([src_a, src_b], idx_mono, IndexConfig(**CFG))

    m = add_indexes(idx_a, [idx_b])
    assert m.doc_count == 350

    # merged index must be search-identical to the monolithic build: the
    # partition plan lines up row-for-row, so doc ids, global stats and
    # float32 scores all agree
    for qs in ["merge", "import AND return", '"def uniq_1"']:
        q = parse_query(qs)
        ids_m, sc_m = _td_table(idx_a, q)
        ids_o, sc_o = _td_table(idx_mono, q)
        np.testing.assert_array_equal(ids_m, ids_o, err_msg=qs)
        np.testing.assert_array_equal(sc_m, sc_o, err_msg=qs)


def test_add_indexes_remaps_tombstones(ray_session, tmp_path):
    src_a = str(tmp_path / "a.parquet")
    src_b = str(tmp_path / "b.parquet")
    pq.write_table(make_corpus(120, seed=3), src_a, row_group_size=60)
    pq.write_table(make_corpus(100, seed=4), src_b, row_group_size=50)
    idx_a = str(tmp_path / "idx_a")
    idx_b = str(tmp_path / "idx_b")
    build_index(src_a, idx_a, IndexConfig(**CFG))
    build_index(src_b, idx_b, IndexConfig(**CFG))

    # delete some docs from B by stored field, then merge
    b_paths = pq.read_table(src_b, columns=["path"]).column("path").to_pylist()
    victims = b_paths[:5]
    delete_by_term(idx_b, "path", victims)
    before = Searcher(IndexReader(idx_b)).search(
        TermQuery("merge"), 10**9, total_hits_threshold=None)
    add_indexes(idx_a, [idx_b])

    r = IndexReader(idx_a)
    td = Searcher(r).search(TermQuery("merge"), 10**9,
                            total_hits_threshold=None)
    hit_paths = set(
        r.lookup_docs(td.doc_ids, columns=["path"]).column("path").to_pylist())
    assert not (hit_paths & set(victims)), "deleted docs resurfaced"
    # B's surviving hits are all present in the merged index
    surv = set(
        IndexReader(idx_b).lookup_docs(
            before.doc_ids, columns=["path"]).column("path").to_pylist())
    assert surv - set(victims) <= hit_paths


def test_add_indexes_rejects_incompatible_config(ray_session, tmp_path):
    src = str(tmp_path / "c.parquet")
    pq.write_table(make_corpus(50, seed=5), src)
    idx_a = str(tmp_path / "ia")
    idx_b = str(tmp_path / "ib")
    build_index(src, idx_a, IndexConfig(**CFG))
    build_index(src, idx_b, IndexConfig(**CFG, stopwords=("the",)))
    with pytest.raises(ValueError, match="incompatible"):
        add_indexes(idx_a, [idx_b])
