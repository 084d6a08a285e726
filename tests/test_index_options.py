"""IndexOptions levels: a DOCS_AND_FREQS index (with_positions=False) must
serve scored term/boolean queries identically to the full index, store no
position streams, and degrade phrase queries to empty (positions absent)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=200, partitions_per_segment=2,
           chunk_size=64, hot_df_threshold=400, n_salts=2)


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("iopts")
    src = str(d / "c.parquet")
    pq.write_table(make_corpus(500, seed=3), src, row_group_size=130)
    full = str(d / "full")
    nopos = str(d / "nopos")
    build_index(src, full, IndexConfig(**CFG))
    build_index(src, nopos, IndexConfig(with_positions=False, **CFG))
    return Searcher(IndexReader(full)), Searcher(IndexReader(nopos))


def test_scored_queries_identical_without_positions(two_indexes):
    full, nopos = two_indexes
    for q in [TermQuery("import"),
              BooleanQuery(should=(TermQuery("import"), TermQuery("return"))),
              BooleanQuery(must=(TermQuery("def"), TermQuery("class")))]:
        a = full.search(q, 10, total_hits_threshold=None)
        b = nopos.search(q, 10, total_hits_threshold=None)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)
        assert a.total_hits == b.total_hits


def test_phrase_degrades_to_empty_without_positions(two_indexes):
    full, nopos = two_indexes
    q = PhraseQuery(("new", "string"))
    assert len(full.search(q, 10).doc_ids) > 0
    td = nopos.search(q, 10)
    assert len(td.doc_ids) == 0 and td.total_hits == 0


def test_no_position_bytes_stored(two_indexes):
    _, nopos = two_indexes
    reader = nopos.reader
    tbl = reader.postings(reader.segs[0], ["import"])
    assert all(len(x) == 0 for x in tbl.column("pos_enc").to_pylist())
