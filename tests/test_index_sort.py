"""Index-time sort (IndexWriterConfig.setIndexSort analog): partitions
stored in sort order, doc ids assigned after the sort, identical hit sets,
CheckIndex-clean, and early-terminated sorted-field top-k."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import (
    IndexConfig,
    build_index,
    docmap_path,
    sorted_field_topk,
)
from lucene_ray.index.check import check_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=150, partitions_per_segment=2, chunk_size=64)


@pytest.fixture(scope="module")
def sorted_and_plain(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("isort")
    corpus = make_corpus(450, seed=21)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=150)
    plain = str(d / "plain")
    build_index(src, plain, IndexConfig(**CFG))
    srt = str(d / "sorted")
    build_index(src, srt, IndexConfig(**CFG, index_sort=("lang", "path")))
    return src, plain, srt


def test_sorted_docmaps_are_sorted(sorted_and_plain):
    _, _, srt = sorted_and_plain
    m = IndexReader(srt).manifest
    assert m.config["index_sort"] == ["lang", "path"]
    for p in m.partitions:
        t = pq.read_table(docmap_path(srt, p["pid"]), columns=["lang", "path"])
        df = t.to_pandas()
        assert df.equals(df.sort_values(["lang", "path"]).reset_index(drop=True))


def test_sorted_index_checkindex_clean(sorted_and_plain):
    _, _, srt = sorted_and_plain
    assert check_index(srt)["status"] == "OK"


def test_sorted_index_same_hit_sets_and_scores(sorted_and_plain):
    """Doc ids differ (sort remap) but hit sets (by stored path key) and the
    score multiset must be identical to the unsorted build."""
    _, plain, srt = sorted_and_plain
    for term in ["import", "return", "def"]:
        results = {}
        for name, idx in [("plain", plain), ("sorted", srt)]:
            r = IndexReader(idx)
            td = Searcher(r).search(TermQuery(term), 10**9, total_hits_threshold=None)
            rows = r.lookup_docs(td.doc_ids, columns=["doc_id", "path"])
            m = dict(zip((int(x) for x in rows.column("doc_id").to_pylist()),
                         rows.column("path").to_pylist()))
            paths = sorted(m[int(g)] for g in td.doc_ids)
            results[name] = (paths, sorted(np.round(td.scores, 6).tolist()))
        assert results["plain"][0] == results["sorted"][0], term
        assert results["plain"][1] == results["sorted"][1], term


def test_sorted_field_topk_matches_full_sort(sorted_and_plain):
    src, _, srt = sorted_and_plain
    got = sorted_field_topk(srt, "lang", k=7).to_pandas()
    # oracle: full scan + sort of the docmaps
    m = IndexReader(srt).manifest
    full = pa.concat_tables(
        [pq.read_table(docmap_path(srt, p["pid"]), columns=["lang", "doc_id"])
         for p in m.partitions]
    ).to_pandas().sort_values(["lang", "doc_id"]).head(7).reset_index(drop=True)
    assert list(got["lang"]) == list(full["lang"])
    assert list(got["doc_id"]) == list(full["doc_id"])


def test_sorted_field_topk_rejects_unsorted(sorted_and_plain):
    _, plain, _ = sorted_and_plain
    with pytest.raises(ValueError):
        sorted_field_topk(plain, "lang", k=5)
