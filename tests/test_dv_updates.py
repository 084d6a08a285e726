"""updateNumericDocValue: generation overlay + zone-map bypass."""

import re

import numpy as np
import pytest

from lucene_ray.index.reader import IndexReader

_ROW_RE = re.compile(r"file_(\d+)\.")


def _paths_for(rows):
    from lucene_ray.fixtures import make_corpus

    t = make_corpus(1000)
    paths = t.column("path").to_pylist()
    return [paths[r] for r in rows]


@pytest.fixture()
def dv_index(ray_session, corpus_file, tmp_path):
    from lucene_ray.index.build import IndexConfig, build_index

    index_dir = str(tmp_path / "idx")
    cfg = IndexConfig(target_rows_per_partition=300, partitions_per_segment=2)
    build_index(corpus_file, index_dir, cfg)
    return index_dir


def _row_values(reader, col):
    """{corpus row -> doc-values value} across all segments."""
    out = {}
    for seg in reader.segs:
        gids = reader.global_doc_ids(seg)
        vals = reader.docvalues(seg, col)
        paths = reader.lookup_docs(gids, columns=["doc_id", "path"]).column("path")
        for p, v in zip(paths.to_pylist(), vals):
            out[int(_ROW_RE.search(p).group(1))] = int(v)
    return out


def test_dv_update_overlay_and_later_generation_wins(dv_index):
    from lucene_ray.index.build import update_numeric_docvalue

    # generation 1: length := 11 for rows % 10 == 3
    update_numeric_docvalue(
        dv_index, "path", _paths_for([r for r in range(1000) if r % 10 == 3]),
        "length", 11)
    # generation 2 overwrites a subset: length := 22 for rows % 20 == 3
    update_numeric_docvalue(
        dv_index, "path", _paths_for([r for r in range(1000) if r % 20 == 3]),
        "length", 22)

    seen = _row_values(IndexReader(dv_index), "length")  # fresh reader (NRT)
    assert len(seen) == 1000
    for r, v in seen.items():
        if r % 20 == 3:
            assert v == 22, r
        elif r % 10 == 3:
            assert v == 11, r
        else:
            assert v not in (11, 22) or v == seen[r], r


def test_dv_update_bypasses_zone_maps(dv_index):
    """A selective range on the UPDATED value must find updated rows even
    though every row group's min/max excludes the new value."""
    from lucene_ray.index.build import update_numeric_docvalue

    update_numeric_docvalue(dv_index, "path", _paths_for([5, 105, 205]),
                            "length", 999_999)
    r = IndexReader(dv_index)
    found = 0
    for seg in r.segs:
        stats = {}
        hit = r.numeric_range_docs(seg, "length", 999_998, None, stats=stats)
        found += len(hit)
        assert stats == {"chunks": 0, "read": 0}  # pruned path bypassed
    assert found == 3
    # a non-updated column still prunes through the zone maps
    stats = {}
    r.numeric_range_docs(r.segs[0], "norm", 10**9, None, stats=stats)
    assert stats["chunks"] > 0


def test_dv_update_does_not_touch_scores(dv_index):
    """Doc-values updates change ONLY the doc-values read path: postings,
    norms, and BM25 scores stay identical (the Lucene contract)."""
    from lucene_ray.index.build import update_numeric_docvalue
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    before = Searcher(IndexReader(dv_index)).search(TermQuery("import"), 10)
    update_numeric_docvalue(dv_index, "path", _paths_for(range(100)),
                            "length", 1)
    after = Searcher(IndexReader(dv_index)).search(TermQuery("import"), 10)
    np.testing.assert_array_equal(before.doc_ids, after.doc_ids)
    np.testing.assert_array_equal(before.scores, after.scores)


def test_update_binary_docvalue(ray_session, tmp_path):
    """updateBinaryDocValue analog: string stored-field overlays applied in
    lookup_docs; later generations win; postings untouched."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.fixtures import make_corpus
    from lucene_ray.index.build import (
        IndexConfig,
        build_index,
        update_binary_docvalue,
    )
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    corpus = make_corpus(120, seed=23)
    src = str(tmp_path / "c.parquet")
    pq.write_table(corpus, src, row_group_size=60)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=60, partitions_per_segment=1,
        id_cols=("repo", "path", "commit", "lang")))

    update_binary_docvalue(idx, "lang", ["py"], "repo", "moved/repo")
    r = IndexReader(idx)
    s = Searcher(r)
    td = s.search(TermQuery("import"), 10**6, total_hits_threshold=None)
    t = r.lookup_docs(td.doc_ids, columns=["repo", "lang"])
    for row in t.to_pylist():
        if row["lang"] == "py":
            assert row["repo"] == "moved/repo"
        else:
            assert row["repo"] != "moved/repo"
    # later generation wins
    update_binary_docvalue(idx, "lang", ["py"], "repo", "final/repo")
    r2 = IndexReader(idx)
    t2 = r2.lookup_docs(td.doc_ids, columns=["repo", "lang"])
    assert all(row["repo"] == "final/repo"
               for row in t2.to_pylist() if row["lang"] == "py")
    # hit sets unchanged (postings untouched)
    s2 = Searcher(r2)
    td2 = s2.search(TermQuery("import"), 10**6, total_hits_threshold=None)
    np.testing.assert_array_equal(np.sort(td.doc_ids), np.sort(td2.doc_ids))
