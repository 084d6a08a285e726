"""Commit snapshots + point-in-time readers (SnapshotDeletionPolicy /
DirectoryReader.open(IndexCommit) analogs)."""

import numpy as np
import pytest

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import Searcher


@pytest.fixture()
def idx(ray_session, corpus_file, tmp_path):
    from lucene_ray.index.build import IndexConfig, build_index

    index_dir = str(tmp_path / "idx")
    cfg = IndexConfig(target_rows_per_partition=300, partitions_per_segment=1)
    build_index(corpus_file, index_dir, cfg)
    return index_dir


def test_point_in_time_reader_sees_old_state(idx):
    from lucene_ray.index.build import delete_by_term, snapshot_commit

    gen = snapshot_commit(idx)
    before = Searcher(IndexReader(idx)).search(TermQuery("import"), 10)
    # mutate: delete a chunk of docs
    delete_by_term(idx, "repo", ["org0/proj0", "org1/proj1"])
    now = Searcher(IndexReader(idx)).search(TermQuery("import"), 10)
    assert now.total_hits < before.total_hits
    # the pinned generation still serves the PRE-delete view
    pit = Searcher(IndexReader(idx, generation=gen)).search(TermQuery("import"), 10)
    assert pit.total_hits == before.total_hits
    np.testing.assert_array_equal(pit.doc_ids, before.doc_ids)
    np.testing.assert_array_equal(pit.scores, before.scores)


def test_snapshot_protects_files_from_compaction(idx):
    from lucene_ray.index.build import (
        compact_segments,
        release_snapshot,
        snapshot_commit,
    )

    r0 = IndexReader(idx)
    assert len(r0.segs) >= 2
    gen = snapshot_commit(idx)
    before = Searcher(r0).search(TermQuery("return"), 10)
    compact_segments(idx, r0.segs[:2])
    # post-compaction current reader: identical results, fewer segments
    r1 = IndexReader(idx)
    after = Searcher(r1).search(TermQuery("return"), 10)
    np.testing.assert_array_equal(after.doc_ids, before.doc_ids)
    # the snapshotted commit still opens and serves identically — its old
    # segment files were NOT deleted by the merge
    pit = Searcher(IndexReader(idx, generation=gen)).search(TermQuery("return"), 10)
    np.testing.assert_array_equal(pit.doc_ids, before.doc_ids)
    np.testing.assert_array_equal(pit.scores, before.scores)
    # releasing the snapshot makes a later compaction free to delete
    release_snapshot(idx, gen)
    from lucene_ray.index.build import _load_snapshots

    assert gen not in _load_snapshots(idx)


def test_unsnapshotted_compaction_deletes_old_segments(idx, tmp_path):
    import os

    from lucene_ray.index.build import compact_segments

    r0 = IndexReader(idx)
    segs = r0.segs[:2]
    compact_segments(idx, segs)
    for sid in segs:
        assert not os.path.isdir(os.path.join(idx, "postings", f"seg={sid}"))
