"""TieredMergePolicy analog: automatic merge selection + maybe_merge loop.

Pure policy math is tested without Ray; the end-to-end test drives
add_documents to pile up segments, then maybe_merge must bring the count
within budget while leaving search results bit-identical
(TieredMergePolicy.java:64-90, IndexWriter.maybeMerge).
"""

import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus, query_to_ast, reference_queries
from lucene_ray.index.build import IndexConfig, add_documents, build_index
from lucene_ray.index.mergepolicy import TieredMergePolicy, maybe_merge
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.searcher import Searcher


def test_budget_within_no_merge():
    p = TieredMergePolicy(segments_per_tier=10, floor_segment_docs=1000)
    segs = [{"seg": i, "num_docs": 1000} for i in range(5)]
    assert p.find_merge(segs) is None


def test_sub_floor_trickle_gets_merged():
    # 5 segments all below the floor exceed the floor-unit budget — the
    # floor exists so an NRT trickle of tiny segments is compacted
    p = TieredMergePolicy(segments_per_tier=2.0, floor_segment_docs=1000)
    segs = [{"seg": i, "num_docs": 100} for i in range(5)]
    assert p.find_merge(segs) is not None


def test_budget_geometric_tiers():
    p = TieredMergePolicy(segments_per_tier=4.0, max_merge_at_once=4,
                          floor_segment_docs=100)
    # 16 floor-sized segments: tier0 admits 4 of 100, tier1 4 of 400, ... the
    # budget is well below 16, so a merge must be selected
    segs = [{"seg": i, "num_docs": 100} for i in range(16)]
    assert p.allowed_segment_count([100] * 16) < 16
    chosen = p.find_merge(segs)
    assert chosen is not None
    assert 2 <= len(chosen) <= 4
    assert chosen == sorted(chosen)


def test_prefers_small_similar_segments():
    p = TieredMergePolicy(segments_per_tier=2.0, max_merge_at_once=2,
                          floor_segment_docs=1000)
    segs = [
        {"seg": 0, "num_docs": 1000},
        {"seg": 1, "num_docs": 1000},
        {"seg": 2, "num_docs": 120},
        {"seg": 3, "num_docs": 100},
    ]
    # over budget; the tiny pair scores best (skew * tot^0.05 — equal skew
    # at the floor, smaller merge wins)
    assert p.find_merge(segs) == [2, 3]


def test_single_segment_never_merges():
    p = TieredMergePolicy()
    assert p.find_merge([{"seg": 0, "num_docs": 10**9}]) is None


CFG = dict(
    target_rows_per_partition=100,
    partitions_per_segment=1,
    chunk_size=64,
    hot_df_threshold=250,
    n_salts=2,
)


def _results(index_dir, k=10):
    s = Searcher(IndexReader(index_dir))
    out = []
    for spec in reference_queries()[:6]:
        td = s.search(query_to_ast(spec), k)
        out.append((spec["qid"], td.doc_ids.tolist(), td.scores.tolist(), td.total_hits))
    return out


def test_maybe_merge_bounds_segment_count(ray_session, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    files = []
    for i in range(6):
        f = str(d / f"part_{i}.parquet")
        pq.write_table(make_corpus(100, seed=i), f, row_group_size=100)
        files.append(f)

    idx = str(tmp_path / "idx")
    build_index(files[0], idx, IndexConfig(**CFG))
    for f in files[1:]:
        add_documents(idx, f)
    m = IndexReader(idx).manifest
    assert len(m.segments) == 6
    before = _results(idx)

    policy = TieredMergePolicy(segments_per_tier=2.0, max_merge_at_once=3,
                               floor_segment_docs=100)
    m2 = maybe_merge(idx, policy)
    sizes = [s["num_docs"] for s in m2.segments]
    assert len(m2.segments) <= policy.allowed_segment_count(sizes)
    assert len(m2.segments) < 6
    assert sum(sizes) == 600  # no docs lost
    assert _results(idx) == before  # search results bit-identical

    # idempotent once within budget
    m3 = maybe_merge(idx, policy)
    assert len(m3.segments) == len(m2.segments)
