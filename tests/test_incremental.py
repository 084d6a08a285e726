"""Incremental build (NRT analog) + compaction (SegmentMerger analog).

- add_documents must produce an index whose search results are IDENTICAL to
  a from-scratch build over base+added files (same sorted file order keeps
  the partition plan — and therefore doc ids and float32 scores — equal).
- compact_segments must leave search results bit-identical (global doc ids
  derive from (pid, offset); only the postings layout changes).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus, query_to_ast, reference_queries
from lucene_ray.index.build import (
    IndexConfig,
    add_documents,
    build_index,
    compact_segments,
)
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.searcher import Searcher

CFG = dict(
    target_rows_per_partition=150,
    partitions_per_segment=2,
    chunk_size=64,
    hot_df_threshold=250,
    n_salts=2,
)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("inc")
    base = make_corpus(600, seed=42)
    extra = make_corpus(300, seed=99)
    pq.write_table(base, str(d / "a_base.parquet"), row_group_size=150)
    pq.write_table(extra, str(d / "b_extra.parquet"), row_group_size=150)
    return str(d / "a_base.parquet"), str(d / "b_extra.parquet")


def _results(index_dir, k=10):
    s = Searcher(IndexReader(index_dir))
    out = []
    for spec in reference_queries()[:8]:
        td = s.search(query_to_ast(spec), k)
        out.append((spec["qid"], td.doc_ids.tolist(), td.scores.tolist(), td.total_hits))
    return out


def test_incremental_equals_full_rebuild(ray_session, corpora, tmp_path):
    base, extra = corpora
    cfg = IndexConfig(**CFG)

    inc_dir = str(tmp_path / "inc")
    m1 = build_index(base, inc_dir, cfg)
    n_segs_before = len(m1.segments)
    m2 = add_documents(inc_dir, extra)
    assert m2.doc_count == 900
    assert len(m2.segments) > n_segs_before

    full_dir = str(tmp_path / "full")
    build_index([base, extra], full_dir, cfg)

    assert _results(inc_dir) == _results(full_dir)


def test_compaction_preserves_results(ray_session, corpora, tmp_path):
    base, extra = corpora
    cfg = IndexConfig(**CFG)
    idx = str(tmp_path / "cidx")
    build_index([base, extra], idx, cfg)
    before = _results(idx)
    m = IndexReader(idx).manifest
    segs = [s["seg"] for s in m.segments][:2]
    m2 = compact_segments(idx, segs)
    assert len(m2.segments) == len(m.segments) - 1
    after = _results(idx)
    assert before == after


def test_add_documents_is_idempotent_for_known_files(ray_session, corpora, tmp_path):
    base, extra = corpora
    cfg = IndexConfig(**CFG)
    idx = str(tmp_path / "idem")
    build_index([base, extra], idx, cfg)
    m1 = IndexReader(idx).manifest
    m2 = add_documents(idx, extra)  # already indexed -> no-op
    assert len(m2.partitions) == len(m1.partitions)
    assert m2.doc_count == m1.doc_count


def test_add_documents_repairs_crashed_add(ray_session, corpora, tmp_path):
    """A crash after the manifest registered new partitions/segments but
    before Stage A/C wrote their data must be recoverable by re-running
    add_documents with the same source (repair-on-reentry, not early
    return at the known-files check)."""
    from lucene_ray.index.build import plan_partitions
    from lucene_ray.index.manifest import Manifest

    base, extra = corpora
    cfg = IndexConfig(**CFG)
    idx = str(tmp_path / "crashed")
    build_index(base, idx, cfg)

    # simulate the crashed state: partitions + segments registered, no data
    m = Manifest.load(idx)
    base_pid = len(m.partitions)
    new_parts = plan_partitions([extra], cfg)
    for i, p in enumerate(new_parts):
        p["pid"] = base_pid + i
    m.partitions.extend(new_parts)
    base_seg = 1 + max(s["seg"] for s in m.segments)
    for pid0 in range(0, len(new_parts), cfg.partitions_per_segment):
        group = new_parts[pid0 : pid0 + cfg.partitions_per_segment]
        m.segments.append({
            "seg": base_seg + pid0 // cfg.partitions_per_segment,
            "pids": [p["pid"] for p in group],
            "num_docs": sum(p["num_rows"] for p in group),
        })
    m.term_stats_done = False
    m.save()

    m2 = add_documents(idx, extra)  # same files: must repair, not no-op
    assert m2.doc_count == 900
    assert all(str(p["pid"]) in m2.partials_done for p in m2.partitions)

    full_dir = str(tmp_path / "crashed_full")
    build_index([base, extra], full_dir, cfg)
    assert _results(idx) == _results(full_dir)


def test_compaction_crash_window_leaves_manifest_consistent(
    ray_session, corpora, tmp_path
):
    """compact_segments saves the manifest BEFORE deleting superseded
    segment dirs, so the stale dirs are harmless garbage: searches through
    the new manifest must not depend on them."""
    import os
    import shutil

    base, extra = corpora
    cfg = IndexConfig(**CFG)
    idx = str(tmp_path / "ccrash")
    build_index([base, extra], idx, cfg)
    before = _results(idx)
    m = IndexReader(idx).manifest
    segs = [s["seg"] for s in m.segments][:2]
    # keep copies of the dirs compaction will delete, then restore them to
    # simulate a crash in the delete window (manifest saved, dirs present)
    saved = {}
    for sid in segs:
        d = os.path.join(idx, "postings", f"seg={sid}")
        saved[sid] = d + ".keep"
        shutil.copytree(d, saved[sid])
    compact_segments(idx, segs)
    for sid, keep in saved.items():
        shutil.copytree(keep, os.path.join(idx, "postings", f"seg={sid}"))
    assert _results(idx) == before  # stale dirs are ignored
