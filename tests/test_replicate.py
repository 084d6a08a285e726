"""NRT replication analog (lucene/replicator/nrt): full + incremental sync,
pointer-last crash safety, checksum repair, unreferenced-file cleanup."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import (
    IndexConfig,
    build_index,
    compact_segments,
    delete_by_term,
    snapshot_commit,
)
from lucene_ray.index.reader import IndexReader
from lucene_ray.index.replicate import copy_state, sync_replica
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=150, partitions_per_segment=2,
           chunk_size=64, hot_df_threshold=400, n_salts=2)


@pytest.fixture(scope="module")
def primary(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("repl")
    src = str(d / "c.parquet")
    pq.write_table(make_corpus(400, seed=11), src, row_group_size=97)
    idx = str(d / "primary")
    build_index(src, idx, IndexConfig(**CFG))
    return idx


def _top(idx_dir: str, term: str = "import", gen: int | None = None):
    s = Searcher(IndexReader(idx_dir, generation=gen) if gen
                 else IndexReader(idx_dir))
    td = s.search(TermQuery(term), 10, total_hits_threshold=None)
    return td.doc_ids.tolist(), td.scores.tolist(), td.total_hits


def test_full_sync_replica_serves_identically(primary, tmp_path):
    replica = str(tmp_path / "replica")
    st = copy_state(primary)
    stats = sync_replica(primary, replica)
    assert stats["copied"] == len(st.files) and stats["skipped"] == 0
    assert _top(replica) == _top(primary)
    # metadata identity per file (FileMetaData match)
    for rel, (sz, crc) in st.files.items():
        assert os.path.getsize(os.path.join(replica, rel)) == sz


def test_incremental_sync_copies_only_deltas(primary, tmp_path):
    import shutil

    # independent primary copy so module-scoped fixture stays pristine
    p2 = str(tmp_path / "p2")
    shutil.copytree(primary, p2)
    replica = str(tmp_path / "replica")
    sync_replica(p2, replica)
    before = _top(replica)

    # advance the primary: delete 20% -> new commit generation
    paths = []
    for f in sorted(os.listdir(os.path.join(p2, "docmap"))):
        t = pq.read_table(os.path.join(p2, "docmap", f), columns=["path"])
        paths.extend(t.column("path").to_pylist())
    dele = sorted(set(paths))[::5]
    delete_by_term(p2, "path", dele)

    stats = sync_replica(p2, replica)
    # only the new manifest + tombstone files move; postings/docmap skip
    # (tombstones are tiny per-task parquet shards — assert on bytes)
    assert stats["skipped"] > 10
    assert stats["bytes_copied"] < 0.05 * copy_state(p2).total_bytes
    assert _top(replica) == _top(p2)
    assert _top(replica) != before  # deletes visible


def test_interrupted_sync_keeps_previous_generation(primary, tmp_path,
                                                    monkeypatch):
    import shutil

    import lucene_ray.index.replicate as repl

    p2 = str(tmp_path / "p2")
    shutil.copytree(primary, p2)
    replica = str(tmp_path / "replica")
    sync_replica(p2, replica)
    gen0 = IndexReader(replica).manifest.generation
    before = _top(replica)

    paths = []
    for f in sorted(os.listdir(os.path.join(p2, "docmap"))):
        t = pq.read_table(os.path.join(p2, "docmap", f), columns=["path"])
        paths.extend(t.column("path").to_pylist())
    delete_by_term(p2, "path", sorted(set(paths))[::7])

    calls = {"n": 0}
    orig = repl._copy_one

    def _boom(*a, **k):
        calls["n"] += 1
        raise IOError("simulated network failure")

    monkeypatch.setattr(repl, "_copy_one", _boom)
    with pytest.raises(IOError):
        sync_replica(p2, replica)
    monkeypatch.setattr(repl, "_copy_one", orig)
    # pointer untouched -> replica still serves the OLD commit point
    assert IndexReader(replica).manifest.generation == gen0
    assert _top(replica) == before
    # resume completes
    sync_replica(p2, replica)
    assert _top(replica) == _top(p2)


def test_checksum_repair(primary, tmp_path):
    replica = str(tmp_path / "replica")
    sync_replica(primary, replica)
    st = copy_state(primary)
    victim = next(r for r in st.files if r.startswith("postings/"))
    vp = os.path.join(replica, victim)
    data = bytearray(open(vp, "rb").read())
    data[len(data) // 2] ^= 0xFF  # same size, different bytes
    open(vp, "wb").write(bytes(data))
    stats = sync_replica(primary, replica)
    assert stats["copied"] == 1  # only the corrupted file re-copied
    assert _top(replica) == _top(primary)


def test_cleanup_after_primary_compaction(primary, tmp_path):
    import shutil

    p2 = str(tmp_path / "p2")
    shutil.copytree(primary, p2)
    replica = str(tmp_path / "replica")
    sync_replica(p2, replica)
    old_segs = {s["seg"] for s in IndexReader(replica).manifest.segments}

    paths = []
    for f in sorted(os.listdir(os.path.join(p2, "docmap"))):
        t = pq.read_table(os.path.join(p2, "docmap", f), columns=["path"])
        paths.extend(t.column("path").to_pylist())
    delete_by_term(p2, "path", sorted(set(paths))[::3])
    compact_segments(p2, sorted(old_segs), expunge_deletes=True)

    stats = sync_replica(p2, replica)
    assert stats["deleted"] > 0  # replaced segment trees removed
    new_segs = {s["seg"] for s in IndexReader(replica).manifest.segments}
    assert new_segs != old_segs
    for s in old_segs - new_segs:
        assert not os.path.isdir(os.path.join(replica, "postings", f"seg={s}"))
    assert _top(replica) == _top(p2)


def test_snapshot_pins_old_generation_files(primary, tmp_path):
    import shutil

    p2 = str(tmp_path / "p2")
    shutil.copytree(primary, p2)
    replica = str(tmp_path / "replica")
    sync_replica(p2, replica)
    pinned = snapshot_commit(replica)  # pin the replica's current point
    before = _top(replica)

    paths = []
    for f in sorted(os.listdir(os.path.join(p2, "docmap"))):
        t = pq.read_table(os.path.join(p2, "docmap", f), columns=["path"])
        paths.extend(t.column("path").to_pylist())
    delete_by_term(p2, "path", sorted(set(paths))[::3])
    segs = [s["seg"] for s in IndexReader(p2).manifest.segments]
    compact_segments(p2, segs, expunge_deletes=True)
    sync_replica(p2, replica)

    # the pinned generation still serves point-in-time on the replica
    assert _top(replica, gen=pinned) == before
    assert _top(replica) == _top(p2)


def test_parallel_sync_matches_serial(primary, tmp_path, ray_session):
    serial = str(tmp_path / "serial")
    par = str(tmp_path / "par")
    sync_replica(primary, serial, concurrency=1)
    stats = sync_replica(primary, par, concurrency=4)
    assert stats["copied"] == len(copy_state(primary).files)
    assert _top(par) == _top(serial) == _top(primary)
