"""HNSW graph ANN: recall vs brute force, persistence round-trip, and
block-partitioned layout."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops import ann, hnsw


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((10, 32)) * 2.5
    m = np.concatenate(
        [centers[i] + rng.standard_normal((120, 32)) * 0.6 for i in range(10)]
    ).astype(np.float32)
    ids = np.arange(len(m), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    return tbl, m.astype(np.float64)


def test_hnsw_graph_recall_single_block(vectors):
    _, m = vectors
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    g = hnsw._HnswGraph(mn, m=16, ef_construction=100, seed=7)
    rng = np.random.default_rng(3)
    qs = mn[rng.choice(len(mn), 25, replace=False)]
    recalls = []
    for q in qs:
        ids, _ = g.search(q, k=10, ef=80)
        exact = np.argsort(-(mn @ q))[:10]
        recalls.append(len(set(ids.tolist()) & set(exact.tolist())) / 10)
    assert np.mean(recalls) >= 0.95


def test_hnsw_index_build_search_recall(ray_session, vectors, tmp_path):
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "hnsw")
    idx = hnsw.HnswIndex.build(ds, idx_dir, m=12, ef_construction=80, blocks=3)
    # layout: one dir per block with vectors + graph
    names = idx.blocks()
    assert 1 <= len(names) <= 3
    for n in names:
        assert os.path.exists(os.path.join(idx_dir, n, "graph.npz"))

    rng = np.random.default_rng(9)
    q = m[rng.choice(len(m), 15, replace=False)] + 0.05 * rng.standard_normal((15, 32))
    brute = ann.knn_brute(ds, q, k=10).to_pandas()
    approx = idx.search(q, k=10, ef=80).to_pandas()
    recalls = []
    for qi in range(15):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.9


def test_hnsw_open_round_trip(ray_session, vectors, tmp_path):
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "hnsw_rt")
    built = hnsw.HnswIndex.build(ds, idx_dir, m=8, ef_construction=60, blocks=2)
    reopened = hnsw.HnswIndex.open(idx_dir)
    q = m[[5, 700]]
    a = built.search(q, k=5).to_pandas()
    b = reopened.search(q, k=5).to_pandas()
    assert a.equals(b)


def test_hnsw_search_is_distributed(ray_session, vectors, tmp_path):
    """Serving must not pull block data onto the driver: blocks live in the
    actor pool (loaded once per actor in __init__); the driver handle holds
    only actor references and merges tiny top-k partials."""
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "hnsw_dist")
    idx = hnsw.HnswIndex.build(ds, idx_dir, m=8, ef_construction=60, blocks=3)
    out = idx.search(m[[3, 42]], k=5, concurrency=2)
    assert len(out) == 10
    # no driver-side block cache exists at all
    assert not hasattr(idx, "_cache")
    assert not any(
        isinstance(v, (np.ndarray, hnsw._HnswGraph)) for v in vars(idx).values()
    )
    # the pool owns the blocks: actors exist and cover all blocks
    assert idx._actors and len(idx._actors) == 2
