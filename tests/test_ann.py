"""ANN: brute-force exactness, IVF bucket-partitioned layout + recall.

The IVF index must (a) persist vectors partitioned by centroid and read
ONLY the probed bucket directories at search time, and (b) reach
recall@10 >= 0.9 vs the brute-force oracle with a modest nprobe.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops import ann


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(17)
    # clustered data so IVF has real structure: 8 gaussian blobs
    centers = rng.standard_normal((8, 24)) * 3
    m = np.concatenate(
        [centers[i] + rng.standard_normal((150, 24)) * 0.5 for i in range(8)]
    ).astype(np.float32)
    ids = np.arange(len(m), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    return tbl, m.astype(np.float64)


def test_knn_brute_matches_numpy(ray_session, vectors):
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl).repartition(6)
    q = m[[3, 400, 900]] + 0.01
    out = ann.knn_brute(ds, q, k=10)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ mn.T
    for qi in range(3):
        order = np.lexsort((np.arange(len(m)), -sims[qi]))[:10]
        got = out.filter(pa.compute.equal(out["query_id"], qi))
        assert got.column("vec_id").to_pylist() == order.tolist()


def test_ivf_layout_and_partition_pruning(ray_session, vectors, tmp_path):
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl).repartition(6)
    idx_dir = str(tmp_path / "ivf")
    idx = ann.IvfIndex.build(ds, idx_dir, n_clusters=8, iters=4, seed=3)
    # layout: one directory per bucket, rows partition the input exactly
    buckets = [d for d in os.listdir(idx_dir) if d.startswith("bucket=")]
    assert 2 <= len(buckets) <= 8
    total = sum(
        ray.data.read_parquet(os.path.join(idx_dir, b)).count() for b in buckets
    )
    assert total == len(m)
    # a 1-query search probes nprobe buckets -> reads <= nprobe directories,
    # strictly fewer rows than the whole index
    q = m[[10]]
    paths = idx.probed_paths(q, nprobe=2)
    probed_dirs = {os.path.dirname(p) for p in paths}
    assert len(probed_dirs) <= 2
    probed_rows = sum(ray.data.read_parquet(p).count() for p in paths)
    assert probed_rows < total


def test_ivf_recall_vs_brute(ray_session, vectors, tmp_path):
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl).repartition(6)
    idx_dir = str(tmp_path / "ivf_recall")
    idx = ann.IvfIndex.build(ds, idx_dir, n_clusters=8, iters=4, seed=3)
    rng = np.random.default_rng(5)
    q = m[rng.choice(len(m), 20, replace=False)] + 0.05 * rng.standard_normal((20, 24))
    brute = ann.knn_brute(ds, q, k=10).to_pandas()
    approx = idx.search(q, k=10, nprobe=3).to_pandas()
    recalls = []
    for qi in range(20):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.9


def test_ivf_open_round_trip(ray_session, vectors, tmp_path):
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "ivf_rt")
    built = ann.IvfIndex.build(ds, idx_dir, n_clusters=4, iters=2)
    reopened = ann.IvfIndex.open(idx_dir)
    np.testing.assert_array_equal(built.centroids, reopened.centroids)
    q = m[[7]]
    a = built.search(q, k=5, nprobe=2).to_pandas()
    b = reopened.search(q, k=5, nprobe=2).to_pandas()
    assert a.equals(b)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(5)
    m = rng.standard_normal((50, 24)) * 3
    q, mn, sc = ann.quantize_rows(m)
    back = ann.dequantize_rows(q, mn, sc)
    # each component reconstructs within half a quantization step
    assert np.all(np.abs(back - m) <= sc[:, None] / 2 + 1e-9)


def test_ivf_quantized_search_recall_and_bytes(ray_session, vectors, tmp_path):
    """search_quantized: int8 scan + float rescore must (a) reach
    recall@10 >= 0.9 vs brute force, (b) return EXACT float cosines for
    the docs it ranks, and (c) scan ~4x fewer vector bytes."""
    tbl, m = vectors
    ds = ray.data.from_arrow(tbl).repartition(6)
    idx_dir = str(tmp_path / "ivfq")
    idx = ann.IvfIndex.build(ds, idx_dir, n_clusters=8, iters=3)
    rng = np.random.default_rng(11)
    q = m[rng.choice(len(m), 12, replace=False)] + 0.02 * rng.standard_normal((12, 24))

    brute = ann.knn_brute(ds, q, k=10).to_pandas()
    got = idx.search_quantized(q, k=10, nprobe=4, oversample=3).to_pandas()
    recalls = []
    for qi in range(12):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        a = set(got[got["query_id"] == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.9
    # exact cosines: every (query, id) pair in the result matches brute's
    # float cosine when present there
    merged = got.merge(brute, on=["query_id", "vec_id"], suffixes=("_q", "_b"))
    assert len(merged) > 0
    assert np.allclose(merged["cosine_q"], merged["cosine_b"], atol=1e-12)
    qb, fb = idx.quantized_scan_bytes()
    assert qb > 0 and fb > 0 and qb < 0.45 * fb, (qb, fb)
