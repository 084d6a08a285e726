"""Corpus clustering over embeddings (spherical k-means; the IVF coarse
quantizer surfaced as a training-data-pipeline op)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops.ann import cluster_embeddings


def _blob_ds(n_per=60, d=16, seed=9):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d)) * 5
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(scale=0.2, size=(n_per, d))
        vecs.extend(pts.tolist())
        labels.extend([ci] * n_per)
    ids = list(range(len(vecs)))
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    })
    return ray.data.from_arrow(t).repartition(4), np.array(labels)


def test_clusters_recover_blobs(ray_session):
    ds, labels = _blob_ds()
    out = cluster_embeddings(ds, n_clusters=3, iters=8)
    assign = np.array(out.column("cluster").to_pylist())
    # every true blob maps to exactly one k-means cluster (purity 1.0 on
    # well-separated blobs)
    for b in range(3):
        vals = set(assign[labels == b].tolist())
        assert len(vals) == 1, (b, vals)
    assert len(set(assign.tolist())) == 3
    # sim is the cosine to the assigned centroid: near 1 on tight blobs
    assert min(out.column("sim").to_pylist()) > 0.95


def test_cluster_determinism(ray_session):
    ds, _ = _blob_ds(seed=11)
    a = cluster_embeddings(ds, n_clusters=3, iters=5)
    b = cluster_embeddings(ds, n_clusters=3, iters=5)
    assert a.equals(b)


def test_assignment_is_nearest_centroid(ray_session):
    # the returned sim must be the max over clusters: re-derive centroids
    # from the assignment and verify each point's cluster is its argmax
    ds, _ = _blob_ds(seed=13)
    out = cluster_embeddings(ds, n_clusters=3, iters=8)
    t = ds.to_pandas().sort_values("vec_id")
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assign = np.array(out.column("cluster").to_pylist())
    cents = np.stack([m[assign == c].mean(axis=0) for c in range(3)])
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = m @ cents.T
    np.testing.assert_array_equal(np.argmax(sims, axis=1), assign)
