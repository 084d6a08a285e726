"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact top-k cosine — per-batch numpy matmul against a
  broadcast query matrix (ray.put once, read per task), per-batch partial
  top-k, heap-merge on the driver. This is the always-correct baseline.
- ``IvfIndex``: the scale path — kmeans-lite coarse quantizer trained with
  distributed E-steps, vectors PERSISTED as bucket-partitioned parquet
  (one directory per centroid). A query reads ONLY its ``nprobe`` probed
  bucket directories — nprobe/n_clusters of the files, not a filtered full
  scan — the moral equivalent of Lucene's HNSW entry-point narrowing
  (lucene/core/src/java/org/apache/lucene/util/hnsw/HnswGraphSearcher.java)
  expressed as partition pruning.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_ray.ops.dedup import _list_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_brute(ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Exact cosine top-k. Returns (query_id, rank, vec_id, cosine) rows,
    ties broken by vec_id asc (deterministic)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        mat = _normalize(_list_matrix(batch.column(vec_col)))
        sims = qm @ mat.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k, nb)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            # keep boundary ties so the (cosine desc, id asc) tie-break is
            # decided at the merge, not by argpartition's arbitrary pick
            kth = np.partition(sims[qi], nb - kk)[nb - kk]
            part = np.flatnonzero(sims[qi] >= kth)
            out_q.append(np.full(len(part), qi, dtype=np.int64))
            out_id.append(ids[part])
            out_s.append(sims[qi][part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    rows = {"query_id": [], "rank": [], id_col: [], "cosine": []}
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        rows["query_id"].extend([qi] * len(g))
        rows["rank"].extend(range(1, len(g) + 1))
        rows[id_col].extend(g[id_col])
        rows["cosine"].extend(g["cosine"])
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
            id_col: pa.array(rows[id_col], pa.int64()),
            "cosine": pa.array(rows["cosine"], pa.float64()),
        }
    )


class IvfIndex:
    """Coarse-quantized ANN over a bucket-partitioned parquet layout.

    Build: E-steps distributed via map_batches (partial sums per centroid),
    M-step on the driver — the classic mergeable-sketch shape; then one
    assignment pass writes ``index_dir/bucket=N/*.parquet``.
    Search: probe the ``nprobe`` nearest centroids and read ONLY those
    bucket directories.
    """

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 vec_col: str, id_col: str):
        self.index_dir = index_dir
        self.centroids = centroids  # (c, d) normalized
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(cls, ds: ray.data.Dataset, index_dir: str, n_clusters: int = 16,
              iters: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42) -> "IvfIndex":
        sample = ds.limit(max(n_clusters * 8, 256)).to_pandas()
        mat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(seed)
        cent = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]

        for _ in range(iters):
            cref = ray.put(cent)

            def estep(batch: pa.Table) -> pa.Table:
                c = ray.get(cref)
                m = _normalize(_list_matrix(batch.column(vec_col)))
                assign = np.argmax(m @ c.T, axis=1)
                sums = np.zeros_like(c)
                np.add.at(sums, assign, m)
                counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
                return pa.table(
                    {
                        "cid": pa.array(np.arange(len(c)), pa.int64()),
                        "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                        "count": pa.array(counts, pa.int64()),
                    }
                )

            parts = ds.map_batches(estep, batch_format="pyarrow").to_pandas()
            news = np.zeros_like(cent)
            newc = np.zeros(len(cent), dtype=np.int64)
            for _, r in parts.iterrows():
                news[r["cid"]] += np.asarray(r["vsum"])
                newc[r["cid"]] += r["count"]
            nz = newc > 0
            cent[nz] = _normalize(news[nz] / newc[nz, None])

        cref = ray.put(cent)

        def assign_bucket(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _normalize(_list_matrix(batch.column(vec_col)))
            assign = np.argmax(m @ c.T, axis=1)
            return batch.append_column("bucket", pa.array(assign, pa.int32()))

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(assign_bucket, batch_format="pyarrow").write_parquet(
            index_dir, partition_cols=["bucket"]
        )
        meta = {
            "vec_col": vec_col,
            "id_col": id_col,
            "n_clusters": int(len(cent)),
            "centroids": cent.tolist(),
        }
        with open(os.path.join(index_dir, "ivf_meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(index_dir, cent, vec_col, id_col)

    @classmethod
    def open(cls, index_dir: str) -> "IvfIndex":
        with open(os.path.join(index_dir, "ivf_meta.json")) as f:
            meta = json.load(f)
        return cls(index_dir, np.asarray(meta["centroids"], dtype=np.float64),
                   meta["vec_col"], meta["id_col"])

    def probed_paths(self, queries: np.ndarray, nprobe: int) -> list[str]:
        q = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted(set(probe.ravel().tolist()))
        dirs = [os.path.join(self.index_dir, f"bucket={b}") for b in wanted]
        return [
            os.path.join(d, f)
            for d in dirs
            if os.path.isdir(d)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
        """Top-k over the probed buckets only: the read is restricted to
        nprobe/n_clusters of the index files (partition pruning), not a
        filtered scan of everything."""
        paths = self.probed_paths(queries, nprobe)
        if not paths:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sub = ray.data.read_parquet(paths, columns=[self.id_col, self.vec_col])
        q = _normalize(np.asarray(queries, dtype=np.float64))
        return knn_brute(sub, q, k, self.vec_col, self.id_col)
