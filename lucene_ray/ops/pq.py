"""Product quantization for billion-scale ANN (Jégou, Douze & Schmid,
"Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 — the
algorithm behind FAISS's IVF-PQ and the direction of Lucene's vector
quantization work, lucene/core/.../codecs/lucene99/
Lucene99ScalarQuantizedVectorsFormat.java:34 being the scalar cousin).

A d-dim float vector becomes M uint8 codes (one per d/M-dim subspace,
256-entry codebook each): d*4 bytes -> M bytes (32x at d=64, M=8). Search
uses ADC (asymmetric distance computation): per query ONE (M x 256) table
of query-subvector . codeword dot products; a database vector's approximate
score is M table lookups summed — no float vector is read during the scan.
Exact float re-scoring of the oversampled top candidates restores exact
cosines (the same rescore contract as IvfIndex.search_quantized).

Distributed shape: codebook training = the mergeable E-step/M-step kmeans
already used by the IVF coarse quantizer, run per subspace in one pass
(map_batches partial sums, tiny driver M-step); encoding = one streaming
map_batches writing (id, codes: M-byte binary) parquet; the ADC scan
streams code batches with the LUT broadcast once and returns per-batch
partial top-k (the knn_brute merge shape) — at 100 TB the scan moves
M bytes per vector through the object store instead of 4d.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_

import ray
import ray.data

from lucene_ray.ops.ann import _normalize
from lucene_ray.ops.dedup import _list_matrix


def _assign_all(mat: np.ndarray, books: np.ndarray, step: int) -> np.ndarray:
    """(n, M) codeword assignment: argmin squared distance per subspace,
    via the |x|^2 - 2x.c + |c|^2 expansion (one matmul per subspace, no
    n x k x d intermediate)."""
    m = books.shape[0]
    codes = np.empty((len(mat), m), dtype=np.int64)
    for i in range(m):
        sub = mat[:, i * step:(i + 1) * step]
        c = books[i]
        d2 = -2.0 * (sub @ c.T) + (c * c).sum(axis=1)[None, :]
        codes[:, i] = np.argmin(d2, axis=1)
    return codes


def _train_codebooks(ds: ray.data.Dataset, vec_col: str, m: int, step: int,
                     k: int, iters: int, seed: int) -> np.ndarray:
    """(M, K, step) codebooks — ALL subspaces trained together, one
    distributed E-step data pass per iteration (partial per-(subspace,
    codeword) sums/counts in map_batches, M-step on the driver)."""
    sample = ds.limit(max(k * 4, 1024)).to_pandas()
    smat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, step))
    for i in range(m):
        pick = rng.choice(len(smat), size=min(k, len(smat)), replace=False)
        cent = smat[pick][:, i * step:(i + 1) * step]
        if len(cent) < k:  # degenerate tiny corpus: jittered repeats
            extra = cent[rng.integers(0, len(cent), k - len(cent))]
            cent = np.concatenate([cent, extra + rng.normal(0, 1e-6, extra.shape)])
        books[i] = cent
    for _ in range(iters):
        bref = ray.put(books)

        def estep(batch: pa.Table) -> pa.Table:
            bk = ray.get(bref)
            mat = _list_matrix(batch.column(vec_col)).astype(np.float64)
            codes = _assign_all(mat, bk, step)
            sums = np.zeros((m, k, step))
            counts = np.zeros((m, k), dtype=np.int64)
            for i in range(m):
                np.add.at(sums[i], codes[:, i], mat[:, i * step:(i + 1) * step])
                counts[i] = np.bincount(codes[:, i], minlength=k)
            return pa.table({
                "mi": pa.array(np.repeat(np.arange(m), k), pa.int64()),
                "cid": pa.array(np.tile(np.arange(k), m), pa.int64()),
                "vsum": pa.array(sums.reshape(m * k, step).tolist(),
                                 pa.list_(pa.float64())),
                "count": pa.array(counts.reshape(-1), pa.int64()),
            })

        parts = [ray.get(r) for r in ds.map_batches(
            estep, batch_format="pyarrow").to_arrow_refs()]
        tot = pa.concat_tables([p for p in parts if len(p)])
        sums = np.zeros((m, k, step))
        counts = np.zeros((m, k), dtype=np.int64)
        mi = np.asarray(tot.column("mi"))
        cid = np.asarray(tot.column("cid"))
        vs = np.asarray(tot.column("vsum").combine_chunks().flatten()).reshape(
            len(tot), step)
        cn = np.asarray(tot.column("count"))
        np.add.at(sums, (mi, cid), vs)
        np.add.at(counts, (mi, cid), cn)
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


class PqIndex:
    """Product-quantized codes persisted as parquet + per-subspace
    codebooks in a JSON sidecar."""

    def __init__(self, index_dir: str, codebooks: np.ndarray, dim: int,
                 vec_col: str, id_col: str):
        self.index_dir = index_dir
        self.codebooks = codebooks  # (M, K, d/M) float64
        self.dim = dim
        self.vec_col = vec_col
        self.id_col = id_col
        self.m = codebooks.shape[0]

    @classmethod
    def build(cls, ds: ray.data.Dataset, index_dir: str, m: int = 8,
              k: int = 256, iters: int = 3, vec_col: str = "embedding",
              id_col: str = "vec_id", seed: int = 42) -> "PqIndex":
        first = ds.limit(1).to_pandas()
        dim = len(first[vec_col].iloc[0])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        step = dim // m
        # NOTE: vectors are unit-normalized before subspace split, so ADC
        # dot-product sums approximate the cosine directly
        norm_ds = ds.map_batches(
            lambda b: pa.table({
                id_col: b.column(id_col),
                vec_col: pa.array(
                    _normalize(_list_matrix(b.column(vec_col))).tolist(),
                    pa.list_(pa.float64())),
            }), batch_format="pyarrow")
        books = _train_codebooks(norm_ds, vec_col, m, step, k, iters, seed)
        bref = ray.put(books)

        def encode(batch: pa.Table) -> pa.Table:
            bk = ray.get(bref)
            mat = _list_matrix(batch.column(vec_col)).astype(np.float64)
            codes = _assign_all(mat, bk, step).astype(np.uint8)
            return pa.table({
                id_col: batch.column(id_col),
                "codes": pa.array(list(codes.tobytes()[j * m:(j + 1) * m]
                                       for j in range(len(mat))),
                                  pa.binary()),
            })

        tmp = index_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        norm_ds.map_batches(encode, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "codes"))
        with open(os.path.join(tmp, "pq.json"), "w") as f:
            json.dump({"dim": dim, "m": m, "k": k, "vec_col": vec_col,
                       "id_col": id_col,
                       "codebooks": books.tolist()}, f)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.replace(tmp, index_dir)
        return cls(index_dir, books, dim, vec_col, id_col)

    @classmethod
    def open(cls, index_dir: str) -> "PqIndex":
        with open(os.path.join(index_dir, "pq.json")) as f:
            meta = json.load(f)
        return cls(index_dir, np.asarray(meta["codebooks"]), meta["dim"],
                   meta["vec_col"], meta["id_col"])

    def adc_tables(self, queries: np.ndarray) -> np.ndarray:
        """(n_queries, M, K) lookup tables of query-subvector . codeword."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        step = self.dim // self.m
        return np.stack([
            q[:, i * step:(i + 1) * step] @ self.codebooks[i].T
            for i in range(self.m)
        ], axis=1)

    def search(self, queries: np.ndarray, k: int = 10,
               oversample: int = 4, source_parquet: str | None = None
               ) -> pa.Table:
        """ADC scan over the CODES (M bytes/vector) -> per-batch partial
        top k*oversample -> exact float rescore of the merged candidates
        via one pruned point-read of ``source_parquet``. Returns
        (query_id, rank, id, cosine) with EXACT cosines like knn_brute."""
        luts = self.adc_tables(queries)
        lref = ray.put(luts)
        m = self.m
        id_col = self.id_col
        kk = k * max(1, oversample)

        def scan(batch: pa.Table) -> pa.Table:
            lt = ray.get(lref)
            raw = b"".join(batch.column("codes").to_pylist())
            codes = np.frombuffer(raw, dtype=np.uint8).reshape(-1, m)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            qids, cids, scores = [], [], []
            ar = np.arange(m)
            for qi in range(lt.shape[0]):
                s = lt[qi][ar[None, :], codes].sum(axis=1)
                top = np.argsort(-s, kind="stable")[:kk]
                qids.extend([qi] * len(top))
                cids.extend(ids[top].tolist())
                scores.extend(s[top].tolist())
            return pa.table({"query_id": pa.array(qids, pa.int64()),
                             id_col: pa.array(cids, pa.int64()),
                             "approx": pa.array(scores, pa.float64())})

        codes_ds = ray.data.read_parquet(os.path.join(self.index_dir, "codes"))
        parts = [ray.get(r) for r in codes_ds.map_batches(
            scan, batch_format="pyarrow").to_arrow_refs()]
        cand = pa.concat_tables([p for p in parts if len(p)])
        out_q, out_id, out_cos = [], [], []
        if source_parquet is not None:
            import pyarrow.compute as pc

            # exact rescore: ONE pruned point-read of the candidate floats
            all_ids = sorted(set(cand.column(id_col).to_pylist()))
            src = pq_.read_table(source_parquet,
                                 columns=[id_col, self.vec_col])
            src = src.filter(pc.is_in(src.column(id_col),
                                      value_set=pa.array(all_ids)))
            vid = np.asarray(src.column(id_col), dtype=np.int64)
            vecs = _normalize(_list_matrix(src.column(self.vec_col)))
            pos = {int(v): i for i, v in enumerate(vid)}
            qn = _normalize(np.asarray(queries, dtype=np.float64))
            for qi in range(len(queries)):
                mask = np.asarray(cand.column("query_id")) == qi
                ids_q = np.asarray(cand.column(id_col))[mask]
                idx = np.array([pos[int(i)] for i in ids_q])
                cos = vecs[idx] @ qn[qi]
                order = np.lexsort((ids_q, -cos))[:k]
                out_q.extend([qi] * len(order))
                out_id.extend(ids_q[order].tolist())
                out_cos.extend(np.round(cos[order], 6).tolist())
        else:
            for qi in range(len(queries)):
                mask = np.asarray(cand.column("query_id")) == qi
                ids_q = np.asarray(cand.column(id_col))[mask]
                sc = np.asarray(cand.column("approx"))[mask]
                order = np.lexsort((ids_q, -sc))[:k]
                out_q.extend([qi] * len(order))
                out_id.extend(ids_q[order].tolist())
                out_cos.extend(np.round(sc[order], 6).tolist())
        ranks = []
        seen: dict[int, int] = {}
        for q_ in out_q:
            seen[q_] = seen.get(q_, 0) + 1
            ranks.append(seen[q_])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "rank": pa.array(ranks, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_cos, pa.float64())})


class IvfPqIndex:
    """IVF-PQ — the composition FAISS runs at billion scale and the natural
    100-TB shape here: the IVF coarse quantizer prunes to ``nprobe`` bucket
    DIRECTORIES (partition pruning), and within the probed buckets the scan
    reads M-byte PQ codes instead of 4d-byte floats (ADC), with exact float
    re-scoring of the oversampled candidates from the probed buckets'
    float files only. Layout::

        index_dir/ivf/bucket=N/*.parquet    (float vectors, from IvfIndex)
        index_dir/codes/bucket=N/*.parquet  (vec ids + M-byte codes)
        index_dir/pq.json                   (codebooks)
    """

    def __init__(self, ivf, pq: PqIndex):
        self.ivf = ivf
        self.pq = pq

    @classmethod
    def build(cls, ds: ray.data.Dataset, index_dir: str, n_clusters: int = 8,
              m: int = 8, k: int = 256, iters: int = 3,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42) -> "IvfPqIndex":
        from lucene_ray.ops.ann import IvfIndex

        ivf = IvfIndex.build(ds, os.path.join(index_dir, "ivf"),
                             n_clusters=n_clusters, iters=iters,
                             vec_col=vec_col, id_col=id_col, seed=seed)
        pq = PqIndex.build(ds, os.path.join(index_dir, "pqcodes"), m=m, k=k,
                           iters=iters, vec_col=vec_col, id_col=id_col,
                           seed=seed)
        # re-encode per bucket so codes co-partition with the IVF layout:
        # stream each bucket's float file through the SAME encoder
        step = pq.dim // pq.m
        bref = ray.put(pq.codebooks)
        for b in range(n_clusters):
            bdir = os.path.join(index_dir, "ivf", f"bucket={b}")
            if not os.path.isdir(bdir):
                continue
            out_dir = os.path.join(index_dir, "codes", f"bucket={b}")

            def encode(batch: pa.Table) -> pa.Table:
                bk = ray.get(bref)
                mat = _normalize(_list_matrix(batch.column(vec_col)))
                codes = _assign_all(mat, bk, step).astype(np.uint8)
                mm = codes.shape[1]
                raw = codes.tobytes()
                return pa.table({
                    id_col: batch.column(id_col),
                    "codes": pa.array([raw[j * mm:(j + 1) * mm]
                                       for j in range(len(mat))], pa.binary()),
                })

            ray.data.read_parquet(bdir).map_batches(
                encode, batch_format="pyarrow").write_parquet(out_dir)
        return cls(ivf, pq)

    @classmethod
    def open(cls, index_dir: str) -> "IvfPqIndex":
        from lucene_ray.ops.ann import IvfIndex

        return cls(IvfIndex.open(os.path.join(index_dir, "ivf")),
                   PqIndex.open(os.path.join(index_dir, "pqcodes")))

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 4,
               oversample: int = 4) -> pa.Table:
        """Probed-bucket ADC scan + exact rescore from the probed buckets'
        float files (both reads pruned to nprobe/n_clusters of the data;
        the code read is a further ~4d/M times smaller)."""
        import pyarrow.compute as pc

        float_paths = self.ivf.probed_paths(queries, nprobe)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          self.pq.id_col: pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if not float_paths:
            return empty
        code_dirs = sorted({
            p.replace(os.sep + "ivf" + os.sep,
                      os.sep + "codes" + os.sep).rsplit(os.sep, 1)[0]
            for p in float_paths
        })
        # a LIST of paths is treated as files by read_parquet: expand dirs
        code_files = [
            os.path.join(d, f)
            for d in code_dirs
            if os.path.isdir(d)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        luts = self.pq.adc_tables(queries)
        lref = ray.put(luts)
        m = self.pq.m
        id_col = self.pq.id_col
        kk = k * max(1, oversample)

        def scan(batch: pa.Table) -> pa.Table:
            lt = ray.get(lref)
            raw = b"".join(batch.column("codes").to_pylist())
            codes = np.frombuffer(raw, dtype=np.uint8).reshape(-1, m)
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            qids, cids, scores = [], [], []
            ar = np.arange(m)
            for qi in range(lt.shape[0]):
                s = lt[qi][ar[None, :], codes].sum(axis=1)
                top = np.argsort(-s, kind="stable")[:kk]
                qids.extend([qi] * len(top))
                cids.extend(ids[top].tolist())
                scores.extend(s[top].tolist())
            return pa.table({"query_id": pa.array(qids, pa.int64()),
                             id_col: pa.array(cids, pa.int64()),
                             "approx": pa.array(scores, pa.float64())})

        parts = [ray.get(r) for r in ray.data.read_parquet(code_files).map_batches(
            scan, batch_format="pyarrow").to_arrow_refs()]
        parts = [p for p in parts if len(p)]
        if not parts:
            return empty
        cand = pa.concat_tables(parts)
        # exact rescore from ONLY the probed buckets' float files
        src = pa.concat_tables([
            pq_.read_table(p, columns=[id_col, self.pq.vec_col])
            for p in float_paths
        ])
        all_ids = pa.array(sorted(set(cand.column(id_col).to_pylist())))
        src = src.filter(pc.is_in(src.column(id_col), value_set=all_ids))
        vid = np.asarray(src.column(id_col), dtype=np.int64)
        vecs = _normalize(_list_matrix(src.column(self.pq.vec_col)))
        pos = {int(v): i for i, v in enumerate(vid)}
        qn = _normalize(np.asarray(queries, dtype=np.float64))
        out_q, out_id, out_cos = [], [], []
        for qi in range(len(queries)):
            mask = np.asarray(cand.column("query_id")) == qi
            ids_q = np.asarray(cand.column(id_col))[mask]
            idx = np.array([pos[int(i)] for i in ids_q])
            cos = vecs[idx] @ qn[qi]
            order = np.lexsort((ids_q, -cos))[:k]
            out_q.extend([qi] * len(order))
            out_id.extend(ids_q[order].tolist())
            out_cos.extend(np.round(cos[order], 6).tolist())
        ranks = []
        seen: dict[int, int] = {}
        for q_ in out_q:
            seen[q_] = seen.get(q_, 0) + 1
            ranks.append(seen[q_])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "rank": pa.array(ranks, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_cos, pa.float64())})
