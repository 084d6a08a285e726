"""HNSW graph ANN — the HnswGraphBuilder/HnswGraphSearcher analog
(lucene/core/src/java/org/apache/lucene/util/hnsw/HnswGraphBuilder.java:43,
HnswGraphSearcher.java), following the public algorithm of Malkov &
Yashunin (2016, arXiv:1603.09320).

Distribution model: one graph per BLOCK of vectors (the shard unit — Lucene
builds one graph per segment the same way). ``HnswIndex.build`` repartitions
the dataset into blocks, each map_batches task builds its block's graph and
persists it (vectors parquet + neighbor arrays npz) under
``index_dir/block=N/``; ``search`` fans the query over block graphs and
heap-merges — per-block search is sublinear (greedy descent + beam), and
blocks are independent so a 256-node cluster builds/searches them in
parallel.

Cosine similarity on normalized vectors throughout (same metric as
``knn_brute``), so recall is measured against the exact brute-force oracle.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from lucene_ray.ops.ann import _normalize
from lucene_ray.ops.dedup import _list_matrix


class _HnswGraph:
    """In-memory multi-layer graph over a (n, d) normalized matrix."""

    def __init__(self, mat: np.ndarray, m: int = 16, ef_construction: int = 100,
                 seed: int = 42):
        self.mat = mat
        self.m = m
        self.m0 = 2 * m  # layer-0 degree bound (Lucene uses 2*M too)
        self.ef_c = ef_construction
        n = len(mat)
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(m)
        self.levels = np.minimum(
            (-np.log(rng.random(n)) * ml).astype(np.int64), 8
        )
        self.max_level = int(self.levels.max(initial=0)) if n else 0
        # neighbors[level][node] -> np.ndarray of neighbor ids
        self.neighbors: list[dict[int, np.ndarray]] = [
            {} for _ in range(self.max_level + 1)
        ]
        self.entry = 0
        if n:
            self._build()

    # ---- construction ----

    def _sims(self, q: np.ndarray, ids) -> np.ndarray:
        return self.mat[ids] @ q

    def _greedy(self, q: np.ndarray, ep: int, level: int) -> int:
        """Descend to the locally closest node at a level."""
        best = ep
        best_sim = float(self.mat[best] @ q)
        improved = True
        while improved:
            improved = False
            nbrs = self.neighbors[level].get(best)
            if nbrs is None or len(nbrs) == 0:
                break
            sims = self._sims(q, nbrs)
            j = int(np.argmax(sims))
            if sims[j] > best_sim:
                best, best_sim = int(nbrs[j]), float(sims[j])
                improved = True
        return best

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      level: int) -> list[tuple[float, int]]:
        """Beam search: returns up to ef (sim, node) pairs, best-first."""
        visited = set(eps)
        cand: list[tuple[float, int]] = []  # max-heap via negative sim
        result: list[tuple[float, int]] = []  # min-heap of (sim, node)
        for e in eps:
            s = float(self.mat[e] @ q)
            heapq.heappush(cand, (-s, e))
            heapq.heappush(result, (s, e))
        while cand:
            cs, c = heapq.heappop(cand)
            if -cs < result[0][0] and len(result) >= ef:
                break
            nbrs = self.neighbors[level].get(c)
            if nbrs is None or len(nbrs) == 0:
                continue
            new = [int(x) for x in nbrs if int(x) not in visited]
            if not new:
                continue
            visited.update(new)
            sims = self._sims(q, new)
            worst = result[0][0]
            for s, nd in zip(sims, new):
                s = float(s)
                if len(result) < ef or s > worst:
                    heapq.heappush(result, (s, nd))
                    heapq.heappush(cand, (-s, nd))
                    if len(result) > ef:
                        heapq.heappop(result)
                    worst = result[0][0]
        return sorted(result, reverse=True)

    def _select(self, pairs: list[tuple[float, int]], m: int) -> np.ndarray:
        return np.array([n for _, n in pairs[:m]], dtype=np.int32)

    def _build(self) -> None:
        for i in range(1, len(self.mat)):
            q = self.mat[i]
            l = int(self.levels[i])
            ep = self.entry
            top = int(self.levels[self.entry])
            for lev in range(top, l, -1):
                ep = self._greedy(q, ep, lev)
            eps = [ep]
            for lev in range(min(l, top), -1, -1):
                found = self._search_layer(q, eps, self.ef_c, lev)
                mmax = self.m0 if lev == 0 else self.m
                conn = self._select(found, self.m)
                self.neighbors[lev][i] = conn
                for c in conn:
                    c = int(c)
                    cur = self.neighbors[lev].get(c)
                    if cur is None:
                        self.neighbors[lev][c] = np.array([i], dtype=np.int32)
                    elif len(cur) < mmax:
                        self.neighbors[lev][c] = np.append(cur, np.int32(i))
                    else:
                        # prune: keep the mmax most similar to c
                        allc = np.append(cur, np.int32(i))
                        sims = self._sims(self.mat[c], allc)
                        keep = np.argsort(-sims)[:mmax]
                        self.neighbors[lev][c] = allc[keep]
                eps = [n for _, n in found]
            if l > top:
                self.entry = i
                self.max_level = l

    # ---- search ----

    def search(self, q: np.ndarray, k: int, ef: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """(local ids, sims), best-first, ties broken by id asc."""
        if len(self.mat) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        ep = self.entry
        for lev in range(int(self.levels[self.entry]), 0, -1):
            ep = self._greedy(q, ep, lev)
        found = self._search_layer(q, [ep], max(ef, k), 0)
        pairs = sorted(((-s, n) for s, n in found))
        ids = np.array([n for _, n in pairs[:k]], dtype=np.int64)
        sims = np.array([-s for s, _ in pairs[:k]], dtype=np.float64)
        return ids, sims

    # ---- (de)serialization ----

    def to_arrays(self) -> dict:
        out = {"levels": self.levels, "entry": np.array([self.entry]),
               "max_level": np.array([self.max_level])}
        for lev, d in enumerate(self.neighbors):
            if not d:
                continue
            nodes = np.array(sorted(d), dtype=np.int64)
            lens = np.array([len(d[int(x)]) for x in nodes], dtype=np.int64)
            flat = (np.concatenate([d[int(x)] for x in nodes])
                    if len(nodes) else np.zeros(0, np.int32))
            out[f"l{lev}_nodes"] = nodes
            out[f"l{lev}_lens"] = lens
            out[f"l{lev}_flat"] = flat
        return out

    @classmethod
    def from_arrays(cls, mat: np.ndarray, arrays: dict) -> "_HnswGraph":
        g = cls.__new__(cls)
        g.mat = mat
        g.levels = arrays["levels"]
        g.entry = int(arrays["entry"][0])
        g.max_level = int(arrays["max_level"][0])
        g.neighbors = [{} for _ in range(g.max_level + 1)]
        for lev in range(g.max_level + 1):
            if f"l{lev}_nodes" not in arrays:
                continue
            nodes = arrays[f"l{lev}_nodes"]
            lens = arrays[f"l{lev}_lens"]
            flat = arrays[f"l{lev}_flat"]
            ends = np.cumsum(lens)
            starts = ends - lens
            g.neighbors[lev] = {
                int(n): flat[s:e] for n, s, e in zip(nodes, starts, ends)
            }
        return g


def _load_block(index_dir: str, name: str, vec_col: str, id_col: str):
    """Load a block's (ids, normalized matrix, graph). When the block was
    written with the scalar-quantized columns (q8/qmin/qscale — the
    Lucene99ScalarQuantizedVectorsFormat analog), ONLY those are read
    (column pruning, ~4x fewer vector bytes than the float column) and the
    matrix is dequantized at load; legacy float-only blocks still load."""
    path = os.path.join(index_dir, name, "vectors.parquet")
    pf = pq.ParquetFile(path)
    if "q8" in pf.schema_arrow.names:
        t = pf.read(columns=[id_col, "q8", "qmin", "qscale"])
        from lucene_ray.ops.ann import dequantize_rows

        raw = dequantize_rows(
            _list_matrix(t.column("q8"), dtype=np.float64),
            np.asarray(t.column("qmin"), dtype=np.float64),
            np.asarray(t.column("qscale"), dtype=np.float64),
        )
    else:
        t = pf.read(columns=[id_col, vec_col])
        raw = _list_matrix(t.column(vec_col))
    ids = np.asarray(t.column(id_col), dtype=np.int64)
    mat = _normalize(raw)
    arrays = dict(np.load(os.path.join(index_dir, name, "graph.npz")))
    return ids, mat, _HnswGraph.from_arrays(mat, arrays)


@ray.remote(num_cpus=0)
class HnswShardActor:
    """Serving actor owning a fixed subset of blocks — vectors + graphs
    loaded ONCE in __init__ and reused across every search (the
    HnswGraphSearcher-behind-an-IndexSearcher pattern; same actor shape as
    pipelines.bulk_search.QueryShardActor). num_cpus=0 for the same reason
    documented there: long-lived serving actors must not hold CPU
    reservations that deadlock co-running Dataset pipelines."""

    def __init__(self, index_dir: str, names: list[str], vec_col: str,
                 id_col: str):
        self.blocks = [
            _load_block(index_dir, n, vec_col, id_col) for n in names
        ]

    def search(self, q: np.ndarray, k: int, ef: int) -> list[list[tuple[float, int]]]:
        """Per query: top-k (sim, global id) across this actor's blocks,
        ties (sim desc, id asc) — a partial for the driver's k-way merge."""
        out = []
        for qi in range(len(q)):
            merged: list[tuple[float, int]] = []
            for ids, _mat, g in self.blocks:
                loc, sims = g.search(q[qi], k, ef)
                merged.extend(
                    (float(s), int(ids[l])) for l, s in zip(loc, sims)
                )
            merged.sort(key=lambda t: (-t[0], t[1]))
            out.append(merged[:k])
        return out


class HnswIndex:
    """Block-partitioned persisted HNSW (one graph per block).

    Serving is DISTRIBUTED: ``search`` fans queries over an actor pool in
    which each actor owns a disjoint block subset (graphs+vectors loaded in
    its ``__init__``, never on the driver) and the driver merges tiny
    per-actor top-k partials — at 100 TB the index lives on the serving
    actors' nodes, the driver holds only actor handles."""

    def __init__(self, index_dir: str, vec_col: str, id_col: str):
        self.index_dir = index_dir
        self.vec_col = vec_col
        self.id_col = id_col
        self._actors: list | None = None

    @classmethod
    def build(cls, ds: ray.data.Dataset, index_dir: str, m: int = 16,
              ef_construction: int = 100, blocks: int = 4,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42) -> "HnswIndex":
        os.makedirs(index_dir, exist_ok=True)

        def build_block(batch: pa.Table, _ctr=[0]) -> pa.Table:
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            if len(ids) == 0:
                return pa.table({"block": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            raw = _list_matrix(batch.column(vec_col))
            mat = _normalize(raw)
            # graph built on EXACT floats; serving scans the quantized copy
            g = _HnswGraph(mat, m=m, ef_construction=ef_construction, seed=seed)
            # deterministic block name from its id range
            name = f"block-{ids.min():012d}-{ids.max():012d}-{len(ids)}"
            bdir = os.path.join(index_dir, name)
            os.makedirs(bdir, exist_ok=True)
            from lucene_ray.ops.ann import quantize_rows

            q, mn, sc = quantize_rows(raw)
            d = q.shape[1] if len(q) else 0
            q8 = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(q) + 1) * d, d, dtype=np.int32)),
                pa.array(q.ravel(), pa.uint8()),
            )
            out = batch.select([id_col, vec_col])
            out = out.append_column("q8", q8)
            out = out.append_column("qmin", pa.array(mn, pa.float64()))
            out = out.append_column("qscale", pa.array(sc, pa.float64()))
            pq.write_table(out, os.path.join(bdir, "vectors.parquet"))
            np.savez(os.path.join(bdir, "graph.npz"), **g.to_arrays())
            return pa.table({"block": pa.array([name]),
                             "n": pa.array([len(ids)], pa.int64())})

        built = ds.repartition(blocks).map_batches(
            build_block, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        meta = {"vec_col": vec_col, "id_col": id_col,
                "blocks": sorted(built["block"].tolist())}
        import json

        with open(os.path.join(index_dir, "hnsw_meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(index_dir, vec_col, id_col)

    @classmethod
    def open(cls, index_dir: str) -> "HnswIndex":
        import json

        with open(os.path.join(index_dir, "hnsw_meta.json")) as f:
            meta = json.load(f)
        return cls(index_dir, meta["vec_col"], meta["id_col"])

    def blocks(self) -> list[str]:
        import json

        with open(os.path.join(self.index_dir, "hnsw_meta.json")) as f:
            return json.load(f)["blocks"]

    def _pool(self, concurrency: int) -> list:
        if self._actors is None:
            names = self.blocks()
            n = min(concurrency, max(1, len(names)))
            self._actors = [
                HnswShardActor.remote(
                    self.index_dir, names[i::n], self.vec_col, self.id_col
                )
                for i in range(n)
            ]
        return self._actors

    def search(self, queries: np.ndarray, k: int = 10, ef: int = 64,
               concurrency: int = 4) -> pa.Table:
        """(query_id, rank, id, cosine): distributed per-block graph search
        + driver merge of per-actor top-k partials (ties: cosine desc, id
        asc — same contract as knn_brute). Block data never touches the
        driver."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        rows = {"query_id": [], "rank": [], self.id_col: [], "cosine": []}
        actors = self._pool(concurrency)
        qref = ray.put(q)
        parts = ray.get([a.search.remote(qref, k, ef) for a in actors])
        for qi in range(len(q)):
            merged: list[tuple[float, int]] = []
            for p in parts:
                merged.extend(tuple(x) for x in p[qi])
            merged.sort(key=lambda t: (-t[0], t[1]))
            for r, (s, gid) in enumerate(merged[:k], 1):
                rows["query_id"].append(qi)
                rows["rank"].append(r)
                rows[self.id_col].append(int(gid))
                rows["cosine"].append(s)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "rank": pa.array(rows["rank"], pa.int64()),
                self.id_col: pa.array(rows[self.id_col], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )
