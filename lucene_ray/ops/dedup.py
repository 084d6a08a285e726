"""Deduplication operators (exact, MinHash+LSH, SimHash, embedding-cosine).

Ray-Data-first shapes:

- exact: content-hash in ``map_batches`` -> ``groupby(hash)`` -> keep the
  min-id row per group (the hash-partitioned analog of Lucene's
  ``updateDocument(Term, doc)`` delete-by-key upsert, IndexWriter.java:1844);
- MinHash+LSH: shingle -> vectorized minhash signature -> explode to
  (band, band_hash, id) rows -> ``groupby(band, band_hash)`` -> candidate
  pairs -> exact-Jaccard verify (the MinHashFilter analog,
  lucene/analysis/common/src/java/org/apache/lucene/analysis/minhash/MinHashFilter.java:48);
- SimHash: 64-bit signature, banded into 4x16-bit keys so pairs within
  Hamming distance 3 land in >=1 shared bucket;
- embedding cosine: blockwise matmul of normalized vectors against a
  broadcast matrix (exact for small refs; LSH-bucketed at scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MERSENNE = (1 << 61) - 1


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the minimum-id document per distinct text. Returns (id) rows."""

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        h = [hashlib.sha256(col[i].as_py().encode()).hexdigest() for i in range(len(batch))]
        return pa.table({id_col: batch.column(id_col), "h": pa.array(h, pa.string())})

    from ray.data.aggregate import Min

    kept = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )
    return kept


def _shingles(tokens: list[str], k: int) -> set[int]:
    if len(tokens) < k:
        return {hash(" ".join(tokens)) & 0xFFFFFFFFFFFF}
    out = set()
    for i in range(len(tokens) - k + 1):
        sh = " ".join(tokens[i : i + k])
        out.add(int.from_bytes(hashlib.md5(sh.encode()).digest()[:8], "little"))
    return out


class _MinHasher:
    """Vectorized universal-hash minhash: h_i(x) = (a_i*x + b_i) mod p."""

    def __init__(self, num_perm: int, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)[None, :]  # (1, n)
        # (a*x + b) mod p with python-int safety via object? use uint64 with
        # mod-p on 128-bit intermediates emulated in float-free numpy:
        prods = (self.a[:, None] * x + self.b[:, None]) % np.uint64(_MERSENNE)
        return prods.min(axis=1)


def minhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 128,
                       shingle_k: int = 3) -> ray.data.Dataset:
    from lucene_ray.index.invert import tokenize_column

    class Sig:
        def __init__(self):
            self.mh = _MinHasher(num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, doc_idx, _ = tokenize_column(batch.column(text_col))
            n = len(batch)
            toks = flat.to_pylist()
            per_doc: list[list[str]] = [[] for _ in range(n)]
            for t, d in zip(toks, doc_idx):
                per_doc[d].append(t)
            sigs = [
                self.mh.signature(np.fromiter(_shingles(per_doc[i], shingle_k), np.uint64))
                for i in range(n)
            ]
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
                }
            )

    return ds.map_batches(Sig, batch_format="pyarrow", concurrency=2)


def minhash_lsh_pairs(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 3,
                      jaccard_threshold: float = 0.5) -> pa.Table:
    """Candidate near-duplicate pairs via banded LSH, verified by estimated
    Jaccard (signature agreement). Returns (id_a, id_b, jaccard_est) rows
    with id_a < id_b, sorted."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sig_list = batch.column("sig").to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, sig in enumerate(sig_list):
            s = np.asarray(sig, dtype=np.uint64).reshape(bands, rows_per_band)
            for b in range(bands):
                key = hashlib.md5(s[b].tobytes()).hexdigest()[:16]
                out_id.append(ids[i])
                out_band.append(b)
                out_key.append(key)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.string()),
            }
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column(id_col).to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(emit_pairs, batch_format="pyarrow")
    ).to_arrow_refs()
    tables = [ray.get(r) for r in pairs]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard_est": pa.array([], pa.float64())})
    allp = pa.concat_tables(tables).to_pandas().drop_duplicates()

    # verify with full-signature agreement (estimated Jaccard)
    sig_tbl = sigs.to_pandas()
    sig_map = {r[id_col]: np.asarray(r["sig"], dtype=np.uint64) for _, r in sig_tbl.iterrows()}
    est = [
        float((sig_map[ra] == sig_map[rb]).mean())
        for ra, rb in zip(allp["id_a"], allp["id_b"])
    ]
    allp["jaccard_est"] = est
    allp = allp[allp["jaccard_est"] >= jaccard_threshold]
    allp = allp.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(allp, preserve_index=False)


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id") -> ray.data.Dataset:
    """64-bit SimHash over token hashes (weighted by tf)."""
    from lucene_ray.index.invert import tokenize_column

    def sim(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        toks = flat.to_pylist()
        hashes = np.array(
            [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in toks],
            dtype=np.uint64,
        )
        out = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            sel = hashes[doc_idx == i]
            if len(sel) == 0:
                continue
            bits = ((sel[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((votes > 0).astype(np.uint8)[::-1]).view(">u8")[0]
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(out, pa.uint64())})

    return ds.map_batches(sim, batch_format="pyarrow")


def embedding_near_dup(ds: ray.data.Dataset, threshold: float = 0.95,
                       vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """All pairs with cosine similarity >= threshold. The reference matrix is
    broadcast once (ray.put) and each batch does one matmul against it."""
    mat_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = mat_tbl[id_col].to_numpy()
    mat = np.stack(mat_tbl[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        rids, rmat = ray.get(ref)
        bids = np.asarray(batch.column(id_col))
        bmat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ rmat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < rids[jj]
        return pa.table(
            {
                "id_a": pa.array(bids[ii][keep].astype(np.int64), pa.int64()),
                "id_b": pa.array(rids[jj][keep].astype(np.int64), pa.int64()),
                "cosine": pa.array(sims[ii, jj][keep], pa.float64()),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
