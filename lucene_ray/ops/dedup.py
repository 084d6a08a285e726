"""Deduplication operators (exact, MinHash+LSH, SimHash, embedding-cosine).

Ray-Data-first shapes, all streaming (nothing materializes a full dataset on
the driver — only the final, small pair/kept-id tables):

- exact: content-hash in ``map_batches`` -> ``groupby(hash)`` -> keep the
  min-id row per group (the hash-partitioned analog of Lucene's
  ``updateDocument(Term, doc)`` delete-by-key upsert, IndexWriter.java:1844);
- MinHash+LSH: vectorized shingle hashing -> minhash signature (universal
  hashes (a*x+b) mod p, chunked ``np.minimum.reduceat``) -> explode to
  (band, band_key, id, sig) rows -> ``groupby(band, band_key)`` emits pairs
  AND verifies them in-group (the signatures are already in the group, so no
  driver-side signature table is ever built) -> ``groupby(id_a, id_b)``
  dedups across bands (the MinHashFilter analog,
  lucene/analysis/common/src/java/org/apache/lucene/analysis/minhash/MinHashFilter.java:48);
- SimHash: 64-bit signature via 64 ``np.bincount`` votes, banded into
  4x16-bit keys so pairs within Hamming distance 3 land in >=1 shared
  bucket; ``simhash_pairs`` verifies Hamming distance in-group;
- embedding cosine: EXACT block-pair path (every pair of Arrow blocks is a
  Ray task doing one matmul — O(N^2) compute, O(N^2/B^2) per task, nothing
  on the driver but block refs) and an approximate hyperplane-LSH bucketed
  path for high thresholds at 100-TB scale.

Determinism: every hash is content-derived (md5 / fixed multipliers / seeded
rng) — no Python ``hash()`` anywhere, so outputs are identical across
workers, runs, and PYTHONHASHSEED values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)
# 64-bit odd mixing constants (Knuth LCG / FNV-1a prime); uint64 wrap is the
# intended semantics for the shingle/band combiners
_POLY_MULT = np.uint64(6364136223846793005)
_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the minimum-id document per distinct text. Returns (id) rows."""

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # one bulk to_pylist (the sha256 per row is inherent; per-element
        # .as_py() scalar boxing in the hot map stage was not)
        h = [hashlib.sha256(s.encode()).hexdigest() for s in col.to_pylist()]
        return pa.table({id_col: batch.column(id_col), "h": pa.array(h, pa.string())})

    from ray.data.aggregate import Min

    kept = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )
    return kept


def _token_hash64(flat_tokens: pa.Array) -> np.ndarray:
    """Content-deterministic 64-bit hash per token: md5 over the (small)
    unique vocab, broadcast to occurrences via dictionary indices."""
    if len(flat_tokens) == 0:
        return np.zeros(0, dtype=np.uint64)
    d = flat_tokens.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    vocab = d.dictionary.to_pylist()
    vh = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in vocab),
        dtype=np.uint64,
        count=len(vocab),
    )
    return vh[np.asarray(d.indices, dtype=np.int64)]


def _shingle_keys(tok_h: np.ndarray, doc_idx: np.ndarray, n_docs: int,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc, shingle_hash32) of every k-token shingle, vectorized.

    Shingle hash = polynomial combine (uint64 wrap) of the k token hashes,
    folded to 32 bits — 32-bit values keep the universal-hash products below
    2^64 (no wrap before the mod-p in the minhash). Docs with fewer than k
    tokens contribute one whole-doc shingle (poly over all their tokens).
    """
    n_tok = len(tok_h)
    counts = np.bincount(doc_idx, minlength=n_docs) if n_tok else np.zeros(n_docs, np.int64)
    out_doc, out_hash = [], []
    if n_tok >= k:
        # windows whose k tokens all belong to the same doc
        valid = doc_idx[: n_tok - k + 1] == doc_idx[k - 1 :]
        h = tok_h[: n_tok - k + 1].copy()
        for j in range(1, k):
            h = h * _POLY_MULT + tok_h[j : n_tok - k + 1 + j]
        out_doc.append(doc_idx[: n_tok - k + 1][valid])
        out_hash.append(h[valid])
    # short (but non-empty) docs: one shingle = poly over all their tokens
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short):
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        sh = np.empty(len(short), dtype=np.uint64)
        with np.errstate(over="ignore"):  # uint64 wrap is the hash semantics
            for i, d in enumerate(short):  # bounded: only docs with < k tokens
                h = np.uint64(0)
                for t in tok_h[starts[d] : starts[d + 1]]:
                    h = h * _POLY_MULT + t
                sh[i] = h
        out_doc.append(short.astype(np.int64))
        out_hash.append(sh)
    if not out_doc:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    docs = np.concatenate(out_doc)
    hashes = np.concatenate(out_hash)
    h32 = ((hashes >> np.uint64(32)) ^ (hashes & np.uint64(0xFFFFFFFF)))
    # unique (doc, shingle) pairs, sorted by doc — the shingle SET per doc
    key = (docs.astype(np.uint64) << np.uint64(32)) | h32
    key = np.unique(key)
    return (key >> np.uint64(32)).astype(np.int64), key & np.uint64(0xFFFFFFFF)


class _MinHasher:
    """Universal-hash minhash h_i(x) = (a_i*x + b_i) mod p, p = 2^61-1.

    a, b < 2^32 and x < 2^32, so a*x + b < 2^64: the product cannot wrap
    before the mod — the hash family really is the stated (a*x+b) mod p."""

    def __init__(self, num_perm: int, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signatures(self, sh_doc: np.ndarray, sh_hash: np.ndarray,
                   n_docs: int) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix; docs with no shingles
        get the sentinel p (empty-set signature). Vectorized: permutations
        processed in chunks of 16, per-doc min via ``np.minimum.reduceat``."""
        sigs = np.full((n_docs, self.num_perm), _MERSENNE, dtype=np.uint64)
        if len(sh_doc) == 0:
            return sigs
        # group starts per doc present (sh_doc is sorted ascending)
        chg = np.empty(len(sh_doc), dtype=bool)
        chg[0] = True
        chg[1:] = sh_doc[1:] != sh_doc[:-1]
        starts = np.flatnonzero(chg)
        present = sh_doc[starts]
        for c0 in range(0, self.num_perm, 16):
            a = self.a[c0 : c0 + 16, None]
            b = self.b[c0 : c0 + 16, None]
            vals = (a * sh_hash[None, :] + b) % _MERSENNE  # (chunk, n_shingles)
            mins = np.minimum.reduceat(vals, starts, axis=1)  # (chunk, n_present)
            sigs[present, c0 : c0 + 16] = mins.T
        return sigs


def minhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 128,
                       shingle_k: int = 3, seed: int = 42) -> ray.data.Dataset:
    from lucene_ray.index.invert import tokenize_column

    def sig(batch: pa.Table) -> pa.Table:
        mh = _MinHasher(num_perm, seed)
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        tok_h = _token_hash64(flat)
        sh_doc, sh_hash = _shingle_keys(tok_h, doc_idx, n, shingle_k)
        sigs = mh.signatures(sh_doc, sh_hash, n)
        offsets = np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32)
        sig_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(sigs.ravel(), pa.uint64())
        )
        return pa.table({id_col: batch.column(id_col), "sig": sig_arr})

    return ds.map_batches(sig, batch_format="pyarrow")


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.flatten(), dtype=np.uint64).reshape(len(arr), num_perm)


def minhash_lsh_pairs(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 3,
                      jaccard_threshold: float = 0.5,
                      max_bucket_docs: int = 4096,
                      seed: int = 42) -> pa.Table:
    """Near-duplicate pairs via banded LSH, verified by estimated Jaccard
    (full-signature agreement) INSIDE the band group — signatures travel
    with the exploded band rows, so verification needs no driver-side
    signature table and no second shuffle join. Cross-band duplicates are
    collapsed by a ``groupby(id_a, id_b)`` aggregate. Returns
    (id_a, id_b, jaccard_est) with id_a < id_b, sorted.

    Skew guard: a bucket larger than ``max_bucket_docs`` (a degenerate
    near-identical cluster) emits only the consecutive-id chain instead of
    all O(B^2) pairs — connected components are preserved, output stays
    O(B) per bucket.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k, seed)

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sm = _sig_matrix(batch.column("sig"), num_perm)  # (n, num_perm)
        b3 = sm.reshape(n, bands, rows_per_band)
        # vectorized FNV-1a-style band key over the band's minhash values
        key = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
        for r in range(rows_per_band):
            key = (key ^ b3[:, :, r]) * _FNV_PRIME
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        sig_col = batch.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        rep = pa.array(np.repeat(np.arange(n), bands))
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "key": pa.array(key.ravel(), pa.uint64()),
                "sig": sig_col.take(rep),
            }
        )

    empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "jaccard_est": pa.array([], pa.float64())}
    )

    def emit_verified_pairs(group: pa.Table) -> pa.Table:
        g = len(group)
        if g < 2:
            return empty_pairs
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sm = _sig_matrix(group.column("sig"), num_perm)[order]
        if g > max_bucket_docs:
            ii = np.arange(g - 1)
            jj = ii + 1
        else:
            ii, jj = np.triu_indices(g, 1)
        est = (sm[ii] == sm[jj]).mean(axis=1)
        keep = est >= jaccard_threshold
        return pa.table(
            {
                "id_a": pa.array(ids[ii[keep]], pa.int64()),
                "id_b": pa.array(ids[jj[keep]], pa.int64()),
                "jaccard_est": pa.array(est[keep], pa.float64()),
            }
        )

    from ray.data.aggregate import Max

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(emit_verified_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Max("jaccard_est", alias_name="jaccard_est"))
    )
    out = pairs.to_pandas()  # final pair table only — small by construction
    if out.empty:
        return empty_pairs
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _shingle_sets64(tok_h: np.ndarray, doc_idx: np.ndarray, n_docs: int,
                    k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-unique FULL-64-bit shingle hashes (no 32-bit fold, so
    a hash collision inside a compared pair is ~2^-64 — exact Jaccard needs
    exact set sizes). Same windowing rules as :func:`_shingle_keys`:
    k-token polynomial windows; docs shorter than k contribute one
    whole-doc shingle. Returns (doc, hash) sorted by (doc, hash)."""
    n_tok = len(tok_h)
    counts = np.bincount(doc_idx, minlength=n_docs) if n_tok else np.zeros(n_docs, np.int64)
    out_doc, out_hash = [], []
    if n_tok >= k:
        valid = doc_idx[: n_tok - k + 1] == doc_idx[k - 1 :]
        h = tok_h[: n_tok - k + 1].copy()
        for j in range(1, k):
            h = h * _POLY_MULT + tok_h[j : n_tok - k + 1 + j]
        out_doc.append(doc_idx[: n_tok - k + 1][valid])
        out_hash.append(h[valid])
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short):
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        sh = np.empty(len(short), dtype=np.uint64)
        with np.errstate(over="ignore"):  # uint64 wrap is the hash semantics
            for i, d in enumerate(short):
                h = np.uint64(0)
                for t in tok_h[starts[d] : starts[d + 1]]:
                    h = h * _POLY_MULT + t
                sh[i] = h
        out_doc.append(short.astype(np.int64))
        out_hash.append(sh)
    if not out_doc:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    docs = np.concatenate(out_doc)
    hashes = np.concatenate(out_hash)
    order = np.lexsort((hashes, docs))
    docs, hashes = docs[order], hashes[order]
    keep = np.ones(len(docs), dtype=bool)
    keep[1:] = (docs[1:] != docs[:-1]) | (hashes[1:] != hashes[:-1])
    return docs[keep], hashes[keep]


def ngram_jaccard_pairs(ds: ray.data.Dataset, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 3,
                        threshold: float = 0.5,
                        max_bucket_docs: int = 4096) -> pa.Table:
    """EXACT n-gram-Jaccard near-duplicate pairs via prefix filtering —
    the deterministic, oracle-checkable sibling of :func:`minhash_lsh_pairs`
    (which only estimates Jaccard from signatures).

    Candidate generation is the SSJoin/PPJoin prefix filter (Chaudhuri,
    Ganti & Kaushik, ICDE'06; Xiao et al., WWW'08): order each doc's
    shingle-hash set ascending and emit only its first
    ``|d| - ceil(t*|d|) + 1`` hashes as candidate keys — if two sets with
    Jaccard >= t existed whose prefixes were disjoint, their intersection
    would be < ceil(t*|smaller|), contradicting J >= t. Each candidate row
    carries the doc's full sorted set, so ``groupby(prefix_hash)`` groups
    verify EXACT Jaccard in-group (sorted-array intersections) with no
    driver-side set table and no second shuffle; ``groupby(id_a, id_b)``
    collapses cross-prefix duplicates.

    Scale: shuffle volume is sum over docs of prefix_len x set_size hashes
    ~= (1-t) * len^2 per doc — fine for web-scale docs (KBs) at t >= 0.5;
    the ``max_bucket_docs`` guard chains degenerate identical-prefix
    clusters instead of emitting O(B^2) pairs.

    Returns (id_a, id_b, jaccard) float64, id_a < id_b, sorted.
    """
    from lucene_ray.index.invert import tokenize_column

    def explode_prefixes(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        tok_h = _token_hash64(flat)
        sh_doc, sh_hash = _shingle_sets64(tok_h, doc_idx, n, shingle_k)
        sizes = np.bincount(sh_doc, minlength=n)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=starts[1:])
        # prefix length per doc: |d| - ceil(t*|d|) + 1 (0 for empty docs)
        pref = np.where(
            sizes > 0,
            sizes - np.ceil(threshold * sizes).astype(np.int64) + 1,
            0,
        )
        # row r of doc d carries prefix hash sh_hash[starts[d]+r]
        doc_of_row = np.repeat(np.arange(n), pref)
        within = np.concatenate([np.arange(p) for p in pref]) if len(pref) else np.zeros(0, np.int64)
        pref_hash = sh_hash[starts[doc_of_row] + within] if len(doc_of_row) else np.zeros(0, np.uint64)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        set_list = pa.ListArray.from_arrays(
            pa.array(starts.astype(np.int32), pa.int32()),
            pa.array(sh_hash, pa.uint64()),
        )
        if isinstance(set_list, pa.ChunkedArray):  # pragma: no cover
            set_list = set_list.combine_chunks()
        return pa.table(
            {
                "p": pa.array(pref_hash, pa.uint64()),
                id_col: pa.array(ids[doc_of_row], pa.int64()),
                "sset": set_list.take(pa.array(doc_of_row, pa.int64())),
            }
        )

    empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )

    def verify_exact(group: pa.Table) -> pa.Table:
        g = len(group)
        if g < 2:
            return empty_pairs
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        col = group.column("sset")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sets = [np.asarray(col[int(i)].values, dtype=np.uint64) for i in order]
        if g > max_bucket_docs:
            ii = np.arange(g - 1)
            jj = ii + 1
        else:
            ii, jj = np.triu_indices(g, 1)
        ia, ib, jac = [], [], []
        for x, y in zip(ii, jj):
            if ids[x] == ids[y]:
                continue  # same doc met through two prefix hashes
            a, b = sets[x], sets[y]
            c = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - c
            j = c / union if union else 0.0
            if j >= threshold:
                ia.append(ids[x]); ib.append(ids[y]); jac.append(j)
        if not ia:
            return empty_pairs
        return pa.table(
            {"id_a": pa.array(ia, pa.int64()), "id_b": pa.array(ib, pa.int64()),
             "jaccard": pa.array(jac, pa.float64())}
        )

    from ray.data.aggregate import Max

    pairs = (
        ds.map_batches(explode_prefixes, batch_format="pyarrow")
        .groupby("p")
        .map_groups(verify_exact, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Max("jaccard", alias_name="jaccard"))
    )
    out = pairs.to_pandas()  # final pair table only — small by construction
    if out.empty:
        return empty_pairs
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def connected_components(pairs: pa.Table, col_a: str = "id_a",
                         col_b: str = "id_b") -> pa.Table:
    """Connected components over a near-duplicate pair list: every node gets
    ``cluster_id`` = the minimum id in its component — the canonical
    keep-one-per-duplicate-cluster step after any pair-producing dedup
    (exact Jaccard, MinHash-LSH, SimHash, embedding cosine).

    Vectorized min-label propagation with pointer jumping: per round, each
    edge relaxes both endpoints to the smaller label (``np.minimum.at``),
    then labels chase their own label's label (``lab = lab[lab]``), halving
    path lengths — O((E+N) log N) total work, no per-node Python loop.
    The pair list is output-sized (pairs << corpus, produced by the
    distributed pair stages); at cluster scale shard it by component via
    iterated hash-to-min groupbys with the same per-round kernel.

    Returns (doc_id, cluster_id) int64, sorted by doc_id, one row per node
    appearing in ``pairs`` (singletons are their own cluster by definition
    and are omitted, as they need no dedup decision)."""
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})
    a = np.asarray(pairs.column(col_a), dtype=np.int64)
    b = np.asarray(pairs.column(col_b), dtype=np.int64)
    # np.unique inverse gives compacted edge endpoints in one pass
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, ia, lab[ib])
        np.minimum.at(new, ib, lab[ia])
        new = new[new]  # pointer jumping
        if np.array_equal(new, lab):
            break
        lab = new
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array(nodes[lab], pa.int64()),
        }
    )


def ngram_jaccard_clusters(ds: ray.data.Dataset, text_col: str = "text",
                           id_col: str = "doc_id", shingle_k: int = 3,
                           threshold: float = 0.5) -> pa.Table:
    """Duplicate clusters from EXACT n-gram-Jaccard pairs: (doc_id,
    cluster_id) with cluster_id = min doc id in the connected component —
    deterministic and SQL-checkable (recursive-CTE transitive closure)."""
    pairs = ngram_jaccard_pairs(ds, text_col, id_col, shingle_k, threshold)
    return connected_components(pairs)


def embedding_near_dup_clusters(ds: ray.data.Dataset, threshold: float = 0.95,
                                vec_col: str = "embedding",
                                id_col: str = "vec_id") -> pa.Table:
    """Duplicate clusters from exact cosine near-dup pairs: (doc_id,
    cluster_id) with cluster_id = min member — the keep-one-per-cluster
    step for embedding dedup; exact, recursive-CTE-checkable."""
    pairs = embedding_near_dup(ds, threshold, vec_col, id_col)
    return connected_components(pairs)


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id") -> ray.data.Dataset:
    """64-bit SimHash over token hashes (weighted by tf), vectorized: one
    ``np.bincount`` vote per bit — no per-doc scans."""
    from lucene_ray.index.invert import tokenize_column

    def sim(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        hashes = _token_hash64(flat)
        totals = np.bincount(doc_idx, minlength=n).astype(np.int64)
        out = np.zeros(n, dtype=np.uint64)
        for j in range(64):
            ones = np.bincount(
                doc_idx, weights=(hashes >> np.uint64(j)) & np.uint64(1), minlength=n
            )
            # bit j set iff +1 votes outnumber -1 votes (sum(2b-1) > 0)
            out |= (2 * ones > totals).astype(np.uint64) << np.uint64(j)
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(out, pa.uint64())})

    return ds.map_batches(sim, batch_format="pyarrow")


def simhash_pairs(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by SimHash: 4x16-bit bands guarantee any pair within
    Hamming distance 3 shares >=1 band bucket (pigeonhole); candidates are
    verified (popcount of XOR) inside the band group. Returns
    (id_a, id_b, hamming), id_a < id_b, sorted."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        h = np.asarray(batch.column("simhash"), dtype=np.uint64)
        bands_ = np.empty((n, 4), dtype=np.uint64)
        for b in range(4):
            bands_[:, b] = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        return pa.table(
            {
                id_col: pa.array(np.repeat(np.asarray(batch.column(id_col)), 4), pa.int64()),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
                "key": pa.array(bands_.ravel(), pa.uint64()),
                "simhash": pa.array(np.repeat(h, 4), pa.uint64()),
            }
        )

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})

    def verify(group: pa.Table) -> pa.Table:
        g = len(group)
        if g < 2:
            return empty
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        h = np.asarray(group.column("simhash"), dtype=np.uint64)[order]
        ii, jj = np.triu_indices(g, 1)
        x = h[ii] ^ h[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        for j in range(64):
            ham += ((x >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table({"id_a": pa.array(ids[ii[keep]], pa.int64()),
                         "id_b": pa.array(ids[jj[keep]], pa.int64()),
                         "hamming": pa.array(ham[keep], pa.int64())})

    from ray.data.aggregate import Min

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(verify, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )
    out = pairs.to_pandas()
    if out.empty:
        return empty
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _list_matrix(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy-ish (n, dim) matrix from a fixed-width list<float> column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    return np.asarray(arr.flatten()).reshape(n, -1).astype(dtype, copy=False)


@ray.remote
def _block_pair_cosine(a_tbl: pa.Table, b_tbl: pa.Table, same: bool,
                       threshold: float, vec_col: str, id_col: str,
                       round_digits: int) -> pa.Table:
    """Cosine pairs >= threshold between two Arrow blocks (one matmul).
    cosine = dot/(|a||b|) — the same expression DuckDB's
    list_cosine_similarity evaluates, so oracle values agree after
    rounding."""
    a_ids = np.asarray(a_tbl.column(id_col), dtype=np.int64)
    b_ids = np.asarray(b_tbl.column(id_col), dtype=np.int64)
    a = _list_matrix(a_tbl.column(vec_col))
    b = _list_matrix(b_tbl.column(vec_col))
    na = np.maximum(np.linalg.norm(a, axis=1), 1e-300)
    nb = np.maximum(np.linalg.norm(b, axis=1), 1e-300)
    sims = (a @ b.T) / np.outer(na, nb)
    ii, jj = np.nonzero(sims >= threshold)
    if same:
        keep = a_ids[ii] < b_ids[jj]
    else:
        keep = np.ones(len(ii), dtype=bool)
    ia, jb, s = a_ids[ii[keep]], b_ids[jj[keep]], sims[ii[keep], jj[keep]]
    lo = np.minimum(ia, jb)
    hi = np.maximum(ia, jb)
    return pa.table(
        {
            "id_a": pa.array(lo, pa.int64()),
            "id_b": pa.array(hi, pa.int64()),
            "cosine": pa.array(np.round(s, round_digits), pa.float64()),
        }
    )


def embedding_near_dup(ds: ray.data.Dataset, threshold: float = 0.95,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       method: str = "exact", lsh_tables: int = 16,
                       lsh_bits: int = 8, seed: int = 42,
                       round_digits: int = 6) -> pa.Table:
    """All pairs with cosine similarity >= threshold.

    - ``method="exact"``: block-pair join — every pair of Arrow blocks is
      one Ray task doing one matmul. Exact at any scale; total compute is
      the unavoidable O(N^2), but per-task work is O(|block|^2) and the
      driver holds only object refs, never vectors.
    - ``method="lsh"``: random-hyperplane LSH — explode each vector into
      ``lsh_tables`` bucket keys of ``lsh_bits`` sign bits, all-pairs
      verify within buckets, dedup across tables. Approximate (recall
      ~1 - (1 - p^bits)^tables with p = 1 - theta/pi); the 100-TB path for
      high thresholds where p is close to 1.
    """
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if method == "lsh":
        return _embedding_lsh_pairs(ds, threshold, vec_col, id_col,
                                    lsh_tables, lsh_bits, seed, round_digits, empty)

    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    futures = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futures.append(
                _block_pair_cosine.remote(refs[i], refs[j], i == j, threshold,
                                          vec_col, id_col, round_digits)
            )
    tables = [t for t in ray.get(futures) if t.num_rows]
    if not tables:
        return empty
    out = pa.concat_tables(tables).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _embedding_lsh_pairs(ds, threshold, vec_col, id_col, tables, bits, seed,
                         round_digits, empty: pa.Table) -> pa.Table:
    first = ds.take(1)
    if not first:
        return empty
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables, bits, dim))
    planes_ref = ray.put(planes)
    pw2 = (np.uint64(1) << np.arange(bits, dtype=np.uint64))

    def explode(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        m = _list_matrix(batch.column(vec_col))
        n = len(batch)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        keys = np.empty((n, tables), dtype=np.uint64)
        for t in range(tables):
            signs = (m @ pl[t].T) >= 0  # (n, bits)
            keys[:, t] = signs.astype(np.uint64) @ pw2
        vec_col_arr = batch.column(vec_col)
        if isinstance(vec_col_arr, pa.ChunkedArray):
            vec_col_arr = vec_col_arr.combine_chunks()
        rep = pa.array(np.repeat(np.arange(n), tables))
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, tables), pa.int64()),
                "tbl": pa.array(np.tile(np.arange(tables, dtype=np.int32), n), pa.int32()),
                "key": pa.array(keys.ravel(), pa.uint64()),
                vec_col: vec_col_arr.take(rep),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        g = len(group)
        if g < 2:
            return empty
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _list_matrix(group.column(vec_col))[order]
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-300)
        sims = (m @ m.T) / np.outer(norms, norms)
        ii, jj = np.triu_indices(g, 1)
        s = sims[ii, jj]
        keep = s >= threshold
        return pa.table({"id_a": pa.array(ids[ii[keep]], pa.int64()),
                         "id_b": pa.array(ids[jj[keep]], pa.int64()),
                         "cosine": pa.array(np.round(s[keep], round_digits), pa.float64())})

    from ray.data.aggregate import Max

    pairs = (
        ds.select_columns([id_col, vec_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["tbl", "key"])
        .map_groups(verify, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Max("cosine", alias_name="cosine"))
    )
    out = pairs.to_pandas()
    if out.empty:
        return empty
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _np_i64(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(a, dtype=np.int64)


def substring_dup_stats(ds: ray.data.Dataset, k: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        n_buckets: int = 64) -> pa.Table:
    """Per-document substring-duplication profile: the fraction of a doc's
    DISTINCT k-token shingles that also occur in at least one OTHER
    document — the scalable proxy for substring-level training-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better": duplicated-span detection; here at shingle granularity so the
    exact answer is one shuffle pair, no suffix array).

    Scale shape: (1) map_batches emits DISTINCT (shingle-hash bucket, doc)
    pair partials; (2) one groupby(bucket) with a vectorized kernel counts
    distinct docs per shingle and flags each pair; (3) per-(bucket, doc)
    partial sums (<= n_buckets rows per doc) reduce by doc in a tiny final
    groupby. No broadcast set, no driver materialization of pairs.

    Returns (doc_id, n_unique_shingles, n_dup_shingles, dup_fraction) for
    docs with >= 1 shingle, sorted by doc_id.
    """
    from lucene_ray.ops.shingles import make_shingles

    def pairs(batch: pa.Table) -> pa.Table:
        from lucene_ray.index.invert import tokenize_column

        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        sh, docs = make_shingles(flat, doc_idx, k)
        ids = _np_i64(batch.column(id_col))
        if len(sh) == 0:
            return pa.table({"shingle": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64())})
        t = pa.table({"shingle": sh,
                      id_col: pa.array(ids[docs], pa.int64())})
        # a doc never spans batches -> batch-local distinct is global
        return t.group_by(["shingle", id_col]).aggregate([])

    def bucketize(batch: pa.Table) -> pa.Table:
        # vectorized crc32 (PYTHONHASHSEED-independent, no per-row Python)
        from lucene_ray.index.build import _term_crc32

        b = _term_crc32(batch.column("shingle"))
        return batch.append_column(
            "__bucket", pa.array((b % n_buckets).astype(np.int32), pa.int32()))

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "dup": pa.array([], pa.int64())})
        sh = group.column("shingle")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        d = sh.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        sid = np.asarray(d.indices, dtype=np.int64)
        docs = _np_i64(group.column(id_col))
        ndocs = np.bincount(sid)  # pairs are distinct (shingle, doc)
        is_dup = (ndocs[sid] >= 2).astype(np.int64)
        uniq, inv = np.unique(docs, return_inverse=True)
        return pa.table({
            id_col: pa.array(uniq, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "dup": pa.array(np.bincount(inv, weights=is_dup).astype(np.int64),
                            pa.int64()),
        })

    from ray.data.aggregate import Sum

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    out = (
        partials.groupby(id_col)
        .aggregate(Sum("n", alias_name="n"), Sum("dup", alias_name="dup"))
        .to_pandas()
    )
    out = out.sort_values(id_col).reset_index(drop=True)
    n = out["n"].astype("int64")
    dup = out["dup"].astype("int64")
    return pa.table({
        id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
        "n_unique_shingles": pa.array(n.to_numpy(), pa.int64()),
        "n_dup_shingles": pa.array(dup.to_numpy(), pa.int64()),
        "dup_fraction": pa.array(
            np.round(dup.to_numpy() / n.to_numpy(), 6), pa.float64()),
    })
