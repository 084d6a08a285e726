"""Corpus-curation operators for training-data pipelines: deterministic
content-hash sampling and benchmark decontamination.

These extend the engine's LLM-pipeline family (ops/dedup.py, ops/text.py)
with two ops every large-scale corpus build needs:

- ``sample_by_hash`` — a reproducible sample keyed by a deterministic
  integer mix of the row key, not an RNG: the same row is in or out of the
  sample on every run, machine, and worker count (the property
  random_sample cannot give), and the sample composes with resume/retry for
  free. Streaming map_batches filter, no shuffle, no driver state. The mix
  is MurmurHash3's 32-bit finalizer (fmix32, public domain — Appleby's
  MurmurHash3.cpp) over a 64→32 xor-fold: pure xor/shift/multiply
  arithmetic, so it is (a) fully vectorized in numpy on the uint64 lane
  (no per-row Python) and (b) replayed EXACTLY by the DuckDB oracle as SQL
  integer arithmetic (``fmix32_sql``), keeping the value-hash oracle.
- ``decontaminate`` — drop/flag training documents that share any k-token
  shingle with a benchmark/eval set (the standard eval-contamination
  guard). The benchmark side is small by definition: its distinct shingle
  set is collected once and broadcast via ``ray.put``, and the training
  side is a streaming map_batches membership filter — no all-to-all
  shuffle. Shingles are compared as exact STRINGS (no hash fold), so the
  result is exactly SQL-checkable and collision-free.

Lucene kinship: shingles are analysis-common's ShingleFilter output
(lucene/analysis/common/src/java/org/apache/lucene/analysis/shingle/
ShingleFilter.java) under the engine's shared tokenizer grammar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from lucene_ray.index.invert import tokenize_column

# MurmurHash3 fmix32 constants (Appleby, public domain)
_FMIX_M1 = np.uint64(0x85EBCA6B)
_FMIX_M2 = np.uint64(0xC2B2AE35)
_U32 = np.uint64(0xFFFFFFFF)


def fmix32(keys) -> np.ndarray:
    """Vectorized 64→32-bit deterministic mix: xor-fold the int64 key to 32
    bits, then MurmurHash3's fmix32 finalizer (xor/shift/multiply — full
    avalanche). Runs on the whole key column as uint64 numpy arithmetic (no
    per-row Python) and is replayed bit-exactly in SQL by
    :func:`fmix32_sql`. Returns uint64 values in [0, 2**32)."""
    h = np.asarray(keys, dtype=np.int64).astype(np.uint64)
    h = (h & _U32) ^ (h >> np.uint64(32))
    h ^= h >> np.uint64(16)
    h = (h * _FMIX_M1) & _U32
    h ^= h >> np.uint64(13)
    h = (h * _FMIX_M2) & _U32
    h ^= h >> np.uint64(16)
    return h


def fmix32_sql(expr: str) -> str:
    """DuckDB expression computing :func:`fmix32` of BIGINT ``expr``
    bit-exactly: the two 32×32-bit multiplies are done in HUGEINT (int128)
    and wrapped with ``% 2**32``, everything else is BIGINT xor/shift."""
    h0 = f"(xor(({expr}) & 4294967295, ({expr}) >> 32))"
    h1 = f"(xor({h0}, {h0} >> 16))"
    h2 = f"((({h1}::HUGEINT * 2246822507) % 4294967296)::BIGINT)"
    h3 = f"(xor({h2}, {h2} >> 13))"
    h4 = f"((({h3}::HUGEINT * 3266489909) % 4294967296)::BIGINT)"
    return f"(xor({h4}, {h4} >> 16))"


def hex_threshold(hex_lt: str) -> int:
    """Map the historical md5-hex-prefix threshold API onto the 32-bit mix
    domain: ``hex_lt="2a"`` → keep when fmix32(key) < 0x2a << 24, i.e. the
    same nominal rate int(hex_lt, 16) / 16**len(hex_lt)."""
    return int(hex_lt, 16) << (32 - 4 * len(hex_lt))


def sample_by_hash(ds: ray.data.Dataset, id_col: str = "doc_id",
                   hex_lt: str = "2a") -> ray.data.Dataset:
    """Deterministic sample: keep rows whose ``fmix32(id)`` falls below the
    ``hex_lt`` threshold (2 hex chars → rate = int(hex_lt, 16)/256, e.g.
    "2a" ≈ 16.4%). Vectorized uint64 numpy on the whole id column (the r4
    per-row md5 loop is gone); DuckDB replays the predicate exactly via
    :func:`fmix32_sql`, so the value-hash oracle holds."""
    thr = np.uint64(hex_threshold(hex_lt))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(fmix32(batch.column(id_col)) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_stratified(ds: ray.data.Dataset, rates: dict,
                      group_col: str = "lang",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-group deterministic sampling — the mixture-balancing op of a
    training-data pipeline (e.g. downsample dominant languages). ``rates``
    maps a group value to its hex threshold (2 hex chars; rate =
    int(v, 16)/256); groups not listed are dropped. Same determinism
    guarantees as :func:`sample_by_hash`; streaming filter, no shuffle.
    Vectorized: one fmix32 over the id column + a per-group threshold
    lookup via Arrow dictionary indices."""

    def keep(batch: pa.Table) -> pa.Table:
        h = fmix32(batch.column(id_col))
        groups = batch.column(group_col)
        enc = pc.dictionary_encode(
            groups.combine_chunks() if isinstance(groups, pa.ChunkedArray)
            else groups)
        dict_vals = enc.dictionary.to_pylist()
        thr_by_code = np.array(
            [hex_threshold(rates.get(g, "00")) for g in dict_vals],
            dtype=np.uint64)
        codes = np.asarray(enc.indices, dtype=np.int64)
        thr = thr_by_code[codes] if len(dict_vals) else np.zeros(
            len(codes), np.uint64)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def cap_per_group(ds: ray.data.Dataset, n: int, group_col: str = "source",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-domain document cap — the RefinedWeb/CCNet-style guard against a
    handful of hosts dominating the corpus (Penedo et al. 2023, "The
    RefinedWeb dataset": per-domain limits during curation). Keeps at most
    ``n`` rows per ``group_col`` value, chosen DETERMINISTICALLY: the n
    smallest ``fmix32(id)`` values (ties by id), so the survivor set is
    identical across runs/workers and SQL-replayable via
    ``row_number() OVER (PARTITION BY group ORDER BY fmix32(id), id)``.

    Scale shape: a map-side combiner first reduces every batch to <= n rows
    per group it contains (vectorized lexsort — no per-row Python), so the
    following groupby shuffles at most n rows per (batch, group) instead of
    the whole corpus; the map_groups finalizer re-applies the same exact
    rule. Domains >> workers, so the hash groupby balances."""
    if n <= 0:
        raise ValueError("cap must be positive")

    def _top_n(batch: pa.Table) -> pa.Table:
        if len(batch) <= n:
            return batch
        h = fmix32(batch.column(id_col))
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        groups = batch.column(group_col)
        enc = pc.dictionary_encode(
            groups.combine_chunks() if isinstance(groups, pa.ChunkedArray)
            else groups)
        codes = np.asarray(enc.indices, dtype=np.int64)
        # rank within group by (hash, id): one lexsort + segmented cumcount
        order = np.lexsort((ids, h, codes))
        sc = codes[order]
        seg_start = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        rank = np.arange(len(sc)) - np.repeat(
            seg_start, np.diff(np.r_[seg_start, len(sc)]))
        keep_sorted = order[rank < n]
        mask = np.zeros(len(batch), dtype=bool)
        mask[keep_sorted] = True
        return batch.filter(pa.array(mask))

    combined = ds.map_batches(_top_n, batch_format="pyarrow")
    return combined.groupby(group_col).map_groups(
        _top_n, batch_format="pyarrow")


def _shingle_strings(batch: pa.Table, text_col: str, k: int):
    """(shingle_string_array, doc_idx) of every k-token shingle in the
    batch — Arrow-vectorized: tokenize_column's flat token stream, then one
    ``binary_join_element_wise`` over the k shifted views; windows crossing
    a document boundary are masked out. Docs with fewer than k tokens
    contribute nothing (mirroring the SQL oracle)."""
    flat, doc_idx, _ = tokenize_column(batch.column(text_col))
    n = len(flat)
    if n < k:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    views = [flat.slice(j, n - k + 1) for j in range(k)]
    joined = pc.binary_join_element_wise(*views, " ")
    valid = doc_idx[: n - k + 1] == doc_idx[k - 1:]
    sel = np.flatnonzero(valid)
    return joined.take(pa.array(sel, pa.int64())), doc_idx[sel].astype(np.int64)


def benchmark_shingles(bench: ray.data.Dataset, text_col: str = "text",
                       k: int = 3) -> pa.Array:
    """Distinct shingle strings of the (small) benchmark set, collected to
    the driver for broadcast. Size is bounded by the benchmark corpus, not
    the training corpus."""

    def sh(batch: pa.Table) -> pa.Table:
        s, _ = _shingle_strings(batch, text_col, k)
        return pa.table({"s": s.unique()})

    parts = [
        b.column("s").combine_chunks()
        for b in bench.map_batches(sh, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.array([], pa.string())
    return pa.concat_arrays(
        [p.cast(pa.string()) for p in parts]).unique()


def decontaminate(ds: ray.data.Dataset, bench_shingles: pa.Array,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, invert: bool = False) -> ray.data.Dataset:
    """Training docs sharing NO k-shingle with the benchmark set (the clean
    corpus); ``invert=True`` returns the flagged/contaminated docs instead.
    The benchmark shingle set ships once per worker via ``ray.put``."""
    ref = ray.put(bench_shingles)

    def keep(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        s, d_idx = _shingle_strings(batch, text_col, k)
        if len(s) and len(vs):
            hit = np.asarray(pc.is_in(s, value_set=vs))
            dirty_docs = np.unique(d_idx[hit])
        else:
            dirty_docs = np.zeros(0, np.int64)
        mask = np.zeros(batch.num_rows, dtype=bool)
        mask[dirty_docs] = True
        if not invert:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def contamination_scores(ds: ray.data.Dataset, bench_shingles: pa.Array,
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 3) -> ray.data.Dataset:
    """Per-document contamination FRACTION vs a broadcast benchmark shingle
    set: |distinct doc k-shingles in the benchmark| / |distinct doc
    k-shingles| — the graded companion of ``decontaminate`` (threshold the
    fraction instead of zero-tolerance filtering; the n-gram-overlap
    decontamination measure of GPT-3 appendix C / PaLM-style reports).
    Streaming map_batches, benchmark set shipped once via ray.put; returns
    (id, n_shingles, n_hit, frac) rows."""
    ref = ray.put(bench_shingles)

    def score(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        s, d_idx = _shingle_strings(batch, text_col, k)
        n = batch.num_rows
        # distinct shingles per doc: lexsort + boundary mask
        n_sh = np.zeros(n, dtype=np.int64)
        n_hit = np.zeros(n, dtype=np.int64)
        if len(s):
            d = s.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            sid = np.asarray(d.indices, dtype=np.int64)
            order = np.lexsort((sid, d_idx))
            ds_, ss_ = d_idx[order], sid[order]
            first = np.empty(len(sid), dtype=bool)
            first[0] = True
            first[1:] = (ds_[1:] != ds_[:-1]) | (ss_[1:] != ss_[:-1])
            ud, us = ds_[first], ss_[first]
            n_sh = np.bincount(ud, minlength=n).astype(np.int64)
            if len(vs):
                vhit = np.asarray(pc.is_in(d.dictionary, value_set=vs))
                hit = vhit[us]
                n_hit = np.bincount(ud[hit], minlength=n).astype(np.int64)
        frac = np.divide(n_hit, n_sh, out=np.zeros(n, np.float64),
                         where=n_sh > 0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_hit": pa.array(n_hit, pa.int64()),
            "frac": pa.array(frac, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def select_token_budget_grouped(ds: ray.data.Dataset, budgets: dict,
                                group_col: str, text_col: str = "text",
                                id_col: str = "doc_id") -> pa.Table:
    """Per-GROUP token-budget selection — domain mixture construction
    ("x tokens of web, y of code, z of books"): within each group, rank by
    unique-token ratio desc (ties doc_id asc) and keep docs while the
    cumulative tokens of strictly better same-group docs stay under that
    group's budget (same straggler rule as ``select_token_budget``). Groups
    absent from ``budgets`` contribute nothing. The per-doc stats table is
    tiny (the text never leaves the map stage); ranking is one driver
    lexsort over it. Returns (id, group, n_tokens) sorted by doc_id."""

    def stats(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        uniq = np.zeros(n, dtype=np.int64)
        if len(doc_idx):
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            tok_ids = np.asarray(d.indices, dtype=np.int64)
            order = np.lexsort((tok_ids, doc_idx))
            ds_, ts_ = doc_idx[order], tok_ids[order]
            bound = np.empty(len(doc_idx), dtype=bool)
            bound[0] = True
            bound[1:] = (ds_[1:] != ds_[:-1]) | (ts_[1:] != ts_[:-1])
            uniq = np.bincount(ds_[bound], minlength=n).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "grp": batch.column(group_col).cast(pa.string()),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_unique": pa.array(uniq, pa.int64()),
        })

    parts = [ray.get(r) for r in ds.map_batches(
        stats, batch_format="pyarrow").to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if len(p)])
    ids = np.asarray(t.column(id_col), dtype=np.int64)
    grp = np.asarray(t.column("grp").to_pylist(), dtype=object)
    nt = np.asarray(t.column("n_tokens"), dtype=np.int64)
    nu = np.asarray(t.column("n_unique"), dtype=np.int64)
    m = nt > 0
    ids, grp, nt, nu = ids[m], grp[m], nt[m], nu[m]
    q = nu.astype(np.float64) / nt.astype(np.float64)
    keep_idx = []
    for g, budget in budgets.items():
        sel = np.flatnonzero(grp == g)
        if len(sel) == 0:
            continue
        order = sel[np.lexsort((ids[sel], -q[sel]))]
        cum_before = np.cumsum(nt[order]) - nt[order]
        keep_idx.append(order[cum_before < int(budget)])
    if not keep_idx:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "grp": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})
    kept = np.concatenate(keep_idx)
    kept = kept[np.argsort(ids[kept])]
    return pa.table({id_col: pa.array(ids[kept], pa.int64()),
                     "grp": pa.array(list(grp[kept]), pa.string()),
                     "n_tokens": pa.array(nt[kept], pa.int64())})


def select_token_budget(ds: ray.data.Dataset, budget_tokens: int,
                        text_col: str = "text", id_col: str = "doc_id"
                        ) -> pa.Table:
    """Quality-aware token-budget selection: rank documents by a quality
    key and keep the best until the token budget is exhausted — the
    mixture-construction step of a pretraining corpus build ("take the top
    N tokens of this source").

    Quality key here = unique-token ratio descending (higher lexical
    diversity first), ties by doc_id ascending — any deterministic score
    column slots in. A doc is kept iff the cumulative token count of all
    STRICTLY BETTER docs is < budget (the straggler doc that crosses the
    budget is kept, matching SQL's running-sum-before-row semantics).

    Distributed shape: pass 1 computes (doc_id, n_tokens, n_unique) in a
    streaming map_batches; the ranking needs a global order, expressed as
    ONE sort of the tiny per-doc STATS table (16 B/doc — never the text)
    followed by a cumsum threshold; the kept-id set then filters the corpus
    as a broadcast (the prepare.py kept-id bound). Returns the kept stats
    table (doc_id, n_tokens) sorted by doc_id."""

    def stats(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
        uniq = np.zeros(n, dtype=np.int64)
        if len(doc_idx):
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            tok_ids = np.asarray(d.indices, dtype=np.int64)
            order = np.lexsort((tok_ids, doc_idx))
            ds_, ts_ = doc_idx[order], tok_ids[order]
            bound = np.empty(len(doc_idx), dtype=bool)
            bound[0] = True
            bound[1:] = (ds_[1:] != ds_[:-1]) | (ts_[1:] != ts_[:-1])
            uniq = np.bincount(ds_[bound], minlength=n).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_unique": pa.array(uniq, pa.int64()),
        })

    parts = [ray.get(r) for r in ds.map_batches(
        stats, batch_format="pyarrow").to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if len(p)])
    ids = np.asarray(t.column(id_col), dtype=np.int64)
    nt = np.asarray(t.column("n_tokens"), dtype=np.int64)
    nu = np.asarray(t.column("n_unique"), dtype=np.int64)
    keep_mask = nt > 0
    ids, nt, nu = ids[keep_mask], nt[keep_mask], nu[keep_mask]
    # quality = n_unique / n_tokens as an exact RATIONAL comparison
    # (cross-multiplied in the sort key via float64 — exact for counts
    # < 2^26; ties broken by doc_id)
    q = nu.astype(np.float64) / nt.astype(np.float64)
    order = np.lexsort((ids, -q))
    cum_before = np.cumsum(nt[order]) - nt[order]
    kept = order[cum_before < budget_tokens]
    ksort = kept[np.argsort(ids[kept])]
    return pa.table({id_col: pa.array(ids[ksort], pa.int64()),
                     "n_tokens": pa.array(nt[ksort], pa.int64())})
