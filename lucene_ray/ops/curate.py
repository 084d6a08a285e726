"""Corpus-curation operators for training-data pipelines: deterministic
content-hash sampling and benchmark decontamination.

These extend the engine's LLM-pipeline family (ops/dedup.py, ops/text.py)
with two ops every large-scale corpus build needs:

- ``sample_by_hash`` — a reproducible sample keyed by a cryptographic hash
  of the row key, not an RNG: the same row is in or out of the sample on
  every run, machine, and worker count (the property random_sample cannot
  give), and the sample composes with resume/retry for free. Streaming
  map_batches filter, no shuffle, no driver state.
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

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from lucene_ray.index.invert import tokenize_column


def sample_by_hash(ds: ray.data.Dataset, id_col: str = "doc_id",
                   hex_lt: str = "2a") -> ray.data.Dataset:
    """Deterministic sample: keep rows whose ``md5(str(id))`` hex digest
    prefix is lexicographically below ``hex_lt`` (2 hex chars → rate =
    int(hex_lt, 16)/256, e.g. "2a" ≈ 16.4%). md5 has no vectorized Arrow
    kernel; the per-row digest over short key strings is the entire cost
    and is CPU-trivial next to any downstream transform."""
    n = len(hex_lt)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mask = pa.array(
            [hashlib.md5(str(i).encode()).hexdigest()[:n] < hex_lt
             for i in ids],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_stratified(ds: ray.data.Dataset, rates: dict,
                      group_col: str = "lang",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-group deterministic sampling — the mixture-balancing op of a
    training-data pipeline (e.g. downsample dominant languages). ``rates``
    maps a group value to its md5-prefix threshold (2 hex chars; rate =
    int(v, 16)/256); groups not listed are dropped. Same determinism
    guarantees as :func:`sample_by_hash`; streaming filter, no shuffle."""

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        groups = batch.column(group_col).to_pylist()
        mask = pa.array(
            [hashlib.md5(str(i).encode()).hexdigest()[:2] < rates.get(g, "00")
             for i, g in zip(ids, groups)],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


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
