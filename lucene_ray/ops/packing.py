"""LLM pretraining sequence packing (SURVEY extension ops).

``pack_concat_chunks`` is GPT-style packing: every document's token stream is
concatenated in doc_id order into one global stream, which is chunked into
fixed-length training sequences; documents cross sequence boundaries. The
output is one row per (sequence, document) overlap carrying the doc-local
token span — the layout a training data loader consumes. (Greedy bin-packing
variants trade padding for no boundary-crossing; concat-chunk is the
zero-padding canonical form of GPT-2/3-style data prep.)

Distributed shape — two passes over the same deterministic partition plan the
index build uses (index/build.py plan_partitions), no shuffle:

- pass 1: one token-count integer per partition (map), prefix-summed on the
  driver — bytes per PARTITION, never per doc;
- pass 2: each partition re-reads its rows column-pruned and emits its span
  rows vectorized, shifted by its broadcast base offset.

Nothing driver-side scales with document count, and the output is naturally
partitioned by input partition for resumable writes. Token grammar is the
shared index grammar (lowercase ``[a-z0-9_]+`` runs), so the SQL oracle can
replay it with ``string_split_regex``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from lucene_ray.index.invert import tokenize_column


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(
        [t for t in ray.get(ds.to_arrow_refs()) if t is not None and len(t)]
        or [ds.schema().empty_table()]
    )


def _partition_token_counts(spec: dict, text_col: str, id_col: str
                            ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, per-doc token counts) for one partition spec, in row order."""
    pf = pq.ParquetFile(spec["file"])
    tbl = pf.read_row_groups(list(spec["row_groups"]), columns=[id_col, text_col])
    rr = spec.get("row_range")
    if rr is not None and len(rr):
        tbl = tbl.slice(int(rr[0]), int(rr[1]) - int(rr[0]))
    _, doc_idx, _ = tokenize_column(tbl.column(text_col))
    counts = np.bincount(doc_idx, minlength=len(tbl)).astype(np.int64)
    ids = np.asarray(tbl.column(id_col), dtype=np.int64)
    return ids, counts


def _emit_spans(ids: np.ndarray, counts: np.ndarray, base: int,
                seq_len: int) -> pa.Table:
    """Span rows for one partition whose first token sits at global offset
    ``base``. A doc covering global tokens [s, e) overlaps sequences
    floor(s/L) .. floor((e-1)/L); all expansion is vectorized (the only loop
    is np.repeat's internal one)."""
    starts = base + np.cumsum(counts) - counts
    ends = starts + counts
    nz = counts > 0  # tokenless docs occupy no span
    s, e, ids_nz, cnt = starts[nz], ends[nz], ids[nz], counts[nz]
    first_seq = s // seq_len
    last_seq = (e - 1) // seq_len
    n_seqs = (last_seq - first_seq + 1).astype(np.int64)
    doc_rep = np.repeat(np.arange(len(s), dtype=np.int64), n_seqs)
    # sequence index within each doc's run: 0..n_seqs-1
    run_base = np.cumsum(n_seqs) - n_seqs
    within = np.arange(int(n_seqs.sum()), dtype=np.int64) - run_base[doc_rep]
    seq_id = first_seq[doc_rep] + within
    seq_start = seq_id * seq_len
    tok_start = np.maximum(s[doc_rep], seq_start) - s[doc_rep]
    tok_end = np.minimum(e[doc_rep], seq_start + seq_len) - s[doc_rep]
    return pa.table(
        {
            "seq_id": pa.array(seq_id, pa.int64()),
            "doc_id": pa.array(ids_nz[doc_rep], pa.int64()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "tok_end": pa.array(tok_end, pa.int64()),
        }
    )


def pack_concat_chunks(path: str, seq_len: int = 128,
                       text_col: str = "text", id_col: str = "doc_id",
                       target_rows_per_partition: int = 100_000) -> pa.Table:
    """Pack a parquet corpus into fixed-length training sequences; returns
    (seq_id, doc_id, tok_start, tok_end) sorted by (seq_id, doc_id).
    ``tok_start``/``tok_end`` are DOC-LOCAL token offsets of the slice this
    sequence takes from the doc."""
    from lucene_ray.index.build import IndexConfig, plan_partitions

    cfg = IndexConfig(target_rows_per_partition=target_rows_per_partition)
    specs = plan_partitions([path], cfg)

    # pass 1: per-partition token totals (one int per partition)
    def totals(batch: pa.Table) -> pa.Table:
        pids, toks = [], []
        for spec in batch.to_pylist():
            _, counts = _partition_token_counts(spec, text_col, id_col)
            pids.append(spec["pid"])
            toks.append(int(counts.sum()))
        return pa.table({"pid": pa.array(pids, pa.int64()),
                         "tokens": pa.array(toks, pa.int64())})

    ds = ray.data.from_items(specs, override_num_blocks=len(specs))
    tot = _collect(ds.map_batches(totals, batch_format="pyarrow", batch_size=1))
    per_part = np.zeros(len(specs), dtype=np.int64)
    per_part[np.asarray(tot.column("pid"))] = np.asarray(tot.column("tokens"))
    bases = np.cumsum(per_part) - per_part  # partition base offsets (tiny)

    # pass 2: per-partition span emit with the broadcast base offset
    def spans(batch: pa.Table) -> pa.Table:
        parts = []
        for spec in batch.to_pylist():
            ids, counts = _partition_token_counts(spec, text_col, id_col)
            parts.append(_emit_spans(ids, counts, int(bases[spec["pid"]]),
                                     seq_len))
        return pa.concat_tables(parts)

    out = _collect(
        ray.data.from_items(specs, override_num_blocks=len(specs)).map_batches(
            spans, batch_format="pyarrow", batch_size=1
        )
    )
    return out.sort_by([("seq_id", "ascending"), ("doc_id", "ascending")])


def pack_stats(path: str, seq_len: int = 128, text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Per-sequence fill stats of the concat-chunk packing: docs per
    sequence and filled token count (the final sequence may be short)."""
    t = pack_concat_chunks(path, seq_len, text_col, id_col)
    seq = np.asarray(t.column("seq_id"))
    fill = np.asarray(t.column("tok_end")) - np.asarray(t.column("tok_start"))
    uniq, inv = np.unique(seq, return_inverse=True)
    n_docs = np.bincount(inv).astype(np.int64)
    n_toks = np.bincount(inv, weights=fill).astype(np.int64)
    return pa.table({"seq_id": pa.array(uniq, pa.int64()),
                     "n_docs": pa.array(n_docs, pa.int64()),
                     "n_tokens": pa.array(n_toks, pa.int64())})


def _greedy_fill(caps: np.ndarray, seq_len: int) -> np.ndarray:
    """Sequential greedy fill: docs in order, close the bin when the next
    doc does not fit. Returns the bin id per doc. O(n_bins) searchsorted
    steps — the loop is over BINS, not docs."""
    cs = np.cumsum(caps)
    bins = np.empty(len(caps), dtype=np.int64)
    start, base, b = 0, 0, 0
    n = len(caps)
    while start < n:
        # last doc whose cumulative fill stays within base + seq_len
        j = int(np.searchsorted(cs, base + seq_len, side="right"))
        j = max(j, start + 1)  # a single doc always occupies at least one bin
        bins[start:j] = b
        base = int(cs[j - 1])
        start = j
        b += 1
    return bins


def pack_greedy(path: str, seq_len: int = 128, text_col: str = "text",
                id_col: str = "doc_id",
                target_rows_per_partition: int = 100_000) -> pa.Table:
    """Greedy (no-split) packing: documents in doc_id order fill a sequence
    until the next doc would overflow, then a new sequence starts — the
    padding-for-no-boundary-crossing alternative to concat-chunk packing.
    Docs longer than ``seq_len`` are truncated to ``seq_len`` tokens
    (cap column reports the packed length). Sequences are partition-local
    with globally-offset ids (pass 1 counts bins per partition, the driver
    prefix-sums one int per partition; at the test scale one partition =
    the exact global greedy, which the SQL oracle replays with a recursive
    CTE). Returns (seq_id, doc_id, n_tokens)."""
    from lucene_ray.index.build import IndexConfig, plan_partitions

    cfg = IndexConfig(target_rows_per_partition=target_rows_per_partition)
    specs = plan_partitions([path], cfg)

    def part_table(spec) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids, counts = _partition_token_counts(spec, text_col, id_col)
        nz = counts > 0
        caps = np.minimum(counts[nz], seq_len)
        return ids[nz], caps, _greedy_fill(caps, seq_len)

    def nbins(batch: pa.Table) -> pa.Table:
        pids, bs = [], []
        for spec in batch.to_pylist():
            _, _, bins = part_table(spec)
            pids.append(spec["pid"])
            bs.append(int(bins[-1]) + 1 if len(bins) else 0)
        return pa.table({"pid": pa.array(pids, pa.int64()),
                         "bins": pa.array(bs, pa.int64())})

    ds = ray.data.from_items(specs, override_num_blocks=len(specs))
    tot = _collect(ds.map_batches(nbins, batch_format="pyarrow", batch_size=1))
    per_part = np.zeros(len(specs), dtype=np.int64)
    per_part[np.asarray(tot.column("pid"))] = np.asarray(tot.column("bins"))
    bases = np.cumsum(per_part) - per_part

    def emit(batch: pa.Table) -> pa.Table:
        parts = []
        for spec in batch.to_pylist():
            ids, caps, bins = part_table(spec)
            parts.append(pa.table(
                {
                    "seq_id": pa.array(bins + int(bases[spec["pid"]]), pa.int64()),
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_tokens": pa.array(caps, pa.int64()),
                }
            ))
        return pa.concat_tables(parts)

    out = _collect(
        ray.data.from_items(specs, override_num_blocks=len(specs)).map_batches(
            emit, batch_format="pyarrow", batch_size=1
        )
    )
    return out.sort_by([("seq_id", "ascending"), ("doc_id", "ascending")])
