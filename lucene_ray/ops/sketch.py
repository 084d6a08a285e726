"""Mergeable sketches for approximate aggregates at 100-TB scale.

HyperLogLog (Flajolet et al. 2007) over the token stream: each batch emits
its 2^p register array (the map-side partial), registers merge with an
elementwise max — shuffle volume is one 2^p byte array per batch,
independent of data size. Hashing is content-deterministic (per-vocab md5),
so estimates are identical across runs/workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from lucene_ray.index.invert import tokenize_column
from lucene_ray.ops.dedup import _token_hash64


def _hll_partial(hashes: np.ndarray, p: int) -> np.ndarray:
    """2^p uint8 registers from 64-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped
    lz = np.full(len(rest), 64 - p, dtype=np.int64)
    cur = rest.copy()
    found = cur == 0
    lz[~found] = 0
    shift = 32
    while shift:
        mask = (~found) & ((cur >> np.uint64(64 - shift)) == 0)
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
        shift //= 2
    rank = np.minimum(lz + 1, 64 - p).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range (linear counting) correction
    return float(est)


def approx_distinct_tokens(ds: ray.data.Dataset, text_col: str = "text",
                           p: int = 12) -> pa.Table:
    """Approximate distinct-token count over the whole corpus (one row:
    n_distinct_est int64). Deterministic; typical error ~1.04/sqrt(2^p)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = tokenize_column(batch.column(text_col))
        # per-batch dedup first: hash only the batch vocabulary
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        vocab_hashes = np.unique(_token_hash64(d.dictionary))
        regs = _hll_partial(vocab_hashes, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(buf, dtype=np.uint8))
    return pa.table(
        {"n_distinct_est": pa.array([int(round(_hll_estimate(merged)))], pa.int64())}
    )


def approx_distinct_grouped(ds: ray.data.Dataset, group_col: str,
                            value_col: str, p: int = 12) -> pa.Table:
    """Approximate distinct ``value_col`` per ``group_col`` value via
    per-group HLL registers — the mergeable-sketch GROUP BY shape (map-side
    per-(batch, group) partials, shuffle one 2^p register array per group
    per batch, elementwise-max merge per group). Deterministic (md5 value
    hashing). Returns (group, n_distinct_est int64) sorted by group."""

    def partial(batch: pa.Table) -> pa.Table:
        gd = batch.column(group_col).combine_chunks().dictionary_encode()
        gidx = np.asarray(gd.indices)
        vals = batch.column(value_col).cast(pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        hashes = _token_hash64(vals)
        # one register array per group present in the batch (sort by group
        # index so each group's hashes are one contiguous slice)
        order = np.argsort(gidx, kind="stable")
        bounds = np.flatnonzero(np.diff(gidx[order], prepend=-1))
        ends = np.append(bounds[1:], len(order))
        out_r = [
            _hll_partial(hashes[order[s:e]], p).tobytes()
            for s, e in zip(bounds, ends)
        ]
        return pa.table({group_col: gd.dictionary.take(pa.array(gidx[order[bounds]])),
                         "regs": pa.array(out_r, pa.binary())})

    def merge(group: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for buf in group.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(buf, dtype=np.uint8))
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n_distinct_est": pa.array(
                    [int(round(_hll_estimate(merged)))], pa.int64()
                ),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(group_col).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
