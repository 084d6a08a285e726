"""End-to-end training-data corpus preparation — the flagship composition.

The canonical 100-TB LLM-pipeline shape, built from the engine's existing
stages, streaming end-to-end:

1. **quality filter** — vectorized per-batch rules on the text (token
   count, alpha ratio), zero-copy Arrow; nothing leaves a worker but the
   surviving rows;
2. **exact dedup** — sha256-hash `groupby(h).min(doc_id)` (shuffle volume
   = |distinct texts|), keep the minimum id per identical text;
3. **near-dup prune** — exact n-gram-Jaccard pairs (prefix-filter SSJoin,
   `ops/dedup.py`) over the survivors, connected components, keep each
   cluster's minimum member;
4. **partitioned output** — survivors written as partitioned parquet, one
   file per input block.

Every rule is integer/deterministic, so the kept set has an EXACT DuckDB
oracle (quality predicates + group-by-text min + recursive-CTE closure).

Scale note: the kept-id set is broadcast as a sorted int64 array for the
survivor masks (8 bytes/doc — fine to ~10^9 docs on one driver). Past
that, replace the broadcast with a hash semi-join of the survivors
against the kept-id Dataset (`pipelines/shuffle_join.hash_join`); the
rule set and oracle are unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from lucene_ray.ops.dedup import connected_components, ngram_jaccard_pairs

DEFAULT_MIN_TOKENS = 30
DEFAULT_MIN_ALPHA_RATIO = 0.55  # alpha chars / total chars


def quality_filter(ds: ray.data.Dataset, text_col: str = "text",
                   min_tokens: int = DEFAULT_MIN_TOKENS,
                   min_alpha_ratio: float = DEFAULT_MIN_ALPHA_RATIO,
                   ) -> ray.data.Dataset:
    """Keep docs with >= min_tokens tokens and alpha-char ratio >=
    min_alpha_ratio — vectorized in-batch filter (no shuffle)."""
    from lucene_ray.index.invert import tokenize_column
    from lucene_ray.ops.text import _count_byte_class, _string_buffers

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column(text_col)
        texts = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        _, doc_idx, _ = tokenize_column(text)
        n = len(batch)
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        n_chars = np.asarray(pc.utf8_length(texts), dtype=np.int64)
        offs, data = _string_buffers(texts)
        alpha_mask = ((data >= 0x41) & (data <= 0x5A)) | \
            ((data >= 0x61) & (data <= 0x7A))
        alpha = _count_byte_class(offs, data, alpha_mask)
        ok = (n_tokens >= min_tokens) & (alpha >= min_alpha_ratio * n_chars)
        return batch.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow")


def prepare_corpus(ds: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_tokens: int = DEFAULT_MIN_TOKENS,
                   min_alpha_ratio: float = DEFAULT_MIN_ALPHA_RATIO,
                   jaccard_threshold: float = 0.5,
                   out_dir: str | None = None) -> pa.Table:
    """Run the full preparation pipeline; returns the KEPT (doc_id) table,
    sorted. With ``out_dir``, also writes the surviving rows as partitioned
    parquet (ray.data.write_parquet → one file per block, resumable by
    re-running only missing partitions)."""
    import hashlib

    survivors = quality_filter(ds, text_col, min_tokens, min_alpha_ratio)

    # exact dedup: min id per sha256(text) — groupby shuffle on the hash
    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        h = [hashlib.sha256(col[i].as_py().encode()).hexdigest()
             for i in range(len(batch))]
        return pa.table({id_col: batch.column(id_col),
                         "h": pa.array(h, pa.string())})

    from ray.data.aggregate import Min

    exact_kept = set(
        survivors.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .to_pandas()[id_col]
        .astype("int64")
    )

    # near-dup prune among exact-dedup survivors: drop non-minimum cluster
    # members (pairs/clusters are output-sized; the pair stage shuffles by
    # shingle prefix, not by corpus). Survivor filter is vectorized: the
    # sorted kept-id array is broadcast and masked per batch.
    kept_arr = np.array(sorted(exact_kept), dtype=np.int64)

    def only_exact_kept(batch: pa.Table) -> pa.Table:
        if len(kept_arr) == 0:
            return batch.slice(0, 0)
        ids = np.asarray(batch.column(id_col).combine_chunks())
        pos = np.searchsorted(kept_arr, ids)
        pos = np.minimum(pos, len(kept_arr) - 1)
        return batch.filter(pa.array(kept_arr[pos] == ids))

    deduped = survivors.map_batches(only_exact_kept, batch_format="pyarrow")
    pairs = ngram_jaccard_pairs(deduped, text_col, id_col,
                                threshold=jaccard_threshold)
    clusters = connected_components(pairs)
    drop = {
        d for d, c in zip(clusters.column("doc_id").to_pylist(),
                          clusters.column("cluster_id").to_pylist())
        if d != c
    }
    final_ids = sorted(exact_kept - drop)

    if out_dir is not None and final_ids:
        final_arr = np.array(final_ids, dtype=np.int64)

        def only_final(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).combine_chunks())
            pos = np.minimum(np.searchsorted(final_arr, ids),
                             len(final_arr) - 1)
            return batch.filter(pa.array(final_arr[pos] == ids))

        deduped.map_batches(only_final, batch_format="pyarrow") \
            .write_parquet(out_dir)

    return pa.table({id_col: pa.array(final_ids, pa.int64())})
