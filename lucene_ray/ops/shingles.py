"""Shingle (token n-gram) analysis — the analysis-common shingle/ngram
family (lucene/analysis/common/src/java/org/apache/lucene/analysis/shingle/
ShingleFilter.java, ngram/NGramTokenFilter.java) as dataset operators.

Shape: vectorized shingle construction inside ``map_batches`` (shifted
Arrow arrays + ``binary_join_element_wise`` — no per-row Python), per-batch
partial counts, then a small ``groupby(shingle).sum`` shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from lucene_ray.index.invert import tokenize_column


def make_shingles(flat: pa.Array, doc_idx: np.ndarray, k: int) -> tuple[pa.Array, np.ndarray]:
    """All k-token shingles ('a b c' joined with spaces) and their doc ids,
    fully vectorized over the flat token array."""
    n_tok = len(flat)
    if n_tok < k:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    valid = doc_idx[: n_tok - k + 1] == doc_idx[k - 1 :]
    parts = [flat.slice(j, n_tok - k + 1) for j in range(k)]
    joined = pc.binary_join_element_wise(*parts, " ")
    mask = pa.array(valid)
    return joined.filter(mask), doc_idx[: n_tok - k + 1][valid]


def shingle_counts(ds: ray.data.Dataset, k: int = 2, top: int = 20,
                   text_col: str = "text") -> pa.Table:
    """Top-``top`` token k-grams by total occurrence count (count desc,
    shingle asc). Exact SQL equivalent via positional self-joins."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        sh, _docs = make_shingles(flat, doc_idx, k)
        if len(sh) == 0:
            return pa.table({"shingle": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"shingle": sh}).group_by("shingle").aggregate([("shingle", "count")])
        return t.rename_columns(["shingle", "n"])

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = agg.to_pandas()
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "shingle"], ascending=[False, True]).head(top)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def doc_shingle_sets(ds: ray.data.Dataset, k: int = 2, text_col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """(id, n_shingles, n_unique_shingles) per doc — the shingle-profile op."""

    def stats(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        sh, docs = make_shingles(flat, doc_idx, k)
        total = np.bincount(docs, minlength=n).astype(np.int64)
        if len(sh):
            d = sh.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            ids = np.asarray(d.indices, dtype=np.int64)
            order = np.lexsort((ids, docs))
            ds_, is_ = docs[order], ids[order]
            bound = np.empty(len(ds_), dtype=bool)
            bound[0] = True
            bound[1:] = (ds_[1:] != ds_[:-1]) | (is_[1:] != is_[:-1])
            uniq = np.bincount(ds_[bound], minlength=n).astype(np.int64)
        else:
            uniq = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_shingles": pa.array(total, pa.int64()),
                "n_unique_shingles": pa.array(uniq, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")
