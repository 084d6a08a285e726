"""Training-corpus quality filtering — Gopher/C4-style document heuristics.

The rule set follows the published heuristics (Rae et al., "Scaling Language
Models: ... Gopher", §A1.1; Raffel et al., C4) rather than any Lucene
surface: per-document word/line statistics, symbol ratios, stopword
presence, repetition measures (duplicate lines, top-2-gram mass), each an
exact deterministic metric with a DuckDB oracle twin.

Everything is ONE streaming ``map_batches`` over the corpus — no shuffle,
no state: metrics are per-document, so the stage scales linearly and
composes with the dedup/curation stages in ``pipelines/prepare.py``.
All kernels are Arrow/numpy vectorized (split_pattern_regex + offset
bincounts); there is no per-row Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# the canonical "must contain >= 2 of these" Gopher stopword check
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@dataclass(frozen=True)
class QualityThresholds:
    """Keep bounds, Gopher-flavored defaults. A doc is kept iff every
    bound holds. Ratio bounds are rationals (num/den) so the keep mask is
    evaluated in INTEGER space (``k*den (>=|<=) bound_num*n``) — bit-exact
    against the integer-arithmetic SQL oracle, no float rounding seam."""

    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: tuple[int, int] = (3, 1)      # sum_wlen/n_words >= 3
    max_mean_word_len: tuple[int, int] = (10, 1)     # <= 10
    min_alpha_word_frac: tuple[int, int] = (4, 5)    # >= 0.8
    max_symbol_word_ratio: tuple[int, int] = (1, 10)  # <= 0.1
    max_bullet_line_frac: tuple[int, int] = (9, 10)  # <= 0.9
    max_ellipsis_line_frac: tuple[int, int] = (3, 10)  # <= 0.3
    min_stop_hits: int = 2
    max_dup_line_frac: tuple[int, int] = (3, 10)     # <= 0.3
    max_top2gram_frac: tuple[int, int] = (1, 5)      # <= 0.2


def _doc_bincount(doc_of: np.ndarray, mask: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(doc_of[mask], minlength=n) if len(doc_of) else np.zeros(n, np.int64)


def quality_metrics_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document quality metrics for one Arrow batch (vectorized)."""
    n = batch.num_rows
    col = batch.column(text_col).combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # num_chunks == 1 after combine
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.string())

    # ---- words: whitespace-run split; empties only at string edges ----
    words = pc.split_pattern_regex(col, r"[ \t\n\r]+")
    wf = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(n), np.diff(offs))
    wlen = pc.utf8_length(wf).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = wlen > 0
    n_words = _doc_bincount(doc_of, nonempty, n)
    sum_wlen = (
        np.bincount(doc_of[nonempty], weights=wlen[nonempty], minlength=n)
        if len(doc_of) else np.zeros(n)
    )
    safe_w = np.maximum(n_words, 1)
    mean_word_len = np.where(n_words > 0, sum_wlen / safe_w, 0.0)

    alpha = pc.match_substring_regex(wf, "[a-zA-Z]").to_numpy(zero_copy_only=False)
    n_alpha_words = _doc_bincount(doc_of, alpha & nonempty, n)
    alpha_word_frac = np.where(n_words > 0, n_alpha_words / safe_w, 0.0)

    # distinct stopwords present (the Gopher >=2-stopwords check)
    is_stop = pc.is_in(wf, value_set=pa.array(STOP_WORDS)).to_numpy(zero_copy_only=False)
    if is_stop.any():
        # distinct (doc, stopword) pairs; stopword codes are distinct values
        # of the batch dictionary, so (doc, code) uniqueness is exact
        codes = pc.dictionary_encode(wf).indices.to_numpy(zero_copy_only=False)
        su = np.unique(np.stack([doc_of[is_stop], codes[is_stop]]), axis=1)
        stop_hits = np.bincount(su[0], minlength=n)
    else:
        stop_hits = np.zeros(n, np.int64)

    # symbol counters: '#' chars + non-overlapping '...' runs
    n_hash = pc.count_substring(col, "#").to_numpy(zero_copy_only=False)
    n_ell = pc.count_substring(col, "...").to_numpy(zero_copy_only=False)

    # ---- lines ----
    lines = pc.split_pattern(col, "\n")
    lf = lines.flatten()
    loffs = lines.offsets.to_numpy(zero_copy_only=False)
    ldoc = np.repeat(np.arange(n), np.diff(loffs))
    n_lines = np.diff(loffs).astype(np.int64)
    safe_l = np.maximum(n_lines, 1)

    bullet = pc.match_substring_regex(lf, r"^[-*•]").to_numpy(zero_copy_only=False)
    n_bullet_lines = _doc_bincount(ldoc, bullet, n)
    ell = pc.ends_with(lf, pattern="...").to_numpy(zero_copy_only=False)
    n_ellipsis_lines = _doc_bincount(ldoc, ell, n)

    # duplicate-line fraction: 1 - distinct/total (within the document)
    lcodes = pc.dictionary_encode(lf).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(lcodes):
        pair = ldoc * (np.int64(lcodes.max()) + 1) + lcodes
        distinct_doc = np.unique(pair) // (np.int64(lcodes.max()) + 1)
        n_distinct = np.bincount(distinct_doc.astype(np.int64), minlength=n)
    else:
        n_distinct = np.zeros(n, np.int64)
    dup_line_frac = np.where(n_lines > 0, 1.0 - n_distinct / safe_l, 0.0)

    # top word-2-gram mass: occurrences of the most frequent adjacent
    # word pair / total pairs (empty words sit only at string edges, so
    # filtering them preserves adjacency)
    wcodes = pc.dictionary_encode(wf).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    top2_num = np.zeros(n, np.int64)
    top2_den = np.zeros(n, np.int64)
    if len(wcodes) > 1:
        v = np.int64(wcodes.max()) + 1
        same = doc_of[1:] == doc_of[:-1]
        valid = same & nonempty[1:] & nonempty[:-1]
        if valid.any():
            g = (doc_of[1:][valid] * v * v + wcodes[:-1][valid] * v
                 + wcodes[1:][valid])
            gu, gc = np.unique(g, return_counts=True)
            gdoc = (gu // (v * v)).astype(np.int64)
            np.maximum.at(top2_num, gdoc, gc)
            np.add.at(top2_den, gdoc, gc)
    top2gram_frac = np.where(top2_den > 0, top2_num / np.maximum(top2_den, 1), 0.0)

    def _i64(x):
        return pa.array(np.asarray(x, np.int64), pa.int64())

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            # exact integer counters — the SQL-oracle surface
            "n_words": _i64(n_words),
            "sum_wlen": _i64(sum_wlen),
            "n_alpha_words": _i64(n_alpha_words),
            "n_symbols": _i64(n_hash + n_ell),
            "n_lines": _i64(n_lines),
            "n_bullet_lines": _i64(n_bullet_lines),
            "n_ellipsis_lines": _i64(n_ellipsis_lines),
            "stop_hits": _i64(stop_hits),
            "n_distinct_lines": _i64(n_distinct),
            "top2_num": _i64(top2_num),
            "top2_den": _i64(top2_den),
            # derived ratios (human-facing; NOT used by the keep mask)
            "mean_word_len": pa.array(np.round(mean_word_len, 6), pa.float64()),
            "alpha_word_frac": pa.array(np.round(alpha_word_frac, 6), pa.float64()),
            "dup_line_frac": pa.array(np.round(dup_line_frac, 6), pa.float64()),
            "top2gram_frac": pa.array(np.round(top2gram_frac, 6), pa.float64()),
        }
    )


def _keep_mask(m: pa.Table, th: QualityThresholds) -> np.ndarray:
    """Integer-space evaluation of every ratio bound: ``k/n >= p/q`` is
    tested as ``k*q >= p*n`` (and <= likewise), so the mask is bit-exact
    against the same integer arithmetic in SQL."""

    def a(name):
        return np.asarray(m.column(name), dtype=np.int64)

    def ge(k, n, bound):  # k/n >= p/q  (n >= 0)
        p, q = bound
        return k * q >= p * n

    def le(k, n, bound):  # k/n <= p/q
        p, q = bound
        return k * q <= p * n

    n_words, n_lines = a("n_words"), a("n_lines")
    dup = n_lines - a("n_distinct_lines")
    return (
        (n_words >= th.min_words)
        & (n_words <= th.max_words)
        & ge(a("sum_wlen"), n_words, th.min_mean_word_len)
        & le(a("sum_wlen"), n_words, th.max_mean_word_len)
        & ge(a("n_alpha_words"), n_words, th.min_alpha_word_frac)
        & le(a("n_symbols"), n_words, th.max_symbol_word_ratio)
        & le(a("n_bullet_lines"), n_lines, th.max_bullet_line_frac)
        & le(a("n_ellipsis_lines"), n_lines, th.max_ellipsis_line_frac)
        & (a("stop_hits") >= th.min_stop_hits)
        & le(dup, n_lines, th.max_dup_line_frac)
        & le(a("top2_num"), a("top2_den"), th.max_top2gram_frac)
    )


def quality_metrics(ds: ray.data.Dataset, text_col: str = "text",
                    thresholds: QualityThresholds | None = None) -> ray.data.Dataset:
    """Per-document metrics + ``keep`` flag — one streaming map_batches."""
    th = thresholds or QualityThresholds()

    def _f(batch: pa.Table) -> pa.Table:
        m = quality_metrics_batch(batch, text_col)
        return m.append_column("keep", pa.array(_keep_mask(m, th)))

    return ds.map_batches(_f, batch_format="pyarrow")


def quality_filter(ds: ray.data.Dataset, text_col: str = "text",
                   thresholds: QualityThresholds | None = None) -> ray.data.Dataset:
    """Rows passing every quality bound (all original columns kept)."""
    th = thresholds or QualityThresholds()

    def _f(batch: pa.Table) -> pa.Table:
        m = quality_metrics_batch(batch, text_col)
        return batch.filter(pa.array(_keep_mask(m, th)))

    return ds.map_batches(_f, batch_format="pyarrow")
