"""Text-analysis operators over a document Dataset (SURVEY extension ops).

All stages are vectorized ``map_batches`` transforms using the SAME tokenizer
grammar as the index side (lowercase ``[a-z0-9_]+`` runs), so DuckDB oracles
can express them with ``string_split_regex(lower(text), '[^a-z0-9_]+')``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from lucene_ray.index.invert import tokenize_column

# per-language stopword marker sets for the n-gram/stopword langid heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "un", "les", "des", "est", "que", "pour"},
    "de": {"der", "die", "und", "das", "von", "mit", "ist", "den", "ein", "zu"},
    "zh": set(),  # CJK detected by codepoint ratio instead
}


def doc_token_stats(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """(id, n_tokens, n_unique_tokens, fingerprint) per document.

    ``fingerprint`` = md5 hex of the space-joined token stream — a
    deterministic document fingerprint with an exact SQL equivalent.
    """

    def stats(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        counts = np.bincount(doc_idx, minlength=n)
        toks = flat.to_pylist()
        per_doc: list[list[str]] = [[] for _ in range(n)]
        for t, d in zip(toks, doc_idx):
            per_doc[d].append(t)
        uniq = np.array([len(set(x)) for x in per_doc], dtype=np.int64)
        fp = [hashlib.md5(" ".join(x).encode()).hexdigest() for x in per_doc]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(counts.astype(np.int64), pa.int64()),
                "n_unique_tokens": pa.array(uniq, pa.int64()),
                "fingerprint": pa.array(fp, pa.string()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Heuristic quality signals (integer-valued so oracles stay exact):
    n_chars, n_tokens, n_alpha_chars, n_digit_chars, max_token_len."""

    def q(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column(text_col)
        flat, doc_idx, _ = tokenize_column(text)
        n = len(batch)
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        tok_lens = np.asarray(pc.binary_length(flat), dtype=np.int64)
        max_len = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_len, doc_idx, tok_lens)
        texts = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        n_chars = np.asarray(pc.utf8_length(texts), dtype=np.int64)
        # ASCII-only counts (exactly [A-Za-z] / [0-9]) so the SQL oracle's
        # regexp_replace classes agree byte-for-byte
        alpha = np.zeros(n, dtype=np.int64)
        digit = np.zeros(n, dtype=np.int64)
        for i in range(n):
            s = texts[i].as_py()
            alpha[i] = sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in s)
            digit[i] = sum("0" <= c <= "9" for c in s)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_alpha_chars": pa.array(alpha, pa.int64()),
                "n_digit_chars": pa.array(digit, pa.int64()),
                "max_token_len": pa.array(max_len, pa.int64()),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")


class LangId:
    """Stateful langid stage (actor pool): marker stopword ratios + CJK
    codepoint ratio. Deterministic; setup once per actor (__init__)."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column("text"))
        n = len(batch)
        toks = flat.to_pylist()
        per_doc: list[list[str]] = [[] for _ in range(n)]
        for t, d in zip(toks, doc_idx):
            per_doc[d].append(t)
        preds = []
        for i in range(n):
            text = batch.column("text")[i].as_py()
            cjk = sum(1 for c in text if "一" <= c <= "鿿")
            if cjk > 0.05 * max(1, len(text)):
                preds.append("zh")
                continue
            ws = per_doc[i]
            best, best_score = "en", -1.0
            for lang, mk in self.markers.items():
                if not mk:
                    continue
                score = sum(w in mk for w in ws) / max(1, len(ws))
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best if best_score > 0 else "en")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
            }
        )


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)


class BpeishCounter:
    """Stateful stage: GPT-2-style pretokenizer regex compiled once per
    actor; counts subword-ish tokens per doc (the 'token counting' op of a
    training-data pipeline — an approximation of a BPE tokenizer's
    pretokenization pass, deterministic and library-free)."""

    def __init__(self):
        import re

        self.pat = re.compile(
            r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = [len(self.pat.findall(t)) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )


def bpe_token_count(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(BpeishCounter, batch_format="pyarrow", concurrency=2)
