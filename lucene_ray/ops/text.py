"""Text-analysis operators over a document Dataset (SURVEY extension ops).

All stages are vectorized ``map_batches`` transforms using the SAME tokenizer
grammar as the index side (lowercase ``[a-z0-9_]+`` runs), so DuckDB oracles
can express them with ``string_split_regex(lower(text), '[^a-z0-9_]+')``.
No per-row/per-char Python in any hot path: character classes are counted on
the raw Arrow byte buffer, unique-token counts come from one stable sort +
boundary scan, and the only per-doc Python left is the md5 call itself.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _string_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(byte_offsets[int64, n+1], data[uint8]) of an Arrow string column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + arr.offset + 1)[
        arr.offset :
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return offs, data


def _count_byte_class(offs: np.ndarray, data: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-doc count of bytes whose class-mask is set (cumsum-diff — safe
    for empty docs, unlike reduceat)."""
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(mask, out=cs[1:])
    base = offs[0]
    return cs[offs[1:] - base] - cs[offs[:-1] - base]


def doc_token_stats(ds: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    grammar: str = "code") -> ray.data.Dataset:
    """(id, n_tokens, n_unique_tokens, fingerprint) per document.

    ``fingerprint`` = md5 hex of the space-joined token stream — a
    deterministic document fingerprint with an exact SQL equivalent. The
    joined byte stream is assembled with one vectorized scatter; only the
    md5 calls themselves loop (one per doc). ``grammar`` selects the
    tokenizer (e.g. "word_delimiter" for WordDelimiterGraphFilter-style
    camelCase/digit splitting).
    """

    def stats(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_column(batch.column(text_col),
                                           grammar=grammar)
        n = len(batch)
        counts = np.bincount(doc_idx, minlength=n).astype(np.int64)

        # unique tokens per doc: tokens are in doc order; one stable sort by
        # interned id within doc -> count (doc, id) boundaries
        total = len(doc_idx)
        if total:
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            tok_ids = np.asarray(d.indices, dtype=np.int64)
            order = np.lexsort((tok_ids, doc_idx))
            ds_, ts_ = doc_idx[order], tok_ids[order]
            bound = np.empty(total, dtype=bool)
            bound[0] = True
            bound[1:] = (ds_[1:] != ds_[:-1]) | (ts_[1:] != ts_[:-1])
            uniq = np.bincount(ds_[bound], minlength=n).astype(np.int64)
        else:
            uniq = np.zeros(n, dtype=np.int64)

        # space-joined token bytes per doc, one scatter into a flat buffer
        fp = []
        if total:
            toffs, tdata = _string_buffers(flat)
            tlens = np.diff(toffs)
            doc_first = np.zeros(n, dtype=np.int64)
            np.cumsum(counts[:-1], out=doc_first[1:])
            within_idx = np.arange(total, dtype=np.int64) - doc_first[doc_idx]
            byte_cum = np.cumsum(tlens) - tlens  # global start per token
            out_len = np.bincount(doc_idx, weights=tlens, minlength=n).astype(np.int64)
            out_len += np.maximum(counts - 1, 0)  # separators
            out_doc_base = np.cumsum(out_len) - out_len
            # doc_first of an empty doc points at the next doc's first token
            # (clipped: the value is never used for tokenless docs)
            doc_byte_base = byte_cum[np.minimum(doc_first, total - 1)]
            start_out = out_doc_base[doc_idx] + (byte_cum - doc_byte_base[doc_idx]) + within_idx
            out = np.full(int(out_len.sum()), ord(" "), dtype=np.uint8)
            from lucene_ray.search.executor import _ranges_concat

            out[_ranges_concat(start_out, start_out + tlens)] = tdata[toffs[0]:toffs[-1]]
            mv = memoryview(out)
            ends = np.cumsum(out_len)
            starts = ends - out_len
            fp = [hashlib.md5(mv[starts[i]:ends[i]]).hexdigest() for i in range(n)]
        else:
            fp = [hashlib.md5(b"").hexdigest()] * n
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(counts, pa.int64()),
                "n_unique_tokens": pa.array(uniq, pa.int64()),
                "fingerprint": pa.array(fp, pa.string()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


# PII scrubbing rules, applied IN ORDER; each class is counted on the text
# state it is applied to, then replaced globally (RE2 on both sides: pyarrow
# replace_substring_regex and DuckDB regexp_replace share the dialect)
PII_RULES = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("n_phones", r"\+1-555-\d{4}\b", "<PHONE>"),
)


def redact_pii(ds: ray.data.Dataset, text_col: str = "text",
               id_col: str = "doc_id", decorate: bool = True) -> ray.data.Dataset:
    """PII scrubbing for training corpora: emails, IPv4 addresses and phone
    numbers replaced by typed placeholders — one streaming ``map_batches``,
    one RE2 pass per class over the Arrow column (no Python in the row
    path). Returns (doc_id, n_emails, n_ips, n_phones, redacted).

    The synthetic test corpus contains no organic PII, so ``decorate=True``
    deterministically plants one of each class per doc, derived from doc_id
    (the geo-ops precedent: derived inputs keyed on the primary key) —
    redaction then provably fires on every row, and the SQL oracle replays
    the same decoration + replacement chain exactly."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if decorate:
            i = np.asarray(batch.column(id_col), dtype=np.int64)
            pieces = [" contact user", i.astype("U"),
                      "@mail", (i % 7).astype("U"),
                      ".example.com from ", (10 + i % 240).astype("U"),
                      ".", (i % 256).astype("U"),
                      ".", (i * 3 % 256).astype("U"),
                      ".", (i * 7 % 256).astype("U"),
                      " or +1-555-", (1000 + i % 9000).astype("U")]
            dec = pieces[0]
            for p in pieces[1:]:
                dec = np.char.add(dec, p)
            txt = pc.binary_join_element_wise(txt, pa.array(dec, pa.string()), "")
        cols = {id_col: batch.column(id_col)}
        for name, pat, rep in PII_RULES:
            cols[name] = pc.cast(
                pc.count_substring_regex(txt, pattern=pat), pa.int64())
            txt = pc.replace_substring_regex(txt, pattern=pat, replacement=rep)
        cols["redacted"] = txt
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Heuristic quality signals (integer-valued so oracles stay exact):
    n_chars, n_tokens, n_alpha_chars, n_digit_chars, max_token_len.
    ASCII [A-Za-z]/[0-9] are counted directly on the byte buffer (multi-byte
    UTF-8 units are never in those ranges, matching the SQL regex classes)."""

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
        offs, data = _string_buffers(texts)
        alpha_mask = ((data >= 0x41) & (data <= 0x5A)) | ((data >= 0x61) & (data <= 0x7A))
        digit_mask = (data >= 0x30) & (data <= 0x39)
        alpha = _count_byte_class(offs, data, alpha_mask)
        digit = _count_byte_class(offs, data, digit_mask)
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
    codepoint ratio. Deterministic; marker Arrow arrays built once per actor
    (__init__). Marker matching is one pc.is_in + bincount per language;
    the exact CJK codepoint check runs only on docs whose byte stream shows
    a possible CJK lead byte (0xE4..0xE9)."""

    def __init__(self):
        self.langs = [k for k, v in _LANG_MARKERS.items() if v]
        self.marker_arrs = {
            k: pa.array(sorted(v), pa.string()) for k, v in _LANG_MARKERS.items() if v
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column("text")
        texts = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        flat, doc_idx, _ = tokenize_column(texts)
        n = len(batch)
        totals = np.maximum(np.bincount(doc_idx, minlength=n), 1).astype(np.float64)
        ratios = np.zeros((len(self.langs), n), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            mask = np.asarray(pc.is_in(flat, value_set=self.marker_arrs[lang]))
            ratios[li] = np.bincount(doc_idx, weights=mask, minlength=n) / totals
        best_idx = np.argmax(ratios, axis=0)  # first max wins = dict order
        best_score = ratios[best_idx, np.arange(n)]
        preds = np.where(best_score > 0,
                         np.array(self.langs, dtype=object)[best_idx], "en")

        # CJK: exact per-char check only where a CJK-range lead byte exists
        offs, data = _string_buffers(texts)
        lead = (data >= 0xE4) & (data <= 0xE9)
        lead_counts = (
            np.zeros(n, dtype=np.int64) if len(data) == 0
            else np.zeros(n, dtype=np.int64) + _count_from(offs, lead)
        )
        n_chars = np.asarray(pc.utf8_length(texts), dtype=np.int64)
        for i in np.flatnonzero(lead_counts > 0):
            s = texts[i].as_py()
            cjk = sum(1 for c in s if "一" <= c <= "鿿")
            if cjk > 0.05 * max(1, len(s)):
                preds[i] = "zh"
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds.tolist(), pa.string()),
            }
        )


def _count_from(offs: np.ndarray, mask: np.ndarray) -> np.ndarray:
    cs = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=cs[1:])
    base = offs[0]
    return cs[offs[1:] - base] - cs[offs[:-1] - base]


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    # autoscaling pool (min 1): a fixed pool equal to the CPU count would
    # starve the upstream read task
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


class BpeishCounter:
    """Stateful stage: GPT-2-style pretokenizer regex; counts subword-ish
    tokens per doc (the 'token counting' op of a training-data pipeline —
    an approximation of a BPE tokenizer's pretokenization pass,
    deterministic and library-free). Vectorized: one
    ``pc.count_substring_regex`` (RE2, C++) over the whole Arrow column —
    verified count-identical to ``re.findall`` (both engines are
    leftmost-first, so non-overlapping match boundaries agree); the
    compiled-``re`` scalar path remains as fallback for an Arrow build
    without the kernel."""

    _PAT = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

    def __init__(self):
        import re

        self.pat = re.compile(self._PAT)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        try:
            counts = pc.count_substring_regex(col, pattern=self._PAT)
            counts = counts.cast(pa.int64())
        except (pa.ArrowNotImplementedError, AttributeError):
            counts = pa.array(
                [len(self.pat.findall(t)) for t in col.to_pylist()],
                pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": counts,
            }
        )


def bpe_token_count(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(BpeishCounter, batch_format="pyarrow", concurrency=(1, 4))


def unigram_lm_score(ds: ray.data.Dataset, ref_col: str = "lang",
                     ref_value: str = "en", text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Language-model quality scoring (the CCNet-style corpus-filtering
    signal: score every document by a reference-corpus LM; here a unigram
    model with Laplace smoothing, so the whole computation has an exact SQL
    twin). Two passes, both scale-shaped:

    1. token counts over the REFERENCE subset (``ref_col == ref_value``):
       per-batch partial counts -> one vocabulary-sized groupby;
    2. the (token -> log p) table is broadcast via ``ray.put`` (read once
       per worker, vocabulary-bounded) and every doc gets
       ``mean(log((cnt(tok)+1) / (total + V)))`` over its tokens — unseen
       tokens take cnt=0, i.e. the same formula.

    Returns (id, n_tokens, avg_logprob) sorted by id; docs with zero
    tokens score 0.0.
    """
    import math

    import pyarrow.compute as pc
    import ray as _ray

    from lucene_ray.index.invert import tokenize_column

    def ref_counts(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch.column(ref_col), ref_value))
        if len(sub) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        flat, _d, _p = tokenize_column(sub.column(text_col))
        t = pa.table({"tok": flat}).group_by("tok").aggregate([("tok", "count")])
        return t.rename_columns(["tok", "n"])

    from ray.data.aggregate import Sum

    vt = (
        ds.map_batches(ref_counts, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocabulary-sized, not corpus-sized
    )
    total = int(vt["n"].sum())
    v_size = len(vt)
    denom = float(total + v_size)
    logp = {t: math.log((int(n) + 1) / denom)
            for t, n in zip(vt["tok"], vt["n"])}
    oov = math.log(1.0 / denom)
    ref = _ray.put((logp, oov))

    def score(batch: pa.Table) -> pa.Table:
        lp_map, lp_oov = _ray.get(ref)
        flat, doc_idx, _ = tokenize_column(batch.column(text_col))
        n = len(batch)
        cnt = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(flat):
            d = flat.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            vocab = d.dictionary.to_pylist()  # batch-vocab-sized Python
            lp = np.array([lp_map.get(t, lp_oov) for t in vocab],
                          dtype=np.float64)
            per_tok = lp[np.asarray(d.indices, dtype=np.int64)]
            sums = np.bincount(doc_idx, weights=per_tok, minlength=n)
        else:
            sums = np.zeros(n, dtype=np.float64)
        avg = np.divide(sums, cnt, out=np.zeros(n, dtype=np.float64),
                        where=cnt > 0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(cnt, pa.int64()),
            "avg_logprob": pa.array(np.round(avg, 6), pa.float64()),
        })

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = out.sort_values(id_col).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
