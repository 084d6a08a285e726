"""Per-segment query execution — vectorized iterator algebra.

Lucene walks sorted postings via ``DocIdSetIterator`` virtual calls
(DocIdSetIterator.java:111-134); here each segment evaluates a query as numpy
kernels over decoded docID/freq arrays (SURVEY §1.4 mapping): union = scatter
into a dense float32 accumulator, intersection = presence counting,
difference = mask, phrase = vectorized position alignment. Results are
sparse ``(local_docs, float32 scores)`` pairs; top-k is argpartition + the
Lucene tie-break (score desc, then doc id asc — TopDocs.java:75-119 with
insertion order == docID order).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_ray.codec.postings import decode_docs, decode_freqs, decode_positions
from lucene_ray.search.query import (
    BooleanQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)
from lucene_ray.search.similarity import BM25Scorer


@dataclass
class TermPostings:
    docs: np.ndarray  # int64 segment-local doc ids, ascending
    freqs: np.ndarray  # int64
    pos_chunks: list | None  # [(start_idx, pos_enc, freqs_slice)] lazily decoded


class SegmentContext:
    """Decoded postings for one (segment, query) evaluation."""

    def __init__(self, num_docs: int, norms: np.ndarray, global_ids: np.ndarray):
        self.num_docs = num_docs
        self.norms = norms
        self.global_ids = global_ids
        self.postings: dict[str, TermPostings] = {}

    @classmethod
    def from_chunk_table(cls, table, num_docs, norms, global_ids, with_positions=False):
        """Build from the reader's chunk rows (already sorted by term, min_doc)."""
        ctx = cls(num_docs, norms, global_ids)
        if table is None or len(table) == 0:
            return ctx
        terms = table.column("term").to_pylist()
        counts = table.column("count").to_pylist()
        docs_enc = table.column("docs_enc").to_pylist()
        freqs_enc = table.column("freqs_enc").to_pylist()
        pos_enc = table.column("pos_enc").to_pylist() if with_positions else None
        i = 0
        n = len(terms)
        while i < n:
            j = i
            while j < n and terms[j] == terms[i]:
                j += 1
            docs_parts, freqs_parts, pos_parts = [], [], []
            for r in range(i, j):
                d = decode_docs(docs_enc[r], counts[r]).astype(np.int64)
                f = decode_freqs(freqs_enc[r], counts[r]).astype(np.int64)
                docs_parts.append(d)
                freqs_parts.append(f)
                if pos_enc is not None:
                    pos_parts.append((pos_enc[r], f))
            ctx.postings[terms[i]] = TermPostings(
                docs=np.concatenate(docs_parts),
                freqs=np.concatenate(freqs_parts),
                pos_chunks=pos_parts if pos_enc is not None else None,
            )
            i = j
        return ctx


class SegmentScorer:
    """Evaluate a query against one segment's decoded context."""

    def __init__(self, ctx: SegmentContext, scorers: dict[str, BM25Scorer],
                 phrase_scorers: dict[tuple, BM25Scorer] | None = None,
                 prefix_terms: dict[str, list[str]] | None = None):
        self.ctx = ctx
        self.scorers = scorers  # term -> BM25Scorer (global stats)
        self.phrase_scorers = phrase_scorers or {}
        self.prefix_terms = prefix_terms or {}

    # ---- evaluation: returns (docs ascending, float32 scores) ----

    def evaluate(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(q, TermQuery):
            return self._eval_term(q)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q)
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q)
        if isinstance(q, PrefixQuery):
            return self._eval_prefix(q)
        if isinstance(q, MatchAllQuery):
            docs = np.arange(self.ctx.num_docs, dtype=np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        raise TypeError(f"unsupported query: {q!r}")

    def _eval_term(self, q: TermQuery) -> tuple[np.ndarray, np.ndarray]:
        tp = self.ctx.postings.get(q.term)
        if tp is None or len(tp.docs) == 0:
            return _EMPTY
        scorer = self.scorers[q.term]
        scores = scorer.score(tp.freqs, self.ctx.norms[tp.docs])
        if q.boost != 1.0:
            scores = (np.float32(q.boost) * scores).astype(np.float32)
        return tp.docs, scores

    def _eval_prefix(self, q: PrefixQuery) -> tuple[np.ndarray, np.ndarray]:
        # constant-score union over the expansion (MultiTermQuery rewrite)
        terms = self.prefix_terms.get(q.prefix, [])
        present = np.zeros(self.ctx.num_docs, dtype=bool)
        for t in terms:
            tp = self.ctx.postings.get(t)
            if tp is not None:
                present[tp.docs] = True
        docs = np.flatnonzero(present).astype(np.int64)
        return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)

    def _eval_phrase(self, q: PhraseQuery) -> tuple[np.ndarray, np.ndarray]:
        freqs_by_doc = self._phrase_freqs(q.terms)
        if freqs_by_doc is None:
            return _EMPTY
        docs, pfreqs = freqs_by_doc
        if len(docs) == 0:
            return _EMPTY
        scorer = self.phrase_scorers[tuple(q.terms)]
        scores = scorer.score(pfreqs, self.ctx.norms[docs])
        if q.boost != 1.0:
            scores = (np.float32(q.boost) * scores).astype(np.float32)
        return docs, scores

    def _phrase_freqs(self, terms: tuple) -> tuple[np.ndarray, np.ndarray] | None:
        """Exact-phrase frequencies: docs containing terms at consecutive
        positions, vectorized via set intersection of (doc, pos - i) keys."""
        tps = []
        for t in terms:
            tp = self.ctx.postings.get(t)
            if tp is None or tp.pos_chunks is None:
                return None
            tps.append(tp)
        # candidate docs: AND over term doc lists
        cand = tps[0].docs
        for tp in tps[1:]:
            cand = _intersect_sorted(cand, tp.docs)
            if len(cand) == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
        # for each term, build (doc, pos - idx) keys restricted to candidates
        key_sets = []
        for i, tp in enumerate(tps):
            pos_flat = _decode_all_positions(tp)
            ends = np.cumsum(tp.freqs)
            starts = ends - tp.freqs
            sel = np.isin(tp.docs, cand)
            sel_idx = np.flatnonzero(sel)
            doc_rep = np.repeat(tp.docs[sel_idx], tp.freqs[sel_idx])
            tok_idx = _ranges_concat(starts[sel_idx], ends[sel_idx])
            shifted = pos_flat[tok_idx].astype(np.int64) - i
            keys = doc_rep * np.int64(1 << 32) + shifted + 1  # +1: shift can be -1
            key_sets.append(keys)
        common = key_sets[0]
        for ks in key_sets[1:]:
            common = common[np.isin(common, ks)]
            if len(common) == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
        match_docs = (common // np.int64(1 << 32)).astype(np.int64)
        docs, pfreqs = np.unique(match_docs, return_counts=True)
        return docs, pfreqs.astype(np.int64)

    def _eval_bool(self, q: BooleanQuery) -> tuple[np.ndarray, np.ndarray]:
        n = self.ctx.num_docs
        acc = np.zeros(n, dtype=np.float32)
        msm = q.effective_msm
        touched_any = False

        if q.must:
            must_count = np.zeros(n, dtype=np.int32)
            for c in q.must:
                d, s = self.evaluate(c)
                acc[d] += s
                must_count[d] += 1
            mask = must_count == len(q.must)
            touched_any = True
        else:
            mask = None

        if q.should:
            should_count = np.zeros(n, dtype=np.int32)
            for c in q.should:
                d, s = self.evaluate(c)
                acc[d] += s
                should_count[d] += 1
            if msm > 0:
                smask = should_count >= msm
                mask = smask if mask is None else (mask & smask)
            touched_any = True

        if mask is None:
            mask = np.zeros(n, dtype=bool) if not touched_any else acc != 0

        for c in q.must_not:
            d, _ = self.evaluate(c)
            mask[d] = False

        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, acc[docs]

    # ---- top-k ----

    def top_k(self, q: Query, k: int) -> tuple[np.ndarray, np.ndarray, int]:
        """(global_doc_ids, scores, total_hits) for this segment, sorted by
        (-score, local doc id)."""
        docs, scores = self.evaluate(q)
        total = len(docs)
        if total == 0:
            return np.zeros(0, np.uint64), np.zeros(0, np.float32), 0
        if total > k:
            part = np.argpartition(scores, -k)[-k:]
            docs, scores = docs[part], scores[part]
        order = np.lexsort((docs, -scores.astype(np.float64)))
        docs, scores = docs[order], scores[order]
        if len(docs) > k:
            docs, scores = docs[:k], scores[:k]
        return self.ctx.global_ids[docs], scores, total


_EMPTY = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32))


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a[np.isin(a, b, assume_unique=True)]


def _decode_all_positions(tp: TermPostings) -> np.ndarray:
    parts = [decode_positions(enc, f) for enc, f in tp.pos_chunks]
    return np.concatenate(parts) if parts else np.zeros(0, np.uint64)


def _ranges_concat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate [s, e) index ranges into one index array, vectorized."""
    lengths = ends - starts
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out_starts = np.cumsum(lengths) - lengths
    idx = np.arange(total, dtype=np.int64) - np.repeat(out_starts, lengths) + np.repeat(
        starts, lengths
    )
    return idx
