"""Exhaustive scoring oracle — the CheckHits pattern.

An INDEPENDENT implementation path (scalar tokenization, per-doc dict
postings, no index, no codecs, no pruning) that recomputes any query's full
result set with the same float32 BM25 formula. Tests assert the engine —
compressed, chunked, salted, any parallelism — returns rank-identical top-k
with float-equal scores (SURVEY §5: CheckHits.java:181-318 /
TestBlockMaxConjunction-style oracle comparison).
"""

from __future__ import annotations

import numpy as np

from lucene_ray.analysis.tokenizer import StandardLikeAnalyzer
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_ray.search.similarity import BM25Similarity, CollectionStats, TermStats


class ExhaustiveOracle:
    def __init__(self, docs: list[tuple[int, str]],
                 analyzer: StandardLikeAnalyzer | None = None,
                 similarity: BM25Similarity | None = None):
        """docs: (global_doc_id, text) pairs, in global doc id order."""
        self.an = analyzer or StandardLikeAnalyzer()
        self.sim = similarity or BM25Similarity()
        self.doc_ids: list[int] = []
        self.postings: list[dict[str, list[int]]] = []  # term -> positions
        self.lengths: list[int] = []
        for gid, text in docs:
            p, n = self.an.invert(text)
            self.doc_ids.append(gid)
            self.postings.append(p)
            self.lengths.append(n)
        from lucene_ray.codec.smallfloat import int_to_byte4

        self.norm_bytes = [int_to_byte4(n) for n in self.lengths]
        self.cstats = CollectionStats(
            doc_count=len(self.lengths), sum_total_term_freq=sum(self.lengths)
        )
        # global df/ttf per term
        self.df: dict[str, int] = {}
        self.ttf: dict[str, int] = {}
        for p in self.postings:
            for t, pos in p.items():
                self.df[t] = self.df.get(t, 0) + 1
                self.ttf[t] = self.ttf.get(t, 0) + len(pos)

    def _scorer(self, terms: tuple, boost: float = 1.0):
        tss = [TermStats(self.df.get(t, 0), self.ttf.get(t, 0)) for t in terms]
        if any(ts.doc_freq == 0 for ts in tss):
            return None
        # boost folds into the weight (weight = boost * idf), as in Lucene
        return self.sim.scorer(boost, self.cstats, *tss)

    def _matches(self, q: Query, i: int) -> tuple[bool, np.float32]:
        """Does doc i match q, and with what float32 score."""
        p = self.postings[i]
        if isinstance(q, TermQuery):
            if q.term not in p:
                return False, np.float32(0)
            scorer = self._scorer((q.term,), q.boost)
            s = scorer.score(np.array([len(p[q.term])]), np.array([self.norm_bytes[i]]))[0]
            return True, s
        if isinstance(q, PhraseQuery):
            freq = (
                self._phrase_freq(q.terms, i)
                if q.slop == 0
                else self._sloppy_phrase_freq(q.terms, i, q.slop)
            )
            if freq == 0:
                return False, np.float32(0)
            scorer = self._scorer(tuple(q.terms), q.boost)
            s = scorer.score(np.array([freq]), np.array([self.norm_bytes[i]]))[0]
            return True, s
        if isinstance(q, PrefixQuery):
            ok = any(t.startswith(q.prefix) for t in p)
            return ok, np.float32(q.boost) if ok else np.float32(0)
        if isinstance(q, WildcardQuery):
            import fnmatch

            ok = any(fnmatch.fnmatchcase(t, q.pattern) for t in p)
            return ok, np.float32(q.boost) if ok else np.float32(0)
        if isinstance(q, RegexpQuery):
            import re

            rx = re.compile(q.pattern + r"\Z")
            ok = any(rx.match(t) for t in p)
            return ok, np.float32(q.boost) if ok else np.float32(0)
        if isinstance(q, FuzzyQuery):
            from lucene_ray.index.reader import _levenshtein_within

            ok = any(_levenshtein_within(t, q.term, q.max_edits) for t in p)
            return ok, np.float32(q.boost) if ok else np.float32(0)
        if isinstance(q, TermRangeQuery):
            def in_range(t):
                if q.lower is not None:
                    if t < q.lower or (t == q.lower and not q.include_lower):
                        return False
                if q.upper is not None:
                    if t > q.upper or (t == q.upper and not q.include_upper):
                        return False
                return True

            ok = any(in_range(t) for t in p)
            return ok, np.float32(q.boost) if ok else np.float32(0)
        if isinstance(q, MatchAllQuery):
            return True, np.float32(q.boost)
        if isinstance(q, TermInSetQuery):
            ok = any(t in p for t in q.terms)
            return ok, np.float32(q.boost) if ok else np.float32(0)
        if isinstance(q, SynonymQuery):
            # blended pseudo-term: freq = sum of boosted per-term freqs in
            # term order; stats df = max, ttf = sum (SynonymWeight :213-231)
            freq = np.float32(0)
            matched = False
            for t, b in zip(q.terms, q.boosts):
                if t in p:
                    matched = True
                    f = np.float32(len(p[t]))
                    if b != 1.0:
                        f = np.float32(b) * f
                    freq = np.float32(freq + f)
            if not matched:
                return False, np.float32(0)
            tss = [TermStats(self.df.get(t, 0), self.ttf.get(t, 0))
                   for t in q.terms]
            df = max(ts.doc_freq for ts in tss)
            ttf = sum(ts.total_term_freq for ts in tss if ts.doc_freq > 0)
            scorer = self.sim.scorer(q.boost, self.cstats, TermStats(df, ttf))
            s = scorer.score(np.array([freq]), np.array([self.norm_bytes[i]]))[0]
            return True, s
        if isinstance(q, BooleanQuery):
            score = np.float32(0)
            for c in q.must:
                ok, s = self._matches(c, i)
                if not ok:
                    return False, np.float32(0)
                score = np.float32(score + s)
            n_should = 0
            for c in q.should:
                ok, s = self._matches(c, i)
                if ok:
                    n_should += 1
                    score = np.float32(score + s)
            if n_should < q.effective_msm:
                return False, np.float32(0)
            if not q.must and not q.should:
                return False, np.float32(0)
            for c in q.must_not:
                ok, _ = self._matches(c, i)
                if ok:
                    return False, np.float32(0)
            for c in q.filter:
                # FILTER = required but scoreless (BooleanClause.Occur.FILTER)
                ok, _ = self._matches(c, i)
                if not ok:
                    return False, np.float32(0)
            return True, score
        raise TypeError(f"unsupported query {q!r}")

    def _phrase_freq(self, terms: tuple, i: int) -> int:
        p = self.postings[i]
        pos_lists = []
        for t in terms:
            if t not in p:
                return 0
            pos_lists.append(p[t])
        first = pos_lists[0]
        count = 0
        for start in first:
            if all((start + j) in pos_lists[j] for j in range(1, len(terms))):
                count += 1
        return count

    def _sloppy_phrase_freq(self, terms: tuple, i: int, slop: int) -> float:
        """Scalar mirror of SegmentScorer._sloppy_freqs: per anchor (term-0
        occurrence), each other term contributes its occurrence with shifted
        position nearest the anchor (tie -> smaller); width <= slop adds
        1/(1+width), accumulated in float32 in anchor order."""
        import bisect

        p = self.postings[i]
        shifted = []
        for j, t in enumerate(terms):
            if t not in p:
                return 0.0
            shifted.append(sorted(pos - j for pos in p[t]))
        width_counts = [0] * (slop + 1)
        for s0 in shifted[0]:
            lo = hi = s0
            for arr in shifted[1:]:
                k = bisect.bisect_left(arr, s0)
                cands = []
                if k > 0:
                    cands.append(arr[k - 1])
                if k < len(arr):
                    cands.append(arr[k])
                best = min(cands, key=lambda v: (abs(v - s0), v))
                lo = min(lo, best)
                hi = max(hi, best)
            width = hi - lo
            if width <= slop:
                width_counts[width] += 1
        # width-bucketed float32 accumulation, ascending w (engine-identical)
        freq = np.float32(0)
        for w in range(slop + 1):
            freq = np.float32(freq + np.float32(width_counts[w]) * np.float32(1.0 / (1.0 + w)))
        return float(freq)

    def search(self, q: Query, k: int = 10):
        """(doc_ids, scores, total) with the engine's exact tie-break."""
        hits = []
        for i in range(len(self.doc_ids)):
            ok, s = self._matches(q, i)
            if ok:
                hits.append((self.doc_ids[i], s))
        hits.sort(key=lambda h: (-float(h[1]), h[0]))
        top = hits[:k]
        return (
            np.array([h[0] for h in top], dtype=np.uint64),
            np.array([h[1] for h in top], dtype=np.float32),
            len(hits),
        )
