"""Percolator — standing queries matched against a document stream.

The Monitor / MemoryIndex analog
(lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:42,
lucene/memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java:198):
each batch of incoming docs is inverted into an in-memory mini index (the
SAME vectorized inverter as the build pipeline) and every registered query
is evaluated against it with the SAME SegmentScorer kernels — a stateful
actor-pool ``map_batches`` stage where query parsing/compilation happens
once per actor.

Scoring is irrelevant for percolation (only match/no-match), so term
scorers are constant-1 stubs; multi-term queries expand against the batch's
own vocabulary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from lucene_ray.search.query import (
    MULTI_TERM_TYPES,
    Query,
    collect_multi_term,
    collect_terms,
    parse_query,
)


class _ConstScorer:
    """Match-only scorer stub (scores never affect hit sets)."""

    def score(self, freqs, norm_bytes):
        return np.ones(len(np.asarray(freqs)), dtype=np.float32)

    def with_boost(self, boost):
        return self


class _OneDocBM25Scorer:
    """BM25 against a ONE-document index — how Lucene's Monitor scores a
    percolated doc (ScoringMatch via MemoryIndex + IndexSearcher): N=1 and
    df=1 fix idf at (float)ln(1 + 0.5/1.5), and dl == avgdl collapses the
    length normalization, so score(f) = w - w/(1 + f/k1) in float32 —
    per-doc deterministic and independent of batch composition (unlike
    scoring against the batch mini-index, which would change with block
    splits). ``n_terms`` models the phrase weight (summed equal idfs,
    BM25Similarity.java:162-170 accumulation)."""

    __slots__ = ("weight", "k1inv", "idf", "n_terms")

    def __init__(self, k1: float = 1.2, boost: float = 1.0, n_terms: int = 1):
        import math as _math

        idf32 = np.float32(_math.log(1 + 0.5 / 1.5))
        self.idf = float(idf32)
        self.n_terms = int(n_terms)
        acc = 0.0
        for _ in range(self.n_terms):
            acc += float(idf32)
        self.weight = np.float32(boost) * np.float32(acc)
        self.k1inv = np.float32(1.0) / np.float32(k1)

    def score(self, freqs, norm_bytes):
        f = np.asarray(freqs).astype(np.float32, copy=False)
        one = np.float32(1.0)
        return self.weight - self.weight / (one + f * self.k1inv)

    def max_score(self, freq, norm_byte):
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost):
        # fold into the RECEIVER's weight (mirrors BM25Scorer.with_boost):
        # a scorer built with a non-default boost, or boosted twice, keeps
        # its earlier boost
        s = _OneDocBM25Scorer(n_terms=self.n_terms)
        s.weight = np.float32(boost) * np.float32(self.weight)
        return s


def _expand_against_vocab(q, vocab: list[str],
                          arr: "pa.Array | None" = None) -> list[str]:
    """Multi-term expansion against a batch vocabulary (AutomatonTermsEnum
    over the MemoryIndex terms). Vectorized: the vocab is matched as one
    Arrow array through pyarrow.compute's RE2 kernels instead of a Python
    loop per term; patterns RE2 cannot compile fall back to the scalar
    path."""
    import re as _re

    import pyarrow.compute as pc

    from lucene_ray.index.reader import _levenshtein_within
    from lucene_ray.search.query import (
        FuzzyQuery,
        PrefixQuery,
        RegexpQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    if arr is None:
        arr = pa.array(vocab, pa.string())

    def _take(mask) -> list[str]:
        return arr.filter(mask).to_pylist()

    if isinstance(q, PrefixQuery):
        return _take(pc.starts_with(arr, pattern=q.prefix))
    if isinstance(q, WildcardQuery):
        pat = "".join(".*" if c == "*" else "." if c == "?" else _re.escape(c)
                      for c in q.pattern)
        return _take(pc.match_substring_regex(arr, pattern=f"^(?:{pat})$"))
    if isinstance(q, RegexpQuery):
        try:
            return _take(pc.match_substring_regex(
                arr, pattern=f"^(?:{q.pattern})$"))
        except pa.ArrowInvalid:  # RE2 can't compile it (e.g. backreference)
            rx = _re.compile(q.pattern + r"\Z")
            return [t for t in vocab if rx.match(t)]
    if isinstance(q, FuzzyQuery):
        # length pre-filter: |len(t) - len(term)| <= max_edits is necessary
        # for edit distance <= max_edits, so the O(len^2) DP only runs on
        # the few survivors
        ln = pc.utf8_length(arr)
        lo, hi = len(q.term) - q.max_edits, len(q.term) + q.max_edits
        mask = pc.and_(pc.greater_equal(ln, lo), pc.less_equal(ln, hi))
        return [t for t in _take(mask)
                if _levenshtein_within(t, q.term, q.max_edits)]
    if isinstance(q, TermRangeQuery):
        mask = None
        if q.lower is not None:
            m = (pc.greater_equal(arr, q.lower) if q.include_lower
                 else pc.greater(arr, q.lower))
            mask = m
        if q.upper is not None:
            m = (pc.less_equal(arr, q.upper) if q.include_upper
                 else pc.less(arr, q.upper))
            mask = m if mask is None else pc.and_(mask, m)
        if mask is None:
            return list(vocab)
        return _take(mask)
    raise TypeError(q)


def query_anchors(q: "Query") -> set[str] | None:
    """Presearcher term extraction — a set S such that every matching doc
    must contain at least one term of S (the TermFilteredPresearcher
    invariant, lucene/monitor/src/java/org/apache/lucene/monitor/
    Presearcher.java:33, TermFilteredPresearcher.java:63). ``None`` means
    the query cannot be term-bounded (match-all, multi-term wildcards,
    numeric/geo, pure negation) and must always be evaluated.

    Rules: a required (MUST/FILTER / phrase / ordered-near) composite is
    anchored by its SMALLEST anchorable child (all children are necessary,
    one suffices for the invariant); a disjunction (SHOULD with msm>=1,
    DisMax, SpanOr) needs the UNION of its children's anchors and degrades
    to None if any child is unbounded."""
    from lucene_ray.search.query import (
        BooleanQuery,
        ConstantScoreQuery,
        DisMaxQuery,
        MultiPhraseQuery,
        PhraseQuery,
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanTermQuery,
        TermQuery,
    )

    if isinstance(q, (TermQuery, SpanTermQuery)):
        return {q.term}
    if isinstance(q, PhraseQuery):
        return {q.terms[0]} if q.terms else None
    if isinstance(q, MultiPhraseQuery):
        return set(q.positions[0]) if q.positions else None
    if isinstance(q, SpanFirstQuery):
        return query_anchors(q.match)
    if isinstance(q, SpanNotQuery):
        return query_anchors(q.include)
    if isinstance(q, ConstantScoreQuery):
        return query_anchors(q.query)
    if isinstance(q, SpanNearQuery):
        best = None
        for c in q.clauses:
            a = query_anchors(c)
            if a is not None and (best is None or len(a) < len(best)):
                best = a
        return best
    if isinstance(q, (SpanOrQuery, DisMaxQuery)):
        children = q.clauses if isinstance(q, SpanOrQuery) else q.disjuncts
        out: set[str] = set()
        for c in children:
            a = query_anchors(c)
            if a is None:
                return None
            out |= a
        return out or None
    if isinstance(q, BooleanQuery):
        best = None
        for c in (*q.must, *q.filter):
            a = query_anchors(c)
            if a is not None and (best is None or len(a) < len(best)):
                best = a
        if best is not None:
            return best
        if q.effective_msm >= 1 and q.should:
            out = set()
            for c in q.should:
                a = query_anchors(c)
                if a is None:
                    return None
                out |= a
            return out or None
        return None
    return None


class Percolator:
    """Actor-pool stage: registered queries compiled once per actor.

    A presearcher index (anchor term -> query ids, built once in
    ``__init__``) prunes the per-batch candidate set to queries whose
    anchor terms intersect the batch vocabulary — per-batch cost is
    O(batch vocab + candidates), not O(all registered queries)
    (Monitor.java:42 match path; QueryIndex term filtering)."""

    def __init__(self, queries: list[tuple[str, "Query | str"]],
                 text_col: str = "text", id_col: str = "doc_id",
                 scored: bool = False):
        # scored=True emits one-doc BM25 scores per match (ScoringMatch)
        self.scored = scored
        self.queries = [
            (name, parse_query(q) if isinstance(q, str) else q)
            for name, q in queries
        ]
        self.text_col = text_col
        self.id_col = id_col
        self.need_pos = any(self._has_phrase(q) for _, q in self.queries)
        # presearcher: anchor-term inverted index over the registered queries
        self._term_to_qids: dict[str, list[int]] = {}
        self._always: list[int] = []
        for i, (_, q) in enumerate(self.queries):
            a = query_anchors(q)
            if a is None:
                self._always.append(i)
            else:
                for t in a:
                    self._term_to_qids.setdefault(t, []).append(i)
        self.last_evaluated = 0  # evaluated-query count of the last batch

    @staticmethod
    def _has_phrase(q) -> bool:
        from lucene_ray.search.searcher import _collect_phrases

        return bool(_collect_phrases(q))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_ray.index.invert import invert_partition
        from lucene_ray.search.executor import SegmentContext, SegmentScorer, TermPostings

        n = len(batch)
        partials, lengths, norm_bytes = invert_partition(
            batch.column(self.text_col), with_positions=self.need_pos
        )
        ctx = SegmentContext(
            num_docs=n,
            norms=norm_bytes,
            global_ids=np.arange(n, dtype=np.uint64),
        )
        ctx.with_positions = self.need_pos
        # load the mini index straight from the partial-postings rows — but
        # ONLY the terms the registered queries can touch (direct terms +
        # multi-term expansions against the batch vocabulary); the per-term
        # vbyte pos stream is exactly what decode_positions expects
        vocab = partials.column("term").to_pylist()
        row_of = {t: i for i, t in enumerate(vocab)}
        # presearcher pruning: only queries with an anchor term in THIS
        # batch's vocabulary (plus the unbounded ones) are evaluated
        cand = set(self._always)
        for t in vocab:
            ids = self._term_to_qids.get(t)
            if ids:
                cand.update(ids)
        active = [(self.queries[i][0], self.queries[i][1]) for i in sorted(cand)]
        self.last_evaluated = len(active)
        all_expansions: dict = {}
        needed: set[str] = set()
        for _, q in active:
            needed |= collect_terms(q)
            for m in collect_multi_term(q):
                if m not in all_expansions:
                    all_expansions[m] = _expand_against_vocab(
                        m, vocab, arr=partials.column("term").combine_chunks())
                needed.update(all_expansions[m])
        for t in needed:
            i = row_of.get(t)
            if i is None:
                continue
            docs = np.asarray(partials.column("doc_offsets")[i].values, dtype=np.int64)
            freqs = np.asarray(partials.column("freqs")[i].values, dtype=np.int64)
            pos = (
                [(partials.column("pos_enc")[i].as_py(), freqs)]
                if self.need_pos
                else None
            )
            ctx._decoded[t] = TermPostings(docs=docs, freqs=freqs, pos_chunks=pos)

        out_id, out_q, out_s = [], [], []
        ids_np = np.asarray(batch.column(self.id_col), dtype=np.int64)
        mk = (_OneDocBM25Scorer if self.scored else _ConstScorer)
        for name, q in active:
            terms = collect_terms(q)
            scorers = {t: mk() for t in terms if t in ctx._decoded}
            expansions = {m: all_expansions[m] for m in collect_multi_term(q)}
            phrase_scorers = {}
            from lucene_ray.search.searcher import _collect_phrases

            for ph in _collect_phrases(q):
                phrase_scorers[ph] = (
                    _OneDocBM25Scorer(n_terms=len(ph)) if self.scored
                    else _ConstScorer())
            ss = SegmentScorer(ctx, scorers, phrase_scorers, expansions)
            docs, scores = ss.evaluate(q)
            out_id.extend(ids_np[docs].tolist())
            out_q.extend([name] * len(docs))
            if self.scored:
                out_s.extend(np.asarray(scores, dtype=np.float32).tolist())
        cols = {
            self.id_col: pa.array(out_id, pa.int64()),
            "query": pa.array(out_q, pa.string()),
        }
        if self.scored:
            cols["score"] = pa.array(
                np.asarray(out_s, dtype=np.float32), pa.float32())
        return pa.table(cols)


def percolate(ds: ray.data.Dataset, queries: list[tuple[str, "Query | str"]],
              text_col: str = "text", id_col: str = "doc_id",
              concurrency: tuple[int, int] | int = (1, 4),
              scored: bool = False) -> ray.data.Dataset:
    """(id, query_name[, score]) for every (doc, registered query) match;
    ``scored=True`` adds the one-doc BM25 score (Monitor ScoringMatch).

    The actor pool autoscales from 1 (an exact ``concurrency=N`` pool of
    1-CPU actors deadlocks the pipeline when N equals the cluster's CPU
    count — the upstream read task can never schedule)."""
    return ds.map_batches(
        Percolator,
        fn_constructor_args=(queries, text_col, id_col, scored),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
