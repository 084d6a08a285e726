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


def _expand_against_vocab(q, vocab: list[str]) -> list[str]:
    """Multi-term expansion against a batch vocabulary (AutomatonTermsEnum
    over the MemoryIndex terms)."""
    import re as _re

    from lucene_ray.index.reader import _levenshtein_within
    from lucene_ray.search.query import (
        FuzzyQuery,
        PrefixQuery,
        RegexpQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    if isinstance(q, PrefixQuery):
        return [t for t in vocab if t.startswith(q.prefix)]
    if isinstance(q, WildcardQuery):
        rx = _re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else _re.escape(c)
                    for c in q.pattern) + r"\Z"
        )
        return [t for t in vocab if rx.match(t)]
    if isinstance(q, RegexpQuery):
        rx = _re.compile(q.pattern + r"\Z")
        return [t for t in vocab if rx.match(t)]
    if isinstance(q, FuzzyQuery):
        return [t for t in vocab if _levenshtein_within(t, q.term, q.max_edits)]
    if isinstance(q, TermRangeQuery):
        def ok(t):
            if q.lower is not None and (t < q.lower or (t == q.lower and not q.include_lower)):
                return False
            if q.upper is not None and (t > q.upper or (t == q.upper and not q.include_upper)):
                return False
            return True
        return [t for t in vocab if ok(t)]
    raise TypeError(q)


class Percolator:
    """Actor-pool stage: registered queries compiled once per actor."""

    def __init__(self, queries: list[tuple[str, "Query | str"]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.queries = [
            (name, parse_query(q) if isinstance(q, str) else q)
            for name, q in queries
        ]
        self.text_col = text_col
        self.id_col = id_col
        self.need_pos = any(self._has_phrase(q) for _, q in self.queries)

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
        all_expansions: dict = {}
        needed: set[str] = set()
        for _, q in self.queries:
            needed |= collect_terms(q)
            for m in collect_multi_term(q):
                if m not in all_expansions:
                    all_expansions[m] = _expand_against_vocab(m, vocab)
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

        out_id, out_q = [], []
        ids_np = np.asarray(batch.column(self.id_col), dtype=np.int64)
        for name, q in self.queries:
            terms = collect_terms(q)
            scorers = {t: _ConstScorer() for t in terms if t in ctx._decoded}
            expansions = {m: all_expansions[m] for m in collect_multi_term(q)}
            phrase_scorers = {}
            from lucene_ray.search.searcher import _collect_phrases

            for ph in _collect_phrases(q):
                phrase_scorers[ph] = _ConstScorer()
            ss = SegmentScorer(ctx, scorers, phrase_scorers, expansions)
            docs, _ = ss.evaluate(q)
            out_id.extend(ids_np[docs].tolist())
            out_q.extend([name] * len(docs))
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.int64()),
                "query": pa.array(out_q, pa.string()),
            }
        )


def percolate(ds: ray.data.Dataset, queries: list[tuple[str, "Query | str"]],
              text_col: str = "text", id_col: str = "doc_id",
              concurrency: tuple[int, int] | int = (1, 4)) -> ray.data.Dataset:
    """(id, query_name) for every (doc, registered query) match.

    The actor pool autoscales from 1 (an exact ``concurrency=N`` pool of
    1-CPU actors deadlocks the pipeline when N equals the cluster's CPU
    count — the upstream read task can never schedule)."""
    return ds.map_batches(
        Percolator,
        fn_constructor_args=(queries, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
