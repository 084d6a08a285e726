"""Per-segment query execution — vectorized iterator algebra + block-max pruning.

Lucene walks sorted postings via ``DocIdSetIterator`` virtual calls
(DocIdSetIterator.java:111-134); here each segment evaluates a query as numpy
kernels over decoded docID/freq arrays (SURVEY §1.4 mapping): union = scatter
into a dense float32 accumulator, intersection = presence counting,
difference = mask, phrase = vectorized position alignment.

Pruned top-k (engaged only past ``total_hits_threshold`` collected hits,
mirroring IndexSearcher.TOTAL_HITS_THRESHOLD = 1000, IndexSearcher.java:100):

- TermQuery: impact-ordered chunk traversal — chunks processed in descending
  score upper bound (from the stored competitive impacts), stopping when the
  bound drops strictly below the kth score (ImpactsDISI/MaxScoreCache
  semantics at chunk = level-1 granularity).
- OR of terms: MAXSCORE partitioning (MaxScoreBulkScorer.java) — terms split
  into essential/non-essential by score bound; only essential postings
  generate candidates, non-essential terms are looked up at candidate docs
  with chunk-range skipping.
- AND of terms: the rarest term drives; other terms decode only chunks whose
  doc range intersects the candidates (BlockMaxConjunction-style skipping).

All pruned paths return rank-identical (doc, float32 score) top-k vs the
exhaustive path — pruning is strict-inequality only, so equal-score
tie-breaks (doc id asc) are preserved; ``total_hits`` becomes a lower bound
with relation "GTE" exactly like Lucene's TotalHits.Relation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_ray.codec.postings import decode_docs, decode_freqs, decode_positions
from lucene_ray.search.query import (
    MULTI_TERM_TYPES,
    SPAN_TYPES,
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    GeoDistanceQuery,
    GeoDistanceFeatureQuery,
    GeoPolygonQuery,
    IntervalQuery,
    MatchAllQuery,
    MultiPhraseQuery,
    NumericRangeQuery,
    NumericSetQuery,
    PhraseQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    FeatureQuery,
    SpanTermQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    CoveringQuery,
    FunctionScoreQuery,
    ParentChildrenBlockJoinQuery,
    ToChildBlockJoinQuery,
    ToParentBlockJoinQuery,
)
from lucene_ray.search.similarity import BM25Scorer


@dataclass
class ChunkRec:
    count: int
    min_doc: int
    max_doc: int
    docs_enc: bytes
    freqs_enc: bytes
    pos_enc: bytes
    imp_freqs: np.ndarray
    imp_norms: np.ndarray


@dataclass
class TermPostings:
    docs: np.ndarray  # int64 segment-local doc ids, ascending
    freqs: np.ndarray  # int64
    pos_chunks: list | None  # [(pos_enc, freqs_slice)] lazily decoded
    pos_flat: np.ndarray | None = None  # memoized decode of pos_chunks
    # memoized sorted (doc << 32 | pos) int64 keys over ALL occurrences —
    # the exact-phrase kernel's working array; caching it removes the
    # np.repeat doc expansion from every warm phrase evaluation
    pos_keys: np.ndarray | None = None


class DecodedPostingsCache:
    """Bounded FIFO cache of decoded :class:`TermPostings`, shared across
    searches by a long-lived Searcher / serving actor. Hot terms ("import",
    "return") appear in most queries; without this every search re-runs the
    FOR/vbyte decode of the same arrays. Bounded by entries AND approximate
    bytes; eviction is insertion-order (dict ordering)."""

    def __init__(self, max_entries: int = 2048, max_bytes: int = 256 << 20):
        self.max_entries = max_entries
        self.max_bytes = max_bytes
        self._d: dict = {}
        self._bytes = 0

    @staticmethod
    def _size(tp: "TermPostings") -> int:
        n = tp.docs.nbytes + tp.freqs.nbytes
        if tp.pos_chunks:
            n += sum(len(enc) for enc, _ in tp.pos_chunks)
        return n

    def get(self, key):
        return self._d.get(key)

    def put(self, key, tp: "TermPostings") -> None:
        if key in self._d:
            return
        self._d[key] = tp
        self._bytes += self._size(tp)
        while self._d and (len(self._d) > self.max_entries
                           or self._bytes > self.max_bytes):
            oldest = next(iter(self._d))
            self._bytes -= self._size(self._d.pop(oldest))


class SegmentContext:
    """Chunk records for one (segment, query) evaluation; decode on demand."""

    def __init__(self, num_docs: int, norms: np.ndarray, global_ids: np.ndarray,
                 live: np.ndarray | None = None,
                 parents: np.ndarray | None = None,
                 dv_fetch=None, decoded_cache=None, cache_key=None,
                 dv_range=None, text_fields=()):
        self.num_docs = num_docs
        self.norms = norms
        # extra analyzed text fields (IndexConfig.text_cols): a term
        # namespaced "field:term" scores against THAT field's per-doc norms
        # (norm_<field> docmap column) — the per-field NumericDocValues norms
        # Lucene reads via LeafReader.getNormValues(field)
        self.text_fields = tuple(text_fields)
        self.global_ids = global_ids
        # col -> np.ndarray[num_docs] numeric doc-values, fetched lazily via
        # dv_fetch (the reader's column-pruned docmap read) and cached
        self.dv_fetch = dv_fetch
        # optional zone-map-pruned range scan (reader.numeric_range_docs):
        # (col, lower, upper) -> local doc ids, skipping row groups whose
        # min/max stats exclude the range (the BKD-pruning analog)
        self.dv_range = dv_range
        self._dv: dict[str, np.ndarray] = {}
        # ascending local ids of block-last docs (index-time doc blocks);
        # None when the index was built without block_col
        self.parents = parents
        # bool[num_docs] live-docs mask (None = no deletes). Lucene passes
        # liveDocs into every scorer (Weight.scorer -> LeafReader.getLiveDocs);
        # here deleted docs are filtered from every evaluation's result set.
        self.live = live
        self.chunks: dict[str, list[ChunkRec]] = {}
        self._decoded: dict[str, TermPostings] = {}
        # optional SHARED decode cache (owned by a long-lived Searcher /
        # serving actor) so hot terms decode once per process, not once per
        # query — the serving analog of Lucene's reused segment readers.
        # Keys are (cache_key, term); the owner bounds and evicts.
        self._shared = decoded_cache
        self._shared_key = cache_key
        self.with_positions = False

    def norms_for(self, term: str) -> np.ndarray:
        """Per-doc norm bytes of the field ``term`` belongs to: the
        ``norm_<field>`` docmap column for a text-field term ("title:foo"),
        else the content field's norms. Keyword/path terms also contain ':'
        but their columns are not text fields, so they fall through to the
        content norms (their freq is 1 and their impact norm travels in the
        chunk, so this only affects never-taken scoring paths)."""
        if self.text_fields and ":" in term:
            f = term.split(":", 1)[0]
            if f in self.text_fields:
                key = f"norm_{f}"
                if key not in self._dv:
                    self._dv[key] = np.asarray(
                        self.dv_fetch(key), dtype=np.uint8)
                return self._dv[key]
        return self.norms

    def docvalues(self, col: str) -> np.ndarray:
        if col not in self._dv:
            if self.dv_fetch is None:
                raise ValueError(
                    f"query needs doc-values column {col!r} but the context "
                    "has no doc-values fetcher"
                )
            self._dv[col] = self.dv_fetch(col)
        return self._dv[col]

    @classmethod
    def from_chunk_table(cls, table, num_docs, norms, global_ids,
                        with_positions=False, live=None, parents=None,
                        dv_fetch=None, decoded_cache=None, cache_key=None,
                        dv_range=None, text_fields=()):
        """Build from the reader's chunk rows (sorted by term, min_doc)."""
        return cls.from_chunk_recs(
            chunk_recs_from_table(table, with_positions), num_docs, norms,
            global_ids, with_positions, live, parents, dv_fetch,
            decoded_cache, cache_key, dv_range, text_fields)

    @classmethod
    def from_chunk_recs(cls, chunks, num_docs, norms, global_ids,
                        with_positions=False, live=None, parents=None,
                        dv_fetch=None, decoded_cache=None, cache_key=None,
                        dv_range=None, text_fields=()):
        """Build from pre-converted {term: [ChunkRec]} — lets a long-lived
        Searcher cache the Arrow->ChunkRec conversion per (seg, term) so
        warm queries skip the per-search to_pylist of the encoded columns
        (~2ms/segment, a top cost of warm bool queries)."""
        ctx = cls(num_docs, norms, global_ids, live, parents, dv_fetch,
                  decoded_cache, cache_key, dv_range, text_fields)
        ctx.with_positions = with_positions
        ctx.chunks = chunks
        return ctx

    # ---- decode ----

    def peek(self, term: str) -> TermPostings | None:
        """Already-decoded postings if available (local or shared cache),
        WITHOUT decoding. Lets the pruned-path planner skip chunk-at-a-time
        pruning when the full vectorized arrays are already in memory —
        whole-array scoring is cheaper than incremental skipping then."""
        tp = self._decoded.get(term)
        if tp is None and self._shared is not None:
            tp = self._shared.get((self._shared_key, term))
        return tp

    def postings(self, term: str) -> TermPostings | None:
        tp = self._decoded.get(term)
        if tp is not None:
            return tp
        if self._shared is not None:
            tp = self._shared.get((self._shared_key, term))
            if tp is not None:
                self._decoded[term] = tp
                return tp
        recs = self.chunks.get(term)
        if not recs:
            return None
        tp = self._decode_recs(recs)
        self._decoded[term] = tp
        if self._shared is not None:
            self._shared.put((self._shared_key, term), tp)
        return tp

    def _decode_recs(self, recs: list[ChunkRec]) -> TermPostings:
        docs_parts, freqs_parts, pos_parts = [], [], []
        for r in recs:
            d = decode_docs(r.docs_enc, r.count).astype(np.int64)
            f = decode_freqs(r.freqs_enc, r.count).astype(np.int64)
            docs_parts.append(d)
            freqs_parts.append(f)
            if self.with_positions:
                pos_parts.append((r.pos_enc, f))
        return TermPostings(
            docs=np.concatenate(docs_parts),
            freqs=np.concatenate(freqs_parts),
            pos_chunks=pos_parts if self.with_positions else None,
        )

    def doc_freq(self, term: str) -> int:
        return sum(r.count for r in self.chunks.get(term, []))


def chunk_bounds(recs: list[ChunkRec], scorer: BM25Scorer) -> np.ndarray:
    """Score upper bound per chunk from its competitive impacts."""
    return np.array(
        [scorer.score(r.imp_freqs, r.imp_norms).max() if len(r.imp_freqs) else np.float32(0)
         for r in recs],
        dtype=np.float32,
    )


@dataclass
class SegTopK:
    docs: np.ndarray  # local ids, sorted by (-score, doc)
    scores: np.ndarray
    total: int
    exact_total: bool


class SegmentScorer:
    """Evaluate a query against one segment's context."""

    def __init__(self, ctx: SegmentContext, scorers: dict[str, BM25Scorer],
                 phrase_scorers: dict[tuple, BM25Scorer] | None = None,
                 expansions: dict[Query, list[str]] | None = None):
        self.ctx = ctx
        self.scorers = scorers  # term -> BM25Scorer (global stats)
        self.phrase_scorers = phrase_scorers or {}
        # multi-term query node -> expanded term list (constant-score rewrite)
        self.expansions = expansions or {}

    # ---- exhaustive evaluation: (docs ascending, float32 scores) ----

    def evaluate(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        docs, scores = self._evaluate(q)
        live = self.ctx.live
        if live is not None and len(docs):
            keep = live[docs]
            docs, scores = docs[keep], scores[keep]
        return docs, scores

    def _evaluate(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(q, TermQuery):
            return self._eval_term(q)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q)
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q)
        if isinstance(q, MultiPhraseQuery):
            return self._eval_multi_phrase(q)
        if isinstance(q, MULTI_TERM_TYPES):
            return self._eval_const_union(q)
        if isinstance(q, MatchAllQuery):
            docs = np.arange(self.ctx.num_docs, dtype=np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, ToParentBlockJoinQuery):
            return self._eval_blockjoin(q)
        if isinstance(q, ToChildBlockJoinQuery):
            return self._eval_tochild(q)
        if isinstance(q, ParentChildrenBlockJoinQuery):
            parents = self.ctx.parents
            if parents is None:
                raise ValueError(
                    "ParentChildrenBlockJoinQuery requires an index built "
                    "with IndexConfig.block_col (index-time doc blocks)"
                )
            # global parent id -> this segment's local doc index (ascending
            # global_ids); a parent living in another segment yields no hits
            gids = np.asarray(self.ctx.global_ids, dtype=np.uint64)
            gpos = int(np.searchsorted(gids, np.uint64(q.parent_gid)))
            if gpos >= len(gids) or gids[gpos] != np.uint64(q.parent_gid):
                return _EMPTY
            ppos = int(np.searchsorted(parents, np.int64(gpos)))
            if ppos >= len(parents) or parents[ppos] != gpos:
                return _EMPTY  # the given doc is not a block-last parent
            cd, cs = self.evaluate(q.child)
            lo = parents[ppos - 1] + 1 if ppos > 0 else 0
            keep = (cd >= lo) & (cd < gpos)
            return cd[keep], cs[keep] * np.float32(q.boost)
        if isinstance(q, CoveringQuery):
            return self._eval_covering(q)
        if isinstance(q, DisMaxQuery):
            return self._eval_dismax(q)
        if isinstance(q, SPAN_TYPES):
            d, _s, _e = self._spans(q)
            docs = np.unique(d)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, IntervalQuery):
            d, _s, _e = self._intervals(q.source)
            docs = np.unique(d)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, NumericRangeQuery):
            return self._eval_numeric_range(q)
        if isinstance(q, GeoDistanceQuery):
            from lucene_ray.ops.geo import distance_bbox, haversine_m, _box_mask

            lat = np.asarray(self.ctx.docvalues(q.lat_col), dtype=np.float64)
            lon = np.asarray(self.ctx.docvalues(q.lon_col), dtype=np.float64)
            mask = _box_mask(lat, lon, *distance_bbox(q.lat, q.lon, q.radius_m))
            idx = np.flatnonzero(mask)
            if len(idx):
                d = haversine_m(lat[idx], lon[idx], q.lat, q.lon)
                mask[idx] = d <= q.radius_m
            docs = np.flatnonzero(mask).astype(np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, GeoDistanceFeatureQuery):
            from lucene_ray.ops.geo import haversine_m

            lat = np.asarray(self.ctx.docvalues(q.lat_col), dtype=np.float64)
            lon = np.asarray(self.ctx.docvalues(q.lon_col), dtype=np.float64)
            d = haversine_m(lat, lon, q.lat, q.lon)
            docs = np.arange(self.ctx.num_docs, dtype=np.int64)
            scores = (np.float64(q.boost) * q.pivot_m / (q.pivot_m + d))
            return docs, scores.astype(np.float32)
        if isinstance(q, GeoPolygonQuery):
            from lucene_ray.ops.geo import _box_mask, point_in_rings

            lat = np.asarray(self.ctx.docvalues(q.lat_col), dtype=np.float64)
            lon = np.asarray(self.ctx.docvalues(q.lon_col), dtype=np.float64)
            mask = _box_mask(lat, lon, min(q.poly_lats), max(q.poly_lats),
                             min(q.poly_lons), max(q.poly_lons))
            idx = np.flatnonzero(mask)
            if len(idx):
                rings = [(q.poly_lats, q.poly_lons), *q.holes]
                mask[idx] = point_in_rings(lat[idx], lon[idx], rings)
            docs = np.flatnonzero(mask).astype(np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, NumericSetQuery):
            vals = self.ctx.docvalues(q.col)
            docs = np.flatnonzero(
                np.isin(vals, np.asarray(q.values))
            ).astype(np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, ConstantScoreQuery):
            docs, _ = self.evaluate(q.query)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        if isinstance(q, FunctionScoreQuery):
            from lucene_ray.search.expressions import compile_expression

            docs, sub_scores = self.evaluate(q.query)
            if len(docs) == 0:
                return _EMPTY
            expr = compile_expression(q.source)
            bindings = {
                v: np.asarray(self.ctx.docvalues(v), dtype=np.float64)[docs]
                for v in expr.variables if v != "_score"
            }
            if "_score" in expr.variables:
                bindings["_score"] = sub_scores.astype(np.float64)
            vals = expr.evaluate(bindings)
            return docs, (vals * np.float64(q.boost)).astype(np.float32)
        if isinstance(q, SynonymQuery):
            return self._eval_synonym(q)
        if isinstance(q, FeatureQuery):
            return self._eval_feature(q)
        if isinstance(q, TermInSetQuery):
            present = np.zeros(self.ctx.num_docs, dtype=bool)
            for t in q.terms:
                tp = self.ctx.postings(t)
                if tp is not None:
                    present[tp.docs] = True
            docs = np.flatnonzero(present).astype(np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        raise TypeError(f"unsupported query: {q!r}")

    def _eval_synonym(self, q: SynonymQuery) -> tuple[np.ndarray, np.ndarray]:
        """Blended-term scoring (SynonymQuery.java SynonymScorer:600-615):
        the similarity fires once per doc with freq = sum of boosted
        per-term freqs; the pseudo-term scorer (max-df idf) comes from the
        plan keyed by the query node."""
        scorer = self.scorers.get(q)
        if scorer is None:
            return _EMPTY
        n = self.ctx.num_docs
        freq = np.zeros(n, dtype=np.float32)
        matched = np.zeros(n, dtype=bool)
        for t, b in zip(q.terms, q.boosts):
            tp = self.ctx.postings(t)
            if tp is None or len(tp.docs) == 0:
                continue
            f = tp.freqs.astype(np.float32, copy=False)
            if b != 1.0:
                f = np.float32(b) * f
            freq[tp.docs] += f
            matched[tp.docs] = True
        docs = np.flatnonzero(matched).astype(np.int64)
        if len(docs) == 0:
            return _EMPTY
        if q.boost != 1.0:
            scorer = scorer.with_boost(q.boost)
        return docs, scorer.score(freq[docs], self.ctx.norms_for(q.terms[0])[docs])

    def _eval_feature(self, q: FeatureQuery) -> tuple[np.ndarray, np.ndarray]:
        """FeatureField score functions over a doc-values column
        (FeatureField.java:251-494); matches docs with value > 0. log and
        sigmoid run in double then cast to float32, linear and saturation in
        float32 ops — the Java expression shapes. Outer boost folds into the
        weight before the expression."""
        import math as _math

        vals = np.asarray(self.ctx.docvalues(q.col), dtype=np.float64)
        docs = np.flatnonzero(vals > 0).astype(np.int64)
        if len(docs) == 0:
            return _EMPTY
        s = vals[docs]
        w = float(q.boost) * float(q.weight)
        if q.function == "linear":
            scores = np.float32(w) * s.astype(np.float32)
        elif q.function == "log":
            scores = (w * np.log(q.scaling + s)).astype(np.float32)
        elif q.function == "saturation":
            f32 = s.astype(np.float32)
            p = np.float32(q.pivot)
            scores = np.float32(w) * (np.float32(1.0) - p / (f32 + p))
        else:  # sigmoid
            ppa = _math.pow(q.pivot, q.exp)
            scores = (w * (1.0 - ppa / (np.power(s, q.exp) + ppa))).astype(
                np.float32)
        return docs, scores.astype(np.float32, copy=False)

    def _eval_dismax(self, q: DisMaxQuery) -> tuple[np.ndarray, np.ndarray]:
        """score = max(matching disjunct scores) + tie_breaker * (sum of the
        others), float32 (DisjunctionMaxQuery.java DisjunctionMaxScorer)."""
        n = self.ctx.num_docs
        mx = np.zeros(n, dtype=np.float32)
        sm = np.zeros(n, dtype=np.float32)
        matched = np.zeros(n, dtype=bool)
        for c in q.disjuncts:
            d, s = self.evaluate(c)
            mx[d] = np.maximum(mx[d], s)
            sm[d] += s
            matched[d] = True
        docs = np.flatnonzero(matched).astype(np.int64)
        tie = np.float32(q.tie_breaker)
        scores = (mx[docs] + tie * (sm[docs] - mx[docs])) * np.float32(q.boost)
        return docs, scores

    def _eval_numeric_range(self, q: NumericRangeQuery) -> tuple[np.ndarray, np.ndarray]:
        if self.ctx.dv_range is not None and q.col not in self.ctx._dv:
            # zone-map path: row groups outside [lower, upper] never decode
            docs = np.asarray(self.ctx.dv_range(q.col, q.lower, q.upper),
                              dtype=np.int64)
            return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)
        vals = self.ctx.docvalues(q.col)
        mask = np.ones(self.ctx.num_docs, dtype=bool)
        if q.lower is not None:
            mask &= vals >= q.lower
        if q.upper is not None:
            mask &= vals <= q.upper
        docs = np.flatnonzero(mask).astype(np.int64)
        return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)

    # ---- span family: (doc, start, end) span algebra ----

    def _spans(self, q: Query) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All spans of a span query as (doc, start, end) int64 arrays,
        sorted by (doc, start, end). Kernels follow the Spans contract of
        lucene/queries/src/java/org/apache/lucene/queries/spans/."""
        if isinstance(q, SpanTermQuery):
            tp = self.ctx.postings(q.term)
            if tp is None or tp.pos_chunks is None:
                return _EMPTY_SPANS
            pos = _decode_all_positions(tp).astype(np.int64)
            doc_rep = np.repeat(tp.docs, tp.freqs)
            return doc_rep, pos, pos + 1
        if isinstance(q, SpanFirstQuery):
            d, s, e = self._spans(q.match)
            keep = e <= q.end
            return d[keep], s[keep], e[keep]
        if isinstance(q, SpanOrQuery):
            parts = [self._spans(c) for c in q.clauses]
            d = np.concatenate([p[0] for p in parts])
            s = np.concatenate([p[1] for p in parts])
            e = np.concatenate([p[2] for p in parts])
            order = np.lexsort((e, s, d))
            return d[order], s[order], e[order]
        if isinstance(q, SpanNotQuery):
            return self._span_not(q)
        if isinstance(q, SpanNearQuery):
            return self._span_near(q)
        raise TypeError(f"not a span query: {q!r}")

    def _span_near(self, q: SpanNearQuery) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Ordered near (NearSpansOrdered.java): greedy chain — per anchor
        span of clause 0, each later clause takes its first span starting at
        or after the previous clause's end (minimal start); match when the
        accumulated gap sum(start_i - end_{i-1}) <= slop."""
        if not q.in_order:
            return self._span_near_unordered(q)
        parts = [self._spans(c) for c in q.clauses]
        d0, s0, e0 = parts[0]
        if len(d0) == 0:
            return _EMPTY_SPANS
        M = np.int64(1) << 32
        cur_end = e0.copy()
        gap = np.zeros(len(d0), dtype=np.int64)
        valid = np.ones(len(d0), dtype=bool)
        for dk, sk, ek in parts[1:]:
            if len(dk) == 0:
                return _EMPTY_SPANS
            keys = dk * M + sk  # sorted (doc, start)
            idx = np.searchsorted(keys, d0 * M + cur_end, side="left")
            idx_c = np.minimum(idx, len(keys) - 1)
            ok = (idx < len(keys)) & (dk[idx_c] == d0)
            gap = np.where(ok, gap + sk[idx_c] - cur_end, gap)
            cur_end = np.where(ok, ek[idx_c], cur_end)
            valid &= ok
        keep = valid & (gap <= q.slop)
        return d0[keep], s0[keep], cur_end[keep]

    def _span_near_unordered(self, q: SpanNearQuery) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Unordered near (NearSpansUnordered.java): minimal-window sweep.
        Every occurrence of any clause is a candidate window END; per clause
        the window start is its LAST occurrence at or before the candidate
        (searchsorted on (doc, pos) keys). A doc matches when some candidate
        window spans max(pos) - min(pos) - (k-1) <= slop. Exact for
        unit-length sub-spans (one occurrence per position)."""
        parts = [self._spans(c) for c in q.clauses]
        for d, s, e in parts:
            if len(d) == 0:
                return _EMPTY_SPANS
            if np.any(e - s != 1):
                raise ValueError(
                    "unordered SpanNearQuery requires unit-length sub-spans"
                )
        k = len(parts)
        M = np.int64(1) << 32
        alld = np.concatenate([p[0] for p in parts])
        allp = np.concatenate([p[1] for p in parts])
        cand = alld * M + allp
        order = np.argsort(cand, kind="stable")
        alld, allp, cand = alld[order], allp[order], cand[order]
        min_start = allp.copy()
        valid = np.ones(len(cand), dtype=bool)
        for dc, sc, _ec in parts:
            kc = dc * M + sc
            idx = np.searchsorted(kc, cand, side="right") - 1
            idx_c = np.maximum(idx, 0)
            ok = (idx >= 0) & (dc[idx_c] == alld)
            valid &= ok
            min_start = np.where(ok, np.minimum(min_start, sc[idx_c]), min_start)
        keep = valid & (allp - min_start - (k - 1) <= q.slop)
        d, s, e = alld[keep], min_start[keep], allp[keep] + 1
        # restore the (doc, start, end) span-sort contract for composition
        o = np.lexsort((e, s, d))
        return d[o], s[o], e[o]

    def _span_not(self, q: SpanNotQuery) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Spans of include that overlap no exclude span: an include span
        [s, e) is removed iff an exclude span [sx, ex) in the same doc has
        sx < e and ex > s (SpanNotQuery.java, pre=post=0)."""
        di, si, ei = self._spans(q.include)
        dx, sx, ex = self._spans(q.exclude)
        if len(di) == 0 or len(dx) == 0:
            return di, si, ei
        M = np.int64(1) << 32
        # doc-offset ends make the running max segment-local: an earlier
        # doc's entry can never exceed a later doc's base
        cummax_end = np.maximum.accumulate(dx * M + ex)
        idx = np.searchsorted(dx * M + sx, di * M + ei, side="left") - 1
        has_prior = idx >= 0
        overlap = np.zeros(len(di), dtype=bool)
        overlap[has_prior] = cummax_end[idx[has_prior]] > di[has_prior] * M + si[has_prior]
        keep = ~overlap
        return di[keep], si[keep], ei[keep]

    # ---- intervals family: minimal-interval algebra ----
    # (lucene/queries/src/java/org/apache/lucene/queries/intervals/; the
    # minimal-interval semantics of Clarke, Cormack & Burkowski 1995 that
    # Lucene's IntervalsSource implementations follow). All kernels are
    # vectorized over every doc of the segment at once: intervals are
    # (doc, start, end) int64 arrays, end-exclusive, sorted (doc, start,
    # end) and MINIMAL (within a doc, starts and ends strictly increase).

    def _intervals(self, src) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        from lucene_ray.search.query import (
            IContainedBy,
            IContaining,
            INotContainedBy,
            INotContaining,
            IOr,
            IOrdered,
            ITerm,
            IUnordered,
        )

        if isinstance(src, ITerm):
            tp = self.ctx.postings(src.term)
            if tp is None or tp.pos_chunks is None:
                return _EMPTY_SPANS
            pos = _decode_all_positions(tp).astype(np.int64)
            return np.repeat(tp.docs, tp.freqs), pos, pos + 1
        if isinstance(src, IOr):
            parts = [self._intervals(c) for c in src.sources]
            d = np.concatenate([p[0] for p in parts])
            s = np.concatenate([p[1] for p in parts])
            e = np.concatenate([p[2] for p in parts])
            return _minimal_intervals(d, s, e)
        if isinstance(src, IOrdered):
            return self._intervals_ordered(src)
        if isinstance(src, IUnordered):
            return self._intervals_unordered(src)
        if isinstance(src, (IContaining, INotContaining)):
            db, sb, eb = self._intervals(src.big)
            ds, ss, es = self._intervals(src.small)
            has = _contains_some(db, sb, eb, ds, ss, es)
            keep = has if isinstance(src, IContaining) else ~has
            return db[keep], sb[keep], eb[keep]
        if isinstance(src, (IContainedBy, INotContainedBy)):
            ds, ss, es = self._intervals(src.small)
            db, sb, eb = self._intervals(src.big)
            has = _contained_by_some(ds, ss, es, db, sb, eb)
            keep = has if isinstance(src, IContainedBy) else ~has
            return ds[keep], ss[keep], es[keep]
        raise TypeError(f"not an intervals source: {src!r}")

    def _intervals_ordered(self, src) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Ordered combinator (Intervals.ordered + maxgaps): per anchor
        interval of source 0, greedily chain each later source's FIRST
        interval starting at/after the previous end (minimal next — exact
        because child intervals are minimal, so starts and ends co-sort);
        filter by total gap, then minimalize."""
        parts = [self._intervals(c) for c in src.sources]
        d0, s0, e0 = parts[0]
        if len(d0) == 0 or any(len(p[0]) == 0 for p in parts):
            return _EMPTY_SPANS
        M = np.int64(1) << 32
        cur_end = e0.copy()
        gap = np.zeros(len(d0), dtype=np.int64)
        valid = np.ones(len(d0), dtype=bool)
        for dk, sk, ek in parts[1:]:
            keys = dk * M + sk
            idx = np.searchsorted(keys, d0 * M + cur_end, side="left")
            idx_c = np.minimum(idx, len(keys) - 1)
            ok = (idx < len(keys)) & (dk[idx_c] == d0)
            gap = np.where(ok, gap + sk[idx_c] - cur_end, gap)
            cur_end = np.where(ok, ek[idx_c], cur_end)
            valid &= ok
        if src.max_gaps >= 0:
            valid &= gap <= src.max_gaps
        return _minimal_intervals(d0[valid], s0[valid], cur_end[valid])

    def _intervals_unordered(self, src) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Unordered combinator: every child interval END is a candidate
        window end E; per child pick its LAST interval with end <= E (max
        start — minimal window, exact since minimal child intervals co-sort
        by start and end); window start = min of chosen starts. gaps =
        window width - sum of chosen child widths."""
        parts = [self._intervals(c) for c in src.sources]
        for p in parts:
            if len(p[0]) == 0:
                return _EMPTY_SPANS
        M = np.int64(1) << 32
        alld = np.concatenate([p[0] for p in parts])
        alle = np.concatenate([p[2] for p in parts])
        order = np.argsort(alld * M + alle, kind="stable")
        alld, alle = alld[order], alle[order]
        min_start = np.full(len(alld), np.iinfo(np.int64).max, dtype=np.int64)
        width_sum = np.zeros(len(alld), dtype=np.int64)
        valid = np.ones(len(alld), dtype=bool)
        for dc, sc, ec in parts:
            kc = dc * M + ec
            idx = np.searchsorted(kc, alld * M + alle, side="right") - 1
            idx_c = np.maximum(idx, 0)
            ok = (idx >= 0) & (dc[idx_c] == alld)
            valid &= ok
            min_start = np.where(ok, np.minimum(min_start, sc[idx_c]), min_start)
            width_sum = np.where(ok, width_sum + ec[idx_c] - sc[idx_c], width_sum)
        if src.max_gaps >= 0:
            valid &= (alle - min_start) - width_sum <= src.max_gaps
        return _minimal_intervals(alld[valid], min_start[valid], alle[valid])

    def _eval_blockjoin(self, q: ToParentBlockJoinQuery) -> tuple[np.ndarray, np.ndarray]:
        """Map child matches to their block's parent doc and aggregate
        scores per score_mode (ToParentBlockJoinQuery / BlockJoinScorer).
        Child hits are live-docs-filtered (self.evaluate); a deleted
        block-LAST doc removes that block's parent hit in the outer
        evaluate() pass, mirroring a deleted parent in Lucene."""
        parents = self.ctx.parents
        if parents is None:
            raise ValueError(
                "ToParentBlockJoinQuery requires an index built with "
                "IndexConfig.block_col (index-time doc blocks)"
            )
        child_docs, child_scores = self.evaluate(q.child)
        if len(child_docs) == 0:
            return _EMPTY
        # parent of a child = first block-last doc at or after it
        pidx = np.searchsorted(parents, child_docs, side="left")
        # child_docs ascending -> pidx non-decreasing: runs = blocks
        chg = np.empty(len(pidx), dtype=bool)
        chg[0] = True
        chg[1:] = pidx[1:] != pidx[:-1]
        starts = np.flatnonzero(chg)
        counts = np.diff(np.append(starts, len(pidx))).astype(np.int64)
        docs = parents[pidx[starts]]
        boost = np.float32(q.boost)
        if q.score_mode == "none":
            scores = np.full(len(docs), boost, dtype=np.float32)
        elif q.score_mode == "count":
            scores = counts.astype(np.float32) * boost
        elif q.score_mode == "max":
            scores = np.maximum.reduceat(child_scores, starts) * boost
        else:  # total / avg: accumulate child scores in doc order (float32)
            acc = np.add.reduceat(child_scores.astype(np.float64), starts)
            if q.score_mode == "avg":
                acc = acc / counts
            scores = (acc.astype(np.float32)) * boost
        return docs, scores

    def _eval_tochild(self, q: ToChildBlockJoinQuery) -> tuple[np.ndarray, np.ndarray]:
        """Parent hits expanded to their blocks' child docs, each child
        scoring its parent's (boosted) score — ToChildBlockJoinQuery.java:35
        semantics over the parents bitset. Parent hits that are not actual
        block-last docs are ignored (Lucene throws on a child-matching
        parent filter; the flat evaluate() contract filters instead).
        Children are live-docs-filtered by the outer evaluate() pass."""
        parents = self.ctx.parents
        if parents is None:
            raise ValueError(
                "ToChildBlockJoinQuery requires an index built with "
                "IndexConfig.block_col (index-time doc blocks)"
            )
        pdocs, pscores = self.evaluate(q.parent)
        if len(pdocs) == 0:
            return _EMPTY
        pos = np.searchsorted(parents, pdocs)
        is_parent = (pos < len(parents)) & (parents[np.minimum(pos, len(parents) - 1)] == pdocs)
        pdocs, pscores, pos = pdocs[is_parent], pscores[is_parent], pos[is_parent]
        if len(pdocs) == 0:
            return _EMPTY
        starts = np.where(pos > 0, parents[np.maximum(pos - 1, 0)] + 1, 0)
        counts = pdocs - starts  # children are [block start, parent)
        keep = counts > 0
        if not keep.any():
            return _EMPTY
        child_docs = _ranges_concat(starts[keep], pdocs[keep]).astype(np.int64)
        scores = np.repeat(pscores[keep] * np.float32(q.boost), counts[keep])
        return child_docs, scores.astype(np.float32)

    def _eval_covering(self, q: CoveringQuery) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc minimum-should-match from a doc-values formula
        (CoveringQuery.java:47 LongValuesSource). Sub-query scores sum in
        clause order (float32 scatter-add — the SHOULD-sum shape)."""
        from lucene_ray.search.expressions import compile_expression

        n = self.ctx.num_docs
        count = np.zeros(n, dtype=np.int64)
        ssum = np.zeros(n, dtype=np.float32)
        for c in q.queries:
            d, s = self.evaluate(c)
            if len(d):
                count[d] += 1
                ssum[d] += s
        expr = compile_expression(q.min_match)
        need = np.floor(expr.evaluate(
            {v: np.asarray(self.ctx.docvalues(v), dtype=np.float64)
             for v in expr.variables}
        )).astype(np.int64)
        need = np.maximum(need, 1)  # minimums < 1 behave as 1
        docs = np.flatnonzero(count >= need).astype(np.int64)
        return docs, ssum[docs] * np.float32(q.boost)

    def _eval_term(self, q: TermQuery) -> tuple[np.ndarray, np.ndarray]:
        tp = self.ctx.postings(q.term)
        if tp is None or len(tp.docs) == 0:
            return _EMPTY
        scorer = self.scorers[q.term]
        if q.boost != 1.0:
            # fold boost into the weight (weight = boost * idf), matching
            # Lucene's BM25Similarity.scorer — see BM25Scorer.with_boost
            scorer = scorer.with_boost(q.boost)
        scores = scorer.score(tp.freqs, self.ctx.norms_for(q.term)[tp.docs])
        return tp.docs, scores

    def _eval_const_union(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        # constant-score union over the expansion (MultiTermQuery
        # CONSTANT_SCORE rewrite, MultiTermQuery.java)
        terms = self.expansions.get(q, [])
        present = np.zeros(self.ctx.num_docs, dtype=bool)
        for t in terms:
            tp = self.ctx.postings(t)
            if tp is not None:
                present[tp.docs] = True
        docs = np.flatnonzero(present).astype(np.int64)
        return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)

    def _eval_phrase(self, q: PhraseQuery) -> tuple[np.ndarray, np.ndarray]:
        freqs_by_doc = self._phrase_freqs(q.terms, q.slop)
        if freqs_by_doc is None:
            return _EMPTY
        docs, pfreqs = freqs_by_doc
        if len(docs) == 0:
            return _EMPTY
        scorer = self.phrase_scorers[tuple(q.terms)]
        if q.boost != 1.0:
            scorer = scorer.with_boost(q.boost)
        scores = scorer.score(pfreqs, self.ctx.norms_for(q.terms[0])[docs])
        return docs, scores

    def _eval_multi_phrase(self, q: MultiPhraseQuery) -> tuple[np.ndarray, np.ndarray]:
        """Exact multi-phrase: per position i, the (doc, pos - i) key set is
        the UNION over that position's alternative terms (UnionPostingsEnum,
        MultiPhraseQuery.java); keys intersect across positions exactly like
        the single-term phrase kernel. Constant score (v1 divergence)."""
        M = np.int64(1) << 32
        L = np.int64(len(q.positions))  # offset keeps shifted keys positive
        common = None
        for i, alts in enumerate(q.positions):
            keys_parts = []
            for t in alts:
                tp = self.ctx.postings(t)
                if tp is None or tp.pos_chunks is None:
                    continue
                pos_flat = _decode_all_positions(tp).astype(np.int64)
                doc_rep = np.repeat(tp.docs, tp.freqs)
                keys_parts.append(doc_rep * M + pos_flat - i + L)
            if not keys_parts:
                return _EMPTY
            keys = np.unique(np.concatenate(keys_parts))
            common = keys if common is None else common[np.isin(common, keys)]
            if len(common) == 0:
                return _EMPTY
        docs = np.unique((common // M).astype(np.int64))
        return docs, np.full(len(docs), np.float32(q.boost), dtype=np.float32)

    def _phrase_freqs(self, terms: tuple, slop: int = 0) -> tuple[np.ndarray, np.ndarray] | None:
        """Phrase frequencies per doc. ``slop=0``: exact — docs containing
        terms at consecutive positions, vectorized via set intersection of
        (doc, pos - i) keys. ``slop>0``: sloppy — see ``_sloppy_freqs``."""
        tps = []
        for t in terms:
            tp = self.ctx.postings(t)
            if tp is None or tp.pos_chunks is None:
                return None
            tps.append(tp)
        cand = tps[0].docs
        for tp in tps[1:]:
            cand = cand[_sorted_isin(cand, tp.docs)]
            if len(cand) == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
        if slop > 0:
            # (doc_rep, shifted position) arrays per term, restricted to cand
            shifted_sets = []
            for i, tp in enumerate(tps):
                pos_flat = _decode_all_positions(tp)
                ends = np.cumsum(tp.freqs)
                starts = ends - tp.freqs
                sel_idx = np.flatnonzero(_sorted_isin(tp.docs, cand))
                doc_rep = np.repeat(tp.docs[sel_idx], tp.freqs[sel_idx])
                tok_idx = _ranges_concat(starts[sel_idx], ends[sel_idx])
                shifted = pos_flat[tok_idx].astype(np.int64) - i
                shifted_sets.append((doc_rep, shifted))
            return self._sloppy_freqs(shifted_sets, len(terms), slop)
        # exact: intersect sorted (doc, pos - i) key sets straight from the
        # memoized per-term key arrays. The doc-candidate restriction is a
        # PREFILTER only (key equality already enforces same-doc), so it is
        # applied per term only when selective — for common-term phrases
        # ("new string") the gather/repeat of restriction cost more than it
        # saved, and the cached keys make the unrestricted path allocation-
        # free up to the intersection itself.
        bases = []
        for i, tp in enumerate(tps):
            base = _pos_base_keys(tp)
            if 2 * len(cand) < len(tp.docs):
                ends = np.cumsum(tp.freqs)
                starts = ends - tp.freqs
                sel_idx = np.flatnonzero(_sorted_isin(tp.docs, cand))
                base = base[_ranges_concat(starts[sel_idx], ends[sel_idx])]
            bases.append(base)
        # term-0 occurrence c = doc*M + pos matches term i at pos + i, i.e.
        # iff (c + i) is in base_i — shifting the NEEDLES keeps the cached
        # base arrays untouched (no shifted copies); both sides stay sorted
        common = bases[0]
        for i in range(1, len(bases)):
            common = common[_sorted_isin(common + np.int64(i), bases[i])]
            if len(common) == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
        match_docs = (common >> np.int64(32)).astype(np.int64)
        docs, pfreqs = np.unique(match_docs, return_counts=True)
        return docs, pfreqs.astype(np.int64)

    def _sloppy_freqs(self, shifted_sets, n_terms: int,
                      slop: int) -> tuple[np.ndarray, np.ndarray]:
        """Sloppy-phrase match: anchored nearest-neighbor alignment.

        For every occurrence of term 0 (anchor, shifted position s0), each
        other term contributes its occurrence with shifted position nearest
        to s0 in the same doc (tie -> smaller). The match width is
        max(shifted) - min(shifted); widths <= slop contribute Lucene's
        sloppyFreq 1/(1+width), accumulated per doc in float32 bucketed by
        width ascending (SloppyPhraseMatcher.java:54; PhraseScorer sloppyFreq).
        Deterministic simplification of Lucene's matcher; identical for
        phrases without repeated terms."""
        OFF = np.int64(n_terms + 1)
        M = np.int64(1 << 32)
        a_docs, a_shift = shifted_sets[0]
        if len(a_docs) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        lo = a_shift.copy()
        hi = a_shift.copy()
        a_keys = a_docs * M + a_shift + OFF
        for doc_rep, shifted in shifted_sets[1:]:
            keys = doc_rep * M + shifted + OFF  # sorted: doc-major, shifted asc
            idx = np.searchsorted(keys, a_keys)
            right_ok = idx < len(keys)
            right_doc_ok = np.zeros(len(idx), dtype=bool)
            right_doc_ok[right_ok] = doc_rep[np.minimum(idx[right_ok], len(keys) - 1)] == a_docs[right_ok]
            left_ok = idx > 0
            left_doc_ok = np.zeros(len(idx), dtype=bool)
            left_doc_ok[left_ok] = doc_rep[idx[left_ok] - 1] == a_docs[left_ok]
            INF = np.int64(1) << 40
            d_right = np.where(right_doc_ok, shifted[np.minimum(idx, len(keys) - 1)] - a_shift, INF)
            d_left = np.where(left_doc_ok, a_shift - shifted[np.maximum(idx - 1, 0)], INF)
            choose_left = d_left <= d_right  # tie -> smaller shifted
            s_chosen = np.where(
                choose_left,
                shifted[np.maximum(idx - 1, 0)],
                shifted[np.minimum(idx, len(keys) - 1)],
            )
            lo = np.minimum(lo, s_chosen)
            hi = np.maximum(hi, s_chosen)
        width = hi - lo
        ok = width <= slop
        if not ok.any():
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        docs_m = a_docs[ok]
        w_ok = width[ok]
        # sloppy freq per doc = sum over widths w (ascending) of
        # count_w * 1/(1+w), accumulated in float32 — width-bucketed so the
        # accumulation order is well-defined regardless of anchor layout
        uniq_docs, inv = np.unique(docs_m, return_inverse=True)
        counts = np.zeros((len(uniq_docs), slop + 1), dtype=np.int64)
        np.add.at(counts, (inv, w_ok), 1)
        freqs = np.zeros(len(uniq_docs), dtype=np.float32)
        for w in range(slop + 1):
            freqs = freqs + counts[:, w].astype(np.float32) * np.float32(1.0 / (1.0 + w))
        return uniq_docs, freqs

    def _eval_bool(self, q: BooleanQuery) -> tuple[np.ndarray, np.ndarray]:
        n = self.ctx.num_docs
        acc = np.zeros(n, dtype=np.float32)
        msm = q.effective_msm
        touched_any = False

        if q.must or q.filter:
            must_count = np.zeros(n, dtype=np.int32)
            for c in q.must:
                d, s = self.evaluate(c)
                acc[d] += s
                must_count[d] += 1
            for c in q.filter:  # required match, zero score contribution
                d, _ = self.evaluate(c)
                must_count[d] += 1
            mask = must_count == len(q.must) + len(q.filter)
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

    def top_k(self, q: Query, k: int,
              total_hits_threshold: int | None = None,
              after: tuple[float, int] | None = None,
              prior: tuple[float, int] | None = None) -> tuple[np.ndarray, np.ndarray, int, bool]:
        """(global_doc_ids, scores, total_hits, exact_total), sorted by
        (-score, local doc id). With a threshold, pruned paths may report a
        lower-bound total (exact_total=False) but ranks/scores stay identical.
        ``after`` = (score, global_doc_id) cursor for deep paging
        (IndexSearcher.searchAfter, IndexSearcher.java:576-591): only hits
        strictly after the cursor in (-score, doc) order are returned.

        ``prior`` = (kth_score, hits_counted) from segments already searched
        — the MaxScoreAccumulator analog (MaxScoreAccumulator.java:23,
        TopScoreDocCollector.java:168): later segments start pruning at the
        global-so-far kth score. Safe for rank identity because segments are
        searched in ascending global-doc-id order and the merge tie-break is
        (score desc, doc id asc): a later-segment hit scoring exactly the
        prior kth always loses the tie, so only strictly-greater scores can
        enter the global top-k — and pruning only ever skips bounds
        STRICTLY BELOW the kth."""
        res = None
        if total_hits_threshold is not None and after is None:
            res = self._top_k_pruned(q, k, total_hits_threshold, prior)
        if res is None:
            docs, scores = self.evaluate(q)
            total = len(docs)
            if after is not None:
                a_score = np.float32(after[0])
                gids = self.ctx.global_ids[docs]
                keep = (scores < a_score) | (
                    (scores == a_score) & (gids > np.uint64(after[1]))
                )
                docs, scores = docs[keep], scores[keep]
            res = _topk_from_sparse(docs, scores, k, total, True)
        return self.ctx.global_ids[res.docs], res.scores, res.total, res.exact_total

    def _top_k_pruned(self, q: Query, k: int, threshold: int,
                      prior: tuple[float, int] | None = None) -> SegTopK | None:
        if isinstance(q, TermQuery) and q.boost == 1.0 and q.term in self.scorers:
            if self.ctx.peek(q.term) is not None:
                return None  # already decoded: whole-array scoring is cheaper
            return self._topk_term_impact_ordered(q.term, k, threshold, prior)
        if isinstance(q, BooleanQuery) and not q.must_not and not q.must \
                and not q.filter and q.should \
                and q.effective_msm <= 1 \
                and all(isinstance(c, TermQuery) and c.boost == 1.0 and c.term in self.scorers
                        for c in q.should):
            if all(self.ctx.peek(c.term) is not None for c in q.should):
                return None
            return self._topk_or_maxscore([c.term for c in q.should], k,
                                          threshold, prior)
        if isinstance(q, BooleanQuery) and not q.must_not and not q.should \
                and not q.filter and q.must \
                and all(isinstance(c, TermQuery) and c.boost == 1.0 for c in q.must):
            if not all(c.term in self.scorers for c in q.must):
                return SegTopK(np.zeros(0, np.int64), np.zeros(0, np.float32), 0, True)
            if all(self.ctx.peek(c.term) is not None for c in q.must):
                return None
            return self._topk_and_skipping([c.term for c in q.must], k)
        return None  # fall back to exhaustive

    def _topk_term_impact_ordered(self, term: str, k: int, threshold: int,
                                  prior: tuple[float, int] | None = None) -> SegTopK:
        recs = self.ctx.chunks.get(term)
        if not recs:
            return SegTopK(np.zeros(0, np.int64), np.zeros(0, np.float32), 0, True)
        scorer = self.scorers[term]
        bounds = chunk_bounds(recs, scorer)
        order = np.argsort(-bounds.astype(np.float64), kind="stable")
        best_docs = np.zeros(0, np.int64)
        best_scores = np.zeros(0, np.float32)
        prior_kth = np.float32(prior[0]) if prior is not None else None
        prior_hits = prior[1] if prior is not None else 0
        total = 0
        pruned = False
        for oi, ci in enumerate(order):
            have_k = len(best_docs) >= k or prior_kth is not None
            kth = np.float32("-inf")
            if len(best_docs) >= k:
                kth = best_scores[-1]
            if prior_kth is not None and prior_kth > kth:
                kth = prior_kth
            if have_k and total + prior_hits >= threshold and bounds[ci] < kth:
                pruned = True  # all remaining bounds are <= this one
                break
            r = recs[ci]
            d = decode_docs(r.docs_enc, r.count).astype(np.int64)
            f = decode_freqs(r.freqs_enc, r.count).astype(np.int64)
            if self.ctx.live is not None:
                keep = self.ctx.live[d]
                d, f = d[keep], f[keep]
            s = scorer.score(f, self.ctx.norms_for(term)[d])
            total += len(d)
            best_docs, best_scores = _merge_topk(best_docs, best_scores, d, s, k)
        return SegTopK(best_docs, best_scores, total, not pruned)

    def _topk_or_maxscore(self, terms: list[str], k: int, threshold: int,
                          prior: tuple[float, int] | None = None) -> SegTopK:
        """MAXSCORE: essential terms generate candidates; non-essential terms
        only contribute at candidate docs (decoded with chunk skipping).
        ``prior`` raises the bootstrap theta (cross-segment accumulator)."""
        recs_by_term = {t: self.ctx.chunks.get(t, []) for t in terms}
        terms = [t for t in terms if recs_by_term[t]]
        if not terms:
            return SegTopK(np.zeros(0, np.int64), np.zeros(0, np.float32), 0, True)
        term_bounds = {
            t: float(chunk_bounds(recs_by_term[t], self.scorers[t]).max()) for t in terms
        }
        order = sorted(terms, key=lambda t: term_bounds[t])  # ascending bound
        total_candidates = sum(self.ctx.doc_freq(t) for t in terms)
        if total_candidates <= threshold:
            return None  # below threshold: exhaustive path keeps exact counts

        # bootstrap theta from the highest-bound term scored fully (live
        # docs only — a deleted doc must never raise the pruning threshold)
        strongest = order[-1]
        tp = self.ctx.postings(strongest)
        t_docs, t_freqs = tp.docs, tp.freqs
        if self.ctx.live is not None:
            keep0 = self.ctx.live[t_docs]
            t_docs, t_freqs = t_docs[keep0], t_freqs[keep0]
        s0 = self.scorers[strongest].score(t_freqs, self.ctx.norms_for(strongest)[t_docs])
        if len(s0) > k:
            theta = float(np.partition(s0, -k)[-k])
        else:
            theta = float("-inf")
        if prior is not None and float(prior[0]) > theta:
            # global-so-far kth from earlier segments; later-segment ties
            # lose the (score, doc) tie-break, so theta may start here
            theta = float(prior[0])

        # partition: longest prefix of `order` with cumulative bound < theta
        cum = 0.0
        non_essential: list[str] = []
        for t in order:
            if cum + term_bounds[t] < theta and len(non_essential) < len(order) - 1:
                cum += term_bounds[t]
                non_essential.append(t)
            else:
                break
        essential = [t for t in order if t not in non_essential]

        n = self.ctx.num_docs
        present = np.zeros(n, dtype=bool)
        ness = set(non_essential)
        for t in essential:
            present[self.ctx.postings(t).docs] = True
        if self.ctx.live is not None:
            present &= self.ctx.live
        cand = np.flatnonzero(present).astype(np.int64)
        # accumulate in ORIGINAL clause order so per-doc float32 addition
        # sequences match the exhaustive path bit-for-bit; docs matching ONLY
        # non-essential terms score < theta <= kth so skipping them is exact
        acc = np.zeros(n, dtype=np.float32)
        for t in terms:
            if t in ness:
                d, f = self._decode_at(t, cand)  # chunk-range skipping
                if len(d):
                    sel = _sorted_isin(d, cand)
                    d, f = d[sel], f[sel]
            else:
                tp = self.ctx.postings(t)  # essential: all docs are candidates
                d, f = tp.docs, tp.freqs
            if len(d):
                acc[d] += self.scorers[t].score(f, self.ctx.norms_for(t)[d])
        # len(cand) is a valid lower bound of the true union size (GTE)
        return SegTopK(*_topk_arrays(cand, acc[cand], k), len(cand), False)

    def _topk_and_skipping(self, terms: list[str], k: int) -> SegTopK:
        """Conjunction driven by the rarest term; other terms decode only
        chunks overlapping the candidate doc range set. Exact (no score
        pruning), so exact_total=True."""
        dfs = {t: self.ctx.doc_freq(t) for t in terms}
        if any(dfs[t] == 0 for t in terms):
            return SegTopK(np.zeros(0, np.int64), np.zeros(0, np.float32), 0, True)
        order = sorted(terms, key=lambda t: dfs[t])
        lead = order[0]
        tp = self.ctx.postings(lead)
        cand, lead_freqs = tp.docs, tp.freqs
        if self.ctx.live is not None:
            keep0 = self.ctx.live[cand]
            cand, lead_freqs = cand[keep0], lead_freqs[keep0]
        cand_freqs = {lead: lead_freqs}
        for t in order[1:]:
            d, f = self._decode_at(t, cand)
            keep = _sorted_isin(cand, d)
            cand = cand[keep]
            for t2 in cand_freqs:
                cand_freqs[t2] = cand_freqs[t2][keep]
            sel = _sorted_isin(d, cand)
            cand_freqs[t] = f[sel]
            if len(cand) == 0:
                return SegTopK(np.zeros(0, np.int64), np.zeros(0, np.float32), 0, True)
        acc = np.zeros(len(cand), dtype=np.float32)
        gathered: dict[int, np.ndarray] = {}  # one gather per distinct field
        for t in terms:  # clause order = query order (float32 sum order)
            base = self.ctx.norms_for(t)
            if id(base) not in gathered:
                gathered[id(base)] = base[cand]
            acc += self.scorers[t].score(cand_freqs[t], gathered[id(base)])
        return SegTopK(*_topk_arrays(cand, acc, k), len(cand), True)

    def _decode_at(self, term: str, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode only the chunks of `term` whose doc range intersects the
        candidate set; returns (docs, freqs) restricted to chunks touched."""
        recs = self.ctx.chunks.get(term, [])
        if not recs or len(cand) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        mins = np.array([r.min_doc for r in recs])
        maxs = np.array([r.max_doc for r in recs])
        # chunk i needed iff any candidate in [min, max]
        lo = np.searchsorted(cand, mins, side="left")
        hi = np.searchsorted(cand, maxs, side="right")
        needed = np.flatnonzero(hi > lo)
        if len(needed) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        if len(needed) * 2 >= len(recs) or self.ctx.peek(term) is not None:
            # the candidate range touches most chunks (or the full arrays
            # are already decoded): a full decode through the shared cache
            # costs about the same now and makes every later query on this
            # term whole-array fast
            tp = self.ctx.postings(term)
            return tp.docs, tp.freqs
        ds, fs = [], []
        for ci in needed:
            r = recs[ci]
            ds.append(decode_docs(r.docs_enc, r.count).astype(np.int64))
            fs.append(decode_freqs(r.freqs_enc, r.count).astype(np.int64))
        return np.concatenate(ds), np.concatenate(fs)


_EMPTY = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32))
def _minimal_intervals(d: np.ndarray, s: np.ndarray, e: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reduce (doc, start, end) intervals to the minimal set: drop
    duplicates and any interval containing another. Sorted (doc, start asc,
    end asc), an interval is non-minimal iff some LATER interval of the
    same doc has end <= its end — checked with a doc-offset suffix-min."""
    if len(d) == 0:
        return d, s, e
    M = np.int64(1) << 32
    order = np.lexsort((e, s, d))
    d, s, e = d[order], s[order], e[order]
    uniq = np.r_[True, (d[1:] != d[:-1]) | (s[1:] != s[:-1]) | (e[1:] != e[:-1])]
    d, s, e = d[uniq], s[uniq], e[uniq]
    ke = d * M + e
    suf_next = np.empty(len(ke), dtype=np.int64)
    suf_next[-1] = np.iinfo(np.int64).max
    if len(ke) > 1:
        suf_next[:-1] = np.minimum.accumulate(ke[::-1])[::-1][1:]
    keep = ke < suf_next
    return d[keep], s[keep], e[keep]


def _contains_some(db, sb, eb, ds, ss, es) -> np.ndarray:
    """For each big interval: does some small interval lie fully inside it?
    Smalls are minimal/sorted, so among smalls with start >= sb the minimum
    end is a doc-offset suffix-min; contained iff that min end <= eb."""
    if len(db) == 0:
        return np.zeros(0, dtype=bool)
    if len(ds) == 0:
        return np.zeros(len(db), dtype=bool)
    M = np.int64(1) << 32
    ke = ds * M + es
    sufmin = np.minimum.accumulate(ke[::-1])[::-1]
    idx = np.searchsorted(ds * M + ss, db * M + sb, side="left")
    idx_c = np.minimum(idx, len(ke) - 1)
    return (idx < len(ke)) & (sufmin[idx_c] <= db * M + eb)


def _contained_by_some(ds, ss, es, db, sb, eb) -> np.ndarray:
    """For each small interval: does some big interval fully contain it?
    Bigs sorted by start; among bigs with start <= ss the max end is a
    doc-offset prefix-max; contained iff that max end >= es."""
    if len(ds) == 0:
        return np.zeros(0, dtype=bool)
    if len(db) == 0:
        return np.zeros(len(ds), dtype=bool)
    M = np.int64(1) << 32
    cummax_end = np.maximum.accumulate(db * M + eb)
    idx = np.searchsorted(db * M + sb, ds * M + ss, side="right") - 1
    has = idx >= 0
    out = np.zeros(len(ds), dtype=bool)
    out[has] = cummax_end[idx[has]] >= ds[has] * M + es[has]
    return out


_EMPTY_SPANS = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=np.int64))


def _topk_arrays(docs: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    if len(docs) > k:
        # keep ALL ties at the kth score so the (score desc, doc asc)
        # tie-break decides membership — argpartition alone would pick
        # arbitrary docs among boundary ties
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        sel = scores >= kth
        docs, scores = docs[sel], scores[sel]
    order = np.lexsort((docs, -scores.astype(np.float64)))
    docs, scores = docs[order], scores[order]
    return docs[:k], scores[:k]


def _topk_from_sparse(docs, scores, k, total, exact) -> SegTopK:
    d, s = _topk_arrays(docs, scores, k)
    return SegTopK(d, s, total, exact)


def _merge_topk(d1, s1, d2, s2, k) -> tuple[np.ndarray, np.ndarray]:
    d = np.concatenate([d1, d2])
    s = np.concatenate([s1, s2])
    return _topk_arrays(d, s, k)


def _sorted_isin(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Membership mask of sorted array ``a`` in sorted array ``b`` — one
    binary search instead of np.isin's sort-based kernel (both inputs are
    already ascending postings/key arrays)."""
    if len(b) == 0:
        return np.zeros(len(a), dtype=bool)
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = len(b) - 1
    return b[idx] == a


def chunk_recs_from_table(table, with_positions: bool) -> dict:
    """Convert the reader's chunk rows (sorted by term, min_doc) into
    {term: [ChunkRec]} — the one per-search Arrow boundary crossing."""
    chunks: dict[str, list[ChunkRec]] = {}
    if table is None or len(table) == 0:
        return chunks
    terms = table.column("term").to_pylist()
    counts = table.column("count").to_pylist()
    min_docs = table.column("min_doc").to_pylist()
    max_docs = table.column("max_doc").to_pylist()
    docs_enc = table.column("docs_enc").to_pylist()
    freqs_enc = table.column("freqs_enc").to_pylist()
    pos_enc = table.column("pos_enc").to_pylist() if with_positions else [b""] * len(terms)
    imp_f = table.column("impact_freqs").to_pylist()
    imp_n = table.column("impact_norms").to_pylist()
    for i, t in enumerate(terms):
        chunks.setdefault(t, []).append(
            ChunkRec(
                count=counts[i],
                min_doc=min_docs[i],
                max_doc=max_docs[i],
                docs_enc=docs_enc[i],
                freqs_enc=freqs_enc[i],
                pos_enc=pos_enc[i],
                imp_freqs=np.asarray(imp_f[i], dtype=np.int64),
                imp_norms=np.asarray(imp_n[i], dtype=np.int64),
            )
        )
    return chunks


def _decode_all_positions(tp: TermPostings) -> np.ndarray:
    if tp.pos_flat is None:
        parts = [decode_positions(enc, f) for enc, f in tp.pos_chunks]
        tp.pos_flat = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    return tp.pos_flat


def _pos_base_keys(tp: TermPostings) -> np.ndarray:
    """Sorted int64 (doc << 32) + pos over every occurrence, memoized on
    the TermPostings (so the decoded-postings cache amortizes it across
    searches). Strictly ascending: docs ascend, positions ascend within a
    doc, and positions fit in 32 bits."""
    if tp.pos_keys is None:
        pos = _decode_all_positions(tp).astype(np.int64)
        doc_rep = np.repeat(tp.docs, tp.freqs)
        tp.pos_keys = doc_rep * np.int64(1 << 32) + pos
    return tp.pos_keys


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
