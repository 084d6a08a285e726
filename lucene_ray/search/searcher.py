"""Top-level searcher: global stats -> per-segment scoring -> merged top-k.

The IndexSearcher.search(query, k) analog (SURVEY §3.2 Ray restatement):
term statistics are resolved *globally* (the one cross-partition dependency),
BM25 constants precomputed once, each segment scored independently, results
merged with Lucene's deterministic tie-break (TopDocs.merge,
TopDocs.java:75-119): score desc, then segment order, then docID — which for
our monotone global doc ids collapses to (score desc, global_doc_id asc).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.executor import SegmentContext, SegmentScorer
from lucene_ray.search.query import (
    PhraseQuery,
    Query,
    collect_multi_term,
    collect_terms,
    needs_positions,
    parse_query,
)
from lucene_ray.search.similarity import BM25Similarity, TermStats


@dataclass
class TopDocs:
    doc_ids: np.ndarray  # uint64 global ids
    scores: np.ndarray  # float32
    total_hits: int
    # False = total_hits is a lower bound (TotalHits.Relation.GTE) because
    # block-max pruning stopped counting past total_hits_threshold
    exact_total: bool = True


def _collect_phrases(q: Query) -> list[tuple]:
    from lucene_ray.search.query import children

    out: list[tuple] = []
    if isinstance(q, PhraseQuery):
        out.append(tuple(q.terms))
    for c in children(q):
        out.extend(_collect_phrases(c))
    return out


class Searcher:
    """Single-process searcher over all segments (driver/tests path).

    The distributed serving path (actor pool, one shard per segment group)
    reuses exactly the same SegmentScorer kernels — see
    ``lucene_ray.pipelines.bulk_search``.
    """

    def __init__(self, reader: IndexReader, similarity: BM25Similarity | None = None):
        from lucene_ray.search.executor import DecodedPostingsCache

        self.reader = reader
        self.sim = similarity or BM25Similarity()
        # decoded hot-term postings survive across searches (bounded)
        self._decoded_cache = DecodedPostingsCache()
        # per-(seg, term, with_positions) ChunkRec lists: the Arrow->python
        # conversion of encoded chunk rows was ~2ms/segment on EVERY warm
        # search; bounded FIFO (encoded bytes only, far smaller than the
        # decoded cache)
        self._chunkrec_cache: dict = {}
        self._chunkrec_max = 65536
        # extra analyzed text fields (IndexConfig.text_cols): string queries
        # analyze "field:value" values for these fields (classic QueryParser
        # behavior for TextField), and per-field norms/avgdl apply in plan()
        self._text_fields = tuple(
            reader.manifest.config.get("text_cols") or ())

    def plan(self, q: Query):
        """Resolve global stats + scorers for a query (Weight creation)."""
        mtqs = collect_multi_term(q)
        expansions = {m: self.reader.expand_multi_term(m) for m in mtqs}
        terms = collect_terms(q)
        all_terms = set(terms)
        for ts in expansions.values():
            all_terms.update(ts)
        stats = self.reader.term_stats(sorted(all_terms))
        cstats = self.reader.collection_stats()
        # per-field CollectionStatistics: a term namespaced to a TEXT field
        # ("title:foo") scores against that field's avgdl; keyword/path
        # terms and plain terms keep the content field's stats
        _field_cstats: dict = {}

        def _cstats_for(t: str):
            f = self.reader.text_field_of(t)
            if f is None:
                return cstats
            if f not in _field_cstats:
                _field_cstats[f] = self.reader.collection_stats(field=f)
            return _field_cstats[f]

        def _sim_for(t: str):
            # PerFieldSimilarityWrapper dispatch: a similarity exposing
            # for_field routes each term's FIELD to its own sub-similarity
            fw = getattr(self.sim, "for_field", None)
            if fw is None:
                return self.sim
            return fw(self.reader.text_field_of(t))

        scorers = {}
        for t in terms:
            ts = stats.get(t, TermStats(0, 0))
            if ts.doc_freq > 0:
                scorers[t] = _sim_for(t).scorer(1.0, _cstats_for(t), ts)
        phrase_scorers = {}
        for ph in _collect_phrases(q):
            tss = [stats.get(t, TermStats(0, 0)) for t in ph]
            if all(ts.doc_freq > 0 for ts in tss):
                phrase_scorers[ph] = _sim_for(ph[0]).scorer(
                    1.0, _cstats_for(ph[0]), *tss)
        # SynonymQuery pseudo-term stats: docFreq = max over terms (df>0),
        # totalTermFreq = sum — SynonymQuery.java SynonymWeight ctor :213-231
        from lucene_ray.search.query import collect_synonyms

        for sq in collect_synonyms(q):
            tss = [stats.get(t, TermStats(0, 0)) for t in sq.terms]
            df = max((ts.doc_freq for ts in tss), default=0)
            ttf = sum(ts.total_term_freq for ts in tss if ts.doc_freq > 0)
            if df > 0:
                scorers[sq] = self.sim.scorer(1.0, cstats, TermStats(df, ttf))
        return all_terms, scorers, phrase_scorers, expansions

    def segment_scorer(self, seg: int, all_terms, scorers, phrase_scorers, expansions,
                       need_positions: bool) -> SegmentScorer:
        # a DOCS_AND_FREQS-level index (with_positions=False) stores no
        # position streams: positional queries degrade to empty matches
        # rather than decoding empty streams
        need_positions = need_positions and bool(
            self.reader.manifest.config.get("with_positions", True)
        )
        from lucene_ray.search.executor import chunk_recs_from_table

        cache = self._chunkrec_cache
        missing = [t for t in sorted(all_terms)
                   if (seg, t, need_positions) not in cache]
        if missing:
            table = self.reader.postings(seg, missing)
            recs = chunk_recs_from_table(table, need_positions)
            if len(cache) + len(missing) > self._chunkrec_max:
                cache.clear()
            for t in missing:
                cache[(seg, t, need_positions)] = recs.get(t, [])
        chunks = {}
        for t in all_terms:
            r = cache[(seg, t, need_positions)]
            if r:
                chunks[t] = r
        ctx = SegmentContext.from_chunk_recs(
            chunks,
            num_docs=self.reader.num_docs(seg),
            norms=self.reader.norms(seg),
            global_ids=self.reader.global_doc_ids(seg),
            with_positions=need_positions,
            live=self.reader.live_mask(seg),
            parents=self.reader.parents(seg),
            dv_fetch=lambda col, _s=seg: self.reader.docvalues(_s, col),
            dv_range=lambda col, lo, hi, _s=seg: self.reader.numeric_range_docs(
                _s, col, lo, hi),
            decoded_cache=self._decoded_cache,
            cache_key=(seg, need_positions),
            text_fields=tuple(self.reader.manifest.config.get("text_cols") or ()),
        )
        return SegmentScorer(ctx, scorers, phrase_scorers, expansions)

    def search(self, query: Query | str, k: int = 10,
               total_hits_threshold: int | None = None,
               after: tuple[float, int] | None = None) -> TopDocs:
        """Top-k search. ``total_hits_threshold`` enables block-max pruning
        (Lucene's default is 1000, IndexSearcher.java:100); None keeps exact
        hit counts (pruning off). Ranks and float32 scores are identical
        either way — only the total-hits accounting differs.

        ``after=(score, doc_id)`` pages past a previous hit (searchAfter)."""
        q = (parse_query(query, text_fields=self._text_fields)
             if isinstance(query, str) else query)
        all_terms, scorers, phrase_scorers, expansions = self.plan(q)
        need_pos = needs_positions(q)
        doc_parts, score_parts, total = [], [], 0
        exact = True
        prior = None  # (global kth score, hits counted) — MaxScoreAccumulator
        for seg in self.reader.segs:
            ss = self.segment_scorer(
                seg, all_terms, scorers, phrase_scorers, expansions, need_pos
            )
            gids, scores, t, ex = ss.top_k(q, k, total_hits_threshold, after,
                                           prior)
            doc_parts.append(gids)
            score_parts.append(scores)
            total += t
            exact = exact and ex
            if total_hits_threshold is not None and after is None and k > 0:
                have = np.concatenate(score_parts) if len(score_parts) > 1 else score_parts[0]
                if len(have) >= k:
                    prior = (float(np.partition(have, -k)[-k]), total)
        return merge_topk(doc_parts, score_parts, total, k, exact)

    def explain(self, query: Query | str, global_doc_id: int) -> dict:
        """Score breakdown for one (query, doc) — the Explanation contract
        (lucene/core/src/java/org/apache/lucene/search/Weight.java explain;
        BaseSimilarityTestCase asserts score == explain value). Returns
        {value, description, children}; value is the float32 score the doc
        receives from search (0 if it does not match)."""
        q = (parse_query(query, text_fields=self._text_fields)
             if isinstance(query, str) else query)
        gid = np.uint64(global_doc_id)
        all_terms, scorers, phrase_scorers, expansions = self.plan(q)
        need_pos = needs_positions(q)
        for seg in self.reader.segs:
            gids = self.reader.global_doc_ids(seg)
            pos = np.searchsorted(gids, gid)
            if pos >= len(gids) or gids[pos] != gid:
                continue
            ss = self.segment_scorer(
                seg, all_terms, scorers, phrase_scorers, expansions, need_pos
            )
            return self._explain_node(q, ss, int(pos))
        return {"value": 0.0, "description": "doc not found in any segment",
                "children": []}

    def _explain_node(self, q: Query, ss, local_doc: int) -> dict:
        from lucene_ray.search.query import BooleanQuery, TermQuery

        docs, scores = ss.evaluate(q)
        idx = np.searchsorted(docs, local_doc)
        matched = idx < len(docs) and docs[idx] == local_doc
        value = float(scores[idx]) if matched else 0.0
        node = {
            "value": value,
            "description": f"{type(q).__name__}({getattr(q, 'term', getattr(q, 'terms', ''))})"
                           + (": match" if matched else ": no match"),
            "children": [],
        }
        if matched and isinstance(q, TermQuery) and q.term in ss.scorers:
            sc = ss.scorers[q.term]
            tp = ss.ctx.postings(q.term)
            f = int(tp.freqs[np.searchsorted(tp.docs, local_doc)])
            nb = int(ss.ctx.norms_for(q.term)[local_doc])
            from lucene_ray.codec.smallfloat import LENGTH_TABLE

            node["children"] = [
                {"value": float(sc.idf), "description": "idf", "children": []},
                {"value": float(f), "description": "freq", "children": []},
                {"value": float(LENGTH_TABLE[nb]), "description": "dl (decoded norm)",
                 "children": []},
                {"value": float(getattr(sc, "avgdl", 0.0)), "description": "avgdl",
                 "children": []},
            ]
        elif isinstance(q, BooleanQuery):
            for c in (*q.must, *q.should):
                node["children"].append(self._explain_node(c, ss, local_doc))
        return node

    def count(self, query: Query | str) -> int:
        """Exact hit count — the TotalHitCountCollector analog."""
        td = self.search(query, k=1, total_hits_threshold=None)
        return td.total_hits

    def search_table(self, query: Query | str, k: int = 10) -> pa.Table:
        """Top-k joined back to stored fields — result materialization."""
        td = self.search(query, k)
        if len(td.doc_ids) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.uint64()), "score": pa.array([], pa.float32())}
            )
        docs = self.reader.lookup_docs(td.doc_ids)
        order = {int(d): i for i, d in enumerate(td.doc_ids)}
        idx = sorted(range(len(docs)), key=lambda i: order[docs.column("doc_id")[i].as_py()])
        docs = docs.take(pa.array(idx))
        return docs.append_column("score", pa.array(td.scores, pa.float32()))


def merge_topk(doc_parts: list[np.ndarray], score_parts: list[np.ndarray],
               total: int, k: int, exact_total: bool = True) -> TopDocs:
    """TopDocs.merge analog: concatenate per-segment top-k, sort by
    (-score, global_doc_id), truncate. Scores float32; ties broken by the
    monotone global doc id (== segment order then docID order)."""
    if not doc_parts:
        return TopDocs(np.zeros(0, np.uint64), np.zeros(0, np.float32), 0, exact_total)
    docs = np.concatenate(doc_parts)
    scores = np.concatenate(score_parts).astype(np.float32, copy=False)
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return TopDocs(docs[order], scores[order], total, exact_total)
