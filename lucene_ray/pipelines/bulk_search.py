"""Distributed BM25 serving — the QueryShard actor-pool path (SURVEY §3.2).

The driver resolves global term statistics once, precomputes the BM25
constants per query (the Weight), broadcasts the query plans with ``ray.put``
and fans segments out over a ``map_batches`` actor pool. Each actor opens the
index ONCE in ``__init__`` (norms / docmaps cached across batches — the
IndexSearcher-reuse pattern, §2.3) and returns per-(segment, query) top-k
rows; the driver heap-merges with the TopDocs tie-break.

This scales by segment count: 256 nodes x N actors each serve disjoint
segment groups; the only cross-partition data is the tiny (query plan, k)
broadcast and the per-segment top-k rows coming back.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import Query, needs_positions
from lucene_ray.search.searcher import Searcher, TopDocs, merge_topk


class QueryShard:
    """Actor: serves all queries for the segments routed to it."""

    def __init__(self, index_dir: str, plans_ref):
        self.reader = IndexReader(index_dir)
        self.searcher = Searcher(self.reader)
        self.plans = ray.get(plans_ref)  # [(qid, q, all_terms, scorers, ph, pf, k, thr)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"seg": [], "qid": [], "rank": [], "doc_id": [], "score": [],
                "total": [], "exact": []}
        for seg in batch.column("seg").to_pylist():
            for qid, q, all_terms, scorers, ph, pf, k, thr in self.plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(seg, all_terms, scorers, ph, pf, need_pos)
                gids, scores, total, exact = ss.top_k(q, k, thr)
                n = max(1, len(gids))  # emit >=1 row per (seg, qid) for totals
                for r in range(n):
                    rows["seg"].append(seg)
                    rows["qid"].append(qid)
                    rows["rank"].append(r if r < len(gids) else -1)
                    rows["doc_id"].append(int(gids[r]) if r < len(gids) else 0)
                    rows["score"].append(float(scores[r]) if r < len(gids) else 0.0)
                    rows["total"].append(total)
                    rows["exact"].append(exact)
        return pa.table(
            {
                "seg": pa.array(rows["seg"], pa.int32()),
                "qid": pa.array(rows["qid"], pa.int64()),
                "rank": pa.array(rows["rank"], pa.int32()),
                "doc_id": pa.array(rows["doc_id"], pa.uint64()),
                "score": pa.array(rows["score"], pa.float32()),
                "total": pa.array(rows["total"], pa.int64()),
                "exact": pa.array(rows["exact"], pa.bool_()),
            }
        )


@ray.remote(num_cpus=0)
class QueryShardActor:
    """Long-lived serving actor owning a fixed subset of segments — the
    persistent form of the QueryShard map_batches stage (one IndexReader
    loaded in __init__, reused across every call; SURVEY §2.3).

    num_cpus=0: serving actors are idle between query bursts, and ANY
    standing reservation from a long-lived pool deadlocks co-running
    Dataset pipelines on small clusters (a 0.25 reservation pushed a
    2-CPU cluster's demand to 2.25 and wedged a read task forever). On a
    real serving tier these actors get dedicated nodes instead."""

    def __init__(self, index_dir: str, segs: list[int]):
        from lucene_ray.index.build import _tune_allocators

        _tune_allocators()  # fault-free steady state for decode buffers
        self.reader = IndexReader(index_dir)
        self.searcher = Searcher(self.reader)
        self.segs = segs

    def search_batch(self, plans):
        """plans: [(qid, q, all_terms, scorers, ph, pf, k, thr)] ->
        [(seg, qid, gids, scores, total, exact)] over this actor's segs."""
        out = []
        for seg in self.segs:
            for qid, q, all_terms, scorers, ph, pf, k, thr in plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(seg, all_terms, scorers, ph, pf, need_pos)
                gids, scores, total, exact = ss.top_k(q, k, thr)
                out.append((seg, qid, gids, scores, total, exact))
        return out

    def diversified_batch(self, plans, key_col: str, k: int, max_per_key: int):
        """plans: [(qid, q, all_terms, scorers, ph, pf)] -> [(seg, qid,
        gids, scores, keys)] — per-segment constrained top-k candidates
        (per key at most ``max_per_key`` by (score desc, doc asc), then the
        segment's top ``k``). Exhaustive scored evaluation per segment
        (ScoreMode.COMPLETE, as DiversifiedTopDocsCollector.java:92); the
        driver re-applies the same kernel on the <= segments x k merged
        rows, which is exact: a doc outside its segment's constrained top-k
        can never enter the global constrained top-k."""
        out = []
        for seg in self.segs:
            dv = None
            for qid, q, all_terms, scorers, ph, pf in plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(seg, all_terms, scorers, ph, pf, need_pos)
                docs, scores = ss.evaluate(q)
                if dv is None:
                    dv = self.reader.docvalues(seg, key_col)
                gids, scores, keys = diversify_topk(
                    ss.ctx.global_ids[docs], scores, dv[docs], k, max_per_key)
                out.append((seg, qid, gids, scores, keys))
        return out

    def grouped_topk_batch(self, plans, group_col: str, per_group: int):
        """Per-segment top-``per_group`` docs per group value by
        (score desc, global doc asc) — the grouping module's per-leaf
        phase; at most per_group rows per (segment, group) leave the
        actor, and the driver re-applies the same kernel (exact: a doc
        outside its segment's per-group top-N can never enter the global
        per-group top-N)."""
        out = []
        for seg in self.segs:
            dv = orig = None
            for qid, q, all_terms, scorers, ph, pf in plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(
                    seg, all_terms, scorers, ph, pf, need_pos)
                docs, scores = ss.evaluate(q)
                if dv is None:
                    dv = np.asarray(self.reader.docvalues(seg, group_col))
                    orig = np.asarray(
                        self.reader.docvalues(seg, "doc_id_orig"),
                        dtype=np.int64)
                labels = dv[docs]
                gids = ss.ctx.global_ids[docs]
                order = np.lexsort((gids, -scores, labels))
                l_s = labels[order]
                new_run = np.r_[True, l_s[1:] != l_s[:-1]] if len(l_s) else \
                    np.zeros(0, dtype=bool)
                run_id = np.cumsum(new_run) - 1
                run_start = np.flatnonzero(new_run)
                pos = np.arange(len(l_s)) - run_start[run_id] if len(l_s) else \
                    np.zeros(0, dtype=np.int64)
                keep = order[pos < per_group]
                out.append((seg, qid, labels[keep].tolist(),
                            gids[keep].tolist(),
                            scores[keep].astype(np.float32).tolist(),
                            orig[docs][keep].tolist()))
        return out

    def sort_field_batch(self, plans, col: str, k: int, reverse: bool):
        """Per-segment top-k of each query's hit set ordered by a numeric
        doc-values column, ties by original doc id ascending (the
        TopFieldCollector per-leaf phase) — at most k rows per (seg, qid)
        leave the actor."""
        out = []
        for seg in self.segs:
            vals = orig = None
            for qid, q, all_terms, scorers, ph, pf in plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(
                    seg, all_terms, scorers, ph, pf, need_pos)
                docs, _ = ss.evaluate(q)
                if vals is None:
                    vals = np.asarray(self.reader.docvalues(seg, col),
                                      dtype=np.int64)
                    orig = np.asarray(
                        self.reader.docvalues(seg, "doc_id_orig"),
                        dtype=np.int64)
                v, o = vals[docs], orig[docs]
                order = np.lexsort((o, -v if reverse else v))[:k]
                out.append((seg, qid, o[order].tolist(), v[order].tolist()))
        return out

    def facet_batch(self, plans, facet_col: str, value_col: str | None = None,
                    edges: list | None = None, agg_scores: bool = False):
        """Per-segment facet aggregation COLLECTED DURING MATCH — the
        FacetsCollector shape (facet/FacetsCollector.java:36): the hit set
        never leaves the actor; only (label, count[, sum, max]) rows do.
        ``edges`` switches to numeric range binning (label = bin index,
        values below edges[0] uncounted, as in LongRangeFacetCounts).
        ``agg_scores`` aggregates the query's float32 SCORES per label
        instead of a doc-values column (the JoinUtil score-mode reduce)."""
        out = []
        edge_arr = np.asarray(edges) if edges is not None else None
        for seg in self.segs:
            dv = vv = None
            for qid, q, all_terms, scorers, ph, pf in plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(
                    seg, all_terms, scorers, ph, pf, need_pos)
                docs, scores = ss.evaluate(q)
                if dv is None:
                    dv = np.asarray(self.reader.docvalues(seg, facet_col))
                    if value_col is not None:
                        vv = np.asarray(self.reader.docvalues(seg, value_col),
                                        dtype=np.int64)
                labels = dv[docs]
                if agg_scores:
                    uniq, inv = np.unique(labels, return_inverse=True)
                    cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
                    sv = scores.astype(np.float64)
                    sums = np.bincount(inv, weights=sv, minlength=len(uniq))
                    maxs = np.full(len(uniq), -np.inf)
                    np.maximum.at(maxs, inv, sv)
                    out.append((seg, qid, uniq.tolist(), cnt.tolist(),
                                sums.tolist(), maxs.tolist()))
                    continue
                if edge_arr is not None:
                    idx = np.searchsorted(edge_arr, labels, side="right") - 1
                    keep = idx >= 0
                    idx, docs_k = idx[keep], docs[keep]
                    uniq, inv = np.unique(idx, return_inverse=True)
                    names = uniq.tolist()
                    vals = vv[docs_k] if vv is not None else None
                else:
                    uniq, inv = np.unique(labels, return_inverse=True)
                    names = uniq.tolist()
                    vals = vv[docs] if vv is not None else None
                cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
                if vals is not None and len(uniq):
                    sums = np.bincount(inv, weights=vals,
                                       minlength=len(uniq)).astype(np.int64)
                    maxs = np.full(len(uniq), np.iinfo(np.int64).min,
                                   dtype=np.int64)
                    np.maximum.at(maxs, inv, vals)
                    out.append((seg, qid, names, cnt.tolist(),
                                sums.tolist(), maxs.tolist()))
                else:
                    out.append((seg, qid, names, cnt.tolist(), None, None))
        return out

    def apply_segments(self, fn):
        """Run an arbitrary per-segment kernel ``fn(reader, seg)`` over this
        actor's segments and return the list of results — the generic warm
        path for one-off per-segment extractions (snippets, diagnostics)
        so they reuse the long-lived pool instead of spawning a fresh
        actor pool per call."""
        return [fn(self.reader, seg) for seg in self.segs]

    def match_batch(self, plans):
        """plans: [(qid, q, all_terms, scorers, ph, pf)] ->
        {qid: global ids of ALL matches in this actor's segs}."""
        out: dict[int, list] = {}
        for seg in self.segs:
            for qid, q, all_terms, scorers, ph, pf in plans:
                need_pos = needs_positions(q)
                ss = self.searcher.segment_scorer(seg, all_terms, scorers, ph, pf, need_pos)
                docs, _ = ss.evaluate(q)
                out.setdefault(qid, []).append(ss.ctx.global_ids[docs])
        return {
            qid: (np.concatenate(parts) if parts else np.zeros(0, np.uint64))
            for qid, parts in out.items()
        }


def diversify_topk(gids, scores, keys, k: int, max_per_key: int):
    """Diversified top-k kernel (DiversifiedTopDocsCollector.java:40): keep
    per key only its best ``max_per_key`` hits by (score desc, doc asc),
    then the global top ``k`` under the same order. The closed form of the
    Java streaming collector (equivalence property-tested against a faithful
    simulation of its insert() in test_diversified.py); mergeable — applying
    it per segment and again on the union of partials is exact."""
    gids = np.asarray(gids)
    scores = np.asarray(scores, dtype=np.float32)
    if len(gids) == 0:
        return gids, scores, np.asarray(keys)
    codes = np.unique(np.asarray(keys), return_inverse=True)[1]
    order = np.lexsort((gids, -scores.astype(np.float64), codes))
    c = codes[order]
    starts = np.r_[0, np.flatnonzero(np.diff(c)) + 1]
    counts = np.diff(np.r_[starts, len(c)])
    rank = np.arange(len(c)) - np.repeat(starts, counts)
    keep = order[rank < max_per_key]
    sel = np.lexsort((gids[keep], -scores[keep].astype(np.float64)))[:k]
    keep = keep[sel]
    return gids[keep], scores[keep], np.asarray(keys)[keep]


class ShardPool:
    """Driver handle to a pool of QueryShardActors covering all segments —
    the distributed serving path used by the contract pipelines. Plans
    (global stats -> Weight) are built once on the driver and broadcast;
    actors do per-segment scoring; the driver merges."""

    def __init__(self, index_dir: str, concurrency: int = 4):
        self.index_dir = index_dir
        self.concurrency = concurrency
        self.reader = IndexReader(index_dir)
        self.searcher = Searcher(self.reader)
        self._spawn()

    def _spawn(self) -> None:
        segs = self.reader.segs
        n = min(self.concurrency, max(1, len(segs)))
        self.actors = [
            QueryShardActor.remote(self.index_dir, segs[i::n])
            for i in range(n)
        ]

    def refresh(self) -> bool:
        """SearcherManager.maybeRefresh analog (lucene/core/src/java/org/
        apache/lucene/search/SearcherManager.java:46 / ReferenceManager.
        maybeRefresh): reopen against the CURRENT commit generation. Returns
        False (no work) when the manifest generation is unchanged; otherwise
        reopens the driver reader/planner and respawns the serving actors on
        the new segment set (new segments after add_documents, rewritten
        ones after compaction, new tombstone/dv-update generations). Old
        actors are released by dropping their handles: Ray lets in-flight
        calls finish and reclaims each actor when its handle count reaches
        zero — the old-searcher-reference-drain of ReferenceManager."""
        new_reader = IndexReader(self.index_dir)
        if new_reader.manifest.generation == self.reader.manifest.generation:
            return False
        self.reader = new_reader
        self.searcher = Searcher(new_reader)
        self._spawn()
        return True

    def _plans(self, queries, extra=(), planner=None):
        # a custom planner (e.g. a Searcher with a non-default Similarity)
        # changes ONLY the weights: scorers are built driver-side and ship
        # inside the plan, so the actors serve any Similarity unchanged
        plans = []
        for qid, q in queries:
            all_terms, scorers, ph, pf = (planner or self.searcher).plan(q)
            plans.append((qid, q, all_terms, scorers, ph, pf, *extra))
        return ray.put(plans)

    def map_segments(self, fn) -> list:
        """Apply ``fn(reader, seg)`` to every segment across the pool and
        return the flat list of per-segment results (segment order not
        guaranteed — callers sort)."""
        parts = ray.get([a.apply_segments.remote(fn) for a in self.actors])
        return [r for p in parts for r in p]

    def match(self, queries: list[tuple[int, Query]]) -> dict[int, np.ndarray]:
        """qid -> sorted global ids of ALL matching docs (exhaustive,
        live-docs filtered), gathered across the actor pool."""
        ref = self._plans(queries)
        parts = ray.get([a.match_batch.remote(ref) for a in self.actors])
        out: dict[int, np.ndarray] = {}
        for qid, _ in queries:
            arrs = [p[qid] for p in parts if qid in p]
            ids = np.concatenate(arrs) if arrs else np.zeros(0, np.uint64)
            out[qid] = np.sort(ids)
        return out

    def grouped_topk(self, queries: list[tuple[int, Query]], group_col: str,
                     per_group: int) -> dict[int, dict]:
        """qid -> {group: [(orig_id, score), ...]} global per-group top-N,
        merged from per-segment partials by the same (score desc, gid asc)
        kernel."""
        ref = self._plans(queries)
        parts = ray.get([
            a.grouped_topk_batch.remote(ref, group_col, per_group)
            for a in self.actors
        ])
        acc: dict[int, dict] = {qid: {} for qid, _ in queries}
        for rows in parts:
            for _seg, qid, labels, gids, scores, origs in rows:
                d = acc[qid]
                for lab, g, s, o in zip(labels, gids, scores, origs):
                    d.setdefault(lab, []).append((-np.float32(s), int(g), int(o)))
        out: dict[int, dict] = {}
        for qid, groups in acc.items():
            res = {}
            for lab, rows_ in groups.items():
                rows_.sort()
                res[lab] = [(o, float(-negs)) for negs, _g, o in rows_[:per_group]]
            out[qid] = res
        return out

    def sort_field_topk(self, queries: list[tuple[int, Query]], col: str,
                        k: int, reverse: bool) -> dict[int, tuple]:
        """qid -> (orig_ids, values): global top-k by the column, merged
        from the per-segment partials (<= segments x k rows ever reach the
        driver — the TopFieldCollector reduce)."""
        ref = self._plans(queries)
        parts = ray.get([
            a.sort_field_batch.remote(ref, col, k, reverse)
            for a in self.actors
        ])
        out = {}
        for qid, _ in queries:
            oo, vv = [], []
            for rows in parts:
                for _seg, rqid, o, v in rows:
                    if rqid == qid:
                        oo.extend(o)
                        vv.extend(v)
            o_arr = np.asarray(oo, dtype=np.int64)
            v_arr = np.asarray(vv, dtype=np.int64)
            order = np.lexsort((o_arr, -v_arr if reverse else v_arr))[:k]
            out[qid] = (o_arr[order], v_arr[order])
        return out

    def facets(self, queries: list[tuple[int, Query]], facet_col: str,
               value_col: str | None = None, edges: list | None = None,
               agg_scores: bool = False) -> dict[int, dict]:
        """qid -> {label: [n_docs, sum, max]} facet aggregates over the hit
        set, computed per segment inside the actors (the hit set itself
        never reaches the driver; only label-level partials merge here).
        With ``edges``, labels are range-bin indices; with ``agg_scores``,
        sum/max aggregate the query's scores (float)."""
        ref = self._plans(queries)
        parts = ray.get([
            a.facet_batch.remote(ref, facet_col, value_col, edges, agg_scores)
            for a in self.actors
        ])
        out: dict[int, dict] = {qid: {} for qid, _ in queries}
        for rows in parts:
            for _seg, qid, names, cnts, sums, maxs in rows:
                agg = out[qid]
                for i, name in enumerate(names):
                    cur = agg.get(name)
                    if cur is None:
                        cur = agg[name] = [0, 0, None]
                    cur[0] += cnts[i]
                    if sums is not None:
                        cur[1] += sums[i]
                        cur[2] = maxs[i] if cur[2] is None else max(cur[2], maxs[i])
        return out

    def diversified(self, queries: list[tuple[int, Query]], key_col: str,
                    k: int = 10, max_per_key: int = 2):
        """qid -> (gids, scores, keys): diversified top-k — at most
        ``max_per_key`` hits per ``key_col`` value (the
        DiversifiedTopDocsCollector surface, misc/search/
        DiversifiedTopDocsCollector.java). Per-segment constrained
        candidates come back from the actors (<= k rows each); the driver
        merges by re-applying the same kernel."""
        ref = self._plans(queries)
        parts = ray.get([
            a.diversified_batch.remote(ref, key_col, k, max_per_key)
            for a in self.actors
        ])
        out = {}
        for qid, _ in queries:
            g_parts, s_parts, k_parts = [], [], []
            for rows in parts:
                for seg, rqid, gids, scores, keys in rows:
                    if rqid == qid and len(gids):
                        g_parts.append(gids)
                        s_parts.append(scores)
                        k_parts.append(keys)
            if not g_parts:
                out[qid] = (np.zeros(0, np.uint64), np.zeros(0, np.float32),
                            np.zeros(0, object))
                continue
            out[qid] = diversify_topk(
                np.concatenate(g_parts), np.concatenate(s_parts),
                np.concatenate(k_parts), k, max_per_key)
        return out

    def search(self, queries: list[tuple[int, Query]], k: int = 10,
               total_hits_threshold: int | None = 1000,
               planner=None) -> dict[int, TopDocs]:
        """qid -> merged TopDocs, rank-identical to the single-process
        Searcher (same per-segment kernels, same TopDocs.merge tie-break).
        ``planner`` overrides the plan-building Searcher (custom
        Similarity); per-segment scoring is unchanged."""
        ref = self._plans(queries, (k, total_hits_threshold), planner)
        parts = ray.get([a.search_batch.remote(ref) for a in self.actors])
        results: dict[int, TopDocs] = {}
        for qid, _ in queries:
            doc_parts, score_parts, total, exact = [], [], 0, True
            for rows in parts:
                for seg, rqid, gids, scores, t, ex in rows:
                    if rqid != qid:
                        continue
                    doc_parts.append(gids)
                    score_parts.append(scores)
                    total += t
                    exact = exact and ex
            results[qid] = merge_topk(doc_parts, score_parts, total, k, exact)
        return results


def bulk_search(index_dir: str, queries: list[tuple[int, Query]], k: int = 10,
                total_hits_threshold: int | None = 1000,
                concurrency: int = 4) -> dict[int, TopDocs]:
    """Run a query battery against every segment via an actor pool; returns
    qid -> merged TopDocs (rank-identical to the single-process Searcher)."""
    reader = IndexReader(index_dir)
    searcher = Searcher(reader)
    plans = []
    for qid, q in queries:
        all_terms, scorers, ph, pf = searcher.plan(q)
        plans.append((qid, q, all_terms, scorers, ph, pf, k, total_hits_threshold))
    plans_ref = ray.put(plans)

    segs = ray.data.from_items([{"seg": s} for s in reader.segs])
    out = segs.map_batches(
        QueryShard,
        fn_constructor_args=(index_dir, plans_ref),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=min(concurrency, max(1, len(reader.segs))),
        num_cpus=1,
    ).to_pandas()

    results: dict[int, TopDocs] = {}
    for qid, _q in queries:
        g = out[out["qid"] == qid]
        hits = g[g["rank"] >= 0]
        doc_parts = [hits["doc_id"].to_numpy(dtype=np.uint64)]
        score_parts = [hits["score"].to_numpy(dtype=np.float32)]
        per_seg = g.drop_duplicates(subset=["seg"])  # one total per segment
        total = int(per_seg["total"].sum()) if len(per_seg) else 0
        exact = bool(per_seg["exact"].all()) if len(per_seg) else True
        results[qid] = merge_topk(doc_parts, score_parts, total, k, exact)
    return results
