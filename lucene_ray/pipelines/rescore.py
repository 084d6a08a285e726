"""Expression-valued ranking — the lucene/expressions consumer pipelines
(score-by-formula / sort-by-formula over doc values, DoubleValuesSource
semantics; JavascriptCompiler.java:105).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.search.expressions import compile_expression


def _docvalue_bindings(reader, needed: list[str], gids: np.ndarray) -> dict:
    """Fetch the needed docmap columns for specific docs as float arrays.
    ``doc_id`` binds to the source table's own id (doc_id_orig)."""
    phys = ["doc_id_orig" if c == "doc_id" else c for c in needed]
    t = reader.lookup_docs(gids, columns=["doc_id", *phys])
    m = {int(g): i for i, g in enumerate(t.column("doc_id").to_pylist())}
    idx = np.array([m[int(g)] for g in gids], dtype=np.int64)
    out = {}
    for want, p in zip(needed, phys):
        out[want] = np.asarray(t.column(p), dtype=np.float64)[idx]
    return out


def expression_topk(sf_dir: str, expr_src: str, k: int = 10) -> pa.Table:
    """Top-k docs by a doc-values expression (sort-by-formula): returns
    (doc_id, expr_value) ordered by value desc, doc_id asc. Exact SQL
    equivalent exists for any expression over stored columns."""
    from lucene_ray.pipelines.fulltext import documents_index

    reader = documents_index(sf_dir)
    expr = compile_expression(expr_src)
    parts = []
    for p in reader.manifest.partitions:
        import pyarrow.parquet as pq

        from lucene_ray.index.build import docmap_path

        phys = ["doc_id_orig" if c == "doc_id" else c for c in expr.variables]
        t = pq.read_table(docmap_path(reader.index_dir, p["pid"]),
                          columns=list(dict.fromkeys(["doc_id_orig", *phys])))
        bindings = {
            v: np.asarray(t.column("doc_id_orig" if v == "doc_id" else v),
                          dtype=np.float64)
            for v in expr.variables
        }
        vals = expr.evaluate(bindings)
        ids = np.asarray(t.column("doc_id_orig"), dtype=np.int64)
        # per-partition partial top-k (keep boundary ties for the merge)
        if len(vals) > k:
            kth = np.partition(vals, len(vals) - k)[len(vals) - k]
            sel = vals >= kth
            ids, vals = ids[sel], vals[sel]
        parts.append((ids, vals))
    ids = np.concatenate([p[0] for p in parts])
    vals = np.concatenate([p[1] for p in parts])
    order = np.lexsort((ids, -vals))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "expr_value": pa.array(np.round(vals[order], 6), pa.float64()),
        }
    )


def expression_rescore(sf_dir: str, query, expr_src: str, k: int = 10,
                       window: int = 100) -> pa.Table:
    """Two-phase rank: BM25 top-``window`` candidates, re-ranked by an
    expression over ``_score`` + doc values (score-by-formula). Returns
    (doc_id, rank, expr_value)."""
    from lucene_ray.pipelines.fulltext import documents_index
    from lucene_ray.search.query import parse_query
    from lucene_ray.search.searcher import Searcher

    reader = documents_index(sf_dir)
    expr = compile_expression(expr_src)
    q = parse_query(query) if isinstance(query, str) else query
    td = Searcher(reader).search(q, window, total_hits_threshold=None)
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "expr_value": pa.array([], pa.float64())})
    needed = [v for v in expr.variables if v != "_score"]
    bindings = _docvalue_bindings(reader, needed, td.doc_ids)
    if "_score" in expr.variables:
        bindings["_score"] = td.scores.astype(np.float64)
    vals = expr.evaluate(bindings)
    orig = bindings.get("doc_id")
    if orig is None:
        orig = np.asarray(
            _docvalue_bindings(reader, ["doc_id"], td.doc_ids)["doc_id"],
            dtype=np.float64,
        )
    orig = orig.astype(np.int64)
    order = np.lexsort((orig, -vals))[:k]
    return pa.table(
        {
            "doc_id": pa.array(orig[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "expr_value": pa.array(np.round(vals[order], 6), pa.float64()),
        }
    )


def query_rescore_topk(sf_dir: str, first_term: str, second_term: str,
                       weight: float = 2.0, window: int = 30,
                       k: int = 10) -> pa.Table:
    """QueryRescorer.rescore static sugar (lucene/core/src/java/org/apache/
    lucene/search/QueryRescorer.java:167-181): take the first query's
    top-``window``, look up the second query's scores at those docs (Lucene
    advances the second scorer only over the window; here the vectorized
    per-segment term scoring plays that role), and
    combine ``score = (float)(first + weight * second)`` — the double-widen
    then float-narrow of Java's ``score += weight * secondPassScore``
    compound assignment. Re-sorted by (score desc, doc asc). Returns
    (doc_id, rank, score)."""
    from lucene_ray.pipelines.fulltext import documents_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    reader = documents_index(sf_dir)
    searcher = Searcher(reader)
    td = searcher.search(TermQuery(first_term), window,
                         total_hits_threshold=None)
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    # second pass: exhaustive second-query scores, matched at the window ids
    td2 = searcher.search(TermQuery(second_term), len(td.doc_ids) + 10**6,
                          total_hits_threshold=None)
    m2 = dict(zip((int(g) for g in td2.doc_ids), td2.scores))
    s2 = np.array([m2.get(int(g), np.float32(0)) for g in td.doc_ids],
                  dtype=np.float32)
    matched = np.array([int(g) in m2 for g in td.doc_ids], dtype=bool)
    combined = td.scores.astype(np.float64)
    combined[matched] += float(weight) * s2[matched].astype(np.float64)
    combined = combined.astype(np.float32)
    order = np.lexsort((td.doc_ids.astype(np.int64), -combined))[:k]
    gids = td.doc_ids[order]
    t = reader.lookup_docs(gids, columns=["doc_id", "doc_id_orig"])
    mm = dict(zip(t.column("doc_id").to_pylist(),
                  t.column("doc_id_orig").to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([int(mm[int(g)]) for g in gids], pa.int64()),
            "rank": pa.array(np.arange(1, len(gids) + 1), pa.int64()),
            "score": pa.array(combined[order], pa.float32()),
        }
    )
