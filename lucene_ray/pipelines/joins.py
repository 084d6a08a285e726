"""Query-time join to a parent key with score modes — completing the
JoinUtil surface (lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:56,91:
``createJoinQuery(fromField, fromQuery, toField, scoreMode)`` with score
modes None/Avg/Max/Total) over the engine's stored-field columns: child
docs matching ``child_query`` are grouped by a docmap column and each
parent receives the mode-aggregated child score.

True index-time parent/child BLOCKS (ToParentBlockJoinQuery over
``addDocuments`` blocks) are not represented in the flat input-hint schema;
the value-keyed join is the Ray-native equivalent (documented divergence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCORE_MODES = ("none", "avg", "max", "total")


def join_to_parent(sf_dir: str, child_query, parent_col: str = "source",
                   score_mode: str = "max") -> pa.Table:
    """(parent, n_children[, score]) per parent with >=1 matching child,
    sorted by parent. ``score`` (float64, rounded) appears for modes other
    than 'none'; child scores are the engine's float32 BM25 scores."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.pipelines.fulltext import documents_index
    from lucene_ray.search.query import parse_query
    from lucene_ray.search.searcher import Searcher

    reader: IndexReader = documents_index(sf_dir)
    q = parse_query(child_query) if isinstance(child_query, str) else child_query
    # per-parent (count, score-sum, score-max) aggregate per SEGMENT inside
    # the shard actors; the child hit set never reaches the driver — only
    # one partial row per (segment, parent key) merges here
    from lucene_ray.pipelines.fulltext import _pool

    agg = _pool(reader).facets([(0, q)], parent_col, agg_scores=True)[0]
    if not agg:
        cols = {"parent": pa.array([], pa.string()),
                "n_children": pa.array([], pa.int64())}
        if score_mode != "none":
            cols["score"] = pa.array([], pa.float64())
        return pa.table(cols)
    keys = sorted(agg)
    counts = np.array([agg[k][0] for k in keys], dtype=np.int64)
    cols = {
        "parent": pa.array(keys, pa.string()),
        "n_children": pa.array(counts, pa.int64()),
    }
    if score_mode != "none":
        sums = np.array([agg[k][1] for k in keys], dtype=np.float64)
        if score_mode == "total":
            score = sums
        elif score_mode == "avg":
            score = sums / counts
        else:  # max
            score = np.array([agg[k][2] for k in keys], dtype=np.float64)
        cols["score"] = pa.array(np.round(score, 6), pa.float64())
    return pa.table(cols)


def block_join(sf_dir: str, child_query, score_mode: str = "count") -> pa.Table:
    """Index-time block join: run ``ToParentBlockJoinQuery`` over the
    block-built documents index (``documents_block_index``, blocks keyed by
    ``source``) and materialize each parent hit's block key.

    Returns (parent, n_children[, score]) sorted by parent — the same shape
    as the value-keyed :func:`join_to_parent`, but computed entirely from
    the index's parents bitset (searchsorted on block-last positions +
    per-block score reduction), no stored-field grouping."""
    from lucene_ray.pipelines.fulltext import documents_block_index
    from lucene_ray.search.query import ToParentBlockJoinQuery, parse_query
    from lucene_ray.search.searcher import Searcher

    reader = documents_block_index(sf_dir)
    child = parse_query(child_query) if isinstance(child_query, str) else child_query
    searcher = Searcher(reader)
    counts_td = searcher.search(
        ToParentBlockJoinQuery(child, "count"), 10**9, total_hits_threshold=None
    )
    if len(counts_td.doc_ids) == 0:
        cols = {"parent": pa.array([], pa.string()),
                "n_children": pa.array([], pa.int64())}
        if score_mode not in ("none", "count"):
            cols["score"] = pa.array([], pa.float64())
        return pa.table(cols)
    rows = reader.lookup_docs(counts_td.doc_ids, columns=["doc_id", "source"])
    m = dict(zip(rows.column("doc_id").to_pylist(),
                 rows.column("source").to_pylist()))
    cols = {
        "parent": pa.array([m[int(g)] for g in counts_td.doc_ids], pa.string()),
        "n_children": pa.array(counts_td.scores.astype(np.int64), pa.int64()),
    }
    if score_mode not in ("none", "count"):
        td = searcher.search(
            ToParentBlockJoinQuery(child, score_mode), 10**9,
            total_hits_threshold=None,
        )
        sm = dict(zip(td.doc_ids.tolist(), td.scores.astype(np.float64).tolist()))
        cols["score"] = pa.array(
            np.round([sm[int(g)] for g in counts_td.doc_ids], 6), pa.float64()
        )
    t = pa.table(cols)
    return t.take(pa.compute.sort_indices(t, sort_keys=[("parent", "ascending")]))


def block_join_children(sf_dir: str, parent_query) -> pa.Table:
    """The inverse block join (ToChildBlockJoinQuery.java:35): parents
    matching ``parent_query`` (and carrying the parents-bitset flag) expand
    to every child doc of their block. Returns the children's table doc_ids
    sorted — the parent itself is excluded (it is the block-LAST doc, not a
    child)."""
    from lucene_ray.pipelines.fulltext import documents_block_index
    from lucene_ray.search.query import ToChildBlockJoinQuery, parse_query
    from lucene_ray.search.searcher import Searcher

    reader = documents_block_index(sf_dir)
    parent = (parse_query(parent_query) if isinstance(parent_query, str)
              else parent_query)
    td = Searcher(reader).search(
        ToChildBlockJoinQuery(parent), 10**9, total_hits_threshold=None
    )
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    rows = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    ids = sorted(rows.column("doc_id_orig").to_pylist())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})
