"""MoreLikeThis — find documents similar to a source document.

Behavioral reference: Lucene's queries module
(lucene/queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java):
re-analyze the source text, keep "interesting" terms (tf >= minTermFreq,
df >= minDocFreq), score each candidate term tf * idf with the classic
TF-IDF idf = 1 + ln(numDocs / (df + 1)) (TFIDFSimilarity.idf), take the
top maxQueryTerms by score, and search an OR (SHOULD) query of those terms
excluding the source doc itself.

Term selection is fully deterministic ((score desc, term asc) tie-break), so
both the selected-terms table and the resulting hit set have exact DuckDB
oracles over the shared tokenizer grammar; only the BM25-scored ranking of
the expanded query is engine-specific (rows-only, like every scored surface).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from lucene_ray.pipelines.fulltext import _all_matches, _orig_ids, documents_index

DEFAULT_MIN_TERM_FREQ = 2
DEFAULT_MIN_DOC_FREQ = 5
DEFAULT_MAX_QUERY_TERMS = 25


def _source_text(sf_dir: str, doc_id: int) -> str:
    """Column-pruned, predicate-pushdown read of ONE row's text (the
    like(String) entry point re-analyzes stored content; MoreLikeThis.java
    likeText path)."""
    import os

    ds = pads.dataset(os.path.join(sf_dir, "documents.parquet"))
    t = ds.to_table(columns=["text"], filter=pads.field("doc_id") == doc_id)
    if t.num_rows != 1:
        raise KeyError(f"doc_id {doc_id}: {t.num_rows} rows")
    return t.column("text")[0].as_py()


def interesting_terms(
    sf_dir: str,
    doc_id: int,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
) -> pa.Table:
    """The MLT term-selection stage: (term, tf, df, score) of the top
    ``max_query_terms`` candidates, ordered (score desc, term asc).
    score = tf * (1 + ln(numDocs / (df + 1))) — createQueue() in
    MoreLikeThis.java with ClassicSimilarity's idf."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    reader = documents_index(sf_dir)
    tf = Counter(CodeTokenizer()(_source_text(sf_dir, doc_id)))
    cands = sorted(t for t, f in tf.items() if f >= min_term_freq)
    stats = reader.term_stats(cands)
    num_docs = reader.collection_stats().doc_count
    rows = []
    for t in cands:
        st = stats.get(t)
        if st is None or st.doc_freq < min_doc_freq:
            continue
        idf = 1.0 + math.log(num_docs / (st.doc_freq + 1.0))
        rows.append((t, tf[t], st.doc_freq, tf[t] * idf))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:max_query_terms]
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "tf": pa.array([r[1] for r in rows], pa.int64()),
            "df": pa.array([r[2] for r in rows], pa.int64()),
            "score": pa.array([round(r[3], 6) for r in rows], pa.float64()),
        }
    )


def more_like_this_hits(
    sf_dir: str,
    doc_id: int,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
) -> pa.Table:
    """Exact hit set of the MLT query (OR over the selected terms), source
    doc excluded — SQL-checkable; the scored top-k lives in
    :func:`more_like_this_topk`."""
    from lucene_ray.search.query import BooleanQuery, TermQuery

    sel = interesting_terms(sf_dir, doc_id, min_term_freq, min_doc_freq, max_query_terms)
    terms = sel.column("term").to_pylist()
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    reader = documents_index(sf_dir)
    q = BooleanQuery(should=[TermQuery(t) for t in terms])
    gids = _all_matches(sf_dir, q, reader)
    hits = _orig_ids(sf_dir, gids, reader)
    ids = [i for i in hits.column("doc_id").to_pylist() if i != doc_id]
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def more_like_this_topk(
    sf_dir: str,
    doc_id: int,
    k: int = 10,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
) -> pa.Table:
    """BM25 top-k for the MLT query. Fetches k+1 and drops the source doc.

    Fully SQL-checkable despite float32 scoring: the executor folds the
    selected terms' BM25 contributions onto a float32 accumulator IN
    SELECTION ORDER (score desc, term asc), which DuckDB reproduces with a
    list_reduce over the same order — ranks AND round(score, 6) match
    bit-for-float32-bit (verified at sf0.001/0.01)."""
    from lucene_ray.pipelines.fulltext import _pool
    from lucene_ray.search.query import BooleanQuery, TermQuery

    sel = interesting_terms(sf_dir, doc_id, min_term_freq, min_doc_freq, max_query_terms)
    terms = sel.column("term").to_pylist()
    reader = documents_index(sf_dir)
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    q = BooleanQuery(should=[TermQuery(t) for t in terms])
    td = _pool(reader).search([(0, q)], k=k + 1)[0]
    gids, scores = td.doc_ids, td.scores
    t = reader.lookup_docs(np.asarray(gids), columns=["doc_id", "doc_id_orig"])
    # lookup_docs returns docmap order; re-align to the ranked gid order
    m = dict(zip(t.column("doc_id").to_pylist(), t.column("doc_id_orig").to_pylist()))
    orig = np.array([m[int(g)] for g in gids], dtype=np.int64)
    keep = orig != doc_id
    kept = orig[keep][:k]
    return pa.table(
        {
            "doc_id": pa.array(kept, pa.int64()),
            "rank": pa.array(np.arange(1, len(kept) + 1), pa.int64()),
            "score": pa.array(np.asarray(scores)[keep][:k], pa.float32()),
        }
    )
