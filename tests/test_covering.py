"""CoveringQuery — per-document minimum-should-match from a doc-values
formula (lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
CoveringQuery.java:47 LongValuesSource minimumNumberMatch)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import CoveringQuery, TermQuery
from lucene_ray.search.searcher import Searcher

TERMS = ("alpha", "beta", "gamma")


@pytest.fixture(scope="module")
def cov_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(17)
    texts, ks = [], []
    for i in range(200):
        present = [t for t in TERMS if rng.random() < 0.5]
        filler = ["pad"] * int(rng.integers(0, 4))
        toks = present + filler
        rng.shuffle(toks)
        texts.append(" ".join(toks) if toks else "empty")
        ks.append(int(rng.integers(-1, 5)))  # includes <1 and >len(TERMS)
    d = tmp_path_factory.mktemp("cov")
    src = str(d / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "k": pa.array(ks, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), src)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        content_col="text", id_cols=("doc_id", "k"),
        target_rows_per_partition=60, partitions_per_segment=2))
    return src, idx


def test_covering_matches_bruteforce(cov_index):
    src, idx = cov_index
    s = Searcher(IndexReader(idx))
    q = CoveringQuery(tuple(TermQuery(t) for t in TERMS), "k")
    td = s.search(q, 10**9, total_hits_threshold=None)
    rows = IndexReader(idx).lookup_docs(
        td.doc_ids, columns=["doc_id", "doc_id_orig"])
    got = sorted(rows.column("doc_id_orig").to_pylist())

    t = pq.read_table(src)
    exp = []
    for did, k, text in zip(t.column("doc_id").to_pylist(),
                            t.column("k").to_pylist(),
                            t.column("text").to_pylist()):
        n = sum(term in text.split() for term in TERMS)
        if n >= max(k, 1):  # minimums < 1 behave as 1
            exp.append(did)
    assert got == exp
    assert any(k > len(TERMS) for k in t.column("k").to_pylist())  # unmatchable rows exercised


def test_covering_scores_are_should_sum(cov_index):
    _, idx = cov_index
    s = Searcher(IndexReader(idx))
    q = CoveringQuery(tuple(TermQuery(t) for t in TERMS), "k")
    td = s.search(q, 10**9, total_hits_threshold=None)
    per_term = {t: dict(zip(*(lambda r: (r.doc_ids.tolist(), r.scores.tolist()))(
        s.search(TermQuery(t), 10**9, total_hits_threshold=None)))) for t in TERMS}
    for g, sc in zip(td.doc_ids.tolist(), td.scores.tolist()):
        acc = np.float32(0.0)
        for t in TERMS:  # clause-order float32 accumulation
            if g in per_term[t]:
                acc = np.float32(acc + np.float32(per_term[t][g]))
        assert sc == pytest.approx(float(acc), rel=1e-6)


def test_covering_formula_minimum(cov_index):
    # formula over the dv column: k % 2 + 1 in {1, 2}
    _, idx = cov_index
    s = Searcher(IndexReader(idx))
    q = CoveringQuery(tuple(TermQuery(t) for t in TERMS), "k % 2 + 1")
    td = s.search(q, 10**9, total_hits_threshold=None)
    r = IndexReader(idx)
    rows = r.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig", "k"])
    got = set(rows.column("doc_id_orig").to_pylist())
    t = pq.read_table(cov_index[0])
    exp = {did for did, k, text in zip(t.column("doc_id").to_pylist(),
                                       t.column("k").to_pylist(),
                                       t.column("text").to_pylist())
           if sum(term in text.split() for term in TERMS) >= (k % 2 + 1)}
    assert got == exp


def test_function_score_query(cov_index):
    """FunctionScoreQuery replaces scores with the expression; _score binds
    the wrapped query's own score (FunctionScoreQuery.java:47)."""
    from lucene_ray.search.query import FunctionScoreQuery

    _, idx = cov_index
    s = Searcher(IndexReader(idx))
    base = s.search(TermQuery("alpha"), 10**9, total_hits_threshold=None)
    fs = s.search(
        FunctionScoreQuery(TermQuery("alpha"), "_score * 2.0 + k", boost=1.0),
        10**9, total_hits_threshold=None)
    assert sorted(fs.doc_ids.tolist()) == sorted(base.doc_ids.tolist())
    kv = IndexReader(idx).lookup_docs(base.doc_ids, columns=["doc_id", "k"])
    kmap = dict(zip(kv.column("doc_id").to_pylist(), kv.column("k").to_pylist()))
    bmap = dict(zip(base.doc_ids.tolist(), base.scores.tolist()))
    for g, sc in zip(fs.doc_ids.tolist(), fs.scores.tolist()):
        exp = np.float32(np.float64(bmap[g]) * 2.0 + kmap[g])
        assert sc == pytest.approx(float(exp), rel=1e-6)
    # pure-dv expression ignores the sub-score entirely
    pure = s.search(FunctionScoreQuery(TermQuery("alpha"), "k * k"),
                    10**9, total_hits_threshold=None)
    for g, sc in zip(pure.doc_ids.tolist(), pure.scores.tolist()):
        assert sc == np.float32(kmap[g] * kmap[g])
