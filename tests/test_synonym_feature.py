"""SynonymQuery / FeatureQuery / TermInSetQuery vs the exhaustive oracle
and closed-form expectations.

SynonymQuery semantics (SynonymQuery.java:47-52): matches any term, scores
once per doc with freq = sum of boosted per-term freqs; pseudo-term stats
docFreq = max over terms, totalTermFreq = sum (SynonymWeight ctor :213-231).
FeatureQuery semantics (FeatureField.java:251-494): linear / log /
saturation / sigmoid over a doc-values column, matching docs with S > 0.
"""

import math

import numpy as np
import pytest

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import (
    BooleanQuery,
    FeatureQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
)
from lucene_ray.search.searcher import Searcher


@pytest.fixture(scope="module")
def searcher(built_index):
    index_dir, _, _ = built_index
    return Searcher(IndexReader(index_dir))


@pytest.fixture(scope="module")
def oracle(built_index):
    import pyarrow.parquet as pq

    from lucene_ray.search.oracle import ExhaustiveOracle

    _, manifest, corpus_file = built_index
    texts = pq.read_table(corpus_file, columns=["content"]).column("content").to_pylist()
    docs, row = [], 0
    for p in manifest.partitions:
        for off in range(p["num_rows"]):
            docs.append(((p["pid"] << 32) | off, texts[row]))
            row += 1
    return ExhaustiveOracle(docs)


SYN_QUERIES = [
    SynonymQuery(("import", "return")),
    SynonymQuery(("def", "class", "self")),
    SynonymQuery(("import", "nosuchterm")),
    SynonymQuery(("import", "return"), boosts=(1.0, 0.4)),
    SynonymQuery(("def", "return", "class"), boosts=(0.2, 0.9, 1.0)),
    SynonymQuery(("import",), boost=2.0),
    BooleanQuery(must=[SynonymQuery(("import", "return")), TermQuery("def")]),
    BooleanQuery(should=[SynonymQuery(("def", "class")), TermQuery("import", boost=0.5)]),
    TermInSetQuery(("import", "nosuchterm", "class")),
    TermInSetQuery(("zzz", "qqq")),
    BooleanQuery(must=[TermQuery("return")], filter=[TermInSetQuery(("def", "class"))]),
]


@pytest.mark.parametrize(
    "q", SYN_QUERIES, ids=lambda q: type(q).__name__ + "-" + str(hash(q) % 10**6)
)
def test_synonym_vs_oracle(searcher, oracle, q):
    got = searcher.search(q, 10)
    exp_ids, exp_scores, exp_total = oracle.search(q, 10)
    assert got.total_hits == exp_total, q
    np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=str(q))
    np.testing.assert_array_equal(got.scores, exp_scores, err_msg=str(q))


def test_synonym_blended_stats(searcher, oracle):
    """Synonym score differs from both the per-term scores AND their sum:
    one similarity call with summed freq and max-df idf."""
    q = SynonymQuery(("import", "return"))
    td = searcher.search(q, 5)
    assert len(td.doc_ids) > 0
    # doc matching both terms: its synonym score must be strictly less than
    # the sum of its two independent term scores (BM25 is concave in freq)
    both = searcher.search(
        BooleanQuery(must=[TermQuery("import"), TermQuery("return")]), 1
    )
    if len(both.doc_ids):
        gid = int(both.doc_ids[0])
        syn_all = searcher.search(q, 10**6)
        idx = [int(d) for d in syn_all.doc_ids].index(gid)
        assert syn_all.scores[idx] < both.scores[0]


def test_synonym_unit_boost_matches_merged_postings(searcher, oracle):
    """With unit boosts, the hit set equals the union of the term hit sets."""
    q = SynonymQuery(("def", "class"))
    syn_ids = set(int(d) for d in searcher.search(q, 10**6).doc_ids)
    u1, _, _ = oracle.search(TermQuery("def"), 10**9)
    u2, _, _ = oracle.search(TermQuery("class"), 10**9)
    assert syn_ids == set(int(d) for d in u1) | set(int(d) for d in u2)


def test_term_in_set_is_constant_score_union(searcher):
    q = TermInSetQuery(("import", "class"), boost=2.5)
    td = searcher.search(q, 10**6)
    assert np.all(td.scores == np.float32(2.5))
    union = searcher.search(
        BooleanQuery(should=[TermQuery("import"), TermQuery("class")]), 10**6
    )
    assert set(map(int, td.doc_ids)) == set(map(int, union.doc_ids))


# ---- FeatureQuery closed-form checks over a tiny in-memory segment ----


def _feature_ctx(values):
    """Minimal SegmentContext with one docvalues column."""
    from lucene_ray.search.executor import SegmentContext, SegmentScorer

    n = len(values)
    ctx = SegmentContext.from_chunk_recs(
        {}, num_docs=n, norms=np.zeros(n, dtype=np.uint8),
        global_ids=np.arange(n, dtype=np.uint64), with_positions=False,
        live=None, parents=None,
        dv_fetch=lambda col: np.asarray(values, dtype=np.int64),
    )
    return SegmentScorer(ctx, {})


@pytest.mark.parametrize("fn,kw,expect", [
    ("linear", dict(weight=2.0),
     lambda s: np.float32(2.0) * np.float32(s)),
    ("log", dict(weight=0.5, scaling=1.0),
     lambda s: np.float32(0.5 * math.log(1.0 + s))),
    ("saturation", dict(weight=1.5, pivot=100.0),
     lambda s: np.float32(1.5) * (np.float32(1.0)
                                  - np.float32(100.0) / (np.float32(s) + np.float32(100.0)))),
    ("sigmoid", dict(weight=1.0, pivot=50.0, exp=2.0),
     lambda s: np.float32(1.0 * (1.0 - 50.0**2 / (float(s)**2 + 50.0**2)))),
])
def test_feature_functions_closed_form(fn, kw, expect):
    vals = [0, 1, 47, 100, 5000]
    ss = _feature_ctx(vals)
    docs, scores = ss.evaluate(FeatureQuery("f", function=fn, **kw))
    # S > 0 matches only (FeatureField matches docs holding the feature)
    np.testing.assert_array_equal(docs, [1, 2, 3, 4])
    exp = np.array([expect(v) for v in vals if v > 0], dtype=np.float32)
    np.testing.assert_array_equal(scores, exp)


def test_feature_boost_folds_into_weight():
    ss = _feature_ctx([10, 20])
    d1, s1 = ss.evaluate(FeatureQuery("f", function="linear", weight=2.0, boost=3.0))
    d2, s2 = ss.evaluate(FeatureQuery("f", function="linear", weight=6.0))
    np.testing.assert_array_equal(s1, s2)


def test_feature_validation():
    with pytest.raises(ValueError):
        FeatureQuery("f", function="exp")
    with pytest.raises(ValueError):
        FeatureQuery("f", weight=0.0)
    with pytest.raises(ValueError):
        SynonymQuery(("a", "b"), boosts=(1.0, 1.5))
    with pytest.raises(ValueError):
        SynonymQuery(("a",), boosts=(0.5, 0.5))
