"""Span family, DisMax, numeric doc-values range + range facets.

Every hit set is checked against a brute-force positional oracle computed
directly from the parquet text with the shared tokenizer grammar.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    tok = CodeTokenizer()
    out = {}
    for did, text, nc in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("n_chars").to_pylist(),
    ):
        out[did] = (tok(text), nc)
    return out


def _positions(toks, term):
    return [i for i, t in enumerate(toks) if t == term]


def test_span_first(docs):
    from lucene_ray.pipelines.fulltext import span_first_hits

    got = span_first_hits(SF, "join", 10).column("doc_id").to_pylist()
    want = sorted(d for d, (toks, _) in docs.items()
                  if any(p + 1 <= 10 for p in _positions(toks, "join")))
    assert got == want


def test_span_first_huge_end_equals_term_hits(docs):
    from lucene_ray.pipelines.fulltext import span_first_hits, term_hits

    a = span_first_hits(SF, "scan", 1 << 30).column("doc_id").to_pylist()
    b = term_hits(SF, "scan").column("doc_id").to_pylist()
    assert a == b


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_near_ordered_pair(docs, slop):
    from lucene_ray.pipelines.fulltext import span_near_hits

    got = span_near_hits(SF, ["batch", "window"], slop).column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        pa_ = _positions(toks, "batch")
        pb_ = _positions(toks, "window")
        if any(pb > pa and pb - pa - 1 <= slop for pa in pa_ for pb in pb_):
            want.append(d)
    assert got == sorted(want)


def test_span_near_three_clauses(docs):
    from lucene_ray.pipelines.fulltext import span_near_hits

    slop = 4
    got = span_near_hits(SF, ["hash", "join", "scan"], slop).column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        ps = [_positions(toks, t) for t in ("hash", "join", "scan")]
        hit = any(
            p2 > p1 and p3 > p2 and (p3 - p1 - 2) <= slop
            for p1 in ps[0] for p2 in ps[1] for p3 in ps[2]
        )
        if hit:
            want.append(d)
    assert got == sorted(want)


def test_span_near_greedy_matches_exhaustive_on_pairs(docs):
    """The greedy chain is exact for unit spans: cross-check width math on
    every doc for a high-slop pair (catches off-by-one in the gap sum)."""
    from lucene_ray.pipelines.fulltext import span_near_hits

    for a, b, slop in [("query", "plan", 2), ("order", "by", 0), ("group", "by", 5)]:
        got = span_near_hits(SF, [a, b], slop).column("doc_id").to_pylist()
        want = sorted(
            d for d, (toks, _) in docs.items()
            if any(pb > pa and pb - pa - 1 <= slop
                   for pa in _positions(toks, a) for pb in _positions(toks, b))
        )
        assert got == want, (a, b, slop)


@pytest.mark.parametrize("slop", [0, 2, 5])
def test_span_near_unordered_pair(docs, slop):
    from lucene_ray.pipelines.fulltext import span_near_hits

    got = span_near_hits(SF, ["batch", "window"], slop, in_order=False) \
        .column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        pa_ = _positions(toks, "batch")
        pb_ = _positions(toks, "window")
        if any(abs(pb - pa) - 1 <= slop for pa in pa_ for pb in pb_):
            want.append(d)
    assert got == sorted(want)


def test_span_near_unordered_three(docs):
    from lucene_ray.pipelines.fulltext import span_near_hits

    slop = 5
    got = span_near_hits(SF, ["hash", "join", "scan"], slop, in_order=False) \
        .column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        ps = [_positions(toks, t) for t in ("hash", "join", "scan")]
        hit = any(
            max(p1, p2, p3) - min(p1, p2, p3) - 2 <= slop
            for p1 in ps[0] for p2 in ps[1] for p3 in ps[2]
        )
        if hit:
            want.append(d)
    assert got == sorted(want)


def test_span_near_unordered_superset_of_ordered(docs):
    from lucene_ray.pipelines.fulltext import span_near_hits

    o = set(span_near_hits(SF, ["batch", "window"], 3).column("doc_id").to_pylist())
    u = set(span_near_hits(SF, ["batch", "window"], 3, in_order=False)
            .column("doc_id").to_pylist())
    assert o <= u


def test_span_not(docs):
    from lucene_ray.pipelines.fulltext import span_not_hits

    got = span_not_hits(SF, "scan", "join").column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        ps = _positions(toks, "scan")
        pj = set(_positions(toks, "join"))
        # a scan occurrence at p survives unless it begins "scan join"
        # (the only exclude span [sx, sx+2) that can overlap [p, p+1) is
        # sx = p: sx = p-1 would need 'join' at p, but p holds 'scan')
        if any(p + 1 not in pj for p in ps):
            want.append(d)
    assert got == sorted(want)


def test_span_or_union(docs):
    from lucene_ray.pipelines.fulltext import _all_matches, _orig_ids
    from lucene_ray.search.query import SpanOrQuery, SpanTermQuery

    q = SpanOrQuery([SpanTermQuery("join"), SpanTermQuery("hash")])
    got = _orig_ids(SF, _all_matches(SF, q)).column("doc_id").to_pylist()
    want = sorted(
        d for d, (toks, _) in docs.items() if "join" in toks or "hash" in toks
    )
    assert got == want


def test_dismax_hits_and_scores(docs):
    from lucene_ray.pipelines.fulltext import dismax_hits, documents_index
    from lucene_ray.search.query import DisMaxQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    got = dismax_hits(SF, ["join", "hash"], 0.3).column("doc_id").to_pylist()
    want = sorted(
        d for d, (toks, _) in docs.items() if "join" in toks or "hash" in toks
    )
    assert got == want

    # score = max + tie * (sum - max) over matching term scores, float32
    s = Searcher(documents_index(SF))
    t_join = s.search(TermQuery("join"), k=10_000)
    t_hash = s.search(TermQuery("hash"), k=10_000)
    per = {}
    for td in (t_join, t_hash):
        for g, sc in zip(td.doc_ids, td.scores):
            per.setdefault(int(g), []).append(np.float32(sc))
    td = s.search(DisMaxQuery([TermQuery("join"), TermQuery("hash")], 0.3), k=20)
    for g, sc in zip(td.doc_ids, td.scores):
        ss = per[int(g)]
        mx = max(ss)
        sm = np.float32(0)
        for x in ss:
            sm = np.float32(sm + x)
        want_sc = np.float32(mx + np.float32(0.3) * np.float32(sm - mx))
        assert np.float32(sc) == want_sc


def test_dismax_tie_zero_is_best_clause(docs):
    """tie_breaker=0: the dismax score equals the best single-clause score."""
    from lucene_ray.pipelines.fulltext import documents_index
    from lucene_ray.search.query import DisMaxQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    s = Searcher(documents_index(SF))
    per = {}
    for t in ("join", "hash"):
        td = s.search(TermQuery(t), k=10_000)
        for g, sc in zip(td.doc_ids, td.scores):
            per[int(g)] = max(per.get(int(g), np.float32(0)), np.float32(sc))
    td = s.search(DisMaxQuery([TermQuery("join"), TermQuery("hash")], 0.0), k=20)
    for g, sc in zip(td.doc_ids, td.scores):
        assert np.float32(sc) == per[int(g)]


def test_numeric_range(docs):
    from lucene_ray.pipelines.fulltext import numeric_range_hits

    got = numeric_range_hits(SF, "n_chars", 200, 400).column("doc_id").to_pylist()
    want = sorted(d for d, (_, nc) in docs.items() if 200 <= nc <= 400)
    assert got == want


def test_numeric_range_with_term_filter(docs):
    from lucene_ray.pipelines.fulltext import numeric_range_hits

    got = numeric_range_hits(SF, "n_chars", 200, 400, term="join") \
        .column("doc_id").to_pylist()
    want = sorted(
        d for d, (toks, nc) in docs.items() if 200 <= nc <= 400 and "join" in toks
    )
    assert got == want


def test_numeric_range_open_bounds(docs):
    from lucene_ray.pipelines.fulltext import numeric_range_hits

    got = numeric_range_hits(SF, "n_chars", None, 250).column("doc_id").to_pylist()
    want = sorted(d for d, (_, nc) in docs.items() if nc <= 250)
    assert got == want


def test_facet_numeric_ranges(docs):
    from lucene_ray.pipelines.fulltext import facet_numeric_ranges

    t = facet_numeric_ranges(SF, "join", "n_chars", [0, 200, 400])
    labels = t.column("range").to_pylist()
    counts = t.column("n_docs").to_pylist()
    assert labels == ["[0,200)", "[200,400)", "[400,inf)"]
    hits = [d for d, (toks, _) in docs.items() if "join" in toks]
    want = [
        sum(1 for d in hits if 0 <= docs[d][1] < 200),
        sum(1 for d in hits if 200 <= docs[d][1] < 400),
        sum(1 for d in hits if docs[d][1] >= 400),
    ]
    assert counts == want


def test_term_vector(docs):
    from lucene_ray.pipelines.fulltext import term_vector

    t = term_vector(SF, 7)
    toks, _ = docs[7]
    from collections import Counter

    tf = Counter(toks)
    assert t.column("term").to_pylist() == sorted(tf)
    assert t.column("tf").to_pylist() == [tf[x] for x in sorted(tf)]


def test_multi_phrase_alternatives(docs):
    from lucene_ray.pipelines.fulltext import multi_phrase_hits

    got = multi_phrase_hits(SF, [("hash", "merge"), ("join",)]) \
        .column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        hit = any(toks[i] in ("hash", "merge") and i + 1 < len(toks)
                  and toks[i + 1] == "join" for i in range(len(toks)))
        if hit:
            want.append(d)
    assert got == sorted(want)


def test_multi_phrase_single_alts_equals_phrase(docs):
    from lucene_ray.pipelines.fulltext import multi_phrase_hits, phrase_hits

    a = multi_phrase_hits(SF, [("batch",), ("window",)]).column("doc_id").to_pylist()
    b = phrase_hits(SF, ["batch", "window"]).column("doc_id").to_pylist()
    assert a == b


def test_phrase_prefix(docs):
    from lucene_ray.pipelines.fulltext import phrase_prefix_hits

    got = phrase_prefix_hits(SF, ["batch"], "win").column("doc_id").to_pylist()
    want = []
    for d, (toks, _) in docs.items():
        hit = any(toks[i] == "batch" and i + 1 < len(toks)
                  and toks[i + 1].startswith("win") for i in range(len(toks)))
        if hit:
            want.append(d)
    assert got == sorted(want)


def test_common_terms_rare_required(docs):
    from lucene_ray.pipelines.fulltext import common_terms_hits

    got = common_terms_hits(SF, ["the", "dup"], 0.4).column("doc_id").to_pylist()
    # 'the' is common (df > 40%), 'dup' rare -> hit set = docs with 'dup'
    want = sorted(d for d, (toks, _) in docs.items() if "dup" in toks)
    assert got == want


def test_common_terms_all_common_is_conjunction(docs):
    # CommonTermsQuery.java:53 — "if the query only contains high-frequency
    # terms the query is rewritten into a plain conjunction"
    from lucene_ray.pipelines.fulltext import common_terms_hits

    got = common_terms_hits(SF, ["the", "join"], 0.4).column("doc_id").to_pylist()
    want = sorted(d for d, (toks, _) in docs.items()
                  if "the" in toks and "join" in toks)
    assert got == want


def test_common_terms_low_must_occur(docs):
    from lucene_ray.pipelines.fulltext import common_terms_hits

    got = common_terms_hits(
        SF, ["dup", "the", "join"], 0.4, low_freq_occur="MUST"
    ).column("doc_id").to_pylist()
    want = sorted(d for d, (toks, _) in docs.items() if "dup" in toks)
    assert got == want


def test_common_terms_rewrite_unit():
    # pure rewrite: classification, msm rounding, single-term, absent terms
    from lucene_ray.search.query import (BooleanQuery, TermQuery,
                                         common_terms_query)

    dfs = {"a": 90, "b": 5, "c": 4}
    q = common_terms_query(["a", "b", "c"], dfs, 100, 0.5)
    assert isinstance(q, BooleanQuery)
    (low,) = q.must
    (high,) = q.should
    assert [t.term for t in low.should] == ["b", "c"]
    assert [t.term for t in high.should] == ["a"]
    # fractional msm: round(0.5 * 2) = 1 on the low (SHOULD) sub-clause
    q = common_terms_query(["a", "b", "c"], dfs, 100, 0.5, low_freq_msm=0.5)
    assert q.must[0].minimum_should_match == 1
    # absolute max_term_frequency: df > 10 is high
    q = common_terms_query(["a", "b"], dfs, 100, 10.0)
    assert [t.term for t in q.must[0].should] == ["b"]
    # single term bypasses the rewrite entirely
    assert common_terms_query(["a"], dfs, 100, 0.5) == TermQuery("a")
    # absent term classifies low; all-high + absent-low matches nothing
    q = common_terms_query(["a", "zzz"], dfs, 100, 0.5)
    assert [t.term for t in q.must[0].should] == ["zzz"]
