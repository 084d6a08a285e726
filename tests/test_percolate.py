"""Percolator: registered queries vs a doc stream, checked against the
per-doc exhaustive oracle (the MemoryIndex pattern)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.pipelines.percolate import percolate
from lucene_ray.search.oracle import ExhaustiveOracle
from lucene_ray.search.query import (
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)

TEXTS = [
    "alpha beta gamma delta",
    "beta gamma",
    "alpha zeta",
    "the quick brown fox",
    "alpha beta quick",
    "",
    "gamma alpha beta gamma",
]

QUERIES = [
    ("q_term", TermQuery("alpha")),
    ("q_bool", BooleanQuery(must=[TermQuery("alpha"), TermQuery("beta")])),
    ("q_not", BooleanQuery(should=[TermQuery("gamma")], must_not=[TermQuery("alpha")])),
    ("q_phrase", PhraseQuery(("alpha", "beta"))),
    ("q_sloppy", PhraseQuery(("alpha", "gamma"), slop=2)),
    ("q_prefix", PrefixQuery("qui")),
    ("q_wild", WildcardQuery("z?ta")),
    ("q_parsed", "beta AND gamma"),
]


def test_percolate_matches_oracle(ray_session):
    tbl = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = percolate(ds, QUERIES).to_pandas()
    got = {(int(r["doc_id"]), r["query"]) for _, r in out.iterrows()}

    oracle = ExhaustiveOracle(list(enumerate(TEXTS)))
    from lucene_ray.search.query import parse_query

    exp = set()
    for name, q in QUERIES:
        qq = parse_query(q) if isinstance(q, str) else q
        ids, _, _ = oracle.search(qq, 10**9)
        for d in ids:
            exp.add((int(d), name))
    assert got == exp
    # sanity on a few specific expectations
    assert (0, "q_phrase") in got
    assert (1, "q_not") in got and (6, "q_not") not in got
    assert (2, "q_wild") in got


def test_presearcher_prunes_registered_queries():
    """With 1,000 registered queries, a batch only evaluates the ones whose
    anchor terms appear in the batch (plus unbounded ones) — the Monitor
    presearcher contract (Presearcher.java:33). Results must equal
    evaluating everything."""
    from lucene_ray.pipelines.percolate import Percolator, query_anchors

    batch = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })
    # 992 queries over terms the batch never contains + the 8 real ones
    many = [(f"q_absent_{i}", TermQuery(f"absentterm{i}")) for i in range(992)]
    many += QUERIES
    p = Percolator(many)
    out = p(batch)
    # pruning engaged: only the 8 real queries could be candidates, and the
    # two multi-term ones (prefix/wildcard) are unbounded -> always run
    assert p.last_evaluated <= len(QUERIES)
    assert p.last_evaluated >= 2
    # matches identical to a percolator registered with ONLY the real queries
    baseline = Percolator(list(QUERIES))(batch)
    got = set(zip(out["doc_id"].to_pylist(), out["query"].to_pylist()))
    want = set(zip(baseline["doc_id"].to_pylist(), baseline["query"].to_pylist()))
    assert got == want


def test_query_anchors_invariant():
    from lucene_ray.pipelines.percolate import query_anchors
    from lucene_ray.search.query import (
        ConstantScoreQuery,
        DisMaxQuery,
        MatchAllQuery,
        SpanNearQuery,
        SpanTermQuery,
    )

    assert query_anchors(TermQuery("x")) == {"x"}
    assert query_anchors(PhraseQuery(("a", "b"))) == {"a"}
    assert query_anchors(BooleanQuery(must=[TermQuery("a"), TermQuery("b")])) in ({"a"}, {"b"})
    assert query_anchors(
        BooleanQuery(should=[TermQuery("a"), TermQuery("b")])
    ) == {"a", "b"}
    # a disjunction containing an unbounded clause is unbounded
    assert query_anchors(
        BooleanQuery(should=[TermQuery("a"), PrefixQuery("p")])
    ) is None
    # must_not alone can't bound
    assert query_anchors(BooleanQuery(must_not=[TermQuery("a")])) is None
    assert query_anchors(MatchAllQuery()) is None
    assert query_anchors(WildcardQuery("a*")) is None
    assert query_anchors(DisMaxQuery([TermQuery("a"), TermQuery("b")])) == {"a", "b"}
    assert query_anchors(
        SpanNearQuery([SpanTermQuery("a"), SpanTermQuery("b")], slop=1)
    ) in ({"a"}, {"b"})
    assert query_anchors(ConstantScoreQuery(TermQuery("a"))) == {"a"}
