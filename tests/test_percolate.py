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


def test_percolate_scored_one_doc_bm25(ray_session):
    """Scored percolation: one-doc BM25 (N=1, df=1) — score(f) =
    w - w/(1 + f/k1) with w = (float)ln(4/3), phrase weight doubled."""
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data

    from lucene_ray.pipelines.percolate import percolate

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["join join hash", "batch window batch window", "scan only"],
    }))
    regs = [("hj", "join"), ("jh", "join AND hash"),
            ("pb", '"batch window"'), ("sn", "scan NOT join")]
    t = pa.Table.from_pandas(
        percolate(ds, regs, scored=True).to_pandas(), preserve_index=False)
    rows = {(r["doc_id"], r["query"]): r["score"] for r in t.to_pylist()}
    w = np.float32(math.log(1 + 0.5 / 1.5))
    k1inv = np.float32(1.0) / np.float32(1.2)

    def s(f, weight=w):
        return np.float32(weight - weight / (np.float32(1.0)
                                             + np.float32(f) * k1inv))

    assert rows[(1, "hj")] == s(2)
    assert rows[(1, "jh")] == np.float32(s(2) + s(1))
    w2 = np.float32(2 * float(w))
    assert rows[(2, "pb")] == s(2, w2)  # two adjacent batch-window pairs
    assert rows[(3, "sn")] == s(1)
    assert (1, "sn") not in rows and (2, "hj") not in rows


def test_shard_pool_refresh(ray_session, tmp_path):
    """SearcherManager.maybeRefresh analog: the pool serves NEW docs after
    add_documents + refresh, and refresh is a no-op on unchanged indexes."""
    import pyarrow.parquet as pq

    from lucene_ray.fixtures import make_corpus
    from lucene_ray.index.build import IndexConfig, add_documents, build_index
    from lucene_ray.pipelines.bulk_search import ShardPool
    from lucene_ray.search.query import TermQuery

    corpus = make_corpus(200, seed=13)
    pq.write_table(corpus.slice(0, 120), str(tmp_path / "a.parquet"))
    pq.write_table(corpus.slice(120), str(tmp_path / "b.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "a.parquet"), idx, IndexConfig(
        target_rows_per_partition=60, partitions_per_segment=1))
    pool = ShardPool(idx, concurrency=2)
    before = pool.search([(0, TermQuery("import"))], 10**6,
                         total_hits_threshold=None)[0].total_hits
    assert pool.refresh() is False  # unchanged generation

    add_documents(idx, str(tmp_path / "b.parquet"))
    assert pool.refresh() is True
    after = pool.search([(0, TermQuery("import"))], 10**6,
                        total_hits_threshold=None)[0].total_hits
    import re

    texts = corpus.column("content").to_pylist()
    exp_all = sum(1 for t in texts
                  if "import" in re.split(r"[^a-z0-9_]+", t.lower()))
    exp_a = sum(1 for t in texts[:120]
                if "import" in re.split(r"[^a-z0-9_]+", t.lower()))
    assert before == exp_a and after == exp_all
