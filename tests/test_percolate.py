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
