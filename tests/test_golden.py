"""Golden conformance (FIXTURES.md F3): the engine must reproduce the
committed oracle-generated (doc, float32 score) lists exactly — guards
against silent scoring/codec/tie-break drift across refactors."""

import json
import os

import numpy as np

from lucene_ray.fixtures import query_to_ast, reference_queries
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.searcher import Searcher

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_f3.json")


def test_engine_matches_committed_golden(built_index):
    index_dir, _, _ = built_index
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert golden["n_rows"] == 1000
    searcher = Searcher(IndexReader(index_dir))
    by_qid = {g["qid"]: g for g in golden["queries"]}
    for spec in reference_queries():
        g = by_qid[spec["qid"]]
        td = searcher.search(query_to_ast(spec), 10)
        assert td.total_hits == g["total"], spec
        got_docs = [int(d) for d in td.doc_ids]
        got_scores = [float(np.float32(s)) for s in td.scores]
        exp_docs = [h["doc"] for h in g["hits"]]
        exp_scores = [h["score"] for h in g["hits"]]
        assert got_docs == exp_docs, spec
        assert got_scores == exp_scores, spec
