"""Block-max pruning conformance (TestBlockMaxConjunction / TestWANDScorer
pattern): the pruned engine must return rank-identical doc ids and
float-equal scores vs the unpruned path; total_hits may only degrade to a
valid lower bound (TotalHits GTE relation)."""

import numpy as np
import pytest

from lucene_ray.fixtures import make_vocab, query_to_ast, reference_queries
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import BooleanQuery, TermQuery
from lucene_ray.search.searcher import Searcher


@pytest.fixture(scope="module")
def searcher(built_index):
    index_dir, _, _ = built_index
    return Searcher(IndexReader(index_dir))


def assert_rank_identical(searcher, q, k=10):
    exact = searcher.search(q, k, total_hits_threshold=None)
    # pruned call on a FRESH Searcher: a cold decoded-postings cache keeps
    # the chunk-skipping paths engaged (a warm cache legitimately routes
    # already-decoded terms to whole-array scoring — not what we test here)
    pruned = Searcher(searcher.reader).search(q, k, total_hits_threshold=1)
    np.testing.assert_array_equal(pruned.doc_ids, exact.doc_ids, err_msg=str(q))
    np.testing.assert_array_equal(pruned.scores, exact.scores, err_msg=str(q))
    assert pruned.total_hits <= exact.total_hits
    if pruned.exact_total:
        assert pruned.total_hits == exact.total_hits


@pytest.mark.parametrize("spec", [s for s in reference_queries()
                                  if s["type"] in ("term", "and", "or")],
                         ids=lambda s: f"q{s['qid']}")
def test_reference_queries_pruned(searcher, spec):
    assert_rank_identical(searcher, query_to_ast(spec))


def test_random_pruned_queries(searcher):
    rng = np.random.default_rng(11)
    vocab = make_vocab()
    for trial in range(25):
        n = int(rng.integers(1, 5))
        terms = [vocab[int(i)] for i in rng.integers(0, 300, n)]  # head-heavy
        if trial % 2 == 0:
            q = BooleanQuery(should=[TermQuery(t) for t in terms])
        else:
            q = BooleanQuery(must=[TermQuery(t) for t in terms])
        assert_rank_identical(searcher, q, k=int(rng.integers(1, 20)))


def test_default_threshold_is_exact_below_1000(searcher):
    # corpus has 1000 docs; hit counts < 1000 stay exact under the Lucene
    # default threshold
    td = searcher.search(query_to_ast({"type": "term", "q": "import"}), 10,
                         total_hits_threshold=1000)
    td_exact = searcher.search(query_to_ast({"type": "term", "q": "import"}), 10)
    assert td.total_hits == td_exact.total_hits


def test_pruning_actually_skips_chunks(built_index):
    """White-box: with an aggressive threshold the impact-ordered term path
    must decode fewer chunks than exist (on a skewed hot term)."""
    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    s = Searcher(reader)
    q = TermQuery("import")
    all_terms, scorers, ph, pf = s.plan(q)
    seg = reader.segs[0]
    ss = s.segment_scorer(seg, all_terms, scorers, ph, pf, False)
    recs = ss.ctx.chunks.get("import")
    if not recs or len(recs) < 2:
        pytest.skip("hot term not chunked in this segment")
    res = ss._topk_term_impact_ordered("import", 1, 1)
    decoded_docs = res.total
    total_docs = sum(r.count for r in recs)
    assert decoded_docs <= total_docs
