"""Multi-term query family + searchAfter paging vs the exhaustive oracle."""

import numpy as np
import pytest

from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
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


QUERIES = [
    WildcardQuery("uniq_*"),
    WildcardQuery("im?ort"),
    WildcardQuery("*turn"),
    RegexpQuery("uniq_[0-9]+"),
    RegexpQuery("(def|class)"),
    # leading literal run followed by a quantifier: the seek prefix must
    # drop the quantified char or hits like 'iport'/'retrn' are missed
    RegexpQuery("im?port"),
    RegexpQuery("retur*n"),
    RegexpQuery("uniq_?[0-9]+"),
    FuzzyQuery("improt", 2),
    FuzzyQuery("return", 1),
    TermRangeQuery("import", "int"),
    TermRangeQuery("a", "c", include_upper=False),
    TermRangeQuery(None, "class"),
    BooleanQuery(must=[TermQuery("import"), WildcardQuery("uniq_1*")]),
    # boost folded into the weight (weight = boost*idf), engine vs oracle
    TermQuery("import", boost=2.5),
    BooleanQuery(should=[TermQuery("import", boost=0.3), TermQuery("return")]),
    # sloppy phrases: scored sloppyFreq path vs the scalar oracle
    PhraseQuery(("import", "return"), slop=2),
    PhraseQuery(("def", "self"), slop=1),
    PhraseQuery(("import", "def", "return"), slop=4),
    PhraseQuery(("import", "return"), slop=2, boost=1.7),
    BooleanQuery(must=[PhraseQuery(("import", "return"), slop=3), TermQuery("def")]),
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: type(q).__name__ + "-" + str(hash(q) % 10**6))
def test_multiterm_vs_oracle(searcher, oracle, q):
    got = searcher.search(q, 10)
    exp_ids, exp_scores, exp_total = oracle.search(q, 10)
    assert got.total_hits == exp_total, q
    np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=str(q))
    np.testing.assert_array_equal(got.scores, exp_scores, err_msg=str(q))


def test_search_after_pages_through_everything(searcher, oracle):
    q = TermQuery("return")
    full_ids, full_scores, total = oracle.search(q, 10**9)
    paged_ids, paged_scores = [], []
    after = None
    while True:
        td = searcher.search(q, 7, after=after)
        if len(td.doc_ids) == 0:
            break
        paged_ids.extend(int(d) for d in td.doc_ids)
        paged_scores.extend(td.scores)
        after = (float(td.scores[-1]), int(td.doc_ids[-1]))
    np.testing.assert_array_equal(np.array(paged_ids, dtype=np.uint64), full_ids)
    np.testing.assert_array_equal(np.array(paged_scores, dtype=np.float32), full_scores)


def test_count(searcher, oracle):
    for q in [TermQuery("import"), WildcardQuery("uniq_*"),
              BooleanQuery(must=[TermQuery("def"), TermQuery("class")])]:
        assert searcher.count(q) == oracle.search(q, 1)[2]


def test_spellcheck_ranking(ray_session):
    """DirectSpellChecker shape: dist asc, then df desc, then term asc;
    the typed term itself excluded; max two edits."""
    from lucene_ray.pipelines.fulltext import spell_correct

    t = spell_correct("/root/testdata/sf0.001", "par", k=5, max_edits=2)
    terms = t.column("term").to_pylist()
    dists = t.column("dist").to_pylist()
    assert terms[0] == "part" and dists[0] == 1
    assert "par" not in terms
    assert dists == sorted(dists)
    # within equal distance, doc_freq non-increasing
    dfs = t.column("doc_freq").to_pylist()
    for i in range(1, len(t)):
        if dists[i] == dists[i - 1]:
            assert dfs[i] <= dfs[i - 1]
