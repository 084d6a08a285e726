"""Boolean FILTER clauses, ConstantScoreQuery, NumericSetQuery."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    tok = CodeTokenizer()
    return {
        did: (set(tok(text)), nc)
        for did, text, nc in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    }


def _searcher():
    from lucene_ray.pipelines.fulltext import documents_index
    from lucene_ray.search.searcher import Searcher

    return Searcher(documents_index(SF))


def test_filter_clause_restricts_without_scoring(docs):
    """BooleanQuery.filter: same hit set as MUST but contributes 0 score
    (BooleanClause.Occur.FILTER)."""
    from lucene_ray.search.query import BooleanQuery, TermQuery

    s = _searcher()
    scored = s.search(
        BooleanQuery(must=[TermQuery("join")], filter=[TermQuery("hash")]),
        k=10_000,
    )
    plain = s.search(TermQuery("join"), k=10_000)
    plain_scores = dict(zip((int(d) for d in plain.doc_ids), plain.scores))
    both = s.search(
        BooleanQuery(must=[TermQuery("join"), TermQuery("hash")]), k=10_000
    )
    # hit set identical to MUST join AND hash
    assert sorted(int(d) for d in scored.doc_ids) == sorted(int(d) for d in both.doc_ids)
    # but score == the join TermQuery score alone (filter adds nothing)
    for d, sc in zip(scored.doc_ids, scored.scores):
        assert np.float32(sc) == np.float32(plain_scores[int(d)])


def test_filter_only_query_is_constant_zero_like_lucene(docs):
    """A BooleanQuery with only FILTER clauses matches but scores 0."""
    from lucene_ray.search.query import BooleanQuery, TermQuery

    s = _searcher()
    td = s.search(BooleanQuery(filter=[TermQuery("join")]), k=10_000)
    plain = s.search(TermQuery("join"), k=10_000)
    assert sorted(int(d) for d in td.doc_ids) == sorted(int(d) for d in plain.doc_ids)
    assert all(np.float32(x) == np.float32(0.0) for x in td.scores)


def test_constant_score_query(docs):
    from lucene_ray.search.query import BooleanQuery, ConstantScoreQuery, TermQuery

    s = _searcher()
    td = s.search(ConstantScoreQuery(TermQuery("join"), boost=2.5), k=10_000)
    plain = s.search(TermQuery("join"), k=10_000)
    assert sorted(int(d) for d in td.doc_ids) == sorted(int(d) for d in plain.doc_ids)
    assert all(np.float32(x) == np.float32(2.5) for x in td.scores)
    # wraps composite queries too
    td2 = s.search(
        ConstantScoreQuery(BooleanQuery(must=[TermQuery("join"), TermQuery("hash")])),
        k=10_000,
    )
    both = s.search(BooleanQuery(must=[TermQuery("join"), TermQuery("hash")]), k=10_000)
    assert sorted(int(d) for d in td2.doc_ids) == sorted(int(d) for d in both.doc_ids)
    assert all(np.float32(x) == np.float32(1.0) for x in td2.scores)


def test_numeric_set_query(docs):
    from lucene_ray.pipelines.fulltext import _all_matches, _orig_ids
    from lucene_ray.search.query import NumericSetQuery

    values = [250, 301, 999]
    got = _orig_ids(SF, _all_matches(SF, NumericSetQuery("n_chars", values))) \
        .column("doc_id").to_pylist()
    want = sorted(d for d, (_, nc) in docs.items() if nc in values)
    assert got == want


def test_numeric_set_query_in_boolean(docs):
    from lucene_ray.pipelines.fulltext import _all_matches, _orig_ids
    from lucene_ray.search.query import BooleanQuery, NumericSetQuery, TermQuery

    q = BooleanQuery(must=[TermQuery("join")],
                     filter=[NumericSetQuery("n_chars", list(range(200, 401)))])
    got = _orig_ids(SF, _all_matches(SF, q)).column("doc_id").to_pylist()
    want = sorted(
        d for d, (toks, nc) in docs.items() if "join" in toks and 200 <= nc <= 400
    )
    assert got == want
