"""MoreLikeThis (pipelines/mlt.py): term selection + hit set + scored top-k."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mlt(ray_session):
    from lucene_ray.pipelines import mlt as m

    return m


def test_interesting_terms_thresholds_and_order(mlt):
    t = mlt.interesting_terms(SF, 7)
    assert 0 < t.num_rows <= mlt.DEFAULT_MAX_QUERY_TERMS
    tfs = t.column("tf").to_pylist()
    dfs = t.column("df").to_pylist()
    scores = t.column("score").to_pylist()
    terms = t.column("term").to_pylist()
    assert all(f >= mlt.DEFAULT_MIN_TERM_FREQ for f in tfs)
    assert all(d >= mlt.DEFAULT_MIN_DOC_FREQ for d in dfs)
    # (score desc, term asc) ordering
    key = list(zip([-s for s in scores], terms))
    assert key == sorted(key)
    # deterministic across calls
    assert mlt.interesting_terms(SF, 7).equals(t)


def test_interesting_terms_max_query_terms(mlt):
    t = mlt.interesting_terms(SF, 7, max_query_terms=3)
    assert t.num_rows == 3
    full = mlt.interesting_terms(SF, 7)
    assert t.column("term").to_pylist() == full.column("term").to_pylist()[:3]


def test_mlt_hits_excludes_source_and_matches_union(mlt):
    hits = mlt.more_like_this_hits(SF, 7)
    ids = hits.column("doc_id").to_pylist()
    assert 7 not in ids
    assert ids == sorted(ids)
    # every hit contains at least one selected term: spot-check via the
    # engine's own term hit sets
    from lucene_ray.pipelines.fulltext import term_hits

    sel = mlt.interesting_terms(SF, 7).column("term").to_pylist()
    union = set()
    for t in sel:
        union |= set(term_hits(SF, t).column("doc_id").to_pylist())
    union.discard(7)
    assert set(ids) == union


def test_mlt_topk_scored(mlt):
    t = mlt.more_like_this_topk(SF, 7, k=10)
    assert t.num_rows == 10
    ids = t.column("doc_id").to_pylist()
    assert 7 not in ids
    s = np.asarray(t.column("score"))
    assert np.all(s[:-1] >= s[1:])  # descending scores
