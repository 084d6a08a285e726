"""kNN classifier (classification module analog) + QueryRescorer arithmetic."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_knn_classify_invariants(ray_session, sf):
    from lucene_ray.ops.classify import knn_classify
    from lucene_ray.pipelines.mlt import more_like_this_topk

    t = knn_classify(sf, 7, 10)
    neighbors = more_like_this_topk(sf, 7, 10)
    assert int(np.sum(t.column("n_neighbors"))) == len(neighbors)
    scores = np.asarray(t.column("score_r6"))
    # final scores = boost/sumdoc sum to (sum of score/maxScore)/sumdoc <= 1
    assert 0 < scores.sum() <= 1.0 + 1e-6
    # ranked descending, rank-1 is the argmax
    assert np.all(np.diff(scores) <= 0)
    ranks = t.column("rank").to_pylist()
    assert ranks == list(range(1, len(ranks) + 1))


def test_knn_classify_hand_combine(ray_session, sf):
    """Recompute the Java combine from the raw MLT neighbors."""
    import pyarrow.parquet as pq

    from lucene_ray.ops.classify import knn_classify
    from lucene_ray.pipelines.mlt import more_like_this_topk

    nb = more_like_this_topk(sf, 7, 10)
    ids = np.asarray(nb.column("doc_id"), dtype=np.int64)
    sc = np.asarray(nb.column("score"), dtype=np.float32)
    lang = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    lm = dict(zip(lang.column("doc_id").to_pylist(),
                  lang.column("lang").to_pylist()))
    sb = (sc / sc[0]).astype(np.float64)
    boosts = {}
    for i, d in enumerate(ids):
        boosts[lm[int(d)]] = boosts.get(lm[int(d)], 0.0) + sb[i]
    expect = {c: round(b / len(ids), 6) for c, b in boosts.items()}
    got = dict(zip(knn_classify(sf, 7, 10).column("class").to_pylist(),
                   knn_classify(sf, 7, 10).column("score_r6").to_pylist()))
    assert got == pytest.approx(expect)


def test_query_rescore_combine(ray_session, sf):
    """combined = (float)(first + weight * second) for window docs; docs
    outside the first-pass window never appear even if they score higher."""
    from lucene_ray.pipelines.fulltext import documents_index
    from lucene_ray.pipelines.rescore import query_rescore_topk
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    reader = documents_index(sf)
    s = Searcher(reader)
    window = 15
    first = s.search(TermQuery("join"), window, total_hits_threshold=None)
    second = s.search(TermQuery("hash"), 10**6, total_hits_threshold=None)
    m2 = dict(zip(map(int, second.doc_ids), second.scores))
    comb = {}
    for g, sc in zip(map(int, first.doc_ids), first.scores):
        v = np.float64(sc)
        if g in m2:
            v = v + 2.0 * np.float64(m2[g])
        comb[g] = np.float32(v)
    t = query_rescore_topk(sf, "join", "hash", 2.0, window, 10)
    # map orig doc ids back to gids via docmap for comparison
    dm = reader.lookup_docs(first.doc_ids, columns=["doc_id", "doc_id_orig"])
    orig2gid = dict(zip(dm.column("doc_id_orig").to_pylist(),
                        dm.column("doc_id").to_pylist()))
    got = list(zip(t.column("doc_id").to_pylist(), t.column("score").to_pylist()))
    exp_sorted = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for (orig, score), (gid, esc) in zip(got, exp_sorted):
        assert orig2gid[orig] == gid
        assert np.float32(score) == esc
