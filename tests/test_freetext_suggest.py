"""FreeTextSuggester analog: bigram adjacency must not cross doc
boundaries, and stupid-backoff ordering is (bigram branch first)."""
import numpy as np

from lucene_ray.pipelines.fulltext import FREETEXT_ALPHA, freetext_suggest

SF = "/root/testdata/sf0.001"


def test_freetext_ranking_and_backoff(ray_session):
    out = freetext_suggest(SF, context="hash", prefix="s", k=10)
    terms = out.column("term").to_pylist()
    scores = out.column("score_r9").to_pylist()
    assert len(terms) == len(set(terms))
    # ranked score desc, term asc on ties
    for i in range(1, len(scores)):
        assert (scores[i] < scores[i - 1]
                or (scores[i] == scores[i - 1] and terms[i] > terms[i - 1]))
    assert all(t.startswith("s") for t in terms)


def test_freetext_bigram_no_doc_crossing(ray_session):
    # a context token that only ever appears doc-FINAL can't have any
    # bigram continuation: every candidate must be a pure backoff score
    from lucene_ray.pipelines.fulltext import _freetext_lm

    uni, bi, total = _freetext_lm(SF)
    # verify the model itself: every bigram's parts exist as unigrams
    for g in list(bi)[:200]:
        a, b = g.split(" ")
        assert a in uni and b in uni
    # backoff formula spot-check against the raw counts
    out = freetext_suggest(SF, context="zzz_no_such_ctx", prefix="s", k=3)
    for t, s in zip(out.column("term").to_pylist(),
                    out.column("score_r9").to_pylist()):
        expect = FREETEXT_ALPHA * (np.float64(uni[t]) / np.float64(total))
        assert abs(s - expect) < 1e-9
