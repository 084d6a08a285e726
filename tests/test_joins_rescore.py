"""join_to_parent score modes + expression ranking, against scalar oracles
computed from the engine's own exhaustive search results."""

import numpy as np
import pytest

from lucene_ray.pipelines import fulltext as ft
from lucene_ray.pipelines.joins import join_to_parent
from lucene_ray.pipelines.rescore import expression_rescore, expression_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(ray_session):
    return ft.documents_index(SF)


def _child_hits_with_scores(reader, query):
    from lucene_ray.search.query import parse_query
    from lucene_ray.search.searcher import Searcher

    td = Searcher(reader).search(parse_query(query), 10**9, total_hits_threshold=None)
    rows = reader.lookup_docs(td.doc_ids, columns=["doc_id", "lang"])
    m = dict(zip(rows.column("doc_id").to_pylist(), rows.column("lang").to_pylist()))
    return [(m[int(g)], float(s)) for g, s in zip(td.doc_ids, td.scores)]


@pytest.mark.parametrize("mode", ["none", "avg", "max", "total"])
def test_join_to_parent_score_modes(ray_session, reader, mode):
    out = join_to_parent(SF, "join", parent_col="lang", score_mode=mode).to_pandas()
    pairs = _child_hits_with_scores(reader, "join")
    exp: dict[str, list[float]] = {}
    for p, s in pairs:
        exp.setdefault(p, []).append(s)
    assert sorted(out["parent"]) == sorted(exp)
    for _, r in out.iterrows():
        scores = exp[r["parent"]]
        assert r["n_children"] == len(scores)
        if mode == "none":
            assert "score" not in out.columns
        else:
            want = {"avg": np.mean(scores), "max": np.max(scores),
                    "total": np.sum(scores)}[mode]
            assert abs(r["score"] - round(want, 6)) < 1e-5


def test_expression_topk_matches_manual(ray_session, reader):
    out = expression_topk(SF, "log(length + 1) + (doc_id % 7) * 0.01", k=10).to_pandas()
    # manual oracle over the docmap
    t = reader.docmap_table(columns=["doc_id_orig", "length"]).to_pandas()
    vals = np.log(t["length"].astype(float) + 1) + (t["doc_id_orig"] % 7) * 0.01
    order = np.lexsort((t["doc_id_orig"].to_numpy(), -vals.to_numpy()))[:10]
    assert list(out["doc_id"]) == list(t["doc_id_orig"].to_numpy()[order])
    np.testing.assert_allclose(
        out["expr_value"], np.round(vals.to_numpy()[order], 6), atol=1e-6
    )


def test_expression_rescore_uses_score_and_docvalues(ray_session, reader):
    out = expression_rescore(
        SF, "join", "_score * 0.5 + log(length + 1)", k=5, window=50
    ).to_pandas()
    assert len(out) == 5
    assert list(out["rank"]) == [1, 2, 3, 4, 5]
    # values are descending
    v = out["expr_value"].to_numpy()
    assert (np.diff(v) <= 1e-9).all()
