"""Hierarchical taxonomy facets: ancestor-prefix keyword terms, per-level
counts and any-depth drill-down, checked against a pandas oracle."""

from collections import Counter

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle(ray_session):
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    t = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    tok = CodeTokenizer()
    rows = []
    for did, text, lang, source, nc in zip(*(t.column(c).to_pylist() for c in
                                             ["doc_id", "text", "lang", "source", "n_chars"])):
        cat = f"{source}/{lang}/{'long' if nc >= 300 else 'short'}"
        rows.append((did, set(tok(text)), cat))
    return rows


def test_facet_path_counts(oracle):
    from lucene_ray.pipelines.fulltext import facet_path_counts

    got = facet_path_counts(SF, "join")
    want: Counter = Counter()
    for _did, toks, cat in oracle:
        if "join" in toks:
            segs = cat.split("/")
            for L in range(1, 4):
                want["/".join(segs[:L])] += 1
    gm = dict(zip(got.column("path").to_pylist(), got.column("n_docs").to_pylist()))
    assert gm == dict(want)
    # every level is present: depth-1 roots, depth-2, depth-3 leaves
    depths = {p.count("/") for p in gm}
    assert depths == {0, 1, 2}


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_drilldown_path_any_depth(oracle, depth):
    from lucene_ray.pipelines.fulltext import drilldown_path_hits

    # pick the first cat of a doc matching the term, truncated to depth
    full = next(cat for _d, toks, cat in oracle if "join" in toks)
    path = "/".join(full.split("/")[:depth])
    got = drilldown_path_hits(SF, "join", path).column("doc_id").to_pylist()
    want = sorted(d for d, toks, cat in oracle
                  if "join" in toks and (cat + "/").startswith(path + "/"))
    assert got == want
