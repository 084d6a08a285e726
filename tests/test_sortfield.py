"""Query-time sort-by-field, hit counting, grouped BM25 top-k."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "n_chars", "lang"])
    tok = CodeTokenizer()
    return {
        did: (set(tok(text)), nc, lg)
        for did, text, nc, lg in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist(),
            t.column("n_chars").to_pylist(), t.column("lang").to_pylist(),
        )
    }


def test_sort_by_field_topk(docs):
    from lucene_ray.pipelines.fulltext import sort_by_field_topk

    got = sort_by_field_topk(SF, "join", "n_chars", 10)
    hits = [(nc, d) for d, (toks, nc, _) in docs.items() if "join" in toks]
    want = sorted(hits, key=lambda x: (-x[0], x[1]))[:10]
    assert got.column("doc_id").to_pylist() == [d for _, d in want]
    assert got.column("n_chars").to_pylist() == [nc for nc, _ in want]


def test_sort_by_field_ascending(docs):
    from lucene_ray.pipelines.fulltext import sort_by_field_topk

    got = sort_by_field_topk(SF, "scan", "n_chars", 5, reverse=False)
    hits = [(nc, d) for d, (toks, nc, _) in docs.items() if "scan" in toks]
    want = sorted(hits, key=lambda x: (x[0], x[1]))[:5]
    assert got.column("doc_id").to_pylist() == [d for _, d in want]


def test_hit_count(docs):
    from lucene_ray.pipelines.fulltext import hit_count

    got = hit_count(SF, "join OR hash").column("n_hits")[0].as_py()
    want = sum(1 for toks, _, _ in docs.values() if "join" in toks or "hash" in toks)
    assert got == want


def test_grouped_bm25_topk(docs):
    from lucene_ray.pipelines.fulltext import documents_index, grouped_bm25_topk
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    got = grouped_bm25_topk(SF, "join", "lang", 2)
    langs = got.column("lang").to_pylist()
    ids = got.column("doc_id").to_pylist()
    ranks = got.column("rank").to_pylist()
    scores = got.column("score").to_pylist()
    # group membership + per-group size cap
    for d, lg in zip(ids, langs):
        assert docs[d][2] == lg and "join" in docs[d][0]
    assert all(langs.count(g) <= 2 for g in set(langs))
    # within each group, rank order descends by score
    for g in set(langs):
        sel = [i for i, x in enumerate(langs) if x == g]
        assert [ranks[i] for i in sel] == list(range(1, len(sel) + 1))
        ss = [scores[i] for i in sel]
        assert all(a >= b for a, b in zip(ss, ss[1:]))
    # rank-1 per group is that group's best global-rank doc
    reader = documents_index(SF)
    td = Searcher(reader).search(TermQuery("join"),
                                 k=reader.collection_stats().doc_count)
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("doc_id_orig").to_pylist()))
    best = {}
    for gid in td.doc_ids:  # (score desc, doc asc) order
        o = m[int(gid)]
        g = docs[o][2]
        best.setdefault(g, o)
    for g in set(langs):
        first = [ids[i] for i, x in enumerate(langs) if x == g][0]
        assert first == best[g]


def test_numeric_range_zone_map_pruning(built_index):
    """numeric_range_docs must skip row groups whose min/max stats exclude
    the range, and return exactly the full-scan hit set."""
    import numpy as np

    from lucene_ray.index.reader import IndexReader

    index_dir, _, _ = built_index
    reader = IndexReader(index_dir)
    seg = reader.segs[0]
    # 'doc_id' ((pid<<32)|offset) ascends across the segment's docmap
    # files, so a range inside the FIRST pid's ids must skip the others
    full = reader.docvalues(seg, "doc_id").astype(np.uint64)
    lo, hi = int(full[0]), int(full[min(10, len(full) - 1)])
    stats: dict = {}
    got = reader.numeric_range_docs(seg, "doc_id", lo, hi, stats=stats)
    want = np.flatnonzero((full >= lo) & (full <= hi))
    np.testing.assert_array_equal(got, want)
    assert stats["chunks"] >= 2, "fixture segment should span several files"
    assert stats["read"] < stats["chunks"], (stats, "no chunks were skipped")
    # unbounded side still exact
    got2 = reader.numeric_range_docs(seg, "doc_id", None, hi)
    np.testing.assert_array_equal(got2, np.flatnonzero(full <= hi))
