"""Index-time doc blocks (IndexWriter.addDocuments, IndexWriter.java:1520)
+ ToParentBlockJoinQuery (lucene/join/.../ToParentBlockJoinQuery.java):
block_last flags in the docmap, parent mapping, all score modes vs a
brute-force stored-field oracle, and the per-partition block boundary."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import IndexConfig, build_index, docmap_path
from lucene_ray.index.check import check_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import (
    BooleanQuery,
    TermQuery,
    ToParentBlockJoinQuery,
)
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=500, partitions_per_segment=2,
           chunk_size=64, block_col="lang")


@pytest.fixture(scope="module")
def block_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("blk")
    corpus = make_corpus(400, seed=33)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=400)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(**CFG))
    return src, idx


def _brute(term, mode, reader, searcher):
    """Stored-field oracle: group the term's matching docs by lang and
    reduce scores; parent doc = block-last doc of each lang run."""
    hits = searcher.search(TermQuery(term), 10**9, total_hits_threshold=None)
    rows = reader.lookup_docs(hits.doc_ids, columns=["doc_id", "lang"])
    lang_of = dict(zip(rows.column("doc_id").to_pylist(),
                       rows.column("lang").to_pylist()))
    groups: dict[str, list[float]] = {}
    for g, s in zip(hits.doc_ids.tolist(), hits.scores.tolist()):
        groups.setdefault(lang_of[g], []).append(s)
    agg = {}
    for lang, ss in groups.items():
        if mode == "count":
            agg[lang] = float(len(ss))
        elif mode == "max":
            agg[lang] = max(ss)
        elif mode == "total":
            agg[lang] = float(np.add.reduceat(
                np.array(ss, np.float32).astype(np.float64), [0])[0].astype(np.float32))
        elif mode == "avg":
            acc = np.add.reduceat(
                np.array(ss, np.float32).astype(np.float64), [0])[0]
            agg[lang] = float(np.float32(acc / len(ss)))
        else:
            agg[lang] = 1.0
    return agg


def test_docmap_block_last_flags(block_index):
    src, idx = block_index
    r = IndexReader(idx)
    assert r.manifest.config["block_col"] == "lang"
    for p in r.manifest.partitions:
        t = pq.read_table(docmap_path(idx, p["pid"]), columns=["lang", "block_last"])
        langs = t.column("lang").to_pylist()
        flags = t.column("block_last").to_pylist()
        # rows sorted by lang: block_last marks exactly the run boundaries
        want = [
            1 if i == len(langs) - 1 or langs[i + 1] != langs[i] else 0
            for i in range(len(langs))
        ]
        assert flags == want
        assert langs == sorted(langs)


def test_checkindex_clean(block_index):
    _, idx = block_index
    assert check_index(idx)["status"] == "OK"


def test_parents_positions(block_index):
    _, idx = block_index
    r = IndexReader(idx)
    for seg in r.segs:
        parents = r.parents(seg)
        assert parents is not None and len(parents) > 0
        assert parents[-1] == r.num_docs(seg) - 1
        assert (np.diff(parents) > 0).all()


@pytest.mark.parametrize("mode", ["count", "max", "total", "avg", "none"])
def test_blockjoin_matches_bruteforce(block_index, mode):
    _, idx = block_index
    r = IndexReader(idx)
    s = Searcher(r)
    for term in ["import", "return", "def"]:
        td = s.search(ToParentBlockJoinQuery(TermQuery(term), mode), 10**9,
                      total_hits_threshold=None)
        rows = r.lookup_docs(td.doc_ids, columns=["doc_id", "lang", "block_last"])
        assert set(rows.column("block_last").to_pylist()) <= {1}, \
            "block join must return only parent (block-last) docs"
        lang_of = dict(zip(rows.column("doc_id").to_pylist(),
                           rows.column("lang").to_pylist()))
        got = {lang_of[int(g)]: float(sc)
               for g, sc in zip(td.doc_ids, td.scores)}
        want = _brute(term, mode, r, s)
        assert set(got) == set(want)
        for lang in want:
            assert got[lang] == pytest.approx(want[lang], rel=1e-6), (term, mode, lang)


def test_blocks_bounded_by_partition(ray_session, tmp_path_factory):
    """A block key spanning partitions forms one block per partition (as
    Lucene bounds blocks by one addDocuments call): parent count for the
    key equals the number of partitions holding it."""
    d = tmp_path_factory.mktemp("blk2")
    corpus = make_corpus(300, seed=7)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=100)  # -> 3 partitions
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(target_rows_per_partition=100,
                                      partitions_per_segment=4,
                                      chunk_size=64, block_col="lang"))
    r = IndexReader(idx)
    s = Searcher(r)
    td = s.search(ToParentBlockJoinQuery(TermQuery("import"), "count"),
                  10**9, total_hits_threshold=None)
    rows = r.lookup_docs(td.doc_ids, columns=["doc_id", "lang"])
    lang_counts: dict[str, int] = {}
    for lang in rows.column("lang").to_pylist():
        lang_counts[lang] = lang_counts.get(lang, 0) + 1
    # every lang occurs in each of the 3 partitions ('import' is in ~all docs)
    assert set(lang_counts.values()) == {3}
    # per-parent counts still sum to the global per-lang hit counts
    hits = s.search(TermQuery("import"), 10**9, total_hits_threshold=None)
    hrows = r.lookup_docs(hits.doc_ids, columns=["doc_id", "lang"])
    want: dict[str, int] = {}
    for lang in hrows.column("lang").to_pylist():
        want[lang] = want.get(lang, 0) + 1
    got: dict[str, float] = {}
    lang_of = dict(zip(rows.column("doc_id").to_pylist(),
                       rows.column("lang").to_pylist()))
    for g, sc in zip(td.doc_ids, td.scores):
        got[lang_of[int(g)]] = got.get(lang_of[int(g)], 0.0) + float(sc)
    assert {k: int(v) for k, v in got.items()} == want


def test_blockjoin_requires_block_index(built_index):
    idx = built_index[0]
    r = IndexReader(idx)
    s = Searcher(r)
    with pytest.raises(ValueError, match="block_col"):
        s.search(ToParentBlockJoinQuery(TermQuery("import"), "count"), 10)


def test_blockjoin_composes_with_boolean_child(block_index):
    _, idx = block_index
    r = IndexReader(idx)
    s = Searcher(r)
    child = BooleanQuery(must=(TermQuery("import"), TermQuery("return")))
    td = s.search(ToParentBlockJoinQuery(child, "count"), 10**9,
                  total_hits_threshold=None)
    # oracle: children matching BOTH terms, grouped by lang
    both = s.search(child, 10**9, total_hits_threshold=None)
    rows = r.lookup_docs(both.doc_ids, columns=["doc_id", "lang"])
    want: dict[str, int] = {}
    for lang in rows.column("lang").to_pylist():
        want[lang] = want.get(lang, 0) + 1
    prow = r.lookup_docs(td.doc_ids, columns=["doc_id", "lang"])
    lang_of = dict(zip(prow.column("doc_id").to_pylist(),
                       prow.column("lang").to_pylist()))
    got = {lang_of[int(g)]: int(sc) for g, sc in zip(td.doc_ids, td.scores)}
    assert got == want


def test_tochild_matches_bruteforce(block_index):
    """ToChildBlockJoinQuery: each matching block-last parent's score is
    applied to every child of its block (ToChildBlockJoinQuery.java:35)."""
    from lucene_ray.search.query import ToChildBlockJoinQuery

    _, idx = block_index
    reader = IndexReader(idx)
    s = Searcher(reader)
    dm = pq.read_table(docmap_path(idx, 0))
    gids = dm.column("doc_id").to_pylist()
    last = dm.column("block_last").to_pylist()
    blocks, start = [], 0
    for i, fl in enumerate(last):
        if fl:
            blocks.append((start, i))
            start = i + 1
    parent_hits = s.search(TermQuery("import"), 10**9, total_hits_threshold=None)
    pscore = dict(zip(parent_hits.doc_ids.tolist(), parent_hits.scores.tolist()))
    exp = {}
    for a, b in blocks:
        if gids[b] in pscore:  # only block-LAST hits act as parents
            for i in range(a, b):
                exp[gids[i]] = np.float32(pscore[gids[b]])
    td = s.search(ToChildBlockJoinQuery(TermQuery("import")), 10**9,
                  total_hits_threshold=None)
    got = dict(zip(td.doc_ids.tolist(), td.scores.tolist()))
    assert set(got) == set(exp) and len(got) > 0
    for g in exp:
        assert got[g] == pytest.approx(float(exp[g]), rel=1e-6)


def test_tochild_requires_block_index(ray_session, tmp_path_factory):
    from lucene_ray.search.query import ToChildBlockJoinQuery

    d = tmp_path_factory.mktemp("noblk")
    src = str(d / "c.parquet")
    pq.write_table(make_corpus(50, seed=5), src)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(target_rows_per_partition=50))
    with pytest.raises(Exception, match="block_col"):
        Searcher(IndexReader(idx)).search(
            ToChildBlockJoinQuery(TermQuery("merge")), 10,
            total_hits_threshold=None)


def test_parent_children_block_join(block_index):
    """ParentChildrenBlockJoinQuery: children of ONE parent matching the
    child query, child scores (ParentChildrenBlockJoinQuery.java:39)."""
    from lucene_ray.search.query import (
        ParentChildrenBlockJoinQuery,
        ToChildBlockJoinQuery,
    )

    _, idx = block_index
    reader = IndexReader(idx)
    s = Searcher(reader)
    # pick a parent: any hit of the to-parent query
    ptd = s.search(ToParentBlockJoinQuery(TermQuery("import"), "count"),
                   10**9, total_hits_threshold=None)
    assert len(ptd.doc_ids)
    parent = int(ptd.doc_ids[0])

    td = s.search(ParentChildrenBlockJoinQuery(parent, TermQuery("import")),
                  10**9, total_hits_threshold=None)
    # brute: child hits inside that parent's block
    child = s.search(TermQuery("import"), 10**9, total_hits_threshold=None)
    dm = pq.read_table(docmap_path(idx, 0))
    gids = dm.column("doc_id").to_pylist()
    last = dm.column("block_last").to_pylist()
    blocks, start = [], 0
    for i, fl in enumerate(last):
        if fl:
            blocks.append((start, i))
            start = i + 1
    want = {}
    cmap = dict(zip(child.doc_ids.tolist(), child.scores.tolist()))
    for a, b in blocks:
        if gids[b] == parent:
            for i in range(a, b):
                if gids[i] in cmap:
                    want[gids[i]] = cmap[gids[i]]
    got = dict(zip(td.doc_ids.tolist(), td.scores.tolist()))
    assert set(got) == set(want) and len(got) > 0 or not want
    for g, sc in got.items():
        assert sc == pytest.approx(float(want[g]), rel=1e-6)
    # a non-parent doc id yields no hits
    non_parent = next(g for g in gids if g not in {gids[b] for _, b in blocks})
    empty = s.search(ParentChildrenBlockJoinQuery(int(non_parent),
                                                  TermQuery("import")),
                     10**9, total_hits_threshold=None)
    assert len(empty.doc_ids) == 0
