"""End-to-end build + rank-identical search vs the exhaustive oracle.

The CheckHits pattern (SURVEY §5): the engine (compressed, chunked, salted,
multi-segment) must return the SAME doc ids in the SAME order with
float-equal scores as an independent exhaustive scorer, for every reference
query (FIXTURES.md F2/F3).
"""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import query_to_ast, reference_queries
from lucene_ray.index.manifest import Manifest
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.oracle import ExhaustiveOracle
from lucene_ray.search.searcher import Searcher


@pytest.fixture(scope="module")
def oracle(built_index):
    _, manifest, corpus_file = built_index
    tbl = pq.read_table(corpus_file, columns=["content"])
    texts = tbl.column("content").to_pylist()
    docs = []
    row = 0
    for p in manifest.partitions:
        for off in range(p["num_rows"]):
            docs.append(((p["pid"] << 32) | off, texts[row]))
            row += 1
    return ExhaustiveOracle(docs)


@pytest.fixture(scope="module")
def searcher(built_index):
    index_dir, _, _ = built_index
    return Searcher(IndexReader(index_dir))


def test_manifest_structure(built_index):
    index_dir, manifest, _ = built_index
    assert manifest.postings_done and manifest.term_stats_done
    assert manifest.doc_count == 1000
    assert len(manifest.partitions) >= 6  # multiple partitions
    assert len(manifest.segments) >= 2  # multiple segments
    assert os.path.exists(os.path.join(index_dir, "manifest.json"))
    m2 = Manifest.load(index_dir)
    assert m2.doc_count == manifest.doc_count


def test_sha256_integrity(built_index):
    """Per-row content sha256 must survive ingest (north-rule invariant)."""
    index_dir, manifest, corpus_file = built_index
    import hashlib

    reader = IndexReader(index_dir)
    docmap = reader.docmap_table(columns=["doc_id", "sha256"]).to_pylist()
    texts = pq.read_table(corpus_file, columns=["content"]).column("content").to_pylist()
    # docmap rows are in (pid, offset) order == input row order
    assert len(docmap) == len(texts)
    for row, rec in zip(texts, docmap):
        assert hashlib.sha256(row.encode()).hexdigest() == rec["sha256"]


def test_collection_stats_match_oracle(searcher, oracle):
    cs = searcher.reader.collection_stats()
    assert cs.doc_count == oracle.cstats.doc_count
    assert cs.sum_total_term_freq == oracle.cstats.sum_total_term_freq
    # spot-check per-term stats
    for t in ["import", "return", "uniq_101", "def"]:
        got = searcher.reader.term_stats([t]).get(t)
        if oracle.df.get(t, 0) == 0:
            assert got is None
        else:
            assert got.doc_freq == oracle.df[t]
            assert got.total_term_freq == oracle.ttf[t]


@pytest.mark.parametrize("spec", reference_queries(), ids=lambda s: f"q{s['qid']}")
def test_rank_identical_vs_oracle(searcher, oracle, spec):
    q = query_to_ast(spec)
    k = 10
    got = searcher.search(q, k)
    exp_ids, exp_scores, exp_total = oracle.search(q, k)
    assert got.total_hits == exp_total, f"total hits differ for {spec}"
    np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=f"doc ids differ for {spec}")
    np.testing.assert_array_equal(got.scores, exp_scores, err_msg=f"float scores differ for {spec}")


def test_random_queries_vs_oracle(searcher, oracle):
    """Randomized property test (LuceneTestCase pattern): seeded random
    boolean combinations over vocabulary quantiles."""
    from lucene_ray.fixtures import make_vocab
    from lucene_ray.search.query import BooleanQuery, TermQuery

    rng = np.random.default_rng(7)
    vocab = make_vocab()
    for trial in range(30):
        n = rng.integers(1, 4)
        terms = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        kind = trial % 3
        if kind == 0:
            q = BooleanQuery(must=[TermQuery(t) for t in terms])
        elif kind == 1:
            q = BooleanQuery(should=[TermQuery(t) for t in terms])
        else:
            q = BooleanQuery(must=[TermQuery(terms[0])],
                             must_not=[TermQuery(t) for t in terms[1:]])
        got = searcher.search(q, 10)
        exp_ids, exp_scores, exp_total = oracle.search(q, 10)
        assert got.total_hits == exp_total, (trial, q)
        np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=str(q))
        np.testing.assert_array_equal(got.scores, exp_scores, err_msg=str(q))


def test_search_table_materializes_fields(searcher):
    tbl = searcher.search_table("import", 5)
    assert set(["doc_id", "repo", "path", "commit", "score"]).issubset(tbl.column_names)
    assert len(tbl) == 5
    s = tbl.column("score").to_pylist()
    assert s == sorted(s, reverse=True)


def test_query_parser(searcher, oracle):
    from lucene_ray.search.query import parse_query

    for qs in ["import", "import AND return", "def OR class",
               'return NOT import', '"new string"', "uniq_1*",
               '"import return"~2', '"def self"~1 AND class']:
        q = parse_query(qs)
        got = searcher.search(q, 10)
        exp_ids, exp_scores, exp_total = oracle.search(q, 10)
        assert got.total_hits == exp_total, qs
        np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=qs)

    q = parse_query('"import return"~2')
    from lucene_ray.search.query import BooleanQuery as BQ
    from lucene_ray.search.query import PhraseQuery as PQ
    from lucene_ray.search.query import TermQuery as TQ

    assert isinstance(q, PQ) and q.slop == 2

    # "a AND b" requires BOTH terms (the left neighbor becomes MUST too)
    q = parse_query("import AND return")
    assert isinstance(q, BQ)
    assert set(q.must) == {TQ("import"), TQ("return")} and not q.should
    q = parse_query("import AND return OR def")
    assert set(q.must) == {TQ("import"), TQ("return")}
    assert set(q.should) == {TQ("def")}


def test_explain_value_equals_search_score(searcher):
    """Explanation contract: explain(q, doc).value == the score search gives
    that doc (BaseSimilarityTestCase consistency-with-explain pattern)."""
    from lucene_ray.search.query import BooleanQuery, TermQuery, parse_query

    for qs in ["import", "import AND return", "def OR class"]:
        q = parse_query(qs)
        td = searcher.search(q, 5)
        for gid, score in zip(td.doc_ids, td.scores):
            ex = searcher.explain(q, int(gid))
            assert ex["value"] == float(score), (qs, gid)
            assert "match" in ex["description"]
    # a doc that does not match explains to 0 (uniq_* terms are singletons)
    td_all = searcher.search(TermQuery("uniq_1"), 10**9, total_hits_threshold=None)
    matching = set(int(g) for g in td_all.doc_ids)
    some_doc = next(
        int(g) for g in searcher.reader.global_doc_ids(searcher.reader.segs[0])
        if int(g) not in matching
    )
    assert searcher.explain(TermQuery("uniq_1"), some_doc)["value"] == 0.0


def test_resume_skips_completed_partitions(built_index, tmp_path):
    """F6: a build interrupted mid-way resumes, skipping finished partitions,
    and produces identical artifacts."""
    import ray

    from lucene_ray.index.build import IndexConfig, build_index, partials_path

    index_dir, manifest, corpus_file = built_index
    cfg = IndexConfig(
        target_rows_per_partition=150,
        partitions_per_segment=3,
        chunk_size=64,
        hot_df_threshold=300,
        n_salts=3,
    )
    idx2 = str(tmp_path / "idx2")
    # simulate interruption: run stage A for a subset by pre-seeding manifest
    from lucene_ray.index.manifest import Manifest as M
    from lucene_ray.index.build import plan_partitions, plan_segments

    parts = plan_partitions([corpus_file], cfg)
    m = M(index_dir=idx2, config=cfg.to_dict(), partitions=parts,
          segments=plan_segments(parts, cfg))
    os.makedirs(idx2, exist_ok=True)
    m.save()
    # full build (resume=True picks up the plan)
    manifest2 = build_index(corpus_file, idx2, cfg, resume=True)
    assert manifest2.doc_count == 1000

    # re-run: nothing to do, stage markers prevent recompute; mtimes unchanged
    before = {p["pid"]: os.path.getmtime(partials_path(idx2, p["pid"])) for p in parts}
    manifest3 = build_index(corpus_file, idx2, cfg, resume=True)
    after = {p["pid"]: os.path.getmtime(partials_path(idx2, p["pid"])) for p in parts}
    assert before == after
    assert manifest3.doc_count == 1000

    # identical search results from the resumed index
    s1 = Searcher(IndexReader(index_dir))
    s2 = Searcher(IndexReader(idx2))
    for spec in reference_queries()[:5]:
        q = query_to_ast(spec)
        a, b = s1.search(q, 10), s2.search(q, 10)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)
