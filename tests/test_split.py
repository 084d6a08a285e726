"""Index splitting (PKIndexSplitter analog — misc/index/PKIndexSplitter.java)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus
from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.index.split import split_index
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import Searcher


@pytest.fixture(scope="module")
def split_pair(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("split")
    corpus = make_corpus(300, seed=17)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=100)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=100, partitions_per_segment=2,
        id_cols=("repo", "path", "commit", "lang"), keyword_cols=("lang",)))
    keep, rest = str(d / "py_side"), str(d / "other_side")
    split_index(idx, keep, rest, "lang", ["py"])
    return corpus, idx, keep, rest


def test_split_partition_counts(split_pair):
    corpus, idx, keep, rest = split_pair
    langs = corpus.column("lang").to_pylist()
    n_py = sum(1 for l in langs if l == "py")
    rk = IndexReader(keep)
    rr = IndexReader(rest)
    # expunged: doc_count excludes the deleted side physically
    sk = Searcher(rk)
    sr = Searcher(rr)
    assert sk.search(TermQuery("lang:py"), 5,
                     total_hits_threshold=None).total_hits == n_py
    assert sr.search(TermQuery("lang:py"), 5,
                     total_hits_threshold=None).total_hits == 0
    n_java = sum(1 for l in langs if l == "java")
    assert sr.search(TermQuery("lang:java"), 5,
                     total_hits_threshold=None).total_hits == n_java
    assert sk.search(TermQuery("lang:java"), 5,
                     total_hits_threshold=None).total_hits == 0


def test_split_halves_cover_original(split_pair):
    """Every content-term hit set splits exactly across the two halves."""
    corpus, idx, keep, rest = split_pair
    s0 = Searcher(IndexReader(idx))
    sk = Searcher(IndexReader(keep))
    sr = Searcher(IndexReader(rest))
    for term in ["import", "return", "def"]:
        full = s0.search(TermQuery(term), 10**6, total_hits_threshold=None)
        a = sk.search(TermQuery(term), 10**6, total_hits_threshold=None)
        b = sr.search(TermQuery(term), 10**6, total_hits_threshold=None)
        assert a.total_hits + b.total_hits == full.total_hits, term


def test_split_original_untouched(split_pair):
    corpus, idx, keep, rest = split_pair
    m = __import__("lucene_ray.index.manifest",
                   fromlist=["Manifest"]).Manifest.load(idx)
    assert not m.tombstones  # source index has no new tombstones
    assert m.doc_count == len(corpus)


def test_split_refuses_existing_target(split_pair, tmp_path):
    corpus, idx, keep, rest = split_pair
    with pytest.raises(ValueError):
        split_index(idx, keep, str(tmp_path / "x"), "lang", ["py"])
