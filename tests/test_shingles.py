"""Shingles (ShingleFilter analog — analysis/shingle/ShingleFilter.java)
and WordBreakSpellChecker (suggest/spell/WordBreakSpellChecker.java)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.invert import invert_partition, tokenize_column
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import PhraseQuery, TermQuery
from lucene_ray.search.searcher import Searcher


def test_shingle_terms_and_lengths():
    texts = pa.array(["the quick fox", "quick fox quick"])
    partials, lengths, norms = invert_partition(texts, shingles=(2,))
    terms = set(partials.column("term").to_pylist())
    assert {"the quick", "quick fox", "fox quick"} <= terms
    assert "the quick fox" not in terms
    # shingles are OUTSIDE field length (posInc-0 overlap discount)
    assert list(lengths) == [3, 3]
    row = {t: i for i, t in enumerate(partials.column("term").to_pylist())}
    i = row["quick fox"]
    assert partials.column("df")[i].as_py() == 2
    assert partials.column("ttf")[i].as_py() == 2


def test_shingle_trigrams():
    texts = pa.array(["a b c d"])
    partials, _, _ = invert_partition(texts, shingles=(2, 3))
    terms = set(partials.column("term").to_pylist())
    assert {"a b", "b c", "c d", "a b c", "b c d"} <= terms
    assert "a b c d" not in terms


def test_shingles_do_not_span_stop_holes():
    texts = pa.array(["alpha the beta"])
    partials, _, _ = invert_partition(
        texts, stopwords=frozenset({"the"}), shingles=(2,))
    terms = set(partials.column("term").to_pylist())
    # position hole between alpha(0) and beta(2): no shingle across it
    assert "alpha beta" not in terms
    assert "alpha the" not in terms and "the beta" not in terms


def test_shingle_offsets_span_tokens():
    texts = pa.array(["xx yy zz"])
    from lucene_ray.codec.postings import decode_offsets

    partials, _, _ = invert_partition(texts, with_offsets=True, shingles=(2,))
    row = {t: i for i, t in enumerate(partials.column("term").to_pylist())}
    i = row["xx yy"]
    f = np.asarray(partials.column("freqs")[i].values, dtype=np.int64)
    s, e = decode_offsets(partials.column("off_enc")[i].as_py(), f)
    assert texts[0].as_py()[int(s[0]):int(e[0])] == "xx yy"


@pytest.fixture(scope="module")
def shingle_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("sh")
    from lucene_ray.fixtures import make_corpus

    corpus = make_corpus(300, seed=91)
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=100)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=150, partitions_per_segment=2,
        shingles=(2,)))
    plain = str(d / "plain")
    build_index(src, plain, IndexConfig(
        target_rows_per_partition=150, partitions_per_segment=2))
    return idx, plain


def test_shingle_term_equals_phrase(shingle_index):
    """Bigram-shingle TermQuery hit set == exact PhraseQuery hit set on the
    plain index — the CommonGrams speedup correctness identity."""
    idx, plain = shingle_index
    ss = Searcher(IndexReader(idx))
    sp = Searcher(IndexReader(plain))
    for a, b in [("import", "return"), ("def", "self"), ("return", "return")]:
        got = ss.search(TermQuery(f"{a} {b}"), 10**9, total_hits_threshold=None)
        want = sp.search(PhraseQuery((a, b)), 10**9, total_hits_threshold=None)
        assert got.total_hits == want.total_hits, (a, b)
        np.testing.assert_array_equal(np.sort(got.doc_ids),
                                      np.sort(want.doc_ids))


def test_unigram_scoring_unchanged_by_shingles(shingle_index):
    """Unigram HIT SETS are unchanged by shingle injection (shingles stay
    outside field lengths/norms; scores can differ only through collection
    sumTotalTermFreq accounting, so the set identity is the invariant)."""
    idx, plain = shingle_index
    ss = Searcher(IndexReader(idx))
    sp = Searcher(IndexReader(plain))
    for t in ["import", "return"]:
        a = ss.search(TermQuery(t), 10**9, total_hits_threshold=None)
        b = sp.search(TermQuery(t), 10**9, total_hits_threshold=None)
        assert a.total_hits == b.total_hits
        np.testing.assert_array_equal(np.sort(a.doc_ids), np.sort(b.doc_ids))


def test_word_break_and_combine(ray_session):
    import os

    from lucene_ray.pipelines import fulltext as ft

    sf = "/root/testdata/sf0.001"
    t = ft.word_break_suggest(sf, "batchwindow")
    rows = t.to_pylist()
    assert rows and rows[0]["left_part"] == "batch" and rows[0]["right_part"] == "window"
    c = ft.word_combine_suggest(sf, ["win", "dow", "val", "ue"])
    combos = {r["combined"]: r for r in c.to_pylist()}
    assert set(combos) == {"window", "value"}
    assert combos["window"]["start"] == 0 and combos["window"]["length"] == 2
    assert combos["value"]["start"] == 2
