"""Extra analyzed text fields (TextField analog — document/TextField.java):
``IndexConfig.text_cols`` columns are inverted with the shared analyzer,
terms namespaced ``col:term``, each field scored against ITS OWN norms and
avgdl (per-field NumericDocValues norms + per-field CollectionStatistics,
as IndexSearcher.collectionStatistics / LeafReader.getNormValues do).

The strongest oracle here is the *twin index*: scoring ``title:t`` in a
(content + title) index must be bit-for-bit float32-identical to scoring
``t`` in an index whose content column IS title — same docs, same stats,
same norms, so any per-field norm/avgdl mix-up changes the scores.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.fixtures import make_corpus, make_vocab
from lucene_ray.index.build import IndexConfig, add_documents, build_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import (
    BooleanQuery,
    TermQuery,
    multi_field_query,
    parse_query,
)
from lucene_ray.search.searcher import Searcher

CFG = dict(target_rows_per_partition=150, partitions_per_segment=2, chunk_size=64)


def _with_title(corpus: pa.Table, seed: int = 7) -> pa.Table:
    """Deterministic variable-length title column from the corpus vocab
    (1..6 tokens, so per-doc title norms genuinely differ)."""
    rng = np.random.default_rng(seed)
    vocab = make_vocab()[:50]
    titles = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 7)))
        for _ in range(len(corpus))
    ]
    return corpus.append_column("title", pa.array(titles, pa.string()))


@pytest.fixture(scope="module")
def tf_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("tf")
    corpus = _with_title(make_corpus(400, seed=51))
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=100)
    plain = str(d / "plain")
    build_index(src, plain, IndexConfig(**CFG))
    multi = str(d / "multi")
    build_index(src, multi, IndexConfig(**CFG, text_cols=("title",)))
    twin = str(d / "twin")  # title AS the content field
    build_index(src, twin, IndexConfig(**CFG, content_col="title"))
    return corpus, plain, multi, twin


def _title_tokens(corpus):
    return [t.lower().split() for t in corpus.column("title").to_pylist()]


def test_title_term_hits(tf_index):
    corpus, _, multi, _ = tf_index
    s = Searcher(IndexReader(multi))
    toks = _title_tokens(corpus)
    for term in ["import", "return", "value"]:
        td = s.search(TermQuery(f"title:{term}"), 10**9, total_hits_threshold=None)
        assert td.total_hits == sum(1 for ts in toks if term in ts), term


def test_title_scores_match_twin_index(tf_index):
    """title:t in the multi-field index == t in the title-as-content twin,
    bit-for-bit float32 (docs AND scores) — proves per-field norms + avgdl."""
    _, _, multi, twin = tf_index
    sm = Searcher(IndexReader(multi))
    st = Searcher(IndexReader(twin))
    for term in ["import", "return", "value", "index"]:
        a = sm.search(TermQuery(f"title:{term}"), 50, total_hits_threshold=None)
        b = st.search(TermQuery(term), 50, total_hits_threshold=None)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, term)
        np.testing.assert_array_equal(a.scores, b.scores, term)


def test_title_scores_match_twin_pruned(tf_index):
    """Same identity through the impact-ordered / MAXSCORE pruned paths
    (impact skylines carry the FIELD's norms)."""
    _, _, multi, twin = tf_index
    sm = Searcher(IndexReader(multi))
    st = Searcher(IndexReader(twin))
    a = sm.search(TermQuery("title:import"), 10, total_hits_threshold=10)
    b = st.search(TermQuery("import"), 10, total_hits_threshold=10)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
    qa = BooleanQuery(should=(TermQuery("title:import"), TermQuery("title:return")))
    qb = BooleanQuery(should=(TermQuery("import"), TermQuery("return")))
    a = sm.search(qa, 10, total_hits_threshold=10)
    b = st.search(qb, 10, total_hits_threshold=10)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)


def test_content_scoring_unchanged_by_text_cols(tf_index):
    """Adding a text field must not move CONTENT-field BM25 scores (content
    stats exclude title tokens — field_tokens are tracked separately)."""
    _, plain, multi, _ = tf_index
    sp = Searcher(IndexReader(plain))
    sm = Searcher(IndexReader(multi))
    for term in ["import", "return", "def"]:
        a = sp.search(TermQuery(term), 10)
        b = sm.search(TermQuery(term), 10)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, term)
        np.testing.assert_array_equal(a.scores, b.scores, term)


def test_field_stats_tracked(tf_index):
    corpus, _, multi, _ = tf_index
    r = IndexReader(multi)
    toks = _title_tokens(corpus)
    assert r.manifest.field_sum_ttf("title") == sum(len(t) for t in toks)
    cs = r.collection_stats(field="title")
    assert cs.sum_total_term_freq == sum(len(t) for t in toks)
    assert cs.doc_count == len(corpus)


def test_parse_query_analyzes_text_field(tf_index):
    _, _, multi, _ = tf_index
    q = parse_query("title:IMPORT", text_fields=("title",))
    assert q == TermQuery("title:import")
    q = parse_query("title:Foo-Bar", text_fields=("title",))
    assert isinstance(q, BooleanQuery)
    assert set(t.term for t in q.should) == {"title:foo", "title:bar"}
    # string-query path on the searcher resolves text_fields from the config
    s = Searcher(IndexReader(multi))
    a = s.search("title:IMPORT", 10, total_hits_threshold=None)
    b = s.search(TermQuery("title:import"), 10, total_hits_threshold=None)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)


def test_multi_field_query_hits_and_scores(tf_index):
    """MultiFieldQueryParser shape: per-term SHOULD across fields; the hit
    set is the union, the score the float32 SHOULD-sum of per-field scores."""
    corpus, _, multi, _ = tf_index
    s = Searcher(IndexReader(multi))
    q = multi_field_query("import", fields=("content", "title"),
                          content_field="content")
    td = s.search(q, 10**9, total_hits_threshold=None)
    import re

    toks = _title_tokens(corpus)
    texts = corpus.column("content").to_pylist()
    exp = sum(
        1 for t, ts in zip(texts, toks)
        if "import" in re.split(r"[^a-z0-9_]+", t.lower()) or "import" in ts
    )
    assert td.total_hits == exp
    # boosted variant parses to boosted term weights
    qb = multi_field_query("import", fields=("content", "title"),
                           boosts={"title": 2.0}, content_field="content")
    tb = s.search(qb, 10**9, total_hits_threshold=None)
    assert tb.total_hits == exp


def test_add_documents_updates_field_tokens(ray_session, tmp_path):
    corpus = _with_title(make_corpus(200, seed=52))
    a, b = corpus.slice(0, 120), corpus.slice(120)
    pq.write_table(a, str(tmp_path / "a.parquet"))
    pq.write_table(b, str(tmp_path / "b.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "a.parquet"), idx,
                IndexConfig(**CFG, text_cols=("title",)))
    add_documents(idx, str(tmp_path / "b.parquet"))
    r = IndexReader(idx)
    toks = _title_tokens(corpus)
    assert r.manifest.field_sum_ttf("title") == sum(len(t) for t in toks)
    s = Searcher(r)
    term = toks[150][0]
    td = s.search(TermQuery(f"title:{term}"), 10**9, total_hits_threshold=None)
    assert td.total_hits == sum(1 for ts in toks if term in ts)
