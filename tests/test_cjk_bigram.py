"""CJK bigram grammar (CJKBigramFilter semantics, the CJKAnalyzer default):
hand-checked token streams, scalar/column parity, end-to-end build+search."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.tokenizer import UnicodeTokenizer, tokenize_uax29
from lucene_ray.index.invert import tokenize_column


def toks(text, **kw):
    return UnicodeTokenizer(**kw)(text)


def test_bigram_semantics():
    t = UnicodeTokenizer(cjk_bigrams=True)
    # run of 3 han chars -> 2 overlapping bigrams, no unigrams
    assert t("中国人") == ["中国", "国人"]
    # isolated single char -> unigram
    assert t("中") == ["中"]
    # two chars -> one bigram
    assert t("中国") == ["中国"]
    # latin words untouched; CJK region between them bigrammed
    assert t("abc 中国 def") == ["abc", "中国", "def"]
    # han + hiragana adjacency joins into one region (filter combines any
    # flagged single-char tokens)
    assert t("日本ご") == ["日本", "本ご"]
    # katakana stays a RUN token (StandardTokenizer emits runs; the filter
    # never re-splits them)
    assert t("カタカナ") == ["カタカナ"]
    # separators split regions: no bigram across the space
    assert t("中 国") == ["中", "国"]
    # without the flag: unigrams (uax29 default)
    assert toks("中国人") == ["中", "国", "人"]


def test_positions_and_offsets():
    tokens, doc_idx, pos, sc, ec = tokenize_uax29(
        ["中国人 x"], cjk_bigrams=True)
    assert tokens == ["中国", "国人", "x"]
    assert pos.tolist() == [0, 1, 2]
    assert sc.tolist() == [0, 1, 4]
    assert ec.tolist() == [2, 3, 5]


def test_scalar_column_parity():
    docs = [
        "中国人民 the 日本語",
        "pure ascii code_tokens only",
        "中",
        "mixed 中国 words ありがと",
        "",
    ]
    t = UnicodeTokenizer(cjk_bigrams=True)
    col = pa.array(docs, pa.string())
    flat, doc_idx, pos = tokenize_column(col, grammar="cjk_bigram")
    got = {}
    for tok, d in zip(flat.to_pylist(), np.asarray(doc_idx)):
        got.setdefault(int(d), []).append(tok)
    for i, d in enumerate(docs):
        assert got.get(i, []) == t(d), f"doc {i}"


def test_build_and_search_cjk(ray_session, tmp_path):
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    docs = [
        {"doc_id": 0, "content": "中国人民 hello"},
        {"doc_id": 1, "content": "中国 is a bigram"},
        {"doc_id": 2, "content": "国人 only"},
        {"doc_id": 3, "content": "no cjk at all"},
    ]
    src = str(tmp_path / "docs.parquet")
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(docs), src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(content_col="content", id_cols=("doc_id",),
                      target_rows_per_partition=2, partitions_per_segment=2,
                      grammar="cjk_bigram")
    build_index(src, idx, cfg, resume=False)
    s = Searcher(IndexReader(idx))

    def gids(q):
        td = s.search(q, 10)
        # doc_id clashes with the engine's docmap column -> stored _orig
        t = s.reader.lookup_docs(td.doc_ids, columns=["doc_id_orig"])
        return sorted(t.column("doc_id_orig").to_pylist())

    assert gids(TermQuery("中国")) == [0, 1]
    assert gids(TermQuery("国人")) == [0, 2]
    # phrase of consecutive bigrams == the trigram substring
    assert gids(PhraseQuery(("中国", "国人"))) == [0]
    assert gids(TermQuery("hello")) == [0]
