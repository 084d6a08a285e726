"""Dictionary-based CJK segmentation ('dict' grammar): MaxMatch merging of
ideographic runs against a configured lexicon — the kuromoji/nori/smartcn
seam — checked against a per-doc Python oracle and end-to-end through an
index build."""

import numpy as np
import pyarrow as pa
import pytest

LEX = ("数据库", "数据", "索引", "查询", "分词器")

TEXTS = [
    "the 数据库索引 layer",            # -> 数据库 | 索引 (longest match wins)
    "数据 flow 查询",                  # covered words around ASCII
    "未知字",                          # nothing in lexicon -> unigrams
    "pure ascii only",
    "分词器分词器",                    # repeated word
    "数据库x数据",                     # ascii splits the ideo run
]


def _oracle(text: str) -> list[str]:
    from lucene_ray.analysis.tokenizer import (
        CLS_IDEO,
        codepoint_class,
        maxmatch_spans,
    )
    import re

    out = []
    i, n = 0, len(text)
    low = text.lower()
    while i < n:
        c = low[i]
        if codepoint_class(ord(c)) == CLS_IDEO:
            j = i
            while j < n and codepoint_class(ord(low[j])) == CLS_IDEO:
                j += 1
            run = low[i:j]
            for a, b in maxmatch_spans(run, frozenset(LEX), 3):
                out.append(run[a:b])
            i = j
        elif re.match(r"[a-z0-9_]", c):
            j = i
            while j < n and re.match(r"[a-z0-9_]", low[j]):
                j += 1
            out.append(low[i:j])
            i = j
        else:
            i += 1
    return out


def test_dict_tokenizer_matches_oracle():
    from lucene_ray.analysis.tokenizer import DictTokenizer

    tok = DictTokenizer(LEX)
    for t in TEXTS:
        assert tok(t) == _oracle(t), t


def test_dict_tokenizer_longest_match_and_fallback():
    from lucene_ray.analysis.tokenizer import DictTokenizer

    tok = DictTokenizer(LEX)
    assert tok("数据库索引") == ["数据库", "索引"]  # 数据库 beats 数据
    assert tok("未知字") == ["未", "知", "字"]       # unigram fallback
    assert tok("数据库x数据") == ["数据库", "x", "数据"]


def test_dict_column_inversion_matches_tokenizer():
    from lucene_ray.analysis.tokenizer import DictTokenizer
    from lucene_ray.index.invert import tokenize_column

    tok = DictTokenizer(LEX)
    flat, doc_idx, positions = tokenize_column(
        pa.array(TEXTS), grammar="dict", dict_lexicon=LEX
    )
    got: dict[int, list[str]] = {}
    for t, d in zip(flat.to_pylist(), np.asarray(doc_idx)):
        got.setdefault(int(d), []).append(t)
    for i, text in enumerate(TEXTS):
        assert got.get(i, []) == tok(text), text
    # positions are sequential per doc after merging
    for i in range(len(TEXTS)):
        p = [int(p) for p, d in zip(np.asarray(positions), np.asarray(doc_idx)) if d == i]
        assert p == list(range(len(p)))


def test_dict_grammar_end_to_end(ray_session, tmp_path):
    """Build an index under the dict grammar; multi-char CJK words are
    single terms (TermQuery hits), and phrase positions work post-merge."""
    import pyarrow.parquet as pq

    from lucene_ray.analysis.tokenizer import DictTokenizer
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    src = str(tmp_path / "cjk.parquet")
    pq.write_table(pa.table({
        "id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }), src)
    idx = str(tmp_path / "cjk_idx")
    cfg = IndexConfig(content_col="text", id_cols=("id",),
                      target_rows_per_partition=3, partitions_per_segment=2,
                      grammar="dict", dict_lexicon=LEX)
    build_index(src, idx, cfg, resume=False)
    s = Searcher(IndexReader(idx))
    tok = DictTokenizer(LEX)

    def hits(q):
        td = s.search(q, 10, total_hits_threshold=None)
        rows = s.reader.lookup_docs(td.doc_ids, columns=["doc_id", "id"])
        return sorted(rows.column("id").to_pylist())

    for term in ["数据库", "数据", "索引", "未", "ascii"]:
        want = sorted(i for i, t in enumerate(TEXTS) if term in tok(t))
        assert hits(TermQuery(term)) == want, term
    # phrase across merged tokens: '数据库 索引' adjacent in doc 0
    assert hits(PhraseQuery(("数据库", "索引"))) == [0]
    assert hits(PhraseQuery(("数据", "索引"))) == []
