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


# ---- round 5: Viterbi costed lattice (kuromoji's dictionary word costs) ----

COSTS = {"東京": 500.0, "京都": 400.0, "東": 800.0, "都": 800.0,
         "数据库": 300.0, "数据": 400.0, "库存": 350.0, "存": 900.0,
         "索引": 200.0}


def test_viterbi_beats_maxmatch_on_ambiguity():
    """Crafted ambiguity suite: the min-cost lattice resolves runs greedy
    MaxMatch mis-segments."""
    from lucene_ray.analysis.tokenizer import maxmatch_spans, viterbi_spans

    def seg(fn, s, *a):
        return ["".join(s[x:y] for x in [p] for y in [q])
                for p, q in fn(s, *a)]

    mw = max(len(w) for w in COSTS)
    # classic: MaxMatch 東京|都 (1300), Viterbi 東|京都 (1200)
    assert seg(maxmatch_spans, "東京都", frozenset(COSTS), mw) == ["東京", "都"]
    assert seg(viterbi_spans, "東京都", COSTS, mw) == ["東", "京都"]
    # 数据库存: MaxMatch 数据库|存 (300+900); Viterbi 数据|库存 (400+350)
    assert seg(maxmatch_spans, "数据库存", frozenset(COSTS), mw) == ["数据库", "存"]
    assert seg(viterbi_spans, "数据库存", COSTS, mw) == ["数据", "库存"]
    # unambiguous runs agree
    assert seg(viterbi_spans, "索引", COSTS, mw) == ["索引"]
    # uncovered chars fall back to unigrams on both
    assert seg(viterbi_spans, "未知", COSTS, mw) == ["未", "知"]


def test_viterbi_tie_prefers_longer_word():
    from lucene_ray.analysis.tokenizer import viterbi_spans

    costs = {"ab": 100.0, "a": 50.0, "b": 50.0}
    # equal total cost (100): single 'ab' wins the tie
    assert viterbi_spans("ab", costs, 2) == [(0, 2)]


def test_dict_tokenizer_costed_end_to_end(ray_session):
    """Costed lexicon flows through DictTokenizer, the column kernel, and a
    full index build + term search."""
    import pyarrow.parquet as pq

    import ray.data

    from lucene_ray.analysis.tokenizer import DictTokenizer
    from lucene_ray.index.invert import tokenize_column

    lex = tuple(COSTS.items())
    tok = DictTokenizer(lex)
    assert tok("trip to 東京都 now") == ["trip", "to", "東", "京都", "now"]
    flat, doc_idx, _ = tokenize_column(
        pa.array(["trip to 東京都 now", "数据库存 x"], pa.string()),
        grammar="dict", dict_lexicon=lex)
    got = [[] for _ in range(2)]
    for t, d in zip(flat.to_pylist(), doc_idx):
        got[d].append(t)
    assert got[0] == ["trip", "to", "東", "京都", "now"]
    assert got[1] == ["数据", "库存", "x"]


def test_viterbi_index_build_and_search(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "content": pa.array(["go 東京都 line", "plain text", "東京 only"],
                            pa.string()),
    }), src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(grammar="dict", dict_lexicon=tuple(COSTS.items()),
                      id_cols=("doc_id",),
                      target_rows_per_partition=2, partitions_per_segment=1)
    build_index(src, idx, cfg)
    s = Searcher(IndexReader(idx))
    assert s.search(TermQuery("京都"), 10).total_hits == 1   # lattice path
    assert s.search(TermQuery("東京"), 10).total_hits == 1   # doc 2's pair
    assert s.search(TermQuery("都"), 10).total_hits == 0     # MaxMatch-only
