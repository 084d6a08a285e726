"""uax29 tokenizer grammar: scalar/column parity, StandardTokenizer
token-type behavior (unigram CJK + hiragana, katakana/hangul runs, Unicode
alphanumerics), ASCII equivalence with the pinned code grammar, and an
end-to-end multilingual index build + search (grammar="uax29")."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.tokenizer import (
    CodeTokenizer,
    UnicodeTokenizer,
    tokenize_uax29,
)
from lucene_ray.index.invert import tokenize_column

TOK = UnicodeTokenizer()


def test_scripts_and_token_types():
    assert TOK("Café au lait") == ["café", "au", "lait"]
    assert TOK("漢字テスト") == ["漢", "字", "テスト"]          # unigram CJK, katakana run
    assert TOK("abc漢def") == ["abc", "漢", "def"]             # class change splits
    assert TOK("한국어 처리") == ["한국어", "처리"]             # hangul runs
    assert TOK("ひらがな") == ["ひ", "ら", "が", "な"]          # unigram hiragana
    assert TOK("ラーメン・そば") == ["ラーメン", "そ", "ば"]    # middle dot separates
    assert TOK("Привет мир") == ["привет", "мир"]              # cyrillic + lowercase
    assert TOK("foo_bar-baz") == ["foo_bar", "baz"]            # _ joins, - splits


def test_ascii_equivalence_with_code_grammar():
    # equivalence holds on ASCII WITHOUT joiner contexts; joiner-bearing
    # text now diverges deliberately (StandardTokenizer-faithful WB6/7 +
    # WB11/12 — see test_uax29_joiners)
    code = CodeTokenizer()
    for s in ["Hello World_42", "x" * 600 + " y",
              "", "   ", "a b c d", "end. .start a. .b a , b"]:
        assert TOK(s) == code(s), s


def test_uax29_joiners():
    """Golden WB6/7 (MidLetter/MidNumLetQ between letters) and WB11/12
    (MidNum/MidNumLetQ between numerics) segmentation, matching
    StandardTokenizer (StandardTokenizerImpl.jflex:91-92,216,238-247)."""
    cases = {
        "can't": ["can't"],              # ' = Single_Quote, letter join
        "can’t": ["can’t"],              # U+2019 = MidNumLet
        "3.14": ["3.14"],                # . = MidNumLet, digit join
        "1,000,000": ["1,000,000"],      # , = MidNum, digit join
        "x_y": ["x_y"],                  # _ = ExtendNumLet (run member)
        "a:b": ["a:b"],                  # : = MidLetter, letter join
        "wiki.apache.org": ["wiki.apache.org"],
        "a.b.c.d.e": ["a.b.c.d.e"],      # chained joins
        "O'Neill's": ["o'neill's"],
        "3.14 and 2.71": ["3.14", "and", "2.71"],
        # NON-joins: wrong anchor class, double joiner, edge position
        "a.4": ["a", "4"], "1.a": ["1", "a"],
        "3:4": ["3", "4"],               # colon joins letters only
        "a,b": ["a", "b"],               # comma joins digits only
        "a..b": ["a", "b"], "end.": ["end"], ".start": ["start"],
        "'quoted'": ["quoted"],
        "x_:y": ["x_", "y"],             # '_' is not an AHLetter anchor
        "漢.字": ["漢", "字"],            # ideographs are not AHLetter
    }
    for s, want in cases.items():
        assert TOK(s) == want, (s, TOK(s))
    # column kernel agrees on the same corpus (incl. the pure-ASCII docs
    # that now must route off the code-grammar fast path)
    docs = list(cases)
    flat, doc_idx, _pos = tokenize_column(
        pa.array(docs, pa.string()), grammar="uax29")
    got = [[] for _ in docs]
    for t, d in zip(flat.to_pylist(), doc_idx):
        got[d].append(t)
    for i, s in enumerate(docs):
        assert got[i] == cases[s], s


def test_overlong_token_split():
    t = "a" * 600
    assert TOK(t) == [t[:255], t[255:510], t[510:]]
    # CJK unigrams never exceed the cap
    assert TOK("漢" * 300) == ["漢"] * 300


def _rand_docs(n, seed):
    rng = np.random.default_rng(seed)
    frags = ["hello", "WORLD", "Café", "naïve", "漢字", "テスト", "ひらが",
             "한국어", "42", "foo_bar", "Δδ", "привет", "——", "3.14", "", " ",
             "x" * 300, "・", "ラーメン"]
    docs = []
    for _ in range(n):
        k = rng.integers(0, 12)
        docs.append(" ".join(rng.choice(frags, size=k).tolist())
                    if k else "")
    return docs


@pytest.mark.parametrize("seed", [3, 17])
def test_column_kernel_parity_with_scalar(seed):
    docs = _rand_docs(200, seed)
    col = pa.array(docs, pa.string())
    flat, doc_idx, positions, sc, ec = tokenize_column(
        col, with_offsets=True, grammar="uax29")
    toks = flat.to_pylist()
    # group back per doc and compare to the scalar tokenizer
    got = [[] for _ in docs]
    for t, d in zip(toks, doc_idx):
        got[d].append(t)
    for i, doc in enumerate(docs):
        assert got[i] == TOK(doc), (i, doc)
    # positions are 0..n-1 per doc (no stopwords here)
    for d in np.unique(doc_idx):
        sel = positions[doc_idx == d]
        assert sel.tolist() == list(range(len(sel)))
    # offsets point at the token text in the LOWERED doc (codepoint offsets)
    import pyarrow.compute as pc

    lowered = [pc.utf8_lower(pa.array([x]))[0].as_py() for x in docs]
    for t, d, s, e in zip(toks, doc_idx, sc, ec):
        assert lowered[d][s:e] == t


def test_column_kernel_stopword_holes():
    col = pa.array(["the 漢 cat", "cat the"], pa.string())
    flat, doc_idx, positions = tokenize_column(
        col, stopwords=frozenset(["the"]), grammar="uax29")
    assert flat.to_pylist() == ["漢", "cat", "cat"]
    assert positions.tolist() == [1, 2, 0]  # holes kept


def test_pure_ascii_column_identical_to_code_grammar():
    docs = ["Standard tokenizer TEXT 42", "foo_bar baz", "", "x  y"]
    col = pa.array(docs, pa.string())
    a = tokenize_column(col, grammar="code")
    b = tokenize_column(col, grammar="uax29")
    assert a[0].to_pylist() == b[0].to_pylist()
    assert a[1].tolist() == b[1].tolist()
    assert a[2].tolist() == b[2].tolist()


@pytest.fixture(scope="module")
def uni_index(ray_session, tmp_path_factory):
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader

    rng = np.random.default_rng(23)
    frags = ["merge", "query", "漢字", "検索", "エンジン", "한국어",
             "naïve", "café", "привет", "index"]
    docs = []
    for i in range(300):
        k = int(rng.integers(2, 14))
        docs.append(" ".join(rng.choice(frags, size=k).tolist()))
    tbl = pa.table({
        "repo": pa.array([f"r{i % 5}" for i in range(300)]),
        "path": pa.array([f"p/{i}" for i in range(300)]),
        "commit": pa.array(["c"] * 300),
        "lang": pa.array(["txt"] * 300),
        "content": pa.array(docs, pa.string()),
    })
    d = tmp_path_factory.mktemp("uni")
    src = str(d / "c.parquet")
    pq.write_table(tbl, src, row_group_size=90)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        grammar="uax29",
        target_rows_per_partition=120,
        partitions_per_segment=2,
        chunk_size=64,
    ))
    return IndexReader(idx), docs


def _hit_paths(reader, td):
    t = reader.lookup_docs(td.doc_ids, columns=["path"])
    return set(t.column("path").to_pylist())


def test_uax29_index_term_search(uni_index):
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    reader, docs = uni_index
    searcher = Searcher(reader)
    # unigram CJK: TermQuery('漢') must hit exactly docs containing 漢字
    for term, pred in [
        ("漢", lambda d: "漢字" in d),
        ("エンジン", lambda d: "エンジン" in d),
        ("한국어", lambda d: "한국어" in d),
        ("café", lambda d: "café" in d),
        ("merge", lambda d: "merge" in d.split()),
    ]:
        td = searcher.search(TermQuery(term), 10**9, total_hits_threshold=None)
        want = {f"p/{i}" for i, d in enumerate(docs) if pred(d)}
        assert _hit_paths(reader, td) == want, term
        assert len(want) > 0, term


def test_uax29_index_phrase_across_scripts(uni_index):
    from lucene_ray.search.query import PhraseQuery
    from lucene_ray.search.searcher import Searcher

    reader, docs = uni_index
    # "漢字" tokenizes to two adjacent unigrams 漢, 字 — exact phrase
    td = Searcher(reader).search(PhraseQuery(("漢", "字")), 10**9,
                                 total_hits_threshold=None)
    want = {f"p/{i}" for i, d in enumerate(docs) if "漢字" in d}
    assert _hit_paths(reader, td) == want and len(want) > 0


def test_uax29_query_analyzer_parses_cjk():
    from lucene_ray.search.query import PhraseQuery, parse_query

    q = parse_query('"漢字 検索"', analyzer=UnicodeTokenizer())
    # 漢字 -> 漢|字 unigrams, 検索 -> 検|索: one 4-term phrase
    assert isinstance(q, PhraseQuery)
    assert tuple(q.terms) == ("漢", "字", "検", "索")
