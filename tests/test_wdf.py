"""word_delimiter grammar: WordDelimiterGraphFilter default-flag semantics.

Reference behavior: lucene/analysis/common/src/java/org/apache/lucene/
analysis/miscellaneous/WordDelimiterGraphFilter.java:64-120 (flags
GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE |
SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE) + WordDelimiterIterator.java,
flattened to one position per subword (index-time graph flattening).
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.tokenizer import WordDelimiterTokenizer
from lucene_ray.index.invert import tokenize_column


def col_tokens(texts, **kw):
    flat, doc_idx, positions = tokenize_column(
        pa.array(texts, pa.string()), grammar="word_delimiter", **kw
    )
    out = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), np.asarray(doc_idx)):
        out[int(d)].append(t)
    return out


# hand-checked against WordDelimiterGraphFilter's documented examples
CASES = [
    ("PowerShot", ["power", "shot"]),
    ("powerShot", ["power", "shot"]),
    ("SD500", ["sd", "500"]),
    ("digital-camera", ["digital", "camera"]),
    ("NASARover", ["nasa", "rover"]),
    ("ABCdef", ["ab", "cdef"]),
    ("mp3Player", ["mp", "3", "player"]),
    ("j2se", ["j", "2", "se"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("O'Neil's", ["o", "neil"]),
    ("O'Neil's car", ["o", "neil", "car"]),
    ("it's", ["it"]),
    ("can't", ["can", "t"]),
    ("A", ["a"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("HTTP2", ["http", "2"]),
    ("", []),
    ("...", []),
    ("iPhone4S", ["i", "phone", "4", "s"]),
]


@pytest.mark.parametrize("text,expect", CASES)
def test_scalar_cases(text, expect):
    assert WordDelimiterTokenizer()(text) == expect


def test_column_matches_scalar_on_cases():
    texts = [t for t, _ in CASES]
    got = col_tokens(texts)
    for (text, expect), toks in zip(CASES, got):
        assert toks == expect, (text, toks, expect)


def test_column_scalar_parity_random():
    rng = np.random.default_rng(42)
    alphabet = list("abcXYZ09 _'-.é")
    texts = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 40)))
        for _ in range(300)
    ]
    tok = WordDelimiterTokenizer()
    got = col_tokens(texts)
    for text, toks in zip(texts, got):
        assert toks == tok(text), repr(text)


def test_no_cross_document_bleed():
    # acronym lookahead / possessive lookbehind must stop at doc boundaries
    got = col_tokens(["ABCX", "def"])
    assert got == [["abcx"], ["def"]]
    got = col_tokens(["ends O'", "s starts"])
    assert got == [["ends", "o"], ["s", "starts"]]
    got = col_tokens(["tail'", "s"])
    assert got == [["tail"], ["s"]]


def test_positions_and_offsets():
    flat, doc_idx, positions, sc, ec = tokenize_column(
        pa.array(["PowerShot SD500"], pa.string()),
        grammar="word_delimiter", with_offsets=True,
    )
    assert flat.to_pylist() == ["power", "shot", "sd", "500"]
    assert list(np.asarray(positions)) == [0, 1, 2, 3]
    # offsets index the ORIGINAL text
    text = "PowerShot SD500"
    for t, s, e in zip(flat.to_pylist(), np.asarray(sc), np.asarray(ec)):
        assert text[int(s):int(e)].lower() == t


def test_stopwords_and_max_len():
    got = col_tokens(["TheQuickFox"], stopwords=frozenset({"the"}))
    assert got == [["quick", "fox"]]
    long = "AB" + "x" * 600  # acronym rule: A | Bxxx... then 255-chunking
    [toks] = col_tokens([long], max_token_length=255)
    assert toks == WordDelimiterTokenizer(255)(long)
    assert toks[0] == "a"
    assert toks[1] == "b" + "x" * 254
    assert all(len(t) <= 255 for t in toks)


def test_end_to_end_build_and_phrase(ray_session, tmp_path):
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import PhraseQuery, TermQuery, parse_query
    from lucene_ray.search.searcher import Searcher

    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([
            "getUserName returns the userName",
            "snake_case and CamelCase mix",
            "O'Neil's mp3Player SD500",
            "plain lowercase words only",
        ], pa.string()),
    })
    src = str(tmp_path / "wdf.parquet")
    import pyarrow.parquet as pq

    pq.write_table(docs, src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(content_col="text", id_cols=("doc_id",),
                      grammar="word_delimiter",
                      target_rows_per_partition=2)
    build_index(src, idx, cfg, resume=False)
    s = Searcher(IndexReader(idx))

    def hit_offsets(q):
        td = s.search(q, 10)
        # gid = pid << 32 | offset; 2 rows per partition in input order
        return sorted((int(d) >> 32) * 2 + (int(d) & 0xFFFFFFFF)
                      for d in td.doc_ids)

    # "user" only exists as a camelCase subword
    assert hit_offsets(TermQuery("user")) == [0]
    assert hit_offsets(TermQuery("case")) == [1]
    assert hit_offsets(TermQuery("neil")) == [2]
    assert hit_offsets(TermQuery("500")) == [2]
    # phrase across subwords: get|user|name consecutive positions
    assert hit_offsets(PhraseQuery(["get", "user", "name"])) == [0]
    # query-side analyzer splits the SAME way
    q = parse_query('"getUserName"', analyzer=WordDelimiterTokenizer())
    assert hit_offsets(q) == [0]
