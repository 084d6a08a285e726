"""Char filters (CharFilter chain with correctOffset —
analysis/CharFilter.java, charfilter/BaseCharFilter.java:36-54):
HTMLStripCharFilter + MappingCharFilter behavior, offset correction back to
the ORIGINAL text, composition, and the build/search/offsets end-to-end."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.charfilter import (
    _html_strip_one,
    _MappingMatcher,
    apply_char_filters,
    correct_offsets,
)
from lucene_ray.codec.postings import decode_offsets
from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.invert import invert_partition, tokenize_column
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import PhraseQuery, TermQuery
from lucene_ray.search.searcher import Searcher


def test_html_strip_text():
    cases = [
        ("a<b>bc</b>d", "abcd"),
        ("x &amp; y", "x & y"),
        ("<p id='q'>hi</p>", "hi"),
        ("A&#66;&#x43;", "ABC"),
        ("no tags at all", "no tags at all"),
        ("&bogus; stays", "&bogus; stays"),
        ("a<br/>b&nbsp;c", "ab c"),
    ]
    for src, want in cases:
        got, _ = _html_strip_one(src)
        assert got == want, src


def test_html_strip_offset_correction():
    src = "ab<b>cd</b> ef &amp; gh"
    filt, bps = _html_strip_one(src)
    assert filt == "abcd ef & gh"
    import bisect

    p = [b[0] for b in bps]
    d = [b[1] for b in bps]

    def corr(x):
        i = bisect.bisect_right(p, x) - 1
        return x + (d[i] if i >= 0 else 0)

    # token 'cd' at filtered [2,4): start maps exactly; the END lands ON a
    # breakpoint, so it absorbs the adjacent stripped tag — exactly
    # BaseCharFilter.correct's behavior (diffs apply from the breakpoint on)
    assert src[corr(2):corr(2) + 2] == "cd"
    assert src[corr(2):corr(4)] == "cd</b>"
    # tokens not adjacent to a rewrite map exactly on both ends
    assert src[corr(5):corr(7)] == "ef"
    assert src[corr(10):corr(12)] == "gh"


def test_mapping_longest_match():
    m = _MappingMatcher((("c++", "cpp"), ("c", "see")))
    filt, _ = m("c++ and c")
    assert filt == "cpp and see"  # 'c++' wins over 'c' at position 0


def test_chain_composition_offsets():
    """mapping AFTER html_strip: corrected offsets go straight to the
    original text through both maps."""
    col, corr = apply_char_filters(
        pa.array(["x <b>c++</b> y"]),
        (("html_strip",), ("mapping", (("c++", "cpp"),))),
    )
    assert col[0].as_py() == "x cpp y"
    # filtered token 'y' at [6,7) -> original [13,14)
    out = correct_offsets(np.array([0]), np.array([6]), corr)
    assert "x <b>c++</b> y"[out[0]] == "y"


def test_tokenize_column_offsets_into_original():
    """Every plain-segment token's corrected offsets slice the ORIGINAL
    text to the token itself (the snippet invariant behind highlighting)."""
    texts = ["hello <b>world</b> &amp; friends",
             "plain doc two",
             "<p>lead</p>tail &#88; end"]
    col, corr = apply_char_filters(pa.array(texts), ("html_strip",))
    flat, doc_idx, pos, s, e = tokenize_column(col, with_offsets=True)
    cs = correct_offsets(doc_idx, s, corr)
    ce = correct_offsets(doc_idx, e, corr)
    toks = flat.to_pylist()
    # corrected START always points at the token's first original char
    # (except tokens MADE by entity decoding, whose start points at the
    # entity — Lucene's behavior); ends may absorb adjacent stripped tags
    starts_ok = sum(
        1 for t, d, a in zip(toks, doc_idx, cs) if texts[d].lower()[a] == t[0]
    )
    assert starts_ok == len(toks) - 1  # only the X from &#88; is entity-made
    # tokens not touching any rewrite map exactly on both ends
    exact = sum(
        1 for t, d, a, b in zip(toks, doc_idx, cs, ce)
        if texts[d].lower()[a:b] == t
    )
    assert exact >= 6


def test_invert_partition_char_filters():
    texts = pa.array(["the <b>quick</b> fox", "no markup"])
    partials, lengths, norms = invert_partition(
        texts, with_offsets=True, char_filters=("html_strip",))
    terms = partials.column("term").to_pylist()
    assert "quick" in terms and "b" not in terms
    assert list(lengths) == [3, 2]  # tags don't count toward field length
    i = terms.index("quick")
    f = np.asarray(partials.column("freqs")[i].values, dtype=np.int64)
    s, e = decode_offsets(partials.column("off_enc")[i].as_py(), f)
    # offsets point into the ORIGINAL text (the corrected end absorbs the
    # adjacent stripped close-tag, per BaseCharFilter.correct)
    orig = texts[0].as_py()
    assert orig[int(s[0]):int(s[0]) + 5] == "quick"
    assert orig[int(s[0]):int(e[0])] == "quick</b>"


@pytest.fixture(scope="module")
def html_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cf")
    rows = []
    for i in range(120):
        body = f"alpha <i>beta{i % 5}</i> gamma &amp; delta row{i}"
        if i % 3 == 0:
            body = f"<div class='x'>{body}</div>"
        rows.append(body)
    t = pa.table({
        "repo": [f"r{i % 4}" for i in range(120)],
        "path": [f"p{i}" for i in range(120)],
        "commit": [f"c{i}" for i in range(120)],
        "content": rows,
    })
    src = str(d / "c.parquet")
    pq.write_table(t, src)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=50, partitions_per_segment=2,
        with_offsets=True, char_filters=("html_strip",)))
    return t, idx


def test_html_index_hits_and_phrases(html_index):
    t, idx = html_index
    s = Searcher(IndexReader(idx))
    # tag names and attrs are NOT terms
    for bad in ["div", "i", "class", "x", "amp"]:
        assert s.search(TermQuery(bad), 5, total_hits_threshold=None).total_hits == 0
    assert s.search(TermQuery("alpha"), 5, total_hits_threshold=None).total_hits == 120
    assert s.search(TermQuery("beta0"), 5, total_hits_threshold=None).total_hits == 24
    # phrase crosses the stripped tag: 'alpha beta0' are adjacent positions
    td = s.search(PhraseQuery(("alpha", "beta0")), 5, total_hits_threshold=None)
    assert td.total_hits == 24


def test_mapping_index_e2e(ray_session, tmp_path):
    t = pa.table({
        "repo": ["r"] * 3, "path": ["a", "b", "c"], "commit": ["x", "y", "z"],
        # NOTE: mapping is case-sensitive (CharFilters run BEFORE the
        # lowercasing tokenizer, exactly as in Lucene's chain)
        "content": ["c++ is fast", "plain c here", "cpp native"],
    })
    src = str(tmp_path / "m.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=10, partitions_per_segment=1,
        char_filters=(("mapping", (("c++", "cpp"),)),)))
    s = Searcher(IndexReader(idx))
    # doc 0's 'C++' normalized to cpp -> two cpp docs
    assert s.search(TermQuery("cpp"), 5, total_hits_threshold=None).total_hits == 2
    assert s.search(TermQuery("c"), 5, total_hits_threshold=None).total_hits == 1


def test_pattern_grammar(ray_session, tmp_path):
    texts = pa.array(["foo_bar baz", "x1 y2_z3"])
    flat, doc_idx, pos = tokenize_column(texts, grammar="pattern:[a-z]+")
    assert flat.to_pylist() == ["foo", "bar", "baz", "x", "y", "z"]
    # e2e through a build: underscore splits under the pattern grammar
    t = pa.table({
        "repo": ["r"] * 2, "path": ["a", "b"], "commit": ["x", "y"],
        "content": ["foo_bar baz", "plain foo"],
    })
    src = str(tmp_path / "p.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=10, partitions_per_segment=1,
        grammar="pattern:[a-z]+"))
    s = Searcher(IndexReader(idx))
    assert s.search(TermQuery("foo"), 5, total_hits_threshold=None).total_hits == 2
    assert s.search(TermQuery("foo_bar"), 5, total_hits_threshold=None).total_hits == 0


def test_pattern_tokenizer_query_side():
    from lucene_ray.analysis.tokenizer import PatternTokenizer

    tk = PatternTokenizer("[a-z]+")
    assert tk("Foo_Bar baz") == ["foo", "bar", "baz"]


def test_mapping_expansion_offsets():
    """dst LONGER than src (negative delta breakpoints): corrected offsets
    still index the original text for tokens outside the rewrite."""
    m = _MappingMatcher((("c", "see"),))
    filt, bps = m("a c b")
    assert filt == "a see b"
    import bisect

    p = [b[0] for b in bps]
    d = [b[1] for b in bps]

    def corr(x):
        i = bisect.bisect_right(p, x) - 1
        return x + (d[i] if i >= 0 else 0)

    # 'b' at filtered [6,7) -> original [4,5)
    assert "a c b"[corr(6):corr(7)] == "b"
    # 'a' before the rewrite is untouched
    assert "a c b"[corr(0):corr(1)] == "a"


def test_chain_with_expansion_composes():
    """html_strip THEN an expanding mapping: composed correction maps the
    final coords straight to the original."""
    src = "<b>x</b> c y"
    col, corr = apply_char_filters(
        pa.array([src]), (("html_strip",), ("mapping", (("c", "see"),))))
    assert col[0].as_py() == "x see y"
    out = correct_offsets(np.array([0, 0]), np.array([0, 6]), corr)
    # 'x' at filtered 0 -> original 3; 'y' at filtered 6 -> original 11
    assert src[out[0]] == "x" and src[out[1]] == "y"


def test_charfilter_random_roundtrip_property():
    """Property: for random tag/entity/mapping soups, every token fully
    outside any rewrite maps exactly; corrected starts always land on the
    token's first char (or the rewrite start for rewrite-made tokens)."""
    import random
    import re

    rng = random.Random(7)
    pieces = ["foo ", "bar ", "<i>", "</i>", "&amp; ", "qq ", "<br/>", "zz "]
    for _ in range(200):
        src = "".join(rng.choice(pieces) for _ in range(rng.randint(2, 10)))
        col, corr = apply_char_filters(pa.array([src]), ("html_strip",))
        filt = col[0].as_py()
        for m in re.finditer(r"[a-z]+", filt):
            st = np.array([m.start()])
            en = np.array([m.end()])
            cs = correct_offsets(np.zeros(1, np.int64), st, corr)[0]
            ce = correct_offsets(np.zeros(1, np.int64), en, corr)[0]
            tok = m.group(0)
            # start lands on the token's first char unless entity-made
            assert src[cs] == tok[0] or src[cs] == "&"
            # slicing len(tok) chars from the corrected start, skipping
            # nothing, must reproduce the token when it's contiguous in src
            if src[cs:cs + len(tok)] == tok:
                assert ce >= cs + len(tok)
