"""Interval queries (minimal-interval semantics): every hit set checked
against a brute-force positional oracle computed from the parquet text with
the shared tokenizer — and the kernels unit-checked on synthetic docs."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = CodeTokenizer()
    return {
        did: tok(text)
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist())
    }


def _pos(toks, term):
    return [i for i, t in enumerate(toks) if t == term]


def _minimalize(ivs):
    ivs = sorted(set(ivs))
    return [
        a for a in ivs
        if not any(b != a and b[0] >= a[0] and b[1] <= a[1] for b in ivs)
    ]


def _ordered_oracle(toks, terms, max_gaps=-1):
    """All minimal ordered intervals by exhaustive chain enumeration."""
    pos = [_pos(toks, t) for t in terms]
    if any(not p for p in pos):
        return []
    out = []

    def rec(i, end, start, gap):
        if i == len(pos):
            if max_gaps < 0 or gap <= max_gaps:
                out.append((start, end))
            return
        for p in pos[i]:
            if p >= end:
                rec(i + 1, p + 1, start, gap + (p - end))

    for p0 in pos[0]:
        rec(1, p0 + 1, p0, 0)
    return _minimalize(out)


def _unordered_oracle(toks, terms, max_gaps=-1):
    import itertools

    pos = [_pos(toks, t) for t in terms]
    if any(not p for p in pos):
        return []
    out = []
    for combo in itertools.product(*pos):
        s, e = min(combo), max(combo) + 1
        gaps = (e - s) - len(terms)
        if max_gaps < 0 or gaps <= max_gaps:
            out.append((s, e))
    return _minimalize(out)


TERMS3 = ["table", "row", "filter"]


@pytest.mark.parametrize("gaps", [-1, 0, 2, 8])
def test_interval_ordered(docs, gaps):
    from lucene_ray.pipelines.fulltext import interval_ordered_hits

    got = interval_ordered_hits(SF, TERMS3, gaps).column("doc_id").to_pylist()
    want = sorted(d for d, toks in docs.items()
                  if _ordered_oracle(toks, TERMS3, gaps))
    assert got == want


@pytest.mark.parametrize("gaps", [-1, 1, 5])
def test_interval_unordered(docs, gaps):
    from lucene_ray.pipelines.fulltext import interval_unordered_hits

    terms = ["window", "batch"]
    got = interval_unordered_hits(SF, terms, gaps).column("doc_id").to_pylist()
    want = sorted(d for d, toks in docs.items()
                  if _unordered_oracle(toks, terms, gaps))
    assert got == want


def test_interval_containing(docs):
    from lucene_ray.pipelines.fulltext import interval_containing_hits

    big, small = ["table", "filter"], "row"
    got = interval_containing_hits(SF, big, small).column("doc_id").to_pylist()
    want = []
    for d, toks in docs.items():
        bigs = _ordered_oracle(toks, big)
        smalls = _pos(toks, small)
        if any(s <= p < e for (s, e) in bigs for p in smalls):
            want.append(d)
    assert got == sorted(want)


def test_interval_kernels_synthetic(ray_session):
    """Direct kernel checks on a hand-built mini segment, including the
    minimality trap: ordered(a, b) in 'a a b' is only [1, 3); a small at
    position 0 is NOT contained."""
    from lucene_ray.index.invert import invert_partition
    from lucene_ray.search.executor import SegmentContext, SegmentScorer, TermPostings
    from lucene_ray.search.query import (
        IContainedBy,
        IContaining,
        INotContaining,
        IOr,
        IOrdered,
        ITerm,
        IUnordered,
    )
    import pyarrow as pa

    texts = pa.array([
        "c a a b x",        # ordered(a,b) minimal = [2,4) ([1,4) contains it); c at 0 outside
        "a x x b a b",      # ordered minimal = [0,4) and [4,6) (disjoint, both kept)
        "b a",              # no ordered(a,b)
        "a c b",            # ordered = [0,3) with gap 1
    ])
    partials, _l, norms = invert_partition(texts, with_positions=True)
    ctx = SegmentContext(num_docs=4, norms=norms,
                         global_ids=np.arange(4, dtype=np.uint64))
    ctx.with_positions = True
    vocab = partials.column("term").to_pylist()
    for i, t in enumerate(vocab):
        docs_ = np.asarray(partials.column("doc_offsets")[i].values, dtype=np.int64)
        freqs = np.asarray(partials.column("freqs")[i].values, dtype=np.int64)
        pos = [(partials.column("pos_enc")[i].as_py(), freqs)]
        ctx._decoded[t] = TermPostings(docs=docs_, freqs=freqs, pos_chunks=pos)
    ss = SegmentScorer(ctx, {}, {}, {})

    d, s, e = ss._intervals(IOrdered([ITerm("a"), ITerm("b")]))
    assert list(zip(d, s, e)) == [(0, 2, 4), (1, 0, 4), (1, 4, 6), (3, 0, 3)]
    d, s, e = ss._intervals(IOrdered([ITerm("a"), ITerm("b")], max_gaps=0))
    assert list(zip(d, s, e)) == [(0, 2, 4), (1, 4, 6)]
    d, s, e = ss._intervals(IUnordered([ITerm("a"), ITerm("b")], max_gaps=0))
    assert (0, 2, 4) in list(zip(d, s, e)) and (2, 0, 2) in list(zip(d, s, e))
    # containment minimality: doc 0's c at 0 is not inside the minimal [2,4)
    d, _s, _e = ss._intervals(
        IContaining(IOrdered([ITerm("a"), ITerm("b")]), ITerm("c"))
    )
    assert list(d) == [3]
    d, _s, _e = ss._intervals(
        INotContaining(IOrdered([ITerm("a"), ITerm("b")]), ITerm("c"))
    )
    assert sorted(set(d)) == [0, 1]
    d, s, e = ss._intervals(
        IContainedBy(ITerm("c"), IOrdered([ITerm("a"), ITerm("b")]))
    )
    assert list(zip(d, s, e)) == [(3, 1, 2)]
    d, s, e = ss._intervals(IOr([ITerm("a"), ITerm("b")]))
    assert len(d) == 11  # every a/b occurrence, minimal (all unit)
