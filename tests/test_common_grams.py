"""CommonGramsFilter analog (invert._inject_common_grams)."""

import numpy as np
import pyarrow as pa

from lucene_ray.index.invert import invert_partition

DOCS = pa.array([
    "the quick brown fox",
    "jump over the lazy dog the end",
    "no common here",
])


def _stats(part):
    return {t: (df, ttf) for t, df, ttf in zip(
        part["term"].to_pylist(), part["df"].to_pylist(),
        part["ttf"].to_pylist())}


def test_grams_on_either_side():
    part, _, _ = invert_partition(DOCS, common_grams=("the",))
    d = _stats(part)
    assert d["the_quick"] == (1, 1)
    assert d["over_the"] == (1, 1)   # common word on the right side too
    assert d["the_lazy"] == (1, 1)
    assert d["the_end"] == (1, 1)
    assert "quick_brown" not in d     # neither side common: no gram


def test_unigrams_kept_and_norms_unchanged():
    plain, lens0, norms0 = invert_partition(DOCS)
    part, lens, norms = invert_partition(DOCS, common_grams=("the",))
    d = _stats(part)
    assert d["the"] == (2, 3)
    assert d["quick"] == (1, 1)
    assert np.array_equal(lens, lens0)
    assert np.array_equal(norms, norms0)


def test_gram_position_is_first_token():
    from lucene_ray.codec.postings import decode_positions

    part, _, _ = invert_partition(DOCS, common_grams=("the",))
    rows = {t: i for i, t in enumerate(part["term"].to_pylist())}
    i = rows["over_the"]
    freqs = np.asarray(part["freqs"][i].as_py(), dtype=np.int64)
    pos = decode_positions(part["pos_enc"][i].as_py(), freqs)
    assert list(pos) == [1]  # "jump over the ..." -> 'over' at position 1


def test_gram_offsets_span_pair():
    from lucene_ray.codec.postings import decode_offsets

    part, _, _ = invert_partition(DOCS, common_grams=("the",),
                                  with_offsets=True)
    rows = {t: i for i, t in enumerate(part["term"].to_pylist())}
    i = rows["the_quick"]
    freqs = np.asarray(part["freqs"][i].as_py(), dtype=np.int64)
    starts, ends = decode_offsets(part["off_enc"][i].as_py(), freqs)
    assert "the quick brown fox"[starts[0]:ends[0]] == "the quick"


def test_no_common_words_noop():
    part, _, _ = invert_partition(DOCS, common_grams=("zzz",))
    assert not any("_" in t and t != "_" for t in part["term"].to_pylist())


def test_query_rewrite_matches_phrase(tmp_path):
    """CommonGramsQueryFilter parity: the gram term lookup on a
    common-grams index returns exactly the docs the positional phrase
    returns on a plain index."""
    import pyarrow.parquet as pq

    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.pipelines.fulltext import (
        rewrite_phrase_with_common_grams)
    from lucene_ray.search.query import PhraseQuery
    from lucene_ray.search.searcher import Searcher

    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "content": pa.array([
            "the quick brown fox",
            "quick the end game",
            "nothing here",
            "the quick and the dead",
            "a the b",
            "quick the quick",
        ]),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)

    plain_dir = str(tmp_path / "plain")
    gram_dir = str(tmp_path / "gram")
    build_index(src, plain_dir, IndexConfig(partitions_per_segment=2, id_cols=("doc_id",)),
                resume=False)
    build_index(src, gram_dir,
                IndexConfig(partitions_per_segment=2, id_cols=("doc_id",),
                            common_grams=("the",)), resume=False)

    q = rewrite_phrase_with_common_grams(["the", "quick"], {"the"})
    assert q is not None
    gram_hits = sorted(Searcher(IndexReader(gram_dir)).search(
        q, 10).doc_ids.tolist())
    phrase_hits = sorted(Searcher(IndexReader(plain_dir)).search(
        PhraseQuery(("the", "quick")), 10).doc_ids.tolist())
    assert gram_hits == phrase_hits == [0, 3, 5]
    # non-rewritable shapes fall back
    assert rewrite_phrase_with_common_grams(["a", "b", "c"], {"a"}) is None
    assert rewrite_phrase_with_common_grams(["x", "y"], {"the"}) is None
