"""Index-time multi-word synonyms (invert._inject_phrase_synonyms) — the
SynonymGraphFilter + FlattenGraphFilter contraction chain."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.invert import invert_partition

DOCS = pa.array([
    "i love new york in summer",
    "new york new york",
    "york new haven",
    "plain text no match",
])
RULES = ((("new", "york"), "ny"),)


def _stats(part):
    return {t: (df, ttf) for t, df, ttf in zip(
        part["term"].to_pylist(), part["df"].to_pylist(),
        part["ttf"].to_pylist())}


def test_contraction_df_ttf():
    part, lens, norms = invert_partition(DOCS, phrase_synonyms=RULES)
    d = _stats(part)
    assert d["ny"] == (2, 3)          # docs 0,1; doc 1 has two matches
    assert d["new"] == (3, 4)         # source tokens kept
    assert d["york"] == (3, 4)


def test_injection_outside_norms():
    plain, lens0, norms0 = invert_partition(DOCS)
    part, lens, norms = invert_partition(DOCS, phrase_synonyms=RULES)
    assert np.array_equal(lens, lens0)
    assert np.array_equal(norms, norms0)


def test_synonym_position_is_phrase_start():
    from lucene_ray.codec.postings import decode_positions

    part, _, _ = invert_partition(DOCS, phrase_synonyms=RULES)
    rows = {t: i for i, t in enumerate(part["term"].to_pylist())}
    for term, want in (("ny", {0: [2], 1: [0, 2]}),
                       ("new", {0: [2], 1: [0, 2], 2: [1]})):
        i = rows[term]
        docs = part["doc_offsets"][i].as_py()
        freqs = np.asarray(part["freqs"][i].as_py(), dtype=np.int64)
        pos = decode_positions(part["pos_enc"][i].as_py(), freqs)
        got = {}
        off = 0
        for dd, f in zip(docs, freqs):
            got[dd] = list(pos[off:off + f])
            off += f
        assert got == want, (term, got)


def test_adjacency_required():
    # 'york new' (reverse order) and non-adjacent 'new ... york' never match
    docs = pa.array(["york then new", "new haven york"])
    part, _, _ = invert_partition(docs, phrase_synonyms=RULES)
    assert "ny" not in part["term"].to_pylist()


def test_single_token_rule_and_multi_output_rejected():
    docs = pa.array(["alpha beta"])
    part, _, _ = invert_partition(
        docs, phrase_synonyms=((("alpha",), "a1"),))
    assert "a1" in part["term"].to_pylist()
    with pytest.raises(ValueError):
        invert_partition(docs,
                         phrase_synonyms=((("alpha", "beta"), ("x", "y")),))


def test_offsets_span_whole_phrase():
    docs = pa.array(["say new york now"])
    part, _, _ = invert_partition(docs, phrase_synonyms=RULES,
                                  with_offsets=True)
    rows = {t: i for i, t in enumerate(part["term"].to_pylist())}
    from lucene_ray.codec.postings import decode_offsets

    i = rows["ny"]
    freqs = np.asarray(part["freqs"][i].as_py(), dtype=np.int64)
    starts, ends = decode_offsets(part["off_enc"][i].as_py(), freqs)
    text = "say new york now"
    assert text[starts[0]:ends[0]] == "new york"


def test_rule_through_filter_chain():
    # rules match the ANALYZED stream: with a porter stemmer ahead,
    # 'running shoes' arrives as 'run shoe'
    from lucene_ray.analysis.filters import build_filters

    docs = pa.array(["my running shoes are red"])
    part, _, _ = invert_partition(
        docs, token_filters=build_filters((("porter_stem",),)),
        phrase_synonyms=((("run", "shoe"), "sneaker"),))
    assert "sneaker" in part["term"].to_pylist()
