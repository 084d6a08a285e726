"""Compound-word decomposition filters (analysis/compound.py).

Dictionary mode mirrors DictionaryCompoundWordTokenFilter.java's decompose
semantics (every dictionary substring within the size bounds, subwords at
the original position, original kept); hyphenation mode mirrors
HyphenationCompoundWordTokenFilter.java over Liang's pattern algorithm
(spans between odd-priority points, optional dictionary check with the
trailing-'s' retry).
"""

import pytest

from lucene_ray.analysis.compound import (
    DictionaryCompoundFilter,
    HyphenationCompoundFilter,
    HyphenationPatterns,
)
from lucene_ray.analysis.filters import apply_to_vocab, build_filters

DICT = ["donau", "dampf", "schiff", "fahrt", "gesellschaft", "kapitän",
        "rind", "fleisch", "über", "wachung"]


def test_dictionary_decompose_all_matches():
    f = DictionaryCompoundFilter(DICT)
    assert set(f.synonyms("donaudampfschiff")) == {"donau", "dampf", "schiff"}
    assert set(f.synonyms("rindfleisch")) == {"rind", "fleisch"}


def test_dictionary_min_word_size_gate():
    f = DictionaryCompoundFilter(DICT, min_word_size=20)
    assert f.synonyms("donaudampfschiff") == ()


def test_dictionary_subword_size_bounds():
    # max_subword_size below len("gesellschaft") hides that hit
    f = DictionaryCompoundFilter(DICT, max_subword_size=6)
    assert set(f.synonyms("schifffahrtsgesellschaft")) >= {"schiff", "fahrt"}
    assert "gesellschaft" not in f.synonyms("schifffahrtsgesellschaft")
    # min_subword_size above len("rind") hides it
    f2 = DictionaryCompoundFilter(DICT, min_subword_size=5)
    assert "rind" not in f2.synonyms("rindfleisch")
    assert "fleisch" in f2.synonyms("rindfleisch")


def test_dictionary_only_longest_match():
    # overlapping dictionary entries: "schiff" and "schifffahrt"
    d = ["schiff", "schifffahrt", "fahrt"]
    both = DictionaryCompoundFilter(d)
    assert set(both.synonyms("schifffahrtskosten")) == {
        "schiff", "schifffahrt", "fahrt"}
    longest = DictionaryCompoundFilter(d, only_longest_match=True)
    # per start offset only the longest hit stays: at offset 0 that is
    # "schifffahrt" (subsuming "schiff"); "fahrt" starts at 6 and is the
    # longest (only) hit there
    assert set(longest.synonyms("schifffahrtskosten")) == {
        "schifffahrt", "fahrt"}


def test_dictionary_whole_token_not_emitted():
    f = DictionaryCompoundFilter(DICT)
    assert f.synonyms("gesellschaft") == ()


def test_dictionary_illegal_params():
    with pytest.raises(ValueError):
        DictionaryCompoundFilter(DICT, min_word_size=0)
    with pytest.raises(ValueError):
        DictionaryCompoundFilter(DICT, min_subword_size=4, max_subword_size=3)


def test_liang_points_basic():
    # pattern "a1b" makes every a|b gap a legal break (odd priority);
    # "a2b" (even) forbids it
    hp = HyphenationPatterns(["a1b"])
    assert hp.hyphenation_points("aab", left_min=1, right_min=1) == [2]
    hp2 = HyphenationPatterns(["a1b", "aa2b"])
    # the higher even digit from the longer pattern overrides the odd one
    assert hp2.hyphenation_points("aab", left_min=1, right_min=1) == []


def test_liang_edge_anchor():
    # ".ab3c" only applies at the start of a word
    hp = HyphenationPatterns([".ab3c"])
    assert hp.hyphenation_points("abcd", left_min=1, right_min=1) == [2]
    assert hp.hyphenation_points("xabcd", left_min=1, right_min=1) == []


def test_liang_margins():
    hp = HyphenationPatterns(["a1b"])
    # break between positions 1|2 blocked by left_min=2
    assert hp.hyphenation_points("ab", left_min=2, right_min=2) == []


def test_hyphenation_decompound_with_dict():
    # synthetic patterns put breaks exactly at the morpheme seams
    hp = HyphenationPatterns(["u1d", "f1s"])  # donau|dampf|schiff
    f = HyphenationCompoundFilter(hp, DICT)
    assert set(f.synonyms("donaudampfschiff")) == {"donau", "dampf", "schiff"}


def test_hyphenation_trailing_s_retry():
    # "fahrts" span is not in the dict; the Java retries minus trailing 's'
    hp = HyphenationPatterns(["f3f1f", "s1g"])  # schiff|fahrts|gesellschaft
    f = HyphenationCompoundFilter(hp, DICT + ["schiff", "fahrt"],
                                  max_subword_size=20)
    syns = set(f.synonyms("schifffahrtsgesellschaft"))
    assert "fahrt" in syns and "gesellschaft" in syns and "schiff" in syns


def test_hyphenation_no_dict_emits_spans():
    hp = HyphenationPatterns(["u1d", "f1s"])
    f = HyphenationCompoundFilter(hp, dictionary=None, max_subword_size=11)
    syns = set(f.synonyms("donaudampfschiff"))
    # adjacent spans and their concatenations within the size bound
    assert {"donau", "dampf", "schiff", "donaudampf", "dampfschiff"} == syns


def test_spec_round_trip_dict():
    f = DictionaryCompoundFilter(DICT, 5, 2, 15, True)
    (g,) = build_filters([f.spec])
    assert g.dictionary == f.dictionary
    assert g.only_longest_match is True
    assert g.synonyms("donaudampfschiff") == f.synonyms("donaudampfschiff")


def test_spec_round_trip_hyph():
    hp = HyphenationPatterns(["u1d", "f1s", ".ab3c", "aa2b"])
    f = HyphenationCompoundFilter(hp, DICT, 5, 2, 15, False)
    (g,) = build_filters([f.spec])
    assert g.patterns.table == f.patterns.table
    assert g.synonyms("donaudampfschiff") == f.synonyms("donaudampfschiff")


def test_chain_integration_same_position_injection():
    f = DictionaryCompoundFilter(DICT)
    mapped, extra, dropped = apply_to_vocab(
        (f,), ["donaudampfschiff", "hello"])
    assert mapped == ["donaudampfschiff", "hello"]
    assert set(extra[0]) == {"donau", "dampf", "schiff"}
    assert extra[1] == ()
    assert dropped == [False, False]
