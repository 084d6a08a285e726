"""ReverseStringFilter / ElisionFilter / DecimalDigitFilter unit tests."""

from lucene_ray.analysis.filters import (
    DecimalDigitFilter,
    ElisionFilter,
    ReverseStringFilter,
    apply_to_vocab,
    build_filters,
)


def test_reverse_maps_every_token():
    f = ReverseStringFilter()
    assert f.map_term("hello") == "olleh"
    assert f.map_term("a") == "a"
    assert f.map_term("") == ""


def test_reverse_prefix_equals_suffix():
    # the mirror-field property: reversed(t).startswith(reversed(suffix))
    # iff t.endswith(suffix)
    f = ReverseStringFilter()
    terms = ["nation", "station", "nations", "nothing", "tion"]
    suffix = "tion"
    by_prefix = [t for t in terms
                 if f.map_term(t).startswith(suffix[::-1])]
    by_suffix = [t for t in terms if t.endswith(suffix)]
    assert by_prefix == by_suffix


def test_elision_default_articles():
    f = ElisionFilter()
    assert f.map_term("l'avion") == "avion"
    assert f.map_term("d'art") == "art"
    assert f.map_term("qu'il") == "il"
    assert f.map_term("jusqu'ici") == "ici"
    # typographic apostrophe too (ElisionFilter checks both in Lucene's
    # FrenchAnalyzer chain via the char filter; we accept both directly)
    assert f.map_term("l’avion") == "avion"


def test_elision_non_article_untouched():
    f = ElisionFilter()
    # 'o' is not in the default French articles
    assert f.map_term("o'brien") == "o'brien"
    assert f.map_term("rock'n") == "rock'n"
    # apostrophe at the very end: nothing to elide
    assert f.map_term("l'") == "l'"
    assert f.map_term("avion") == "avion"


def test_elision_custom_articles():
    f = ElisionFilter(["o"])
    assert f.map_term("o'brien") == "brien"
    assert f.map_term("l'avion") == "l'avion"


def test_decimal_digit_folds_nd():
    f = DecimalDigitFilter()
    assert f.map_term("٣١٤") == "314"          # Arabic-Indic
    assert f.map_term("१२३") == "123"          # Devanagari
    assert f.map_term("x٥y") == "x5y"
    assert f.map_term("abc123") == "abc123"    # ASCII untouched


def test_spec_round_trips():
    for f in (ReverseStringFilter(), ElisionFilter(["o", "l"]),
              DecimalDigitFilter()):
        (g,) = build_filters([f.spec])
        assert type(g) is type(f)
        for probe in ("l'avion", "o'brien", "١٢", "hello"):
            assert g.map_term(probe) == f.map_term(probe)


def test_chain_reverse_applies_to_vocab():
    mapped, extra, dropped = apply_to_vocab(
        (ReverseStringFilter(),), ["abc", "de"])
    assert mapped == ["cba", "ed"]
    assert dropped == [False, False]


def test_truncate():
    from lucene_ray.analysis.filters import TruncateTokenFilter

    f = TruncateTokenFilter(4)
    assert f.map_term("tokenizer") == "toke"
    assert f.map_term("abc") == "abc"
    (g,) = build_filters([f.spec])
    assert g.map_term("tokenizer") == "toke"
    import pytest as _pt
    with _pt.raises(ValueError):
        TruncateTokenFilter(0)


def test_pattern_replace():
    from lucene_ray.analysis.filters import PatternReplaceFilter

    f = PatternReplaceFilter(r"[0-9]+", "#")
    assert f.map_term("a1b22c") == "a#b#c"
    first = PatternReplaceFilter(r"[0-9]+", "#", replace_all=False)
    assert first.map_term("a1b22c") == "a#b22c"
    (g,) = build_filters([f.spec])
    assert g.map_term("a1b22c") == "a#b#c"


def test_pattern_capture_groups():
    from lucene_ray.analysis.filters import PatternCaptureGroupFilter

    # camelCase splitter: the canonical PatternCaptureGroupTokenFilter use
    f = PatternCaptureGroupFilter([r"([a-z]+)", r"([A-Z][a-z]*)"])
    assert set(f.synonyms("camelCaseToken")) == {
        "camel", "ase", "oken", "Case", "Token"}
    # whole-token group is not re-emitted
    assert f.synonyms("lower") == ()
    (g,) = build_filters([f.spec])
    assert g.synonyms("fooBar") == f.synonyms("fooBar")
