"""ICUFoldingFilter behavior (UTR#30-style NFKC_CaseFold + diacritic
removal via unicodedata): known mappings, idempotence, and the derived
folded-index contract entry's invariant."""
import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.analysis.filters import ICUFoldingFilter, build_filters

F = ICUFoldingFilter()


def test_known_mappings():
    assert F.map_term("Jöín") == "join"
    assert F.map_term("CAFÉ") == "cafe"
    assert F.map_term("ĤÅŠĤ") == "hash"
    assert F.map_term("ﬁle") == "file"          # NFKC ligature expansion
    assert F.map_term("STRASSE") == "strasse"
    assert F.map_term("straße") == "strasse"     # ß casefolds to ss
    # Greek: accents stripped, final sigma casefolds to σ (as NFKC_CaseFold)
    assert F.map_term("Σίσυφος") == "σισυφοσ"
    assert F.map_term("İstanbul") == "istanbul"  # dotted capital I
    assert F.map_term("plain_ascii_42") == "plain_ascii_42"


def test_ascii_uppercase_folds():
    assert F.map_term("Hello") == "hello"


@settings(max_examples=300)
@given(st.text(alphabet=st.characters(min_codepoint=0x20,
                                      max_codepoint=0x2FFF), max_size=20))
def test_idempotent(s):
    once = F.map_term(s)
    assert F.map_term(once) == once


@settings(max_examples=300)
@given(st.text(alphabet=st.characters(min_codepoint=0x20,
                                      max_codepoint=0x2FFF), max_size=20))
def test_no_marks_and_casefolded(s):
    out = F.map_term(s)
    assert not any(unicodedata.combining(c) for c in out)
    assert out == out.casefold() or not out.isascii()


def test_spec_roundtrip():
    (f,) = build_filters([("icu_fold",)])
    assert isinstance(f, ICUFoldingFilter)
    assert f.map_term("Jöín") == "join"
