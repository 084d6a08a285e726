"""Soundex / PhoneticFilter: commons-codec US_ENGLISH vectors, inject
semantics, inversion integration."""

import numpy as np
import pyarrow as pa

from lucene_ray.analysis.filters import PhoneticFilter, build_filters, soundex
from lucene_ray.index.invert import invert_partition


def test_soundex_reference_vectors():
    # commons-codec SoundexTest / Knuth examples
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"   # H transparent: S..C collapse
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"    # vowel resets; CZ collapses
    assert soundex("Pfister") == "P236"    # PF collapses to P
    assert soundex("Honeyman") == "H555"
    assert soundex("Tymek") == "T520"      # zero padding
    assert soundex("a") == "A000"
    assert soundex("1234") == ""           # no letters -> no code


def test_inject_semantics():
    f = PhoneticFilter()
    assert f.map_term("robert") == "robert"
    assert f.synonyms("robert") == ("r163",)
    assert f.synonyms("x123_y") == ()      # non-alpha: no code
    rep = PhoneticFilter(inject=False)
    assert rep.map_term("robert") == "r163"
    assert rep.synonyms("robert") == ()


def test_invert_with_phonetic_codes():
    docs = pa.array(["robert called", "rupert phoned"], pa.string())
    part, lengths, norms = invert_partition(
        docs, token_filters=build_filters((("phonetic", {"inject": True}),))
    )
    terms = part.column("term").to_pylist()
    # originals survive; both names share one code with df=2
    assert {"robert", "rupert", "r163"} <= set(terms)
    i = terms.index("r163")
    assert part.column("df")[i].as_py() == 2
    # field lengths unaffected by injection
    assert lengths.tolist() == [2, 2]
