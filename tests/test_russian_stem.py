"""Russian light stemmer (Dolamic & Savoy) parity: a deterministic sample
of Lucene's own rulight.txt golden vocabulary (the full 49,673-pair file
was checked exact during development), plus chain integration."""
from lucene_ray.analysis.filters import build_filters
from lucene_ray.analysis.lang import SUPPORTED_LANGUAGES, russian_light_stem

GOLDEN = [
    ("благословением", "благословен"),
    ("бобика", "бобик"),
    ("бойкого", "бойк"),
    ("вовлечен", "вовлечен"),
    ("двенадцатого", "двенадцат"),
    ("дворника", "дворник"),
    ("дерзости", "дерзост"),
    ("довериться", "доверитьс"),
    ("древен", "древен"),
    ("жестокости", "жестокост"),
    ("жили", "жил"),
    ("законных", "закон"),
    ("записная", "записн"),
    ("засохшими", "засохш"),
    ("командора", "командор"),
    ("кормилица", "кормилиц"),
    ("меленьким", "меленьк"),
    ("недель", "недел"),
    ("несчастному", "несчастн"),
    ("осилил", "осилил"),
    ("откладывая", "откладыв"),
    ("переползанье", "переползан"),
    ("подымать", "подымат"),
    ("портной", "портн"),
    ("поступков", "поступк"),
    ("препочтенный", "препочтен"),
    ("прими", "при"),
    ("пробудился", "пробудилс"),
    ("рисуешь", "рисуеш"),
    ("росный", "росн"),
    ("снег", "снег"),
    ("составляют", "составляют"),
    ("тициана", "тициан"),
    ("топоров", "топор"),
    ("угадала", "угадал"),
    ("физиономию", "физионом"),
]


def test_golden_sample():
    for word, stem in GOLDEN:
        assert russian_light_stem(word) == stem, word


def test_non_cyrillic_passthrough():
    assert russian_light_stem("hash_join42") == "hash_join42"
    assert russian_light_stem("ab") == "ab"


def test_registered_pack():
    assert "ru" in SUPPORTED_LANGUAGES
    (f,) = build_filters([("light_stem", {"lang": "ru"})])
    assert f.map_term("дворника") == "дворник"
    assert f.spec == ("light_stem", {"lang": "ru"})
