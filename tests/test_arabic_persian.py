"""Arabic normalizer + light10 stemmer and Persian normalizer
(analysis/lang.py) — hand-checked against the published algorithms
(Larkey et al. 2002; ArabicNormalizer/ArabicStemmer/PersianNormalizer in
lucene/analysis/common)."""

from lucene_ray.analysis.filters import build_filters
from lucene_ray.analysis.lang import (
    LightStemFilter,
    arabic_light_stem,
    arabic_normalize,
    language_pack,
    persian_normalize,
)


def test_arabic_normalize_alef_variants():
    assert arabic_normalize("أحمد") == "احمد"
    assert arabic_normalize("إسلام") == "اسلام"
    assert arabic_normalize("آخر") == "اخر"


def test_arabic_normalize_diacritics_and_tatweel():
    assert arabic_normalize("مُحَمَّد") == "محمد"
    assert arabic_normalize("كـتاب") == "كتاب"


def test_arabic_normalize_maksura_and_marbuta():
    assert arabic_normalize("مصطفى") == "مصطفي"
    assert arabic_normalize("مكتبة") == "مكتبه"


def test_arabic_normalize_ascii_passthrough():
    assert arabic_normalize("hello") == "hello"
    assert arabic_normalize("") == ""


def test_arabic_stem_definite_articles():
    assert arabic_light_stem("الكتاب") == "كتاب"
    assert arabic_light_stem("والكتاب") == "كتاب"
    assert arabic_light_stem("بالكتاب") == "كتاب"
    assert arabic_light_stem("للكتاب") == "كتاب"


def test_arabic_stem_waw_length_guard():
    # waw stripped only when the word keeps >= 3 chars afterwards
    assert arabic_light_stem("وكتاب") == "كتاب"
    assert arabic_light_stem("وما") == "وما"  # len 3: waw kept


def test_arabic_stem_article_length_guard():
    # ال stripped only when >= 2 chars remain
    assert arabic_light_stem("الم") == "الم"


def test_arabic_stem_suffixes():
    assert arabic_light_stem("كتابات") == "كتاب"      # ات
    assert arabic_light_stem("مدرسة") == "مدرس"        # ة via normalize->ه
    assert arabic_light_stem("مسلمون") == "مسلم"      # ون
    assert arabic_light_stem("كتابها") == "كتاب"      # ها


def test_arabic_stem_one_prefix_then_suffixes():
    # prefix strips once; multiple listed suffixes strip in list order
    assert arabic_light_stem("المكتبات") == "مكتب"


def test_persian_normalize():
    # exact PersianNormalizer.java direction: unify TOWARD the arabic
    # forms (keheh -> kaf, farsi yeh -> yeh), per the reference vectors
    assert persian_normalize("کتاب") == "كتاب"      # keheh -> arabic kaf
    assert persian_normalize("علی") == "علي"          # farsi yeh -> yeh
    assert persian_normalize("hello") == "hello"


def test_packs_registered():
    for lang in ("ar", "fa"):
        pack = language_pack(lang)
        assert pack["stopwords"]
        (f,) = build_filters(pack["filter_specs"])
        assert isinstance(f, LightStemFilter)
    assert build_filters([("light_stem", {"lang": "ar"})])[0].map_term(
        "الكتاب") == "كتاب"


def test_hindi_normalize():
    from lucene_ray.analysis.lang import hindi_normalize

    # exact HindiNormalizer: nukta removal AND long-vowel shortening ू->ु
    assert hindi_normalize("ज़रूर") == "जरुर"
    assert hindi_normalize("हँस") == "हंस"          # chandrabindu -> anusvara
    assert hindi_normalize("hello") == "hello"


def test_hindi_stem_matras_and_suffixes():
    from lucene_ray.analysis.lang import hindi_light_stem

    assert hindi_light_stem("लडके") == "लडक"        # े matra
    assert hindi_light_stem("लडकियों") == "लडक"    # ियों (4-char tier)
    # exact HindiStemmer tiers: ाकर is a 3-char suffix (guard len>4)
    assert hindi_light_stem("चलाकर") == "चल"
    # ना is a 2-char suffix at guard len>3 -> the reference's खाना -> खा
    assert hindi_light_stem("खाना") == "खा"
    # too short for any tier: unchanged
    assert hindi_light_stem("ने") == "ने"


def test_hindi_longest_match_single_strip():
    from lucene_ray.analysis.lang import hindi_light_stem

    # len-5 word: only the 1-char tier applies ("ी"), ONE strip
    assert hindi_light_stem("खाएगी") == "खाएग"
    # len-7 word reaches the 4-char tier first (ताएं)
    assert hindi_light_stem("बनाताएं") == "बना"


def test_hindi_pack_registered():
    from lucene_ray.analysis.lang import language_pack

    pack = language_pack("hi")
    assert pack["stopwords"]
    (f,) = build_filters(pack["filter_specs"])
    assert f.map_term("लडके") == "लडक"
