"""Language packs — concrete instances of the analysis "zoo" seam (SURVEY §2.2).

Lucene ships ~40 per-language analyzers in analysis/common
(``org.apache.lucene.analysis.{en,fr,de,es,it}.*Analyzer``), each a chain of
tokenizer → lowercase → stopwords → (elision) → stemmer. This module provides
the same shape for nine languages (en fr de es it pt sv no cs) over the
engine's pinned ASCII tokenizer grammar:

- **stopword sets** — compact versions of the classic public-domain function-
  word lists the Snowball project distributes (behavioral reference:
  ``lucene/analysis/common/src/resources/org/apache/lucene/analysis/snowball/
  *_stop.txt``). Trimmed to the high-frequency core; extend per corpus.
- **minimal/light stemmers** — reimplementations of the published
  minimal-stemming family (J. Savoy, "Light stemming approaches for the
  French, Portuguese, German and Hungarian languages", ACM SAC 2006; and the
  classic s-stemmer for English). Behavioral references:
  ``EnglishMinimalStemmer.java``, ``FrenchMinimalStemmer.java``,
  ``GermanMinimalStemmer.java``, ``SpanishLightStemmer.java``,
  ``ItalianLightStemmer.java`` in ``lucene/analysis/common``. These are
  rule-for-rule *reimplementations from the published algorithms*, not ports
  of the Java sources; where the published variants differ we pin the rules
  documented in each function's docstring (the unit tests are the contract).
- **elision** — French/Italian elided articles (l', d', qu', un'…) are listed
  as stopwords instead of an ElisionFilter: the pinned grammar splits at the
  apostrophe, so the article arrives as its own 1-2 char token.

Accented input caveat: the pinned tokenizer is ASCII-only, so non-ASCII
letters split tokens ("café" → "caf"). Pair a pack with the build-side
``fold_text`` char-fold (NFKD + strip combining marks BEFORE tokenization,
MappingCharFilter position in Lucene's chain) to index accented Latin text;
the pack's stemmers then see the folded ASCII forms, which is also why the
rule sets below are written against folded spellings (e.g. French "é" → "e").
"""

from __future__ import annotations

from lucene_ray.analysis.filters import TokenFilter

# ---------------------------------------------------------------------------
# Stopword sets (folded-ASCII spellings, matching the fold_text pipeline)
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, frozenset] = {
    # Arabic/Persian: high-frequency core of the Snowball-distributed lists
    # (ar_stop / fa_stop shipped with lucene/analysis/common)
    "ar": frozenset(
        "من في على و ان الى عن مع هذا هذه ذلك التي الذي لا ما كان كانت هو هي"
        .split()
    ),
    "fa": frozenset(
        "و در به از که این آن را با برای است بود شد هم نیز تا بر او ما"
        .split()
    ),
    "hi": frozenset(
        "का की के में है हैं को पर से और एक यह वह भी नहीं था थी तो ही कि"
        .split()
    ),
    "en": frozenset(
        """a an and are as at be but by for if in into is it no not of on or
        such that the their then there these they this to was will with"""
        .split()
    ),
    "fr": frozenset(
        """au aux avec ce ces dans de des du elle en et eux il ils je la le
        les leur lui ma mais me meme mes moi mon ne nos notre nous on ou par
        pas pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
        votre vous c d j l m n s t y etre avoir est sont sera ete"""
        .split()
    ),
    "de": frozenset(
        """aber alle als also am an auch auf aus bei bin bis bist da damit
        dann das dass dein deine dem den der des dich die dir doch dort du
        durch ein eine einem einen einer eines er es euer eure fur hatte
        hatten hier hin ich ihr ihre im in ist ja jede jedem jeden jeder
        jedes kann kein konnen mein meine mit muss nach nicht noch nun nur ob
        oder ohne sehr sein seine sich sie sind so uber um und uns unser
        unter viel vom von vor wann war waren was weiter wenn wer werde
        werden wie wieder will wir wird wirst wo zu zum zur"""
        .split()
    ),
    "es": frozenset(
        """a al algo como con contra cual cuando de del desde donde durante e
        el ella ellas ellos en entre era es esa ese eso esta estas este esto
        estos fue ha han hasta hay la las le les lo los mas me mi mis mucho
        muy nada ni no nos nosotros o os otra otro para pero poco por porque
        que quien se sin sobre son su sus tambien te tiene todo tu tus un una
        uno unos y ya yo"""
        .split()
    ),
    "it": frozenset(
        """a ad agli ai al alla alle allo anche che chi ci come con contro da
        dagli dai dal dalla dalle dallo degli dei del della delle dello di e
        ed era essere fra gli ha hanno il in io la le lei lo loro lui ma mi
        ne nei nel nella no noi non nostro o per perche piu quale quando
        quella quelle quello questa queste questo qui se sei si sia siamo
        sono sotto su sua sue sugli sui sul sulla suo tra tu tua tue tuo un
        una uno voi vostro d l un qu c s n m t v"""
        .split()
    ),
    "pt": frozenset(
        """a ao aos as com como da das de dela dele deles demais do dos e ela
        elas ele eles em entre era essa essas esse esses esta estas este
        estes eu foi for isso isto ja la mais mas me mesmo meu minha muito na
        nao nas nem no nos nossa nosso num numa o os ou para pela pelas pelo
        pelos por qual quando que quem se sem ser seu seus so sua suas tambem
        te tem teu tu tua tudo um uma voce vos"""
        .split()
    ),
    "sv": frozenset(
        """alla allt att av blev bli blir da de dem den denna deras dess det
        detta dig din dina ditt du dar efter ej eller en er era ert ett fran
        for ha hade han hans har hon honom hur har i icke ingen inom inte jag
        ju kan kunde man med mellan men mig min mina mitt mot mycket ni nu
        nar och om oss pa samma sedan sig sin sina sitta sjalv skulle som sa
        sadan till under upp ut utan vad var vara varfor varit varje vars
        vart vem vi vid vilken"""
        .split()
    ),
    "no": frozenset(
        """alle at av bare begge ble da de dem den denne der dere deres det
        dette du eller en er et etter for fra ha hadde han hans har henne
        hennes her hun hva hvem hvis hvor i ikke ingen inn jeg kan kun la
        man med meg mellom men mer mest min mitt mot mye na noen noe og om
        opp oss over pa sa seg selv sin sitt skal skulle som til ut uten var
        vi vil ville vore vart"""
        .split()
    ),
    "cs": frozenset(
        """a aby ale ani az bez bude budem budes by byl byla byli bylo byt co
        coz cz dalsi do ho i ja jak jake je jeho jej jeji jejich jen jeste ji
        jine jiz jsem jses jsme jsou jste k kam kde kdo kdyz ke ktera ktere
        kteri kterou ktery ma mate me mezi mi mit muj muze my na nad nam nas
        nasi ne nebo nejsou neni nez nic nove novy o od ode on ona oni ono
        pak po pod podle pokud pouze prave pred pres pri pro proc proto
        protoze prvni pta s se si sve svych svym ta tak take tato te tedy
        tema ten tento teto tim timto to tohle toho tomto tomu tu tuto ty
        tyto u uz v vam vas vase ve vice vsak z za zde ze"""
        .split()
    ),
    # the snowball-project Russian stoplist Lucene's RussianAnalyzer
    # ships as its default (analysis/common/src/resources/.../snowball/
    # russian_stop.txt, comments stripped)
    "ru": frozenset(
        """и в во не что он на я с со как а то все она так его но да ты к у
        же вы за бы по только ее мне было вот от меня еще нет о из ему
        теперь когда даже ну вдруг ли если уже или ни быть был него до вас
        нибудь опять уж вам сказал ведь там потом себя ничего ей может они
        тут где есть надо ней для мы тебя их чем была сам чтоб без будто
        человек чего раз тоже себе под жизнь будет ж тогда кто этот
        говорил того потому этого какой совсем ним здесь этом один почти
        мой тем чтобы нее кажется сейчас были куда зачем сказать всех
        никогда сегодня можно при наконец два об другой хоть после над
        больше тот через эти нас про всего них какая много разве сказала
        три эту моя впрочем хорошо свою этой перед иногда лучше чуть том
        нельзя такой им более всегда конечно всю между"""
        .split()
    ),
    "fi": frozenset(
        """ja ei se on etta oli han mutta joka ovat kun niin myos hanen sita
        mita jos kuin minka tai ole olla seka eli nyt siis sen sille jo ne
        me he te ken kenen nama noilla naita sina mina taman"""
        .split()
    ),
    "hu": frozenset(
        """a az es hogy nem is egy van de meg csak mar ha mint ki volt vagy
        el fel ezt ebben azt itt mert o ok mi ti en te ez azok ezek amely
        aki ami akik amik lesz lenni volna ugy ott mindig minden"""
        .split()
    ),
    # Latvian / Indonesian function words (the lv/id stopwords.txt class)
    "lv": frozenset(
        """un ar uz no par kā ir bija tiek tika bet ja vai šis šī tas tā
        es tu viņš viņa mēs jūs viņi kas ko kur kad jau vēl tikai arī
        pie pēc līdz bez pret caur starp"""
        .split()
    ),
    "id": frozenset(
        """yang dan di ke dari untuk pada dengan dalam adalah ini itu
        tidak akan ada atau juga sudah telah bisa dapat oleh sebagai
        karena jika maka kami kita mereka saya dia anda bahwa hanya
        lebih masih harus saat seperti antara namun tetapi"""
        .split()
    ),
    # Sorani Kurdish function words (conjunctions, prepositions,
    # demonstratives — the ckb/stopwords.txt class of words)
    "ckb": frozenset(
        """و لە بە بۆ کە لەگەڵ ئەم ئەو هەر هەموو ئێمە ئێوە ئەوان من تۆ
        ناو سەر دوای پێش بەڵام یان نە تا کو چی کێ چۆن بوو دەبێت هەیە نیە
        وەک تر هیچ چەند لەو لەم بەو بەم دا دە لا"""
        .split()
    ),
}

# Nynorsk shares the Norwegian function-word set
STOPWORDS["nn"] = STOPWORDS["no"]

# Bulgarian / Bengali / Telugu function words (the bg/bn/te stopwords.txt
# class of words)
STOPWORDS["bg"] = frozenset(
    """и в на с за от по но или а че това той тя то те ние вие аз ти се си
    му ѝ им ги го я не да ще е са бе ли как кога къде защо какво кой която
    което които при като след преди между през без във със до из над под"""
    .split()
)
STOPWORDS["bn"] = frozenset(
    """এবং ও আর কিন্তু বা যে এই সে তার তাদের আমি আমরা তুমি আপনি এটা ওটা
    একটি করে করা হয় হয়েছে ছিল আছে নেই না হবে থেকে জন্য সাথে মধ্যে উপর
    নিচে আগে পরে যদি তবে কেন কি কোথায় কখন কীভাবে"""
    .split()
)
STOPWORDS["gl"] = frozenset(
    """a o as os un unha uns unhas e ou de do da dos das en no na nos nas
    por para con sen que se non é son foi era ser estar este esta estes
    estas ese esa eses esas aquel aquela eu ti el ela nós vós eles elas
    lle lles me che nos vos ao á aos ás polo pola polos polas"""
    .split()
)
STOPWORDS["te"] = frozenset(
    """మరియు కానీ లేదా అని ఈ ఆ అది ఇది నేను మేము మీరు వారు తన వారి నా మా
    మీ కాదు లేదు ఉంది ఉన్న చేసి నుండి కోసం తో లో పై కింద ముందు తరువాత
    ఎందుకు ఏమి ఎక్కడ ఎప్పుడు ఎలా"""
    .split()
)


# ---------------------------------------------------------------------------
# Minimal / light stemmers (pure functions on folded lowercase ASCII terms)
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


def english_minimal_stem(t: str) -> str:
    """Plural-only s-stemmer (EnglishMinimalStemmer.java shape): strip a
    final 's' from words of length >= 4 unless it follows 'u' or another
    's' ("genus", "class" keep theirs)."""
    if len(t) < 4 or t[-1] != "s" or t[-2] in ("u", "s"):
        return t
    return t[:-1]


def french_minimal_stem(t: str) -> str:
    """Savoy's minimal French stemmer — exact FrenchMinimalStemmer.java
    behavior (golden-verified on the reference frminimaltestdata
    vocabulary): words >= 6 chars; final 'x' drops ('aux' -> 'al'); else
    strip in sequence a trailing 's', 'r', 'e', 'é', then collapse a
    doubled final letter ("chevaux"->"cheval", "abandonnée"->"abandon")."""
    if len(t) < 6:
        return t
    if t[-1] == "x":
        if t[-3] == "a" and t[-2] == "u":
            return t[:-2] + "l"
        return t[:-1]
    if t[-1] == "s":
        t = t[:-1]
    if t[-1] == "r":
        t = t[:-1]
    if t[-1] == "e":
        t = t[:-1]
    if t[-1] == "é":
        t = t[:-1]
    if len(t) >= 2 and t[-1] == t[-2] and t[-1].isalpha():
        t = t[:-1]
    return t


_DE_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(t: str) -> str:
    """Savoy's minimal German stemmer — exact GermanMinimalStemmer.java
    behavior (golden-verified on deminimaltestdata): words >= 5 chars;
    fold umlauts; strip 'nen' (len>6), else a paired 'en'/'se'/'es'/'er'
    (len>5), else a single final 'n'/'e'/'s'/'r'."""
    if len(t) < 5:
        return t
    t = t.translate(_DE_FOLD)
    if len(t) > 6 and t.endswith("nen"):
        return t[:-3]
    if len(t) > 5:
        a, b = t[-1], t[-2]
        if (a == "n" and b == "e") or (a == "e" and b == "s") or \
           (a == "s" and b == "e") or (a == "r" and b == "e"):
            return t[:-2]
    if t[-1] in "nesr":
        return t[:-1]
    return t


_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(t: str) -> str:
    """Light Spanish stemmer — exact SpanishLightStemmer.java behavior
    (Savoy CLEF-2001; golden-verified on eslighttestdata): words >= 5
    chars; fold accented vowels; drop a final gender vowel 'o'/'a'/'e';
    for final 's': 'eses' -> 'es', 'ces' -> 'z', or drop 'os'/'as'/'es'."""
    if len(t) < 5:
        return t
    t = t.translate(_ES_FOLD)
    if t[-1] in "oae":
        return t[:-1]
    if t[-1] == "s":
        if t[-2] == "e" and t[-3] == "s" and t[-4] == "e":
            return t[:-2]
        if t[-2] == "e" and t[-3] == "c":
            return t[:-3] + "z"
        if t[-2] in "oae":
            return t[:-2]
    return t


def italian_light_stem(t: str) -> str:
    """Light Italian stemmer — exact ItalianLightStemmer.java behavior
    (golden-verified on itlighttestdata): words >= 6 chars; fold accented
    vowels; drop a final plural/gender vowel, taking the preceding 'i'/'h'
    with it per class ('ie'/'he' -> -2, 'hi'/'ii' -> -2, 'ia' -> -2,
    'io' -> -2, else -1)."""
    if len(t) < 6:
        return t
    t = t.translate(_ES_FOLD)
    last, prev = t[-1], t[-2]
    if last == "e":
        return t[:-2] if prev in "ih" else t[:-1]
    if last == "i":
        return t[:-2] if prev in "hi" else t[:-1]
    if last == "a" or last == "o":
        return t[:-2] if prev == "i" else t[:-1]
    return t


# RSLP "Plural" step (Orengo & Huyck 2001) exactly as the reference encodes
# it in resources/.../pt/portuguese.rslp — ordered (suffix, min_stem,
# replacement, whole-word exceptions); first match fires, step requires
# len >= 3 and a final 's'
_PT_PLURAL_RULES = (
    ("ns", 1, "m", ()),
    ("ões", 3, "ão", ()),
    ("ães", 1, "ão", ("mães",)),
    ("ais", 1, "al", ("cais", "mais")),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ()),
    ("is", 2, "il", ("lápis", "cais", "mais", "crúcis", "biquínis", "pois",
                     "depois", "dois", "leis")),
    ("les", 3, "l", ()),
    ("res", 3, "r", ("árvores",)),
    ("s", 2, "", ("aliás", "pires", "lápis", "cais", "mais", "mas", "menos",
                  "férias", "fezes", "pêsames", "crúcis", "gás", "atrás",
                  "moisés", "através", "convés", "ês", "país", "após",
                  "ambas", "ambos", "messias", "depois")),
)


def portuguese_minimal_stem(t: str) -> str:
    """Plural-only Portuguese reduction — exact PortugueseMinimalStemmer
    behavior (RSLP step 'Plural' of pt/portuguese.rslp via
    RSLPStemmerBase.java Step.apply semantics; golden-verified on
    ptminimaltestdata): first matching rule with sufficient stem length
    and no whole-word exception fires ("balões"->"balão",
    "normais"->"normal", "casas"->"casa")."""
    if len(t) < 3 or t[-1] != "s":
        return t
    for suf, mn, rep, exc in _PT_PLURAL_RULES:
        if len(t) - len(suf) >= mn and t.endswith(suf) and t not in exc:
            return t[: len(t) - len(suf)] + rep
    return t


def swedish_light_stem(t: str) -> str:
    """Light Swedish stemmer — exact SwedishLightStemmer.java behavior
    (Savoy CLEF; golden-verified on svlighttestdata, 30,623 pairs): strip
    a final genitive 's', then ONE ending by descending length
    ('elser'/'heten', then 'arne'/'erna'/'ande'/'else'/'aste'/'orna'/
    'aren', then 'are'/'ast'/'het', then the 2-char set, then a final
    't'/'a'/'e'/'n')."""
    if len(t) > 4 and t[-1] == "s":
        t = t[:-1]
    n = len(t)
    if n > 7 and t.endswith(("elser", "heten")):
        return t[:-5]
    if n > 6 and t.endswith(("arne", "erna", "ande", "else", "aste",
                             "orna", "aren")):
        return t[:-4]
    if n > 5 and t.endswith(("are", "ast", "het")):
        return t[:-3]
    if n > 4 and t.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return t[:-2]
    if n > 3 and t[-1] in "taen":
        return t[:-1]
    return t


def swedish_minimal_stem(t: str) -> str:
    """Minimal Swedish stemmer — exact SwedishMinimalStemmer.java behavior
    (golden-verified on the reference's sv/minimal.txt): noun
    plural/definite reduction only."""
    if len(t) > 4 and t[-1] == "s":
        t = t[:-1]
    n = len(t)
    if n > 6 and t.endswith(("arne", "erna", "arna", "orna", "aren")):
        return t[:-4]
    if n > 5 and t.endswith("are"):
        return t[:-3]
    if n > 4 and t.endswith(("ar", "at", "er", "et", "or", "en")):
        return t[:-2]
    if n > 3 and t[-1] in "aen":
        return t[:-1]
    return t


def norwegian_minimal_stem(t: str, nynorsk: bool = False,
                           bokmaal: bool = True) -> str:
    """Minimal Norwegian stemmer — exact NorwegianMinimalStemmer.java
    behavior (golden-verified on nb_minimal.txt / nn_minimal.txt): genitive
    's', then 'ene' (+Nynorsk 'ane'), then 'er'/'en'/'et' (+Nynorsk 'ar'),
    then a final 'a'/'e'. Default flags = BOKMAAL (the filter's default
    ctor, NorwegianMinimalStemFilter.java:43)."""
    if len(t) > 4 and t[-1] == "s":
        t = t[:-1]
    n = len(t)
    if n > 5 and (t.endswith("ene") or (nynorsk and t.endswith("ane"))):
        return t[:-3]
    if n > 4 and (t.endswith(("er", "en", "et"))
                  or (nynorsk and t.endswith("ar"))):
        return t[:-2]
    if n > 3 and t[-1] in "ae":
        return t[:-1]
    return t


def norwegian_light_stem(t: str, nynorsk: bool = False,
                         bokmaal: bool = True) -> str:
    """Light Norwegian stemmer — exact NorwegianLightStemmer.java behavior
    (golden-verified on nb_light.txt / nn_light.txt): genitive 's', then
    ONE general/adjective/noun ending by descending length with
    Bokmål/Nynorsk-gated alternatives."""
    if len(t) > 4 and t[-1] == "s":
        t = t[:-1]
    n = len(t)
    if n > 7 and ((bokmaal and t.endswith(("heter", "heten")))
                  or (nynorsk and t.endswith("heita"))):
        return t[:-5]
    if n > 8 and nynorsk and t.endswith(("heiter", "leiken", "leikar")):
        return t[:-6]
    if n > 5 and (t.endswith("dom") or (bokmaal and t.endswith("het"))):
        return t[:-3]
    if n > 6 and nynorsk and t.endswith(("heit", "semd", "leik")):
        return t[:-4]
    if n > 7 and t.endswith(("elser", "elsen")):
        return t[:-5]
    if n > 6 and ((bokmaal and t.endswith(("ende", "este", "eren")))
                  or (nynorsk and t.endswith(("ande", "aste", "aren")))
                  or t.endswith("else")):
        return t[:-4]
    if n > 5 and ((bokmaal and t.endswith(("ere", "est")))
                  or (nynorsk and t.endswith(("are", "ast")))
                  or t.endswith("ene")
                  or (nynorsk and t.endswith("ane"))):
        return t[:-3]
    if n > 4 and (t.endswith(("er", "en", "et", "te"))
                  or (nynorsk and t.endswith("ar"))
                  or (bokmaal and t.endswith("st"))):
        return t[:-2]
    if n > 3 and t[-1] in "aen":
        return t[:-1]
    return t


def czech_light_stem(t: str) -> str:
    """Light Czech stemmer — exact CzechStemmer.java behavior (Dolamic &
    Savoy 2009; verified on the reference's full TestCzechStemmer vector
    set): case-ending removal by descending length (accented suffix
    classes), possessive 'ov'/'in'/'ův' removal, then palatalization
    normalization (čt→ck, št→sk, c/č→k, z/ž→h, e-insertion collapse,
    ů→o)."""
    t = _cz_remove_case(t)
    t = _cz_remove_poss(t)
    if t:
        t = _cz_normalize(t)
    return t


def _cz_remove_case(t: str) -> str:
    n = len(t)
    if n > 7 and t.endswith("atech"):
        return t[:-5]
    if n > 6 and t.endswith(("ětem", "etem", "atům")):
        return t[:-4]
    if n > 5 and t.endswith(("ech", "ich", "ích", "ého", "ěmi", "emi",
                             "ému", "ěte", "ete", "ěti", "eti", "ího",
                             "iho", "ími", "ímu", "imu", "ách", "ata",
                             "aty", "ých", "ama", "ami", "ové", "ovi",
                             "ými")):
        return t[:-3]
    if n > 4 and t.endswith(("em", "es", "ém", "ím", "ům", "at", "ám",
                             "os", "us", "ým", "mi", "ou")):
        return t[:-2]
    if n > 3 and t[-1] in "aeiouůyáéíýě":
        return t[:-1]
    return t


def _cz_remove_poss(t: str) -> str:
    if len(t) > 5 and t.endswith(("ov", "in", "ův")):
        return t[:-2]
    return t


def _cz_normalize(t: str) -> str:
    if t.endswith("čt"):
        return t[:-2] + "ck"
    if t.endswith("št"):
        return t[:-2] + "sk"
    if t[-1] in "cč":
        return t[:-1] + "k"
    if t[-1] in "zž":
        return t[:-1] + "h"
    if len(t) > 1 and t[-2] == "e":
        return t[:-2] + t[-1]  # e-insertion collapse (e* > *)
    if len(t) > 2 and t[-2] == "ů":
        return t[:-2] + "o" + t[-1]
    return t


_FI_VOWELS = frozenset("aeiouy")
_FI_FOLD = str.maketrans("äåö", "aao")


def finnish_light_stem(t: str) -> str:
    """Light Finnish stemmer (Savoy, CLEF-2003 monolingual tracks; rule
    shape of FinnishLightStemmer.java in lucene/analysis/common): clitic
    strip (-kin/-ko), -dellinen/-dellisuus, case/possessive endings with
    the s-substitutions (nnen→s, ntena→s, den→s+, ksen→s), then two
    normalization passes (hde→ksi, final t/s/j/e/a/i, long-vowel trim,
    doubled k/p/t collapse). Folds ä/å→a, ö→o first, exactly as
    FinnishLightStemmer.java does (golden-verified on filighttestdata)."""
    if len(t) < 4:
        return t
    t = t.translate(_FI_FOLD)
    # step 1: clitics + -dellinen/-dellisuus
    while True:
        if len(t) > 8 and t.endswith("kin"):
            t = t[:-3]
            continue
        if len(t) > 8 and t.endswith("ko"):
            t = t[:-2]
            continue
        break
    if len(t) > 11:
        if t.endswith("dellinen"):
            t = t[:-8]
        elif t.endswith("dellisuus"):
            t = t[:-9]
    # step 2
    if len(t) > 5:
        if t.endswith(("lla", "tse", "sti")):
            t = t[:-3]
        elif t.endswith("ni"):
            t = t[:-2]
        elif t.endswith("aa"):
            t = t[:-1]
    # step 3: case endings (first matching rule wins, as in the Java chain)
    t = _fi_step3(t)
    # norm 1
    if len(t) > 5 and t.endswith("hde"):
        t = t[:-3] + "ksi"
    if len(t) > 4 and t.endswith(("ei", "at")):
        t = t[:-2]
    elif len(t) > 3 and t[-1] in "tsjeai":
        t = t[:-1]
    # norm 2
    if len(t) > 8 and t[-1] in "eou":
        t = t[:-1]
    if len(t) > 4:
        if t[-1] == "i":
            t = t[:-1]
        if len(t) > 4:
            out = [t[0]]
            for c in t[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            t = "".join(out)
    return t


def _fi_step3(t: str) -> str:
    if len(t) > 8:
        if t.endswith("nnen"):
            return t[:-4] + "s"
        if t.endswith("ntena"):
            return t[:-5] + "s"
        if t.endswith("tten"):
            return t[:-4]
        if t.endswith("eiden"):
            return t[:-5]
    if len(t) > 6:
        if t.endswith(("neen", "niin", "seen", "teen", "inen")):
            return t[:-4]
        if t[-3] == "h" and t[-2] in _FI_VOWELS and t[-1] == "n":
            return t[:-3]
        if t.endswith("den"):
            return t[:-3] + "s"
        if t.endswith("ksen"):
            return t[:-4] + "s"
        if t.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return t[:-3]
    if len(t) > 5:
        if t.endswith(("na", "ne")):
            return t[:-2]
        if t.endswith("nei"):
            return t[:-3]
    if len(t) > 4:
        if t.endswith(("ja", "ta")):
            return t[:-2]
        if t[-1] == "a":
            return t[:-1]
        if t[-1] == "n" and t[-2] in _FI_VOWELS:
            return t[:-2]
        if t[-1] == "n":
            return t[:-1]
    return t


_HU_VOWELS = frozenset("aeiouy")
_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")


def hungarian_light_stem(t: str) -> str:
    """Light Hungarian stemmer (the UniNE algorithm in Savoy, "Light
    Stemming Approaches for the French, Portuguese, German and Hungarian
    Languages", ACM SAC 2006; exact HungarianLightStemmer.java behavior,
    golden-verified on hulighttestdata): fold accents, then case ending →
    possessive → plural → final-vowel normalization, one rule per pass."""
    t = t.translate(_HU_FOLD)
    return _hu_normalize(_hu_plural(_hu_possessive(_hu_case(t))))


def _hu_case(t: str) -> str:
    if len(t) > 6 and t.endswith("kent"):
        return t[:-4]
    if len(t) > 5:
        if t.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return t[:-3]
        if t.endswith(("al", "el")) and t[-3] not in _HU_VOWELS and t[-3] == t[-4]:
            return t[:-3]
    if len(t) > 4:
        if t.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return t[:-2]
        if t.endswith(("on", "en")) and t[-3] not in _HU_VOWELS:
            return t[:-2]
        if t[-1] in "tn":
            return t[:-1]
        if t[-1] in "ae" and t[-2] == t[-3] and t[-2] not in _HU_VOWELS:
            return t[:-2]
    return t


def _hu_possessive(t: str) -> str:
    if len(t) > 6:
        if t[-5] not in _HU_VOWELS and t.endswith(("atok", "otok", "etek")):
            return t[:-4]
        if t.endswith(("itek", "itok")):
            return t[:-4]
    if len(t) > 5:
        if t[-4] not in _HU_VOWELS and t.endswith(("unk", "tok", "tek")):
            return t[:-3]
        if t[-4] in _HU_VOWELS and t.endswith("juk"):
            return t[:-3]
        if t.endswith("ink"):
            return t[:-3]
    if len(t) > 4:
        if t[-3] not in _HU_VOWELS and t.endswith(("am", "em", "om", "ad",
                                                   "ed", "od", "uk")):
            return t[:-2]
        if t[-3] in _HU_VOWELS and t.endswith(("nk", "ja", "je")):
            return t[:-2]
        if t.endswith(("im", "id", "ik")):
            return t[:-2]
    if len(t) > 3:
        if t[-1] in "ae" and t[-2] not in _HU_VOWELS:
            return t[:-1]
        if t[-1] in "md" and t[-2] in _HU_VOWELS:
            return t[:-1]
        if t[-1] == "i":
            return t[:-1]
    return t


def _hu_plural(t: str) -> str:
    if len(t) > 3 and t[-1] == "k":
        if t[-2] in "aoe" and len(t) > 4:
            return t[:-2]
        return t[:-1]
    return t


def _hu_normalize(t: str) -> str:
    if len(t) > 3 and t[-1] in "aeio":
        return t[:-1]
    return t


# Russian light stemmer (Dolamic & Savoy, "Indexing and Searching
# Strategies for the Russian Language", JASIST 2009) — the algorithm of
# lucene/analysis/common/src/java/org/apache/lucene/analysis/ru/
# RussianLightStemmer.java:55-140: case-suffix removal by length tier,
# then a soft-sign / double-н normalization. Parity-tested against a
# sample of Lucene's own rulight.txt golden vocabulary.
_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
         "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
         "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
_RU_1 = frozenset("аеиоуйыяь")


def russian_light_stem(t: str) -> str:
    n = len(t)
    if n > 6 and t.endswith(_RU_4):
        t = t[:-4]
    elif n > 5 and t.endswith(_RU_3):
        t = t[:-3]
    elif n > 4 and t.endswith(_RU_2):
        t = t[:-2]
    elif n > 3 and t[-1] in _RU_1:
        t = t[:-1]
    if len(t) > 3:
        if t[-1] in "ьи":
            t = t[:-1]
        elif t[-1] == "н" and t[-2] == "н":
            t = t[:-1]
    return t


# ---------------------------------------------------------------------------
# Arabic & Persian (non-Latin packs; pair with the uax29 grammar, which
# tokenizes Arabic-script letters — the pinned ASCII grammar cannot)

_AR_DIACRITICS = frozenset("ًٌٍَُِّْ")
_AR_TATWEEL = "ـ"


def arabic_normalize(t: str) -> str:
    """ArabicNormalizer (lucene/analysis/common/src/java/org/apache/lucene/
    analysis/ar/ArabicNormalizer.java:30, after Larkey, Ballesteros &
    Connell 2002 "Improving stemming for Arabic information retrieval"):
    strip tashkeel diacritics and tatweel, fold alef variants (آ أ إ) to
    bare alef ا, alef maksura ى to yeh ي, teh marbuta ة to heh ه."""
    if not t or ord(max(t)) < 0x600:
        return t
    out = []
    for c in t:
        if c in _AR_DIACRITICS or c == _AR_TATWEEL:
            continue
        if c in ("آ", "أ", "إ"):   # آ أ إ -> ا
            c = "ا"
        elif c == "ى":                        # ى -> ي
            c = "ي"
        elif c == "ة":                        # ة -> ه
            c = "ه"
        out.append(c)
    return "".join(out)


_AR_PREFIXES = ("ال",                   # ال
                "وال",             # وال
                "بال",             # بال
                "كال",             # كال
                "فال",             # فال
                "لل",                   # لل
                "و")                         # و
_AR_SUFFIXES = ("ها",                   # ها
                "ان",                   # ان
                "ات",                   # ات
                "ون",                   # ون
                "ين",                   # ين
                "يه",                   # يه
                "ية",                   # ية
                "ه",                         # ه
                "ة",                         # ة
                "ي")                         # ي


def arabic_light_stem(t: str) -> str:
    """Light10 stemmer (Larkey et al. 2002) as pinned by ArabicStemmer
    (lucene/analysis/common/src/java/org/apache/lucene/analysis/ar/
    ArabicStemmer.java:35): normalize, strip ONE definite-article prefix
    (waw only when the word keeps >= 3 chars, articles when >= 2 remain),
    then strip each listed suffix in order while >= 2 chars remain."""
    t = arabic_normalize(t)
    for p in _AR_PREFIXES:
        if t.startswith(p):
            if p == "و":
                if len(t) > 3:
                    t = t[1:]
                    break
            elif len(t) >= len(p) + 2:
                t = t[len(p):]
                break
    for s in _AR_SUFFIXES:
        if t.endswith(s) and len(t) >= len(s) + 2:
            t = t[: -len(s)]
    return t


_HI_NUKTA = {
    "क़": "क", "ख़": "ख", "ग़": "ग", "ज़": "ज",
    "ड़": "ड", "ढ़": "ढ", "फ़": "फ", "य़": "य",
}
# Suffix tiers of the lightweight Hindi stemmer (A. Ramanathan & D. Rao
# 2003, "A Lightweight Stemmer for Hindi") — transcribed codepoint-exact
# from lucene/analysis/common/.../hi/HindiStemmer.java (each suffix's
# length equals its tier's strip count; guards are the Java len gates).
# Verified on the reference's full TestHindiStemmer vector set.
_HI_TIERS = (
    (6, 5, ("\u093e\u090f\u0902\u0917\u0940", "\u093e\u090f\u0902\u0917\u0947", "\u093e\u090a\u0902\u0917\u0940", "\u093e\u090a\u0902\u0917\u093e", "\u093e\u0907\u092f\u093e\u0901", "\u093e\u0907\u092f\u094b\u0902", "\u093e\u0907\u092f\u093e\u0902")),
    (5, 4, ("\u093e\u090f\u0917\u0940", "\u093e\u090f\u0917\u093e", "\u093e\u0913\u0917\u0940", "\u093e\u0913\u0917\u0947", "\u090f\u0902\u0917\u0940", "\u0947\u0902\u0917\u0940", "\u090f\u0902\u0917\u0947", "\u0947\u0902\u0917\u0947", "\u0942\u0902\u0917\u0940", "\u0942\u0902\u0917\u093e", "\u093e\u0924\u0940\u0902", "\u0928\u093e\u0913\u0902", "\u0928\u093e\u090f\u0902", "\u0924\u093e\u0913\u0902", "\u0924\u093e\u090f\u0902", "\u093f\u092f\u093e\u0901", "\u093f\u092f\u094b\u0902", "\u093f\u092f\u093e\u0902")),
    (4, 3, ("\u093e\u0915\u0930", "\u093e\u0907\u090f", "\u093e\u0908\u0902", "\u093e\u092f\u093e", "\u0947\u0917\u0940", "\u0947\u0917\u093e", "\u094b\u0917\u0940", "\u094b\u0917\u0947", "\u093e\u0928\u0947", "\u093e\u0928\u093e", "\u093e\u0924\u0947", "\u093e\u0924\u0940", "\u093e\u0924\u093e", "\u0924\u0940\u0902", "\u093e\u0913\u0902", "\u093e\u090f\u0902", "\u0941\u0913\u0902", "\u0941\u090f\u0902", "\u0941\u0906\u0902")),
    (3, 2, ("\u0915\u0930", "\u093e\u0913", "\u093f\u090f", "\u093e\u0908", "\u093e\u090f", "\u0928\u0947", "\u0928\u0940", "\u0928\u093e", "\u0924\u0947", "\u0940\u0902", "\u0924\u0940", "\u0924\u093e", "\u093e\u0901", "\u093e\u0902", "\u094b\u0902", "\u0947\u0902")),
    (2, 1, ("\u094b", "\u0947", "\u0942", "\u0941", "\u0940", "\u093f", "\u093e")),
)


def hindi_normalize(t: str) -> str:
    """HindiNormalizer.java behavior (Dolamic & Savoy's Hindi
    normalizations): nasal n+virama -> anusvara, chandrabindu -> anusvara,
    nukta deletion and nukta-consonant folds, ZWJ/ZWNJ + virama deletion,
    candra/short vowel-sign unification, long->short vowel folds (ी->ि,
    ू->ु, आ->अ, ई->इ, ऊ->उ, ऐ->ए, औ->ओ, ...). Verified on the
    reference's full TestHindiNormalizer vector set."""
    s = list(t)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0928":  # na + virama -> anusvara
            if i + 1 < len(s) and s[i + 1] == "\u094d":
                s[i] = "\u0902"
                del s[i + 1]
        elif c == "\u0901":
            s[i] = "\u0902"
        elif c == "\u093c" or c in ("\u200d", "\u200c") or c == "\u094d":
            del s[i]
            continue
        elif c in _HI_MAP:
            s[i] = _HI_MAP[c]
        i += 1
    return "".join(s)


_HI_MAP = {
    "\u0929": "\u0928", "\u0931": "\u0930", "\u0934": "\u0933",
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095a": "\u0917",
    "\u095b": "\u091c", "\u095c": "\u0921", "\u095d": "\u0922",
    "\u095e": "\u092b", "\u095f": "\u092f",
    "\u0945": "\u0947", "\u0946": "\u0947",
    "\u0949": "\u094b", "\u094a": "\u094b",
    "\u090d": "\u090f", "\u090e": "\u090f",
    "\u0911": "\u0913", "\u0912": "\u0913",
    "\u0972": "\u0905", "\u0906": "\u0905",
    "\u0908": "\u0907", "\u090a": "\u0909",
    "\u0960": "\u090b", "\u0961": "\u090c",
    "\u0910": "\u090f", "\u0914": "\u0913",
    "\u0940": "\u093f", "\u0942": "\u0941",
    "\u0944": "\u0943", "\u0963": "\u0962",
    "\u0948": "\u0947", "\u094c": "\u094b",
}


def hindi_stem(t: str) -> str:
    """HindiStemmer.java suffix tiers, bare (the HindiStemFilter surface —
    verified on the reference's TestHindiStemmer vectors)."""
    return _tier_stem(t, _HI_TIERS)


def hindi_light_stem(t: str) -> str:
    """The HindiAnalyzer chain core: HindiNormalizer then HindiStemmer."""
    return hindi_stem(hindi_normalize(t))


def persian_normalize(t: str) -> str:
    """PersianNormalizer — exact PersianNormalizer.java behavior (verified
    on the reference's TestPersianNormalizationFilter vectors): fold farsi
    yeh ی and yeh barree ے to ARABIC yeh ي, keheh ک to arabic kaf ك, heh
    with yeh above ۀ / heh goal ہ to heh ه, and delete hamza above."""
    if not t or ord(max(t)) < 0x600:
        return t
    out = []
    for c in t:
        if c == "ٔ":        # hamza above: delete
            continue
        if c in ("ی", "ے"):   # farsi yeh / yeh barree -> yeh
            c = "ي"
        elif c == "ک":             # keheh -> kaf
            c = "ك"
        elif c in ("ۀ", "ہ"):  # heh+yeh / heh goal -> heh
            c = "ه"
        out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# Light variants (the *Analyzer default stemmers where minimal ones exist)
# ---------------------------------------------------------------------------

_DE_LIGHT_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST = frozenset("bdfghklmnt")


def german_light_stem(t: str) -> str:
    """Savoy's light German stemmer — exact GermanLightStemmer.java
    behavior (golden-verified on delighttestdata): fold accents, then two
    suffix passes ('ern'/'em,en,er,es'/'e'/consonant+'s', then
    'est'/'er,en'/consonant+'st')."""
    t = t.translate(_DE_LIGHT_FOLD)
    # step 1
    n = len(t)
    if n > 5 and t.endswith("ern"):
        t = t[:-3]
    elif n > 4 and t[-2] == "e" and t[-1] in "mnrs":
        t = t[:-2]
    elif n > 3 and t[-1] == "e":
        t = t[:-1]
    elif n > 3 and t[-1] == "s" and t[-2] in _DE_ST:
        t = t[:-1]
    # step 2
    n = len(t)
    if n > 5 and t.endswith("est"):
        t = t[:-3]
    elif n > 4 and (t.endswith("er") or t.endswith("en")):
        t = t[:-2]
    elif n > 4 and t.endswith("st") and t[-3] in _DE_ST:
        t = t[:-2]
    return t


_FR_NORM_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(t: str) -> str:
    """FrenchLightStemmer.norm: fold + collapse ALL doubled letters
    (len>4), strip 'ie', then r/e/e and a doubled final."""
    if len(t) > 4:
        t = t.translate(_FR_NORM_FOLD)
        out = [t[0]]
        for c in t[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        t = "".join(out)
    if len(t) > 4 and t.endswith("ie"):
        t = t[:-2]
    if len(t) > 4:
        if t[-1] == "r":
            t = t[:-1]
        if t[-1] == "e":
            t = t[:-1]
        if t[-1] == "e":
            t = t[:-1]
        if t[-1] == t[-2] and t[-1].isalpha():
            t = t[:-1]
    return t


def french_light_stem(t: str) -> str:
    """Savoy's light French stemmer — exact FrenchLightStemmer.java
    behavior (golden-verified on frlighttestdata): plural x/s strip, then
    ONE derivational-suffix rewrite (issement→ir, ateur→er, catrice→quer,
    euse/teuse, ive→if, isation, …), then the norm pass."""
    if len(t) > 5 and t[-1] == "x":
        if t[-3] == "a" and t[-2] == "u" and t[-4] != "e":
            t = t[:-2] + "l"
        else:
            t = t[:-1]
    if len(t) > 3 and t[-1] == "x":
        t = t[:-1]
    if len(t) > 3 and t[-1] == "s":
        t = t[:-1]
    n = len(t)
    if n > 9 and t.endswith("issement"):
        return _fr_norm(t[:-7] + "r")
    if n > 8 and t.endswith("issant"):
        return _fr_norm(t[:-5] + "r")
    if n > 6 and t.endswith("ement"):
        t = t[:-4]
        if len(t) > 3 and t.endswith("ive"):
            t = t[:-2] + "f"
        return _fr_norm(t)
    if n > 11 and t.endswith("ficatrice"):
        return _fr_norm(t[:-6] + "er")
    if n > 10 and t.endswith("ficateur"):
        return _fr_norm(t[:-6] + "er")
    if n > 9 and t.endswith("catrice"):
        return _fr_norm(t[:-7] + "quer")
    if n > 8 and t.endswith("cateur"):
        return _fr_norm(t[:-6] + "quer")
    if n > 8 and t.endswith("atrice"):
        return _fr_norm(t[:-6] + "er")
    if n > 7 and t.endswith("ateur"):
        return _fr_norm(t[:-5] + "er")
    if n > 6 and t.endswith("trice"):
        t = t[:-5] + "teur"
        n = len(t)
    if n > 5 and t.endswith("ième"):
        return _fr_norm(t[:-4])
    if n > 7 and t.endswith("teuse"):
        return _fr_norm(t[:-3] + "r")
    if n > 6 and t.endswith("teur"):
        return _fr_norm(t[:-2] + "r")
    if n > 5 and t.endswith("euse"):
        return _fr_norm(t[:-2])
    if n > 8 and t.endswith("ère"):
        return _fr_norm(t[:-3] + "er")
    if n > 7 and t.endswith("ive"):
        return _fr_norm(t[:-2] + "f")
    if n > 4 and (t.endswith("folle") or t.endswith("molle")):
        return _fr_norm(t[:-3] + "u")
    if n > 9 and t.endswith("nnelle"):
        return _fr_norm(t[:-5])
    if n > 9 and t.endswith("nnel"):
        return _fr_norm(t[:-3])
    if n > 4 and t.endswith("ète"):
        t = t[:-3] + "et"
        n = len(t)
    if n > 8 and t.endswith("ique"):
        t = t[:-4]
        n = len(t)
    if n > 8 and t.endswith("esse"):
        return _fr_norm(t[:-3])
    if n > 7 and t.endswith("inage"):
        return _fr_norm(t[:-3])
    if n > 9 and t.endswith("isation"):
        t = t[:-7]
        if len(t) > 5 and t.endswith("ual"):
            t = t[:-2] + "el"
        return _fr_norm(t)
    if n > 9 and t.endswith("isateur"):
        return _fr_norm(t[:-7])
    if n > 8 and t.endswith("ation"):
        return _fr_norm(t[:-5])
    if n > 8 and t.endswith("ition"):
        return _fr_norm(t[:-5])
    return _fr_norm(t)


_PT_LIGHT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç",
                               "aaaaaoooooeeeeuuuuiiiic")


def _pt_light_suffix(t: str) -> str:
    n = len(t)
    if n > 4 and t.endswith("es") and t[-3] in "rslz":
        return t[:-2]
    if n > 3 and t.endswith("ns"):
        return t[:-2] + "m"
    if n > 4 and (t.endswith("eis") or t.endswith("éis")):
        return t[:-3] + "el"
    if n > 4 and t.endswith("ais"):
        return t[:-2] + "l"
    if n > 4 and t.endswith("óis"):
        return t[:-3] + "ol"
    if n > 4 and t.endswith("is"):
        return t[:-1] + "l"
    if n > 3 and (t.endswith("ões") or t.endswith("ães")):
        return t[:-3] + "ão"
    if n > 6 and t.endswith("mente"):
        return t[:-5]
    if n > 3 and t[-1] == "s":
        return t[:-1]
    return t


def _pt_norm_feminine(t: str) -> str:
    n = len(t)
    if n > 7 and (t.endswith("inha") or t.endswith("iaca") or t.endswith("eira")):
        return t[:-1] + "o"
    if n > 6:
        if t.endswith(("osa", "ica", "ida", "ada", "iva", "ama")):
            return t[:-1] + "o"
        if t.endswith("ona"):
            return t[:-3] + "ão"
        if t.endswith("ora"):
            return t[:-1]
        if t.endswith("esa"):
            return t[:-3] + "ês"
        if t.endswith("na"):
            return t[:-1] + "o"
    return t


def portuguese_light_stem(t: str) -> str:
    """Savoy's light Portuguese stemmer — exact PortugueseLightStemmer.java
    behavior (golden-verified on ptlighttestdata): plural suffix rewrite,
    feminine normalization, final-vowel strip, THEN the accent fold (the
    fold is last, unlike the other light stemmers)."""
    if len(t) < 4:
        return t
    t = _pt_light_suffix(t)
    if len(t) > 3 and t[-1] == "a":
        t = _pt_norm_feminine(t)
    if len(t) > 4 and t[-1] in "eao":
        t = t[:-1]
    return t.translate(_PT_LIGHT_FOLD)


# ---------------------------------------------------------------------------
# Sorani Kurdish (ckb) — lucene/analysis/common/.../ckb/{SoraniNormalizer,
# SoraniStemmer}.java, golden-verified on ckbtestdata (8,272 pairs)
# ---------------------------------------------------------------------------

_CKB_MAP = {
    "ي": "ی", "ى": "ی",   # yeh / dotless yeh -> farsi yeh
    "ك": "ک",                        # kaf -> keheh
    "ة": "ە",                        # teh marbuta -> ae
    "ھ": "ه",                        # heh doachashmee -> heh
    "ڒ": "ڕ",                        # reh with v above -> rreh
}
_CKB_DEL = frozenset("ـًٌٍَُِّْ")


def sorani_normalize(t: str) -> str:
    """SoraniNormalizer.java behavior: unify yeh/kaf forms, ZWNJ after heh
    turns the heh into ae (else ZWNJ deleted), final heh -> ae, initial
    reh -> rreh, delete tatweel/harakat and Unicode FORMAT chars."""
    import unicodedata

    out: list[str] = []
    last = len(t) - 1
    for i, c in enumerate(t):
        if c == "‌":  # ZWNJ
            if out and out[-1] == "ه":
                out[-1] = "ە"
            continue
        if c in _CKB_DEL or unicodedata.category(c) == "Cf":
            continue
        if c == "ر" and not out:  # reh at (post-deletion) position 0 -> rreh
            out.append("ڕ")
            continue
        if c == "ه" and i == last:  # heh with nothing following -> ae
            out.append("ە")
            continue
        out.append(_CKB_MAP.get(c, c))
    return "".join(out)


def sorani_stem(t: str) -> str:
    """SoraniStemmer.java behavior: postposition + possessive-pronoun
    strip, then ONE ezafe/definiteness/plural/demonstrative suffix."""
    n = len(t)
    if n > 5 and t.endswith("دا"):
        t = t[:-2]
    elif n > 4 and t.endswith("نا"):
        t = t[:-1]
    elif n > 6 and t.endswith("ەوە"):
        t = t[:-3]
    if len(t) > 6 and t.endswith(("مان", "یان", "تان")):
        t = t[:-3]
    n = len(t)
    if n > 6 and t.endswith("ێکی"):
        return t[:-3]
    if n > 7 and t.endswith("یەکی"):
        return t[:-4]
    if n > 5 and t.endswith("ێک"):
        return t[:-2]
    if n > 6 and t.endswith("یەک"):
        return t[:-3]
    if n > 6 and t.endswith("ەکە"):
        return t[:-3]
    if n > 5 and t.endswith("کە"):
        return t[:-2]
    if n > 7 and t.endswith("ەکان"):
        return t[:-4]
    if n > 6 and t.endswith("کان"):
        return t[:-3]
    if n > 7 and t.endswith("یانی"):
        return t[:-4]
    if n > 6 and t.endswith("انی"):
        return t[:-3]
    if n > 6 and t.endswith("یان"):
        return t[:-3]
    if n > 5 and t.endswith("ان"):
        return t[:-2]
    if n > 7 and t.endswith("یانە"):
        return t[:-4]
    if n > 6 and t.endswith("انە"):
        return t[:-3]
    if n > 5 and (t.endswith("ایە") or t.endswith("ەیە")):
        return t[:-2]
    if n > 4 and t.endswith("ە"):
        return t[:-1]
    if n > 4 and t.endswith("ی"):
        return t[:-1]
    return t


def sorani_light_stem(t: str) -> str:
    """The SoraniAnalyzer chain core: normalize then stem."""
    return sorani_stem(sorani_normalize(t))


# ---------------------------------------------------------------------------
# Latvian (lv) — lucene/analysis/common/.../lv/LatvianStemmer.java (light
# stemmer after Karlis Kreslins), verified on the reference's full
# TestLatvianStemmer vector set
# ---------------------------------------------------------------------------

# (affix, vowel_count_threshold, fires_unpalatalization)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False), ("am", 1, False),
    ("ēm", 1, False), ("īm", 1, False), ("im", 1, False), ("um", 1, False),
    ("us", 1, True), ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False),
    ("is", 1, False), ("ie", 1, False), ("u", 1, True), ("a", 1, True),
    ("i", 1, True), ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")
_LV_UNPAL_2 = (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"), ("žļ", "zl"),
               ("ļņ", "ln"), ("ļļ", "ll"))
_LV_UNPAL_1 = {"č": "c", "ļ": "l", "ņ": "n"}


def _lv_unpalatalize(t: str, removed_first: str) -> str:
    if removed_first == "u":
        if t.endswith("kš"):
            return t[:-2] + "kst"
        if t.endswith("ņņ"):
            return t[:-2] + "nn"
    if t.endswith(("pj", "bj", "mj", "vj")):  # labial consonant
        return t[:-1]
    for suf, rep in _LV_UNPAL_2:
        if t.endswith(suf):
            return t[:-2] + rep
    if t and t[-1] in _LV_UNPAL_1:
        return t[:-1] + _LV_UNPAL_1[t[-1]]
    return t


def latvian_stem(t: str) -> str:
    """LatvianStemmer.java behavior: remove ONE inflectional affix whose
    vowel-count threshold the word exceeds (stem keeps >= 3 chars), then
    reverse palatalization for the affix classes that fire it
    ('lāči' -> 'lāc', 'zvaigžņu' -> 'zvaigzn', 'akmeņi' -> 'akmen')."""
    nv = sum(1 for c in t if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(t) >= len(affix) + 3 and t.endswith(affix):
            stem = t[: len(t) - len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if pal else stem
    return t


# ---------------------------------------------------------------------------
# Indonesian (id) — lucene/analysis/common/.../id/IndonesianStemmer.java
# (Tala 2003, "A Study of Stemming Effects on Information Retrieval in
# Bahasa Indonesia"), verified on the reference's TestIndonesianStemmer
# vector set
# ---------------------------------------------------------------------------

_ID_VOWELS = frozenset("aeiou")


def indonesian_stem(t: str, derivational: bool = True) -> str:
    """IndonesianStemmer.java behavior: particle + possessive-pronoun
    strip, then (derivational) first-order prefix -> suffix -> second-order
    prefix with the published rule-firing flow and prefix/suffix
    disallowed-combination flags."""
    flags = 0
    KE, PENG, DI, MENG, TER, BER, PE = 1, 2, 4, 8, 16, 32, 64
    ns = sum(1 for c in t if c in _ID_VOWELS)

    def particle(w):
        nonlocal ns
        if w.endswith(("kah", "lah", "pun")):
            ns -= 1
            return w[:-3]
        return w

    def possessive(w):
        nonlocal ns
        if w.endswith(("ku", "mu")):
            ns -= 1
            return w[:-2]
        if w.endswith("nya"):
            ns -= 1
            return w[:-3]
        return w

    def first_order(w):
        nonlocal ns, flags
        if w.startswith("meng"):
            flags |= MENG; ns -= 1; return w[4:]
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= MENG; ns -= 1; return "s" + w[4:]
        if w.startswith("men"):
            flags |= MENG; ns -= 1; return w[3:]
        if w.startswith("mem"):
            flags |= MENG; ns -= 1; return w[3:]
        if w.startswith("me"):
            flags |= MENG; ns -= 1; return w[2:]
        if w.startswith("peng"):
            flags |= PENG; ns -= 1; return w[4:]
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= PENG; ns -= 1; return "s" + w[4:]
        if w.startswith("peny"):
            flags |= PENG; ns -= 1; return w[4:]
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            flags |= PENG; ns -= 1; return "t" + w[3:]
        if w.startswith("pen"):
            flags |= PENG; ns -= 1; return w[3:]
        if w.startswith("pem"):
            flags |= PENG; ns -= 1; return w[3:]
        if w.startswith("di"):
            flags |= DI; ns -= 1; return w[2:]
        if w.startswith("ter"):
            flags |= TER; ns -= 1; return w[3:]
        if w.startswith("ke"):
            flags |= KE; ns -= 1; return w[2:]
        return w

    def second_order(w):
        nonlocal ns, flags
        if w.startswith("ber"):
            flags |= BER; ns -= 1; return w[3:]
        if w == "belajar":
            flags |= BER; ns -= 1; return w[3:]
        if (w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS
                and w[3] == "e" and w[4] == "r"):
            flags |= BER; ns -= 1; return w[2:]
        if w.startswith("per"):
            ns -= 1; return w[3:]
        if w == "pelajar":
            ns -= 1; return w[3:]
        if w.startswith("pe"):
            flags |= PE; ns -= 1; return w[2:]
        return w

    def suffix(w):
        nonlocal ns
        if w.endswith("kan") and not flags & (KE | PENG | PE):
            ns -= 1
            return w[:-3]
        if w.endswith("an") and not flags & (DI | MENG | TER):
            ns -= 1
            return w[:-2]
        if (w.endswith("i") and not w.endswith("si")
                and not flags & (BER | KE | PENG)):
            ns -= 1
            return w[:-1]
        return w

    if ns > 2:
        t = particle(t)
    if ns > 2:
        t = possessive(t)
    if not derivational:
        return t
    old = t
    if ns > 2:
        t = first_order(t)
    if t != old:  # a first-order rule fired
        old = t
        if ns > 2:
            t = suffix(t)
        if t != old and ns > 2:  # a suffix rule fired
            t = second_order(t)
    else:
        if ns > 2:
            t = second_order(t)
        if ns > 2:
            t = suffix(t)
    return t


def _partial_nn_minimal(t: str) -> str:
    return norwegian_minimal_stem(t, nynorsk=True, bokmaal=False)


def _partial_nn_light(t: str) -> str:
    return norwegian_light_stem(t, nynorsk=True, bokmaal=False)


STEMMERS = {
    "en": english_minimal_stem,
    "fr": french_minimal_stem,
    "de": german_minimal_stem,
    "es": spanish_light_stem,
    "it": italian_light_stem,
    "pt": portuguese_minimal_stem,
    "sv": swedish_light_stem,
    "no": norwegian_minimal_stem,
    "cs": czech_light_stem,
    "fi": finnish_light_stem,
    "hu": hungarian_light_stem,
    "ru": russian_light_stem,
    "ar": arabic_light_stem,
    "fa": persian_normalize,
    "hi": hindi_light_stem,
    # light variants (the *Analyzer defaults; language_pack(minimal=False))
    "de_light": german_light_stem,
    "fr_light": french_light_stem,
    "pt_light": portuguese_light_stem,
    # Sorani Kurdish (ckb): normalize + stem chain
    "ckb": sorani_light_stem,
    "lv": latvian_stem,
    "id": indonesian_stem,
    "sv_minimal": swedish_minimal_stem,
    "no_light": norwegian_light_stem,  # Bokmål flags (the filter default)
    # Nynorsk-flag variants (NorwegianLightStemmer.NYNORSK)
    "nn": _partial_nn_minimal,
    "nn_light": _partial_nn_light,
}

SUPPORTED_LANGUAGES = tuple(sorted(STEMMERS))


class LightStemFilter(TokenFilter):
    """Vocab-level 1:1 stemmer filter for a language pack. Spec round-trips
    through the index manifest as ``("light_stem", {"lang": code})``
    (build_filters resolves it lazily to avoid an import cycle)."""

    def __init__(self, lang: str):
        if lang not in STEMMERS:
            raise ValueError(
                f"unsupported language {lang!r}; have {SUPPORTED_LANGUAGES}"
            )
        self.lang = lang
        self._stem = STEMMERS[lang]
        self.spec = ("light_stem", {"lang": lang})

    def map_term(self, term: str) -> str:
        return self._stem(term)


def language_pack(lang: str, minimal: bool = True) -> dict:
    """Analyzer-chain parts for a language: ``{"stopwords": frozenset,
    "filter_specs": tuple}``. English with ``minimal=False`` uses the full
    Porter stemmer (EnglishAnalyzer = stop + Porter); every other pack is
    stop + light stem, the *Analyzer shape Lucene uses for fr/de/es/it."""
    if lang not in STEMMERS:
        raise ValueError(f"unsupported language {lang!r}; have {SUPPORTED_LANGUAGES}")
    if lang == "en" and not minimal:
        specs: tuple = (("porter_stem",),)
    elif not minimal and f"{lang}_light" in STEMMERS:
        # the *Analyzer default where a light variant exists (de/fr/pt)
        specs = (("light_stem", {"lang": f"{lang}_light"}),)
    else:
        specs = (("light_stem", {"lang": lang}),)
    base = lang.split("_")[0]
    return {"stopwords": STOPWORDS.get(lang, STOPWORDS.get(base, frozenset())),
            "filter_specs": specs}


def analyzer_for(lang: str, minimal: bool = True):
    """Query-side AnalyzerChain for a pack (same chain the build side applies
    via IndexConfig.token_filters/stopwords)."""
    from lucene_ray.analysis.filters import AnalyzerChain

    pack = language_pack(lang, minimal)
    return AnalyzerChain(pack["filter_specs"], stopwords=pack["stopwords"])


# ---------------------------------------------------------------------------
# Bulgarian (bg) — lucene/analysis/common/.../bg/BulgarianStemmer.java
# (light stemmer after Nakov, "BulStem: Design and evaluation of inflectional
# stemmer for Bulgarian"; verified on the reference's full
# TestBulgarianStemmer vector set)
# ---------------------------------------------------------------------------


def bulgarian_stem(t: str) -> str:
    """BulgarianStemmer.java behavior: -ища, article removal, plural
    removal with consonant mutations (ци→к, зи→г, си→х, еве→й), final
    я/а/о/е strip, ен→н and ъN→N normalizations."""
    if len(t) < 4:
        return t
    if len(t) > 5 and t.endswith("ища"):
        return t[:-3]
    t = _bg_remove_article(t)
    t = _bg_remove_plural(t)
    if len(t) > 3:
        if t.endswith("я"):
            t = t[:-1]
        if t.endswith(("а", "о", "е")):
            t = t[:-1]
    if len(t) > 4 and t.endswith("ен"):
        t = t[:-2] + "н"
    if len(t) > 5 and t[-2] == "ъ":
        t = t[:-2] + t[-1]
    return t


def _bg_remove_article(t: str) -> str:
    n = len(t)
    if n > 6 and t.endswith("ият"):
        return t[:-3]
    if n > 5 and t.endswith(("ът", "то", "те", "та", "ия")):
        return t[:-2]
    if n > 4 and t.endswith("ят"):
        return t[:-2]
    return t


def _bg_remove_plural(t: str) -> str:
    n = len(t)
    if n > 6:
        if t.endswith("овци"):
            return t[:-3]
        if t.endswith("ове"):
            return t[:-3]
        if t.endswith("еве"):
            return t[:-3] + "й"
    if n > 5:
        if t.endswith("ища"):
            return t[:-3]
        if t.endswith("та"):
            return t[:-2]
        if t.endswith("ци"):
            return t[:-2] + "к"
        if t.endswith("зи"):
            return t[:-2] + "г"
        if t[-3] == "е" and t[-1] == "и":
            return t[:-3] + "я" + t[-2]
    if n > 4:
        if t.endswith("си"):
            return t[:-2] + "х"
        if t.endswith("и"):
            return t[:-1]
    return t


# ---------------------------------------------------------------------------
# Bengali (bn) + Telugu (te) — suffix-tier stemmers of
# lucene/analysis/common/.../{bn/BengaliStemmer,te/TeluguStemmer}.java;
# tier tables transcribed codepoint-exact (each suffix's length equals its
# tier's strip count, asserted in tests). Bengali additionally gets the
# BengaliNormalizer.java char rewriting the bn Analyzer chains before it.
# ---------------------------------------------------------------------------

_BN_TIERS = (
    (9, 8, ("\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09be\u09ae", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09be\u09ae", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09c7\u09a8", "\u0987\u09a4\u09c7\u099b\u09bf\u09b2\u09c7\u09a8", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09c7\u09a8", "\u0987\u09df\u09be\u099b\u09bf\u09b2\u09c7\u09a8")),
    (8, 7, ("\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09bf", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09c7", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09be", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09c7", "\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09be", "\u09bf\u09df\u09be\u099b\u09bf\u09b2\u09bf", "\u09df\u09c7\u09a6\u09c7\u09b0\u0995\u09c7")),
    (7, 6, ("\u09bf\u09a4\u09c7\u099b\u09bf\u09b8", "\u09bf\u09a4\u09c7\u099b\u09c7\u09a8", "\u09bf\u09df\u09be\u099b\u09bf\u09b8", "\u09bf\u09df\u09be\u099b\u09c7\u09a8", "\u09c7\u099b\u09bf\u09b2\u09be\u09ae", "\u09c7\u099b\u09bf\u09b2\u09c7\u09a8", "\u09c7\u09a6\u09c7\u09b0\u0995\u09c7")),
    (6, 5, ("\u09bf\u09a4\u09c7\u099b\u09bf", "\u09bf\u09a4\u09c7\u099b\u09be", "\u09bf\u09a4\u09c7\u099b\u09c7", "\u099b\u09bf\u09b2\u09be\u09ae", "\u099b\u09bf\u09b2\u09c7\u09a8", "\u09bf\u09df\u09be\u099b\u09bf", "\u09bf\u09df\u09be\u099b\u09be", "\u09bf\u09df\u09be\u099b\u09c7", "\u09c7\u099b\u09bf\u09b2\u09c7", "\u09c7\u099b\u09bf\u09b2\u09be", "\u09df\u09c7\u09a6\u09c7\u09b0", "\u09a6\u09c7\u09b0\u0995\u09c7")),
    (5, 4, ("\u09bf\u09b2\u09be\u09ae", "\u09bf\u09b2\u09c7\u09a8", "\u09bf\u09a4\u09be\u09ae", "\u09bf\u09a4\u09c7\u09a8", "\u09bf\u09ac\u09c7\u09a8", "\u099b\u09bf\u09b2\u09bf", "\u099b\u09bf\u09b2\u09c7", "\u099b\u09bf\u09b2\u09be", "\u09a4\u09c7\u099b\u09c7", "\u09bf\u09a4\u09c7\u099b", "\u0996\u09be\u09a8\u09be", "\u0996\u09be\u09a8\u09bf", "\u0997\u09c1\u09b2\u09cb", "\u0997\u09c1\u09b2\u09bf", "\u09df\u09c7\u09b0\u09be", "\u09c7\u09a6\u09c7\u09b0")),
    (4, 3, ("\u09b2\u09be\u09ae", "\u09bf\u09b2\u09bf", "\u0987\u09b2\u09bf", "\u09bf\u09b2\u09c7", "\u0987\u09b2\u09c7", "\u09b2\u09c7\u09a8", "\u09bf\u09b2\u09be", "\u0987\u09b2\u09be", "\u09a4\u09be\u09ae", "\u09bf\u09a4\u09bf", "\u0987\u09a4\u09bf", "\u09bf\u09a4\u09c7", "\u0987\u09a4\u09c7", "\u09a4\u09c7\u09a8", "\u09bf\u09a4\u09be", "\u09bf\u09ac\u09be", "\u0987\u09ac\u09be", "\u09bf\u09ac\u09bf", "\u0987\u09ac\u09bf", "\u09ac\u09c7\u09a8", "\u09bf\u09ac\u09c7", "\u0987\u09ac\u09c7", "\u099b\u09c7\u09a8", "\u09df\u09cb\u09a8", "\u09df\u09c7\u09b0", "\u09c7\u09b0\u09be", "\u09a6\u09c7\u09b0")),
    (3, 2, ("\u09bf\u09b8", "\u09c7\u09a8", "\u09b2\u09bf", "\u09b2\u09c7", "\u09b2\u09be", "\u09a4\u09bf", "\u09a4\u09c7", "\u09a4\u09be", "\u09ac\u09bf", "\u09ac\u09c7", "\u09ac\u09be", "\u099b\u09bf", "\u099b\u09be", "\u099b\u09c7", "\u09c1\u09a8", "\u09c1\u0995", "\u099f\u09be", "\u099f\u09bf", "\u09a8\u09bf", "\u09c7\u09b0", "\u09b0\u09be", "\u0995\u09c7")),
    (2, 1, ("\u09bf", "\u09c0", "\u09be", "\u09cb", "\u09c7", "\u09ac", "\u09a4")),
)

_TE_TIERS = (
    (5, 4, ("\u0c33\u0c4d\u0c33\u0c41", "\u0c21\u0c4d\u0c32\u0c41")),
    (3, 2, ("\u0c21\u0c41", "\u0c2e\u0c41", "\u0c35\u0c41", "\u0c32\u0c41", "\u0c28\u0c3f", "\u0c28\u0c41", "\u0c1a\u0c47", "\u0c15\u0c48", "\u0c32\u0c4b", "\u0c26\u0c3f", "\u0c15\u0c3f", "\u0c38\u0c41", "\u0c35\u0c48", "\u0c2a\u0c48")),
    (2, 1, ("\u0c3f", "\u0c40", "\u0c41", "\u0c42", "\u0c46", "\u0c47", "\u0c4a", "\u0c4b", "\u0c3e")),
)


def _tier_stem(t: str, tiers) -> str:
    for guard, strip, sufs in tiers:
        if len(t) > guard and t.endswith(sufs):
            return t[:-strip]
    return t


def bengali_normalize(t: str) -> str:
    """BengaliNormalizer.java behavior: chandrabindu deletion, vowel-sign
    shortening, khio/nga/ja-phala/ba-phala/visarga rewrites, sh/na/ra
    unification (index walk mirrors the Java in-place char-array edits)."""
    s = list(t)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":  # chandrabindu: delete, revisit
            del s[i]
            continue
        if c == "ী":
            s[i] = "ি"
        elif c == "ূ":
            s[i] = "ু"
        elif c == "ক":  # khio
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif c == "ঙ":
            s[i] = "ং"
        elif c == "য":  # ja phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                continue  # revisit index i
            if i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 1  # next visit = original i-1
                continue
        elif c == "ব":  # ba phala
            if i >= 1 and s[i - 1] == "্":
                if i - 2 == 0:
                    del s[i]
                    del s[i - 1]
                    i -= 1
                    continue
                if i - 5 >= 0 and s[i - 3] == "্":
                    del s[i]
                    del s[i - 1]
                    i -= 1
                    continue
                if i - 2 >= 0:
                    s[i - 1] = s[i - 2]
                    del s[i]
                    continue  # revisit index i
        elif c == "ঃ":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif c in ("শ", "ষ"):
            s[i] = "স"
        elif c == "ণ":
            s[i] = "ন"
        elif c in ("ড়", "ঢ়"):
            s[i] = "র"
        elif c == "ৎ":
            s[i] = "ত"
        i += 1
    return "".join(s)


def bengali_stem(t: str) -> str:
    """BengaliStemmer.java suffix tiers, bare (the BengaliStemFilter
    surface — verified on the reference's TestBengaliStemmer vector set;
    the BengaliAnalyzer chain applies :func:`bengali_normalize` first, as
    the ``bn`` pack's filter chain does)."""
    return _tier_stem(t, _BN_TIERS)


def telugu_stem(t: str) -> str:
    """TeluguStemmer.java suffix tiers (verified on the reference's
    TestTeluguStemmer vectors)."""
    return _tier_stem(t, _TE_TIERS)


def bengali_pack_stem(t: str) -> str:
    """The BengaliAnalyzer chain core (BengaliNormalizationFilter then
    BengaliStemFilter) — what the ``bn`` language pack applies."""
    return _tier_stem(bengali_normalize(t), _BN_TIERS)


def _pt_rslp(t: str) -> str:
    from lucene_ray.analysis.rslp_pt import portuguese_rslp_stem

    return portuguese_rslp_stem(t)


STEMMERS["bg"] = bulgarian_stem
STEMMERS["bn"] = bengali_pack_stem
STEMMERS["te"] = telugu_stem
# full RSLP Portuguese (PortugueseStemFilter — the aggressive 7-step
# variant beside pt minimal/light; analysis/rslp_pt.py)
STEMMERS["pt_rslp"] = _pt_rslp


def german_heuristic_stem(t: str) -> str:
    """GermanStemmer.java behavior (the original heuristic German
    stemmer behind GermanStemFilter, after Joerg Caumanns, "A Fast and
    Simple Stemming Algorithm for German Words"): marker substitution
    (doubled letters, sch/ch/ei/ie/ig/st digraphs, umlauts, eszett),
    iterative declension strip with the substitution-aware length
    guard, contextual optimize (erin*, z->x), resubstitution, and
    gege-particle removal. Verified exact on the reference's full
    de/data.txt vocabulary."""
    t = t.lower()
    if not t or not all(c.isalpha() for c in t):
        return t
    s = list(t)
    subst = [0]
    _substitute(s, subst)
    _strip(s, subst)
    _optimize(s, subst)
    _resubstitute(s)
    _remove_particle(s)
    return "".join(s)


def _substitute(s: list, subst: list) -> None:
    subst[0] = 0
    c = 0
    while c < len(s):
        if c > 0 and s[c] == s[c - 1]:
            s[c] = "*"
        elif s[c] == "ä":
            s[c] = "a"
        elif s[c] == "ö":
            s[c] = "o"
        elif s[c] == "ü":
            s[c] = "u"
        elif s[c] == "ß":
            s[c] = "s"
            s.insert(c + 1, "s")
            subst[0] += 1
        if c < len(s) - 1:
            if (c < len(s) - 2 and s[c] == "s" and s[c + 1] == "c"
                    and s[c + 2] == "h"):
                s[c] = "$"
                del s[c + 1:c + 3]
                subst[0] += 2
            elif s[c] == "c" and s[c + 1] == "h":
                s[c] = "§"
                del s[c + 1]
                subst[0] += 1
            elif s[c] == "e" and s[c + 1] == "i":
                s[c] = "%"
                del s[c + 1]
                subst[0] += 1
            elif s[c] == "i" and s[c + 1] == "e":
                s[c] = "&"
                del s[c + 1]
                subst[0] += 1
            elif s[c] == "i" and s[c + 1] == "g":
                s[c] = "#"
                del s[c + 1]
                subst[0] += 1
            elif s[c] == "s" and s[c + 1] == "t":
                s[c] = "!"
                del s[c + 1]
                subst[0] += 1
        c += 1


def _strip(s: list, subst: list) -> None:
    while len(s) > 3:
        if len(s) + subst[0] > 5 and s[-2] == "n" and s[-1] == "d":
            del s[-2:]
        elif len(s) + subst[0] > 4 and s[-2] == "e" and s[-1] == "m":
            del s[-2:]
        elif len(s) + subst[0] > 4 and s[-2] == "e" and s[-1] == "r":
            del s[-2:]
        elif s[-1] == "e":
            del s[-1]
        elif s[-1] == "s":
            del s[-1]
        elif s[-1] == "n":
            del s[-1]
        elif s[-1] == "t":
            del s[-1]
        else:
            break


def _optimize(s: list, subst: list) -> None:
    if len(s) > 5 and "".join(s[-5:]) == "erin*":
        del s[-1]
        _strip(s, subst)
    if s and s[-1] == "z":
        s[-1] = "x"


def _resubstitute(s: list) -> None:
    c = 0
    while c < len(s):
        if s[c] == "*":
            s[c] = s[c - 1]
        elif s[c] == "$":
            s[c] = "s"
            s[c + 1:c + 1] = ["c", "h"]
        elif s[c] == "§":
            s[c] = "c"
            s.insert(c + 1, "h")
        elif s[c] == "%":
            s[c] = "e"
            s.insert(c + 1, "i")
        elif s[c] == "&":
            s[c] = "i"
            s.insert(c + 1, "e")
        elif s[c] == "#":
            s[c] = "i"
            s.insert(c + 1, "g")
        elif s[c] == "!":
            s[c] = "s"
            s.insert(c + 1, "t")
        c += 1


def _remove_particle(s: list) -> None:
    if len(s) > 4:
        for c in range(len(s) - 3):
            if "".join(s[c:c + 4]) == "gege":
                del s[c:c + 2]
                return



def _gl_stem(t: str) -> str:
    from lucene_ray.analysis.rslp_gl import galician_stem

    return galician_stem(t)


def _gl_minimal(t: str) -> str:
    from lucene_ray.analysis.rslp_gl import galician_minimal_stem

    return galician_minimal_stem(t)


# Galician RSLP-G (GalicianStemFilter / GalicianMinimalStemFilter;
# analysis/rslp_gl.py)
STEMMERS["de_heuristic"] = german_heuristic_stem
STEMMERS["gl"] = _gl_stem
STEMMERS["gl_minimal"] = _gl_minimal
SUPPORTED_LANGUAGES = tuple(sorted(STEMMERS))
