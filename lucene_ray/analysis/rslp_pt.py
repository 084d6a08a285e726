"""Full RSLP Portuguese stemmer (Orengo & Huyck 2001, "A Stemming
Algorithm for the Portuguese Language") — the PortugueseStemmer.java /
RSLPStemmerBase.java surface: seven rule steps (Plural, Adverb, Feminine,
Augmentative, Noun, Verb, Vowel) with the published control flow
(noun-or-verb-or-vowel alternation) and final accent folding.

Rule tables are transcribed mechanically from the reference's
resources/.../pt/portuguese.rslp (the published algorithm's rule data;
each rule = (suffix, min_stem_len, replacement, exceptions)). Step
semantics follow RSLPStemmerBase.java exactly: a step fires at most ONE
rule (first match); whole-word exception steps (flag 1) skip a rule when
the word equals an exception; suffix-exception steps (flag 0) skip when
the word ends with one; a step's min word size gates the whole step, and
min=0 means auto (min over rules of rule.min + len(suffix)).

Golden-verified on the reference's ptrslptestdata vocabulary."""

from __future__ import annotations

_PLURAL = (
    ("ns", 1, "m", ()),
    ("\u00f5es", 3, "\u00e3o", ()),
    ("\u00e3es", 1, "\u00e3o", ("m\u00e3es",)),
    ("ais", 1, "al", ("cais", "mais")),
    ("\u00e9is", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("\u00f3is", 2, "ol", ()),
    ("is", 2, "il", ("l\u00e1pis", "cais", "mais", "cr\u00facis", "biqu\u00ednis", "pois", "depois", "dois", "leis")),
    ("les", 3, "l", ()),
    ("res", 3, "r", ("\u00e1rvores",)),
    ("s", 2, "", ("ali\u00e1s", "pires", "l\u00e1pis", "cais", "mais", "mas", "menos", "f\u00e9rias", "fezes", "p\u00easames", "cr\u00facis", "g\u00e1s", "atr\u00e1s", "mois\u00e9s", "atrav\u00e9s", "conv\u00e9s", "\u00eas", "pa\u00eds", "ap\u00f3s", "ambas", "ambos", "messias", "depois")),
)

_ADVERB = (
    ("mente", 4, "", ("experimente",)),
)

_FEMININE = (
    ("ona", 3, "\u00e3o", ("abandona", "lona", "iona", "cortisona", "mon\u00f3tona", "maratona", "acetona", "detona", "carona")),
    ("\u00e3", 2, "\u00e3o", ("amanh\u00e3", "arapu\u00e3", "f\u00e3", "div\u00e3")),
    ("ora", 3, "or", ()),
    ("na", 4, "no", ("carona", "abandona", "lona", "iona", "cortisona", "mon\u00f3tona", "maratona", "acetona", "detona", "guiana", "campana", "grana", "caravana", "banana", "paisana")),
    ("inha", 3, "inho", ("rainha", "linha", "minha")),
    ("esa", 3, "\u00eas", ("mesa", "obesa", "princesa", "turquesa", "ilesa", "pesa", "presa")),
    ("osa", 3, "oso", ("mucosa", "prosa")),
    ("\u00edaca", 3, "\u00edaco", ()),
    ("ica", 3, "ico", ("dica",)),
    ("ada", 2, "ado", ("pitada",)),
    ("ida", 3, "ido", ("vida", "d\u00favida")),
    ("\u00edda", 3, "ido", ("reca\u00edda", "sa\u00edda")),
    ("ima", 3, "imo", ("v\u00edtima",)),
    ("iva", 3, "ivo", ("saliva", "oliva")),
    ("eira", 3, "eiro", ("beira", "cadeira", "frigideira", "bandeira", "feira", "capoeira", "barreira", "fronteira", "besteira", "poeira")),
)

_AUGMENTATIVE = (
    ("d\u00edssimo", 5, "", ()),
    ("abil\u00edssimo", 5, "", ()),
    ("\u00edssimo", 3, "", ()),
    ("\u00e9simo", 3, "", ()),
    ("\u00e9rrimo", 4, "", ()),
    ("zinho", 2, "", ()),
    ("quinho", 4, "c", ()),
    ("uinho", 4, "", ()),
    ("adinho", 3, "", ()),
    ("inho", 3, "", ("caminho", "cominho")),
    ("alh\u00e3o", 4, "", ()),
    ("u\u00e7a", 4, "", ()),
    ("a\u00e7o", 4, "", ("antebra\u00e7o",)),
    ("a\u00e7a", 4, "", ()),
    ("ad\u00e3o", 4, "", ()),
    ("id\u00e3o", 4, "", ()),
    ("\u00e1zio", 3, "", ("top\u00e1zio",)),
    ("arraz", 4, "", ()),
    ("zarr\u00e3o", 3, "", ()),
    ("arr\u00e3o", 4, "", ()),
    ("arra", 3, "", ()),
    ("z\u00e3o", 2, "", ("coaliz\u00e3o",)),
    ("\u00e3o", 3, "", ("camar\u00e3o", "chimarr\u00e3o", "can\u00e7\u00e3o", "cora\u00e7\u00e3o", "embri\u00e3o", "grot\u00e3o", "glut\u00e3o", "fic\u00e7\u00e3o", "fog\u00e3o", "fei\u00e7\u00e3o", "furac\u00e3o", "gam\u00e3o", "lampi\u00e3o", "le\u00e3o", "macac\u00e3o", "na\u00e7\u00e3o", "\u00f3rf\u00e3o", "org\u00e3o", "patr\u00e3o", "port\u00e3o", "quinh\u00e3o", "rinc\u00e3o", "tra\u00e7\u00e3o", "falc\u00e3o", "espi\u00e3o", "mam\u00e3o", "foli\u00e3o", "cord\u00e3o", "aptid\u00e3o", "campe\u00e3o", "colch\u00e3o", "lim\u00e3o", "leil\u00e3o", "mel\u00e3o", "bar\u00e3o", "milh\u00e3o", "bilh\u00e3o", "fus\u00e3o", "crist\u00e3o", "ilus\u00e3o", "capit\u00e3o", "esta\u00e7\u00e3o", "sen\u00e3o")),
)

_NOUN = (
    ("encialista", 4, "", ()),
    ("alista", 5, "", ()),
    ("agem", 3, "", ("coragem", "chantagem", "vantagem", "carruagem")),
    ("iamento", 4, "", ()),
    ("amento", 3, "", ("firmamento", "fundamento", "departamento")),
    ("imento", 3, "", ()),
    ("mento", 6, "", ("firmamento", "elemento", "complemento", "instrumento", "departamento")),
    ("alizado", 4, "", ()),
    ("atizado", 4, "", ()),
    ("tizado", 4, "", ("alfabetizado",)),
    ("izado", 5, "", ("organizado", "pulverizado")),
    ("ativo", 4, "", ("pejorativo", "relativo")),
    ("tivo", 4, "", ("relativo",)),
    ("ivo", 4, "", ("passivo", "possessivo", "pejorativo", "positivo")),
    ("ado", 2, "", ("grado",)),
    ("ido", 3, "", ("c\u00e2ndido", "consolido", "r\u00e1pido", "decido", "t\u00edmido", "duvido", "marido")),
    ("ador", 3, "", ()),
    ("edor", 3, "", ()),
    ("idor", 4, "", ("ouvidor",)),
    ("dor", 4, "", ("ouvidor",)),
    ("sor", 4, "", ("assessor",)),
    ("atoria", 5, "", ()),
    ("tor", 3, "", ("benfeitor", "leitor", "editor", "pastor", "produtor", "promotor", "consultor")),
    ("or", 2, "", ("motor", "melhor", "redor", "rigor", "sensor", "tambor", "tumor", "assessor", "benfeitor", "pastor", "terior", "favor", "autor")),
    ("abilidade", 5, "", ()),
    ("icionista", 4, "", ()),
    ("cionista", 5, "", ()),
    ("ionista", 5, "", ()),
    ("ionar", 5, "", ()),
    ("ional", 4, "", ()),
    ("\u00eancia", 3, "", ()),
    ("\u00e2ncia", 4, "", ("ambul\u00e2ncia",)),
    ("edouro", 3, "", ()),
    ("queiro", 3, "c", ()),
    ("adeiro", 4, "", ("desfiladeiro",)),
    ("eiro", 3, "", ("desfiladeiro", "pioneiro", "mosteiro")),
    ("uoso", 3, "", ()),
    ("oso", 3, "", ("precioso",)),
    ("aliza\u00e7", 5, "", ()),
    ("atiza\u00e7", 5, "", ()),
    ("tiza\u00e7", 5, "", ()),
    ("iza\u00e7", 5, "", ("organiza\u00e7",)),
    ("a\u00e7", 3, "", ("equa\u00e7", "rela\u00e7")),
    ("i\u00e7", 3, "", ("elei\u00e7",)),
    ("\u00e1rio", 3, "", ("volunt\u00e1rio", "sal\u00e1rio", "anivers\u00e1rio", "di\u00e1rio", "lion\u00e1rio", "arm\u00e1rio")),
    ("at\u00f3rio", 3, "", ()),
    ("rio", 5, "", ("volunt\u00e1rio", "sal\u00e1rio", "anivers\u00e1rio", "di\u00e1rio", "compuls\u00f3rio", "lion\u00e1rio", "pr\u00f3prio", "st\u00e9rio", "arm\u00e1rio")),
    ("\u00e9rio", 6, "", ()),
    ("\u00eas", 4, "", ()),
    ("eza", 3, "", ()),
    ("ez", 4, "", ()),
    ("esco", 4, "", ()),
    ("ante", 2, "", ("gigante", "elefante", "adiante", "possante", "instante", "restaurante")),
    ("\u00e1stico", 4, "", ("eclesi\u00e1stico",)),
    ("al\u00edstico", 3, "", ()),
    ("\u00e1utico", 4, "", ()),
    ("\u00eautico", 4, "", ()),
    ("tico", 3, "", ("pol\u00edtico", "eclesi\u00e1stico", "diagnostico", "pr\u00e1tico", "dom\u00e9stico", "diagn\u00f3stico", "id\u00eantico", "alop\u00e1tico", "art\u00edstico", "aut\u00eantico", "ecl\u00e9tico", "cr\u00edtico", "critico")),
    ("ico", 4, "", ("tico", "p\u00fablico", "explico")),
    ("ividade", 5, "", ()),
    ("idade", 4, "", ("autoridade", "comunidade")),
    ("oria", 4, "", ("categoria",)),
    ("encial", 5, "", ()),
    ("ista", 4, "", ()),
    ("auta", 5, "", ()),
    ("quice", 4, "c", ()),
    ("ice", 4, "", ("c\u00famplice",)),
    ("\u00edaco", 3, "", ()),
    ("ente", 4, "", ("freq\u00fcente", "alimente", "acrescente", "permanente", "oriente", "aparente")),
    ("ense", 5, "", ()),
    ("inal", 3, "", ()),
    ("ano", 4, "", ()),
    ("\u00e1vel", 2, "", ("af\u00e1vel", "razo\u00e1vel", "pot\u00e1vel", "vulner\u00e1vel")),
    ("\u00edvel", 3, "", ("poss\u00edvel",)),
    ("vel", 5, "", ("poss\u00edvel", "vulner\u00e1vel", "sol\u00favel")),
    ("bil", 3, "vel", ()),
    ("ura", 4, "", ("imatura", "acupuntura", "costura")),
    ("ural", 4, "", ()),
    ("ual", 3, "", ("bissexual", "virtual", "visual", "pontual")),
    ("ial", 3, "", ()),
    ("al", 4, "", ("afinal", "animal", "estatal", "bissexual", "desleal", "fiscal", "formal", "pessoal", "liberal", "postal", "virtual", "visual", "pontual", "sideral", "sucursal")),
    ("alismo", 4, "", ()),
    ("ivismo", 4, "", ()),
    ("ismo", 3, "", ("cinismo",)),
)

_VERB = (
    ("ar\u00edamo", 2, "", ()),
    ("\u00e1ssemo", 2, "", ()),
    ("er\u00edamo", 2, "", ()),
    ("\u00eassemo", 2, "", ()),
    ("ir\u00edamo", 3, "", ()),
    ("\u00edssemo", 3, "", ()),
    ("\u00e1ramo", 2, "", ()),
    ("\u00e1rei", 2, "", ()),
    ("aremo", 2, "", ()),
    ("ariam", 2, "", ()),
    ("ar\u00edei", 2, "", ()),
    ("\u00e1ssei", 2, "", ()),
    ("assem", 2, "", ()),
    ("\u00e1vamo", 2, "", ()),
    ("\u00earamo", 3, "", ()),
    ("eremo", 3, "", ()),
    ("eriam", 3, "", ()),
    ("er\u00edei", 3, "", ()),
    ("\u00eassei", 3, "", ()),
    ("essem", 3, "", ()),
    ("\u00edramo", 3, "", ()),
    ("iremo", 3, "", ()),
    ("iriam", 3, "", ()),
    ("ir\u00edei", 3, "", ()),
    ("\u00edssei", 3, "", ()),
    ("issem", 3, "", ()),
    ("ando", 2, "", ()),
    ("endo", 3, "", ()),
    ("indo", 3, "", ()),
    ("ondo", 3, "", ()),
    ("aram", 2, "", ()),
    ("ar\u00e3o", 2, "", ()),
    ("arde", 2, "", ()),
    ("arei", 2, "", ()),
    ("arem", 2, "", ()),
    ("aria", 2, "", ()),
    ("armo", 2, "", ()),
    ("asse", 2, "", ()),
    ("aste", 2, "", ()),
    ("avam", 2, "", ("agravam",)),
    ("\u00e1vei", 2, "", ()),
    ("eram", 3, "", ()),
    ("er\u00e3o", 3, "", ()),
    ("erde", 3, "", ()),
    ("erei", 3, "", ()),
    ("\u00earei", 3, "", ()),
    ("erem", 3, "", ()),
    ("eria", 3, "", ()),
    ("ermo", 3, "", ()),
    ("esse", 3, "", ()),
    ("este", 3, "", ("faroeste", "agreste")),
    ("\u00edamo", 3, "", ()),
    ("iram", 3, "", ()),
    ("\u00edram", 3, "", ()),
    ("ir\u00e3o", 2, "", ()),
    ("irde", 2, "", ()),
    ("irei", 3, "", ("admirei",)),
    ("irem", 3, "", ("adquirem",)),
    ("iria", 3, "", ()),
    ("irmo", 3, "", ()),
    ("isse", 3, "", ()),
    ("iste", 4, "", ()),
    ("iava", 4, "", ("ampliava",)),
    ("amo", 2, "", ()),
    ("iona", 3, "", ()),
    ("ara", 2, "", ("arara", "prepara")),
    ("ar\u00e1", 2, "", ("alvar\u00e1",)),
    ("are", 2, "", ("prepare",)),
    ("ava", 2, "", ("agrava",)),
    ("emo", 2, "", ()),
    ("era", 3, "", ("acelera", "espera")),
    ("er\u00e1", 3, "", ()),
    ("ere", 3, "", ("espere",)),
    ("iam", 3, "", ("enfiam", "ampliam", "elogiam", "ensaiam")),
    ("\u00edei", 3, "", ()),
    ("imo", 3, "", ("reprimo", "intimo", "\u00edntimo", "nimo", "queimo", "ximo")),
    ("ira", 3, "", ("fronteira", "s\u00e1tira")),
    ("\u00eddo", 3, "", ()),
    ("ir\u00e1", 3, "", ()),
    ("tizar", 4, "", ("alfabetizar",)),
    ("izar", 5, "", ("organizar",)),
    ("itar", 5, "", ("acreditar", "explicitar", "estreitar")),
    ("ire", 3, "", ("adquire",)),
    ("omo", 3, "", ()),
    ("ai", 2, "", ()),
    ("am", 2, "", ()),
    ("ear", 4, "", ("alardear", "nuclear")),
    ("ar", 2, "", ("azar", "bazaar", "patamar")),
    ("uei", 3, "", ()),
    ("u\u00eda", 5, "u", ()),
    ("ei", 3, "", ()),
    ("guem", 3, "g", ()),
    ("em", 2, "", ("alem", "virgem")),
    ("er", 2, "", ("\u00e9ter", "pier")),
    ("eu", 3, "", ("chapeu",)),
    ("ia", 3, "", ("est\u00f3ria", "fatia", "acia", "praia", "elogia", "mania", "l\u00e1bia", "aprecia", "pol\u00edcia", "arredia", "cheia", "\u00e1sia")),
    ("ir", 3, "", ("freir",)),
    ("iu", 3, "", ()),
    ("eou", 5, "", ()),
    ("ou", 3, "", ()),
    ("i", 3, "", ()),
)

_VOWEL = (
    ("bil", 2, "vel", ()),
    ("gue", 2, "g", ("gangue", "jegue")),
    ("\u00e1", 3, "", ()),
    ("\u00ea", 3, "", ("beb\u00ea",)),
    ("a", 3, "", ("\u00e1sia",)),
    ("e", 3, "", ()),
    ("o", 3, "", ("\u00e3o",)),
)

STEPS = {
    "Plural": (_PLURAL, 3, 1, ("s",)),
    "Adverb": (_ADVERB, 0, 0, ()),
    "Feminine": (_FEMININE, 3, 1, ("a", "\u00e3")),
    "Augmentative": (_AUGMENTATIVE, 0, 1, ()),
    "Noun": (_NOUN, 0, 0, ()),
    "Verb": (_VERB, 0, 0, ()),
    "Vowel": (_VOWEL, 0, 0, ()),
}


def _step_min(rules, mn):
    if mn:
        return mn
    return min(r[1] + len(r[0]) for r in rules)


def _apply_step(t: str, name: str) -> str:
    rules, mn, whole_word_exc, conds = STEPS[name]
    if len(t) < _step_min(rules, mn):
        return t
    if conds and not t.endswith(conds):
        return t
    for suf, rmn, rep, excs in rules:
        if len(t) - len(suf) >= rmn and t.endswith(suf):
            if excs:
                if whole_word_exc:
                    if t in excs:
                        continue
                elif t.endswith(excs):
                    continue
            return t[: len(t) - len(suf)] + rep
    return t


_FOLD = str.maketrans(
    "\u00e0\u00e1\u00e2\u00e3\u00e4\u00e5\u00e7\u00e8\u00e9\u00ea"
    "\u00eb\u00ec\u00ed\u00ee\u00ef\u00f1\u00f2\u00f3\u00f4\u00f5"
    "\u00f6\u00f9\u00fa\u00fb\u00fc",
    "aaaaaaceeeeiiiinooooouuuu")


def portuguese_rslp_stem(t: str) -> str:
    """PortugueseStemmer.stem flow (PortugueseStemmer.java:49-76): plural,
    adverb, feminine, augmentative; then noun — if no noun suffix removed,
    verb — if no verb suffix removed, final-vowel; then RSLP accent
    removal."""
    t = _apply_step(t, "Plural")
    t = _apply_step(t, "Adverb")
    t = _apply_step(t, "Feminine")
    t = _apply_step(t, "Augmentative")
    old = t
    t = _apply_step(t, "Noun")
    if t == old:
        t = _apply_step(t, "Verb")
        if t == old:
            t = _apply_step(t, "Vowel")
    return t.translate(_FOLD)
