"""Porter stemming algorithm (Porter, 1980) — the PorterStemFilter analog.

Behavioral reference: Lucene ships the same classic algorithm as
``PorterStemmer`` / ``PorterStemFilter``
(lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java,
PorterStemFilter.java) inside the analysis-common "zoo" (SURVEY §2.2).
This is an independent implementation of the published algorithm
("An algorithm for suffix stripping", M.F. Porter, Program 14(3) 1980),
not a translation of the Java file.

Operates on lowercase ASCII words; non-alpha tokens pass through unchanged
(the tokenizer grammar emits ``[a-z0-9_]`` runs, and stemming identifiers
with digits/underscores would corrupt them, mirroring how Lucene's filter
only transforms pure-letter tokens usefully).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form of the stem."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonant run
    while i < n and _is_consonant(stem, i):
        i += 1
    while i < n:
        # vowel run
        while i < n and not _is_consonant(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_consonant(stem, i):
            i += 1
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_consonant(word, n - 3)
        and not _is_consonant(word, n - 2)
        and _is_consonant(word, n - 1)
        and word[-1] not in "wxy"
    )


def _replace_suffix(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m - ... returns the
    replacement; None when the rule does not fire. min_m is the required
    m of the stem (rule condition (m > min_m-1) i.e. m >= min_m)."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return None


# step 2..4 rule tables: suffix -> (replacement, required stem measure)
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase word (classic Porter, all 5 steps)."""
    if len(word) <= 2 or not word.isalpha():
        return word

    # ---- step 1a ----
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # ---- step 1b ----
    if word.endswith("eed"):
        stem = word[:-3]
        if _measure(stem) > 0:
            word = word[:-1]
    else:
        hit = None
        if word.endswith("ed") and _contains_vowel(word[:-2]):
            hit = word[:-2]
        elif word.endswith("ing") and _contains_vowel(word[:-3]):
            hit = word[:-3]
        if hit is not None:
            word = hit
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif _ends_double_consonant(word) and word[-1] not in "lsz":
                word = word[:-1]
            elif _measure(word) == 1 and _ends_cvc(word):
                word += "e"

    # ---- step 1c ----
    if word.endswith("y") and _contains_vowel(word[:-1]):
        word = word[:-1] + "i"

    # ---- step 2 (m > 0) ----
    for suf, repl in _STEP2:
        if word.endswith(suf):
            r = _replace_suffix(word, suf, repl, 1)
            if r is not None:
                word = r
            break

    # ---- step 3 (m > 0) ----
    for suf, repl in _STEP3:
        if word.endswith(suf):
            r = _replace_suffix(word, suf, repl, 1)
            if r is not None:
                word = r
            break

    # ---- step 4 (m > 1) ----
    for suf in _STEP4:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                word = stem
            break

    # ---- step 5a (m > 1, or m == 1 and not *o) ----
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            word = stem

    # ---- step 5b (m > 1, ends ll -> l) ----
    if _measure(word) > 1 and word.endswith("ll"):
        word = word[:-1]

    return word
