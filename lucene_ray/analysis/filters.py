"""Token filters — the analysis-chain "zoo" seam made concrete.

Lucene's analysis-common module chains ``TokenFilter``s after the tokenizer
(SURVEY §2.2: ~40 language packs, ngram, shingle, synonym, minhash…). The
engine's vectorized inverter works on a per-partition *vocabulary* (unique
tokens), so filters here operate at vocab level — O(|vocab|) Python, never
O(|tokens|) — and are applied identically on the build side
(``invert_partition``) and the query side (``AnalyzerChain``):

- ``PorterStemFilter``   — classic Porter stemming (PorterStemFilter.java)
- ``AsciiFoldingFilter`` — strip diacritics (ASCIIFoldingFilter.java)
- ``SynonymFilter``      — index-time same-position synonym injection
  (SynonymGraphFilter semantics for single-token synonyms: injected tokens
  carry position-increment 0, so they occupy the SAME position as the
  source token and do NOT count toward field length — discountOverlaps,
  Similarity.computeNorm / FieldInvertState.numOverlap)

Filters are configured as JSON-able specs so they round-trip through the
index manifest: ``("porter_stem",)``, ``("ascii_fold",)``,
``("synonyms", {"fast": ["quick"]})``. Use :func:`build_filters` to
instantiate and :class:`AnalyzerChain` for the query side.
"""

from __future__ import annotations

import unicodedata

from lucene_ray.analysis.porter import porter_stem
from lucene_ray.analysis.tokenizer import DEFAULT_MAX_TOKEN_LENGTH, CodeTokenizer


class TokenFilter:
    """Vocab-level filter. Subclasses implement ``map_term`` (1:1 rewrite,
    applied to every unique token) and/or ``synonyms`` (extra same-position
    terms injected per occurrence of the token)."""

    def map_term(self, term: str) -> str:
        return term

    def synonyms(self, term: str) -> tuple:
        return ()


class PorterStemFilter(TokenFilter):
    spec = ("porter_stem",)
    respects_keyword = True  # KeywordAttribute-aware (PorterStemFilter.java:48)

    def map_term(self, term: str) -> str:
        return porter_stem(term)


class KeywordMarkerFilter(TokenFilter):
    """SetKeywordMarkerFilter (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/miscellaneous/SetKeywordMarkerFilter.java:28): marks the
    listed terms as keywords so keyword-aware downstream stages (stemmers)
    pass them through unchanged. Place BEFORE the stemmer in the chain."""

    def __init__(self, protected):
        self.protected = frozenset(protected)
        self.spec = ("keyword_marker", sorted(self.protected))


class StemmerOverrideFilter(TokenFilter):
    """StemmerOverrideFilter (miscellaneous/StemmerOverrideFilter.java:38):
    terms in the override map rewrite to their given stem AND become
    keywords, so a downstream stemmer leaves them alone. Place BEFORE the
    stemmer."""

    def __init__(self, overrides: dict):
        self.overrides = {str(k): str(v) for k, v in overrides.items()}
        self.spec = ("stemmer_override", dict(sorted(self.overrides.items())))

    def map_term(self, term: str) -> str:
        return self.overrides.get(term, term)


class LengthFilter(TokenFilter):
    """LengthFilter (miscellaneous/LengthFilter.java:29): drops tokens whose
    char length falls outside [min, max]. A FilteringTokenFilter — dropped
    tokens leave position holes and do not count toward field length."""

    def __init__(self, min_len: int = 1, max_len: int = DEFAULT_MAX_TOKEN_LENGTH):
        if not (0 < min_len <= max_len):
            raise ValueError(f"illegal length range: [{min_len}, {max_len}]")
        self.min_len = min_len
        self.max_len = max_len
        self.spec = ("length", {"min": min_len, "max": max_len})

    def drop(self, term: str) -> bool:
        return not (self.min_len <= len(term) <= self.max_len)


class TruncateTokenFilter(TokenFilter):
    """TruncateTokenFilter (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/miscellaneous/TruncateTokenFilter.java:29): truncates
    every token to at most ``length`` chars. Keyword-aware, as in the
    Java."""

    respects_keyword = True

    def __init__(self, length: int):
        if length < 1:
            raise ValueError("length must be >= 1")
        self.length = int(length)
        self.spec = ("truncate", self.length)

    def map_term(self, term: str) -> str:
        return term[: self.length]


class PatternReplaceFilter(TokenFilter):
    """PatternReplaceFilter (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/pattern/PatternReplaceFilter.java:33): regex
    substitution on every token (all occurrences when ``replace_all``,
    else the first)."""

    def __init__(self, pattern: str, replacement: str = "",
                 replace_all: bool = True):
        import re as _re

        self.pattern = pattern
        self.replacement = replacement
        self.replace_all = bool(replace_all)
        self._rx = _re.compile(pattern)
        self.spec = ("pattern_replace", {"pattern": pattern,
                                         "replacement": replacement,
                                         "all": self.replace_all})

    def map_term(self, term: str) -> str:
        return self._rx.sub(self.replacement, term,
                            count=0 if self.replace_all else 1)


class PatternCaptureGroupFilter(TokenFilter):
    """PatternCaptureGroupTokenFilter (lucene/analysis/common/src/java/org/
    apache/lucene/analysis/pattern/PatternCaptureGroupTokenFilter.java:56):
    emits every capture group of every pattern as a same-position token
    (posInc 0), preserving the original — e.g. splitting
    "camelCaseToken" into its parts for code search."""

    def __init__(self, patterns):
        import re as _re

        self.patterns = tuple(patterns)
        self._rxs = tuple(_re.compile(p) for p in self.patterns)
        self.spec = ("pattern_capture", list(self.patterns))

    def synonyms(self, term: str) -> tuple:
        out: list[str] = []
        for rx in self._rxs:
            for m in rx.finditer(term):
                for g in m.groups():
                    if g and g != term:
                        out.append(g)
        return tuple(dict.fromkeys(out))


class ReverseStringFilter(TokenFilter):
    """ReverseStringFilter (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/reverse/ReverseStringFilter.java:39): reverses every
    token. Indexing a mirror field through this filter turns a leading
    wildcard (``*suffix``) into a cheap PrefixQuery on the reversed field —
    the classic Solr ReversedWildcardFilter pattern."""

    spec = ("reverse",)

    def map_term(self, term: str) -> str:
        return term[::-1]


class ElisionFilter(TokenFilter):
    """ElisionFilter (lucene/analysis/common/src/java/org/apache/lucene/
    analysis/util/ElisionFilter.java:34): strips a leading article +
    apostrophe ("l'avion" -> "avion") when the article is in the configured
    set (FrenchAnalyzer's DEFAULT_ARTICLES by default)."""

    DEFAULT_ARTICLES = ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
                        "jusqu", "quoiqu", "lorsqu", "puisqu")

    def __init__(self, articles=None):
        arts = tuple(articles) if articles is not None else self.DEFAULT_ARTICLES
        self.articles = frozenset(a.lower() for a in arts)
        self.spec = ("elision", sorted(self.articles))

    def map_term(self, term: str) -> str:
        for apos in ("'", "’"):
            i = term.find(apos)
            if 0 < i < len(term) - 1 and term[:i].lower() in self.articles:
                return term[i + 1:]
        return term


class DecimalDigitFilter(TokenFilter):
    """DecimalDigitFilter (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/core/DecimalDigitFilter.java:30): folds any Unicode
    decimal digit (Nd) to its 0-9 equivalent ('٣' -> '3')."""

    spec = ("decimal_digit",)

    def map_term(self, term: str) -> str:
        if term.isascii():
            return term
        out = []
        for c in term:
            d = unicodedata.digit(c, None)
            out.append(str(d) if d is not None and not c.isascii() else c)
        return "".join(out)


class AsciiFoldingFilter(TokenFilter):
    """NFKD-decompose and drop combining marks — covers the accented-Latin
    core of Lucene's ASCIIFoldingFilter table."""

    spec = ("ascii_fold",)

    def map_term(self, term: str) -> str:
        if term.isascii():
            return term
        out = unicodedata.normalize("NFKD", term)
        return "".join(c for c in out if not unicodedata.combining(c))


class ICUFoldingFilter(TokenFilter):
    """Unicode-correct case/diacritic folding — the behavior of Lucene's
    ICUFoldingFilter (lucene/analysis/icu/src/java/org/apache/lucene/
    analysis/icu/ICUFoldingFilter.java:57: UTR#30 NFKC_CaseFold plus
    diacritic removal), built from public ``unicodedata`` primitives so no
    ICU library is needed: NFKC-normalize, strip combining marks (after an
    NFKD pass so precomposed letters expose their marks), then full
    Unicode casefold, and a final NFKC to re-compose. Idempotent:
    fold(fold(x)) == fold(x) (property-tested)."""

    spec = ("icu_fold",)

    def map_term(self, term: str) -> str:
        if term.isascii():
            return term.casefold()
        t = unicodedata.normalize("NFKC", term)
        t = unicodedata.normalize("NFKD", t)
        t = "".join(c for c in t if not unicodedata.combining(c))
        t = t.casefold()
        return unicodedata.normalize("NFKC", t)


class SynonymFilter(TokenFilter):
    """Single-token synonym injection: occurrences of a key term also emit
    its synonyms at the same position (one-directional; list both directions
    for symmetric synonymy)."""

    def __init__(self, mapping: dict):
        self.mapping = {k: tuple(v) for k, v in mapping.items()}
        self.spec = ("synonyms", {k: list(v) for k, v in self.mapping.items()})

    def synonyms(self, term: str) -> tuple:
        return self.mapping.get(term, ())


class EdgeNGramFilter(TokenFilter):
    """Index-time edge n-grams: every term also emits its strict prefixes of
    length ``min``..``max`` at the same position — the search-as-you-type /
    autocomplete shape (EdgeNGramTokenFilter.java:36, which likewise keeps
    the gram at the original token's position). A typed prefix then matches
    as a plain TermQuery with no dictionary expansion at query time, trading
    index size (~(max-min+1) extra postings per long term) for O(1) prefix
    lookups."""

    def __init__(self, min_gram: int = 2, max_gram: int = 5):
        if not (1 <= min_gram <= max_gram):
            raise ValueError(f"illegal gram range: [{min_gram}, {max_gram}]")
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.spec = ("edge_ngram", {"min": min_gram, "max": max_gram})

    def synonyms(self, term: str) -> tuple:
        top = min(self.max_gram, len(term) - 1)
        return tuple(term[:n] for n in range(self.min_gram, top + 1))


class StemKeepOriginalFilter(TokenFilter):
    """The KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter
    chain (lucene/analysis/common/src/java/org/apache/lucene/analysis/
    miscellaneous/KeywordRepeatFilter.java:29 — "emit each incoming token
    twice, one ... keyword and once non-keyword", the keyword copy passing
    through the stemmer unchanged, then RemoveDuplicatesTokenFilter.java
    collapsing same-position duplicates): every token is indexed in BOTH
    its original and stemmed form at the same position, so exact-form and
    stemmed queries both match. The injected stem is position-increment-0
    (does not count toward field length), matching the chain's norms."""

    spec = ("stem_keep_original",)
    respects_keyword = True

    def synonyms(self, term: str) -> tuple:
        st = porter_stem(term)
        return (st,) if st != term else ()


_SOUNDEX_CODE = {c: d for c, d in zip("abcdefghijklmnopqrstuvwxyz",
                                      "01230120022455012623010202")}


def soundex(term: str) -> str:
    """American Soundex, commons-codec US_ENGLISH semantics (the encoder
    Lucene's PhoneticFilter ships by default — lucene/analysis/phonetic/src/
    java/org/apache/lucene/analysis/phonetic/PhoneticFilter.java:33):
    first letter + three digits, consonants H/W are silent AND transparent
    (a consonant seen across H/W with the same code is not re-emitted),
    vowels reset adjacency, zero-padded. Returns '' for terms with no
    ASCII letters (codes are only injected for alphabetic tokens)."""
    letters = [c for c in term.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    out = letters[0].upper()
    last = _SOUNDEX_CODE[letters[0]]
    for c in letters[1:]:
        if c in "hw":
            continue  # silent AND transparent: `last` survives across it
        code = _SOUNDEX_CODE[c]
        if code == "0":
            last = "0"  # vowel: resets adjacency, emits nothing
            continue
        if code != last:
            out += code
            if len(out) == 4:
                break
        last = code
    return out.ljust(4, "0")


class PhoneticFilter(TokenFilter):
    """Soundex phonetic terms (PhoneticFilter + commons-codec Soundex).
    ``inject=True`` (Lucene's default) keeps the original token and adds
    the code at the same position; ``inject=False`` replaces it. Codes are
    emitted lowercased so they live in the same term namespace as analyzed
    tokens, and only for purely alphabetic tokens."""

    def __init__(self, inject: bool = True):
        self.inject = inject
        self.spec = ("phonetic", {"inject": inject})

    def _code(self, term: str) -> str:
        return soundex(term).lower() if term.isalpha() and term.isascii() else ""

    def map_term(self, term: str) -> str:
        if self.inject:
            return term
        c = self._code(term)
        return c or term

    def synonyms(self, term: str) -> tuple:
        if not self.inject:
            return ()
        c = self._code(term)
        return (c,) if c and c != term else ()


def build_filters(specs) -> tuple:
    """Instantiate filters from JSON-able specs (manifest round-trip)."""
    out = []
    for spec in specs or ():
        kind = spec[0]
        if kind == "porter_stem":
            out.append(PorterStemFilter())
        elif kind == "stem_keep_original":
            out.append(StemKeepOriginalFilter())
        elif kind == "ascii_fold":
            out.append(AsciiFoldingFilter())
        elif kind == "icu_fold":
            out.append(ICUFoldingFilter())
        elif kind == "synonyms":
            out.append(SynonymFilter(spec[1]))
        elif kind == "edge_ngram":
            out.append(EdgeNGramFilter(spec[1]["min"], spec[1]["max"]))
        elif kind == "phonetic":
            out.append(PhoneticFilter(bool(spec[1].get("inject", True))))
        elif kind == "light_stem":
            from lucene_ray.analysis.lang import LightStemFilter

            out.append(LightStemFilter(spec[1]["lang"]))
        elif kind == "keyword_marker":
            out.append(KeywordMarkerFilter(spec[1]))
        elif kind == "stemmer_override":
            out.append(StemmerOverrideFilter(spec[1]))
        elif kind == "length":
            out.append(LengthFilter(spec[1]["min"], spec[1]["max"]))
        elif kind == "reverse":
            out.append(ReverseStringFilter())
        elif kind == "truncate":
            out.append(TruncateTokenFilter(spec[1]))
        elif kind == "pattern_replace":
            p = spec[1]
            out.append(PatternReplaceFilter(p["pattern"], p["replacement"],
                                            p.get("all", True)))
        elif kind == "pattern_capture":
            out.append(PatternCaptureGroupFilter(spec[1]))
        elif kind == "elision":
            out.append(ElisionFilter(spec[1] if len(spec) > 1 else None))
        elif kind == "decimal_digit":
            out.append(DecimalDigitFilter())
        elif kind == "dict_decompound":
            from lucene_ray.analysis.compound import DictionaryCompoundFilter

            p = spec[1]
            out.append(DictionaryCompoundFilter(
                p["dict"], p.get("min_word", 5), p.get("min_sub", 2),
                p.get("max_sub", 15), p.get("longest", False)))
        elif kind == "hyph_decompound":
            from lucene_ray.analysis.compound import (
                HyphenationCompoundFilter, HyphenationPatterns)

            p = spec[1]
            out.append(HyphenationCompoundFilter(
                HyphenationPatterns(p["patterns"]), p.get("dict"),
                p.get("min_word", 5), p.get("min_sub", 2),
                p.get("max_sub", 15), p.get("longest", False)))
        else:
            raise ValueError(f"unknown token filter spec: {spec!r}")
    return tuple(out)


def apply_to_vocab(filters, vocab: list) -> tuple[list, list, list]:
    """Run the chain over a vocabulary.

    Returns ``(mapped, extra, dropped)`` where ``mapped[i]`` is the
    rewritten term for vocab entry i, ``extra[i]`` is a tuple of additional
    same-position terms injected for it, and ``dropped[i]`` says a
    FilteringTokenFilter stage (LengthFilter) removed the token (callers
    drop its occurrences, keeping position holes and subtracting it from
    field length). Synonym terms produced mid-chain are run through the
    REMAINING filters' map stages (an injected "quick" still gets stemmed
    by a later PorterStemFilter), matching chained-TokenFilter semantics.
    KeywordMarkerFilter marks terms so keyword-aware stages
    (respects_keyword=True, the KeywordAttribute contract) skip them."""
    mapped = list(vocab)
    extra: list[tuple] = [() for _ in vocab]
    protected = [False] * len(vocab)
    dropped = [False] * len(vocab)
    for fi, f in enumerate(filters):
        if isinstance(f, KeywordMarkerFilter):
            for i, t in enumerate(mapped):
                if t in f.protected:
                    protected[i] = True
            continue
        if isinstance(f, StemmerOverrideFilter):
            for i, t in enumerate(mapped):
                if t in f.overrides:
                    mapped[i] = f.overrides[t]
                    protected[i] = True  # overridden terms become keywords
            continue
        if hasattr(f, "drop"):
            for i, t in enumerate(mapped):
                if not dropped[i] and f.drop(t):
                    dropped[i] = True
            extra = [tuple(s for s in ex if not f.drop(s)) for ex in extra]
            continue
        respects = getattr(f, "respects_keyword", False)
        mapped = [
            t if (respects and protected[i]) else f.map_term(t)
            for i, t in enumerate(mapped)
        ]
        # map previously injected synonyms through this filter too
        extra = [tuple(f.map_term(t) for t in ex) for ex in extra]
        for i, t in enumerate(mapped):
            if respects and protected[i]:
                continue
            syns = f.synonyms(t)
            if syns:
                tail = filters[fi + 1 :]
                for s in syns:
                    for g in tail:
                        s = g.map_term(s)
                    extra[i] = extra[i] + (s,)
    return mapped, extra, dropped


class AnalyzerChain:
    """Query-side analyzer: tokenizer + the chain's 1:1 map stages.

    Synonym *injection* is an index-time effect; the query side analyzes a
    term to the same normalized form the index stores (QueryBuilder uses the
    same analyzer for both in Lucene). Picklable; usable directly as the
    ``analyzer=`` argument of ``parse_query`` and as the ``tokenizer``
    callable seam."""

    def __init__(self, filter_specs=(), stopwords=None,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.filter_specs = tuple(filter_specs)
        self.stopwords = frozenset(stopwords) if stopwords else frozenset()
        self.tokenizer = CodeTokenizer(max_token_length)
        self._filters = build_filters(self.filter_specs)

    def __getstate__(self):
        return (self.filter_specs, self.stopwords, self.tokenizer.max_token_length)

    def __setstate__(self, st):
        self.__init__(st[0], st[1], st[2])

    def __call__(self, text: str) -> list[str]:
        toks = self.tokenizer(text)
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        # replay the full chain semantics (maps, keyword marking, drops) on
        # the query tokens — synonym INJECTION stays index-time-only
        mapped, _extra, dropped = apply_to_vocab(self._filters, toks)
        return [t for t, d in zip(mapped, dropped) if not d]
