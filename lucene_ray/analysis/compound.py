"""Compound-word decomposition filters (German-style decompounding).

Behavioral references (reimplemented from the published algorithms — no
code shared with the Java):

- ``DictionaryCompoundFilter`` —
  lucene/analysis/common/src/java/org/apache/lucene/analysis/compound/
  DictionaryCompoundWordTokenFilter.java:30 (decompose: every dictionary
  word found as a substring of the token becomes a subword) on top of
  CompoundWordTokenFilterBase.java:47 (length bounds, subwords injected at
  the ORIGINAL token's position — position increment 0 — with the original
  kept).
- ``HyphenationCompoundFilter`` —
  .../compound/HyphenationCompoundWordTokenFilter.java:38: candidate
  subwords are spans between hyphenation points computed by Liang's
  pattern-trie algorithm (F.M. Liang, "Word Hy-phen-a-tion by Com-put-er",
  Stanford, 1983 — the public TeX algorithm, also the basis of
  .../compound/hyphenation/HyphenationTree.java), optionally checked
  against a dictionary (with Lucene's trailing-'s' retry).

Both plug into the engine's vocab-level filter chain
(``analysis/filters.py``): ``synonyms(term)`` returns the extra
same-position terms — exactly the flattened posInc=0 stream Lucene emits.
"""

from __future__ import annotations

from lucene_ray.analysis.filters import TokenFilter


class DictionaryCompoundFilter(TokenFilter):
    """Every dictionary word that appears as a substring of a long-enough
    token is emitted as a subword at the same position; the original token
    is kept (DictionaryCompoundWordTokenFilter.java:75 ``decompose``).

    ``only_longest_match`` keeps only the longest dictionary hit per start
    offset (same flag in the Java)."""

    def __init__(self, dictionary, min_word_size: int = 5,
                 min_subword_size: int = 2, max_subword_size: int = 15,
                 only_longest_match: bool = False):
        if min_word_size <= 0 or min_subword_size <= 0:
            raise ValueError("sizes must be positive")
        if max_subword_size < min_subword_size:
            raise ValueError("maxSubwordSize < minSubwordSize")
        self.dictionary = frozenset(dictionary)
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match
        self.spec = ("dict_decompound", {
            "dict": sorted(self.dictionary),
            "min_word": min_word_size,
            "min_sub": min_subword_size,
            "max_sub": max_subword_size,
            "longest": only_longest_match,
        })

    def synonyms(self, term: str) -> tuple:
        n = len(term)
        if n < self.min_word_size:
            return ()
        out: list[str] = []
        for i in range(n - self.min_subword_size + 1):
            longest = None
            hi = min(self.max_subword_size, n - i)
            for j in range(self.min_subword_size, hi + 1):
                cand = term[i:i + j]
                if cand in self.dictionary:
                    if self.only_longest_match:
                        longest = cand
                    else:
                        out.append(cand)
            if longest is not None:
                out.append(longest)
        # a subword equal to the whole token adds nothing (same postings row)
        return tuple(s for s in out if s != term)


class HyphenationPatterns:
    """Liang's pattern-based hyphenator (the public TeX algorithm).

    Patterns are strings of letters with interleaved digits ("hy3ph",
    ".ach4", "4m1p"); '.' anchors a word edge. ``points(word)`` returns the
    inter-letter priority array: a break is legal where the max applied
    digit is odd. This is the same structure HyphenationTree.java builds
    from the XML pattern files — here the (tiny, synthetic or user-supplied)
    pattern list is passed directly."""

    def __init__(self, patterns):
        self.table: dict[str, tuple] = {}
        for pat in patterns:
            letters = []
            digits = [0]  # digits[i] applies BEFORE letters[i]
            for ch in pat:
                if ch.isdigit():
                    digits[-1] = int(ch)
                else:
                    letters.append(ch)
                    digits.append(0)
            key = "".join(letters)
            self.table[key] = tuple(digits)
        self.max_len = max((len(k) for k in self.table), default=0)

    def points(self, word: str) -> list:
        """Max pattern digit at each of the len(word)+1 gaps of the padded
        word '.word.' (gap g sits before padded char g)."""
        padded = "." + word + "."
        n = len(padded)
        pts = [0] * (n + 1)
        for i in range(n):
            for j in range(1, min(self.max_len, n - i) + 1):
                dig = self.table.get(padded[i:i + j])
                if dig:
                    for k, d in enumerate(dig):
                        if d > pts[i + k]:
                            pts[i + k] = d
        return pts

    def hyphenation_points(self, word: str, left_min: int = 2,
                           right_min: int = 2) -> list:
        """Indices inside ``word`` where a hyphen may go (odd max digit),
        respecting the no-break margins at both ends (TeX's
        \\lefthyphenmin/\\righthyphenmin; HyphenationTree.hyphenate applies
        the same remainCount/pushCount margins)."""
        pts = self.points(word)
        out = []
        for i in range(left_min, len(word) - right_min + 1):
            # gap before word[i] is padded gap i+1
            if pts[i + 1] % 2 == 1:
                out.append(i)
        return out


class HyphenationCompoundFilter(TokenFilter):
    """Subword candidates are the spans between consecutive hyphenation
    points (word edges included). With a dictionary, a span is emitted only
    when it (or the span minus a trailing 's' — the Java's German-genitive
    retry, HyphenationCompoundWordTokenFilter.java:170) is in the
    dictionary; without one, every span within the size bounds is emitted
    (the no-dict mode the Java also supports)."""

    def __init__(self, patterns: HyphenationPatterns, dictionary=None,
                 min_word_size: int = 5, min_subword_size: int = 2,
                 max_subword_size: int = 15,
                 only_longest_match: bool = False):
        self.patterns = patterns
        self.dictionary = frozenset(dictionary) if dictionary else None
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match
        self.spec = ("hyph_decompound", {
            "patterns": sorted(
                self._spec_pattern(k, v) for k, v in patterns.table.items()),
            "dict": sorted(self.dictionary) if self.dictionary else None,
            "min_word": min_word_size,
            "min_sub": min_subword_size,
            "max_sub": max_subword_size,
            "longest": only_longest_match,
        })

    @staticmethod
    def _spec_pattern(letters: str, digits: tuple) -> str:
        out = []
        for i, ch in enumerate(letters):
            if digits[i]:
                out.append(str(digits[i]))
            out.append(ch)
        if digits[len(letters)]:
            out.append(str(digits[len(letters)]))
        return "".join(out)

    def synonyms(self, term: str) -> tuple:
        n = len(term)
        if n < self.min_word_size:
            return ()
        cuts = [0] + self.patterns.hyphenation_points(term) + [n]
        out: list[str] = []
        for a_i, a in enumerate(cuts[:-1]):
            longest = None
            for b in cuts[a_i + 1:]:
                w = b - a
                if w < self.min_subword_size:
                    continue
                if w > self.max_subword_size:
                    break
                cand = term[a:b]
                hit = None
                if self.dictionary is None:
                    hit = cand
                elif cand in self.dictionary:
                    hit = cand
                elif (cand.endswith("s") and len(cand) > self.min_subword_size
                      and cand[:-1] in self.dictionary):
                    hit = cand[:-1]
                if hit is not None:
                    if self.only_longest_match:
                        longest = hit
                    else:
                        out.append(hit)
            if longest is not None:
                out.append(longest)
        return tuple(s for s in out if s != term)
