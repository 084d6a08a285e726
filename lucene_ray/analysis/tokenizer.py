"""Tokenizers — the per-record "analysis chain" map.

Behavioral reference: Lucene's ``StandardAnalyzer`` =
``StandardTokenizer -> LowerCaseFilter -> StopFilter(empty default set)``
(lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:34-89).

We deliberately pin a *documented, simplified* grammar instead of porting the
38k-line generated JFlex UAX#29 scanner
(StandardTokenizerImpl.jflex): tokens are maximal runs of ``[A-Za-z0-9_]``
(UAX#29 treats ``_`` as ExtendNumLet, i.e. a joiner, so for ASCII
code-identifier text this matches StandardTokenizer), lowercased, and split
into chunks of ``max_token_length`` (255) characters — StandardTokenizer's
documented behavior for over-long tokens
(StandardTokenizer.java:80-84: "longer tokens are split at 255-char
intervals"). The SAME callable is used on the build side and the query side,
so rank-identity is internal to the engine; parity with Java Lucene holds on
the constrained ASCII fixture grammar (see FIXTURES.md F1).

The tokenizer is a plain picklable callable so it can ship into
``Dataset.map_batches`` tasks/actors.
"""

from __future__ import annotations

import re
from collections import Counter

# Default maximum token length, per StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH
# (StandardAnalyzer.java:37).
DEFAULT_MAX_TOKEN_LENGTH = 255

_TOKEN_RE = re.compile(r"[a-z0-9_]+")


class CodeTokenizer:
    """``text -> list[str]`` tokens (lowercased ASCII identifier runs)."""

    def __init__(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.max_token_length = max_token_length

    def __call__(self, text: str) -> list[str]:
        m = self.max_token_length
        out: list[str] = []
        for tok in _TOKEN_RE.findall(text.lower()):
            if len(tok) <= m:
                out.append(tok)
            else:
                # split over-long tokens at m-char intervals (StandardTokenizer
                # scanner-buffer behavior)
                out.extend(tok[i : i + m] for i in range(0, len(tok), m))
        return out


class PatternTokenizer:
    """``text -> list[str]`` under a ``pattern:<regex>`` grammar
    (analysis/pattern/PatternTokenizer.java:40-56, group=-1 "pattern
    matches tokens" mode) — the query-side twin of the build-side
    ``_tokenize_column_pattern`` so analyzed queries match the index."""

    def __init__(self, pattern: str,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.rx = re.compile(pattern)
        self.max_token_length = max_token_length
        self.grammar = f"pattern:{pattern}"

    def __call__(self, text: str) -> list[str]:
        m = self.max_token_length
        return [t.group(0)[:m] for t in self.rx.finditer(text.lower())
                if t.group(0)]


class StandardLikeAnalyzer:
    """Analyzer facade: tokenize + (optional) stopword removal.

    Lucene's StandardAnalyzer default stop set is EMPTY
    (StandardAnalyzer.java:51-53), so by default this is just the tokenizer.
    Stop removal keeps *position holes*: dropped tokens still advance the
    position counter (FilteringTokenFilter semantics) so phrase positions
    match Lucene's.
    """

    def __init__(
        self,
        stopwords: frozenset[str] | None = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ):
        self.tokenizer = CodeTokenizer(max_token_length)
        self.stopwords = frozenset(stopwords) if stopwords else frozenset()

    def tokens(self, text: str) -> list[str]:
        """All surviving tokens, in order (positions implicit — holes removed).

        Use :meth:`tokens_with_positions` when positions matter.
        """
        toks = self.tokenizer(text)
        if not self.stopwords:
            return toks
        return [t for t in toks if t not in self.stopwords]

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(token, position) pairs; stopword holes leave position gaps."""
        toks = self.tokenizer(text)
        if not self.stopwords:
            return [(t, i) for i, t in enumerate(toks)]
        return [(t, i) for i, t in enumerate(toks) if t not in self.stopwords]

    def invert(self, text: str) -> tuple[dict[str, list[int]], int]:
        """Invert one document: ``term -> sorted positions``, plus field length.

        Field length = number of surviving tokens (numOverlap is always 0 in
        this analyzer — no synonym/0-posInc tokens), matching
        ``FieldInvertState`` semantics used by ``Similarity.computeNorm``
        (lucene/core/src/java/org/apache/lucene/index/IndexingChain.java:1151-1166).
        """
        postings: dict[str, list[int]] = {}
        n = 0
        for term, pos in self.tokens_with_positions(text):
            postings.setdefault(term, []).append(pos)
            n += 1
        return postings, n

    def term_freqs(self, text: str) -> Counter:
        return Counter(self.tokens(text))

# ---------------------------------------------------------------------------
# Word-delimiter grammar ("word_delimiter")
#
# Lucene's WordDelimiterGraphFilter default behavior (GENERATE_WORD_PARTS |
# GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
# STEM_ENGLISH_POSSESSIVE; lucene/analysis/common/src/java/org/apache/
# lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java:64-120,
# WordDelimiterIterator.java) applied at index time (graph flattened: each
# subword at its own position), fused with the tokenizer: tokens are
# [A-Za-z0-9] runs (``_`` and every other byte delimit), subdivided at
# lower→Upper, acronym-end (``NASARover`` → NASA|Rover) and letter↔digit
# transitions, trailing possessive ``'s`` dropped, then lowercased.
# ---------------------------------------------------------------------------

_WDF_POSS_RE = re.compile(r"'[sS](?![A-Za-z0-9])")
_WDF_RUN_RE = re.compile(r"[A-Za-z0-9]+")
_WDF_SUB_RE = re.compile(r"[0-9]+|[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+")


class WordDelimiterTokenizer:
    """``text -> list[str]`` under the word_delimiter grammar. Scalar
    reference twin of ``invert._tokenize_column_wdf`` — used on the query
    side (``analyzer=`` seam) and as the parity oracle in tests."""

    grammar = "word_delimiter"

    def __init__(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.max_token_length = max_token_length

    def __call__(self, text: str) -> list[str]:
        m = self.max_token_length
        out: list[str] = []
        for run in _WDF_RUN_RE.findall(_WDF_POSS_RE.sub("", text)):
            for sub in _WDF_SUB_RE.findall(run):
                sub = sub.lower()
                if len(sub) <= m:
                    out.append(sub)
                else:
                    out.extend(sub[i: i + m] for i in range(0, len(sub), m))
        return out


# ---------------------------------------------------------------------------
# UAX#29-style multilingual grammar ("uax29")
#
# A practical port of StandardTokenizer's *behavior* (StandardTokenizer.java
# token types ALPHANUM / IDEOGRAPHIC / HIRAGANA / KATAKANA / HANGUL, grammar
# StandardTokenizerImpl.jflex) without the 38k-line generated scanner:
#
# - ALPHANUM: maximal runs of Unicode alphanumerics (str.isalnum) plus '_'
#   (ExtendNumLet) outside the CJK classes below — covers accented Latin,
#   Greek, Cyrillic, Arabic, Indic, ... scripts;
# - IDEOGRAPHIC / HIRAGANA: each character is its OWN token (unigram CJK,
#   exactly StandardTokenizer's emission);
# - KATAKANA / HANGUL: maximal same-class runs;
# - everything else separates; tokens longer than max_token_length split at
#   max_token_length-char intervals (same over-long rule as the code grammar).
# - JOINERS (round 5): the UAX#29 WB6/7 and WB11/12 rules from
#   StandardTokenizerImpl.jflex:91-92,216,238-247 —
#     AHLetter (MidLetter | MidNumLet | ') AHLetter   stays one token
#     Numeric  (MidNum    | MidNumLet | ') Numeric    stays one token
#   so "can't" -> can't, "3.14" -> 3.14, "1,000" -> 1,000,
#   "wiki.apache.org" -> wiki.apache.org, while "a.4" / "3:4" / "a..b"
#   still split (wrong neighbor class / double joiner). The joiner must sit
#   between a LETTER/DIGIT directly — '_' (ExtendNumLet) is not an anchor
#   ("x_:y" -> x_|y), matching the jflex grammar's iteration structure.
#
# Remaining documented divergences from full UAX#29:
# Extend/Format/ZWJ/regional-indicator rules and WB7a (Hebrew_Letter x
# Single_Quote) are omitted; '_' between katakana runs separates (WB13's
# Katakana x ExtendNumLet is not honored across our class runs).
# NOTE: with joiners, pure-ASCII text containing [letter]'[letter] /
# [digit].[digit] etc. now tokenizes DIFFERENTLY from the pinned code
# grammar (which is the point — StandardTokenizer-faithful).
# ---------------------------------------------------------------------------

CLS_SEP, CLS_WORD, CLS_IDEO, CLS_HIRA, CLS_KATA, CLS_HANG = 0, 1, 2, 3, 4, 5

# classes whose tokens are single characters (unigram emission)
SINGLE_CHAR_CLASSES = (CLS_IDEO, CLS_HIRA)

_SCRIPT_RANGES = (
    # (lo, hi inclusive, class)
    (0x3040, 0x309F, CLS_HIRA),   # Hiragana
    (0x30A0, 0x30FF, CLS_KATA),   # Katakana
    (0x31F0, 0x31FF, CLS_KATA),   # Katakana phonetic extensions
    (0xFF66, 0xFF9D, CLS_KATA),   # halfwidth Katakana
    (0x3400, 0x4DBF, CLS_IDEO),   # CJK ext A
    (0x4E00, 0x9FFF, CLS_IDEO),   # CJK unified
    (0xF900, 0xFAFF, CLS_IDEO),   # CJK compatibility
    (0x20000, 0x3134F, CLS_IDEO),  # CJK ext B..G
    (0xAC00, 0xD7A3, CLS_HANG),   # Hangul syllables
)


def codepoint_class(cp: int) -> int:
    """Token class of one codepoint (post-lowercase). Non-alphanumeric
    chars are separators even inside a script block (e.g. the katakana
    middle dot U+30FB)."""
    ch = chr(cp)
    if not (ch.isalnum() or ch == "_"):
        return CLS_SEP
    for lo, hi, cls in _SCRIPT_RANGES:
        if lo <= cp <= hi:
            return cls
    return CLS_WORD


# UAX#29 Word_Break joiner properties (Unicode 15 WordBreakProperty.txt
# values, the sets JFlex resolves for \p{WB:...} in
# StandardTokenizerImpl.jflex:91-96). jtype bit 1 = joins letters (WB6/7),
# bit 2 = joins numerics (WB11/12); MidNumLet and Single_Quote carry both.
_WB_MIDLETTER = frozenset([0x3A, 0xB7, 0x387, 0x55F, 0x5F4, 0x2027,
                           0xFE13, 0xFE55, 0xFF1A])
_WB_MIDNUM = frozenset([0x2C, 0x3B, 0x37E, 0x589, 0x60C, 0x60D, 0x66C,
                        0x7F8, 0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54,
                        0xFF0C, 0xFF1B])
_WB_MIDNUMLET = frozenset([0x2E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07,
                           0xFF0E])
_WB_SQ = frozenset([0x27])


def codepoint_joiner_type(cp: int) -> int:
    if cp in _WB_MIDNUMLET or cp in _WB_SQ:
        return 3
    if cp in _WB_MIDLETTER:
        return 1
    if cp in _WB_MIDNUM:
        return 2
    return 0


def codepoint_anchor_type(cp: int) -> int:
    """1 = letter anchor (AHLetter side of WB6/7), 2 = numeric anchor
    (WB11/12), 0 = neither. '_' is ExtendNumLet — NOT an anchor — and CJK
    single-char classes are not AHLetter."""
    ch = chr(cp)
    if ch.isdigit():
        return 2
    if ch == "_" or not ch.isalnum():
        return 0
    if codepoint_class(cp) != CLS_WORD:
        return 0
    return 1


def tokenize_uax29(texts: list[str], max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
                   cjk_bigrams: bool = False):
    """Vectorized uax29-grammar tokenization of ALREADY-LOWERCASED texts.

    Returns ``(tokens, doc_idx, positions, start_chars, end_chars)`` with
    numpy int64 arrays; offsets are codepoint offsets within each doc.
    Classification is one numpy gather over the batch's UNIQUE codepoints
    (alphabet-sized Python work, corpus-sized numpy work).

    ``cjk_bigrams``: CJKBigramFilter semantics (lucene/analysis/common/src/
    java/org/apache/lucene/analysis/cjk/CJKBigramFilter.java:53, the
    CJKAnalyzer default): each maximal region of single-char-class
    codepoints (ideographic + hiragana — the classes StandardTokenizer
    emits as single-char tokens) of length n >= 2 emits its n-1 overlapping
    character bigrams, one position each; an isolated char stays a unigram
    (outputUnigrams=false emits unigrams only where no bigram exists).
    Regions join across the two scripts, as the filter combines any
    adjacent flagged single-char tokens.
    """
    import numpy as np

    if not texts:
        z = np.zeros(0, np.int64)
        return [], z, z, z, z
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    n = len(cp)
    if n == 0:
        z = np.zeros(0, np.int64)
        return [], z, z, z, z
    uniq, inv = np.unique(cp, return_inverse=True)
    cls_u = np.array([codepoint_class(int(c)) for c in uniq], dtype=np.int8)
    jt_u = np.array([codepoint_joiner_type(int(c)) for c in uniq],
                    dtype=np.int8)
    at_u = np.array([codepoint_anchor_type(int(c)) for c in uniq],
                    dtype=np.int8)
    cls = cls_u[inv]
    jtype = jt_u[inv]
    atype = at_u[inv]

    lens = np.array([len(t) for t in texts], dtype=np.int64)
    doc_start = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=doc_start[1:])

    chg = np.empty(n, dtype=bool)
    chg[0] = True
    chg[1:] = cls[1:] != cls[:-1]
    run_s = np.flatnonzero(chg)
    run_e = np.append(run_s[1:], n)
    run_cls = cls[run_s]

    single = np.isin(run_cls, SINGLE_CHAR_CLASSES)
    multi = (run_cls != CLS_SEP) & ~single

    # ---- WB6/7 + WB11/12 joiners: a 1-char separator run whose codepoint
    # is a Mid* joiner glues its two neighboring WORD runs when the chars
    # DIRECTLY beside it are the right anchors (letter-letter for
    # MidLetter/MidNumLetQ, digit-digit for MidNum/MidNumLetQ)
    glue = np.zeros(len(run_s), dtype=bool)
    cand = np.flatnonzero(
        (run_cls == CLS_SEP) & (run_e - run_s == 1)
        & (jtype[run_s] != 0)
    )
    cand = cand[(cand > 0) & (cand < len(run_s) - 1)]
    if len(cand):
        prev_word = run_cls[cand - 1] == CLS_WORD
        next_word = run_cls[cand + 1] == CLS_WORD
        jt = jtype[run_s[cand]]
        pa_t = atype[run_s[cand] - 1]
        na_t = atype[run_e[cand]]
        let_ok = ((jt & 1) != 0) & (pa_t == 1) & (na_t == 1)
        num_ok = ((jt & 2) != 0) & (pa_t == 2) & (na_t == 2)
        glue[cand[prev_word & next_word & (let_ok | num_ok)]] = True

    parts_s, parts_e = [], []
    if single.any():
        s_r, e_r = run_s[single], run_e[single]
        if cjk_bigrams:
            # merge ADJACENT single-class runs (e.g. han|hiragana) into one
            # bigram region, then emit n-1 bigrams per region (unigram for
            # isolated chars)
            new_reg = np.empty(len(s_r), dtype=bool)
            new_reg[0] = True
            new_reg[1:] = s_r[1:] != e_r[:-1]
            reg_first = np.flatnonzero(new_reg)
            reg_last = np.r_[reg_first[1:] - 1, len(s_r) - 1]
            reg_s = s_r[reg_first]
            reg_e = e_r[reg_last]
            L = reg_e - reg_s
            counts = np.maximum(L - 1, 1)
            width = np.where(L >= 2, 2, 1)
            base = np.repeat(reg_s, counts)
            within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            idx = base + within
            parts_s.append(idx)
            parts_e.append(idx + np.repeat(width, counts))
        else:
            counts = e_r - s_r
            base = np.repeat(s_r, counts)
            within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            idx = base + within
            parts_s.append(idx)
            parts_e.append(idx + 1)
    if multi.any():
        # WORD runs collapse across valid glue runs into one span; KATA /
        # HANG runs stay maximal same-class runs (no Mid* joins)
        word_idx = np.flatnonzero(run_cls == CLS_WORD)
        span_s, span_e = [], []
        if len(word_idx):
            chained = np.zeros(len(word_idx), dtype=bool)
            if len(word_idx) > 1:
                chained[1:] = (np.diff(word_idx) == 2) & glue[word_idx[1:] - 1]
            first = np.flatnonzero(~chained)
            last = np.r_[first[1:] - 1, len(word_idx) - 1]
            span_s.append(run_s[word_idx[first]])
            span_e.append(run_e[word_idx[last]])
        other = multi & (run_cls != CLS_WORD)
        if other.any():
            span_s.append(run_s[other])
            span_e.append(run_e[other])
        s_r = np.concatenate(span_s)
        e_r = np.concatenate(span_e)
        lengths = e_r - s_r
        if lengths.max() > max_token_length:
            ns, ne = [], []
            for s0, e0, ln in zip(s_r, e_r, lengths):
                if ln <= max_token_length:
                    ns.append(np.array([s0]))
                    ne.append(np.array([e0]))
                else:
                    cs = np.arange(s0, e0, max_token_length, dtype=np.int64)
                    ns.append(cs)
                    ne.append(np.minimum(cs + max_token_length, e0))
            s_r = np.concatenate(ns)
            e_r = np.concatenate(ne)
        parts_s.append(s_r)
        parts_e.append(e_r)
    if not parts_s:
        z = np.zeros(0, np.int64)
        return [], z, z, z, z
    starts = np.concatenate(parts_s)
    ends = np.concatenate(parts_e)
    order = np.argsort(starts, kind="stable")
    starts, ends = starts[order], ends[order]

    tokens = [joined[s:e] for s, e in zip(starts, ends)]
    doc_idx = np.searchsorted(doc_start, starts, side="right") - 1
    total = len(starts)
    counts = np.bincount(doc_idx, minlength=len(texts))
    doc_first = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_first[1:])
    positions = np.arange(total, dtype=np.int64) - doc_first[doc_idx]
    start_chars = starts - doc_start[doc_idx]
    end_chars = ends - doc_start[doc_idx]
    return tokens, doc_idx, positions, start_chars, end_chars


class UnicodeTokenizer:
    """``text -> list[str]`` under the uax29 grammar (lowercased via the
    SAME utf8proc kernel the column path uses, so build and query sides
    agree bit-for-bit on every codepoint)."""

    grammar = "uax29"

    def __init__(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
                 cjk_bigrams: bool = False):
        self.max_token_length = max_token_length
        self.cjk_bigrams = cjk_bigrams
        if cjk_bigrams:
            self.grammar = "cjk_bigram"

    def __call__(self, text: str) -> list[str]:
        import pyarrow as pa
        import pyarrow.compute as pc

        lower = pc.utf8_lower(pa.array([text], pa.string()))[0].as_py()
        return tokenize_uax29([lower], self.max_token_length,
                              self.cjk_bigrams)[0]


# ---------------------------------------------------------------------------
# Dictionary-based CJK segmentation ("dict" grammar)
#
# The seam Lucene fills with its morphological analyzers (kuromoji for
# Japanese, nori for Korean, smartcn for Chinese — each a bundled dictionary
# + Viterbi lattice). No dictionaries ship in this environment, so the seam
# takes a USER-SUPPLIED lexicon and applies greedy forward longest match
# (classical MaxMatch segmentation): adjacent IDEOGRAPHIC unigrams from the
# uax29 grammar are merged into the longest lexicon word starting at each
# position; uncovered ideographs remain unigrams (the uax29 fallback), and
# all non-ideographic tokens are untouched. Positions renumber sequentially
# after merging. A production pipeline would swap in a lattice segmenter
# behind the same seam.
# ---------------------------------------------------------------------------


def maxmatch_spans(s: str, lexicon: frozenset, max_word: int) -> list[tuple[int, int]]:
    """Greedy forward longest-match spans over an ideographic run."""
    out = []
    i, n = 0, len(s)
    while i < n:
        j = min(n, i + max_word)
        while j > i + 1 and s[i:j] not in lexicon:
            j -= 1
        out.append((i, j))
        i = j
    return out


#: cost charged for an uncovered single ideograph on the Viterbi lattice —
#: kuromoji's unknown-word shape (high, but finite so every run segments).
#: Lexicon entry costs must stay below this for known words to win.
DICT_UNK_COST = 10000.0


def viterbi_spans(s: str, costs: dict, max_word: int) -> list[tuple[int, int]]:
    """Min-cost segmentation of an ideographic run over a COSTED lexicon —
    the costed-lattice core of the reference's morphological tokenizers
    (kuromoji's ViterbiNBest over dictionary word costs,
    lucene/analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/
    JapaneseTokenizer.java:52's lattice; connection costs omitted — the
    sandbox has no bundled connection matrix, so the path cost is the sum
    of word costs, uncovered single chars charged :data:`DICT_UNK_COST`).

    dp[i] = min cost of segmenting s[:i]; on cost ties the LONGER last
    word wins (deterministic, mirrors dictionary-preference ordering).
    Resolves the ambiguities greedy MaxMatch cannot: with
    costs 東(800) 京都(400) 東京(500) 都(800), "東京都" segments as
    東|京都 (1200) rather than MaxMatch's 東京|都 (1300)."""
    n = len(s)
    INF = float("inf")
    dp = [INF] * (n + 1)
    back = [0] * (n + 1)
    dp[0] = 0.0
    for i in range(1, n + 1):
        best_c, best_l = dp[i - 1] + DICT_UNK_COST, 1
        for L in range(min(max_word, i), 1, -1):
            c = costs.get(s[i - L:i])
            if c is not None and dp[i - L] + c < best_c:
                best_c, best_l = dp[i - L] + c, L
        c1 = costs.get(s[i - 1:i])
        if c1 is not None and dp[i - 1] + c1 < best_c:
            best_c, best_l = dp[i - 1] + c1, 1
        dp[i] = best_c
        back[i] = best_l
    out = []
    i = n
    while i > 0:
        out.append((i - back[i], i))
        i -= back[i]
    out.reverse()
    return out


def merge_ideo_tokens(toks: list[str], starts: list[int], ends: list[int],
                      lexicon: frozenset, max_word: int,
                      costs: dict | None = None):
    """Merge adjacent ideographic unigrams (contiguous char offsets) of ONE
    document — by the Viterbi costed lattice when ``costs`` is given
    (:func:`viterbi_spans`), else by greedy MaxMatch. Returns
    (tokens, start_chars, end_chars)."""
    out_t: list[str] = []
    out_s: list[int] = []
    out_e: list[int] = []
    n = len(toks)
    i = 0
    while i < n:
        t = toks[i]
        if len(t) != 1 or codepoint_class(ord(t)) != CLS_IDEO:
            out_t.append(t)
            out_s.append(starts[i])
            out_e.append(ends[i])
            i += 1
            continue
        j = i + 1
        while (j < n and len(toks[j]) == 1
               and codepoint_class(ord(toks[j])) == CLS_IDEO
               and starts[j] == ends[j - 1]):
            j += 1
        run = "".join(toks[i:j])
        spans = (viterbi_spans(run, costs, max_word) if costs is not None
                 else maxmatch_spans(run, lexicon, max_word))
        for a, b in spans:
            out_t.append(run[a:b])
            out_s.append(starts[i + a])
            out_e.append(ends[i + b - 1])
        i = j
    return out_t, out_s, out_e


def parse_dict_lexicon(entries) -> tuple[frozenset, int, dict | None]:
    """Normalize a ``dict_lexicon`` config into (word set, max word length,
    costs-or-None). Entries are either plain words (MaxMatch) or
    ``(word, cost)`` pairs (Viterbi costed lattice). The two forms must not
    be mixed."""
    entries = tuple(entries)
    costed = bool(entries) and not isinstance(entries[0], str)
    if costed:
        costs = {w: float(c) for w, c in entries}
        lex = frozenset(costs)
        return lex, max((len(w) for w in lex), default=1), costs
    lex = frozenset(entries)
    return lex, max((len(w) for w in lex), default=1), None


class DictTokenizer:
    """``text -> list[str]`` under the dict grammar: uax29 + merging of
    ideographic runs against the lexicon — Viterbi over (word, cost)
    entries, greedy MaxMatch over plain-word entries. The SAME lexicon
    must be used on the build side (IndexConfig.dict_lexicon)."""

    grammar = "dict"

    def __init__(self, lexicon, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.lexicon, self.max_word, self.costs = parse_dict_lexicon(lexicon)
        self.max_token_length = max_token_length

    def __call__(self, text: str) -> list[str]:
        import pyarrow as pa
        import pyarrow.compute as pc

        lower = pc.utf8_lower(pa.array([text], pa.string()))[0].as_py()
        toks, _d, _p, sc, ec = tokenize_uax29([lower], self.max_token_length)
        out, _s, _e = merge_ideo_tokens(
            list(toks), [int(x) for x in sc], [int(x) for x in ec],
            self.lexicon, self.max_word, self.costs,
        )
        return out
