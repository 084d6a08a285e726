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
