"""BM25 scoring, float32-exact vs Lucene's ``BM25Similarity``.

Reference (lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java):

- idf  = (float) log(1 + (N - n + 0.5) / (n + 0.5))      [double math -> f32 cast, :100-103]
- avgdl = (float)(sumTotalTermFreq / (double) docCount)   [:106-108]
- cache[i] = 1f / (k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl))
  — all-FLOAT arithmetic in Java (k1, b, LENGTH_TABLE[i], avgdl are floats)
  [:181-183]
- weight = boost * idf (float)                            [:215]
- score(freq, norm) = weight - weight / (1f + freq * cache[norm & 0xFF])
  — all-float, exact operation order matters for monotonic rounding [:221-232]

We reproduce every step with numpy float32 ops in the same expression shape
so scores are bit-identical to Lucene on the same (freq, norm, stats).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_ray.codec.smallfloat import LENGTH_TABLE


@dataclass(frozen=True)
class CollectionStats:
    """Per-field collection statistics (Terms.java:103-121)."""

    doc_count: int
    sum_total_term_freq: int


@dataclass(frozen=True)
class TermStats:
    doc_freq: int
    total_term_freq: int


class BM25Scorer:
    """Precomputed per-(query-term) scorer: vectorized ``score(freqs, norms)``."""

    __slots__ = ("weight", "cache", "idf", "avgdl")

    def __init__(self, weight: np.float32, cache: np.ndarray, idf: float, avgdl: float):
        self.weight = weight
        self.cache = cache  # float32[256] norm-inverse table
        self.idf = idf
        self.avgdl = avgdl

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """float32 scores for parallel arrays of term freqs and norm bytes."""
        freqs = np.asarray(freqs).astype(np.float32, copy=False)
        norm_inverse = self.cache[np.asarray(norm_bytes, dtype=np.uint8)]
        w = self.weight
        one = np.float32(1.0)
        # weight - weight / (1f + freq * normInverse), float32 throughout
        return w - w / (one + freqs * norm_inverse)

    def with_boost(self, boost: float) -> "BM25Scorer":
        """Boost folded into the weight BEFORE the score expression, exactly
        as Lucene builds weight = boost * idf (BM25Similarity.java:215) —
        NOT a post-multiplication of scores, which differs in the last ulp."""
        return BM25Scorer(
            np.float32(boost) * np.float32(self.idf), self.cache, self.idf, self.avgdl
        )

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        """Score upper bound for one (freq, norm) impact pair."""
        return self.score(np.array([freq]), np.array([norm_byte]))[0]


class ClassicScorer:
    """Vectorized TF-IDF scorer (TFIDFSimilarity.TFIDFScorer shape):
    score = weight * sqrt(freq) * normTable[norm & 0xFF], float32."""

    __slots__ = ("weight", "norm_table", "idf")

    def __init__(self, weight: np.float32, norm_table: np.ndarray, idf: float):
        self.weight = weight
        self.norm_table = norm_table  # float32[256] 1/sqrt(length) table
        self.idf = idf

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.sqrt(np.asarray(freqs).astype(np.float32, copy=False))
        norm = self.norm_table[np.asarray(norm_bytes, dtype=np.uint8)]
        return (self.weight * tf) * norm

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "ClassicScorer":
        return ClassicScorer(
            np.float32(boost) * np.float32(self.idf), self.norm_table, self.idf
        )


class ClassicSimilarity:
    """Classic TF-IDF — the second implementation through the Similarity
    seam, proving it is actually pluggable
    (lucene/core/src/java/org/apache/lucene/search/similarities/ClassicSimilarity.java):

    - tf(freq)     = sqrt(freq)                                  [:53-56]
    - idf(n, N)    = log((N + 1) / (n + 1)) + 1                  [:66-70]
    - lengthNorm   = 1 / sqrt(numTerms)                          [:44-47]
    - score        = boost * idf * tf * lengthNorm (float32 ops)

    Same SimScorer(freq, norm) contract as BM25: monotone in freq,
    decreasing in length, norm decoded from the shared SmallFloat byte."""

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        return np.float32(math.log((doc_count + 1) / (doc_freq + 1.0)) + 1.0)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStats,
        *term_stats: TermStats,
    ) -> ClassicScorer:
        if len(term_stats) == 1:
            idf = self.idf(term_stats[0].doc_freq, collection_stats.doc_count)
        else:
            acc = 0.0
            for ts in term_stats:
                acc += float(self.idf(ts.doc_freq, collection_stats.doc_count))
            idf = np.float32(acc)
        with np.errstate(divide="ignore"):
            table = np.float32(1.0) / np.sqrt(LENGTH_TABLE)
        table[LENGTH_TABLE == 0] = np.float32(0)  # zero-length docs score 0
        weight = np.float32(boost) * idf
        return ClassicScorer(weight, table.astype(np.float32, copy=False), float(idf))


class MultiScorer:
    """Sums per-term sub-scorers — MultiSimilarity.MultiSimScorer
    (lucene/core/src/java/org/apache/lucene/search/similarities/MultiSimilarity.java:58-66),
    the shape SimilarityBase uses for multi-term (phrase) stats."""

    __slots__ = ("subs",)

    def __init__(self, subs):
        self.subs = tuple(subs)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        acc = self.subs[0].score(freqs, norm_bytes)
        for s in self.subs[1:]:
            acc = acc + s.score(freqs, norm_bytes)
        return acc

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "MultiScorer":
        return MultiScorer(s.with_boost(boost) for s in self.subs)


class LMDirichletScorer:
    """Vectorized Dirichlet-smoothed language-model scorer:
    score = boost * (log(1 + freq/(mu*p_collection)) + log(mu/(len+mu))),
    clamped at 0 — double math then one float32 cast, matching
    SimilarityBase.score's double pipeline."""

    __slots__ = ("boost", "mu_p", "norm_term")

    def __init__(self, boost: float, mu_p: float, norm_term: np.ndarray):
        self.boost = float(boost)
        self.mu_p = mu_p  # mu * collectionProbability (double)
        self.norm_term = norm_term  # float64[256] log(mu / (len + mu))

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        freqs = np.asarray(freqs, dtype=np.float64)
        nt = self.norm_term[np.asarray(norm_bytes, dtype=np.uint8)]
        s = self.boost * (np.log1p(freqs / self.mu_p) + nt)
        return np.maximum(s, 0.0).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "LMDirichletScorer":
        return LMDirichletScorer(self.boost * float(boost), self.mu_p, self.norm_term)


class LMDirichletSimilarity:
    """Bayesian smoothing with Dirichlet priors (Zhai & Lafferty 2001) —
    lucene/core/src/java/org/apache/lucene/search/similarities/LMDirichletSimilarity.java:56-75:

    - p(w|C) = (totalTermFreq + 1) / (sumTotalTermFreq + 1)   [LMSimilarity.java:58-63]
    - score  = boost * (log(1 + freq/(mu*p)) + log(mu/(docLen+mu))), clamped >= 0

    Third implementation through the Similarity seam; same SimScorer
    contract (monotone in freq, anti-monotone in length)."""

    def __init__(self, mu: float = 2000.0):
        if not (mu > 0 and math.isfinite(mu)):
            raise ValueError(f"illegal mu value: {mu}")
        self.mu = float(mu)

    def _one(self, boost, collection_stats, ts) -> LMDirichletScorer:
        p = (ts.total_term_freq + 1.0) / (collection_stats.sum_total_term_freq + 1.0)
        norm_term = np.log(self.mu / (LENGTH_TABLE.astype(np.float64) + self.mu))
        return LMDirichletScorer(boost, self.mu * p, norm_term)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStats,
        *term_stats: TermStats,
    ):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts) for ts in term_stats)


class LMJelinekMercerScorer:
    """Vectorized Jelinek-Mercer-smoothed language-model scorer:
    score = boost * log(1 + ((1-lambda)*freq/docLen) / (lambda*p_collection))
    — double math then one float32 cast, clamped at 0 (SimilarityBase's
    score pipeline)."""

    __slots__ = ("boost", "mix_over_len", "denom")

    def __init__(self, boost: float, mix_over_len: np.ndarray, denom: float):
        self.boost = float(boost)
        self.mix_over_len = mix_over_len  # float64[256]: (1-lambda)/len
        self.denom = denom  # lambda * collectionProbability (double)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        freqs = np.asarray(freqs, dtype=np.float64)
        per = self.mix_over_len[np.asarray(norm_bytes, dtype=np.uint8)]
        s = self.boost * np.log1p(freqs * per / self.denom)
        return np.maximum(s, 0.0).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "LMJelinekMercerScorer":
        return LMJelinekMercerScorer(self.boost * float(boost),
                                     self.mix_over_len, self.denom)


class LMJelinekMercerSimilarity:
    """Jelinek-Mercer linear-interpolation smoothing (Zhai & Lafferty 2001)
    — lucene/core/src/java/org/apache/lucene/search/similarities/
    LMJelinekMercerSimilarity.java:67-75:

    - p(w|C) = (totalTermFreq + 1) / (sumTotalTermFreq + 1)  [LMSimilarity.java:58-63]
    - score  = boost * log(1 + ((1-lambda)*freq/docLen) / (lambda*p(w|C)))

    lambda in (0, 1]; near 0 acts conjunction-like, near 1 disjunction-like.
    Fourth implementation through the Similarity seam."""

    def __init__(self, lambda_: float = 0.1):
        if not (0 < lambda_ <= 1) or math.isnan(lambda_):
            raise ValueError(f"lambda must be in the range (0 .. 1]: {lambda_}")
        self.lambda_ = float(lambda_)

    def _one(self, boost, collection_stats, ts) -> LMJelinekMercerScorer:
        p = (ts.total_term_freq + 1.0) / (collection_stats.sum_total_term_freq + 1.0)
        with np.errstate(divide="ignore"):
            mix = (1.0 - self.lambda_) / LENGTH_TABLE.astype(np.float64)
        # norm byte 0 decodes to docLen 0, which never co-occurs with a
        # real posting (freq > 0 implies length > 0); pin it to score 0 so
        # the SimScorer contract stays finite over all 256 norm bytes
        mix[0] = 0.0
        return LMJelinekMercerScorer(boost, mix, self.lambda_ * p)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStats,
        *term_stats: TermStats,
    ):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts) for ts in term_stats)


class BooleanScorer:
    """score = boost for every match, freq and length ignored
    (BooleanSimilarity.java:42-49)."""

    __slots__ = ("boost",)

    def __init__(self, boost: float):
        self.boost = np.float32(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        return np.full(len(np.asarray(freqs)), self.boost, dtype=np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.boost

    def with_boost(self, boost: float) -> "BooleanScorer":
        return BooleanScorer(float(self.boost) * float(boost))


class BooleanSimilarity:
    """Matches score the query boost, nothing else —
    lucene/core/src/java/org/apache/lucene/search/similarities/BooleanSimilarity.java:30.
    Norms are still read (the seam is uniform) but ignored."""

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStats,
        *term_stats: TermStats,
    ):
        if len(term_stats) == 1:
            return BooleanScorer(boost)
        return MultiScorer(BooleanScorer(boost) for _ in term_stats)


class DFRInB2Scorer:
    """Vectorized DFR I(n)B2 scorer: H2 length normalization then the
    I(n) information content with Bernoulli (B) first normalization —
    double math, one float32 cast, clamped >= 0 (SimilarityBase.score)."""

    __slots__ = ("boost", "c", "avgdl", "F", "n", "N", "dl_table")

    def __init__(self, boost, c, avgdl, F, n, N):
        self.boost = float(boost)
        self.c = float(c)
        self.avgdl = float(avgdl)
        self.F = float(F)
        self.n = float(n)
        self.N = float(N)
        self.dl_table = LENGTH_TABLE.astype(np.float64)
        # norm byte 0 decodes to length 0 (a term can never occur in an
        # empty field, so this index is unreachable with freq>0): make the
        # table finite so vectorized scoring over all 256 bytes stays clean
        self.dl_table = self.dl_table.copy()
        self.dl_table[0] = np.inf

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_bytes, dtype=np.uint8)]
        # NormalizationH2.tfn (similarities/NormalizationH2.java:36):
        # tfn = tf * log2(1 + c * avgdl / dl)
        tfn = tf * np.log2(1.0 + self.c * self.avgdl / dl)
        # I(n): tfn * log2((N + 1) / (n + 0.5))   (BasicModelIn shape)
        info = tfn * np.log2((self.N + 1.0) / (self.n + 0.5))
        # After-effect B: (F + 1) / (n * (tfn + 1))  (AfterEffectB shape;
        # Amati & van Rijsbergen 2002, the InB2 weighting)
        gain = (self.F + 1.0) / (self.n * (tfn + 1.0))
        s = self.boost * gain * info
        return np.maximum(s, 0.0).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "DFRInB2Scorer":
        return DFRInB2Scorer(self.boost * float(boost), self.c, self.avgdl,
                             self.F, self.n, self.N)


class DFRSimilarity:
    """Divergence-from-randomness I(n)B2 (Amati & van Rijsbergen 2002,
    "Probabilistic models of information retrieval based on measuring the
    divergence from randomness") through the Similarity seam — the
    DFRSimilarity(BasicModelIn, AfterEffectB, NormalizationH2(c)) combo
    (lucene/core/src/java/org/apache/lucene/search/similarities/
    DFRSimilarity.java:60-104). We implement the published formula with
    double math and one float32 cast; clamped >= 0."""

    def __init__(self, c: float = 1.0):
        if not (c > 0 and math.isfinite(c)):
            raise ValueError(f"illegal c value: {c}")
        self.c = float(c)

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> DFRInB2Scorer:
        avgdl = cs.sum_total_term_freq / float(cs.doc_count)
        return DFRInB2Scorer(boost, self.c, avgdl, ts.total_term_freq,
                             ts.doc_freq, cs.doc_count)

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts)
                           for ts in term_stats)


class AxiomaticF2EXPScorer:
    """Vectorized Axiomatic F2EXP scorer:
    score = boost * (tf / (tf + s + s*dl/avgdl)) * ((N + 1) / n)^k —
    double math, one float32 cast (AxiomaticF2EXP.java:48-76 shapes)."""

    __slots__ = ("boost", "s", "k", "avgdl", "idf_pow", "dl_table")

    def __init__(self, boost, s, k, avgdl, idf_pow):
        self.boost = float(boost)
        self.s = float(s)
        self.k = float(k)
        self.avgdl = float(avgdl)
        self.idf_pow = float(idf_pow)  # ((N+1)/n)^k
        self.dl_table = LENGTH_TABLE.astype(np.float64).copy()
        self.dl_table[0] = np.inf  # see DFRInB2Scorer: length-0 guard

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_bytes, dtype=np.uint8)]
        tfln = tf / (tf + self.s + self.s * dl / self.avgdl)
        s = self.boost * tfln * self.idf_pow
        return np.maximum(s, 0.0).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "AxiomaticF2EXPScorer":
        return AxiomaticF2EXPScorer(self.boost * float(boost), self.s,
                                    self.k, self.avgdl, self.idf_pow)


class AxiomaticF2EXPSimilarity:
    """Axiomatic retrieval model F2EXP (Fang & Zhai 2005, "An exploration
    of axiomatic approaches to information retrieval") — the
    AxiomaticF2EXP(s, k) similarity (lucene/core/src/java/org/apache/
    lucene/search/similarities/AxiomaticF2EXP.java:29-55)."""

    def __init__(self, s: float = 0.5, k: float = 0.35):
        if not (0 <= s <= 1):
            raise ValueError(f"illegal s value: {s}")
        if not (0 < k <= 1):
            raise ValueError(f"illegal k value: {k}")
        self.s = float(s)
        self.k = float(k)

    def _one(self, boost, cs: CollectionStats, ts: TermStats):
        avgdl = cs.sum_total_term_freq / float(cs.doc_count)
        idf_pow = ((cs.doc_count + 1.0) / ts.doc_freq) ** self.k
        return AxiomaticF2EXPScorer(boost, self.s, self.k, avgdl, idf_pow)

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts)
                           for ts in term_stats)


class DFIScorer:
    """Vectorized DFI (divergence from independence) scorer with the
    chi-squared measure: expected = (F + 1) * dl / (T + 1); score 0 when
    tf <= expected, else boost * log2((tf - expected)^2 / expected + 1) —
    double math, one float32 cast (DFISimilarity.java:64-71,
    IndependenceChiSquared.java:26-29)."""

    __slots__ = ("boost", "F", "T", "dl_table")

    def __init__(self, boost, F, T):
        self.boost = float(boost)
        self.F = float(F)   # totalTermFreq
        self.T = float(T)   # numberOfFieldTokens (sumTotalTermFreq)
        self.dl_table = LENGTH_TABLE.astype(np.float64).copy()
        self.dl_table[0] = np.inf  # length-0 guard (see DFRInB2Scorer)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_bytes, dtype=np.uint8)]
        expected = (self.F + 1.0) * dl / (self.T + 1.0)
        measure = (tf - expected) * (tf - expected) / expected
        s = self.boost * np.log2(measure + 1.0)
        return np.where(tf <= expected, 0.0, s).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "DFIScorer":
        return DFIScorer(self.boost * float(boost), self.F, self.T)


class DFISimilarity:
    """Divergence From Independence with the chi-squared measure
    (Kocabas, Dincer & Karaoglan 2014, "A nonparametric term weighting
    method for information retrieval based on measuring the divergence
    from independence") — DFISimilarity(IndependenceChiSquared())
    (lucene/core/src/java/org/apache/lucene/search/similarities/
    DFISimilarity.java:33-71). Non-negative by construction: observed
    frequency at or below the independence expectation scores zero."""

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> DFIScorer:
        return DFIScorer(boost, ts.total_term_freq, cs.sum_total_term_freq)

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts)
                           for ts in term_stats)


class IBLLScorer:
    """Vectorized information-based scorer, LL distribution + DF lambda +
    H1 normalization: tfn = tf * c * (avgdl / dl);
    lambda = float32((df + 1) / (N + 1)) (the Java lambda is a float);
    score = boost * -ln(lambda / (tfn + lambda)) — double math, one
    float32 cast (IBSimilarity.java:99-104, DistributionLL.java:29-32,
    LambdaDF.java:27-34, NormalizationH1.java:40-43)."""

    __slots__ = ("boost", "c", "avgdl", "lam", "dl_table")

    def __init__(self, boost, c, avgdl, lam):
        self.boost = float(boost)
        self.c = float(c)
        self.avgdl = float(avgdl)
        self.lam = float(lam)
        self.dl_table = LENGTH_TABLE.astype(np.float64).copy()
        self.dl_table[0] = np.inf  # length-0 guard (see DFRInB2Scorer)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.asarray(freqs, dtype=np.float64)
        dl = self.dl_table[np.asarray(norm_bytes, dtype=np.uint8)]
        tfn = tf * self.c * (self.avgdl / dl)
        s = self.boost * -np.log(self.lam / (tfn + self.lam))
        return np.maximum(s, 0.0).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "IBLLScorer":
        return IBLLScorer(self.boost * float(boost), self.c, self.avgdl,
                          self.lam)


class IBSimilarity:
    """Information-based model (Clinchant & Gaussier 2010, "Information-
    based models for ad hoc IR") — the IBSimilarity(DistributionLL,
    LambdaDF, NormalizationH1(c)) combo (lucene/core/src/java/org/apache/
    lucene/search/similarities/IBSimilarity.java:55-104). LL is
    non-negative for tfn >= 0; lambda takes the Java float32 round-trip
    before entering the double pipeline (LambdaDF.java:28)."""

    def __init__(self, c: float = 1.0):
        if not (c > 0 and math.isfinite(c)):
            raise ValueError(f"illegal c value: {c}")
        self.c = float(c)

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> IBLLScorer:
        avgdl = cs.sum_total_term_freq / float(cs.doc_count)
        lam = np.float32((ts.doc_freq + 1.0) / (cs.doc_count + 1.0))
        return IBLLScorer(boost, self.c, avgdl, float(lam))

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts)
                           for ts in term_stats)


class RawTFScorer:
    """score = boost * freq (RawTFSimilarity.java:40-47) — the trivial
    SimScorer; useful as a seam smoke-test and for pure-count ranking."""

    __slots__ = ("boost",)

    def __init__(self, boost):
        self.boost = float(boost)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.asarray(freqs, dtype=np.float64)
        return (self.boost * tf).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "RawTFScorer":
        return RawTFScorer(self.boost * float(boost))


class RawTFSimilarity:
    """Raw term frequency as the score — RawTFSimilarity (lucene/core/src/
    java/org/apache/lucene/search/similarities/RawTFSimilarity.java)."""

    def _one(self, boost, cs, ts) -> RawTFScorer:
        return RawTFScorer(boost)

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts)
                           for ts in term_stats)


class BM25Similarity:
    def __init__(self, k1: float = 1.2, b: float = 0.75):
        if not (k1 >= 0 and math.isfinite(k1)):
            raise ValueError(f"illegal k1 value: {k1}")
        if not (0 <= b <= 1):
            raise ValueError(f"illegal b value: {b}")
        self.k1 = np.float32(k1)
        self.b = np.float32(b)

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        # double math, then a single float32 cast — BM25Similarity.java:101-103
        return np.float32(math.log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))

    def avg_field_length(self, stats: CollectionStats) -> np.float32:
        return np.float32(stats.sum_total_term_freq / float(stats.doc_count))

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStats,
        *term_stats: TermStats,
    ) -> BM25Scorer:
        if len(term_stats) == 1:
            idf = self.idf(term_stats[0].doc_freq, collection_stats.doc_count)
        else:
            # phrase: sum per-term f32 idfs in a double, cast back (:162-170);
            # sequential += in double, matching Java's accumulation order
            acc = 0.0
            for ts in term_stats:
                acc += float(self.idf(ts.doc_freq, collection_stats.doc_count))
            idf = np.float32(acc)
        avgdl = self.avg_field_length(collection_stats)
        one = np.float32(1.0)
        # all-float expression: 1f / (k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl))
        cache = one / (self.k1 * ((one - self.b) + self.b * LENGTH_TABLE / avgdl))
        weight = np.float32(boost) * idf
        return BM25Scorer(weight, cache.astype(np.float32, copy=False), float(idf), float(avgdl))
