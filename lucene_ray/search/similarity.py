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


class _SumScorer:
    """Sums the scores of heterogeneous sub-scorers for the SAME term —
    MultiSimilarity.MultiSimScorer.score (lucene/core/src/java/org/apache/
    lucene/search/similarities/MultiSimilarity.java:58-66: ``sum +=
    subScorer.score(freq, norm)``). float32 accumulation in sub order, so
    an oracle can replay the exact addition sequence."""

    __slots__ = ("subs",)

    def __init__(self, subs):
        self.subs = tuple(subs)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        acc = self.subs[0].score(freqs, norm_bytes).astype(np.float32)
        for s in self.subs[1:]:
            acc = (acc + s.score(freqs, norm_bytes).astype(np.float32)
                   ).astype(np.float32)
        return acc

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        # upper bound: sum of the subs' bounds (each is itself admissible)
        return np.float32(sum(s.max_score(freq, norm_byte)
                              for s in self.subs))

    def with_boost(self, boost: float) -> "_SumScorer":
        return _SumScorer(s.with_boost(boost) for s in self.subs)


class MultiSimilarity:
    """MultiSimilarity (lucene/core/src/java/org/apache/lucene/search/
    similarities/MultiSimilarity.java:29): wraps N similarities; a term's
    score is the SUM of the sub-similarities' scores (the Java computes the
    norm with the first sub — our norms are SmallFloat bytes shared by all
    sims, so that detail is moot here)."""

    def __init__(self, subs):
        if not subs:
            raise ValueError("MultiSimilarity needs at least one sub")
        self.subs = tuple(subs)

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        per_sub = [s.scorer(boost, collection_stats, *term_stats)
                   for s in self.subs]
        return _SumScorer(per_sub)


class PerFieldSimilarity:
    """PerFieldSimilarityWrapper (lucene/core/src/java/org/apache/lucene/
    search/similarities/PerFieldSimilarityWrapper.java:28): routes each
    field to its own Similarity; fields not in the map use the default.
    The engine's Searcher dispatches per term via ``for_field`` (the field
    of a namespaced term, None = the main content field)."""

    def __init__(self, default, per_field: dict | None = None):
        self.default = default
        self.per_field = dict(per_field or {})

    def for_field(self, field: str | None):
        return self.per_field.get(field, self.default)

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        return self.default.scorer(boost, collection_stats, *term_stats)


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


# --------------------------------------------------------------------------
# SimilarityBase grid: DFR basic-model x after-effect x normalization,
# IB distribution x lambda x normalization, Axiomatic variants, Indri.
# All reimplement the reference's CURRENT formulas (float hyperparameters,
# +1-shifted stats) with double math and ONE float32 cast, mirroring
# SimilarityBase.BasicSimScorer.score (SimilarityBase.java:188-190).
# --------------------------------------------------------------------------

_DL64 = LENGTH_TABLE.astype(np.float64).copy()
_DL64[0] = np.inf  # norm byte 0 = length 0, unreachable with freq > 0


class GridScorer:
    """Vectorized SimilarityBase-style scorer: ``kernel(tf, dl, boost)``
    runs the whole double pipeline over parallel float64 arrays, then one
    float32 cast. ``boost_in_kernel=False`` reproduces similarities that
    ignore the boost (IndriDirichletSimilarity.java:103-107 never touches
    stats.getBoost())."""

    __slots__ = ("kernel", "boost", "boost_in_kernel")

    def __init__(self, kernel, boost: float, boost_in_kernel: bool = True):
        self.kernel = kernel
        self.boost = float(boost)
        self.boost_in_kernel = boost_in_kernel

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        tf = np.asarray(freqs, dtype=np.float64)
        dl = _DL64[np.asarray(norm_bytes, dtype=np.uint8)]
        b = self.boost if self.boost_in_kernel else 1.0
        return self.kernel(tf, dl, b).astype(np.float32)

    def max_score(self, freq: int, norm_byte: int) -> np.float32:
        return self.score(np.array([freq]), np.array([norm_byte]))[0]

    def with_boost(self, boost: float) -> "GridScorer":
        return GridScorer(self.kernel, self.boost * float(boost),
                          self.boost_in_kernel)


def _log2(x: float) -> float:
    """SimilarityBase.log2 — Math.log(x)/log(2); math.log2 is the
    correctly-rounded equivalent and matches DuckDB's log2."""
    return math.log2(x)


class _GridBase:
    """scorer() plumbing shared by the grid similarities."""

    def scorer(self, boost: float, collection_stats: CollectionStats,
               *term_stats: TermStats):
        if len(term_stats) == 1:
            return self._one(boost, collection_stats, term_stats[0])
        return MultiScorer(self._one(boost, collection_stats, ts)
                           for ts in term_stats)


class DFRGridSimilarity(_GridBase):
    """The full DFR grid — DFRSimilarity(basicModel, afterEffect,
    normalization) with the reference's CURRENT rewritten formulas
    (DFRSimilarity.java:127-130; BasicModelG/IF/In/Ine.java;
    AfterEffectB/L.java; NormalizationH1/H2/H3/Z.java):

    - tfn:  h1: tf*c*(avgdl/dl)            (NormalizationH1.java:57)
            h2: tf*log2(1 + c*avgdl/dl)    (NormalizationH2.java:57)
            h3: (tf + mu*((F+1f)/(T+1f))) / (dl+mu) * mu  — the inner
                ratio and its product with mu are JAVA FLOATS
                (NormalizationH3.java:52-56: float fields, float ops,
                then promotion to double by the + tf)
            z:  tf*pow(avgdl/dl, z), z a float (NormalizationZ.java:53)
    - aeTimes1pTfn: B: (F+2)/(n+1)  [F=ttf+1, n=df+1 per
                AfterEffectB.java:30-33]; L: 1
    - basic model score (all monotone rewrites, x aeTimes1pTfn):
            G:   lam=(F+1)/(N+F+1); (B2 - (B2-A)/(1+tfn))*ae with
                 A=log2(lam+1), B2=log2((1+lam)/lam)  (BasicModelG.java)
            IF:  log2(1+(N+1)/(F+0.5)) * ae * (1 - 1/(1+tfn))
            In:  log2((N+1)/(n+0.5))   * ae * (1 - 1/(1+tfn))
            Ine: ne=N*(1-((N-1)/N)^F); log2((N+1)/(ne+0.5)) * ae *
                 (1 - 1/(1+tfn))
    - score = boost * basicModel (DFRSimilarity.java:130), >= 0 by the
      monotone rewrites."""

    def __init__(self, basic_model: str = "g", after_effect: str = "b",
                 normalization: str = "h1", c: float = 1.0):
        if basic_model not in ("g", "if", "in", "ine"):
            raise ValueError(f"unknown basic model: {basic_model}")
        if after_effect not in ("b", "l"):
            raise ValueError(f"unknown after effect: {after_effect}")
        if normalization not in ("h1", "h2", "h3", "z"):
            raise ValueError(f"unknown normalization: {normalization}")
        self.basic_model = basic_model
        self.after_effect = after_effect
        self.normalization = normalization
        # hyperparameters are Java floats (NormalizationH1.java:34 etc.)
        self.c = float(np.float32(c))

    def _tfn_fn(self, avgdl: float, F: float, T: float):
        c, norm = self.c, self.normalization
        if norm == "h1":
            return lambda tf, dl: tf * c * (avgdl / dl)
        if norm == "h2":
            return lambda tf, dl: tf * np.log2(1.0 + c * avgdl / dl)
        if norm == "z":
            return lambda tf, dl: tf * (avgdl / dl) ** c
        # h3: mu * ((F+1f)/(T+1f)) in float32, then the double pipeline
        mu = np.float32(c)
        prior = float(mu * ((np.float32(F) + np.float32(1.0))
                            / (np.float32(T) + np.float32(1.0))))
        return lambda tf, dl: (tf + prior) / (dl + c) * c

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> GridScorer:
        N = float(cs.doc_count)
        n = float(ts.doc_freq)
        F = float(ts.total_term_freq)
        T = float(cs.sum_total_term_freq)
        avgdl = T / N
        tfn = self._tfn_fn(avgdl, F, T)
        ae1p = (F + 2.0) / (n + 1.0) if self.after_effect == "b" else 1.0
        model = self.basic_model
        if model == "g":
            Fg = F + 1.0
            lam = Fg / (N + Fg)
            A = _log2(lam + 1.0)
            B2 = _log2((1.0 + lam) / lam)

            def kernel(tf, dl, b):
                t = tfn(tf, dl)
                return b * ((B2 - (B2 - A) / (1.0 + t)) * ae1p)
        else:
            if model == "if":
                A = _log2(1.0 + (N + 1.0) / (F + 0.5))
            elif model == "in":
                A = _log2((N + 1.0) / (n + 0.5))
            else:  # ine
                ne = N * (1.0 - ((N - 1.0) / N) ** F)
                A = _log2((N + 1.0) / (ne + 0.5))

            def kernel(tf, dl, b):
                t = tfn(tf, dl)
                return b * (A * ae1p * (1.0 - 1.0 / (1.0 + t)))
        return GridScorer(kernel, boost)


class IBGridSimilarity(_GridBase):
    """Information-based grid — IBSimilarity(distribution, lambda,
    normalization) (IBSimilarity.java:135-139):

    - lambda: df:  float32((df+1)/(N+1))   (LambdaDF.java:28)
              ttf: float32((F+1)/(N+1)), nextUp'd away from exactly 1
                   (LambdaTTF.java:29-35)
    - distribution: ll:  -ln(lambda/(tfn+lambda))  (DistributionLL.java:30)
              spl: q=1-1/(tfn+1) (nextDown'd from 1); pow=lambda^q
                   (nudged off lambda on float-rounding collisions);
                   -ln((pow-lambda)/(1-lambda))  (DistributionSPL.java:29-49)
    - tfn: same normalization grid as DFR (shared code)
    - score = boost * distribution (IBSimilarity.java:136-138)."""

    def __init__(self, distribution: str = "ll", lambda_: str = "df",
                 normalization: str = "h1", c: float = 1.0):
        if distribution not in ("ll", "spl"):
            raise ValueError(f"unknown distribution: {distribution}")
        if lambda_ not in ("df", "ttf"):
            raise ValueError(f"unknown lambda: {lambda_}")
        self.distribution = distribution
        self.lambda_ = lambda_
        self._norm = DFRGridSimilarity("in", "l", normalization, c)

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> GridScorer:
        N = float(cs.doc_count)
        T = float(cs.sum_total_term_freq)
        F = float(ts.total_term_freq)
        tfn = self._norm._tfn_fn(T / N, F, T)
        if self.lambda_ == "df":
            lam32 = np.float32((ts.doc_freq + 1.0) / (N + 1.0))
        else:
            lam32 = np.float32((F + 1.0) / (N + 1.0))
        if lam32 == np.float32(1.0) and self.distribution == "spl":
            # LambdaTTF.java:31-34 nextUps away from exactly 1 because
            # DistributionSPL cannot work there (its assert lambda != 1);
            # we apply the same guard to LambdaDF (df == N), where the
            # reference relies on the assert alone
            lam32 = np.nextafter(lam32, np.float32(2.0))
        lam = float(lam32)
        if self.distribution == "ll":
            def kernel(tf, dl, b):
                t = tfn(tf, dl)
                return b * -np.log(lam / (t + lam))
        else:
            def kernel(tf, dl, b):
                t = tfn(tf, dl)
                q = 1.0 - 1.0 / (t + 1.0)
                q = np.where(q >= 1.0, np.nextafter(1.0, 0.0), q)
                p = lam ** q
                nudge = (np.nextafter(lam, np.inf) if lam < 1.0
                         else np.nextafter(lam, -np.inf))
                p = np.where(p == lam, nudge, p)
                return b * -np.log((p - lam) / (1.0 - lam))
        return GridScorer(kernel, boost)


class AxiomaticSimilarity(_GridBase):
    """Axiomatic variants F1EXP/F1LOG/F2LOG/F3EXP/F3LOG (Fang & Zhai
    2005) — Axiomatic.java:142-150's
    ``max(0, (tf*ln*tfln*idf - gamma) * boost)`` with each variant's
    components (AxiomaticF*.java):

    - F1*: tf = 1+ln(1+ln(freq+1)); ln = (avgdl+s)/(avgdl+dl*s); tfln=1
    - F2*: tf = ln = 1; tfln = freq/(freq+s+s*dl/avgdl)
    - F3*: tf as F1; ln = tfln = 1; gamma = (dl-queryLen)*s*queryLen/avgdl
    - idf: EXP: ((N+1)/df)^k;  LOG: ln((N+1)/df)
    Defaults follow Axiomatic() — s=0.25, queryLen=1, k=0.35
    (Axiomatic.java:103-105); F2EXP with its historical s=0.5 remains the
    separate AxiomaticF2EXPSimilarity."""

    def __init__(self, variant: str, s: float = 0.25, k: float = 0.35,
                 query_len: int = 1):
        if variant not in ("f1exp", "f1log", "f2log", "f3exp", "f3log"):
            raise ValueError(f"unknown axiomatic variant: {variant}")
        self.variant = variant
        self.s = float(np.float32(s))
        self.k = float(np.float32(k))
        self.query_len = int(query_len)

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> GridScorer:
        N = float(cs.doc_count)
        df = float(ts.doc_freq)
        avgdl = cs.sum_total_term_freq / N
        s, k, ql, variant = self.s, self.k, self.query_len, self.variant
        idf = (((N + 1.0) / df) ** k if variant.endswith("exp")
               else math.log((N + 1.0) / df))

        def kernel(tf, dl, b):
            if variant in ("f1exp", "f1log"):
                t = 1.0 + np.log(1.0 + np.log(tf + 1.0))
                ln_c = (avgdl + s) / (avgdl + dl * s)
                core = t * ln_c * idf
            elif variant == "f2log":
                core = tf / (tf + s + s * dl / avgdl) * idf
            else:  # f3exp / f3log
                t = 1.0 + np.log(1.0 + np.log(tf + 1.0))
                gamma = (dl - ql) * s * ql / avgdl
                return np.maximum(0.0, (t * idf - gamma) * b)
            return np.maximum(0.0, core * b)
        return GridScorer(kernel, boost)


class IndriDirichletSimilarity(_GridBase):
    """Indri's Dirichlet-smoothed LM — IndriDirichletSimilarity.java:
    score = ln((freq + mu * p(w|C)) / (docLen + mu)) with
    p(w|C) = totalTermFreq / numberOfFieldTokens (IndriCollectionModel,
    :159-163, NO +1 shift). Two faithful divergences from the rest of the
    zoo: the score is UNCLAMPED (log of a probability — always negative)
    and the reference's score() never multiplies stats.getBoost()
    (:103-107), so boosts are ignored here too."""

    def __init__(self, mu: float = 2000.0):
        self.mu = float(np.float32(mu))

    def _one(self, boost, cs: CollectionStats, ts: TermStats) -> GridScorer:
        p = float(ts.total_term_freq) / float(cs.sum_total_term_freq)
        mu = self.mu

        def kernel(tf, dl, b):
            # norm byte 0 decodes to length 0 (LENGTH_TABLE[0]); the shared
            # inf guard would make this UNCLAMPED log -inf, so restore the
            # reference's literal 0 length here (unreachable with freq > 0)
            dl = np.where(np.isinf(dl), 0.0, dl)
            return np.log((tf + mu * p) / (dl + mu))
        return GridScorer(kernel, boost, boost_in_kernel=False)
