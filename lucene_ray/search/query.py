"""Query AST + a minimal classic-syntax parser.

The "relational expressions" of the engine (SURVEY §2.9). All queries compile
to vectorized set/score kernels in ``executor.py``; semantics follow Lucene:

- ``TermQuery``      — BM25-scored term match (TermQuery.java:44)
- ``BooleanQuery``   — MUST / SHOULD / MUST_NOT with score = sum of matching
  scoring clauses; a pure-SHOULD query requires >=1 match
  (BooleanQuery.java, BooleanWeight.java)
- ``PhraseQuery``    — exact positional conjunction; scored with phrase freq
  and summed idf (PhraseQuery.java:71, ExactPhraseMatcher.java:39)
- ``PrefixQuery``    — term-dictionary expansion, constant score 1.0
  (PrefixQuery.java:29; MultiTermQuery constant-score rewrite)
- ``MatchAllQuery``  — constant score 1.0 for every doc
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Positional phrase. ``slop=0`` = exact consecutive positions
    (ExactPhraseMatcher.java:39). ``slop>0`` = sloppy phrase
    (SloppyPhraseMatcher.java:54): a doc matches when one occurrence per
    term can be chosen whose order-shifted positions span <= slop; each
    match contributes 1/(1+width) to the scored phrase freq (Lucene's
    sloppyFreq). Our matcher anchors on the first term and picks, per other
    term, the occurrence nearest the anchor's shifted position (ties ->
    smaller) — a deterministic simplification of Lucene's repeat-handling
    matcher, identical on phrases without repeated terms."""

    terms: tuple
    boost: float = 1.0
    slop: int = 0

    def __init__(self, terms, boost: float = 1.0, slop: int = 0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "slop", int(slop))


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Exact phrase with term ALTERNATIVES per position
    (MultiPhraseQuery.java:46): position i matches when ANY of
    ``positions[i]``'s terms occurs there — the phrase-prefix /
    synonym-phrase shape. v1 scores the hit set constant (the
    union-postings freq scoring is a documented divergence); slop
    unsupported."""

    positions: tuple  # tuple of tuples of alternative terms
    boost: float = 1.0

    def __init__(self, positions, boost: float = 1.0):
        object.__setattr__(
            self, "positions", tuple(tuple(p) for p in positions)
        )
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery(Query):
    """``*`` = any run, ``?`` = one char (WildcardQuery.java:38); expanded
    against the term dictionary, constant score."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Anchored regular expression over terms (RegexpQuery.java:44)."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Terms within ``max_edits`` Levenshtein distance (FuzzyQuery.java:52).
    v1 rewrite: constant score over the expansion (Lucene's blended-freq
    rewrite is a documented divergence)."""

    term: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """Lexicographic term range scan (TermRangeQuery.java:37), constant
    score."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class ToParentBlockJoinQuery(Query):
    """Join child matches up to their enclosing index-time doc block
    (ToParentBlockJoinQuery.java over ``addDocuments`` blocks;
    lucene/join/src/java/org/apache/lucene/search/join/ToParentBlockJoinQuery.java).

    The index must be built with ``IndexConfig.block_col``; the parent of a
    child doc is its block's LAST doc (the parents-BitSet convention —
    Lucene indexes the parent after its children). Score modes follow
    ScoreMode.java: ``none`` (constant boost), ``total``, ``max``, ``avg``
    over the block's matching-child scores, plus engine extension ``count``
    (score = number of matching children, SQL-checkable)."""

    child: "Query"
    score_mode: str = "max"
    boost: float = 1.0

    def __post_init__(self):
        if self.score_mode not in ("none", "total", "max", "avg", "count"):
            raise ValueError(f"bad score_mode: {self.score_mode!r}")


@dataclass(frozen=True)
class ToChildBlockJoinQuery(Query):
    """The inverse block join: a PARENT query's matches are mapped down to
    every child doc of the matching blocks, each child scoring its parent's
    score (lucene/join/src/java/org/apache/lucene/search/join/
    ToChildBlockJoinQuery.java:35 — "the parent's score is applied to each
    child"). Requires an ``IndexConfig.block_col`` index; parents are the
    block-LAST docs (the parents-bitset convention)."""

    parent: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class ParentChildrenBlockJoinQuery(Query):
    """Children of ONE given parent doc that match the child query, with
    the child query's own scores — lucene/join/src/java/org/apache/lucene/
    search/join/ParentChildrenBlockJoinQuery.java:39 ("return the matching
    children of a specific parent", the UI expand-one-group query).
    ``parent`` is the parent's global doc id (a block-LAST doc)."""

    parent_gid: int
    child: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class CoveringQuery(Query):
    """Matches docs where the number of matching sub-queries is >= a
    PER-DOCUMENT minimum (lucene/sandbox/src/java/org/apache/lucene/
    sandbox/search/CoveringQuery.java:47: ``LongValuesSource
    minimumNumberMatch``). ``min_match`` is a compiled formula over numeric
    doc-values columns (the engine's LongValuesSource analog,
    search/expressions.py). Values < 1 behave as 1 (CoveringQuery.java:
    minimum clamped), values > len(queries) make the doc unmatchable.
    Score = sum of the matching sub-queries' scores (SHOULD-sum)."""

    queries: tuple
    min_match: str
    boost: float = 1.0

    def __init__(self, queries, min_match: str, boost: float = 1.0):
        object.__setattr__(self, "queries", tuple(queries))
        object.__setattr__(self, "min_match", str(min_match))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class DisMaxQuery(Query):
    """Disjunction-max: a doc matching any disjunct scores
    ``max(clause scores) + tie_breaker * (sum of the other matching
    clauses)`` — DisjunctionMaxQuery.java:49 (tie_breaker=0 is the classic
    best-field behavior, 1.0 degrades to a plain sum)."""

    disjuncts: tuple
    tie_breaker: float = 0.0
    boost: float = 1.0

    def __init__(self, disjuncts, tie_breaker: float = 0.0, boost: float = 1.0):
        object.__setattr__(self, "disjuncts", tuple(disjuncts))
        object.__setattr__(self, "tie_breaker", float(tie_breaker))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Scores multiple terms as if they had been indexed as ONE term
    (lucene/core/src/java/org/apache/lucene/search/SynonymQuery.java:47-52):
    matches docs containing ANY of the terms, but invokes the similarity a
    single time per doc with freq = sum of the per-term freqs — each term's
    freq multiplied by its boost in (0, 1] (DisiWrapperFreq.freq:649-651).
    Pseudo-term statistics: docFreq = max over the terms' docFreqs,
    totalTermFreq = sum (SynonymWeight ctor :213-231).

    Divergence note: Java sums per-doc freqs in DisiPriorityQueue list order
    (unspecified); we sum in term order. With all boosts = 1 the freqs are
    integers and the sum is exact regardless of order, so scores are
    bit-identical to Lucene there."""

    terms: tuple
    boosts: tuple = ()
    boost: float = 1.0

    def __init__(self, terms, boosts=None, boost: float = 1.0):
        terms = tuple(terms)
        if boosts is None:
            boosts = (1.0,) * len(terms)
        boosts = tuple(float(b) for b in boosts)
        if len(boosts) != len(terms):
            raise ValueError("boosts must parallel terms")
        for b in boosts:
            # Builder.addTerm: boost must be in (0, 1] (SynonymQuery.java:94-97)
            if not (0.0 < b <= 1.0):
                raise ValueError(f"synonym boost must be in (0, 1]: {b}")
        object.__setattr__(self, "terms", terms)
        object.__setattr__(self, "boosts", boosts)
        object.__setattr__(self, "boost", float(boost))


@dataclass(frozen=True)
class FeatureQuery(Query):
    """Static-feature ("query-independent evidence") scoring over a numeric
    doc-values column — the FeatureField analog
    (lucene/core/src/java/org/apache/lucene/document/FeatureField.java:251-494).
    Matches every doc whose feature value S > 0 and scores it with one of
    the four published functions (weight w > 0):

    - ``linear``:      w * S                          (LinearFunction:261)
    - ``log``:         w * ln(scaling + S)            (LogFunction:306)
    - ``saturation``:  w * (1 - pivot / (S + pivot))  (SaturationFunction:360)
    - ``sigmoid``:     w * (1 - pivot^a / (S^a + pivot^a)) (SigmoidFunction:437)

    log/sigmoid compute in double then cast to float32; linear/saturation are
    float32 ops throughout — matching the Java expression shapes. Divergence:
    Lucene stores the feature in the term-freq slot via a lossy 16-bit float
    encoding (decodeFeatureValue); this engine reads the exact doc-values
    column, so scores use the exact feature value (strictly more precise).
    An outer ``boost`` folds into the weight before the expression."""

    col: str
    function: str = "log"
    weight: float = 1.0
    pivot: float = 1.0
    exp: float = 1.0
    scaling: float = 1.0
    boost: float = 1.0

    def __post_init__(self):
        if self.function not in ("linear", "log", "saturation", "sigmoid"):
            raise ValueError(f"bad feature function: {self.function!r}")
        if not self.weight > 0:
            raise ValueError("weight must be > 0")


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Constant-score filter matching docs containing ANY term of the set —
    TermInSetQuery.java (the SortedSetDocValues/terms-dict set filter Lucene
    recommends over a huge BooleanQuery of TermQuerys). Always the
    CONSTANT_SCORE rewrite: score = boost for every matching doc."""

    terms: tuple
    boost: float = 1.0

    def __init__(self, terms, boost: float = 1.0):
        object.__setattr__(self, "terms", tuple(sorted(set(terms))))
        object.__setattr__(self, "boost", float(boost))


@dataclass(frozen=True)
class SpanTermQuery(Query):
    """Primitive span: every occurrence of ``term`` is a [pos, pos+1) span
    (lucene/queries/src/java/org/apache/lucene/queries/spans/SpanTermQuery.java)."""

    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """Spans of ``match`` ending at position <= ``end`` — matches near the
    start of the field (SpanFirstQuery.java)."""

    match: "Query"
    end: int
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity of sub-spans (SpanNearQuery.java). ``in_order=True``:
    clauses must appear in order, non-overlapping, with total gap
    (sum of start_i - end_{i-1}) <= ``slop`` (NearSpansOrdered.java) — a
    greedy minimal-next-start chain per anchor span, exact for unit-length
    sub-spans (terms / span-first / span-or over terms). ``in_order=False``:
    one occurrence per clause within a window of
    max(pos) - min(pos) - (k-1) <= slop intervening positions
    (NearSpansUnordered.java) — a vectorized minimal-window sweep; clauses
    must produce unit-length spans."""

    clauses: tuple
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0

    def __init__(self, clauses, slop: int = 0, in_order: bool = True,
                 boost: float = 1.0):
        object.__setattr__(self, "clauses", tuple(clauses))
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "in_order", bool(in_order))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """Union of sub-spans (SpanOrQuery.java)."""

    clauses: tuple
    boost: float = 1.0

    def __init__(self, clauses, boost: float = 1.0):
        object.__setattr__(self, "clauses", tuple(clauses))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """Spans of ``include`` that do not overlap any span of ``exclude``
    (SpanNotQuery.java with pre=post=0)."""

    include: "Query"
    exclude: "Query"
    boost: float = 1.0


SPAN_TYPES = (SpanTermQuery, SpanFirstQuery, SpanNearQuery, SpanOrQuery, SpanNotQuery)


class IntervalsSource:
    """Base of the intervals algebra — the IntervalsSource analog
    (lucene/queries/src/java/org/apache/lucene/queries/intervals/
    IntervalsSource.java). Every source yields the MINIMAL intervals per
    doc (no yielded interval contains another — Clarke/Cormack/Burkowski
    minimal-interval semantics, as Lucene's intervals package implements)."""


@dataclass(frozen=True)
class ITerm(IntervalsSource):
    """Intervals.term: each occurrence is a unit interval."""

    term: str


@dataclass(frozen=True)
class IOrdered(IntervalsSource):
    """Intervals.ordered (+ folded-in Intervals.maxgaps filter): minimal
    intervals containing one interval of each source, in order,
    non-overlapping; ``max_gaps`` >= 0 keeps only chains whose total
    inter-source gap sum is <= max_gaps (Intervals.java ordered/maxgaps;
    max_gaps=0 == Intervals.phrase)."""

    sources: tuple
    max_gaps: int = -1

    def __init__(self, sources, max_gaps: int = -1):
        object.__setattr__(self, "sources", tuple(sources))
        object.__setattr__(self, "max_gaps", int(max_gaps))


@dataclass(frozen=True)
class IUnordered(IntervalsSource):
    """Intervals.unordered (+ maxgaps): minimal windows containing one
    interval of each source in any order; gaps = window width - sum of the
    chosen child widths."""

    sources: tuple
    max_gaps: int = -1

    def __init__(self, sources, max_gaps: int = -1):
        object.__setattr__(self, "sources", tuple(sources))
        object.__setattr__(self, "max_gaps", int(max_gaps))


@dataclass(frozen=True)
class IOr(IntervalsSource):
    """Intervals.or: minimalized union."""

    sources: tuple

    def __init__(self, sources):
        object.__setattr__(self, "sources", tuple(sources))


@dataclass(frozen=True)
class IContaining(IntervalsSource):
    """Intervals.containing: intervals of ``big`` containing >=1 ``small``."""

    big: IntervalsSource
    small: IntervalsSource


@dataclass(frozen=True)
class INotContaining(IntervalsSource):
    """Intervals.notContaining: ``big`` intervals containing no ``small``."""

    big: IntervalsSource
    small: IntervalsSource


@dataclass(frozen=True)
class IContainedBy(IntervalsSource):
    """Intervals.containedBy: ``small`` intervals inside >=1 ``big``."""

    small: IntervalsSource
    big: IntervalsSource


@dataclass(frozen=True)
class INotContainedBy(IntervalsSource):
    """Intervals.notContainedBy."""

    small: IntervalsSource
    big: IntervalsSource


def interval_terms(src: IntervalsSource) -> set[str]:
    if isinstance(src, ITerm):
        return {src.term}
    out: set[str] = set()
    for f in ("sources",):
        for c in getattr(src, f, ()):
            out |= interval_terms(c)
    for f in ("big", "small"):
        c = getattr(src, f, None)
        if c is not None:
            out |= interval_terms(c)
    return out


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Minimal-interval query over the content field — the IntervalQuery
    analog (lucene/queries/src/java/org/apache/lucene/queries/intervals/
    IntervalQuery.java:59). v1 scores every hit a constant ``boost``
    (Lucene's IntervalScorer saturates interval freq into the score — a
    documented divergence; hit sets are identical)."""

    source: IntervalsSource
    boost: float = 1.0


@dataclass(frozen=True)
class NumericRangeQuery(Query):
    """Inclusive numeric doc-values range over a stored numeric column —
    the IntPoint/LongPoint range + NumericDocValues filter analog
    (document/IntPoint.java newRangeQuery; SURVEY §2 numeric points row:
    zone-map-style pruning happens at the docmap read). Constant score."""

    col: str
    lower: float | int | None = None
    upper: float | int | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class NumericSetQuery(Query):
    """Docs whose doc-values column equals one of ``values`` — the
    IntPoint.newSetQuery / TermInSetQuery-over-points analog. Constant
    score."""

    col: str
    values: tuple = ()
    boost: float = 1.0

    def __init__(self, col: str, values, boost: float = 1.0):
        object.__setattr__(self, "col", col)
        object.__setattr__(self, "values", tuple(values))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class GeoDistanceQuery(Query):
    """Docs whose (lat_col, lon_col) doc-values point lies within
    ``radius_m`` meters of (lat, lon) — the LatLonPoint.newDistanceQuery
    analog (document/LatLonPoint.java) over two numeric doc-values
    columns, haversine per SloppyMath.haversinMeters. Constant score."""

    lat_col: str
    lon_col: str
    lat: float = 0.0
    lon: float = 0.0
    radius_m: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class GeoDistanceFeatureQuery(Query):
    """Proximity-boosting feature query — LatLonPoint.newDistanceFeatureQuery
    (document/LatLonPoint.java:257, LatLonPointDistanceFeatureQuery.java):
    matches every doc carrying the point, scoring
    ``boost * pivot_m / (pivot_m + haversine(doc, origin))`` — score decays
    from ``boost`` at the origin to ``boost/2`` at the pivot distance.
    Composes as a SHOULD clause next to a scored text query."""

    lat_col: str
    lon_col: str
    lat: float = 0.0
    lon: float = 0.0
    pivot_m: float = 1000.0
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """Matches the wrapped query's docs but REPLACES their scores with a
    compiled expression over numeric doc-values columns — the
    queries/function surface (lucene/queries/src/java/org/apache/lucene/
    queries/function/FunctionScoreQuery.java:47: "scores ... derived from a
    DoubleValuesSource"). The variable ``_score`` binds the wrapped query's
    own score (DoubleValuesSource.SCORES / fromScorer), so boost-by-field
    composes: ``FunctionScoreQuery(q, "_score * log(1 + n_chars)")``."""

    query: "Query"
    source: str
    boost: float = 1.0


@dataclass(frozen=True)
class GeoPolygonQuery(Query):
    """Docs whose (lat_col, lon_col) doc-values point lies inside the
    polygon — LatLonPoint.newPolygonQuery (document/LatLonPoint.java) with
    even-odd crossing containment (geo/Polygon2D.java). Constant score."""

    lat_col: str
    lon_col: str
    poly_lats: tuple = ()
    poly_lons: tuple = ()
    holes: tuple = ()  # inner rings ((lats, lons), ...) — Polygon holes
    boost: float = 1.0

    def __init__(self, lat_col: str, lon_col: str, poly_lats, poly_lons,
                 holes=(), boost: float = 1.0):
        object.__setattr__(self, "lat_col", lat_col)
        object.__setattr__(self, "lon_col", lon_col)
        object.__setattr__(self, "poly_lats", tuple(float(v) for v in poly_lats))
        object.__setattr__(self, "poly_lons", tuple(float(v) for v in poly_lons))
        object.__setattr__(self, "holes", tuple(
            (tuple(float(v) for v in a), tuple(float(v) for v in b))
            for a, b in holes))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Wraps any query: same hit set, every hit scores ``boost``
    (ConstantScoreQuery.java)."""

    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanQuery(Query):
    """MUST / SHOULD / MUST_NOT / FILTER clauses (BooleanClause.Occur):
    FILTER is required like MUST but contributes nothing to the score —
    Lucene's scoreless cached-filter occur."""

    must: tuple = field(default_factory=tuple)
    should: tuple = field(default_factory=tuple)
    must_not: tuple = field(default_factory=tuple)
    filter: tuple = field(default_factory=tuple)
    minimum_should_match: int = 0

    def __init__(self, must=(), should=(), must_not=(), filter=(),
                 minimum_should_match: int = 0):
        object.__setattr__(self, "must", tuple(must))
        object.__setattr__(self, "should", tuple(should))
        object.__setattr__(self, "must_not", tuple(must_not))
        object.__setattr__(self, "filter", tuple(filter))
        object.__setattr__(self, "minimum_should_match", minimum_should_match)

    @property
    def effective_msm(self) -> int:
        # pure-disjunction requires one SHOULD match; a MUST or FILTER
        # clause makes SHOULD optional (BooleanWeight semantics)
        if self.minimum_should_match == 0 and not self.must \
                and not self.filter and self.should:
            return 1
        return self.minimum_should_match


def common_terms_query(
    terms: list[str],
    doc_freqs: dict[str, int],
    max_doc: int,
    max_term_frequency: float,
    low_freq_occur: str = "SHOULD",
    high_freq_occur: str = "SHOULD",
    low_freq_msm: float = 0.0,
    high_freq_msm: float = 0.0,
) -> Query:
    """CommonTermsQuery rewrite (queries/src/java/org/apache/lucene/queries/
    CommonTermsQuery.java:145 buildQuery): split terms by document frequency
    against ``max_term_frequency`` (absolute when >= 1, else a fraction of
    ``max_doc``); low-frequency terms form a required sub-clause, high-
    frequency ("common") terms an optional one that only boosts scores of
    docs already matched by the rare terms. All-high-frequency degenerates
    to a conjunction (CommonTermsQuery.java:175-183).

    ``doc_freqs`` maps term -> df; absent terms classify as low frequency
    (termStates == null branch, CommonTermsQuery.java:151-152). ``max_doc``
    is the collection doc count (Lucene's maxDoc analog). Fractional
    ``*_msm`` < 1 resolves to round(msm * n_optional)
    (CommonTermsQuery.java:138-143); occur strings are MUST or SHOULD
    (MUST_NOT rejected, as in the Java constructor).
    """
    import math

    for occ in (low_freq_occur, high_freq_occur):
        if occ not in ("MUST", "SHOULD"):
            raise ValueError(f"occur must be MUST or SHOULD, got {occ}")
    if not terms:
        return BooleanQuery()  # MatchNoDocsQuery analog: matches nothing
    if len(terms) == 1:
        return TermQuery(terms[0])
    cutoff = int(math.ceil(max_term_frequency * float(max_doc)))
    low: list[str] = []
    high: list[str] = []
    for t in terms:
        df = doc_freqs.get(t, 0)
        if df > 0 and (
            (max_term_frequency >= 1.0 and df > max_term_frequency)
            or df > cutoff
        ):
            high.append(t)
        else:
            low.append(t)

    def _msm(f: float, n_optional: int) -> int:
        if f >= 1.0 or f == 0.0:
            return int(f)
        return int(math.floor(f * n_optional + 0.5))  # Java Math.round

    low_msm = _msm(low_freq_msm, len(low)) if (
        low_freq_occur == "SHOULD" and low) else 0
    high_msm = _msm(high_freq_msm, len(high)) if (
        high_freq_occur == "SHOULD" and high) else 0
    if not low and high_msm == 0 and high_freq_occur != "MUST":
        # all terms are common: rewrite to a conjunction to avoid a slow
        # full-disjunction scan (CommonTermsQuery.java:175-183)
        high_freq_occur = "MUST"

    def _sub(ts: list[str], occur: str, msm: int) -> BooleanQuery:
        clauses = tuple(TermQuery(t) for t in ts)
        if occur == "MUST":
            return BooleanQuery(must=clauses)
        return BooleanQuery(should=clauses, minimum_should_match=msm)

    must = (_sub(low, low_freq_occur, low_msm),) if low else ()
    should = (_sub(high, high_freq_occur, high_msm),) if high else ()
    return BooleanQuery(must=must, should=should)


def collect_terms(q: Query) -> set[str]:
    """All index terms a query needs postings for (prefixes excluded —
    expanded against the term dictionary at search time)."""
    out: set[str] = set()
    _collect(q, out)
    return out


def _collect(q: Query, out: set[str]) -> None:
    if isinstance(q, (TermQuery, SpanTermQuery)):
        out.add(q.term)
    elif isinstance(q, (PhraseQuery, SynonymQuery, TermInSetQuery)):
        out.update(q.terms)
    elif isinstance(q, MultiPhraseQuery):
        for alts in q.positions:
            out.update(alts)
    elif isinstance(q, BooleanQuery):
        for c in (*q.must, *q.should, *q.must_not, *q.filter):
            _collect(c, out)
    elif isinstance(q, (ToParentBlockJoinQuery, ToChildBlockJoinQuery,
                        ParentChildrenBlockJoinQuery, ConstantScoreQuery,
                        FunctionScoreQuery)):
        _collect(children(q)[0], out)
    elif isinstance(q, (DisMaxQuery, CoveringQuery)):
        for c in children(q):
            _collect(c, out)
    elif isinstance(q, (SpanNearQuery, SpanOrQuery)):
        for c in q.clauses:
            _collect(c, out)
    elif isinstance(q, SpanFirstQuery):
        _collect(q.match, out)
    elif isinstance(q, SpanNotQuery):
        _collect(q.include, out)
        _collect(q.exclude, out)
    elif isinstance(q, IntervalQuery):
        out.update(interval_terms(q.source))


def children(q: Query) -> tuple:
    """Direct sub-queries of a node (empty for leaves)."""
    if isinstance(q, BooleanQuery):
        return (*q.must, *q.should, *q.must_not, *q.filter)
    if isinstance(q, ToParentBlockJoinQuery):
        return (q.child,)
    if isinstance(q, ToChildBlockJoinQuery):
        return (q.parent,)
    if isinstance(q, ParentChildrenBlockJoinQuery):
        return (q.child,)
    if isinstance(q, (ConstantScoreQuery, FunctionScoreQuery)):
        return (q.query,)
    if isinstance(q, (DisMaxQuery, CoveringQuery)):
        return q.disjuncts if isinstance(q, DisMaxQuery) else q.queries
    if isinstance(q, (SpanNearQuery, SpanOrQuery)):
        return q.clauses
    if isinstance(q, SpanFirstQuery):
        return (q.match,)
    if isinstance(q, SpanNotQuery):
        return (q.include, q.exclude)
    return ()


def needs_positions(q: Query) -> bool:
    """True when evaluating ``q`` requires positional postings (phrases,
    the span family, intervals)."""
    if isinstance(q, (PhraseQuery, MultiPhraseQuery, IntervalQuery, *SPAN_TYPES)):
        return True
    return any(needs_positions(c) for c in children(q))


def collect_dv_cols(q: Query) -> set[str]:
    """Doc-values columns a query filters on (NumericRangeQuery /
    GeoDistanceQuery nodes)."""
    out: set[str] = set()
    if isinstance(q, (NumericRangeQuery, NumericSetQuery, FeatureQuery)):
        out.add(q.col)
    if isinstance(q, (GeoDistanceQuery, GeoPolygonQuery,
                      GeoDistanceFeatureQuery)):
        out.add(q.lat_col)
        out.add(q.lon_col)
    if isinstance(q, CoveringQuery):
        from lucene_ray.search.expressions import compile_expression

        out |= set(compile_expression(q.min_match).variables)
    if isinstance(q, FunctionScoreQuery):
        from lucene_ray.search.expressions import compile_expression

        out |= set(compile_expression(q.source).variables) - {"_score"}
    for c in children(q):
        out |= collect_dv_cols(c)
    return out


MULTI_TERM_TYPES = (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery)


def collect_multi_term(q: Query) -> set[Query]:
    """Multi-term nodes needing term-dictionary expansion (the
    AutomatonTermsEnum rewrite inputs)."""
    out: set[Query] = set()
    if isinstance(q, MULTI_TERM_TYPES):
        out.add(q)
    for c in children(q):
        out |= collect_multi_term(c)
    return out


def collect_synonyms(q: Query) -> set["SynonymQuery"]:
    """SynonymQuery nodes — each needs a pseudo-term scorer built from
    blended stats at plan time (SynonymWeight ctor)."""
    out: set[SynonymQuery] = set()
    if isinstance(q, SynonymQuery):
        out.add(q)
    for c in children(q):
        out |= collect_synonyms(c)
    return out


def multi_field_query(s: str, fields: tuple, boosts: dict | None = None,
                      analyzer=None, content_field: str | None = None) -> Query:
    """MultiFieldQueryParser.parse shape (queryparser/classic/
    MultiFieldQueryParser.java:58-66 with the boosts-map ctor :100-121):
    each analyzed term of ``s`` expands to a BooleanQuery with one SHOULD
    clause per field (per-field boost folded into the term weight, as
    BoostQuery does); terms combine under the default OR operator. Terms
    for ``content_field`` stay unprefixed (the index's default field);
    other fields are namespaced ``field:term`` (IndexConfig.text_cols)."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    tk = analyzer or CodeTokenizer()
    boosts = boosts or {}
    clauses: list[Query] = []
    for w in tk(s):
        per_field: list[Query] = [
            TermQuery(w if f == content_field else f"{f}:{w}",
                      boost=float(boosts.get(f, 1.0)))
            for f in fields
        ]
        clauses.append(per_field[0] if len(per_field) == 1
                       else BooleanQuery(should=tuple(per_field)))
    if not clauses:
        return MatchAllQuery()
    return clauses[0] if len(clauses) == 1 else BooleanQuery(should=tuple(clauses))


def parse_query(s: str, analyzer=None, text_fields: tuple = ()) -> Query:
    """Tiny recursive-descent parser over the v1 grammar
    (SURVEY §2.9 query-parsing row):

        expr     := clause (('AND'|'OR') clause)*   (AND binds as one bool)
        clause   := ['NOT'] ['+'|'-'] atom
        atom     := '"' term+ '"' | term'*' | term | '(' expr ')'

    Mixed AND/OR follows the classic parser's simplification: AND'd clauses
    become MUST, OR'd become SHOULD, NOT/'-' become MUST_NOT.
    """
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    tk = analyzer or CodeTokenizer()
    tokens = _lex(s)
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def advance():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def parse_atom():
        t = peek()
        if t == "(":
            advance()
            q = parse_expr()
            if peek() == ")":
                advance()
            return q
        if t == '"':
            advance()
            terms: list[str] = []
            while peek() not in ('"', None):
                terms.extend(tk(advance()))
            if peek() == '"':
                advance()
            slop = 0
            nxt = peek()
            if nxt and nxt.startswith("~") and nxt[1:].isdigit():
                slop = int(advance()[1:])  # "a b"~2 classic-parser syntax
            if len(terms) == 1:
                return TermQuery(terms[0])
            return PhraseQuery(terms, slop=slop)
        word = advance()
        # trailing ^boost (classic parser: term^2, field:v^1.5, joib~1^2)
        boost = 1.0
        if "^" in word:
            word, _, btxt = word.rpartition("^")
            try:
                boost = float(btxt)
            except ValueError:
                word = f"{word}^{btxt}"
                boost = 1.0
        if ":" in word:
            # classic field:term syntax; keyword fields are atomic terms
            # namespaced "field:value" in the shared postings.
            # field:[a TO b] / field:{a TO b} = range over the field:
            # numeric endpoints -> NumericRangeQuery on the doc-values
            # column (IntPoint.newRangeQuery shape).
            field, _, rest = word.partition(":")
            if field and rest and rest[0] in "[{":
                rng = _parse_range(rest, advance, peek)
                if rng is not None:
                    lo, hi, inc_lo, inc_hi, rboost = rng
                    # NumericRangeQuery is inclusive; nudge exclusive
                    # endpoints inward (next int / next float)
                    import math

                    if lo is not None and not inc_lo:
                        lo = lo + 1 if isinstance(lo, int) else math.nextafter(lo, math.inf)
                    if hi is not None and not inc_hi:
                        hi = hi - 1 if isinstance(hi, int) else math.nextafter(hi, -math.inf)
                    return NumericRangeQuery(field, lo, hi,
                                             boost=boost * rboost)
            if field and rest:
                if field in text_fields:
                    # TEXT field (IndexConfig.text_cols): analyze the value
                    # with the shared analyzer; multiple tokens combine as
                    # SHOULD (classic QueryParser newFieldQuery default,
                    # autoGeneratePhraseQueries=false)
                    norm = tk(rest)
                    if len(norm) == 1:
                        return TermQuery(f"{field}:{norm[0]}", boost=boost)
                    if norm:
                        return BooleanQuery(should=tuple(
                            TermQuery(f"{field}:{t}", boost=boost)
                            for t in norm))
                return TermQuery(f"{field}:{rest}", boost=boost)
        if word and word[0] in "[{":
            # bare [a TO b] = lexicographic term range over the content
            # dictionary (TermRangeQuery.java:37)
            rng = _parse_range(word, advance, peek, numeric=False)
            if rng is not None:
                lo, hi, inc_lo, inc_hi, rboost = rng
                return TermRangeQuery(lo, hi, inc_lo, inc_hi,
                                      boost=boost * rboost)
        if word.endswith("*") and len(word) > 1:
            norm = tk(word[:-1])
            return PrefixQuery(norm[0] if norm else word[:-1].lower(),
                               boost=boost)
        # trailing ~N / ~ = FuzzyQuery (classic parser fuzzy syntax)
        if "~" in word[1:]:
            base, _, etxt = word.rpartition("~")
            if etxt == "" or etxt.isdigit():
                norm = tk(base)
                if len(norm) == 1:
                    return FuzzyQuery(norm[0], int(etxt) if etxt else 2,
                                      boost=boost)
        norm = tk(word)
        if not norm:
            return MatchAllQuery()
        if len(norm) == 1:
            return TermQuery(norm[0], boost=boost)
        return PhraseQuery(norm, boost=boost)

    def parse_clause():
        neg = False
        while peek() in ("NOT", "-", "+"):
            t = advance()
            if t in ("NOT", "-"):
                neg = not neg
        q = parse_atom()
        return ("NOT" if neg else "", q)

    def parse_expr():
        sign, first = parse_clause()
        must, should, must_not = [], [], []
        (must_not if sign else should).append(first)
        while peek() in ("AND", "OR"):
            mode = advance()
            sign, q = parse_clause()
            if sign:
                must_not.append(q)
            elif mode == "AND":
                # AND binds its left neighbor too: "a AND b" => +a +b
                # (classic-parser simplification)
                if should:
                    must.append(should.pop())
                must.append(q)
            else:
                should.append(q)
        while peek() not in (None, ")"):
            sign, q = parse_clause()
            (must_not if sign else should).append(q)
        if not must and not must_not and len(should) == 1:
            return should[0]
        return BooleanQuery(must=must, should=should, must_not=must_not)

    return parse_expr()


def _parse_range(first: str, advance, peek, numeric: bool = True):
    """Classic-parser range body: ``first`` is the token starting with
    '[' or '{' (e.g. "[200"); consumes "TO" and the closing token
    ("400]" / "400}"). Returns (lower, upper, include_lower, include_upper,
    boost) or None if the shape doesn't match. ``*`` endpoints are open;
    boost comes from a trailing ^N on the closing token (1.0 otherwise)."""
    include_lower = first[0] == "["
    lo_txt = first[1:]
    if peek() != "TO":
        return None
    advance()
    closer = peek()
    if closer is None:
        return None
    advance()
    boost = 1.0
    if "^" in closer:
        closer, _, btxt = closer.rpartition("^")
        try:
            boost = float(btxt)
        except ValueError:
            return None
    if not closer or closer[-1] not in "]}":
        return None
    include_upper = closer[-1] == "]"
    hi_txt = closer[:-1]

    def endpoint(txt):
        if txt in ("", "*"):
            return None
        if not numeric:
            return txt.lower()
        try:
            return int(txt)
        except ValueError:
            return float(txt)

    try:
        return (endpoint(lo_txt), endpoint(hi_txt), include_lower,
                include_upper, boost)
    except ValueError:
        return None


def _lex(s: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
        elif c in '()"':
            out.append(c)
            i += 1
        elif c in "+-":
            out.append(c)
            i += 1
        else:
            j = i
            while j < len(s) and not s[j].isspace() and s[j] not in '()"':
                j += 1
            out.append(s[i:j])
            i = j
    return out
