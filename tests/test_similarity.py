"""BM25 float32-exactness tests (BaseSimilarityTestCase pattern, FIXTURES.md F4).

Sweeps all 256 norm bytes x freqs x corpus shapes and asserts the score is
finite, non-negative, monotone in freq, anti-monotone in doc length, and that
the expression is computed in float32 with Lucene's exact operation order
(BM25Similarity.java:101-108,181-183,221-232).
"""

import math

import numpy as np
import pytest

from lucene_ray.codec.smallfloat import LENGTH_TABLE
from lucene_ray.search.similarity import (
    AxiomaticF2EXPSimilarity,
    AxiomaticSimilarity,
    DFISimilarity,
    DFRGridSimilarity,
    DFRSimilarity,
    IBGridSimilarity,
    IBSimilarity,
    IndriDirichletSimilarity,
    RawTFSimilarity,
    BM25Similarity,
    BooleanSimilarity,
    ClassicSimilarity,
    CollectionStats,
    LMDirichletSimilarity,
    LMJelinekMercerSimilarity,
    TermStats,
)


CORPUS_SHAPES = [
    CollectionStats(doc_count=1, sum_total_term_freq=1),
    CollectionStats(doc_count=100, sum_total_term_freq=5000),
    CollectionStats(doc_count=12345, sum_total_term_freq=999999),
    CollectionStats(doc_count=10**9, sum_total_term_freq=10**11),
    CollectionStats(doc_count=7, sum_total_term_freq=7),
]


@pytest.mark.parametrize("stats", CORPUS_SHAPES)
def test_score_sanity_all_norms(stats):
    sim = BM25Similarity()
    df = max(1, stats.doc_count // 3)
    scorer = sim.scorer(1.0, stats, TermStats(df, df * 2))
    norms = np.arange(256, dtype=np.uint8)
    for freq in [1, 2, 10, 255]:
        s = scorer.score(np.full(256, freq), norms)
        assert s.dtype == np.float32
        assert np.isfinite(s).all()
        assert (s >= 0).all()
    # monotone in freq at fixed norm
    freqs = np.array([1, 2, 3, 10, 100, 255])
    for nb in [0, 40, 128, 255]:
        s = scorer.score(freqs, np.full(len(freqs), nb))
        assert (np.diff(s) >= 0).all()
    # anti-monotone in decoded length at fixed freq (LENGTH_TABLE is
    # non-decreasing in byte value)
    s = scorer.score(np.full(256, 10), norms)
    assert (np.diff(s) <= 1e-7).all()


def test_idf_matches_reference_formula():
    sim = BM25Similarity()
    # idf = (float) log(1 + (N - n + 0.5)/(n + 0.5)), double then f32 cast
    for n, N in [(1, 1), (1, 100), (50, 100), (999, 1000), (1, 10**9)]:
        expected = np.float32(math.log(1 + (N - n + 0.5) / (n + 0.5)))
        assert sim.idf(n, N) == expected


def test_exact_known_value():
    # hand-computed single case, all-f32 op order:
    # N=4 docs, df=2, sum_ttf=12 -> avgdl=3.0
    sim = BM25Similarity()
    stats = CollectionStats(doc_count=4, sum_total_term_freq=12)
    scorer = sim.scorer(1.0, stats, TermStats(2, 5))
    idf = np.float32(math.log(1 + (4 - 2 + 0.5) / (2 + 0.5)))
    avgdl = np.float32(3.0)
    k1, b = np.float32(1.2), np.float32(0.75)
    norm_byte = 3  # decodes to length 3 (exact low range)
    cache = np.float32(1.0) / (k1 * ((np.float32(1) - b) + b * LENGTH_TABLE[norm_byte] / avgdl))
    freq = np.float32(2.0)
    expected = idf - idf / (np.float32(1) + freq * cache)
    got = scorer.score(np.array([2.0]), np.array([norm_byte]))[0]
    assert got == expected


def test_length_table_values():
    # byte 0..39 decode exactly to themselves (NUM_FREE_VALUES = 40 in
    # Lucene main: 255 - longToInt4(Integer.MAX_VALUE)=215)
    from lucene_ray.codec.smallfloat import NUM_FREE_VALUES

    for i in range(NUM_FREE_VALUES):
        assert LENGTH_TABLE[i] == i


# ---- the Similarity seam: both implementations must satisfy the same
# SimScorer contract (BaseSimilarityTestCase.testRandomScoring pattern,
# lucene/test-framework/.../search/similarities/BaseSimilarityTestCase.java:258)

@pytest.mark.parametrize(
    "sim",
    [BM25Similarity(), ClassicSimilarity(), LMDirichletSimilarity(),
     LMJelinekMercerSimilarity(), BooleanSimilarity(), DFRSimilarity(),
     AxiomaticF2EXPSimilarity(), DFISimilarity(), IBSimilarity(),
     RawTFSimilarity(),
     DFRGridSimilarity("g", "l", "h1"), DFRGridSimilarity("ine", "b", "h2"),
     DFRGridSimilarity("if", "b", "z", c=0.3),
     DFRGridSimilarity("in", "l", "h3", c=800.0),
     DFRGridSimilarity("g", "b", "h2"),
     IBGridSimilarity("spl", "ttf", "h2"), IBGridSimilarity("spl", "df"),
     AxiomaticSimilarity("f1exp"), AxiomaticSimilarity("f1log"),
     AxiomaticSimilarity("f2log"), AxiomaticSimilarity("f3exp"),
     AxiomaticSimilarity("f3log")],
    ids=["bm25", "classic", "lmdirichlet", "lmjm", "boolean", "dfr",
         "axiomatic", "dfi", "ib", "rawtf",
         "dfr_glh1", "dfr_inebh2", "dfr_ifbz", "dfr_inlh3", "dfr_gbh2",
         "ib_spl_ttf", "ib_spl_df", "ax_f1exp", "ax_f1log", "ax_f2log",
         "ax_f3exp", "ax_f3log"],
)
@pytest.mark.parametrize("stats", CORPUS_SHAPES)
def test_similarity_contract_all_norms(sim, stats):
    rng = np.random.default_rng(99)
    for _ in range(10):
        df = int(rng.integers(1, stats.doc_count + 1))
        ttf = df * int(rng.integers(1, 5))
        scorer = sim.scorer(1.0, stats, TermStats(df, ttf))
        norms = np.arange(256, dtype=np.uint8)
        for freq in [1, 2, 10, 255]:
            s = scorer.score(np.full(256, freq), norms)
            assert s.dtype == np.float32
            assert np.isfinite(s).all()
            assert (s >= 0).all()
        # monotone in freq at fixed norm
        freqs = np.array([1, 2, 3, 10, 100, 255])
        for nb in [1, 40, 128, 255]:
            s = scorer.score(freqs, np.full(len(freqs), nb))
            assert (np.diff(s) >= 0).all()
        # anti-monotone in decoded length at fixed freq
        s = scorer.score(np.full(255, 10), np.arange(1, 256, dtype=np.uint8))
        assert (np.diff(s) <= 1e-6).all()
        # boost folds into the weight
        b = scorer.with_boost(2.0)
        assert b.score(np.array([3]), np.array([10]))[0] == pytest.approx(
            2.0 * scorer.score(np.array([3]), np.array([10]))[0], rel=1e-6
        )


def test_classic_similarity_end_to_end_seam(ray_session, built_index):
    """A search with ClassicSimilarity through the unchanged engine must be
    rank+score identical to the exhaustive oracle using the same
    similarity — the seam carries a second implementation unmodified."""
    import pyarrow.parquet as pq

    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.oracle import ExhaustiveOracle
    from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    index_dir, manifest, corpus_file = built_index
    s = Searcher(IndexReader(index_dir), similarity=ClassicSimilarity())
    texts = pq.read_table(corpus_file, columns=["content"]).column("content").to_pylist()
    docs, row = [], 0
    for p in manifest.partitions:
        for off in range(p["num_rows"]):
            docs.append(((p["pid"] << 32) | off, texts[row]))
            row += 1
    oracle = ExhaustiveOracle(docs, similarity=ClassicSimilarity())
    for q in [TermQuery("import"), TermQuery("import", boost=2.0),
              BooleanQuery(must=[TermQuery("def"), TermQuery("class")]),
              BooleanQuery(should=[TermQuery("import"), TermQuery("return")]),
              PhraseQuery(("import", "return"), slop=2)]:
        got = s.search(q, 10)
        exp_ids, exp_scores, exp_total = oracle.search(q, 10)
        assert got.total_hits == exp_total, q
        np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=str(q))
        np.testing.assert_array_equal(got.scores, exp_scores, err_msg=str(q))
    # and the two similarities actually differ (the seam isn't a no-op)
    bm = Searcher(IndexReader(index_dir)).search(TermQuery("import"), 10)
    cl = s.search(TermQuery("import"), 10)
    assert not np.array_equal(bm.scores, cl.scores)


def test_lmdirichlet_exact_formula():
    # score = boost*(log(1 + f/(mu*p)) + log(mu/(len+mu))), p=(ttf+1)/(sum+1),
    # clamped at 0 (LMDirichletSimilarity.java:56-75)
    sim = LMDirichletSimilarity(mu=2000.0)
    stats = CollectionStats(doc_count=100, sum_total_term_freq=9999)
    scorer = sim.scorer(1.0, stats, TermStats(doc_freq=10, total_term_freq=500))
    p = (500 + 1.0) / (9999 + 1.0)
    for freq, nb in [(1, 3), (50, 3), (5, 200), (255, 255)]:
        ln = float(LENGTH_TABLE[nb])
        expected = math.log(1 + freq / (2000.0 * p)) + math.log(2000.0 / (ln + 2000.0))
        expected = np.float32(max(expected, 0.0))
        got = scorer.score(np.array([freq]), np.array([nb]))[0]
        assert got == expected, (freq, nb)
    # clamp: a rare-enough term in a long doc would go negative -> 0
    rare = sim.scorer(1.0, stats, TermStats(1, 1))
    assert rare.score(np.array([1]), np.array([255]))[0] == np.float32(0.0)
    with pytest.raises(ValueError):
        LMDirichletSimilarity(mu=0)


def test_boolean_similarity_scores_boost_only():
    sim = BooleanSimilarity()
    stats = CollectionStats(1000, 50000)
    scorer = sim.scorer(3.5, stats, TermStats(10, 20))
    s = scorer.score(np.array([1, 7, 255]), np.array([0, 128, 255]))
    np.testing.assert_array_equal(s, np.full(3, np.float32(3.5)))


@pytest.mark.parametrize(
    "sim", [LMDirichletSimilarity(), LMJelinekMercerSimilarity(0.3),
            BooleanSimilarity(), DFRSimilarity(), AxiomaticF2EXPSimilarity(),
            DFISimilarity(), IBSimilarity(), RawTFSimilarity(),
            DFRGridSimilarity("ine", "b", "h2"),
            IBGridSimilarity("spl", "ttf", "h2"),
            AxiomaticSimilarity("f3exp"), IndriDirichletSimilarity()],
    ids=["lmdirichlet", "lmjm", "boolean", "dfr", "axiomatic", "dfi", "ib",
         "rawtf", "dfr_grid", "ib_spl", "ax_f3exp", "indri"],
)
def test_new_similarities_end_to_end_seam(ray_session, built_index, sim):
    """Search through the unchanged engine with each additional similarity
    must be rank+score identical to the exhaustive oracle — the seam is
    pluggable beyond the two originals (incl. pruning paths, which only use
    score/max_score)."""
    import pyarrow.parquet as pq

    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.oracle import ExhaustiveOracle
    from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery
    from lucene_ray.search.searcher import Searcher

    index_dir, manifest, corpus_file = built_index
    s = Searcher(IndexReader(index_dir), similarity=sim)
    texts = pq.read_table(corpus_file, columns=["content"]).column("content").to_pylist()
    docs, row = [], 0
    for p in manifest.partitions:
        for off in range(p["num_rows"]):
            docs.append(((p["pid"] << 32) | off, texts[row]))
            row += 1
    oracle = ExhaustiveOracle(docs, similarity=sim)
    for q in [TermQuery("import"), TermQuery("import", boost=2.0),
              BooleanQuery(must=[TermQuery("def"), TermQuery("class")]),
              BooleanQuery(should=[TermQuery("import"), TermQuery("return")]),
              PhraseQuery(("import", "return"), slop=2)]:
        got = s.search(q, 10)
        exp_ids, exp_scores, exp_total = oracle.search(q, 10)
        assert got.total_hits == exp_total, q
        np.testing.assert_array_equal(got.doc_ids, exp_ids, err_msg=str(q))
        np.testing.assert_array_equal(got.scores, exp_scores, err_msg=str(q))


def test_boost_and_param_validation():
    with pytest.raises(ValueError):
        BM25Similarity(k1=-1)
    with pytest.raises(ValueError):
        BM25Similarity(b=1.5)
    sim = BM25Similarity()
    stats = CollectionStats(100, 1000)
    s1 = sim.scorer(1.0, stats, TermStats(10, 20))
    s2 = sim.scorer(2.0, stats, TermStats(10, 20))
    a = s1.score(np.array([3]), np.array([10]))[0]
    b2 = s2.score(np.array([3]), np.array([10]))[0]
    assert b2 == np.float32(2.0) * a or abs(b2 - 2 * a) < 1e-6


def test_lmjelinekmercer_exact_formula():
    # score = boost*log(1 + ((1-lam)*f/len) / (lam*p)), p=(ttf+1)/(sum+1)
    # (LMJelinekMercerSimilarity.java:67-75)
    lam = 0.1
    sim = LMJelinekMercerSimilarity(lam)
    stats = CollectionStats(doc_count=100, sum_total_term_freq=9999)
    scorer = sim.scorer(1.0, stats, TermStats(doc_freq=10, total_term_freq=500))
    p = (500 + 1.0) / (9999 + 1.0)
    for freq, nb in [(1, 3), (50, 3), (5, 200), (255, 255)]:
        ln = float(LENGTH_TABLE[nb])
        expected = np.float32(math.log(1 + ((1 - lam) * freq / ln) / (lam * p)))
        got = scorer.score(np.array([freq]), np.array([nb]))[0]
        assert got == expected, (freq, nb)
    # lambda = 1: pure collection model, every score is exactly 0
    flat = LMJelinekMercerSimilarity(1.0).scorer(1.0, stats, TermStats(10, 500))
    assert flat.score(np.array([100]), np.array([50]))[0] == np.float32(0.0)
    for bad in (0.0, -0.5, 1.5, float("nan")):
        with pytest.raises(ValueError):
            LMJelinekMercerSimilarity(bad)


def test_dfr_inb2_exact_formula():
    # InB2: (F+1)/(n*(tfn+1)) * tfn * log2((N+1)/(n+0.5)),
    # tfn = tf*log2(1 + c*avgdl/dl)  (Amati & van Rijsbergen 2002;
    # DFRSimilarity.java combo In/B/H2)
    sim = DFRSimilarity(c=1.0)
    stats = CollectionStats(doc_count=100, sum_total_term_freq=9999)
    scorer = sim.scorer(1.0, stats, TermStats(doc_freq=10, total_term_freq=500))
    avgdl = 9999 / 100.0
    for freq, nb in [(1, 3), (50, 3), (5, 200), (255, 255)]:
        dl = float(LENGTH_TABLE[nb])
        tfn = freq * math.log2(1 + avgdl / dl)
        exp = np.float32((500 + 1.0) / (10 * (tfn + 1)) * tfn
                         * math.log2((100 + 1.0) / (10 + 0.5)))
        got = scorer.score(np.array([freq]), np.array([nb]))[0]
        assert got == exp, (freq, nb)
    for bad in (0.0, -1.0, float("nan")):
        with pytest.raises(ValueError):
            DFRSimilarity(bad)


def test_axiomatic_f2exp_exact_formula():
    # F2EXP: tf/(tf + s + s*dl/avgdl) * ((N+1)/df)^k  (Fang & Zhai 2005;
    # AxiomaticF2EXP.java)
    sim = AxiomaticF2EXPSimilarity(s=0.5, k=0.35)
    stats = CollectionStats(doc_count=100, sum_total_term_freq=9999)
    scorer = sim.scorer(1.0, stats, TermStats(doc_freq=10, total_term_freq=500))
    avgdl = 9999 / 100.0
    for freq, nb in [(1, 3), (50, 3), (5, 200), (255, 255)]:
        dl = float(LENGTH_TABLE[nb])
        exp = np.float32(freq / (freq + 0.5 + 0.5 * dl / avgdl)
                         * ((100 + 1.0) / 10) ** 0.35)
        got = scorer.score(np.array([freq]), np.array([nb]))[0]
        assert got == exp, (freq, nb)
    for bad_s in (-0.1, 1.5):
        with pytest.raises(ValueError):
            AxiomaticF2EXPSimilarity(s=bad_s)
    with pytest.raises(ValueError):
        AxiomaticF2EXPSimilarity(k=0.0)


@pytest.mark.parametrize("stats", CORPUS_SHAPES)
def test_indri_contract_all_norms(stats):
    """IndriDirichlet's contract differs from the rest of the zoo in two
    reference-faithful ways: scores are UNCLAMPED (log of a probability,
    always <= 0) and the reference score() ignores the boost."""
    sim = IndriDirichletSimilarity()
    rng = np.random.default_rng(7)
    for _ in range(5):
        df = int(rng.integers(1, stats.doc_count + 1))
        ttf = min(stats.sum_total_term_freq, df * int(rng.integers(1, 5)))
        scorer = sim.scorer(1.0, stats, TermStats(df, ttf))
        norms = np.arange(256, dtype=np.uint8)
        for freq in [1, 2, 10, 255]:
            s = scorer.score(np.full(256, freq), norms)
            assert s.dtype == np.float32
            assert np.isfinite(s).all()
            # log of a probability on every PHYSICAL (freq <= doc length)
            # pair; freq > length never occurs in a real posting
            physical = freq <= LENGTH_TABLE[norms]
            assert (s[physical] <= 0).all()
        freqs = np.array([1, 2, 3, 10, 100, 255])
        for nb in [1, 40, 128, 255]:
            s = scorer.score(freqs, np.full(len(freqs), nb))
            assert (np.diff(s) >= 0).all()
        s = scorer.score(np.full(255, 10), np.arange(1, 256, dtype=np.uint8))
        assert (np.diff(s) <= 1e-6).all()
        # the reference's score() never multiplies stats.getBoost()
        b = scorer.with_boost(2.0)
        assert b.score(np.array([3]), np.array([10]))[0] == scorer.score(
            np.array([3]), np.array([10]))[0]


def test_dfr_grid_hand_checked():
    """Spot-check the grid against hand-evaluated reference formulas."""
    cs = CollectionStats(doc_count=100, sum_total_term_freq=5000)
    ts = TermStats(doc_freq=10, total_term_freq=30)
    avgdl = 50.0
    dl = float(LENGTH_TABLE[40])
    tf = 3.0

    # G x L x H1
    s = DFRGridSimilarity("g", "l", "h1").scorer(1.0, cs, ts)
    lam = 31.0 / (100.0 + 31.0)
    A = math.log2(lam + 1.0)
    B2 = math.log2((1.0 + lam) / lam)
    tfn = tf * 1.0 * (avgdl / dl)
    want = np.float32((B2 - (B2 - A) / (1.0 + tfn)) * 1.0)
    assert s.score(np.array([3]), np.array([40]))[0] == want

    # Ine x B x H2
    s = DFRGridSimilarity("ine", "b", "h2").scorer(1.0, cs, ts)
    ne = 100.0 * (1.0 - (99.0 / 100.0) ** 30.0)
    A = math.log2(101.0 / (ne + 0.5))
    ae = (30.0 + 2.0) / (10.0 + 1.0)
    tfn = tf * math.log2(1.0 + 1.0 * avgdl / dl)
    want = np.float32(A * ae * (1.0 - 1.0 / (1.0 + tfn)))
    assert s.score(np.array([3]), np.array([40]))[0] == want

    # In x L x H3(mu=800)
    s = DFRGridSimilarity("in", "l", "h3", c=800.0).scorer(1.0, cs, ts)
    prior = float(np.float32(800.0) * ((np.float32(30.0) + np.float32(1.0))
                                       / (np.float32(5000.0) + np.float32(1.0))))
    tfn = (tf + prior) / (dl + 800.0) * 800.0
    A = math.log2(101.0 / 10.5)
    want = np.float32(A * 1.0 * (1.0 - 1.0 / (1.0 + tfn)))
    assert s.score(np.array([3]), np.array([40]))[0] == want


def test_ib_spl_hand_checked():
    cs = CollectionStats(doc_count=100, sum_total_term_freq=5000)
    ts = TermStats(doc_freq=10, total_term_freq=30)
    s = IBGridSimilarity("spl", "ttf", "h2").scorer(1.0, cs, ts)
    lam = float(np.float32(31.0 / 101.0))
    dl = float(LENGTH_TABLE[40])
    tfn = 3.0 * math.log2(1.0 + 50.0 / dl)
    q = 1.0 - 1.0 / (tfn + 1.0)
    want = np.float32(-math.log((lam ** q - lam) / (1.0 - lam)))
    assert s.score(np.array([3]), np.array([40]))[0] == want


def test_axiomatic_variants_hand_checked():
    cs = CollectionStats(doc_count=100, sum_total_term_freq=5000)
    ts = TermStats(doc_freq=10, total_term_freq=30)
    dl = float(LENGTH_TABLE[40])
    avgdl = 50.0
    k = float(np.float32(0.35))
    tf_c = 1.0 + math.log(1.0 + math.log(4.0))
    ln_c = (avgdl + 0.25) / (avgdl + dl * 0.25)
    # F1EXP
    s = AxiomaticSimilarity("f1exp").scorer(1.0, cs, ts)
    want = np.float32(max(0.0, tf_c * ln_c * ((101.0 / 10.0) ** k) * 1.0))
    assert s.score(np.array([3]), np.array([40]))[0] == want
    # F2LOG
    s = AxiomaticSimilarity("f2log").scorer(1.0, cs, ts)
    want = np.float32(max(0.0, 3.0 / (3.0 + 0.25 + 0.25 * dl / avgdl)
                          * math.log(101.0 / 10.0) * 1.0))
    assert s.score(np.array([3]), np.array([40]))[0] == want
    # F3LOG (gamma term)
    s = AxiomaticSimilarity("f3log").scorer(1.0, cs, ts)
    want = np.float32(max(0.0, (tf_c * math.log(101.0 / 10.0)
                                - (dl - 1.0) * 0.25 * 1.0 / avgdl) * 1.0))
    assert s.score(np.array([3]), np.array([40]))[0] == want


def test_indri_hand_checked():
    cs = CollectionStats(doc_count=100, sum_total_term_freq=5000)
    ts = TermStats(doc_freq=10, total_term_freq=30)
    s = IndriDirichletSimilarity().scorer(1.0, cs, ts)
    dl = float(LENGTH_TABLE[40])
    want = np.float32(math.log((3.0 + 2000.0 * (30.0 / 5000.0))
                               / (dl + 2000.0)))
    assert s.score(np.array([3]), np.array([40]))[0] == want


def test_grid_param_validation():
    with pytest.raises(ValueError):
        DFRGridSimilarity("bogus")
    with pytest.raises(ValueError):
        DFRGridSimilarity("g", "x")
    with pytest.raises(ValueError):
        DFRGridSimilarity("g", "b", "h9")
    with pytest.raises(ValueError):
        IBGridSimilarity("nope")
    with pytest.raises(ValueError):
        IBGridSimilarity("ll", "nope")
    with pytest.raises(ValueError):
        AxiomaticSimilarity("f9")


def test_multi_similarity_sums_sub_scores():
    from lucene_ray.search.similarity import (
        BM25Similarity, MultiSimilarity, RawTFSimilarity)

    cs = CollectionStats(doc_count=100, sum_total_term_freq=5000)
    ts = TermStats(doc_freq=10, total_term_freq=30)
    multi = MultiSimilarity([RawTFSimilarity(), BM25Similarity()])
    s = multi.scorer(1.0, cs, ts)
    raw = RawTFSimilarity().scorer(1.0, cs, ts)
    bm = BM25Similarity().scorer(1.0, cs, ts)
    freqs = np.array([1, 3, 7])
    norms = np.array([40, 80, 120])
    want = (raw.score(freqs, norms).astype(np.float32)
            + bm.score(freqs, norms).astype(np.float32)).astype(np.float32)
    got = s.score(freqs, norms)
    assert got.dtype == np.float32
    assert np.array_equal(got, want)
    # max_score admissible: bound >= every achievable score
    assert s.max_score(7, 120) >= got[2]
    # boost distributes into the subs
    sb = multi.scorer(2.0, cs, ts)
    assert np.all(sb.score(freqs, norms) >= got)


def test_multi_similarity_empty_rejected():
    from lucene_ray.search.similarity import MultiSimilarity

    with pytest.raises(ValueError):
        MultiSimilarity([])


def test_per_field_similarity_dispatch():
    from lucene_ray.search.similarity import (
        BM25Similarity, PerFieldSimilarity, RawTFSimilarity)

    sim = PerFieldSimilarity(BM25Similarity(), {"head": RawTFSimilarity()})
    assert isinstance(sim.for_field("head"), RawTFSimilarity)
    assert isinstance(sim.for_field(None), BM25Similarity)
    assert isinstance(sim.for_field("other"), BM25Similarity)
    cs = CollectionStats(doc_count=100, sum_total_term_freq=5000)
    ts = TermStats(doc_freq=10, total_term_freq=30)
    s = sim.for_field("head").scorer(1.0, cs, ts)
    assert s.score(np.array([7]), np.array([40]))[0] == np.float32(7.0)
