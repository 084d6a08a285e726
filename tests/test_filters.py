"""Unit tests for the analysis-chain token filters (filters.py).

Covers the vocab-level chain semantics the contract oracles exercise
end-to-end: 1:1 rewrites (Porter, folding), same-position injection
(synonyms, edge n-grams), chaining order, manifest spec round-trips, and
the norms contract (injected tokens never count toward field length —
FieldInvertState.numOverlap / discountOverlaps).
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import (
    AnalyzerChain,
    AsciiFoldingFilter,
    EdgeNGramFilter,
    PorterStemFilter,
    SynonymFilter,
    apply_to_vocab,
    build_filters,
)
from lucene_ray.index.invert import invert_partition


def test_edge_ngram_strict_prefixes():
    f = EdgeNGramFilter(2, 5)
    assert f.synonyms("customer") == ("cu", "cus", "cust", "custo")
    # strict prefixes only: term of length max_gram emits up to len-1
    assert f.synonyms("custo") == ("cu", "cus", "cust")
    assert f.synonyms("ab") == ()          # no strict prefix >= min_gram
    assert f.synonyms("a") == ()
    assert f.map_term("customer") == "customer"  # 1:1 stage is identity


def test_edge_ngram_illegal_range():
    with pytest.raises(ValueError):
        EdgeNGramFilter(3, 2)
    with pytest.raises(ValueError):
        EdgeNGramFilter(0, 2)


def test_build_filters_round_trip():
    chain = (
        PorterStemFilter(),
        AsciiFoldingFilter(),
        SynonymFilter({"fast": ["quick"]}),
        EdgeNGramFilter(2, 6),
    )
    specs = tuple(f.spec for f in chain)
    rebuilt = build_filters(specs)
    assert tuple(f.spec for f in rebuilt) == specs
    assert rebuilt[3].synonyms("cats") == ("ca", "cat")


def test_chain_synonym_then_stem():
    # injected synonym still runs through the REMAINING map stages
    filters = (SynonymFilter({"fast": ["running"]}), PorterStemFilter())
    mapped, extra, _dropped = apply_to_vocab(filters, ["fast", "dogs"])
    assert mapped == ["fast", "dog"]
    assert extra[0] == ("run",)   # "running" stemmed by the later filter
    assert extra[1] == ()


def test_analyzer_chain_query_side_identity_for_injection():
    # query side applies only 1:1 maps: edge-ngram/synonym injection is an
    # index-time effect, so the analyzed query term is the normalized term
    chain = AnalyzerChain((("edge_ngram", {"min": 2, "max": 6}),))
    assert chain("Customer CUST") == ["customer", "cust"]
    stem = AnalyzerChain((("porter_stem",),))
    assert stem("Customers running") == ["custom", "run"]


def test_invert_with_edge_ngrams_norms_unchanged():
    docs = pa.array(["customer care", "cat"], pa.string())
    plain, lengths0, norms0 = invert_partition(docs)
    grams, lengths1, norms1 = invert_partition(
        docs, token_filters=build_filters((("edge_ngram", {"min": 2, "max": 5}),))
    )
    # field lengths / norms computed before injection — identical
    assert np.array_equal(lengths0, lengths1)
    assert np.array_equal(norms0, norms1)
    terms = set(grams.column("term").to_pylist())
    # original terms survive alongside their grams
    assert {"customer", "care", "cat"} <= terms
    assert {"cu", "cus", "cust", "custo", "ca", "car"} <= terms
    # "ca" injected for customer+care+cat: df counts both docs, same position
    i = grams.column("term").to_pylist().index("ca")
    assert grams.column("df")[i].as_py() == 2


def test_invert_edge_ngram_positions_match_source():
    docs = pa.array(["aaa bbb ccc"], pa.string())
    grams, _, _ = invert_partition(
        docs, token_filters=build_filters((("edge_ngram", {"min": 2, "max": 2}),))
    )
    by_term = {t: i for i, t in enumerate(grams.column("term").to_pylist())}
    # gram "bb" sits at the same position as "bbb" (position 1): its pos_enc
    # must equal the source term's
    assert (
        grams.column("pos_enc")[by_term["bb"]].as_py()
        == grams.column("pos_enc")[by_term["bbb"]].as_py()
    )


def test_stem_keep_original():
    """KeywordRepeatFilter + Porter + RemoveDuplicates chain: original AND
    stem indexed at the same position; identical forms not duplicated."""
    docs = pa.array(["running dogs run", "runs"], pa.string())
    t, lengths, norms = invert_partition(
        docs, token_filters=build_filters((("stem_keep_original",),))
    )
    terms = t.column("term").to_pylist()
    by = {tm: i for i, tm in enumerate(terms)}
    # originals survive
    assert {"running", "dogs", "runs"} <= set(terms)
    # stems injected: running->run, dogs->dog, runs->run
    assert "run" in by and "dog" in by
    # 'run' occurrences: doc0 original (pos 2) + doc0 stem of running (pos 0)
    # + doc1 stem of runs (pos 0) -> df counts both docs
    assert t.column("df")[by["run"]].as_py() == 2
    assert t.column("ttf")[by["run"]].as_py() == 3
    # stem sits at the SAME position as its source (pos-inc 0)
    assert t.column("pos_enc")[by["dog"]].as_py() == \
        t.column("pos_enc")[by["dogs"]].as_py()
    # field lengths unchanged by injection (numOverlap discount)
    plain, lengths0, _ = invert_partition(docs)
    assert np.array_equal(lengths, lengths0)
    # identical stem==original never double-counted: 'run' in doc0 appears
    # once as original; its stem equals itself and is not re-injected
    plain_terms = plain.column("term").to_pylist()
    i0 = plain_terms.index("run")
    assert plain.column("ttf")[i0].as_py() == 1


def test_keyword_marker_protects_stemming():
    from lucene_ray.analysis.filters import apply_to_vocab, build_filters

    filters = build_filters([("keyword_marker", ["running"]), ("porter_stem",)])
    mapped, extra, dropped = apply_to_vocab(filters, ["running", "jumping"])
    assert mapped == ["running", "jump"]  # protected term unstemmed
    assert not any(dropped)
    # marker also suppresses stem_keep_original injection
    filters2 = build_filters([("keyword_marker", ["running"]),
                              ("stem_keep_original",)])
    mapped2, extra2, _ = apply_to_vocab(filters2, ["running", "jumping"])
    assert mapped2 == ["running", "jumping"]
    assert extra2[0] == () and extra2[1] == ("jump",)


def test_length_filter_drops_and_holes(ray_session, tmp_path):
    import pyarrow as pa

    from lucene_ray.index.invert import invert_partition

    texts = pa.array(["aa bbbb cc dddd", "eee f"])
    partials, lengths, norms = invert_partition(
        texts, token_filters=__import__(
            "lucene_ray.analysis.filters", fromlist=["build_filters"]
        ).build_filters([("length", {"min": 3, "max": 10})]))
    terms = set(partials.column("term").to_pylist())
    assert terms == {"bbbb", "dddd", "eee"}
    # dropped tokens leave field length (norms recomputed)
    assert list(lengths) == [2, 1]
    # position holes kept: bbbb at pos 1, dddd at pos 3
    row = {t: i for i, t in enumerate(partials.column("term").to_pylist())}
    from lucene_ray.codec.postings import decode_positions

    i = row["dddd"]
    f = __import__("numpy").asarray(partials.column("freqs")[i].values)
    pos = decode_positions(partials.column("pos_enc")[i].as_py(), f)
    assert list(pos) == [3]


def test_length_filter_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    t = pa.table({
        "repo": ["r"] * 2, "path": ["a", "b"], "commit": ["x", "y"],
        "content": ["go going gone", "it is short"],
    })
    src = str(tmp_path / "c.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=10, partitions_per_segment=1,
        token_filters=(("length", {"min": 3, "max": 20}),)))
    s = Searcher(IndexReader(idx))
    assert s.search(TermQuery("go"), 5, total_hits_threshold=None).total_hits == 0
    assert s.search(TermQuery("it"), 5, total_hits_threshold=None).total_hits == 0
    assert s.search(TermQuery("going"), 5, total_hits_threshold=None).total_hits == 1
    assert s.search(TermQuery("short"), 5, total_hits_threshold=None).total_hits == 1


def test_stemmer_override():
    from lucene_ray.analysis.filters import apply_to_vocab, build_filters

    filters = build_filters([
        ("stemmer_override", {"running": "course", "mice": "mouse"}),
        ("porter_stem",),
    ])
    mapped, _extra, dropped = apply_to_vocab(
        filters, ["running", "mice", "jumping"])
    # overridden stems survive the later stemmer (keyword-marked); the
    # unlisted term stems normally
    assert mapped == ["course", "mouse", "jump"]
    assert not any(dropped)
    # query-side chain replays the override identically
    from lucene_ray.analysis.filters import AnalyzerChain

    chain = AnalyzerChain([
        ("stemmer_override", {"running": "course"}), ("porter_stem",)])
    assert chain("Running jumping") == ["course", "jump"]
