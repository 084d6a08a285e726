"""Curation ops: deterministic hash sampling + shingle decontamination."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.analysis.tokenizer import CodeTokenizer
from lucene_ray.ops.curate import (
    benchmark_shingles,
    decontaminate,
    fmix32,
    fmix32_sql,
    hex_threshold,
    sample_by_hash,
)


def _fmix32_scalar(k: int) -> int:
    """Independent pure-Python twin of the vectorized fmix32 kernel."""
    h = (k & 0xFFFFFFFF) ^ (k >> 32)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def test_fmix32_matches_scalar_twin_and_sql():
    keys = np.array([0, 1, 2, 7, 255, 2**31 - 1, 2**32, 2**40 + 12345,
                     2**62 + 999], dtype=np.int64)
    vec = fmix32(keys)
    for k, v in zip(keys.tolist(), vec.tolist()):
        assert v == _fmix32_scalar(k), k
    # DuckDB replays the mix bit-exactly (the oracle-side contract)
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {fmix32_sql('k')} FROM (SELECT unnest(?::BIGINT[]) AS k)",
        [keys.tolist()],
    ).fetchall()
    assert [g[0] for g in got] == vec.tolist()


def test_hex_threshold_rates():
    assert hex_threshold("2a") == 0x2A << 24
    assert hex_threshold("00") == 0
    assert hex_threshold("ff") == 0xFF << 24


def _ids(ds, col="doc_id"):
    out = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        out.extend(b.column(col).to_pylist())
    return sorted(out)


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    texts = [
        "alpha beta gamma delta",          # 0: shares "alpha beta gamma"
        "zeta eta theta",                  # 1: clean
        "one two",                         # 2: < k tokens -> never flagged
        "xx alpha beta gamma yy",          # 3: shares
        "beta gamma delta",                # 4: shares (suffix shingle of 0)
        "alpha gamma beta",                # 5: same tokens, different order
        "",                                # 6: empty
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)


def test_sample_by_hash_deterministic(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(2000), pa.int64()),
    })).repartition(4)
    got = _ids(sample_by_hash(ds, hex_lt="2a"))
    thr = hex_threshold("2a")
    want = [i for i in range(2000) if _fmix32_scalar(i) < thr]
    assert got == want
    # ~16.4% of 2000 with mix uniformity; loose band
    assert 200 < len(got) < 460
    # rerun is identical (no RNG anywhere)
    assert _ids(sample_by_hash(ds, hex_lt="2a")) == got


def test_benchmark_shingles_and_decontaminate(docs_ds, ray_session):
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["alpha beta gamma one two three"], pa.string()),
    }))
    sh = benchmark_shingles(bench, k=3)
    assert set(sh.to_pylist()) == {
        "alpha beta gamma", "beta gamma one", "gamma one two",
        "one two three",
    }
    dirty = _ids(decontaminate(docs_ds, sh, k=3, invert=True))
    assert dirty == [0, 3]  # doc 4's shingle "beta gamma delta" not in bench
    clean = _ids(decontaminate(docs_ds, sh, k=3))
    assert clean == [1, 2, 4, 5, 6]


def test_decontaminate_respects_tokenizer_grammar(docs_ds, ray_session):
    # shingles are built over the SHARED grammar: punctuation splits match
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["ALPHA, beta;gamma!"], pa.string()),
    }))
    sh = benchmark_shingles(bench, k=3)
    assert sh.to_pylist() == ["alpha beta gamma"]
    tok = CodeTokenizer()
    assert tok("ALPHA, beta;gamma!") == ["alpha", "beta", "gamma"]


def test_decontaminate_empty_benchmark(docs_ds, ray_session):
    sh = pa.array([], pa.string())
    assert _ids(decontaminate(docs_ds, sh)) == [0, 1, 2, 3, 4, 5, 6]
    assert _ids(decontaminate(docs_ds, sh, invert=True)) == []


def test_sample_stratified(ray_session):
    langs = ["en", "fr", "de", "it"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(4000), pa.int64()),
        "lang": pa.array([langs[i % 4] for i in range(4000)], pa.string()),
    })).repartition(4)
    rates = {"en": "80", "fr": "40", "de": "20"}
    from lucene_ray.ops.curate import sample_stratified

    rows = [
        (r["doc_id"], r["lang"])
        for b in sample_stratified(ds, rates).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    want = [
        (i, langs[i % 4]) for i in range(4000)
        if _fmix32_scalar(i) < hex_threshold(rates.get(langs[i % 4], "00"))
    ]
    assert sorted(rows) == want
    # 'it' fully dropped; rate ordering holds (en > fr > de)
    by_lang = {}
    for _, g in rows:
        by_lang[g] = by_lang.get(g, 0) + 1
    assert "it" not in by_lang
    assert by_lang["en"] > by_lang["fr"] > by_lang["de"] > 0


def test_select_token_budget(ray_session):
    import ray.data

    from lucene_ray.ops.curate import select_token_budget

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # quality (unique ratio): d1 = 1.0 (3/3), d2 = 0.5 (2/4),
        # d3 = 1.0 (2/2), d4 = 0.25 (1/4)
        "text": pa.array(["a b c", "d d e e", "f g", "h h h h"]),
    })
    ds = ray.data.from_arrow(t)
    # budget 4: best-first order is d1 (q=1.0), d3 (q=1.0, later id), d2, d4.
    # cum-before: d1=0 (<4 keep, 3 toks), d3=3 (<4 keep -> crosses budget),
    # d2=5 (>=4 drop)
    kept = select_token_budget(ds, 4)
    assert kept.column("doc_id").to_pylist() == [1, 3]
    assert kept.column("n_tokens").to_pylist() == [3, 2]
    # budget 1 keeps only the single best doc (straggler rule)
    kept1 = select_token_budget(ds, 1)
    assert kept1.column("doc_id").to_pylist() == [1]
    # huge budget keeps everything (empty docs excluded by construction)
    kept_all = select_token_budget(ds, 10**9)
    assert kept_all.column("doc_id").to_pylist() == [1, 2, 3, 4]


def test_unigram_lm_score_hand_checked(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from lucene_ray.ops.text import unigram_lm_score

    docs = [
        (0, "en", "the cat sat"),
        (1, "en", "the dog sat"),
        (2, "fr", "le chien"),        # OOV-heavy under the en model
        (3, "fr", "the cat"),         # in-vocab despite fr label
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "lang": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string()),
    })
    out = unigram_lm_score(ray.data.from_arrow(t).repartition(2))
    # reference counts over en docs: the:2 cat:1 sat:2 dog:1 -> total 6, V 4
    denom = 6 + 4
    lp = {"the": math.log(3 / denom), "cat": math.log(2 / denom),
          "sat": math.log(3 / denom), "dog": math.log(2 / denom)}
    oov = math.log(1 / denom)
    exp = {
        0: (lp["the"] + lp["cat"] + lp["sat"]) / 3,
        1: (lp["the"] + lp["dog"] + lp["sat"]) / 3,
        2: (oov + oov) / 2,
        3: (lp["the"] + lp["cat"]) / 2,
    }
    got = {r["doc_id"]: r["avg_logprob"] for r in out.to_pylist()}
    for did, e in exp.items():
        assert got[did] == round(e, 6), did
    # the OOV-heavy doc scores strictly worse than the in-vocab ones
    assert got[2] < min(got[0], got[1], got[3])


def test_token_budget_grouped(ray_session):
    import pyarrow as pa

    import ray.data

    from lucene_ray.ops.curate import select_token_budget_grouped

    rows = {
        "doc_id": list(range(8)),
        "lang": ["en", "en", "en", "de", "de", "fr", "en", "de"],
        # en docs: 0 high quality (all unique), 1 medium, 2 low, 6 high
        "text": [
            "a b c d",            # en q=1.0  4 tok
            "a a b c",            # en q=.75  4 tok
            "a a a a",            # en q=.25  4 tok
            "x y z",              # de q=1.0  3 tok
            "x x y",              # de q=.67  3 tok
            "m n",                # fr (no budget -> excluded)
            "p q r s",            # en q=1.0  4 tok
            "x x x",              # de q=.33  3 tok
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    t = select_token_budget_grouped(ds, {"en": 8, "de": 4}, "lang")
    got = {(r["doc_id"], r["grp"]) for r in t.to_pylist()}
    # en: q order 0,6 (tie doc_id), then 1, 2. before: 0:0<8, 6:4<8, 1:8 !<8
    # de: q order 3,4,7. before: 3:0<4, 4:3<4 (straggler kept), 7:6 !<4
    assert got == {(0, "en"), (6, "en"), (3, "de"), (4, "de")}


def test_contamination_scores(ray_session):
    import pyarrow as pa

    import ray.data

    from lucene_ray.ops.curate import contamination_scores

    bench = pa.array(["a b c", "b c d"])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "a b c d e",   # shingles: abc bcd cde -> 2/3 hit
            "x y z w",     # xyz yzw -> 0/2
            "a b",         # too short -> 0 shingles
        ],
    }))
    t = pa.concat_tables([
        r for r in (__import__("ray").get(x)
                    for x in contamination_scores(ds, bench).to_arrow_refs())
        if len(r)
    ]).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert rows[1]["n_shingles"] == 3 and rows[1]["n_hit"] == 2
    assert abs(rows[1]["frac"] - 2 / 3) < 1e-12
    assert rows[2]["n_hit"] == 0 and rows[2]["frac"] == 0.0
    assert rows[3]["n_shingles"] == 0 and rows[3]["frac"] == 0.0
