"""Dedup family: determinism, planted near-dups, and exact-vs-LSH parity.

The MinHash path must be byte-identical across runs and PYTHONHASHSEED
values (no process-salted hash() anywhere); LSH banding must find planted
near-duplicates; the embedding block-pair path must equal a brute-force
cosine cross-join; the hyperplane-LSH path must recover the exact pairs at
high thresholds.
"""

import hashlib
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops import dedup


def _doc_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


BASE = [
    "the quick brown fox jumps over the lazy dog and runs far away today",
    "import numpy as np def main(): return np.zeros(10) class Foo: pass",
    "hash join scan filter aggregate window sort limit distinct union",
    "completely unrelated text about databases and indexes and queries",
]
TEXTS = (
    BASE
    + [BASE[0]]  # exact dup of 0 -> id 4
    + [BASE[1].replace("zeros", "ones")]  # near dup of 1 -> id 5
    + ["xy"]  # short doc (< k tokens)
    + [""]  # empty doc
)


def test_minhash_finds_planted_near_dups(ray_session):
    ds = ray.data.from_arrow(_doc_table(TEXTS))
    pairs = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    got = {(a, b) for a, b in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist())}
    assert (0, 4) in got  # exact dup: signature agreement 1.0
    assert (1, 5) in got  # near dup
    ests = dict(zip(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()),
                    pairs["jaccard_est"].to_pylist()))
    assert ests[(0, 4)] == 1.0
    assert 0.5 <= ests[(1, 5)] <= 1.0
    # unrelated docs must not pair
    assert (2, 3) not in got and (0, 3) not in got


def test_minhash_signature_estimates_jaccard(ray_session):
    """Signature agreement between two known shingle sets approximates their
    true Jaccard (sanity that the (a*x+b) mod p family is unbiased enough)."""
    a = "a b c d e f g h i j k l m n o p q r s t"
    # share a long prefix
    b = "a b c d e f g h i j k l m n o p x y z w"
    ds = ray.data.from_arrow(_doc_table([a, b]))
    sigs = dedup.minhash_signatures(ds, num_perm=256).to_pandas()
    s0 = np.asarray(sigs["sig"][0], dtype=np.uint64)
    s1 = np.asarray(sigs["sig"][1], dtype=np.uint64)
    est = (s0 == s1).mean()

    def shingles(text, k=3):
        toks = text.split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = shingles(a), shingles(b)
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) < 0.15


def test_minhash_deterministic_across_pythonhashseed(ray_session, tmp_path):
    """Signatures and pairs must not depend on PYTHONHASHSEED — run the
    signature computation in two subprocesses with different seeds and
    compare byte-for-byte."""
    script = r"""
import sys
sys.path.insert(0, "/root/repo")
import hashlib
import numpy as np
import pyarrow as pa
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
import ray.data
from lucene_ray.ops import dedup
texts = %r
t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
              "text": pa.array(texts, pa.string())})
sigs = dedup.minhash_signatures(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
m = np.stack([np.asarray(s, dtype=np.uint64) for s in sigs["sig"]])
print(hashlib.md5(m.tobytes()).hexdigest())
ray.shutdown()
""" % (TEXTS,)
    digests = []
    for seed in ("1", "424242"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, check=True)
        digests.append(out.stdout.strip().splitlines()[-1])
    assert digests[0] == digests[1]


def test_simhash_pairs_identical_docs(ray_session):
    ds = ray.data.from_arrow(_doc_table(TEXTS))
    pairs = dedup.simhash_pairs(ds, max_hamming=3)
    got = dict(zip(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()),
                   pairs["hamming"].to_pylist()))
    assert got.get((0, 4)) == 0  # identical docs: hamming 0
    assert (0, 3) not in got


def test_simhash_signatures_deterministic(ray_session):
    ds = ray.data.from_arrow(_doc_table(TEXTS))
    a = dedup.simhash_signatures(ds).to_pandas().sort_values("doc_id")
    b = dedup.simhash_signatures(ds).to_pandas().sort_values("doc_id")
    assert list(a["simhash"]) == list(b["simhash"])


def _rand_vectors(n, dim, seed, planted_pairs=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(planted_pairs):
        # near-identical duplicate of row i at the end
        m[n - 1 - i] = m[i] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    }), m.astype(np.float64)


def _brute_pairs(m, ids, threshold):
    norms = np.maximum(np.linalg.norm(m, axis=1), 1e-300)
    sims = (m @ m.T) / np.outer(norms, norms)
    ii, jj = np.triu_indices(len(m), 1)
    keep = sims[ii, jj] >= threshold
    return sorted(zip(ids[ii[keep]].tolist(), ids[jj[keep]].tolist()))


def test_embedding_exact_equals_bruteforce(ray_session):
    tbl, m = _rand_vectors(300, 16, seed=3, planted_pairs=5)
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = dedup.embedding_near_dup(ds, threshold=0.6, method="exact")
    got = sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    exp = _brute_pairs(m, np.arange(300, dtype=np.int64), 0.6)
    assert got == exp
    # cosines agree with the direct formula after rounding
    norms = np.linalg.norm(m, axis=1)
    for a, b, c in zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                       out["cosine"].to_pylist()):
        ref = float(m[a] @ m[b] / (norms[a] * norms[b]))
        assert abs(c - round(ref, 6)) < 1e-9


def test_embedding_lsh_recovers_high_threshold_pairs(ray_session):
    tbl, m = _rand_vectors(300, 16, seed=5, planted_pairs=8)
    ds = ray.data.from_arrow(tbl).repartition(4)
    exact = dedup.embedding_near_dup(ds, threshold=0.95, method="exact")
    lsh = dedup.embedding_near_dup(ds, threshold=0.95, method="lsh")
    exact_pairs = set(zip(exact["id_a"].to_pylist(), exact["id_b"].to_pylist()))
    lsh_pairs = set(zip(lsh["id_a"].to_pylist(), lsh["id_b"].to_pylist()))
    assert len(exact_pairs) >= 8
    assert lsh_pairs <= exact_pairs  # no false positives (verified in-group)
    recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9


def test_embedding_empty_result(ray_session):
    tbl, _ = _rand_vectors(50, 8, seed=11)
    ds = ray.data.from_arrow(tbl)
    out = dedup.embedding_near_dup(ds, threshold=0.9999, method="exact")
    assert out.num_rows == 0
    assert out.column_names == ["id_a", "id_b", "cosine"]


def test_exact_dedup_keeps_min_id(ray_session):
    ds = ray.data.from_arrow(_doc_table(TEXTS))
    kept = sorted(dedup.exact_dedup(ds).to_pandas()["doc_id"])
    # id 4 is an exact dup of 0 -> dropped; everything else kept
    assert kept == [0, 1, 2, 3, 5, 6, 7]


def _py_shingle_set(text, k=3):
    toks = [t for t in __import__("re").split(r"[^a-z0-9_]+", text.lower()) if t]
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    # random near-dup corpus: mutated copies at varying edit rates
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(30):
        base = [vocab[int(x)] for x in rng.integers(0, 40, size=20)]
        texts.append(" ".join(base))
        mutated = list(base)
        for j in range(int(rng.integers(0, 6))):
            mutated[int(rng.integers(0, 20))] = vocab[int(rng.integers(0, 40))]
        texts.append(" ".join(mutated))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(4)
    for t in (0.3, 0.6):
        got = dedup.ngram_jaccard_pairs(ds, threshold=t).to_pandas()
        got_pairs = {
            (a, b): j
            for a, b, j in zip(got["id_a"], got["id_b"], got["jaccard"])
        }
        exp_pairs = {}
        sets = [_py_shingle_set(x) for x in texts]
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                u = sets[a] | sets[b]
                if not u:
                    continue
                j = len(sets[a] & sets[b]) / len(u)
                if j >= t:
                    exp_pairs[(a, b)] = j
        assert set(got_pairs) == set(exp_pairs), t
        for k in exp_pairs:
            assert abs(got_pairs[k] - exp_pairs[k]) < 1e-12, (k, t)


def test_ngram_jaccard_short_and_empty_docs(ray_session):
    texts = ["a b", "a b", "", "", "x y z w", "x y z w v"]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2, 3, 4, 5], "text": texts}))
    got = dedup.ngram_jaccard_pairs(ds, threshold=0.3).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (0, 1) in pairs  # short docs compare via whole-doc shingle
    assert not any(2 in p or 3 in p for p in pairs)  # empty docs pair with nothing
    assert (4, 5) in pairs  # 2 of 5 union shingles shared = 0.4 >= 0.3


def test_ngram_jaccard_skew_guard_chains_identical_cluster(ray_session):
    # 50 identical docs with max_bucket_docs=10: the guard must emit the
    # consecutive-id chain (connected component preserved), not O(B^2) pairs
    texts = ["same exact text repeated many times over and over"] * 50
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(50)), "text": texts}))
    got = dedup.ngram_jaccard_pairs(ds, threshold=0.9, max_bucket_docs=10).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert {(i, i + 1) for i in range(49)} <= pairs
    assert len(pairs) < 50 * 49 // 2


def test_substring_dup_stats_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_ray.ops.dedup import substring_dup_stats

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a quick brown fox ran away"),          # shares 'quick brown fox'
        (2, "totally unique words here friend"),
        (3, "the quick brown fox jumps again"),     # shares 4-gram prefix
        (4, "xy"),                                  # too short for k=3
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    })
    out = substring_dup_stats(ray.data.from_arrow(t).repartition(3), k=3)

    # brute force
    sh_by_doc = {}
    for did, text in docs:
        toks = text.split()
        sh_by_doc[did] = {" ".join(toks[i:i + 3])
                          for i in range(len(toks) - 2)}
    from collections import Counter

    counts = Counter(s for v in sh_by_doc.values() for s in v)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    for did, shs in sh_by_doc.items():
        if not shs:
            assert did not in got
            continue
        dup = sum(1 for s in shs if counts[s] >= 2)
        assert got[did]["n_unique_shingles"] == len(shs), did
        assert got[did]["n_dup_shingles"] == dup, did
        assert got[did]["dup_fraction"] == round(dup / len(shs), 6)
    assert any(r["n_dup_shingles"] > 0 for r in out.to_pylist())
    assert any(r["n_dup_shingles"] == 0 for r in out.to_pylist())
