"""Product quantization: code compression, ADC correctness, recall vs brute.

Jegou, Douze & Schmid, TPAMI 2011 — M uint8 codes per vector, ADC lookup-
table scan, exact float rescore of the oversampled candidates.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from lucene_ray.ops.ann import _normalize
from lucene_ray.ops.pq import PqIndex


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((6, 32)) * 3
    m = np.concatenate(
        [centers[i] + rng.standard_normal((120, 32)) * 1.2 for i in range(6)]
    ).astype(np.float32)
    ids = np.arange(len(m), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    return tbl, m.astype(np.float64)


@pytest.fixture(scope="module")
def pq_index(ray_session, vectors, tmp_path_factory):
    tbl, _ = vectors
    d = tmp_path_factory.mktemp("pq")
    src = str(d / "emb.parquet")
    pq.write_table(tbl, src, row_group_size=100)
    idx_dir = str(d / "pqidx")
    idx = PqIndex.build(ray.data.read_parquet(src), idx_dir, m=8, k=256,
                        iters=3)
    return idx, src


def test_codes_are_m_bytes(pq_index, vectors):
    idx, _ = pq_index
    codes = pq.read_table(os.path.join(idx.index_dir, "codes"))
    tbl, m = vectors
    assert len(codes) == len(tbl)
    lens = {len(b) for b in codes.column("codes").to_pylist()}
    assert lens == {8}  # 32 floats (128 B) -> 8 bytes: 16x compression


def test_adc_approximates_cosine(pq_index, vectors):
    """ADC score = sum of codeword dots must track the true cosine: the
    mean absolute error stays well under the codebook quantization bound
    and ranks correlate strongly."""
    idx, _ = pq_index
    _, m = vectors
    q = m[7:8]
    lut = idx.adc_tables(q)[0]
    codes = pq.read_table(os.path.join(idx.index_dir, "codes"))
    ids = np.asarray(codes.column("vec_id"), dtype=np.int64)
    raw = b"".join(codes.column("codes").to_pylist())
    cm = np.frombuffer(raw, dtype=np.uint8).reshape(-1, idx.m)
    approx = lut[np.arange(idx.m)[None, :], cm].sum(axis=1)
    mn = _normalize(m)
    true = mn[ids] @ _normalize(q)[0]
    assert np.mean(np.abs(approx - true)) < 0.05
    # top-50 by approx captures most of the true top-10
    top_true = set(ids[np.argsort(-true)[:10]].tolist())
    top_approx = set(ids[np.argsort(-approx)[:50]].tolist())
    assert len(top_true & top_approx) >= 9


def test_pq_search_recall_vs_brute(pq_index, vectors):
    idx, src = pq_index
    _, m = vectors
    queries = m[:5]
    res = idx.search(queries, k=10, oversample=5, source_parquet=src)
    mn = _normalize(m)
    qn = _normalize(queries)
    hits = 0
    for qi in range(len(queries)):
        true = set(np.argsort(-(mn @ qn[qi]))[:10].tolist())
        got = set(
            np.asarray(res.filter(
                pa.compute.equal(res.column("query_id"), qi)
            ).column("vec_id")).tolist()
        )
        hits += len(true & got)
    assert hits / (10 * len(queries)) >= 0.9


def test_pq_rescore_gives_exact_cosines(pq_index, vectors):
    """Returned cosines must equal the true float cosines of the returned
    ids (the rescore contract), regardless of ADC approximation."""
    idx, src = pq_index
    _, m = vectors
    res = idx.search(m[3:4], k=10, oversample=5, source_parquet=src)
    mn = _normalize(m)
    qn = _normalize(m[3:4])[0]
    for vid, cos in zip(res.column("vec_id").to_pylist(),
                        res.column("cosine").to_pylist()):
        assert abs(cos - round(float(mn[vid] @ qn), 6)) < 1e-9


def test_pq_open_round_trip(pq_index, vectors):
    idx, src = pq_index
    _, m = vectors
    reopened = PqIndex.open(idx.index_dir)
    a = idx.search(m[11:12], k=5, source_parquet=src)
    b = reopened.search(m[11:12], k=5, source_parquet=src)
    assert a.equals(b)


@pytest.fixture(scope="module")
def ivfpq_index(ray_session, vectors, tmp_path_factory):
    from lucene_ray.ops.pq import IvfPqIndex

    tbl, _ = vectors
    d = tmp_path_factory.mktemp("ivfpq")
    src = str(d / "emb.parquet")
    pq.write_table(tbl, src, row_group_size=100)
    idx_dir = str(d / "idx")
    idx = IvfPqIndex.build(ray.data.read_parquet(src), idx_dir,
                           n_clusters=6, m=8, k=256, iters=3)
    return idx, src


def test_ivfpq_layout_copartitions_codes(ivfpq_index):
    idx, _ = ivfpq_index
    base = os.path.dirname(idx.pq.index_dir)
    ivf_buckets = sorted(os.listdir(os.path.join(base, "ivf")))
    code_buckets = sorted(os.listdir(os.path.join(base, "codes")))
    ivf_buckets = [b for b in ivf_buckets if b.startswith("bucket=")]
    assert code_buckets == ivf_buckets and len(code_buckets) >= 2


def test_ivfpq_probes_prune_code_read(ivfpq_index, vectors):
    idx, _ = ivfpq_index
    _, m = vectors
    paths = idx.ivf.probed_paths(m[:1], nprobe=2)
    buckets = {p.split("bucket=")[1].split(os.sep)[0] for p in paths}
    assert len(buckets) <= 2  # nprobe caps the directories touched


def test_ivfpq_recall_and_exact_rescore(ivfpq_index, vectors):
    from lucene_ray.ops.ann import _normalize

    idx, src = ivfpq_index
    _, m = vectors
    queries = m[:4]
    res = idx.search(queries, k=10, nprobe=4, oversample=5)
    mn = _normalize(m)
    qn = _normalize(queries)
    hits = 0
    for qi in range(len(queries)):
        true = set(np.argsort(-(mn @ qn[qi]))[:10].tolist())
        sub = res.filter(pa.compute.equal(res.column("query_id"), qi))
        got = set(np.asarray(sub.column("vec_id")).tolist())
        hits += len(true & got)
        # rescore contract: returned cosines are the exact float cosines
        for vid, cos in zip(sub.column("vec_id").to_pylist(),
                            sub.column("cosine").to_pylist()):
            assert abs(cos - round(float(mn[vid] @ qn[qi]), 6)) < 1e-9
    assert hits / 40 >= 0.9
