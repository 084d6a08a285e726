"""int4 scalar quantization (Lucene99ScalarQuantizedVectorsFormat bits=4
compressed mode): pack/unpack kernel, confidence-interval bounds, recall vs
the brute oracle, exact-rescore parity, and the ~half-of-q8 scan-size win."""
import numpy as np
import pytest

from lucene_ray.ops.ann import (Int4Index, IvfIndex, int4_quantize_rows,
                                int4_unpack, knn_brute)

SF = "/root/testdata/sf0.001"


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(17, 9))  # odd dim exercises the pad nibble
    lo, hi = -1.5, 1.5
    packed = int4_quantize_rows(mat, lo, hi)
    assert packed.shape == (17, 5)
    got = int4_unpack(packed, 9)
    want = np.clip(np.round((np.clip(mat, lo, hi) - lo) * (15.0 / 3.0)),
                   0, 15).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    assert got.max() <= 15


def test_quantize_clamps_outliers():
    mat = np.array([[-100.0, 0.0, 100.0, 0.5]])
    packed = int4_quantize_rows(mat, -1.0, 1.0)
    q = int4_unpack(packed, 4)
    assert q[0, 0] == 0 and q[0, 2] == 15  # clamped to the fitted bounds


@pytest.fixture(scope="module")
def int4_index(ray_session, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("int4") / "idx")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    return Int4Index.build(ds, d)


def test_recall_and_rescore_parity(ray_session, int4_index):
    import pyarrow.parquet as pq
    import ray.data

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.stack([
        np.asarray(t.loc[t["vec_id"] == i, "embedding"].iloc[0],
                   dtype=np.float64)
        for i in (0, 7, 42)
    ])
    got = int4_index.search(q, k=10, oversample=3)
    brute = knn_brute(ray.data.read_parquet(f"{SF}/embeddings.parquet"),
                      q, k=10)
    gdf = got.to_pandas()
    bdf = brute.to_pandas()
    recalls = []
    for qi in range(3):
        g = set(gdf.loc[gdf["query_id"] == qi, "vec_id"])
        b = set(bdf.loc[bdf["query_id"] == qi, "vec_id"])
        recalls.append(len(g & b) / 10.0)
    assert np.mean(recalls) >= 0.9, recalls
    # exact rescore: shared ids carry the brute cosines (1e-9 tolerance —
    # the two sides take different BLAS matmul shapes, so the float64 dot
    # can differ in the last ulps)
    bs = {(r.query_id, r.vec_id): r.cosine for r in bdf.itertuples()}
    for r in gdf.itertuples():
        if (r.query_id, r.vec_id) in bs:
            assert abs(r.cosine - bs[(r.query_id, r.vec_id)]) < 1e-9


def test_q4_scan_half_of_q8(ray_session, int4_index, tmp_path):
    """The parquet-metadata assertion from the round-4 verdict: the int4
    candidate scan reads ~half the bytes of the int8 path's quantized
    columns on the same vectors."""
    import ray.data

    ivf = IvfIndex.build(ray.data.read_parquet(f"{SF}/embeddings.parquet"),
                         str(tmp_path / "ivf"), n_clusters=4, iters=2)
    q8_bytes, _ = ivf.quantized_scan_bytes()
    q4_bytes, f_bytes = int4_index.q4_scan_bytes()
    assert q4_bytes > 0 and q8_bytes > 0
    # q4 stores ceil(d/2) bytes/vector with global bounds; q8 stores d
    # bytes + 16 bytes of per-vector (min, scale) — expect <= ~0.62x
    assert q4_bytes <= 0.62 * q8_bytes, (q4_bytes, q8_bytes)
    # and q4 is ~1/8 of the float column (4 bits vs float32 per dim)
    assert q4_bytes < 0.25 * f_bytes, (q4_bytes, f_bytes)


def test_empty_blocks_survive(ray_session, tmp_path):
    import pyarrow.compute as pc

    import ray.data

    d = str(tmp_path / "idx_sparse")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")

    def drop_most(b):
        return b.filter(pc.less(b.column("vec_id"), 6))

    idx = Int4Index.build(ds.map_batches(drop_most, batch_format="pyarrow"),
                          d)
    q = np.ones((1, idx.dim), dtype=np.float64)
    out = idx.search(q, k=5)
    assert set(out.column("vec_id").to_pylist()) <= set(range(6))


def test_open_roundtrip(ray_session, int4_index):
    idx2 = Int4Index.open(int4_index.index_dir)
    assert idx2.lo == int4_index.lo and idx2.hi == int4_index.hi
    assert idx2.dim == int4_index.dim
