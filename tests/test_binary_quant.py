"""Binary vector quantization (Lucene102 BQ shape: centroid sign bits +
oversampled exact rescore): pack/unpack kernel, scan-size win, recall, and
exact-rescore parity with the brute oracle at test scale."""
import numpy as np
import pytest

from lucene_ray.ops.ann import (BinaryQuantIndex, _POPCNT,
                                binary_quantize_rows, knn_brute)

SF = "/root/testdata/sf0.001"


def test_pack_kernel():
    mat = np.array([[1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 0.1, -0.1],
                    [-1.0, 1.0, -0.5, 0.5, -2.0, 2.0, -0.1, 0.1]])
    c = np.zeros(8)
    packed = binary_quantize_rows(mat, c)
    assert packed.shape == (2, 1)
    assert packed[0, 0] == 0b10101010
    assert packed[1, 0] == 0b01010101
    # Hamming via LUT: complementary rows differ in all 8 bits
    assert int(_POPCNT[np.bitwise_xor(packed[0], packed[1])].sum()) == 8


@pytest.fixture(scope="module")
def bq_index(ray_session, tmp_path_factory):
    import ray.data

    d = str(tmp_path_factory.mktemp("bq") / "idx")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    return BinaryQuantIndex.build(ds, d)


def test_recall_and_rescore_parity(ray_session, bq_index):
    import pyarrow.parquet as pq
    import ray.data

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.asarray(t.loc[t["vec_id"] == 0, "embedding"].iloc[0],
                   dtype=np.float64)[None, :]
    got = bq_index.search(q, k=10, oversample=5)
    brute = knn_brute(ray.data.read_parquet(f"{SF}/embeddings.parquet"),
                      q, k=10)
    g = got.column("vec_id").to_pylist()
    b = brute.column("vec_id").to_pylist()
    recall = len(set(g) & set(b)) / 10.0
    assert recall >= 0.8
    # rescore is exact on whatever candidates survive: the scores of shared
    # ids must match the brute cosines
    bs = dict(zip(b, brute.column("cosine").to_pylist()))
    for vid, cos in zip(g, got.column("cosine").to_pylist()):
        if vid in bs:
            assert abs(cos - bs[vid]) < 1e-9


def test_scan_size_win(ray_session, bq_index):
    bb, fb = bq_index.bq_scan_bytes()
    assert bb > 0 and fb > 0
    # packed bits are 1/64 the raw float64 payload; compressed parquet
    # keeps a wide margin
    assert bb * 8 < fb


def test_open_roundtrip(ray_session, bq_index):
    idx = BinaryQuantIndex.open(bq_index.index_dir)
    assert np.allclose(idx.centroid, bq_index.centroid)
    assert idx.id_col == "vec_id"


def test_empty_blocks_survive_build_and_search(ray_session, tmp_path):
    """A filter that leaves some (or all) blocks empty must not crash the
    build (step-0 arange) or the scan (k-th partition of an empty block)."""
    import ray.data

    d = str(tmp_path / "idx_empty")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    # filter inside map_batches so entire blocks come out empty
    def drop_most(b):
        import pyarrow.compute as pc
        return b.filter(pc.less(b.column("vec_id"), 8))
    sparse = ds.map_batches(drop_most, batch_format="pyarrow")
    idx = BinaryQuantIndex.build(sparse, d)
    q = np.ones((1, len(idx.centroid)), dtype=np.float64)
    out = idx.search(q, k=5)
    assert set(out.column("vec_id").to_pylist()) <= set(range(8))
    assert len(out) <= 5
