"""Unit tests for the compression kernels and the SmallFloat norm codec.

Mirrors the reference's TestForUtil/TestPForUtil/TestSmallFloat coverage
(lucene/core/src/test/org/apache/lucene/codecs/lucene103/,
lucene/core/src/test/org/apache/lucene/util/TestSmallFloat.java):
round-trip identity over branch-covering shapes (FIXTURES.md F5).
"""

import numpy as np
import pytest

from lucene_ray.codec.packing import (
    decode_blocks,
    delta_decode,
    delta_encode,
    encode_blocks,
    pack_bits,
    unpack_bits,
    vbyte_decode,
    vbyte_encode,
)
from lucene_ray.codec.postings import (
    competitive_impacts,
    decode_docs,
    decode_freqs,
    decode_positions,
    encode_chunk,
    split_positions,
)
from lucene_ray.codec.smallfloat import (
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_array,
    int4_to_long,
    long_to_int4,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 17, 31, 32, 40, 63])
def test_pack_bits_roundtrip(width):
    n = 257
    hi = 1 if width == 0 else (1 << width)
    vals = rng.integers(0, hi, size=n, dtype=np.uint64)
    buf = pack_bits(vals, width)
    out = unpack_bits(buf, n, width)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 4096, 4097, 100_000])
def test_encode_blocks_roundtrip(n):
    vals = rng.integers(0, 1 << 20, size=n, dtype=np.uint64)
    np.testing.assert_array_equal(decode_blocks(encode_blocks(vals), n), vals)


def test_encode_blocks_dense_consecutive():
    # all-deltas-1 case: width collapses to 1 bit
    vals = np.arange(1000, dtype=np.uint64)
    d = delta_encode(vals)
    buf = encode_blocks(d)
    assert len(buf) < 1000  # heavily compressed
    np.testing.assert_array_equal(delta_decode(decode_blocks(buf, 1000)), vals)


def test_delta_roundtrip():
    vals = np.unique(rng.integers(0, 1 << 40, size=5000, dtype=np.uint64))
    np.testing.assert_array_equal(delta_decode(delta_encode(vals)), vals)


@pytest.mark.parametrize(
    "vals",
    [
        [0],
        [1],
        [127],
        [128],
        [16383, 16384],
        [0, 1, 2**32 - 1, 2**53, 2**63],
        list(rng.integers(0, 1 << 28, size=10_000)),
    ],
)
def test_vbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(vbyte_decode(vbyte_encode(v), len(v)), v)


# --- SmallFloat port: verified against values computed from the Java
# reference algorithm (SmallFloat.java:103-165) ---


def test_long_to_int4_known():
    assert long_to_int4(0) == 0
    assert long_to_int4(7) == 7  # subnormal
    assert long_to_int4(8) == (1 << 3) | 0  # 8 = 1000b -> shift 1, bits 000
    assert int4_to_long(long_to_int4(8)) == 8
    for i in [0, 1, 7, 8, 15, 16, 100, 1000, 2**31 - 1]:
        dec = int4_to_long(long_to_int4(i))
        assert dec <= i
        # 4 significant bits: relative error < 1/8
        assert i - dec <= i // 8


def test_int_to_byte4_monotone_and_exact_low():
    prev = -1
    for i in range(0, 5000):
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        assert b >= prev  # order preserving
        prev = b
        assert byte4_to_int(b) <= i
    # exact for small values (NUM_FREE_VALUES window)
    from lucene_ray.codec.smallfloat import NUM_FREE_VALUES

    for i in range(NUM_FREE_VALUES):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_byte4_roundtrip_all_256():
    # decode->encode is identity on all 256 byte values
    for b in range(256):
        assert int_to_byte4(byte4_to_int(b)) == b


def test_int_to_byte4_array_matches_scalar():
    lengths = np.array([0, 1, 39, 40, 255, 1000, 70000, 10**9], dtype=np.int64)
    vec = int_to_byte4_array(lengths)
    for l, b in zip(lengths, vec):
        assert int_to_byte4(int(l)) == int(b)


# --- postings chunk codec ---


def _random_postings(n, max_doc_gap=50, max_freq=300):
    gaps = rng.integers(1, max_doc_gap, size=n, dtype=np.uint64)
    docs = np.cumsum(gaps)
    freqs = rng.integers(1, max_freq, size=n, dtype=np.uint64)
    norms = rng.integers(0, 256, size=n, dtype=np.int64)
    return docs, freqs, norms


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 4096, 4097, 20_000])
def test_chunk_roundtrip(n):
    docs, freqs, norms = _random_postings(n)
    positions = np.sort(rng.integers(0, 1000, size=int(freqs.sum()), dtype=np.uint64))
    # make positions ascending per doc: sort within doc windows
    ends = np.cumsum(freqs.astype(np.int64))
    starts = ends - freqs.astype(np.int64)
    for s, e in zip(starts, ends):
        positions[s:e] = np.sort(positions[s:e])
    ch = encode_chunk(docs, freqs, norms, positions)
    np.testing.assert_array_equal(decode_docs(ch.docs_enc, ch.count), docs)
    np.testing.assert_array_equal(decode_freqs(ch.freqs_enc, ch.count), freqs)
    got_pos = decode_positions(ch.pos_enc, freqs)
    np.testing.assert_array_equal(got_pos, positions)
    if n >= 2:
        np.testing.assert_array_equal(
            split_positions(got_pos, freqs, 1), positions[starts[1] : ends[1]]
        )


def test_chunk_rejects_out_of_order():
    with pytest.raises(ValueError, match="docs out of order"):
        encode_chunk(np.array([5, 3]), np.array([1, 1]), np.array([0, 0]))


def test_competitive_impacts_skyline():
    freqs = np.array([3, 1, 7, 7, 2, 5])
    norms = np.array([10, 5, 20, 30, 10, 10])
    f, n = competitive_impacts(freqs, norms)
    # invariant (CompetitiveImpactAccumulator.java:65 / writeImpacts assert):
    # strictly increasing freq AND norm
    assert (np.diff(f) > 0).all()
    assert (np.diff(n) > 0).all()
    # every original pair is dominated by some skyline pair
    for fo, no in zip(freqs, norms):
        assert any(fs >= fo and ns <= no for fs, ns in zip(f, n))


def test_competitive_impacts_single():
    f, n = competitive_impacts(np.array([4]), np.array([100]))
    assert list(f) == [4] and list(n) == [100]
