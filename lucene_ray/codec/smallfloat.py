"""Norm codec: behavioral port of Lucene's ``SmallFloat`` int4/byte4 scheme.

Reference semantics (lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-165):

- ``longToInt4(i)``: float-like encoding of a positive long keeping 4
  significant bits; values < 8 are "subnormal" (stored as-is), otherwise the
  top 4 bits are kept (leading 1 implicit) and the shift stored + 1.
- ``intToByte4(i)``: values below ``NUM_FREE_VALUES = 255 - longToInt4(2^31-1)``
  are exact; above, ``NUM_FREE_VALUES + longToInt4(i - NUM_FREE_VALUES)``.

The norm byte for a document is ``intToByte4(fieldLength)`` (with
discountOverlaps, length = numTerms - numOverlap; see
Similarity.computeNorm, lucene/core/src/java/org/apache/lucene/search/similarities/Similarity.java:152-161).
BM25's LENGTH_TABLE[i] = byte4ToInt(i) (BM25Similarity.java:111-117).
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # clear implicit leading 1
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - MAX_INT4


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte 0..255."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 back to the quantized int."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# 256-entry decode table, float32 — BM25Similarity.LENGTH_TABLE equivalent.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)

# Encode lookup for lengths: precompute up to a cap, fall back to scalar.
_ENCODE_CACHE_SIZE = 1 << 16
_ENCODE_CACHE = np.array(
    [int_to_byte4(i) for i in range(_ENCODE_CACHE_SIZE)], dtype=np.uint8
)


def int_to_byte4_array(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``intToByte4`` over an int array -> uint8 norms."""
    lengths = np.asarray(lengths)
    if lengths.size and lengths.min() < 0:
        raise ValueError("negative field length")
    if lengths.size == 0:
        return np.zeros(0, dtype=np.uint8)
    if lengths.max() < _ENCODE_CACHE_SIZE:
        return _ENCODE_CACHE[lengths]
    out = np.empty(lengths.shape, dtype=np.uint8)
    small = lengths < _ENCODE_CACHE_SIZE
    out[small] = _ENCODE_CACHE[lengths[small]]
    out[~small] = [int_to_byte4(int(v)) for v in lengths[~small]]
    return out
