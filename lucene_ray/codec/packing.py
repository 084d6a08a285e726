"""Integer compression kernels: FOR bit-packed blocks, vbyte, delta coding.

Behavioral analog of Lucene's postings block encoding
(lucene/core/src/java/org/apache/lucene/codecs/lucene103/Lucene103PostingsWriter.java:388-490:
128-int FOR delta blocks for docIDs, patched-FOR freqs, VInt tail). We keep
the same *shape* — fixed-size blocks, per-block bit width chosen from the max
delta, variable-byte for irregular streams — but define our own byte layout
(we never need to read Lucene's files, only to match its query results), and
implement everything as vectorized numpy so decode stays off the Python hot
path.

Layout of ``encode_blocks``: concatenation of per-block
``[1-byte width][ceil(block_len*width/8) packed bytes]``; the value count is
stored by the caller (a column in the postings row), not in the stream.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # postings per packed block, = ForUtil.BLOCK_SIZE

_U64 = np.uint64


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (each < 2**width) into a big-endian bitstream."""
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=">u8").view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(v, axis=1)[:, 64 - width :]
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(buf: bytes, n: int, width: int, offset_bits: int = 0) -> np.ndarray:
    """Inverse of :func:`pack_bits` -> uint64[n]."""
    if width == 0:
        return np.zeros(n, dtype=_U64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    nbits = offset_bits + n * width
    bits = np.unpackbits(raw, count=nbits)[offset_bits:]
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits.reshape(n, width)
    return np.packbits(full, axis=1).view(">u8").ravel().astype(_U64)


def encode_blocks(values: np.ndarray, block: int = BLOCK) -> bytes:
    """FOR-encode a uint array in fixed blocks, per-block bit width."""
    values = np.asarray(values, dtype=_U64)
    n = len(values)
    out = []
    for start in range(0, n, block):
        chunk = values[start : start + block]
        mx = int(chunk.max()) if len(chunk) else 0
        width = mx.bit_length()
        out.append(bytes([width]))
        out.append(pack_bits(chunk, width))
    return b"".join(out)


def decode_blocks(buf: bytes, n: int, block: int = BLOCK) -> np.ndarray:
    """Inverse of :func:`encode_blocks` -> uint64[n]."""
    out = np.empty(n, dtype=_U64)
    pos = 0
    start = 0
    mv = memoryview(buf)
    while start < n:
        cnt = min(block, n - start)
        width = mv[pos]
        pos += 1
        nbytes = (cnt * width + 7) // 8
        out[start : start + cnt] = unpack_bits(mv[pos : pos + nbytes], cnt, width)
        pos += nbytes
        start += cnt
    return out


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Ascending uint array -> gaps (first value kept absolute)."""
    v = np.asarray(sorted_values, dtype=_U64)
    if len(v) == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=_U64), dtype=_U64)


def vbyte_encode(values: np.ndarray) -> bytes:
    """Variable-byte (7 data bits, high bit = continuation) — vectorized."""
    v = np.asarray(values, dtype=_U64)
    if len(v) == 0:
        return b""
    nbytes = _vbyte_lengths(v)
    total = int(nbytes.sum())
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    # position of each output byte within its value
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    vals = np.repeat(v, nbytes)
    shifted = (vals >> (within.astype(_U64) * _U64(7))) & _U64(0x7F)
    out[:] = shifted.astype(np.uint8)
    # continuation bit on every byte except each value's last
    is_last = within == np.repeat(nbytes - 1, nbytes)
    out[~is_last] |= 0x80
    return out.tobytes()


def vbyte_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Inverse of :func:`vbyte_encode` -> uint64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=_U64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    total = len(raw)
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    vals7 = (raw & 0x7F).astype(_U64) << (within.astype(_U64) * _U64(7))
    out = np.add.reduceat(vals7, starts)
    if n is not None and len(out) != n:
        raise ValueError(f"expected {n} values, decoded {len(out)}")
    return out


def _vbyte_lengths(v: np.ndarray) -> np.ndarray:
    """Encoded byte count per value: 1 + one comparison per extra 7 bits.
    Values are typically tiny (position gaps), so the loop exits after one
    or two vectorized passes."""
    nbytes = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):  # 10 bytes max for 64 bits (7*9=63 < 64 <= 7*10)
        m = v >= (_U64(1) << _U64(7 * k))
        if not m.any():
            return nbytes
        nbytes[m] = k + 1
    return nbytes


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 values (vectorized, via float exponent
    for the common small range + correction)."""
    # bit_length = floor(log2(v)) + 1 for v > 0; use frexp on float64 which is
    # exact for v < 2**53, fall back per-element above that (rare: positions
    # and deltas are far below 2**53).
    v = np.asarray(v, dtype=_U64)
    small = v < _U64(1 << 53)
    res = np.empty(len(v), dtype=np.int64)
    fv = v[small].astype(np.float64)
    with np.errstate(divide="ignore"):
        bl = np.where(fv > 0, np.frexp(fv)[1], 0)
    res[small] = 64 - bl
    if not small.all():
        res[~small] = [64 - int(x).bit_length() for x in v[~small]]
    return res
