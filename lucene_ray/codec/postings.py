"""Posting-list chunk codec + competitive impacts.

A posting list for one ``(segment, term)`` is stored as one or more *chunk
rows* (doc-ordinal chunks of ``chunk_size`` postings — the analog of Lucene's
level-1 skip granularity of 4,096 docs,
lucene/core/src/java/org/apache/lucene/codecs/lucene103/Lucene103PostingsFormat.java:348-353).
Each chunk row carries:

- ``docs_enc``  : delta + per-128-block FOR packed segment-local doc ids
- ``freqs_enc`` : per-128-block FOR packed term frequencies
- ``pos_enc``   : vbyte position deltas, concatenated doc-by-doc
  (per-doc counts = freqs, so no extra length stream)
- ``impact_freqs`` / ``impact_norms``: the competitive (freq, norm) skyline of
  the chunk (CompetitiveImpactAccumulator semantics,
  lucene/core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java:65)
  for block-max score upper bounds.

Disjoint doc ranges across chunk rows of the same term make the merged list
the plain concatenation in (min_doc) order — this is what lets hot terms be
encoded by independent (salted) groups.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_ray.codec.packing import (
    decode_blocks,
    delta_decode,
    delta_encode,
    encode_blocks,
    vbyte_decode,
    vbyte_encode,
)

CHUNK_SIZE = 4096  # postings per chunk row (level-1 skip granularity)


@dataclass
class PostingChunk:
    count: int
    min_doc: int
    max_doc: int
    docs_enc: bytes
    freqs_enc: bytes
    pos_enc: bytes  # b"" when positions not indexed
    impact_freqs: np.ndarray  # int32[]
    impact_norms: np.ndarray  # int32[] (unsigned byte values 0..255)


def competitive_impacts(freqs: np.ndarray, norms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Skyline of (freq, norm) pairs: drop pairs dominated by one with
    freq >= and norm <= (shorter doc, higher tf scores higher for any
    monotone similarity). Result sorted by norm asc with freq strictly
    increasing — the invariant Lucene asserts when writing impacts."""
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    if len(freqs) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    # max freq per distinct norm
    order = np.argsort(norms, kind="stable")
    ns, fs = norms[order], freqs[order]
    uniq_norms, start_idx = np.unique(ns, return_index=True)
    maxf = np.maximum.reduceat(fs, start_idx)
    # running max over increasing norm; keep entries where freq strictly
    # exceeds every smaller-norm freq
    runmax = np.maximum.accumulate(maxf)
    keep = np.ones(len(uniq_norms), dtype=bool)
    keep[1:] = maxf[1:] > runmax[:-1]
    return maxf[keep].astype(np.int32), uniq_norms[keep].astype(np.int32)


def encode_chunk(
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    norms: np.ndarray,
    positions: np.ndarray | None = None,
) -> PostingChunk:
    """Encode one chunk of postings (doc_ids strictly ascending).

    ``positions`` is the flattened position stream for the chunk's docs
    (per-doc counts = freqs); deltas are taken within each doc.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    freqs = np.asarray(freqs, dtype=np.uint64)
    if len(doc_ids) == 0:
        raise ValueError("empty chunk")
    if len(doc_ids) > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("docs out of order")  # Lucene103PostingsWriter.java:264-267
    docs_enc = encode_blocks(delta_encode(doc_ids))
    freqs_enc = encode_blocks(freqs)
    if positions is not None and len(positions):
        pos = np.asarray(positions, dtype=np.uint64)
        # per-doc delta: subtract previous position within the same doc
        deltas = pos.copy()
        ends = np.cumsum(freqs.astype(np.int64))
        starts = ends - freqs.astype(np.int64)
        deltas[1:] = pos[1:] - pos[:-1]
        deltas[starts] = pos[starts]
        pos_enc = vbyte_encode(deltas)
    else:
        pos_enc = b""
    imp_f, imp_n = competitive_impacts(freqs, norms)
    return PostingChunk(
        count=len(doc_ids),
        min_doc=int(doc_ids[0]),
        max_doc=int(doc_ids[-1]),
        docs_enc=docs_enc,
        freqs_enc=freqs_enc,
        pos_enc=pos_enc,
        impact_freqs=imp_f,
        impact_norms=imp_n,
    )


def decode_docs(docs_enc: bytes, count: int) -> np.ndarray:
    return delta_decode(decode_blocks(docs_enc, count))


def decode_freqs(freqs_enc: bytes, count: int) -> np.ndarray:
    return decode_blocks(freqs_enc, count)


def decode_positions(pos_enc: bytes, freqs: np.ndarray) -> np.ndarray:
    """Flattened absolute positions; per-doc counts = freqs."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum())
    deltas = vbyte_decode(pos_enc, total)
    if total == 0:
        return deltas
    # cumsum within doc boundaries: global cumsum minus the cumsum value at
    # each doc's start, plus the absolute first position of the doc — all
    # handled by resetting via subtracting offsets.
    ends = np.cumsum(freqs)
    starts = ends - freqs
    csum = np.cumsum(deltas, dtype=np.uint64)
    base = np.zeros(total, dtype=np.uint64)
    base[starts[1:]] = csum[starts[1:] - 1]
    base = np.maximum.accumulate(base)
    return csum - base


def decode_offsets(off_enc: bytes, freqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Flattened (start_chars, end_chars) per occurrence; per-doc counts =
    freqs. The stream interleaves (start_delta, length) vbyte pairs with the
    first start absolute per doc (IndexOptions offsets level)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum())
    vals = vbyte_decode(off_enc, 2 * total)
    if total == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    sd = vals[0::2]
    lens = vals[1::2]
    ends = np.cumsum(freqs)
    starts = ends - freqs
    csum = np.cumsum(sd, dtype=np.uint64)
    base = np.zeros(total, dtype=np.uint64)
    base[starts[1:]] = csum[starts[1:] - 1]
    base = np.maximum.accumulate(base)
    s = csum - base
    return s, s + lens


def decode_payloads(pay_enc: bytes, freqs: np.ndarray) -> np.ndarray:
    """Flattened per-occurrence integer payloads (absolute vbytes, one per
    occurrence; per-doc counts = freqs) — PostingsEnum.getPayload for the
    integer-payload case (DelimitedPayloadTokenFilter +
    PayloadScoreQuery's numeric decoder,
    queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    return vbyte_decode(pay_enc, int(freqs.sum()))


def split_positions(flat_positions: np.ndarray, freqs: np.ndarray, i: int) -> np.ndarray:
    """Positions of the i-th doc in a decoded chunk."""
    freqs = np.asarray(freqs, dtype=np.int64)
    ends = np.cumsum(freqs)
    starts = ends - freqs
    return flat_positions[starts[i] : ends[i]]
