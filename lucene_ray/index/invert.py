"""Vectorized document inversion: Arrow string column -> partial postings.

This is the Ray-side analog of Lucene's indexing chain
(lucene/core/src/java/org/apache/lucene/index/IndexingChain.java:553,726,1195-1260:
analyzer loop -> TermsHashPerField postings hash), but expressed as Arrow/numpy
column kernels instead of a per-token Python loop:

1. ``pc.utf8_lower`` + ``pc.split_pattern_regex`` tokenize the whole column in
   Arrow C++ (the rare >255-char token is fixed up via the scalar tokenizer —
   the StandardTokenizer truncation path);
2. ``dictionary_encode`` interns terms (the ByteBlockPool analog);
3. one ``np.lexsort`` by (term, doc) + run-length boundaries produce, fully
   vectorized, the per-(term, doc) freqs, per-term doc lists, and the
   position-delta stream (first position absolute per doc, then gaps).

Output is a ``pyarrow.Table`` of *partial postings* — one row per term with
``doc_offsets`` (partition-local row offsets), ``freqs``, ``norms`` (the
per-doc norm byte repeated per posting, needed to compute impacts at merge
without a join), and a vbyte ``pos_enc`` stream — i.e. exactly what Lucene's
DWPT holds in RAM before flush (FreqProxTermsWriterPerField.java:113-167).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.tokenizer import DEFAULT_MAX_TOKEN_LENGTH, CodeTokenizer
from lucene_ray.codec.packing import vbyte_encode
from lucene_ray.codec.smallfloat import int_to_byte4_array

_SPLIT_PATTERN = "[^a-z0-9_]+"


def tokenize_column(
    contents: pa.ChunkedArray | pa.Array,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    stopwords: frozenset[str] | None = None,
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Tokenize a string column. Returns (flat_tokens, doc_idx, positions).

    ``positions`` are within-doc token positions, with stopword holes kept
    (FilteringTokenFilter semantics). Token order within a doc is preserved.
    """
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    n_docs = len(contents)
    lower = pc.utf8_lower(contents)
    tok_list = pc.split_pattern_regex(lower, _SPLIT_PATTERN)
    if isinstance(tok_list, pa.ChunkedArray):
        tok_list = tok_list.combine_chunks()
    flat = tok_list.flatten()
    offsets = np.asarray(tok_list.offsets)
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    # drop the empty strings split_pattern_regex leaves at boundaries
    vlen = np.asarray(pc.binary_length(flat))
    keep = vlen > 0
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        vlen = vlen[keep]

    # rare path: docs containing over-long tokens are re-tokenized with the
    # scalar tokenizer (which splits at max_token_length intervals)
    long_mask = vlen > max_token_length
    if long_mask.any():
        bad_docs = np.unique(doc_idx[long_mask])
        keep2 = ~np.isin(doc_idx, bad_docs)
        flat_good = flat.filter(pa.array(keep2))
        doc_good = doc_idx[keep2]
        tk = CodeTokenizer(max_token_length)
        extra_toks: list[str] = []
        extra_doc: list[int] = []
        for d in bad_docs:
            toks = tk(contents[int(d)].as_py())
            extra_toks.extend(toks)
            extra_doc.extend([int(d)] * len(toks))
        flat = pa.concat_arrays(
            [flat_good.combine_chunks() if isinstance(flat_good, pa.ChunkedArray) else flat_good,
             pa.array(extra_toks, type=flat.type)]
        )
        doc_idx = np.concatenate([doc_good, np.asarray(extra_doc, dtype=np.int64)])
        order = np.argsort(doc_idx, kind="stable")
        flat = flat.take(pa.array(order))
        doc_idx = doc_idx[order]

    # within-doc positions BEFORE stop removal (holes preserved)
    total = len(doc_idx)
    if total:
        starts = np.flatnonzero(np.diff(doc_idx, prepend=-1))
        positions = np.arange(total, dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, total)))
    else:
        positions = np.zeros(0, dtype=np.int64)

    if stopwords:
        stop_arr = pa.array(sorted(stopwords), type=pa.string())
        is_stop = np.asarray(pc.is_in(flat, value_set=stop_arr))
        keep3 = ~is_stop
        flat = flat.filter(pa.array(keep3))
        doc_idx = doc_idx[keep3]
        positions = positions[keep3]

    return flat, doc_idx, positions


def invert_partition(
    contents: pa.ChunkedArray | pa.Array,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    stopwords: frozenset[str] | None = None,
    with_positions: bool = True,
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Invert one partition of documents.

    Returns ``(partials, lengths, norms)``:

    - partials: pa.Table[term, df, ttf, doc_offsets list<uint32>,
      freqs list<uint32>, norms list<uint8>, pos_enc binary]
    - lengths: int64[n_docs] field lengths (surviving token counts)
    - norms: uint8[n_docs] norm bytes (SmallFloat intToByte4 of length)
    """
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    n_docs = len(contents)
    flat, doc_idx, positions = tokenize_column(contents, max_token_length, stopwords)

    lengths = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    norm_bytes = int_to_byte4_array(lengths)

    total = len(doc_idx)
    if total == 0:
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "ttf": pa.array([], pa.int64()),
                "doc_offsets": pa.array([], pa.list_(pa.uint32())),
                "freqs": pa.array([], pa.list_(pa.uint32())),
                "norms": pa.array([], pa.list_(pa.uint8())),
                "pos_enc": pa.array([], pa.binary()),
            }
        )
        return empty, lengths, norm_bytes

    dict_arr = flat.dictionary_encode()
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    tok_ids = np.asarray(dict_arr.indices, dtype=np.int64)
    vocab = dict_arr.dictionary

    order = np.lexsort((doc_idx, tok_ids))  # by term, then doc; stable -> positions ascending
    t_s = tok_ids[order]
    d_s = doc_idx[order]
    p_s = positions[order]

    # posting boundaries: change of (term, doc)
    chg = np.empty(total, dtype=bool)
    chg[0] = True
    chg[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
    p_starts = np.flatnonzero(chg)
    freqs = np.diff(np.append(p_starts, total)).astype(np.int64)
    post_doc = d_s[p_starts]
    post_tok = t_s[p_starts]

    # term boundaries over postings
    n_post = len(p_starts)
    tchg = np.empty(n_post, dtype=bool)
    tchg[0] = True
    tchg[1:] = post_tok[1:] != post_tok[:-1]
    t_starts = np.flatnonzero(tchg)
    df = np.diff(np.append(t_starts, n_post)).astype(np.int64)
    term_ids = post_tok[t_starts]
    ttf = np.add.reduceat(freqs, t_starts)

    term_offsets = np.append(t_starts, n_post).astype(np.int32)
    doc_offsets_arr = pa.ListArray.from_arrays(
        pa.array(term_offsets, pa.int32()), pa.array(post_doc.astype(np.uint32), pa.uint32())
    )
    freqs_arr = pa.ListArray.from_arrays(
        pa.array(term_offsets, pa.int32()), pa.array(freqs.astype(np.uint32), pa.uint32())
    )
    norms_arr = pa.ListArray.from_arrays(
        pa.array(term_offsets, pa.int32()),
        pa.array(norm_bytes[post_doc], pa.uint8()),
    )

    if with_positions:
        # position deltas: absolute at each posting start, gaps within
        deltas = p_s.astype(np.uint64)
        deltas[1:] = p_s[1:] - p_s[:-1]
        deltas[p_starts] = p_s[p_starts]
        stream = vbyte_encode(deltas)
        # byte length per value (re-derived; must match vbyte_encode)
        nbits = np.maximum(1, 64 - _clz(deltas))
        nbytes = ((nbits + 6) // 7).astype(np.int64)
        byte_ends = np.cumsum(nbytes)
        # byte offset at each term boundary (term t covers postings
        # [t_starts[t], t_starts[t+1]) -> token span via p_starts)
        tok_span_ends = np.append(p_starts, total)[1:]  # end token idx per posting
        term_tok_ends = tok_span_ends[np.append(t_starts[1:], n_post) - 1]
        term_byte_ends = byte_ends[term_tok_ends - 1]
        term_byte_offsets = np.concatenate([[0], term_byte_ends]).astype(np.int32)
        pos_arr = pa.BinaryArray.from_buffers(
            pa.binary(),
            len(term_ids),
            [None, pa.py_buffer(term_byte_offsets.tobytes()), pa.py_buffer(stream)],
        )
    else:
        pos_arr = pa.array([b""] * len(term_ids), pa.binary())

    partials = pa.table(
        {
            "term": vocab.take(pa.array(term_ids)),
            "df": pa.array(df, pa.int64()),
            "ttf": pa.array(ttf, pa.int64()),
            "doc_offsets": doc_offsets_arr,
            "freqs": freqs_arr,
            "norms": norms_arr,
            "pos_enc": pos_arr,
        }
    )
    return partials, lengths, norm_bytes


def _clz(v: np.ndarray) -> np.ndarray:
    from lucene_ray.codec.packing import _clz64

    return _clz64(v)
