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

# 256-entry byte class table: 1 for [a-z0-9_] (token bytes). Non-ASCII UTF-8
# bytes are >= 0x80 and classify as separators — identical semantics to the
# regex tokenizer (non-ASCII chars never occur inside a token).
_TOKEN_BYTE = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyz0123456789_":
    _TOKEN_BYTE[_c] = True

# word_delimiter grammar byte classes — case is significant, so these are
# consulted on the ORIGINAL (pre-lowercase) bytes; '_' is a delimiter here
# (WordDelimiterIterator treats it as a subword separator), unlike the code
# grammar where it joins identifier runs
_WDF_TOKEN = np.zeros(256, dtype=bool)
_WDF_UPPER = np.zeros(256, dtype=bool)
_WDF_LOWER = np.zeros(256, dtype=bool)
_WDF_DIGIT = np.zeros(256, dtype=bool)
for _c in range(ord("A"), ord("Z") + 1):
    _WDF_TOKEN[_c] = _WDF_UPPER[_c] = True
for _c in range(ord("a"), ord("z") + 1):
    _WDF_TOKEN[_c] = _WDF_LOWER[_c] = True
for _c in range(ord("0"), ord("9") + 1):
    _WDF_TOKEN[_c] = _WDF_DIGIT[_c] = True


def tokenize_column(
    contents: pa.ChunkedArray | pa.Array,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    stopwords: frozenset[str] | None = None,
    with_offsets: bool = False,
    grammar: str = "code",
    dict_lexicon: tuple = (),
) -> tuple:
    """Tokenize a string column. Returns (flat_tokens, doc_idx, positions),
    plus (start_chars, end_chars) when ``with_offsets`` — per-token CHARACTER
    offsets within the lowercased document (the OffsetAttribute analog,
    IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS,
    lucene/core/src/java/org/apache/lucene/index/IndexOptions.java:44).

    Implementation: ``pc.utf8_lower`` (C++), then a numpy byte-class scan
    directly over the Arrow string data buffer — token runs are found by
    boolean transitions, doc boundaries force splits, and the token strings
    are gathered into a fresh Arrow string array with one fancy-index. No
    per-row Python, no regex engine in the hot path.

    ``positions`` are within-doc token positions, with stopword holes kept
    (FilteringTokenFilter semantics). Token order within a doc is preserved.
    """
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    if grammar == "uax29":
        return _tokenize_column_uax29(contents, max_token_length, stopwords,
                                      with_offsets)
    if grammar == "cjk_bigram":
        # uax29 + CJKBigramFilter (the CJKAnalyzer default chain)
        return _tokenize_column_uax29(contents, max_token_length, stopwords,
                                      with_offsets, cjk_bigrams=True)
    if grammar == "dict":
        return _tokenize_column_dict(contents, max_token_length, stopwords,
                                     with_offsets, dict_lexicon)
    if grammar == "word_delimiter":
        return _tokenize_column_wdf(contents, max_token_length, stopwords,
                                    with_offsets)
    if grammar.startswith("pattern:"):
        return _tokenize_column_pattern(contents, grammar[len("pattern:"):],
                                        max_token_length, stopwords,
                                        with_offsets)
    if grammar != "code":
        raise ValueError(f"unknown tokenizer grammar {grammar!r}")
    n_docs = len(contents)
    lower = pc.utf8_lower(contents)
    if isinstance(lower, pa.ChunkedArray):
        lower = lower.combine_chunks()
    # Arrow string layout: buffers = [validity, int32 offsets, data]
    bufs = lower.buffers()
    doc_offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(lower) + lower.offset + 1)[
        lower.offset :
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    base = doc_offsets[0]
    lo, hi = doc_offsets[0], doc_offsets[-1]

    is_tok = _TOKEN_BYTE[data[lo:hi]]
    nbytes = hi - lo
    if nbytes == 0:
        empty = pa.array([], pa.string())
        z = np.zeros(0, np.int64)
        return (empty, z, z, z, z) if with_offsets else (empty, z, z)

    prev = np.empty_like(is_tok)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    nxt = np.empty_like(is_tok)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    start_mask = is_tok & ~prev
    end_mask = is_tok & ~nxt
    # force token breaks at document boundaries
    dbs = doc_offsets[1:-1] - base
    db = dbs[(dbs > 0) & (dbs < nbytes)]
    if len(db):
        inner = db[is_tok[db] & is_tok[db - 1]]
        start_mask[inner] = True
        end_mask[inner - 1] = True
    starts = np.flatnonzero(start_mask).astype(np.int64)
    ends = np.flatnonzero(end_mask).astype(np.int64) + 1
    lengths = ends - starts

    # rare path: split over-long runs at max_token_length intervals
    if lengths.size and lengths.max() > max_token_length:
        long_idx = np.flatnonzero(lengths > max_token_length)
        new_s, new_e = [], []
        prev_end = 0
        for li in long_idx:
            new_s.append(starts[prev_end:li])
            new_e.append(ends[prev_end:li])
            cs = np.arange(starts[li], ends[li], max_token_length, dtype=np.int64)
            ce = np.minimum(cs + max_token_length, ends[li])
            new_s.append(cs)
            new_e.append(ce)
            prev_end = li + 1
        new_s.append(starts[prev_end:])
        new_e.append(ends[prev_end:])
        starts = np.concatenate(new_s)
        ends = np.concatenate(new_e)
        lengths = ends - starts

    total = len(starts)
    # doc of each token — int32 intermediates: the per-token arrays dominate
    # the inverter's memory traffic, and this host's memory path saturates
    # early, so narrower rows buy real parallel headroom
    doc_idx = (np.searchsorted(doc_offsets, starts + base, side="right") - 1).astype(np.int32)
    # concatenated token bytes == the data buffer with separator bytes
    # dropped — one boolean mask, no gather-index arrays (token order and
    # intra-token byte order are both preserved)
    tok_offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lengths, out=tok_offsets[1:])
    tok_data = data[lo:hi][is_tok]
    if len(tok_data) != tok_offsets[-1]:
        # over-long token splitting duplicates no bytes, so counts only
        # disagree if a run was chunked — rebuild by explicit slicing then
        raise AssertionError("token byte accounting mismatch")
    if tok_offsets[-1] < 2**31 - 1:
        flat = pa.Array.from_buffers(
            pa.string(),
            total,
            [None, pa.py_buffer(tok_offsets.astype(np.int32).tobytes()), pa.py_buffer(tok_data.tobytes())],
        )
    else:
        flat = pa.Array.from_buffers(
            pa.large_string(),
            total,
            [None, pa.py_buffer(tok_offsets.tobytes()), pa.py_buffer(tok_data.tobytes())],
        )

    # within-doc positions BEFORE stop removal (holes preserved)
    if total:
        counts = np.bincount(doc_idx, minlength=n_docs)
        doc_first = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=doc_first[1:])
        positions = (np.arange(total, dtype=np.int64) - doc_first[doc_idx]).astype(np.int32)
    else:
        positions = np.zeros(0, dtype=np.int32)

    if with_offsets:
        # char index = count of non-continuation UTF-8 bytes before the
        # byte; token bytes are ASCII so starts/ends land on char bounds
        nb_mask = (data[lo:hi] & 0xC0) != 0x80
        pref = np.zeros(nbytes + 1, dtype=np.int64)
        np.cumsum(nb_mask, out=pref[1:])
        doc_char_base = pref[doc_offsets - base]  # per doc
        start_chars = pref[starts] - doc_char_base[doc_idx]
        end_chars = pref[ends] - doc_char_base[doc_idx]

    if stopwords:
        stop_arr = pa.array(sorted(stopwords), type=pa.string())
        is_stop = np.asarray(pc.is_in(flat, value_set=stop_arr))
        keep3 = ~is_stop
        flat = flat.filter(pa.array(keep3))
        doc_idx = doc_idx[keep3]
        positions = positions[keep3]
        if with_offsets:
            start_chars = start_chars[keep3]
            end_chars = end_chars[keep3]

    if with_offsets:
        return flat, doc_idx, positions, start_chars, end_chars
    return flat, doc_idx, positions


def _tokenize_column_wdf(
    contents: pa.Array,
    max_token_length: int,
    stopwords: frozenset[str] | None,
    with_offsets: bool,
) -> tuple:
    """word_delimiter-grammar column tokenization.

    The index-time semantics of Lucene's ``WordDelimiterGraphFilter`` with
    its default flags (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS |
    SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE,
    lucene/analysis/common/src/java/org/apache/lucene/analysis/
    miscellaneous/WordDelimiterGraphFilter.java:64-120 and
    WordDelimiterIterator.java) after index-time graph flattening: every
    subword occupies its own position. Splits, applied to the ORIGINAL
    (case-preserving) bytes, then lowercased:

    - token bytes are ``[A-Za-z0-9]`` — any other byte (incl. ``_``) is a
      subword delimiter;
    - lower→Upper transition starts a new subword (``PowerShot``);
    - the LAST upper of an upper run followed by lower starts a new subword
      (``NASARover`` → ``NASA|Rover``);
    - letter↔digit transitions split (``mp3Player`` → ``mp|3|Player``);
    - a subword that is exactly ``s``/``S`` preceded by an apostrophe and
      followed by a non-token byte is dropped (English possessive:
      ``O'Neil's`` → ``o|neil``).

    Same vectorized shape as the code grammar: byte-class masks over the
    Arrow data buffer, no per-row Python.
    """
    n_docs = len(contents)
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    bufs = contents.buffers()
    empty = pa.array([], pa.string())
    z = np.zeros(0, np.int64)
    if n_docs == 0 or bufs[2] is None:
        return (empty, z, z, z, z) if with_offsets else (empty, z, z)
    doc_offsets = np.frombuffer(
        bufs[1], dtype=np.int32, count=len(contents) + contents.offset + 1
    )[contents.offset:].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    base = doc_offsets[0]
    lo, hi = doc_offsets[0], doc_offsets[-1]
    nbytes = hi - lo
    if nbytes == 0:
        return (empty, z, z, z, z) if with_offsets else (empty, z, z)
    b = data[lo:hi]

    is_tok = _WDF_TOKEN[b].copy()
    u, lw, dg = _WDF_UPPER[b], _WDF_LOWER[b], _WDF_DIGIT[b]
    letter = u | lw
    prev = np.empty_like(is_tok)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    nxt = np.empty_like(is_tok)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    pu = np.empty_like(u)
    pu[0] = False
    pu[1:] = u[:-1]
    pl = np.empty_like(lw)
    pl[0] = False
    pl[1:] = lw[:-1]
    pd = np.empty_like(dg)
    pd[0] = False
    pd[1:] = dg[:-1]
    nl = np.empty_like(lw)
    nl[-1] = False
    nl[:-1] = lw[1:]
    # docs are byte-adjacent in the Arrow buffer: the forward-looking
    # acronym rule must not see the first byte of the NEXT document
    dbs = doc_offsets[1:-1] - base
    db = dbs[(dbs > 0) & (dbs < nbytes)]
    if len(db):
        nl[db - 1] = False
    # interior split points: byte i starts a new subword
    split = (u & pl) | (u & pu & nl) | (dg & (pu | pl)) | (letter & pd)
    split &= is_tok & prev
    start_mask = (is_tok & ~prev) | split
    end_mask = is_tok & ~nxt
    end_mask[:-1] |= split[1:]
    # force token breaks at document boundaries
    if len(db):
        inner = db[is_tok[db] & is_tok[db - 1]]
        start_mask[inner] = True
        end_mask[inner - 1] = True
    starts = np.flatnonzero(start_mask).astype(np.int64)
    ends = np.flatnonzero(end_mask).astype(np.int64) + 1
    lengths = ends - starts

    # English possessive: drop the dangling s, clearing its byte from the
    # token mask so the concat-by-mask gather below stays exact
    if lengths.size:
        doc_of = np.searchsorted(doc_offsets, starts + base, side="right") - 1
        doc_lo = doc_offsets[doc_of] - base
        doc_hi = doc_offsets[doc_of + 1] - base
        poss = (lengths == 1) & ((b[starts] == 0x73) | (b[starts] == 0x53))
        m = poss & (starts > doc_lo)  # apostrophe must be in the SAME doc
        poss = np.zeros(len(starts), dtype=bool)
        poss[m] = b[starts[m] - 1] == 0x27
        follow_tok = np.zeros(len(starts), dtype=bool)
        m2 = ends < doc_hi  # a byte in the next doc never joins this word
        follow_tok[m2] = is_tok[ends[m2]]
        poss &= ~follow_tok
        if poss.any():
            is_tok[starts[poss]] = False
            keep = ~poss
            starts, ends, lengths = starts[keep], ends[keep], lengths[keep]

    # rare path: split over-long subwords at max_token_length intervals
    if lengths.size and lengths.max() > max_token_length:
        long_idx = np.flatnonzero(lengths > max_token_length)
        new_s, new_e = [], []
        prev_end = 0
        for li in long_idx:
            new_s.append(starts[prev_end:li])
            new_e.append(ends[prev_end:li])
            cs = np.arange(starts[li], ends[li], max_token_length, dtype=np.int64)
            ce = np.minimum(cs + max_token_length, ends[li])
            new_s.append(cs)
            new_e.append(ce)
            prev_end = li + 1
        new_s.append(starts[prev_end:])
        new_e.append(ends[prev_end:])
        starts = np.concatenate(new_s)
        ends = np.concatenate(new_e)
        lengths = ends - starts

    total = len(starts)
    if total == 0:
        return (empty, z, z, z, z) if with_offsets else (empty, z, z)
    doc_idx = (np.searchsorted(doc_offsets, starts + base, side="right") - 1).astype(np.int32)
    tok_offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lengths, out=tok_offsets[1:])
    tok_data = b[is_tok]
    if len(tok_data) != tok_offsets[-1]:
        raise AssertionError("token byte accounting mismatch")
    if tok_offsets[-1] < 2**31 - 1:
        flat = pa.Array.from_buffers(
            pa.string(), total,
            [None, pa.py_buffer(tok_offsets.astype(np.int32).tobytes()),
             pa.py_buffer(tok_data.tobytes())],
        )
    else:
        flat = pa.Array.from_buffers(
            pa.large_string(), total,
            [None, pa.py_buffer(tok_offsets.tobytes()),
             pa.py_buffer(tok_data.tobytes())],
        )
    flat = pc.utf8_lower(flat)  # LowerCaseFilter after the splits

    counts = np.bincount(doc_idx, minlength=n_docs)
    doc_first = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_first[1:])
    positions = (np.arange(total, dtype=np.int64) - doc_first[doc_idx]).astype(np.int32)

    if with_offsets:
        nb_mask = (b & 0xC0) != 0x80
        pref = np.zeros(nbytes + 1, dtype=np.int64)
        np.cumsum(nb_mask, out=pref[1:])
        doc_char_base = pref[doc_offsets - base]
        start_chars = pref[starts] - doc_char_base[doc_idx]
        end_chars = pref[ends] - doc_char_base[doc_idx]

    if stopwords:
        stop_arr = pa.array(sorted(stopwords), type=pa.string())
        is_stop = np.asarray(pc.is_in(flat, value_set=stop_arr))
        keep3 = ~is_stop
        flat = flat.filter(pa.array(keep3))
        doc_idx = doc_idx[keep3]
        positions = positions[keep3]
        if with_offsets:
            start_chars = start_chars[keep3]
            end_chars = end_chars[keep3]

    if with_offsets:
        return flat, doc_idx, positions, start_chars, end_chars
    return flat, doc_idx, positions


def _tokenize_column_pattern(
    contents: pa.Array,
    pattern: str,
    max_token_length: int,
    stopwords: frozenset[str] | None,
    with_offsets: bool,
) -> tuple:
    """pattern-grammar column tokenization (PatternTokenizer with group=-1 —
    lucene/analysis/common/src/java/org/apache/lucene/analysis/pattern/
    PatternTokenizer.java:40-56 in its "pattern MATCHES tokens" mode): each
    regex match of ``pattern`` over the lowercased text is one token;
    over-long matches truncate to ``max_token_length`` chars (offsets keep
    the truncated span). The grammar string serializes as
    ``"pattern:<regex>"`` in IndexConfig so build and query sides share it.
    Inherently a per-doc regex scan (the pattern engine IS the tokenizer);
    vectorization happens across docs via the Stage-A partition tasks."""
    import re as _re

    rx = _re.compile(pattern)
    toks: list[str] = []
    docs: list[int] = []
    poss: list[int] = []
    scs: list[int] = []
    ecs: list[int] = []
    lower = pc.utf8_lower(contents)
    if isinstance(lower, pa.ChunkedArray):
        lower = lower.combine_chunks()
    for i, s in enumerate(lower.to_pylist()):
        if not s:
            continue
        p = 0
        for m in rx.finditer(s):
            t = m.group(0)
            if not t:
                continue
            if len(t) > max_token_length:
                t = t[:max_token_length]
            if stopwords and t in stopwords:
                p += 1  # position hole (FilteringTokenFilter)
                continue
            toks.append(t)
            docs.append(i)
            poss.append(p)
            scs.append(m.start())
            ecs.append(m.start() + len(t))
            p += 1
    flat = pa.array(toks, pa.string())
    doc_idx = np.asarray(docs, dtype=np.int64)
    positions = np.asarray(poss, dtype=np.int64)
    if with_offsets:
        return (flat, doc_idx, positions,
                np.asarray(scs, dtype=np.int64), np.asarray(ecs, dtype=np.int64))
    return flat, doc_idx, positions


def _tokenize_column_dict(
    contents: pa.Array,
    max_token_length: int,
    stopwords: frozenset[str] | None,
    with_offsets: bool,
    dict_lexicon: tuple,
) -> tuple:
    """dict-grammar column tokenization: uax29 first, then merging of
    ideographic runs against the configured lexicon — Viterbi costed
    lattice for (word, cost) entries, greedy MaxMatch for plain words (the
    kuromoji/nori/smartcn dictionary-segmentation seam;
    analysis/tokenizer.py). Docs with no ideographs pass through the
    vectorized uax29/code kernels untouched; only CJK-bearing docs take
    the per-run Python merge (work bounded by the corpus's CJK token
    count)."""
    from lucene_ray.analysis.tokenizer import (
        CLS_IDEO,
        codepoint_class,
        merge_ideo_tokens,
        parse_dict_lexicon,
    )

    flat, doc_idx, positions, sc, ec = _tokenize_column_uax29(
        contents, max_token_length, None, True
    )
    n = len(flat)
    if n:
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        vocab = d.dictionary.to_pylist()
        v_ideo = np.array(
            [len(t) == 1 and codepoint_class(ord(t)) == CLS_IDEO for t in vocab],
            dtype=bool,
        )
        ideo = v_ideo[np.asarray(d.indices, dtype=np.int64)]
    else:
        ideo = np.zeros(0, dtype=bool)
    if ideo.any():
        lex, max_word, costs = parse_dict_lexicon(dict_lexicon)
        doc64 = np.asarray(doc_idx, dtype=np.int64)
        sc64 = np.asarray(sc, dtype=np.int64)
        ec64 = np.asarray(ec, dtype=np.int64)
        cjk_docs = np.unique(doc64[ideo])
        in_cjk = np.isin(doc64, cjk_docs)
        keep = ~in_cjk
        toks_all = flat.to_pylist()
        new_t: list[str] = []
        new_doc: list[int] = []
        new_s: list[int] = []
        new_e: list[int] = []
        idxs = np.flatnonzero(in_cjk)
        i = 0
        while i < len(idxs):
            j = i
            doc = doc64[idxs[i]]
            while j < len(idxs) and doc64[idxs[j]] == doc:
                j += 1
            sel = idxs[i:j]
            t, s, e = merge_ideo_tokens(
                [toks_all[k] for k in sel],
                [int(sc64[k]) for k in sel],
                [int(ec64[k]) for k in sel],
                lex, max_word, costs,
            )
            new_t.extend(t)
            new_doc.extend([int(doc)] * len(t))
            new_s.extend(s)
            new_e.extend(e)
            i = j
        flat = pa.concat_arrays([
            flat.filter(pa.array(keep)).cast(pa.string()),
            pa.array(new_t, pa.string()),
        ])
        doc_idx = np.concatenate([doc64[keep], np.asarray(new_doc, np.int64)])
        sc64 = np.concatenate([sc64[keep], np.asarray(new_s, np.int64)])
        ec64 = np.concatenate([ec64[keep], np.asarray(new_e, np.int64)])
        # restore (doc, char-start) global order, renumber positions per doc
        order = np.lexsort((sc64, doc_idx))
        flat = flat.take(pa.array(order, pa.int64()))
        doc_idx = doc_idx[order].astype(np.int32)
        sc, ec = sc64[order], ec64[order]
        n_docs = len(contents)
        counts = np.bincount(doc_idx, minlength=n_docs)
        doc_first = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=doc_first[1:])
        positions = (
            np.arange(len(doc_idx), dtype=np.int64) - doc_first[doc_idx]
        ).astype(np.int32)
    if stopwords:
        stop_arr = pa.array(sorted(stopwords), type=pa.string())
        is_stop = np.asarray(pc.is_in(flat, value_set=stop_arr))
        keep2 = ~is_stop
        flat = flat.filter(pa.array(keep2))
        doc_idx = np.asarray(doc_idx)[keep2]
        positions = np.asarray(positions)[keep2]
        sc = np.asarray(sc)[keep2]
        ec = np.asarray(ec)[keep2]
    if with_offsets:
        return flat, doc_idx, positions, sc, ec
    return flat, doc_idx, positions


def _tokenize_column_uax29(
    contents: pa.Array,
    max_token_length: int,
    stopwords: frozenset[str] | None,
    with_offsets: bool,
    cjk_bigrams: bool = False,
) -> tuple:
    """uax29-grammar column tokenization (UnicodeTokenizer semantics).

    Routing keeps the zero-copy byte-class scan HOT: docs whose bytes are
    pure ASCII (the normal case for code corpora) go through the existing
    kernel unchanged — on ASCII input the two grammars are token-for-token
    identical — and only docs containing non-ASCII bytes take the
    codepoint-class path (``analysis.tokenizer.tokenize_uax29``), whose
    Python work is bounded by the batch's unique-codepoint alphabet and its
    token count, not the corpus size. One stable argsort by doc restores
    the (doc, position) global order the single-sort inverter relies on.
    """
    from lucene_ray.analysis.tokenizer import tokenize_uax29

    n_docs = len(contents)
    lower = pc.utf8_lower(contents)
    if isinstance(lower, pa.ChunkedArray):
        lower = lower.combine_chunks()
    if n_docs == 0 or len(lower) == 0:
        empty = pa.array([], pa.string())
        z = np.zeros(0, np.int64)
        return (empty, z, z, z, z) if with_offsets else (empty, z, z)
    bufs = lower.buffers()
    doc_offsets = np.frombuffer(
        bufs[1], dtype=np.int32, count=len(lower) + lower.offset + 1
    )[lower.offset:].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    base = doc_offsets[0]
    lo, hi = doc_offsets[0], doc_offsets[-1]
    if hi - lo == 0:
        empty = pa.array([], pa.string())
        z = np.zeros(0, np.int64)
        return (empty, z, z, z, z) if with_offsets else (empty, z, z)
    seg = data[lo:hi]
    non_ascii = seg >= 0x80
    # ASCII docs that may carry a UAX#29 Mid* joiner (alnum JOINER alnum,
    # bytes ' , . : ;) must ALSO take the codepoint path — the pinned code
    # grammar splits them. Byte-level candidate test is a superset (the
    # exact anchor rules run inside tokenize_uax29); a cross-doc-boundary
    # false positive only routes one extra doc, never changes tokens.
    joiner = (np.isin(seg, np.frombuffer(b"',.:;", dtype=np.uint8))
              if len(seg) else np.zeros(0, bool))
    alnum = (((seg >= 0x61) & (seg <= 0x7A))
             | ((seg >= 0x30) & (seg <= 0x39)))
    cand = np.zeros(len(seg), dtype=bool)
    if len(seg) > 2:
        cand[1:-1] = joiner[1:-1] & alnum[:-2] & alnum[2:]
    route = non_ascii | cand
    pref = np.zeros(hi - lo + 1, dtype=np.int64)
    np.cumsum(route, out=pref[1:])
    has_uni = (pref[doc_offsets[1:] - base] - pref[doc_offsets[:-1] - base]) > 0
    if not has_uni.any():
        return tokenize_column(contents, max_token_length, stopwords,
                               with_offsets, grammar="code")

    ascii_idx = np.flatnonzero(~has_uni)
    uni_idx = np.flatnonzero(has_uni)
    flats, docs, poss, scs, ecs = [], [], [], [], []
    if len(ascii_idx):
        sub = contents.take(pa.array(ascii_idx, pa.int64()))
        out = tokenize_column(sub, max_token_length, None, with_offsets,
                              grammar="code")
        flats.append(out[0])
        docs.append(ascii_idx[np.asarray(out[1], dtype=np.int64)])
        poss.append(np.asarray(out[2], dtype=np.int64))
        if with_offsets:
            scs.append(out[3])
            ecs.append(out[4])
    texts = lower.take(pa.array(uni_idx, pa.int64())).to_pylist()
    toks, d_u, p_u, sc_u, ec_u = tokenize_uax29(texts, max_token_length,
                                                cjk_bigrams)
    flats.append(pa.array(toks, pa.string()))
    docs.append(uni_idx[d_u])
    poss.append(p_u)
    if with_offsets:
        scs.append(sc_u)
        ecs.append(ec_u)

    if any(f.type == pa.large_string() for f in flats):
        flats = [f.cast(pa.large_string()) for f in flats]
    flats = [
        f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f
        for f in flats
    ]
    flat = pa.concat_arrays(flats)
    doc_idx = np.concatenate(docs)
    positions = np.concatenate(poss)
    # per-part streams are (doc, position)-ordered and every doc lives in
    # exactly one part, so a stable doc sort restores the global invariant
    order = np.argsort(doc_idx, kind="stable")
    flat = flat.take(pa.array(order, pa.int64()))
    doc_idx = doc_idx[order].astype(np.int32)
    positions = positions[order].astype(np.int32)
    if with_offsets:
        start_chars = np.concatenate(scs)[order]
        end_chars = np.concatenate(ecs)[order]

    if stopwords:
        stop_arr = pa.array(sorted(stopwords), type=pa.string())
        is_stop = np.asarray(pc.is_in(flat, value_set=stop_arr))
        keep = ~is_stop
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        positions = positions[keep]
        if with_offsets:
            start_chars = start_chars[keep]
            end_chars = end_chars[keep]

    if with_offsets:
        return flat, doc_idx, positions, start_chars, end_chars
    return flat, doc_idx, positions


def _apply_token_filters(filters, tok_ids, vocab, doc_idx, positions,
                         start_chars=None, end_chars=None):
    """Run an analysis chain over the partition's interned token stream.

    1:1 rewrites (stemming, folding) are applied to the VOCAB only —
    O(|vocab|) Python — then occurrences are remapped by integer id.
    Synonym injections duplicate the source token's occurrence arrays at
    the SAME positions/offsets (position-increment-0 tokens,
    SynonymGraphFilter semantics); callers compute field lengths BEFORE
    this hook, so injected tokens never count toward norms
    (FieldInvertState.numOverlap / discountOverlaps).

    Returns (tok_ids, vocab, doc_idx, positions, start_chars, end_chars)
    with the (doc, position) ordering invariant restored."""
    from lucene_ray.analysis.filters import apply_to_vocab

    vocab_py = vocab.to_pylist()
    mapped, extra, dropped = apply_to_vocab(filters, vocab_py)
    drop_counts = None
    if any(dropped):
        # FilteringTokenFilter stage (LengthFilter): remove the dropped
        # vocab entries' occurrences, keep position holes, and report
        # per-doc removal counts so the caller subtracts them from field
        # lengths (dropped tokens are outside norms, as in Lucene)
        drop_arr = np.array(dropped, dtype=bool)
        keep_occ = ~drop_arr[tok_ids]
        if not keep_occ.all():
            drop_counts = np.bincount(doc_idx[~keep_occ])
            tok_ids = tok_ids[keep_occ]
            doc_idx = doc_idx[keep_occ]
            positions = positions[keep_occ]
            if start_chars is not None:
                start_chars = start_chars[keep_occ]
                end_chars = end_chars[keep_occ]
    # never inject a duplicate of the token itself (would double-count tf)
    extra = [
        tuple(dict.fromkeys(s for s in ex if s != mapped[i]))
        for i, ex in enumerate(extra)
    ]
    all_strings = list(mapped)
    for ex in extra:
        all_strings.extend(ex)
    uniq = sorted(set(all_strings))
    new_id = {t: i for i, t in enumerate(uniq)}
    remap = np.array([new_id[t] for t in mapped], dtype=np.int32)
    tok_ids = remap[tok_ids]

    inj = [i for i, ex in enumerate(extra) if ex]
    if inj:
        id_parts, doc_parts, pos_parts = [tok_ids], [doc_idx], [positions]
        sc_parts = [start_chars] if start_chars is not None else None
        ec_parts = [end_chars] if end_chars is not None else None
        # pre-filter ids so each source vocab entry scans the stream once
        for i in inj:
            sel = np.flatnonzero(tok_ids == remap[i]) if extra[i] else None
            for s in extra[i]:
                id_parts.append(np.full(len(sel), new_id[s], dtype=np.int32))
                doc_parts.append(doc_idx[sel])
                pos_parts.append(positions[sel])
                if sc_parts is not None:
                    sc_parts.append(start_chars[sel])
                    ec_parts.append(end_chars[sel])
        tok_ids = np.concatenate(id_parts)
        doc_idx = np.concatenate(doc_parts)
        positions = np.concatenate(pos_parts)
        if sc_parts is not None:
            start_chars = np.concatenate(sc_parts)
            end_chars = np.concatenate(ec_parts)
        # restore the (doc, position) ordering the single-stable-sort
        # inversion relies on (lexsort is stable for equal keys)
        order = np.lexsort((positions, doc_idx))
        tok_ids = tok_ids[order]
        doc_idx = doc_idx[order]
        positions = positions[order]
        if sc_parts is not None:
            start_chars = start_chars[order]
            end_chars = end_chars[order]

    vocab = pa.array(uniq, pa.string())
    return tok_ids, vocab, doc_idx, positions, start_chars, end_chars, drop_counts


def _inject_phrase_synonyms(tok_ids, vocab, doc_idx, positions, start_chars,
                            end_chars, rules):
    """Multi-word synonym injection — the index-time SynonymGraphFilter +
    FlattenGraphFilter chain (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/synonym/SynonymGraphFilter.java:58: "when used during
    indexing, it's necessary to ... use FlattenGraphFilter"). A rule
    (src_tokens, dst_token) matches every occurrence of the src tokens at
    consecutive positions within a doc and injects dst at the FIRST token's
    position (posInc 0 — outside field length/norms: callers compute
    lengths before injection), offsets spanning first-token start ..
    last-token end, exactly the flattened single-position synonym Lucene
    indexes for a contraction rule ("new york => ny").

    Rules are matched on the ANALYZED stream (this runs after the filter
    chain), mirroring SynonymMap.Builder's analyze() of rule text. Only
    single-token outputs are supported — a flattened multi-token output
    collapses positions and silently breaks phrase queries, so we reject it
    rather than mis-index (documented divergence; Lucene emits it with the
    same caveat).

    Vectorized: one shifted-array mask per rule over the (doc, pos) arrays;
    the combined stream re-interns with one dictionary_encode."""
    n_tok = len(tok_ids)
    vocab_py = vocab.to_pylist()
    vid = {t: i for i, t in enumerate(vocab_py)}
    stream = None
    str_parts: list = []
    doc_parts = [doc_idx]
    pos_parts = [positions]
    sc_parts = [start_chars] if start_chars is not None else None
    ec_parts = [end_chars] if end_chars is not None else None
    for rule in rules:
        src, dst = rule[0], rule[1]
        src = [src] if isinstance(src, str) else list(src)
        if not isinstance(dst, str):
            if len(dst) != 1:
                raise ValueError(
                    f"phrase synonym output must be a single token: {dst!r}")
            dst = dst[0]
        k = len(src)
        ids = [vid.get(t) for t in src]
        if any(i is None for i in ids) or n_tok < k:
            continue  # a src token absent from this partition: no matches
        head = np.arange(0, n_tok - k + 1)
        ok = tok_ids[head] == ids[0]
        for j in range(1, k):
            ok &= tok_ids[head + j] == ids[j]
        if k > 1:
            ok &= (doc_idx[head + k - 1] == doc_idx[head]) & (
                positions[head + k - 1] == positions[head] + (k - 1)
            )
        sel = head[ok]
        if len(sel) == 0:
            continue
        if stream is None:
            stream = pc.take(vocab, pa.array(tok_ids, pa.int32()))
            if isinstance(stream, pa.ChunkedArray):
                stream = stream.combine_chunks()
            str_parts.append(stream)
        str_parts.append(pa.array([dst] * len(sel), pa.string()))
        doc_parts.append(doc_idx[sel])
        pos_parts.append(positions[sel])
        if sc_parts is not None:
            sc_parts.append(start_chars[sel])
            ec_parts.append(end_chars[sel + k - 1])
    if stream is None:  # no rule matched anywhere
        return tok_ids, vocab, doc_idx, positions, start_chars, end_chars
    all_str = pa.concat_arrays([p.cast(pa.string()) for p in str_parts])
    d = all_str.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    tok_ids = np.asarray(d.indices, dtype=np.int32)
    vocab = d.dictionary
    doc_idx = np.concatenate(doc_parts)
    positions = np.concatenate(pos_parts)
    if sc_parts is not None:
        start_chars = np.concatenate(sc_parts)
        end_chars = np.concatenate(ec_parts)
    order = np.lexsort((positions, doc_idx))
    tok_ids = tok_ids[order]
    doc_idx = doc_idx[order]
    positions = positions[order]
    if sc_parts is not None:
        start_chars = start_chars[order]
        end_chars = end_chars[order]
    return tok_ids, vocab, doc_idx, positions, start_chars, end_chars


def _inject_common_grams(tok_ids, vocab, doc_idx, positions, start_chars,
                         end_chars, common_words):
    """CommonGramsFilter analog (lucene/analysis/common/src/java/org/
    apache/lucene/analysis/commongrams/CommonGramsFilter.java:43): for each
    adjacent token pair where EITHER side is a common word, inject the
    bigram joined with '_' at the first token's position (posInc 0 beside
    the kept unigrams — the gram-plus-unigram stream the Java emits).
    Phrase-with-stopword queries then run as one cheap term lookup
    ("the_quick") instead of a positional scan over a huge posting list.

    Vectorized like _inject_shingles: one adjacency + membership mask, one
    binary_join, one re-intern."""
    n_tok = len(tok_ids)
    if n_tok < 2:
        return tok_ids, vocab, doc_idx, positions, start_chars, end_chars
    common = pa.array(sorted(set(common_words)), pa.string())
    is_common = np.asarray(pc.is_in(vocab, value_set=common))
    head = np.arange(0, n_tok - 1)
    ok = (doc_idx[head + 1] == doc_idx[head]) & (
        positions[head + 1] == positions[head] + 1
    ) & (is_common[tok_ids[head]] | is_common[tok_ids[head + 1]])
    sel = head[ok]
    if len(sel) == 0:
        return tok_ids, vocab, doc_idx, positions, start_chars, end_chars
    stream = pc.take(vocab, pa.array(tok_ids, pa.int32()))
    if isinstance(stream, pa.ChunkedArray):
        stream = stream.combine_chunks()
    grams = pc.binary_join_element_wise(
        stream.take(pa.array(sel, pa.int64())),
        stream.take(pa.array(sel + 1, pa.int64())),
        pa.scalar("_"))
    all_str = pa.concat_arrays([stream.cast(pa.string()),
                                grams.cast(pa.string())])
    d = all_str.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    tok_ids = np.asarray(d.indices, dtype=np.int32)
    vocab = d.dictionary
    doc_idx = np.concatenate([doc_idx, doc_idx[sel]])
    positions = np.concatenate([positions, positions[sel]])
    if start_chars is not None:
        start_chars = np.concatenate([start_chars, start_chars[sel]])
        end_chars = np.concatenate([end_chars, end_chars[sel + 1]])
    order = np.lexsort((positions, doc_idx))
    tok_ids = tok_ids[order]
    doc_idx = doc_idx[order]
    positions = positions[order]
    if start_chars is not None:
        start_chars = start_chars[order]
        end_chars = end_chars[order]
    return tok_ids, vocab, doc_idx, positions, start_chars, end_chars


def _inject_shingles(tok_ids, vocab, doc_idx, positions, start_chars,
                     end_chars, sizes):
    """ShingleFilter analog (analysis/shingle/ShingleFilter.java:66-101):
    word n-grams joined with ' ' injected beside the unigrams, each emitted
    at its FIRST token's position (the overlap-token shape — posInc 0 for
    the continuation, so shingles never count toward field length: callers
    compute lengths before injection, the discountOverlaps analog). Offsets
    span first-token start .. last-token end. Divergences (documented):
    no '_' filler tokens — shingles do not span stopword position holes —
    and adjacency is evaluated on the emitted stream, so graph-injected
    synonym tokens shingle with their immediate stream neighbors only.

    Vectorized: window membership is one mask over (doc, pos) arrays per
    size; shingle strings come from ONE Arrow binary_join_element_wise per
    size; the combined stream re-interns with one dictionary_encode."""
    stream = pc.take(vocab, pa.array(tok_ids, pa.int32()))
    if isinstance(stream, pa.ChunkedArray):
        stream = stream.combine_chunks()
    n_tok = len(tok_ids)
    str_parts = [stream]
    doc_parts = [doc_idx]
    pos_parts = [positions]
    sc_parts = [start_chars] if start_chars is not None else None
    ec_parts = [end_chars] if end_chars is not None else None
    for n in sizes:
        n = int(n)
        if n < 2 or n_tok < n:
            continue
        head = np.arange(0, n_tok - n + 1)
        ok = (doc_idx[head + n - 1] == doc_idx[head]) & (
            positions[head + n - 1] == positions[head] + (n - 1)
        )
        sel = head[ok]
        if len(sel) == 0:
            continue
        cols = [stream.take(pa.array(sel + k, pa.int64())) for k in range(n)]
        sh = pc.binary_join_element_wise(*cols, pa.scalar(" "))
        str_parts.append(sh)
        doc_parts.append(doc_idx[sel])
        pos_parts.append(positions[sel])
        if sc_parts is not None:
            sc_parts.append(start_chars[sel])
            ec_parts.append(end_chars[sel + n - 1])
    if len(str_parts) == 1:
        return tok_ids, vocab, doc_idx, positions, start_chars, end_chars
    all_str = pa.concat_arrays([p.cast(pa.string()) for p in str_parts])
    d = all_str.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    tok_ids = np.asarray(d.indices, dtype=np.int32)
    vocab = d.dictionary
    doc_idx = np.concatenate(doc_parts)
    positions = np.concatenate(pos_parts)
    if sc_parts is not None:
        start_chars = np.concatenate(sc_parts)
        end_chars = np.concatenate(ec_parts)
    order = np.lexsort((positions, doc_idx))
    tok_ids = tok_ids[order]
    doc_idx = doc_idx[order]
    positions = positions[order]
    if sc_parts is not None:
        start_chars = start_chars[order]
        end_chars = end_chars[order]
    return tok_ids, vocab, doc_idx, positions, start_chars, end_chars


def invert_partition(
    contents: pa.ChunkedArray | pa.Array,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    stopwords: frozenset[str] | None = None,
    with_positions: bool = True,
    with_offsets: bool = False,
    token_filters: tuple = (),
    grammar: str = "code",
    dict_lexicon: tuple = (),
    char_filters: tuple = (),
    shingles: tuple = (),
    phrase_synonyms: tuple = (),
    common_grams: tuple = (),
    payload_delimiter: str | None = None,
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Invert one partition of documents.

    Returns ``(partials, lengths, norms)``:

    - partials: pa.Table[term, df, ttf, doc_offsets list<uint32>,
      freqs list<uint32>, norms list<uint8>, pos_enc binary, off_enc binary]
    - lengths: int64[n_docs] field lengths (surviving token counts)
    - norms: uint8[n_docs] norm bytes (SmallFloat intToByte4 of length)

    ``off_enc`` (when ``with_offsets``) is a vbyte stream of interleaved
    (start_char_delta, token_char_length) pairs per occurrence, deltas
    per doc with the first start absolute — the offsets level of
    IndexOptions (IndexOptions.java:44), enabling highlighting/snippets.

    ``pay_enc`` (when ``payload_delimiter``) is a vbyte stream of ONE
    absolute unsigned-integer payload per occurrence — the per-position
    payload level of IndexOptions (PostingsEnum.getPayload). Payloads are
    taken from the token text itself, DelimitedPayloadTokenFilter style
    (analysis/payloads/DelimitedPayloadTokenFilter.java:34-49): a token
    ``foo<delim>5`` indexes term ``foo`` with integer payload 5 at that
    position; tokens without the delimiter (or with a non-numeric suffix)
    carry payload 0 and index verbatim. Integer payloads are this engine's
    PayloadDecoder (Lucene stores raw BytesRef; our vbyte integers are the
    numeric-payload use case PayloadScoreQuery exists for). Incompatible
    with stream-mutating stages (token_filters / shingles /
    phrase_synonyms / common_grams) — same composition limits as Lucene's
    payload filters, which must run last in the chain.
    """
    if payload_delimiter and (token_filters or shingles or phrase_synonyms
                              or common_grams):
        raise ValueError(
            "payload_delimiter cannot be combined with token_filters/"
            "shingles/phrase_synonyms/common_grams")
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    n_docs = len(contents)
    corrections = None
    if char_filters:
        # pre-tokenization rewrite (CharFilter chain); corrections map
        # filtered char offsets back to the ORIGINAL stored text so the
        # +OFFSETS level stays valid for highlighting (correctOffset)
        from lucene_ray.analysis.charfilter import apply_char_filters

        contents, corrections = apply_char_filters(contents, char_filters)
    if with_offsets:
        flat, doc_idx, positions, start_chars, end_chars = tokenize_column(
            contents, max_token_length, stopwords, with_offsets=True,
            grammar=grammar, dict_lexicon=dict_lexicon,
        )
    else:
        flat, doc_idx, positions = tokenize_column(
            contents, max_token_length, stopwords, grammar=grammar,
            dict_lexicon=dict_lexicon,
        )

    lengths = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    norm_bytes = int_to_byte4_array(lengths)

    total = len(doc_idx)
    if total == 0:
        return _empty_partials(), lengths, norm_bytes

    dict_arr = flat.dictionary_encode()
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    tok_ids = np.asarray(dict_arr.indices, dtype=np.int32)
    vocab = dict_arr.dictionary

    pay_vals = None
    if payload_delimiter:
        # DelimitedPayloadTokenFilter at VOCAB level: the payload is a pure
        # function of the surface token string, so splitting each DISTINCT
        # token once and gathering per occurrence is exact and vectorized
        # (vocab is tiny next to the token stream).
        stripped: list[str] = []
        vocab_pay = np.zeros(len(vocab), dtype=np.uint64)
        for vi, t in enumerate(vocab.to_pylist()):
            k = t.rfind(payload_delimiter)
            if k > 0 and t[k + 1:].isdigit():
                stripped.append(t[:k])
                vocab_pay[vi] = int(t[k + 1:])
            else:
                stripped.append(t)
        d2 = pa.array(stripped, pa.string()).dictionary_encode()
        remap = np.asarray(d2.indices, dtype=np.int32)
        pay_vals = vocab_pay[tok_ids]
        tok_ids = remap[tok_ids]
        vocab = d2.dictionary

    if token_filters:
        if not with_offsets:
            start_chars = end_chars = None
        (tok_ids, vocab, doc_idx, positions, start_chars, end_chars,
         drop_counts) = (
            _apply_token_filters(token_filters, tok_ids, vocab, doc_idx,
                                 positions, start_chars, end_chars)
        )
        total = len(tok_ids)
        if drop_counts is not None:
            # LengthFilter removals leave field length (and the norm byte)
            lengths = lengths - np.pad(
                drop_counts, (0, n_docs - len(drop_counts)))
            norm_bytes = int_to_byte4_array(lengths)

    if phrase_synonyms:
        if not with_offsets:
            start_chars = end_chars = None
        tok_ids, vocab, doc_idx, positions, start_chars, end_chars = (
            _inject_phrase_synonyms(tok_ids, vocab, doc_idx, positions,
                                    start_chars, end_chars,
                                    phrase_synonyms)
        )
        total = len(tok_ids)

    if common_grams:
        if not with_offsets:
            start_chars = end_chars = None
        tok_ids, vocab, doc_idx, positions, start_chars, end_chars = (
            _inject_common_grams(tok_ids, vocab, doc_idx, positions,
                                 start_chars, end_chars, common_grams)
        )
        total = len(tok_ids)

    if shingles:
        if not with_offsets:
            start_chars = end_chars = None
        tok_ids, vocab, doc_idx, positions, start_chars, end_chars = (
            _inject_shingles(tok_ids, vocab, doc_idx, positions,
                             start_chars, end_chars, shingles)
        )
        total = len(tok_ids)

    if with_offsets and corrections is not None:
        # map filtered-text offsets back to the original stored value
        # (correctOffset applied to both ends, as OffsetAttribute gets)
        from lucene_ray.analysis.charfilter import correct_offsets

        start_chars = correct_offsets(doc_idx, start_chars, corrections)
        end_chars = correct_offsets(doc_idx, end_chars, corrections)

    # tokens already arrive in (doc, position) order, so ONE stable sort by
    # term id yields (term, doc, position) order — no 2-key lexsort needed
    order = np.argsort(tok_ids, kind="stable")
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

    # end token index per term (term t covers postings
    # [t_starts[t], t_starts[t+1]) -> token span via p_starts)
    tok_span_ends = np.append(p_starts, total)[1:]  # end token idx per posting
    term_tok_ends = tok_span_ends[np.append(t_starts[1:], n_post) - 1]

    def _stream_column(values: np.ndarray, values_per_token: int) -> pa.Array:
        """vbyte stream sliced into one binary cell per term."""
        from lucene_ray.codec.packing import _vbyte_lengths

        stream = vbyte_encode(values)
        byte_ends = np.cumsum(_vbyte_lengths(values))
        term_byte_ends = byte_ends[term_tok_ends * values_per_token - 1]
        term_byte_offsets = np.concatenate([[0], term_byte_ends]).astype(np.int32)
        return pa.BinaryArray.from_buffers(
            pa.binary(),
            len(term_ids),
            [None, pa.py_buffer(term_byte_offsets.tobytes()), pa.py_buffer(stream)],
        )

    if with_positions:
        # position deltas: absolute at each posting start, gaps within
        deltas = p_s.astype(np.uint64)
        deltas[1:] = p_s[1:] - p_s[:-1]
        deltas[p_starts] = p_s[p_starts]
        pos_arr = _stream_column(deltas, 1)
    else:
        pos_arr = pa.array([b""] * len(term_ids), pa.binary())

    if with_offsets:
        s_s = start_chars[order]
        e_s = end_chars[order]
        sd = s_s.astype(np.uint64)
        sd[1:] = s_s[1:] - s_s[:-1]
        sd[p_starts] = s_s[p_starts]  # absolute at each posting start
        inter = np.empty(2 * total, dtype=np.uint64)
        inter[0::2] = sd
        inter[1::2] = (e_s - s_s).astype(np.uint64)
        off_arr = _stream_column(inter, 2)
    else:
        off_arr = pa.array([b""] * len(term_ids), pa.binary())

    if pay_vals is not None:
        # one absolute vbyte payload per occurrence (no deltas: payloads
        # are arbitrary values, not monotone like positions)
        pay_arr = _stream_column(pay_vals[order].astype(np.uint64), 1)
    else:
        pay_arr = pa.array([b""] * len(term_ids), pa.binary())

    partials = pa.table(
        {
            "term": vocab.take(pa.array(term_ids)),
            "df": pa.array(df, pa.int64()),
            "ttf": pa.array(ttf, pa.int64()),
            "doc_offsets": doc_offsets_arr,
            "freqs": freqs_arr,
            "norms": norms_arr,
            "pos_enc": pos_arr,
            "off_enc": off_arr,
            "pay_enc": pay_arr,
        }
    )
    return partials, lengths, norm_bytes


def shift_doc_offsets(partials: pa.Table, base: int) -> pa.Table:
    """Rebase slice-local doc offsets to partition-local (add ``base``)."""
    if base == 0 or len(partials) == 0:
        return partials
    la = partials.column("doc_offsets")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    shifted = pa.ListArray.from_arrays(
        la.offsets, pc.add(la.values, pa.scalar(base, pa.uint32()))
    )
    return partials.set_column(
        partials.schema.get_field_index("doc_offsets"), "doc_offsets", shifted
    )


def merge_partials(tables: list[pa.Table],
                   order_by=None) -> pa.Table:
    """Merge per-slice partial-postings tables into one partition table.

    Rows for the same term are concatenated in input order (slices are
    processed in ascending doc order, so merged doc lists stay sorted).
    Fully vectorized: one stable sort by interned term id, then offset
    arithmetic on the flattened list/binary buffers. This is the same merge
    the Stage-C map_groups performs across partitions — slicing bounds the
    inverter's working set so worker pages are reused instead of re-faulted
    (crucial on virtualized memory; also the behavior you want under real
    memory pressure at scale).

    ``order_by``: optional callable mapping the unique-term dictionary
    (a pa.Array of strings) to an integer key per term; output groups are
    then emitted in ascending (key, term) order instead of first-appearance
    order. Stage A uses this to fold the map-side shuffle order
    (crc32-bucket, term) into the ONE take this merge already performs —
    the standalone (bucket, term) sort+take it replaces was ~15% of Stage-A
    task time at 32-way concurrency (the take's fresh list-buffer
    allocations are what saturate the host's memory path).
    """
    tables = [t for t in tables if len(t)]
    if not tables:
        return _empty_partials()
    if len(tables) == 1 and order_by is None:
        return tables[0]
    cat = pa.concat_tables(tables).combine_chunks()
    term_dict = cat.column("term").combine_chunks().dictionary_encode()
    tok_ids = np.asarray(term_dict.indices, dtype=np.int64)
    if order_by is not None:
        d = term_dict.dictionary
        key = np.asarray(order_by(d), dtype=np.int64)
        # rank unique terms by (key, term) with the SAME comparator the
        # old standalone pc.sort_indices used (bytewise UTF-8 ascending)
        perm = np.asarray(
            pc.sort_indices(
                pa.table({"k": pa.array(key), "t": d}),
                sort_keys=[("k", "ascending"), ("t", "ascending")],
            ),
            dtype=np.int64,
        )
        rank = np.empty(len(d), dtype=np.int64)
        rank[perm] = np.arange(len(d), dtype=np.int64)
        sort_key = rank[tok_ids]
    else:
        sort_key = tok_ids
    order = np.argsort(sort_key, kind="stable")
    cat = cat.take(pa.array(order))
    tok_sorted = tok_ids[order]
    t_sorted = sort_key[order]
    n = len(t_sorted)
    chg = np.empty(n, dtype=bool)
    chg[0] = True
    chg[1:] = t_sorted[1:] != t_sorted[:-1]
    g_starts = np.flatnonzero(chg)
    n_groups = len(g_starts)

    df = np.add.reduceat(np.asarray(cat.column("df"), dtype=np.int64), g_starts)
    ttf = np.add.reduceat(np.asarray(cat.column("ttf"), dtype=np.int64), g_starts)

    def merge_list_col(name, typ):
        la = cat.column(name).combine_chunks()
        row_counts = np.diff(np.asarray(la.offsets, dtype=np.int64))
        grp_counts = np.add.reduceat(row_counts, g_starts)
        new_offsets = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(grp_counts, out=new_offsets[1:])
        # flatten() yields values in row order after the take
        return pa.ListArray.from_arrays(
            pa.array(new_offsets.astype(np.int32), pa.int32()), la.flatten()
        )

    doc_offsets = merge_list_col("doc_offsets", pa.uint32())
    freqs = merge_list_col("freqs", pa.uint32())
    norms = merge_list_col("norms", pa.uint8())

    def merge_binary_col(name: str) -> pa.Array:
        ba = cat.column(name).combine_chunks()
        boffs = np.frombuffer(
            ba.buffers()[1], dtype=np.int32, count=len(ba) + ba.offset + 1
        )[ba.offset :].astype(np.int64)
        byte_counts = np.diff(boffs)
        grp_bytes = np.add.reduceat(byte_counts, g_starts)
        new_boffsets = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(grp_bytes, out=new_boffsets[1:])
        # slice the contiguous data buffer to this array's [first, last)
        b0 = int(boffs[0])
        data = ba.buffers()[2]
        payload = (
            bytes(memoryview(data)[b0 : b0 + int(new_boffsets[-1])])
            if data is not None
            else b""
        )
        return pa.Array.from_buffers(
            pa.binary(),
            n_groups,
            [None,
             pa.py_buffer(new_boffsets.astype(np.int32).tobytes()),
             pa.py_buffer(payload)],
        )

    terms = term_dict.dictionary.take(pa.array(tok_sorted[g_starts]))
    return pa.table(
        {
            "term": terms,
            "df": pa.array(df, pa.int64()),
            "ttf": pa.array(ttf, pa.int64()),
            "doc_offsets": doc_offsets,
            "freqs": freqs,
            "norms": norms,
            "pos_enc": merge_binary_col("pos_enc"),
            "off_enc": merge_binary_col("off_enc"),
            "pay_enc": merge_binary_col("pay_enc"),
        }
    )


def _empty_partials() -> pa.Table:
    return pa.table(
        {
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "ttf": pa.array([], pa.int64()),
            "doc_offsets": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
            "norms": pa.array([], pa.list_(pa.uint8())),
            "pos_enc": pa.array([], pa.binary()),
            "off_enc": pa.array([], pa.binary()),
            "pay_enc": pa.array([], pa.binary()),
        }
    )
