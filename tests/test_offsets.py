"""Offsets postings level (DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS):
codec round-trip, tokenizer char offsets (incl. multibyte), and the
end-to-end snippet invariant text[start:end] == term through a built index.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.codec.postings import decode_docs, decode_freqs, decode_offsets
from lucene_ray.index.invert import invert_partition, tokenize_column


def test_tokenize_offsets_ascii():
    texts = pa.array(["Hello world", "a bb  ccc", ""])
    flat, doc_idx, pos, s, e = tokenize_column(texts, with_offsets=True)
    toks = flat.to_pylist()
    assert toks == ["hello", "world", "a", "bb", "ccc"]
    lowered = [t.as_py().lower() for t in texts]
    for t, d, a, b in zip(toks, doc_idx, s, e):
        assert lowered[d][a:b] == t


def test_tokenize_offsets_multibyte_chars():
    # é is 2 bytes / 1 char: offsets must count CHARS
    texts = pa.array(["é abc é def", "中文 word 中"])
    flat, doc_idx, pos, s, e = tokenize_column(texts, with_offsets=True)
    lowered = [t.as_py().lower() for t in texts]
    for t, d, a, b in zip(flat.to_pylist(), doc_idx, s, e):
        assert lowered[d][a:b] == t, (t, d, a, b)


def test_invert_offsets_roundtrip():
    texts = pa.array([
        "join the hash join now",
        "no match here",
        "join",
    ])
    partials, lengths, norms = invert_partition(texts, with_offsets=True)
    row = {t: i for i, t in enumerate(partials.column("term").to_pylist())}
    i = row["join"]
    f = np.asarray(partials.column("freqs")[i].values, dtype=np.int64)
    s, e = decode_offsets(partials.column("off_enc")[i].as_py(), f)
    docs = np.asarray(partials.column("doc_offsets")[i].values, dtype=np.int64)
    lowered = [t.as_py().lower() for t in texts]
    k = 0
    for di, d in enumerate(docs):
        for _ in range(f[di]):
            assert lowered[d][int(s[k]):int(e[k])] == "join"
            k += 1
    # doc 0 has 'join' at chars 0 and 14
    assert list(s[:2]) == [0, 14]


def test_snippet_invariant_through_built_index(ray_session, tmp_path):
    """Build with offsets -> first-occurrence snippet of a term satisfies
    lower(content)[start:end] == term for every matching doc."""
    from lucene_ray.fixtures import make_corpus
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader

    corpus = make_corpus(300, seed=8)
    src = str(tmp_path / "c.parquet")
    pq.write_table(corpus, src, row_group_size=100)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(target_rows_per_partition=100, partitions_per_segment=2,
                      chunk_size=64, with_offsets=True)
    build_index(src, idx, cfg)
    reader = IndexReader(idx)
    texts = pq.read_table(src, columns=["content"]).column("content").to_pylist()

    term = "import"
    found = 0
    for seg in reader.segs:
        tbl = reader.postings(seg, [term])
        if tbl is None or len(tbl) == 0:
            continue
        gids = reader.global_doc_ids(seg)
        for r in tbl.to_pylist():
            d = decode_docs(r["docs_enc"], r["count"]).astype(np.int64)
            f = decode_freqs(r["freqs_enc"], r["count"]).astype(np.int64)
            s, e = decode_offsets(r["off_enc"], f)
            ends = np.cumsum(f)
            starts = ends - f
            for di, doc in enumerate(d):
                g = int(gids[doc])
                row = g & 0xFFFFFFFF
                pid = g >> 32
                # row offset within the corpus: partitions are contiguous
                base = sum(p["num_rows"] for p in reader.manifest.partitions[:pid])
                text = texts[base + row].lower()
                for k in range(starts[di], ends[di]):
                    assert text[int(s[k]):int(e[k])] == term
                    found += 1
    assert found > 100


def test_passages_bm25_hand_checked(ray_session):
    """BM25 passage weights on a tiny two-term case, replicating
    PassageScorer.java:63-104 float op order by hand (token units,
    pivot=14)."""
    import numpy as np

    f32 = np.float32
    k1, b, pivot, window = f32(1.2), f32(0.75), f32(14.0), 32

    def weight(dlen, ttf):
        nd = f32(1) + f32(dlen) / pivot
        return (k1 + f32(1)) * f32(np.log(1.0 + (float(nd) + 0.5) / (ttf + 0.5)))

    def tf(n):
        nc = k1 * ((f32(1) - b) + b * (f32(window) / pivot))
        return f32(n) / (f32(n) + nc)

    def pos_norm(passage):
        return f32(1) + f32(1) / f32(np.log(float(pivot + f32(passage * window))))

    # doc: len 100 tokens, 'join' x3 in passage 0 and x1 in passage 1,
    # 'hash' x2 in passage 0 -> ttf(join)=4, ttf(hash)=2
    s0 = float(np.float64(f32(tf(3) * weight(100, 4)))
               + np.float64(f32(tf(2) * weight(100, 2))))
    score0 = f32(s0 * float(pos_norm(0)))
    s1 = float(np.float64(f32(tf(1) * weight(100, 4))))
    score1 = f32(s1 * float(pos_norm(1)))
    assert score0 > score1 > 0
    # and the ranking flips vs raw counts when a rarer term concentrates:
    # passage A: 1x hash (rare, high weight); passage B: 1x join with
    # ttf(join) huge -> low weight
    wa = float(f32(tf(1) * weight(1000, 2)))
    wb = float(f32(tf(1) * weight(1000, 900)))
    assert wa > wb  # same count, different BM25 weight
