"""Per-position payloads: DelimitedPayloadTokenFilter-style extraction at
index time (analysis/payloads/DelimitedPayloadTokenFilter.java:34-49), one
vbyte integer payload per posting position (the IndexOptions payload level /
PostingsEnum.getPayload), carried through Stage A partials -> Stage C chunk
encode -> reader decode, and aggregated by the PayloadScoreQuery analog
(queries/payloads/PayloadScoreQuery.java with Sum/Max/Min functions)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.codec.postings import decode_docs, decode_freqs, decode_payloads
from lucene_ray.index.build import IndexConfig, build_index, compact_segments, delete_by_term
from lucene_ray.index.invert import invert_partition
from lucene_ray.index.reader import IndexReader


def test_invert_payload_extraction():
    col = pa.array(["foo|5 bar|7 foo|9", "bar|3"], pa.string())
    part, lengths, _ = invert_partition(
        col, grammar="pattern:[^ ]+", payload_delimiter="|")
    rows = {part.column("term")[i].as_py(): i for i in range(len(part))}
    assert set(rows) == {"foo", "bar"}
    # field length counts tokens (payloads strip off the term only)
    np.testing.assert_array_equal(lengths, [3, 1])
    fi = rows["foo"]
    freqs = np.asarray(part.column("freqs")[fi].values, dtype=np.int64)
    pays = decode_payloads(part.column("pay_enc")[fi].as_py(), freqs)
    np.testing.assert_array_equal(pays, [5, 9])
    bi = rows["bar"]
    freqs_b = np.asarray(part.column("freqs")[bi].values, dtype=np.int64)
    pays_b = decode_payloads(part.column("pay_enc")[bi].as_py(), freqs_b)
    np.testing.assert_array_equal(pays_b, [7, 3])
    # doc order: bar occurs in doc 0 then doc 1
    np.testing.assert_array_equal(
        np.asarray(part.column("doc_offsets")[bi].values), [0, 1])


def test_non_numeric_suffix_indexes_verbatim_with_zero_payload():
    col = pa.array(["a|x b| |7 c"], pa.string())
    part, _, _ = invert_partition(
        col, grammar="pattern:[^ ]+", payload_delimiter="|")
    terms = set(part.column("term").to_pylist())
    # "a|x": non-numeric suffix -> verbatim; "b|": empty suffix -> verbatim;
    # "|7": delimiter at k=0 (not k>0) -> verbatim; "c": no delimiter
    assert terms == {"a|x", "b|", "|7", "c"}
    for i in range(len(part)):
        f = np.asarray(part.column("freqs")[i].values, dtype=np.int64)
        pays = decode_payloads(part.column("pay_enc")[i].as_py(), f)
        np.testing.assert_array_equal(pays, np.zeros(int(f.sum())))


def test_payload_delimiter_rejects_stream_mutating_filters():
    col = pa.array(["x|1"], pa.string())
    with pytest.raises(ValueError):
        invert_partition(col, payload_delimiter="|",
                         token_filters=(("porter_stem",),))
    with pytest.raises(ValueError):
        invert_partition(col, payload_delimiter="|", shingles=(2,))


def _pay_corpus(n_rows: int) -> pa.Table:
    """Deterministic payload-annotated corpus: token j of doc i is
    t{(i*7+j) % 13}|{(i + j) % 31}."""
    texts = [
        " ".join(f"t{(i * 7 + j) % 13}|{(i + j) % 31}" for j in range(5 + i % 9))
        for i in range(n_rows)
    ]
    return pa.table({
        "repo": pa.array([f"r{i % 3}" for i in range(n_rows)], pa.string()),
        "path": pa.array([f"p/{i}" for i in range(n_rows)], pa.string()),
        "commit": pa.array(["c"] * n_rows, pa.string()),
        "content": pa.array(texts, pa.string()),
    })


def _expected_payloads(tbl: pa.Table, term: str) -> dict[int, list[int]]:
    """Row-at-a-time reference: {row_index: [payloads in order]}."""
    out: dict[int, list[int]] = {}
    for i, text in enumerate(tbl.column("content").to_pylist()):
        pays = [int(t.rsplit("|", 1)[1]) for t in text.split(" ")
                if t.rsplit("|", 1)[0] == term]
        if pays:
            out[i] = pays
    return out


@pytest.fixture(scope="module")
def pay_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pay")
    src = str(d / "c.parquet")
    corpus = _pay_corpus(400)
    pq.write_table(corpus, src, row_group_size=97)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        target_rows_per_partition=100, partitions_per_segment=2,
        chunk_size=32, hot_df_threshold=200, n_salts=2,
        grammar="pattern:[^ ]+", payload_delimiter="|"))
    return idx, corpus


def _term_payloads_from_index(idx: str, term: str) -> dict[int, list[int]]:
    """{source_row_index (parsed from path 'p/{i}'): payloads} decoded from
    the chunk rows."""
    reader = IndexReader(idx)
    by_gid: dict[int, list[int]] = {}
    for seg in reader.segs:
        tbl = reader.postings(seg, [term])
        if tbl is None or len(tbl) == 0:
            continue
        gids = reader.global_doc_ids(seg)
        for i in range(len(tbl)):
            cnt = tbl.column("count")[i].as_py()
            docs = decode_docs(tbl.column("docs_enc")[i].as_py(), cnt)
            freqs = decode_freqs(tbl.column("freqs_enc")[i].as_py(), cnt)
            pays = decode_payloads(tbl.column("pay_enc")[i].as_py(), freqs)
            k = 0
            for dloc, f in zip(docs, freqs):
                g = int(gids[int(dloc)])
                f = int(f)
                by_gid.setdefault(g, []).extend(int(x) for x in pays[k:k + f])
                k += f
    if not by_gid:
        return {}
    t = reader.lookup_docs(np.array(sorted(by_gid), dtype=np.uint64),
                           columns=["doc_id", "path"])
    g2row = {int(g): int(p.split("/", 1)[1])
             for g, p in zip(t.column("doc_id").to_pylist(),
                             t.column("path").to_pylist())}
    return {g2row[g]: pays for g, pays in by_gid.items()}


def test_build_roundtrip_payloads(pay_index):
    idx, corpus = pay_index
    for term in ["t0", "t5", "t12"]:
        exp = _expected_payloads(corpus, term)
        got = _term_payloads_from_index(idx, term)
        assert got == exp


def test_payloads_survive_delete_compact(pay_index, tmp_path_factory):
    import shutil

    idx, corpus = pay_index
    d = tmp_path_factory.mktemp("payc")
    idx2 = str(d / "idx")
    shutil.copytree(idx, idx2)
    dele = [f"p/{i}" for i in range(0, 400, 5)]
    delete_by_term(idx2, "path", dele)
    reader0 = IndexReader(idx2)
    compact_segments(idx2, list(reader0.segs), expunge_deletes=True)
    deleted_rows = set(range(0, 400, 5))
    for term in ["t3", "t7"]:
        exp = {r: p for r, p in _expected_payloads(corpus, term).items()
               if r not in deleted_rows}
        got = _term_payloads_from_index(idx2, term)
        # compaction re-pids docs; compare payload multisets per sorted order
        assert sorted(got.values()) == sorted(exp.values())
        assert len(got) == len(exp)
