"""Sequence packing (ops/packing.py) + PII redaction (ops/text.redact_pii)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("packcorp")
    path = str(d / "docs.parquet")
    # token counts: doc 0 -> 3, doc 1 -> 5, doc 2 -> 0 (empty), doc 3 -> 7,
    # doc 4 -> 2 — global stream length 17
    texts = ["a b c", "d e f g h", "", "i j k l m n o", "p q"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, path, row_group_size=2)  # multiple row groups
    return path


def test_pack_concat_chunks_hand_checked(corpus):
    from lucene_ray.ops.packing import pack_concat_chunks

    t = pack_concat_chunks(corpus, seq_len=4, target_rows_per_partition=100)
    rows = list(zip(*[np.asarray(t.column(c)) for c in
                      ("seq_id", "doc_id", "tok_start", "tok_end")]))
    # global offsets: d0 [0,3) d1 [3,8) d3 [8,15) d4 [15,17); L=4
    expected = [
        (0, 0, 0, 3), (0, 1, 0, 1),            # seq 0 = tokens [0,4)
        (1, 1, 1, 5),                          # seq 1 = [4,8)
        (2, 3, 0, 4),                          # seq 2 = [8,12)
        (3, 3, 4, 7), (3, 4, 0, 1),            # seq 3 = [12,16)
        (4, 4, 1, 2),                          # seq 4 = [16,17) short tail
    ]
    assert [tuple(map(int, r)) for r in rows] == expected


def test_pack_partition_invariance(corpus):
    """Identical spans whether the corpus is 1 partition or many — the
    partition base-offset prefix-sum must be exact."""
    from lucene_ray.ops.packing import pack_concat_chunks

    one = pack_concat_chunks(corpus, seq_len=4, target_rows_per_partition=100)
    many = pack_concat_chunks(corpus, seq_len=4, target_rows_per_partition=2)
    assert one.equals(many)


def test_pack_spans_cover_each_doc(corpus):
    """Per doc, its spans tile [0, n_tokens) with no gap or overlap."""
    from lucene_ray.ops.packing import pack_concat_chunks

    t = pack_concat_chunks(corpus, seq_len=4, target_rows_per_partition=2)
    d = t.to_pydict()
    per_doc = {}
    for doc, s, e in zip(d["doc_id"], d["tok_start"], d["tok_end"]):
        per_doc.setdefault(doc, []).append((s, e))
    lens = {0: 3, 1: 5, 3: 7, 4: 2}
    for doc, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        assert spans[-1][1] == lens[doc]
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2


def test_pack_stats_full_sequences(corpus):
    from lucene_ray.ops.packing import pack_stats

    t = pack_stats(corpus, seq_len=4)
    n_toks = np.asarray(t.column("n_tokens"))
    # all but the final sequence are exactly full
    assert np.all(n_toks[:-1] == 4)
    assert n_toks[-1] == 17 % 4
    assert int(n_toks.sum()) == 17


def test_redact_pii_planted(ray_session):
    import ray.data

    from lucene_ray.ops.text import redact_pii

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7, 9], pa.int64()),
        "text": pa.array(["reach me at bob.smith+x@corp.example.org now",
                          "server 10.0.0.1 and backup 192.168.1.254 up"]),
    }))
    import ray as _ray

    out = pa.concat_tables(
        [_ray.get(r) for r in redact_pii(ds, decorate=False).to_arrow_refs()]
    ).sort_by("doc_id")
    red = out.column("redacted").to_pylist()
    assert red[0] == "reach me at <EMAIL> now"
    assert red[1] == "server <IP> and backup <IP> up"
    assert out.column("n_emails").to_pylist() == [1, 0]
    assert out.column("n_ips").to_pylist() == [0, 2]
    assert out.column("n_phones").to_pylist() == [0, 0]


def test_redact_pii_decorated_always_fires(ray_session):
    """decorate=True plants one of each class per doc; all must be scrubbed
    and no raw planted PII may survive in the redacted text."""
    import ray.data

    from lucene_ray.ops.text import redact_pii

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 123456], pa.int64()),
        "text": pa.array(["alpha beta", "gamma", "delta epsilon zeta"]),
    }))
    import ray as _ray

    out = pa.concat_tables(
        [_ray.get(r) for r in redact_pii(ds, decorate=True).to_arrow_refs()]
    ).sort_by("doc_id")
    assert out.column("n_emails").to_pylist() == [1, 1, 1]
    assert out.column("n_ips").to_pylist() == [1, 1, 1]
    assert out.column("n_phones").to_pylist() == [1, 1, 1]
    for red in out.column("redacted").to_pylist():
        assert "@" not in red and "+1-555-" not in red
        assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red


def test_pack_greedy_no_split(corpus):
    """Greedy packing never splits a doc; each bin's fill <= seq_len and
    adding the NEXT doc would overflow (greedy tightness)."""
    from lucene_ray.ops.packing import pack_greedy

    t = pack_greedy(corpus, seq_len=6, target_rows_per_partition=100)
    d = t.to_pydict()
    # doc lengths: 3, 5, 7->6 (truncated), 2 (doc 2 empty, dropped)
    assert sorted(set(d["doc_id"])) == [0, 1, 3, 4]
    per_doc = {doc: n for doc, n in zip(d["doc_id"], d["n_tokens"])}
    assert per_doc == {0: 3, 1: 5, 3: 6, 4: 2}
    fills, order = {}, {}
    for seq, doc, n in zip(d["seq_id"], d["doc_id"], d["n_tokens"]):
        fills[seq] = fills.get(seq, 0) + n
        order.setdefault(seq, []).append(doc)
    assert all(f <= 6 for f in fills.values())
    # greedy: doc 0 (3) then doc 1 (5) overflows -> bins [0], [1], [3], [4]?
    # 3+5>6 so bin0={0}; 5 alone bin1={1}; 6 alone bin2={3}; 2 bin3={4}
    assert order == {0: [0], 1: [1], 2: [3], 3: [4]}


def test_pack_greedy_partition_base_offsets(corpus):
    """Multi-partition run: bin ids stay globally unique and ordered."""
    from lucene_ray.ops.packing import pack_greedy

    t = pack_greedy(corpus, seq_len=100, target_rows_per_partition=2)
    seqs = t.column("seq_id").to_pylist()
    # partitions of 2 docs each; within a partition all docs fit one bin at
    # seq_len=100, so bins == partitions holding non-empty docs
    assert seqs == sorted(seqs)
    assert len(set(seqs)) >= 2
