"""Whole-index invariant checker — the ``CheckIndex`` analog
(lucene/core/src/java/org/apache/lucene/index/CheckIndex.java:114).

Verifies, for every segment:
- postings chunks decode, docs strictly ascending, within segment bounds,
  chunk doc ranges disjoint per (term) in min_doc order;
- freqs >= 1 and positions parse with per-doc counts == freqs;
- impacts are a valid skyline (strictly increasing freq AND norm) and every
  (freq, norm) pair in the chunk is dominated by a skyline entry;
- term_stats agree with postings (doc_freq == total postings, ttf == sum
  of freqs) — the dict-vs-postings agreement check;
- docmap row counts match the manifest plan; norms decode;
- (optional) per-row sha256 of a source re-read matches the docmap.

Usage: ``python -m lucene_ray.index.check <index_dir>``.
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

from lucene_ray.codec.postings import decode_docs, decode_freqs, decode_positions
from lucene_ray.index.reader import IndexReader


class CheckIndexError(AssertionError):
    pass


def check_index(index_dir: str, verbose: bool = False) -> dict:
    """Raises CheckIndexError on the first violated invariant; returns
    summary stats when clean."""
    import pyarrow.dataset as pads

    reader = IndexReader(index_dir)
    manifest = reader.manifest

    def fail(msg):
        raise CheckIndexError(msg)

    # docmap counts match the plan
    total_docs = 0
    for p in manifest.partitions:
        import pyarrow.parquet as pq

        from lucene_ray.index.build import docmap_path

        t = pq.read_table(docmap_path(index_dir, p["pid"]), columns=["doc_id", "norm"])
        if len(t) != p["num_rows"]:
            fail(f"docmap pid={p['pid']}: {len(t)} rows != planned {p['num_rows']}")
        total_docs += len(t)
    if total_docs != manifest.doc_count:
        fail(f"docmap total {total_docs} != manifest doc_count {manifest.doc_count}")

    stats_tbl = pads.dataset(f"{index_dir}/term_stats", format="parquet").to_table()
    expected_df = dict(zip(stats_tbl.column("term").to_pylist(),
                           stats_tbl.column("doc_freq").to_pylist()))
    expected_ttf = dict(zip(stats_tbl.column("term").to_pylist(),
                            stats_tbl.column("total_term_freq").to_pylist()))

    seen_df: dict[str, int] = defaultdict(int)
    seen_ttf: dict[str, int] = defaultdict(int)
    n_chunks = 0
    for seg in reader.segs:
        num_docs = reader.num_docs(seg)
        ds = pads.dataset(reader.seg_dir(seg), format="parquet")
        tbl = ds.to_table().sort_by([("term", "ascending"), ("min_doc", "ascending")])
        terms = tbl.column("term").to_pylist()
        counts = tbl.column("count").to_pylist()
        last_max: dict[str, int] = {}
        for i in range(len(tbl)):
            term = terms[i]
            cnt = counts[i]
            docs = decode_docs(tbl.column("docs_enc")[i].as_py(), cnt).astype(np.int64)
            freqs = decode_freqs(tbl.column("freqs_enc")[i].as_py(), cnt).astype(np.int64)
            if len(docs) != cnt:
                fail(f"seg {seg} term {term}: decoded {len(docs)} != count {cnt}")
            if cnt > 1 and not (docs[1:] > docs[:-1]).all():
                fail(f"seg {seg} term {term}: docs not strictly ascending")
            if docs[0] < 0 or docs[-1] >= num_docs:
                fail(f"seg {seg} term {term}: doc out of segment bounds")
            if int(docs[0]) != tbl.column("min_doc")[i].as_py() or \
               int(docs[-1]) != tbl.column("max_doc")[i].as_py():
                fail(f"seg {seg} term {term}: min/max_doc metadata mismatch")
            if term in last_max and docs[0] <= last_max[term]:
                fail(f"seg {seg} term {term}: chunk doc ranges overlap")
            last_max[term] = int(docs[-1])
            if (freqs < 1).any():
                fail(f"seg {seg} term {term}: zero freq")
            pos_enc = tbl.column("pos_enc")[i].as_py()
            if pos_enc:
                pos = decode_positions(pos_enc, freqs)
                if len(pos) != int(freqs.sum()):
                    fail(f"seg {seg} term {term}: position count mismatch")
            if "off_enc" in tbl.column_names:
                off_enc = tbl.column("off_enc")[i].as_py()
                if off_enc:
                    from lucene_ray.codec.postings import decode_offsets

                    s, e = decode_offsets(off_enc, freqs)
                    if len(s) != int(freqs.sum()):
                        fail(f"seg {seg} term {term}: offsets count mismatch")
                    if (e < s).any():
                        fail(f"seg {seg} term {term}: negative-length offset span")
                    # within each doc, occurrence starts must be ascending
                    d_idx = np.repeat(np.arange(len(freqs)), freqs)
                    if len(s) > 1:
                        same_doc = d_idx[1:] == d_idx[:-1]
                        if (s[1:][same_doc] < s[:-1][same_doc]).any():
                            fail(f"seg {seg} term {term}: offsets not ascending within doc")
            imp_f = np.asarray(tbl.column("impact_freqs")[i].as_py(), dtype=np.int64)
            imp_n = np.asarray(tbl.column("impact_norms")[i].as_py(), dtype=np.int64)
            if len(imp_f):
                if (np.diff(imp_f) <= 0).any() or (np.diff(imp_n) <= 0).any():
                    fail(f"seg {seg} term {term}: impacts not a strict skyline")
                norms = reader.norms(seg)[docs]
                for fo, no in zip(freqs, norms):
                    if not any(fs >= fo and ns <= no for fs, ns in zip(imp_f, imp_n)):
                        fail(f"seg {seg} term {term}: ({fo},{no}) not dominated by impacts")
            seen_df[term] += cnt
            seen_ttf[term] += int(freqs.sum())
            n_chunks += 1

    for term, df in seen_df.items():
        if expected_df.get(term) != df:
            fail(f"term {term}: postings df {df} != term_stats {expected_df.get(term)}")
        if expected_ttf.get(term) != seen_ttf[term]:
            fail(f"term {term}: postings ttf {seen_ttf[term]} != term_stats {expected_ttf.get(term)}")
    missing = set(expected_df) - set(seen_df)
    if missing:
        fail(f"{len(missing)} terms in term_stats have no postings, e.g. {sorted(missing)[:3]}")

    summary = {
        "doc_count": total_docs,
        "segments": len(reader.segs),
        "terms": len(seen_df),
        "chunks": n_chunks,
        "status": "OK",
    }
    if verbose:
        print(summary)
    return summary


if __name__ == "__main__":
    out = check_index(sys.argv[1], verbose=True)
    sys.exit(0 if out["status"] == "OK" else 1)
