"""Highlighting — fragment extraction around term occurrences, consuming
the offsets postings level (the unified-highlighter shape,
lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/UnifiedHighlighter.java):
offsets come straight from the index (no re-analysis of the text), the
fragment is a character window around the first occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def highlight_first(sf_dir: str, term: str, width: int = 20) -> pa.Table:
    """(doc_id, start_offset, end_offset, fragment) per matching doc:
    fragment = lower(text)[max(0, start-width) : end+width] around the
    FIRST occurrence, offsets read from the off_enc postings stream."""
    from lucene_ray.pipelines.fulltext import snippet_first_occurrence

    snips = snippet_first_occurrence(sf_dir, term)
    if snips.num_rows == 0:
        return snips.append_column("fragment", pa.array([], pa.string()))
    # broadcast the (doc_id -> offsets) map once (ray.put, ~16 B per HIT —
    # the prepare.py kept-id-broadcast bound applies); fragment slicing runs
    # as a streaming map_batches over the source parquet, so neither the
    # texts nor the per-hit loop ever touch the driver
    import ray

    offs_ref = ray.put(dict(zip(
        snips.column("doc_id").to_pylist(),
        zip(snips.column("start_offset").to_pylist(),
            snips.column("end_offset").to_pylist()),
    )))

    def frag(batch: pa.Table) -> pa.Table:
        offs = ray.get(offs_ref)
        ids, frags = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            se = offs.get(d)
            if se is None:
                continue
            s, e = se
            ids.append(d)
            frags.append(t.lower()[max(0, s - width): e + width])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fragment": pa.array(frags, pa.string())})

    parts = [
        ray.get(r) for r in ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(frag, batch_format="pyarrow").to_arrow_refs()
    ]
    ft = pa.concat_tables([p for p in parts if len(p)]).sort_by("doc_id")
    frag_by_id = dict(zip(ft.column("doc_id").to_pylist(),
                          ft.column("fragment").to_pylist()))
    return snips.append_column(
        "fragment",
        pa.array([frag_by_id[d] for d in snips.column("doc_id").to_pylist()],
                 pa.string()),
    )


class _PassageTask:
    """Actor: per-segment passage scoring straight from the POSITIONS
    postings (no re-analysis of text — the UnifiedHighlighter offsets-from-
    index contract, uhighlight/UnifiedHighlighter.java:97). Passages are
    fixed token windows (pos // window — the fragListBuilder fallback for
    unstructured text); a passage's score is its query-term occurrence
    count (integer, so ordering has an exact SQL oracle; Lucene's
    BM25-weighted passage scoring is a documented divergence)."""

    def __init__(self, index_dir: str, terms: tuple, window: int):
        from lucene_ray.index.reader import IndexReader

        self.reader = IndexReader(index_dir)
        self.terms = list(terms)
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_ray.codec.postings import decode_docs, decode_freqs, decode_positions
        from lucene_ray.pipelines.fulltext import _map_orig_ids

        reader = self.reader
        out_doc, out_pass, out_n = [], [], []
        for seg in batch.column("seg").to_pylist():
            tbl = reader.postings(seg, self.terms)
            if tbl is None or len(tbl) == 0:
                continue
            gids = reader.global_doc_ids(seg)
            live = reader.live_mask(seg)
            d_parts, p_parts = [], []
            for row in tbl.to_pylist():
                d = decode_docs(row["docs_enc"], row["count"]).astype(np.int64)
                f = decode_freqs(row["freqs_enc"], row["count"]).astype(np.int64)
                pos = decode_positions(row["pos_enc"], f).astype(np.int64)
                dd = np.repeat(d, f)
                if live is not None:
                    keep = live[dd]
                    dd, pos = dd[keep], pos[keep]
                d_parts.append(dd)
                p_parts.append(pos // self.window)
            if not d_parts:
                continue
            dd = np.concatenate(d_parts)
            pp = np.concatenate(p_parts)
            # occurrence count per (doc, passage): docs < 2^31, passages
            # < 2^26 (positions < 2^31, window >= 32) -> 57-bit keys
            key = (dd << np.int64(26)) | pp
            uk, counts = np.unique(key, return_counts=True)
            docs_u = (uk >> np.int64(26)).astype(np.int64)
            pass_u = (uk & np.int64((1 << 26) - 1)).astype(np.int64)
            out_doc.append(_map_orig_ids(reader, gids[docs_u]))
            out_pass.append(pass_u)
            out_n.append(counts.astype(np.int64))
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "passage": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "passage": pa.array(np.concatenate(out_pass), pa.int64()),
                "n_matches": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )


def passages_top(sf_dir: str, terms: list[str], window: int = 32,
                 n_passages: int = 2) -> pa.Table:
    """Top-N passages per matching doc for a multi-term query —
    (doc_id, passage, n_matches, rank), rank by (n_matches desc, passage
    asc) within each doc, rows sorted (doc_id, rank). Passage scoring runs
    in a segment actor pool (_PassageTask); the driver ranks the small
    per-(doc, passage) count table vectorized."""
    import ray.data

    from lucene_ray.pipelines.fulltext import documents_index

    reader = documents_index(sf_dir)
    segs = ray.data.from_items(
        [{"seg": s} for s in reader.segs],
        override_num_blocks=max(1, len(reader.segs)),
    )
    df = segs.map_batches(
        _PassageTask,
        fn_constructor_args=(reader.index_dir, tuple(terms), window),
        batch_format="pyarrow", batch_size=1,
        concurrency=(1, 4), num_cpus=1,
    ).to_pandas()
    if len(df) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "passage": pa.array([], pa.int64()),
                         "n_matches": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    doc = df["doc_id"].to_numpy(np.int64)
    pas = df["passage"].to_numpy(np.int64)
    n = df["n_matches"].to_numpy(np.int64)
    order = np.lexsort((pas, -n, doc))
    doc, pas, n = doc[order], pas[order], n[order]
    # rank within doc runs (docs are grouped after the lexsort)
    newdoc = np.r_[True, doc[1:] != doc[:-1]]
    idx = np.arange(len(doc))
    start = np.maximum.accumulate(np.where(newdoc, idx, 0))
    rank = idx - start + 1
    keep = rank <= n_passages
    return pa.table(
        {
            "doc_id": pa.array(doc[keep], pa.int64()),
            "passage": pa.array(pas[keep], pa.int64()),
            "n_matches": pa.array(n[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
        }
    )


class _PassageTermTask:
    """Actor: like :class:`_PassageTask` but keeps the TERM dimension and
    carries each doc's EXACT token length from the docmap, so the driver
    can apply the reference's BM25-style passage weights
    (uhighlight/PassageScorer.java:63-104)."""

    def __init__(self, index_dir: str, terms: tuple, window: int):
        from lucene_ray.index.reader import IndexReader

        self.reader = IndexReader(index_dir)
        self.terms = list(terms)
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from lucene_ray.codec.postings import (decode_docs, decode_freqs,
                                               decode_positions)
        from lucene_ray.pipelines.fulltext import _map_orig_ids

        reader = self.reader
        cols = {"doc_id": [], "passage": [], "term": [], "n": [], "dlen": []}
        for seg in batch.column("seg").to_pylist():
            tbl = reader.postings(seg, self.terms)
            if tbl is None or len(tbl) == 0:
                continue
            gids = reader.global_doc_ids(seg)
            live = reader.live_mask(seg)
            for row in tbl.to_pylist():
                d = decode_docs(row["docs_enc"], row["count"]).astype(np.int64)
                f = decode_freqs(row["freqs_enc"], row["count"]).astype(np.int64)
                pos = decode_positions(row["pos_enc"], f).astype(np.int64)
                dd = np.repeat(d, f)
                if live is not None:
                    keep = live[dd]
                    dd, pos = dd[keep], pos[keep]
                if not len(dd):
                    continue
                key = (dd << np.int64(26)) | (pos // self.window)
                uk, counts = np.unique(key, return_counts=True)
                docs_u = (uk >> np.int64(26)).astype(np.int64)
                g_u = gids[docs_u]
                lt = reader.lookup_docs(np.unique(g_u),
                                        columns=["doc_id", "doc_id_orig",
                                                 "length"])
                lid = np.asarray(lt.column("doc_id"), dtype=np.uint64)
                o = np.argsort(lid)
                at = np.searchsorted(lid[o], g_u.astype(np.uint64))
                cols["doc_id"].append(
                    np.asarray(lt.column("doc_id_orig"), np.int64)[o][at])
                cols["dlen"].append(
                    np.asarray(lt.column("length"), np.int64)[o][at])
                cols["passage"].append(
                    (uk & np.int64((1 << 26) - 1)).astype(np.int64))
                cols["term"].extend([row["term"]] * len(uk))
                cols["n"].append(counts.astype(np.int64))
        if not cols["n"]:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "passage": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "dlen": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(cols["doc_id"]), pa.int64()),
            "passage": pa.array(np.concatenate(cols["passage"]), pa.int64()),
            "term": pa.array(cols["term"], pa.string()),
            "n": pa.array(np.concatenate(cols["n"]), pa.int64()),
            "dlen": pa.array(np.concatenate(cols["dlen"]), pa.int64()),
        })


def passages_bm25(sf_dir: str, terms: list[str], window: int = 32,
                  n_passages: int = 2, k1: float = 1.2, b: float = 0.75,
                  pivot: float = 14.0) -> pa.Table:
    """BM25-weighted passage ranking — the reference's PassageScorer
    (lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
    PassageScorer.java:63-104), float32-exact:

        weight(term) = (k1+1f) * (float) log(1 + (numDocs + 0.5)/(ttf + 0.5))
                       with numDocs = 1f + contentLength/pivot   [:63-70]
        tf(freq)     = freq / (freq + k1*((1-b) + b*(passageLen/pivot)))
                       (all float32)                              [:79-82]
        score        = [sum over terms tf*weight  (f32 products,
                        f64 accumulation)] * (1f + 1f/(float) log(pivot +
                        passageStart))                            [:95-104]

    Documented unit adaptation: the reference measures contentLength /
    passageLen / passageStart in CHARACTERS with pivot=87 (one English
    sentence); our passages are fixed TOKEN windows, so all three are in
    TOKENS (contentLength = the docmap's exact per-doc token length,
    passageLen = window, passageStart = passage*window) with pivot=14
    (~87 chars / 6.2 chars-per-token). The float operation ORDER is the
    reference's exactly, so the SQL oracle replays it bit-for-bit.

    Returns (doc_id, passage, rank, score_r6): top-``n_passages`` per doc
    ranked (score desc, passage asc), rows sorted (doc_id, rank)."""
    import ray.data

    from lucene_ray.pipelines.fulltext import documents_index

    reader = documents_index(sf_dir)
    segs = ray.data.from_items(
        [{"seg": s} for s in reader.segs],
        override_num_blocks=max(1, len(reader.segs)),
    )
    df = segs.map_batches(
        _PassageTermTask,
        fn_constructor_args=(reader.index_dir, tuple(terms), window),
        batch_format="pyarrow", batch_size=1,
        concurrency=(1, 4), num_cpus=1,
    ).to_pandas()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "passage": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64()),
                      "score_r6": pa.array([], pa.float64())})
    if len(df) == 0:
        return empty
    f32 = np.float32
    k1f, bf, pvf = f32(k1), f32(b), f32(pivot)
    # per-(doc, term) ttf and per-doc exact token length
    ttf = df.groupby(["doc_id", "term"], as_index=False)["n"].sum().rename(
        columns={"n": "ttf"})
    df = df.merge(ttf, on=["doc_id", "term"])
    # weight: numDocs = 1f + contentLength/pivot (float32), then the
    # (numDocs + 0.5D)/(ttf + 0.5D) double log, one float cast, * (k1+1f)
    num_docs = f32(1) + df["dlen"].to_numpy(np.int64).astype(np.float32) / pvf
    w32 = (k1f + f32(1)) * np.log(
        1.0 + (num_docs.astype(np.float64) + 0.5)
        / (df["ttf"].to_numpy(np.float64) + 0.5)).astype(np.float32)
    # tf: all-float32, constant norm for fixed windows
    norm_c = k1f * ((f32(1) - bf) + bf * (f32(window) / pvf))
    nf = df["n"].to_numpy(np.int64).astype(np.float32)
    tf32 = nf / (nf + norm_c)
    # f32 product, f64 accumulation per (doc, passage)
    df["contrib"] = (tf32 * w32).astype(np.float64)
    sc = df.groupby(["doc_id", "passage"], as_index=False)["contrib"].sum()
    start = (sc["passage"].to_numpy(np.int64) * window).astype(np.float32)
    pos_norm = f32(1) + f32(1) / np.log(
        (pvf + start).astype(np.float64)).astype(np.float32)
    score = (sc["contrib"].to_numpy(np.float64)
             * pos_norm.astype(np.float64)).astype(np.float32)
    doc = sc["doc_id"].to_numpy(np.int64)
    pas = sc["passage"].to_numpy(np.int64)
    order = np.lexsort((pas, -score.astype(np.float64), doc))
    doc, pas, score = doc[order], pas[order], score[order]
    newdoc = np.r_[True, doc[1:] != doc[:-1]]
    idx = np.arange(len(doc))
    first = np.maximum.accumulate(np.where(newdoc, idx, 0))
    rank = idx - first + 1
    keep = rank <= n_passages
    return pa.table({
        "doc_id": pa.array(doc[keep], pa.int64()),
        "passage": pa.array(pas[keep], pa.int64()),
        "rank": pa.array(rank[keep], pa.int64()),
        "score_r6": pa.array(
            np.round(score[keep].astype(np.float64), 6), pa.float64()),
    })
