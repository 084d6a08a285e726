"""Index reader — the ``DirectoryReader`` / ``IndexSearcher`` state analog.

Loads the manifest generation and serves:
- collection + term statistics (Terms.java:103-121 / IndexSearcher.collectionStatistics)
- per-segment postings rows for a set of terms (parquet predicate pushdown on
  the ``term`` column — the block-tree term dictionary analog)
- per-segment norms / global doc-id arrays (read from docmap in pid order, so
  position == segment-local doc id)
- docmap lookups for result materialization (stored-fields analog)

An instance is meant to be held by a long-lived query actor (state loaded
once in ``__init__``, SURVEY §2.3) or used inline on the driver for tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from lucene_ray.index.build import docmap_path
from lucene_ray.index.manifest import Manifest
from lucene_ray.search.similarity import CollectionStats, TermStats


def _levenshtein_within(a: str, b: str, d: int) -> bool:
    """Banded edit-distance check (<= d), early-exit DP."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            row_min = min(row_min, cur[j])
        if row_min > d:
            return False
        prev = cur
    return prev[lb] <= d


class IndexReader:
    def __init__(self, index_dir: str, segments: list[int] | None = None,
                 generation: int | None = None):
        """``generation`` opens a point-in-time reader over a pinned older
        commit (snapshot_commit / DirectoryReader.open(IndexCommit)):
        searches see exactly that generation's segments, tombstones and
        doc-values updates."""
        self.index_dir = index_dir
        self.manifest = Manifest.load(index_dir, generation=generation)
        all_segs = [s["seg"] for s in self.manifest.segments]
        self.segs = all_segs if segments is None else [s for s in all_segs if s in set(segments)]
        self._seg_info = {s["seg"]: s for s in self.manifest.segments}
        self._norms_cache: dict[int, np.ndarray] = {}
        self._docids_cache: dict[int, np.ndarray] = {}
        self._term_stats_ds = pads.dataset(
            os.path.join(index_dir, "term_stats"), format="parquet"
        )
        self._seg_ds_cache: dict[int, pads.Dataset] = {}
        # bucket-partitioned postings layout (seg=N/bucket=M/): term lookups
        # open only candidate bucket dirs; detected per segment so readers
        # also serve pre-bucket-layout indexes
        self._bucket_layout: dict[int, bool] = {}
        self._bucket_ds_cache: dict[tuple, pads.Dataset] = {}
        # (seg, term) -> pa.Table slice of chunk rows (sorted by min_doc);
        # the LRU-query-cache / OS-page-cache analog for repeated serving
        self._postings_cache: dict[tuple[int, str], pa.Table] = {}
        self._term_stats_cache: dict[str, TermStats | None] = {}
        # point-in-time live-docs state (LiveDocsFormat analog): tombstones
        # loaded once per reader open, per-segment masks cached
        self._tombstones: np.ndarray | None = None
        self._live_cache: dict[int, np.ndarray | None] = {}
        # per-segment parent positions for index-time doc blocks
        self._parents_cache: dict[int, np.ndarray] = {}
        # per-(segment, column) numeric doc-values arrays
        self._dv_cache: dict[tuple[int, str], np.ndarray] = {}

    # ---- statistics ----

    def collection_stats(self, field: str | None = None) -> CollectionStats:
        """Collection statistics for the content field, or — with ``field``
        — for an extra text field (IndexConfig.text_cols): same doc count,
        the FIELD's sumTotalTermFreq, so BM25 normalizes by the field's own
        avgdl (IndexSearcher.collectionStatistics per-field analog)."""
        if field is not None and field != self.manifest.config.get("content_col"):
            return CollectionStats(
                doc_count=self.manifest.doc_count,
                sum_total_term_freq=self.manifest.field_sum_ttf(field),
            )
        return CollectionStats(
            doc_count=self.manifest.doc_count,
            sum_total_term_freq=self.manifest.sum_total_term_freq,
        )

    def text_field_of(self, term: str) -> str | None:
        """The text field a namespaced term belongs to, or None for the
        content field. Keyword/path terms also contain ':' but their
        columns are not in text_cols, so they resolve to None (and keep
        content-field stats — StringField semantics, documented)."""
        if ":" not in term:
            return None
        col = term.split(":", 1)[0]
        return col if col in (self.manifest.config.get("text_cols") or []) else None

    def term_stats(self, terms: list[str]) -> dict[str, TermStats]:
        if not terms:
            return {}
        missing = sorted({t for t in terms if t not in self._term_stats_cache})
        if missing:
            tbl = self._term_stats_ds.to_table(
                filter=pads.field("term").isin(missing),
            )
            found = {
                t: TermStats(int(df), int(ttf))
                for t, df, ttf in zip(
                    tbl.column("term").to_pylist(),
                    tbl.column("doc_freq").to_pylist(),
                    tbl.column("total_term_freq").to_pylist(),
                )
            }
            for t in missing:
                self._term_stats_cache[t] = found.get(t)
        return {
            t: self._term_stats_cache[t]
            for t in terms
            if self._term_stats_cache.get(t) is not None
        }

    @staticmethod
    def _content_terms(terms: list[str]) -> list[str]:
        """Scope a dictionary scan to the content field: keyword-field terms
        are namespaced ``col:value`` (':' never occurs in analyzed tokens),
        and multi-term expansion against the DEFAULT field must not match
        them — per-field term dictionaries, as in Lucene's FieldInfos."""
        return [t for t in terms if ":" not in t]

    def expand_prefix(self, prefix: str, max_terms: int = 65536) -> list[str]:
        """Terms with the given prefix — the AutomatonTermsEnum analog
        (a range scan over the sorted term dictionary)."""
        tbl = self._term_stats_ds.to_table(
            columns=["term"],
            filter=(pads.field("term") >= prefix)
            & (pads.field("term") < prefix + "￿"),
        )
        terms = self._content_terms(
            [t for t in tbl.column("term").to_pylist() if t.startswith(prefix)]
        )
        terms.sort()
        if len(terms) > max_terms:
            raise ValueError(f"prefix '{prefix}' expands to >{max_terms} terms")
        return terms

    def _scan_terms(self, literal_prefix: str = "") -> list[str]:
        """Content-field term-dictionary scan, narrowed to a literal prefix
        range when the pattern provides one (block-tree prefix-seek)."""
        if literal_prefix:
            flt = (pads.field("term") >= literal_prefix) & (
                pads.field("term") < literal_prefix + "￿"
            )
            tbl = self._term_stats_ds.to_table(columns=["term"], filter=flt)
        else:
            tbl = self._term_stats_ds.to_table(columns=["term"])
        return self._content_terms(tbl.column("term").to_pylist())

    def expand_multi_term(self, q, max_terms: int = 65536) -> list[str]:
        """Expand a multi-term query node against the term dictionary."""
        import re as _re

        from lucene_ray.search.query import (
            FuzzyQuery,
            PrefixQuery,
            RegexpQuery,
            TermRangeQuery,
            WildcardQuery,
        )

        if isinstance(q, PrefixQuery):
            return self.expand_prefix(q.prefix, max_terms)
        if isinstance(q, WildcardQuery):
            lit = _re.split(r"[*?]", q.pattern, maxsplit=1)[0]
            rx = _re.compile(
                "".join(
                    ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                    for c in q.pattern
                )
                + r"\Z"
            )
            terms = [t for t in self._scan_terms(lit) if rx.match(t)]
        elif isinstance(q, RegexpQuery):
            m = _re.match(r"[a-z0-9_]*", q.pattern)
            lit = m.group(0) if m else ""
            # a quantifier right after the literal run makes its LAST char
            # optional/repeatable ('ab?c' matches 'ac', 'jo*n' matches 'jn'),
            # so that char cannot be part of the seek prefix
            if lit and len(lit) < len(q.pattern) and q.pattern[len(lit)] in "?*{":
                lit = lit[:-1]
            rx = _re.compile(q.pattern + r"\Z")
            terms = [t for t in self._scan_terms(lit) if rx.match(t)]
        elif isinstance(q, FuzzyQuery):
            terms = [
                t
                for t in self._scan_terms()
                if abs(len(t) - len(q.term)) <= q.max_edits
                and _levenshtein_within(t, q.term, q.max_edits)
            ]
        elif isinstance(q, TermRangeQuery):
            flt = None
            if q.lower is not None:
                op = pads.field("term") >= q.lower if q.include_lower else pads.field("term") > q.lower
                flt = op
            if q.upper is not None:
                op = pads.field("term") <= q.upper if q.include_upper else pads.field("term") < q.upper
                flt = op if flt is None else (flt & op)
            tbl = (
                self._term_stats_ds.to_table(columns=["term"], filter=flt)
                if flt is not None
                else self._term_stats_ds.to_table(columns=["term"])
            )
            terms = self._content_terms(tbl.column("term").to_pylist())
        else:
            raise TypeError(f"not a multi-term query: {q!r}")
        terms.sort()
        if len(terms) > max_terms:
            raise ValueError(f"{q!r} expands to >{max_terms} terms")
        return terms

    # ---- per-segment data ----

    def seg_dir(self, seg: int) -> str:
        return os.path.join(self.index_dir, "postings", f"seg={seg}")

    def _full_seg_dataset(self, seg: int) -> pads.Dataset:
        if seg not in self._seg_ds_cache:
            self._seg_ds_cache[seg] = pads.dataset(self.seg_dir(seg),
                                                   format="parquet")
        return self._seg_ds_cache[seg]

    def _lookup_dataset(self, seg: int, terms: list[str]) -> pads.Dataset | None:
        """Dataset holding all chunk rows the given terms can live in. With
        the bucket layout this opens only the candidate ``bucket=`` dirs
        (term-index analog: a point lookup reads ~n_salts/merge_buckets of
        the segment's bytes); falls back to the whole segment for wide term
        sets or pre-bucket-layout indexes. None = terms cannot exist."""
        from lucene_ray.index.build import term_buckets

        d = self.seg_dir(seg)
        layout = self._bucket_layout.get(seg)
        if layout is None:
            layout = any(
                e.startswith("bucket=") and os.path.isdir(os.path.join(d, e))
                for e in os.listdir(d)
            )
            self._bucket_layout[seg] = layout
        cfg = self.manifest.config
        mb = int(cfg.get("merge_buckets", 64))
        if not layout:
            return self._full_seg_dataset(seg)
        eff_salts = max(1, min(int(cfg.get("n_salts", 8)),
                               int(cfg.get("partitions_per_segment", 8))))
        bs = term_buckets(terms, eff_salts, mb)
        if len(bs) * 2 >= mb:
            return self._full_seg_dataset(seg)
        key = (seg, tuple(sorted(bs)))
        ds = self._bucket_ds_cache.get(key)
        if ds is None:
            dirs = [os.path.join(d, f"bucket={b}") for b in sorted(bs)]
            # pads.dataset() rejects a LIST of directories — expand to files
            files = [
                os.path.join(x, f)
                for x in dirs if os.path.isdir(x)
                for f in sorted(os.listdir(x)) if f.endswith(".parquet")
            ]
            if not files:
                return None
            ds = pads.dataset(files, format="parquet")
            self._bucket_ds_cache[key] = ds
        return ds

    @staticmethod
    def _empty_chunk_table() -> pa.Table:
        return pa.table({"term": pa.array([], pa.string())})

    def postings(self, seg: int, terms: list[str]) -> pa.Table:
        """Chunk rows for the given terms in one segment, ordered by
        (term, min_doc) so salted sub-lists concatenate correctly.
        Per-(seg, term) results are cached for repeated serving."""
        d = self.seg_dir(seg)
        if not os.path.isdir(d) or not terms:
            return None
        want = sorted(set(terms))
        missing = [t for t in want if (seg, t) not in self._postings_cache]
        if missing:
            ds = self._lookup_dataset(seg, missing)
            tbl = (
                ds.to_table(filter=pads.field("term").isin(missing))
                if ds is not None
                else self._empty_chunk_table()
            )
            if len(tbl):
                tbl = tbl.sort_by([("term", "ascending"), ("min_doc", "ascending")])
            terms_col = tbl.column("term").to_pylist() if len(tbl) else []
            # split contiguous term runs into cached slices
            i = 0
            while i < len(terms_col):
                j = i
                while j < len(terms_col) and terms_col[j] == terms_col[i]:
                    j += 1
                self._postings_cache[(seg, terms_col[i])] = tbl.slice(i, j - i)
                i = j
            empty = tbl.slice(0, 0)
            for t in missing:
                self._postings_cache.setdefault((seg, t), empty)
        parts = [self._postings_cache[(seg, t)] for t in want]
        parts = [p for p in parts if len(p)]
        if not parts:
            return self._postings_cache[(seg, want[0])]
        return pa.concat_tables(parts)

    def num_docs(self, seg: int) -> int:
        return self._seg_info[seg]["num_docs"]

    def norms(self, seg: int) -> np.ndarray:
        """uint8 norms for a segment, indexed by segment-local doc id."""
        if seg not in self._norms_cache:
            parts = [
                pq.read_table(docmap_path(self.index_dir, pid), columns=["norm"])
                for pid in self._seg_info[seg]["pids"]
            ]
            self._norms_cache[seg] = np.asarray(
                pa.concat_tables(parts).column("norm"), dtype=np.uint8
            )
        return self._norms_cache[seg]

    def global_doc_ids(self, seg: int) -> np.ndarray:
        """uint64 global doc ids ((pid<<32)|offset), indexed by local id."""
        if seg not in self._docids_cache:
            parts = [
                pq.read_table(docmap_path(self.index_dir, pid), columns=["doc_id"])
                for pid in self._seg_info[seg]["pids"]
            ]
            self._docids_cache[seg] = np.asarray(
                pa.concat_tables(parts).column("doc_id"), dtype=np.uint64
            )
        return self._docids_cache[seg]

    def parents(self, seg: int) -> np.ndarray | None:
        """Ascending segment-local doc ids of block-LAST docs (the parents
        BitSet analog consumed by ToParentBlockJoinQuery), or None when the
        index was built without ``block_col``. Every doc belongs to exactly
        one block, so the last entry always equals num_docs-1."""
        if not self.manifest.config.get("block_col"):
            return None
        if seg not in self._parents_cache:
            parts = [
                pq.read_table(docmap_path(self.index_dir, pid), columns=["block_last"])
                for pid in self._seg_info[seg]["pids"]
            ]
            flags = np.asarray(
                pa.concat_tables(parts).column("block_last"), dtype=np.uint8
            )
            self._parents_cache[seg] = np.flatnonzero(flags).astype(np.int64)
        return self._parents_cache[seg]

    def docvalues(self, seg: int, col: str) -> np.ndarray:
        """Numeric doc-values for a segment, indexed by segment-local doc id
        (NumericDocValues analog, index/NumericDocValues.java): the column
        must be among the index's stored ``id_cols``; read column-pruned
        from the docmap in pid order."""
        key = (seg, col)
        if key not in self._dv_cache:
            parts = [
                pq.read_table(docmap_path(self.index_dir, pid), columns=[col])
                for pid in self._seg_info[seg]["pids"]
            ]
            vals = np.asarray(
                pa.concat_tables(parts).column(col).combine_chunks()
            )
            ups = self._dv_update_rows(col)
            if ups is not None:
                # overlay updateNumericDocValue generations (later wins —
                # generations were appended in order and applied in order)
                vals = vals.copy()
                gids = self.global_doc_ids(seg)
                for up_ids, up_vals in ups:
                    pos = np.searchsorted(gids, up_ids)
                    ok = (pos < len(gids)) & (gids[np.minimum(pos, len(gids) - 1)] == up_ids)
                    vals[pos[ok]] = up_vals[ok]
            self._dv_cache[key] = vals
        return self._dv_cache[key]

    def _dv_update_rows(self, col: str, kind: str = "numeric"):
        """[(sorted global doc_ids, values)] per update generation for
        ``col`` (updateNumericDocValue / updateBinaryDocValue sidecars),
        oldest first; None when the column has no updates of that kind.
        Numeric generations load as int64, binary ones as object (string)
        arrays."""
        gens = [u for u in self.manifest.dv_updates
                if u["col"] == col and u.get("kind", "numeric") == kind]
        if not gens:
            return None
        if not hasattr(self, "_dvu_cache"):
            self._dvu_cache = {}
        out = []
        for u in gens:
            gen = u["gen"]
            if gen not in self._dvu_cache:
                import pyarrow.dataset as pads

                d = os.path.join(self.index_dir, "dv_updates", gen)
                t = pads.dataset(d, format="parquet").to_table(
                    columns=["doc_id", "value"])
                ids = np.asarray(t.column("doc_id"), dtype=np.uint64)
                if kind == "binary":
                    vv = np.asarray(t.column("value").to_pylist(),
                                    dtype=object)
                else:
                    vv = np.asarray(t.column("value"), dtype=np.int64)
                order = np.argsort(ids)
                self._dvu_cache[gen] = (ids[order], vv[order])
            out.append(self._dvu_cache[gen])
        return out

    def numeric_range_docs(self, seg: int, col: str, lower, upper,
                           stats: dict | None = None) -> np.ndarray:
        """Segment-local doc ids with ``lower <= col <= upper``, pruned by
        the docmap's per-row-group min/max statistics — zone maps, the
        chunk-granularity analog of Lucene's BKD point tree
        (lucene/core/src/java/org/apache/lucene/util/bkd/BKDWriter.java:83):
        row groups whose [min, max] lies outside the range are never
        decoded. ``stats`` (optional) receives {"chunks": N, "read": M}.

        A column with doc-values updates bypasses the zone maps entirely —
        the parquet row-group statistics describe the BASE values, so
        pruning on them would wrongly skip updated rows (Lucene similarly
        drops to the updated DocValues instance, not the BKD tree)."""
        if self._dv_update_rows(col) is not None:
            vals = self.docvalues(seg, col)
            mask = np.ones(len(vals), dtype=bool)
            if lower is not None:
                mask &= vals >= lower
            if upper is not None:
                mask &= vals <= upper
            if stats is not None:
                stats.update({"chunks": 0, "read": 0})
            return np.flatnonzero(mask).astype(np.int64)
        base = 0
        out: list[np.ndarray] = []
        n_chunks = n_read = 0
        for pid in self._seg_info[seg]["pids"]:
            pf = pq.ParquetFile(docmap_path(self.index_dir, pid))
            md = pf.metadata
            ncols = md.row_group(0).num_columns if md.num_row_groups else 0
            cidx = next(
                (j for j in range(ncols)
                 if md.row_group(0).column(j).path_in_schema == col),
                None,
            )
            for rg in range(md.num_row_groups):
                nrows = md.row_group(rg).num_rows
                st = (md.row_group(rg).column(cidx).statistics
                      if cidx is not None else None)
                n_chunks += 1
                if st is not None and st.has_min_max:
                    if (upper is not None and st.min > upper) or (
                            lower is not None and st.max < lower):
                        base += nrows
                        continue
                n_read += 1
                vals = np.asarray(
                    pf.read_row_groups([rg], columns=[col]).column(0)
                )
                mask = np.ones(nrows, dtype=bool)
                if lower is not None:
                    mask &= vals >= lower
                if upper is not None:
                    mask &= vals <= upper
                hit = np.flatnonzero(mask)
                if len(hit):
                    out.append(base + hit)
                base += nrows
        if stats is not None:
            stats["chunks"] = n_chunks
            stats["read"] = n_read
        if not out:
            return np.zeros(0, dtype=np.int64)
        return np.concatenate(out).astype(np.int64)

    def tombstones(self) -> np.ndarray:
        if self._tombstones is None:
            from lucene_ray.index.build import load_tombstones

            self._tombstones = load_tombstones(self.index_dir, self.manifest)
        return self._tombstones

    def live_mask(self, seg: int) -> np.ndarray | None:
        """bool[num_docs] live-docs mask for a segment, or None when the
        segment has no deletes (the common case — zero overhead)."""
        if seg not in self._live_cache:
            ts = self.tombstones()
            if len(ts) == 0:
                self._live_cache[seg] = None
            else:
                gids = self.global_doc_ids(seg)
                mask = ~np.isin(gids, ts)
                self._live_cache[seg] = None if mask.all() else mask
        return self._live_cache[seg]

    # ---- stored fields ----

    def docmap_table(self, columns: list[str] | None = None) -> pa.Table:
        parts = [
            pq.read_table(docmap_path(self.index_dir, p["pid"]), columns=columns)
            for p in self.manifest.partitions
        ]
        return pa.concat_tables(parts)

    def lookup_docs(self, global_ids: np.ndarray, columns: list[str] | None = None) -> pa.Table:
        """Materialize docmap rows for specific global doc ids (point gets:
        read only the pids involved, then filter)."""
        ids = np.asarray(global_ids, dtype=np.uint64)
        cols = columns if columns is None else list(dict.fromkeys(["doc_id", *columns]))
        if len(ids) == 0:
            schema = pq.ParquetFile(
                docmap_path(self.index_dir, self.manifest.partitions[0]["pid"])
            ).schema_arrow
            want = cols if cols is not None else schema.names
            return pa.table({
                c: pa.array([], schema.field(c).type) for c in want
            })
        pids = np.unique((ids >> np.uint64(32)).astype(np.int64))
        parts = [
            pq.read_table(docmap_path(self.index_dir, int(pid)), columns=cols)
            for pid in pids
        ]
        tbl = pa.concat_tables(parts)
        mask = pc.is_in(tbl.column("doc_id"), value_set=pa.array(ids, pa.uint64()))
        tbl = tbl.filter(mask)
        # overlay updateBinaryDocValue generations on the materialized
        # stored fields (later generations win, applied in append order)
        bin_cols = {u["col"] for u in self.manifest.dv_updates
                    if u.get("kind") == "binary"
                    and (cols is None or u["col"] in cols)}
        for col in sorted(bin_cols):
            ups = self._dv_update_rows(col, kind="binary")
            if not ups:
                continue
            vals = np.asarray(tbl.column(col).to_pylist(), dtype=object)
            gids = np.asarray(tbl.column("doc_id"), dtype=np.uint64)
            order = np.argsort(gids)
            for up_ids, up_vals in ups:
                pos = np.searchsorted(gids[order], up_ids)
                ok = (pos < len(gids)) & (
                    gids[order][np.minimum(pos, len(gids) - 1)] == up_ids)
                vals[order[pos[ok]]] = up_vals[ok]
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col), col,
                pa.array(vals.tolist(), pa.string()))
        return tbl
