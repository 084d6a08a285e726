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


class IndexReader:
    def __init__(self, index_dir: str, segments: list[int] | None = None):
        self.index_dir = index_dir
        self.manifest = Manifest.load(index_dir)
        all_segs = [s["seg"] for s in self.manifest.segments]
        self.segs = all_segs if segments is None else [s for s in all_segs if s in set(segments)]
        self._seg_info = {s["seg"]: s for s in self.manifest.segments}
        self._norms_cache: dict[int, np.ndarray] = {}
        self._docids_cache: dict[int, np.ndarray] = {}
        self._term_stats_ds = pads.dataset(
            os.path.join(index_dir, "term_stats"), format="parquet"
        )

    # ---- statistics ----

    def collection_stats(self) -> CollectionStats:
        return CollectionStats(
            doc_count=self.manifest.doc_count,
            sum_total_term_freq=self.manifest.sum_total_term_freq,
        )

    def term_stats(self, terms: list[str]) -> dict[str, TermStats]:
        if not terms:
            return {}
        tbl = self._term_stats_ds.to_table(
            filter=pads.field("term").isin(sorted(set(terms))),
        )
        return {
            t: TermStats(int(df), int(ttf))
            for t, df, ttf in zip(
                tbl.column("term").to_pylist(),
                tbl.column("doc_freq").to_pylist(),
                tbl.column("total_term_freq").to_pylist(),
            )
        }

    def expand_prefix(self, prefix: str, max_terms: int = 1024) -> list[str]:
        """Terms with the given prefix — the AutomatonTermsEnum analog
        (a range scan over the sorted term dictionary)."""
        tbl = self._term_stats_ds.to_table(
            columns=["term"],
            filter=(pads.field("term") >= prefix)
            & (pads.field("term") < prefix + "￿"),
        )
        terms = [t for t in tbl.column("term").to_pylist() if t.startswith(prefix)]
        terms.sort()
        if len(terms) > max_terms:
            raise ValueError(f"prefix '{prefix}' expands to >{max_terms} terms")
        return terms

    # ---- per-segment data ----

    def seg_dir(self, seg: int) -> str:
        return os.path.join(self.index_dir, "postings", f"seg={seg}")

    def postings(self, seg: int, terms: list[str]) -> pa.Table:
        """Chunk rows for the given terms in one segment, ordered by
        (term, min_doc) so salted sub-lists concatenate correctly."""
        d = self.seg_dir(seg)
        if not os.path.isdir(d) or not terms:
            return None
        ds = pads.dataset(d, format="parquet")
        tbl = ds.to_table(filter=pads.field("term").isin(sorted(set(terms))))
        if len(tbl) == 0:
            return tbl
        return tbl.sort_by([("term", "ascending"), ("min_doc", "ascending")])

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
        pids = np.unique((ids >> np.uint64(32)).astype(np.int64))
        cols = columns if columns is None else list(dict.fromkeys(["doc_id", *columns]))
        parts = [
            pq.read_table(docmap_path(self.index_dir, int(pid)), columns=cols)
            for pid in pids
        ]
        tbl = pa.concat_tables(parts)
        mask = pc.is_in(tbl.column("doc_id"), value_set=pa.array(ids, pa.uint64()))
        return tbl.filter(mask)
