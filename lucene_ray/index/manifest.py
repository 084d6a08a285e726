"""Generation-numbered index manifest — the ``segments_N`` analog.

Lucene's commit manifest (lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java:55-64,133)
names all live segment files and is written last, atomically, so a crashed
build leaves the previous generation intact. Ours is a JSON file
``manifest-<gen>.json`` plus a ``manifest.json`` pointer (written via
tmp+rename), recording:

- the deterministic partition plan (input file, row groups, row count) —
  doc IDs derive from it, never from task scheduling;
- per-partition stage completion (``partials_done``) + metrics, so a re-run
  skips finished partitions, including mid-shuffle (FIXTURES.md F6);
- segment composition (which partitions, per-partition doc bases);
- global collection stats (doc_count, sum_total_term_freq) for BM25.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any


def _atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@dataclass
class Manifest:
    index_dir: str
    generation: int = 0
    config: dict = field(default_factory=dict)
    partitions: list[dict] = field(default_factory=list)
    # pid -> {"rows": int, "tokens": int, "terms": int}
    partials_done: dict[str, dict] = field(default_factory=dict)
    segments: list[dict] = field(default_factory=list)
    term_stats_done: bool = False
    postings_done: bool = False
    stats: dict = field(default_factory=dict)
    # tombstone generations (dir names under index_dir/tombstones/), each a
    # parquet file set of deleted global doc_ids — the live-docs analog
    # (lucene/core/src/java/org/apache/lucene/index/LiveDocsFormat; deletes
    # buffered in index/BufferedUpdates.java)
    tombstones: list[str] = field(default_factory=list)
    # numeric doc-values update generations (dir names under
    # index_dir/dv_updates/), each a parquet set of (doc_id, value) for ONE
    # column — the IndexWriter.updateNumericDocValue analog
    # (lucene/core/src/java/org/apache/lucene/index/IndexWriter.java
    # updateNumericDocValue; buffered in BufferedUpdates.java). Entries are
    # {"gen": dirname, "col": column}; later generations win per doc.
    dv_updates: list[dict] = field(default_factory=list)

    # ---- persistence ----

    def save(self) -> None:
        self.generation += 1
        payload = {
            "generation": self.generation,
            "config": self.config,
            "partitions": self.partitions,
            "partials_done": self.partials_done,
            "segments": self.segments,
            "term_stats_done": self.term_stats_done,
            "postings_done": self.postings_done,
            "stats": self.stats,
            "tombstones": self.tombstones,
            "dv_updates": self.dv_updates,
        }
        gen_path = os.path.join(self.index_dir, f"manifest-{self.generation:06d}.json")
        _atomic_write_json(gen_path, payload)
        _atomic_write_json(
            os.path.join(self.index_dir, "manifest.json"),
            {"generation": self.generation, "path": os.path.basename(gen_path)},
        )

    @classmethod
    def load(cls, index_dir: str, generation: int | None = None) -> "Manifest":
        """Load the latest commit, or — with ``generation`` — a PINNED older
        commit point (DirectoryReader.open(IndexCommit) semantics): every
        manifest-<gen>.json is retained, so any generation whose data files
        still exist (see ``snapshot_commit``) can serve a point-in-time
        reader, including its own tombstone/dv-update lists."""
        if generation is not None:
            gen_path = os.path.join(index_dir, f"manifest-{generation:06d}.json")
            with open(gen_path) as f:
                payload = json.load(f)
        else:
            ptr_path = os.path.join(index_dir, "manifest.json")
            with open(ptr_path) as f:
                ptr = json.load(f)
            with open(os.path.join(index_dir, ptr["path"])) as f:
                payload = json.load(f)
        m = cls(index_dir=index_dir)
        m.generation = payload["generation"]
        m.config = payload["config"]
        m.partitions = payload["partitions"]
        m.partials_done = payload["partials_done"]
        m.segments = payload["segments"]
        m.term_stats_done = payload["term_stats_done"]
        m.postings_done = payload["postings_done"]
        m.stats = payload["stats"]
        m.tombstones = payload.get("tombstones", [])
        m.dv_updates = payload.get("dv_updates", [])
        return m

    @classmethod
    def try_load(cls, index_dir: str) -> "Manifest | None":
        try:
            return cls.load(index_dir)
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None

    # ---- derived ----

    def doc_base(self) -> dict[int, int]:
        """pid -> segment-local doc id base (cumsum of rows within segment)."""
        base: dict[int, int] = {}
        for seg in self.segments:
            acc = 0
            for pid in seg["pids"]:
                base[pid] = acc
                acc += self.partitions[pid]["num_rows"]
        return base

    def seg_of_pid(self) -> dict[int, int]:
        return {pid: seg["seg"] for seg in self.segments for pid in seg["pids"]}

    @property
    def doc_count(self) -> int:
        return int(self.stats.get("doc_count", 0))

    @property
    def sum_total_term_freq(self) -> int:
        return int(self.stats.get("sum_total_term_freq", 0))

    def field_sum_ttf(self, col: str) -> int:
        """sumTotalTermFreq of an extra text field (IndexConfig.text_cols) —
        the per-field CollectionStatistics piece BM25's avgdl needs."""
        return int(self.stats.get("field_tokens", {}).get(col, 0))
