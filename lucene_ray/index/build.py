"""Index build pipeline — the ``IndexWriter`` analog, Ray-Data-first.

Shape (SURVEY.md §3.1 Ray restatement):

    plan partitions (deterministic, from sorted input file list + row groups)
      -> Stage A  map_batches over partition specs:
           read own row groups (column-pruned) -> vectorized invert
           -> write docmap + partial postings parquet per partition (atomic),
           emit metrics                      [DWPT flush analog; resumable]
      -> Stage B  groupby(term) over (term, df, ttf) columns only:
           global term stats                 [collectionStatistics analog]
      -> Stage C  groupby(segment, term, salt).map_groups(merge+encode):
           remap partition offsets to segment-local doc ids, concatenate in
           pid order, chunk + compress + impacts -> postings parquet
                                             [SegmentMerger analog]
      -> manifest generation bump with global stats

Scale notes:
- doc IDs are ``(pid << 32) | offset`` — pure function of the input plan,
  stable under retries (Lucene: ascending docIDs per segment,
  Lucene103PostingsWriter.java:264-267).
- the shuffle payload is *partial postings* (one row per (pid, term)), not
  exploded (doc, term) pairs — the map-side combine that keeps the
  groupby(term) exchange ~|vocab x partitions| instead of |tokens|.
- hot terms (Zipf head: 'import', 'return'...) are salted into contiguous
  pid-range sub-groups whose doc ranges are disjoint, so their encoded chunks
  concatenate without a second pass (SURVEY.md §4 skew row).
- every partition output is written atomically (tmp + rename) and recorded in
  the manifest, so a rerun skips completed partitions — including mid-shuffle,
  because Stage A partials are durable.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Sum

from lucene_ray.codec.postings import CHUNK_SIZE, decode_positions, encode_chunk
from lucene_ray.index.invert import invert_partition
from lucene_ray.index.manifest import Manifest


@dataclass
class IndexConfig:
    content_col: str = "content"
    id_cols: tuple = ("repo", "path", "commit")
    target_rows_per_partition: int = 250_000
    partitions_per_segment: int = 8
    chunk_size: int = CHUNK_SIZE
    hot_df_threshold: int = 1_000_000
    n_salts: int = 8
    with_positions: bool = True
    compute_sha256: bool = True
    max_token_length: int = 255
    stopwords: tuple = ()
    compression: str = "zstd"

    def to_dict(self) -> dict:
        d = asdict(self)
        d["id_cols"] = list(self.id_cols)
        d["stopwords"] = list(self.stopwords)
        return d


def plan_partitions(paths: list[str], cfg: IndexConfig) -> list[dict]:
    """Deterministic partition plan: sorted file list, row groups packed to
    ~target_rows_per_partition. Doc IDs derive from this plan alone."""
    specs: list[dict] = []
    pid = 0
    for path in sorted(paths):
        meta = pq.ParquetFile(path).metadata
        cur_rgs: list[int] = []
        cur_rows = 0
        for rg in range(meta.num_row_groups):
            nrows = meta.row_group(rg).num_rows
            if cur_rows and cur_rows + nrows > cfg.target_rows_per_partition:
                specs.append({"pid": pid, "file": path, "row_groups": cur_rgs, "num_rows": cur_rows})
                pid += 1
                cur_rgs, cur_rows = [], 0
            cur_rgs.append(rg)
            cur_rows += nrows
        if cur_rgs:
            specs.append({"pid": pid, "file": path, "row_groups": cur_rgs, "num_rows": cur_rows})
            pid += 1
    if (
        len(specs) == 1
        and specs[0]["num_rows"] > 2 * cfg.target_rows_per_partition
        and pq.ParquetFile(specs[0]["file"]).metadata.num_row_groups == 1
    ):
        # single huge row group: split by row ranges
        total = specs[0]["num_rows"]
        n_parts = (total + cfg.target_rows_per_partition - 1) // cfg.target_rows_per_partition
        per = (total + n_parts - 1) // n_parts
        file = specs[0]["file"]
        specs = [
            {
                "pid": i,
                "file": file,
                "row_groups": [0],
                "row_range": [i * per, min((i + 1) * per, total)],
                "num_rows": min((i + 1) * per, total) - i * per,
            }
            for i in range(n_parts)
        ]
    return specs


def plan_segments(partitions: list[dict], cfg: IndexConfig) -> list[dict]:
    segs: list[dict] = []
    for pid0 in range(0, len(partitions), cfg.partitions_per_segment):
        pids = [p["pid"] for p in partitions[pid0 : pid0 + cfg.partitions_per_segment]]
        segs.append(
            {
                "seg": len(segs),
                "pids": pids,
                "num_docs": sum(partitions[p]["num_rows"] for p in pids),
            }
        )
    return segs


def _atomic_write_table(table: pa.Table, path: str, compression: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression=compression)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def partials_path(index_dir: str, pid: int) -> str:
    return os.path.join(index_dir, "partials", f"pid={pid:06d}.parquet")


def docmap_path(index_dir: str, pid: int) -> str:
    return os.path.join(index_dir, "docmap", f"pid={pid:06d}.parquet")


class _StageA:
    """Per-partition reader + inverter + writer (stateless task body)."""

    def __init__(self, cfg: IndexConfig, index_dir: str):
        self.cfg = cfg
        self.index_dir = index_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out = {"pid": [], "rows": [], "tokens": [], "terms": []}
        for spec in batch.to_pylist():
            pid = spec["pid"]
            cols = [*cfg.id_cols, cfg.content_col]
            pf = pq.ParquetFile(spec["file"])
            tbl = pf.read_row_groups(spec["row_groups"], columns=cols)
            rr = spec.get("row_range")
            if rr:
                tbl = tbl.slice(rr[0], rr[1] - rr[0])
            content = tbl.column(cfg.content_col)
            partials, lengths, norms = invert_partition(
                content,
                max_token_length=cfg.max_token_length,
                stopwords=frozenset(cfg.stopwords) or None,
                with_positions=cfg.with_positions,
            )
            n = len(tbl)
            offsets = np.arange(n, dtype=np.uint32)
            doc_ids = (np.uint64(pid) << np.uint64(32)) | offsets.astype(np.uint64)
            docmap_cols: dict = {
                "doc_id": pa.array(doc_ids, pa.uint64()),
                "offset": pa.array(offsets, pa.uint32()),
            }
            reserved = {"doc_id", "offset", "sha256", "length", "norm"}
            for c in cfg.id_cols:
                # source columns clashing with engine docmap columns are
                # stored under <name>_orig (e.g. a table's own doc_id)
                docmap_cols[c + "_orig" if c in reserved else c] = tbl.column(c)
            if cfg.compute_sha256:
                # per-row content sha256 — the integrity invariant carried
                # through ingest (north rule)
                ca = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
                docmap_cols["sha256"] = pa.array(
                    [hashlib.sha256(ca[i].as_py().encode()).hexdigest() for i in range(n)],
                    pa.string(),
                )
            docmap_cols["length"] = pa.array(lengths.astype(np.uint32), pa.uint32())
            docmap_cols["norm"] = pa.array(norms, pa.uint8())
            _atomic_write_table(pa.table(docmap_cols), docmap_path(self.index_dir, pid), cfg.compression)

            partials = partials.append_column(
                "pid", pa.array(np.full(len(partials), pid, dtype=np.int32), pa.int32())
            )
            _atomic_write_table(partials, partials_path(self.index_dir, pid), cfg.compression)

            out["pid"].append(pid)
            out["rows"].append(n)
            out["tokens"].append(int(lengths.sum()))
            out["terms"].append(len(partials))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


class _MergeEncode:
    """Per-(segment, term, salt) group merge + chunk encode (map_groups body).

    The SegmentMerger analog: concatenate partial postings in pid order
    (docIDs remapped by the per-pid doc base — MergeState.DocMap equivalent),
    then cut into chunk rows with compressed blocks + impacts.
    """

    def __init__(self, cfg: IndexConfig, doc_base_ref, index_dir: str):
        self.cfg = cfg
        self.doc_base_ref = doc_base_ref
        self._doc_base = None

    @property
    def doc_base(self) -> np.ndarray:
        if self._doc_base is None:
            self._doc_base = ray.get(self.doc_base_ref)
        return self._doc_base

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        order = pc.sort_indices(group.column("pid"))
        group = group.take(order)
        pids = np.asarray(group.column("pid"), dtype=np.int64)
        base = self.doc_base
        docs_parts, freqs_parts, norms_parts, pos_parts = [], [], [], []
        for i in range(len(group)):
            offs = np.asarray(group.column("doc_offsets")[i].values, dtype=np.uint64)
            fr = np.asarray(group.column("freqs")[i].values, dtype=np.uint64)
            nm = np.asarray(group.column("norms")[i].values, dtype=np.int64)
            docs_parts.append(offs + np.uint64(base[pids[i]]))
            freqs_parts.append(fr)
            norms_parts.append(nm)
            if cfg.with_positions:
                pos_parts.append(
                    decode_positions(group.column("pos_enc")[i].as_py(), fr.astype(np.int64))
                )
        docs = np.concatenate(docs_parts)
        freqs = np.concatenate(freqs_parts)
        norms = np.concatenate(norms_parts)
        positions = np.concatenate(pos_parts) if cfg.with_positions else None
        pos_bounds = np.cumsum(freqs.astype(np.int64)) if cfg.with_positions else None

        term = group.column("term")[0].as_py()
        seg = group.column("seg")[0].as_py()
        chunk0 = int(group.column("chunk_base")[0].as_py())
        rows: dict = {
            "seg": [], "term": [], "chunk": [], "count": [],
            "min_doc": [], "max_doc": [], "docs_enc": [], "freqs_enc": [],
            "pos_enc": [], "impact_freqs": [], "impact_norms": [],
        }
        cs = cfg.chunk_size
        n = len(docs)
        for ci, start in enumerate(range(0, n, cs)):
            end = min(start + cs, n)
            if cfg.with_positions:
                p0 = 0 if start == 0 else int(pos_bounds[start - 1])
                p1 = int(pos_bounds[end - 1])
                chunk_pos = positions[p0:p1]
            else:
                chunk_pos = None
            ch = encode_chunk(docs[start:end], freqs[start:end], norms[start:end], chunk_pos)
            rows["seg"].append(seg)
            rows["term"].append(term)
            rows["chunk"].append(chunk0 + ci)
            rows["count"].append(ch.count)
            rows["min_doc"].append(ch.min_doc)
            rows["max_doc"].append(ch.max_doc)
            rows["docs_enc"].append(ch.docs_enc)
            rows["freqs_enc"].append(ch.freqs_enc)
            rows["pos_enc"].append(ch.pos_enc)
            rows["impact_freqs"].append(ch.impact_freqs.tolist())
            rows["impact_norms"].append(ch.impact_norms.tolist())
        return pa.table(
            {
                "seg": pa.array(rows["seg"], pa.int32()),
                "term": pa.array(rows["term"], pa.string()),
                "chunk": pa.array(rows["chunk"], pa.int32()),
                "count": pa.array(rows["count"], pa.int32()),
                "min_doc": pa.array(rows["min_doc"], pa.int64()),
                "max_doc": pa.array(rows["max_doc"], pa.int64()),
                "docs_enc": pa.array(rows["docs_enc"], pa.binary()),
                "freqs_enc": pa.array(rows["freqs_enc"], pa.binary()),
                "pos_enc": pa.array(rows["pos_enc"], pa.binary()),
                "impact_freqs": pa.array(rows["impact_freqs"], pa.list_(pa.int32())),
                "impact_norms": pa.array(rows["impact_norms"], pa.list_(pa.int32())),
            }
        )


def build_index(
    source: str | list[str],
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
) -> Manifest:
    """Build (or resume building) an inverted index over Parquet input."""
    cfg = cfg or IndexConfig()
    paths = [source] if isinstance(source, str) else list(source)
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
        else:
            expanded.append(p)

    manifest = Manifest.try_load(index_dir) if resume else None
    if manifest is None:
        partitions = plan_partitions(expanded, cfg)
        if not partitions:
            raise ValueError(f"no parquet input found under {source}")
        manifest = Manifest(
            index_dir=index_dir,
            config=cfg.to_dict(),
            partitions=partitions,
            segments=plan_segments(partitions, cfg),
        )
        os.makedirs(index_dir, exist_ok=True)
        manifest.save()
    else:
        fresh = plan_partitions(expanded, cfg)
        if [(p["file"], tuple(p["row_groups"]), p["num_rows"]) for p in fresh] != [
            (p["file"], tuple(p["row_groups"]), p["num_rows"]) for p in manifest.partitions
        ]:
            raise ValueError(
                "input changed since the checkpointed build plan; "
                "pass resume=False or a fresh index_dir"
            )

    import time as _time

    stage_seconds = dict(manifest.stats.get("stage_seconds", {}))

    # ---- Stage A: per-partition invert + flush ----
    _t0 = _time.time()
    todo = [p for p in manifest.partitions if str(p["pid"]) not in manifest.partials_done]
    if todo:
        ds = ray.data.from_items(todo)
        metrics = ds.map_batches(
            _StageA(cfg, index_dir), batch_format="pyarrow", batch_size=1, num_cpus=1
        )
        for batch in metrics.iter_batches(batch_format="pyarrow"):
            for row in batch.to_pylist():
                manifest.partials_done[str(row["pid"])] = {
                    "rows": row["rows"],
                    "tokens": row["tokens"],
                    "terms": row["terms"],
                }
            manifest.save()

    if todo:
        stage_seconds["A_invert"] = round(_time.time() - _t0, 2)

    # ---- Stage B: global term stats (the one tiny global shuffle) ----
    partials_dir = os.path.join(index_dir, "partials")
    term_stats_dir = os.path.join(index_dir, "term_stats")
    if not manifest.term_stats_done:
        stats_ds = (
            ray.data.read_parquet(partials_dir, columns=["term", "df", "ttf"])
            .groupby("term")
            .aggregate(
                Sum("df", alias_name="doc_freq"),
                Sum("ttf", alias_name="total_term_freq"),
            )
        )
        tmp = term_stats_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        stats_ds.write_parquet(tmp)
        shutil.rmtree(term_stats_dir, ignore_errors=True)
        os.replace(tmp, term_stats_dir)
        manifest.term_stats_done = True
        stage_seconds["B_term_stats"] = round(_time.time() - _t0 - stage_seconds.get("A_invert", 0), 2)
        manifest.save()

    # ---- Stage C: merge shuffle + encode ----
    postings_dir = os.path.join(index_dir, "postings")
    if not manifest.postings_done:
        n_pids = len(manifest.partitions)
        doc_base_arr = np.zeros(n_pids, dtype=np.int64)
        seg_arr = np.zeros(n_pids, dtype=np.int32)
        pid_pos_arr = np.zeros(n_pids, dtype=np.int32)  # position within segment
        for seg in manifest.segments:
            acc = 0
            for j, pid in enumerate(seg["pids"]):
                doc_base_arr[pid] = acc
                seg_arr[pid] = seg["seg"]
                pid_pos_arr[pid] = j
                acc += manifest.partitions[pid]["num_rows"]

        hot_terms = _load_hot_terms(term_stats_dir, cfg.hot_df_threshold)
        doc_base_ref = ray.put(doc_base_arr)
        pps = cfg.partitions_per_segment
        n_salts = max(1, min(cfg.n_salts, pps))
        # chunk_base gives salted sub-groups disjoint chunk-id ranges so that
        # chunk ids stay unique per (seg, term); ordering at read time is by
        # min_doc, which is globally consistent because salt buckets are
        # contiguous pid ranges.
        max_chunks_per_salt = (
            pps * max(p["num_rows"] for p in manifest.partitions) // cfg.chunk_size + 2
        )

        def add_shuffle_keys(batch: pa.Table) -> pa.Table:
            pids = np.asarray(batch.column("pid"), dtype=np.int64)
            seg = seg_arr[pids]
            if hot_terms:
                is_hot = np.asarray(
                    pc.is_in(batch.column("term"), value_set=pa.array(sorted(hot_terms)))
                )
            else:
                is_hot = np.zeros(len(batch), dtype=bool)
            salt = np.where(is_hot, (pid_pos_arr[pids] * n_salts) // pps, 0).astype(np.int32)
            chunk_base = (salt * max_chunks_per_salt).astype(np.int32)
            batch = batch.append_column("seg", pa.array(seg, pa.int32()))
            batch = batch.append_column("salt", pa.array(salt, pa.int32()))
            batch = batch.append_column("chunk_base", pa.array(chunk_base, pa.int32()))
            return batch

        merger = _MergeEncode(cfg, doc_base_ref, index_dir)

        def merge_encode(group: pa.Table) -> pa.Table:
            return merger(group)

        postings = (
            ray.data.read_parquet(partials_dir)
            .map_batches(add_shuffle_keys, batch_format="pyarrow")
            .groupby(["seg", "term", "salt"])
            .map_groups(merge_encode, batch_format="pyarrow")
        )
        tmp = postings_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        _tc = _time.time()
        postings.write_parquet(tmp, partition_cols=["seg"])
        shutil.rmtree(postings_dir, ignore_errors=True)
        os.replace(tmp, postings_dir)
        manifest.postings_done = True
        stage_seconds["C_merge_encode"] = round(_time.time() - _tc, 2)

    manifest.stats = {
        "doc_count": sum(m["rows"] for m in manifest.partials_done.values()),
        "sum_total_term_freq": sum(m["tokens"] for m in manifest.partials_done.values()),
        "field": cfg.content_col,
        "stage_seconds": stage_seconds,
    }
    manifest.save()
    return manifest


def _load_hot_terms(term_stats_dir: str, threshold: int) -> set[str]:
    import pyarrow.dataset as pads

    dataset = pads.dataset(term_stats_dir, format="parquet")
    tbl = dataset.to_table(
        columns=["term"], filter=pads.field("doc_freq") >= threshold
    )
    return set(tbl.column("term").to_pylist())
