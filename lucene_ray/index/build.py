"""Index build pipeline — the ``IndexWriter`` analog, Ray-Data-first.

Shape (SURVEY.md §3.1 Ray restatement):

    plan partitions (deterministic, from sorted input file list + row groups)
      -> Stage A  map_batches over partition specs:
           read own row groups (column-pruned) -> vectorized invert
           -> write docmap + partial postings parquet per partition (atomic),
           PRE-BUCKETED: rows sorted by bucket=crc32(term)%merge_buckets with
           one parquet row group per bucket  [DWPT flush analog; resumable]
      -> Stage B  groupby(term) over (term, df, ttf) columns only:
           global term stats                 [collectionStatistics analog]
      -> Stage C  map-side shuffle: one task per (segment, bucket) reads ONLY
           its bucket's row group from each partition file (row-group stats
           pruning — no all-to-all exchange, no sort; the shuffle "write" is
           Stage A's bucketed layout, the "read" is pruned), remaps partition
           offsets to segment-local doc ids, concatenates in pid order,
           chunk + compress + impacts -> postings parquet written directly
           (atomic per (seg,bucket) file)    [SegmentMerger analog]
      -> manifest generation bump with global stats

    Stage C used to be a Ray sort-based ``groupby(seg, bucket).map_groups``
    over the partials dataset. Pre-bucketing at Stage-A write time turns that
    all-to-all exchange into pruned parallel reads (the classic map-side
    shuffle): on a multi-node cluster each (seg,bucket) task reads
    ~1/merge_buckets of its segment's partials from shared storage and
    nothing ever moves through the object store.

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
import json
import os
import shutil
import tempfile
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from lucene_ray.codec.postings import CHUNK_SIZE
from lucene_ray.index.invert import invert_partition, merge_partials, shift_doc_offsets
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
    # store per-occurrence (start_char, length) offsets alongside positions
    # (IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS level)
    with_offsets: bool = False
    # index-time sort: rows of each partition are sorted by these columns
    # (ascending, stable) BEFORE doc-id assignment — the
    # IndexWriterConfig.setIndexSort analog (IndexWriterConfig.java:475);
    # enables early-terminated top-k by the sort field (sorted_field_topk)
    index_sort: tuple = ()
    # index-time doc BLOCKS (IndexWriter.addDocuments, IndexWriter.java:1520):
    # rows of each partition are grouped contiguously by this column's value
    # (a stable sort prepended to index_sort) and the LAST doc of each run is
    # flagged block_last in the docmap — the parents BitSet that
    # ToParentBlockJoinQuery consumes. A key spanning two partitions forms
    # one block per partition (as Lucene bounds blocks by one addDocuments
    # call); keep parents within a partition for exact parent aggregation.
    block_col: str | None = None
    # columns indexed as atomic keyword terms "col:value" in the same
    # postings (StringField/KeywordField analog, document/StringField.java):
    # not analyzed, freq 1, excluded from field length/norms and from the
    # content field's term dictionary scans (per-field term namespaces)
    keyword_cols: tuple = ()
    # additional ANALYZED text fields beyond content_col (TextField — a
    # Lucene Document's many scored fields, e.g. title + body;
    # document/TextField.java). Each column is inverted with the SAME
    # analyzer, its terms namespaced "col:term" in the shared postings
    # (per-field term dictionaries as in FieldInfos), its per-doc norms
    # carried in those postings rows, and its per-field length/norm bytes
    # stored as docmap columns length_<col>/norm_<col>. Per-field
    # sumTotalTermFreq lands in manifest.stats["field_tokens"], so BM25
    # scores field terms with the FIELD's avgdl (per-field
    # CollectionStatistics, as IndexSearcher.collectionStatistics does).
    # Divergence (documented): docCount per field = index doc count (Lucene
    # counts docs that HAVE the field; identical whenever every doc has it).
    text_cols: tuple = ()
    # columns holding '/'-separated taxonomy paths (FacetField with
    # hierarchical dims — facet/taxonomy/TaxonomyReader.java:59): a doc with
    # "a/b/c" is indexed under EVERY ancestor prefix ("col:a", "col:a/b",
    # "col:a/b/c"), so drill-down to any depth is a plain keyword TermQuery
    # and per-level facet counts come from the same postings
    path_cols: tuple = ()
    compute_sha256: bool = True
    max_token_length: int = 255
    stopwords: tuple = ()
    # tokenizer grammar: "code" (pinned ASCII identifier runs), "uax29",
    # "cjk_bigram" (uax29 + CJKBigramFilter semantics — the CJKAnalyzer
    # default chain: overlapping han/hiragana character bigrams), "dict"
    # (multilingual StandardTokenizer behavior — unigram CJK/hiragana,
    # katakana/hangul runs, Unicode alphanumerics; see analysis/tokenizer.py),
    # or "word_delimiter" (WordDelimiterGraphFilter default-flag semantics:
    # camelCase/acronym/letter-digit splits, '_' delimits, possessive 's
    # dropped). "uax29"/"dict" are identical to "code" on pure-ASCII text.
    # Query analysis must use the matching tokenizer (UnicodeTokenizer for
    # "uax29", DictTokenizer with the SAME lexicon for "dict",
    # WordDelimiterTokenizer for "word_delimiter").
    grammar: str = "code"
    # "dict" grammar lexicon: CJK words merged from uax29 unigrams by greedy
    # longest match (the kuromoji/nori/smartcn dictionary-segmentation seam,
    # lucene/analysis/{kuromoji,nori,smartcn}; see analysis/tokenizer.py)
    dict_lexicon: tuple = ()
    # analysis chain after the tokenizer (the TokenFilter zoo seam): a tuple
    # of JSON-able specs — ("porter_stem",), ("ascii_fold",),
    # ("synonyms", {term: [syn, ...]}) — instantiated per Stage-A task via
    # lucene_ray.analysis.filters.build_filters and applied at VOCAB level
    # inside invert_partition. The query side must analyze with the same
    # chain (analysis.filters.AnalyzerChain(token_filters)).
    token_filters: tuple = ()
    # char filters applied BEFORE tokenization with offset correction back
    # to the original stored text (CharFilter.correctOffset —
    # analysis/CharFilter.java; charfilter/BaseCharFilter.java:36-54):
    # ("html_strip",) removes tags + decodes entities
    # (HTMLStripCharFilter), ("mapping", ((src, dst), ...)) is greedy
    # longest-match replacement (MappingCharFilter/NormalizeCharMap).
    # Offsets stored at the +OFFSETS level point into the ORIGINAL column
    # value, so highlighting/snippets over filtered indexes stay exact.
    char_filters: tuple = ()
    # word n-gram sizes injected beside unigrams (ShingleFilter analog —
    # analysis/shingle/ShingleFilter.java): shingles=(2,) adds bigram terms
    # "a b" at the first token's position, outside field length/norms
    # (posInc-0 overlap tokens). Enables exact-bigram filters/speedups the
    # CommonGrams way; no '_' filler across stopword holes (documented)
    shingles: tuple = ()
    # multi-word synonym rules ((src_tokens...), dst_token) applied to the
    # analyzed stream — the index-time SynonymGraphFilter+FlattenGraphFilter
    # chain (synonym/SynonymGraphFilter.java): dst injected at the matched
    # phrase's first position (posInc 0, outside norms), offsets spanning
    # the whole phrase. Single-token outputs only (invert._inject_phrase_synonyms)
    phrase_synonyms: tuple = ()
    # common words for CommonGramsFilter-style '_'-joined bigrams beside
    # unigrams (analysis/commongrams/CommonGramsFilter.java): phrase
    # queries touching these words become single term lookups
    common_grams: tuple = ()
    # per-position integer payloads, DelimitedPayloadTokenFilter style
    # (analysis/payloads/DelimitedPayloadTokenFilter.java:34-49): a token
    # "foo<delim>5" indexes term "foo" with payload 5 at that position
    # (PostingsEnum.getPayload / IndexOptions payload level). Incompatible
    # with stream-mutating filters — validated in invert_partition.
    payload_delimiter: str | None = None
    compression: str = "zstd"
    # codec for the INTERMEDIATE shuffle files (Stage-A partials + hot
    # sidecars): written once, read once by Stage C, then deleted — decode
    # speed matters, size barely does. lz4 decodes several times faster
    # than zstd (read was ~half of Stage-C task time at zstd). Served
    # artifacts (postings, docmap) stay on ``compression``. Parquet stores
    # the codec per column chunk, so resuming a build across a default
    # change is safe.
    partials_compression: str = "lz4"
    # Stage-C hot-term sidecar pre-pass: ON (True) extracts every hot
    # term's rows from each partial ONCE into a tiny sidecar before the
    # merge tasks run — worth it when many tasks per segment would each
    # re-decode the hot home-bucket row groups. OFF (False, default) the
    # merge tasks read hot rows straight from the partials, row-group
    # pruned by home bucket and pid-pruned by salt — with the one-wave
    # auto granularity each task touches ~|hot|/n_tasks home buckets of
    # its own salt's pids, and skipping the extra task round saved ~1.2s
    # of fixed wall at every CPU count (measured, 1M rows / 76 hot terms).
    stage_c_hot_prepass: bool = False
    # docs per inverter slice inside a Stage-A task (bounds the working set)
    invert_slice_docs: int = 1024
    # hash buckets per segment for the merge shuffle (terms per map_groups call)
    merge_buckets: int = 64
    # Stage-C task granularity: each (segment, bucket-range) task reads its
    # whole contiguous range from every partial file ONCE (partials are
    # bucket-sorted), then merges/writes per bucket from memory. 0 = auto:
    # 8 tasks per segment. Per-bucket reads decoded a >=512-row coalesced
    # row group to use a handful of rows — read was 71% of Stage-C CPU time.
    stage_c_buckets_per_task: int = 0

    def to_dict(self) -> dict:
        d = asdict(self)
        d["id_cols"] = list(self.id_cols)
        d["stopwords"] = list(self.stopwords)
        d["index_sort"] = list(self.index_sort)
        d["keyword_cols"] = list(self.keyword_cols)
        d["text_cols"] = list(self.text_cols)
        d["path_cols"] = list(self.path_cols)
        d["token_filters"] = [list(s) for s in self.token_filters]
        d["char_filters"] = [
            list(s) if isinstance(s, (list, tuple)) else s
            for s in self.char_filters
        ]
        d["dict_lexicon"] = list(self.dict_lexicon)
        d["shingles"] = list(self.shingles)
        d["common_grams"] = list(self.common_grams)
        d["phrase_synonyms"] = [
            [list(src) if isinstance(src, (list, tuple)) else [src], dst]
            for src, dst in self.phrase_synonyms
        ]
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


def _atomic_write_table(table: pa.Table, path: str, compression: str,
                        row_group_size: int | None = None) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression=compression,
                       row_group_size=row_group_size)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# golden-ratio mixer separating a hot term's salted sub-groups across
# buckets (shared by the Stage-C shuffle key and the reader's lookup)
_SALT_MIX = 0x9E3779B1


def _crc32_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1), t >> 1)
    return t


_CRC32_TABLE = _crc32_table()


def _term_crc32(terms: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """crc32 per term (int64) — the shared bucket hash (term_buckets).
    Vectorized byte-column-at-a-time over the Arrow string buffers (one
    numpy pass per byte position; zlib-identical, tested): the scalar
    zlib loop with per-term boxing was a top-3 Stage-A cost at 32-way
    concurrency."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    bufs = terms.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[terms.offset: terms.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = np.diff(offs)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    starts = offs[:-1]
    max_len = int(lens.max(initial=0))
    for j in range(max_len):
        active = lens > j
        b = data[starts[active] + j]
        c = crc[active]
        crc[active] = (c >> np.uint32(8)) ^ _CRC32_TABLE[(c ^ b) & np.uint32(0xFF)]
    return (crc ^ np.uint32(0xFFFFFFFF)).astype(np.int64)


def _atomic_write_bucketed(table: pa.Table, path: str, compression: str) -> None:
    """Write a partials table sorted by (bucket, term) with ONE parquet row
    group per bucket, so Stage C's per-(seg,bucket) reads prune to a single
    row group via the footer's bucket min/max stats (the map-side shuffle
    file: sorted + indexed by the shuffle key)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet.tmp")
    os.close(fd)
    try:
        with pq.ParquetWriter(tmp, table.schema, compression=compression) as w:
            if len(table):
                b = np.asarray(table.column("bucket"), dtype=np.int64)
                starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
                ends = np.r_[starts[1:], len(b)]
                # one row group per bucket, except that very small buckets
                # coalesce to >= ~512 rows: tiny zstd frames slow concurrent
                # Stage-A writes, but a LOW floor matters — a high floor
                # makes every Stage-C pruned read decode many buckets to
                # use one (measured 4x Stage-C regression at 4096)
                s0, acc = int(starts[0]), 0
                for s, e in zip(starts, ends):
                    acc += e - s
                    if acc >= 512 or e == len(b):
                        w.write_table(table.slice(s0, int(e) - s0))
                        s0, acc = int(e), 0
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _read_bucket_rows(path: str, bucket: int, merge_buckets: int,
                      terms: list[str] | None = None,
                      bucket_hi: int | None = None) -> pa.Table | None:
    """Rows of one hash bucket — or, with ``bucket_hi``, the contiguous
    range [bucket, bucket_hi) — from a partials file: row-group pruned via
    the bucket column's footer stats. Partials are SORTED by bucket, so a
    range read hits consecutive row groups and is how Stage C amortizes
    footer opens + row-group decode across its whole bucket range (the
    per-single-bucket read decoded a >=512-row coalesced group to use a
    handful of rows — ~14x decode amplification measured at the bench
    vocabulary). Falls back to a full read + in-memory bucket computation
    for pre-bucketed-layout (legacy) partials. With ``terms``, additionally
    filters to those terms (hot-term routing)."""
    b_hi = bucket_hi if bucket_hi is not None else bucket + 1
    pf = pq.ParquetFile(path)
    if "bucket" in pf.schema_arrow.names:
        md = pf.metadata
        ncols = md.row_group(0).num_columns if md.num_row_groups else 0
        bidx = next(
            (j for j in range(ncols)
             if md.row_group(0).column(j).path_in_schema == "bucket"),
            None,
        )
        rgs = []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(bidx).statistics if bidx is not None else None
            if st is None or (st.min < b_hi and bucket <= st.max):
                rgs.append(i)
        if not rgs:
            return None
        tbl = pf.read_row_groups(rgs)
        b = tbl.column("bucket")
        mask = pc.and_(pc.greater_equal(b, bucket), pc.less(b, b_hi))
        if not pc.all(mask).as_py():
            tbl = tbl.filter(mask)
    else:
        tbl = pf.read()
        h = _term_crc32(tbl.column("term")) % merge_buckets
        keep = (h >= bucket) & (h < b_hi)
        tbl = tbl.filter(pa.array(keep))
        tbl = tbl.append_column(
            "bucket", pa.array(h[keep].astype(np.int32), pa.int32()))
        # legacy files are term-sorted, not bucket-sorted; restore the
        # bucket-contiguity invariant range callers slice by
        order = np.argsort(h[keep], kind="stable")
        if len(order) and not np.array_equal(order, np.arange(len(order))):
            tbl = tbl.take(pa.array(order))
    if terms is not None:
        tbl = tbl.filter(
            pc.is_in(tbl.column("term"), value_set=pa.array(sorted(terms)))
        )
    return tbl if len(tbl) else None


def _read_hot_rows(path: str, homes: set[int], merge_buckets: int,
                   terms: list[str]) -> pa.Table | None:
    """Rows of the given ``terms`` from their (scattered) home buckets in
    ONE file open: row groups whose bucket stats cover ANY home, filtered
    to the term set. Partials hold one row per term, so the result is at
    most |terms| rows — the amortized hot-term shuffle fetch (per-route
    single-bucket reads were the dominant Stage-C cost after the range
    read landed)."""
    pf = pq.ParquetFile(path)
    tset = pa.array(sorted(terms))
    if "bucket" in pf.schema_arrow.names:
        md = pf.metadata
        ncols = md.row_group(0).num_columns if md.num_row_groups else 0
        bidx = next(
            (j for j in range(ncols)
             if md.row_group(0).column(j).path_in_schema == "bucket"),
            None,
        )
        rgs = []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(bidx).statistics if bidx is not None else None
            if st is None or any(st.min <= h <= st.max for h in homes):
                rgs.append(i)
        if not rgs:
            return None
        tbl = pf.read_row_groups(rgs)
    else:
        tbl = pf.read()
    tbl = tbl.filter(pc.is_in(tbl.column("term"), value_set=tset))
    return tbl if len(tbl) else None


def term_buckets(terms, n_salts: int, merge_buckets: int) -> set[int]:
    """Candidate hash buckets whose files can hold chunk rows of ``terms``
    (one bucket per possible salt). The reader uses this to open only the
    matching ``bucket=`` directories — the term-index (.tip) analog."""
    import zlib

    out: set[int] = set()
    for t in terms:
        h = zlib.crc32(t.encode())
        for s in range(max(1, n_salts)):
            out.add((h + s * _SALT_MIX) % merge_buckets)
    return out


def partials_path(index_dir: str, pid: int) -> str:
    return os.path.join(index_dir, "partials", f"pid={pid:06d}.parquet")


def docmap_path(index_dir: str, pid: int) -> str:
    return os.path.join(index_dir, "docmap", f"pid={pid:06d}.parquet")


import contextlib


@contextlib.contextmanager
def _no_probe_ramp():
    """Disable Ray Data's per-operator resource reservation around the build
    stages. The streaming executor's reservation policy holds an operator to
    ONE task until the first task completes (it needs an observed output
    size to budget object-store memory). Both build stages emit tiny,
    statically-known outputs (a metrics row per partition; postings go to
    storage directly), so the probe buys nothing — and on a single-wave
    stage (task count == CPU count, the fixed-cluster bench shape) it adds
    one full task duration of dead ramp (~40% of stage wall measured at 32
    CPUs). At real scale (many waves per stage) the probe would amortize,
    but the memory-safety it provides is equally moot here: per-task output
    is O(KB), not O(block)."""
    ctx = ray.data.DataContext.get_current()
    saved = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        ctx.op_resource_reservation_enabled = saved


def _tune_allocators() -> None:
    """Keep freed pages resident in long-lived workers. Root-caused on the
    bench host (BENCH/BASELINE.md "allocator experiment"): pyarrow's default
    jemalloc pool returns every task's LARGE buffers to the OS on free (oversize
    allocations bypass the decay=-1 retention), so every Stage-A/C task
    re-faults ~10^5 pages; on virtualized memory the per-fault cost is both
    slow and erratic (200ms..6s per task for the SAME fault count), which
    was the dominant 32-way scaling noise. Fix: route Arrow through glibc
    (system pool) and pin glibc's trim/mmap thresholds at runtime via
    mallopt so freed memory stays in the process — steady-state fault count
    drops to ZERO (profiled: merge_flt 36k -> 0 after the first build).
    The cost is worker RSS holding its peak working set — bounded by one
    task's buffers, the deliberate trade for fault-free steady state."""
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        libc.mallopt(-1, 2**31 - 1)  # M_TRIM_THRESHOLD: never trim
        libc.mallopt(-3, 2**31 - 1)  # M_MMAP_THRESHOLD: never mmap-per-alloc
        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass
    try:
        pa.jemalloc_set_decay_ms(-1)  # harmless if jemalloc stays unused
    except Exception:
        pass


class _StageA:
    """Per-partition reader + inverter + writer (stateless task body).

    Documents are inverted in slices of ``invert_slice_docs`` and the
    per-slice partials merged (same vectorized merge as Stage C) — this
    bounds the working set so allocator pages are reused across slices
    instead of freshly faulted, which is what lets many concurrent
    inverters scale."""

    def __init__(self, cfg: IndexConfig, index_dir: str):
        self.cfg = cfg
        self.index_dir = index_dir
        self._tuned = False
        # analysis chain instantiated once per task/actor (specs -> objects)
        if cfg.token_filters:
            from lucene_ray.analysis.filters import build_filters

            self._filters = build_filters(cfg.token_filters)
        else:
            self._filters = ()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._tuned:
            _tune_allocators()
            self._tuned = True
        cfg = self.cfg
        out = {"pid": [], "rows": [], "tokens": [], "terms": [], "sec": [],
               "cpu": [], "ftokens": []}
        # env-gated sub-phase profile (scripts/diag_stage_a.py): appends one
        # JSON line per partition to $STAGEA_PROFILE/<pid-of-process>.jsonl
        _prof_dir = os.environ.get("STAGEA_PROFILE")
        for spec in batch.to_pylist():
            _prof: dict = {}
            _pt = time.time()
            _spec_t0 = _pt
            _spec_c0 = time.process_time()
            pid = spec["pid"]
            block = [cfg.block_col] if cfg.block_col else []
            cols = list(dict.fromkeys(
                [*cfg.id_cols, *block, *cfg.index_sort, *cfg.keyword_cols,
                 *cfg.path_cols, *cfg.text_cols, cfg.content_col]
            ))
            if _prof_dir is not None:
                import resource as _res

                _flt = _res.getrusage(_res.RUSAGE_SELF).ru_minflt

            def _mark(name: str) -> None:
                nonlocal _pt, _flt
                if _prof_dir is not None:
                    import resource as _res

                    now = time.time()
                    _prof[name] = _prof.get(name, 0) + int((now - _pt) * 1000)
                    f = _res.getrusage(_res.RUSAGE_SELF).ru_minflt
                    _prof[name + "_flt"] = _prof.get(name + "_flt", 0) + (f - _flt)
                    _flt = f
                    _pt = now

            pf = pq.ParquetFile(spec["file"])
            tbl = pf.read_row_groups(spec["row_groups"], columns=cols)
            rr = spec.get("row_range")
            if rr:
                tbl = tbl.slice(rr[0], rr[1] - rr[0])
            _mark("read")
            sort_cols = [*block, *cfg.index_sort]
            if sort_cols:
                # stable within-partition sort before doc-id assignment
                # (IndexWriterConfig.setIndexSort; Sorter.DocMap remap is
                # implicit — ids are assigned after the sort). block_col
                # leads so each block key's docs are contiguous.
                tbl = tbl.append_column(
                    "__row", pa.array(np.arange(len(tbl)), pa.int64())
                ).sort_by(
                    [(c, "ascending") for c in sort_cols] + [("__row", "ascending")]
                ).drop_columns(["__row"])
            content = tbl.column(cfg.content_col)
            sl = max(64, cfg.invert_slice_docs)
            slice_tables, len_parts, norm_parts = [], [], []
            for s0 in range(0, len(tbl), sl):
                part, lens, nrms = invert_partition(
                    content.slice(s0, min(sl, len(tbl) - s0))
                    if isinstance(content, pa.ChunkedArray)
                    else content.slice(s0, min(sl, len(tbl) - s0)),
                    max_token_length=cfg.max_token_length,
                    stopwords=frozenset(cfg.stopwords) or None,
                    with_positions=cfg.with_positions,
                    with_offsets=cfg.with_offsets,
                    token_filters=self._filters,
                    grammar=cfg.grammar,
                    dict_lexicon=cfg.dict_lexicon,
                    char_filters=cfg.char_filters,
                    shingles=cfg.shingles,
                    phrase_synonyms=cfg.phrase_synonyms,
                    common_grams=cfg.common_grams,
                    payload_delimiter=cfg.payload_delimiter,
                )
                slice_tables.append(shift_doc_offsets(part, s0))
                len_parts.append(lens)
                norm_parts.append(nrms)
            _mark("invert")
            lengths = (
                np.concatenate(len_parts) if len_parts else np.zeros(0, np.int64)
            )
            norms = (
                np.concatenate(norm_parts) if norm_parts else np.zeros(0, np.uint8)
            )
            # extra analyzed text fields (TextField): same inverter, terms
            # namespaced "col:term", the FIELD's own norms in the postings
            # rows (Stage C's impact skylines are therefore field-correct);
            # per-doc scoring reads the norm_<col> docmap column via
            # SegmentContext.norms_for; per-field length/norm in the docmap
            field_lennorm: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            ftok: dict[str, int] = {}
            for fcol in cfg.text_cols:
                fcontent = tbl.column(fcol)
                f_lens, f_norms = [], []
                for s0 in range(0, len(tbl), sl):
                    part, lens_f, nrms_f = invert_partition(
                        fcontent.slice(s0, min(sl, len(tbl) - s0))
                        if isinstance(fcontent, pa.ChunkedArray)
                        else fcontent.slice(s0, min(sl, len(tbl) - s0)),
                        max_token_length=cfg.max_token_length,
                        stopwords=frozenset(cfg.stopwords) or None,
                        with_positions=cfg.with_positions,
                        with_offsets=cfg.with_offsets,
                        token_filters=self._filters,
                        grammar=cfg.grammar,
                        dict_lexicon=cfg.dict_lexicon,
                        char_filters=cfg.char_filters,
                        shingles=cfg.shingles,
                        phrase_synonyms=cfg.phrase_synonyms,
                        common_grams=cfg.common_grams,
                        payload_delimiter=cfg.payload_delimiter,
                    )
                    part = part.set_column(
                        part.schema.get_field_index("term"), "term",
                        pc.binary_join_element_wise(
                            pa.scalar(fcol), part.column("term"),
                            pa.scalar(":")),
                    )
                    slice_tables.append(shift_doc_offsets(part, s0))
                    f_lens.append(lens_f)
                    f_norms.append(nrms_f)
                fl = (np.concatenate(f_lens) if f_lens
                      else np.zeros(0, np.int64))
                fn = (np.concatenate(f_norms) if f_norms
                      else np.zeros(0, np.uint8))
                field_lennorm[fcol] = (fl, fn)
                ftok[fcol] = int(fl.sum())
            if cfg.keyword_cols:
                slice_tables.append(
                    _keyword_partials(tbl, cfg.keyword_cols, norms,
                                      cfg.with_positions, cfg.with_offsets,
                                      bool(cfg.payload_delimiter))
                )
            if cfg.path_cols:
                slice_tables.append(
                    _path_partials(tbl, cfg.path_cols, norms,
                                   cfg.with_positions, cfg.with_offsets,
                                   bool(cfg.payload_delimiter))
                )
            # groups come out already in (bucket, term) shuffle order — the
            # standalone sort+take this folds away was ~15% of task time at
            # 32-way concurrency (fresh take allocations vs the memory path)
            partials = merge_partials(
                slice_tables,
                order_by=lambda d: _term_crc32(d) % max(1, cfg.merge_buckets),
            )
            _mark("merge")
            n = len(tbl)
            offsets = np.arange(n, dtype=np.uint32)
            doc_ids = (np.uint64(pid) << np.uint64(32)) | offsets.astype(np.uint64)
            docmap_cols: dict = {
                "doc_id": pa.array(doc_ids, pa.uint64()),
                "offset": pa.array(offsets, pa.uint32()),
            }
            reserved = {"doc_id", "offset", "sha256", "length", "norm"}
            for c in dict.fromkeys([*cfg.id_cols, *block, *cfg.index_sort]):
                # source columns clashing with engine docmap columns are
                # stored under <name>_orig (e.g. a table's own doc_id)
                docmap_cols[c + "_orig" if c in reserved else c] = tbl.column(c)
            if cfg.block_col:
                # parents bitset analog: last doc of each contiguous block
                # (rows are sorted by block_col above, so each key is one run)
                bv = tbl.column(cfg.block_col)
                if isinstance(bv, pa.ChunkedArray):
                    bv = bv.combine_chunks()
                last = np.ones(n, dtype=bool)
                if n > 1:
                    neq = np.asarray(
                        pc.not_equal(bv.slice(0, n - 1), bv.slice(1, n))
                    )
                    last[: n - 1] = neq
                docmap_cols["block_last"] = pa.array(
                    last.astype(np.uint8), pa.uint8()
                )
            if cfg.compute_sha256:
                # per-row content sha256 — the integrity invariant carried
                # through ingest (north rule). Hash the Arrow UTF-8 data
                # buffer slices directly (zero string materialization —
                # sha256(utf8 bytes) == sha256(s.encode()) by definition);
                # the sha C work is inherent, the copies were not.
                ca = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
                bufs = ca.buffers()
                offs_a = np.frombuffer(bufs[1], dtype=np.int32)[
                    ca.offset: ca.offset + len(ca) + 1
                ]
                mv = memoryview(bufs[2])
                docmap_cols["sha256"] = pa.array(
                    [hashlib.sha256(mv[offs_a[i]:offs_a[i + 1]]).hexdigest()
                     for i in range(n)],
                    pa.string(),
                )
                _mark("sha")
            docmap_cols["length"] = pa.array(lengths.astype(np.uint32), pa.uint32())
            docmap_cols["norm"] = pa.array(norms, pa.uint8())
            for fcol, (fl, fn) in field_lennorm.items():
                docmap_cols[f"length_{fcol}"] = pa.array(
                    fl.astype(np.uint32), pa.uint32())
                docmap_cols[f"norm_{fcol}"] = pa.array(fn, pa.uint8())
            # bounded row groups: the per-row-group min/max stats are the
            # numeric ZONE MAPS NumericRangeQuery prunes with (the
            # chunk-granularity BKD analog, util/bkd/BKDWriter.java:83)
            _atomic_write_table(pa.table(docmap_cols),
                                docmap_path(self.index_dir, pid),
                                cfg.compression, row_group_size=8192)
            _mark("docmap_write")

            partials = partials.append_column(
                "pid", pa.array(np.full(len(partials), pid, dtype=np.int32), pa.int32())
            )
            # map-side shuffle write: bucket = crc32(term) % merge_buckets,
            # rows ALREADY in (bucket, term) order via merge_partials's
            # order_by above — only the bucket column itself is computed
            # here (crc over the unique terms, ~ms), no reorder
            bucket = _term_crc32(partials.column("term")) % max(1, cfg.merge_buckets)
            partials = partials.append_column(
                "bucket", pa.array(bucket.astype(np.int32), pa.int32())
            )
            _mark("bucket_sort")
            _atomic_write_bucketed(partials,
                                   partials_path(self.index_dir, pid),
                                   cfg.partials_compression)
            _mark("partials_write")
            if _prof_dir is not None:
                _prof["pid"] = pid
                _prof["t_start"] = round(_spec_t0, 3)
                _prof["t_end"] = round(time.time(), 3)
                with open(os.path.join(_prof_dir, f"{os.getpid()}.jsonl"), "a") as f:
                    import json as _json

                    f.write(_json.dumps(_prof) + "\n")

            out["pid"].append(pid)
            out["rows"].append(n)
            out["tokens"].append(int(lengths.sum()))
            out["terms"].append(len(partials))
            # per-partition wall ms: lets the scaling harness separate
            # "every task slower" (host/memory) from "stragglers" (skew).
            # cpu ms beside it separates memory-stall inflation (cpu tracks
            # wall) from scheduling/steal starvation (wall >> cpu).
            out["sec"].append(int((time.time() - _spec_t0) * 1000))
            out["cpu"].append(int((time.process_time() - _spec_c0) * 1000))
            out["ftokens"].append(json.dumps(ftok, sort_keys=True))
        return pa.table({
            k: pa.array(v, pa.string() if k == "ftokens" else pa.int64())
            for k, v in out.items()
        })


def _keyword_partials(tbl: pa.Table, keyword_cols: tuple, norms: np.ndarray,
                      with_positions: bool, with_offsets: bool,
                      with_payloads: bool = False) -> pa.Table:
    """Partial-postings rows for keyword fields: one term ``col:value`` per
    distinct value, freq 1 per doc, doc's norm byte carried (keyword terms
    never contribute to field length — StringField semantics). Positions
    are a constant 0 (one vbyte 0x00 per occurrence) so the shared chunk
    machinery needs no special case; offsets likewise (0, 0), payloads 0."""
    parts = {"term": [], "df": [], "ttf": [], "doc_offsets": [], "freqs": [],
             "norms": [], "pos_enc": [], "off_enc": [], "pay_enc": []}
    n = len(tbl)
    for col in keyword_cols:
        vals = tbl.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        d = vals.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = np.asarray(d.indices, dtype=np.int64)
        vocab = d.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")  # docs ascending per value
        c_s = codes[order]
        docs_s = order.astype(np.uint32)
        chg = np.empty(n, dtype=bool)
        if n == 0:
            continue
        chg[0] = True
        chg[1:] = c_s[1:] != c_s[:-1]
        starts = np.flatnonzero(chg)
        counts = np.diff(np.append(starts, n))
        for si, cnt in zip(starts, counts):
            docs = docs_s[si : si + cnt]
            parts["term"].append(f"{col}:{vocab[c_s[si]]}")
            parts["df"].append(int(cnt))
            parts["ttf"].append(int(cnt))
            parts["doc_offsets"].append(docs.tolist())
            parts["freqs"].append([1] * int(cnt))
            parts["norms"].append(norms[docs].tolist())
            parts["pos_enc"].append(b"\x00" * int(cnt) if with_positions else b"")
            parts["off_enc"].append(b"\x00\x00" * int(cnt) if with_offsets else b"")
            parts["pay_enc"].append(b"\x00" * int(cnt) if with_payloads else b"")
    return pa.table(
        {
            "term": pa.array(parts["term"], pa.string()),
            "df": pa.array(parts["df"], pa.int64()),
            "ttf": pa.array(parts["ttf"], pa.int64()),
            "doc_offsets": pa.array(parts["doc_offsets"], pa.list_(pa.uint32())),
            "freqs": pa.array(parts["freqs"], pa.list_(pa.uint32())),
            "norms": pa.array(parts["norms"], pa.list_(pa.uint8())),
            "pos_enc": pa.array(parts["pos_enc"], pa.binary()),
            "off_enc": pa.array(parts["off_enc"], pa.binary()),
            "pay_enc": pa.array(parts["pay_enc"], pa.binary()),
        }
    )


def _path_partials(tbl: pa.Table, path_cols: tuple, norms: np.ndarray,
                   with_positions: bool, with_offsets: bool,
                   with_payloads: bool = False) -> pa.Table:
    """Partial-postings rows for taxonomy path fields: a doc whose ``col``
    value is ``a/b/c`` yields keyword terms ``col:a``, ``col:a/b`` and
    ``col:a/b/c`` (one per ancestor level — the ordinal-per-ancestor
    encoding of Lucene's taxonomy facets, facet/taxonomy/
    TaxonomyReader.java:59 / FacetField), each freq 1, outside field
    length/norms like plain keyword fields."""
    parts = {"term": [], "df": [], "ttf": [], "doc_offsets": [], "freqs": [],
             "norms": [], "pos_enc": [], "off_enc": [], "pay_enc": []}
    n = len(tbl)
    for col in path_cols:
        vals = tbl.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        by_term: dict[str, list[int]] = {}
        for i, v in enumerate(vals.to_pylist()):
            if v is None:
                continue
            segs = str(v).split("/")
            for L in range(1, len(segs) + 1):
                by_term.setdefault(f"{col}:{'/'.join(segs[:L])}", []).append(i)
        for term in sorted(by_term):
            docs = np.asarray(by_term[term], dtype=np.uint32)  # ascending
            cnt = len(docs)
            parts["term"].append(term)
            parts["df"].append(cnt)
            parts["ttf"].append(cnt)
            parts["doc_offsets"].append(docs.tolist())
            parts["freqs"].append([1] * cnt)
            parts["norms"].append(norms[docs].tolist())
            parts["pos_enc"].append(b"\x00" * cnt if with_positions else b"")
            parts["off_enc"].append(b"\x00\x00" * cnt if with_offsets else b"")
            parts["pay_enc"].append(b"\x00" * cnt if with_payloads else b"")
    return pa.table(
        {
            "term": pa.array(parts["term"], pa.string()),
            "df": pa.array(parts["df"], pa.int64()),
            "ttf": pa.array(parts["ttf"], pa.int64()),
            "doc_offsets": pa.array(parts["doc_offsets"], pa.list_(pa.uint32())),
            "freqs": pa.array(parts["freqs"], pa.list_(pa.uint32())),
            "norms": pa.array(parts["norms"], pa.list_(pa.uint8())),
            "pos_enc": pa.array(parts["pos_enc"], pa.binary()),
            "off_enc": pa.array(parts["off_enc"], pa.binary()),
            "pay_enc": pa.array(parts["pay_enc"], pa.binary()),
        }
    )


class _MergeEncode:
    """Bucket-level merge + chunk encode (map_groups body).

    The SegmentMerger analog, amortized: each call receives ALL partial rows
    of one (segment, hash bucket) and merges every (term, salt) group inside
    it — dozens of terms per call, so the per-group scheduling overhead of
    the groupby vanishes. Per group: partial postings are concatenated in
    pid order (docIDs remapped by the per-pid doc base — MergeState.DocMap
    equivalent) and cut into chunk rows.

    Positions are NEVER re-encoded here: each doc's vbyte delta stream is
    self-contained (first position absolute), so merged streams are plain
    byte concatenation, and chunk splits are byte-sliced using a vectorized
    continuation-bit scan.
    """

    def __init__(self, cfg: IndexConfig, doc_base_ref, index_dir: str,
                 deleted_ref=None):
        self.cfg = cfg
        self.doc_base_ref = doc_base_ref
        # pid -> sorted int64 partition-local offsets to EXPUNGE (compaction
        # squeezing tombstoned docs out of the postings, DocIDMerger-with-
        # deletes semantics, SegmentMerger.java:113-171)
        self.deleted_ref = deleted_ref
        self._doc_base = None
        self._deleted = None

    @property
    def doc_base(self) -> np.ndarray:
        if self._doc_base is None:
            r = self.doc_base_ref
            self._doc_base = r if isinstance(r, np.ndarray) else ray.get(r)
        return self._doc_base

    @property
    def deleted(self) -> dict:
        if self.deleted_ref is None:
            return {}
        if self._deleted is None:
            r = self.deleted_ref
            self._deleted = r if isinstance(r, dict) else ray.get(r)
        return self._deleted

    def _row_arrays(self, r, pids, doc_off_col, freqs_col, norms_col, pos_col,
                    off_col, pay_col=None):
        """One partial-postings row's arrays, with tombstoned docs filtered
        out (positions/offsets/payloads byte-sliced per doc — each doc's
        vbyte stream is self-contained, so removal is a gather of byte
        spans)."""
        doc_off = np.asarray(doc_off_col[r].values, dtype=np.int64)
        f = np.asarray(freqs_col[r].values, dtype=np.int64)
        nb = np.asarray(norms_col[r].values, dtype=np.int64)
        posb = pos_col[r].as_py() if pos_col is not None else b""
        offb = off_col[r].as_py() if off_col is not None else b""
        payb = pay_col[r].as_py() if pay_col is not None else b""
        dele = self.deleted.get(int(pids[r]))
        if dele is not None and len(dele):
            keep = ~np.isin(doc_off, dele)
            if not keep.all():
                if pos_col is not None and len(posb):
                    posb = _filter_pos_stream(posb, f, keep)
                if off_col is not None and len(offb):
                    offb = _filter_pos_stream(offb, f * 2, keep)
                if pay_col is not None and len(payb):
                    payb = _filter_pos_stream(payb, f, keep)
                doc_off, f, nb = doc_off[keep], f[keep], nb[keep]
        return doc_off, f, nb, posb, offb, payb

    def __call__(self, group: pa.Table) -> pa.Table:
        from lucene_ray.codec.packing import delta_encode, encode_blocks
        from lucene_ray.codec.postings import competitive_impacts

        cfg = self.cfg
        order = pc.sort_indices(
            group,
            sort_keys=[("term", "ascending"), ("salt", "ascending"), ("pid", "ascending")],
        )
        g = group.take(order)
        terms = g.column("term").to_pylist()
        salts = np.asarray(g.column("salt"), dtype=np.int64)
        pids = np.asarray(g.column("pid"), dtype=np.int64)
        chunk_bases = np.asarray(g.column("chunk_base"), dtype=np.int64)
        seg = int(g.column("seg")[0].as_py()) if len(g) else 0
        doc_off_col = g.column("doc_offsets").combine_chunks()
        freqs_col = g.column("freqs").combine_chunks()
        norms_col = g.column("norms").combine_chunks()
        pos_col = g.column("pos_enc").combine_chunks() if cfg.with_positions else None
        off_col = g.column("off_enc").combine_chunks() if cfg.with_offsets else None
        with_payloads = (getattr(cfg, "payload_delimiter", None)
                         and "pay_enc" in g.schema.names)
        pay_col = g.column("pay_enc").combine_chunks() if with_payloads else None
        base = self.doc_base
        cs = cfg.chunk_size

        rows: dict = {
            "seg": [], "term": [], "chunk": [], "count": [],
            "min_doc": [], "max_doc": [], "docs_enc": [], "freqs_enc": [],
            "pos_enc": [], "off_enc": [], "pay_enc": [],
            "impact_freqs": [], "impact_norms": [],
        }
        n = len(g)
        i = 0
        while i < n:
            j = i
            while j < n and terms[j] == terms[i] and salts[j] == salts[i]:
                j += 1
            docs_l, freqs_l, norms_l, pos_l, off_l, pay_l = [], [], [], [], [], []
            for r in range(i, j):
                d0, f0, n0, p0, o0, y0 = self._row_arrays(
                    r, pids, doc_off_col, freqs_col, norms_col, pos_col,
                    off_col, pay_col
                )
                docs_l.append(d0 + base[pids[r]])
                freqs_l.append(f0)
                norms_l.append(n0)
                pos_l.append(p0)
                off_l.append(o0)
                pay_l.append(y0)
            docs = np.concatenate(docs_l)
            freqs = np.concatenate(freqs_l)
            norms = np.concatenate(norms_l)
            if cfg.with_positions:
                pos_stream = b"".join(pos_l)
                sb = np.frombuffer(pos_stream, dtype=np.uint8)
                value_ends = np.flatnonzero((sb & 0x80) == 0) + 1
                pos_counts = np.cumsum(freqs)
            if cfg.with_offsets:
                off_stream = b"".join(off_l)
                osb = np.frombuffer(off_stream, dtype=np.uint8)
                off_value_ends = np.flatnonzero((osb & 0x80) == 0) + 1
                if not cfg.with_positions:
                    pos_counts = np.cumsum(freqs)
            if with_payloads:
                pay_stream = b"".join(pay_l)
                ysb = np.frombuffer(pay_stream, dtype=np.uint8)
                pay_value_ends = np.flatnonzero((ysb & 0x80) == 0) + 1
                if not cfg.with_positions and not cfg.with_offsets:
                    pos_counts = np.cumsum(freqs)
            total = len(docs)
            if total == 0:
                i = j
                continue  # every posting of this (term, salt) was expunged
            if total > 1 and not (docs[1:] > docs[:-1]).all():
                raise ValueError("docs out of order in merge")  # ordering invariant
            for ci, start in enumerate(range(0, total, cs)):
                end = min(start + cs, total)
                d = docs[start:end]
                f = freqs[start:end]
                nb = norms[start:end]
                if cfg.with_positions:
                    b0 = 0 if start == 0 else int(value_ends[pos_counts[start - 1] - 1])
                    b1 = int(value_ends[pos_counts[end - 1] - 1])
                    chunk_pos = pos_stream[b0:b1]
                else:
                    chunk_pos = b""
                if cfg.with_offsets:
                    # 2 vbyte values (start delta, length) per occurrence
                    ob0 = 0 if start == 0 else int(off_value_ends[2 * pos_counts[start - 1] - 1])
                    ob1 = int(off_value_ends[2 * pos_counts[end - 1] - 1])
                    chunk_off = off_stream[ob0:ob1]
                else:
                    chunk_off = b""
                if with_payloads:
                    # 1 absolute vbyte value per occurrence (like positions)
                    yb0 = 0 if start == 0 else int(pay_value_ends[pos_counts[start - 1] - 1])
                    yb1 = int(pay_value_ends[pos_counts[end - 1] - 1])
                    chunk_pay = pay_stream[yb0:yb1]
                else:
                    chunk_pay = b""
                imp_f, imp_n = competitive_impacts(f, nb)
                rows["seg"].append(seg)
                rows["term"].append(terms[i])
                rows["chunk"].append(int(chunk_bases[i]) + ci)
                rows["count"].append(end - start)
                rows["min_doc"].append(int(d[0]))
                rows["max_doc"].append(int(d[-1]))
                rows["docs_enc"].append(encode_blocks(delta_encode(d.astype(np.uint64))))
                rows["freqs_enc"].append(encode_blocks(f.astype(np.uint64)))
                rows["pos_enc"].append(chunk_pos)
                rows["off_enc"].append(chunk_off)
                rows["pay_enc"].append(chunk_pay)
                rows["impact_freqs"].append(imp_f.tolist())
                rows["impact_norms"].append(imp_n.tolist())
            i = j
        bucket = int(g.column("bucket")[0].as_py()) if len(g) else 0
        return pa.table(
            {
                "seg": pa.array(rows["seg"], pa.int32()),
                "bucket": pa.array([bucket] * len(rows["seg"]), pa.int32()),
                "term": pa.array(rows["term"], pa.string()),
                "chunk": pa.array(rows["chunk"], pa.int32()),
                "count": pa.array(rows["count"], pa.int32()),
                "min_doc": pa.array(rows["min_doc"], pa.int64()),
                "max_doc": pa.array(rows["max_doc"], pa.int64()),
                "docs_enc": pa.array(rows["docs_enc"], pa.binary()),
                "freqs_enc": pa.array(rows["freqs_enc"], pa.binary()),
                "pos_enc": pa.array(rows["pos_enc"], pa.binary()),
                "off_enc": pa.array(rows["off_enc"], pa.binary()),
                "pay_enc": pa.array(rows["pay_enc"], pa.binary()),
                "impact_freqs": pa.array(rows["impact_freqs"], pa.list_(pa.int32())),
                "impact_norms": pa.array(rows["impact_norms"], pa.list_(pa.int32())),
            }
        )


def _filter_pos_stream(stream: bytes, freqs: np.ndarray, keep: np.ndarray) -> bytes:
    """Drop the position runs of non-kept docs from a concatenated vbyte
    stream. Vectorized: value boundaries via the continuation-bit scan,
    per-doc byte spans from the (unfiltered) freqs, one gather."""
    from lucene_ray.search.executor import _ranges_concat

    sb = np.frombuffer(stream, dtype=np.uint8)
    value_ends = np.flatnonzero((sb & 0x80) == 0) + 1  # byte end per value
    ends_v = np.cumsum(freqs)  # value-index end per doc
    byte_ends = value_ends[ends_v - 1]
    byte_starts = np.concatenate([[0], byte_ends[:-1]])
    idx = _ranges_concat(byte_starts[keep], byte_ends[keep])
    return sb[idx].tobytes()


def _field_tokens_sum(manifest: Manifest) -> dict:
    """Per-text-field sumTotalTermFreq across partitions (for per-field
    avgdl — the per-field CollectionStatistics analog)."""
    totals: dict[str, int] = {}
    for m in manifest.partials_done.values():
        for col, n in (m.get("ftokens") or {}).items():
            totals[col] = totals.get(col, 0) + int(n)
    return totals


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
        # one block per partition: task count == partition count, so the
        # scheduler balances waves instead of fusing several partitions
        # into one long task (from_items defaults to ~num_cpus blocks)
        with _no_probe_ramp():
            ds = ray.data.from_items(todo, override_num_blocks=len(todo))
            metrics = ds.map_batches(
                _StageA(cfg, index_dir), batch_format="pyarrow", batch_size=1,
                num_cpus=1,
            )
            for batch in metrics.iter_batches(batch_format="pyarrow"):
                for row in batch.to_pylist():
                    manifest.partials_done[str(row["pid"])] = {
                        "rows": row["rows"],
                        "tokens": row["tokens"],
                        "terms": row["terms"],
                        "ms": row.get("sec", 0),
                        "cpu_ms": row.get("cpu", 0),
                        "ftokens": json.loads(row.get("ftokens") or "{}"),
                    }
                manifest.save()

    if todo:
        stage_seconds["A_invert"] = round(_time.time() - _t0, 2)

    # ---- Stage B: global term stats (tiny; driver fast path when small) ----
    if not manifest.term_stats_done:
        _tb = _time.time()
        _run_stage_b(index_dir, manifest)
        stage_seconds["B_term_stats"] = round(_time.time() - _tb, 2)

    # ---- Stage C: merge shuffle + encode ----
    if not manifest.postings_done:
        _tc = _time.time()
        _run_stage_c(index_dir, manifest, cfg)
        stage_seconds["C_merge_encode"] = round(_time.time() - _tc, 2)

    manifest.stats = {
        "doc_count": sum(m["rows"] for m in manifest.partials_done.values()),
        "sum_total_term_freq": sum(m["tokens"] for m in manifest.partials_done.values()),
        "field": cfg.content_col,
        "field_tokens": _field_tokens_sum(manifest),
        "stage_seconds": stage_seconds,
    }
    manifest.save()
    return manifest


def add_documents(index_dir: str, source: str | list[str]) -> Manifest:
    """Incremental build — the NRT refresh analog (SURVEY §2.11).

    New input files become new partitions (pids continue after the existing
    plan) grouped into NEW segments; Stage A runs only for them, term stats
    are re-aggregated (global stats must see the new docs), and Stage C runs
    only over the new partials, writing additional ``seg=N`` directories.
    Existing segment postings are untouched; readers see the new docs at the
    next manifest generation (DirectoryReader.openIfChanged analog).

    Crash-safe by repair-on-reentry: partitions may be registered in the
    manifest before their data exists (doc ids derive from the plan, so
    registration is deterministic), and every re-entry detects and re-runs
    incomplete stages — pids missing from ``partials_done`` re-run Stage A,
    segments whose ``seg=N`` postings dir is absent re-run Stage C — instead
    of returning early on the known-files check."""
    manifest = Manifest.load(index_dir)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in manifest.config.items()})
    paths = [source] if isinstance(source, str) else list(source)
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet"))
        else:
            expanded.append(p)
    known_files = {p["file"] for p in manifest.partitions}
    new_files = [f for f in expanded if f not in known_files]
    # repair detection: a previous add may have crashed after registering
    # partitions/segments but before writing their data
    stale_parts = [p for p in manifest.partitions
                   if str(p["pid"]) not in manifest.partials_done]
    missing_seg_pids = [
        pid
        for s in manifest.segments
        if not os.path.isdir(os.path.join(index_dir, "postings", f"seg={s['seg']}"))
        for pid in s["pids"]
    ]
    if not new_files and not stale_parts and not missing_seg_pids:
        return manifest

    new_parts = []
    if new_files:
        base_pid = len(manifest.partitions)
        new_parts = plan_partitions(new_files, cfg)
        for i, p in enumerate(new_parts):
            p["pid"] = base_pid + i
        manifest.partitions.extend(new_parts)
        base_seg = 1 + max((s["seg"] for s in manifest.segments), default=-1)
        for pid0 in range(0, len(new_parts), cfg.partitions_per_segment):
            group = new_parts[pid0 : pid0 + cfg.partitions_per_segment]
            manifest.segments.append(
                {
                    "seg": base_seg + pid0 // cfg.partitions_per_segment,
                    "pids": [p["pid"] for p in group],
                    "num_docs": sum(p["num_rows"] for p in group),
                }
            )
        manifest.term_stats_done = False
        manifest.save()

    # Stage A for new + previously-registered-but-incomplete partitions
    todo_parts = stale_parts + new_parts
    if todo_parts:
        ds = ray.data.from_items(todo_parts, override_num_blocks=len(todo_parts))
        metrics = ds.map_batches(
            _StageA(cfg, index_dir), batch_format="pyarrow", batch_size=1, num_cpus=1
        )
        for batch in metrics.iter_batches(batch_format="pyarrow"):
            for row in batch.to_pylist():
                manifest.partials_done[str(row["pid"])] = {
                    "rows": row["rows"], "tokens": row["tokens"], "terms": row["terms"],
                    "ftokens": json.loads(row.get("ftokens") or "{}"),
                }
            manifest.save()
        manifest.term_stats_done = False

    # Stage B rebuild (global stats must include the new docs)
    if not manifest.term_stats_done:
        _run_stage_b(index_dir, manifest)

    # Stage C over new partials + any segment whose postings dir is missing
    todo_pids = sorted(
        set(missing_seg_pids) | {p["pid"] for p in new_parts}
    )
    if todo_pids:
        _run_stage_c(index_dir, manifest, cfg, only_pids=todo_pids, append=True)
    manifest.stats = {
        "doc_count": sum(m["rows"] for m in manifest.partials_done.values()),
        "sum_total_term_freq": sum(m["tokens"] for m in manifest.partials_done.values()),
        "field": cfg.content_col,
        "field_tokens": _field_tokens_sum(manifest),
        "stage_seconds": manifest.stats.get("stage_seconds", {}),
    }
    manifest.save()
    return manifest


_ADDIDX_COMPAT_KEYS = (
    "content_col", "grammar", "dict_lexicon", "token_filters", "stopwords",
    "max_token_length", "with_positions", "with_offsets", "keyword_cols",
    "path_cols", "text_cols", "char_filters", "shingles", "phrase_synonyms", "common_grams", "index_sort", "block_col",
    "compute_sha256", "merge_buckets", "id_cols", "payload_delimiter",
)


def add_indexes(index_dir: str, source_index_dirs: list[str]) -> Manifest:
    """Merge other lucene_ray indexes into this one — the
    ``IndexWriter.addIndexes(Directory...)`` analog
    (lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:3191:
    "Adds all segments from an array of indexes into this index").

    Analysis/layout configs must be compatible (same tokenizer grammar,
    filter chain, postings options and merge_buckets — validated, like
    addIndexes requiring consistent field semantics). The merge is
    metadata + column rewrites, not re-tokenization: each source
    partition's durable Stage-A artifacts are re-pid'd into the
    destination (docmap ``doc_id`` and partials ``pid`` columns rewritten
    in parallel Ray tasks; doc offsets are partition-local so nothing else
    changes), source segments join the manifest under fresh seg ids, the
    source's tombstones / dv-update sidecars are remapped, then Stage B
    re-aggregates global stats and Stage C encodes ONLY the new segments
    (reusing the merge operator, exactly as compaction does)."""
    manifest = Manifest.load(index_dir)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in manifest.config.items()})

    def _norm(v):
        return list(v) if isinstance(v, tuple) else v

    new_pids_all: list[int] = []
    new_seg_ids: list[int] = []
    rewrite_specs: list[dict] = []
    for src_dir in source_index_dirs:
        src = Manifest.load(src_dir)
        for k in _ADDIDX_COMPAT_KEYS:
            if _norm(src.config.get(k)) != _norm(manifest.config.get(k)):
                raise ValueError(
                    f"incompatible index config {k!r}: "
                    f"{src.config.get(k)!r} != {manifest.config.get(k)!r}"
                )
        if not src.postings_done:
            raise ValueError(f"source index {src_dir} is not fully built")
        base_pid = len(manifest.partitions)
        pid_map = {p["pid"]: base_pid + i
                   for i, p in enumerate(src.partitions)}
        for p in src.partitions:
            q = dict(p)
            q["pid"] = pid_map[p["pid"]]
            manifest.partitions.append(q)
            manifest.partials_done[str(q["pid"])] = dict(
                src.partials_done.get(str(p["pid"]), {"rows": p["num_rows"],
                                                      "tokens": 0, "terms": 0})
            )
            rewrite_specs.append({
                "src_dir": src_dir, "old_pid": p["pid"], "new_pid": q["pid"],
            })
            new_pids_all.append(q["pid"])
        base_seg = 1 + max((s["seg"] for s in manifest.segments), default=-1)
        for j, s in enumerate(src.segments):
            manifest.segments.append({
                "seg": base_seg + j,
                "pids": [pid_map[pid] for pid in s["pids"]],
                "num_docs": s["num_docs"],
            })
            new_seg_ids.append(base_seg + j)
        # tombstones / dv updates: remap the pid half of each global doc_id
        for kind, entries in (("tombstones", src.tombstones),
                              ("dv_updates", src.dv_updates)):
            for ent in entries:
                gen_name = ent if kind == "tombstones" else ent["gen"]
                src_d = os.path.join(src_dir, kind, gen_name)
                if not os.path.isdir(src_d):
                    continue
                import pyarrow.dataset as pads

                t = pads.dataset(src_d, format="parquet").to_table()
                gids = np.asarray(t.column("doc_id"), dtype=np.uint64)
                old_pid = (gids >> np.uint64(32)).astype(np.int64)
                off = gids & np.uint64(0xFFFFFFFF)
                remap = np.array([pid_map[int(p)] for p in
                                  np.unique(old_pid)], dtype=np.uint64)
                lut = dict(zip(np.unique(old_pid).tolist(), remap.tolist()))
                new_gid = (np.array([lut[int(p)] for p in old_pid],
                                    dtype=np.uint64) << np.uint64(32)) | off
                t = t.set_column(t.schema.get_field_index("doc_id"),
                                 "doc_id", pa.array(new_gid, pa.uint64()))
                if kind == "tombstones":
                    n = 1 + max((int(x.split("-")[-1])
                                 for x in manifest.tombstones),
                                default=manifest.generation)
                    gen2 = f"ts-{n:06d}"
                else:
                    n = 1 + max((int(e["gen"].split("-")[-1])
                                 for e in manifest.dv_updates),
                                default=manifest.generation)
                    gen2 = f"dvu-{n:06d}"
                dst_d = os.path.join(index_dir, kind, gen2)
                os.makedirs(dst_d + ".tmp", exist_ok=True)
                pq.write_table(t, os.path.join(dst_d + ".tmp", "part-0.parquet"))
                shutil.rmtree(dst_d, ignore_errors=True)
                os.replace(dst_d + ".tmp", dst_d)
                if kind == "tombstones":
                    manifest.tombstones.append(gen2)
                else:
                    manifest.dv_updates.append({**ent, "gen": gen2})

    if not rewrite_specs:
        return manifest

    class _Repid:
        """Per-partition column rewrite: docmap doc_id gets the new pid in
        its high half; partials pid column is replaced. Bucket-sorted row
        groups are preserved (Stage C's pruned reads rely on them)."""

        def __init__(self, dst_dir: str, compression: str):
            self.dst = dst_dir
            self.compression = compression
            self._tuned = False

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not self._tuned:
                _tune_allocators()
                self._tuned = True
            done = []
            for spec in batch.to_pylist():
                src_dir, old_pid, new_pid = (spec["src_dir"],
                                             spec["old_pid"], spec["new_pid"])
                dm = pq.read_table(docmap_path(src_dir, old_pid))
                off = np.asarray(dm.column("offset"), dtype=np.uint64)
                gid = (np.uint64(new_pid) << np.uint64(32)) | off
                dm = dm.set_column(dm.schema.get_field_index("doc_id"),
                                   "doc_id", pa.array(gid, pa.uint64()))
                _atomic_write_table(dm, docmap_path(self.dst, new_pid),
                                    self.compression, row_group_size=8192)
                pt = pq.read_table(partials_path(src_dir, old_pid))
                pt = pt.set_column(
                    pt.schema.get_field_index("pid"), "pid",
                    pa.array(np.full(len(pt), new_pid, dtype=np.int32),
                             pa.int32()),
                )
                _atomic_write_bucketed(pt, partials_path(self.dst, new_pid),
                                       self.compression)
                done.append(new_pid)
            return pa.table({"pid": pa.array(done, pa.int64())})

    with _no_probe_ramp():
        ds = ray.data.from_items(rewrite_specs,
                                 override_num_blocks=len(rewrite_specs))
        for _ in ds.map_batches(_Repid(index_dir, cfg.compression),
                                batch_format="pyarrow",
                                batch_size=1, num_cpus=1).iter_batches():
            pass

    manifest.term_stats_done = False
    manifest.save()
    _run_stage_b(index_dir, manifest)
    _run_stage_c(index_dir, manifest, cfg, only_pids=new_pids_all, append=True)
    manifest.stats = {
        "doc_count": sum(m["rows"] for m in manifest.partials_done.values()),
        "sum_total_term_freq": sum(m["tokens"] for m in manifest.partials_done.values()),
        "field": cfg.content_col,
        "field_tokens": _field_tokens_sum(manifest),
        "stage_seconds": manifest.stats.get("stage_seconds", {}),
    }
    manifest.save()
    return manifest


def delete_by_term(index_dir: str, col: str, values: list,
                   invert: bool = False) -> Manifest:
    """Delete every document whose stored field ``col`` is in ``values``
    (``invert=True``: whose value is NOT in ``values`` — the complement
    delete PKIndexSplitter's DocumentFilteredLeafIndexReader applies) —
    the ``IndexWriter.deleteDocuments(Term...)`` analog
    (lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1694).

    Deletes are TOMBSTONES: a parquet set of global doc_ids written as a new
    tombstone generation and applied as a live-docs mask at query time
    (LiveDocsFormat semantics). Collection/term statistics intentionally
    still include deleted docs until segments are rewritten — exactly
    Lucene's behavior, so scores of surviving docs do not move on delete.

    The matching scan is distributed (column-pruned map_batches over the
    docmap files); the driver never holds the matched ids."""
    manifest = Manifest.load(index_dir)
    docmap_dir = os.path.join(index_dir, "docmap")
    # source columns that clash with engine docmap columns were stored
    # under <name>_orig (see _StageA); resolve the user-facing name
    reserved = {"doc_id", "offset", "sha256", "length", "norm"}
    phys_col = col + "_orig" if col in reserved else col
    ds = ray.data.read_parquet(docmap_dir, columns=["doc_id", phys_col])
    val_arr = pa.array(sorted(set(values)))

    def match(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(phys_col), value_set=val_arr)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask).select(["doc_id"])

    gen_name = f"ts-{manifest.generation + 1:06d}"
    out_dir = os.path.join(index_dir, "tombstones", gen_name)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.map_batches(match, batch_format="pyarrow").write_parquet(tmp)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    manifest.tombstones.append(gen_name)
    manifest.save()
    return manifest


def update_binary_docvalue(index_dir: str, key_col: str, key_values: list,
                           field: str, value: str) -> Manifest:
    """Set STRING stored-field ``field`` to ``value`` for every doc whose
    ``key_col`` is in ``key_values`` — the
    ``IndexWriter.updateBinaryDocValue(Term, field, value)`` analog
    (IndexWriter.java; same BufferedUpdates generation path as numeric
    updates). The sidecar overlays the docmap column in ``lookup_docs``
    (stored-field materialization); postings/norms/statistics untouched."""
    manifest = Manifest.load(index_dir)
    docmap_dir = os.path.join(index_dir, "docmap")
    reserved = {"doc_id", "offset", "sha256", "length", "norm"}
    phys_col = key_col + "_orig" if key_col in reserved else key_col
    ds = ray.data.read_parquet(docmap_dir, columns=["doc_id", phys_col])
    val_arr = pa.array(sorted(set(key_values)))

    def match(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(phys_col), value_set=val_arr)
        hit = batch.filter(mask).select(["doc_id"])
        return hit.append_column(
            "value", pa.array([value] * len(hit), pa.string())
        )

    gen_name = f"dvu-{manifest.generation + 1:06d}"
    out_dir = os.path.join(index_dir, "dv_updates", gen_name)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.map_batches(match, batch_format="pyarrow").write_parquet(tmp)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    manifest.dv_updates.append(
        {"gen": gen_name, "col": field, "kind": "binary"})
    manifest.save()
    return manifest


def update_numeric_docvalue(index_dir: str, key_col: str, key_values: list,
                            field: str, value) -> Manifest:
    """Set numeric doc-values column ``field`` to ``value`` for every doc
    whose stored field ``key_col`` is in ``key_values`` — the
    ``IndexWriter.updateNumericDocValue(Term, field, value)`` analog
    (lucene/core/src/java/org/apache/lucene/index/IndexWriter.java; deletes
    and dv updates share the BufferedUpdates path there). Like deletes,
    updates are a GENERATION sidecar: a parquet set of (doc_id, value)
    overlaid on the base column at read time; postings, norms and
    statistics are untouched (exactly Lucene's contract — only the
    doc-values read path changes). Later generations win per doc. The
    matching scan is distributed; the driver never holds matched ids."""
    manifest = Manifest.load(index_dir)
    docmap_dir = os.path.join(index_dir, "docmap")
    reserved = {"doc_id", "offset", "sha256", "length", "norm"}
    phys_col = key_col + "_orig" if key_col in reserved else key_col
    ds = ray.data.read_parquet(docmap_dir, columns=["doc_id", phys_col])
    val_arr = pa.array(sorted(set(key_values)))

    def match(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(phys_col), value_set=val_arr)
        hit = batch.filter(mask).select(["doc_id"])
        return hit.append_column(
            "value", pa.array(np.full(len(hit), value, dtype=np.int64))
        )

    gen_name = f"dvu-{manifest.generation + 1:06d}"
    out_dir = os.path.join(index_dir, "dv_updates", gen_name)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.map_batches(match, batch_format="pyarrow").write_parquet(tmp)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    manifest.dv_updates.append({"gen": gen_name, "col": field})
    manifest.save()
    return manifest


def upsert_documents(index_dir: str, source: str | list[str],
                     key_col: str) -> Manifest:
    """Delete-then-add keyed by ``key_col`` — the
    ``IndexWriter.updateDocument(Term, doc)`` analog (IndexWriter.java:1844):
    docs in ``source`` replace any existing docs sharing their key; the new
    versions become visible at the next manifest generation."""
    paths = [source] if isinstance(source, str) else list(source)
    keys: set = set()
    for p in paths:
        files = (
            [os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")]
            if os.path.isdir(p)
            else [p]
        )
        for f in files:
            keys.update(pq.read_table(f, columns=[key_col]).column(key_col).to_pylist())
    delete_by_term(index_dir, key_col, sorted(keys))
    return add_documents(index_dir, source)


def sorted_field_topk(index_dir: str, col: str, k: int = 10) -> pa.Table:
    """Top-k rows by the leading index-sort column WITHOUT a global sort:
    each partition's docmap is already stored in sort order, so only its
    first k rows are read (one leading batch per partition) and the tiny
    partials are merged — the early-termination payoff of index-time
    sorting (BWS-style, TopFieldCollector over a sorted index)."""
    manifest = Manifest.load(index_dir)
    sort_cols = manifest.config.get("index_sort") or []
    if not sort_cols or sort_cols[0] != col:
        raise ValueError(f"index is not sorted by leading column {col!r} "
                         f"(index_sort={sort_cols})")
    parts = []
    for p in manifest.partitions:
        pf = pq.ParquetFile(docmap_path(index_dir, p["pid"]))
        # read ONLY the leading rows of the sorted partition
        for batch in pf.iter_batches(batch_size=k, columns=[col, "doc_id"]):
            parts.append(pa.Table.from_batches([batch]))
            break
    merged = pa.concat_tables(parts)
    order = pc.sort_indices(
        merged, sort_keys=[(col, "ascending"), ("doc_id", "ascending")]
    )
    return merged.take(order[:k])


def load_tombstones(index_dir: str, manifest: Manifest | None = None) -> np.ndarray:
    """All deleted global doc_ids (sorted uint64; empty if none)."""
    manifest = manifest or Manifest.load(index_dir)
    parts = []
    for gen_name in manifest.tombstones:
        d = os.path.join(index_dir, "tombstones", gen_name)
        if os.path.isdir(d):
            import pyarrow.dataset as pads

            parts.append(
                np.asarray(
                    pads.dataset(d, format="parquet").to_table(columns=["doc_id"])
                    .column("doc_id"),
                    dtype=np.uint64,
                )
            )
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def snapshot_commit(index_dir: str) -> int:
    """Pin the CURRENT commit generation so its data files survive future
    compactions — the SnapshotDeletionPolicy analog (lucene/core/src/java/
    org/apache/lucene/index/SnapshotDeletionPolicy.java): every generation
    manifest is retained anyway; snapshotting additionally protects the
    segment files it references from the merge-time delete. Returns the
    pinned generation; open it with ``IndexReader(dir, generation=g)``."""
    manifest = Manifest.load(index_dir)
    snaps = _load_snapshots(index_dir)
    if manifest.generation not in snaps:
        snaps.append(manifest.generation)
    _save_snapshots(index_dir, snaps)
    return manifest.generation


def release_snapshot(index_dir: str, generation: int) -> None:
    """Unpin a snapshot; its files become deletable at the next compaction
    (IndexDeletionPolicy release semantics)."""
    snaps = [g for g in _load_snapshots(index_dir) if g != generation]
    _save_snapshots(index_dir, snaps)


def _load_snapshots(index_dir: str) -> list[int]:
    p = os.path.join(index_dir, "snapshots.json")
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return list(json.load(f))


def _save_snapshots(index_dir: str, snaps: list[int]) -> None:
    p = os.path.join(index_dir, "snapshots.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(set(snaps)), f)
    os.replace(tmp, p)


def _snapshot_protected_segs(index_dir: str) -> set[int]:
    """Segment ids referenced by any pinned snapshot generation."""
    out: set[int] = set()
    for g in _load_snapshots(index_dir):
        try:
            m = Manifest.load(index_dir, generation=g)
        except FileNotFoundError:
            continue
        out.update(s["seg"] for s in m.segments)
    return out


def compact_segments(index_dir: str, seg_ids: list[int],
                     expunge_deletes: bool = True) -> Manifest:
    """Merge segments into one — the TieredMergePolicy/SegmentMerger analog
    (SURVEY §3.3). Like Lucene, compaction REUSES the build's merge+encode
    operator: it re-runs Stage C over the durable Stage-A partials of the
    chosen segments and swaps the manifest. Global doc ids are unchanged
    (they derive from (pid, offset)), so search results are identical.

    With ``expunge_deletes`` (default), tombstoned docs are squeezed out of
    the merged postings (SegmentMerger's delete compaction). Global doc ids
    stay stable, so the docmap keeps its rows and the tombstone mask remains
    in force for non-postings paths (MatchAll / stored-field scans) — the
    postings just stop carrying dead entries."""
    manifest = Manifest.load(index_dir)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in manifest.config.items()})
    chosen = [s for s in manifest.segments if s["seg"] in set(seg_ids)]
    if len(chosen) < 2:
        return manifest
    keep = [s for s in manifest.segments if s["seg"] not in set(seg_ids)]
    merged_pids = sorted(pid for s in chosen for pid in s["pids"])
    new_seg_id = max(s["seg"] for s in manifest.segments) + 1
    merged = {
        "seg": new_seg_id,
        "pids": merged_pids,
        "num_docs": sum(manifest.partitions[p]["num_rows"] for p in merged_pids),
    }
    manifest.segments = keep + [merged]
    deleted_map = None
    if expunge_deletes:
        ts = load_tombstones(index_dir, manifest)
        if len(ts):
            ts_pid = (ts >> np.uint64(32)).astype(np.int64)
            ts_off = (ts & np.uint64(0xFFFFFFFF)).astype(np.int64)
            sel = np.isin(ts_pid, np.asarray(merged_pids, dtype=np.int64))
            deleted_map = {
                int(p): np.sort(ts_off[sel][ts_pid[sel] == p])
                for p in np.unique(ts_pid[sel])
            }
    _run_stage_c(index_dir, manifest, cfg, only_pids=merged_pids, append=True,
                 deleted=deleted_map)
    # write-manifest-LAST for the new state, but BEFORE deleting superseded
    # data: a crash here leaves either (old manifest + old dirs intact) or
    # (new manifest + stale old dirs as harmless garbage) — never a durable
    # manifest referencing deleted postings (SegmentInfos two-phase commit
    # semantics, SegmentInfos.java:55-64)
    manifest.save()
    # snapshotted commits keep their segment files alive (the reference-
    # counting of IndexFileDeleter under SnapshotDeletionPolicy)
    protected = _snapshot_protected_segs(index_dir)
    for sid in seg_ids:
        if sid in protected:
            continue
        shutil.rmtree(os.path.join(index_dir, "postings", f"seg={sid}"),
                      ignore_errors=True)
    return manifest


# partial-postings rows below this use the driver-side Arrow aggregate
# (one small read beats a whole Ray execution); above it, the distributed
# groupby(term) path runs
_STAGE_B_DRIVER_MAX_ROWS = 5_000_000


def _run_stage_b(index_dir: str, manifest: Manifest) -> None:
    partials_dir = os.path.join(index_dir, "partials")
    term_stats_dir = os.path.join(index_dir, "term_stats")
    tmp = term_stats_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)

    total_rows = sum(m.get("terms", 0) for m in manifest.partials_done.values())
    if total_rows and total_rows <= _STAGE_B_DRIVER_MAX_ROWS:
        import pyarrow.dataset as pads

        tbl = pads.dataset(partials_dir, format="parquet").to_table(
            columns=["term", "df", "ttf"]
        )
        agg = tbl.group_by("term").aggregate([("df", "sum"), ("ttf", "sum")])
        agg = agg.rename_columns(["term", "doc_freq", "total_term_freq"])
        agg = agg.sort_by("term")
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(agg, os.path.join(tmp, "term_stats.parquet"))
    else:
        from ray.data.aggregate import Sum as _Sum

        stats_ds = (
            ray.data.read_parquet(partials_dir, columns=["term", "df", "ttf"])
            .groupby("term")
            .aggregate(
                _Sum("df", alias_name="doc_freq"),
                _Sum("ttf", alias_name="total_term_freq"),
            )
        )
        stats_ds.write_parquet(tmp)
    shutil.rmtree(term_stats_dir, ignore_errors=True)
    os.replace(tmp, term_stats_dir)
    manifest.term_stats_done = True
    manifest.save()


class _StageCTask:
    """Map-side shuffle reducer: one call per (segment, bucket) spec.

    Reads ONLY its bucket's row group from each of the segment's partial
    files (footer-stats pruning — the shuffle fetch), routes hot terms by
    their salted buckets (each salt covers a contiguous pid range, so the
    fetch is pid-pruned too), merge+encodes via the shared _MergeEncode
    kernel, and writes its ``seg=N/bucket=M/part-0.parquet`` directly
    (atomic). Nothing but the tiny spec and metric rows crosses the object
    store — the SegmentMerger analog without an all-to-all exchange."""

    def __init__(self, cfg: IndexConfig, index_dir: str, out_root: str, ctx_ref):
        self.cfg = cfg
        self.index_dir = index_dir
        self.out_root = out_root
        self.ctx_ref = ctx_ref
        self._ctx = None
        self._merger = None
        self._hot_set = None
        self._tuned = False  # tune lazily IN the worker (instance is pickled)

    @property
    def ctx(self) -> dict:
        if self._ctx is None:
            c = self.ctx_ref
            self._ctx = c if isinstance(c, dict) else ray.get(c)
            self._merger = _MergeEncode(
                self.cfg, self._ctx["doc_base"], self.index_dir,
                self._ctx["deleted"] or None,
            )
            if self._ctx["hot"]:
                self._hot_set = pa.array(sorted(t for t, _ in self._ctx["hot"]))
        return self._ctx

    def _with_keys(self, t: pa.Table, seg: int, salt: int, b: int) -> pa.Table:
        n = len(t)
        if "bucket" in t.column_names:
            t = t.drop_columns(["bucket"])
        cb = salt * self.ctx["max_chunks_per_salt"]
        t = t.append_column("seg", pa.array(np.full(n, seg, np.int32), pa.int32()))
        t = t.append_column("salt", pa.array(np.full(n, salt, np.int32), pa.int32()))
        t = t.append_column("chunk_base", pa.array(np.full(n, cb, np.int32), pa.int32()))
        t = t.append_column("bucket", pa.array(np.full(n, b, np.int32), pa.int32()))
        return t

    def _one(self, seg: int, b: int, b_hi: int | None = None) -> int:
        # env-gated sub-phase profile (scripts/diag_stage_a.py --stage c)
        _prof_dir = os.environ.get("STAGEC_PROFILE")
        _prof: dict = {}
        _pt = time.time()

        def _mark(name: str) -> None:
            nonlocal _pt
            if _prof_dir is not None:
                now = time.time()
                _prof[name] = _prof.get(name, 0) + int((now - _pt) * 1000)
                _pt = now

        ctx = self.ctx
        B = ctx["merge_buckets"]
        n_salts = ctx["n_salts"]
        pid_pos, pps = ctx["pid_pos"], ctx["parts_per_seg"]
        pids = ctx["seg_pids"][seg]
        b_hi = b_hi if b_hi is not None else b + 1
        # ONE range read per partial file for the whole bucket range (the
        # shuffle fetch), then per-bucket slices from memory — amortizes
        # footer opens and row-group decode across the task's buckets
        # (read was 71% of Stage-C CPU time as per-bucket reads)
        range_parts: list[pa.Table] = []
        for pid in pids:
            t = _read_bucket_rows(partials_path(self.index_dir, pid), b, B,
                                  bucket_hi=b_hi)
            if t is None:
                continue
            if self._hot_set is not None:
                # hot terms are routed by their SALTED bucket below; their
                # home-bucket rows are excluded here so each (term, pid)
                # posting is encoded exactly once
                mask = pc.is_in(t.column("term"), value_set=self._hot_set)
                if pc.any(mask).as_py():
                    t = t.filter(pc.invert(mask))
            if len(t):
                range_parts.append(t.combine_chunks())
        # per-part bucket boundaries: parts are bucket-sorted, so each
        # bucket's rows are ONE contiguous zero-copy slice per part
        edges = [
            np.searchsorted(np.asarray(t.column("bucket"), dtype=np.int64),
                            np.arange(b, b_hi + 1))
            for t in range_parts
        ]
        # hot-term prefetch, ONE read per pid for the whole range: which
        # (term, salt) pairs land in [b, b_hi), which pid serves each salt,
        # and each term's home bucket to prune the read by
        hot_tbls: dict[int, pa.Table] = {}
        hot_routes: dict[int, list[tuple[str, int, int]]] = {}
        if ctx["hot"]:
            per_pid_terms: dict[int, set[str]] = {}
            per_pid_homes: dict[int, set[int]] = {}
            for term, h in ctx["hot"]:
                for s in range(n_salts):
                    tb = (h + s * _SALT_MIX) % B
                    if not (b <= tb < b_hi):
                        continue
                    hot_routes.setdefault(tb, []).append((term, s, h % B))
                    for pid in pids:
                        if (pid_pos[pid] * n_salts) // max(1, pps[pid]) == s:
                            per_pid_terms.setdefault(pid, set()).add(term)
                            per_pid_homes.setdefault(pid, set()).add(h % B)
            hot_dir = ctx.get("hot_dir")
            for pid, terms in per_pid_terms.items():
                if hot_dir is not None:
                    # sidecar written by the hot pre-pass: <=|hot| rows,
                    # one cheap decode instead of the partial file's
                    # scattered home-bucket row groups
                    p = os.path.join(hot_dir, f"pid={pid:06d}.parquet")
                    if not os.path.exists(p):
                        continue
                    # row-group pruned by the term-sorted sidecar's stats:
                    # decodes only the ~|terms in range| rows it needs
                    t = pq.read_table(
                        p, filters=[("term", "in", sorted(terms))])
                    if len(t):
                        hot_tbls[pid] = t
                    continue
                t = _read_hot_rows(partials_path(self.index_dir, pid),
                                   per_pid_homes[pid], B, sorted(terms))
                if t is not None:
                    hot_tbls[pid] = t
        _mark("read")
        total_chunks = 0
        for bucket in range(b, b_hi):
            parts: list[pa.Table] = []
            for t, e in zip(range_parts, edges):
                lo, hi = int(e[bucket - b]), int(e[bucket - b + 1])
                if hi > lo:
                    parts.append(
                        self._with_keys(t.slice(lo, hi - lo), seg, 0, bucket))
            for term, s, _home in sorted(hot_routes.get(bucket, [])):
                tset = pa.array([term])
                for pid in pids:
                    if (pid_pos[pid] * n_salts) // max(1, pps[pid]) != s:
                        continue
                    ht = hot_tbls.get(pid)
                    if ht is None:
                        continue
                    t = ht.filter(pc.is_in(ht.column("term"), value_set=tset))
                    if len(t):
                        parts.append(self._with_keys(t, seg, s, bucket))
            _mark("slice")
            if not parts:
                continue
            enc = self._merger(pa.concat_tables(parts))
            _mark("encode")
            if not len(enc):
                continue
            # hive layout: seg/bucket live in the path, not the file
            # (matches the write_parquet(partition_cols=...) layout)
            enc = enc.drop_columns(["seg", "bucket"])
            _atomic_write_table(
                enc,
                os.path.join(self.out_root, f"seg={seg}",
                             f"bucket={bucket}", "part-0.parquet"),
                self.cfg.compression,
            )
            _mark("write")
            total_chunks += len(enc)
        if _prof_dir is not None:
            _prof["seg"], _prof["bucket"] = seg, b
            with open(os.path.join(_prof_dir, f"{os.getpid()}.jsonl"), "a") as f:
                import json as _json

                f.write(_json.dumps(_prof) + "\n")
        return total_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._tuned:
            _tune_allocators()  # fault-free steady state (see docstring)
            self._tuned = True
        out = {"seg": [], "bucket": [], "chunks": []}
        for spec in batch.to_pylist():
            n = self._one(int(spec["seg"]), int(spec["bucket"]),
                          int(spec["bucket_hi"]) if "bucket_hi" in spec
                          and spec["bucket_hi"] is not None else None)
            out["seg"].append(int(spec["seg"]))
            out["bucket"].append(int(spec["bucket"]))
            out["chunks"].append(n)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def _plan_stage_c(index_dir: str, manifest: Manifest, cfg: IndexConfig,
                  only_pids: list[int] | None = None,
                  deleted: dict | None = None,
                  n_cpus: int | None = None) -> tuple[list[dict], dict]:
    """Pure (no-Ray) planning half of Stage C: returns (specs, ctx).

    Split out so scripts/microbench_invert.py's ``--body-full`` twin can run
    the IDENTICAL merge work under plain multiprocessing — same cost-balanced
    (segment, bucket-range) specs, same shared ctx — making the
    pipeline-vs-no-Ray scaling comparison cover the whole build, not just
    Stage A. ``n_cpus`` overrides the live-cluster CPU count the auto
    granularity sizes one wave against."""
    import zlib

    n_pids = len(manifest.partitions)
    doc_base_arr = np.zeros(n_pids, dtype=np.int64)
    pid_pos_arr = np.zeros(n_pids, dtype=np.int32)
    parts_per_seg = np.zeros(n_pids, dtype=np.int32)
    seg_pids: dict[int, list[int]] = {}
    for seg in manifest.segments:
        acc = 0
        seg_pids[seg["seg"]] = list(seg["pids"])
        for j, pid in enumerate(seg["pids"]):
            doc_base_arr[pid] = acc
            pid_pos_arr[pid] = j
            parts_per_seg[pid] = len(seg["pids"])
            acc += manifest.partitions[pid]["num_rows"]
    if only_pids is not None:
        # callers always pass whole segments (new segments, repaired
        # segments, or a compaction's merged segment)
        want = set(only_pids)
        seg_pids = {s: ps for s, ps in seg_pids.items() if want & set(ps)}

    term_stats_dir = os.path.join(index_dir, "term_stats")
    hot_terms = _load_hot_terms(term_stats_dir, cfg.hot_df_threshold)
    n_salts = max(1, min(cfg.n_salts, cfg.partitions_per_segment))
    max_chunks_per_salt = int(
        cfg.partitions_per_segment
        * max(p["num_rows"] for p in manifest.partitions)
        // cfg.chunk_size
        + 2
    )
    merge_buckets = max(1, cfg.merge_buckets)

    ctx = {
        "doc_base": doc_base_arr,
        "pid_pos": pid_pos_arr,
        "parts_per_seg": parts_per_seg,
        "seg_pids": seg_pids,
        "hot": [(t, zlib.crc32(t.encode())) for t in sorted(hot_terms)],
        "n_salts": n_salts,
        "max_chunks_per_salt": max_chunks_per_salt,
        "merge_buckets": merge_buckets,
        "deleted": deleted or {},
        "hot_dir": None,
    }
    if cfg.stage_c_buckets_per_task:
        bpt = cfg.stage_c_buckets_per_task
        specs = [
            {"seg": s, "bucket": b, "bucket_hi": min(b + bpt, merge_buckets)}
            for s in sorted(seg_pids)
            for b in range(0, merge_buckets, bpt)
        ]
    else:
        # auto granularity: ONE wave of ~n_cpus tasks. Each task range-reads
        # every partial file of its segment ONCE, so fewer/larger tasks
        # amortize the shuffle fetch (measured: at 8 CPUs, 8 tasks beat 32
        # tasks 7.3s vs 10.5s; at 32 CPUs, 32 tasks beat 128 tasks 3.7s vs
        # 8.2s — task count ≈ CPU count wins at every level). Range
        # boundaries are COST-BALANCED from the partials' footer metadata
        # (per-row-group rows + bucket stats — no data read): with one wave,
        # stage wall == slowest task, so equal-rows ranges beat equal-width
        # ones whenever bucket sizes skew. At very large partition counts
        # this driver-side footer scan becomes its own tiny map round.
        if n_cpus is None:
            try:
                n_cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                n_cpus = 8
        n_segs = max(1, len(seg_pids))
        tasks_per_seg = max(1, min(merge_buckets,
                                   -(-max(n_segs, n_cpus) // n_segs)))
        specs = []
        for s in sorted(seg_pids):
            w = np.zeros(merge_buckets, dtype=np.int64)
            for pid in seg_pids[s]:
                try:
                    md = pq.ParquetFile(
                        partials_path(index_dir, pid)).metadata
                    names = md.schema.names
                    bi = names.index("bucket") if "bucket" in names else -1
                    if bi < 0:
                        continue
                    wf = np.zeros(merge_buckets, dtype=np.float64)
                    for rg in range(md.num_row_groups):
                        col = md.row_group(rg).column(bi)
                        st = col.statistics
                        n = md.row_group(rg).num_rows
                        if st and st.has_min_max:
                            lo = min(int(st.min), merge_buckets - 1)
                            hi = min(int(st.max), merge_buckets - 1)
                        else:
                            lo, hi = 0, merge_buckets - 1
                        # small buckets coalesce into one row group
                        # (see _atomic_write_bucketed): spread its rows
                        # uniformly over the [min, max] bucket stats
                        wf[lo:hi + 1] += n / float(hi - lo + 1)
                    w += wf.astype(np.int64)
                except Exception:
                    w += 1  # unreadable footer: fall back toward uniform
            cum = np.cumsum(w, dtype=np.float64)
            total = float(cum[-1]) if len(cum) else 0.0
            if total <= 0:
                edges = np.linspace(0, merge_buckets,
                                    tasks_per_seg + 1).astype(int)
            else:
                targets = total * np.arange(1, tasks_per_seg) / tasks_per_seg
                inner = np.searchsorted(cum, targets) + 1
                edges = np.unique(np.r_[0, inner, merge_buckets])
            for lo, hi in zip(edges[:-1], edges[1:]):
                if hi > lo:
                    specs.append({"seg": s, "bucket": int(lo),
                                  "bucket_hi": int(hi)})
    return specs, ctx


def _run_stage_c(index_dir: str, manifest: Manifest, cfg: IndexConfig,
                 only_pids: list[int] | None = None, append: bool = False,
                 deleted: dict | None = None) -> None:
    """The merge stage, parameterized so incremental builds and compaction
    reuse it over a subset of partitions. A map-side shuffle (module
    docstring): Stage A already wrote partials pre-bucketed by
    crc32(term) % merge_buckets, so this stage is one pruned-read +
    merge+encode + direct-write task per (segment, bucket) — no all-to-all
    exchange, no sort, no postings bytes through the object store."""
    postings_dir = os.path.join(index_dir, "postings")
    specs, ctx = _plan_stage_c(index_dir, manifest, cfg, only_pids, deleted)
    merge_buckets = ctx["merge_buckets"]

    # hot pre-pass: extract every hot term's row from each partial file ONCE
    # into a tiny per-pid sidecar (<=|hot| rows). Without it, every
    # (seg, bucket-range) task re-decoded the scattered home-bucket row
    # groups of every pid it routes from — tasks_per_seg x the decode.
    hot_dir = None
    if ctx["hot"] and cfg.stage_c_hot_prepass:
        hot_dir = os.path.join(index_dir, "hot_spill")
        shutil.rmtree(hot_dir, ignore_errors=True)
        os.makedirs(hot_dir, exist_ok=True)
        homes = {crc % merge_buckets for _, crc in ctx["hot"]}
        hot_sorted = sorted(t for t, _ in ctx["hot"])
        all_pids = sorted({p for ps in ctx["seg_pids"].values() for p in ps})
        idir, hdir = index_dir, hot_dir

        def _extract(batch: pa.Table) -> pa.Table:
            done = []
            for pid in batch.column("pid").to_pylist():
                t = _read_hot_rows(partials_path(idir, pid), homes,
                                   merge_buckets, hot_sorted)
                if t is not None:
                    # term-sorted + tiny row groups: hot rows are the
                    # heaviest in the index (that is why they are salted),
                    # so consumers must be able to term-prune the decode
                    t = t.sort_by("term")
                    _atomic_write_table(
                        t, os.path.join(hdir, f"pid={pid:06d}.parquet"),
                        cfg.partials_compression, row_group_size=4)
                done.append(pid)
            return pa.table({"pid": pa.array(done, pa.int64())})

        with _no_probe_ramp():
            for _ in ray.data.from_items(
                [{"pid": p} for p in all_pids],
                override_num_blocks=len(all_pids),
            ).map_batches(
                _extract, batch_format="pyarrow", batch_size=1, num_cpus=1,
            ).iter_batches(batch_format="pyarrow"):
                pass
        ctx["hot_dir"] = hot_dir

    ctx_ref = ray.put(ctx)
    tmp = postings_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    with _no_probe_ramp():
        metrics = ray.data.from_items(
            specs, override_num_blocks=len(specs)
        ).map_batches(
            _StageCTask(cfg, index_dir, tmp, ctx_ref),
            batch_format="pyarrow", batch_size=1, num_cpus=1,
        )
        for _ in metrics.iter_batches(batch_format="pyarrow"):
            pass
    if append:
        os.makedirs(postings_dir, exist_ok=True)
        for d in os.listdir(tmp):
            dst = os.path.join(postings_dir, d)
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(os.path.join(tmp, d), dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(postings_dir, ignore_errors=True)
        os.replace(tmp, postings_dir)
    if hot_dir is not None:
        shutil.rmtree(hot_dir, ignore_errors=True)
    manifest.postings_done = True


def _load_hot_terms(term_stats_dir: str, threshold: int) -> set[str]:
    import pyarrow.dataset as pads

    dataset = pads.dataset(term_stats_dir, format="parquet")
    tbl = dataset.to_table(
        columns=["term"], filter=pads.field("doc_freq") >= threshold
    )
    return set(tbl.column("term").to_pylist())
