"""Bucket-partitioned postings layout: term lookups open only candidate
bucket directories and return exactly the full-scan chunk rows."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from lucene_ray.index.build import term_buckets
from lucene_ray.index.reader import IndexReader


@pytest.fixture(scope="module")
def reader(built_index):
    index_dir, _, _ = built_index
    return IndexReader(index_dir)


def test_layout_has_bucket_dirs(reader):
    seg0 = reader.seg_dir(reader.segs[0])
    assert any(e.startswith("bucket=") for e in os.listdir(seg0))


def test_bucket_lookup_matches_full_scan(reader):
    for term in ["import", "return", "uniq_1", "zzz_not_a_term", "class"]:
        via_buckets = reader.postings(reader.segs[0], [term])
        full = pads.dataset(reader.seg_dir(reader.segs[0]),
                            format="parquet").to_table(
            filter=pads.field("term") == term
        ).sort_by([("term", "ascending"), ("min_doc", "ascending")])
        if via_buckets is None or len(via_buckets) == 0:
            assert len(full) == 0, term
            continue
        got = via_buckets.select(["term", "chunk", "count", "min_doc"]).to_pydict()
        want = full.select(["term", "chunk", "count", "min_doc"]).to_pydict()
        assert got == want, term


def test_bucket_lookup_opens_fraction_of_files(reader):
    cfg = reader.manifest.config
    mb = int(cfg["merge_buckets"])
    eff = max(1, min(int(cfg["n_salts"]), int(cfg["partitions_per_segment"])))
    bs = term_buckets(["import"], eff, mb)
    assert len(bs) <= eff
    seg0 = reader.seg_dir(reader.segs[0])
    n_buckets = sum(e.startswith("bucket=") for e in os.listdir(seg0))
    # candidate set must be a strict fraction of the present buckets
    assert len(bs) < n_buckets
    ds = reader._lookup_dataset(reader.segs[0], ["import"])
    opened = {os.path.basename(os.path.dirname(f)) for f in ds.files}
    assert opened <= {f"bucket={b}" for b in bs}


def test_search_results_unchanged_on_bucket_layout(built_index):
    from lucene_ray.fixtures import query_to_ast, reference_queries
    from lucene_ray.search.searcher import Searcher

    index_dir, _, corpus_file = built_index
    s = Searcher(IndexReader(index_dir))
    for spec in reference_queries()[:6]:
        q = query_to_ast(spec)
        td = s.search(q, 10)
        assert len(td.doc_ids) > 0, spec


def test_pre_bucket_layout_still_served(built_index, tmp_path):
    """Readers must serve indexes written BEFORE the bucket layout: flatten
    seg=N/bucket=M/* back into seg=N/ and expect identical results."""
    import shutil

    from lucene_ray.fixtures import query_to_ast, reference_queries
    from lucene_ray.search.searcher import Searcher

    index_dir, _, _ = built_index
    flat = str(tmp_path / "flat_idx")
    shutil.copytree(index_dir, flat)
    for seg_entry in os.listdir(os.path.join(flat, "postings")):
        seg_dir = os.path.join(flat, "postings", seg_entry)
        for entry in list(os.listdir(seg_dir)):
            sub = os.path.join(seg_dir, entry)
            if entry.startswith("bucket=") and os.path.isdir(sub):
                bno = entry.split("=", 1)[1]
                for f in os.listdir(sub):
                    os.replace(os.path.join(sub, f),
                               os.path.join(seg_dir, f"b{bno}-{f}"))
                os.rmdir(sub)
    new = Searcher(IndexReader(index_dir))
    old = Searcher(IndexReader(flat))
    for spec in reference_queries()[:8]:
        q = query_to_ast(spec)
        a = new.search(q, 10)
        b = old.search(q, 10)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, err_msg=str(spec))
        np.testing.assert_array_equal(a.scores, b.scores, err_msg=str(spec))
        assert a.total_hits == b.total_hits


def test_legacy_unbucketed_partials_merge(built_index, tmp_path):
    """Stage C must still merge partials written BEFORE the pre-bucketed
    layout (no 'bucket' column, single row group): strip the column from
    every partial, rebuild postings, and expect identical search results."""
    import shutil

    import pyarrow.parquet as pq

    from lucene_ray.fixtures import query_to_ast, reference_queries
    from lucene_ray.index.build import IndexConfig, _run_stage_c
    from lucene_ray.index.manifest import Manifest
    from lucene_ray.search.searcher import Searcher

    index_dir, _, _ = built_index
    legacy = str(tmp_path / "legacy_idx")
    shutil.copytree(index_dir, legacy)
    pdir = os.path.join(legacy, "partials")
    for f in os.listdir(pdir):
        p = os.path.join(pdir, f)
        t = pq.read_table(p)
        pq.write_table(t.drop_columns(["bucket"]), p)
    manifest = Manifest.load(legacy)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in manifest.config.items()})
    _run_stage_c(legacy, manifest, cfg)
    new = Searcher(IndexReader(index_dir))
    old = Searcher(IndexReader(legacy))
    for spec in reference_queries()[:8]:
        q = query_to_ast(spec)
        a = new.search(q, 10)
        b = old.search(q, 10)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids, err_msg=str(spec))
        np.testing.assert_array_equal(a.scores, b.scores, err_msg=str(spec))
