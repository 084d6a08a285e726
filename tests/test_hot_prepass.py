"""Stage-C hot-term sidecar pre-pass parity: building postings with
``stage_c_hot_prepass=True`` must produce BIT-IDENTICAL postings to the
default direct-read path (the claim recorded in BENCH/BASELINE.md)."""

import os
import shutil

import pyarrow.dataset as pads
import pytest


def _postings_table(index_dir):
    """Every postings row across all segments, canonically sorted."""
    t = pads.dataset(os.path.join(index_dir, "postings"),
                     format="parquet", partitioning="hive").to_table()
    order = [(c, "ascending") for c in ("seg", "term", "min_doc", "chunk")
             if c in t.column_names]
    return t.sort_by(order)


@pytest.fixture(scope="module")
def prepass_index(built_index, tmp_path_factory):
    from lucene_ray.index.build import IndexConfig, _run_stage_c
    from lucene_ray.index.manifest import Manifest

    index_dir, _, _ = built_index
    twin = str(tmp_path_factory.mktemp("prepass") / "idx")
    shutil.copytree(index_dir, twin)
    shutil.rmtree(os.path.join(twin, "postings"), ignore_errors=True)
    manifest = Manifest.load(twin)
    cfg = IndexConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in manifest.config.items()})
    cfg.stage_c_hot_prepass = True
    _run_stage_c(twin, manifest, cfg)
    return twin


def test_prepass_branch_actually_ran(prepass_index):
    # hot terms must exist (conftest sets hot_df_threshold=300 over a
    # 1,000-doc corpus) so the enabled `hot_terms and stage_c_hot_prepass`
    # branch actually took effect; the sidecar dir itself is cleaned up at
    # the end of Stage C, so its absence afterwards is expected
    from lucene_ray.index.build import _load_hot_terms
    from lucene_ray.index.manifest import Manifest

    m = Manifest.load(prepass_index)
    hot = _load_hot_terms(os.path.join(prepass_index, "term_stats"),
                          int(m.config["hot_df_threshold"]))
    assert hot, "fixture corpus must have hot terms for this test to bite"
    assert not os.path.isdir(os.path.join(prepass_index, "hot_spill"))


def test_prepass_postings_bit_identical(built_index, prepass_index):
    index_dir, _, _ = built_index
    a = _postings_table(index_dir)
    b = _postings_table(prepass_index)
    assert a.schema.equals(b.schema)
    assert a.equals(b)


def test_prepass_search_identical(built_index, prepass_index):
    import numpy as np

    from lucene_ray.fixtures import query_to_ast, reference_queries
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.searcher import Searcher

    index_dir, _, _ = built_index
    base = Searcher(IndexReader(index_dir))
    twin = Searcher(IndexReader(prepass_index))
    for spec in reference_queries()[:8]:
        q = query_to_ast(spec)
        x, y = base.search(q, 10), twin.search(q, 10)
        np.testing.assert_array_equal(x.doc_ids, y.doc_ids, err_msg=str(spec))
        np.testing.assert_array_equal(x.scores, y.scores, err_msg=str(spec))
