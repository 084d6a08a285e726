"""Gopher/C4-style quality heuristics (ops/quality.py).

Oracle strategy: every integer counter is recomputed by a DuckDB SQL twin
(the exact SQL served by __ray_entry__.oracle_sql); the keep mask is
re-derived in integer space. Hand-built edge docs pin the tricky
semantics (empty text, whitespace-only, duplicate lines, bullet/ellipsis
lines, adjacent-pair counting).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _metrics(table: pa.Table) -> pa.Table:
    from lucene_ray.ops.quality import quality_metrics_batch

    return quality_metrics_batch(table)


def _oracle(table: pa.Table) -> pa.Table:
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("documents", table)
    return con.execute(e.oracle_sql()["quality_gopher_metrics"]).arrow()


EDGE_DOCS = [
    "",                       # empty
    "   \t \n  ",             # whitespace only
    "the the the the",        # one word repeated; 3 identical pairs
    "a b\na b\na b",          # duplicate lines
    "- item one\n- item two\nplain line",   # bullet lines
    "to be continued...\nanother line...\nplain",  # ellipsis lines
    "# h1 ## h2 ... and ... more #",        # symbols
    "the quick brown fox and the lazy dog have to be of use with that",
    "Wörter mit Ümlauten über die Zeilen\nzweite Zeile",  # unicode
    "x",                      # single word, no pairs
]


def _edge_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(EDGE_DOCS)), pa.int64()),
        "text": pa.array(EDGE_DOCS, pa.string()),
    })


def test_metrics_match_sql_oracle_on_edges():
    t = _edge_table()
    m = _metrics(t).sort_by("doc_id")
    o = _oracle(t)
    for c in o.column_names:
        got = np.asarray(m.column(c))
        want = np.asarray(o.column(c))
        assert np.array_equal(got, want), (c, got, want)


def test_metrics_match_sql_oracle_on_testdata():
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    m = _metrics(t).sort_by("doc_id")
    o = _oracle(t)
    for c in o.column_names:
        assert np.array_equal(np.asarray(m.column(c)), np.asarray(o.column(c))), c


def test_edge_values_pinned():
    m = _metrics(_edge_table())

    def col(name):
        return np.asarray(m.column(name)).tolist()

    assert col("n_words")[0] == 0 and col("n_words")[1] == 0
    assert col("n_lines")[0] == 1          # "" splits to one empty line
    # doc 2: "the the the the" -> 4 words, 3 pairs all identical
    assert col("top2_num")[2] == 3 and col("top2_den")[2] == 3
    assert col("stop_hits")[2] == 1        # one distinct stopword
    # doc 3: 3 lines, 1 distinct
    assert col("n_lines")[3] == 3 and col("n_distinct_lines")[3] == 1
    assert col("n_bullet_lines")[4] == 2
    assert col("n_ellipsis_lines")[5] == 2
    # doc 6: 4 '#' chars + 2 '...' runs
    assert col("n_symbols")[6] == 6
    assert col("stop_hits")[7] >= 8 - 1    # nearly all stopwords present
    assert col("top2_den")[9] == 0         # single word -> no pairs


def test_keep_mask_integer_space():
    from lucene_ray.ops.quality import QualityThresholds, _keep_mask

    m = _metrics(_edge_table())
    th = QualityThresholds(min_words=2, min_stop_hits=1)
    keep = _keep_mask(m, th)
    # doc 7 is clean prose with stopwords; empty docs always fail min_words
    assert keep[7]
    assert not keep[0] and not keep[1]
    # doc 2 fails top2gram (3/3 > 1/5) despite having a stopword
    assert not keep[2]
    # doc 3 fails dup_line_frac (2 dup / 3 lines > 3/10)
    assert not keep[3]


def test_keep_matches_sql_oracle_on_testdata():
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from lucene_ray.ops.quality import QualityThresholds, _keep_mask

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    m = _metrics(t).sort_by("doc_id")
    keep = _keep_mask(m, QualityThresholds(min_words=30, min_stop_hits=1))
    got = np.asarray(m.column("doc_id"))[keep]
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(e.oracle_sql()["quality_gopher_keep"]).arrow()
    assert np.array_equal(got, np.asarray(want.column("doc_id")))
    assert 0 < len(got) < t.num_rows  # thresholds genuinely split the corpus


@pytest.mark.usefixtures("ray_session")
def test_ray_dataset_paths(tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from lucene_ray.ops.quality import (QualityThresholds, quality_filter,
                                        quality_metrics)

    path = str(tmp_path / "docs.parquet")
    pq.write_table(_edge_table(), path)
    ds = ray.data.read_parquet(path)
    m = quality_metrics(ds).to_pandas().sort_values("doc_id")
    assert "keep" in m.columns and len(m) == len(EDGE_DOCS)
    th = QualityThresholds(min_words=2, min_stop_hits=1)
    kept = quality_filter(ds, thresholds=th).to_pandas()
    assert set(kept.columns) == {"doc_id", "text"}  # original schema kept
    assert 7 in kept["doc_id"].tolist()
