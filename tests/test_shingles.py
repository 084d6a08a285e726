"""Shingle ops vs scalar reference + DuckDB positional self-join oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops.shingles import doc_shingle_sets, shingle_counts

TEXTS = [
    "a b c a b c",
    "a b",
    "x",
    "",
    "b c d",
]


def _ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))


def test_shingle_counts_matches_scalar(ray_session):
    out = shingle_counts(_ds(), k=2, top=10)
    got = dict(zip(out["shingle"].to_pylist(), out["n"].to_pylist()))
    exp = {}
    for t in TEXTS:
        toks = t.split()
        for i in range(len(toks) - 1):
            sh = f"{toks[i]} {toks[i+1]}"
            exp[sh] = exp.get(sh, 0) + 1
    assert got == exp


def test_shingle_counts_matches_duckdb_oracle(ray_session):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = shingle_counts(ds, k=2, top=15).to_pandas()
    exp = con.execute(
        "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
        "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
        "SELECT a.tok || ' ' || b.tok AS shingle, count(*)::BIGINT AS n "
        "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "GROUP BY 1 ORDER BY n DESC, shingle LIMIT 15"
    ).df()
    assert list(out["shingle"]) == list(exp["shingle"])
    assert list(out["n"]) == list(exp["n"])


def test_doc_shingle_sets(ray_session):
    out = doc_shingle_sets(_ds(), k=2).to_pandas().sort_values("doc_id")
    assert list(out["n_shingles"]) == [5, 1, 0, 0, 2]
    assert list(out["n_unique_shingles"]) == [3, 1, 0, 0, 2]
