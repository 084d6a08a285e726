"""Connected-components dedup clustering + grouped HLL sketch."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _cc_oracle(pairs):
    """Brute-force union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_chain_and_clique(ray_session):
    from lucene_ray.ops.dedup import connected_components

    # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)]
    t = pa.table({"id_a": pa.array([a for a, _ in pairs], pa.int64()),
                  "id_b": pa.array([b for _, b in pairs], pa.int64())})
    out = connected_components(t)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("cluster_id").to_pylist()))
    assert got == _cc_oracle(pairs)
    assert out.column("doc_id").to_pylist() == sorted(got)


def test_connected_components_long_path_converges(ray_session):
    """A 200-node path is the pointer-jumping worst case."""
    from lucene_ray.ops.dedup import connected_components

    n = 200
    # descending ids so min-label must travel the whole path
    edges = [(i + 1, i) for i in range(n)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                  "id_b": pa.array([b for _, b in edges], pa.int64())})
    out = connected_components(t)
    assert set(out.column("cluster_id").to_pylist()) == {0}
    assert out.num_rows == n + 1


def test_connected_components_empty(ray_session):
    from lucene_ray.ops.dedup import connected_components

    t = pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())})
    assert connected_components(t).num_rows == 0


def test_ngram_jaccard_clusters_match_pairs(ray_session):
    import ray.data

    from lucene_ray.ops.dedup import (
        connected_components,
        ngram_jaccard_clusters,
        ngram_jaccard_pairs,
    )

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    pairs = ngram_jaccard_pairs(ds, threshold=0.5)
    want = connected_components(pairs)
    got = ngram_jaccard_clusters(ray.data.read_parquet(f"{SF}/documents.parquet"),
                                 threshold=0.5)
    assert got.equals(want)
    # cluster_id is always a member <= every doc in the cluster
    assert all(c <= d for d, c in zip(got.column("doc_id").to_pylist(),
                                      got.column("cluster_id").to_pylist()))


def test_approx_distinct_grouped_accuracy(ray_session):
    import duckdb
    import ray.data

    from lucene_ray.ops.sketch import approx_distinct_grouped

    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    got = approx_distinct_grouped(ds, "event_type", "user_id", p=12)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exact = dict(con.execute(
        "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall())
    est = dict(zip(got.column("event_type").to_pylist(),
                   got.column("n_distinct_est").to_pylist()))
    assert set(est) == set(exact)
    for g, e in exact.items():
        assert abs(est[g] - e) <= max(3, 0.05 * e), (g, est[g], e)


def test_approx_distinct_grouped_deterministic(ray_session):
    import ray.data

    from lucene_ray.ops.sketch import approx_distinct_grouped

    a = approx_distinct_grouped(
        ray.data.read_parquet(f"{SF}/events.parquet"), "event_type", "user_id"
    )
    b = approx_distinct_grouped(
        ray.data.read_parquet(f"{SF}/events.parquet"), "event_type", "user_id"
    )
    assert a.equals(b)
