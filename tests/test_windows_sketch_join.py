"""Shuffle join, session/sliding windows, highlighting, HLL sketch —
each vs a DuckDB or scalar oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem", "events", "documents"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_hash_join_order_revenue_vs_duckdb(ray_session, con):
    from lucene_ray.pipelines.shuffle_join import order_revenue

    got = order_revenue(SF, top=10).to_pandas()
    exp = con.execute(
        "SELECT o_orderkey, round(sum(round(l_extendedprice * (1 - l_discount), 4)), 4) "
        "AS revenue, count(*)::BIGINT AS n_items "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"
    ).df()
    assert list(got["o_orderkey"]) == list(exp["o_orderkey"])
    np.testing.assert_allclose(got["revenue"], exp["revenue"], atol=1e-6)
    assert list(got["n_items"]) == list(exp["n_items"])


def test_hash_join_generic_inner(ray_session):
    from lucene_ray.pipelines.shuffle_join import hash_join

    l = ray.data.from_arrow(pa.table({"k": [1, 1, 2, 3], "a": ["x", "y", "z", "w"]}))
    r = ray.data.from_arrow(pa.table({"k": [1, 2, 2, 4], "b": [10, 20, 21, 40]}))
    out = hash_join(l, r, "k", ["a"], ["b"]).to_pandas().sort_values(["k", "a", "b"])
    got = list(map(tuple, out[["k", "a", "b"]].to_numpy()))
    assert got == [(1, "x", 10), (1, "y", 10), (2, "z", 20), (2, "z", 21)]


def test_session_windows_vs_duckdb(ray_session, con):
    from lucene_ray.pipelines.windows import session_windows

    got = session_windows(SF, gap_minutes=30).to_pandas()
    exp = con.execute(
        "WITH g AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE OR "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END "
        "AS new_s FROM events), "
        "s AS (SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
        "SELECT user_id, max(sid)::BIGINT AS n_sessions, "
        "max(cnt)::BIGINT AS max_session_events, sum(cnt)::BIGINT AS n_events FROM "
        "(SELECT user_id, sid, count(*) AS cnt FROM s GROUP BY user_id, sid) "
        "GROUP BY user_id ORDER BY user_id"
    ).df()
    assert got.shape == exp.shape
    for c in ["user_id", "n_sessions", "max_session_events", "n_events"]:
        assert list(got[c]) == list(exp[c]), c


def test_sliding_window_counts_vs_duckdb(ray_session, con):
    from lucene_ray.pipelines.windows import sliding_window_counts

    got = sliding_window_counts(SF, window_days=7, slide_days=1).to_pandas()
    exp = con.execute(
        "WITH w AS (SELECT event_type, "
        "to_timestamp((epoch_us(ts) // 86400000000 - s.i) * 86400)::TIMESTAMP "
        "AS window_start FROM events, (SELECT unnest(range(7)) AS i) s "
        "WHERE epoch_us(ts) // 86400000000 - s.i >= 0) "
        "SELECT event_type, strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start, "
        "count(*)::BIGINT AS n_events FROM w "
        "GROUP BY 1, 2 ORDER BY event_type, window_start"
    ).df()
    assert got.shape == exp.shape
    for c in got.columns:
        assert list(got[c]) == list(exp[c]), c


def test_highlight_fragments(ray_session):
    from lucene_ray.pipelines.highlight import highlight_first

    out = highlight_first(SF, "join", width=12).to_pandas()
    assert len(out) > 0
    import pyarrow.parquet as pq

    texts = dict(zip(
        *[pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
          .column(c).to_pylist() for c in ["doc_id", "text"]]
    ))
    for _, r in out.head(50).iterrows():
        t = texts[r["doc_id"]].lower()
        assert r["fragment"] == t[max(0, r["start_offset"] - 12): r["end_offset"] + 12]
        assert "join" in r["fragment"]


def test_hll_within_two_percent(ray_session, con):
    from lucene_ray.ops.sketch import approx_distinct_tokens

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    est = approx_distinct_tokens(ds).column("n_distinct_est")[0].as_py()
    exact = con.execute(
        "SELECT count(DISTINCT tok) FROM (SELECT unnest(string_split_regex("
        "lower(text), '[^a-z0-9_]+')) AS tok FROM documents) WHERE tok <> ''"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_hll_deterministic(ray_session):
    from lucene_ray.ops.sketch import approx_distinct_tokens

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    a = approx_distinct_tokens(ds).column("n_distinct_est")[0].as_py()
    b = approx_distinct_tokens(ds).column("n_distinct_est")[0].as_py()
    assert a == b
