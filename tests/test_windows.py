"""Temporal operators (ops/windows.py): sessionize, as-of join, range join
vs exact DuckDB oracles at sf0.001 plus synthetic edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sessionize_oracle(ray_session, con):
    from lucene_ray.pipelines.relational import events_sessions

    got = events_sessions(SF).to_pandas()
    want = con.execute(
        "WITH o AS (SELECT user_id, ts, event_id, CASE WHEN ts - lag(ts) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) > "
        "INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk FROM events), "
        "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM o) "
        "SELECT user_id, session_id::BIGINT AS session_id, min(ts) AS "
        "session_start, max(ts) AS session_end, count(*)::BIGINT AS n_events "
        "FROM s GROUP BY 1, 2"
    ).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_asof_oracle(ray_session, con):
    from lucene_ray.pipelines.relational import events_asof_purchase_click

    got = events_asof_purchase_click(SF).to_pandas()
    want = con.execute(
        "WITH p AS (SELECT event_id, ts, user_id FROM events "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, max(event_id) AS event_id FROM events "
        "WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.user_id, p.ts, p.event_id, c.ts AS r_ts, "
        "c.event_id AS r_event_id "
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
    ).df()
    assert got["r_event_id"].isna().sum() > 0  # LEFT semantics exercised
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_range_join_oracle(ray_session, con):
    from lucene_ray.pipelines.relational import events_signup_followups

    got = events_signup_followups(SF).to_pandas()
    want = con.execute(
        "SELECT s.user_id, s.event_id, s.ts, e.event_id AS r_event_id, "
        "e.ts AS r_ts FROM (SELECT * FROM events WHERE "
        "event_type = 'signup') s JOIN events e ON e.user_id = s.user_id "
        "AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL '30 minutes'"
    ).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def _mk(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_asof_edges(ray_session):
    from lucene_ray.ops.windows import asof_join

    left = _mk([
        {"k": 1, "t": 100, "i": 1},
        {"k": 1, "t": 50, "i": 2},    # before every right row -> null
        {"k": 2, "t": 10, "i": 3},    # key with NO right rows -> null
    ])
    right = _mk([
        {"k": 1, "t": 100, "i": 10},  # equal ts: non-strict matches it...
        {"k": 1, "t": 100, "i": 11},  # ...tie broken by greatest id
        {"k": 1, "t": 60, "i": 12},
    ])
    got = asof_join(left, right, "k", "t", "i").to_pandas() \
        .sort_values("i").reset_index(drop=True)
    assert got.loc[0, "r_i"] == 11          # equal-ts tie -> max id
    assert pd.isna(got.loc[1, "r_i"])       # nothing at/before t=50
    assert pd.isna(got.loc[2, "r_i"])       # key never on right
    strict = asof_join(left, right, "k", "t", "i", strict=True).to_pandas() \
        .sort_values("i").reset_index(drop=True)
    assert strict.loc[0, "r_i"] == 12       # strict: t<100 -> t=60 wins


def test_range_join_band(ray_session):
    from lucene_ray.ops.windows import range_join

    left = _mk([{"k": 1, "t": 0, "i": 1}])
    right = _mk([
        {"k": 1, "t": 0, "i": 20},    # excluded: strictly-after bound
        {"k": 1, "t": 5, "i": 21},
        {"k": 1, "t": 10, "i": 22},   # included: inclusive upper bound
        {"k": 1, "t": 11, "i": 23},   # excluded: past the band
        {"k": 2, "t": 5, "i": 24},    # excluded: other key
    ])
    got = range_join(left, right, "k", "t", "i", within_us=10).to_pandas()
    assert sorted(got["r_i"].tolist()) == [21, 22]


def test_sessionize_gap_boundary(ray_session):
    from lucene_ray.ops.windows import sessionize

    ev = _mk([
        {"user_id": 7, "ts": 0, "event_id": 1},
        {"user_id": 7, "ts": 10, "event_id": 2},   # gap == 10 -> same session
        {"user_id": 7, "ts": 21, "event_id": 3},   # gap 11 > 10 -> new session
    ])
    got = sessionize(ev, gap_us=10).to_pandas().sort_values("session_id")
    assert got["n_events"].tolist() == [2, 1]
    assert got["session_start"].tolist() == [0, 21]
    assert got["session_end"].tolist() == [10, 21]


def test_funnel_greedy_strict_ordering(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_ray.ops.windows import funnel

    # user 1: A t=1, B t=2, C t=3 -> 3 steps
    # user 2: B t=1, A t=2, B t=5, C t=4 -> A@2, B@5, C? none after 5 -> 2
    # user 3: A t=1, B t=1 (equal ts does NOT advance), C t=2 -> 1
    # user 4: only C events -> 0
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "C"),
        (2, 1, "B"), (2, 2, "A"), (2, 5, "B"), (2, 4, "C"),
        (3, 1, "A"), (3, 1, "B"), (3, 2, "C"),
        (4, 1, "C"), (4, 2, "C"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    out = pa.concat_tables([
        __import__("ray").get(r) for r in
        funnel(ray.data.from_arrow(t), ["A", "B", "C"]).to_arrow_refs()
    ]).sort_by("user_id")
    got = dict(zip(out.column("user_id").to_pylist(),
                   out.column("steps_completed").to_pylist()))
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_retention_hand_checked(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_ray.ops.windows import retention

    DAY = 86_400_000_000
    wk = 7 * DAY
    # epoch-us Mondays: 1970-01-05 is day 4
    m0 = 4 * DAY
    rows = [
        # user 1: cohort week0, active weeks 0, 1, 3
        (1, m0 + 1), (1, m0 + 2 * DAY), (1, m0 + wk), (1, m0 + 3 * wk),
        # user 2: cohort week0, active week 0 only
        (2, m0),
        # user 3: cohort week1, active weeks 1 and 2
        (3, m0 + wk + DAY), (3, m0 + 2 * wk),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
    })
    out = retention(ray.data.from_arrow(t))
    got = {(c, o): n for c, o, n in zip(out.column("cohort_week").to_pylist(),
                                        out.column("week_offset").to_pylist(),
                                        out.column("n_users").to_pylist())}
    assert got == {(m0, 0): 2, (m0, 1): 1, (m0, 3): 1,
                   (m0 + wk, 0): 1, (m0 + wk, 1): 1}


def test_windowed_topk_hand_checked(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_ray.ops.windows import windowed_topk

    W = 100
    rows = [
        # window 0: u1 x3, u2 x2, u3 x1, u4 x1 -> top3 = u1, u2, u3 (tie->id)
        (1, 5), (1, 10), (1, 50), (2, 7), (2, 8), (3, 99), (4, 98),
        # window 1: u2 x2, u5 x1
        (2, 100), (2, 150), (5, 199),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
    })
    out = windowed_topk(ray.data.from_arrow(t), W, k=3)
    got = list(zip(out.column("window_start").to_pylist(),
                   out.column("rank").to_pylist(),
                   out.column("user_id").to_pylist(),
                   out.column("n_events").to_pylist()))
    assert got == [
        (0, 1, 1, 3), (0, 2, 2, 2), (0, 3, 3, 1),
        (100, 1, 2, 2), (100, 2, 5, 1),
    ]
