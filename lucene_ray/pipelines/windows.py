"""Windowed aggregates over the event stream beyond tumbling windows
(streaming shapes, SURVEY §2.11): session windows (gap-based) and sliding
(hopping) windows, each with an exact SQL-window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def session_windows(sf_dir: str, gap_minutes: int = 30,
                    n_buckets: int = 64) -> pa.Table:
    """Per user: number of sessions (split where the gap between
    consecutive events exceeds ``gap_minutes``), events in the largest
    session, and total events.

    Sessions are per-user state, so user is the logical shuffle key — but
    the PHYSICAL key is ``hash(user) % n_buckets``: each ``map_groups``
    call sessionizes a whole bucket of users vectorized (lexsort by
    (user, ts) + boundary scan), amortizing per-group overhead the same
    way the merge shuffle buckets terms."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        h = (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())
        )

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_sessions": pa.array([], pa.int64()),
                      "max_session_events": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64())})

    def sessions(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return empty
        u = np.asarray(group.column("user_id"), dtype=np.int64)
        ts = np.asarray(group.column("ts"), dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, u))
        u_s, t_s = u[order], ts[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u_s[1:] != u_s[:-1]
        new_session = new_user.copy()
        new_session[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        # per-session event counts
        s_starts = np.flatnonzero(new_session)
        s_counts = np.diff(np.append(s_starts, n))
        # sessions grouped by user: user of each session + reduceat spans
        u_starts = np.flatnonzero(new_user)
        sess_user_bounds = np.searchsorted(s_starts, u_starts)
        users = u_s[u_starts]
        n_sessions = np.diff(np.append(sess_user_bounds, len(s_starts)))
        max_ev = np.maximum.reduceat(s_counts, sess_user_bounds)
        n_events = np.diff(np.append(u_starts, n))
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n_sessions": pa.array(n_sessions.astype(np.int64), pa.int64()),
            "max_session_events": pa.array(max_ev.astype(np.int64), pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
        })

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sessions, batch_format="pyarrow")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def sliding_window_counts(sf_dir: str, window_days: int = 7,
                          slide_days: int = 1) -> pa.Table:
    """Hopping-window event counts per event_type: each event lands in
    ``window/slide`` windows; emitted via a flat map over batches (no
    per-window scan), then one grouped count."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    w_us = np.int64(window_days) * 86_400_000_000
    s_us = np.int64(slide_days) * 86_400_000_000
    k = int(window_days // slide_days)

    def explode(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts"), dtype="datetime64[us]").astype(np.int64)
        et = batch.column("event_type")
        n = len(ts)
        # window w covers [w*s, w*s + window); event t is in windows
        # floor((t - window)/s)+1 .. floor(t/s)
        last = ts // s_us
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64), n)
        win = last[idx] - offs
        keep = win >= 0
        starts = win[keep] * s_us
        return pa.table({
            "event_type": et.take(pa.array(idx[keep])),
            "window_start": pa.array(
                starts.astype("datetime64[us]"), pa.timestamp("us")
            ),
        })

    from ray.data.aggregate import Count

    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"))
    )
    out = agg.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    out["n_events"] = out["n_events"].astype("int64")
    out["window_start"] = out["window_start"].astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S")
    return pa.Table.from_pandas(out, preserve_index=False)
