"""Windowed aggregates over the event stream beyond tumbling windows
(streaming shapes, SURVEY §2.11): session windows (gap-based) and sliding
(hopping) windows, each with an exact SQL-window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def session_windows(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Per user: number of sessions (split where the gap between
    consecutive events exceeds ``gap_minutes``), events in the largest
    session, and total events. groupby(user).map_groups — sessions are
    per-user state, so the user key is the only shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(np.asarray(group.column("ts"), dtype="datetime64[us]").astype(np.int64))
        if len(ts) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "max_session_events": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session)
        counts = np.bincount(sid)[1:]
        uid = group.column("user_id")[0].as_py()
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_sessions": pa.array([int(sid[-1])], pa.int64()),
            "max_session_events": pa.array([int(counts.max())], pa.int64()),
            "n_events": pa.array([len(ts)], pa.int64()),
        })

    out = (
        ds.groupby("user_id")
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
