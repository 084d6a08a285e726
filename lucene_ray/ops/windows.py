"""Temporal / windowed operators over event streams: sessionization
(per-session rows), as-of join, and banded range join.

These are the "streaming window" custom operators Ray Data lacks natively.
All three share one scale shape, the same as pipelines/windows.py's
session aggregate: the LOGICAL key is the entity (user), but the PHYSICAL
shuffle key is ``hash(entity) % n_buckets`` — one ``groupby(bucket)``
shuffle, then a fully VECTORIZED multi-entity kernel per bucket (lexsort +
segmented scans / counting probes), so per-group Python overhead is paid
per bucket (64), not per entity (millions at 100 TB). No composite-integer
key encoding is used anywhere, so there is no overflow ceiling on
(n_entities x time-span).

Semantics (oracle-checked against DuckDB, which implements them natively):
  - sessionize: a new session starts when the gap to the previous event of
    the same entity exceeds ``gap_us`` (GROUP BY SESSION_WINDOW shape).
  - asof_join: each left row matches the latest right row of the same key
    with right.ts <= left.ts (DuckDB/kdb ASOF JOIN; LEFT join semantics).
  - range_join: each left row matches every right row of the same key with
    left.ts < right.ts <= left.ts + within (banded inequality join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _np_i64(col) -> np.ndarray:
    """Timestamp/int column -> int64 numpy (timestamps as epoch us)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return np.asarray(arr, dtype=np.int64)


def _with_bucket(ds: ray.data.Dataset, key_col: str,
                 n_buckets: int) -> ray.data.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        k = _np_i64(batch.column(key_col))
        h = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return batch.append_column(
            "__bucket",
            pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        )

    return ds.map_batches(add, batch_format="pyarrow")


def _ts_field(ds: ray.data.Dataset, ts_col: str):
    for f in ds.schema().base_schema:
        if f.name == ts_col:
            return f.type
    return pa.int64()


def _cast_ts(arr: pa.Array, ts_type) -> pa.Array:
    return arr.cast(ts_type) if pa.types.is_timestamp(ts_type) else arr


def sessionize(events: ray.data.Dataset, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_us: int = 30 * 60 * 1_000_000,
               n_buckets: int = 64) -> ray.data.Dataset:
    """Session windows with inactivity gap ``gap_us``: one output row per
    (entity, session) with start/end timestamps and the event count.
    ``session_id`` is 0-based in session-start order per entity. Ties on
    ``ts`` are ordered by ``id_col`` so the result is deterministic."""
    ts_type = _ts_field(events, ts_col)
    empty = pa.table({
        key_col: pa.array([], pa.int64()),
        "session_id": pa.array([], pa.int64()),
        "session_start": _cast_ts(pa.array([], pa.int64()), ts_type),
        "session_end": _cast_ts(pa.array([], pa.int64()), ts_type),
        "n_events": pa.array([], pa.int64()),
    })

    def per_bucket(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return empty
        u = _np_i64(group.column(key_col))
        ts = _np_i64(group.column(ts_col))
        ids = _np_i64(group.column(id_col))
        order = np.lexsort((ids, ts, u))
        u_s, t_s = u[order], ts[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u_s[1:] != u_s[:-1]
        new_session = new_user.copy()
        new_session[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        s_starts = np.flatnonzero(new_session)
        s_ends = np.r_[s_starts[1:], n]
        # per-user 0-based session ordinal: global ordinal minus the
        # ordinal of the user's first session (segmented re-base)
        n_sess = len(s_starts)
        sess_ord = np.arange(n_sess)
        us_mask = new_user[s_starts]          # session that opens a user
        first_ord = sess_ord[us_mask]
        sid = sess_ord - first_ord[np.cumsum(us_mask) - 1]
        return pa.table({
            key_col: pa.array(u_s[s_starts], pa.int64()),
            "session_id": pa.array(sid, pa.int64()),
            "session_start": _cast_ts(pa.array(t_s[s_starts], pa.int64()), ts_type),
            "session_end": _cast_ts(pa.array(t_s[s_ends - 1], pa.int64()), ts_type),
            "n_events": pa.array(s_ends - s_starts, pa.int64()),
        })

    return (
        _with_bucket(events.select_columns([key_col, ts_col, id_col]),
                     key_col, n_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _tag(key_col: str, ts_col: str, id_col: str, side: int):
    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "__key": pa.array(_np_i64(batch.column(key_col)), pa.int64()),
            "__ts": pa.array(_np_i64(batch.column(ts_col)), pa.int64()),
            "__id": pa.array(_np_i64(batch.column(id_col)), pa.int64()),
            "__side": pa.array(np.full(len(batch), side, np.int8), pa.int8()),
        })
    return f


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key_col: str, ts_col: str, id_col: str,
              right_prefix: str = "r_", strict: bool = False,
              n_buckets: int = 64) -> ray.data.Dataset:
    """As-of join: each left row picks the latest right row of the same key
    with ``right.ts <= left.ts`` (``<`` when ``strict``); unmatched left
    rows get nulls (LEFT ASOF JOIN). When several right rows share the
    winning timestamp the one with the greatest ``id_col`` wins, making the
    result deterministic (DuckDB leaves the tie unspecified; its oracle
    therefore pre-dedups to one row per (key, ts) the same way).

    Output columns: key, ts, id, ``r_ts``, ``r_id``.

    Kernel: ONE lexsort of the bucket's merged left+right rows by
    (key, ts, side, id) — rights before lefts at equal ts for the
    non-strict bound (after, when strict) — then a segmented running
    "last right row seen" scan (np.maximum.accumulate); a carried index
    from a previous key falls before the current key's first row and is
    nulled. O(n log n) per bucket, no per-entity Python."""
    ts_type = _ts_field(left, ts_col)
    unioned = left.map_batches(
        _tag(key_col, ts_col, id_col, 0), batch_format="pyarrow"
    ).union(right.map_batches(
        _tag(key_col, ts_col, id_col, 1), batch_format="pyarrow"))

    empty = pa.table({
        key_col: pa.array([], pa.int64()),
        ts_col: _cast_ts(pa.array([], pa.int64()), ts_type),
        id_col: pa.array([], pa.int64()),
        right_prefix + ts_col: _cast_ts(pa.array([], pa.int64()), ts_type),
        right_prefix + id_col: pa.array([], pa.int64()),
    })

    def per_bucket(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return empty
        k = _np_i64(group.column("__key"))
        ts = _np_i64(group.column("__ts"))
        ids = _np_i64(group.column("__id"))
        side = np.asarray(group.column("__side"), dtype=np.int8)
        # non-strict: right(1) sorts BEFORE left(0) at equal ts so an
        # equal-ts right is visible to the left row; strict: after
        side_rank = (1 - side) if not strict else side
        order = np.lexsort((ids, side_rank, ts, k))
        k_s, t_s, id_s, side_s = k[order], ts[order], ids[order], side[order]
        is_r = side_s == 1
        pos = np.arange(n)
        last_r = np.maximum.accumulate(np.where(is_r, pos, -1))
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k_s[1:] != k_s[:-1]
        key_first = pos[new_key][np.cumsum(new_key) - 1]  # first idx of row's key
        lmask = ~is_r
        lr = last_r[lmask]
        hit = (lr >= key_first[lmask]) & (lr >= 0)
        safe = np.clip(lr, 0, None)
        return pa.table({
            key_col: pa.array(k_s[lmask], pa.int64()),
            ts_col: _cast_ts(pa.array(t_s[lmask], pa.int64()), ts_type),
            id_col: pa.array(id_s[lmask], pa.int64()),
            right_prefix + ts_col: _cast_ts(
                pa.array(t_s[safe], pa.int64(), mask=~hit), ts_type),
            right_prefix + id_col: pa.array(id_s[safe], pa.int64(), mask=~hit),
        })

    return (
        _with_bucket(unioned, "__key", n_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def range_join(left: ray.data.Dataset, right: ray.data.Dataset,
               key_col: str, ts_col: str, id_col: str,
               within_us: int, right_prefix: str = "r_",
               n_buckets: int = 64) -> ray.data.Dataset:
    """Banded range join: every (l, r) pair of the same key with
    ``l.ts < r.ts <= l.ts + within_us``. Output one row per pair:
    key, l id/ts, r id/ts.

    Kernel: counting probes. The bucket's rights plus TWO probe rows per
    left (at ts and ts + within, both sorting after rights of equal ts)
    are lexsorted by (key, ts, kind); a cumulative count of rights at each
    probe yields each left row's [lo, hi) slice of the key-and-time-sorted
    right array, and pairs are emitted with repeat/arange index
    arithmetic. Probes carry the key as the primary sort field, so a
    window can never leak into another key's region. Output size is
    data-dependent but bounded by band width x event rate."""
    ts_type = _ts_field(left, ts_col)
    unioned = left.map_batches(
        _tag(key_col, ts_col, id_col, 0), batch_format="pyarrow"
    ).union(right.map_batches(
        _tag(key_col, ts_col, id_col, 1), batch_format="pyarrow"))

    empty = pa.table({
        key_col: pa.array([], pa.int64()),
        id_col: pa.array([], pa.int64()),
        ts_col: _cast_ts(pa.array([], pa.int64()), ts_type),
        right_prefix + id_col: pa.array([], pa.int64()),
        right_prefix + ts_col: _cast_ts(pa.array([], pa.int64()), ts_type),
    })

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty
        k = _np_i64(group.column("__key"))
        ts = _np_i64(group.column("__ts"))
        ids = _np_i64(group.column("__id"))
        side = np.asarray(group.column("__side"), dtype=np.int8)
        lmask = side == 0
        lk, lt, lid = k[lmask], ts[lmask], ids[lmask]
        rk, rt, rid = k[~lmask], ts[~lmask], ids[~lmask]
        nl, nr = len(lk), len(rk)
        if nl == 0 or nr == 0:
            return empty
        # rights sorted by (key, ts, id)
        r_order = np.lexsort((rid, rt, rk))
        rk_s, rt_s, rid_s = rk[r_order], rt[r_order], rid[r_order]
        # probe stream: kind 0 = right, kind 1 = probe (after equal-ts
        # rights: lo-probe at lts excludes nothing <= lts from the band's
        # strict lower bound; hi-probe at lts+within includes equal ts)
        pk = np.concatenate([rk_s, lk, lk])
        pt = np.concatenate([rt_s, lt, lt + within_us])
        kind = np.concatenate([
            np.zeros(nr, np.int8), np.ones(2 * nl, np.int8)])
        porder = np.lexsort((kind, pt, pk))
        cum_r = np.cumsum(kind[porder] == 0)
        probe_pos = np.empty(nr + 2 * nl, dtype=np.int64)
        probe_pos[porder] = np.arange(nr + 2 * nl)
        lo = cum_r[probe_pos[nr: nr + nl]]
        hi = cum_r[probe_pos[nr + nl:]]
        counts = hi - lo
        li = np.repeat(np.arange(nl), counts)
        total = int(counts.sum())
        if total == 0:
            return empty
        # flat right indices lo[i] .. hi[i]-1 per left row, loop-free:
        # global arange minus each window's shifted start
        w_start = np.cumsum(np.r_[0, counts[:-1]])
        starts = np.repeat(lo - w_start, counts)
        ri = np.arange(total) + starts
        return pa.table({
            key_col: pa.array(lk[li], pa.int64()),
            id_col: pa.array(lid[li], pa.int64()),
            ts_col: _cast_ts(pa.array(lt[li], pa.int64()), ts_type),
            right_prefix + id_col: pa.array(rid_s[ri], pa.int64()),
            right_prefix + ts_col: _cast_ts(pa.array(rt_s[ri], pa.int64()), ts_type),
        })

    return (
        _with_bucket(unioned, "__key", n_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def funnel(events: ray.data.Dataset, steps: list[str],
           key_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type", id_col: str = "event_id",
           n_buckets: int = 64) -> ray.data.Dataset:
    """Ordered funnel completion per entity: how many of ``steps`` the
    entity completed IN ORDER, matching each step to its EARLIEST event
    strictly after the previous matched step (the standard greedy funnel
    semantics of behavioral analytics engines). Equal-timestamp events do
    not advance the funnel (strict ordering, deterministic).

    One bucketed shuffle (hash(entity) % n_buckets), then per-step
    vectorized min-scans inside each group — len(steps) passes over the
    group, no per-entity Python. Returns (key, steps_completed)."""
    keep = [key_col, ts_col, type_col]

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "steps_completed": pa.array([], pa.int64())})
        u = _np_i64(group.column(key_col))
        ts = _np_i64(group.column(ts_col))
        et = np.asarray(group.column(type_col))
        users, uidx = np.unique(u, return_inverse=True)
        prev = np.full(len(users), -np.inf)
        depth = np.zeros(len(users), dtype=np.int64)
        for si, step in enumerate(steps):
            rows = np.flatnonzero(et == step)
            cand = rows[(ts[rows] > prev[uidx[rows]])
                        & (depth[uidx[rows]] == si)]
            best = np.full(len(users), np.inf)
            np.minimum.at(best, uidx[cand], ts[cand])
            hit = np.isfinite(best)
            prev[hit] = best[hit]
            depth[hit] = si + 1
        return pa.table({
            key_col: pa.array(users, pa.int64()),
            "steps_completed": pa.array(depth, pa.int64()),
        })

    return (
        _with_bucket(events.select_columns(keep), key_col, n_buckets)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def retention(events: ray.data.Dataset, key_col: str = "user_id",
              ts_col: str = "ts", n_buckets: int = 64) -> pa.Table:
    """Weekly cohort retention: cohort = the entity's first active ISO week
    (Monday-truncated, matching SQL date_trunc('week')); one output row per
    (cohort_week, week_offset) with the distinct-entity count active that
    many weeks after their cohort week — the classic retention triangle.

    Per bucketed group: per-entity first week + distinct (entity, week)
    pairs reduce to partial (cohort, offset, n) counts; only those tiny
    partials merge on the driver (entities hash-partition, so a
    (cohort, offset, entity) triple never spans buckets — partial counts
    add exactly). Timestamps are epoch-us; weeks computed in integer
    arithmetic (epoch day 0 = Thursday, hence the +3 Monday shift)."""
    DAY = 86_400_000_000

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        u = _np_i64(group.column(key_col))
        ts = _np_i64(group.column(ts_col))
        days = ts // DAY
        week = (((days + 3) // 7) * 7 - 3) * DAY  # Monday 00:00 epoch-us
        # distinct (user, week)
        uw = np.unique(np.stack([u, week], axis=1), axis=0)
        uu, ww = uw[:, 0], uw[:, 1]
        users, uidx = np.unique(uu, return_inverse=True)
        first = np.full(len(users), np.iinfo(np.int64).max)
        np.minimum.at(first, uidx, ww)
        cohort = first[uidx]
        offset = (ww - cohort) // (7 * DAY)
        # count distinct users per (cohort, offset): uw rows are already
        # distinct per (user, week) => per (cohort, offset, user) unique
        key = np.stack([cohort, offset], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({
            "cohort_week": pa.array(uniq[:, 0], pa.int64()),
            "week_offset": pa.array(uniq[:, 1], pa.int64()),
            "n_users": pa.array(n, pa.int64()),
        })

    parts = [
        ray.get(r) for r in _with_bucket(
            events.select_columns([key_col, ts_col]), key_col, n_buckets
        ).groupby("__bucket").map_groups(
            per_bucket, batch_format="pyarrow").to_arrow_refs()
    ]
    t = pa.concat_tables([p for p in parts if len(p)])
    if len(t) == 0:
        return pa.table({"cohort_week": pa.array([], pa.int64()),
                         "week_offset": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    cw = np.asarray(t.column("cohort_week"))
    wo = np.asarray(t.column("week_offset"))
    nn = np.asarray(t.column("n_users"))
    key = np.stack([cw, wo], axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    tot = np.bincount(inv, weights=nn).astype(np.int64)
    return pa.table({
        "cohort_week": pa.array(uniq[:, 0], pa.int64()),
        "week_offset": pa.array(uniq[:, 1], pa.int64()),
        "n_users": pa.array(tot, pa.int64()),
    })


def windowed_topk(events: ray.data.Dataset, window_us: int,
                  key_col: str = "user_id", ts_col: str = "ts",
                  k: int = 3, n_buckets: int = 64) -> pa.Table:
    """Top-k entities by event count per tumbling window — the streaming
    "trending now" aggregate. Two cheap exchanges, neither row-scale on the
    driver: (1) bucketed (entity) groups emit per-(window, entity) counts —
    exact, because an entity's events live in one bucket; (2) the
    (window, entity, n) partial table (one row per active entity-window,
    orders of magnitude below event count) reduces to per-window top-k,
    ties by entity ascending. Returns (window_start, rank, key, n_events)."""
    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"window_start": pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        u = _np_i64(group.column(key_col))
        ts = _np_i64(group.column(ts_col))
        win = (ts // window_us) * window_us
        key = np.stack([win, u], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({
            "window_start": pa.array(uniq[:, 0], pa.int64()),
            key_col: pa.array(uniq[:, 1], pa.int64()),
            "n_events": pa.array(n, pa.int64()),
        })

    parts = [
        ray.get(r) for r in _with_bucket(
            events.select_columns([key_col, ts_col]), key_col, n_buckets
        ).groupby("__bucket").map_groups(
            per_bucket, batch_format="pyarrow").to_arrow_refs()
    ]
    t = pa.concat_tables([p for p in parts if len(p)])
    if len(t) == 0:
        return pa.table({"window_start": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         key_col: pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    win = np.asarray(t.column("window_start"))
    u = np.asarray(t.column(key_col))
    n = np.asarray(t.column("n_events"))
    order = np.lexsort((u, -n, win))
    w_s = win[order]
    new_w = np.r_[True, w_s[1:] != w_s[:-1]]
    run_start = np.flatnonzero(new_w)
    run_id = np.cumsum(new_w) - 1
    pos = np.arange(len(w_s)) - run_start[run_id]
    keep = pos < k
    sel = order[keep]
    return pa.table({
        "window_start": pa.array(win[sel], pa.int64()),
        "rank": pa.array(pos[keep] + 1, pa.int64()),
        key_col: pa.array(u[sel], pa.int64()),
        "n_events": pa.array(n[sel], pa.int64()),
    })
