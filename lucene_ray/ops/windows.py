"""Temporal / windowed operators over event streams: sessionization,
as-of join, and range join.

These are the "streaming window" custom operators Ray Data lacks natively.
All three follow the same scale shape: ONE shuffle co-partitioning rows by
the entity key (``groupby(key).map_groups`` — Ray Data's sort-based group
shuffle), then fully vectorized per-group kernels (numpy searchsorted /
cumsum), never a Python loop per row. The partitioning assumption each
relies on: a single entity's rows fit in one group (per-user event history
is KBs even at 100 TB corpus scale; a pathological hot key is bounded by
the group, not the pipeline — document and cap upstream if an entity can
exceed worker memory).

Semantics follow the standard definitions (and are oracle-checked against
DuckDB, which implements them natively):
  - sessionize: a new session starts when the gap to the previous event of
    the same entity exceeds ``gap`` (Kulkarni et al., "Twitter Heron";
    the GROUP BY SESSION_WINDOW shape).
  - asof_join: each left row matches the latest right row of the same key
    with right.ts <= left.ts (DuckDB/kdb ASOF JOIN).
  - range_join: each left row matches every right row of the same key with
    left.ts < right.ts <= left.ts + within (a banded inequality join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _np_i64(col) -> np.ndarray:
    """Timestamp/int column -> int64 numpy (timestamps as epoch us)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return np.asarray(arr, dtype=np.int64)


def sessionize(events: ray.data.Dataset, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_us: int = 30 * 60 * 1_000_000) -> ray.data.Dataset:
    """Session windows with inactivity gap ``gap_us``: one output row per
    (entity, session) with start/end timestamps and the event count.
    ``session_id`` is 0-based in session-start order per entity. Ties on
    ``ts`` are ordered by ``id_col`` so the result is deterministic."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = _np_i64(group.column(ts_col))
        ids = _np_i64(group.column(id_col))
        order = np.lexsort((ids, ts))
        ts = ts[order]
        n = len(ts)
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        ends = np.r_[starts[1:], n]
        key = group.column(key_col)[0].as_py()
        ts_type = (group.schema.field(ts_col).type
                   if pa.types.is_timestamp(group.schema.field(ts_col).type)
                   else pa.int64())
        return pa.table({
            key_col: pa.array([key] * len(starts), pa.int64()),
            "session_id": pa.array(sid[starts], pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64()).cast(ts_type),
            "session_end": pa.array(ts[ends - 1], pa.int64()).cast(ts_type),
            "n_events": pa.array(ends - starts, pa.int64()),
        })

    return events.select_columns([key_col, ts_col, id_col]) \
                 .groupby(key_col).map_groups(per_user, batch_format="pyarrow")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key_col: str, ts_col: str, id_col: str,
              right_prefix: str = "r_",
              strict: bool = False) -> ray.data.Dataset:
    """As-of join: each left row picks the latest right row of the same key
    with ``right.ts <= left.ts`` (``<`` when ``strict``); unmatched left
    rows get nulls (LEFT ASOF JOIN). When several right rows share the
    winning timestamp the one with the greatest ``id_col`` wins, making the
    result deterministic (DuckDB leaves the tie unspecified; its oracle
    therefore pre-dedups to one row per (key, ts) the same way).

    Output columns: key, ts, id, ``r_ts``, ``r_id``.

    Scale shape: both sides tagged and unioned, ONE groupby(key) shuffle,
    then a per-group numpy searchsorted — O(n log n) per entity, shuffle
    volume |L| + |R| rows (the co-partitioned reduce-side join, same as
    pipelines/shuffle_join.py)."""

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "__key": batch.column(key_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64())
                if not pa.types.is_timestamp(batch.schema.field(ts_col).type)
                else batch.column(ts_col).cast(pa.int64()),
                "__id": batch.column(id_col).cast(pa.int64()),
                "__side": pa.array(np.full(len(batch), side, np.int8)),
            })
        return f

    ts_type = None
    for f in left.schema().base_schema:
        if f.name == ts_col:
            ts_type = f.type

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def per_key(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"), dtype=np.int8)
        ts = _np_i64(group.column("__ts"))
        ids = _np_i64(group.column("__id"))
        lmask = side == 0
        lts, lid = ts[lmask], ids[lmask]
        rts, rid = ts[~lmask], ids[~lmask]
        key = group.column("__key")[0].as_py()
        n = len(lts)
        if n == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                ts_col: pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "__rts": pa.array([], pa.int64()),
                "__rid": pa.array([], pa.int64()),
            })
        # right side sorted by (ts, id): for equal winning ts the LAST
        # entry (greatest id) is taken -> deterministic tie-break
        r_order = np.lexsort((rid, rts))
        rts_s, rid_s = rts[r_order], rid[r_order]
        pos = np.searchsorted(rts_s, lts, side="left" if strict else "right") - 1
        hit = pos >= 0
        safe = np.clip(pos, 0, None)
        return pa.table({
            key_col: pa.array(np.full(n, key, np.int64)),
            ts_col: pa.array(lts, pa.int64()),
            id_col: pa.array(lid, pa.int64()),
            "__rts": pa.array(rts_s[safe] if len(rts_s) else np.zeros(n, np.int64),
                              pa.int64(), mask=~hit),
            "__rid": pa.array(rid_s[safe] if len(rid_s) else np.zeros(n, np.int64),
                              pa.int64(), mask=~hit),
        })

    out = unioned.groupby("__key").map_groups(per_key, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        cols = {
            key_col: batch.column(key_col),
            ts_col: batch.column(ts_col).cast(ts_type) if ts_type is not None
            and pa.types.is_timestamp(ts_type) else batch.column(ts_col),
            id_col: batch.column(id_col),
            right_prefix + ts_col: batch.column("__rts").cast(ts_type)
            if ts_type is not None and pa.types.is_timestamp(ts_type)
            else batch.column("__rts"),
            right_prefix + id_col: batch.column("__rid"),
        }
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def range_join(left: ray.data.Dataset, right: ray.data.Dataset,
               key_col: str, ts_col: str, id_col: str,
               within_us: int, right_prefix: str = "r_") -> ray.data.Dataset:
    """Banded range join: every (l, r) pair of the same key with
    ``l.ts < r.ts <= l.ts + within_us``. Output one row per pair:
    key, l id/ts, r id/ts.

    Per group: right side sorted by ts once, each left row's match window
    located with TWO searchsorteds, pairs emitted with repeat/concat index
    arithmetic — no Python loop over rows. Output size is data-dependent
    (bounded by band width x event rate); the band keeps it linear-ish,
    unlike an unbounded inequality join."""

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "__key": batch.column(key_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__id": batch.column(id_col).cast(pa.int64()),
                "__side": pa.array(np.full(len(batch), side, np.int8)),
            })
        return f

    ts_type = None
    for f in left.schema().base_schema:
        if f.name == ts_col:
            ts_type = f.type

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def per_key(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"), dtype=np.int8)
        ts = _np_i64(group.column("__ts"))
        ids = _np_i64(group.column("__id"))
        lmask = side == 0
        lts, lid = ts[lmask], ids[lmask]
        rts, rid = ts[~lmask], ids[~lmask]
        key = group.column("__key")[0].as_py()
        r_order = np.lexsort((rid, rts))
        rts_s, rid_s = rts[r_order], rid[r_order]
        lo = np.searchsorted(rts_s, lts, side="right")           # r.ts > l.ts
        hi = np.searchsorted(rts_s, lts + within_us, side="right")  # <= l.ts+w
        counts = hi - lo
        li = np.repeat(np.arange(len(lts)), counts)
        # flat right indices: for each left row i, lo[i] .. hi[i]-1
        ri = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
        ) if counts.sum() else np.zeros(0, np.int64)
        return pa.table({
            key_col: pa.array(np.full(len(li), key, np.int64)),
            id_col: pa.array(lid[li], pa.int64()),
            ts_col: pa.array(lts[li], pa.int64()),
            "__rid": pa.array(rid_s[ri], pa.int64()),
            "__rts": pa.array(rts_s[ri], pa.int64()),
        })

    out = unioned.groupby("__key").map_groups(per_key, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column(key_col),
            id_col: batch.column(id_col),
            ts_col: batch.column(ts_col).cast(ts_type)
            if ts_type is not None and pa.types.is_timestamp(ts_type)
            else batch.column(ts_col),
            right_prefix + id_col: batch.column("__rid"),
            right_prefix + ts_col: batch.column("__rts").cast(ts_type)
            if ts_type is not None and pa.types.is_timestamp(ts_type)
            else batch.column("__rts"),
        })

    return out.map_batches(finish, batch_format="pyarrow")
