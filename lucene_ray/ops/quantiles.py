"""Distributed exact quantiles via a value-histogram shuffle.

The mergeable-aggregate shape for percentiles at 100-TB scale: each batch
emits (rounded value, count) partials — ``np.unique`` per batch — the
groupby merges counts per value (shuffle volume = |distinct rounded
values|, bounded by value-range / 10^-decimals, NOT by row count), and the
tiny merged histogram yields exact discrete quantiles of the rounded
distribution on the driver. This trades a fixed rounding precision for a
bounded shuffle — the same contract as t-digest/KLL sketches but exact and
trivially SQL-checkable (cumulative-sum window over the same histogram).

Quantile definition (discrete, inclusive): q-quantile = the smallest value
v whose cumulative count >= ceil(q * n). Rounding uses half-away-from-zero
to match SQL ROUND semantics.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def value_quantiles(ds: ray.data.Dataset, value_col: str,
                    qs: tuple = (0.25, 0.5, 0.75, 0.9),
                    decimals: int = 2) -> pa.Table:
    """(q, value) exact discrete quantiles of ``round(value_col, decimals)``.

    Returns one row per requested quantile, sorted by q; value float64
    rounded to ``decimals``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.round(batch.column(value_col).cast(pa.float64()),
                        ndigits=decimals,
                        round_mode="half_towards_infinity")
        v, c = np.unique(np.asarray(vals.combine_chunks()), return_counts=True)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "c": pa.array(c, pa.int64())})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    hist = hist.sort_values("v").reset_index(drop=True)
    cum = hist["c"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        out_q.append(float(q))
        if n == 0:
            out_v.append(float("nan"))
            continue
        target = max(1, math.ceil(q * n))
        idx = int(np.searchsorted(cum, target, side="left"))
        out_v.append(float(vals[min(idx, len(vals) - 1)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def grouped_value_quantiles(ds: ray.data.Dataset, group_col: str,
                            value_col: str, q: float = 0.5,
                            decimals: int = 2) -> pa.Table:
    """Per-group discrete quantile (same definition/rounding as
    :func:`value_quantiles`): histogram per (group, value), merged by
    groupby, quantile picked per group from its own tiny histogram —
    shuffle is |groups x distinct rounded values| partials."""

    def partial(batch: pa.Table) -> pa.Table:
        gd = batch.column(group_col).combine_chunks().dictionary_encode()
        gidx = np.asarray(gd.indices)
        vals = pc.round(batch.column(value_col).cast(pa.float64()),
                        ndigits=decimals,
                        round_mode="half_towards_infinity")
        v = np.asarray(vals.combine_chunks())
        # unique over (group, value) pairs in one pass
        order = np.lexsort((v, gidx))
        gs, vs = gidx[order], v[order]
        chg = np.empty(len(gs), dtype=bool)
        if len(gs):
            chg[0] = True
            chg[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(chg)
        counts = np.diff(np.append(starts, len(gs))).astype(np.int64)
        return pa.table(
            {
                group_col: gd.dictionary.take(pa.array(gs[starts])),
                "v": pa.array(vs[starts], pa.float64()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        df = group.to_pandas().groupby("v", as_index=False)["c"].sum() \
            .sort_values("v").reset_index(drop=True)
        cum = df["c"].cumsum().to_numpy()
        n = int(cum[-1])
        target = max(1, math.ceil(q * n))
        idx = int(np.searchsorted(cum, target, side="left"))
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "value": pa.array([float(df["v"].iloc[min(idx, len(df) - 1)])],
                                  pa.float64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(pick, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(group_col).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
