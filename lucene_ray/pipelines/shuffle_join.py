"""Large-large hash-partitioned join — the shuffle-join counterpart to the
broadcast join in ``relational.py`` (both sides too big to broadcast).

Shape: tag each side's rows with its origin, union the two datasets, hash-
shuffle ONCE on the join key (``groupby(key)``), and join inside each group
(``map_groups`` sees all rows of both sides for a key). This is the
classic co-partitioned reduce-side join: shuffle volume = |L| + |R| rows,
no driver materialization, skew bounded by the hottest key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str, left_cols: list[str], right_cols: list[str],
              suffix: str = "_r") -> ray.data.Dataset:
    """Inner equi-join on ``key``. Output columns: key, left_cols,
    right_cols (suffixed on clash)."""

    l_out = [c for c in left_cols if c != key]
    r_out = [c for c in right_cols if c != key]

    def tag(side: int, keep: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            cols = {"__key": batch.column(key),
                    "__side": pa.array(np.full(len(batch), side, dtype=np.int8))}
            for c in keep:
                cols[f"__{side}_{c}"] = batch.column(c)
            return pa.table(cols)

        return f

    tagged = left.map_batches(tag(0, l_out), batch_format="pyarrow").union(
        right.map_batches(tag(1, r_out), batch_format="pyarrow")
    )

    out_names = [key, *l_out, *[c + suffix if c in l_out else c for c in r_out]]

    def join_group(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"), dtype=np.int8)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if len(li) == 0 or len(ri) == 0:
            return pa.table({n: pa.array([], group.column("__key").type
                                         if n == key else _col_type(group, n, l_out, r_out, suffix))
                             for n in out_names})
        # cross product per key group (inner join semantics)
        lrep = np.repeat(li, len(ri))
        rrep = np.tile(ri, len(li))
        cols = {key: group.column("__key").take(pa.array(lrep))}
        for c in l_out:
            cols[c] = group.column(f"__0_{c}").take(pa.array(lrep))
        for c in r_out:
            name = c + suffix if c in l_out else c
            cols[name] = group.column(f"__1_{c}").take(pa.array(rrep))
        return pa.table(cols)

    def _col_type(group, name, l_out, r_out, suffix):
        if name in l_out:
            return group.column(f"__0_{name}").type
        base = name[: -len(suffix)] if name.endswith(suffix) else name
        return group.column(f"__1_{base}").type

    return tagged.groupby("__key").map_groups(join_group, batch_format="pyarrow")


def order_revenue(sf_dir: str, top: int = 10) -> pa.Table:
    """TPC-H Q3-ish: revenue per order via a LARGE-LARGE shuffle join of
    orders and lineitem (neither side broadcast), then a grouped sum and
    top-k. Exact SQL oracle."""
    import pyarrow.compute as pc

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])
    lineitem = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                     columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.round(
            pc.multiply(batch.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
            ndigits=4,
        )
        return pa.table({"o_orderkey": batch.column("l_orderkey"), "revenue": rev})

    lrev = lineitem.map_batches(revenue, batch_format="pyarrow")
    joined = hash_join(
        orders, lrev, key="o_orderkey",
        left_cols=["o_orderdate"], right_cols=["revenue"],
    )
    from ray.data.aggregate import Count, Sum

    agg = joined.groupby("o_orderkey").aggregate(
        Sum("revenue", alias_name="revenue"),
        Count(alias_name="n_items"),
    )
    out = agg.to_pandas()
    out["revenue"] = out["revenue"].round(4)
    out["n_items"] = out["n_items"].astype("int64")
    out = out.sort_values(["revenue", "o_orderkey"], ascending=[False, True]).head(top)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
