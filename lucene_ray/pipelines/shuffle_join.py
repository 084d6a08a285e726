"""Large-large hash-partitioned join — the shuffle-join counterpart to the
broadcast join in ``relational.py`` (both sides too big to broadcast).

Shape: tag each side's rows with its origin, union the two datasets, hash
the join key into a BOUNDED number of buckets, shuffle ONCE on the bucket
(``groupby(bucket)``), and hash-join inside each bucket with a vectorized
pandas merge. This is the classic co-partitioned reduce-side join: shuffle
volume = |L| + |R| rows, the per-group unit is a bucket (thousands of keys)
rather than a single key — ``map_groups`` scheduling overhead is amortized
exactly like the Stage-C merge buckets, and skew is bounded by the hottest
bucket, not the hottest key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _bucket_of(key_col, n_buckets: int) -> pa.Array:
    """Deterministic bucket id per key (works for int and string keys)."""
    arr = key_col.combine_chunks() if isinstance(key_col, pa.ChunkedArray) else key_col
    if pa.types.is_integer(arr.type):
        k = np.asarray(arr, dtype=np.int64)
        # Fibonacci-hash mix so sequential keys spread across buckets
        h = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())
    import zlib

    vals = arr.to_pylist()
    return pa.array(
        np.array([zlib.crc32(str(v).encode()) % n_buckets for v in vals], np.int32),
        pa.int32(),
    )


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str, left_cols: list[str], right_cols: list[str],
              suffix: str = "_r", n_buckets: int = 64) -> ray.data.Dataset:
    """Inner equi-join on ``key``. Output columns: key, left_cols,
    right_cols (suffixed on clash)."""

    l_out = [c for c in left_cols if c != key]
    r_out = [c for c in right_cols if c != key]

    def tag(side: int, keep: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            cols = {
                "__key": batch.column(key),
                "__bucket": _bucket_of(batch.column(key), n_buckets),
                "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            }
            for c in keep:
                cols[f"__{side}_{c}"] = batch.column(c)
            return pa.table(cols)

        return f

    tagged = left.map_batches(tag(0, l_out), batch_format="pyarrow").union(
        right.map_batches(tag(1, r_out), batch_format="pyarrow")
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd

        side = np.asarray(group.column("__side"), dtype=np.int8)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        out_schema = {key: group.column("__key").type}
        for c in l_out:
            out_schema[c] = group.column(f"__0_{c}").type
        for c in r_out:
            out_schema[c + suffix if c in l_out else c] = group.column(f"__1_{c}").type
        if len(li) == 0 or len(ri) == 0:
            return pa.table({n: pa.array([], t) for n, t in out_schema.items()})
        ldf = pd.DataFrame({key: np.asarray(group.column("__key").take(pa.array(li)))})
        for c in l_out:
            ldf[c] = np.asarray(group.column(f"__0_{c}").take(pa.array(li)))
        rdf = pd.DataFrame({key: np.asarray(group.column("__key").take(pa.array(ri)))})
        for c in r_out:
            rdf[c + suffix if c in l_out else c] = np.asarray(
                group.column(f"__1_{c}").take(pa.array(ri))
            )
        j = ldf.merge(rdf, on=key, how="inner")  # vectorized hash join
        return pa.Table.from_pandas(j, preserve_index=False).cast(
            pa.schema(out_schema)
        )

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def order_revenue(sf_dir: str, top: int = 10) -> pa.Table:
    """TPC-H Q3-ish: revenue per order via a LARGE-LARGE shuffle join of
    orders and lineitem (neither side broadcast), then a grouped sum and
    top-k. Exact SQL oracle."""
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

    # per-batch partial aggregation after the join: a key lives in exactly
    # one join bucket, so batch partials collapse per key almost entirely;
    # the driver combine below handles any block splits. Output volume is
    # |distinct keys| rows — no second distributed shuffle needed.
    def agg_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64()),
                             "n_items": pa.array([], pa.int64())})
        return (
            batch.select(["o_orderkey", "revenue"])
            .group_by("o_orderkey")
            .aggregate([("revenue", "sum"), ("revenue", "count")])
            .rename_columns(["o_orderkey", "revenue", "n_items"])
        )

    out = joined.map_batches(agg_partial, batch_format="pyarrow").to_pandas()
    out = out.groupby("o_orderkey", as_index=False).agg(
        revenue=("revenue", "sum"), n_items=("n_items", "sum")
    )
    out["revenue"] = out["revenue"].round(4)
    out["n_items"] = out["n_items"].astype("int64")
    out = out.sort_values(["revenue", "o_orderkey"], ascending=[False, True]).head(top)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
