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


#: target UNCOMPRESSED bytes per join bucket group: both sides' rows for a
#: bucket are materialized together in one map_groups task (plus the pandas
#: merge's working copies), so this bounds the per-task heap, not the block
#: size. 128 MiB × ~4x merge overhead stays well inside a 4 GiB worker.
TARGET_BUCKET_BYTES = 128 << 20


def estimate_parquet_bytes(path: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte estimate for ``columns`` of a parquet file or
    directory, from FOOTER metadata only (no data read) — the same
    auto-sizing source Stage C uses for its task granularity."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        paths = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".parquet")]
    else:
        paths = [path]
    total = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                root = col.path_in_schema.split(".")[0]
                if columns is None or root in columns:
                    total += col.total_uncompressed_size
    return total


def auto_buckets(est_bytes: int | None, floor: int = 64,
                 target: int = TARGET_BUCKET_BYTES) -> int:
    """Bucket count so each bucket group holds ~``target`` uncompressed
    bytes; ``floor`` (64, the r4 fixed value) keeps small inputs parallel.
    At 100× lineitem scale a fixed 64 put >1/64th of the corpus in one
    map_groups heap — the count must grow with the input."""
    if not est_bytes or est_bytes <= 0:
        return floor
    return max(floor, -(-int(est_bytes) // int(target)))


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str, left_cols: list[str], right_cols: list[str],
              suffix: str = "_r", n_buckets: int | None = None,
              left_schema: dict | None = None,
              right_schema: dict | None = None,
              est_bytes: int | None = None) -> ray.data.Dataset:
    """Inner equi-join on ``key``. Output columns: key, left_cols,
    right_cols (suffixed on clash). Pass ``left_schema``/``right_schema``
    ({col: pa.DataType}) when the caller statically knows them — each
    ``Dataset.schema()`` call on a lazy map_batches pipeline executes a
    limit-1 prefix of it (a whole extra Ray execution), which dominated
    chained-join latency. ``n_buckets=None`` auto-sizes the bucket count
    from ``est_bytes`` (both sides' pruned-column footprint, parquet footer
    metadata — see :func:`estimate_parquet_bytes`) with a floor of 64."""
    if n_buckets is None:
        n_buckets = auto_buckets(est_bytes)

    l_out = [c for c in left_cols if c != key]
    r_out = [c for c in right_cols if c != key]

    # resolve the output schema ONCE on the driver (Dataset.schema reads
    # parquet metadata / executes at most one upstream block): a bucket
    # group that received rows from only ONE side (possible at small scale
    # or under selective filters) must still emit correctly-typed empty
    # output, and an empty join block must keep the full schema so chained
    # joins' tag stages can read their columns
    lsch = left_schema or dict(zip(left.schema().names, left.schema().types))
    rsch = right_schema or dict(zip(right.schema().names, right.schema().types))
    out_schema = {key: lsch[key]}
    for c in l_out:
        out_schema[c] = lsch[c]
    for c in r_out:
        out_schema[c + suffix if c in l_out else c] = rsch[c]

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
        est_bytes=estimate_parquet_bytes(
            f"{sf_dir}/orders.parquet", ["o_orderkey", "o_orderdate"])
        + estimate_parquet_bytes(
            f"{sf_dir}/lineitem.parquet",
            ["l_orderkey", "l_extendedprice", "l_discount"]),
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


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_lo: str = "1995-01-01",
                          date_hi: str = "1996-01-01",
                          supplier_broadcast_limit: int = 50_000_000) -> pa.Table:
    """TPC-H Q5 shape — revenue per nation from orders a LOCAL supplier
    (same nation as the customer) fulfilled in a date window, customer
    restricted to one region. Exercises the engine's multi-way join
    composition at the scale-correct shapes:

    - region/nation: tiny driver reads (the catalog);
    - orders ⋈ customer: LARGE-LARGE co-partitioned hash_join on custkey
      (column-pruned + date/region-filtered AT THE READ);
    - lineitem ⋈ (orders⋈customer): second LARGE-LARGE hash_join on
      orderkey — join output streams straight into the next tag stage,
      never materializing;
    - supplier: below ``supplier_broadcast_limit`` rows, a broadcast of two
      sorted numpy arrays (one ray.put, np.searchsorted probe per batch);
      above it, a third co-partitioned hash_join on suppkey so no single
      node ever holds the whole supplier column;
    - the local-supplier predicate (s_nationkey == c_nationkey) and the
      per-nation partial sums run inside the final map_batches; only
      |nations| rows reach the driver.

    Revenue aggregates EXACTLY: per-item round(extprice*(1-disc)*10^4) as
    int64, summed as integers (order-independent), divided once at the end
    — so the SQL oracle matches to the last bit."""
    import numpy as np
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {r["r_name"]: r["r_regionkey"] for r in reg.to_pylist()}[region]
    nat_rows = [r for r in nat.to_pylist() if r["n_regionkey"] == rkey]
    nat_name = {r["n_nationkey"]: r["n_name"] for r in nat_rows}
    nat_keys = np.array(sorted(nat_name), dtype=np.int64)

    # Supplier-side strategy: parquet metadata (no data read) decides
    # broadcast vs shuffle. Below the limit, broadcast two SORTED numpy
    # arrays (not a Python dict): actors probe with np.searchsorted so the
    # probe stays fully vectorized and the broadcast payload is two flat
    # buffers. Above the limit, a third co-partitioned hash_join keeps the
    # supplier column off the driver and off every actor's heap.
    n_suppliers = pq.ParquetFile(f"{sf_dir}/supplier.parquet").metadata.num_rows
    broadcast_suppliers = n_suppliers <= supplier_broadcast_limit
    sup_ref = None
    if broadcast_suppliers:
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        sup_keys = np.asarray(sup.column("s_suppkey"), dtype=np.int64)
        sup_nats = np.asarray(sup.column("s_nationkey"), dtype=np.int64)
        order = np.argsort(sup_keys, kind="stable")
        sup_ref = ray.put((np.ascontiguousarray(sup_keys[order]),
                           np.ascontiguousarray(sup_nats[order])))

    import datetime as _dt

    lo = _dt.datetime.fromisoformat(date_lo)
    hi = _dt.datetime.fromisoformat(date_hi)

    def filt_orders(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch.column("o_orderdate"), pa.scalar(lo)),
                    pc.less(batch.column("o_orderdate"), pa.scalar(hi)))
        t = batch.filter(m)
        return pa.table({"custkey": t.column("o_custkey"),
                         "o_orderkey": t.column("o_orderkey")})

    def filt_cust(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("c_nationkey"),
                     value_set=pa.array(nat_keys, pa.int32()).cast(
                         batch.column("c_nationkey").type))
        t = batch.filter(m)
        return pa.table({"custkey": t.column("c_custkey"),
                         "c_nationkey": t.column("c_nationkey")})

    # static schemas from the parquet footers (no Ray execution — each
    # Dataset.schema() on a lazy pipeline would run a limit-1 prefix)
    osch = {f.name: f.type for f in
            pq.ParquetFile(f"{sf_dir}/orders.parquet").schema_arrow}
    csch = {f.name: f.type for f in
            pq.ParquetFile(f"{sf_dir}/customer.parquet").schema_arrow}
    lsch = {f.name: f.type for f in
            pq.ParquetFile(f"{sf_dir}/lineitem.parquet").schema_arrow}
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                             "o_orderdate"]
    ).map_batches(filt_orders, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(filt_cust, batch_format="pyarrow")
    # auto-sized buckets from footer metadata (pruned-column upper bounds —
    # the pre-join filters only shrink these)
    orders_bytes = estimate_parquet_bytes(
        f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey"])
    cust_bytes = estimate_parquet_bytes(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_nationkey"])
    line_bytes = estimate_parquet_bytes(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_suppkey"])
    oc = hash_join(orders, cust, key="custkey",
                   left_cols=["o_orderkey"], right_cols=["c_nationkey"],
                   left_schema={"custkey": osch["o_custkey"],
                                "o_orderkey": osch["o_orderkey"]},
                   right_schema={"custkey": csch["c_custkey"],
                                 "c_nationkey": csch["c_nationkey"]},
                   est_bytes=orders_bytes + cust_bytes)

    def line_prep(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(
            pc.multiply(batch.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
            pa.scalar(10000.0)))
        return pa.table({
            "o_orderkey": batch.column("l_orderkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "cents": cents.cast(pa.int64()),
        })

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_prep, batch_format="pyarrow")
    import pyarrow as _pa
    ol = hash_join(line, oc, key="o_orderkey",
                   left_cols=["l_suppkey", "cents"],
                   right_cols=["c_nationkey"],
                   left_schema={"o_orderkey": lsch["l_orderkey"],
                                "l_suppkey": lsch["l_suppkey"],
                                "cents": _pa.int64()},
                   right_schema={"custkey": csch["c_custkey"],
                                 "o_orderkey": osch["o_orderkey"],
                                 "c_nationkey": csch["c_nationkey"]},
                   est_bytes=line_bytes * 2 + orders_bytes)

    if broadcast_suppliers:
        def local_partial(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "cents": pa.array([], pa.int64())})
            skeys, snats = ray.get(sup_ref)
            sk = np.asarray(batch.column("l_suppkey"), dtype=np.int64)
            if len(skeys) == 0:
                s_nat = np.full(len(sk), -1, dtype=np.int64)
            else:
                pos = np.searchsorted(skeys, sk)
                pos = np.minimum(pos, len(skeys) - 1)
                s_nat = np.where(skeys[pos] == sk, snats[pos], -1)
            c_nat = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
            keep = s_nat == c_nat
            t = pa.table({
                "n_nationkey": pa.array(s_nat[keep], pa.int64()),
                "cents": pa.array(
                    np.asarray(batch.column("cents"), dtype=np.int64)[keep],
                    pa.int64()),
            })
            return t.group_by("n_nationkey").aggregate([("cents", "sum")]
                                                       ).rename_columns(
                ["n_nationkey", "cents"])

        tagged = ol.map_batches(local_partial, batch_format="pyarrow")
    else:
        def sup_prep(batch: pa.Table) -> pa.Table:
            return pa.table({"l_suppkey": batch.column("s_suppkey"),
                             "s_nationkey": batch.column("s_nationkey")})

        sup_ds = ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).map_batches(sup_prep, batch_format="pyarrow")
        ssch = {f.name: f.type for f in
                pq.ParquetFile(f"{sf_dir}/supplier.parquet").schema_arrow}
        ols = hash_join(ol, sup_ds, key="l_suppkey",
                        left_cols=["cents", "c_nationkey"],
                        right_cols=["s_nationkey"],
                        left_schema={"l_suppkey": lsch["l_suppkey"],
                                     "cents": _pa.int64(),
                                     "c_nationkey": csch["c_nationkey"]},
                        right_schema={"l_suppkey": ssch["s_suppkey"],
                                      "s_nationkey": ssch["s_nationkey"]},
                        est_bytes=line_bytes * 2 + estimate_parquet_bytes(
                            f"{sf_dir}/supplier.parquet",
                            ["s_suppkey", "s_nationkey"]))

        def local_partial_joined(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "cents": pa.array([], pa.int64())})
            s_nat = np.asarray(batch.column("s_nationkey"), dtype=np.int64)
            c_nat = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
            keep = s_nat == c_nat
            t = pa.table({
                "n_nationkey": pa.array(s_nat[keep], pa.int64()),
                "cents": pa.array(
                    np.asarray(batch.column("cents"), dtype=np.int64)[keep],
                    pa.int64()),
            })
            return t.group_by("n_nationkey").aggregate([("cents", "sum")]
                                                       ).rename_columns(
                ["n_nationkey", "cents"])

        tagged = ols.map_batches(local_partial_joined, batch_format="pyarrow")

    parts = tagged.to_pandas()
    agg = parts.groupby("n_nationkey", as_index=False).agg(
        cents=("cents", "sum"))
    agg["n_name"] = agg["n_nationkey"].map(nat_name)
    agg["revenue"] = agg["cents"].astype("float64") / 10000.0
    agg = agg.sort_values(["revenue", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return pa.Table.from_pandas(agg[["n_name", "revenue"]],
                                preserve_index=False)
