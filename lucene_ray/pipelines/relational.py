"""Relational pipelines over the TPC-H-ish test tables.

These exercise the engine's generic dataset operators — column-pruned reads,
vectorized filters, partial-then-global aggregation, broadcast joins, sort /
top-k, distinct, windowed (tumbling) aggregates — each with an exact DuckDB
oracle. Float aggregates are rounded on BOTH sides so the value-hash compare
is stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def lineitem_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1 shape: grouped aggregates over lineitem with a date filter.
    Partial aggregation happens inside map_batches (combine per batch), the
    groupby then shuffles only |groups x batches| rows."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        # quantize the per-row product to 4 decimals so the global sum is a
        # .0001-granular rational — summation order can then never flip the
        # final 2-decimal rounding (the SQL oracle rounds identically)
        disc_price = pc.round(
            pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
            ),
            ndigits=4,
        )
        batch = batch.append_column("disc_price", disc_price)
        # Arrow-native partial aggregation (no pandas round-trip mid-stage)
        g = (
            batch.select(
                ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "disc_price"]
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [("l_quantity", "sum"), ("l_extendedprice", "sum"),
                 ("disc_price", "sum"), ("l_quantity", "count")]
            )
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "count_order"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    out = agg.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(4)
    for c in ["sum_qty", "sum_base_price"]:
        out[c] = out[c].round(2)
    # disc_price was quantized to 4 decimals per row: round the sum at the
    # same granularity so no half-boundary (numpy half-even vs SQL half-away)
    out["sum_disc_price"] = out["sum_disc_price"].round(4)
    out["count_order"] = out["count_order"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_per_nation(sf_dir: str) -> pa.Table:
    """orders |x| customer |x| nation. Customer scales with the data (1 per
    ~10 orders), so orders|x|customer goes through the co-partitioned
    ``hash_join`` — no full-table read on the driver, no per-actor copy of
    the custkey column. Only the genuinely-small nation table (25 rows) is
    broadcast for the name lookup; counts pre-aggregate per batch so only
    |nations| rows per block reach the final groupby."""
    from lucene_ray.pipelines.shuffle_join import (estimate_parquet_bytes,
                                                   hash_join)

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_keys = pa.array(nation["n_nationkey"], pa.int64())
    nat_names = pa.array(nation["n_name"], pa.string())
    nat_ref = ray.put((nat_keys, nat_names))

    def cust_prep(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch.column("c_custkey"),
                         "c_nationkey": batch.column("c_nationkey")})

    import pyarrow.parquet as _pq
    osch = {f.name: f.type for f in _pq.ParquetFile(
        f"{sf_dir}/orders.parquet").schema_arrow}
    csch = {f.name: f.type for f in _pq.ParquetFile(
        f"{sf_dir}/customer.parquet").schema_arrow}
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_prep, batch_format="pyarrow")
    joined = hash_join(_read(sf_dir, "orders", ["o_custkey"]), cust,
                       key="o_custkey", left_cols=[],
                       right_cols=["c_nationkey"],
                       left_schema={"o_custkey": osch["o_custkey"]},
                       right_schema={"o_custkey": csch["c_custkey"],
                                     "c_nationkey": csch["c_nationkey"]},
                       est_bytes=estimate_parquet_bytes(
                           f"{sf_dir}/orders.parquet", ["o_custkey"])
                       + estimate_parquet_bytes(
                           f"{sf_dir}/customer.parquet",
                           ["c_custkey", "c_nationkey"]))

    def partial_counts(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "order_count": pa.array([], pa.int64())})
        keys, names = ray.get(nat_ref)
        g = pa.table({
            "k": pc.cast(batch.column("c_nationkey"), pa.int64()),
        }).group_by("k").aggregate([("k", "count")])
        idx = pc.index_in(g.column("k"), value_set=keys)
        return pa.table({"n_name": names.take(idx),
                         "order_count": pc.cast(g.column("k_count"),
                                                pa.int64())})

    agg = (
        joined.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("order_count", alias_name="order_count"))
    )
    out = agg.to_pandas().sort_values("n_name").reset_index(drop=True)
    out["order_count"] = out["order_count"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def top_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """sort + limit: top-k orders by totalprice (desc), orderkey asc."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return pa.Table.from_pandas(out, preserve_index=False)


def events_tumbling_daily(sf_dir: str) -> pa.Table:
    """Tumbling 1-day window aggregate per event_type (streaming-shaped op:
    event-time bucketing in map_batches + grouped aggregate)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                # quantized per-row so the grouped sum is order-independent
                # at the output rounding (see lineitem_pricing_summary)
                "value": pc.round(batch.column("value"), ndigits=6),
            }
        )

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    out = agg.to_pandas().sort_values(["event_type", "day"]).reset_index(drop=True)
    out["sum_value"] = out["sum_value"].round(6)
    out["n_events"] = out["n_events"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_sessions(sf_dir: str,
                    gap_us: int = 30 * 60 * 1_000_000) -> pa.Table:
    """Session windows per user with a 30-min inactivity gap
    (ops/windows.sessionize) — one groupby(user) shuffle, vectorized
    per-group gap detection."""
    from lucene_ray.ops.windows import sessionize

    out = sessionize(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        gap_us=gap_us,
    ).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def events_asof_purchase_click(sf_dir: str) -> pa.Table:
    """As-of join: each purchase event matched to the user's most recent
    click at-or-before the purchase time (LEFT: unmatched purchases kept
    with nulls). ops/windows.asof_join — one co-partitioned shuffle +
    per-group searchsorted."""
    from lucene_ray.ops.windows import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    left = ev.filter(expr="event_type == 'purchase'")
    right = ev.filter(expr="event_type == 'click'")
    out = asof_join(left, right, "user_id", "ts", "event_id",
                    right_prefix="r_").to_pandas()
    out = out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def events_signup_followups(sf_dir: str,
                            within_us: int = 30 * 60 * 1_000_000) -> pa.Table:
    """Banded range join: every event by the same user STRICTLY after a
    signup and within 30 minutes of it (ops/windows.range_join)."""
    from lucene_ray.ops.windows import range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    left = ev.filter(expr="event_type == 'signup'")
    out = range_join(left, ev, "user_id", "ts", "event_id",
                     within_us=within_us, right_prefix="r_").to_pandas()
    out = out.sort_values(["user_id", "event_id", "r_event_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def top_users_by_events(sf_dir: str, k: int = 10) -> pa.Table:
    agg = (
        _read(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"))
    )
    out = agg.to_pandas().sort_values(["n_events", "user_id"], ascending=[False, True]).head(k)
    out["n_events"] = out["n_events"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def distinct_users_per_type(sf_dir: str) -> pa.Table:
    """Exact COUNT(DISTINCT user_id) per event_type — two-level aggregation:
    dedup (event_type, user_id) pairs with a groupby (map-side combine makes
    the shuffle |distinct pairs|, not |events|), then count per type. The
    exact companion of the HLL sketch (``approx_distinct_grouped``)."""
    pairs = (
        _read(sf_dir, "events", ["event_type", "user_id"])
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )
    agg = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    out = agg.to_pandas().sort_values("event_type").reset_index(drop=True)
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def supplier_part_stats(sf_dir: str) -> pa.Table:
    """Grouped numeric aggregates with min/max/mean over a join-free table."""
    agg = (
        _read(sf_dir, "part", ["p_type", "p_retailprice"])
        .groupby("p_type")
        .aggregate(
            Count(alias_name="n_parts"),
            Min("p_retailprice", alias_name="min_price"),
            Max("p_retailprice", alias_name="max_price"),
            Mean("p_retailprice", alias_name="avg_price"),
        )
    )
    out = agg.to_pandas().sort_values("p_type").reset_index(drop=True)
    for c in ["min_price", "max_price"]:
        out[c] = out[c].round(2)
    out["avg_price"] = out["avg_price"].round(4)
    out["n_parts"] = out["n_parts"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_topk_orders(sf_dir: str, k: int = 3) -> pa.Table:
    """Grouped top-k (the grouping-module GroupingSearch analog, SURVEY §2.5):
    per o_orderpriority, the k highest-value orders.

    No shuffle on the low-cardinality key (a 5-value groupby would put ~20%
    of the dataset on one worker): each batch emits its own per-group top-k
    (k x |groups| rows), and the driver merges the tiny partials — the same
    partial-then-merge shape the engine uses for BM25 top-k."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .groupby("o_orderpriority", as_index=False, sort=False)
            .head(k),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()  # tiny: k rows per (group, batch)
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .groupby("o_orderpriority", as_index=False, sort=False)
        .head(k)
        .sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return pa.Table.from_pandas(out, preserve_index=False)


def sampled_avg_quantity(sf_dir: str, hex_lt: str = "1a") -> pa.Table:
    """Sampled aggregate (RandomSamplingFacetsCollector analog,
    facet/sampling): mean l_quantity over a deterministic pseudo-random
    sample. The sample is keyed by fmix32 of the combined row key
    ``l_orderkey * 8 + l_linenumber`` (injective: TPC-H linenumbers are
    1..7) below the ``hex_lt`` threshold (default "1a" ~ 10.2%), so
    membership is independent of block layout / worker count / run.
    Vectorized uint64 numpy over the whole key columns — no per-row Python
    — and the exact same xor/shift/multiply predicate is replayed in
    DuckDB (``fmix32_sql``) for a full value-hash oracle. Streaming
    map_batches filter, no shuffle; l_quantity is integer-valued so the
    double sum (hence the mean) is exact on both sides."""
    import numpy as np

    from lucene_ray.ops.curate import fmix32, hex_threshold

    thr = np.uint64(hex_threshold(hex_lt))
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def keep(batch: pa.Table) -> pa.Table:
        key = (np.asarray(batch.column("l_orderkey"), dtype=np.int64) * 8
               + np.asarray(batch.column("l_linenumber"), dtype=np.int64))
        mask = pa.array(fmix32(key) < thr)
        return batch.filter(mask).select(["l_quantity"])

    mean = ds.map_batches(keep, batch_format="pyarrow").mean("l_quantity")
    return pa.table({"avg_qty_sampled": pa.array([round(float(mean), 4)], pa.float64())})


def distinct_order_priorities(sf_dir: str) -> pa.Table:
    vals = sorted(_read(sf_dir, "orders", ["o_orderpriority"]).unique("o_orderpriority"))
    return pa.table({"o_orderpriority": pa.array(vals, pa.string())})


def filter_high_value_orders(sf_dir: str) -> pa.Table:
    """Vectorized filter + count by group (predicate-pushdown shape)."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice", "o_orderpriority"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch.column("o_orderstatus"), pa.scalar("O")),
            pc.greater(batch.column("o_totalprice"), pa.scalar(100000.0)),
        )
        return batch.filter(m).select(["o_orderpriority"])

    agg = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )
    out = agg.to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)
