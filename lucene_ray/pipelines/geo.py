"""Geo pipelines over the ``customer`` table with DERIVED deterministic
coordinates.

The test tables carry no lat/lon, so each customer gets a synthetic point
from pure integer arithmetic on its key — reproducible bit-for-bit in both
the Ray kernels and the DuckDB oracles (integer modulus, then one float64
division):

    lat = ((c_custkey * 7919)   % 18000) / 100.0 -  90.0
    lon = ((c_custkey * 104729) % 36000) / 100.0 - 180.0

The operators themselves live in :mod:`lucene_ray.ops.geo` (box filter,
radius filter with bbox prune, haversine k-NN) — the LatLonPoint query
family (lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java).
Pinned query constants are chosen so every decision margin (radius vs
nearest non-hit, kth vs (k+1)th distance) is kilometres wide at every sf —
float ulp noise between numpy and DuckDB cannot flip a hit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from lucene_ray.ops import geo

# dateline-CROSSING box (min_lon > max_lon) — exercises the wrap path
BOX = (-30.0, 30.0, 100.0, -160.0)
CENTER_LAT, CENTER_LON = 48.85, 2.35
RADIUS_M = 2_000_000.0


def customer_points(sf_dir: str) -> ray.data.Dataset:
    """Customer keys with derived (lat, lon) — column-pruned read, the
    derivation is one vectorized int64 map."""

    def derive(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        lat = ((ck * 7919) % 18000) / 100.0 - 90.0
        lon = ((ck * 104729) % 36000) / 100.0 - 180.0
        return pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    return ds.map_batches(derive, batch_format="pyarrow")


def _ids(ds: ray.data.Dataset) -> pa.Table:
    """Collect the (small, already-filtered) hit set and sort by key."""
    parts = [
        np.asarray(b.column("c_custkey"), dtype=np.int64)
        for b in ds.select_columns(["c_custkey"]).iter_batches(
            batch_format="pyarrow")
    ]
    ids = np.sort(np.concatenate(parts)) if parts else np.array([], np.int64)
    return pa.table({"c_custkey": pa.array(ids, pa.int64())})


def geo_box_hits(sf_dir: str) -> pa.Table:
    """Customers inside the pinned dateline-crossing box, sorted by key."""
    return _ids(geo.geo_box(customer_points(sf_dir), *BOX))


def geo_distance_hits(sf_dir: str) -> pa.Table:
    """Customers within RADIUS_M of the pinned center, sorted by key."""
    return _ids(geo.geo_distance(
        customer_points(sf_dir), CENTER_LAT, CENTER_LON, RADIUS_M))


def geo_knn_top10(sf_dir: str) -> pa.Table:
    """10 nearest customers to the pinned center: (rank, c_custkey)."""
    t = geo.geo_knn(customer_points(sf_dir), CENTER_LAT, CENTER_LON, k=10,
                    id_col="c_custkey")
    return t.select(["rank", "c_custkey"])


# non-convex chevron (lat, lon) — exercises the even-odd crossing path;
# vertices picked far from the 0.01-degree derived-point lattice edges
POLY_LATS = (-10.0, 55.0, -10.0, 20.0)
POLY_LONS = (-30.0, 0.0, 30.0, 0.0)


def geo_polygon_hits(sf_dir: str) -> pa.Table:
    """Customers inside the pinned chevron polygon, sorted by key
    (LatLonPoint.newPolygonQuery; even-odd crossing containment)."""
    return _ids(geo.geo_polygon(customer_points(sf_dir), POLY_LATS, POLY_LONS))


PIVOT_M = 1_000_000.0


def geo_distance_feature_top10(sf_dir: str) -> pa.Table:
    """Top-10 customers by the distance-feature score
    ``boost * pivot / (pivot + haversine)`` (LatLonPoint.
    newDistanceFeatureQuery, LatLonPointDistanceFeatureQuery.java) from the
    pinned center with a 1000 km pivot. Returns (rank, c_custkey, score_r6);
    float64 formula narrowed once to float32, like the executor path."""
    t = geo.geo_knn(customer_points(sf_dir), CENTER_LAT, CENTER_LON, k=10,
                    id_col="c_custkey", round_digits=None)
    d = np.asarray(t.column("dist_m"), dtype=np.float64)
    score = (PIVOT_M / (PIVOT_M + d)).astype(np.float32)
    return pa.table({
        "rank": t.column("rank"),
        "c_custkey": t.column("c_custkey"),
        "score_r6": pa.array(np.round(score.astype(np.float64), 6),
                             pa.float64()),
    })


# --- indexed shapes (LatLonShape analog; ops.geo shape kernels) -----------
# Derived deterministic geometry, same integer-lattice recipe as the
# points: per customer one SEGMENT (linestring tessellation row) and TWO
# TRIANGLES (a two-triangle polygon tessellation). All multipliers are
# distinct primes so coordinates decorrelate.
SEG_MULTS = (7919, 104729, 4409, 9973)            # y1 x1 y2 x2
TRI_MULTS = (
    (7919, 104729, 4409, 9973, 12007, 24001),     # triangle 1: y1 x1 .. y3 x3
    (5003, 31013, 8191, 28411, 15013, 9001),      # triangle 2
)
# off-lattice box bounds (the derived lattice is multiples of 0.01, so
# *.005 bounds can never coincide with a coordinate): moderate box for
# INTERSECTS, near-global box for WITHIN (ALL-vertices containment keeps a
# useful hit rate).
INTERSECT_BOX = (10.005, 40.005, -60.005, 20.005)   # min_lat max_lat min_lon max_lon
WITHIN_BOX = (-80.005, 80.005, -170.005, 170.005)


def _lat_expr(mult: int):
    return lambda ck: ((ck * mult) % 18000) / 100.0 - 90.0


def _lon_expr(mult: int):
    return lambda ck: ((ck * mult) % 36000) / 100.0 - 180.0


def customer_segments(sf_dir: str) -> ray.data.Dataset:
    """One derived segment row per customer (a linestring's tessellation)."""
    my1, mx1, my2, mx2 = SEG_MULTS

    def derive(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        return pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "lat1": pa.array(_lat_expr(my1)(ck), pa.float64()),
            "lon1": pa.array(_lon_expr(mx1)(ck), pa.float64()),
            "lat2": pa.array(_lat_expr(my2)(ck), pa.float64()),
            "lon2": pa.array(_lon_expr(mx2)(ck), pa.float64()),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(derive, batch_format="pyarrow")


def customer_triangles(sf_dir: str) -> ray.data.Dataset:
    """TWO derived triangle rows per customer — a polygon indexed as its
    tessellation (multi-row docs exercise the cross-batch ALL/ANY
    aggregation paths)."""

    def derive(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        parts = []
        for my1, mx1, my2, mx2, my3, mx3 in TRI_MULTS:
            parts.append(pa.table({
                "c_custkey": pa.array(ck, pa.int64()),
                "lat1": pa.array(_lat_expr(my1)(ck), pa.float64()),
                "lon1": pa.array(_lon_expr(mx1)(ck), pa.float64()),
                "lat2": pa.array(_lat_expr(my2)(ck), pa.float64()),
                "lon2": pa.array(_lon_expr(mx2)(ck), pa.float64()),
                "lat3": pa.array(_lat_expr(my3)(ck), pa.float64()),
                "lon3": pa.array(_lon_expr(mx3)(ck), pa.float64()),
            }))
        return pa.concat_tables(parts)

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(derive, batch_format="pyarrow")


# off-lattice chevron (non-convex) for the shape-vs-POLYGON relation —
# same shape family as the point polygon query, .005 offsets keep every
# vertex off the derived 0.01 lattice
SHAPE_POLY_LATS = (-10.005, 55.005, -10.005, 20.005)
SHAPE_POLY_LONS = (-30.005, 0.005, 30.005, 0.005)


def geo_shape_polygon_hits(sf_dir: str) -> pa.Table:
    """Customers whose derived segment INTERSECTS the pinned chevron
    polygon (LatLonShape.newPolygonQuery, QueryRelation.INTERSECTS),
    sorted by key."""
    return geo.geo_shape_polygon_intersects(
        customer_segments(sf_dir), SHAPE_POLY_LATS, SHAPE_POLY_LONS,
        id_col="c_custkey")


def geo_shape_intersects_hits(sf_dir: str) -> pa.Table:
    """Customers whose derived segment INTERSECTS the pinned box
    (LatLonShape.newBoxQuery, QueryRelation.INTERSECTS), sorted by key."""
    return geo.geo_shape_box_intersects(
        customer_segments(sf_dir), *INTERSECT_BOX, id_col="c_custkey")


def geo_shape_within_hits(sf_dir: str) -> pa.Table:
    """Customers whose BOTH derived triangles are WITHIN the pinned box
    (LatLonShape.newBoxQuery, QueryRelation.WITHIN: every tessellation
    row must be inside), sorted by key."""
    return geo.geo_shape_within_box(
        customer_triangles(sf_dir), *WITHIN_BOX, id_col="c_custkey")
