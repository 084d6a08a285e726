"""Geo-spatial operators over lat/lon doc-values columns.

The Lucene counterparts are LatLonPoint.newBoxQuery / newDistanceQuery
(lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java) and the
distance sort of LatLonDocValuesField.newDistanceSort; the distance kernel
follows SloppyMath.haversinMeters (lucene/core/src/java/org/apache/lucene/
util/SloppyMath.java) using the mean earth radius. Here a "point field" is
simply two float64 columns, so:

- ``geo_box``        — streaming bounding-box filter (dateline-aware),
  pure comparisons, zero-copy Arrow batches;
- ``geo_distance``   — streaming radius filter: cheap bounding-box prune
  first (the BKD-tree outer rectangle analog), exact haversine on the
  survivors;
- ``geo_knn``        — k nearest docs to a point: per-batch partial top-k
  (boundary ties kept), tiny driver merge — the same shape as the BM25
  top-k merge and ``ann.knn_brute``.

All kernels are vectorized float64 numpy; nothing materializes the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Mean earth radius in meters (IUGG; the constant Lucene's SloppyMath uses
# for haversinMeters).
EARTH_RADIUS_M = 6371008.7714


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters between (lat1, lon1) and
    (lat2, lon2), degrees in, vectorized float64 (SloppyMath.haversinMeters
    formula shape: sin^2 half-deltas, asin of the clamped sqrt)."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dphi = p2 - p1
    dlam = np.radians(np.asarray(lon2, dtype=np.float64) -
                      np.asarray(lon1, dtype=np.float64))
    h = (np.sin(dphi / 2.0) ** 2 +
         np.cos(p1) * np.cos(p2) * np.sin(dlam / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def distance_bbox(lat: float, lon: float, radius_m: float):
    """Outer bounding box of a distance circle: (min_lat, max_lat, min_lon,
    max_lon); longitudes may wrap (min_lon > max_lon) and degenerate to the
    full range near the poles. Standard small-circle bounding rectangle."""
    dlat = np.degrees(radius_m / EARTH_RADIUS_M)
    min_lat, max_lat = lat - dlat, lat + dlat
    if min_lat <= -90.0 or max_lat >= 90.0:
        return max(min_lat, -90.0), min(max_lat, 90.0), -180.0, 180.0
    # max longitude delta occurs at the circle's extreme latitudes
    coslat = min(np.cos(np.radians(min_lat)), np.cos(np.radians(max_lat)))
    sin_r = np.sin(radius_m / EARTH_RADIUS_M)
    if sin_r >= coslat:
        return min_lat, max_lat, -180.0, 180.0
    dlon = np.degrees(np.arcsin(sin_r / coslat))
    min_lon, max_lon = lon - dlon, lon + dlon
    if min_lon < -180.0:
        min_lon += 360.0
    if max_lon > 180.0:
        max_lon -= 360.0
    return min_lat, max_lat, min_lon, max_lon


def _box_mask(lat: np.ndarray, lon: np.ndarray, min_lat, max_lat,
              min_lon, max_lon) -> np.ndarray:
    mask = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        return mask & (lon >= min_lon) & (lon <= max_lon)
    # crosses the dateline: two disjoint longitude strips
    return mask & ((lon >= min_lon) | (lon <= max_lon))


def geo_box(ds: ray.data.Dataset, min_lat: float, max_lat: float,
            min_lon: float, max_lon: float, lat_col: str = "lat",
            lon_col: str = "lon") -> ray.data.Dataset:
    """Docs inside the (inclusive) lat/lon box — LatLonPoint.newBoxQuery.
    ``min_lon > max_lon`` means the box crosses the dateline."""

    def keep(batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch.column(lat_col), dtype=np.float64)
        lon = np.asarray(batch.column(lon_col), dtype=np.float64)
        return batch.filter(pa.array(
            _box_mask(lat, lon, min_lat, max_lat, min_lon, max_lon)))

    return ds.map_batches(keep, batch_format="pyarrow")


def geo_distance(ds: ray.data.Dataset, lat: float, lon: float,
                 radius_m: float, lat_col: str = "lat",
                 lon_col: str = "lon") -> ray.data.Dataset:
    """Docs within ``radius_m`` meters of (lat, lon) —
    LatLonPoint.newDistanceQuery: bbox prune, then exact haversine."""
    bb = distance_bbox(lat, lon, radius_m)

    def keep(batch: pa.Table) -> pa.Table:
        blat = np.asarray(batch.column(lat_col), dtype=np.float64)
        blon = np.asarray(batch.column(lon_col), dtype=np.float64)
        mask = _box_mask(blat, blon, *bb)
        idx = np.flatnonzero(mask)
        if len(idx):
            d = haversine_m(blat[idx], blon[idx], lat, lon)
            mask[idx] = d <= radius_m
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def geo_knn(ds: ray.data.Dataset, lat: float, lon: float, k: int = 10,
            id_col: str = "doc_id", lat_col: str = "lat",
            lon_col: str = "lon", round_digits: int | None = 3) -> pa.Table:
    """k nearest docs to (lat, lon) by haversine distance —
    LatLonDocValuesField.newDistanceSort consumed by a top-k collector.
    Returns (rank, id, dist_m) with ties broken by id asc; per-batch
    partial top-k keeps kth-distance ties so the global (dist asc, id asc)
    order is decided at the merge."""

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        d = haversine_m(np.asarray(batch.column(lat_col), dtype=np.float64),
                        np.asarray(batch.column(lon_col), dtype=np.float64),
                        lat, lon)
        kk = min(k, len(d))
        if kk == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dist_m": pa.array([], pa.float64())})
        kth = np.partition(d, kk - 1)[kk - 1]
        part = np.flatnonzero(d <= kth)
        return pa.table({id_col: pa.array(ids[part], pa.int64()),
                         "dist_m": pa.array(d[part], pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dist_m", id_col],
                              ascending=[True, True]).head(k)
    dist = pa.array(parts["dist_m"].to_numpy(), pa.float64())
    if round_digits is not None:
        # half-away-from-zero to match SQL ROUND (DuckDB) in the oracles
        dist = pc.round(dist, ndigits=round_digits,
                        round_mode="half_towards_infinity")
    return pa.table({
        "rank": pa.array(np.arange(1, len(parts) + 1), pa.int64()),
        id_col: pa.array(parts[id_col].to_numpy(), pa.int64()),
        "dist_m": dist,
    })


def point_in_polygon(lat, lon, poly_lats, poly_lons) -> np.ndarray:
    """Even-odd crossing-number point-in-polygon test — the containment
    semantics of Lucene's polygon tree (lucene/core/src/java/org/apache/
    lucene/geo/Polygon2D.java / EdgeTree crossing counts): a point is
    inside when an eastward ray crosses the boundary an odd number of
    times. Works for any SIMPLE polygon (convex or not); the closing
    edge last->first is implicit. Vectorized over the points (one numpy
    pass per polygon edge; polygons are small)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    inside = np.zeros(len(lat), dtype=bool)
    n = len(poly_lats)
    j = n - 1
    for i in range(n):
        yi, xi = float(poly_lats[i]), float(poly_lons[i])
        yj, xj = float(poly_lats[j]), float(poly_lons[j])
        if yi != yj:
            cross = ((yi > lat) != (yj > lat)) & (
                lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
            )
            inside ^= cross
        j = i
    return inside


def point_in_rings(lat, lon, rings) -> np.ndarray:
    """Even-odd containment over a polygon WITH HOLES (geo/Polygon.java:
    ``Polygon(lats, lons, Polygon... holes)``): the crossing parities of
    every ring XOR together, so a point inside the outer ring but inside a
    hole is outside. ``rings`` = [(lats, lons), ...], outer first."""
    inside = np.zeros(len(np.asarray(lat)), dtype=bool)
    for r_lats, r_lons in rings:
        inside ^= point_in_polygon(lat, lon, r_lats, r_lons)
    return inside


def geo_polygon(ds: ray.data.Dataset, poly_lats, poly_lons,
                lat_col: str = "lat", lon_col: str = "lon",
                holes=()) -> ray.data.Dataset:
    """Docs inside the polygon — LatLonPoint.newPolygonQuery
    (document/LatLonPoint.java): bounding-box prune, then the exact
    even-odd test on the surviving points. ``holes``: optional inner
    rings [(lats, lons), ...] excluded from the match (Polygon holes)."""
    min_lat, max_lat = float(min(poly_lats)), float(max(poly_lats))
    min_lon, max_lon = float(min(poly_lons)), float(max(poly_lons))
    rings = [(tuple(poly_lats), tuple(poly_lons))] + [
        (tuple(a), tuple(b)) for a, b in holes
    ]

    def keep(batch: pa.Table) -> pa.Table:
        blat = np.asarray(batch.column(lat_col), dtype=np.float64)
        blon = np.asarray(batch.column(lon_col), dtype=np.float64)
        mask = _box_mask(blat, blon, min_lat, max_lat, min_lon, max_lon)
        idx = np.flatnonzero(mask)
        if len(idx):
            mask[idx] = point_in_rings(blat[idx], blon[idx], rings)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Indexed shapes — the LatLonShape analog (lucene/core/src/java/org/apache/
# lucene/document/LatLonShape.java): a doc's polygon/linestring is indexed
# as a SET of tessellated component rows (triangles / segments), one row per
# component, exactly as Lucene's Tessellator emits triangles into the doc's
# ShapeField entries. Query relations over an axis-aligned box:
#   INTERSECTS — the doc matches if ANY component row intersects the box
#                (ShapeQuery's disjunctive per-triangle visit);
#   WITHIN     — the doc matches only if ALL component rows are inside
#                (a single escaping triangle fails the relation).
# Kernels are division-free orientation arithmetic (strict sign tests), so
# the same expressions replay bit-identically in the SQL oracles.
# ---------------------------------------------------------------------------


def _orient(px, py, qx, qy, rx, ry):
    """Twice the signed area of (p, q, r) — the sign says which side of
    ray p->q the point r lies on (core geo predicate, as Lucene's
    GeoUtils.orient)."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def segment_box_intersects(y1, x1, y2, x2, min_lat, max_lat,
                           min_lon, max_lon) -> np.ndarray:
    """True where segment (y1,x1)-(y2,x2) intersects the box: either
    endpoint strictly inside, or a proper crossing of one of the four box
    edges (both strict-sign orientation tests). Box bounds are expected
    OFF the data lattice so degenerate touch cases cannot arise."""
    y1 = np.asarray(y1, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    inside = (
        ((y1 > min_lat) & (y1 < max_lat) & (x1 > min_lon) & (x1 < max_lon))
        | ((y2 > min_lat) & (y2 < max_lat) & (x2 > min_lon) & (x2 < max_lon))
    )
    corners = [(min_lon, min_lat), (max_lon, min_lat),
               (max_lon, max_lat), (min_lon, max_lat)]
    hit = inside
    for i in range(4):
        ax, ay = corners[i]
        bx, by = corners[(i + 1) % 4]
        d12 = (_orient(x1, y1, x2, y2, ax, ay)
               * _orient(x1, y1, x2, y2, bx, by))
        d34 = (_orient(ax, ay, bx, by, x1, y1)
               * _orient(ax, ay, bx, by, x2, y2))
        hit = hit | ((d12 < 0.0) & (d34 < 0.0))
    return hit


def triangle_within_box(lats, lons, min_lat, max_lat,
                        min_lon, max_lon) -> np.ndarray:
    """True where ALL three vertices are strictly inside the box (the box
    is convex, so vertex containment == triangle containment).
    ``lats``/``lons``: sequences of three aligned coordinate arrays."""
    mask = None
    for y, x in zip(lats, lons):
        y = np.asarray(y, dtype=np.float64)
        x = np.asarray(x, dtype=np.float64)
        m = (y > min_lat) & (y < max_lat) & (x > min_lon) & (x < max_lon)
        mask = m if mask is None else (mask & m)
    return mask


def segment_polygon_intersects(y1, x1, y2, x2, poly_lats,
                               poly_lons) -> np.ndarray:
    """True where segment (y1,x1)-(y2,x2) intersects the polygon —
    LatLonShape.newPolygonQuery with QueryRelation.INTERSECTS evaluated
    over segment tessellation rows (lucene/core/src/java/org/apache/
    lucene/document/LatLonShapeQuery.java + Polygon2D edge tree; here the
    polygon is small, so a dense edge loop replaces the tree): either
    endpoint inside the polygon (even-odd crossing, point_in_polygon's
    exact expression) or a proper strict-sign crossing with any polygon
    edge (same _orient arithmetic as segment_box_intersects). Polygon
    vertices are expected OFF the data lattice so degenerate touch cases
    cannot arise."""
    y1 = np.asarray(y1, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    hit = (point_in_polygon(y1, x1, poly_lats, poly_lons)
           | point_in_polygon(y2, x2, poly_lats, poly_lons))
    n = len(poly_lats)
    for i in range(n):
        ay, ax = poly_lats[i - 1], poly_lons[i - 1]
        by, bx = poly_lats[i], poly_lons[i]
        d12 = (_orient(x1, y1, x2, y2, ax, ay)
               * _orient(x1, y1, x2, y2, bx, by))
        d34 = (_orient(ax, ay, bx, by, x1, y1)
               * _orient(ax, ay, bx, by, x2, y2))
        hit = hit | ((d12 < 0.0) & (d34 < 0.0))
    return hit


def geo_shape_polygon_intersects(ds: ray.data.Dataset, poly_lats, poly_lons,
                                 id_col: str = "doc_id") -> pa.Table:
    """Doc ids whose shape INTERSECTS the polygon: same per-batch
    vectorized ANY-component shape as geo_shape_box_intersects."""

    def keep(batch: pa.Table) -> pa.Table:
        m = segment_polygon_intersects(
            batch.column("lat1"), batch.column("lon1"),
            batch.column("lat2"), batch.column("lon2"),
            poly_lats, poly_lons)
        ids = np.unique(np.asarray(batch.column(id_col), dtype=np.int64)[m])
        return pa.table({id_col: pa.array(ids, pa.int64())})

    parts = [np.asarray(b.column(id_col), dtype=np.int64)
             for b in ds.map_batches(keep, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    ids = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    return pa.table({id_col: pa.array(ids, pa.int64())})


def geo_shape_box_intersects(ds: ray.data.Dataset, min_lat: float,
                             max_lat: float, min_lon: float, max_lon: float,
                             id_col: str = "doc_id") -> pa.Table:
    """Doc ids whose shape INTERSECTS the box: per-batch vectorized segment
    test, per-batch dedup, tiny driver-side distinct+sort (ANY-component
    disjunction over the doc's tessellation rows)."""

    def keep(batch: pa.Table) -> pa.Table:
        m = segment_box_intersects(
            batch.column("lat1"), batch.column("lon1"),
            batch.column("lat2"), batch.column("lon2"),
            min_lat, max_lat, min_lon, max_lon)
        ids = np.unique(np.asarray(batch.column(id_col), dtype=np.int64)[m])
        return pa.table({id_col: pa.array(ids, pa.int64())})

    parts = [np.asarray(b.column(id_col), dtype=np.int64)
             for b in ds.map_batches(keep, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    ids = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    return pa.table({id_col: pa.array(ids, pa.int64())})


def geo_shape_within_box(ds: ray.data.Dataset, min_lat: float,
                         max_lat: float, min_lon: float, max_lon: float,
                         id_col: str = "doc_id") -> pa.Table:
    """Doc ids whose EVERY tessellation triangle is inside the box (the
    WITHIN relation): per-batch partial (rows, rows_within) counts per doc,
    one small groupby-sum, keep docs with no escaping row. A doc's rows may
    straddle batch (or node) boundaries — the groupby reconciles them, so
    this is the scale-correct ALL-aggregation (anti-join shape)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = triangle_within_box(
            [batch.column(f"lat{i}") for i in (1, 2, 3)],
            [batch.column(f"lon{i}") for i in (1, 2, 3)],
            min_lat, max_lat, min_lon, max_lon)
        uniq, inv = np.unique(ids, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        nw = np.bincount(inv, weights=m.astype(np.float64),
                         minlength=len(uniq)).astype(np.int64)
        return pa.table({id_col: pa.array(uniq, pa.int64()),
                         "n_rows": pa.array(n, pa.int64()),
                         "n_within": pa.array(nw, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("n_within", alias_name="n_within")))
    out = agg.to_pandas()
    keep = out[out["n_rows"] == out["n_within"]][id_col].to_numpy(np.int64)
    return pa.table({id_col: pa.array(np.sort(keep), pa.int64())})
