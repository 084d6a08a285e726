"""Indexed-shape kernels (LatLonShape analog): the division-free
orientation kernel vs an independent parametric (slab-clipping) reference,
plus the ALL-triangles WITHIN aggregation across batch boundaries."""
import numpy as np
import pyarrow as pa

from lucene_ray.ops.geo import (segment_box_intersects, triangle_within_box)

BOX = (10.005, 40.005, -60.005, 20.005)  # min_lat max_lat min_lon max_lon


def _ref_segment_box(y1, x1, y2, x2, min_lat, max_lat, min_lon, max_lon):
    """Liang-Barsky clipping: an INDEPENDENT formulation — the segment
    intersects the (open) box iff the clipped parameter interval is
    non-empty with t_enter < t_exit (proper overlap)."""
    t0, t1 = 0.0, 1.0
    dx, dy = x2 - x1, y2 - y1
    for p, q in ((-dx, x1 - min_lon), (dx, max_lon - x1),
                 (-dy, y1 - min_lat), (dy, max_lat - y1)):
        if p == 0.0:
            if q <= 0.0:
                return False
            continue
        r = q / p
        if p < 0.0:
            if r > t1:
                return False
            t0 = max(t0, r)
        else:
            if r < t0:
                return False
            t1 = min(t1, r)
    return t0 < t1


def test_segment_kernel_vs_reference():
    rng = np.random.default_rng(7)
    n = 5000
    y1 = rng.uniform(-90, 90, n)
    y2 = rng.uniform(-90, 90, n)
    x1 = rng.uniform(-180, 180, n)
    x2 = rng.uniform(-180, 180, n)
    got = segment_box_intersects(y1, x1, y2, x2, *BOX)
    want = np.array([_ref_segment_box(y1[i], x1[i], y2[i], x2[i], *BOX)
                     for i in range(n)])
    assert (got == want).all()


def test_triangle_within():
    lats = [np.array([11.0, 39.0]), np.array([12.0, 41.0]),
            np.array([13.0, 20.0])]
    lons = [np.array([0.0, 0.0]), np.array([1.0, 1.0]),
            np.array([2.0, 2.0])]
    m = triangle_within_box(lats, lons, *BOX)
    assert m.tolist() == [True, False]  # second escapes on lat 41


def test_within_all_rows_aggregation(ray_session):
    import ray.data

    from lucene_ray.ops.geo import geo_shape_within_box

    # doc 1: both triangles inside; doc 2: one escapes -> excluded.
    # Tiny override_num_blocks splits doc rows across blocks, proving the
    # groupby reconciliation.
    rows = [
        {"doc_id": 1, "lat1": 11.0, "lon1": 0.0, "lat2": 12.0, "lon2": 1.0,
         "lat3": 13.0, "lon3": 2.0},
        {"doc_id": 1, "lat1": 15.0, "lon1": 3.0, "lat2": 16.0, "lon2": 4.0,
         "lat3": 17.0, "lon3": 5.0},
        {"doc_id": 2, "lat1": 11.0, "lon1": 0.0, "lat2": 12.0, "lon2": 1.0,
         "lat3": 13.0, "lon3": 2.0},
        {"doc_id": 2, "lat1": 50.0, "lon1": 0.0, "lat2": 12.0, "lon2": 1.0,
         "lat3": 13.0, "lon3": 2.0},
    ]
    ds = ray.data.from_items(rows, override_num_blocks=4)
    out = geo_shape_within_box(ds, *BOX, id_col="doc_id")
    assert out.column("doc_id").to_pylist() == [1]


def test_segment_polygon_intersects_cases():
    import numpy as np

    from lucene_ray.ops.geo import segment_polygon_intersects

    # unit square polygon (slightly off-integer to match the off-lattice
    # convention)
    plats = (0.005, 10.005, 10.005, 0.005)
    plons = (0.005, 0.005, 10.005, 10.005)
    y1 = np.array([5.0, -5.0, -5.0, 20.0, 5.0])
    x1 = np.array([5.0, -5.0,  5.0, 20.0, -20.0])
    y2 = np.array([6.0, -6.0, 15.0, 30.0, 5.0])
    x2 = np.array([6.0, -6.0,  5.0, 30.0, 20.0])
    got = segment_polygon_intersects(y1, x1, y2, x2, plats, plons)
    # fully inside; fully outside; crossing top edge; far outside;
    # horizontal pierce straight through
    assert got.tolist() == [True, False, True, False, True]


def test_shape_polygon_pipeline_matches_duckdb(tmp_path, ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    res = entrymod.queries()["geo_shape_polygon_hits"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{sf}/customer.parquet')")
    exp = con.execute(
        entrymod.oracle_sql()["geo_shape_polygon_hits"]).df()
    assert res["c_custkey"].tolist() == exp["c_custkey"].tolist()
    assert len(res) > 0
