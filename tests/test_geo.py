"""Geo operators: haversine kernel, bbox prune, box/distance/knn pipelines,
and the GeoDistanceQuery doc-values path through the search executor
(LatLonPoint.newBoxQuery / newDistanceQuery / newDistanceSort analogs)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.ops.geo import (
    EARTH_RADIUS_M,
    _box_mask,
    distance_bbox,
    geo_box,
    geo_distance,
    geo_knn,
    haversine_m,
)

SF = "/root/testdata/sf0.001"


def _points(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    return lat, lon


def test_haversine_known_value():
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278): great-circle
    # distance on the mean-radius sphere; cross-check with the independent
    # spherical law of cosines.
    d = float(haversine_m(48.8566, 2.3522, 51.5074, -0.1278))
    p1, p2 = np.radians(48.8566), np.radians(51.5074)
    dl = np.radians(-0.1278 - 2.3522)
    loc = EARTH_RADIUS_M * np.arccos(
        np.sin(p1) * np.sin(p2) + np.cos(p1) * np.cos(p2) * np.cos(dl)
    )
    assert abs(d - float(loc)) < 1.0
    assert 340_000 < d < 350_000


def test_haversine_zero_and_antipode():
    assert float(haversine_m(10.0, 20.0, 10.0, 20.0)) == 0.0
    anti = float(haversine_m(0.0, 0.0, 0.0, 180.0))
    assert abs(anti - np.pi * EARTH_RADIUS_M) < 1.0


def test_distance_bbox_contains_circle():
    # every point within the radius must fall inside the bbox (the bbox is
    # the outer rectangle, so no in-radius point may be pruned)
    lat, lon = _points()
    for clat, clon, r in [(48.85, 2.35, 2e6), (0.0, 179.5, 5e5),
                          (85.0, 10.0, 1e6), (-88.0, -170.0, 3e6)]:
        bb = distance_bbox(clat, clon, r)
        mask = _box_mask(lat, lon, *bb)
        d = haversine_m(lat, lon, clat, clon)
        inside = d <= r
        assert not np.any(inside & ~mask), (clat, clon, r)


def test_box_mask_dateline():
    lat = np.array([0.0, 0.0, 0.0, 40.0])
    lon = np.array([170.0, -170.0, 0.0, 175.0])
    m = _box_mask(lat, lon, -10.0, 10.0, 160.0, -160.0)
    assert m.tolist() == [True, True, False, False]


@pytest.fixture(scope="module")
def pts_ds(ray_session):
    import ray.data

    lat, lon = _points(3000, seed=11)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(3000), pa.int64()),
        "lat": pa.array(lat, pa.float64()),
        "lon": pa.array(lon, pa.float64()),
    })).repartition(6)


def test_geo_box_matches_brute(pts_ds):
    lat, lon = _points(3000, seed=11)
    got = sorted(
        r["doc_id"] for b in geo_box(
            pts_ds, -20.0, 35.0, 150.0, -140.0
        ).iter_batches(batch_format="pyarrow") for r in b.to_pylist()
    )
    want = np.flatnonzero(
        _box_mask(lat, lon, -20.0, 35.0, 150.0, -140.0)).tolist()
    assert got == want


def test_geo_distance_matches_brute(pts_ds):
    lat, lon = _points(3000, seed=11)
    got = sorted(
        r["doc_id"] for b in geo_distance(
            pts_ds, 48.85, 2.35, 3e6
        ).iter_batches(batch_format="pyarrow") for r in b.to_pylist()
    )
    want = np.flatnonzero(haversine_m(lat, lon, 48.85, 2.35) <= 3e6).tolist()
    assert got == want


def test_geo_knn_matches_full_sort(pts_ds):
    lat, lon = _points(3000, seed=11)
    d = haversine_m(lat, lon, -10.0, 100.0)
    order = np.lexsort((np.arange(3000), d))[:15]
    t = geo_knn(pts_ds, -10.0, 100.0, k=15, round_digits=None)
    assert t.column("doc_id").to_pylist() == order.tolist()
    assert t.column("rank").to_pylist() == list(range(1, 16))
    got_d = np.asarray(t.column("dist_m"))
    assert np.allclose(got_d, d[order], rtol=0, atol=1e-6)


@pytest.fixture(scope="module")
def geo_index(ray_session, tmp_path_factory):
    """Small index whose docmap carries lat/lon doc-values columns."""
    from lucene_ray.fixtures import make_corpus
    from lucene_ray.index.build import IndexConfig, build_index
    from lucene_ray.index.reader import IndexReader

    d = tmp_path_factory.mktemp("geo")
    corpus = make_corpus(400, seed=5)
    n = corpus.num_rows
    row = np.arange(n, dtype=np.int64)
    lat = ((row * 7919) % 18000) / 100.0 - 90.0
    lon = ((row * 104729) % 36000) / 100.0 - 180.0
    corpus = corpus.append_column("lat", pa.array(lat, pa.float64()))
    corpus = corpus.append_column("lon", pa.array(lon, pa.float64()))
    src = str(d / "c.parquet")
    pq.write_table(corpus, src, row_group_size=120)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(
        id_cols=("repo", "path", "commit", "lat", "lon"),
        target_rows_per_partition=150,
        partitions_per_segment=2,
        chunk_size=64,
    ))
    paths = corpus.column("path").to_pylist()
    return IndexReader(idx), paths, lat, lon


def _gid_to_path(reader, gids):
    t = reader.lookup_docs(gids, columns=["path"])
    m = dict(zip((int(x) for x in t.column("doc_id").to_pylist()),
                 t.column("path").to_pylist()))
    return [m[int(g)] for g in gids]


def test_geo_distance_query_executor(geo_index):
    from lucene_ray.search.query import GeoDistanceQuery
    from lucene_ray.search.searcher import Searcher

    reader, paths, lat, lon = geo_index
    q = GeoDistanceQuery("lat", "lon", lat=30.0, lon=50.0, radius_m=4e6,
                         boost=2.5)
    td = Searcher(reader).search(q, 10**9, total_hits_threshold=None)
    got = sorted(_gid_to_path(reader, td.doc_ids))
    mask = haversine_m(lat, lon, 30.0, 50.0) <= 4e6
    want = sorted(p for p, m in zip(paths, mask) if m)
    assert got == want and len(got) > 0
    # constant score = boost, for every hit
    assert np.all(np.asarray(td.scores) == np.float32(2.5))


def test_geo_distance_as_filter_clause(geo_index):
    from lucene_ray.search.query import (
        BooleanQuery,
        GeoDistanceQuery,
        TermQuery,
    )
    from lucene_ray.search.searcher import Searcher

    reader, paths, lat, lon = geo_index
    searcher = Searcher(reader)
    term_only = searcher.search(TermQuery("import"), 10**9,
                                total_hits_threshold=None)
    gq = GeoDistanceQuery("lat", "lon", lat=30.0, lon=50.0, radius_m=6e6)
    both = searcher.search(
        BooleanQuery(must=(TermQuery("import"),), filter=(gq,)), 10**9,
        total_hits_threshold=None)
    mask = haversine_m(lat, lon, 30.0, 50.0) <= 6e6
    path_in = {p for p, m in zip(paths, mask) if m}
    term_paths = _gid_to_path(reader, term_only.doc_ids)
    keep = [p for p in term_paths if p in path_in]
    both_paths = _gid_to_path(reader, both.doc_ids)
    assert sorted(both_paths) == sorted(keep)
    assert 0 < len(both.doc_ids) < len(term_only.doc_ids)
    # filter clause must not change scores: hits common to both runs score
    # identically (FILTER is non-scoring — BooleanWeight semantics)
    t_map = dict(zip(term_paths, np.asarray(term_only.scores)))
    g_map = dict(zip(both_paths, np.asarray(both.scores)))
    for p, s in g_map.items():
        assert t_map[p] == s


def test_geo_pipeline_contract_shapes(ray_session):
    from lucene_ray.pipelines.geo import (
        geo_box_hits,
        geo_distance_hits,
        geo_knn_top10,
    )

    box = geo_box_hits(SF)
    assert box.num_rows > 0
    ids = box.column("c_custkey").to_pylist()
    assert ids == sorted(ids)
    dist = geo_distance_hits(SF)
    assert dist.num_rows > 0
    knn = geo_knn_top10(SF)
    assert knn.column("rank").to_pylist() == list(range(1, 11))
    assert knn.schema.names == ["rank", "c_custkey"]


def _pip_scalar(y, x, plats, plons):
    """Scalar even-odd reference (independent loop formulation)."""
    inside = False
    n = len(plats)
    j = n - 1
    for i in range(n):
        yi, xi = plats[i], plons[i]
        yj, xj = plats[j], plons[j]
        if (yi > y) != (yj > y):
            if x < (xj - xi) * (y - yi) / (yj - yi) + xi:
                inside = not inside
        j = i
    return inside


def test_point_in_polygon_chevron():
    from lucene_ray.ops.geo import point_in_polygon

    # chevron: notch at (20, 0) — (15, 0) is OUTSIDE despite being inside
    # the convex hull
    plats = (-10.0, 55.0, -10.0, 20.0)
    plons = (-30.0, 0.0, 30.0, 0.0)
    pts = [
        ((40.0, 0.0), True),    # above the notch
        ((15.0, 0.0), False),   # inside hull, inside notch -> out
        ((0.0, -22.0), True),   # left wing (spans lon [-25.4, -20] at lat 0)
        ((0.0, 22.0), True),    # right wing
        ((0.0, -15.0), False),  # between notch and left wing
        ((60.0, 0.0), False),   # above apex
        ((-20.0, 0.0), False),  # below base
    ]
    lat = np.array([p[0][0] for p in pts])
    lon = np.array([p[0][1] for p in pts])
    got = point_in_polygon(lat, lon, plats, plons)
    assert list(got) == [p[1] for p in pts]


def test_point_in_polygon_random_vs_scalar():
    from lucene_ray.ops.geo import point_in_polygon

    rng = np.random.default_rng(3)
    plats = (-10.0, 55.0, -10.0, 20.0)
    plons = (-30.0, 0.0, 30.0, 0.0)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-180, 180, 500)
    got = point_in_polygon(lat, lon, plats, plons)
    exp = [_pip_scalar(y, x, plats, plons) for y, x in zip(lat, lon)]
    assert list(got) == exp


def test_geo_polygon_query_executor(geo_index):
    from lucene_ray.ops.geo import point_in_polygon
    from lucene_ray.search.query import GeoPolygonQuery
    from lucene_ray.search.searcher import Searcher

    reader, paths, lat, lon = geo_index
    plats = (-10.0, 55.0, -10.0, 20.0)
    plons = (-30.0, 0.0, 30.0, 0.0)
    q = GeoPolygonQuery("lat", "lon", plats, plons, boost=1.5)
    td = Searcher(reader).search(q, 10**9, total_hits_threshold=None)
    got = sorted(_gid_to_path(reader, td.doc_ids))
    exp = sorted(np.asarray(paths)[point_in_polygon(lat, lon, plats, plons)])
    assert got == list(exp)
    assert all(s == np.float32(1.5) for s in td.scores)


def test_geo_distance_feature_query_executor(geo_index):
    from lucene_ray.search.query import BooleanQuery, GeoDistanceFeatureQuery
    from lucene_ray.search.searcher import Searcher

    reader, paths, lat, lon = geo_index
    q = GeoDistanceFeatureQuery("lat", "lon", lat=30.0, lon=50.0,
                                pivot_m=1e6, boost=2.0)
    td = Searcher(reader).search(q, 10**9, total_hits_threshold=None)
    assert len(td.doc_ids) == len(paths)  # feature query matches every doc
    d = haversine_m(lat, lon, 30.0, 50.0)
    exp = (2.0 * 1e6 / (1e6 + d)).astype(np.float32)
    got_paths = _gid_to_path(reader, td.doc_ids)
    exp_by_path = dict(zip(paths, exp))
    for p, s in zip(got_paths, td.scores):
        assert s == pytest.approx(float(exp_by_path[p]), rel=1e-6)
    # composes as a SHOULD clause: score = term score + feature score
    from lucene_ray.search.query import TermQuery

    term = Searcher(reader).search(TermQuery("merge"), 10**9,
                                   total_hits_threshold=None)
    both = Searcher(reader).search(
        BooleanQuery(must=(TermQuery("merge"),), should=(q,)),
        10**9, total_hits_threshold=None)
    t_map = dict(zip(_gid_to_path(reader, term.doc_ids), term.scores))
    for p, s in zip(_gid_to_path(reader, both.doc_ids), both.scores):
        assert s == pytest.approx(
            float(np.float32(t_map[p] + exp_by_path[p])), rel=1e-5)


def test_polygon_with_holes(geo_index):
    """Polygon holes (geo/Polygon.java Polygon(lats, lons, holes...)): a
    point inside the outer ring but inside a hole is NOT a match."""
    from lucene_ray.ops.geo import point_in_rings
    from lucene_ray.search.query import GeoPolygonQuery
    from lucene_ray.search.searcher import Searcher

    outer = ((-40.0, 40.0, 40.0, -40.0), (-40.0, -40.0, 40.0, 40.0))
    hole = ((-15.0, 15.0, 15.0, -15.0), (-15.0, -15.0, 15.0, 15.0))
    pts = np.array([[0.0, 0.0],     # in hole -> out
                    [20.0, 20.0],   # in outer, outside hole -> in
                    [50.0, 0.0]])   # outside outer -> out
    got = point_in_rings(pts[:, 0], pts[:, 1], [outer, hole])
    assert got.tolist() == [False, True, False]

    reader, paths, lat, lon = geo_index
    q = GeoPolygonQuery("lat", "lon", outer[0], outer[1], holes=(hole,))
    td = Searcher(reader).search(q, 10**9, total_hits_threshold=None)
    exp_mask = point_in_rings(lat, lon, [outer, hole])
    exp = sorted(np.asarray(paths)[exp_mask])
    got_paths = sorted(_gid_to_path(reader, td.doc_ids))
    assert got_paths == list(exp) and len(got_paths) > 0
    # and some doc exists in the hole (the hole actually excludes docs)
    in_outer = point_in_rings(lat, lon, [outer])
    assert in_outer.sum() > exp_mask.sum()
