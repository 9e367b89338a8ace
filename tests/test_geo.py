"""Geospatial: haversine kernel vs scalar reference, geofilt two-phase
filter vs brute force, geo_knn ranking."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.pipelines.geo import (
    EARTH_RADIUS_KM,
    bbox_filter,
    geo_knn,
    geofilt,
    haversine_km,
    synth_coords,
)


def _haversine_scalar(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2) - math.radians(lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_haversine_matches_scalar_reference():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89, 89, 200)
    lon = rng.uniform(-180, 180, 200)
    got = haversine_km(lat, lon, 48.8566, 2.3522)
    for i in range(200):
        want = _haversine_scalar(lat[i], lon[i], 48.8566, 2.3522)
        assert got[i] == pytest.approx(want, rel=1e-12)
    # known pair: Paris -> London ~343-344 km
    d = haversine_km(np.array([48.8566]), np.array([2.3522]),
                     51.5074, -0.1278)[0]
    assert 340 < d < 350
    assert haversine_km(np.array([10.0]), np.array([20.0]), 10.0, 20.0)[0] \
        == 0.0


@pytest.fixture()
def points(ray_session):
    rng = np.random.default_rng(11)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    lat = rng.uniform(-89, 89, n)
    lon = rng.uniform(-180, 180, n)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids), "lat": pa.array(lat), "lon": pa.array(lon)}))
    return ds, ids, lat, lon


def test_geofilt_matches_brute_force(points):
    ds, ids, lat, lon = points
    for pt, d in [((48.0, 2.0), 1000.0), ((0.0, 0.0), 3000.0),
                  ((88.0, 10.0), 500.0)]:  # near-pole lon wrap case
        got = set(geofilt(ds, "lat", "lon", pt[0], pt[1], d)
                  .to_pandas()["id"])
        dist = haversine_km(lat, lon, pt[0], pt[1])
        want = set(ids[dist <= d])
        assert got == want, (pt, d, len(got), len(want))


def test_bbox_filter(points):
    ds, ids, lat, lon = points
    got = set(bbox_filter(ds, "lat", "lon", -10, 10, 20, 60)
              .to_pandas()["id"])
    want = set(ids[(lat >= -10) & (lat <= 10) & (lon >= 20) & (lon <= 60)])
    assert got == want


def test_geo_knn_ranking(points):
    ds, ids, lat, lon = points
    k = 15
    got = geo_knn(ds, "lat", "lon", "id", 48.0, 2.0, k=k).to_pandas()
    dist = haversine_km(lat, lon, 48.0, 2.0)
    order = np.lexsort((ids, dist))[:k]
    assert got["id"].tolist() == [int(ids[i]) for i in order]
    assert (np.diff(got["dist_km"].to_numpy()) >= 0).all()


def test_synth_coords_in_range():
    ids = np.arange(100000, dtype=np.int64)
    lat, lon = synth_coords(ids)
    assert lat.min() >= -90 and lat.max() <= 90
    assert lon.min() >= -180 and lon.max() <= 180
    # deterministic
    lat2, lon2 = synth_coords(ids)
    assert (lat == lat2).all() and (lon == lon2).all()


def test_heatmap_facet_partition_and_clamp(points):
    """Every in-box point lands in exactly one cell; max-edge clamps."""
    from lucene_solr_ray.pipelines.geo import heatmap_facet

    ds, ids, lat, lon = points
    out = heatmap_facet(ds, "lat", "lon", -60.0, 60.0, -120.0, 120.0,
                        rows=6, columns=8).to_pandas()
    inbox = (lat >= -60) & (lat <= 60) & (lon >= -120) & (lon <= 120)
    assert out["cnt"].sum() == int(inbox.sum())
    # brute-force recount per cell
    gy = np.minimum(np.floor((lat[inbox] + 60.0) / 20.0).astype(int), 5)
    gx = np.minimum(np.floor((lon[inbox] + 120.0) / 30.0).astype(int), 7)
    want = {}
    for y, x in zip(gy, gx):
        want[(y, x)] = want.get((y, x), 0) + 1
    got = {(r.grow, r.gcol): r.cnt for r in out.itertuples()}
    assert got == want
    assert out["grow"].between(0, 5).all()
    assert out["gcol"].between(0, 7).all()


def test_heatmap_edge_point_clamped(ray_session):
    """A point exactly on the max edge counts in the last cell."""
    from lucene_solr_ray.pipelines.geo import heatmap_facet

    t = pa.table({"lat": [10.0, 55.0], "lon": [-30.0, 45.0]})
    out = heatmap_facet(rd.from_arrow(t), "lat", "lon",
                        10.0, 55.0, -30.0, 45.0, rows=9,
                        columns=15).to_pandas()
    got = {(r.grow, r.gcol): r.cnt for r in out.itertuples()}
    assert got == {(0, 0): 1, (8, 14): 1}


# --- point-in-polygon (RecursivePrefixTreeStrategy analog) --------------

def _pp_table(lat, lon):
    import pyarrow as pa

    return pa.table({
        "pid": pa.array(range(len(lat)), type=pa.int64()),
        "lat": pa.array(lat, type=pa.float64()),
        "lon": pa.array(lon, type=pa.float64()),
    })


def _poly_ids(ds_table, poly, grid=(32, 32)):
    import ray.data as rd

    from lucene_solr_ray.pipelines.geo import polygon_filter

    out = polygon_filter(rd.from_arrow(ds_table), "lat", "lon", poly,
                         grid=grid).to_pandas()
    return set(out["pid"].tolist()) if len(out) else set()


CONCAVE = [(-60.0, -100.0), (-50.0, 110.0), (20.0, 120.0),
           (0.0, 10.0), (55.0, 90.0), (60.0, -110.0)]


def test_polygon_grid_path_equals_brute_force(ray_session):
    """The tile-status prefilter (inside tiles skip the ray cast) must
    be invisible: identical membership to the exact ray cast on every
    point, at several grid resolutions including the degenerate 1x1
    (all-boundary) grid."""
    import numpy as np

    from lucene_solr_ray.pipelines.geo import _raycast_mask

    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 20000)
    lon = rng.uniform(-180, 180, 20000)
    vy = np.array([p[0] for p in CONCAVE])
    vx = np.array([p[1] for p in CONCAVE])
    want = set(np.nonzero(_raycast_mask(lat, lon, vy, vx))[0].tolist())
    assert len(want) > 1000
    t = _pp_table(lat, lon)
    for grid in ((1, 1), (4, 4), (32, 32), (64, 64)):
        assert _poly_ids(t, CONCAVE, grid) == want, grid


def test_polygon_near_edge_points(ray_session):
    """Points displaced +-1e-9 degrees perpendicular to every edge (and
    edge midpoints themselves): grid path must agree with the exact ray
    cast on each — the conservative boundary-tile classification cannot
    flip any of them."""
    import numpy as np

    from lucene_solr_ray.pipelines.geo import _raycast_mask

    vy = np.array([p[0] for p in CONCAVE])
    vx = np.array([p[1] for p in CONCAVE])
    lats, lons = [], []
    nv = len(vy)
    for i in range(nv):
        j = (i - 1) % nv
        for f in (0.25, 0.5, 0.75):
            my = vy[j] + f * (vy[i] - vy[j])
            mx = vx[j] + f * (vx[i] - vx[j])
            ey, ex = vy[i] - vy[j], vx[i] - vx[j]
            nrm = (ey * ey + ex * ex) ** 0.5
            for eps in (-1e-9, 0.0, 1e-9, -1e-3, 1e-3):
                lats.append(my + eps * (-ex / nrm))
                lons.append(mx + eps * (ey / nrm))
    lat = np.array(lats)
    lon = np.array(lons)
    want = set(np.nonzero(_raycast_mask(lat, lon, vy, vx))[0].tolist())
    got = _poly_ids(_pp_table(lat, lon), CONCAVE)
    assert got == want


def test_polygon_concave_notch_and_vertices(ray_session):
    """The notch interior is OUTSIDE; deep-interior points are inside;
    all six vertices classify identically under grid and brute paths
    (planar even-odd semantics)."""
    import numpy as np

    from lucene_solr_ray.pipelines.geo import _raycast_mask

    vy = np.array([p[0] for p in CONCAVE])
    vx = np.array([p[1] for p in CONCAVE])
    # (25.0, 60.0) sits inside the notch triangle (v2, v3, v4) carve-out
    lat = np.array([25.0, -30.0, 10.0] + [p[0] for p in CONCAVE])
    lon = np.array([60.0, 0.0, -50.0] + [p[1] for p in CONCAVE])
    want = _raycast_mask(lat, lon, vy, vx)
    assert not want[0]           # notch interior excluded
    assert want[1] and want[2]   # deep interior
    got = _poly_ids(_pp_table(lat, lon), CONCAVE)
    assert got == set(np.nonzero(want)[0].tolist())


def test_polygon_touching_pole_and_antimeridian(ray_session):
    """Planar semantics at the domain edges: a polygon reaching the
    pole line (lat 90) and the antimeridian (lon +-180) still classifies
    points consistently between the grid path and the ray cast — incl.
    points exactly at the pole and on the antimeridian."""
    import numpy as np

    from lucene_solr_ray.pipelines.geo import _raycast_mask

    poly = [(50.0, -180.0), (55.0, 180.0), (90.0, 170.0),
            (89.0, -20.0), (70.0, -180.0)]
    vy = np.array([p[0] for p in poly])
    vx = np.array([p[1] for p in poly])
    rng = np.random.default_rng(11)
    lat = np.concatenate([rng.uniform(40, 90, 5000),
                          np.array([90.0, 90.0, 60.0, 60.0])])
    lon = np.concatenate([rng.uniform(-180, 180, 5000),
                          np.array([0.0, 170.0, -180.0, 180.0])])
    want = set(np.nonzero(_raycast_mask(lat, lon, vy, vx))[0].tolist())
    got = _poly_ids(_pp_table(lat, lon), poly)
    assert got == want
