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
