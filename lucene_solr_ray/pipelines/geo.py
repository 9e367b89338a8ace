"""Geospatial filtering and distance ranking.

Re-expression of the reference's lat/lon surface
(``lucene/sandbox/src/java/org/apache/lucene/document/LatLonPoint.java``,
``solr/core/src/java/org/apache/solr/schema/LatLonType.java:59``, the
``{!geofilt}`` / ``{!bbox}`` query parsers and ``geodist()`` sort):

- ``bbox_filter``: pure-comparison bounding-box filter (BBoxField /
  LatLonPoint.newBoxQuery) — one vectorized mask per batch.
- ``geofilt``: great-circle radius filter (``{!geofilt d=km}``) with the
  haversine distance LatLonType uses; the cheap bounding-box prefilter
  runs first, exactly like the reference's two-phase
  approximate-then-verify point queries.
- ``geo_knn``: distance sort / nearest-k (``sort=geodist() asc``) as a
  per-batch partial top-k + driver merge (the knn_cosine pattern).

The test tables carry no geo columns, so the driver-surface queries
derive deterministic synthetic coordinates from ``user_id`` with integer
hashing that an ANSI-SQL oracle reproduces bit-for-bit; only exact
integer/double arithmetic (no libm trig) crosses the engine/oracle
boundary — haversine itself is pytest-verified against a scalar
reference implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .util import read, round_col

EARTH_RADIUS_KM = 6371.0087714  # mean radius, GeoUtils.EARTH_MEAN_RADIUS

_KNUTH = np.uint64(2654435761)
_TWO32 = np.float64(4294967296.0)


def synth_coords(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic (lat, lon) from an integer id — Knuth
    multiplicative hashing, exactly reproducible in SQL:
    lat = (((id % 2^32) * 2654435761) % 2^32) / 2^32 * 180 - 90
    lon = ((((id % 2^32 + 12345)) * 2654435761) % 2^32) / 2^32 * 360 - 180

    The id is masked to 32 bits BEFORE the multiply so the uint64
    product never wraps mod 2^64, keeping the value identical to a SQL
    HUGEINT evaluation at any id scale (no-op for ids < 2^32)."""
    ids32 = ids.astype(np.uint64) % np.uint64(2**32)
    u = (ids32 * _KNUTH) % np.uint64(2**32)
    v = ((ids32 + np.uint64(12345)) * _KNUTH) % np.uint64(2**32)
    lat = (u.astype(np.float64) / _TWO32) * 180.0 - 90.0
    lon = (v.astype(np.float64) / _TWO32) * 360.0 - 180.0
    return lat, lon


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in km (the SloppyMath.haversin /
    LatLonType geodist formula)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = (np.sin(dp / 2.0) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def bbox_filter(ds: rd.Dataset, lat_col: str, lon_col: str,
                min_lat: float, max_lat: float,
                min_lon: float, max_lon: float) -> rd.Dataset:
    """LatLonPoint.newBoxQuery: inclusive bounding box, vectorized."""

    def fil(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        m = ((lat >= min_lat) & (lat <= max_lat)
             & (lon >= min_lon) & (lon <= max_lon))
        return t.filter(pa.array(m))

    return ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True)


def geofilt(ds: rd.Dataset, lat_col: str, lon_col: str,
            pt_lat: float, pt_lon: float, d_km: float) -> rd.Dataset:
    """{!geofilt}: docs within d km of the point. Two-phase like the
    reference point queries: a cheap bounding-box prefilter (the box
    circumscribing the circle; lon bound widened by the cos(lat) shrink,
    degenerating to the full range near the poles), then exact haversine
    on the survivors only."""
    lat_pad = np.degrees(d_km / EARTH_RADIUS_KM)
    if pt_lat + lat_pad >= 90.0 or pt_lat - lat_pad <= -90.0:
        lon_pad = 180.0  # the circle encloses a pole: all longitudes
    else:
        # the meridian shrink is strongest at the box's most poleward
        # latitude — using cos(pt_lat) under-covers near the poles
        max_abs_lat = max(abs(pt_lat - lat_pad), abs(pt_lat + lat_pad))
        lon_pad = min(180.0, lat_pad / np.cos(np.radians(max_abs_lat)))

    def fil(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        m = (lat >= pt_lat - lat_pad) & (lat <= pt_lat + lat_pad)
        if lon_pad < 180.0:
            # antimeridian-safe delta: smallest signed lon difference
            dlon = np.abs(((lon - pt_lon + 540.0) % 360.0) - 180.0)
            m &= dlon <= lon_pad
        if m.any():
            dist = haversine_km(lat[m], lon[m], pt_lat, pt_lon)
            mm = np.zeros(len(lat), dtype=bool)
            mm[np.nonzero(m)[0][dist <= d_km]] = True
            m = mm
        return t.filter(pa.array(m))

    return ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True)


def geo_knn(ds: rd.Dataset, lat_col: str, lon_col: str, id_col: str,
            pt_lat: float, pt_lon: float, k: int = 10):
    """sort=geodist() asc top-k: per-batch partial top-k (haversine per
    batch), merged on the driver — the result is k rows, never the
    corpus."""
    def partial(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        dist = haversine_km(lat, lon, pt_lat, pt_lon)
        order = np.lexsort((ids, dist))[:k]
        return pa.table({
            id_col: pa.array(ids[order], type=pa.int64()),
            "dist_km": pa.array(dist[order], type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(["dist_km", id_col]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


# --- driver-surface queries over synthetic event coordinates -----------

def _events_with_coords(sf_dir: str) -> rd.Dataset:
    ds = read(sf_dir, "events", ["event_id", "user_id"])

    def coords(t: pa.Table) -> pa.Table:
        ids = t.column("user_id").to_numpy(zero_copy_only=False)
        lat, lon = synth_coords(ids)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "lat": pa.array(lat, type=pa.float64()),
            "lon": pa.array(lon, type=pa.float64()),
        })

    return ds.map_batches(coords, batch_format="pyarrow",
                          zero_copy_batch=True)


def geo_bbox_events(sf_dir: str):
    """Events whose synthetic user coordinates land in a fixed box
    (exact comparisons: SQL-oracled bit-for-bit)."""
    out = bbox_filter(_events_with_coords(sf_dir), "lat", "lon",
                      10.0, 55.0, -30.0, 42.5)

    def shape(t: pa.Table) -> pa.Table:
        t = round_col(t, "lat", 6)
        return round_col(t, "lon", 6)

    return out.map_batches(shape, batch_format="pyarrow")


def heatmap_facet(ds: rd.Dataset, lat_col: str, lon_col: str,
                  min_lat: float, max_lat: float,
                  min_lon: float, max_lon: float,
                  rows: int, columns: int) -> rd.Dataset:
    """``facet.heatmap`` 2D grid-cell counts over a bounding box
    (``solr/core/.../handler/component/SpatialHeatmapFacets.java:77``,
    response fields gridLevel/columns/rows/counts_ints2D at :173-175).
    The reference derives (rows, columns) from the RPT prefix-tree
    gridLevel; here the grid shape is the direct parameter — the same
    uniform quad grid one RPT level denotes. Cell (grow, gcol) covers
    ``[min+i*step, min+(i+1)*step)`` with points on the max edge clamped
    into the last cell (every in-box point lands in exactly one cell).

    Each batch reduces to one fixed ``rows*columns`` count vector
    (np.bincount over the flattened cell index — the heatmap is tiny and
    the points stream); a small groupby merges partials. Returns sparse
    non-empty cells (grow, gcol, cnt); the reference's dense y-flipped
    ``asInts2D`` layout (:215) is a driver-side reshape of the same data.
    """
    dlat = (max_lat - min_lat) / rows
    dlon = (max_lon - min_lon) / columns
    n = rows * columns

    def partial(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        m = ((lat >= min_lat) & (lat <= max_lat)
             & (lon >= min_lon) & (lon <= max_lon))
        lat, lon = lat[m], lon[m]
        gy = np.minimum(np.floor((lat - min_lat) / dlat).astype(np.int64),
                        rows - 1)
        gx = np.minimum(np.floor((lon - min_lon) / dlon).astype(np.int64),
                        columns - 1)
        counts = np.bincount(gy * columns + gx, minlength=n)
        return pa.table({"i": pa.array(np.arange(n, dtype=np.int64)),
                         "cnt": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("i").aggregate(Sum("cnt", alias_name="cnt")))

    def label(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("cnt"), pa.scalar(0)))
        idx = t.column("i").to_numpy(zero_copy_only=False)
        return pa.table({
            "grow": pa.array(idx // columns, type=pa.int64()),
            "gcol": pa.array(idx % columns, type=pa.int64()),
            "cnt": t.column("cnt").cast(pa.int64()),
        })

    return merged.map_batches(label, batch_format="pyarrow")


def heatmap_facet_events(sf_dir: str):
    """facet.heatmap over the synthetic event coordinates: 9x15 grid on
    lat [10,55] x lon [-30,45] (5-degree cells, exact literals so the
    SQL oracle reproduces the cell arithmetic bit-for-bit)."""
    return heatmap_facet(_events_with_coords(sf_dir), "lat", "lon",
                         10.0, 55.0, -30.0, 45.0, rows=9, columns=15)


def geo_nearest_events(sf_dir: str, k: int = 20):
    """20 nearest events to a fixed point under SQUARED DEGREE distance
    (deterministic double arithmetic, so the SQL oracle matches exactly;
    the haversine path is geo_knn, pytest-verified)."""
    pt_lat, pt_lon = 48.0, 2.0
    ds = _events_with_coords(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        d2 = (lat - pt_lat) * (lat - pt_lat) + (lon - pt_lon) * (lon - pt_lon)
        order = np.lexsort((ids, d2))[:k]
        return pa.table({
            "event_id": pa.array(ids[order], type=pa.int64()),
            "d2": pa.array(d2[order], type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(["d2", "event_id"]).head(k)
    t = pa.Table.from_pandas(parts.reset_index(drop=True),
                             preserve_index=False)
    return round_col(t, "d2", 6)


# --- point-in-polygon (spatial-extras RecursivePrefixTreeStrategy) ------

def _raycast_mask(lat: np.ndarray, lon: np.ndarray,
                  vy: np.ndarray, vx: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast in planar (lat, lon) space: point is
    inside when a +lon ray crosses an odd number of edges. The crossing
    ordinate is computed as ``(xj-xi)*(y-yi)/(yj-yi)+xi`` — the exact
    double expression the SQL oracle evaluates, so engine and oracle
    agree bit-for-bit on every point including near-edge ones.

    Reference semantics: ``lucene/spatial-extras/.../prefix/
    RecursivePrefixTreeStrategy.java:60`` resolves shapes against a grid
    then verifies leftover cells exactly; here the exact kernel is this
    ray cast and the grid is :func:`_classify_tiles`."""
    inside = np.zeros(len(lat), dtype=bool)
    nv = len(vy)
    j = nv - 1
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(nv):
            yi, xi, yj, xj = vy[i], vx[i], vy[j], vx[j]
            cond = (yi > lat) != (yj > lat)   # horizontal edges: never
            if cond.any():
                xc = (xj - xi) * (lat - yi) / (yj - yi) + xi
                inside ^= cond & (lon < xc)
            j = i
    return inside


def _classify_tiles(vy: np.ndarray, vx: np.ndarray,
                    min_lat: float, dlat: float,
                    min_lon: float, dlon: float,
                    rows: int, cols: int) -> np.ndarray:
    """Tile status grid: 0 = fully outside, 1 = fully inside,
    2 = boundary (some polygon edge passes through the tile; points
    there need the exact ray cast). Edge-vs-tile intersection is
    Liang-Barsky segment clipping, vectorized over the whole grid per
    edge — conservative: touching a tile border marks it boundary."""
    gy, gx = np.mgrid[0:rows, 0:cols]
    y0 = min_lat + gy * dlat
    y1 = y0 + dlat
    x0 = min_lon + gx * dlon
    x1 = x0 + dlon
    boundary = np.zeros((rows, cols), dtype=bool)
    nv = len(vy)
    j = nv - 1
    for i in range(nv):
        py, px, qy, qx = vy[j], vx[j], vy[i], vx[i]
        dxe, dye = qx - px, qy - py
        t0 = np.zeros((rows, cols))
        t1 = np.ones((rows, cols))
        ok = np.ones((rows, cols), dtype=bool)
        for p, q in ((-dxe, px - x0), (dxe, x1 - px),
                     (-dye, py - y0), (dye, y1 - py)):
            if np.isscalar(p):
                p = np.full((rows, cols), float(p))
            q = np.broadcast_to(np.asarray(q, dtype=np.float64),
                                (rows, cols))
            para = p == 0
            ok &= ~(para & (q < 0))          # parallel and outside
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(para, 0.0, q / np.where(para, 1.0, p))
            t0 = np.where(~para & (p < 0), np.maximum(t0, r), t0)
            t1 = np.where(~para & (p > 0), np.minimum(t1, r), t1)
        boundary |= ok & (t0 <= t1)
        j = i
    status = np.full((rows, cols), 0, dtype=np.int8)
    cy = (y0 + 0.5 * dlat).ravel()
    cx = (x0 + 0.5 * dlon).ravel()
    centers_in = _raycast_mask(cy, cx, vy, vx).reshape(rows, cols)
    status[centers_in] = 1
    status[boundary] = 2
    return status


def polygon_filter(ds: rd.Dataset, lat_col: str, lon_col: str,
                   polygon: list[tuple[float, float]],
                   grid: tuple[int, int] = (32, 32)) -> rd.Dataset:
    """Point-in-polygon filter (``{!field f=geo}Intersects(POLYGON(...))``
    via RecursivePrefixTreeStrategy): approximate-then-verify like the
    reference's prefix-tree strategy — a bbox reject, then a broadcast
    tile-status grid classifies each survivor's tile as fully inside
    (accept, no per-point work), fully outside (reject), or boundary
    (exact vectorized ray cast). The polygon + tile grid are built once
    on the driver (vertex-count-scale) and captured by the batch fn —
    kilobytes shipped once per worker, never per batch."""
    vy = np.asarray([p[0] for p in polygon], dtype=np.float64)
    vx = np.asarray([p[1] for p in polygon], dtype=np.float64)
    min_lat, max_lat = float(vy.min()), float(vy.max())
    min_lon, max_lon = float(vx.min()), float(vx.max())
    rows, cols = grid
    dlat = (max_lat - min_lat) / rows
    dlon = (max_lon - min_lon) / cols
    status = _classify_tiles(vy, vx, min_lat, dlat, min_lon, dlon,
                             rows, cols)

    def fil(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        m = ((lat >= min_lat) & (lat <= max_lat)
             & (lon >= min_lon) & (lon <= max_lon))
        keep = np.zeros(len(lat), dtype=bool)
        if m.any():
            il, io = lat[m], lon[m]
            ty = np.minimum(((il - min_lat) / dlat).astype(np.int64),
                            rows - 1)
            tx = np.minimum(((io - min_lon) / dlon).astype(np.int64),
                            cols - 1)
            st = status[ty, tx]
            sub = st == 1                       # fully-inside tiles
            bnd = st == 2                       # boundary tiles: exact
            if bnd.any():
                sub = sub.copy()
                sub[bnd] = _raycast_mask(il[bnd], io[bnd], vy, vx)
            keep[np.nonzero(m)[0][sub]] = True
        return t.filter(pa.array(keep))

    return ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True)


# (lat, lon) vertices of a concave hexagon over the synthetic-coordinate
# space; all-distinct latitudes so no edge is horizontal and the SQL
# oracle's crossing expression never divides by zero
POLYGON_EVENTS = [
    (-60.0, -100.0),
    (-50.0, 110.0),
    (20.0, 120.0),
    (0.0, 10.0),    # concave notch
    (55.0, 90.0),
    (60.0, -110.0),
]


def polygon_filter_events(sf_dir: str):
    """Driver query: events whose synthetic coordinates fall inside the
    concave test polygon (exact even-odd ray cast; DuckDB oracle runs
    the identical crossing arithmetic per edge and keeps odd-parity
    points)."""
    out = polygon_filter(_events_with_coords(sf_dir), "lat", "lon",
                         POLYGON_EVENTS)

    def shape(t: pa.Table) -> pa.Table:
        t = round_col(t, "lat", 6)
        return round_col(t, "lon", 6)

    return out.map_batches(shape, batch_format="pyarrow")
