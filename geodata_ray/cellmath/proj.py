"""Projection + polygon geometry math (no pyproj/shapely).

Covers the reference's CRS round-trips and area computations:
- equal-area projection (cylindrical equal-area on the sphere — the
  role EPSG:6933 plays in ``mask.py:584-604`` buffering and
  ``cutout.py:1036-1046`` shape areas);
- ring coordinate transforms (``convert_shape_crs`` mask.py:1401-1419);
- spherical shoelace polygon area (``calc_shp_area`` semantics);
- polygon -> covering-cells rasterization (``geometry_mask``
  mask.py:584-604 J7: a cell is covered when its centroid is inside),
  with union/dedup across polygons (D2) and ring buffering in
  equal-area space.
"""

from __future__ import annotations

import numpy as np

from geodata_ray.cellmath import qcell
from geodata_ray.cellmath.pip import pip_crossing as _pip_crossing
from geodata_ray.cellmath.pip import ring_crosses_am as _ring_crosses_am

EARTH_RADIUS_KM = qcell.EARTH_RADIUS_KM


def cea_project(lat, lon):
    """Cylindrical equal-area forward: (lat, lon) deg -> (x, y) km.
    x = R*lambda, y = R*sin(phi) — areas on the plane equal areas on
    the sphere."""
    return (
        EARTH_RADIUS_KM * np.deg2rad(np.asarray(lon, dtype=np.float64)),
        EARTH_RADIUS_KM * np.sin(np.deg2rad(np.asarray(lat, dtype=np.float64))),
    )


def cea_unproject(x, y):
    """Inverse cylindrical equal-area: (x, y) km -> (lat, lon) deg."""
    lat = np.rad2deg(
        np.arcsin(np.clip(np.asarray(y, dtype=np.float64) / EARTH_RADIUS_KM, -1, 1))
    )
    lon = np.rad2deg(np.asarray(x, dtype=np.float64) / EARTH_RADIUS_KM)
    return lat, lon


def convert_ring_crs(ring_x, ring_y, direction: str = "forward"):
    """Transform polygon ring coordinates between lat/lon and the
    equal-area plane (the reference's pyproj ring transform,
    mask.py:1401-1419)."""
    if direction == "forward":
        return cea_project(ring_y, ring_x)  # returns (x_km, y_km)
    lat, lon = cea_unproject(ring_x, ring_y)
    return lon, lat


def polygon_area_km2(ring_x, ring_y) -> float:
    """Polygon area in km^2: shoelace on the equal-area plane
    (``calc_shp_area`` cutout.py:1036-1046 without pyproj).  Handles
    anti-meridian-crossing rings via the shifted-lon frame."""
    xs = np.asarray(ring_x, dtype=np.float64)
    ys = np.asarray(ring_y, dtype=np.float64)
    if _ring_crosses_am(xs):
        xs = np.where(xs < 0, xs + 360.0, xs)
    px, py = cea_project(ys, xs)
    return float(
        0.5 * np.abs(np.dot(px[:-1], py[1:]) - np.dot(px[1:], py[:-1]))
    )


def buffer_ring_km(ring_x, ring_y, buffer_km: float):
    """Approximate outward ring buffer: scale about the centroid in
    equal-area coordinates (the role of the reference's km buffer via
    the EPSG:6933 round-trip, mask.py:588-592).  Suitable for the
    convex-ish mask shapes it is used on."""
    xs = np.asarray(ring_x, dtype=np.float64)
    ys = np.asarray(ring_y, dtype=np.float64)
    crosses = _ring_crosses_am(xs)
    if crosses:
        xs = np.where(xs < 0, xs + 360.0, xs)
    px, py = cea_project(ys, xs)
    cx, cy = px[:-1].mean(), py[:-1].mean()
    r = np.hypot(px - cx, py - cy)
    scale = (r + buffer_km) / np.maximum(r, 1e-9)
    bx, by = cx + (px - cx) * scale, cy + (py - cy) * scale
    lat, lon = cea_unproject(bx, by)
    if crosses:
        lon = np.where(lon > 180.0, lon - 360.0, lon)
    return lon, lat


def polygon_cover_cells(ring_x, ring_y, res: int) -> np.ndarray:
    """Cells at ``res`` whose CENTROID lies inside the polygon — the
    rasterize semantics of ``geometry_mask`` (mask.py:584-604: default
    all_touched=False => centroid rule)."""
    xs = np.asarray(ring_x, dtype=np.float64)
    ys = np.asarray(ring_y, dtype=np.float64)
    crosses = _ring_crosses_am(xs)
    fx = np.where(xs < 0, xs + 360.0, xs) if crosses else xs
    nlat = 1 << (res + 2)
    nlon = 1 << (res + 3)
    r0 = int(np.clip(np.floor((ys.min() + 90.0) / 180.0 * nlat), 0, nlat - 1))
    r1 = int(np.clip(np.floor((ys.max() + 90.0) / 180.0 * nlat), 0, nlat - 1))
    c0 = int(np.floor((fx.min() + 180.0) / 360.0 * nlon))
    c1 = int(np.floor((fx.max() + 180.0) / 360.0 * nlon))
    rows = np.arange(r0, r1 + 1, dtype=np.int64)
    cols = np.arange(c0, c1 + 1, dtype=np.int64)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    cells = qcell.rowcol_to_cell(res, rr, np.mod(cc, nlon))
    clat, clon = qcell.cell_to_latlng(cells)
    pclon = np.where(clon < 0, clon + 360.0, clon) if crosses else clon
    inside = _pip_crossing(pclon, clat, fx, ys)
    return np.sort(cells[inside])


def polygons_cover_cells_union(ring_xs, ring_ys, res: int) -> np.ndarray:
    """Union of covering cells across polygons, deduplicated (the
    reference's ``unary_union`` + combined rasterize path,
    mask.py:581-582 D2)."""
    parts = [
        polygon_cover_cells(x, y, res) for x, y in zip(ring_xs, ring_ys)
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))
