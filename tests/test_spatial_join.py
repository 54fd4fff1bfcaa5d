"""PIP spatial join vs an independent brute-force reference."""

import numpy as np
import pytest

from geodata_ray.sources.synth import polygons_table
from geodata_ray.stages.spatial_join import PolygonIndex, _pip_crossing

RNG = np.random.default_rng(11)
N = 4000
LATS = RNG.uniform(-85, 85, N)
LONS = RNG.uniform(-180, 180, N)


def brute_force_pip(px, py, xs, ys):
    """Independent per-point crossing-number implementation."""
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    crosses = (np.abs(np.diff(xs)) > 180.0).any()
    if crosses:
        xs = np.where(xs < 0, xs + 360.0, xs)
        px = px + 360.0 if px < 0 else px
    inside = False
    for k in range(len(xs) - 1):
        xi, yi, xj, yj = xs[k], ys[k], xs[k + 1], ys[k + 1]
        if (yi > py) != (yj > py):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
            if px < xint:
                inside = not inside
    return inside


@pytest.fixture(scope="module")
def polys():
    return polygons_table(50)


def test_index_matches_brute_force(polys):
    idx = PolygonIndex(polys)
    pts, pis = idx.query(LATS, LONS)
    got = set(zip(pts.tolist(), pis.tolist()))

    ring_x = polys["ring_x"].to_pylist()
    ring_y = polys["ring_y"].to_pylist()
    want = set()
    for pi, (xs, ys) in enumerate(zip(ring_x, ring_y)):
        for i in range(N):
            if brute_force_pip(LONS[i], LATS[i], xs, ys):
                want.add((i, pi))
    assert got == want
    assert len(want) > 50  # non-trivial join


def test_antimeridian_polygon(polys):
    """The last polygon crosses the anti-meridian; points on both sides
    of +-180 within it must match."""
    idx = PolygonIndex(polys)
    ring_x = polys["ring_x"].to_pylist()[-1]
    ring_y = polys["ring_y"].to_pylist()[-1]
    clat = float(np.mean(ring_y[:-1]))
    # probe points on both sides of the anti-meridian near the centroid
    probes_lon = np.array([179.85, -179.95])
    probes_lat = np.array([clat, clat])
    pts, pis = idx.query(probes_lat, probes_lon)
    want = {
        i
        for i in range(2)
        if brute_force_pip(probes_lon[i], probes_lat[i], ring_x, ring_y)
    }
    assert set(pts[pis == len(idx.poly_ids) - 1].tolist()) == want


def test_nan_points_never_match(polys):
    idx = PolygonIndex(polys)
    pts, _ = idx.query(np.array([np.nan, 10.0]), np.array([5.0, np.nan]))
    assert pts.size == 0


def test_pip_vector_boundary_conventions():
    """Square polygon: interior in, exterior out; vectorized kernel
    agrees with the scalar reference on edge-adjacent points."""
    xs = np.array([0.0, 10.0, 10.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    px = np.array([5.0, -1.0, 10.5, 5.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, -0.5, 10.5])
    got = _pip_crossing(px, py, xs, ys)
    assert got.tolist() == [True, False, False, False, False]


def test_empty_batch_query(polys):
    """Regression: empty point arrays (Ray emits empty blocks after
    selective filters) must not crash the index."""
    idx = PolygonIndex(polys)
    pts, pis = idx.query(np.empty(0), np.empty(0))
    assert pts.size == 0 and pis.size == 0


@pytest.mark.usefixtures("ray_session")
def test_zonal_stats_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.spatial_join import zonal_stats

    rng = np.random.default_rng(7)
    n = 2000
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-170, 170, n)
    val = rng.integers(-50, 50, n)
    pts = rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(n)),
        "lat": pa.array(lat), "lon": pa.array(lon),
        "v": pa.array(val),
    }))
    boxes = [("z1", -30.0, 10.0, -120.0, -40.0), ("z2", 20.0, 55.0, 0.0, 90.0)]
    polys = pa.table({
        "poly_id": [b[0] for b in boxes],
        "ring_x": pa.array([[b[3], b[4], b[4], b[3], b[3]] for b in boxes],
                           type=pa.list_(pa.float64())),
        "ring_y": pa.array([[b[1], b[1], b[2], b[2], b[1]] for b in boxes],
                           type=pa.list_(pa.float64())),
    })
    out = {
        r["poly_id"]: r
        for r in zonal_stats(
            pts, polys, by="poly_id",
            specs=[("pid", "count", "n"), ("v", "sum", "s"),
                   ("v", "max", "m")],
        ).take_all()
    }
    for zid, a0, a1, o0, o1 in boxes:
        mask = (lat > a0) & (lat < a1) & (lon > o0) & (lon < o1)
        assert out[zid]["n"] == int(mask.sum())
        assert out[zid]["s"] == int(val[mask].sum())
        assert out[zid]["m"] == int(val[mask].max())
