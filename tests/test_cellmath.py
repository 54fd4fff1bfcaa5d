"""Property tests for the quantized hierarchical cell scheme.

Model: the dense lat/lon grid logic of the reference
(/root/reference/src/geodata/cutout.py:908-1001) generalized to a
hierarchical index; correctness here gates every spatial operator.
"""

import duckdb
import numpy as np
import pytest

from geodata_ray.cellmath import qcell

RNG = np.random.default_rng(42)
N = 20_000
LATS = RNG.uniform(-90, 90, N)
LONS = RNG.uniform(-180, 180, N)


@pytest.mark.parametrize("res", [0, 3, 5, 7, 9, 15])
def test_roundtrip_centroid_within_cell(res):
    cells = qcell.latlng_to_cell(LATS, LONS, res)
    clat, clon = qcell.cell_to_latlng(cells)
    # centroid re-encodes to the same cell
    assert np.array_equal(qcell.latlng_to_cell(clat, clon, res), cells)
    # original point is inside the cell bounds
    lat0, lat1, lon0, lon1 = qcell.cell_bounds(cells)
    assert np.all((LATS >= lat0) & (LATS < lat1))
    assert np.all((LONS >= lon0) & (LONS < lon1))


@pytest.mark.parametrize("res", [5, 7, 9])
def test_parent_containment(res):
    cells = qcell.latlng_to_cell(LATS, LONS, res)
    for pres in range(res - 1, max(res - 4, -1), -1):
        parents = qcell.cell_to_parent(cells, pres)
        # direct encode at parent res matches the bit-math parent
        assert np.array_equal(qcell.latlng_to_cell(LATS, LONS, pres), parents)
        assert np.all(qcell.cell_resolution(parents) == pres)


def test_children_invert_parent():
    cell = qcell.latlng_to_cell(40.7, -74.0, 5)
    kids = qcell.cell_to_children(cell, 7)
    assert len(kids) == 16
    assert np.all(qcell.cell_to_parent(kids, 5) == cell)
    assert len(np.unique(kids)) == 16


def test_grid_disk_symmetry_and_size():
    cell = qcell.latlng_to_cell(10.0, 20.0, 7)
    ring = qcell.grid_disk(cell, 1)
    assert len(ring) == 9
    assert cell in ring
    # symmetry: if b in disk(a) then a in disk(b)
    for b in ring:
        assert cell in qcell.grid_disk(b, 1)


def test_grid_disk_antimeridian_wrap():
    # cell at lon just under +180 must have neighbors wrapping to -180
    cell = qcell.latlng_to_cell(0.0, 179.9, 7)
    ring = qcell.grid_disk(cell, 1)
    lats, lons = qcell.cell_to_latlng(ring)
    assert (lons < -179).any() and (lons > 179).any()
    assert len(ring) == 9


def test_grid_disk_pole_clamp():
    cell = qcell.latlng_to_cell(89.99, 0.0, 5)
    ring = qcell.grid_disk(cell, 1)
    assert len(ring) == 6  # top row clipped


def test_grid_disk_multi_matches_scalar():
    cells = qcell.latlng_to_cell(LATS[:200], LONS[:200], 7)
    origin, nbrs = qcell.grid_disk_multi(cells, 1)
    for i in [0, 17, 199]:
        got = np.unique(nbrs[origin == i])
        assert np.array_equal(got, qcell.grid_disk(cells[i], 1))


def test_area_sums_to_sphere():
    res = 3
    all_cells = qcell.cell_to_children(
        qcell.rowcol_to_cell(0, 0, 0), res
    )  # children of one res-0 cell
    # area of one res0 cell × 32 res0 cells == sphere
    # instead: sum area over every res-3 cell in the full grid
    nlat, nlon = 1 << (res + 2), 1 << (res + 3)
    rr, cc = np.meshgrid(np.arange(nlat), np.arange(nlon), indexing="ij")
    cells = qcell.rowcol_to_cell(res, rr.ravel(), cc.ravel())
    total = qcell.cell_area_km2(cells).sum()
    sphere = 4 * np.pi * qcell.EARTH_RADIUS_KM**2
    assert abs(total - sphere) / sphere < 1e-9
    assert np.all(qcell.cell_area_km2(all_cells) > 0)


def test_nan_maps_to_sentinel():
    cells = qcell.latlng_to_cell([np.nan, 10.0], [5.0, np.nan], 7)
    assert list(cells) == [-1, -1]


@pytest.mark.parametrize("res", [5, 7, 9])
def test_sql_expr_matches_numpy(res):
    """The DuckDB-evaluated SQL expression must match latlng_to_cell
    bit-for-bit — this is what makes tile assignments oracle-checkable."""
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"lat": LATS, "lon": LONS}),
    )
    expr = qcell.cell_sql_expr("lat", "lon", res)
    got = con.execute(f"SELECT {expr} AS cell FROM pts").fetchnumpy()["cell"]
    want = qcell.latlng_to_cell(LATS, LONS, res)
    assert np.array_equal(got.astype(np.int64), want)


def test_compact_uncompact_roundtrip():
    """Covering a polygon, compacting, and uncompacting returns the
    original cell set exactly (children tile parents)."""
    from geodata_ray.cellmath import proj

    xs = [0.0, 6.0, 6.0, 0.0, 0.0]
    ys = [0.0, 0.0, 6.0, 6.0, 0.0]
    cover = proj.polygon_cover_cells(xs, ys, 7)
    compacted = qcell.compact_cells(cover)
    assert len(compacted) < len(cover)  # interior quads collapse
    back = qcell.uncompact_cells(compacted, 7)
    assert np.array_equal(back, np.sort(cover))
    # mixed resolutions present after compaction
    assert len(np.unique(qcell.cell_resolution(compacted))) > 1


def test_compact_full_parent_block():
    cell = qcell.latlng_to_cell(10.0, 10.0, 4)
    kids = qcell.cell_to_children(cell, 7)  # 64 res-7 cells
    compacted = qcell.compact_cells(kids)
    assert compacted.tolist() == [int(cell)]


def test_compact_incomplete_block_untouched():
    cell = qcell.latlng_to_cell(10.0, 10.0, 4)
    kids = qcell.cell_to_children(cell, 5)[:3]  # one sibling missing
    compacted = qcell.compact_cells(kids)
    assert np.array_equal(compacted, np.sort(kids))


def test_cell_to_boundary_closed_ring():
    cell = qcell.latlng_to_cell(48.8, 2.3, 7)
    lats, lons = qcell.cell_to_boundary(cell)
    assert lats[0] == lats[-1] and lons[0] == lons[-1]
    clat, clon = qcell.cell_to_latlng(cell)
    assert lats.min() < clat < lats.max()
    assert lons.min() < clon < lons.max()
