"""Hypothesis property tests for the cell index kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geodata_ray.cellmath import proj, qcell, s2

lat_st = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lon_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
res_st = st.integers(min_value=0, max_value=15)


@settings(max_examples=300, deadline=None)
@given(lat=lat_st, lon=lon_st, res=res_st)
def test_point_in_own_cell(lat, lon, res):
    # a point within half-an-ulp of a boundary rounds into the next
    # cell during the (x+90)/180*n quantization — that assignment is
    # deterministic and identical in numpy and SQL, so the invariant
    # holds up to float representability (eps far below any cell size)
    eps = 1e-9
    cell = int(qcell.latlng_to_cell(lat, lon, res))
    lat0, lat1, lon0, lon1 = qcell.cell_bounds(cell)
    assert lat0 - eps <= lat <= lat1 + eps
    # longitude is cyclic (180 wraps into the -180 column): compare the
    # wrapped offset from the cell's west edge
    off = (lon - lon0) % 360.0
    width = lon1 - lon0
    assert off <= width + eps or off >= 360.0 - eps


@settings(max_examples=300, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=1, max_value=15))
def test_parent_is_encode_at_parent_res(lat, lon, res):
    cell = qcell.latlng_to_cell(lat, lon, res)
    parent = qcell.cell_to_parent(cell, res - 1)
    assert int(parent) == int(qcell.latlng_to_cell(lat, lon, res - 1))


@settings(max_examples=200, deadline=None)
@given(lat=st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
       lon=lon_st, level=st.integers(min_value=0, max_value=30))
def test_s2_level_and_hierarchy(lat, lon, level):
    cell = s2.latlng_to_s2_cell(lat, lon, level)
    assert int(s2.s2_cell_level(cell)) == level
    if level > 0:
        parent = s2.s2_cell_parent(cell, level - 1)
        assert int(parent) == int(s2.latlng_to_s2_cell(lat, lon, level - 1))


@settings(max_examples=200, deadline=None)
@given(lat=st.floats(min_value=-89.0, max_value=89.0, allow_nan=False),
       lon=lon_st)
def test_cea_projection_roundtrip(lat, lon):
    x, y = proj.cea_project(lat, lon)
    lat2, lon2 = proj.cea_unproject(x, y)
    assert abs(lat2 - lat) < 1e-9
    assert abs(lon2 - lon) < 1e-9


@settings(max_examples=100, deadline=None)
@given(res=st.integers(min_value=0, max_value=8),
       lat=lat_st, lon=lon_st, k=st.integers(min_value=1, max_value=3))
def test_disk_contains_center_and_symmetric(res, lat, lon, k):
    cell = qcell.latlng_to_cell(lat, lon, res)
    disk = qcell.grid_disk(cell, k)
    assert int(cell) in disk
    # pick one neighbor; symmetry must hold
    other = int(disk[0])
    assert int(cell) in qcell.grid_disk(other, k)
