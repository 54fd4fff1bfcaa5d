"""Property tests for the S2 cell-id implementation (public spec)."""

import numpy as np
import pytest

from geodata_ray.cellmath import s2

RNG = np.random.default_rng(7)
N = 5_000
LATS = RNG.uniform(-89.9, 89.9, N)
LONS = RNG.uniform(-180, 180, N)


def test_leaf_roundtrip():
    cells = s2.latlng_to_s2_cell(LATS, LONS, 30)
    lat2, lon2 = s2.s2_cell_to_latlng(cells)
    # leaf cells at level 30 are ~1cm: decode must be within ~1e-5 deg
    assert np.max(np.abs(lat2 - LATS)) < 1e-5
    dlon = np.abs(lon2 - LONS)
    dlon = np.minimum(dlon, 360 - dlon)
    assert np.max(dlon) < 1e-4
    # re-encode of decoded centroid gives the same leaf id
    assert np.array_equal(s2.latlng_to_s2_cell(lat2, lon2, 30), cells)


def test_all_leaf_ids_valid():
    cells = s2.latlng_to_s2_cell(LATS, LONS, 30)
    assert np.all(cells & np.uint64(1) == 1)  # leaf lsb
    faces = cells >> np.uint64(61)
    assert faces.max() <= 5
    assert np.all(s2.s2_cell_level(cells) == 30)


@pytest.mark.parametrize("level", [0, 5, 10, 16, 29])
def test_level_encode_and_parent_consistency(level):
    leaf = s2.latlng_to_s2_cell(LATS, LONS, 30)
    direct = s2.latlng_to_s2_cell(LATS, LONS, level)
    via_parent = s2.s2_cell_parent(leaf, level)
    assert np.array_equal(direct, via_parent)
    assert np.all(s2.s2_cell_level(direct) == level)


def test_hierarchy_is_nested():
    """Points sharing a level-k parent share all coarser parents."""
    leaf = s2.latlng_to_s2_cell(LATS, LONS, 30)
    p10 = s2.s2_cell_parent(leaf, 10)
    p5 = s2.s2_cell_parent(leaf, 5)
    # group by p10: within a group, p5 must be constant
    order = np.argsort(p10, kind="stable")
    p10s, p5s = p10[order], p5[order]
    same10 = p10s[1:] == p10s[:-1]
    assert np.all(p5s[1:][same10] == p5s[:-1][same10])


def test_token_roundtrip():
    cells = s2.latlng_to_s2_cell(LATS[:500], LONS[:500], 12)
    toks = s2.s2_cell_to_token(cells)
    assert np.array_equal(s2.s2_token_to_cell(toks), cells)
    assert all(not t.endswith("0") for t in toks)


def test_face_assignment():
    """Face numbering follows the public spec: +x,+y,+z,-x,-y,-z."""
    pts = [
        ((0.0, 0.0), 0),  # +x
        ((0.0, 90.0), 1),  # +y
        ((90.0, 0.0), 2),  # +z
        ((0.0, 180.0), 3),  # -x
        ((0.0, -90.0), 4),  # -y
        ((-90.0, 0.0), 5),  # -z
    ]
    for (lat, lon), face in pts:
        cell = s2.latlng_to_s2_cell(lat, lon, 30)
        assert int(cell) >> 61 == face, (lat, lon, int(cell) >> 61, face)


def test_curve_locality():
    """Across many random points, very close points share deep parents."""
    eps = 1e-9
    a = s2.latlng_to_s2_cell(LATS, LONS, 30)
    b = s2.latlng_to_s2_cell(LATS + eps, LONS + eps, 30)
    # at level 8 (~0.3 deg cells) virtually all pairs coincide
    same = s2.s2_cell_parent(a, 8) == s2.s2_cell_parent(b, 8)
    assert same.mean() > 0.999


def test_nearby_points_share_coarse_cells():
    lat, lon = 48.8566, 2.3522
    a = s2.latlng_to_s2_cell(lat, lon, 10)
    b = s2.latlng_to_s2_cell(lat + 0.0001, lon + 0.0001, 10)
    assert int(a) == int(b)
