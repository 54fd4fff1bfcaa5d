"""Raster/mask algebra + cell-local kNN vs independent references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.sources.synth import raster_table
from geodata_ray.stages import raster as R
from geodata_ray.stages.knn import haversine_km, knn_join


def _from(table, ray_session=None):
    import ray.data as rd

    return rd.from_arrow(table).repartition(6)


@pytest.fixture(scope="module")
def landcover():
    return raster_table(layer="landcover")


@pytest.fixture(scope="module")
def slope():
    return raster_table(layer="slope")


@pytest.mark.usefixtures("ray_session")
class TestRaster:
    def test_filter_isin_and_binarize(self, landcover):
        out = (
            R.filter_raster(_from(landcover), values=[1.0, 2.0], binarize=True)
            .to_pandas()
            .sort_values(["row", "col"], ignore_index=True)
        )
        ref = landcover.to_pandas().sort_values(["row", "col"], ignore_index=True)
        want = np.isin(ref.value.to_numpy(), [1.0, 2.0]).astype(np.float32)
        np.testing.assert_array_equal(out.value.to_numpy(), want)

    def test_filter_bounds(self, slope):
        out = (
            R.filter_raster(_from(slope), min_bound=10.0, max_bound=30.0)
            .to_pandas()
            .sort_values(["row", "col"], ignore_index=True)
        )
        ref = slope.to_pandas().sort_values(["row", "col"], ignore_index=True)
        v = ref.value.to_numpy()
        want = np.where((v > 10.0) & (v < 30.0), v, 0.0).astype(np.float32)
        np.testing.assert_array_equal(out.value.to_numpy(), want)

    def test_trim_removes_zero_borders(self, landcover):
        out = R.trim_raster(_from(landcover)).to_pandas()
        # fixture zeroes rows/cols 0-1 and the last two
        assert out.row.min() == 2 and out.col.min() == 2
        assert out.row.max() == 57 and out.col.max() == 77

    def test_merge_and(self, landcover, slope):
        both = pa.concat_tables([landcover, slope])
        out = (
            R.merge_layers_and(
                _from(both), layers=["landcover", "slope"],
                reference_layer="slope",
            )
            .to_pandas()
            .sort_values(["row", "col"], ignore_index=True)
        )
        lc = landcover.to_pandas().set_index(["row", "col"]).value
        sl = slope.to_pandas().set_index(["row", "col"]).value
        want = sl.where((lc != 0) & (sl != 0), 0.0).astype(np.float32)
        want = want.reset_index().sort_values(["row", "col"], ignore_index=True)
        np.testing.assert_allclose(
            out.value.to_numpy(), want.value.to_numpy(), rtol=1e-6
        )

    def test_merge_weighted_sum(self, landcover, slope):
        both = pa.concat_tables([landcover, slope])
        out = (
            R.merge_layers_sum(
                _from(both), weights={"landcover": 2.0, "slope": 0.5}
            )
            .to_pandas()
            .sort_values(["row", "col"], ignore_index=True)
        )
        lc = landcover.to_pandas().set_index(["row", "col"]).value.astype(float)
        sl = slope.to_pandas().set_index(["row", "col"]).value.astype(float)
        want = (2.0 * lc + 0.5 * sl).reset_index().sort_values(
            ["row", "col"], ignore_index=True
        )
        np.testing.assert_allclose(out.value.to_numpy(), want.value.to_numpy(),
                                   rtol=1e-12)

    def test_resample_to_cells_mean(self, slope):
        out = (
            R.resample_to_cells(_from(slope), res=5, agg="mean")
            .to_pandas()
            .sort_values("cell", ignore_index=True)
        )
        from geodata_ray.cellmath import qcell

        ref = slope.to_pandas()
        ref["cell"] = qcell.latlng_to_cell(
            ref.lat.to_numpy(), ref.lon.to_numpy(), 5
        )
        want = (
            ref.groupby("cell").value.apply(
                lambda s: s.astype(np.float64).sum() / len(s)
            )
            .reset_index()
            .sort_values("cell", ignore_index=True)
        )
        assert len(out) == len(want)
        np.testing.assert_allclose(
            out.value.to_numpy(), want.value.to_numpy(), rtol=1e-12
        )

    def test_min_area_filter_kills_small_blobs(self, landcover):
        out = R.min_area_filter(_from(landcover), min_cells=5).to_pandas()
        ref = landcover.to_pandas()
        ref = ref[ref.value != 0]
        # independent BFS flood fill
        occ = {(int(r), int(c)) for r, c in zip(ref.row, ref.col)}
        seen, comps = set(), {}
        for start in occ:
            if start in seen:
                continue
            stack, comp = [start], []
            seen.add(start)
            while stack:
                r, c = stack.pop()
                comp.append((r, c))
                for nb in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                    if nb in occ and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            for p in comp:
                comps[p] = len(comp)
        got = {
            (int(r), int(c)): v
            for r, c, v in zip(out.row, out.col, out.value)
        }
        for p, size in comps.items():
            if size >= 5:
                assert got[p] != 0.0, (p, size)
            else:
                assert got[p] == 0.0, (p, size)

    def test_attach_mask_area(self, slope):
        mask = R.resample_to_cells(_from(slope), res=5, agg="mean").to_pandas()
        mask_t = pa.table(
            {"cell": mask.cell.to_numpy(), "mask_value": mask.value.to_numpy()}
        )
        data = slope.select(["lat", "lon", "value"])
        out = R.attach_mask(_from(data), mask_t, res=5).to_pandas()
        assert out.mask_value.notna().all()
        assert (out.cell_area_km2 > 0).all()
        assert len(out) == data.num_rows


@pytest.mark.usefixtures("ray_session")
def test_knn_matches_brute_force():
    rng = np.random.default_rng(9)
    # dense reference cloud in a 10x10 deg box -> ring-2 at res 5 covers k=3
    ref_lat = rng.uniform(40, 50, 400)
    ref_lon = rng.uniform(0, 10, 400)
    ref_ids = np.arange(400)
    q_lat = rng.uniform(42, 48, 50)
    q_lon = rng.uniform(2, 8, 50)
    qt = pa.table({"id": np.arange(50), "lat": q_lat, "lon": q_lon})

    out = (
        knn_join(_from(qt), ref_ids, ref_lat, ref_lon, k=3, res=5, ring=3)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    for qi in range(50):
        d = haversine_km(q_lat[qi], q_lon[qi], ref_lat, ref_lon)
        want = np.argsort(d, kind="stable")[:3]
        got = out[out.query_id == qi].ref_id.to_numpy()
        assert np.array_equal(got, ref_ids[want]), qi


@pytest.mark.usefixtures("ray_session")
def test_min_area_distributed_partitioning_invariant():
    """Distributed connected components (striped union-find + boundary
    merge) is invariant to both the input block structure and the
    stripe count — including stripes that slice straight through
    components."""
    import ray.data as rd

    land = raster_table(layer="landcover")

    def run(nblocks, n_stripes):
        ds = rd.from_arrow(land).repartition(nblocks)
        return (
            R.min_area_filter(ds, min_cells=5, n_stripes=n_stripes)
            .to_pandas()
            .sort_values(["row", "col"], ignore_index=True)
        )

    base = run(1, 1)
    for nblocks, stripes in ((12, 8), (6, 3), (4, 16)):
        other = run(nblocks, stripes)
        assert base[["row", "col"]].values.tolist() == other[["row", "col"]].values.tolist()
        np.testing.assert_array_equal(
            base["value"].to_numpy(), other["value"].to_numpy()
        )


def test_label_components_matches_per_pixel_union_find():
    """The vectorized run-based labeler is bit-identical to the
    per-pixel union-find reference on random grids across the density
    spectrum (sparse speckle, near-percolation, dense blob)."""
    rng = np.random.default_rng(7)
    for dens in (0.05, 0.3, 0.6, 0.72, 0.95):
        for _ in range(4):
            nr = int(rng.integers(1, 50))
            nc = int(rng.integers(1, 50))
            occ = rng.random((nr, nc)) < dens
            rows, cols = np.nonzero(occ)
            if rows.size == 0:
                continue
            rows = rows.astype(np.int64)
            cols = cols.astype(np.int64)
            roots = R._union_find_labels(rows, cols)
            pid = rows * nc + cols
            want = pd.Series(pid).groupby(roots).transform("min").to_numpy()
            got = R._label_components(rows, cols, nc)
            np.testing.assert_array_equal(got, want)


def test_pixel_area_km2_sums_to_sphere():
    """Summing the per-pixel spherical area over a full 1-degree
    lat-lon grid reproduces the area of the sphere."""
    lat_centers = np.arange(-89.5, 90, 1.0)
    total = R.pixel_area_km2(lat_centers, 1.0, 1.0).sum() * 360
    sphere = 4 * np.pi * R._EARTH_R_KM**2
    np.testing.assert_allclose(total, sphere, rtol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_min_area_km2_is_latitude_dependent():
    """min_km2 keeps/drops equal-pixel-count components differently by
    latitude — the behavior that distinguishes the reference's km^2
    semantics (mask.py:1309-1398) from a pixel count."""
    import ray.data as rd

    scatter = raster_table(layer="scatter")
    out = (
        R.min_area_filter(_from(scatter), min_km2=1800.0, pitch_deg=0.25)
        .to_pandas()
    )
    # brute-force: BFS components + area sums
    nz = scatter.to_pandas()
    nz = nz[nz.value != 0]
    lab = R._label_components(
        nz.row.to_numpy().astype(np.int64),
        nz.col.to_numpy().astype(np.int64),
        80,
    )
    nz = nz.assign(
        label=lab, area=R.pixel_area_km2(nz.lat.to_numpy(), 0.25, 0.25)
    )
    comp = nz.groupby("label").agg(n=("label", "size"), area=("area", "sum"))
    three = comp[comp.n == 3]
    # the fixture has 3-cell components on BOTH sides of the threshold
    assert (three.area >= 1800.0).any() and (three.area < 1800.0).any()
    got = {
        (int(r), int(c)): v for r, c, v in zip(out.row, out.col, out.value)
    }
    keep = set(comp.index[comp.area >= 1800.0])
    for (_, row), l in zip(nz.iterrows(), nz.label):
        p = (int(row.row), int(row.col))
        if l in keep:
            assert got[p] != 0.0, p
        else:
            assert got[p] == 0.0, p


def test_grid_disk_adaptive_no_duplicate_neighbors():
    """Regression: near the poles the adaptive column window wraps onto
    itself (2w+1 >= nlon) and used to emit duplicate (origin, cell)
    pairs, double-counting their reference points in kNN candidates."""
    from geodata_ray.cellmath import qcell

    cells = qcell.latlng_to_cell(np.array([84.0, -85.0]), np.array([0.0, -180.0]), 2)
    o, c = qcell.grid_disk_multi(cells, 5, adaptive_lon=True)
    pairs = set(zip(o.tolist(), c.tolist()))
    assert len(pairs) == o.size  # no duplicates
    # polar disk degenerates to full row bands: every longitude present
    res, row, col = qcell.cell_to_rowcol(c[o == 0])
    top_rows = row[row == row.max()]
    assert top_rows.size == 32  # nlon at res 2


@pytest.mark.usefixtures("ray_session")
def test_stencil_smooth_matches_scipy_style_conv():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.raster import stencil_smooth

    rng = np.random.default_rng(3)
    grid = rng.integers(-9, 9, size=(7, 11)).astype(np.int64)
    rows, cols = np.indices(grid.shape)
    # punch a hole: irregular domain (trimmed raster)
    keep = ~((rows == 3) & (cols == 5))
    t = pa.table({
        "row": rows[keep].ravel(), "col": cols[keep].ravel(),
        "v": grid[keep].ravel(),
    })
    out = {
        (r["row"], r["col"]): (r["n_nbrs"], r["sum_v"])
        for r in stencil_smooth(rd.from_arrow(t), value_col="v").take_all()
    }
    assert len(out) == keep.sum()
    for r, c in zip(rows[keep].ravel(), cols[keep].ravel()):
        exp_n, exp_s = 0, 0
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 7 and 0 <= cc < 11 and not (rr == 3 and cc == 5):
                    exp_n += 1
                    exp_s += int(grid[rr, cc])
        assert out[(r, c)] == (exp_n, exp_s)


@pytest.mark.usefixtures("ray_session")
def test_grid_density_clusters_matches_bfs_reference():
    import ray.data as rd

    from geodata_ray.stages.raster import grid_density_clusters

    rng = np.random.default_rng(5)
    # three planted blobs + uniform noise
    blobs = [(-40.0, 10.0), (-36.0, 14.0), (30.0, -120.0)]
    lats, lons = [], []
    for blat, blon in blobs:
        lats.append(rng.uniform(blat, blat + 7.9, 120))
        lons.append(rng.uniform(blon, blon + 7.9, 120))
    lats.append(rng.uniform(-80, 80, 150))
    lons.append(rng.uniform(-170, 170, 150))
    lat = np.concatenate(lats)
    lon = np.concatenate(lons)
    cell, minp = 4.0, 8
    out = (
        grid_density_clusters(
            rd.from_pandas(pd.DataFrame({"lat": lat, "lon": lon}))
            .repartition(6),
            cell_deg=cell,
            min_pts=minp,
        )
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )

    # reference: pandas counts + BFS over dense cells
    r = np.floor((lat + 90.0) / cell).astype(int)
    c = np.floor((lon + 180.0) / cell).astype(int)
    cnt = pd.DataFrame({"r": r, "c": c}).value_counts()
    dense = {k: v for k, v in cnt.items() if v >= minp}
    seen, clusters = set(), []
    for start in dense:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            cur = stack.pop()
            comp.append(cur)
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (cur[0] + dr, cur[1] + dc)
                if nb in dense and nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        ncols = int(round(360.0 / cell))
        cid = min(rr * ncols + cc for rr, cc in comp)
        clusters.append((cid, len(comp), sum(dense[p] for p in comp)))
    ref = (
        pd.DataFrame(clusters, columns=["cluster_id", "n_cells", "n_points"])
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    assert len(ref) >= 2  # the planted blobs actually clustered
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))
