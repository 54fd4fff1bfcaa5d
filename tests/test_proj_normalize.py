"""Projection/area/cover math + source normalizers."""

import numpy as np
import pyarrow as pa
import pytest

from geodata_ray.cellmath import proj, qcell
from geodata_ray.stages import normalize as N


class TestProj:
    def test_cea_roundtrip(self):
        rng = np.random.default_rng(2)
        lat = rng.uniform(-89, 89, 1000)
        lon = rng.uniform(-180, 180, 1000)
        x, y = proj.cea_project(lat, lon)
        lat2, lon2 = proj.cea_unproject(x, y)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)

    def test_polygon_area_known(self):
        # 1-degree square at the equator ~ (111.19)^2 km^2
        xs = [0.0, 1.0, 1.0, 0.0, 0.0]
        ys = [0.0, 0.0, 1.0, 1.0, 0.0]
        a = proj.polygon_area_km2(xs, ys)
        assert abs(a - 111.19**2) / 111.19**2 < 0.01
        # same square at 60N has ~half the area (equal-area projection)
        ys60 = [59.5, 59.5, 60.5, 60.5, 59.5]
        a60 = proj.polygon_area_km2(xs, ys60)
        assert abs(a60 / a - np.cos(np.deg2rad(60))) < 0.01

    def test_polygon_area_antimeridian(self):
        xs = [179.5, -179.5, -179.5, 179.5, 179.5]
        ys = [0.0, 0.0, 1.0, 1.0, 0.0]
        a = proj.polygon_area_km2(xs, ys)
        assert abs(a - 111.19**2) / 111.19**2 < 0.01

    def test_cover_cells_centroid_rule(self):
        xs = [0.0, 3.0, 3.0, 0.0, 0.0]
        ys = [0.0, 0.0, 3.0, 3.0, 0.0]
        cells = proj.polygon_cover_cells(xs, ys, 6)
        # every covered cell's centroid must be inside; and the cover
        # must contain the cell of an interior point
        clat, clon = qcell.cell_to_latlng(cells)
        assert ((clat > 0) & (clat < 3) & (clon > 0) & (clon < 3)).all()
        inner = qcell.latlng_to_cell(1.5, 1.5, 6)
        assert inner in cells
        # area sanity: cover area ~ polygon area
        cover_area = qcell.cell_area_km2(cells).sum()
        poly_area = proj.polygon_area_km2(xs, ys)
        assert abs(cover_area - poly_area) / poly_area < 0.15

    def test_cover_union_dedup(self):
        xs1 = [0.0, 2.0, 2.0, 0.0, 0.0]
        ys1 = [0.0, 0.0, 2.0, 2.0, 0.0]
        xs2 = [1.0, 3.0, 3.0, 1.0, 1.0]  # overlaps xs1
        u = proj.polygons_cover_cells_union([xs1, xs2], [ys1, ys1], 6)
        assert len(u) == len(np.unique(u))
        a = proj.polygon_cover_cells(xs1, ys1, 6)
        b = proj.polygon_cover_cells(xs2, ys1, 6)
        assert len(u) < len(a) + len(b)  # overlap deduplicated
        assert set(u) == set(a) | set(b)

    def test_buffer_grows_area(self):
        xs = [10.0, 11.0, 11.0, 10.0, 10.0]
        ys = [40.0, 40.0, 41.0, 41.0, 40.0]
        bx, by = proj.buffer_ring_km(xs, ys, 50.0)
        a0 = proj.polygon_area_km2(xs, ys)
        a1 = proj.polygon_area_km2(bx, by)
        assert a1 > a0 * 1.5


class TestNormalizers:
    def _raw_era5(self, n=500):
        rng = np.random.default_rng(6)
        ssrd = rng.uniform(0, 3.6e6, n)
        ssrd[:20] = 0.0  # night (albedo NaN path)
        fdir = ssrd * rng.uniform(0.2, 0.9, n)
        return pa.table(
            {
                "ts": pa.array(
                    np.datetime64("2024-06-01", "us")
                    + np.arange(n).astype("timedelta64[s]").astype("timedelta64[us]")
                ),
                "lat": pa.array(rng.uniform(30, 60, n)),
                "lon": pa.array(rng.uniform(-10, 20, n)),
                "z": pa.array(rng.uniform(0, 5e4, n)),
                "ssrd": pa.array(ssrd),
                "ssr": pa.array(ssrd * rng.uniform(0.7, 0.95, n)),
                "fdir": pa.array(fdir),
                "tisr": pa.array(ssrd * rng.uniform(1.0, 1.3, n)),
                "u100": pa.array(rng.normal(0, 5, n)),
                "v100": pa.array(rng.normal(0, 5, n)),
                "ro": pa.array(rng.normal(0, 1e-4, n)),  # includes negatives
                "t2m": pa.array(rng.uniform(250, 310, n)),
                "sp": pa.array(rng.uniform(9e4, 1.05e5, n)),
                "stl4": pa.array(rng.uniform(260, 300, n)),
                "fsr": pa.array(rng.uniform(1e-4, 1.0, n)),
            }
        )

    def test_era5_normalizer_semantics(self):
        raw = self._raw_era5()
        out = N.normalize_era5_batch(raw)
        r = raw.to_pandas()
        o = out.to_pandas()
        np.testing.assert_allclose(o.height, r.z / 9.80665)
        # albedo: (ssrd-ssr)/ssrd, NaN (night) -> 0
        night = r.ssrd == 0
        assert (o.albedo[night] == 0).all()
        day = ~night
        np.testing.assert_allclose(
            o.albedo[day], ((r.ssrd - r.ssr) / r.ssrd)[day]
        )
        # J -> W conversion with clipping
        np.testing.assert_allclose(
            o.influx_direct, np.maximum(r.fdir, 0) / 3600.0
        )
        np.testing.assert_allclose(
            o.influx_diffuse, np.maximum(r.ssrd - r.fdir, 0) / 3600.0
        )
        np.testing.assert_allclose(o.wnd100m, np.hypot(r.u100, r.v100))
        assert (o.runoff >= 0).all()
        for want in ("temperature", "pressure", "soil_temperature", "roughness"):
            assert want in o.columns

    def test_merra2_normalizer(self):
        rng = np.random.default_rng(8)
        n = 200
        raw = pa.table(
            {
                "ts": pa.array(np.arange(n).astype("datetime64[us]")),
                "ulml": pa.array(rng.normal(0, 4, n)),
                "vlml": pa.array(rng.normal(0, 4, n)),
                "z0m": pa.array(rng.uniform(0, 1, n)),
                "tlml": pa.array(rng.uniform(250, 310, n)),
            }
        )
        out = N.normalize_merra2_flux_batch(raw).to_pandas()
        r = raw.to_pandas()
        np.testing.assert_allclose(out.wndlml, np.hypot(r.ulml, r.vlml))
        assert "roughness" in out.columns and "temperature" in out.columns
        assert "tlml" in out.columns  # kept for Obukhov-length users


@pytest.mark.usefixtures("ray_session")
def test_compute_var_udf_hook():
    from geodata_ray.pipelines.conversions import _from
    from geodata_ray.sources.synth import grid_table

    g = grid_table(hours=6, ny=3, nx=3)
    out = N.compute_var(
        _from(g), lambda c: c["rhoa"].astype(np.float64) * 2.0, "rho2"
    ).to_pandas()
    ref = g.to_pandas()
    assert len(out) == len(ref)
    np.testing.assert_allclose(
        np.sort(out.rho2.to_numpy()),
        np.sort(ref.rhoa.to_numpy().astype(np.float64) * 2.0),
    )
    got = N.get_var(_from(g), "rhoa").to_pandas()
    assert list(got.columns) == ["ts", "lat", "lon", "rhoa"]


@pytest.mark.usefixtures("ray_session")
def test_source_registry_prepare_and_errors():
    import ray.data as rd

    from geodata_ray.sources.registry import get_source_config, prepare_source

    cfg = get_source_config("era5_hourly")
    assert "roughness" in cfg.variables
    raw = TestNormalizers()._raw_era5(200)
    out = prepare_source(rd.from_arrow(raw).repartition(2), "era5_hourly")
    assert set(cfg.variables) <= set(out.schema().names)
    with pytest.raises(KeyError, match="unknown source"):
        get_source_config("nope")
