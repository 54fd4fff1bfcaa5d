"""Golden tests: Ray conversion pipelines vs direct numpy application.

The reference asserts only dtypes (tests/pr/test_era5.py:150-215); we
assert exact values: the distributed pipeline must reproduce the
straight single-process numpy computation bit-for-bit at any batch
split (SURVEY.md §5 new-engine test plan).
"""

import numpy as np
import pandas as pd
import pytest

from geodata_ray.functions import convert as C
from geodata_ray.functions import wind as windm
from geodata_ray.pipelines import conversions as P
from geodata_ray.sources.synth import grid_table


@pytest.fixture(scope="module")
def grid():
    return grid_table(hours=48, ny=6, nx=8)


def _cols(t):
    return {n: t[n].to_numpy(zero_copy_only=False) for n in t.schema.names}


def _with_winds(cols):
    out = dict(cols)
    for h in ("2m", "10m", "50m"):
        u = out[f"u{h}"].astype(np.float64)
        v = out[f"v{h}"].astype(np.float64)
        # f64 sqrt of squared sum, cast f32 — the SQL-reproducible form
        # normalize_winds_batch uses (see conversions.py docstring)
        out[f"wnd{h}"] = np.sqrt(u * u + v * v).astype(np.float32)
    return out


def _ray_df(ds, value_col):
    return (
        ds.to_pandas()
        .sort_values(["ts", "lat", "lon"], ignore_index=True)[value_col]
        .to_numpy()
    )


def _ref_order(t):
    df = t.to_pandas().sort_values(["ts", "lat", "lon"], ignore_index=True)
    return df


@pytest.mark.usefixtures("ray_session")
class TestConversionGoldens:
    def test_temperature(self, grid):
        got = _ray_df(P.temperature(P._from(grid)), "temperature_c")
        ref = _ref_order(grid)
        want = ref["temperature"].to_numpy().astype(np.float64) - 273.15
        np.testing.assert_array_equal(got, want)

    def test_pm25(self, grid):
        got = _ray_df(P.pm25(P._from(grid)), "pm25")
        r = _ref_order(grid)
        want = 1e9 * (
            r.dusmass25.to_numpy().astype(np.float64)
            + r.sssmass25.to_numpy().astype(np.float64)
            + r.bcsmass.to_numpy().astype(np.float64)
            + 1.4 * r.ocsmass.to_numpy().astype(np.float64)
            + 1.375 * r.so4smass.to_numpy().astype(np.float64)
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_windspd_log_ratio_nearest_height(self, grid):
        got = _ray_df(P.windspd(P._from(grid), hub_height=80.0), "wnd80m")
        r = _ref_order(grid)
        cols = _with_winds({k: r[k].to_numpy() for k in r.columns})
        # nearest height to 80 among {2,10,50} is 50
        z0 = windm.sanitize_roughness(cols["roughness"])
        want = cols["wnd50m"].astype(np.float64) * (
            np.log(80.0 / z0) / np.log(50.0 / z0)
        )
        np.testing.assert_array_equal(got, want)

    def test_windspd_var_height_log_law(self, grid):
        ds = P.windspd(
            P._from(grid), hub_height=80.0, extrap="log_law", var_height="lml"
        )
        got = _ray_df(ds, "wnd80m")
        r = _ref_order(grid)
        want = r.wndlml.to_numpy().astype(np.float64) + r.ustar.to_numpy().astype(
            np.float64
        ) / 0.4 * np.log(
            (80.0 - r.disph.to_numpy().astype(np.float64))
            / r.hlml.to_numpy().astype(np.float64)
        )
        np.testing.assert_array_equal(got, want)

    def test_wind_power_curve(self, grid):
        t = C.TURBINES["fixture_1500kw"]
        got = _ray_df(P.wind_power(P._from(grid), "fixture_1500kw"), "capacity_factor")
        r = _ref_order(grid)
        cols = _with_winds({k: r[k].to_numpy() for k in r.columns})
        _, v = windm.extrapolate_wind_speed(cols, t["hub_height"])
        want = np.interp(v, t["V"], t["POW"] / t["P"])
        np.testing.assert_array_equal(got, want)
        assert (got >= 0).all() and (got <= 1).all()

    def test_windwpd(self, grid):
        got = _ray_df(P.windwpd(P._from(grid), hub_height=50.0), "wpd")
        r = _ref_order(grid)
        cols = _with_winds({k: r[k].to_numpy() for k in r.columns})
        _, v = windm.extrapolate_wind_speed(cols, 50.0)
        want = 0.5 * cols["rhoa"].astype(np.float64) * v**3
        np.testing.assert_array_equal(got, want)

    def test_pv_huld_and_bounds(self, grid):
        got = _ray_df(P.pv(P._from(grid), "fixture_huld"), "pv_power")
        r = _ref_order(grid)
        want = C.convert_pv(
            {k: r[k].to_numpy() for k in r.columns},
            C.PANELS["fixture_huld"],
            {"slope": 30.0, "azimuth": 180.0},
        )
        np.testing.assert_array_equal(got, want)
        assert np.isfinite(got).all()
        assert (got >= 0).all()
        # nighttime rows (influx_toa == 0) must be exactly 0
        night = r.influx_toa.to_numpy() == 0.0
        assert (got[night] == 0).all()
        assert (got > 0).any()

    def test_pv_hay_davies_and_bofinger(self, grid):
        ds = P.pv(
            P._from(grid), "fixture_bofinger",
            orientation="latitude_optimal", trigon_model="hay-davies",
        )
        got = _ray_df(ds, "pv_power")
        r = _ref_order(grid)
        want = C.convert_pv(
            {k: r[k].to_numpy() for k in r.columns},
            C.PANELS["fixture_bofinger"],
            "latitude_optimal",
            trigon_model="hay-davies",
        )
        np.testing.assert_array_equal(got, want)
        # sea cells carry NaN temperature -> NaN power (reference
        # behavior: convert_pv has no fillna); land rows stay finite
        land = np.isfinite(r.temperature.to_numpy())
        assert np.isfinite(got[land]).all()

    def test_solar_thermal(self, grid):
        got = _ray_df(P.solar_thermal(P._from(grid)), "solar_thermal")
        r = _ref_order(grid)
        want = C.convert_solar_thermal(
            {k: r[k].to_numpy() for k in r.columns},
            {"slope": 45.0, "azimuth": 180.0},
        )
        np.testing.assert_array_equal(got, want)
        assert (got >= 0).all()

    def test_winddir_quadrants(self, grid):
        got = _ray_df(P.winddir(P._from(grid)), "winddir")
        r = _ref_order(grid)
        want = windm.winddir(r.ulml.to_numpy(), r.vlml.to_numpy())
        np.testing.assert_array_equal(got, want)
        assert ((got >= 0) & (got < 360)).all()

    def test_heat_demand_daily_mean_skipna(self, grid):
        out = (
            P.heat_demand(P._from(grid), threshold=15.0, a=1.0, hour_shift=0.0)
            .to_pandas()
            .sort_values(["lat", "lon", "day"], ignore_index=True)
        )
        r = grid.to_pandas()
        r["temperature"] = r["temperature"].astype("float64")
        r["day"] = r.ts.dt.floor("D")
        want = (
            r.groupby(["lat", "lon", "day"])["temperature"]
            .mean()  # pandas skips NaN like xarray's skipna resample
            .reset_index()
            .sort_values(["lat", "lon", "day"], ignore_index=True)
        )
        hd = 1.0 * ((15.0 + 273.15) - want.temperature.to_numpy().astype(np.float64))
        hd = np.maximum(hd, 0.0)
        assert len(out) == len(want)
        np.testing.assert_allclose(
            out.heat_demand.to_numpy(), hd, rtol=1e-12, atol=1e-9
        )


def test_turbine_smoothing_properties():
    t = C.TURBINES["fixture_1500kw"]
    s = C.windturbine_smooth(t)
    assert len(s["V"]) == 72 and s["V"][0] == 0.0 and s["V"][-1] == 35.0
    assert s["P"] <= t["P"]  # eta=0.95 shaves the peak
    assert s["POW"][np.where(s["V"] == 0.0)].max() < 15.0  # no oversmoothing
