"""Conversion kernels + resource configs (turbine power curves, panel
coefficients).

Column-level ports of the reference's conversion library
(``/root/reference/src/geodata/convert.py``, cited per function) plus
the driver-side turbine smoothing precompute (``resource.py:75-142``).
Fixture configs (FIXTURES.md F6) are embedded literals with the same
key structure the YAML loader produces (``resource.py:35-49``).
"""

from __future__ import annotations

import numpy as np

from geodata_ray.functions import pv as pvm
from geodata_ray.functions import wind as windm

# --- fixture resource configs (F6): same shape as resource.py:35-49 dicts
TURBINES = {
    "fixture_1500kw": {
        "V": np.array(
            [0.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0, 13.0,
             14.0, 20.0, 25.0]
        ),
        "POW": np.array(
            [0.0, 0.0, 35.0, 120.0, 255.0, 450.0, 690.0, 976.0, 1240.0,
             1425.0, 1490.0, 1500.0, 1500.0, 1500.0, 0.0]
        ),
        "hub_height": 80.0,
        "P": 1500.0,
    },
    "fixture_3000kw": {
        "V": np.array([0.0, 3.5, 5.0, 7.0, 9.0, 11.0, 13.0, 15.0, 25.0]),
        "POW": np.array([0.0, 0.0, 180.0, 800.0, 1800.0, 2700.0, 3000.0, 3000.0, 0.0]),
        "hub_height": 100.0,
        "P": 3000.0,
    },
}

PANELS = {
    "fixture_huld": {
        "model": "huld",
        "r_irradiance": 1000.0,
        "r_tmod": 25.0,
        "c_temp_amb": 1.0,
        "c_temp_irrad": 0.035,
        "k_1": -0.017162,
        "k_2": -0.040289,
        "k_3": -0.004681,
        "k_4": 0.000148,
        "k_5": 0.000169,
        "k_6": 0.000005,
        "inverter_efficiency": 0.9,
        "efficiency": 0.162,
    },
    "fixture_bofinger": {
        "model": "bofinger",
        "A": 1.1233,
        "B": -3.106e-5,
        "C": -0.0341,
        "D": 0.00109,
        "NOCT": 320.0,
        "Tamb": 293.0,
        "Intc": 800.0,
        "Tstd": 298.0,
        "ta": 0.9,
        "threshold": 5.0,
        "inverter_efficiency": 0.93,
    },
}


def windturbine_smooth(turbine: dict, params: dict | None = None) -> dict:
    """Gaussian-kernel power-curve smoothing (reference
    resource.py:75-142, Andresen 2015); driver-side precompute — the
    smoothed dict rides to workers as broadcast state (SURVEY.md T6).
    ``np.convolve`` replaces fftconvolve (identical result)."""
    params = dict(params or {})
    eta = params.setdefault("eta", 0.95)
    delta_v = params.setdefault("Delta_v", 1.27)
    sigma = params.setdefault("sigma", 2.29)

    v_reg = np.linspace(-50.0, 50.0, 1001)
    power_reg = np.interp(v_reg, turbine["V"], turbine["POW"])
    kernel_reg = (
        1.0
        / np.sqrt(2 * np.pi * sigma * sigma)
        * np.exp(-((v_reg - delta_v) ** 2) / (2 * sigma * sigma))
    )
    conv = 0.1 * np.convolve(power_reg, kernel_reg, mode="same")
    v_new = np.linspace(0.0, 35.0, 72)
    pow_new = eta * np.interp(v_new, v_reg, conv)

    out = dict(turbine)
    out["V"], out["POW"] = v_new, pow_new
    out["P"] = float(np.max(pow_new))
    return out


def convert_temperature(cols: dict) -> np.ndarray:
    """K -> degC (reference convert.py:110-116)."""
    return np.asarray(cols["temperature"], dtype=np.float64) - 273.15


def convert_soil_temperature(cols: dict) -> np.ndarray:
    """K -> degC with sea-NaN -> 0 (reference convert.py:126-136)."""
    t = np.asarray(cols["soil_temperature"], dtype=np.float64) - 273.15
    return np.nan_to_num(t, nan=0.0)


def convert_pm25(cols: dict) -> np.ndarray:
    """PM2.5 = dust + ss + bc + 1.4 oc + 1.375 so4, kg/m3 -> ug/m3
    (reference convert.py:331-357, Buchard 2016)."""
    pm = (
        np.asarray(cols["dusmass25"], dtype=np.float64)
        + np.asarray(cols["sssmass25"], dtype=np.float64)
        + np.asarray(cols["bcsmass"], dtype=np.float64)
        + 1.4 * np.asarray(cols["ocsmass"], dtype=np.float64)
        + 1.375 * np.asarray(cols["so4smass"], dtype=np.float64)
    )
    return 1e9 * pm


def convert_windspd(cols: dict, hub_height: float, **kw) -> np.ndarray:
    """Wind speed at height (reference convert.py:280-302)."""
    _, v = windm.extrapolate_wind_speed(cols, hub_height, **kw)
    return v


def convert_windwpd(cols: dict, hub_height: float, **kw) -> np.ndarray:
    """Wind power density 0.5*rho*v^3 (reference convert.py:305-328)."""
    _, v = windm.extrapolate_wind_speed(cols, hub_height, **kw)
    return 0.5 * np.asarray(cols["rhoa"], dtype=np.float64) * v**3


def convert_wind(cols: dict, turbine: dict, **kw) -> np.ndarray:
    """Power-curve conversion: extrapolate to hub height, interp the
    V->POW/P curve (reference convert.py:255-277)."""
    _, v = windm.extrapolate_wind_speed(cols, turbine["hub_height"], **kw)
    return np.interp(v, turbine["V"], turbine["POW"] / turbine["P"])


def convert_pv(
    cols: dict,
    panel: dict,
    orientation,
    *,
    trigon_model: str = "simple",
    clearsky_model: str = "simple",
) -> np.ndarray:
    """Full PV chain (reference convert.py:238-249): solar position ->
    orientation -> tilted irradiation -> panel power.

    ``orientation``: dict {slope_deg, azimuth_deg} or the string
    'latitude_optimal'.
    """
    alt, az, atmo = pvm.solar_position(
        cols["ts"], cols["lat"], cols["lon"], cols.get("influx_toa")
    )
    if orientation == "latitude_optimal":
        slope = pvm.latitude_optimal_slope(np.deg2rad(cols["lat"]))
        azimuth = np.deg2rad(180.0)
    else:
        slope = np.deg2rad(float(orientation["slope"]))
        azimuth = np.deg2rad(float(orientation["azimuth"]))
    irr = pvm.tilted_irradiation(
        cols, slope, azimuth, alt, az, atmo,
        trigon_model=trigon_model, clearsky_model=clearsky_model,
    )
    return pvm.solar_panel_power(cols, irr, panel)


def convert_solar_thermal(
    cols: dict,
    orientation,
    *,
    c0: float = 0.8,
    c1: float = 3.0,
    t_store: float = 80.0,
    trigon_model: str = "simple",
    clearsky_model: str = "simple",
) -> np.ndarray:
    """Solar-thermal collector (reference convert.py:215-236):
    eta = c0 - c1*(t_store - T)/G; clip output > 0."""
    t_store_k = t_store + 273.15
    alt, az, atmo = pvm.solar_position(
        cols["ts"], cols["lat"], cols["lon"], cols.get("influx_toa")
    )
    if orientation == "latitude_optimal":
        slope = pvm.latitude_optimal_slope(np.deg2rad(cols["lat"]))
        azimuth = np.deg2rad(180.0)
    else:
        slope = np.deg2rad(float(orientation["slope"]))
        azimuth = np.deg2rad(float(orientation["azimuth"]))
    irr = pvm.tilted_irradiation(
        cols, slope, azimuth, alt, az, atmo,
        trigon_model=trigon_model, clearsky_model=clearsky_model,
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        eta = c0 - c1 * (
            (t_store_k - np.asarray(cols["temperature"], dtype=np.float64)) / irr
        )
    out = irr * eta
    return np.where(np.isnan(out) | (out <= 0.0), 0.0, out)


def heat_demand_from_daily_mean(daily_mean_temp, *, threshold: float = 15.0,
                                a: float = 1.0, constant: float = 0.0):
    """Degree-day formula applied to a daily-mean temperature column
    (reference convert.py:146-157): a*(threshold+273.15 - T), clipped
    at 0, plus constant.  The daily mean itself is a grouped aggregate
    (pipeline layer)."""
    t = np.asarray(daily_mean_temp, dtype=np.float64)
    hd = a * ((threshold + 273.15) - t)
    return constant + np.maximum(hd, 0.0)
