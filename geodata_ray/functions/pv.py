"""Solar PV chain over flat numpy columns: solar position ->
surface orientation -> tilted irradiation -> panel model.

Reproduces the reference's PV semantics (cited per function) on 1-D
column arrays (``ts`` as datetime64[us], ``lat``/``lon`` degrees),
fused by the pipeline layer into a single ``map_batches`` stage
(SURVEY.md M22-M29).
"""

from __future__ import annotations

import numpy as np

SOLAR_CONSTANT = 1366.1


def solar_position(ts, lat, lon, influx_toa=None):
    """Solar altitude/azimuth + atmospheric insolation (reference
    pv/solar_position.py:18-97; Michalsky 1988 / Sproul 2007).

    ``ts``: datetime64 array (UTC).  Returns (altitude_rad,
    azimuth_rad, atmospheric_insolation).
    """
    ts = np.asarray(ts)
    unix = ts.astype("datetime64[us]").astype(np.int64) / 1e6
    jd = unix / 86400.0 + 2440587.5
    n = jd - 2451545.0

    lat_r = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lon_d = np.asarray(lon, dtype=np.float64)

    L = 280.460 + 0.9856474 * n  # mean longitude (deg)
    g = np.deg2rad(357.528 + 0.9856003 * n)  # mean anomaly (rad)
    ell = np.deg2rad(L + 1.915 * np.sin(g) + 0.020 * np.sin(2 * g))
    ep = np.deg2rad(23.439 - 4e-7 * n)  # obliquity (rad)

    ra = np.arctan2(np.cos(ep) * np.sin(ell), np.cos(ell))
    # fractional UTC hour of day
    frac_hour = (unix % 86400.0) / 3600.0
    lmst = (6.697375 + frac_hour + 0.0657098242 * n) * 15.0 + lon_d
    h = (np.deg2rad(lmst) - ra + np.pi) % (2 * np.pi) - np.pi  # hour angle

    dec = np.arcsin(np.sin(ep) * np.sin(ell))
    alt = np.arcsin(
        np.clip(
            np.sin(lat_r) * np.sin(dec)
            + np.cos(lat_r) * np.cos(dec) * np.cos(h),
            -1.0,
            1.0,
        )
    )
    az = np.arccos(
        np.clip(
            (np.sin(dec) * np.cos(lat_r) - np.cos(dec) * np.sin(lat_r) * np.cos(h))
            / np.cos(alt),
            -1.0,
            1.0,
        )
    )
    az = np.where(h <= 0, az, 2 * np.pi - az)

    if influx_toa is not None:
        atmo = np.asarray(influx_toa, dtype=np.float64)
    else:
        atmo = SOLAR_CONSTANT * (1 + 0.033 * np.cos(g)) * np.sin(alt)
    return alt, az, atmo


def latitude_optimal_slope(lat_rad):
    """Optimal tilt by latitude (reference pv/orientation.py:40-77;
    gsee): 0.87*lat below 25 deg, 0.76*lat+0.31deg below 50 deg, else
    40 deg.  Raises for negative latitudes like the reference."""
    lat = np.asarray(lat_rad, dtype=np.float64)
    if (lat < 0).any():
        raise NotImplementedError("not implemented for negative latitudes")
    below25 = lat <= np.deg2rad(25)
    below50 = lat <= np.deg2rad(50)
    return np.where(
        below25,
        0.87 * lat,
        np.where(below50, 0.76 * lat + np.deg2rad(0.31), np.deg2rad(40.0)),
    )


def surface_orientation(slope, azimuth, sun_alt, sun_az):
    """cos(incidence), clipped at 0 for back-of-panel sun (reference
    pv/orientation.py:91-126)."""
    cosinc = np.sin(slope) * np.cos(sun_alt) * np.cos(
        azimuth - sun_az
    ) + np.cos(slope) * np.sin(sun_alt)
    return np.maximum(cosinc, 0.0)


def diffuse_horizontal(influx, sinalt, atmo, *, temperature=None, humidity=None,
                       clearsky_model="simple"):
    """Reindl 1990 clearsky split (reference pv/irradiation.py:28-82):
    diffuse fraction piecewise in clearsky index k."""
    influx = np.asarray(influx, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = influx / np.asarray(atmo, dtype=np.float64)
    if clearsky_model == "simple":
        fraction = (
            ((k > 0.0) & (k <= 0.3))
            * np.fmin(1.0, 1.020 - 0.254 * k + 0.0123 * sinalt)
            + ((k > 0.3) & (k < 0.78))
            * np.fmin(0.97, np.fmax(0.1, 1.400 - 1.749 * k + 0.177 * sinalt))
            + (k >= 0.78) * np.fmax(0.1, 0.486 * k - 0.182 * sinalt)
        )
    elif clearsky_model == "enhanced":
        T = np.asarray(temperature, dtype=np.float64)
        rh = np.asarray(humidity, dtype=np.float64)
        fraction = (
            ((k > 0.0) & (k <= 0.3))
            * np.fmin(
                1.0, 1.000 - 0.232 * k + 0.0239 * sinalt - 0.000682 * T + 0.0195 * rh
            )
            + ((k > 0.3) & (k < 0.78))
            * np.fmin(
                0.97,
                np.fmax(
                    0.1,
                    1.329 - 1.716 * k + 0.267 * sinalt - 0.00357 * T + 0.106 * rh,
                ),
            )
            + (k >= 0.78)
            * np.fmax(0.1, 0.426 * k - 0.256 * sinalt + 0.00349 * T + 0.0734 * rh)
        )
    else:
        raise ValueError("clearsky_model must be 'simple' or 'enhanced'")
    return influx * fraction


def tilted_irradiation(
    cols: dict,
    slope,
    azimuth,
    sun_alt,
    sun_az,
    atmo,
    *,
    trigon_model: str = "simple",
    clearsky_model: str = "simple",
    altitude_threshold: float = 1.0,
):
    """Total tilted-plane irradiation (reference
    pv/irradiation.py:154-204): influx clipping vs TOA, clearsky split
    (or direct+diffuse inputs), simple or Hay-Davies transposition,
    ground-reflected term, suppression below 1 deg sun altitude."""
    sinalt = np.sin(sun_alt)
    cosinc = surface_orientation(slope, azimuth, sun_alt, sun_az)

    if "influx" in cols:
        influx = np.clip(np.asarray(cols["influx"], dtype=np.float64), 0.0, atmo)
        diffuse = diffuse_horizontal(
            influx,
            sinalt,
            atmo,
            temperature=cols.get("temperature"),
            humidity=cols.get("humidity"),
            clearsky_model=clearsky_model,
        )
        direct = influx - diffuse
    elif "influx_direct" in cols and "influx_diffuse" in cols:
        direct = np.clip(
            np.asarray(cols["influx_direct"], dtype=np.float64), 0.0, atmo
        )
        diffuse = np.clip(
            np.asarray(cols["influx_diffuse"], dtype=np.float64),
            0.0,
            atmo - direct,
        )
    else:
        raise ValueError("need influx or influx_direct+influx_diffuse")

    albedo = np.asarray(cols["albedo"], dtype=np.float64)
    total_influx = direct + diffuse

    with np.errstate(divide="ignore", invalid="ignore"):
        if trigon_model == "simple":
            k = cosinc / sinalt
            cos_slope = np.cos(slope)
            direct_t = k * direct
            diffuse_t = (1.0 + cos_slope) / 2.0 * diffuse + albedo * total_influx * (
                (1.0 - cos_slope) / 2.0
            )
            total = np.nan_to_num(direct_t, nan=0.0) + np.nan_to_num(
                diffuse_t, nan=0.0
            )
        else:  # hay-davies (reference irradiation.py:85-151)
            f = np.sqrt(np.where(total_influx > 0, direct / total_influx, 0.0))
            f = np.nan_to_num(f, nan=0.0)
            A = direct / atmo
            R_b = cosinc / sinalt
            diffuse_t = (
                (1.0 - A)
                * ((1 + np.cos(slope)) / 2.0)
                * (1.0 + f * np.sin(slope / 2.0) ** 3)
                + A * R_b
            ) * diffuse
            diffuse_t = np.where(
                np.isnan(diffuse_t) | (diffuse_t < 0.0), 0.0, diffuse_t
            )
            direct_t = R_b * direct
            ground_t = total_influx * albedo * (1.0 - np.cos(slope)) / 2.0
            total = direct_t + diffuse_t + ground_t

    cap = (sun_alt < np.deg2rad(altitude_threshold)) | (total_influx <= 0.01)
    return np.where(cap, 0.0, total)


def power_huld(irradiance, t_amb, pc: dict):
    """Huld 2010 PV panel model (reference
    pv/solar_panel_model.py:28-60)."""
    irr = np.asarray(irradiance, dtype=np.float64)
    T_ = (
        pc["c_temp_amb"] * np.asarray(t_amb, dtype=np.float64)
        + pc["c_temp_irrad"] * irr
    ) - pc["r_tmod"]
    G_ = irr / pc["r_irradiance"]
    with np.errstate(invalid="ignore", divide="ignore"):
        lg = np.log(G_)
        eff = (
            1
            + pc["k_1"] * lg
            + pc["k_2"] * lg**2
            + T_ * (pc["k_3"] + pc["k_4"] * lg + pc["k_5"] * lg**2)
            + pc["k_6"] * (T_**2)
        )
    eff = np.nan_to_num(eff, nan=0.0, neginf=0.0)
    eff = np.maximum(eff, 0.0)
    return G_ * eff * pc.get("inverter_efficiency", 1.0)


def power_bofinger(irradiance, t_amb, pc: dict):
    """Bofinger 2004 PV panel model (reference
    pv/solar_panel_model.py:63-88)."""
    irr = np.asarray(irradiance, dtype=np.float64)
    t = np.asarray(t_amb, dtype=np.float64)
    fraction = (pc["NOCT"] - pc["Tamb"]) / pc["Intc"]
    with np.errstate(divide="ignore", invalid="ignore"):
        eta_ref = pc["A"] + pc["B"] * irr + pc["C"] * np.log(irr)
        eta = (
            eta_ref
            * (1.0 + pc["D"] * (fraction * irr + (t - pc["Tstd"])))
            / (1.0 + pc["D"] * fraction / pc["ta"] * eta_ref * irr)
        )
    capacity = (pc["A"] + pc["B"] * 1000.0 + pc["C"] * np.log(1000.0)) * 1e3
    power = irr * eta * (pc.get("inverter_efficiency", 1.0) / capacity)
    return np.where(irr < pc["threshold"], 0.0, power)


def solar_panel_power(cols: dict, irradiance, pc: dict):
    """Model dispatch (reference pv/solar_panel_model.py:91-100)."""
    model = pc.get("model", "huld")
    if model == "huld":
        return power_huld(irradiance, cols["temperature"], pc)
    if model == "bofinger":
        return power_bofinger(irradiance, cols["temperature"], pc)
    raise ValueError(f"unknown panel model {model}")
