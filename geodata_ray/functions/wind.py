"""Wind-profile extrapolation laws over flat numpy columns.

Semantics mirror the reference implementations (cited per function) but
operate on 1-D column arrays from a long-form Arrow table instead of
``xarray`` grids — same math, Ray-Data-native data layout.
"""

from __future__ import annotations

import numpy as np

VONK = 0.4  # Von Karman constant
ROUGHNESS_FLOOR = 0.0002  # open-water roughness; reference wind.py:290


def sanitize_roughness(roughness: np.ndarray) -> np.ndarray:
    """roughness <= 0 -> 0.0002 (open water), reference wind.py:288-290."""
    r = np.asarray(roughness, dtype=np.float64)
    return np.where(r <= 0.0, ROUGHNESS_FLOOR, r)


def log_ratio(v_from, h_to, h_from, roughness):
    """Logarithmic ratio law (reference wind.py:36-52; Andresen 2015
    eq. 2): ``v * log(h_to/z0) / log(h_from/z0)``."""
    z0 = np.asarray(roughness, dtype=np.float64)
    return np.asarray(v_from, dtype=np.float64) * (
        np.log(h_to / z0) / np.log(np.asarray(h_from, dtype=np.float64) / z0)
    )


def log_law(v_from, h_to, h_from, ustar, disph):
    """Logarithmic integration law (reference wind.py:55-69; Emeis
    2013): ``v + u*/k * log((h_to - disph)/h_from)``."""
    return np.asarray(v_from, dtype=np.float64) + (
        np.asarray(ustar, dtype=np.float64)
        / VONK
        * np.log(
            (h_to - np.asarray(disph, dtype=np.float64))
            / np.asarray(h_from, dtype=np.float64)
        )
    )


def psi_linear(z, L):
    """Linear stability correction (reference wind.py:73-89):
    0 for z/L <= 0, -5.2 * z/L otherwise."""
    a = z / np.asarray(L, dtype=np.float64)
    return np.where(a > 0.0, -5.2 * a, 0.0)


def _psi_exp_branch(a):
    A, B, C, D = 1.0, 2.0 / 3.0, 5.0, 0.35
    return -A * (a + B * (a - C / D) * np.exp(-D * a) + B * C / D)


def psi_linearexp(z, L):
    """Piecewise linear-exponential correction (reference
    wind.py:92-119; Emeis 2013 eq. 3.21): 0 for a<=0, -5a for
    0<a<=0.5, exponential branch above."""
    a = z / np.asarray(L, dtype=np.float64)
    out = np.zeros_like(a)
    mid = (a > 0.0) & (a <= 0.5)
    hi = a > 0.5
    out = np.where(mid, -5.0 * a, out)
    with np.errstate(over="ignore", invalid="ignore"):
        out = np.where(hi, _psi_exp_branch(a), out)
    return out


def psi_linearexpconst(z, L, const: float = 7.0):
    """Linear-exponential with constant plateau above ``const``
    (reference wind.py:122-153)."""
    a = z / np.asarray(L, dtype=np.float64)
    out = psi_linearexp(z, L)
    plateau = _psi_exp_branch(np.float64(const))
    return np.where(a > const, plateau, out)


def obukhov_length(tlml, ustar, rhoa, hflux, eflux):
    """Obukhov length via virtual-potential heat flux (reference
    wind.py:156-179)."""
    grav = 9.81
    CPD = 1004.0
    Le = 2.257e6
    kp = 2.0 / 7.0
    Rd = 287.0
    p0 = 1e5
    t = np.asarray(tlml, dtype=np.float64)
    us = np.asarray(ustar, dtype=np.float64)
    rho = np.asarray(rhoa, dtype=np.float64)
    p = rho * Rd * t
    vphflux = np.asarray(hflux, dtype=np.float64) + 0.61 * CPD / Le * t * (
        p0 / p
    ) ** kp * np.asarray(eflux, dtype=np.float64)
    return -(t * us**3 * CPD * rho) / (VONK * grav * vphflux)


def log_law_flux(v_from, h_to, h_from, ustar, disph, L, psi_fn=psi_linear):
    """Stability-corrected integration law (reference wind.py:190-214):
    ``v + u*/k * (log((h_to-disph)/h_from) - psi(h_to, L))``."""
    return np.asarray(v_from, dtype=np.float64) + np.asarray(
        ustar, dtype=np.float64
    ) / VONK * (
        np.log(
            (h_to - np.asarray(disph, dtype=np.float64))
            / np.asarray(h_from, dtype=np.float64)
        )
        - psi_fn(h_to, L)
    )


def winddir(ulml, vlml):
    """Wind direction with quadrant fixups (reference wind.py:182-187):
    degrees(arctan(u/v)); +180 when v<0; +360 when v>0 and u<0."""
    u = np.asarray(ulml, dtype=np.float64)
    v = np.asarray(vlml, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.degrees(np.arctan(u / v))
    d = np.where(v < 0, d + 180.0, d)
    d = np.where((v > 0) & (u < 0), d + 360.0, d)
    return d


def extrapolate_wind_speed(
    cols: dict,
    to_height: float,
    *,
    extrap: str = "log_ratio",
    from_height: float | None = None,
    var_height: str | None = None,
):
    """Column-level port of the reference dispatcher
    (wind.py:235-332): pick the source column (existing ``wnd{h}m`` /
    fixed ``from_height`` / variable-height suffix / nearest height),
    sanitize roughness, apply the law.

    ``cols``: dict of column name -> numpy array.  Returns
    ``(name, values)`` with name ``wnd{to_height}m``.
    """
    to_name = f"wnd{int(to_height)}m"
    if to_name in cols:
        return to_name, np.asarray(cols[to_name], dtype=np.float64)

    roughness = sanitize_roughness(cols["roughness"])

    if from_height is not None and var_height is not None:
        raise ValueError("pass only one of from_height / var_height")
    if from_height is not None:
        from_name = f"wnd{int(from_height)}m"
        h_from = np.full_like(roughness, float(from_height))
    elif var_height is not None:
        from_name = f"wnd{var_height}"
        h_from = np.asarray(cols[f"h{var_height}"], dtype=np.float64)
    else:
        heights = sorted(
            int(k[3:-1])
            for k in cols
            if k.startswith("wnd") and k.endswith("m") and k[3:-1].isdigit()
        )
        if not heights:
            raise ValueError("no wind speed column in input")
        nearest = min(heights, key=lambda h: abs(h - to_height))
        from_name = f"wnd{nearest}m"
        h_from = np.full_like(roughness, float(nearest))

    v_from = np.asarray(cols[from_name], dtype=np.float64)
    if extrap == "log_ratio":
        out = log_ratio(v_from, to_height, h_from, roughness)
    elif extrap == "log_law":
        out = log_law(v_from, to_height, h_from, cols["ustar"], cols["disph"])
    elif extrap in ("log_law_flux_linear", "log_law_flux_linearexp",
                    "log_law_flux_linearexpconst"):
        L = obukhov_length(
            cols["tlml"], cols["ustar"], cols["rhoa"], cols["hflux"],
            cols["eflux"],
        )
        psi = {
            "log_law_flux_linear": psi_linear,
            "log_law_flux_linearexp": psi_linearexp,
            "log_law_flux_linearexpconst": psi_linearexpconst,
        }[extrap]
        out = log_law_flux(
            v_from, to_height, h_from, cols["ustar"], cols["disph"], L, psi
        )
    else:
        raise ValueError(f"unknown extrapolation law {extrap}")
    return to_name, out
