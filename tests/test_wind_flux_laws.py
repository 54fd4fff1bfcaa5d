"""Stability-corrected wind laws (M20) + soil temperature (M11)."""

import numpy as np
import pytest

from geodata_ray.functions import convert as C
from geodata_ray.functions import wind as W
from geodata_ray.pipelines import conversions as P
from geodata_ray.sources.synth import grid_table


def test_psi_piecewise_branches():
    L = np.array([100.0, 100.0, 100.0, -50.0, 1.0])
    z = np.array([10.0, 60.0, 400.0, 10.0, 10.0])
    a = z / L  # 0.1, 0.6, 4.0, -0.2, 10.0
    lin = W.psi_linear(z, L)
    assert lin[3] == 0.0  # unstable -> 0
    np.testing.assert_allclose(lin[0], -5.2 * 0.1)
    le = W.psi_linearexp(z, L)
    assert le[3] == 0.0
    np.testing.assert_allclose(le[0], -5.0 * 0.1)  # linear branch
    # exponential branch independent evaluation
    A, B, Cc, D = 1.0, 2.0 / 3.0, 5.0, 0.35
    want = -A * (0.6 + B * (0.6 - Cc / D) * np.exp(-D * 0.6) + B * Cc / D)
    np.testing.assert_allclose(le[1], want)
    # plateau: const = 7 caps the correction
    lec = W.psi_linearexpconst(z, L, const=7.0)
    plateau = -A * (7.0 + B * (7.0 - Cc / D) * np.exp(-D * 7.0) + B * Cc / D)
    np.testing.assert_allclose(lec[4], plateau)
    np.testing.assert_allclose(lec[:3], le[:3])  # below const unchanged


def test_obukhov_length_signs():
    """Positive virtual heat flux (unstable) -> negative L; negative
    flux (stable) -> positive L (reference wind.py:156-179)."""
    t = np.array([290.0, 290.0])
    us = np.array([0.4, 0.4])
    rho = np.array([1.2, 1.2])
    hf = np.array([200.0, -80.0])
    ef = np.array([50.0, -10.0])
    L = W.obukhov_length(t, us, rho, hf, ef)
    assert L[0] < 0 < L[1]


@pytest.mark.usefixtures("ray_session")
def test_windspd_flux_law_pipeline_golden():
    grid = grid_table(hours=24, ny=4, nx=4)
    ds = P.windspd(
        P._from(grid), hub_height=80.0,
        extrap="log_law_flux_linearexpconst", var_height="lml",
    )
    got = (
        ds.to_pandas()
        .sort_values(["ts", "lat", "lon"], ignore_index=True)["wnd80m"]
        .to_numpy()
    )
    r = grid.to_pandas().sort_values(["ts", "lat", "lon"], ignore_index=True)
    L = W.obukhov_length(
        r.tlml.to_numpy(), r.ustar.to_numpy(), r.rhoa.to_numpy(),
        r.hflux.to_numpy(), r.eflux.to_numpy(),
    )
    want = W.log_law_flux(
        r.wndlml.to_numpy(), 80.0, r.hlml.to_numpy(), r.ustar.to_numpy(),
        r.disph.to_numpy(), L, W.psi_linearexpconst,
    )
    np.testing.assert_array_equal(got, want)
    assert np.isfinite(got).all()


def test_soil_temperature_fillna():
    t = np.array([280.0, np.nan, 300.0], dtype=np.float64)
    out = C.convert_soil_temperature({"soil_temperature": t})
    np.testing.assert_allclose(out, [280.0 - 273.15, 0.0, 300.0 - 273.15])
