"""Source normalizers: raw variable tables -> canonical schema.

Column-level ports of the reference's ``prepare_*`` functions — the
per-file normalization each weather source goes through before any
conversion (SURVEY.md M1-M9).  One vectorized ``map_batches`` per
source replaces the reference's per-month serial loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

G0 = 9.80665  # standard gravity (era5.py:314-329 _add_height)
JOULES_PER_WH_HOUR = 3600.0


def normalize_era5_batch(batch: pa.Table) -> pa.Table:
    """``prepare_month_era5`` semantics (era5.py:392-453):

    - height = z / g0 (geopotential -> meters);
    - albedo = ((ssrd - ssr) / ssrd) with NaN -> 0;
    - influx_diffuse = ssrd - fdir;
    - fluxes J m^-2 -> W m^-2 (/3600) with clip >= 0;
    - wnd100m = sqrt(u100^2 + v100^2);
    - renames to the canonical schema (fdir -> influx_direct, tisr ->
      influx_toa, ro -> runoff with clip >= 0, t2m -> temperature,
      sp -> pressure, stl4 -> soil_temperature, fsr -> roughness).
    """

    def col(n):
        return batch[n].to_numpy(zero_copy_only=False).astype(np.float64)

    out: dict[str, pa.Array] = {}
    for keep in ("ts", "lat", "lon"):
        if keep in batch.schema.names:
            out[keep] = batch[keep]

    if "z" in batch.schema.names:
        out["height"] = pa.array(col("z") / G0)

    ssrd = col("ssrd")
    ssr = col("ssr")
    fdir = col("fdir")
    with np.errstate(divide="ignore", invalid="ignore"):
        albedo = (ssrd - ssr) / ssrd
    out["albedo"] = pa.array(np.nan_to_num(albedo, nan=0.0))

    influx_direct = np.maximum(fdir, 0.0) / JOULES_PER_WH_HOUR
    influx_diffuse = np.maximum(ssrd - fdir, 0.0) / JOULES_PER_WH_HOUR
    influx_toa = np.maximum(col("tisr"), 0.0) / JOULES_PER_WH_HOUR
    out["influx_direct"] = pa.array(influx_direct)
    out["influx_diffuse"] = pa.array(influx_diffuse)
    out["influx_toa"] = pa.array(influx_toa)

    # f64 sqrt of squared sum (NOT np.hypot): IEEE sqrt is correctly
    # rounded, so the DuckDB oracle reproduces it bit-for-bit
    out["wnd100m"] = pa.array(np.sqrt(col("u100") ** 2 + col("v100") ** 2))
    out["runoff"] = pa.array(np.maximum(col("ro"), 0.0))
    out["temperature"] = pa.array(col("t2m"))
    out["pressure"] = pa.array(col("sp"))
    out["soil_temperature"] = pa.array(col("stl4"))
    out["roughness"] = pa.array(col("fsr"))
    return pa.table(out)


def normalize_merra2_flux_batch(batch: pa.Table) -> pa.Table:
    """``prepare_month_surface_flux`` semantics (merra2.py:208-241):
    z0m -> roughness, wndlml = sqrt(ulml^2 + vlml^2), tlml aliased to
    temperature; other flux variables pass through lower-cased."""

    def col(n):
        return batch[n].to_numpy(zero_copy_only=False).astype(np.float64)

    out: dict[str, pa.Array] = {}
    rename = {"z0m": "roughness", "tlml": "temperature"}
    for n in batch.schema.names:
        out[rename.get(n.lower(), n.lower())] = batch[n]
    if "tlml" in batch.schema.names:
        out["tlml"] = batch["tlml"]  # keep the raw name too (Obukhov)
    out["wndlml"] = pa.array(np.sqrt(col("ulml") ** 2 + col("vlml") ** 2))
    return pa.table(out)


def normalize_era5(ds):
    return ds.map_batches(normalize_era5_batch, batch_format="pyarrow")


def normalize_merra2_flux(ds):
    return ds.map_batches(normalize_merra2_flux_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# user-extension surface (SURVEY.md §2.10 U1-U3)
# ---------------------------------------------------------------------------


def compute_var(ds, fn, out_col: str, *, key_cols=("ts", "lat", "lon")):
    """Arbitrary user kernel over the variable table — the engine's
    ``compute_var`` hook (reference convert.py:386-406 U1/U3):
    ``fn(cols_dict) -> np.ndarray`` applied per batch, returned keyed
    by ``key_cols``."""

    def f(batch: pa.Table) -> pa.Table:
        cols = {
            n: batch[n].to_numpy(zero_copy_only=False)
            for n in batch.schema.names
        }
        out = {k: batch[k] for k in key_cols}
        out[out_col] = pa.array(np.asarray(fn(cols)))
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def get_var(ds, var: str, *, key_cols=("ts", "lat", "lon")):
    """Extract one raw variable (reference convert.py:363-383 U2)."""
    return ds.select_columns(list(key_cols) + [var])
