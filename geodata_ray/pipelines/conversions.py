"""Dataset-level conversion pipelines over the long-form grid table.

The reference's ``cutout.convert_cutout`` gateway (cutout.py:509-564)
runs a serial per-month loop applying a conversion function; here each
conversion is one fused vectorized ``map_batches`` over the grid table
(SURVEY.md §3.3), except heat demand whose daily mean is a grouped
aggregate (M16/A1 — the reference's only shuffle-shaped conversion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.functions import convert as C


def grid_source(**kwargs):
    """Synthetic grid table as a Dataset (FIXTURES.md F3)."""
    from geodata_ray.sources.synth import grid_table

    return _from(grid_table(**kwargs))


def _from(table: pa.Table):
    """Arrow table -> multi-block Dataset (so tests exercise batch
    splits)."""
    import ray.data as rd

    return rd.from_arrow(table).repartition(8)


def normalize_winds_batch(batch: pa.Table) -> pa.Table:
    """Derive wind-speed columns from components: wnd{h}m =
    sqrt(u^2 + v^2) — the reference's surface-flux normalizer
    (datasets/merra2.py:208-241 M4; datasets/era5.py:392-453 M7).

    Computed as a float64 sqrt of the squared sum (NOT np.hypot): IEEE
    sqrt is correctly rounded in every engine, so the identical
    expression tree in DuckDB (``CAST(sqrt(u*u + v*v) AS REAL)``)
    reproduces these float32 speeds bit-for-bit — np.hypot's scaling
    algorithm (and its float32 inner loop) has no SQL equivalent."""
    for h in ("2m", "10m", "50m"):
        u = batch[f"u{h}"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = batch[f"v{h}"].to_numpy(zero_copy_only=False).astype(np.float64)
        batch = batch.append_column(
            f"wnd{h}", pa.array(np.sqrt(u * u + v * v).astype(np.float32))
        )
    return batch


def _cols(batch: pa.Table) -> dict:
    return {
        name: batch[name].to_numpy(zero_copy_only=False)
        for name in batch.schema.names
    }


def _keyed(batch: pa.Table, values: np.ndarray, out_col: str) -> pa.Table:
    return pa.table(
        {
            "ts": batch["ts"],
            "lat": batch["lat"],
            "lon": batch["lon"],
            out_col: pa.array(np.asarray(values, dtype=np.float64)),
        }
    )


def _kernel_pipeline(ds, kernel, out_col: str, *, normalize=True, **kw):
    def f(batch: pa.Table) -> pa.Table:
        if normalize:
            batch = normalize_winds_batch(batch)
        return _keyed(batch, kernel(_cols(batch), **kw), out_col)

    return ds.map_batches(f, batch_format="pyarrow")


def temperature(ds):
    return _kernel_pipeline(
        ds, C.convert_temperature, "temperature_c", normalize=False
    )


def pm25(ds):
    return _kernel_pipeline(ds, C.convert_pm25, "pm25", normalize=False)


def windspd(ds, hub_height: float = 80.0, **kw):
    return _kernel_pipeline(ds, C.convert_windspd, f"wnd{int(hub_height)}m",
                            hub_height=hub_height, **kw)


def windwpd(ds, hub_height: float = 80.0, **kw):
    return _kernel_pipeline(ds, C.convert_windwpd, "wpd",
                            hub_height=hub_height, **kw)


def wind_power(ds, turbine: str | dict = "fixture_1500kw", smooth=False, **kw):
    t = C.TURBINES[turbine] if isinstance(turbine, str) else turbine
    if smooth:
        t = C.windturbine_smooth(t, smooth if isinstance(smooth, dict) else None)
    return _kernel_pipeline(ds, C.convert_wind, "capacity_factor", turbine=t, **kw)


def winddir(ds):
    from geodata_ray.functions.wind import winddir as wd

    return _kernel_pipeline(
        ds, lambda cols: wd(cols["ulml"], cols["vlml"]), "winddir",
        normalize=False,
    )


def pv(ds, panel: str | dict = "fixture_huld", orientation=None, **kw):
    p = C.PANELS[panel] if isinstance(panel, str) else panel
    orientation = orientation or {"slope": 30.0, "azimuth": 180.0}
    return _kernel_pipeline(
        ds, C.convert_pv, "pv_power", normalize=False, panel=p,
        orientation=orientation, **kw,
    )


def solar_thermal(ds, orientation=None, **kw):
    orientation = orientation or {"slope": 45.0, "azimuth": 180.0}
    return _kernel_pipeline(
        ds, C.convert_solar_thermal, "solar_thermal", normalize=False,
        orientation=orientation, **kw,
    )


def heat_demand(
    ds,
    *,
    threshold: float = 15.0,
    a: float = 1.0,
    constant: float = 0.0,
    hour_shift: float = 0.0,
):
    """Degree-day heat demand (reference convert.py:146-157 M16):
    shift time, daily-mean temperature per cell (grouped aggregate —
    the shuffle), then the clipped linear formula."""
    shift_us = int(hour_shift * 3600 * 1e6)

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.add(batch["ts"], pa.scalar(shift_us, pa.duration("us")))
        day = pc.floor_temporal(ts, unit="day")
        t = pc.cast(batch["temperature"], pa.float64())
        # NaN -> null so the grouped mean skips sea cells exactly like
        # xarray's skipna resample (reference convert.py:151)
        t = pc.if_else(pc.is_nan(t), pa.scalar(None, pa.float64()), t)
        return pa.table(
            {
                "day": day,
                "lat": batch["lat"],
                "lon": batch["lon"],
                "temperature": t,
            }
        )

    from geodata_ray.stages.relational import grouped_aggregate

    daily = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["lat", "lon", "day"],
        [("temperature", "mean", "t_daily")],
    )

    def formula(batch: pa.Table) -> pa.Table:
        hd = C.heat_demand_from_daily_mean(
            batch["t_daily"].to_numpy(zero_copy_only=False),
            threshold=threshold, a=a, constant=constant,
        )
        return pa.table(
            {
                "lat": batch["lat"],
                "lon": batch["lon"],
                "day": batch["day"],
                "heat_demand": pa.array(hd),
            }
        )

    return daily.map_batches(formula, batch_format="pyarrow")
