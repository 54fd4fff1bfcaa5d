"""Presentation-prep aggregates: time-series and heatmap tables.

The reference's plotting module exposes data-prep entry points that
reduce a prepared cutout to plottable tables — a spatially-aggregated
time series (``ds_ts_aggregate``, /root/reference/src/geodata/plot.py:
35-131) and a time-aggregated lat/lon heatmap grid (the map-plot
inputs, plot.py:61-336).  Rendering itself is out of scope (no
plotting libraries in this environment); these produce the exact
tables a notebook would hand to matplotlib.

Both are thin two-phase grouped aggregates (partial combine inside
batches, tiny final shuffle) — bounded output regardless of input
scale (n_time_buckets rows / n_cells rows).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.stages.relational import grouped_aggregate


def time_series(ds, value_col: str, *, ts_col: str = "ts",
                freq: str = "day", agg: str = "mean"):
    """Spatially-aggregated time series: one row per time bucket with
    the mean (or sum) of ``value_col`` over all cells — the
    ``ds_ts_aggregate`` shape (plot.py:35-131)."""

    def prep(batch: pa.Table) -> pa.Table:
        bucket = pc.floor_temporal(batch[ts_col], unit=freq)
        v = pc.cast(batch[value_col], pa.float64())
        v = pc.if_else(pc.is_nan(v), pa.scalar(None, pa.float64()), v)
        return pa.table({"bucket": bucket, value_col: v})

    return grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["bucket"],
        [(value_col, agg, f"{value_col}_{agg}")],
    )


def heatmap_table(ds, value_col: str, *, agg: str = "mean"):
    """Time-aggregated lat/lon heatmap grid: one row per cell with the
    mean (or sum) of ``value_col`` over the whole period — the map-plot
    input table (plot.py:61-336)."""

    def prep(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[value_col], pa.float64())
        v = pc.if_else(pc.is_nan(v), pa.scalar(None, pa.float64()), v)
        return pa.table(
            {"lat": batch["lat"], "lon": batch["lon"], value_col: v}
        )

    return grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["lat", "lon"],
        [(value_col, agg, f"{value_col}_{agg}")],
    )
