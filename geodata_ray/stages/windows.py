"""Event-time windowing over batch datasets.

The reference is strictly batch (SURVEY.md §2.9) — its only temporal
operator is the daily-mean resample (``convert.py:151``).  Stream-shaped
inputs (the ``events`` table) get the standard batch expressions:

- tumbling windows: key = floor(ts / size) -> two-phase grouped agg
  (no per-row shuffle);
- session windows: gaps-and-islands per key — ``groupby(key)``
  ``map_groups`` over the ts-sorted group.  Partition key is the
  session key, so one shuffle; skewed keys can be salted only for
  aggregates, not sessions (a session must see all its rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.stages.relational import grouped_aggregate


def tumbling_counts(ds, *, key_col: str, ts_col: str = "ts", unit: str = "hour",
                    value_col: str | None = None):
    """Per-(key, window) counts (+ sum of ``value_col`` if given)."""

    def prep(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch[ts_col], unit=unit)
        cols = {key_col: batch[key_col], "window": win}
        if value_col:
            cols[value_col] = batch[value_col]
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    specs = [(key_col, "count", "n_events")]
    if value_col:
        specs.append((value_col, "sum", f"sum_{value_col}"))
    return grouped_aggregate(prepped, [key_col, "window"], specs)


def sliding_counts(ds, *, key_col: str, ts_col: str = "ts",
                   window_hours: int = 2, slide_hours: int = 1,
                   value_col: str | None = None):
    """Sliding (hopping) windows: each event replicates into the
    ``window/slide`` windows containing it (flat-map inside
    map_batches), then the standard two-phase grouped aggregate —
    overlap factor bounds the replication, never a per-row shuffle."""
    if window_hours % slide_hours != 0:
        raise ValueError(
            f"window_hours ({window_hours}) must be a multiple of "
            f"slide_hours ({slide_hours}) — otherwise events near hop "
            "boundaries would be silently dropped from covering windows"
        )
    n_windows = window_hours // slide_hours
    slide_us = slide_hours * 3600 * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        # align to SLIDE multiples, not plain hours: with slide>1 an
        # hour-floored base would put events of the same hop under
        # different window_start keys
        base = pc.floor_temporal(
            batch[ts_col], multiple=slide_hours, unit="hour"
        )
        tables = []
        for k in range(n_windows):
            off = pa.scalar(k * slide_us, pa.duration("us"))
            cols = {
                key_col: batch[key_col],
                "window_start": pc.subtract(base, off),
            }
            if value_col:
                cols[value_col] = batch[value_col]
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    specs = [(key_col, "count", "n_events")]
    if value_col:
        specs.append((value_col, "sum", f"sum_{value_col}"))
    return grouped_aggregate(exploded, [key_col, "window_start"], specs)


def session_windows(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    gap_minutes: int = 30):
    """Sessionization: per key, consecutive events within
    ``gap_minutes`` belong to one session.  Output one row per session:
    (key, session_start, session_end, n_events)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, ignore_index=True)
        ts = g[ts_col].to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = (
            g.assign(__sid=sid)
            .groupby("__sid", sort=True)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
