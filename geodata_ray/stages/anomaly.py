"""Grouped anomaly detection in exact integer arithmetic.

Reference parity: geodata's pre-analysis flags out-of-range cells
against per-variable statistics before conversion (the mask /
suitability flow); this generalizes that to per-key z-score outlier
flagging over any integer-valued column, with EXACT integer math so
the flag set is bit-identical across engines and parallelism levels.

The z-score test ``|x - mean| > k * std`` is evaluated without any
division or square root:

    mean = S / n              (rational)
    var  = (n*SS - S^2) / n^2 (rational)

    |x - mean| > k * std
    <=> (n*x - S)^2 > k^2 * (n*SS - S^2)        -- all integers

so a single integer comparison per row decides the flag.  Two passes:

  1. grouped moments (n, S, SS) via ``grouped_aggregate`` — partials
     pre-combined inside each batch, only one small row per key
     shuffles;
  2. join the moments back to the rows and filter vectorized.

Scale notes: the moments table has one row per distinct key.  The
default ``moments="broadcast"`` puts it in the object store once
(bounded by distinct-key count — fine for users/hosts/languages); for
~10^9 distinct keys pass ``moments="shuffle"`` to co-partition via the
native hash join instead.  Integer bound: the comparison needs
``k2 * (n*SS - S^2)`` (~``k2 * n^2 * max|x|^2``) inside int64 — with
2-decimal money values (|cents| <= ~5e4) that holds to ~2e4 rows per
key at k=3.  The flag stage PREDICTS the magnitude in float64 and
raises instead of wrapping; past the bound, rescale the values or
shard the sums (same bound family as the moment-matrix operator).

Null semantics: null values contribute to neither the moments nor the
output (SQL aggregate semantics — a null can never be an outlier).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.stages.relational import (
    broadcast_join,
    grouped_aggregate,
    native_join,
)

__all__ = ["grouped_zscore_outliers"]


def grouped_zscore_outliers(
    ds,
    key_col: str,
    value_col: str,
    *,
    k2: int = 9,
    min_n: int = 8,
    carry_cols: Sequence[str] | None = None,
    moments: str = "broadcast",
):
    """Rows whose integer ``value_col`` deviates from its key's mean by
    more than ``sqrt(k2)`` standard deviations (population std), among
    keys with at least ``min_n`` rows.  Exact: no row's flag depends on
    float rounding or accumulation order.

    ``carry_cols`` are passed through to the output alongside
    ``key_col`` and ``value_col``.
    """
    if k2 <= 0 or min_n < 2:
        raise ValueError("k2 must be positive and min_n >= 2")
    if moments not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown moments mode {moments!r}")
    carry = list(carry_cols or [])

    def prep(batch: pa.Table) -> pa.Table:
        x = batch[value_col]
        if not pa.types.is_integer(x.type):
            raise TypeError(
                f"{value_col} must be integer-valued (scale floats to "
                f"fixed point first); got {x.type}"
            )
        if x.null_count:  # nulls join neither the moments nor the output
            batch = batch.filter(pc.is_valid(x))
            x = batch[value_col]
        xv = x.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # isqrt(2^63-1): any |x| above this wraps x*x in int64, and the
        # downstream float64 overflow predictor would then operate on an
        # already-corrupted SS — refuse here so SS is always exact.
        if xv.size and int(np.abs(xv).max()) > 3_037_000_499:
            raise OverflowError(
                f"{value_col} magnitude exceeds isqrt(int64 max); "
                "x*x would wrap — rescale the fixed-point input"
            )
        cols = {key_col: batch[key_col]}
        for c in carry:
            cols[c] = batch[c]
        cols[value_col] = pa.array(xv, pa.int64())
        cols["__xx"] = pa.array(xv * xv, pa.int64())
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    mom = grouped_aggregate(
        prepped,
        [key_col],
        [
            (value_col, "count", "__n"),
            (value_col, "sum", "__s"),
            ("__xx", "sum", "__ss"),
        ],
    )

    rows = prepped.drop_columns(["__xx"])
    if moments == "broadcast":
        import ray

        mom_tbl = pa.concat_tables(
            ray.get(mom.to_arrow_refs()), promote_options="default"
        )
        joined = broadcast_join(rows, mom_tbl, [key_col])
    else:
        joined = native_join(rows, mom, [key_col])

    def flag(batch: pa.Table) -> pa.Table:
        n = batch["__n"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = batch["__s"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ss = batch["__ss"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = batch[value_col].to_numpy(zero_copy_only=False)
        # predict the magnitudes in float64 and refuse to wrap: the
        # exact test needs k2*(n*SS - S^2) and (n*x - S)^2 inside int64
        nf, sf, ssf, xf = (a.astype(np.float64) for a in (n, s, ss, x))
        bound = 4.0e18
        if len(n) and max(
            float(np.max(np.abs(k2 * (nf * ssf - sf * sf)), initial=0.0)),
            float(np.max((nf * xf - sf) ** 2, initial=0.0)),
        ) > bound:
            raise OverflowError(
                "z-score comparison would exceed int64: rescale "
                f"{value_col} or shard the per-key sums (see docstring)"
            )
        dev = n * x - s
        keep = (n >= min_n) & (dev * dev > k2 * (n * ss - s * s))
        out = batch.select([key_col, *carry, value_col]).filter(
            pa.array(keep)
        )
        return out

    return joined.map_batches(flag, batch_format="pyarrow")
