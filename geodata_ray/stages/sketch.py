"""Mergeable sketches: approximate quantiles over a Dataset.

SURVEY.md A10: the reference has no sketches; at 10^12-row scale,
distribution statistics (for skew detection, bucketing, quality
thresholds) need a mergeable approximate structure.  This is the
classic weighted-sample quantile sketch: each batch emits k
equally-spaced order statistics weighted by batch_size/k; partials
merge by weighted-quantile compression.  One tiny row set per batch
moves — never the data.  Error is O(1/k) per level, deterministic
(no randomness; retries give identical results).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _compress(values: np.ndarray, weights: np.ndarray, k: int):
    """Weighted sample -> k equally-spaced weighted quantile points."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    w = weights[order].astype(np.float64)
    cum = np.cumsum(w)
    total = cum[-1]
    targets = (np.arange(k) + 0.5) / k * total
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.clip(idx, 0, v.shape[0] - 1)
    out_v = v[idx]
    out_w = np.full(k, total / k)
    return out_v, out_w


def approx_quantiles(ds, col: str, qs, *, k: int = 256) -> dict[float, float]:
    """Approximate quantiles of ``col`` (error ~1-2/k of rank)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return pa.table(
                {"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        kk = min(k, v.size)
        pv, pw = _compress(v, np.ones_like(v), kk)
        return pa.table({"v": pa.array(pv), "w": pa.array(pw)})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        if v.size == 0:
            return batch
        mv, mw = _compress(v, w, min(k, v.size))
        return pa.table({"v": pa.array(mv), "w": pa.array(mw)})

    # two-level tree merge: at 10^12-row scale per-batch sketches are
    # themselves numerous (blocks x k rows), so compress within 16
    # shards before the final single-block merge
    merged = (
        partials.repartition(16)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    df: pd.DataFrame = merged.to_pandas()
    v = df["v"].to_numpy()
    w = df["w"].to_numpy()
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = {}
    for q in qs:
        i = int(np.clip(np.searchsorted(cum, q * total), 0, v.shape[0] - 1))
        out[float(q)] = float(v[i])
    return out
