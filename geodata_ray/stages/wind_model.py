"""Wind profile models: per-cell regression fit + spline interpolation.

Ray-native re-expression of the reference's model subsystem:

- :func:`fit_extrapolation` mirrors ``WindExtrapolationModel._prepare_fn``
  (``model/wind/extrapolate.py:38-155``): per (ts, lat, lon) row, an
  ordinary least-squares fit of speed against log(height - disph) over
  the available measurement heights (u2m/u10m/u50m + lml), stored as
  ``alpha``/``beta`` param columns (+ sum of squared residuals).  The
  reference runs a numba triple loop per grid point; here the batched
  normal equations are closed-form numpy over the whole batch (2x2
  solve), so one vectorized ``map_batches`` replaces the JIT kernel.
- :func:`estimate_extrapolation` mirrors ``_estimate_dataset``
  (``extrapolate.py:157-193``): ``alpha * log((h - disph) /
  exp(-beta/alpha))``, with the real-data shortcut for h in {2,10,50}.
- :func:`fit_spline` / :func:`estimate_spline` mirror
  ``WindInterpolationModel`` (``model/wind/interpolate.py:59-257``):
  a not-a-knot cubic spline through the per-cell speeds at the ERA5
  model-level heights, evaluated at the query height.  scipy is absent
  in this environment, so the spline is solved directly (batched
  second-derivative system, np.linalg.solve over (N, K, K)) — the
  interpolant is identical to ``make_interp_spline(k=3)``.

Params flow as ordinary Arrow columns, so "model storage" is a parquet
table keyed (ts, lat, lon) and "estimate" is a vectorized map — or a
join when params and queries are produced separately (SURVEY.md J9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HEIGHTS = {"u50m": 50.0, "u10m": 10.0, "u2m": 2.0}  # model/wind/_base.py:51

# ERA5 L137 model-level heights (model/wind/interpolate.py:29-37)
LEVEL_TO_HEIGHT = {
    131: 169.5,
    132: 136.62,
    133: 106.54,
    134: 79.04,
    135: 53.92,
    136: 30.96,
    137: 10.0,
}


def _speeds_and_log_heights(cols: dict, compute_lml: bool = True):
    disph = np.asarray(cols["disph"], dtype=np.float64)
    names = [u for u in HEIGHTS if u in cols and u.replace("u", "v") in cols]
    hs = [np.full_like(disph, HEIGHTS[u]) - disph for u in names]
    vs = [
        np.sqrt(  # f64 sqrt form: bit-reproducible in the SQL oracle
            np.asarray(cols[u], dtype=np.float64) ** 2
            + np.asarray(cols[u.replace("u", "v")], dtype=np.float64) ** 2
        )
        for u in names
    ]
    if compute_lml and "ulml" in cols:
        hs.append(np.asarray(cols["hlml"], dtype=np.float64) - disph)
        vs.append(
            np.sqrt(
                np.asarray(cols["ulml"], dtype=np.float64) ** 2
                + np.asarray(cols["vlml"], dtype=np.float64) ** 2
            )
        )
    H = np.stack(hs, axis=-1)  # (N, k)
    V = np.abs(np.stack(vs, axis=-1))
    logH = np.where(H > 0, np.log(np.where(H > 0, H, 1.0)), -1.0)
    return logH, V


def fit_extrapolation_batch(batch: pa.Table, *, compute_lml: bool = True,
                            half_precision: bool = True) -> pa.Table:
    """alpha/beta per row: least squares of speed vs log-height.

    Closed-form 2x2 normal equations across the batch (the lstsq of
    ``extrapolate.py:61`` for a rank-2 design [log_h, 1])."""
    cols = {n: batch[n].to_numpy(zero_copy_only=False) for n in batch.schema.names}
    X, Y = _speeds_and_log_heights(cols, compute_lml)
    k = X.shape[-1]
    sx = X.sum(-1)
    sy = Y.sum(-1)
    sxx = (X * X).sum(-1)
    sxy = (X * Y).sum(-1)
    det = k * sxx - sx * sx
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = (k * sxy - sx * sy) / det
        beta = (sy - alpha * sx) / k
    resid = Y - (alpha[..., None] * X + beta[..., None])
    ssr = (resid * resid).sum(-1)
    dt = np.float32 if half_precision else np.float64
    return pa.table(
        {
            "ts": batch["ts"],
            "lat": batch["lat"],
            "lon": batch["lon"],
            "disph": batch["disph"],
            "alpha": pa.array(alpha.astype(dt)),
            "beta": pa.array(beta.astype(dt)),
            "ssr": pa.array(ssr.astype(dt)),
        }
    )


def fit_extrapolation(ds, **kw):
    import functools

    return ds.map_batches(
        functools.partial(fit_extrapolation_batch, **kw),
        batch_format="pyarrow",
    )


def estimate_extrapolation_batch(batch: pa.Table, *, height: float) -> pa.Table:
    """wnd estimate = alpha * log((h - disph)/exp(-beta/alpha))
    (extrapolate.py:189-193)."""
    alpha = batch["alpha"].to_numpy(zero_copy_only=False).astype(np.float64)
    beta = batch["beta"].to_numpy(zero_copy_only=False).astype(np.float64)
    disph = batch["disph"].to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        est = alpha * np.log((height - disph) / np.exp(-beta / alpha))
    return pa.table(
        {
            "ts": batch["ts"],
            "lat": batch["lat"],
            "lon": batch["lon"],
            f"wnd{int(height)}m_est": pa.array(est),
        }
    )


def estimate_extrapolation(params_ds, height: float, *, source_ds=None,
                           use_real_data: bool = False):
    """Evaluate the fitted params at ``height``.

    ``use_real_data`` shortcut (extrapolate.py:184-188): when the
    height is an observed level, return hypot(u,v) from ``source_ds``
    directly instead of the model."""
    import functools

    if use_real_data and float(height) in HEIGHTS.values():
        name = f"u{int(height)}m"

        def real(batch: pa.Table) -> pa.Table:
            u = batch[name].to_numpy(zero_copy_only=False).astype(np.float64)
            v = batch[name.replace("u", "v")].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "ts": batch["ts"],
                    "lat": batch["lat"],
                    "lon": batch["lon"],
                    f"wnd{int(height)}m_est": pa.array(
                        np.hypot(u, v.astype(np.float64))
                    ),
                }
            )

        return (source_ds or params_ds).map_batches(real, batch_format="pyarrow")
    return params_ds.map_batches(
        functools.partial(estimate_extrapolation_batch, height=height),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# not-a-knot cubic spline (interpolation model)
# ---------------------------------------------------------------------------


def _spline_second_derivatives(x: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Batched not-a-knot cubic-spline second derivatives.

    x: (K,) strictly increasing knots; Y: (N, K) values.
    Returns M: (N, K).  The interpolant equals scipy's
    ``make_interp_spline(k=3)`` / ``CubicSpline(bc_type='not-a-knot')``.
    """
    K = x.shape[0]
    h = np.diff(x)  # (K-1,)
    A = np.zeros((K, K))
    for i in range(1, K - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2.0 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
    # not-a-knot: third-derivative continuity at x1 and x_{K-2}
    A[0, 0] = h[1]
    A[0, 1] = -(h[0] + h[1])
    A[0, 2] = h[0]
    A[K - 1, K - 3] = h[K - 2]
    A[K - 1, K - 2] = -(h[K - 3] + h[K - 2])
    A[K - 1, K - 1] = h[K - 3]

    d = np.zeros((Y.shape[0], K))
    slopes = np.diff(Y, axis=1) / h  # (N, K-1)
    d[:, 1 : K - 1] = 6.0 * (slopes[:, 1:] - slopes[:, :-1])
    return np.linalg.solve(A[None, :, :], d[..., None])[..., 0]


def _spline_eval(x: np.ndarray, Y: np.ndarray, M: np.ndarray, xq: float):
    """Evaluate the per-row splines at scalar ``xq`` (extrapolates the
    end cubic beyond the knot range, like scipy BSpline)."""
    i = int(np.clip(np.searchsorted(x, xq) - 1, 0, x.shape[0] - 2))
    hi = x[i + 1] - x[i]
    a = (x[i + 1] - xq) / hi
    b = (xq - x[i]) / hi
    return (
        M[:, i] * (a**3 - a) * hi**2 / 6.0
        + M[:, i + 1] * (b**3 - b) * hi**2 / 6.0
        + Y[:, i] * a
        + Y[:, i + 1] * b
    )


_SPLINE_HEIGHTS = np.array(sorted(LEVEL_TO_HEIGHT.values()))


def fit_spline_batch(batch: pa.Table, *, heights=None) -> pa.Table:
    """Per-row spline through speeds at the model-level heights
    (columns ``wnd_h{height}``; interpolate.py:59-177).  Stores knots'
    values + second derivatives as list columns."""
    hs = np.asarray(heights if heights is not None else _SPLINE_HEIGHTS,
                    dtype=np.float64)
    cols = [f"wnd_h{h:g}" for h in hs]
    Y = np.stack(
        [
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols
        ],
        axis=-1,
    )
    M = _spline_second_derivatives(hs, Y)
    return pa.table(
        {
            "ts": batch["ts"],
            "lat": batch["lat"],
            "lon": batch["lon"],
            "y": pa.array(list(Y), type=pa.list_(pa.float64())),
            "m": pa.array(list(M), type=pa.list_(pa.float64())),
        }
    )


def fit_spline(ds, **kw):
    import functools

    return ds.map_batches(
        functools.partial(fit_spline_batch, **kw), batch_format="pyarrow"
    )


def estimate_spline(params_ds, height: float, *, heights=None):
    hs = np.asarray(heights if heights is not None else _SPLINE_HEIGHTS,
                    dtype=np.float64)

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        Y = (
            batch["y"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(n, -1)
        )
        M = (
            batch["m"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(n, -1)
        )
        est = _spline_eval(hs, Y, M, float(height))
        return pa.table(
            {
                "ts": batch["ts"],
                "lat": batch["lat"],
                "lon": batch["lon"],
                f"wnd{height:g}m_est": pa.array(est),
            }
        )

    return params_ds.map_batches(f, batch_format="pyarrow")
