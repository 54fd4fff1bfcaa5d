"""Point-in-polygon primitives (leaf module — no stage imports).

Lives in cellmath so both the projection helpers and the spatial-join
stage can use it without a circular import chain.
"""

from __future__ import annotations

import numpy as np


def ring_crosses_am(xs: np.ndarray) -> bool:
    """True when consecutive ring lons jump > 180 deg (wrapped)."""
    return bool((np.abs(np.diff(xs)) > 180.0).any())


def pip_crossing(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    """Vectorized crossing-number test: points (px, py) vs closed ring
    (xs, ys).  O(V) passes over the point vector."""
    inside = np.zeros(px.shape[0], dtype=bool)
    x1, y1 = xs[:-1], ys[:-1]
    x2, y2 = xs[1:], ys[1:]
    for k in range(x1.shape[0]):
        a, b = y1[k], y2[k]
        if a == b:
            continue
        straddle = (a > py) != (b > py)
        with np.errstate(invalid="ignore", divide="ignore"):
            xint = (x2[k] - x1[k]) * (py - a) / (b - a) + x1[k]
        inside ^= straddle & (px < xint)
    return inside
