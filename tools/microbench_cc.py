"""Microbench: run-based vectorized CC labeling vs the per-pixel
union-find reference (VERDICT r2 item 1).  Prints one JSON line; the
numbers land in BASELINE.md "Measured (round 3)".

Usage: python tools/microbench_cc.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from geodata_ray.stages.raster import _label_components, _union_find_labels


def run(name: str, dens: float, shape: tuple[int, int], out: dict) -> None:
    rng = np.random.default_rng(0)
    occ = rng.random(shape) < dens
    rows, cols = np.nonzero(occ)
    rows = rows.astype(np.int64)
    cols = cols.astype(np.int64)
    _label_components(rows[:1000], cols[:1000], shape[1])  # warm
    t0 = time.perf_counter()
    lab_new = _label_components(rows, cols, shape[1])
    t_new = time.perf_counter() - t0
    t0 = time.perf_counter()
    roots = _union_find_labels(rows, cols)
    t_old = time.perf_counter() - t0
    pid = rows * shape[1] + cols
    lab_old = pd.Series(pid).groupby(roots).transform("min").to_numpy()
    assert np.array_equal(lab_old, lab_new), name
    out[name] = {
        "pixels": int(rows.size),
        "per_pixel_sec": round(t_old, 3),
        "run_based_sec": round(t_new, 3),
        "speedup": round(t_old / t_new, 1),
    }


def main() -> None:
    out: dict = {}
    run("dense_blob_99pct_1m_px", 0.99, (1000, 1000), out)
    run("speckle_72pct_1m_px", 0.72, (1000, 1400), out)
    run("sparse_30pct_1m2_px", 0.30, (2000, 2000), out)
    print(json.dumps({"metric": "cc labeling microbench", "cases": out}))


if __name__ == "__main__":
    main()
