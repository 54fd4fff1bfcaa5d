"""Thirty-fifth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (sorted-neighborhood pairs — including a
forced-multi-block run that exercises the cross-junction stitch — and
per-type OLS trend slopes)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


def _expected_snm_pairs():
    c = _t("customer", ["c_custkey", "c_acctbal"])
    cents = np.round(c.c_acctbal.to_numpy() * 100).astype(np.int64)
    key = c.c_custkey.to_numpy().astype(np.int64)
    order = np.lexsort((key, cents))
    cents, key = cents[order], key[order]
    exp = set()
    n = cents.size
    for i in range(n):
        for d in range(1, 5):
            if i + d >= n:
                break
            diff = int(cents[i + d] - cents[i])
            if diff <= 10:
                exp.add((int(key[i]), int(key[i + d]), diff))
    return exp


@pytest.mark.usefixtures("ray_session")
def test_snm_pairs_vs_python():
    from geodata_ray.pipelines.queries import snm_pairs_customers

    exp = _expected_snm_pairs()
    got = snm_pairs_customers(SF_DIR).to_pandas()
    assert {(r.key_a, r.key_b, r.diff_cents)
            for r in got.itertuples()} == exp


@pytest.mark.usefixtures("ray_session")
def test_snm_pairs_multiblock_junctions():
    """Force tiny sort blocks so the pair set must cross block
    junctions — the stitched result must be identical."""
    from ray.data import DataContext

    from geodata_ray.pipelines.queries import snm_pairs_customers

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 4096  # ~hundreds of rows per block
        got = snm_pairs_customers(SF_DIR).to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert {(r.key_a, r.key_b, r.diff_cents)
            for r in got.itertuples()} == _expected_snm_pairs()


@pytest.mark.usefixtures("ray_session")
def test_trend_slope_vs_python():
    from geodata_ray.pipelines.queries import (
        daily_trend_slope_types_events,
    )

    ev = _t("events", ["ts", "event_type"])
    c = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .rename("n")
        .reset_index()
    )
    d0 = c.day.min()
    c["x"] = ((c.day - d0).dt.days).astype(int)
    got = daily_trend_slope_types_events(SF_DIR).to_pandas().set_index(
        "event_type")
    for ty, g in c.groupby("event_type"):
        x = [int(v) for v in g.x]
        y = [int(v) for v in g.n]
        n = len(x)
        sx, sy = sum(x), sum(y)
        num = n * sum(a * b for a, b in zip(x, y)) - sx * sy
        den = n * sum(a * a for a in x) - sx * sx
        slope = 0 if den == 0 else (
            (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // den)
        )
        r = got.loc[ty]
        assert (int(r.n_days), int(r.num), int(r.den)) == (n, num, den)
        assert int(r.slope_micro) == slope
        # floor-micro tracks the float OLS slope
        if den:
            assert abs(slope / 1e6 - num / den) < 1e-5
