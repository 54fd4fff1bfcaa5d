"""Thirty-ninth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (OLS residual outliers, Zipf log-log slope)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_residual_outliers_vs_python():
    from geodata_ray.pipelines.queries import (
        residual_outlier_days_types_events,
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
    c["x"] = (c.day - d0).dt.days.astype(int)
    got = residual_outlier_days_types_events(SF_DIR).to_pandas()
    for ty, g in c.groupby("event_type"):
        x = [int(v) for v in g.x]
        y = [int(v) for v in g.n]
        days = list(g.day)
        n = len(x)
        sx, sy = sum(x), sum(y)
        num = n * sum(a * b for a, b in zip(x, y)) - sx * sy
        den = n * sum(a * a for a in x) - sx * sx
        if den == 0:
            assert ty not in set(got.event_type)
            continue
        scored = sorted(
            (-abs(n * den * yy - den * sy - num * (n * xx - sx)),
             dd, n * den * yy - den * sy - num * (n * xx - sx))
            for xx, yy, dd in zip(x, y, days)
        )[:3]
        sub = got[got.event_type == ty].sort_values("rank")
        assert len(sub) == min(3, len(x))
        for (na, dd, res), r in zip(scored, sub.itertuples()):
            assert pd.Timestamp(r.day) == dd
            assert int(r.res_scaled) == res
        # residuals sum to ~0 over the full series (exact: they do)
        tot = sum(n * den * yy - den * sy - num * (n * xx - sx)
                  for xx, yy in zip(x, y))
        assert tot == 0


@pytest.mark.usefixtures("ray_session")
def test_zipf_slope_vs_python():
    from geodata_ray.pipelines.queries import (
        zipf_slope_docs,
        zipf_state_docs,
    )

    st = zipf_state_docs(SF_DIR).to_pandas()
    x = [int(v) for v in st.qlog2_rank_fp]
    y = [int(v) for v in st.qlog2_n_fp]
    n = len(x)
    sx, sy = sum(x), sum(y)
    num = n * sum(a * b for a, b in zip(x, y)) - sx * sy
    den = n * sum(a * a for a in x) - sx * sx
    slope = (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // den)
    got = zipf_slope_docs(SF_DIR).to_pandas().iloc[0]
    assert int(got.n_terms) == n
    assert (int(got.num), int(got.den)) == (num, den)
    assert int(got.slope_micro) == slope
    # frequency decreases with rank: the fitted slope is negative
    assert slope < 0
