"""Forty-ninth-wave tests: independent pandas brute force over the
sf0.001 parquet (retention half-life)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.mark.usefixtures("ray_session")
def test_retention_half_life_vs_pandas():
    from geodata_ray.pipelines.queries import retention_half_life_events

    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    day = ev.ts.dt.floor("D")
    s = ev.assign(day=day).groupby("user_id").day.agg(["min", "max"])
    total = len(s)
    days = sorted(set(s["min"]) | set(s["max"]))
    curve = [
        (d, (total - int((s["max"] <= d).sum())) * 1_000_000 // total)
        for d in days
    ]
    below = [(d, p) for d, p in curve if p < 500_000]
    got = retention_half_life_events(SF_DIR).to_pandas()
    if not below:
        assert len(got) == 0
        return
    d0, p0 = below[0]
    assert len(got) == 1
    r = got.iloc[0]
    assert pd.Timestamp(r.half_life_day) == d0
    assert int(r.surv_ppm_at) == p0
    assert int(r.n_days_observed) == len(days)
    # the half-life share really is below one half
    assert p0 < 500_000
