"""Thirty-sixth-wave tests: independent pandas brute force over the
sf0.001 parquet (sliding ROWS-4-PRECEDING max, unpivot round trip)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_sliding_max_vs_pandas():
    from geodata_ray.pipelines.queries import sliding_max_user_values

    ev = _t("events", ["user_id", "ts", "event_id", "value"])
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    exp = (
        ev.groupby("user_id").cents
        .rolling(5, min_periods=1).max()
        .reset_index(level=0, drop=True)
        .astype(np.int64)
    )
    ev["max5"] = exp
    got = sliding_max_user_values(SF_DIR).to_pandas().set_index(
        "event_id")
    assert len(got) == len(ev)
    ev = ev.set_index("event_id")
    assert (got.cents == ev.cents).all()
    assert (got.max5 == ev.max5).all()
    # the window max is never below the row's own value
    assert (got.max5 >= got.cents).all()


@pytest.mark.usefixtures("ray_session")
def test_unpivot_roundtrip_vs_pandas():
    from geodata_ray.pipelines.queries import unpivot_daily_types_events

    ev = _t("events", ["ts", "event_type"])
    exp = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    got = (
        unpivot_daily_types_events(SF_DIR)
        .to_pandas()
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got.day.to_numpy().astype("datetime64[us]")
            == exp.day.to_numpy().astype("datetime64[us]")).all()
    assert (got.event_type == exp.event_type).all()
    assert (got.n.astype(int) == exp.n.astype(int)).all()
