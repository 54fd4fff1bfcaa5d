"""Thirty-first-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (survival curve, multi-touch attribution,
hierarchical share)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_survival_vs_pandas():
    from geodata_ray.pipelines.queries import user_lifetime_survival_events

    ev = _t("events", ["user_id", "ts"])
    day = ev.ts.dt.floor("D")
    s = ev.assign(day=day).groupby("user_id").day.agg(["min", "max"])
    total = len(s)
    days = sorted(set(s["min"]) | set(s["max"]))
    got = user_lifetime_survival_events(SF_DIR).to_pandas()
    assert list(pd.to_datetime(got.day)) == days
    for r in got.itertuples():
        d = pd.Timestamp(r.day)
        alive = int(((s["min"] <= d) & (s["max"] >= d)).sum())
        churn = int((s["max"] == d).sum())
        surv = (total - int((s["max"] <= d).sum())) * 1_000_000 // total
        assert (r.n_alive, r.n_churn, r.surv_ppm) == (alive, churn, surv)
    assert int(got.n_churn.sum()) == total
    assert int(got.surv_ppm.iloc[-1]) == 0


@pytest.mark.usefixtures("ray_session")
def test_multitouch_vs_pandas():
    from geodata_ray.pipelines.queries import multitouch_attribution_events

    ev = _t("events", ["user_id", "ts", "event_type"])
    us = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(us=us)
    pur = ev[ev.event_type == "purchase"]
    tou = ev[ev.event_type.isin(["view", "click"])]
    credit: dict[str, int] = {}
    ntouch: dict[str, int] = {}
    win = 86_400_000_000
    for p in pur.itertuples():
        w = tou[(tou.user_id == p.user_id)
                & (tou.us >= p.us - win) & (tou.us < p.us)]
        k = len(w)
        if k == 0:
            continue
        for ty in w.event_type:
            credit[ty] = credit.get(ty, 0) + 1_000_000 // k
            ntouch[ty] = ntouch.get(ty, 0) + 1
    got = multitouch_attribution_events(SF_DIR).to_pandas().set_index(
        "event_type")
    assert set(got.index) == set(credit)
    for ty in credit:
        assert int(got.loc[ty].credit_micro) == credit[ty]
        assert int(got.loc[ty].n_touches) == ntouch[ty]


@pytest.mark.usefixtures("ray_session")
def test_subtree_share_vs_python():
    from geodata_ray.pipelines.queries import subtree_share_parts

    p = _t("part", ["p_partkey", "p_retailprice"])
    cents = np.round(p.p_retailprice.to_numpy() * 100).astype(np.int64)
    roll: dict[int, int] = {}
    for k, c in zip(p.p_partkey, cents):
        node = int(k)
        while True:
            roll[node] = roll.get(node, 0) + int(c)
            if node == 0:
                break
            node //= 8
    got = subtree_share_parts(SF_DIR).to_pandas()
    assert len(got) == len(roll) - 1  # every node except the root
    for r in got.itertuples():
        assert r.parent == r.node // 8
        assert r.share_ppm == roll[r.node] * 1_000_000 // roll[r.parent]
    # each parent's children shares sum to <= 1e6 plus its own-value
    # remainder: just sanity-bound every share
    assert (got.share_ppm <= 1_000_000).all()
    assert (got.share_ppm > 0).all()
