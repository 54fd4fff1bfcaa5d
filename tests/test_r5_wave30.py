"""Thirtieth-wave tests: independent pandas/numpy brute force over the
sf0.001 parquet (recency decay, trending ranks, MLM mask plan)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

U64 = 1 << 64


def _sm64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) % U64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % U64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % U64
    return x ^ (x >> 31)


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_recency_decay_vs_pandas():
    from geodata_ray.pipelines.queries import recency_decay_types_events

    ev = _t("events", ["ts", "event_type", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    day = ev.ts.dt.floor("D")
    age = ((day.max() - day).dt.days).to_numpy().astype(np.int64)
    dec = cents >> np.minimum(age, 62)
    got = recency_decay_types_events(SF_DIR).to_pandas().set_index(
        "event_type")
    for ty in ev.event_type.unique():
        m = (ev.event_type == ty).to_numpy()
        r = got.loc[ty]
        assert int(r.n) == int(m.sum())
        assert int(r.raw_cents) == int(cents[m].sum())
        assert int(r.decayed_cents) == int(dec[m].sum())
    # decay never increases a value
    assert (got.decayed_cents <= got.raw_cents).all()


@pytest.mark.usefixtures("ray_session")
def test_trending_vs_pandas():
    from geodata_ray.pipelines.queries import trending_types_daily_events

    ev = _t("events", ["ts", "event_type"])
    c = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .rename("n")
        .reset_index()
    )
    c["rank"] = (
        c.sort_values(["n", "event_type"], ascending=[False, True])
        .groupby("day")
        .cumcount()
        + 1
    )
    rk = {(d, t): r for d, t, r in zip(c.day, c.event_type, c["rank"])}
    got = trending_types_daily_events(SF_DIR).to_pandas()
    assert len(got) == len(c)
    one_day = pd.Timedelta(days=1)
    for r in got.itertuples():
        day = pd.Timestamp(r.day)
        assert rk[(day, r.event_type)] == r.rank
        prev = rk.get((day - one_day, r.event_type), 0)
        assert r.prev_rank == prev
        assert r.delta == prev - r.rank


@pytest.mark.usefixtures("ray_session")
def test_mlm_mask_plan_vs_python():
    from geodata_ray.pipelines.queries import mlm_mask_plan_docs

    d = _t("documents", ["doc_id", "text"])
    got = mlm_mask_plan_docs(SF_DIR).to_pandas().set_index("doc_id")
    assert len(got) == len(d)
    frac = []
    for did, txt in zip(d.doc_id, d.text):
        toks = (txt or "").lower().split(" ")
        nm = sum(
            1 for i in range(1, len(toks) + 1)
            if _sm64(int(did) * 1048576 + i) % 100 < 15
        )
        r = got.loc[did]
        assert (int(r.n_tokens), int(r.n_masked)) == (len(toks), nm)
        frac.append(nm / len(toks))
    # the schedule is ~15% overall
    assert 0.10 < float(np.mean(frac)) < 0.20
