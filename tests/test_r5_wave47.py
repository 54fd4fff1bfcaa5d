"""Forty-seventh-wave tests: independent pandas brute force over the
sf0.001 parquet (longest idle gaps, Markov conditional entropy)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _ev(cols):
    return pq.read_table(f"{SF_DIR}/events.parquet",
                         columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_longest_gaps_vs_pandas():
    from geodata_ray.pipelines.queries import longest_gaps_users_events

    ev = _ev(["user_id", "ts", "event_id"]).sort_values(
        ["user_id", "ts", "event_id"])
    u = ev.user_id.to_numpy()
    ts = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    same = u[1:] == u[:-1]
    rows = sorted(
        zip(-(ts[1:] - ts[:-1])[same], u[:-1][same], ts[:-1][same])
    )[:20]
    got = longest_gaps_users_events(SF_DIR).to_pandas()
    assert len(got) == 20
    for (neg_gap, uid, start), r in zip(rows, got.itertuples()):
        assert int(r.user_id) == uid
        assert int(r.gap_us) == -neg_gap
        assert int(pd.Timestamp(r.gap_start).value // 1000) == start
    assert (got["rank"].to_numpy() == np.arange(1, 21)).all()
    assert (np.diff(got.gap_us.to_numpy()) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_markov_conditional_entropy_vs_python():
    from geodata_ray.pipelines.queries import (
        markov_conditional_entropy_events,
    )
    from geodata_ray.stages.lm import qlog2_fixed

    ev = _ev(["user_id", "ts", "event_id", "event_type"]).sort_values(
        ["user_id", "ts", "event_id"])
    u = ev.user_id.to_numpy()
    ty = ev.event_type.to_numpy()
    same = u[1:] == u[:-1]
    pairs = list(zip(ty[:-1][same], ty[1:][same]))
    cnt: dict[tuple, int] = {}
    for p in pairs:
        cnt[p] = cnt.get(p, 0) + 1
    na: dict[str, int] = {}
    for (a, _b), c in cnt.items():
        na[a] = na.get(a, 0) + c

    def ql(c):
        return int(qlog2_fixed(np.array([c], np.uint64))[0])

    exp = sum(n * ql(n) for n in na.values()) - sum(
        c * ql(c) for c in cnt.values())
    got = markov_conditional_entropy_events(SF_DIR).to_pandas().iloc[0]
    assert int(got.n_transitions) == len(pairs)
    assert int(got.n_states) == len(na)
    assert int(got.h_cond_q) == exp
    # H(next|cur) is bounded by log2(#next states) per transition
    assert 0 <= exp <= len(pairs) * ql(len(na)) + len(pairs)
