"""Thirty-second-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (PSI drift with an independent float cross-check,
histogram intersection)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_psi_vs_python():
    from geodata_ray.pipelines.queries import psi_value_drift_events
    from geodata_ray.stages.lm import qlog2_fixed

    ev = _t("events", ["ts", "value"])
    us = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    day = 86_400_000_000
    cut = ((int(us.min()) // day + int(us.max()) // day) // 2) * day
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    b = cents // 2048
    first = (us // day) * day < cut
    buckets = np.unique(b)
    na = {int(x): int(((b == x) & first).sum()) for x in buckets}
    nb = {int(x): int(((b == x) & ~first).sum()) for x in buckets}
    ta, tb = sum(na.values()), sum(nb.values())
    got = psi_value_drift_events(SF_DIR).to_pandas().set_index("bucket")
    assert len(got) == len(buckets)
    float_psi_q = 0.0
    for x in buckets:
        r = got.loc[int(x)]
        assert (int(r.n_a), int(r.n_b)) == (na[int(x)], nb[int(x)])
        if na[int(x)] and nb[int(x)]:
            xa, xb = na[int(x)] * tb, nb[int(x)] * ta
            dq = int(qlog2_fixed(np.array([xa], np.uint64))[0]) - int(
                qlog2_fixed(np.array([xb], np.uint64))[0])
            assert int(r.psi_term_q) == (xa - xb) * dq
            assert int(r.one_sided) == 0
            float_psi_q += (xa - xb) * (np.log2(xa) - np.log2(xb)) * 65536
        else:
            assert (int(r.psi_term_q), int(r.one_sided)) == (0, 1)
    # the fixed-point total tracks the float computation closely
    tot_q = int(got.psi_term_q.sum())
    assert tot_q >= 0
    if float_psi_q > 0:
        assert abs(tot_q - float_psi_q) / float_psi_q < 1e-3


@pytest.mark.usefixtures("ray_session")
def test_histogram_intersection_vs_python():
    from geodata_ray.pipelines.queries import (
        histogram_intersection_types_events,
    )

    ev = _t("events", ["event_type", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    ev = ev.assign(cents=cents)
    h = ev.groupby(["event_type", "cents"]).size()
    tot = ev.groupby("event_type").size().to_dict()
    types = sorted(tot)
    exp = {}
    for i, a in enumerate(types):
        ha = h[a]
        for bt in types[i + 1:]:
            hb = h[bt]
            common = ha.index.intersection(hb.index)
            inter = int(np.minimum(ha[common], hb[common]).sum())
            if inter:
                exp[(a, bt)] = inter
    got = histogram_intersection_types_events(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        inter = exp[(r.type_a, r.type_b)]
        assert int(r.inter) == inter
        assert int(r.sim_ppm) == inter * 1_000_000 // min(
            tot[r.type_a], tot[r.type_b])
        assert r.type_a < r.type_b
