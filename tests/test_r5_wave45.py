"""Forty-fifth-wave tests: independent pandas brute force over the
sf0.001 parquet (breadth histogram, per-user type entropy)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _ev():
    return pq.read_table(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "event_type"]).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_user_breadth_histogram_vs_pandas():
    from geodata_ray.pipelines.queries import (
        user_breadth_histogram_events,
    )

    ev = _ev()
    k = ev.groupby("user_id").event_type.nunique()
    exp = k.value_counts().sort_index()
    got = (
        user_breadth_histogram_events(SF_DIR)
        .to_pandas()
        .set_index("k_types")
        .sort_index()
    )
    assert len(got) == len(exp)
    assert (got.n_users.to_numpy() == exp.to_numpy()).all()
    assert int(got.n_users.sum()) == ev.user_id.nunique()


@pytest.mark.usefixtures("ray_session")
def test_user_type_entropy_vs_python():
    from geodata_ray.pipelines.queries import user_type_entropy_events
    from geodata_ray.stages.lm import qlog2_fixed

    ev = _ev()

    def ql(c):
        return int(qlog2_fixed(np.array([c], np.uint64))[0])

    got = user_type_entropy_events(SF_DIR).to_pandas().set_index(
        "user_id")
    assert len(got) == ev.user_id.nunique()
    for uid, g in ev.groupby("user_id"):
        cnts = g.event_type.value_counts()
        n = int(cnts.sum())
        ent = n * ql(n) - sum(int(c) * ql(int(c)) for c in cnts)
        r = got.loc[uid]
        assert (int(r.n_events), int(r.entropy_q)) == (n, ent)
        # scaled entropy is bounded by n * log2(#types observed)
        assert 0 <= ent <= n * ql(len(cnts)) + n
