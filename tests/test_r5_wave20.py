"""Twentieth-wave tests: independent pandas/numpy brute force over the
sf0.001 parquet, plus a reference-implementation check of the Hilbert
curve against its defining properties."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


def _hilbert_scalar(x, y, order=15):
    """Textbook scalar xy2d (Wikipedia formulation) — the independent
    reference for the vectorized implementation."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_xy2d_properties():
    from geodata_ray.pipelines.queries import hilbert_xy2d

    rng = np.random.default_rng(7)
    x = rng.integers(0, 32768, 500).astype(np.int64)
    y = rng.integers(0, 32768, 500).astype(np.int64)
    got = hilbert_xy2d(x, y, 15)
    exp = np.array([_hilbert_scalar(int(a), int(b)) for a, b in zip(x, y)])
    assert (got == exp).all()
    # bijectivity on a small full grid (order 4: 16x16)
    gx, gy = np.meshgrid(np.arange(16), np.arange(16))
    d = hilbert_xy2d(gx.ravel().astype(np.int64),
                     gy.ravel().astype(np.int64), 4)
    assert sorted(d.tolist()) == list(range(256))
    # unit-step continuity along the curve (the Hilbert property
    # Z-order lacks)
    order = np.argsort(d)
    xs, ys = gx.ravel()[order], gy.ravel()[order]
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all()


@pytest.mark.usefixtures("ray_session")
def test_hilbert_rank_events_vs_scalar():
    from geodata_ray.pipelines.queries import (
        _derive_lat_np,
        _derive_lon_np,
        hilbert_rank_events,
    )

    got = hilbert_rank_events(SF_DIR).to_pandas()
    ids = got.event_id.to_numpy()
    lat, lon = _derive_lat_np(ids), _derive_lon_np(ids)
    qy = np.floor((lat + 90.0) / 180.0 * 32768.0).astype(np.int64)
    qx = np.floor((lon + 180.0) / 360.0 * 32768.0).astype(np.int64)
    exp = np.array([_hilbert_scalar(int(a), int(b))
                    for a, b in zip(qx[:200], qy[:200])])
    assert (got.hkey.to_numpy()[:200] == exp).all()
    assert len(got) == len(_t("events", ["event_id"]))


@pytest.mark.usefixtures("ray_session")
def test_pseudonymize_vs_numpy():
    from geodata_ray.pipelines.queries import (
        _PSEUDO_SEED,
        pseudonymize_users_events,
    )
    from geodata_ray.sources.synth import splitmix64

    ev = _t("events", ["event_id", "user_id"])
    got = pseudonymize_users_events(SF_DIR).to_pandas()
    m = dict(zip(got.event_id, got.user_token))
    u = ev.user_id.to_numpy().astype(np.int64)
    exp = splitmix64((u + _PSEUDO_SEED).view(np.uint64)).view(np.int64)
    for eid, e in zip(ev.event_id.to_numpy()[:300], exp[:300]):
        assert m[eid] == e
    # same user always gets the same token; distinct users never collide
    tok_per_user = got.merge(ev, on="event_id").groupby("user_id") \
        .user_token.nunique()
    assert (tok_per_user == 1).all()
    assert got.merge(ev, on="event_id").groupby("user_token") \
        .user_id.nunique().max() == 1


@pytest.mark.usefixtures("ray_session")
def test_selfjoin_size_vs_pandas():
    from geodata_ray.pipelines.queries import selfjoin_size_lineitem

    c = _t("lineitem", ["l_partkey"]).groupby("l_partkey").size()
    got = selfjoin_size_lineitem(SF_DIR).to_pandas()
    assert len(got) == 1
    assert int(got.f2_selfjoin_rows.iloc[0]) == int((c ** 2).sum())
    assert int(got.n_keys.iloc[0]) == len(c)
    assert int(got.max_cnt.iloc[0]) == int(c.max())


@pytest.mark.usefixtures("ray_session")
def test_audience_overlap_vs_pandas():
    from geodata_ray.pipelines.queries import audience_overlap_types_events

    ev = _t("events", ["user_id", "event_type"])
    A = set(ev[ev.event_type == "view"].user_id)
    B = set(ev[ev.event_type == "click"].user_id)
    got = audience_overlap_types_events(SF_DIR).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r.n_view), int(r.n_click), int(r.n_both),
            int(r.n_union)) == (len(A), len(B), len(A & B), len(A | B))


@pytest.mark.usefixtures("ray_session")
def test_zipf_state_vs_pandas():
    from geodata_ray.pipelines.queries import zipf_state_docs
    from geodata_ray.stages.lm import qlog2_fixed

    docs = _t("documents", ["text"])
    terms = pd.Series(
        [t for s in docs.text for t in s.lower().split(" ")]
    ).value_counts()
    exp = sorted(zip(-terms.values, terms.index))[:100]
    got = zipf_state_docs(SF_DIR).to_pandas().sort_values("rank")
    assert len(got) == min(100, len(terms))
    for i, (r, (negn, term)) in enumerate(zip(got.itertuples(), exp), 1):
        assert (int(r.rank), r.term, int(r.n)) == (i, term, -negn)
        assert int(r.qlog2_rank_fp) == int(qlog2_fixed(
            np.array([i], dtype=np.int64))[0])
        assert int(r.qlog2_n_fp) == int(qlog2_fixed(
            np.array([-negn], dtype=np.int64))[0])


@pytest.mark.usefixtures("ray_session")
def test_grouped_mode_vs_pandas():
    from geodata_ray.pipelines.queries import grouped_mode_cents_events

    ev = _t("events", ["event_type", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "c": cents})
    got = grouped_mode_cents_events(SF_DIR).to_pandas()
    grp = df.groupby(["t", "c"]).size().reset_index(name="n")
    assert len(got) == df.t.nunique()
    for r in got.itertuples():
        g = grp[grp.t == r.event_type].sort_values(
            ["n", "c"], ascending=[False, True])
        assert (int(g.c.iloc[0]), int(g.n.iloc[0])) == (
            int(r.mode_cents), int(r.mode_n))
