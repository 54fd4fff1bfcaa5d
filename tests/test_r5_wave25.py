"""Twenty-fifth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (clustering coefficient, Benford audit, daily
correlation, Markov transitions, PQ assignment, positional deletes)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


def _host_edges():
    ids = _t("documents", ["doc_id"]).doc_id.to_numpy()
    u = ids % 97
    es = set()
    for j in (1, 2, 3):
        v = (u + 1 + (ids * j) % 96) % 97
        for a, b in zip(u, v):
            if a != b:
                es.add((min(a, b), max(a, b)))
    return es


@pytest.mark.usefixtures("ray_session")
def test_clustering_coeff_vs_bruteforce():
    from geodata_ray.pipelines.queries import clustering_coeff_hosts

    es = _host_edges()
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = {}
    for v, nb in adj.items():
        nbl = sorted(nb)
        tri = sum(
            1
            for i in range(len(nbl))
            for j in range(i + 1, len(nbl))
            if (min(nbl[i], nbl[j]), max(nbl[i], nbl[j])) in es
        )
        deg = len(nb)
        coeff = (2 * tri * 1_000_000) // (deg * (deg - 1)) if deg >= 2 else 0
        exp[v] = (deg, tri, coeff)
    got = clustering_coeff_hosts(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[r.host] == (r.deg, r.n_triangles, r.coeff_ppm), r.host


@pytest.mark.usefixtures("ray_session")
def test_benford_vs_numpy():
    from geodata_ray.pipelines.queries import benford_audit_events

    v = _t("events", ["value"]).value.to_numpy()
    cents = np.abs(np.round(v * 100).astype(np.int64))
    cents = cents[cents > 0]
    first = np.array([int(str(c)[0]) for c in cents])
    n = np.bincount(first, minlength=10)[1:10]
    tot = int(n.sum())
    got = benford_audit_events(SF_DIR).to_pandas()
    assert list(got.digit) == list(range(1, 10))
    assert list(got.n) == list(n)
    assert list(got.share_ppm) == [int(x) * 1_000_000 // tot for x in n]
    assert (got.dev_ppm == got.share_ppm - got.benford_ppm).all()
    # Benford constants sum to ~1e6 (floor rounding loses < 9 ppm)
    assert 1_000_000 - 9 <= int(got.benford_ppm.sum()) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_daily_corr_vs_pandas():
    from geodata_ray.pipelines.queries import daily_corr_types_events

    ev = _t("events", ["ts", "event_type"])
    ev = ev[ev.event_type.isin(["view", "click"])]
    day = ev.ts.dt.floor("D")
    x = (
        ev.assign(d=day)
        .groupby("d")
        .agg(x=("event_type", lambda s: int((s == "view").sum())),
             y=("event_type", lambda s: int((s == "click").sum())))
    )
    xs = x.x.to_numpy().astype(object)
    ys = x.y.to_numpy().astype(object)
    nd = len(x)
    sx, sy = int(xs.sum()), int(ys.sum())
    sxy = int((xs * ys).sum())
    sxx = int((xs * xs).sum())
    syy = int((ys * ys).sum())
    num = nd * sxy - sx * sy
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    sgn = -1 if num < 0 else 1
    corr = sgn * ((num * num * 10**9) // (den_x * den_y))
    got = daily_corr_types_events(SF_DIR).to_pandas()
    r = got.iloc[0]
    assert (int(r.n_days), int(r.sum_x), int(r.sum_y)) == (nd, sx, sy)
    assert (int(r.num), int(r.den_x), int(r.den_y)) == (num, den_x, den_y)
    assert int(r.corr_sq_ppb) == corr
    # squared corr is bounded by 1
    assert abs(corr) <= 10**9


@pytest.mark.usefixtures("ray_session")
def test_markov_transitions_vs_pandas():
    from geodata_ray.pipelines.queries import markov_transitions_events

    ev = _t("events", ["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    same = ev.user_id.to_numpy()[1:] == ev.user_id.to_numpy()[:-1]
    ty = ev.event_type.to_numpy()
    pairs = pd.DataFrame(
        {"from_type": ty[:-1][same], "to_type": ty[1:][same]}
    )
    exp = (
        pairs.groupby(["from_type", "to_type"])
        .size()
        .rename("n")
        .reset_index()
    )
    tot = exp.groupby("from_type").n.sum().to_dict()
    exp["prob_ppm"] = [
        int(n) * 1_000_000 // tot[f]
        for f, n in zip(exp.from_type, exp.n)
    ]
    got = markov_transitions_events(SF_DIR).to_pandas()
    got = got.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    exp = exp.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got.from_type == exp.from_type).all()
    assert (got.to_type == exp.to_type).all()
    assert (got.n.astype(int) == exp.n.astype(int)).all()
    assert (got.prob_ppm.astype(int) == exp.prob_ppm.astype(int)).all()


@pytest.mark.usefixtures("ray_session")
def test_pq_assign_vs_bruteforce():
    from geodata_ray.pipelines.queries import pq_assign_embeddings

    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(
        np.array(t["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)
    order = np.argsort(vid, kind="stable")
    cb = q[order[:16]].reshape(16, 8, 8)
    qs = q.reshape(len(vid), 8, 8)
    exp_n = np.zeros((8, 16), np.int64)
    exp_d = np.zeros((8, 16), np.int64)
    for i in range(len(vid)):
        for s in range(8):
            d = ((qs[i, s][None, :] - cb[:, s, :]) ** 2).sum(axis=1)
            c = int(np.argmin(d))
            exp_n[s, c] += 1
            exp_d[s, c] += int(d[c])
    got = pq_assign_embeddings(SF_DIR).to_pandas()
    for r in got.itertuples():
        assert exp_n[r.subspace, r.code] == r.n
        assert exp_d[r.subspace, r.code] == r.sum_sqdist
    assert int(got.n.sum()) == len(vid) * 8


@pytest.mark.usefixtures("ray_session")
def test_positional_deletes_vs_pandas():
    from geodata_ray.pipelines.queries import positional_deletes_events

    ev = _t("events", ["ts", "event_id", "value"])
    ev["day"] = ev.ts.dt.floor("D")
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["day", "ts", "event_id"])
    ev["pos"] = ev.groupby("day").cumcount() + 1
    live = ev[ev.pos % 7 != 3]
    exp = live.groupby("day").agg(
        n_live=("cents", "size"), cents_live=("cents", "sum")
    )
    got = (
        positional_deletes_events(SF_DIR)
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    assert len(got) == len(exp)
    assert (got.n_live == exp.n_live).all()
    assert (got.cents_live == exp.cents_live).all()
    # the delete fraction is ~1/7 of every day
    total = len(ev)
    assert abs(total - int(exp.n_live.sum()) * 7 / 6) < total * 0.01
