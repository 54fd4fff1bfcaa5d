"""Twenty-eighth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (adoption curve, autocorrelation, edge support,
clustering depth, triplet mining, conversion latency quantiles)."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_new_users_daily_vs_pandas():
    from geodata_ray.pipelines.queries import new_users_daily_events

    ev = _t("events", ["user_id", "ts"])
    first = ev.assign(day=ev.ts.dt.floor("D")).groupby("user_id").day.min()
    exp = first.value_counts().sort_index()
    got = new_users_daily_events(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    assert (got.n_new.to_numpy() == exp.to_numpy()).all()
    assert (got.cum_users.to_numpy() == exp.cumsum().to_numpy()).all()
    assert int(got.cum_users.iloc[-1]) == ev.user_id.nunique()


@pytest.mark.usefixtures("ray_session")
def test_autocorr_vs_python():
    from geodata_ray.pipelines.queries import autocorr_daily_events

    ev = _t("events", ["ts"])
    daily = ev.ts.dt.floor("D").value_counts().sort_index()
    x = [int(v) for v in daily.to_numpy()]
    got = autocorr_daily_events(SF_DIR).to_pandas().set_index("lag")
    for k in range(1, 8):
        a, b = x[:-k], x[k:]
        m = len(a)
        sx, sy = sum(a), sum(b)
        num = m * sum(p * q for p, q in zip(a, b)) - sx * sy
        den_x = m * sum(p * p for p in a) - sx * sx
        den_y = m * sum(q * q for q in b) - sy * sy
        corr = 0 if not (den_x and den_y) else (
            (-1 if num < 0 else 1)
            * (num * num * 10**9 // (den_x * den_y))
        )
        r = got.loc[k]
        assert (int(r.num), int(r.den_x), int(r.den_y)) == (
            num, den_x, den_y)
        assert int(r.corr_sq_ppb) == corr
        assert abs(corr) <= 10**9


def _host_graph():
    ids = _t("documents", ["doc_id"]).doc_id.to_numpy()
    u = ids % 97
    es = set()
    for j in (1, 2, 3):
        v = (u + 1 + (ids * j) % 96) % 97
        for a, b in zip(u, v):
            if a != b:
                es.add((min(a, b), max(a, b)))
    adj: dict[int, set] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return es, adj


@pytest.mark.usefixtures("ray_session")
def test_edge_support_vs_python():
    from geodata_ray.pipelines.queries import edge_support_hosts

    es, adj = _host_graph()
    got = edge_support_hosts(SF_DIR).to_pandas()
    assert len(got) == len(es)
    for r in got.itertuples():
        assert (r.a, r.b) in es
        assert len(adj[r.a] & adj[r.b]) == r.support
    # sum of supports = 3 * total triangles
    tri = sum(
        1 for a, b in es for z in (adj[a] & adj[b]) if z > b
    )
    assert int(got.support.sum()) == 3 * tri


@pytest.mark.usefixtures("ray_session")
def test_clustering_depth_vs_python():
    from geodata_ray.pipelines.queries import clustering_depth_events

    ev = _t("events", ["event_id", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    part = ev.event_id.to_numpy() % 16
    lo = {p: int(cents[part == p].min()) for p in np.unique(part)}
    hi = {p: int(cents[part == p].max()) for p in np.unique(part)}
    depth = max(
        sum(1 for p2 in lo if lo[p2] <= s <= hi[p2])
        for s in lo.values()
    )
    got = clustering_depth_events(SF_DIR).to_pandas().iloc[0]
    assert int(got.n_parts) == len(lo)
    assert int(got.max_depth) == depth


@pytest.mark.usefixtures("ray_session")
def test_triplet_mining_vs_numpy():
    from geodata_ray.pipelines.queries import triplet_mining_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(
        np.array(t["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)
    order = np.argsort(vid, kind="stable")[:10]
    got = triplet_mining_embeddings(SF_DIR).to_pandas().set_index(
        "anchor_id")
    assert len(got) == 10
    for i in order:
        d = ((q - q[i]) ** 2).sum(axis=1)
        other = vid != vid[i]
        same = other & (lab == lab[i])
        diff = other & (lab != lab[i])
        dp = int(d[same].min())
        dn = int(d[diff].min())
        r = got.loc[vid[i]]
        assert (int(r.d_pos), int(r.d_neg)) == (dp, dn)
        assert int(r.margin) == dn - dp


@pytest.mark.usefixtures("ray_session")
def test_conversion_latency_vs_pandas():
    from geodata_ray.pipelines.queries import (
        conversion_latency_quantiles_events,
    )

    ev = _t("events", ["user_id", "ts", "event_type"])
    v0 = ev[ev.event_type == "view"].groupby("user_id").ts.min()
    pur = ev[ev.event_type == "purchase"].merge(
        v0.rename("v0"), left_on="user_id", right_index=True
    )
    pur = pur[pur.ts > pur.v0]
    p0 = pur.groupby("user_id").ts.min()
    lat = (
        (p0 - v0.loc[p0.index]).dt.total_seconds().astype(int)
    ).sort_values()
    n = len(lat)
    got = conversion_latency_quantiles_events(SF_DIR).to_pandas()
    for pct, qq in ((50, 0.5), (90, 0.9), (99, 0.99)):
        exp = int(lat.iloc[math.ceil(qq * n) - 1])
        assert int(got[got.q_pct == pct].lat_s.iloc[0]) == exp
