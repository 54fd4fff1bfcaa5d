"""Twenty-second-wave tests: independent pandas/numpy brute force
over the sf0.001 parquet."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_bloom_partition_index_vs_numpy():
    from geodata_ray.pipelines.queries import (
        _BLOOM_PROBES,
        bloom_partition_index_events,
    )
    from geodata_ray.stages.sketch import CMS_D, CMS_LW, cms_cells_batch

    ev = _t("events", ["event_id", "user_id"])
    part = (ev.event_id.to_numpy() % 16).astype(np.int64)
    u = ev.user_id.to_numpy().astype(np.int64)
    pbits = {}
    for p in range(16):
        vals = u[part == p]
        d, c = cms_cells_batch(vals)
        pbits[p] = set((d * (1 << CMS_LW) + c).tolist())
    got = bloom_partition_index_events(SF_DIR).to_pandas()
    assert len(got) == 16 * len(_BLOOM_PROBES)
    probes = np.array(_BLOOM_PROBES, dtype=np.int64)
    dd, cc = cms_cells_batch(probes)
    qb = (dd * (1 << CMS_LW) + cc).reshape(CMS_D, probes.size)
    present = set(zip(part.tolist(), u.tolist()))
    n_fp = 0
    for r in got.itertuples():
        pi = list(_BLOOM_PROBES).index(int(r.probe_user))
        need = {int(qb[j, pi]) for j in range(CMS_D)}
        exp_hit = int(need <= pbits[int(r.part)])
        exp_present = int((int(r.part), int(r.probe_user)) in present)
        assert (exp_hit, exp_present) == (int(r.bloom_hit),
                                          int(r.present))
        n_fp += exp_hit and not exp_present
        # no false negatives, ever
        assert not (exp_present and not exp_hit)
    # probe 911 is absent from every partition (planted negative)
    g911 = got[got.probe_user == 911]
    assert int(g911.present.sum()) == 0


@pytest.mark.usefixtures("ray_session")
def test_rank_normalize_vs_numpy():
    from geodata_ray.pipelines.queries import rank_normalize_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.array(t["embedding"].combine_chunks().to_pylist(),
                   dtype=np.float64)
    q = np.floor(mat * 1048576.0).astype(np.int64)
    got = rank_normalize_embeddings(SF_DIR).to_pandas()
    n, dims = mat.shape
    assert len(got) == n * dims
    for d in (1, dims // 2, dims):
        col = q[:, d - 1]
        order = np.lexsort((vid, col))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(1, n + 1)
        sub = got[got.dim == d].set_index("vec_id")["rank"]
        for v, r in zip(vid, rank):
            assert int(sub.loc[int(v)]) == int(r)
        # ranks within a dimension are a permutation of 1..n
        assert sorted(sub.tolist()) == list(range(1, n + 1))


@pytest.mark.usefixtures("ray_session")
def test_fold_leakage_vs_bruteforce():
    from geodata_ray.pipelines.queries import fold_leakage_audit_docs
    from tests.test_r5_wave18 import _brute_jaccard_pairs

    pairs = _brute_jaccard_pairs()
    exp = [(a, b) for a, b in pairs if (a // 7) % 5 != (b // 7) % 5]
    assert exp  # the fold function must actually catch planted dups
    got = fold_leakage_audit_docs(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    gs = set(zip(got.id_a, got.id_b))
    for a, b in exp:
        assert (a, b) in gs
    for r in got.itertuples():
        assert int(r.fold_a) == (int(r.id_a) // 7) % 5
        assert int(r.fold_b) == (int(r.id_b) // 7) % 5
        assert int(r.fold_a) != int(r.fold_b)


@pytest.mark.usefixtures("ray_session")
def test_twap_vs_pandas():
    from geodata_ray.pipelines.queries import twap_user_values

    ev = _t("events", ["user_id", "ts", "event_id", "value"])
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    ev["us"] = ev.ts.values.astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"]).reset_index(
        drop=True)
    exp = {}
    for uid, g in ev.groupby("user_id"):
        if len(g) < 2:
            continue
        us = g.us.to_numpy()
        c = g.cents.to_numpy()
        exp[int(uid)] = (int((c[:-1] * np.diff(us)).sum()),
                         int(us[-1] - us[0]), len(g))
    got = twap_user_values(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[int(r.user_id)] == (int(r.twap_num),
                                       int(r.span_us), int(r.n_obs))


@pytest.mark.usefixtures("ray_session")
def test_bounce_rate_vs_pandas():
    from geodata_ray.pipelines.queries import bounce_rate_daily_events

    ev = _t("events", ["user_id", "ts"]).sort_values(
        ["user_id", "ts"]).reset_index(drop=True)
    gap = pd.Timedelta(minutes=30)
    sessions = []
    for uid, g in ev.groupby("user_id"):
        ts = g.ts.to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap.to_timedelta64()
        sid = np.cumsum(new) - 1
        for s in range(int(sid.max()) + 1):
            m = sid == s
            sessions.append((pd.Timestamp(ts[m].min()).floor("D"),
                             int(m.sum())))
    df = pd.DataFrame(sessions, columns=["day", "n"])
    exp = df.groupby("day").agg(n_sessions=("n", "size"),
                                n_bounces=("n", lambda s: (s == 1).sum()))
    got = bounce_rate_daily_events(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp.loc[pd.Timestamp(r.day)]
        assert (int(e.n_sessions), int(e.n_bounces)) == (
            int(r.n_sessions), int(r.n_bounces))
    assert got.n_bounces.sum() > 0  # fixture has bounce sessions
