"""Twenty-first-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (a from-scratch DBSCAN included)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


def _coords(ids):
    from geodata_ray.sources.synth import splitmix64

    qx = (splitmix64(ids.astype(np.uint64)) % np.uint64(4096)).astype(
        np.int64)
    qy = (splitmix64(ids.astype(np.uint64)
                     ^ np.uint64(0xD1B54A32D192ED03))
          % np.uint64(4096)).astype(np.int64)
    return qx, qy


@pytest.mark.usefixtures("ray_session")
def test_dbscan_labels_vs_bruteforce():
    from geodata_ray.pipelines.queries import dbscan_labels_events

    ids = _t("events", ["event_id"]).event_id.to_numpy()
    qx, qy = _coords(ids)
    n = ids.size
    # brute-force neighbor lists (O(n^2) fine at sf0.001)
    nbrs = {}
    for i in range(n):
        d2 = (qx - qx[i]) ** 2 + (qy - qy[i]) ** 2
        m = (d2 <= 1024)
        m[i] = False
        nbrs[i] = np.flatnonzero(m)
    core = np.array([len(nbrs[i]) + 1 >= 5 for i in range(n)])
    # union-find over core-core edges
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in nbrs[i]:
            if core[j]:
                ri, rj = find(int(ids[i])), find(int(ids[j]))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    exp = {}
    for i in range(n):
        if core[i]:
            exp[int(ids[i])] = (0, find(int(ids[i])))
    for i in range(n):
        if core[i]:
            continue
        cl = [exp[int(ids[j])][1] for j in nbrs[i] if core[j]]
        exp[int(ids[i])] = (1, min(cl)) if cl else (2, -1)
    got = dbscan_labels_events(SF_DIR).to_pandas()
    assert len(got) == n
    for r in got.itertuples():
        assert exp[int(r.event_id)] == (int(r.role), int(r.label))
    # roles must match the brute force exactly (sf0.001 is sparse
    # enough that everything is noise; the sf0.01 oracle gate
    # exercises cores/borders/clusters)
    assert set(got.role) == {role for role, _ in exp.values()}


@pytest.mark.usefixtures("ray_session")
def test_phrase_query_vs_python():
    from geodata_ray.pipelines.queries import phrase_query_docs

    docs = _t("documents", ["doc_id", "text"])
    exp = {}
    for r in docs.itertuples():
        toks = r.text.lower().split(" ")
        c = sum(1 for i in range(len(toks) - 1)
                if toks[i] == "hash" and toks[i + 1] == "join")
        if c:
            exp[int(r.doc_id)] = c
    assert exp  # corpus contains the phrase
    got = phrase_query_docs(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[int(r.doc_id)] == int(r.n_hits)


@pytest.mark.usefixtures("ray_session")
def test_merkle_tree_vs_numpy():
    from geodata_ray.pipelines.queries import merkle_tree_events
    from geodata_ray.sources.synth import splitmix64

    ev = _t("events", ["event_id", "value"])
    ids = ev.event_id.to_numpy().astype(np.int64)
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    with np.errstate(over="ignore"):
        h = splitmix64((ids * (1 << 20) + cents).view(np.uint64))
        lv = np.zeros(64, dtype=np.uint64)
        np.add.at(lv, ids % 64, h)
    exp = {(0, i): int(lv.view(np.int64)[i]) for i in range(64)}
    cur = lv
    for level in range(1, 7):
        with np.errstate(over="ignore"):
            cur = splitmix64(cur[0::2] + np.uint64(3) * cur[1::2])
        for i, v in enumerate(cur.view(np.int64)):
            exp[(level, i)] = int(v)
    got = merkle_tree_events(SF_DIR).to_pandas()
    assert len(got) == 127
    for r in got.itertuples():
        assert exp[(int(r.level), int(r.idx))] == int(r.hash_i64)
    # root is a single deterministic value
    assert len(got[got.level == 6]) == 1


@pytest.mark.usefixtures("ray_session")
def test_label_centroids_vs_numpy():
    from geodata_ray.pipelines.queries import label_centroids_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["label", "embedding"])
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.array(t["embedding"].combine_chunks().to_pylist(),
                   dtype=np.float64)
    q = np.floor(mat * 1048576.0).astype(np.int64)
    got = label_centroids_embeddings(SF_DIR).to_pandas()
    dims = mat.shape[1]
    assert len(got) == len(np.unique(lab)) * dims
    for r in got.itertuples():
        m = lab == int(r.label)
        assert int(q[m, int(r.dim) - 1].sum()) == int(r.sum_q)
        assert int(m.sum()) == int(r.n)


@pytest.mark.usefixtures("ray_session")
def test_forward_fill_vs_pandas():
    from geodata_ray.pipelines.queries import forward_fill_user_values

    ev = _t("events", ["user_id", "ts", "event_id", "value"])
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    ev["day"] = ev.ts.dt.floor("D")
    last = (ev.sort_values(["ts", "event_id"])
            .groupby(["user_id", "day"]).cents.last())
    got = forward_fill_user_values(SF_DIR).to_pandas()
    DAY = 86_400_000_000
    n_exp = 0
    for uid, g in last.groupby(level=0):
        days = g.index.get_level_values(1)
        lo, hi = days.min(), days.max()
        spine = pd.date_range(lo, hi, freq="D")
        n_exp += len(spine)
        series = g.droplevel(0).reindex(spine).ffill()
        sub = got[got.user_id == uid].set_index("day_us")
        for day, cents in series.items():
            us = int(day.value // 1000)
            row = sub.loc[us]
            assert int(row.cents) == int(cents)
            assert int(row.filled) == int(
                day not in set(days))
    assert len(got) == n_exp
    assert got.filled.sum() > 0  # fixture has gaps to fill


@pytest.mark.usefixtures("ray_session")
def test_load_profile_vs_pandas():
    from geodata_ray.pipelines.queries import load_profile_events

    ev = _t("events", ["ts"])
    dow = ev.ts.dt.dayofweek + 1  # pandas Monday=0 -> ISO 1..7
    hour = ev.ts.dt.hour
    exp = pd.DataFrame({"dow": dow, "hour": hour}).groupby(
        ["dow", "hour"]).size()
    total = int(exp.sum())
    got = load_profile_events(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = int(exp.loc[(int(r.dow), int(r.hour))])
        assert e == int(r.n)
        assert e * 168 - total == int(r.dev_x168)
