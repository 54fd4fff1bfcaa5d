"""Twenty-seventh-wave tests: independent pandas/numpy brute force
over the sf0.001 parquet (theta intersection, L2-norm audit, term
shift, session paths, view->click window join, Gram matrix)."""

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


def _i64(h: int) -> int:
    return h - U64 if h >= (1 << 63) else h


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


def _quant_embeddings():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(
        np.array(t["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)
    return vid, q


@pytest.mark.usefixtures("ray_session")
def test_theta_intersection_vs_python():
    from geodata_ray.pipelines.queries import theta_intersection_types_events

    ev = _t("events", ["user_id", "event_type"])
    ev = ev[ev.event_type.isin(["view", "click"])]
    views = set(ev[ev.event_type == "view"].user_id)
    clicks = set(ev[ev.event_type == "click"].user_id)
    union = views | clicks
    inter = views & clicks
    ranked = sorted(union, key=lambda u: (_i64(_sm64(int(u))), u))[:64]
    nb = sum(1 for u in ranked if u in inter)
    got = theta_intersection_types_events(SF_DIR).to_pandas().iloc[0]
    assert int(got.k) == min(64, len(union))
    assert int(got.n_both_sketch) == nb
    assert int(got.jaccard_est_ppm) == nb * 1_000_000 // int(got.k)
    assert (int(got.n_inter), int(got.n_union)) == (len(inter), len(union))
    assert int(got.jaccard_ppm) == len(inter) * 1_000_000 // len(union)


@pytest.mark.usefixtures("ray_session")
def test_l2_norm_audit_vs_numpy():
    from geodata_ray.pipelines.queries import l2_norm_audit_embeddings

    vid, q = _quant_embeddings()
    got = l2_norm_audit_embeddings(SF_DIR).to_pandas().set_index("vec_id")
    assert len(got) == len(vid)
    norm2 = (q * q).sum(axis=1)
    mdim = q.argmax(axis=1)
    for i, v in enumerate(vid):
        r = got.loc[v]
        assert int(r.norm2_q) == int(norm2[i])
        assert int(r.max_dim) == int(mdim[i]) + 1
        assert int(r.max_q) == int(q[i, mdim[i]])


@pytest.mark.usefixtures("ray_session")
def test_term_shift_vs_python():
    from geodata_ray.pipelines.queries import term_shift_docs

    d = _t("documents", ["doc_id", "text"])
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for did, txt in zip(d.doc_id, d.text):
        tgt = ca if did % 2 == 0 else cb
        for tok in (txt or "").lower().split(" "):
            tgt[tok] = tgt.get(tok, 0) + 1
    ta, tb = sum(ca.values()), sum(cb.values())
    vocab = sorted(set(ca) | set(cb))
    rows = [
        (t, ca.get(t, 0), cb.get(t, 0),
         ca.get(t, 0) * 1_000_000 // ta - cb.get(t, 0) * 1_000_000 // tb)
        for t in vocab
    ]
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    exp = rows[:20]
    got = term_shift_docs(SF_DIR).to_pandas()
    assert len(got) == 20
    for (t, na, nb, dp), r in zip(exp, got.itertuples()):
        assert (r.term, r.n_a, r.n_b, r.delta_ppm) == (t, na, nb, dp)


@pytest.mark.usefixtures("ray_session")
def test_session_paths_vs_pandas():
    from geodata_ray.pipelines.queries import session_paths_events

    ev = _t("events", ["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    u = ev.user_id.to_numpy()
    ts = ev.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    new = np.ones(len(ev), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > 30 * 60 * 1_000_000)
    sid = np.cumsum(new) - 1
    ev = ev.assign(sid=sid)
    paths: dict[str, int] = {}
    for _, g in ev.groupby("sid"):
        p = ">".join(g.event_type.iloc[:3])
        paths[p] = paths.get(p, 0) + 1
    exp = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = session_paths_events(SF_DIR).to_pandas()
    assert [(r.path, r.n) for r in got.itertuples()] == exp


@pytest.mark.usefixtures("ray_session")
def test_view_click_pairs_vs_pandas():
    from geodata_ray.pipelines.queries import view_click_pairs_events

    ev = _t("events", ["user_id", "ts", "event_type"])
    v = ev[ev.event_type == "view"]
    c = ev[ev.event_type == "click"]
    j = v.merge(c, on="user_id", suffixes=("_v", "_c"))
    dt = (j.ts_c - j.ts_v).dt.total_seconds()
    j = j[(dt > 0) & (dt <= 300)]
    exp = (
        j.assign(day=j.ts_v.dt.floor("D"))
        .groupby("day")
        .size()
        .rename("n_pairs")
    )
    got = (
        view_click_pairs_events(SF_DIR)
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    exp = exp.sort_index()
    assert len(got) == len(exp)
    assert (got.index.to_numpy().astype("datetime64[us]")
            == exp.index.to_numpy().astype("datetime64[us]")).all()
    assert (got.n_pairs.to_numpy() == exp.to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_gram_matrix_vs_numpy():
    from geodata_ray.pipelines.queries import gram_matrix_embeddings

    _, q = _quant_embeddings()
    g = q.T @ q
    got = gram_matrix_embeddings(SF_DIR).to_pandas()
    assert len(got) == 64 * 65 // 2
    for r in got.itertuples():
        assert g[r.i - 1, r.j - 1] == r.s
    # Gram diagonal equals the summed per-vector squared norms
    diag = got[got.i == got.j].s.sum()
    assert int(diag) == int((q * q).sum())
