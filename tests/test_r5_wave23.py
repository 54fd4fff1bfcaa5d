"""Twenty-third-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


_PROFILES = {
    "en": {"the", "a", "of", "to", "and", "is"},
    "es": {"el", "la", "de", "que", "y", "los"},
    "de": {"der", "die", "und", "das", "nicht", "ist"},
    "fr": {"le", "la", "et", "les", "des", "un"},
}


def _predict(text):
    ws = set(text.lower().split(" "))
    hits = {l: len(ws & p) for l, p in _PROFILES.items()}
    best = max(hits.values())
    if best == 0:
        return "und"
    for l in ("en", "es", "de", "fr"):  # engine tie order
        if hits[l] == best:
            return l


@pytest.mark.usefixtures("ray_session")
def test_lang_confusion_vs_python():
    from geodata_ray.pipelines.queries import lang_confusion_docs

    docs = _t("documents", ["doc_id", "text", "lang"])
    exp = {}
    for r in docs.itertuples():
        k = (r.lang, _predict(r.text))
        exp[k] = exp.get(k, 0) + 1
    got = lang_confusion_docs(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[(r.lang, r.lang_pred)] == int(r.n_docs)
    assert int(got.n_docs.sum()) == len(docs)


@pytest.mark.usefixtures("ray_session")
def test_label_outliers_vs_numpy():
    from geodata_ray.pipelines.queries import label_outliers_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(np.array(t["embedding"].combine_chunks().to_pylist(),
                          dtype=np.float64) * 1048576.0).astype(np.int64)
    got = label_outliers_embeddings(SF_DIR).to_pandas()
    for l in np.unique(lab):
        m = lab == l
        n = int(m.sum())
        s = q[m].sum(axis=0)
        diff = n * q[m] - s
        d2 = (diff * diff).sum(axis=1)
        order = np.lexsort((vid[m], -d2))[:5]
        sub = got[got.label == l].sort_values("rk")
        assert len(sub) == min(5, n)
        assert (sub.vec_id.to_numpy() == vid[m][order]).all()
        assert (sub.dist2_scaled.to_numpy() == d2[order]).all()


@pytest.mark.usefixtures("ray_session")
def test_rle_runs_vs_numpy():
    from geodata_ray.pipelines.queries import rle_runs_events

    ev = _t("events", ["event_type", "ts", "event_id"]).sort_values(
        ["ts", "event_id"]).reset_index(drop=True)
    t = ev.event_type.to_numpy()
    starts = np.r_[True, t[1:] != t[:-1]]
    exp_runs = pd.Series(t[starts]).value_counts()
    exp_rows = pd.Series(t).value_counts()
    got = rle_runs_events(SF_DIR).to_pandas()
    assert len(got) == len(exp_rows)
    for r in got.itertuples():
        assert int(exp_runs[r.event_type]) == int(r.n_runs)
        assert int(exp_rows[r.event_type]) == int(r.n_rows)
    # total runs = total transitions + 1
    assert int(got.n_runs.sum()) == int(starts.sum())


@pytest.mark.usefixtures("ray_session")
def test_session_duration_quantiles_vs_python():
    from geodata_ray.pipelines.queries import (
        session_duration_quantiles_events,
    )

    ev = _t("events", ["user_id", "ts"]).sort_values(
        ["user_id", "ts"]).reset_index(drop=True)
    gap = np.timedelta64(30 * 60, "s")
    durs = []
    for _, g in ev.groupby("user_id"):
        ts = g.ts.to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        for s in range(int(sid.max()) + 1):
            m = sid == s
            durs.append(int(
                (ts[m].max() - ts[m].min()).astype("timedelta64[us]")
                .astype(np.int64)) // 1_000_000)
    durs = np.sort(np.array(durs, dtype=np.int64))
    n = durs.size
    exp = {p: int(durs[math.ceil(qq * n) - 1])
           for p, qq in [(50, 0.5), (90, 0.9), (99, 0.99)]}
    got = session_duration_quantiles_events(SF_DIR).to_pandas()
    assert len(got) == 3
    for r in got.itertuples():
        assert exp[int(r.q_pct)] == int(r.dur_s)
