"""Thirty-third-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (embedding drift by label, lead-lag
cross-correlation)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_embedding_drift_vs_python():
    from geodata_ray.pipelines.queries import embedding_drift_labels

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(
        np.array(t["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)
    got = embedding_drift_labels(SF_DIR).to_pandas().set_index("label")
    for l in np.unique(lab):
        a = (lab == l) & (vid % 2 == 0)
        b = (lab == l) & (vid % 2 == 1)
        na, nb = int(a.sum()), int(b.sum())
        if na == 0 or nb == 0:
            assert l not in got.index
            continue
        sa = q[a].sum(axis=0).astype(object)
        sb = q[b].sum(axis=0).astype(object)
        num = int(((sa * nb - sb * na) ** 2).sum())
        exp = num * 1_000_000 // (na * nb) ** 2
        r = got.loc[int(l)]
        assert (int(r.n_a), int(r.n_b)) == (na, nb)
        assert int(r.shift_sq_micro) == exp
        # cross-check against the float centroid distance
        fd = float(((q[a].mean(axis=0) - q[b].mean(axis=0)) ** 2).sum())
        assert abs(exp / 1e6 - fd) < max(1e-6 * fd, 1e-3)


@pytest.mark.usefixtures("ray_session")
def test_crosscorr_vs_python():
    from geodata_ray.pipelines.queries import crosscorr_daily_events

    ev = _t("events", ["ts", "event_type"])
    ev = ev[ev.event_type.isin(["view", "click"])]
    g = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby("day")
        .agg(x=("event_type", lambda s: int((s == "view").sum())),
             y=("event_type", lambda s: int((s == "click").sum())))
        .sort_index()
    )
    xs = [int(v) for v in g.x]
    ys = [int(v) for v in g.y]
    n = len(xs)
    got = crosscorr_daily_events(SF_DIR).to_pandas().set_index("lag")
    for k in range(-3, 4):
        if k >= 0:
            a, b = xs[:n - k], ys[k:]
        else:
            a, b = xs[-k:], ys[:n + k]
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
    # lag 0 must agree with the Pearson daily_corr query
    from geodata_ray.pipelines.queries import daily_corr_types_events

    dc = daily_corr_types_events(SF_DIR).to_pandas().iloc[0]
    assert int(got.loc[0].num) == int(dc.num)
    assert int(got.loc[0].corr_sq_ppb) == int(dc.corr_sq_ppb)
