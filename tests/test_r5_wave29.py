"""Twenty-ninth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (shoelace area, interpolated percentile,
calibration bins, Kendall tau)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_polygon_area_vs_python():
    from geodata_ray.pipelines.queries import polygon_area_nations

    keys = _t("nation", ["n_nationkey"]).n_nationkey.tolist()
    got = polygon_area_nations(SF_DIR).to_pandas().set_index("n_nationkey")
    assert len(got) == len(keys)
    for k in keys:
        nv = 3 + k % 4
        pts = [((k * 7 + i * 13) % 100, (k * 11 + i * 17) % 100)
               for i in range(nv)]
        a2 = sum(
            pts[i][0] * pts[(i + 1) % nv][1]
            - pts[(i + 1) % nv][0] * pts[i][1]
            for i in range(nv)
        )
        r = got.loc[k]
        assert (int(r.n_vertices), int(r.area2)) == (nv, a2)


@pytest.mark.usefixtures("ray_session")
def test_pct_cont_vs_python():
    from geodata_ray.pipelines.queries import pct_cont_types_events

    ev = _t("events", ["event_type", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    got = pct_cont_types_events(SF_DIR).to_pandas().set_index("event_type")
    for ty in ev.event_type.unique():
        v = np.sort(cents[(ev.event_type == ty).to_numpy()])
        n = v.size
        posm = (n - 1) * 500_000
        lo = posm // 1_000_000
        hi = min(lo + 1, n - 1)
        exp = int(v[lo]) * 1_000_000 + (int(v[hi]) - int(v[lo])) * (
            posm % 1_000_000)
        r = got.loc[ty]
        assert int(r.n) == n
        assert int(r.p50_micro) == exp
        # micro-units bracket the numpy float median
        med = float(np.percentile(v, 50, method="linear"))
        assert abs(exp / 1e6 - med) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_calibration_bins_vs_python():
    from geodata_ray.pipelines.queries import calibration_bins_docs
    from geodata_ray.stages.textstats import classifier_score_batch

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    s = classifier_score_batch(t)
    score = s["score"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    bins = np.clip((score + 1_048_576) // 256 - 4096, -8, 7)
    # independent floor-division check on the offset trick
    assert (bins == np.clip(np.floor_divide(score, 256), -8, 7)).all()
    got = calibration_bins_docs(SF_DIR).to_pandas().set_index("bin")
    for b in np.unique(bins):
        m = bins == b
        n = int(m.sum())
        npos = int(((ids[m] % 3) == 0).sum())
        r = got.loc[b]
        assert (int(r.n), int(r.n_pos)) == (n, npos)
        assert int(r.pos_rate_ppm) == npos * 1_000_000 // n
    assert int(got.n.sum()) == len(ids)


@pytest.mark.usefixtures("ray_session")
def test_kendall_tau_vs_python():
    from geodata_ray.pipelines.queries import kendall_tau_daily_events

    ev = _t("events", ["ts", "event_type"])
    ev = ev[ev.event_type.isin(["view", "click"])]
    g = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby("day")
        .agg(x=("event_type", lambda s: int((s == "view").sum())),
             y=("event_type", lambda s: int((s == "click").sum())))
        .sort_index()
    )
    x = g.x.to_numpy()
    y = g.y.to_numpy()
    n = len(g)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
            conc += p > 0
            disc += p < 0
    npairs = n * (n - 1) // 2
    num = conc - disc
    tau = (-1 if num < 0 else 1) * (abs(int(num)) * 1_000_000 // npairs)
    got = kendall_tau_daily_events(SF_DIR).to_pandas().iloc[0]
    assert (int(got.n_days), int(got.n_conc), int(got.n_disc)) == (
        n, conc, disc)
    assert int(got.tau_a_ppm) == tau
    assert abs(tau) <= 1_000_000
