"""Thirty-seventh-wave tests: independent brute force over the
sf0.001 parquet (decision-stump split, cross-checked against float
entropy)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.mark.usefixtures("ray_session")
def test_decision_stump_vs_python():
    from geodata_ray.pipelines.queries import decision_stump_events
    from geodata_ray.stages.lm import qlog2_fixed

    t = pq.read_table(f"{SF_DIR}/events.parquet",
                      columns=["event_type", "value"]).to_pandas()
    cents = np.round(t.value.to_numpy() * 100).astype(np.int64)
    b = np.clip(cents // 2048, 0, 15)
    y = (t.event_type == "purchase").to_numpy().astype(np.int64)

    def ql(c):
        return int(qlog2_fixed(np.array([c], np.uint64))[0]) if c else 0

    def hnum(n, p):
        return n * ql(n) - p * ql(p) - (n - p) * ql(n - p)

    got = decision_stump_events(SF_DIR).to_pandas().set_index(
        "threshold")
    assert len(got) == 15
    best = None
    for k in range(1, 16):
        left = b < k
        nl, pl = int(left.sum()), int(y[left].sum())
        nr, pr = int((~left).sum()), int(y[~left].sum())
        h = hnum(nl, pl) + hnum(nr, pr)
        r = got.loc[k * 2048]
        assert (int(r.n_left), int(r.pos_left)) == (nl, pl)
        assert (int(r.n_right), int(r.pos_right)) == (nr, pr)
        assert int(r.h_q) == h
        if best is None or (h, k) < best:
            best = (h, k)
        # the fixed-point numerator tracks n*H_float within 1e-3
        hf = 0.0
        for n, p in ((nl, pl), (nr, pr)):
            for c in (p, n - p):
                if c and n:
                    hf -= c * np.log2(c / n)
        assert abs(h / 65536.0 - hf) <= max(1e-3 * hf, 1.0)
    assert int(got[got.is_best == 1].index[0]) == best[1] * 2048
    assert int(got.is_best.sum()) == 1
