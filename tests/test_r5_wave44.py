"""Forty-fourth-wave tests: independent pandas brute force over the
sf0.001 parquet (Fano factor / burstiness per type)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.mark.usefixtures("ray_session")
def test_fano_factor_vs_pandas():
    from geodata_ray.pipelines.queries import fano_factor_types_events

    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    c = (
        ev.assign(day=ev.ts.dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .rename("n")
        .reset_index()
    )
    got = fano_factor_types_events(SF_DIR).to_pandas().set_index(
        "event_type")
    for ty, g in c.groupby("event_type"):
        ys = [int(v) for v in g.n]
        n = len(ys)
        s = sum(ys)
        ss = sum(y * y for y in ys)
        if n < 2 or s == 0:
            assert ty not in got.index
            continue
        fano = (n * ss - s * s) * 1000 // ((n - 1) * s)
        r = got.loc[ty]
        assert (int(r.n_days), int(r.sum_n), int(r.sum_n2)) == (n, s, ss)
        assert int(r.fano_milli) == fano
        # floor-milli tracks the float variance/mean ratio
        fv = np.var(ys, ddof=1) / np.mean(ys)
        assert abs(fano / 1000.0 - fv) < 1e-2
