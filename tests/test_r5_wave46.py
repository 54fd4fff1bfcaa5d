"""Forty-sixth-wave tests: independent pandas brute force over the
sf0.001 parquet (Lorenz decile table, proving the tie-safe
histogram-only split equals the explicit per-user ranking)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.mark.usefixtures("ray_session")
def test_lorenz_deciles_vs_pandas():
    from geodata_ray.pipelines.queries import lorenz_deciles_users_events

    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["user_id"]).to_pandas()
    n = ev.groupby("user_id").size().rename("n").reset_index()
    n = n.sort_values(["n", "user_id"]).reset_index(drop=True)
    u = len(n)
    e = int(n.n.sum())
    n["decile"] = (np.arange(u) * 10) // u + 1
    agg = n.groupby("decile").agg(
        n_users=("n", "size"), events=("n", "sum"))
    agg["cum_share_ppm"] = (
        agg.events.cumsum().astype(object) * 1_000_000 // e
    ).astype(np.int64)
    got = lorenz_deciles_users_events(SF_DIR).to_pandas().set_index(
        "decile")
    assert len(got) == len(agg)
    assert (got.n_users.to_numpy() == agg.n_users.to_numpy()).all()
    assert (got.events.to_numpy() == agg.events.to_numpy()).all()
    assert (got.cum_share_ppm.to_numpy()
            == agg.cum_share_ppm.to_numpy()).all()
    # Lorenz invariants: monotone, ends at 100%, convex-ish ordering
    assert int(got.cum_share_ppm.iloc[-1]) == 1_000_000
    assert (np.diff(got.cum_share_ppm.to_numpy()) >= 0).all()
    assert int(got.n_users.sum()) == u
    assert int(got.events.sum()) == e
