import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.stages.sketch import approx_quantiles


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_accuracy():
    import ray.data as rd

    rng = np.random.default_rng(17)
    v = rng.lognormal(3.0, 1.0, 200_000)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(16)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = approx_quantiles(ds, "x", qs, k=256)
    exact_ranks = {q: np.quantile(v, q) for q in qs}
    sv = np.sort(v)
    for q in qs:
        # rank error (the sketch's actual guarantee), not value error
        rank = np.searchsorted(sv, got[q]) / v.size
        assert abs(rank - q) < 0.02, (q, rank, got[q], exact_ranks[q])


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_deterministic():
    import ray.data as rd

    rng = np.random.default_rng(3)
    v = rng.uniform(0, 100, 50_000)
    a = approx_quantiles(
        rd.from_arrow(pa.table({"x": v})).repartition(4), "x", [0.5]
    )
    b = approx_quantiles(
        rd.from_arrow(pa.table({"x": v})).repartition(4), "x", [0.5]
    )
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_hll_estimate_accuracy_and_mergeability():
    """HLL estimate within ~3 standard errors of exact distinct counts
    across regimes (linear-counting and raw), and the register table
    merges: max-combining two halves' tables equals the full table."""
    import ray.data as rd

    from geodata_ray.stages.sketch import (
        HLL_P,
        hll_estimate,
        hll_register_table,
    )

    rng = np.random.default_rng(41)
    for n_distinct in (500, 200_000):
        vals = rng.integers(0, n_distinct, size=n_distinct * 2)
        # force the exact distinct count to be known
        vals = np.unique(vals)
        true = vals.size
        t = pa.table({"v": pa.array(vals.astype(np.int64))})
        regs = (
            hll_register_table(rd.from_arrow(t).repartition(4), "v")
            .to_pandas()
        )
        est = hll_estimate(
            regs["register"].to_numpy(), regs["max_rank"].to_numpy()
        )
        err = abs(est - true) / true
        assert err < 0.05, (n_distinct, true, est, err)

        # mergeability: per-half tables max-combine to the full table
        half = vals.size // 2
        a = hll_register_table(
            rd.from_arrow(t.slice(0, half)), "v"
        ).to_pandas()
        b = hll_register_table(
            rd.from_arrow(t.slice(half)), "v"
        ).to_pandas()
        merged = (
            pd.concat([a, b])
            .groupby("register", as_index=False)["max_rank"].max()
            .sort_values("register", ignore_index=True)
        )
        full = regs.sort_values("register", ignore_index=True)
        assert merged.values.tolist() == full.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_keyed_hll_estimates_match_per_key_truth():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.sketch import hll_estimate, hll_register_table

    rng = np.random.default_rng(21)
    n = 40_000
    day = rng.integers(0, 3, n)
    user = rng.integers(0, 5000, n) + day * 100_000
    ds = rd.from_arrow(pa.table({"day": day, "user_id": user})).repartition(6)
    regs = hll_register_table(ds, "user_id", keys=["day"]).to_pandas()
    for d in range(3):
        g = regs[regs["day"] == d]
        est = hll_estimate(g["register"].to_numpy(), g["max_rank"].to_numpy())
        true = len(np.unique(user[day == d]))
        assert abs(est - true) / true < 0.05
    # keyed partial tables merge to the unkeyed table by grouped max
    merged = (
        regs.groupby("register", as_index=False)["max_rank"].max()
        .sort_values("register", ignore_index=True)
    )
    glob = (
        hll_register_table(ds, "user_id").to_pandas()
        .sort_values("register", ignore_index=True)
    )
    assert merged.values.tolist() == glob.values.tolist()
