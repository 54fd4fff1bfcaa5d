import numpy as np
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
