"""Distributed k-means vs a single-process Lloyd reference."""

import numpy as np
import pyarrow as pa
import pytest

from geodata_ray.stages.kmeans import kmeans_assign, kmeans_fit


def _blobs(n_per=200, k=4, d=8, seed=21):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (k, d))
    X = np.vstack([centers[i] + rng.normal(0, 0.3, (n_per, d)) for i in range(k)])
    return X, centers


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_local_lloyd_and_recovers_blobs():
    import ray.data as rd

    X, true_centers = _blobs()
    t = pa.table(
        {
            "vec_id": np.arange(X.shape[0]),
            "embedding": pa.array(list(X), type=pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    seed_rows = [0, 200, 400, 600]  # one seed per blob
    init = t.take(seed_rows)
    C, counts = kmeans_fit(ds, k=4, iters=8, init_table=init)

    # independent single-process Lloyd with the same init
    C2 = X[seed_rows].copy()
    for _ in range(8):
        d2 = ((X[:, None, :] - C2[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for j in range(4):
            m = a == j
            if m.any():
                C2[j] = X[m].mean(axis=0)
    np.testing.assert_allclose(C, C2, rtol=1e-10)

    # each fitted centroid sits near a true blob center
    for c in C:
        assert np.min(np.linalg.norm(true_centers - c, axis=1)) < 0.5

    # assignment pass: blobs recovered as pure clusters
    df = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    lab = df.cluster.to_numpy().reshape(4, 200)
    for i in range(4):
        # every blob maps to a single cluster id
        assert len(np.unique(lab[i])) == 1


@pytest.mark.usefixtures("ray_session")
def test_kmeans_deterministic_across_partitionings():
    import ray.data as rd

    X, _ = _blobs(seed=3)
    t = pa.table(
        {
            "vec_id": np.arange(X.shape[0]),
            "embedding": pa.array(list(X), type=pa.list_(pa.float64())),
        }
    )
    init = t.slice(0, 4)
    C1, _ = kmeans_fit(rd.from_arrow(t).repartition(2), k=4, iters=5, init_table=init)
    C2, _ = kmeans_fit(rd.from_arrow(t).repartition(13), k=4, iters=5, init_table=init)
    np.testing.assert_allclose(C1, C2, rtol=1e-12)
