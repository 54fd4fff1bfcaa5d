"""Forty-third-wave tests: independent python brute force over the
sf0.001 parquet (partitioner-hash uniformity audit)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

U64 = 1 << 64


def _sm64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) % U64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % U64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % U64
    return x ^ (x >> 31)


@pytest.mark.usefixtures("ray_session")
def test_hash_uniformity_vs_python():
    from geodata_ray.pipelines.queries import hash_uniformity_audit_events

    users = sorted(set(
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
        .to_pandas().user_id
    ))
    counts = [0] * 256
    for u in users:
        counts[_sm64(int(u)) % 256] += 1
    n = len(users)
    chi2 = sum((256 * c - n) ** 2 for c in counts)
    got = hash_uniformity_audit_events(SF_DIR).to_pandas().iloc[0]
    assert (int(got.n_ids), int(got.n_buckets)) == (n, 256)
    assert int(got.chi2_num) == chi2
    assert int(got.max_bucket_n) == max(counts)
    assert int(got.min_bucket_n) == min(counts)
    # chi2/(256*N) should be near dof=255 for a uniform hash —
    # allow a generous band, this is a sanity check not a test of
    # splitmix itself
    stat = chi2 / (256 * n)
    assert 100 < stat < 500
