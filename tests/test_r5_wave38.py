"""Thirty-eighth-wave tests: independent python brute force over the
sf0.001 parquet (front-coding audit — including a forced-multi-block
run exercising the junction stitch)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _expected():
    d = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id"]).to_pandas().doc_id.to_numpy()
    paths = []
    for i in d:
        i = int(i)
        if i % 2 == 0:
            paths.append((f"/{'abcde'[i % 5]}/item/{i * 7 % 1000}"
                          f"/page/{i % 13}", i))
        else:
            paths.append((f"/post/{i}/comment/{i % 7}", i))
    paths.sort()
    total = sum(len(p) for p, _ in paths)
    saved = 0
    for j in range(1, len(paths)):
        a, b = paths[j - 1][0], paths[j][0]
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        saved += k
    return len(paths), total, saved


@pytest.mark.usefixtures("ray_session")
def test_front_coding_vs_python():
    from geodata_ray.pipelines.queries import front_coding_audit_docs

    n, total, saved = _expected()
    got = front_coding_audit_docs(SF_DIR).to_pandas().iloc[0]
    assert (int(got.n_urls), int(got.total_bytes),
            int(got.saved_bytes)) == (n, total, saved)
    # front coding must save something on sorted URL runs
    assert 0 < saved < total


@pytest.mark.usefixtures("ray_session")
def test_front_coding_multiblock_junctions():
    from ray.data import DataContext

    from geodata_ray.pipelines.queries import front_coding_audit_docs

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 2048
        got = front_coding_audit_docs(SF_DIR).to_pandas().iloc[0]
    finally:
        ctx.target_max_block_size = old
    n, total, saved = _expected()
    assert (int(got.n_urls), int(got.total_bytes),
            int(got.saved_bytes)) == (n, total, saved)
