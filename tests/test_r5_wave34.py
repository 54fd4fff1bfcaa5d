"""Thirty-fourth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (dimension variance screening, MRR)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _quant():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(
        np.array(t["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)
    return vid, lab, q


@pytest.mark.usefixtures("ray_session")
def test_dim_variance_vs_numpy():
    from geodata_ray.pipelines.queries import dim_variance_embeddings

    _, _, q = _quant()
    n = q.shape[0]
    s = q.sum(axis=0).astype(object)
    ss = (q.astype(object) ** 2).sum(axis=0)
    var_num = n * ss - s * s
    got = dim_variance_embeddings(SF_DIR).to_pandas().set_index("dim")
    assert len(got) == 64
    for d in range(64):
        r = got.loc[d + 1]
        assert int(r.sum_q) == int(s[d])
        assert int(r.sum_q2) == int(ss[d])
        assert int(r.var_num) == int(var_num[d])
    order = sorted(range(64), key=lambda d: (-int(var_num[d]), d + 1))
    top = {d + 1 for d in order[:8]}
    assert set(got[got.is_top8 == 1].index) == top
    # n^2 * float variance tracks the integer moment
    fv = q.var(axis=0) * n * n
    iv = np.array([float(v) for v in var_num])
    assert np.allclose(fv, iv, rtol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_mrr_vs_bruteforce():
    from geodata_ray.pipelines.queries import mrr_same_label_embeddings

    vid, lab, q = _quant()
    anchors = np.argsort(vid, kind="stable")[:10]
    got = mrr_same_label_embeddings(SF_DIR).to_pandas().set_index(
        "anchor_id")
    assert len(got) == 10
    for i in anchors:
        d = ((q - q[i]) ** 2).sum(axis=1)
        others = vid != vid[i]
        # full exact ordering by (dist, vec_id)
        idx = np.flatnonzero(others)
        order = idx[np.lexsort((vid[idx], d[idx]))]
        rank = next(
            r + 1 for r, j in enumerate(order) if lab[j] == lab[i]
        )
        r = got.loc[vid[i]]
        assert int(r["rank"]) == rank
        assert int(r.recip_micro) == 1_000_000 // rank
