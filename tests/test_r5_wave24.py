"""Twenty-fourth-wave tests: independent pandas/numpy brute force
over the sf0.001 parquet (a from-scratch MMR greedy included)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_ks_test_vs_numpy():
    from geodata_ray.pipelines.queries import ks_test_events

    ev = _t("events", ["event_type", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    a = np.sort(cents[(ev.event_type == "view").to_numpy()])
    b = np.sort(cents[(ev.event_type == "click").to_numpy()])
    support = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, support, side="right")
    cb = np.searchsorted(b, support, side="right")
    exp = int(np.abs(ca * b.size - cb * a.size).max())
    got = ks_test_events(SF_DIR).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r.ks_scaled), int(r.n_a), int(r.n_b)) == (
        exp, a.size, b.size)
    # sanity: the scaled statistic normalizes into [0, 1]
    assert 0.0 <= exp / (a.size * b.size) <= 1.0


@pytest.mark.usefixtures("ray_session")
def test_mmr_rerank_vs_bruteforce():
    from geodata_ray.pipelines.queries import mmr_rerank_embeddings

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(np.array(t["embedding"].combine_chunks().to_pylist(),
                          dtype=np.float64) * 1024.0).astype(np.int64)
    qv = q[vid == 0][0]
    rel = q @ qv
    mask = vid != 0
    order = np.lexsort((vid[mask], -rel[mask]))[:20]
    cids = vid[mask][order]
    crel = rel[mask][order]
    cm = q[mask][order]
    sims = cm @ cm.T
    picked = []
    chosen = np.zeros(20, dtype=bool)
    for k in range(10):
        best = None
        for i in range(20):
            if chosen[i]:
                continue
            ms = max(int(sims[i, j]) for j in range(20)
                     if chosen[j]) if chosen.any() else 0
            sc = int(crel[i]) - ms
            key = (-sc, int(cids[i]))
            if best is None or key < best[0]:
                best = (key, i)
        chosen[best[1]] = True
        picked.append((k + 1, int(cids[best[1]]),
                       int(crel[best[1]])))
    got = mmr_rerank_embeddings(SF_DIR).to_pandas().sort_values("k")
    assert len(got) == 10
    for r, (k, v, rr) in zip(got.itertuples(), picked):
        assert (int(r.k), int(r.vec_id), int(r.rel_q)) == (k, v, rr)
    # diversity property: the 10 picks are distinct
    assert got.vec_id.nunique() == 10


@pytest.mark.usefixtures("ray_session")
def test_dedup_canonical_vs_bruteforce():
    from geodata_ray.pipelines.queries import (
        _MUT_OFFSET,
        _MUT_SUFFIX,
        _NDUP_LIMIT,
        dedup_canonical_docs,
    )
    from tests.test_r5_wave18 import _brute_jaccard_pairs

    docs = _t("documents", ["doc_id", "text"])
    docs = docs[docs.doc_id < _NDUP_LIMIT]
    lens = {}
    for r in docs.itertuples():
        lens[int(r.doc_id)] = len(r.text)
        lens[int(r.doc_id) + _MUT_OFFSET] = len(r.text + _MUT_SUFFIX)
    pairs = _brute_jaccard_pairs()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for node in parent:
        clusters.setdefault(find(node), []).append(node)
    exp = {}
    for members in clusters.values():
        rep = min(members, key=lambda d: (-lens[d], d))
        for d in members:
            exp[d] = rep
    got = dedup_canonical_docs(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[int(r.doc_id)] == int(r.canonical_id)
    # the mutation appends a suffix, so planted clusters canonicalize
    # to the LONGER (+offset) variant
    assert (got.canonical_id >= _MUT_OFFSET).any()
