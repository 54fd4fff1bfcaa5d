"""Forty-second-wave tests: independent python brute force over the
sf0.001 parquet (Bloom capacity plan, dedup ROI report)."""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_bloom_size_plan_vs_python():
    from geodata_ray.pipelines.queries import bloom_size_plan_events

    ev = _t("events", ["event_id", "user_id"])
    got = bloom_size_plan_events(SF_DIR).to_pandas().set_index("part")
    assert len(got) == 16
    for p in range(16):
        n = ev[ev.event_id % 16 == p].user_id.nunique()
        m = -(-(n * 10_000_000) // 693_147)
        r = got.loc[p]
        assert int(r.n_distinct) == n
        assert int(r.m_bits) == m
        assert int(r.m_bytes) == (m + 7) // 8
        assert int(r.k_hashes) == 10
        # sanity: ~14.4 bits per element at p = 1/1024
        assert 14 * n <= m <= 15 * n


@pytest.mark.usefixtures("ray_session")
def test_dedup_savings_vs_python():
    from geodata_ray.pipelines.queries import dedup_savings_docs

    d = _t("documents", ["doc_id", "text"])
    groups: dict[str, list[int]] = {}
    for txt in d.text:
        x = hashlib.md5((txt or "").lower().encode()).hexdigest()
        groups.setdefault(x, []).append(len((txt or "").encode()))
    n_docs = sum(len(v) for v in groups.values())
    n_unique = len(groups)
    bytes_total = sum(sum(v) for v in groups.values())
    bytes_kept = sum(min(v) for v in groups.values())
    got = dedup_savings_docs(SF_DIR).to_pandas().iloc[0]
    assert (int(got.n_docs), int(got.n_unique)) == (n_docs, n_unique)
    assert (int(got.bytes_total), int(got.bytes_kept)) == (
        bytes_total, bytes_kept)
    assert int(got.saved_ppm) == (
        (bytes_total - bytes_kept) * 1_000_000 // bytes_total)
    # invariant: never keep more than existed (the sf0.001 corpus
    # happens to have no EXACT text dups — savings may be zero here)
    assert n_unique <= n_docs
    assert bytes_kept <= bytes_total
