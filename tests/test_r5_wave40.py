"""Fortieth-wave tests: independent python brute force over the
sf0.001 parquet (unigram negative-sampling plan — including a
forced-multi-block run exercising the offset-broadcast path)."""

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


def _expected():
    texts = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["text"]).to_pandas().text
    counts: dict[str, int] = {}
    for t in texts:
        for tok in (t or "").lower().split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    terms = sorted(counts)
    tot = sum(counts.values())
    cum = []
    acc = 0
    for t in terms:
        acc += counts[t]
        cum.append(acc)
    exp = {}
    for i in range(100):
        u = _sm64(i) % tot
        j = int(np.searchsorted(np.array(cum), u, side="right"))
        exp[i] = (u, terms[j], counts[terms[j]])
    return exp


@pytest.mark.usefixtures("ray_session")
def test_negative_sampling_vs_python():
    from geodata_ray.pipelines.queries import (
        negative_sampling_unigram_docs,
    )

    exp = _expected()
    got = negative_sampling_unigram_docs(SF_DIR).to_pandas()
    assert len(got) == 100
    for r in got.itertuples():
        u, term, n = exp[int(r.probe)]
        assert (int(r.u_pos), r.term, int(r.term_n)) == (u, term, n)


@pytest.mark.usefixtures("ray_session")
def test_negative_sampling_multiblock():
    from ray.data import DataContext

    from geodata_ray.pipelines.queries import (
        negative_sampling_unigram_docs,
    )

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 1024
        got = negative_sampling_unigram_docs(SF_DIR).to_pandas()
    finally:
        ctx.target_max_block_size = old
    exp = _expected()
    assert len(got) == 100
    for r in got.itertuples():
        u, term, n = exp[int(r.probe)]
        assert (int(r.u_pos), r.term, int(r.term_n)) == (u, term, n)
