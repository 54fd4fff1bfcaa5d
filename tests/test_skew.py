"""Salted per-key top-k under heavy key skew."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.stages.skew import detect_hot_keys, salted_topk_per_key


@pytest.mark.usefixtures("ray_session")
def test_salted_topk_matches_plain_topk():
    import ray.data as rd

    rng = np.random.default_rng(13)
    n = 60_000
    # zipf-ish skew: one hot key holds ~50% of rows
    keys = np.where(
        rng.uniform(size=n) < 0.5, 0, rng.integers(1, 200, size=n)
    ).astype(np.int64)
    vals = rng.uniform(0, 1e6, size=n)
    vals = np.round(vals, 1)  # avoid float-tie ambiguity in comparison
    t = pa.table({"cell": keys, "score": vals})
    ds = rd.from_arrow(t).repartition(8)

    hot = detect_hot_keys(ds, "cell", threshold_rows=5_000)
    assert 0 in hot and len(hot) == 1

    out = (
        salted_topk_per_key(
            ds, key="cell", order_col="score", k=5, n_salts=8,
            threshold_rows=5_000,
        )
        .to_pandas()
        .sort_values(["cell", "rank"], ignore_index=True)
    )
    ref = (
        pd.DataFrame({"cell": keys, "score": vals})
        .sort_values("score", ascending=False)
        .groupby("cell")
        .head(5)
    )
    for cell, grp in ref.groupby("cell"):
        got = out[out.cell == cell].score.to_numpy()
        want = np.sort(grp.score.to_numpy())[::-1]
        np.testing.assert_array_equal(np.sort(got)[::-1], want, err_msg=str(cell))


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_on_zipf_with_compression():
    """heavy_hitters equals the exact pandas answer on a zipf corpus
    whose distinct-key count exceeds the summary size, so the
    Misra-Gries compression path genuinely runs — and the output is
    still exact (pass-2 recount)."""
    import ray.data as rd

    from geodata_ray.stages.skew import heavy_hitters

    rng = np.random.default_rng(17)
    keys = rng.zipf(1.3, size=30_000) % 3000  # ~2k distinct, heavy head
    t = pa.table({"k": pa.array(keys.astype(np.int64))})
    ds = rd.from_arrow(t).repartition(8)

    min_count = 200
    out = (
        heavy_hitters(ds, "k", min_count=min_count)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    vc = pd.Series(keys).value_counts()
    want = vc[vc >= min_count].sort_index()
    assert out["k"].tolist() == want.index.tolist()
    assert out["n_rows"].tolist() == want.values.tolist()
    # compression genuinely ran: distinct keys exceed the summary size
    assert len(vc) > max(64, -(-2 * 30_000 // min_count))

    # empty result path keeps the (key, n_rows) schema at the Dataset
    # level (to_pandas of any zero-block Dataset drops columns — a
    # known Ray quirk, not specific to this operator)
    empty = heavy_hitters(ds, "k", min_count=10**9)
    assert empty.schema().names == ["k", "n_rows"]
    assert empty.count() == 0
