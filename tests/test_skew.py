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
