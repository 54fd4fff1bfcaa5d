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


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_rejects_guarantee_voiding_summary_size():
    """summary_size below ceil(n/min_count) silently loses the superset
    guarantee — the stage must refuse it loudly (ADVICE r3)."""
    import ray.data as rd

    from geodata_ray.stages.skew import heavy_hitters

    t = pa.table({"k": pa.array(np.zeros(1000, dtype=np.int64))})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="summary_size"):
        heavy_hitters(ds, "k", min_count=10, summary_size=50)
    # at/above the floor a small explicit summary is accepted and exact
    out = heavy_hitters(ds, "k", min_count=10, summary_size=100).to_pandas()
    assert out["k"].tolist() == [0] and out["n_rows"].tolist() == [1000]


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_high_cardinality_no_single_block():
    """>=10^5 distinct keys: the sharded final merge stays correct and
    the plan contains no single-block Repartition funnel (VERDICT r3)."""
    import ray.data as rd

    from geodata_ray.stages.skew import stratified_sample

    n = 200_000  # 100k distinct keys x 2 rows
    keys = np.repeat(np.arange(100_000, dtype=np.int64), 2)
    rids = np.arange(n, dtype=np.int64)
    t = pa.table({"grp": pa.array(keys), "rid": pa.array(rids)})
    # 16 input blocks WITHOUT a Repartition op, so any Repartition in
    # stats() could only come from the operator under test
    blocks = [t.slice(i * (n // 16), n // 16) for i in range(16)]
    out = stratified_sample(
        rd.from_arrow(blocks), key="grp", id_col="rid",
        n_per_key=1, n_shards=32,
    )
    df = out.to_pandas()
    assert len(df) == 100_000
    assert df["grp"].is_unique
    assert "Repartition" not in out.stats()
    # per-key winner is the min-hash rid of the pair, same as reference
    h = (rids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
        4294967296
    )
    ref = (
        pd.DataFrame({"grp": keys, "rid": rids, "h": h})
        .sort_values(["h", "rid"], kind="stable")
        .groupby("grp", sort=False).head(1)
    )
    got = df.sort_values("grp", ignore_index=True)
    want = ref[["grp", "rid"]].sort_values("grp", ignore_index=True)
    assert got[["grp", "rid"]].values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_partitioning_invariant_and_exact():
    """Per-key quota sample equals the pandas reference and is
    invariant to block structure (decomposable hash-order top-k)."""
    import ray.data as rd

    from geodata_ray.stages.skew import stratified_sample

    rng = np.random.default_rng(23)
    n = 5000
    t = pa.table(
        {
            "grp": pa.array(rng.integers(0, 7, n).astype(np.int64)),
            "rid": pa.array(rng.permutation(n).astype(np.int64)),
        }
    )

    def run(nblocks):
        return (
            stratified_sample(
                rd.from_arrow(t).repartition(nblocks),
                key="grp", id_col="rid", n_per_key=10,
            )
            .to_pandas()
            .sort_values(["grp", "rid"], ignore_index=True)
        )

    a, b = run(1), run(9)
    assert a.values.tolist() == b.values.tolist()

    df = t.to_pandas()
    df["h"] = (df.rid.to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(4294967296)
    want = (
        df.sort_values(["h", "rid"], kind="stable")
        .groupby("grp", sort=False).head(10)[["grp", "rid"]]
        .sort_values(["grp", "rid"], ignore_index=True)
    )
    assert a[["grp", "rid"]].values.tolist() == want.values.tolist()
