"""shuffle_join: Arrow-native per-bucket merge semantics + the
empty-left-bucket dtype regression (the pandas merge used to
float-upcast int columns in buckets whose left side was empty)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.stages.relational import shuffle_join


def _ds(table, nblocks=3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(nblocks)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_join_empty_left_bucket_keeps_int_dtypes():
    """Right keys that hash to buckets with no left rows must not
    degrade the joined schema: every int column stays int64."""
    left = pa.table(
        {
            "k": pa.array([1, 1, 2], type=pa.int64()),
            "lv": pa.array([10, 11, 12], type=pa.int64()),
        }
    )
    # right has many keys absent from left -> with 64 buckets some
    # buckets are right-only (empty left side)
    right = pa.table(
        {
            "k": pa.array(list(range(1, 40)), type=pa.int64()),
            "rv": pa.array(list(range(100, 139)), type=pa.int64()),
        }
    )
    out = shuffle_join(_ds(left), _ds(right), ["k"], num_buckets=64)
    df = out.to_pandas()
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k")
        .sort_values(["k", "lv"], ignore_index=True)
    )
    got = df.sort_values(["k", "lv"], ignore_index=True)
    assert got[["k", "lv", "rv"]].values.tolist() == want[
        ["k", "lv", "rv"]
    ].values.tolist()
    for c in ("k", "lv", "rv"):
        assert got[c].dtype == np.int64, (c, got[c].dtype)


@pytest.mark.usefixtures("ray_session")
def test_range_join_empty_left_bucket_keeps_int_dtypes():
    """Same hazard as shuffle_join: right-only buckets must keep
    declared int types through the per-bucket Arrow merge."""
    from geodata_ray.stages.relational import range_join

    left = pa.table(
        {
            "k": pa.array([1, 1], type=pa.int64()),
            "x": pa.array([5, 15], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(list(range(1, 30)), type=pa.int64()),
            "lo": pa.array([0] * 29, type=pa.int64()),
            "hi": pa.array([10] * 29, type=pa.int64()),
            "rv": pa.array(list(range(29)), type=pa.int64()),
        }
    )
    out = range_join(
        _ds(left), _ds(right), by="k", left_on="x",
        right_start="lo", right_end="hi", num_buckets=16,
    ).to_pandas()
    # only (k=1, x=5) lands inside [0, 10]
    assert out[["k", "x", "rv"]].values.tolist() == [[1, 5, 0]]
    for c in ("k", "x", "lo", "hi", "rv"):
        assert out[c].dtype == np.int64, (c, out[c].dtype)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_join_how_variants_match_pandas():
    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 3], type=pa.int64()),
            "lv": pa.array([1.0, 2.0, 3.0, 3.5]),
            "name": pa.array(["a", "b", "c", "d"]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([2, 3, 4], type=pa.int64()),
            "rv": pa.array([20, 30, 40], type=pa.int64()),
            "name": pa.array(["x", "y", "z"]),  # collides -> name_r
        }
    )
    lp, rp = left.to_pandas(), right.to_pandas()
    for how in ("inner", "left", "right", "outer"):
        out = (
            shuffle_join(_ds(left), _ds(right), ["k"], how=how, num_buckets=8)
            .to_pandas()
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        )
        want = (
            lp.merge(
                rp.rename(columns={"name": "name_r"}), on="k", how=how
            )
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        )
        assert list(out.columns) == list(want.columns), how
        pd.testing.assert_frame_equal(
            out.astype({"rv": "float64"}),
            want.astype({"rv": "float64"}),
            check_dtype=False,
        )


@pytest.mark.usefixtures("ray_session")
def test_shuffle_join_null_keys_sql_semantics():
    """Null join keys follow SQL semantics (acero): a null key matches
    NOTHING — not even another null (pandas merge would match
    NaN==NaN).  Null-keyed rows still surface null-extended in outer
    joins (ADVICE r3 regression)."""
    left = pa.table(
        {
            "k": pa.array([1, None, 2], type=pa.int64()),
            "lv": pa.array([10, 20, 30], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, None], type=pa.int64()),
            "rv": pa.array([100, 200], type=pa.int64()),
        }
    )
    inner = (
        shuffle_join(_ds(left), _ds(right), ["k"], num_buckets=4)
        .to_pandas()
        .sort_values("lv", ignore_index=True)
    )
    # only the k=1 pair matches; the two null-keyed rows match nothing
    assert inner[["k", "lv", "rv"]].values.tolist() == [[1, 10, 100]]

    outer = (
        shuffle_join(_ds(left), _ds(right), ["k"], how="outer", num_buckets=4)
        .to_pandas()
    )
    # 1 matched + null-left + k=2 left + null-right = 4 rows
    assert len(outer) == 4
    matched = outer[outer.rv.notna() & outer.lv.notna()]
    assert matched[["lv", "rv"]].values.tolist() == [[10.0, 100.0]]
    # the null-keyed right row appears with no left columns
    null_right = outer[outer.lv.isna()]
    assert null_right["rv"].tolist() == [200]


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_join_equals_plain_join():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.relational import (
        bloom_prefilter_join,
        shuffle_join,
    )

    rng = np.random.default_rng(2)
    big = pa.table({
        "k": rng.integers(0, 5000, 20000),
        "x": np.arange(20000),
    })
    small = pa.table({
        "k": np.arange(0, 5000, 97),
        "y": np.arange(0, 5000, 97) * 10,
    })
    a = (
        bloom_prefilter_join(
            rd.from_arrow(big).repartition(8), rd.from_arrow(small), "k",
            num_buckets=8,
        )
        .to_pandas().sort_values(["k", "x"], ignore_index=True)
    )
    b = (
        shuffle_join(
            rd.from_arrow(big).repartition(8), rd.from_arrow(small), ["k"],
            num_buckets=8,
        )
        .to_pandas().sort_values(["k", "x"], ignore_index=True)
    )
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0

    with pytest.raises(ValueError):
        bloom_prefilter_join(
            rd.from_arrow(big), rd.from_arrow(small), "k", how="left"
        )


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantiles_and_distinct_count():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.relational import (
        grouped_distinct_count,
        grouped_exact_quantiles,
    )

    rng = np.random.default_rng(5)
    n = 3000
    key = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    v = rng.integers(0, 500, n)
    ds = rd.from_arrow(pa.table({"k": key, "v": v})).repartition(6)

    out = {
        (r["k"], r["q_pct"]): r["v"]
        for r in grouped_exact_quantiles(
            ds, "k", "v", [(50, 0.5), (90, 0.9)]
        ).take_all()
    }
    import math

    for kk in "abc":
        sv = np.sort(v[key == kk])
        for pct, q in ((50, 0.5), (90, 0.9)):
            assert out[(kk, pct)] == int(sv[math.ceil(q * len(sv)) - 1])

    dc = {
        r["k"]: r["nd"]
        for r in grouped_distinct_count(
            ds, ["k"], "v", alias="nd"
        ).take_all()
    }
    for kk in "abc":
        assert dc[kk] == len(np.unique(v[key == kk]))


@pytest.mark.usefixtures("ray_session")
def test_rollup_aggregate_matches_pandas_levels():
    import ray.data as rd

    from geodata_ray.stages.relational import rollup_aggregate

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(list("xyz"), 200),
            "b": rng.integers(0, 4, 200),
            "v": rng.integers(-50, 50, 200).astype("int64"),
        }
    )
    out = (
        rollup_aggregate(
            rd.from_pandas(df).repartition(5),
            ["a", "b"],
            [("v", "count", "n"), ("v", "sum", "sv"), ("v", "min", "mn")],
        )
        .to_pandas()
        .sort_values(["a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    finest = (
        df.groupby(["a", "b"], as_index=False)
        .agg(n=("v", "count"), sv=("v", "sum"), mn=("v", "min"))
    )
    lvl1 = df.groupby(["a"], as_index=False).agg(
        n=("v", "count"), sv=("v", "sum"), mn=("v", "min")
    )
    lvl1["b"] = pd.NA
    total = pd.DataFrame(
        {
            "a": [pd.NA],
            "b": [pd.NA],
            "n": [len(df)],
            "sv": [df.v.sum()],
            "mn": [df.v.min()],
        }
    )
    exp = (
        pd.concat([finest, lvl1, total], ignore_index=True)[out.columns]
        .sort_values(["a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    for col in ("n", "sv", "mn"):
        assert list(out[col]) == [int(x) for x in exp[col]]
    # mergeability guard: mean is rejected
    with pytest.raises(ValueError):
        rollup_aggregate(rd.from_pandas(df), ["a"], [("v", "mean", "m")])


@pytest.mark.usefixtures("ray_session")
def test_pivot_counts_discovers_values_and_matches_crosstab():
    import ray.data as rd

    from geodata_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 300),
            "t": rng.choice(["red", "green", "blue"], 300),
        }
    )
    out = (
        pivot_counts(rd.from_pandas(df).repartition(4), "k", "t")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ct = pd.crosstab(df.k, df.t).reset_index()
    assert list(out.columns) == ["k", "blue", "green", "red"]
    for col in ("blue", "green", "red"):
        assert list(out[col]) == list(ct[col])
    # explicit values: absent value -> all-zero column
    out2 = pivot_counts(
        rd.from_pandas(df), "k", "t", values=["red", "pink"]
    ).to_pandas()
    assert out2["pink"].sum() == 0 and out2["red"].sum() == (df.t == "red").sum()


@pytest.mark.usefixtures("ray_session")
def test_interval_lookup_matches_bruteforce():
    import ray.data as rd

    from geodata_ray.stages.relational import interval_lookup

    rng = np.random.default_rng(3)
    bounds = np.unique(rng.integers(0, 1000, 20))
    x = rng.integers(-50, 1100, 400)  # below-min and above-max included
    out = (
        interval_lookup(
            rd.from_pandas(pd.DataFrame({"x": x})).repartition(4),
            "x",
            list(bounds),
            out_col="bkt",
        )
        .to_pandas()
        .sort_values("x", kind="stable")
    )
    exp = np.searchsorted(np.sort(bounds), np.sort(x, kind="stable"),
                          side="right")
    assert list(out["bkt"]) == list(exp)
    # boundary value lands in the interval it OPENS (b <= x semantics)
    one = interval_lookup(
        rd.from_pandas(pd.DataFrame({"x": [int(bounds[0])]})), "x",
        list(bounds), out_col="bkt",
    ).to_pandas()
    assert one["bkt"][0] == 1


@pytest.mark.usefixtures("ray_session")
def test_winsorized_grouped_sum_matches_numpy():
    import ray.data as rd

    from geodata_ray.stages.relational import winsorized_grouped_sum

    rng = np.random.default_rng(9)
    k = rng.choice(list("ab"), 500)
    v = rng.integers(-1000, 1000, 500).astype("int64")
    v[:5] = 10**6  # outliers that the clip must tame
    out = (
        winsorized_grouped_sum(
            rd.from_pandas(pd.DataFrame({"k": k, "v": v})).repartition(4),
            "k",
            "v",
            alias="ws",
        )
        .to_pandas()
        .set_index("k")
    )
    import math

    for kk in "ab":
        x = np.sort(v[k == kk])
        n = len(x)
        lo = x[math.ceil(0.10 * n) - 1]
        hi = x[math.ceil(0.90 * n) - 1]
        assert out.loc[kk, "ws"] == int(np.clip(x, lo, hi).sum())
        assert out.loc[kk, "n"] == n


@pytest.mark.usefixtures("ray_session")
def test_merge_aggregates_equals_full_recompute():
    import ray.data as rd

    from geodata_ray.stages.relational import (
        grouped_aggregate,
        merge_aggregates,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 400),
            "v": rng.integers(-100, 100, 400).astype("int64"),
        }
    )
    specs = [("v", "count", "n"), ("v", "sum", "sv"), ("v", "max", "mx")]
    full = (
        grouped_aggregate(rd.from_pandas(df), ["k"], specs)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    a = grouped_aggregate(rd.from_pandas(df.iloc[:150]), ["k"], specs)
    b = grouped_aggregate(rd.from_pandas(df.iloc[150:]), ["k"], specs)
    merged = (
        merge_aggregates(a, b, ["k"], specs)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, full)
    with pytest.raises(ValueError):
        merge_aggregates(a, b, ["k"], [("v", "mean", "m")])


@pytest.mark.usefixtures("ray_session")
def test_skyline_2d_matches_bruteforce_with_ties():
    import ray.data as rd

    from geodata_ray.stages.relational import skyline_2d

    rng = np.random.default_rng(23)
    x = rng.integers(0, 40, 300)
    y = rng.integers(0, 40, 300)
    # inject exact coordinate duplicates (both must survive together)
    x[10], y[10] = x[0], y[0]
    df = pd.DataFrame({"i": range(300), "x": x, "y": y})
    got = (
        skyline_2d(rd.from_pandas(df).repartition(5), x_col="x", y_col="y")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    dominated = np.zeros(300, dtype=bool)
    for b in range(300):
        for a in range(300):
            if (
                x[a] >= x[b]
                and y[a] <= y[b]
                and (x[a] > x[b] or y[a] < y[b])
            ):
                dominated[b] = True
                break
    exp = df[~dominated].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )
