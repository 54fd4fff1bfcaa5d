"""Keyed stateful actors vs the window-function reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_keyed_running_aggregate_matches_window_function():
    import ray.data as rd

    from geodata_ray.stages.streaming import keyed_running_aggregate

    rng = np.random.default_rng(19)
    n = 5000
    t = pa.table(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": pa.array(
                np.datetime64("2024-01-01", "us")
                + rng.permutation(n).astype("timedelta64[s]").astype(
                    "timedelta64[us]"
                )
            ),
            "cents": rng.integers(1, 1000, n),
        }
    )
    ds = rd.from_arrow(t).repartition(7)
    result = keyed_running_aggregate(
        ds, key_col="user_id", ts_col="ts", value_col="cents", num_buckets=4,
        batch_size=512,
    )
    # scale contract: the (input-sized) output must stay in the object
    # store, not be concatenated on the driver
    assert isinstance(result, rd.Dataset)
    out = result.to_pandas()

    # pandas window-function reference (ts is unique by construction)
    ref = t.to_pandas().sort_values("ts", ignore_index=True)
    ref["running_sum"] = ref.groupby("user_id").cents.cumsum()
    ref["running_n"] = ref.groupby("user_id").cumcount() + 1

    merged = out.merge(
        ref, on=["user_id", "ts", "cents"], suffixes=("", "_ref")
    )
    assert len(merged) == n
    assert (merged.running_sum == merged.running_sum_ref).all()
    assert (merged.running_n == merged.running_n_ref).all()
    # final per-user totals match exactly
    fin = out.sort_values("ts").groupby("user_id").running_sum.last()
    want = ref.groupby("user_id").cents.sum()
    pd.testing.assert_series_equal(
        fin.sort_index(), want.sort_index(), check_names=False
    )


@pytest.mark.usefixtures("ray_session")
def test_streaming_exact_dedup_first_occurrence():
    """Seen-set actor shards keep exactly the min-order row per
    fingerprint regardless of input block structure."""
    import ray.data as rd

    from geodata_ray.stages.streaming import streaming_exact_dedup

    rng = np.random.default_rng(31)
    fps = rng.integers(0, 40, 200).astype(np.int64)  # heavy repeats
    ids = np.arange(200, dtype=np.int64)
    t = pa.table({"rid": pa.array(rng.permutation(ids)), "fp": pa.array(fps)})

    out = streaming_exact_dedup(
        rd.from_arrow(t).repartition(7), order_col="rid", fp_col="fp",
        num_buckets=4, batch_size=16,
    ).to_pandas().sort_values("rid", ignore_index=True)

    df = t.to_pandas()
    want = (
        df.sort_values("rid")
        .groupby("fp", sort=False).head(1)
        .sort_values("rid", ignore_index=True)
    )
    assert out[["rid", "fp"]].values.tolist() == want[["rid", "fp"]].values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_streaming_exact_dedup_rejects_bad_fp_dtype():
    """int32 fingerprints would be silently reinterpreted by the uint64
    bit view; the stage must refuse them loudly (ADVICE r3)."""
    import ray.data as rd

    from geodata_ray.stages.streaming import streaming_exact_dedup

    t = pa.table(
        {
            "rid": pa.array(np.arange(10, dtype=np.int64)),
            "fp": pa.array(np.arange(10, dtype=np.int32)),
        }
    )
    with pytest.raises(ValueError, match="int64/uint64"):
        streaming_exact_dedup(
            rd.from_arrow(t), order_col="rid", fp_col="fp", num_buckets=2
        )


@pytest.mark.usefixtures("ray_session")
def test_session_attribution_first_last_ties():
    import ray.data as rd

    from geodata_ray.stages.windows import session_attribution

    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60, "s")
    # user 1: two sessions; second session has two events at the SAME
    # ts -> tie broken by event_id
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": [base, base + 5 * m, base + 120 * m, base + 120 * m,
                   base + 7 * m],
            "event_id": [10, 11, 13, 12, 20],
            "event_type": ["view", "click", "buy", "add", "view"],
            "cents": [100, 200, 300, 400, 500],
        }
    )
    out = (
        session_attribution(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    s1, s2, s3 = out.iloc[0], out.iloc[1], out.iloc[2]
    assert (s1.first_type, s1.last_type, s1.n_events, s1.value_sum) == (
        "view", "click", 2, 300)
    # same-ts tie: event_id 12 ("add") sorts before 13 ("buy")
    assert (s2.first_type, s2.last_type, s2.value_sum) == ("add", "buy", 700)
    assert s3.user_id == 2 and s3.n_events == 1


@pytest.mark.usefixtures("ray_session")
def test_ewma_halving_matches_scalar_recursion():
    import ray.data as rd

    from geodata_ray.stages.windows import ewma_halving

    rng = np.random.default_rng(17)
    n = 400
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n),
            "ts": base + rng.integers(0, 10**6, n).astype("timedelta64[s]"),
            "event_id": np.arange(n),
            "cents": rng.integers(0, 5000, n).astype("int64"),
        }
    )
    out = (
        ewma_halving(rd.from_pandas(df).repartition(5), num_buckets=4)
        .to_pandas()
        .set_index("event_id")["ewma"]
        .to_dict()
    )
    exp = {}
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby(
        "user_id"
    ):
        s = None
        for _, row in g.iterrows():
            s = row.cents if s is None else (s + row.cents) // 2
            exp[row.event_id] = s
    assert out == exp
    # negative values are refused, not silently floored
    bad = df.copy()
    bad.loc[0, "cents"] = -1
    with pytest.raises(Exception):
        ewma_halving(rd.from_pandas(bad), num_buckets=2).materialize()
