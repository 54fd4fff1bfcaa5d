"""Nineteenth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet for every query."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_kmv_sketch_vs_numpy():
    from geodata_ray.pipelines.queries import kmv_sketch_events
    from geodata_ray.sources.synth import splitmix64

    u = np.unique(_t("events", ["user_id"]).user_id.to_numpy()
                  .astype(np.int64))
    hv = np.sort(splitmix64(u.view(np.uint64)).view(np.int64))[:64]
    got = kmv_sketch_events(SF_DIR).to_pandas().sort_values("rank")
    assert len(got) == min(64, u.size)
    assert (got.hash_i64.to_numpy() == hv).all()
    assert (got["rank"].to_numpy() == np.arange(1, len(got) + 1)).all()


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_vs_numpy():
    from geodata_ray.pipelines.queries import weighted_median_lineitem

    li = _t("lineitem", ["l_extendedprice", "l_quantity"])
    cents = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    w = np.round(li.l_quantity.to_numpy()).astype(np.int64)
    order = np.argsort(cents, kind="stable")
    cents, w = cents[order], w[order]
    cw = np.cumsum(w)
    W = int(cw[-1])
    exp = int(cents[np.searchsorted(cw * 2, W)])  # smallest 2*cw >= W
    got = weighted_median_lineitem(SF_DIR).to_pandas()
    assert len(got) == 1
    assert int(got.median_cents.iloc[0]) == exp
    assert int(got.total_weight.iloc[0]) == W


@pytest.mark.usefixtures("ray_session")
def test_range_partition_plan_vs_numpy():
    from geodata_ray.pipelines.queries import range_partition_plan_events

    import math

    v = np.sort(np.round(_t("events", ["value"]).value.to_numpy() * 100)
                .astype(np.int64))
    n = v.size
    bounds = np.array([v[math.ceil(i * n / 16) - 1] for i in range(1, 16)],
                      dtype=np.int64)
    pid = np.searchsorted(bounds, v, side="left")
    got = range_partition_plan_events(SF_DIR).to_pandas()
    exp = pd.DataFrame({"pid": pid, "v": v}).groupby("pid").agg(
        n_rows=("v", "size"), min_cents=("v", "min"),
        max_cents=("v", "max"))
    assert len(got) == len(exp)
    # realized sizes must be near-equi-depth (no partition > 2x ideal)
    assert got.n_rows.max() <= 2 * (n // 16 + 1)
    for r in got.itertuples():
        e = exp.loc[int(r.partition_id)]
        assert (int(e.n_rows), int(e.min_cents), int(e.max_cents)) == (
            int(r.n_rows), int(r.min_cents), int(r.max_cents))


@pytest.mark.usefixtures("ray_session")
def test_class_balance_vs_pandas():
    from geodata_ray.pipelines.queries import class_balance_docs

    docs = _t("documents", ["doc_id", "lang"])
    cnt = docs.groupby("lang").size()
    target = int(cnt.max())
    docs = docs.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    docs["rk"] = docs.groupby("lang").cumcount()
    docs["exp"] = docs.lang.map(lambda l: target // cnt[l]) + (
        docs.rk < docs.lang.map(lambda l: target % cnt[l])
    ).astype(int)
    got = class_balance_docs(SF_DIR).to_pandas()
    assert len(got) == len(docs)
    gm = dict(zip(got.doc_id, got.n_copies))
    for r in docs.itertuples():
        assert gm[r.doc_id] == r.exp
    # every class must sum exactly to the majority size
    s = got.groupby("lang").n_copies.sum()
    assert (s == target).all()


@pytest.mark.usefixtures("ray_session")
def test_interarrival_median_vs_pandas():
    from geodata_ray.pipelines.queries import interarrival_median_users

    import math

    ev = _t("events", ["user_id", "ts", "event_id"]).sort_values(
        ["user_id", "ts", "event_id"]).reset_index(drop=True)
    ev["us"] = ev.ts.values.astype("datetime64[us]").astype(np.int64)
    exp = {}
    for uid, g in ev.groupby("user_id"):
        gaps = np.sort(np.diff(g.us.to_numpy()))
        if gaps.size:
            exp[int(uid)] = int(gaps[math.ceil(0.5 * gaps.size) - 1])
    got = interarrival_median_users(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(r.q_pct) == 50
        assert exp[int(r.user_id)] == int(r.gap_us)


@pytest.mark.usefixtures("ray_session")
def test_string_agg_daily_types_vs_pandas():
    from geodata_ray.pipelines.queries import string_agg_daily_types_events

    ev = _t("events", ["ts", "event_type"])
    ev["day"] = ev.ts.dt.floor("D")
    exp = ev.groupby("day").event_type.agg(
        lambda s: ",".join(sorted(set(s))))
    got = string_agg_daily_types_events(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp.loc[pd.Timestamp(r.day)]
        assert e == r.types_csv
        assert len(e.split(",")) == int(r.n_types)
