"""Eighteenth-wave tests: every query re-derived with an independent
pandas/numpy brute force over the sf0.001 parquet, so correctness does
not rest on the DuckDB oracle alone."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_q6_forecast_revenue_vs_pandas():
    from geodata_ray.pipelines.queries import q6_forecast_revenue

    li = _t("lineitem")
    cents = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    bp = np.round(li.l_discount.to_numpy() * 10000).astype(np.int64)
    keep = (
        (li.l_shipdate >= "1996-01-01").to_numpy()
        & (li.l_shipdate < "1997-01-01").to_numpy()
        & (bp >= 500) & (bp <= 700)
        & (li.l_quantity < 24).to_numpy()
    )
    exp_rev = int((cents[keep] * bp[keep]).sum())
    exp_n = int(keep.sum())
    assert exp_n > 0  # fixture must exercise the filter
    got = q6_forecast_revenue(SF_DIR).to_pandas()
    assert len(got) == 1
    assert int(got.revenue_micro.iloc[0]) == exp_rev
    assert int(got.n_lines.iloc[0]) == exp_n


@pytest.mark.usefixtures("ray_session")
def test_q12_late_lines_priority_vs_pandas():
    from geodata_ray.pipelines.queries import q12_late_lines_priority

    li = _t("lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])
    orders = _t("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late = j[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=60)]
    assert len(late) > 0
    hi = late.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    exp = pd.DataFrame({
        "high": hi.astype(int), "low": (~hi).astype(int),
        "flag": late.l_returnflag,
    }).groupby("flag").sum()
    got = q12_late_lines_priority(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(exp.loc[r.l_returnflag, "high"]) == int(r.high_line_count)
        assert int(exp.loc[r.l_returnflag, "low"]) == int(r.low_line_count)


def _brute_jaccard_pairs(threshold=0.5):
    from geodata_ray.pipelines.queries import (
        _MUT_OFFSET,
        _MUT_SUFFIX,
        _NDUP_LIMIT,
    )

    docs = _t("documents", ["doc_id", "text"])
    docs = docs[docs.doc_id < _NDUP_LIMIT]
    corpus = {}
    for r in docs.itertuples():
        corpus[int(r.doc_id)] = r.text
        corpus[int(r.doc_id) + _MUT_OFFSET] = r.text + _MUT_SUFFIX

    def sh(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in corpus.items()}
    ids = sorted(sets)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= threshold:
                pairs.append((a, b))
    return pairs


@pytest.mark.usefixtures("ray_session")
def test_near_dup_clusters_vs_bruteforce():
    from geodata_ray.pipelines.queries import near_dup_clusters_docs

    pairs = _brute_jaccard_pairs()
    assert pairs  # mutated corpus guarantees at least the planted dups
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
    exp = {min(v): len(v) for v in clusters.values()}
    got = near_dup_clusters_docs(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[int(r.cluster_id)] == int(r.cluster_size)


@pytest.mark.usefixtures("ray_session")
def test_association_rules_vs_pandas():
    from geodata_ray.pipelines.queries import association_rules_events

    ev = _t("events", ["user_id", "event_type"]).drop_duplicates()
    per_type = ev.groupby("event_type").user_id.nunique()
    n_users = ev.user_id.nunique()
    j = ev.merge(ev, on="user_id")
    j = j[j.event_type_x < j.event_type_y]
    exp = j.groupby(["event_type_x", "event_type_y"]).size()
    got = association_rules_events(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(exp.loc[(r.type_a, r.type_b)]) == int(r.n_ab)
        assert int(per_type[r.type_a]) == int(r.n_a)
        assert int(per_type[r.type_b]) == int(r.n_b)
        assert int(n_users) == int(r.n_users)


@pytest.mark.usefixtures("ray_session")
def test_hll_merge_types_vs_numpy():
    from geodata_ray.pipelines.queries import hll_merge_types_events
    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.sketch import HLL_P, hll_rank_batch

    ev = _t("events", ["user_id", "event_type"])

    def regs(t):
        u = np.unique(
            ev[ev.event_type == t].user_id.to_numpy().astype(np.int64)
        )
        reg, rank = hll_rank_batch(splitmix64(u.view(np.uint64)), HLL_P)
        out = np.zeros(1 << HLL_P, dtype=np.int64)
        np.maximum.at(out, reg, rank)
        return out

    rv, rc = regs("view"), regs("click")
    got = hll_merge_types_events(SF_DIR).to_pandas()
    hit = np.flatnonzero(np.maximum(rv, rc))
    assert len(got) == hit.size
    for r in got.itertuples():
        i = int(r.register)
        assert int(rv[i]) == int(r.rank_view)
        assert int(rc[i]) == int(r.rank_click)
        assert int(max(rv[i], rc[i])) == int(r.rank_union)


@pytest.mark.usefixtures("ray_session")
def test_ntile_vs_pandas():
    from geodata_ray.pipelines.queries import ntile_value_users

    ev = _t("events", ["user_id", "value"])
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    agg = (
        pd.DataFrame({"user_id": ev.user_id, "cents": cents})
        .groupby("user_id", as_index=False).cents.sum()
        .sort_values(["cents", "user_id"]).reset_index(drop=True)
    )
    n = len(agg)
    k, m = divmod(n, 4)
    r = np.arange(n)
    big = m * (k + 1)
    tile = np.where(r < big, r // (k + 1),
                    m + (r - big) // max(k, 1)) + 1
    agg["tile"] = tile
    got = ntile_value_users(SF_DIR).to_pandas().sort_values(
        ["cents", "user_id"]).reset_index(drop=True)
    assert len(got) == n
    assert (got.user_id.to_numpy() == agg.user_id.to_numpy()).all()
    assert (got.cents.to_numpy() == agg.cents.to_numpy()).all()
    assert (got.tile.to_numpy() == agg.tile.to_numpy()).all()
