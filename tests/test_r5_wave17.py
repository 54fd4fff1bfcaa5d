"""Seventeenth-wave (TPC-H completion) tests: every query re-derived
with an independent pandas brute force over the sf0.001 parquet, so
correctness does not rest on the DuckDB oracle alone."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


def _rev_micro(df):
    cents = np.round(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    bp = np.round(df["l_discount"].to_numpy() * 10000.0).astype(np.int64)
    return cents * (10000 - bp)


def _supp_nation():
    sup = _t("supplier", ["s_suppkey", "s_nationkey"])
    nat = _t("nation", ["n_nationkey", "n_name"])
    return sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"n_name": "supp_nation"})


@pytest.mark.usefixtures("ray_session")
def test_q7_nation_volume_vs_pandas():
    from geodata_ray.pipelines.queries import q7_nation_volume

    li = _t("lineitem")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1998-01-01")]
    li = li.assign(rev=_rev_micro(li), l_year=li.l_shipdate.dt.year)
    li = li.merge(_supp_nation(), left_on="l_suppkey", right_on="s_suppkey")
    orders = _t("orders", ["o_orderkey", "o_custkey"])
    cust = _t("customer", ["c_custkey", "c_nationkey"])
    nat = _t("nation", ["n_nationkey", "n_name"])
    cust = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    ).rename(columns={"n_name": "cust_nation"})
    j = j[j.supp_nation != j.cust_nation]
    exp = (
        j.groupby(["supp_nation", "cust_nation", "l_year"])["rev"]
        .sum()
        .reset_index()
    )
    got = q7_nation_volume(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    gm = {
        (r.supp_nation, r.cust_nation, int(r.l_year)): int(r.revenue_micro)
        for r in got.itertuples()
    }
    for r in exp.itertuples():
        assert gm[(r.supp_nation, r.cust_nation, int(r.l_year))] == int(r.rev)


@pytest.mark.usefixtures("ray_session")
def test_q9_profit_vs_pandas():
    from geodata_ray.pipelines.queries import q9_profit_by_nation_year

    li = _t("lineitem")
    part = _t("part", ["p_partkey", "p_name"])
    red = part[part.p_name.str.startswith("red ")]
    li = li.merge(red, left_on="l_partkey", right_on="p_partkey")
    li = li.assign(rev=_rev_micro(li))
    li = li.merge(_supp_nation(), left_on="l_suppkey", right_on="s_suppkey")
    orders = _t("orders", ["o_orderkey", "o_orderdate"])
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j = j.assign(o_year=j.o_orderdate.dt.year)
    exp = j.groupby(["supp_nation", "o_year"])["rev"].sum()
    got = q9_profit_by_nation_year(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(exp.loc[(r.supp_nation, int(r.o_year))]) == int(
            r.profit_micro
        )


@pytest.mark.usefixtures("ray_session")
def test_q14_promo_revenue_vs_pandas():
    from geodata_ray.pipelines.queries import q14_promo_revenue

    li = _t("lineitem")
    li = li[(li.l_shipdate >= "1996-09-01") & (li.l_shipdate < "1996-10-01")]
    part = _t("part", ["p_partkey", "p_type"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    rev = _rev_micro(j)
    promo = int(rev[(j.p_type == "PROMO").to_numpy()].sum())
    got = q14_promo_revenue(SF_DIR).to_pandas()
    assert len(got) == 1
    assert int(got.promo_rev_micro.iloc[0]) == promo
    assert int(got.total_rev_micro.iloc[0]) == int(rev.sum())
    assert int(got.n_lines.iloc[0]) == len(j)
    assert int(got.promo_rev_micro.iloc[0]) <= int(got.total_rev_micro.iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_q15_top_supplier_vs_pandas():
    from geodata_ray.pipelines.queries import q15_top_supplier

    li = _t("lineitem")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")]
    rev = (
        li.assign(rev=_rev_micro(li)).groupby("l_suppkey")["rev"].sum()
    )
    best = int(rev.max())
    winners = set(rev[rev == best].index)
    got = q15_top_supplier(SF_DIR).to_pandas()
    assert set(got.s_suppkey) == winners
    assert (got.total_revenue_micro == best).all()


@pytest.mark.usefixtures("ray_session")
def test_q17_small_quantity_vs_pandas():
    from geodata_ray.pipelines.queries import q17_small_quantity_revenue

    li = _t("lineitem")
    part = _t("part", ["p_partkey", "p_brand"])
    b3 = part[part.p_brand == "Brand#3"]
    j = li.merge(b3, left_on="l_partkey", right_on="p_partkey")
    qty = np.round(j.l_quantity.to_numpy()).astype(np.int64)
    j = j.assign(qty=qty)
    g = j.groupby("l_partkey")["qty"].agg(["sum", "count"])
    j = j.merge(g, left_on="l_partkey", right_index=True)
    keep = 5 * j["qty"].to_numpy() * j["count"].to_numpy() < j["sum"].to_numpy()
    cents = np.round(j.l_extendedprice.to_numpy() * 100.0).astype(np.int64)
    got = q17_small_quantity_revenue(SF_DIR).to_pandas()
    assert len(got) == 1
    assert int(got.total_price_cents.iloc[0]) == int(cents[keep].sum())
    assert int(got.n_lines.iloc[0]) == int(keep.sum())


@pytest.mark.usefixtures("ray_session")
def test_q19_or_predicates_vs_pandas():
    from geodata_ray.pipelines.queries import q19_or_predicates_revenue

    li = _t("lineitem")
    part = _t("part", ["p_partkey", "p_brand", "p_size"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    q = np.round(j.l_quantity.to_numpy()).astype(np.int64)
    sz = j.p_size.to_numpy().astype(np.int64)
    br = j.p_brand.to_numpy()
    m = (
        ((br == "Brand#1") & (q >= 1) & (q <= 11) & (sz >= 1) & (sz <= 5))
        | ((br == "Brand#2") & (q >= 10) & (q <= 20) & (sz >= 1) & (sz <= 10))
        | ((br == "Brand#3") & (q >= 20) & (q <= 30) & (sz >= 1) & (sz <= 15))
    )
    sel = j[m].assign(rev=_rev_micro(j[m]))
    exp = sel.groupby("p_brand")["rev"].agg(["sum", "count"])
    got = q19_or_predicates_revenue(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(exp.loc[r.p_brand, "sum"]) == int(r.revenue_micro)
        assert int(exp.loc[r.p_brand, "count"]) == int(r.n_lines)


@pytest.mark.usefixtures("ray_session")
def test_q2_min_cost_supplier_vs_pandas():
    from geodata_ray.pipelines.queries import q2_min_cost_supplier

    part = _t("part", ["p_partkey", "p_size", "p_type"])
    pk = set(part[(part.p_size == 15) & (part.p_type == "STANDARD")].p_partkey)
    sup = _supp_nation()
    nat = _t("nation", ["n_name", "n_regionkey"])
    reg = _t("region", ["r_regionkey", "r_name"])
    eu = set(
        nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .query("r_name == 'EUROPE'")
        .n_name
    )
    eus = set(sup[sup.supp_nation.isin(eu)].s_suppkey)
    li = _t("lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    li = li[li.l_partkey.isin(pk) & li.l_suppkey.isin(eus)]
    cents = np.round(li.l_extendedprice.to_numpy() * 100.0).astype(np.int64)
    li = li.assign(cents=cents)
    cost = li.groupby(["l_partkey", "l_suppkey"])["cents"].min().reset_index()
    best = cost.groupby("l_partkey")["cents"].min()
    exp = cost[
        cost.cents.to_numpy() == best.loc[cost.l_partkey].to_numpy()
    ]
    got = q2_min_cost_supplier(SF_DIR).to_pandas()
    names = _t("supplier", ["s_suppkey", "s_name"]).set_index("s_suppkey")
    exp_keys = {
        (names.loc[r.l_suppkey, "s_name"], int(r.l_partkey), int(r.cents))
        for r in exp.itertuples()
    }
    got_keys = {
        (r.s_name, int(r.p_partkey), int(r.min_cost_cents))
        for r in got.itertuples()
    }
    assert got_keys == exp_keys


@pytest.mark.usefixtures("ray_session")
def test_q8_market_share_vs_pandas():
    from geodata_ray.pipelines.queries import q8_market_share

    li = _t("lineitem")
    part = _t("part", ["p_partkey", "p_type"])
    li = li.merge(part[part.p_type == "PROMO"], left_on="l_partkey",
                  right_on="p_partkey")
    li = li.assign(rev=_rev_micro(li))
    li = li.merge(_supp_nation(), left_on="l_suppkey", right_on="s_suppkey")
    orders = _t("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders[
        (orders.o_orderdate >= "1996-01-01")
        & (orders.o_orderdate < "1998-01-01")
    ]
    cust = _t("customer", ["c_custkey", "c_nationkey"])
    nat = _t("nation", ["n_nationkey", "n_regionkey"])
    reg = _t("region", ["r_regionkey", "r_name"])
    am = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    am = set(am[am.r_name == "AMERICA"].n_nationkey)
    cust = cust[cust.c_nationkey.isin(am)]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    j = j.assign(o_year=j.o_orderdate.dt.year)
    got = q8_market_share(SF_DIR).to_pandas()
    exp_tot = j.groupby("o_year")["rev"].sum()
    exp_nat = j[j.supp_nation == "NATION_3"].groupby("o_year")["rev"].sum()
    assert len(got) == len(exp_tot)
    for r in got.itertuples():
        assert int(exp_tot.loc[int(r.o_year)]) == int(r.total_rev_micro)
        assert int(exp_nat.get(int(r.o_year), 0)) == int(r.nation_rev_micro)


@pytest.mark.usefixtures("ray_session")
def test_q11_important_parts_vs_pandas():
    from geodata_ray.pipelines.queries import q11_important_parts

    li = _t("lineitem")
    li = li.assign(rev=_rev_micro(li))
    v = li.groupby("l_partkey")["rev"].sum()
    total = int(v.sum())
    exp = v[v > (3 * total) // (2 * len(v))]  # > 1.5x avg part value
    assert len(exp) > 0  # scale-invariant threshold stays non-empty
    got = q11_important_parts(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(exp.loc[int(r.p_partkey)]) == int(r.value_micro)


@pytest.mark.usefixtures("ray_session")
def test_q13_order_count_distribution_vs_pandas():
    from geodata_ray.pipelines.queries import q13_order_count_distribution

    orders = _t("orders", ["o_custkey", "o_orderpriority"])
    orders = orders[orders.o_orderpriority != "5-LOW"]
    cust = _t("customer", ["c_custkey"])
    cnt = orders.groupby("o_custkey").size()
    c_count = cust.c_custkey.map(cnt).fillna(0).astype(np.int64)
    exp = c_count.value_counts()
    got = q13_order_count_distribution(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    # zero-order customers must be represented iff any exist
    assert int(got.custdist.sum()) == len(cust)
    for r in got.itertuples():
        assert int(exp.loc[int(r.c_count)]) == int(r.custdist)


@pytest.mark.usefixtures("ray_session")
def test_q16_supplier_part_counts_vs_pandas():
    from geodata_ray.pipelines.queries import q16_supplier_part_counts

    li = _t("lineitem", ["l_partkey", "l_suppkey"])
    li = li[li.l_suppkey % 7 != 0].drop_duplicates()
    part = _t("part", ["p_partkey", "p_brand", "p_type", "p_size"])
    part = part[
        (part.p_brand != "Brand#1")
        & (part.p_type != "PROMO")
        & part.p_size.isin([1, 4, 9, 16, 25, 36, 49])
    ]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    exp = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
    )
    got = q16_supplier_part_counts(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert int(exp.loc[(r.p_brand, r.p_type, r.p_size)]) == int(
            r.supplier_cnt
        )


@pytest.mark.usefixtures("ray_session")
def test_q20_qty_semijoin_vs_pandas():
    from geodata_ray.pipelines.queries import q20_qty_semijoin

    li = _t("lineitem")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1997-01-01")]
    part = _t("part", ["p_partkey", "p_name"])
    small = part[part.p_name.str.startswith("small ")]
    j = li.merge(small, left_on="l_partkey", right_on="p_partkey")
    qty = np.round(j.l_quantity.to_numpy()).astype(np.int64)
    g = j.assign(qty=qty).groupby(["l_suppkey", "l_partkey"])["qty"].sum()
    exp = set(g[g > 50].index.get_level_values(0))
    got = q20_qty_semijoin(SF_DIR).to_pandas()
    assert set(got.s_suppkey) == exp


@pytest.mark.usefixtures("ray_session")
def test_q21_sole_late_supplier_vs_pandas():
    from geodata_ray.pipelines.queries import q21_sole_late_supplier

    orders = _t("orders", ["o_orderkey", "o_orderstatus", "o_orderdate"])
    orders = orders[orders.o_orderstatus == "F"]
    li = _t("lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late = (
        j.l_shipdate > j.o_orderdate + pd.Timedelta(days=60)
    ).astype(np.int64)
    lo = (
        j.assign(late=late)
        .groupby(["l_orderkey", "l_suppkey"])["late"]
        .max()
        .reset_index()
    )
    og = lo.groupby("l_orderkey")["late"].agg(["count", "sum"])
    lo = lo.merge(og, left_on="l_orderkey", right_index=True)
    qual = lo[(lo.late == 1) & (lo["count"] >= 2) & (lo["sum"] == 1)]
    names = _t("supplier", ["s_suppkey", "s_name"]).set_index("s_suppkey")
    exp = qual.groupby("l_suppkey").size()
    got = q21_sole_late_supplier(SF_DIR).to_pandas()
    assert len(got) == len(exp)
    exp_by_name = {
        names.loc[k, "s_name"]: int(v) for k, v in exp.items()
    }
    for r in got.itertuples():
        assert exp_by_name[r.s_name] == int(r.numwait)
