"""Eighth-wave operator tests (round 5): OHLC bars, CUSUM change
points, winnowing fingerprints, k-core peeling, hourly gap-fill."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_ohlc_candles_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.stages.windows import ohlc_candles

    rng = np.random.default_rng(11)
    n = 5000
    key = rng.integers(0, 7, n).astype(np.int64)
    ts = rng.integers(0, 500, n).astype(np.int64)  # heavy ts ties
    tie = np.arange(n, dtype=np.int64)
    val = rng.integers(-1000, 1000, n).astype(np.int64)
    t = pa.table(
        {"k": pa.array(key), "ts": pa.array(ts),
         "event_id": pa.array(tie), "cents": pa.array(val)}
    )
    res = (
        ohlc_candles(
            rd.from_arrow(t).repartition(9),
            key_cols=["k"], ts_col="ts", tie_col="event_id",
            val_col="cents",
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    for kk in np.unique(key):
        sel = key == kk
        o = np.lexsort((tie[sel], ts[sel]))
        r = res[res["k"] == kk].iloc[0]
        assert int(r.open_cents) == int(val[sel][o[0]])
        assert int(r.close_cents) == int(val[sel][o[-1]])
        assert int(r.high_cents) == int(val[sel].max())
        assert int(r.low_cents) == int(val[sel].min())
        assert int(r.n_rows) == int(sel.sum())


@pytest.mark.usefixtures("ray_session")
def test_cusum_changepoint_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.stages.windows import cusum_changepoint

    rng = np.random.default_rng(13)
    n = 3000
    key = rng.integers(0, 30, n).astype(np.int64)
    ts = rng.integers(0, 10**6, n).astype(np.int64)
    tie = np.arange(n, dtype=np.int64)
    val = rng.integers(-500, 500, n).astype(np.int64)
    # plant a real mean shift in key 0
    sel0 = key == 0
    half = np.flatnonzero(sel0)[sel0.sum() // 2:]
    val[half] += 2000
    t = pa.table(
        {"user_id": pa.array(key), "ts": pa.array(ts),
         "event_id": pa.array(tie), "cents": pa.array(val)}
    )
    res = (
        cusum_changepoint(rd.from_arrow(t).repartition(5), min_n=8)
        .to_pandas()
        .set_index("user_id")
    )
    for kk in np.unique(key):
        sel = key == kk
        m = int(sel.sum())
        if m < 8:
            assert kk not in res.index
            continue
        o = np.lexsort((tie[sel], ts[sel]))
        y = val[sel][o]
        cs = np.cumsum(y)
        stat = np.abs(m * cs[:-1] - np.arange(1, m) * cs[-1])
        best = int(stat.argmax())  # first occurrence = smallest i
        r = res.loc[kk]
        assert int(r.n) == m
        assert int(r.split_i) == best + 1
        assert int(r.stat) == int(stat[best])


def test_cusum_overflow_guard():
    import ray.data as rd

    from geodata_ray.stages.windows import cusum_changepoint

    t = pa.table(
        {
            "user_id": pa.array([1] * 10, pa.int64()),
            "ts": pa.array(list(range(10)), pa.int64()),
            "event_id": pa.array(list(range(10)), pa.int64()),
            "cents": pa.array([2**60] * 10, pa.int64()),
        }
    )
    with pytest.raises(Exception, match="int64"):
        cusum_changepoint(rd.from_arrow(t), min_n=8).to_pandas()


def test_winnowing_vs_bruteforce():
    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.textstats import winnowing_fingerprints

    rng = np.random.default_rng(3)
    texts = [
        "".join(rng.choice(list("abcd "), size=rng.integers(0, 60)))
        for _ in range(200)
    ]
    texts += ["short", "", None,
              "ThisIsMixedCase With Spaces and more text here",
              "café non-ascii prefix must be skipped entirely"]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}
    )
    got = winnowing_fingerprints(t, k=8, w=4, prefix_len=200).to_pandas()
    got_set = set(map(tuple, got[["doc_id", "pos", "fp"]].to_numpy()))

    def brute(doc_id, s, k=8, w=4):
        if s is None:
            return set()
        s = s.lower()[:200]
        if len(s) < k + w - 1 or not s.isascii():
            return set()
        b = s.encode("ascii")
        hs = [
            int(splitmix64(np.uint64(
                sum(b[i + j] << (8 * j) for j in range(k))
            )))
            for i in range(len(b) - k + 1)
        ]
        out = set()
        for e in range(w - 1, len(hs)):
            window = hs[e - w + 1:e + 1]
            mn = min(window)
            for j in range(w - 1, -1, -1):  # rightmost min
                if window[j] == mn:
                    pos = e - w + 1 + j
                    break
            out.add((doc_id, pos + 1, int(np.uint64(mn).astype(np.int64))))
        return out

    want = set()
    for i, s in zip(ids, texts):
        want |= brute(int(i), s)
    assert got_set == want
    # the non-ascii doc contributed nothing
    assert not any(d == ids[-1] for d, _, _ in got_set)


@pytest.mark.usefixtures("ray_session")
def test_k_core_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.stages.graphcc import k_core

    rng = np.random.default_rng(3)
    u = rng.integers(0, 60, 800).astype(np.int64)
    v = rng.integers(0, 60, 800).astype(np.int64)
    eb = pa.table({"u": pa.array(u), "v": pa.array(v)})

    E = set()
    for a, b in zip(u, v):
        if a != b:
            E.add((int(a), int(b)))
            E.add((int(b), int(a)))

    for K in (3, 8, 15, 40):
        got = k_core(
            rd.from_arrow(eb).repartition(4), k=K, max_rounds=12
        ).to_pandas()
        alive = set(x for p in E for x in p)
        for _ in range(12):
            deg = {}
            for a, b in E:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
            new = set(x for x in alive if deg.get(x, 0) >= K)
            if new == alive:
                break
            alive = new
        deg = {}
        for a, b in E:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
        want = sorted((x, deg[x]) for x in alive if deg.get(x, 0) > 0)
        if not want:
            assert len(got) == 0
            continue
        got_pairs = sorted(
            map(tuple, got[["node", "core_degree"]].to_numpy())
        )
        assert got_pairs == want


@pytest.mark.usefixtures("ray_session")
def test_gapfill_hourly_counts():
    import collections

    import ray.data as rd

    from geodata_ray.stages.windows import gapfill_hourly_counts

    rng = np.random.default_rng(5)
    ts = (
        np.datetime64("2024-01-01")
        + rng.integers(0, 3600 * 72, 2000).astype("timedelta64[s]")
    ).astype("datetime64[us]")
    et = np.array(["a", "b", "c"])[rng.integers(0, 3, 2000)]
    t = pa.table({"event_type": pa.array(et), "ts": pa.array(ts)})
    got = gapfill_hourly_counts(rd.from_arrow(t).repartition(3)).to_pandas()

    hrs = ts.astype("datetime64[h]").astype(np.int64)
    h0, h1 = int(hrs.min()), int(hrs.max())
    assert len(got) == 3 * (h1 - h0 + 1)
    assert int(got.n_events.sum()) == 2000
    want = collections.Counter(zip(et, hrs))
    for _, r in got.iterrows():
        assert want.get((r.event_type, r.hour), 0) == r.n_events

    # spine guard
    far = pa.table(
        {
            "event_type": pa.array(["a", "a"]),
            "ts": pa.array(
                np.array(
                    ["1970-01-01", "2100-01-01"], dtype="datetime64[us]"
                )
            ),
        }
    )
    with pytest.raises(ValueError, match="spine"):
        gapfill_hourly_counts(
            rd.from_arrow(far), max_spine_rows=1000
        )


@pytest.mark.usefixtures("ray_session")
def test_compact_cells_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.cellmath import qcell
    from geodata_ray.stages.raster import compact_cells

    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 4000)
    lon = rng.uniform(-180, 180, 4000)
    cells = qcell.latlng_to_cell(lat, lon, 4)
    t = pa.table({"cell": pa.array(cells)})
    got = np.sort(
        compact_cells(rd.from_arrow(t).repartition(5), min_res=2)
        .to_pandas()["cell"]
        .to_numpy()
    )

    # brute force peel
    cur = set(map(int, np.unique(cells)))
    final = set()
    for _ in range(2):  # res 4 -> 2
        from collections import Counter

        pc_ = Counter(int(qcell.cell_to_parent(np.int64(c))) for c in cur)
        full = {p for p, n in pc_.items() if n == 4}
        final |= {
            c for c in cur
            if int(qcell.cell_to_parent(np.int64(c))) not in full
        }
        cur = full
    final |= cur
    assert list(got) == sorted(final)
    # compaction must actually promote something at this density
    assert len(final) < len(set(map(int, cells)))


@pytest.mark.usefixtures("ray_session")
def test_hits_scores_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.stages.graphcc import hits_scores

    rng = np.random.default_rng(9)
    u = rng.integers(0, 40, 500).astype(np.int64)
    v = rng.integers(0, 40, 500).astype(np.int64)
    t = pa.table({"u": pa.array(u), "v": pa.array(v)})
    got = (
        hits_scores(rd.from_arrow(t).repartition(4))
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )

    E = sorted(set(zip(u.tolist(), v.tolist())))
    indeg = {}
    for a, b in E:
        indeg[b] = indeg.get(b, 0) + 1
    hub = {}
    for a, b in E:
        hub[a] = hub.get(a, 0) + indeg[b]
    auth = {}
    for a, b in E:
        if a in hub:
            auth[b] = auth.get(b, 0) + hub[a]
    nodes = sorted(set(hub) | set(auth))
    assert got["node"].tolist() == nodes
    assert got["hub"].tolist() == [hub.get(x, 0) for x in nodes]
    assert got["auth"].tolist() == [auth.get(x, 0) for x in nodes]


@pytest.mark.usefixtures("ray_session")
def test_winnowing_pairs_vs_bruteforce():
    import collections
    import itertools

    import ray.data as rd

    from geodata_ray.stages.textstats import (
        winnowing_fingerprints,
        winnowing_pair_candidates,
    )

    rng = np.random.default_rng(21)
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = []
    for i in range(60):
        if i % 3 == 0:
            texts.append(base + f" tail{i}")  # planted overlap family
        else:
            texts.append(
                "".join(rng.choice(list("abcdefg "), size=80))
            )
    t = pa.table(
        {"doc_id": pa.array(np.arange(60, dtype=np.int64)),
         "text": pa.array(texts, pa.string())}
    )
    fps = rd.from_arrow(t).repartition(4).map_batches(
        winnowing_fingerprints, batch_format="pyarrow"
    )
    got = (
        winnowing_pair_candidates(fps, min_shared=3, max_df=25)
        .to_pandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )

    # brute force over the stage's own fingerprints
    f = winnowing_fingerprints(t).to_pandas()
    by_doc = {
        d: set(g["fp"]) for d, g in f.groupby("doc_id")
    }
    df_count = collections.Counter()
    for d, s in by_doc.items():
        for fp in s:
            df_count[fp] += 1
    kept = {fp for fp, n in df_count.items() if n <= 25}
    want = []
    for a, b in itertools.combinations(sorted(by_doc), 2):
        shared = len((by_doc[a] & by_doc[b]) & kept)
        if shared >= 3:
            want.append((a, b, shared))
    got_pairs = list(map(tuple, got.to_numpy()))
    assert got_pairs == want
    assert len(want) > 0  # the planted family must match


@pytest.mark.usefixtures("ray_session")
def test_source_byte_entropy_vs_bruteforce():
    import collections

    import ray.data as rd

    from geodata_ray.stages.lm import qlog2_fixed
    from geodata_ray.stages.textstats import source_byte_entropy

    texts = ["aabbcc", "aaaa", "zzzzyy", "mixed text here", None, "x"]
    srcs = ["s1", "s1", "s2", "s2", "s2", "s3"]
    t = pa.table(
        {"source": pa.array(srcs, pa.string()),
         "text": pa.array(texts, pa.string())}
    )
    got = (
        source_byte_entropy(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    for s in ("s1", "s2", "s3"):
        blob = "".join(x for x, ss in zip(texts, srcs)
                       if ss == s and x is not None)
        cnt = collections.Counter(blob.encode("ascii"))
        total = sum(cnt.values())
        qn = int(qlog2_fixed(np.uint64(total)))
        h = sum(c * (qn - int(qlog2_fixed(np.uint64(c))))
                for c in cnt.values())
        assert int(got.loc[s, "n_bytes"]) == total
        assert int(got.loc[s, "entropy_q"]) == h


@pytest.mark.usefixtures("ray_session")
def test_maxsim_and_sq8_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.pipelines.queries import (
        maxsim_retrieval_embeddings,
        sq8_quantize_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet")
    X = np.floor(
        np.array(t["embedding"].to_pylist(), dtype=np.float32)
        .astype(np.float64) * 1048576.0
    ).astype(np.int64)
    ids = t["vec_id"].to_numpy()

    # maxsim brute force
    got = (
        maxsim_retrieval_embeddings(sf)
        .to_pandas()
        .sort_values("doc", ignore_index=True)
    )
    Q = X[ids < 4]
    docs = ids // 8
    for d in np.unique(docs):
        D = X[docs == d]
        want = sum(int((D @ q).max()) for q in Q)
        assert int(got.loc[got.doc == d, "maxsim"].iloc[0]) == want

    # sq8 brute force
    got2 = (
        sq8_quantize_embeddings(sf)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    lo = X.min(axis=0)
    rng = np.maximum(X.max(axis=0) - lo, 1)
    code = (X - lo[None, :]) * 255 // rng[None, :]
    assert (code >= 0).all() and (code <= 255).all()
    recon = lo[None, :] + code * rng[None, :] // 255
    err = np.abs(X - recon)
    w = np.arange(1, X.shape[1] + 1)
    assert got2["code_checksum"].tolist() == (code * w).sum(axis=1).tolist()
    assert got2["max_err"].tolist() == err.max(axis=1).tolist()
    assert got2["sum_err"].tolist() == err.sum(axis=1).tolist()


def test_winnowing_sliced_view_offsets():
    """A sliced Arrow batch (non-zero value offsets) must fingerprint
    identically to the same rows in a fresh array."""
    from geodata_ray.stages.textstats import winnowing_fingerprints

    texts = ["the quick brown fox jumps over it " * 3 for _ in range(10)]
    texts = [t + f"tail{i}" for i, t in enumerate(texts)]
    full = pa.table(
        {"doc_id": pa.array(np.arange(10, dtype=np.int64)),
         "text": pa.array(texts, pa.string())}
    )
    view = full.slice(4, 5)  # sliced buffers, offset > 0
    fresh = pa.table(
        {"doc_id": pa.array(np.arange(4, 9, dtype=np.int64)),
         "text": pa.array(texts[4:9], pa.string())}
    )
    a = winnowing_fingerprints(view).to_pandas()
    b = winnowing_fingerprints(fresh).to_pandas()
    cols = ["doc_id", "pos", "fp"]
    assert sorted(map(tuple, a[cols].to_numpy())) == \
        sorted(map(tuple, b[cols].to_numpy()))


@pytest.mark.usefixtures("ray_session")
def test_box_cover_cells_vs_bruteforce():
    from geodata_ray.cellmath import qcell
    from geodata_ray.pipelines.queries import (
        _derive_lat_np,
        _derive_lon_np,
        box_cover_cells_nations,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        box_cover_cells_nations(sf)
        .to_pandas()
        .sort_values(["nationkey", "cell"], ignore_index=True)
    )
    import pyarrow.parquet as pq

    nk = pq.read_table(f"{sf}/nation.parquet")["n_nationkey"] \
        .to_numpy().astype(np.int64)
    want = []
    for n in nk:
        lat_c = min(max(float(_derive_lat_np(np.array([n]))[0]), -80.0),
                    80.0)
        lon_c = min(max(float(_derive_lon_np(np.array([n]))[0]), -170.0),
                    170.0)
        hh, hw = 2 + n % 4, 3 + n % 5
        r0 = max(0, min(127, int(np.floor((lat_c - hh + 90) / 180 * 128))))
        r1 = max(0, min(127, int(np.floor((lat_c + hh + 90) / 180 * 128))))
        c0 = max(0, min(255, int(np.floor((lon_c - hw + 180) / 360 * 256))))
        c1 = max(0, min(255, int(np.floor((lon_c + hw + 180) / 360 * 256))))
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                want.append((int(n), (5 << 58) | (r << 29) | c))
    want.sort()
    assert list(map(tuple, got.to_numpy())) == want
    # every cell must decode back to res 5 and contain its box row
    res = qcell.cell_resolution(got["cell"].to_numpy())
    assert (res == 5).all()


@pytest.mark.usefixtures("ray_session")
def test_k_anonymity_and_kfold():
    from geodata_ray.pipelines.queries import (
        k_anonymity_events,
        kfold_split_docs,
    )

    sf = "/root/testdata/sf0.001"
    viol = k_anonymity_events(sf).to_pandas()
    assert (viol["n"] < 5).all()
    folds = kfold_split_docs(sf).to_pandas()
    assert set(folds["fold"].unique()) <= {0, 1, 2, 3, 4}
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert int(folds["n_docs"].sum()) == n_docs


@pytest.mark.usefixtures("ray_session")
def test_wave8_queries_vs_pandas_bruteforce():
    """Independent pandas recomputation (no DuckDB, no shared SQL) for
    the wave-8/9/10 queries whose only other check is the oracle gate."""
    import pandas as pd
    import pyarrow.parquet as pq

    from geodata_ray.pipelines.queries import (
        ab_test_events,
        late_shipment_priority,
        open_orders_daily,
        pr_curve_docs,
        q18_large_orders,
        q22_idle_customers,
    )

    sf = "/root/testdata/sf0.001"
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    cu = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    dc = pq.read_table(f"{sf}/documents.parquet").to_pandas()

    # --- late_shipment_priority
    got = late_shipment_priority(sf).to_pandas().set_index("l_returnflag")
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    late = (j.l_shipdate - j.o_orderdate).dt.days > 90
    high = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    for rf, g in j.assign(late=late, high=high).groupby("l_returnflag"):
        assert int(got.loc[rf, "high_late_count"]) == int(
            (g.late & g.high).sum()
        )
        assert int(got.loc[rf, "low_late_count"]) == int(
            (g.late & ~g.high).sum()
        )
        assert int(got.loc[rf, "n_lines"]) == len(g)

    # --- q18_large_orders
    got = q18_large_orders(sf).to_pandas().sort_values(
        "o_orderkey", ignore_index=True
    )
    qty = li.assign(q=li.l_quantity.round().astype(int)).groupby(
        "l_orderkey"
    )["q"].sum()
    big = qty[qty > 200]
    want = od[od.o_orderkey.isin(big.index)].merge(
        cu, left_on="o_custkey", right_on="c_custkey"
    ).sort_values("o_orderkey", ignore_index=True)
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["c_name"].tolist() == want["c_name"].tolist()
    assert got["sum_qty"].tolist() == [
        int(big[k]) for k in want["o_orderkey"]
    ]

    # --- q22_idle_customers
    got = q22_idle_customers(sf).to_pandas().set_index("nationkey")
    cents = (cu.c_acctbal * 100).round().astype(int)
    pos = cu.assign(cents=cents)[cents > 0]
    s, n = int(pos.cents.sum()), len(pos)
    rich = pos[pos.cents * n > s]
    recent = set(
        od[od.o_orderdate >= pd.Timestamp("1999-01-01")].o_custkey
    )
    idle = rich[~rich.c_custkey.isin(recent)]
    want = idle.groupby(idle.c_nationkey.astype(int)).agg(
        n_customers=("cents", "size"), total_cents=("cents", "sum")
    )
    assert sorted(got.index) == sorted(want.index)
    for k in want.index:
        assert int(got.loc[k, "n_customers"]) == int(
            want.loc[k, "n_customers"]
        )
        assert int(got.loc[k, "total_cents"]) == int(
            want.loc[k, "total_cents"]
        )

    # --- ab_test_events
    got = ab_test_events(sf).to_pandas().set_index("event_type")
    ec = ev.assign(
        cents=(ev.value * 100).round().astype(int),
        variant=(ev.user_id % 2).astype(int),
    )
    for et, g in ec.groupby("event_type"):
        a, b = g[g.variant == 0], g[g.variant == 1]
        r = got.loc[et]
        assert int(r.n_control) == len(a)
        assert int(r.sum_treat) == int(b.cents.sum())
        assert int(r.ss_control) == int((a.cents ** 2).sum())
        assert int(r.mean_diff_num) == int(
            b.cents.sum() * len(a) - a.cents.sum() * len(b)
        )

    # --- open_orders_daily
    got = open_orders_daily(sf).to_pandas().set_index("day")
    day = (
        od.o_orderdate.astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    ).astype(int)
    deltas = pd.concat(
        [
            pd.Series(1, index=day),
            pd.Series(-1, index=day + 30),
        ]
    ).groupby(level=0).sum().sort_index()
    run = deltas.cumsum()
    assert got["open_orders"].to_dict() == run.to_dict()

    # --- pr_curve_docs (counts must tile: tp+fp+fn+tn == corpus)
    got = pr_curve_docs(sf).to_pandas()
    n_docs = len(dc)
    assert ((got.tp + got.fp + got.fn + got.tn) == n_docs).all()
    n_en = int((dc.lang == "en").sum())
    assert ((got.tp + got.fn) == n_en).all()
    # monotone: higher threshold -> fewer predicted positive
    g = got.sort_values("threshold")
    assert ((g.tp + g.fp).diff().dropna() <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_reorder_depth_vs_bruteforce():
    import ray.data as rd

    from geodata_ray.stages.windows import _tag_bucket  # noqa: F401
    from geodata_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = (
        Q.reorder_depth_events(sf).to_pandas().set_index("user_id")
    )
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["ts_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    for uid, g in ev.groupby("user_id"):
        ra = g.sort_values("event_id").reset_index()
        ra["ra"] = np.arange(len(ra))
        rt = g.sort_values(["ts_us", "event_id"]).reset_index()
        rt["rt"] = np.arange(len(rt))
        m = ra.set_index("event_id")["ra"] - rt.set_index("event_id")["rt"]
        assert int(got.loc[uid, "max_reorder_depth"]) == int(m.max())
        assert int(got.loc[uid, "n"]) == len(g)


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_bounds():
    from geodata_ray.pipelines import queries as Q

    got = Q.ann_recall_embeddings("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 5
    assert ((got.n_hits >= 0) & (got.n_hits <= 5)).all()
    assert (got.recall_bp == got.n_hits * 2000).all()


@pytest.mark.usefixtures("ray_session")
def test_wave14_vs_pandas_bruteforce():
    import collections

    import pyarrow.parquet as pq

    from geodata_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"

    # avg neighbor degree: brute force the shared host graph
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    E = set()
    for j in (1, 2, 3):
        u = ids % 97
        v = (u + 1 + (ids * j) % 96) % 97
        E |= set(zip(u.tolist(), v.tolist()))
    deg = collections.Counter(a for a, _ in E)
    got = (
        Q.avg_neighbor_degree_hosts(sf).to_pandas().set_index("node")
    )
    for node in deg:
        nbrs = [b for a, b in E if a == node]
        assert int(got.loc[node, "out_degree"]) == len(nbrs)
        assert int(got.loc[node, "nbr_deg_sum"]) == sum(
            deg.get(b, 0) for b in nbrs
        )

    # peak rate: brute force trailing window max
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "event_id", "ts"]).to_pandas()
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    got2 = Q.peak_rate_events(sf).to_pandas().set_index("user_id")
    for uid, g in ev.groupby("user_id"):
        ts = np.sort(g.us.to_numpy())
        hi = np.searchsorted(ts, ts, side="right")
        lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
        assert int(got2.loc[uid, "peak_1h"]) == int((hi - lo).max())
        assert int(got2.loc[uid, "n"]) == len(g)

    # revenue share: shares sum to <= 10000 and reconstruct
    got3 = Q.revenue_share_lineitem(sf).to_pandas()
    total = int(got3.revenue_cents.sum())
    assert (got3.share_bp == got3.revenue_cents * 10000 // total).all()
    assert 10000 - len(got3) < int(got3.share_bp.sum()) <= 10000

    # vocab growth: totals match distinct bigram count
    got4 = Q.vocab_growth_docs(sf).to_pandas()
    txt = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    bigrams = {}
    for _, r in txt.iterrows():
        ws = (r.text or "").lower().split(" ")
        for a, b in zip(ws, ws[1:]):
            key = f"{a} {b}"
            bigrams[key] = min(bigrams.get(key, 10**18), r.doc_id)
    mx = int(txt.doc_id.max())
    want = collections.Counter(
        fd * 10 // (mx + 1) for fd in bigrams.values()
    )
    assert got4.set_index("decile")["new_terms"].to_dict() == dict(want)


@pytest.mark.usefixtures("ray_session")
def test_dau_mau_vs_bruteforce():
    import pyarrow.parquet as pq

    from geodata_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.dau_mau_daily_events(sf).to_pandas().set_index("day")
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = ev.ts.astype("datetime64[us]").astype("int64") \
        // 86_400_000_000
    ud = ev[["user_id", "day"]].drop_duplicates()
    for d in sorted(ud.day.unique()):
        dau = ud[ud.day == d].user_id.nunique()
        mau = ud[(ud.day >= d - 29) & (ud.day <= d)].user_id.nunique()
        assert int(got.loc[d, "dau"]) == dau
        assert int(got.loc[d, "mau"]) == mau
    # planted gap case: one user active on days 0 and 100 only
    import ray.data as rd

    t = pa.table(
        {
            "user_id": pa.array([7, 7], pa.int64()),
            "ts": pa.array(
                np.array(["2024-01-01", "2024-04-10"],
                         dtype="datetime64[us]")
            ),
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        import pyarrow.parquet as pqw

        pqw.write_table(t, os.path.join(td, "events.parquet"))
        g2 = Q.dau_mau_daily_events(td).to_pandas().set_index("day")
        assert (g2["dau"] == 1).all() and (g2["mau"] == 1).all()
        assert len(g2) == 2


@pytest.mark.usefixtures("ray_session")
def test_gini_and_geo_mean_vs_bruteforce():
    import pyarrow.parquet as pq

    from geodata_ray.pipelines import queries as Q
    from geodata_ray.stages.lm import qlog2_fixed

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "event_type", "value"]
                       ).to_pandas()

    g = Q.activity_gini_users(sf).to_pandas().iloc[0]
    counts = ev.groupby("user_id").size().reset_index(name="x")
    counts = counts.sort_values(["x", "user_id"], ignore_index=True)
    x = counts["x"].to_numpy().astype(np.int64)
    n = x.size
    i = np.arange(1, n + 1)
    assert int(g.n_users) == n
    assert int(g.total_events) == int(x.sum())
    assert int(g.gini_num) == int(((2 * i - n - 1) * x).sum())
    assert int(g.gini_den) == n * int(x.sum())
    # Gini in [0, 1): numerator below denominator, non-negative
    assert 0 <= int(g.gini_num) < int(g.gini_den)

    gm = Q.geo_mean_values_events(sf).to_pandas().set_index("event_type")
    cents = (ev.value * 100).round().astype(int)
    for et, grp in ev.assign(c=cents).groupby("event_type"):
        pos = grp.c[grp.c > 0].to_numpy().astype(np.uint64)
        want = int(qlog2_fixed(pos).astype(np.int64).sum())
        assert int(gm.loc[et, "qlog_sum"]) == want
        assert int(gm.loc[et, "n_pos"]) == len(pos)
