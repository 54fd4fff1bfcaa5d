"""Round-4 training-data operators: paragraph dedup, quantile
bucketing, source mixture, URL-level crawl merge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.stages.dedup import paragraph_dedup
from geodata_ray.stages.packing import source_mixture
from geodata_ray.stages.relational import (
    assign_quantile_buckets,
    exact_int_quantiles,
)
from geodata_ray.stages.urls import dedup_by_canonical_url


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_first_occurrence_wins():
    import ray.data as rd

    texts = [
        "A\n\nB\n\nC",     # doc 0: all first occurrences
        "B\n\nD",          # doc 1: B dups doc0's, D new
        "A\n\nA",          # doc 2: both dup doc0 para0
        None,              # doc 3: null text -> one empty paragraph
        "",                # doc 4: empty -> dups doc3's empty para
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )

    def run(nblocks):
        return (
            paragraph_dedup(rd.from_arrow(t).repartition(nblocks))
            .to_pandas()
            .sort_values(["doc_id", "para_idx"], ignore_index=True)
        )

    out = run(1)
    assert run(4).values.tolist() == out.values.tolist()
    got = {
        (r.doc_id, r.para_idx): r.n_copies for r in out.itertuples()
    }
    # A kept at (0,0) with 3 copies; B at (0,1) x2; C unique; D unique;
    # the empty paragraph kept at its first doc (3,0) x2
    assert got == {
        (0, 0): 3, (0, 1): 2, (0, 2): 1, (1, 1): 1, (3, 0): 2,
    }


@pytest.mark.usefixtures("ray_session")
def test_quantile_buckets_match_reference():
    import ray.data as rd

    rng = np.random.default_rng(11)
    v = rng.integers(0, 300, 5000).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(v.size, dtype=np.int64)),
            "n": pa.array(v),
        }
    )
    qs = (0.25, 0.5, 0.75)
    bounds = exact_int_quantiles(
        rd.from_arrow(t).repartition(6), "n", qs
    )
    sv = np.sort(v)
    ref_bounds = [int(sv[int(np.ceil(q * v.size)) - 1]) for q in qs]
    assert bounds == ref_bounds
    out = (
        assign_quantile_buckets(
            rd.from_arrow(t).repartition(6), col="n", qs=qs
        )
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    ref = (v[:, None] > np.array(ref_bounds)[None, :]).sum(axis=1)
    assert out["bucket"].tolist() == ref.tolist()


@pytest.mark.usefixtures("ray_session")
def test_source_mixture_counts_and_determinism():
    import ray.data as rd

    from geodata_ray.sources.synth import splitmix64

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    src = np.array(["a", "b", "c", "d"])[ids % 4]
    t = pa.table({"doc_id": pa.array(ids), "source": pa.array(src)})
    w = {"a": 0.0, "b": 1.0, "c": 1.5, "d": 2.75}

    def run(nblocks):
        return (
            source_mixture(
                rd.from_arrow(t).repartition(nblocks),
                id_col="doc_id", source_col="source", weights=w, seed=5,
            )
            .to_pandas()
            .sort_values(["doc_id", "copy_idx"], ignore_index=True)
        )

    out = run(1)
    assert run(7).values.tolist() == out.values.tolist()
    h = splitmix64(ids.astype(np.uint64) + np.uint64(5))
    base = np.array([0, 1, 1, 2])[ids % 4]
    fr = np.array([0, 0, 2, 3])[ids % 4].astype(np.uint64) << np.uint64(62)
    k = base + (h < fr)
    ref_n = int(k.sum())
    assert len(out) == ref_n
    # per-doc copies are exactly 0..k-1
    per = out.groupby("doc_id")["copy_idx"].agg(["count", "min", "max"])
    kk = k[per.index.to_numpy()]
    assert (per["count"].to_numpy() == kk).all()
    assert (per["min"] == 0).all()
    assert (per["max"].to_numpy() == kk - 1).all()
    # source a (weight 0) emits nothing
    assert not (out["source"] == "a").any()

    with pytest.raises(ValueError):
        source_mixture(
            rd.from_arrow(t), id_col="doc_id", source_col="source",
            weights={"a": 0.3}, seed=1,
        )


@pytest.mark.usefixtures("ray_session")
def test_url_dedup_best_argmax_and_bounds():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "n_chars": pa.array([10, 30, 30, 7, 7], pa.int64()),
            "url": pa.array(
                [
                    "HTTPS://A.com:443/x",   # group A
                    "https://a.COM/x",       # group A (winner: 30, id 1)
                    "https://a.com/x#f",     # group A (tie 30 -> id 1)
                    "https://b.com/y/",      # group B
                    "https://B.com/y/",      # group B (tie 7 -> id 3)
                ]
            ),
        }
    )
    out = (
        dedup_by_canonical_url(rd.from_arrow(t).repartition(3))
        .to_pandas().sort_values("canonical_url", ignore_index=True)
    )
    assert out.to_dict("records") == [
        {"canonical_url": "https://a.com/x", "doc_id": 1,
         "best_score": 30, "n_dups": 3},
        {"canonical_url": "https://b.com/y", "doc_id": 3,
         "best_score": 7, "n_dups": 2},
    ]

    bad = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "n_chars": pa.array([1 << 22], pa.int64()),
            "url": pa.array(["https://a.com/x"]),
        }
    )
    with pytest.raises(Exception):
        dedup_by_canonical_url(rd.from_arrow(bad)).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_cms_table_mergeable_and_one_sided():
    import ray.data as rd

    from geodata_ray.stages.sketch import cms_estimate, cms_table

    rng = np.random.default_rng(3)
    # zipf-ish: value v appears ~1000/(v+1) times
    vals = np.repeat(np.arange(50, dtype=np.int64),
                     (1000 / (np.arange(50) + 1)).astype(np.int64))
    t = pa.table({"v": pa.array(rng.permutation(vals))})

    def run(nblocks):
        return (
            cms_table(rd.from_arrow(t).repartition(nblocks), "v")
            .to_pandas()
            .sort_values(["depth", "cell"], ignore_index=True)
        )

    a = run(1)
    assert run(9).values.tolist() == a.values.tolist()
    # total mass per depth == row count
    assert (a.groupby("depth")["n"].sum() == len(vals)).all()
    # point estimates are one-sided: est >= true, and exact here
    # (4096 cells, 50 keys -> collisions vanishingly unlikely)
    true = np.array([(vals == v).sum() for v in range(50)])
    est = cms_estimate(a, np.arange(50, dtype=np.int64))
    assert (est >= true).all()
    # merge property: sketch(shard1) + sketch(shard2) == sketch(all)
    half = len(vals) // 2
    t1, t2 = pa.table({"v": vals[:half]}), pa.table({"v": vals[half:]})
    s1 = cms_table(rd.from_arrow(t1), "v").to_pandas()
    s2 = cms_table(rd.from_arrow(t2), "v").to_pandas()
    merged = (
        pd.concat([s1, s2]).groupby(["depth", "cell"], as_index=False)["n"]
        .sum().sort_values(["depth", "cell"], ignore_index=True)
    )
    assert merged.values.tolist() == a.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_salted_topk_ascending_head_string_keys():
    import ray.data as rd

    from geodata_ray.stages.skew import salted_topk_per_key

    n = 400
    ids = np.arange(n, dtype=np.int64)
    key = np.array(["h" + str(i % 7) for i in ids], dtype=object)
    t = pa.table({"doc_id": pa.array(ids), "host": pa.array(key)})
    out = (
        salted_topk_per_key(
            rd.from_arrow(t).repartition(5),
            key="host", order_col="doc_id", k=2, descending=False,
        )
        .to_pandas().sort_values(["host", "rank"], ignore_index=True)
    )
    ref = (
        pd.DataFrame({"doc_id": ids, "host": key})
        .sort_values("doc_id").groupby("host").head(2)
        .sort_values(["host", "doc_id"], ignore_index=True)
    )
    assert out["doc_id"].tolist() == ref["doc_id"].tolist()
    assert all(
        v == [1, 2] for v in out.groupby("host")["rank"].apply(list)
    )


@pytest.mark.usefixtures("ray_session")
def test_bloom_bits_membership_and_merge():
    import ray.data as rd

    from geodata_ray.stages.sketch import bloom_bits, bloom_contains

    members = np.arange(0, 4000, 2, dtype=np.int64)      # evens
    absent = np.arange(1, 4001, 2, dtype=np.int64)       # odds
    t = pa.table({"v": pa.array(members)})

    def run(tbl, nblocks=4):
        return (
            bloom_bits(rd.from_arrow(tbl).repartition(nblocks), "v")
            .to_pandas().sort_values("bit", ignore_index=True)
        )

    bits = run(t)
    # partition-invariant
    assert run(t, 11).values.tolist() == bits.values.tolist()
    # no false negatives
    assert bloom_contains(bits, members).all()
    # FP rate ~ (2000/4096)^4 ~ 5.7%; assert a loose bound
    fp = bloom_contains(bits, absent).mean()
    assert fp < 0.15
    # merge = distinct union of shard bit tables
    b1 = run(pa.table({"v": members[:1000]}))
    b2 = run(pa.table({"v": members[1000:]}))
    merged = sorted(set(b1["bit"]) | set(b2["bit"]))
    assert merged == bits["bit"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_blocklist_suffix_semantics():
    import ray.data as rd

    from geodata_ray.stages.urls import filter_blocked_hosts

    hosts = [
        "bad.com",              # exact block
        "a.bad.com",            # subdomain of blocked
        "x.y.z.a.bad.com",      # deep subdomain
        "notbad.com",           # suffix of the STRING but not a label
        "bad.com.evil.org",     # blocked name as a non-suffix label
        "good.org",
        None,                   # null host: kept (not blockable)
    ]
    t = pa.table(
        {"i": pa.array(range(len(hosts))), "host": pa.array(hosts)}
    )
    kept = (
        filter_blocked_hosts(rd.from_arrow(t), ["bad.com"])
        .to_pandas().sort_values("i")["i"].tolist()
    )
    assert kept == [3, 4, 5, 6]
    audit = (
        filter_blocked_hosts(rd.from_arrow(t), ["bad.com"],
                             keep_blocked=True)
        .to_pandas().sort_values("i")["i"].tolist()
    )
    assert audit == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_top_ngrams_exact_and_tiebreak():
    import ray.data as rd

    from geodata_ray.stages.textstats import top_ngrams

    docs = [
        "a b a b c",        # bigrams: ab, ba, ab, bc
        "a b x",            # ab, bx
        "z z z",            # zz, zz
        "",                 # no bigrams (single '' token)
        None,               # null text -> '' token
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs)}
    )
    out = (
        top_ngrams(rd.from_arrow(t).repartition(3), n=2, k=3, min_count=2)
        .to_pandas()
    )
    # counts: 'a b'=3, 'z z'=2, others 1 (pruned); k=3 but only 2 pass
    assert out.sort_values("n", ascending=False)[["ngram", "n"]]\
        .values.tolist() == [["a b", 3], ["z z", 2]]
    # tie-break: with min_count=1, k=4 -> third/fourth slots are the
    # count-1 bigrams in ASCENDING ngram order
    out2 = (
        top_ngrams(rd.from_arrow(t), n=2, k=4, min_count=1)
        .to_pandas().sort_values(["n", "ngram"],
                                 ascending=[False, True],
                                 ignore_index=True)
    )
    assert out2["ngram"].tolist() == ["a b", "z z", "b a", "b c"]


@pytest.mark.usefixtures("ray_session")
def test_format_roundtrip_adversarial_text(tmp_path):
    import shutil

    import ray.data as rd

    texts = [
        'comma, "quote" and \n newline',
        "unicode: héllo — ∑",
        "",                      # empty
        "trailing space ",
        "tab\tand\\backslash",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    for fmt in ("jsonl", "csv"):
        d = str(tmp_path / fmt)
        shutil.rmtree(d, ignore_errors=True)
        ds = rd.from_arrow(t).repartition(2)
        if fmt == "jsonl":
            ds.write_json(d)
            back = rd.read_json(d)
        else:
            ds.write_csv(d)
            back = rd.read_csv(d)
        df = back.to_pandas().sort_values("doc_id", ignore_index=True)
        assert df["text"].fillna("").tolist() == texts, fmt


@pytest.mark.usefixtures("ray_session")
def test_pagerank_fixed_point_vs_numpy_replay():
    import ray.data as rd

    from geodata_ray.stages.graphcc import pagerank

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 40, 300
    uv = rng.integers(0, n_nodes, size=(n_edges, 2))
    uv = uv[uv[:, 0] != uv[:, 1]]
    uv = np.unique(uv, axis=0)
    t = pa.table({"u": pa.array(uv[:, 0].astype(np.int64)),
                  "v": pa.array(uv[:, 1].astype(np.int64))})

    def run(nblocks):
        return (
            pagerank(rd.from_arrow(t).repartition(nblocks), iters=5)
            .to_pandas().sort_values("node", ignore_index=True)
        )

    out = run(1)
    assert run(7).values.tolist() == out.values.tolist()

    # independent dense replay of the integer recurrence
    scale, dp, iters = 10**12, 85, 5
    nodes = np.unique(uv)
    idx = {v: i for i, v in enumerate(nodes)}
    nn = nodes.size
    deg = np.zeros(nn, dtype=np.int64)
    for u in uv[:, 0]:
        deg[idx[u]] += 1
    r = np.full(nn, scale // nn, dtype=np.int64)
    tele = (scale * (100 - dp) // 100) // nn
    for _ in range(iters):
        nxt = np.full(nn, tele, dtype=np.int64)
        for u, v in uv:
            nxt[idx[v]] += (r[idx[u]] * dp // 100) // deg[idx[u]]
        r = nxt
    assert out["node"].tolist() == nodes.tolist()
    assert out["r"].tolist() == r.tolist()
    # mass sanity: total <= scale (dangling mass dropped, never added)
    assert out["r"].sum() <= scale


@pytest.mark.usefixtures("ray_session")
def test_curation_pipeline_partition_invariant():
    from geodata_ray.pipelines.queries import curation_pipeline_docs
    from tests.conftest import SF_DIR

    out = (
        curation_pipeline_docs(SF_DIR)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert len(out) > 0
    # per-host cap respected
    assert out.groupby("host").size().max() <= 2
    # kept docs are first-occurrences: rank within host follows doc_id
    for _, g in out.groupby("host"):
        assert g.sort_values("doc_id")["rank"].tolist() == list(
            range(1, len(g) + 1)
        )


@pytest.mark.usefixtures("ray_session")
def test_chunk_batch_edges():
    from geodata_ray.stages.textstats import chunk_batch

    docs = [
        " ".join(f"t{i}" for i in range(10)),  # 10 toks: chunks at 0,4,8
        "a b c",                               # shorter than chunk
        "",                                    # 1 empty token
        None,                                  # null -> ''
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs)}
    )
    out = chunk_batch(t, chunk=6, stride=4).to_pandas()
    d0 = out[out.doc_id == 0]
    assert d0["chunk_text"].tolist() == [
        "t0 t1 t2 t3 t4 t5", "t4 t5 t6 t7 t8 t9", "t8 t9",
    ]
    assert d0["n_tokens"].tolist() == [6, 6, 2]
    assert out[out.doc_id == 1]["chunk_text"].tolist() == ["a b c"]
    # empty/null docs produce one empty chunk (1 token: '')
    assert out[out.doc_id == 2]["chunk_text"].tolist() == [""]
    assert out[out.doc_id == 3]["n_tokens"].tolist() == [1]


def test_normalize_text_kernel():
    from geodata_ray.stages.textstats import normalize_text_batch

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
         "text": pa.array(
             ["  a\t\tb\nc  ", "x\x00y\x1bz", None, "ok",
              "a \x01 b"]  # control BETWEEN spaces must not leave
         )}                # a double space (strip before squash)
    )
    out = normalize_text_batch(t)
    assert out["norm_text"].to_pylist() == [
        "a b c", "xyz", "", "ok", "a b",
    ]


@pytest.mark.usefixtures("ray_session")
def test_distinct_edges_packed():
    import ray.data as rd

    from geodata_ray.stages.graphcc import distinct_edges_packed

    rng = np.random.default_rng(7)
    uv = rng.integers(0, 50, size=(2000, 2)).astype(np.int64)
    t = pa.table({"u": pa.array(uv[:, 0]), "v": pa.array(uv[:, 1])})
    out = (
        distinct_edges_packed(rd.from_arrow(t).repartition(6))
        .to_pandas().sort_values(["u", "v"], ignore_index=True)
    )
    ref = np.unique(uv, axis=0)
    assert out.values.tolist() == ref.tolist()
    # id-range guard
    bad = pa.table({"u": pa.array([-1], pa.int64()),
                    "v": pa.array([0], pa.int64())})
    with pytest.raises(Exception):
        distinct_edges_packed(rd.from_arrow(bad)).to_pandas()
    # bound guard
    with pytest.raises(ValueError):
        distinct_edges_packed(rd.from_arrow(t), bound=3).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_bloom_probe_no_false_negatives():
    import ray.data as rd

    from geodata_ray.stages.sketch import bloom_bits, bloom_probe

    members = np.arange(0, 2000, 2, dtype=np.int64)
    bits = bloom_bits(rd.from_arrow(pa.table({"v": members})), "v")
    probe_vals = np.arange(1000, dtype=np.int64)
    out = (
        bloom_probe(
            rd.from_arrow(pa.table({"v": probe_vals})).repartition(3),
            bits, "v",
        )
        .to_pandas().sort_values("v", ignore_index=True)
    )
    seen = out["maybe_seen"].to_numpy()
    # every true member flagged
    assert seen[probe_vals % 2 == 0].all()
    # odd (absent) values mostly not flagged (FP rate (1000/4096)^4)
    assert seen[probe_vals % 2 == 1].mean() < 0.05


@pytest.mark.usefixtures("ray_session")
def test_tfidf_retrieval_partition_invariant():
    from geodata_ray.pipelines.queries import tfidf_retrieval_docs
    from tests.conftest import SF_DIR

    out = tfidf_retrieval_docs(SF_DIR).to_pandas()
    assert len(out) == 10
    s = out.sort_values(
        ["score_fp", "doc_id"], ascending=[False, True],
        ignore_index=True,
    )
    # returned in rank order semantics: scores non-increasing
    assert (s["score_fp"].diff().dropna() <= 0).all()
    assert (s["score_fp"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_blocklist_mixed_case_hosts():
    import ray.data as rd

    from geodata_ray.stages.urls import filter_blocked_hosts

    t = pa.table(
        {"i": pa.array([0, 1, 2], pa.int64()),
         "host": pa.array(["BAD.COM", "CDN.Bad.com", "Good.org"])}
    )
    kept = (
        filter_blocked_hosts(rd.from_arrow(t), ["bad.com"])
        .to_pandas()["i"].tolist()
    )
    assert kept == [2]


@pytest.mark.usefixtures("ray_session")
def test_chunk_batch_empty_and_int32_edges():
    import ray.data as rd

    from geodata_ray.stages.graphcc import distinct_edges_packed
    from geodata_ray.stages.textstats import chunk_batch

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}
    )
    assert len(chunk_batch(empty, chunk=40, stride=20)) == 0

    # int32 edge columns must pack correctly (no silent int32 << 32)
    t = pa.table(
        {"u": pa.array([1, 1, 2], pa.int32()),
         "v": pa.array([2, 3, 3], pa.int32())}
    )
    out = (
        distinct_edges_packed(rd.from_arrow(t))
        .to_pandas().sort_values(["u", "v"], ignore_index=True)
    )
    assert out.values.tolist() == [[1, 2], [1, 3], [2, 3]]


@pytest.mark.usefixtures("ray_session")
def test_perplexity_buckets_quartiles():
    from geodata_ray.pipelines.queries import perplexity_buckets_docs
    from tests.conftest import SF_DIR

    out = (
        perplexity_buckets_docs(SF_DIR)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    n = len(out)
    assert n > 0
    counts = out["bucket"].value_counts()
    # exact-quantile buckets: each of 0..3 holds between 15% and 35%
    # (ties can skew away from perfect quarters)
    for b in range(4):
        assert 0.15 * n <= counts.get(b, 0) <= 0.35 * n, counts
    assert (out["ppx_fp"] >= 0).all()


def test_cdc_chunk_batch_vs_bruteforce():
    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.dedup import cdc_chunk_batch

    rng = np.random.default_rng(0)
    texts = [
        "".join(chr(rng.integers(32, 127))
                for _ in range(rng.integers(0, 300)))
        for _ in range(50)
    ] + ["", "short", None]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = (
        cdc_chunk_batch(t).to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )
    ref = []
    for d, s in enumerate(texts):
        b = (s or "").encode()
        cuts = [
            i + 1 for i in range(7, len(b) - 1)
            if int(splitmix64(np.array(
                [int.from_bytes(b[i - 7: i + 1], "big")],
                dtype=np.uint64))[0]) % 64 == 0
        ]
        starts = [0] + cuts
        for ci, st in enumerate(starts):
            en = starts[ci + 1] if ci + 1 < len(starts) else len(b)
            ref.append([d, ci, st, en - st])
    assert out.values.tolist() == ref
    # chunks tile each doc exactly
    per = out.groupby("doc_id")["n_bytes"].sum()
    for d, s in enumerate(texts):
        assert per[d] == len((s or "").encode())


@pytest.mark.usefixtures("ray_session")
def test_cdc_duplicate_spans_planted():
    import ray.data as rd

    from geodata_ray.stages.dedup import cdc_duplicate_spans

    rng_s = np.random.default_rng(42)
    shared = "".join(
        chr(c) for c in rng_s.integers(32, 127, size=2000)
    )
    texts = [
        shared + "unique tail one",
        "unique head two " + shared,
        "completely different text with no overlap at all dddddd",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()),
         "text": pa.array(texts)}
    )

    def run(nblocks):
        return (
            cdc_duplicate_spans(rd.from_arrow(t).repartition(nblocks))
            .to_pandas()
            .sort_values(["doc_id", "n_bytes", "n_copies"],
                         ignore_index=True)
        )

    out = run(1)
    # partition-invariant
    assert run(3).values.tolist() == out.values.tolist()
    # the shared span produces at least one duplicated chunk whose
    # min owner is doc 0
    assert len(out) >= 1
    assert (out["n_copies"] >= 2).all()
    assert out["doc_id"].min() == 0


@pytest.mark.usefixtures("ray_session")
def test_pagerank_join_path_bit_equal_to_broadcast():
    import ray.data as rd

    from geodata_ray.stages.graphcc import pagerank

    rng = np.random.default_rng(23)
    uv = rng.integers(0, 60, size=(500, 2))
    uv = np.unique(uv[uv[:, 0] != uv[:, 1]], axis=0)
    t = pa.table({"u": pa.array(uv[:, 0].astype(np.int64)),
                  "v": pa.array(uv[:, 1].astype(np.int64))})
    ds = rd.from_arrow(t).repartition(4)
    bc = (
        pagerank(ds, iters=4, rank_side="broadcast")
        .to_pandas().sort_values("node", ignore_index=True)
    )
    jn = (
        pagerank(ds, iters=4, rank_side="join")
        .to_pandas().sort_values("node", ignore_index=True)
    )
    assert jn.values.tolist() == bc.values.tolist()
    # auto flips to the join path below the bound
    au = (
        pagerank(ds, iters=4, broadcast_bound=10)
        .to_pandas().sort_values("node", ignore_index=True)
    )
    assert au.values.tolist() == bc.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_pretrain_pipeline_tiling_and_cleanliness():
    from geodata_ray.pipelines.queries import pretrain_pipeline_docs
    from tests.conftest import SF_DIR

    out = (
        pretrain_pipeline_docs(SF_DIR)
        .to_pandas().sort_values("start_tok", ignore_index=True)
    )
    assert len(out) > 0
    # spans are disjoint and ordered: each doc starts where the
    # previous ends (pack is a concatenation, no gaps/overlaps)
    assert out["start_tok"].iloc[0] == 0
    assert (out["first_seq"] <= out["last_seq"]).all()
    assert out["start_tok"].is_monotonic_increasing


def test_classifier_score_batch_exact():
    import numpy as np
    import pyarrow as pa

    from geodata_ray.stages.dedup import _token_hash
    from geodata_ray.stages.textstats import (
        _CLF_BUCKETS,
        classifier_score_batch,
        classifier_weights,
    )

    texts = ["the quick brown fox", "spam spam spam", "", None, "unicode ok"]
    t = pa.table({"doc_id": list(range(5)), "text": texts})
    out = classifier_score_batch(t).to_pydict()

    w = classifier_weights()
    for i, txt in enumerate(texts):
        toks = (txt or "").lower().split(" ")
        exp = sum(int(w[_token_hash(tk) % _CLF_BUCKETS]) for tk in toks)
        assert out["score"][i] == exp
        assert out["n_tokens"][i] == len(toks)
        assert out["label"][i] == ("keep" if exp >= 0 else "drop")
    # weight table is centered and bounded
    assert w.min() >= -_CLF_BUCKETS // 2 and w.max() < _CLF_BUCKETS // 2


@pytest.mark.usefixtures("ray_session")
def test_snapshot_diff_all_statuses():
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.urls import snapshot_diff

    old = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3"],
        "fp": [11, 22, 33],
    }))
    new = rd.from_arrow(pa.table({
        "url": ["u2", "u3", "u4"],
        "fp": [22, 99, 44],
    }))
    out = dict(
        (r["url"], r["status"])
        for r in snapshot_diff(old, new, num_buckets=4).take_all()
    )
    assert out == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_sorted_postings_and_min_df():
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.textstats import inverted_index

    ds = rd.from_arrow(pa.table({
        "doc_id": [5, 1, 9, 2],
        "text": ["x y", "y x", "y", "z z z"],
    }))
    rows = {r["term"]: r for r in inverted_index(ds, min_df=2).take_all()}
    # postings ascend by doc_id regardless of input order; tf>1 within
    # one doc ('z z z') contributes ONE posting; min_df prunes x? no: x
    # appears in docs 5 and 1 -> df=2 kept; z df=1 pruned
    assert rows["x"]["postings"] == "1,5" and rows["x"]["df"] == 2
    assert rows["y"]["postings"] == "1,5,9" and rows["y"]["df"] == 3
    assert "z" not in rows


@pytest.mark.usefixtures("ray_session")
def test_trajectory_stats_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.windows import trajectory_stats

    rng = np.random.default_rng(11)
    n = 400
    users = rng.integers(0, 37, n)
    ts = rng.permutation(n).astype("datetime64[us]")
    t = pa.table({
        "user_id": users,
        "ts": pa.array(ts),
        "event_id": np.arange(n),
        "gx": rng.integers(0, 100, n),
        "gy": rng.integers(0, 100, n),
    })
    out = {
        r["user_id"]: r
        for r in trajectory_stats(
            rd.from_arrow(t), num_buckets=5
        ).take_all()
    }
    import pandas as pd

    df = t.to_pandas()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        dx = g["gx"].diff().abs()
        dy = g["gy"].diff().abs()
        d = pd.concat([dx, dy], axis=1).max(axis=1).dropna()
        r = out[uid]
        assert r["n_pts"] == len(g)
        assert r["n_moves"] == len(g) - 1
        assert r["total_dist"] == int(d.sum())
        assert r["max_hop"] == (int(d.max()) if len(d) else 0)


@pytest.mark.usefixtures("ray_session")
def test_image_ahash_planted_dups():
    import ray.data as rd

    from geodata_ray.stages.multimodal import (
        ImageAHasher,
        image_ahash,
        synth_dup_image_table,
    )

    t = synth_dup_image_table(40, 25)
    out = (
        image_ahash(rd.from_arrow(t).repartition(3))
        .to_pandas().sort_values("image_id", ignore_index=True)
    )
    a = out["ahash"].to_numpy()
    # planted duplicates share hashes; schema drops the binary column
    assert (a[:15] == a[25:40]).all()
    assert "payload" not in out.columns
    # content-distinct images are mostly hash-distinct (aHash is
    # perceptual — a few structured-pattern collisions are expected)
    assert len(set(a[:25].tolist())) >= 20

    bad = t.slice(0, 1).set_column(
        t.schema.get_field_index("format"), "format", pa.array(["jpg"])
    )
    with pytest.raises(NotImplementedError):
        ImageAHasher()(bad)


@pytest.mark.usefixtures("ray_session")
def test_first_per_group_vs_pandas():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.windows import first_per_group

    rng = np.random.default_rng(13)
    n = 1000
    t = pa.table({
        "k": rng.integers(0, 23, n),
        "w": rng.integers(0, 4, n),
        "o": rng.permutation(n),
        "id": np.arange(n),
    })
    out = (
        first_per_group(
            rd.from_arrow(t).repartition(7),
            group_cols=["k", "w"], order_cols=["o", "id"],
            num_buckets=5,
        )
        .to_pandas().sort_values(["k", "w"], ignore_index=True)
    )
    exp = (
        t.to_pandas().sort_values(["k", "w", "o", "id"])
        .groupby(["k", "w"], as_index=False).first()
    )
    assert out[["k", "w", "o", "id"]].values.tolist() == \
        exp[["k", "w", "o", "id"]].values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_funnel_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.windows import funnel

    rng = np.random.default_rng(17)
    n = 2000
    users = rng.integers(0, 50, n)
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    typ = np.array(["view", "click", "purchase", "noise"])[
        rng.integers(0, 4, n)
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": users, "ts_us": ts, "event_type": typ,
    })).repartition(6)
    out = {
        r["user_id"]: r
        for r in funnel(ds, stages=("view", "click", "purchase"),
                        num_buckets=7).take_all()
    }
    for uid in np.unique(users):
        m = users == uid
        t_u, y_u = ts[m], typ[m]
        thr, got, stages_done = -1, {}, 0
        for st in ("view", "click", "purchase"):
            cand = t_u[(y_u == st) & (t_u > thr)]
            v = int(cand.min()) if len(cand) else -1
            got[f"{st}_us"] = v
            if v >= 0:
                stages_done += 1
                thr = v
            else:
                thr = np.iinfo(np.int64).max
        r = out[uid]
        for k, v in got.items():
            assert r[k] == v, (uid, k)
        assert r["n_stages"] == stages_done


@pytest.mark.usefixtures("ray_session")
def test_review_fix_guards():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geodata_ray.stages.multimodal import ImageAHasher, ppm_encode
    from geodata_ray.stages.relational import grouped_distinct_count
    from geodata_ray.stages.windows import first_per_group, funnel

    # grouped_distinct_count: SQL semantics — NULLs not counted
    t = pa.table({
        "k": [1, 1, 1, 2],
        "v": pa.array([10, None, 10, None], pa.int64()),
    })
    out = {
        r["k"]: r["nd"]
        for r in grouped_distinct_count(
            rd.from_arrow(t), ["k"], "v", alias="nd"
        ).take_all()
    }
    # nulls not counted; the all-null key is omitted (documented
    # HAVING-count>0 semantics)
    assert out == {1: 1}

    # funnel: negative epoch-us refused (sentinel would be ambiguous)
    neg = rd.from_arrow(pa.table({
        "user_id": [1], "ts_us": pa.array([-5], pa.int64()),
        "event_type": ["view"],
    }))
    with pytest.raises(Exception, match="nonnegative"):
        funnel(neg, stages=("view",), num_buckets=1).take_all()

    # first_per_group: null group key refused (SQL treats NULLs as one
    # partition; the boundary mask would emit one row per null)
    nk = rd.from_arrow(pa.table({
        "g": pa.array([1, None], pa.int64()),
        "o": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(Exception, match="null"):
        first_per_group(
            nk, group_cols=["g"], order_cols=["o"], hash_col="o",
            num_buckets=1,
        ).take_all()

    # aHash: images under 8x8 refused (empty blocks would force bits)
    small = np.zeros((4, 4, 3), dtype=np.uint8)
    bad = pa.table({
        "image_id": pa.array([0], pa.int64()),
        "payload": pa.array([ppm_encode(small)], pa.binary()),
        "format": pa.array(["ppm"]),
    })
    with pytest.raises(ValueError, match="8x8"):
        ImageAHasher()(bad)


@pytest.mark.usefixtures("ray_session")
def test_bm25_beats_length_bias_and_is_partition_invariant():
    from geodata_ray.pipelines.queries import bm25_retrieval_docs
    from tests.conftest import SF_DIR

    a = bm25_retrieval_docs(SF_DIR).to_pandas()
    b = bm25_retrieval_docs(SF_DIR).to_pandas()
    # deterministic across executions
    assert a.values.tolist() == b.values.tolist()
    assert len(a) == 10
    # strictly ordered by (score desc, doc_id asc)
    s = a["score_fp"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    assert (s > 0).all()
