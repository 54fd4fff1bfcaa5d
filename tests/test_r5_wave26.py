"""Twenty-sixth-wave tests: independent pandas/numpy brute force over
the sf0.001 parquet (subtree rollup, eccentricity, readability,
feature-hash collisions, Cohen's kappa, per-type reservoir).  The
hash-based cases re-implement splitmix64 from the published constants
rather than importing the engine kernel."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

U64 = 1 << 64


def _sm64(x: int) -> int:
    """Scalar splitmix64 finalizer, re-derived from the public spec."""
    x = (x + 0x9E3779B97F4A7C15) % U64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % U64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % U64
    return x ^ (x >> 31)


# the engine's documented seed (dedup._FNV_OFFSET — an FNV-flavored
# odd 64-bit constant, not the textbook FNV-1a offset basis)
_FNV = 1469598103934665603


def _tok_hash(tok: str) -> int:
    acc = _FNV
    for ch in tok.encode():
        acc = _sm64(acc ^ ch)
    return acc


def _t(name, cols=None):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=cols).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_subtree_rollup_vs_python():
    from geodata_ray.pipelines.queries import subtree_rollup_parts

    p = _t("part", ["p_partkey", "p_retailprice"])
    cents = np.round(p.p_retailprice.to_numpy() * 100).astype(np.int64)
    exp_sum: dict[int, int] = {}
    exp_n: dict[int, int] = {}
    for k, c in zip(p.p_partkey, cents):
        node = int(k)
        while True:
            exp_sum[node] = exp_sum.get(node, 0) + int(c)
            exp_n[node] = exp_n.get(node, 0) + 1
            if node == 0:
                break
            node //= 8
    got = subtree_rollup_parts(SF_DIR).to_pandas()
    assert len(got) == len(exp_sum)
    for r in got.itertuples():
        assert exp_sum[r.node] == r.subtree_cents
        assert exp_n[r.node] == r.n_desc
    # the root aggregates everything
    root = got[got.node == 0].iloc[0]
    assert root.subtree_cents == int(cents.sum())
    assert root.n_desc == len(p)


@pytest.mark.usefixtures("ray_session")
def test_eccentricity_vs_python_bfs():
    from geodata_ray.pipelines.queries import eccentricity_hosts

    ids = _t("documents", ["doc_id"]).doc_id.to_numpy()
    u = ids % 97
    adj: dict[int, set] = {}
    for j in (1, 2, 3):
        v = (u + 1 + (ids * j) % 96) % 97
        for a, b in zip(u, v):
            if a != b:
                adj.setdefault(int(a), set()).add(int(b))
                adj.setdefault(int(b), set()).add(int(a))
    got = eccentricity_hosts(SF_DIR).to_pandas()
    assert len(got) == len(adj)
    for r in got.itertuples():
        # plain BFS from r.host
        dist = {r.host: 0}
        frontier = [r.host]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in dist:
                        dist[m] = d
                        nxt.append(m)
            frontier = nxt
        assert max(dist.values()) == r.ecc
        assert len(dist) == r.n_reachable


@pytest.mark.usefixtures("ray_session")
def test_readability_vs_python():
    from geodata_ray.pipelines.queries import readability_docs

    d = _t("documents", ["doc_id", "text"]).set_index("doc_id")
    got = readability_docs(SF_DIR).to_pandas()
    assert len(got) == len(d)
    for r in got.itertuples():
        low = (d.loc[r.doc_id, "text"] or "").lower()
        w = len(low.split(" "))
        v = len(re.findall(r"[aeiou]+", low))
        s = (w + 15) // 16
        assert (r.n_words, r.n_vowel_groups, r.n_sents) == (w, v, s)
        assert r.flesch_milli == 206_835 - (1015 * w) // s - (84_600 * v) // w


@pytest.mark.usefixtures("ray_session")
def test_feature_hash_collisions_vs_python():
    from geodata_ray.pipelines.queries import feature_hash_collisions_docs

    texts = _t("documents", ["text"]).text
    vocab = set()
    for t in texts:
        vocab.update((t or "").lower().split(" "))
    loads: dict[int, int] = {}
    for tok in vocab:
        b = _tok_hash(tok) % 64
        loads[b] = loads.get(b, 0) + 1
    hist: dict[int, int] = {}
    for n in loads.values():
        hist[n] = hist.get(n, 0) + 1
    got = feature_hash_collisions_docs(SF_DIR).to_pandas()
    assert {int(r.load): int(r.n_buckets) for r in got.itertuples()} == hist
    # every distinct term lands in exactly one bucket
    assert int((got.load * got.n_buckets).sum()) == len(vocab)


@pytest.mark.usefixtures("ray_session")
def test_cohens_kappa_vs_python():
    from geodata_ray.pipelines.queries import cohens_kappa_docs
    from geodata_ray.stages.textstats import langid_batch

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    pred = langid_batch(t)["lang_pred"].to_pylist()
    decl = t["lang"].to_pylist()
    n = len(decl)
    agree = sum(1 for a, b in zip(decl, pred) if a == b)
    row: dict[str, int] = {}
    col: dict[str, int] = {}
    for a in decl:
        row[a] = row.get(a, 0) + 1
    for b in pred:
        col[b] = col.get(b, 0) + 1
    src = sum(v * col.get(k, 0) for k, v in row.items())
    num = n * agree - src
    den = n * n - src
    kappa = 0 if den == 0 else (
        (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // den)
    )
    got = cohens_kappa_docs(SF_DIR).to_pandas().iloc[0]
    assert (int(got.n_docs), int(got.n_agree)) == (n, agree)
    assert int(got.sum_rc) == src
    assert int(got.kappa_ppm) == kappa
    # kappa is bounded by 1
    assert int(got.kappa_ppm) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_reservoir_sample_vs_python():
    from geodata_ray.pipelines.queries import (
        reservoir_sample_per_type_events,
    )

    ev = _t("events", ["event_id", "event_type"])
    h = np.array(
        [_sm64(int(i)) for i in ev.event_id], dtype=np.uint64
    ).astype(np.int64)
    ev = ev.assign(hash_i64=h).sort_values(
        ["event_type", "hash_i64", "event_id"]
    )
    ev["rank"] = ev.groupby("event_type").cumcount() + 1
    exp = ev[ev["rank"] <= 10].reset_index(drop=True)
    got = (
        reservoir_sample_per_type_events(SF_DIR)
        .to_pandas()
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got.event_type == exp.event_type).all()
    assert (got.event_id.to_numpy() == exp.event_id.to_numpy()).all()
    assert (got.hash_i64.to_numpy() == exp.hash_i64.to_numpy()).all()
    assert (got["rank"].to_numpy() == exp["rank"].to_numpy()).all()
