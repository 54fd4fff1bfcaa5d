"""Distributed prefix-sum scan + sequence packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geodata_ray.stages.packing import (
    global_prefix_sum,
    global_shuffle,
    pack_sequences,
)


@pytest.mark.usefixtures("ray_session")
def test_global_prefix_sum_exclusive_and_partition_invariant():
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 4000
    order = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 50, n).astype(np.int64)
    t = pa.table({"ord": pa.array(order), "v": pa.array(vals)})

    def run(nblocks):
        return (
            global_prefix_sum(
                rd.from_arrow(t).repartition(nblocks),
                order_col="ord", value_col="v",
            )
            .to_pandas().sort_values("ord", ignore_index=True)
        )

    a, b = run(1), run(13)
    assert a.values.tolist() == b.values.tolist()
    ref = (
        pd.DataFrame({"ord": order, "v": vals})
        .sort_values("ord", ignore_index=True)
    )
    ref["prefix"] = ref.v.cumsum() - ref.v  # exclusive
    assert a["prefix"].tolist() == ref["prefix"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_spans_match_reference():
    import ray.data as rd

    rng = np.random.default_rng(37)
    n = 1000
    ntok = rng.integers(0, 40, n).astype(np.int64)  # includes 0-token docs
    order = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "ntok": pa.array(ntok),
            "ord": pa.array(order),
        }
    )
    out = (
        pack_sequences(
            rd.from_arrow(t).repartition(7),
            id_col="doc_id", ntok_col="ntok", order_col="ord", seq_len=64,
        )
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    ref = (
        pd.DataFrame({"doc_id": np.arange(n), "ntok": ntok, "ord": order})
        .sort_values("ord", ignore_index=True)
    )
    ref["start"] = ref.ntok.cumsum() - ref.ntok
    ref["first_seq"] = ref.start // 64
    ref["last_seq"] = np.where(
        ref.ntok > 0, (ref.start + ref.ntok - 1) // 64, ref.first_seq
    )
    ref = ref.sort_values("doc_id", ignore_index=True)
    assert out.start_tok.tolist() == ref.start.tolist()
    assert out.first_seq.tolist() == ref.first_seq.tolist()
    assert out.last_seq.tolist() == ref.last_seq.tolist()
    # every token position is covered exactly once (no gaps/overlap)
    total = int(ntok.sum())
    assert out.start_tok.max() + ntok[out.start_tok.idxmax()] <= total


@pytest.mark.usefixtures("ray_session")
def test_global_shuffle_is_seeded_permutation():
    import ray.data as rd

    from geodata_ray.sources.synth import splitmix64

    n = 3000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})

    def run(nblocks, seed):
        return (
            global_shuffle(
                rd.from_arrow(t).repartition(nblocks),
                id_col="doc_id", seed=seed,
            )
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )

    a = run(1, 7)
    b = run(11, 7)
    # partition-count invariant (same layout on any cluster size)
    assert a.values.tolist() == b.values.tolist()
    # positions are an exact permutation of 0..n-1
    assert sorted(a["shuffle_pos"].tolist()) == list(range(n))
    # rank agrees with a local argsort of the same hash
    h = splitmix64(ids.astype(np.uint64) + np.uint64(7)).view(np.int64)
    ref = pd.DataFrame({"doc_id": ids, "h": h})
    ref["pos"] = ref["h"].rank(method="first").astype(np.int64) - 1
    assert a["shuffle_pos"].tolist() == ref["pos"].tolist()
    assert a["shuffle_ord"].tolist() == ref["h"].tolist()
    # a different seed gives a different order
    c = run(4, 8)
    assert c["shuffle_pos"].tolist() != a["shuffle_pos"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_curriculum_pack_orders_by_score_desc():
    from geodata_ray.pipelines.queries import curriculum_pack_docs
    from geodata_ray.stages.textstats import classifier_score_batch
    from tests.conftest import SF_DIR

    import pyarrow.parquet as pq

    out = (
        curriculum_pack_docs(SF_DIR)
        .to_pandas().sort_values("start_tok", ignore_index=True)
    )
    assert out["start_tok"].iloc[0] == 0
    # the doc at start_tok 0 is the max-score doc (tie: min doc_id)
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    sc = classifier_score_batch(t).to_pandas()
    best = sc.sort_values(["score", "doc_id"],
                          ascending=[False, True]).iloc[0]
    assert out["doc_id"].iloc[0] == best["doc_id"]
    # spans tile: consecutive starts differ by the previous doc's ntok
    merged = out.merge(sc[["doc_id", "n_tokens"]], on="doc_id")
    merged = merged.sort_values("start_tok", ignore_index=True)
    assert (
        merged["start_tok"].to_numpy()[1:]
        == (merged["start_tok"] + merged["n_tokens"]).to_numpy()[:-1]
    ).all()


@pytest.mark.usefixtures("ray_session")
def test_morton_interleave_locality_and_bits():
    from geodata_ray.cellmath.qcell import morton_interleave2

    x = np.array([0, 1, 0, 1, 2, 3], dtype=np.int64)
    y = np.array([0, 0, 1, 1, 2, 3], dtype=np.int64)
    z = morton_interleave2(x, y, 2)
    # hand-computed: x bits even positions, y bits odd
    assert list(z) == [0, 1, 2, 3, 12, 15]
    # round-trip: de-interleave recovers inputs for random 15-bit pairs
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 32768, 200)
    ys = rng.integers(0, 32768, 200)
    zz = morton_interleave2(xs, ys, 15)
    rx = np.zeros_like(xs)
    ry = np.zeros_like(ys)
    for i in range(15):
        rx |= ((zz >> (2 * i)) & 1) << i
        ry |= ((zz >> (2 * i + 1)) & 1) << i
    assert (rx == xs).all() and (ry == ys).all()
