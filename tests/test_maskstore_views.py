"""Mask persistence round-trip + manifest-pruned views + bucketed
embedding dedup (round-2 additions)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from geodata_ray.sources.synth import raster_table


@pytest.mark.usefixtures("ray_session")
def test_mask_save_load_roundtrip(tmp_path):
    import ray.data as rd

    from geodata_ray.stages import raster as R
    from geodata_ray.state import maskstore as M

    root = str(tmp_path / "masks")
    lc = rd.from_arrow(raster_table(layer="landcover")).repartition(4)
    sl = rd.from_arrow(raster_table(layer="slope")).repartition(4)
    merged = R.merge_layers_and(
        lc.union(sl), layers=["landcover", "slope"], reference_layer="slope"
    )
    man = M.save_mask(
        "suit", layers={"landcover": lc, "slope": sl}, merged=merged,
        shape_masks={"box": raster_table(layer="scatter")}, root=root,
    )
    assert man["layers"]["landcover"]["rows"] == 4800
    assert man["shape_masks"]["box"]["rows"] == 4800

    h = M.load_mask("suit", root=root)
    assert h.layer_names == ["landcover", "slope"]
    got = (
        h.layer("slope").to_pandas()
        .sort_values(["row", "col"], ignore_index=True)
    )
    want = (
        raster_table(layer="slope").to_pandas()
        .sort_values(["row", "col"], ignore_index=True)
    )
    np.testing.assert_array_equal(got["value"], want["value"])
    # merged round-trips bit-for-bit
    m1 = merged.to_pandas().sort_values(["row", "col"], ignore_index=True)
    m2 = h.merged().to_pandas().sort_values(["row", "col"], ignore_index=True)
    np.testing.assert_array_equal(m1["value"], m2["value"])
    # re-save overwrites atomically
    M.save_mask("suit", layers={"slope": sl}, root=root)
    assert M.load_mask("suit", root=root).layer_names == ["slope"]


@pytest.mark.usefixtures("ray_session")
def test_partitioned_view_prunes_files(tmp_path):
    import ray.data as rd

    from geodata_ray.state.lineage import (
        read_partitioned_view,
        write_partitioned_resumable,
    )

    out = str(tmp_path / "parts")
    n = 4000
    t = pa.table(
        {
            "id": np.arange(n, dtype=np.int64),
            "bucket": (np.arange(n, dtype=np.int64) * 7) % 5,
            "v": np.arange(n, dtype=np.float64) * 0.5,
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    write_partitioned_resumable(ds, out, "bucket", input_fingerprint="f1")

    view = read_partitioned_view(out, keys=[1, 4])
    files = view.input_files()
    # file-level pruning: ONLY part=1 and part=4 files are opened
    assert files and all(
        ("part=1/" in f or "part=4/" in f) for f in files
    ), files
    got = view.to_pandas().sort_values("id", ignore_index=True)
    want = (
        t.to_pandas()
        .query("bucket in (1, 4)")
        .sort_values("id", ignore_index=True)
    )
    assert got["id"].tolist() == want["id"].tolist()
    np.testing.assert_array_equal(got["v"], want["v"])

    # predicate selection + missing-key error
    v2 = read_partitioned_view(out, predicate=lambda k: int(k) >= 3)
    assert sorted(v2.to_pandas()["bucket"].unique().tolist()) == [3, 4]
    with pytest.raises(FileNotFoundError):
        read_partitioned_view(out, keys=[99])


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_matches_broadcast_exact():
    """The bucketed LSH dedup recovers the same pair set as the exact
    broadcast plan on a corpus with planted near-dups."""
    import ray.data as rd

    from geodata_ray.stages.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((80, 32))
    near = base + rng.standard_normal((80, 32)) * 1e-3
    V = np.vstack([base, near])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(160, dtype=np.int64)),
            "embedding": pa.array(list(V), type=pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    exact = (
        embedding_dup_pairs(ds, threshold=0.999, ref_table=t)
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    lsh = (
        embedding_dup_pairs_lsh(ds, threshold=0.999, bits=8, tables=8)
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    )
    assert len(exact) >= 80
    assert exact.values.tolist() == lsh.values.tolist()


def test_source_manifest_reconciliation(tmp_path):
    """Expected-vs-present diff across all four file granularities
    (reference dataset.py:121-274 enumeration semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geodata_ray.sources.manifest import (
        expected_partitions,
        reconcile_source,
    )
    from geodata_ray.sources.registry import SourceConfig

    def cfg(gran, fkeys=()):
        return SourceConfig(
            name="t", prepare_fn=lambda ds: ds, variables=(),
            file_granularity=gran, file_keys=fkeys,
        )

    assert expected_partitions(cfg("monthly"), [2023], [1, 2]) == [
        "2023-01", "2023-02",
    ]
    feb = expected_partitions(cfg("daily"), [2024], [2])
    assert len(feb) == 29 and feb[0] == "2024-02-01"  # leap year
    multi = expected_partitions(
        cfg("monthly_multiple", ("flux", "rad")), [2023], [1]
    )
    assert multi == ["2023-01.flux", "2023-01.rad"]

    root = str(tmp_path / "src")
    for key in ("2023-01", "2023-02"):
        d = os.path.join(root, f"part={key}")
        os.makedirs(d)
        if key == "2023-01":  # only Jan gets real data
            pq.write_table(pa.table({"x": [1]}), os.path.join(d, "p.parquet"))
    man = reconcile_source(root, cfg("monthly"), years=[2023], months=[1, 2, 3])
    assert man.present == ["2023-01"]
    # Feb dir exists but holds no parquet (killed run): still missing
    assert man.missing == ["2023-02", "2023-03"]
    assert not man.prepared
    assert man.summary()["n_missing"] == 2
