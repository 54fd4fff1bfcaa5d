"""Driver-contract queries: Ray Data pipelines + DuckDB oracle SQL.

Each entry implements one operator family from SURVEY.md §2 over the
driver-provided tables (region nation customer supplier part orders
lineitem events documents embeddings) so the harness can compare the
Ray result against ANSI SQL at sf=0.01 (row count + schema +
order-insensitive value hash).

Conventions:
- every computed column is named identically in Ray and SQL;
- floating aggregates are exposed as SCALED INTEGERS (cents /
  basis-point units): the driver hash-compares values, float sums
  accumulate in different orders across engines, and DuckDB's ROUND
  and pyarrow's round do not even produce the same float64 bits for
  the same input.  All money columns in the driver tables are exact
  2-decimal values, so e.g. ``CAST(ROUND(SUM(x)*100) AS BIGINT)`` is
  engine-independent (true value integral, float error ~1e-9 << 0.5);
- per-row derived floats (no aggregation) are emitted unrounded: the
  same IEEE expression tree produces bit-identical float64 in numpy
  and DuckDB (proven by the tile-assignment query);
- geo queries derive deterministic lat/lon from integer ids with
  arithmetic expressible in both numpy and SQL, then tile with
  ``cellmath.cell_sql_expr`` — making tile assignments SQL-auditable
  (SURVEY.md §7.0).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.cellmath import qcell
from geodata_ray.stages.relational import (
    anti_join,
    broadcast_join,
    grouped_aggregate,
)

# deterministic synthetic geocode for integer ids (Knuth multiplicative
# hashes; BIGINT-safe in both numpy int64 and DuckDB)
from geodata_ray.sources.synth import GEO_A as _GEO_A  # noqa: E402
from geodata_ray.sources.synth import GEO_B as _GEO_B  # noqa: E402
from geodata_ray.sources.synth import GEO_M as _GEO_M  # noqa: E402


def _derive_lat_np(ids: np.ndarray) -> np.ndarray:
    return ((ids * _GEO_A) % _GEO_M) / _GEO_M * 170.0 - 85.0


def _derive_lon_np(ids: np.ndarray) -> np.ndarray:
    return ((ids * _GEO_B) % _GEO_M) / _GEO_M * 360.0 - 180.0


def _read(sf_dir: str, table: str, columns=None):
    """read_parquet with the file's pandas schema-metadata blob
    stripped: a ``pa.Schema`` whose metadata holds a dict is
    UNHASHABLE, which makes Ray's schema-dedup log 'Failed to hash the
    schemas: unhashable type dict' on every read/shuffle of the driver
    tables.  Passing an explicit metadata-free schema fixes it at the
    datasource (no extra stage)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema)


def _scale_to_int(ds, spec: dict[str, int]):
    """Replace float columns with ``round(col * scale)`` as int64 —
    engine-independent when the true value times scale is integral."""

    def f(batch: pa.Table) -> pa.Table:
        for col, scale in spec.items():
            i = batch.schema.get_field_index(col)
            v = pc.round(pc.multiply(pc.cast(batch[col], pa.float64()), float(scale)))
            batch = batch.set_column(i, col, pc.cast(v, pa.int64()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def _cents_bp_np(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer (price cents, discount basis points) of a
    lineitem batch — the ONE place the money quantization convention
    lives (both true values are integral by data contract, so the
    rounded int64s are engine-independent)."""
    cents = pc.cast(
        pc.round(pc.multiply(pc.cast(t["l_extendedprice"], pa.float64()),
                             100.0)),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    bp = pc.cast(
        pc.round(pc.multiply(pc.cast(t["l_discount"], pa.float64()),
                             10000.0)),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    return cents, bp


def _rev_micro_np(t: pa.Table) -> np.ndarray:
    """Exact integer revenue ``price_cents * (10000 - discount_bp)``
    in 10^-6 currency units (the q10 convention, shared by the TPC-H
    completion wave): both factors are integral by data contract, so
    the product is an exact int64 that hash-matches DuckDB's
    ``CAST(ROUND(x*100) AS BIGINT) * (10000 - CAST(ROUND(d*10000) AS
    BIGINT))``."""
    cents, bp = _cents_bp_np(t)
    return cents * (10000 - bp)


# SQL fragment mirroring _rev_micro_np (kept next to it so the pair
# stays in sync; oracles.py imports it)
REV_MICRO_SQL = (
    "CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT)"
    " * (10000 - CAST(ROUND(CAST(l_discount AS DOUBLE) * 10000.0)"
    " AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Q: pricing summary (reference analogue: grouped means/sums A1-A4)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        return batch.append_column("disc_price", disc_price)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price_cents"),
            ("disc_price", "sum", "sum_disc_price_bp"),
            ("l_quantity", "count", "count_order"),
        ],
    )
    return _scale_to_int(
        out,
        {"sum_qty": 1, "sum_base_price_cents": 100, "sum_disc_price_bp": 10000},
    )


# ---------------------------------------------------------------------------
# Q: SQL-audited H3 tiling (the headline tile-assignment check)
# ---------------------------------------------------------------------------


def tiles_r7_events(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id"])

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        cell = qcell.latlng_to_cell(_derive_lat_np(ids), _derive_lon_np(ids), 7)
        return pa.table({"cell": pa.array(cell)})

    cells = ds.map_batches(encode, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("cell").aggregate([([], "count_all")])
        return t.rename_columns(["cell", "n_points"])

    from ray.data.aggregate import Sum

    return (
        cells.map_batches(partial, batch_format="pyarrow")
        .repartition(8)  # tiny partial blocks -> cheap final shuffle
        .groupby("cell")
        .aggregate(Sum("n_points", alias_name="n_points"))
    )


# ---------------------------------------------------------------------------
# Q: bbox cutout filter with anti-meridian wrap (SURVEY.md M2/M3)
# ---------------------------------------------------------------------------


def bbox_filter_events(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        lat = _derive_lat_np(ids)
        lon = _derive_lon_np(ids)
        # bbox lat [-70, 70], lon wrapping across the anti-meridian
        keep = (lat >= -70.0) & (lat <= 70.0) & ((lon >= 120.0) | (lon <= -120.0))
        return pa.table(
            {
                "event_id": pa.array(ids[keep]),
                "lat": pa.array(lat[keep]),
                "lon": pa.array(lon[keep]),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q: top-k (sort+limit, SURVEY.md O5)
# ---------------------------------------------------------------------------


def top10_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(10)


# ---------------------------------------------------------------------------
# Q: exact dedup (SURVEY.md D6)
# ---------------------------------------------------------------------------


def dedup_documents_exact(sf_dir: str):
    """Hash-first exact dedup: only 64-bit text fingerprints shuffle
    (grouping by raw text would make full document text the shuffle
    key).  Identical groups to the SQL ``GROUP BY text`` barring a
    blake2b-64 collision (~n^2/2^65)."""
    from geodata_ray.stages.dedup import exact_dedup_normalized

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_normalized(ds, normalize=False)


# ---------------------------------------------------------------------------
# Q: temporal daily aggregate (heat-demand daily mean, SURVEY.md M16/A1)
# ---------------------------------------------------------------------------


def daily_user_value(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"], unit="day")
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": day,
                "value": batch["value"],
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_aggregate(
        ds,
        ["user_id", "day"],
        [("value", "sum", "sum_value_cents"), ("value", "count", "n_events")],
    )
    return _scale_to_int(out, {"sum_value_cents": 100})


# ---------------------------------------------------------------------------
# Q: broadcast dimension joins (SURVEY.md J4)
# ---------------------------------------------------------------------------


def customer_nation_revenue(sf_dir: str):
    import pyarrow.parquet as pq

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "n_name"])
    joined = broadcast_join(cust, nation, ["c_nationkey"])
    out = grouped_aggregate(
        joined,
        ["n_name"],
        [
            ("c_acctbal", "sum", "sum_acctbal_cents"),
            ("c_custkey", "count", "n_customers"),
        ],
    )
    return _scale_to_int(out, {"sum_acctbal_cents": 100})


def orders_per_segment(sf_dir: str):
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).rename_columns(["o_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, ["o_custkey"])
    out = grouped_aggregate(
        joined,
        ["c_mktsegment"],
        [
            ("o_totalprice", "sum", "revenue_cents"),
            ("o_totalprice", "count", "n_orders"),
        ],
    )
    return _scale_to_int(out, {"revenue_cents": 100})


# ---------------------------------------------------------------------------
# Q: anti join (SURVEY.md D3)
# ---------------------------------------------------------------------------


def customers_without_big_orders(sf_dir: str):
    """Anti join: customers with no order above a threshold (plain
    no-orders is empty at every sf — all custkeys appear in orders)."""
    import pyarrow.parquet as pq

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ot = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    okeys = (
        ot.filter(pc.greater(ot["o_totalprice"], 300000.0))["o_custkey"]
        .unique()
        .to_numpy()
    )
    return anti_join(cust, okeys, "c_custkey")


# ---------------------------------------------------------------------------
# Q: distribution count (SURVEY.md A9)
# ---------------------------------------------------------------------------


def lang_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    return grouped_aggregate(ds, ["lang"], [("lang", "count", "n_docs")])


# ---------------------------------------------------------------------------
# Q: near-duplicate detection (MinHash-LSH + exact-Jaccard verify)
# ---------------------------------------------------------------------------

_MUT_SUFFIX = " zz0 zz1 zz2"
_MUT_OFFSET = 100000
_NDUP_LIMIT = 200  # doc_id < limit keeps the O(n^2) SQL oracle tractable


def _ndup_corpus(sf_dir: str) -> pa.Table:
    """documents (doc_id < limit) plus deterministic near-copies:
    id+offset, text || suffix.  Same construction in SQL."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = t.filter(pc.less(t["doc_id"], _NDUP_LIMIT))
    mut = pa.table(
        {
            "doc_id": pc.add(t["doc_id"], _MUT_OFFSET),
            "text": pc.binary_join_element_wise(
                t["text"], _MUT_SUFFIX, ""
            ),
        }
    )
    return pa.concat_tables([t, mut])


def near_dup_pairs(sf_dir: str):
    """MinHash banding (64 bands x 1 row => recall ~1 for j>=0.5) ->
    exact shingle-Jaccard verify at 0.5 (SURVEY.md D6 extension)."""
    import ray.data as rd

    from geodata_ray.stages.dedup import minhash_lsh_pairs

    corpus = _ndup_corpus(sf_dir)
    ds = rd.from_arrow(corpus)
    return minhash_lsh_pairs(
        ds,
        k=3,
        num_hashes=64,
        bands=64,
        threshold=0.5,
        verify_corpus=corpus,
    )


# ---------------------------------------------------------------------------
# Q: embedding near-dup + ANN top-k (brute-force exact baselines)
# ---------------------------------------------------------------------------


def _embedding_corpus(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vecs = t["embedding"].combine_chunks()
    import numpy as np

    flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(t), -1) + 0.01
    mut = pa.table(
        {
            "vec_id": pc.add(t["vec_id"], _MUT_OFFSET),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float64())),
        }
    )
    base = pa.table(
        {
            "vec_id": t["vec_id"],
            "embedding": pc.cast(t["embedding"], pa.list_(pa.float64())),
        }
    )
    return pa.concat_tables([base, mut])


def embedding_dups(sf_dir: str):
    import ray.data as rd

    from geodata_ray.stages.dedup import embedding_dup_pairs

    corpus = _embedding_corpus(sf_dir)
    ds = rd.from_arrow(corpus)
    return embedding_dup_pairs(
        ds, id_col="vec_id", vec_col="embedding", threshold=0.99,
        ref_table=corpus,
    )


def ann_topk_embeddings(sf_dir: str):
    import pyarrow.parquet as pq

    import ray.data as rd

    from geodata_ray.stages.dedup import _as_matrix
    from geodata_ray.stages.simsearch import ann_topk

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qt = t.filter(pc.less(t["vec_id"], 5))
    Q = _as_matrix(qt["embedding"])
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann_topk(
        ds, Q, qt["vec_id"].to_numpy(), id_col="vec_id", k=5
    )


# ---------------------------------------------------------------------------
# Q: text statistics (token counting / quality inputs)
# ---------------------------------------------------------------------------


def token_stats_docs(sf_dir: str):
    from geodata_ray.stages.textstats import token_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q: event-time windows (tumbling + session)
# ---------------------------------------------------------------------------


def hourly_event_counts(sf_dir: str):
    from geodata_ray.stages.windows import tumbling_counts

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = tumbling_counts(
        ds, key_col="event_type", ts_col="ts", unit="hour", value_col="value"
    )
    out = _scale_to_int(out, {"sum_value": 100})

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [
                "sum_value_cents" if c == "sum_value" else c
                for c in batch.schema.names
            ]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def session_windows_users(sf_dir: str):
    from geodata_ray.stages.windows import session_windows

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return session_windows(ds, key_col="user_id", ts_col="ts", gap_minutes=30)


def sliding_event_counts(sf_dir: str):
    """2h windows sliding by 1h per event_type."""
    from geodata_ray.stages.windows import sliding_counts

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    return sliding_counts(
        ds, key_col="event_type", window_hours=2, slide_hours=1
    )


def top3_orders_per_segment(sf_dir: str):
    """Windowed rank: top-3 orders by totalprice per market segment.

    Physical plan (scale-safe; no full-table per-key groups): each
    batch emits its LOCAL top-3 per segment (<= 3 x 5 rows per batch),
    and the bounded partials merge in one tiny final block — the same
    bounded-cardinality two-phase shape as the flagship tile
    aggregation.  The 5-value segment key means a groupby.map_groups
    would materialize the whole orders ⋈ customer table in 5 workers."""
    import pandas as pd

    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).rename_columns(["o_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, ["o_custkey"])

    def local_top3(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas()
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        )
        g = g.groupby("c_mktsegment", sort=False).head(3)
        return pa.Table.from_pandas(
            g[["c_mktsegment", "o_orderkey", "o_totalprice"]],
            preserve_index=False,
        )

    def final_top3(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas()
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        )
        g = g.groupby("c_mktsegment", sort=False).head(3)
        g["rank"] = g.groupby("c_mktsegment", sort=False).cumcount() + 1
        return pa.Table.from_pandas(
            g[["c_mktsegment", "o_orderkey", "o_totalprice", "rank"]],
            preserve_index=False,
        )

    partial = joined.map_batches(local_top3, batch_format="pyarrow")
    return partial.repartition(1).map_batches(
        final_top3, batch_format="pyarrow", batch_size=None
    )


def sample_docs_hash(sf_dir: str):
    """Deterministic hash sampling (1-in-5 docs) — reproducible at any
    parallelism, unlike seeded random_sample whose output depends on
    block structure."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ((ids * _GEO_A) % _GEO_M) % 5 == 0
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


_PIP_BOXES = [
    # (poly_id, lat0, lat1, lon0, lon1) — axis-aligned so the oracle
    # can express containment with BETWEEN while the Ray side runs the
    # real PolygonIndex/PIP machinery on the equivalent rings
    ("boxA", -20.0, 15.0, -60.0, -20.0),
    ("boxB", 30.0, 55.0, -10.0, 40.0),
    ("boxC", -50.0, -25.0, 100.0, 150.0),
    ("boxD", 50.0, 75.0, 120.0, 179.0),
    ("boxE", -10.0, 10.0, 10.0, 35.0),
]


def pip_boxes_events(sf_dir: str):
    """SQL-audited point-in-polygon join: derived event points against
    rectangle polygons via the real spatial-join machinery (covering
    cells + crossing-number test)."""
    from geodata_ray.stages.spatial_join import spatial_join

    ring_x, ring_y, ids = [], [], []
    for pid, a0, a1, o0, o1 in _PIP_BOXES:
        ids.append(pid)
        ring_x.append([o0, o1, o1, o0, o0])
        ring_y.append([a0, a0, a1, a1, a0])
    polys = pa.table(
        {
            "poly_id": pa.array(ids),
            "ring_x": pa.array(ring_x, type=pa.list_(pa.float64())),
            "ring_y": pa.array(ring_y, type=pa.list_(pa.float64())),
        }
    )

    ds = _read(sf_dir, "events", columns=["event_id"])

    def coords(batch: pa.Table) -> pa.Table:
        ids_np = batch["event_id"].to_numpy()
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lat": pa.array(_derive_lat_np(ids_np)),
                "lon": pa.array(_derive_lon_np(ids_np)),
            }
        )

    pts = ds.map_batches(coords, batch_format="pyarrow")
    joined = spatial_join(pts, polys, mode="inner")
    return joined.select_columns(["event_id", "poly_id"])


def image_ahash_dups(sf_dir: str):
    """Perceptual image dedup over REAL binary payloads: PPM decode ->
    integer average-hash (8x8 luma blocks, cross-multiplied mean
    comparison — zero floats) -> per-hash copy counts.  The corpus
    plants 75 byte-identical re-uploads; the oracle recomputes every
    pixel FROM THE GENERATOR ARITHMETIC (splitmix geometry + modular
    pixel formulas) and replays the hash in SQL — auditing the decode
    + hash chain end-to-end."""
    import ray
    import ray.data as rd

    from geodata_ray.stages.multimodal import (
        image_ahash,
        synth_dup_image_table,
    )

    ds = rd.from_arrow(synth_dup_image_table(200, 125)).repartition(4)
    hashed = image_ahash(ds).select_columns(["image_id", "ahash"])
    hashed = hashed.materialize()
    counts = grouped_aggregate(
        hashed, ["ahash"], [("ahash", "count", "n_copies")]
    )
    counts_tbl = pa.concat_tables(ray.get(counts.to_arrow_refs()))
    return broadcast_join(hashed, counts_tbl, keys=["ahash"])


def s2_tokens_events(sf_dir: str):
    """S2 covering tokens for every event point at levels 8 and 5 plus
    the level-5 roll-up count — the S2 half of the north rule's tiling
    surface, driver-visible.  ROWS-ONLY by design: the Hilbert
    position and the trig in face selection have no bit-stable SQL
    replay (libm sin/cos differ across engines), so correctness is
    carried by the public-spec property tests (tests/test_s2.py:
    lat/lon roundtrip, parent hierarchy, token form) instead of a
    DuckDB oracle."""
    from geodata_ray.cellmath import s2

    ds = _read(sf_dir, "events", columns=["event_id"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        lat = _derive_lat_np(ids)
        lon = _derive_lon_np(ids)
        c8 = s2.latlng_to_s2_cell(lat, lon, 8)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "s2_l8": pa.array(s2.s2_cell_to_token(c8)),
                "s2_l5": pa.array(
                    s2.s2_cell_to_token(s2.s2_cell_parent(c8, 5))
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def daily_distinct_users(sf_dir: str):
    """Exact daily-active-users: COUNT(DISTINCT user) per day with
    in-batch pair pre-dedup before any exchange (the skew-proof exact
    distinct count; the HLL sketch is the approximate sibling)."""
    from geodata_ray.stages.relational import grouped_distinct_count

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "user_id": batch["user_id"],
            }
        )

    return grouped_distinct_count(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["day"],
        "user_id",
        alias="n_users",
    )


def grouped_quantiles_events(sf_dir: str):
    """Per-group EXACT quantiles (quantile_disc): quartiles + p90 of
    the exact-cents event value per event type, via the keyed bounded
    histogram — only (key, cents, count) rows shuffle.  Oracle: ceil-
    rank over a PARTITION BY window."""
    from geodata_ray.stages.relational import grouped_exact_quantiles

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(
                pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)
            ),
            pa.int64(),
        )
        return pa.table(
            {"event_type": batch["event_type"], "value_cents": c}
        )

    return grouped_exact_quantiles(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_type",
        "value_cents",
        [(25, 0.25), (50, 0.5), (75, 0.75), (90, 0.9)],
    )


def bloom_join_lineitem(sf_dir: str):
    """Large-large join with a Bloom semi-join pushdown: lineitem
    (big, streams) joins the high-value orders slice with the orders
    keys sketched into a broadcast 16 KB Bloom filter that pre-filters
    lineitem BEFORE the exchange — the shuffle moves ~5% of the big
    side instead of all of it, and the exact per-bucket hash join
    drops the Bloom false positives, so the result is bit-identical
    to the plain join (which is exactly what the oracle runs)."""
    from geodata_ray.stages.relational import bloom_prefilter_join

    big = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["o_totalprice"], 400000.0))
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t["o_totalprice"], pa.float64()), 100.0)
            ),
            pa.int64(),
        )
        return pa.table(
            {"l_orderkey": t["o_orderkey"], "total_cents": cents}
        )

    small = orders.map_batches(prep, batch_format="pyarrow")
    # size the filter to the small side: 2^18 cells x 4 partitions
    # (~1 MB broadcast) keeps FP ~ (n/2^18)^4 ~ 2e-4 at sf0.1's ~30k
    # keys — the 2^12 sketch default would saturate and filter nothing
    j = bloom_prefilter_join(
        big, small, "l_orderkey", num_buckets=16, lw=18
    )

    def qty_int(batch: pa.Table) -> pa.Table:
        q = pc.cast(
            pc.round(pc.cast(batch["l_quantity"], pa.float64())), pa.int64()
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "qty": q,
                "total_cents": batch["total_cents"],
            }
        )

    return grouped_aggregate(
        j.map_batches(qty_int, batch_format="pyarrow"),
        ["l_orderkey"],
        [
            ("qty", "count", "n_items"),
            ("qty", "sum", "sum_qty"),
            ("total_cents", "max", "total_cents"),
        ],
    )


def trajectory_stats_events(sf_dir: str):
    """Per-user movement summaries over the event stream: each event
    is a time-ordered position on an integer 720x360 grid (derived
    from the id hashes with PURE integer arithmetic — no float
    boundary risk), and the operator reports point/move counts plus
    total and max Chebyshev hop per user.  Hash-bucketed keys + one
    vectorized segment reduction per bucket; the oracle recomputes
    hops with a LAG window."""
    from geodata_ray.stages.windows import trajectory_stats

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def grid(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        gx = (ids * _GEO_A) % _GEO_M * 720 // _GEO_M
        gy = (ids * _GEO_B) % _GEO_M * 360 // _GEO_M
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "gx": pa.array(gx),
                "gy": pa.array(gy),
            }
        )

    pts = ds.map_batches(grid, batch_format="pyarrow")
    return trajectory_stats(pts)


def zonal_stats_events(sf_dir: str):
    """Zonal statistics — the reference's mask-based suitability
    aggregation re-expressed vector-side (geodata ANDs masks with a
    suitability raster and sums per shape, `mask.py`): per-polygon
    count / exact-cents sum / max of the point measure, via the real
    broadcast-PIP join + partial-then-merge aggregate.  The exchange
    carries zone-cardinality rows only."""
    from geodata_ray.stages.spatial_join import zonal_stats

    ring_x, ring_y, ids = [], [], []
    for pid, a0, a1, o0, o1 in _PIP_BOXES:
        ids.append(pid)
        ring_x.append([o0, o1, o1, o0, o0])
        ring_y.append([a0, a0, a1, a1, a0])
    polys = pa.table(
        {
            "poly_id": pa.array(ids),
            "ring_x": pa.array(ring_x, type=pa.list_(pa.float64())),
            "ring_y": pa.array(ring_y, type=pa.list_(pa.float64())),
        }
    )

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def coords(batch: pa.Table) -> pa.Table:
        ids_np = batch["event_id"].to_numpy()
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lat": pa.array(_derive_lat_np(ids_np)),
                "lon": pa.array(_derive_lon_np(ids_np)),
                "value_cents": cents,
            }
        )

    pts = ds.map_batches(coords, batch_format="pyarrow")
    return zonal_stats(
        pts,
        polys,
        by="poly_id",
        specs=[
            ("event_id", "count", "n_points"),
            ("value_cents", "sum", "sum_value_cents"),
            ("value_cents", "max", "max_value_cents"),
        ],
    )


def knn_oracle_events(sf_dir: str):
    """Oracle-audited cell-local kNN: queries and references both live
    in a bounded 10x10-degree region so a ring-2 disk at res 3 provably
    covers every candidate — the kRing plan is exact and can be
    hash-compared against a brute-force haversine oracle."""
    from geodata_ray.stages.knn import knn_join

    rr = np.arange(300, dtype=np.int64)
    ref_lat = 40.0 + ((rr * _GEO_A) % _GEO_M) / _GEO_M * 10.0
    ref_lon = ((rr * _GEO_B) % _GEO_M) / _GEO_M * 10.0

    ds = _read(sf_dir, "events", columns=["event_id"])

    def coords(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        keep = ids < 200
        ids = ids[keep]
        return pa.table(
            {
                "id": pa.array(ids),
                "lat": pa.array(42.0 + ((ids * _GEO_A) % _GEO_M) / _GEO_M * 6.0),
                "lon": pa.array(2.0 + ((ids * _GEO_B) % _GEO_M) / _GEO_M * 6.0),
            }
        )

    pts = ds.map_batches(coords, batch_format="pyarrow")
    out = knn_join(pts, rr, ref_lat, ref_lon, k=3, res=3, ring=2)
    return out.select_columns(["query_id", "ref_id", "rank"])


def asof_latest_order(sf_dir: str):
    """As-of join: for each event, the user's latest order at or before
    the event time (right side pre-deduped per (custkey, date) so tie
    resolution is well-defined in both engines)."""
    from geodata_ray.stages.relational import asof_join, grouped_aggregate

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "custkey": pa.array(uid % 150 + 1),
            }
        )

    left = ev.map_batches(prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch["o_custkey"],
                "o_orderdate": batch["o_orderdate"],
                "o_orderkey": batch["o_orderkey"],
            }
        )

    right = grouped_aggregate(
        orders.map_batches(o_prep, batch_format="pyarrow"),
        ["custkey", "o_orderdate"],
        [("o_orderkey", "max", "o_orderkey")],
    )
    joined = asof_join(
        left, right, by="custkey", left_on="ts", right_on="o_orderdate"
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["o_orderkey"]))
        # the bucketed union null-fills across sides, so int columns
        # may come back as float64 through pandas — cast both outputs
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def running_user_totals(sf_dir: str):
    """Running cumulative per-user value (ordered incremental state —
    the batch expression of a keyed stream; SURVEY.md §2.9)."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        g["cum_value_cents"] = np.cumsum(cents)
        return g[["event_id", "cum_value_cents"]]

    return ds.groupby("user_id").map_groups(cum, batch_format="pandas")


def pip_boxes_anti(sf_dir: str):
    """Anti PIP join: events outside every box (exclude semantics,
    mask.py:593-598)."""
    from geodata_ray.stages.spatial_join import spatial_join

    ring_x, ring_y, ids = [], [], []
    for pid, a0, a1, o0, o1 in _PIP_BOXES:
        ids.append(pid)
        ring_x.append([o0, o1, o1, o0, o0])
        ring_y.append([a0, a0, a1, a1, a0])
    polys = pa.table(
        {
            "poly_id": pa.array(ids),
            "ring_x": pa.array(ring_x, type=pa.list_(pa.float64())),
            "ring_y": pa.array(ring_y, type=pa.list_(pa.float64())),
        }
    )
    ds = _read(sf_dir, "events", columns=["event_id"])

    def coords(batch: pa.Table) -> pa.Table:
        ids_np = batch["event_id"].to_numpy()
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lat": pa.array(_derive_lat_np(ids_np)),
                "lon": pa.array(_derive_lon_np(ids_np)),
            }
        )

    pts = ds.map_batches(coords, batch_format="pyarrow")
    out = spatial_join(pts, polys, mode="anti")
    return out.select_columns(["event_id"])


def q3_shipping_native(sf_dir: str):
    """TPC-H Q3-style: two chained NATIVE Ray hash joins
    (customer |X| orders |X| lineitem) + grouped revenue + top-k."""
    from geodata_ray.stages.relational import grouped_aggregate, native_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(expr="c_mktsegment == 'BUILDING'")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cutoff = pa.scalar(np.datetime64("1998-01-01", "us"))
    orders = orders.map_batches(
        lambda b: b.filter(pc.less(b["o_orderdate"], cutoff)),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    li = li.map_batches(
        lambda b: b.filter(pc.greater(b["l_shipdate"], cutoff)),
        batch_format="pyarrow",
    )

    co = native_join(orders, cust, on="o_custkey", right_on="c_custkey",
                     num_partitions=8)
    col = native_join(li, co, on="l_orderkey", right_on="o_orderkey",
                      num_partitions=8)

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(batch["l_extendedprice"],
                        pc.subtract(1.0, batch["l_discount"]))
        return pa.table({"o_orderkey": batch["l_orderkey"], "rev": r})

    out = grouped_aggregate(
        col.map_batches(rev, batch_format="pyarrow"),
        ["o_orderkey"],
        [("rev", "sum", "revenue_bp")],
    )
    out = _scale_to_int(out, {"revenue_bp": 10000})
    return out.sort(
        ["revenue_bp", "o_orderkey"], descending=[True, False]
    ).limit(10)


def q5_region_supplier_volume(sf_dir: str):
    """TPC-H Q5-style star join: per-nation revenue for one region where
    the ordering customer and the line's supplier share a nation.

    Plan shape (the multi-way star-join showcase): tiny dimensions
    (region -> nation, supplier) prune at the driver and ride along as
    BROADCAST sides inside ``map_batches`` (zero fact-side shuffle);
    customer scales with the data, so orders |X| customer and the final
    orders-branch |X| lineitem-branch are NATIVE hash joins — the only
    two all-to-all exchanges, both over pre-filtered inputs.  Revenue
    is exact fixed-point: cents x (100 - discount_bp) per row, so the
    grouped sum is an order-independent integer in both engines."""
    import pyarrow.parquet as pq

    from geodata_ray.stages.relational import native_join

    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"]
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    nation = nation.filter(
        pc.is_in(nation["n_regionkey"], value_set=rkeys.combine_chunks())
    ).select(["n_nationkey", "n_name"])

    # customer branch: broadcast-prune to region nations, carry nation key
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = broadcast_join(
        cust,
        nation.rename_columns(["c_nationkey", "n_name"]),
        ["c_nationkey"],
    )

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    co = native_join(orders, cust, on="o_custkey", right_on="c_custkey",
                     num_partitions=8)

    # lineitem branch: exact fixed-point revenue + broadcast supplier nation
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nationkey"])
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["l_extendedprice"], pa.float64()), 100.0)),
            pa.int64(),
        )
        dbp = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["l_discount"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "rev_e4": pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dbp)),
            }
        )

    li = broadcast_join(li.map_batches(rev, batch_format="pyarrow"), supp, ["l_suppkey"])

    both = native_join(li, co, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    both = both.map_batches(
        lambda b: b.filter(
            pc.equal(pc.cast(b["c_nationkey"], pa.int32()), pc.cast(b["s_nationkey"], pa.int32()))
        ).select(["n_name", "rev_e4"]),
        batch_format="pyarrow",
    )
    return grouped_aggregate(both, ["n_name"], [("rev_e4", "sum", "revenue_e4")])


def rollup_daily_events(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day): per-(type, day) counts and
    exact-cents sums plus the per-type and grand-total rows, dropped
    keys emitted as NULL — one distributed exchange at the finest
    level, coarser levels derived from the bounded finest table."""
    from geodata_ray.stages.relational import rollup_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "cents": cents,
            }
        )

    return rollup_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "day"],
        [("cents", "count", "n"), ("cents", "sum", "value_cents")],
    )


def cube_daily_type_events(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets —
    (type, day), (type), (day), grand total — from ONE distributed
    finest-level exchange plus a bounded local derivation (the
    rollup's sibling via the shared grouping-sets plan)."""
    from geodata_ray.stages.relational import cube_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "cents": cents,
            }
        )

    return cube_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "day"],
        [("cents", "count", "n"), ("cents", "sum", "value_cents")],
    )


def pivot_event_types_daily(sf_dir: str):
    """Dynamic PIVOT: one count column per discovered event type,
    grouped by day.  The distinct-value pre-pass is the boundedness
    proof; indicator partials pre-combine per batch so the exchange
    carries |days| x |types| integers per batch."""
    from geodata_ray.stages.relational import pivot_counts

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "event_type": batch["event_type"],
            }
        )

    return pivot_counts(
        ds.map_batches(prep, batch_format="pyarrow"), "day", "event_type"
    )


def ip_range_lookup_events(sf_dir: str):
    """Geo-IP-style broadcast interval lookup: each event's synthetic
    IPv4 integer maps to the ASN range containing it via a broadcast
    sorted boundary table + one vectorized searchsorted per batch —
    ZERO shuffle (the scale-correct plan when the range table is
    bounded, vs ``range_join`` which exchanges both sides).  The
    boundary table derives from the same multiplicative-hash family as
    the IPs, so the SQL oracle regenerates it with ``range()``."""
    from geodata_ray.stages.relational import interval_lookup

    ds = _read(sf_dir, "events", columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        ip = (ids * _GEO_A) % _GEO_M
        return pa.table(
            {"event_id": batch["event_id"], "ip": pa.array(ip, pa.int64())}
        )

    bounds = [((k + 1) * _GEO_B) % _GEO_M for k in range(255)]
    return interval_lookup(
        ds.map_batches(prep, batch_format="pyarrow"),
        "ip",
        bounds,
        out_col="asn_id",
    )


def user_value_trend_events(sf_dir: str):
    """Per-user OLS trend (value vs day) from MERGEABLE integer moments:
    each batch emits per-row (x, y, xy, xx) ints, one grouped sum
    produces (n, Sx, Sy, Sxy, Sxx), and the slope is returned as the
    EXACT integer pair (slope_num, slope_den) = (n*Sxy - Sx*Sy,
    n*Sxx - Sx^2) — no float division, so both engines agree bitwise.
    Bounds: |num| <= n^2 * max|x| * max|y| — int64-safe for day-scale x
    and cent-scale y up to ~10^5 rows/key; larger keys need the same
    moments in HUGEINT/float128, documented here rather than silent."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    base_day = 19723  # 2024-01-01 as epoch days (events live in 2024-25)

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        x = (ts.astype("datetime64[s]").astype(np.int64) // 86400) - base_day
        y = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        ).to_numpy()
        return pa.table(
            {
                "user_id": batch["user_id"],
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "xy": pa.array(x * y, pa.int64()),
                "xx": pa.array(x * x, pa.int64()),
            }
        )

    agg = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        [
            ("x", "count", "n"),
            ("x", "sum", "sx"),
            ("y", "sum", "sy"),
            ("xy", "sum", "sxy"),
            ("xx", "sum", "sxx"),
        ],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy()
        sx = batch["sx"].to_numpy()
        sy = batch["sy"].to_numpy()
        sxy = batch["sxy"].to_numpy()
        sxx = batch["sxx"].to_numpy()
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "n": batch["n"],
                "slope_num": pa.array(num, pa.int64()),
                "slope_den": pa.array(den, pa.int64()),
            }
        )
        return t.filter(pa.array(den > 0))

    return agg.map_batches(finalize, batch_format="pyarrow")


def range_join_orders_events(sf_dir: str):
    """Range join: events falling inside a 30-day validity window after
    each order of the same (mapped) customer."""
    from geodata_ray.stages.relational import range_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def e_prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        uid = batch["user_id"].to_numpy()
        # synthetic ts inside the orders epoch (events' real ts lies
        # years after every order window); integer seconds so both
        # engines derive the identical timestamp
        sec = ((ids * _GEO_A) % _GEO_M) % 200_000_000
        ts = np.datetime64("1995-01-01", "us") + sec.astype(
            "timedelta64[s]"
        ).astype("timedelta64[us]")
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": pa.array(ts),
                "custkey": pa.array(uid % 150 + 1),
            }
        )

    left = ev.map_batches(e_prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(batch: pa.Table) -> pa.Table:
        end = pc.add(
            batch["o_orderdate"],
            pa.scalar(30 * 86400 * 1_000_000, pa.duration("us")),
        )
        return pa.table(
            {
                "custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "w_start": batch["o_orderdate"],
                "w_end": end,
            }
        )

    right = orders.map_batches(o_prep, batch_format="pyarrow")
    joined = range_join(
        left, right, by="custkey", left_on="ts",
        right_start="w_start", right_end="w_end",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def props_json_extract(sf_dir: str):
    """JSON scalar extraction from the events props column (RE2 kernel
    on the Ray side, json_extract in the oracle)."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def f(batch: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)'), "k"
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "k": pc.cast(k, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q: large-large partitioned hash join
# ---------------------------------------------------------------------------


def lineitem_part_join(sf_dir: str):
    from geodata_ray.stages.relational import shuffle_join

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["p_partkey", "l_quantity"])

    li = li.map_batches(rename, batch_format="pyarrow")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = shuffle_join(li, part, ["p_partkey"], num_buckets=16)
    out = grouped_aggregate(
        joined,
        ["p_brand"],
        [("l_quantity", "sum", "sum_qty"), ("l_quantity", "count", "n_items")],
    )
    return _scale_to_int(out, {"sum_qty": 1})


# ---------------------------------------------------------------------------
# Q: rows-only checks (no SQL expression; driver records row counts)
# ---------------------------------------------------------------------------


def simhash_docs(sf_dir: str):
    from geodata_ray.stages.dedup import simhash_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


def fingerprint_docs(sf_dir: str):
    from geodata_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def langid_docs(sf_dir: str):
    from geodata_ray.stages.textstats import langid_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(langid_batch, batch_format="pyarrow")


def quality_docs(sf_dir: str):
    from geodata_ray.stages.textstats import quality_score_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


def stratified_sample_events(sf_dir: str):
    """Per-event-type fixed quota (20 rows each): smallest Knuth hash
    of event_id per type — deterministic at any parallelism, ids-only
    shuffle (payloads join back by id)."""
    from geodata_ray.stages.skew import stratified_sample

    ds = _read(sf_dir, "events", columns=["event_type", "event_id"])
    return stratified_sample(
        ds, key="event_type", id_col="event_id", n_per_key=20
    )


def contamination_check(sf_dir: str):
    """Train/eval contamination: the first 50 docs re-ingested as an
    UPPERCASED eval set (simulating benchmark text leaking into a
    crawl with case differences); report corpus docs whose normalized
    fingerprint (md5 of lower-cased text) matches an eval doc's.  The
    eval fingerprint set broadcasts (benchmarks are small by
    definition); the corpus side streams."""
    import pyarrow.parquet as pq

    from geodata_ray.stages.relational import semi_join
    from geodata_ray.stages.textstats import fingerprint_batch

    # the eval side is a small SIDE INPUT by definition: a pushed-down
    # row-group read of the 50 rows + local fingerprinting — no second
    # full corpus scan just to extract it
    ev = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", 50)],
    )
    ev = pa.table(
        {
            "doc_id": pc.add(ev["doc_id"], 900000),
            "text": pc.utf8_upper(ev["text"]),
        }
    )
    eval_fp = fingerprint_batch(ev)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    corpus_fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return semi_join(
        corpus_fp, eval_fp["fingerprint"].to_numpy(), "fingerprint"
    )


def boilerplate_removal_docs(sf_dir: str):
    """CCNet-style boilerplate line removal: every doc gets a common
    'subscribe' line + a unique tail line appended; lines appearing in
    >= 50 docs are removed corpus-wide.  The oracle computes the
    expected clean text straight from the generator (original text +
    unique tail), independent of the removal machinery — so a green
    row proves the line DF counts, the hot-set threshold, and the
    order-preserving rejoin all at once."""
    from geodata_ray.stages.textstats import remove_boilerplate_lines

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def with_boiler(batch: pa.Table) -> pa.Table:
        import pandas as pd

        sid = pd.Series(batch["doc_id"].to_numpy()).astype(str)
        t = pd.Series(batch["text"].to_pandas())
        t2 = t + "\nSubscribe to our newsletter today!\nUnique tail " + sid
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t2.to_numpy())}
        )

    corpus = ds.map_batches(with_boiler, batch_format="pyarrow")
    return remove_boilerplate_lines(corpus, min_docs=50)


def redact_pii_docs(sf_dir: str):
    """PII scrubbing: every doc gets a planted email + phone + IPv4 +
    SSN + IBAN appended (derived from doc_id); the redactor must
    replace exactly those with typed placeholders.  The oracle derives
    the expected clean text straight from the generator — independent
    of the regex machinery (the driver corpus itself contains no digits
    or emails, so the original text must pass through byte-identical)."""
    from geodata_ray.stages.textstats import redact_pii_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        sid = pd.Series(ids).astype(str)
        oct4 = pd.Series(ids % 254).astype(str)
        ssn = (
            pd.Series(ids % 900 + 100).astype(str)
            + "-" + pd.Series(ids % 90 + 10).astype(str)
            + "-" + pd.Series(ids % 9000 + 1000).astype(str)
        )
        iban = (
            "DE" + pd.Series(ids % 90 + 10).astype(str)
            + "BANK" + sid.str.zfill(10)
        )
        t = pd.Series(batch["text"].to_pandas())
        t2 = (
            t + " Contact user" + sid + "@mail.example.com or"
            + " +1 (415) 555-0142 from 192.168.0." + oct4 + " now."
            + " SSN " + ssn + " IBAN " + iban + " end."
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(t2.to_numpy())}
        )

    return ds.map_batches(plant, batch_format="pyarrow").map_batches(
        redact_pii_batch, batch_format="pyarrow"
    )


def url_canonicalize_docs(sf_dir: str):
    """URL canonicalization + host extraction over deterministically
    MESSY urls (case-mutated scheme/host, default :443 ports, trailing
    slashes, fragments — all derived from doc_id): the oracle computes
    the ground-truth canonical form DIRECTLY from the doc_id arithmetic,
    so the engine's normalizer must undo every mutation exactly."""
    from geodata_ray.stages.urls import canonicalize_batch

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def messy(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        k = pd.Series(ids % 97).astype(str)
        sid = pd.Series(ids).astype(str)
        scheme = pd.Series(np.where(ids % 2 == 0, "HTTPS", "https"))
        host = np.where(
            ids % 3 == 0,
            ("SITE" + k + ".Example.COM").to_numpy(),
            ("site" + k + ".example.com").to_numpy(),
        )
        # ids%10==0 zero-pads the default port (':0443') — still the
        # default, so the generator-derived oracle is unchanged, but the
        # normalizer must compare ports numerically to drop it
        port = pd.Series(
            np.where(
                ids % 10 == 0,
                ":0443",
                np.where(ids % 5 == 0, ":443", ""),
            )
        )
        trail = pd.Series(np.where(ids % 7 == 0, "/", ""))
        frag = pd.Series(
            np.where(
                ids % 11 == 0,
                ("#s" + pd.Series(ids % 4).astype(str)).to_numpy(),
                "",
            )
        )
        url = (
            scheme + "://" + pd.Series(host) + port + "/d" + sid
            + trail + frag
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(url.to_numpy())}
        )

    pages = ds.map_batches(messy, batch_format="pyarrow")
    out = pages.map_batches(canonicalize_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "canonical_url", "host"])


def streaming_dedup_docs(sf_dir: str):
    """Incremental (crawl-style) exact dedup through seen-set actor
    shards: the corpus plus the first 100 docs RE-INGESTED (uppercased,
    offset ids) streams in id order; re-arrivals are dropped the moment
    their normalized fingerprint repeats.  With a total arrival order
    the kept row per fingerprint is exactly min(doc_id) — the SQL
    oracle's window QUALIFY."""
    from geodata_ray.stages.streaming import streaming_exact_dedup
    from geodata_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def reingest(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less(batch["doc_id"], 100))
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 900000),
                "text": pc.utf8_upper(t["text"]),
            }
        )

    stream = ds.union(ds.map_batches(reingest, batch_format="pyarrow"))
    fp = stream.map_batches(fingerprint_batch, batch_format="pyarrow")
    return streaming_exact_dedup(
        fp, order_col="doc_id", fp_col="fingerprint"
    )


def heavy_hitter_users(sf_dir: str):
    """Exact heavy hitters over events.user_id (>= 80 rows) via the
    two-pass Misra-Gries candidates + exact-count plan — no full-key
    shuffle (only m summary rows per batch + the bounded candidate
    recount move)."""
    from geodata_ray.stages.skew import heavy_hitters

    ds = _read(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ds, "user_id", min_count=80)


def tfidf_top_terms_docs(sf_dir: str):
    """Top-3 TF-IDF keywords per document (two-phase DF + broadcast
    score/rank; rank-only output so no float ever reaches the hash —
    see tfidf_top_terms' cross-engine-ordering analysis: on this
    corpus every exact score tie is tie-broken identically by term ASC
    in both engines)."""
    from geodata_ray.stages.textstats import tfidf_top_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_terms(ds, k=3)


def _grid_ds(sf_dir: str):
    """Deterministic grid fixture scaled by sf (same table at any
    parallelism); sf only sets the number of hours.  Read from the
    persisted fixture parquet so the DuckDB oracle consumes the
    byte-identical input file (oracle SQL targets the 120-hour file —
    the driver's sf0.01 gate)."""
    import ray.data as rd

    from geodata_ray.pipelines.fixtures import (
        ensure_fixture_parquet,
        fixture_path,
    )

    import os

    # exact-basename switch (a substring test would misfire on paths
    # merely containing "0.1"); the oracle SQL targets grid_120, and
    # tools/check_correctness refuses non-sf0.01 dirs for that reason
    base = os.path.basename(os.path.normpath(sf_dir))
    name = "grid_240" if base == "sf0.1" else "grid_120"
    ensure_fixture_parquet([name])
    return rd.read_parquet(fixture_path(name)).repartition(8)


def windspd_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.windspd(_grid_ds(sf_dir), hub_height=80.0)
    return _scaled_renamed(out, "wnd80m", "wnd80m_umps", 1_000_000)


def wind_power_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.wind_power(_grid_ds(sf_dir), "fixture_1500kw", smooth=True)
    return _scaled_renamed(out, "capacity_factor", "cf_ppm", 1_000_000)


def windwpd_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.windwpd(_grid_ds(sf_dir), hub_height=50.0)
    return _scaled_renamed(out, "wpd", "wpd_x10k", 10_000)


def pv_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.pv(_grid_ds(sf_dir), "fixture_huld")
    return _scaled_renamed(out, "pv_power", "pv_power_ppm", 1_000_000)


def pv_tracking_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.pv(
        _grid_ds(sf_dir), "fixture_bofinger",
        orientation="latitude_optimal", trigon_model="hay-davies",
    )
    return _scaled_renamed(out, "pv_power", "pv_power_ppm", 1_000_000)


def solar_thermal_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.solar_thermal(_grid_ds(sf_dir))
    return _scaled_renamed(out, "solar_thermal", "solar_thermal_x10k", 10_000)


def pm25_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    return P.pm25(_grid_ds(sf_dir))


def temperature_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    return P.temperature(_grid_ds(sf_dir))


def heat_demand_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    return P.heat_demand(_grid_ds(sf_dir), threshold=15.0, a=1.0)


def winddir_grid(sf_dir: str):
    from geodata_ray.pipelines import conversions as P

    out = P.winddir(_grid_ds(sf_dir))
    return _scaled_renamed(out, "winddir", "winddir_udeg", 1_000_000)


def _raster_ds(layer: str):
    import ray.data as rd

    from geodata_ray.pipelines.fixtures import (
        ensure_fixture_parquet,
        fixture_path,
    )

    name = f"raster_{layer}"
    ensure_fixture_parquet([name])
    return rd.read_parquet(fixture_path(name)).repartition(6)


def _scaled_renamed(ds, old: str, new: str, scale: int):
    """Rename a derived float column and emit it as ``round(x * scale)``
    int64 — the engine-independent convention for trig/log-heavy
    chains where numpy's SIMD kernels and DuckDB's libm may differ in
    the last ulp (see module docstring conventions)."""

    def f(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(old)
        # half_towards_infinity = DuckDB ROUND's half-away-from-zero,
        # so exact .5 products (possible from interp breakpoints)
        # round identically in both engines
        v = pc.round(
            pc.multiply(pc.cast(batch[old], pa.float64()), float(scale)),
            round_mode="half_towards_infinity",
        )
        # NaN -> null so the int cast survives (e.g. sea-cell NaNs in
        # panel models); SQL mirrors with CASE isnan THEN NULL
        v = pc.if_else(pc.is_nan(v), pa.scalar(None, pa.float64()), v)
        return batch.set_column(i, new, pc.cast(v, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def _raster_both_ds():
    return _raster_ds("landcover").union(_raster_ds("slope"))


def kring_smooth_raster(sf_dir: str):
    """Focal (3x3 k-ring) statistics over the slope raster cell table:
    per existing cell, neighbor count + exact micro-unit value sum —
    the distributed-stencil form of raster smoothing (the reference
    smooths dense arrays in-process; a cell table needs the
    scatter-and-group formulation).  Values pre-scaled to integers so
    partial sums merge exactly; the oracle recomputes the stencil with
    a range self-join."""
    from geodata_ray.stages import raster as R

    ds = _raster_ds("slope")

    def to_micro(batch: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(batch["value"], pa.float64()), 1e6),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {"row": batch["row"], "col": batch["col"], "v": v}
        )

    cells = ds.map_batches(to_micro, batch_format="pyarrow")
    return R.stencil_smooth(cells, radius=1, value_col="v")


def raster_and_merge(sf_dir: str):
    from geodata_ray.stages import raster as R

    return R.merge_layers_and(
        _raster_both_ds(),
        layers=["landcover", "slope"],
        reference_layer="slope",
    )


def raster_sum_merge(sf_dir: str):
    from geodata_ray.stages import raster as R

    return R.merge_layers_sum(
        _raster_both_ds(),
        weights={"landcover": 2.0, "slope": 0.5},
    )


def raster_filter_trim(sf_dir: str):
    from geodata_ray.stages import raster as R

    return R.trim_raster(
        R.filter_raster(_raster_ds("landcover"), values=[1.0, 2.0, 3.0])
    )


def raster_resample_r5(sf_dir: str):
    from geodata_ray.stages import raster as R

    return R.resample_to_cells(_raster_ds("slope"), res=5, agg="mean")


def raster_min_area(sf_dir: str):
    """Min-area filter over the sparse ``scatter`` layer: components
    are small by construction, which keeps the DuckDB oracle's
    recursive-CTE label propagation (cost ~ sum size^2) tractable.
    Dense-raster coverage (big components sliced by stripes) lives in
    tests/test_raster_knn.py."""
    from geodata_ray.stages import raster as R

    return R.min_area_filter(_raster_ds("scatter"), min_cells=3)


def raster_min_area_km2(sf_dir: str):
    """AREA-weighted min-area filter (the reference's actual
    ``filter_area`` semantics, mask.py:1309-1398: components below a
    minimum km^2, not pixel count): per-component SUM of the
    lat-dependent spherical pixel area.  1800 km^2 sits between a
    3-pixel component at high latitude (~1692 km^2) and at low latitude
    (~1993 km^2), so the oracle proves the km^2 measure — not the
    count — decides (11 of the 17 three-cell components pass)."""
    from geodata_ray.stages import raster as R

    return R.min_area_filter(
        _raster_ds("scatter"), min_km2=1800.0, pitch_deg=0.25
    )


# --- DuckDB oracle SQL lives in pipelines/oracles.py (the
# verification half of the contract; float-exactness rules documented
# there).  Module __getattr__ below re-exports its names lazily.


# the driver's correctness gate always runs sf0.01 (the iterative-ML
# oracles must inline init rows/corpus size from the actual file)
_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def embedding_dups_lsh(sf_dir: str):
    """Bucketed (multi-table hyperplane LSH) embedding near-dup — the
    10^12-vector path, audited by the SAME exact-cosine SQL oracle as
    the broadcast plan: green means the bucketed pipeline recovered
    every cos>=0.99 pair on this corpus (recall 1, precision 1 by
    construction)."""
    import ray.data as rd

    from geodata_ray.stages.dedup import embedding_dup_pairs_lsh

    corpus = _embedding_corpus(sf_dir)
    ds = rd.from_arrow(corpus).repartition(4)
    return embedding_dup_pairs_lsh(
        ds, id_col="vec_id", vec_col="embedding", threshold=0.99,
        bits=8, tables=8,
    )


def mask_save_load_attach(sf_dir: str):
    """The reference's full mask workflow end-to-end (mask.py:786-933
    save_mask / Mask.from_name + cutout.py:363-392 add_mask): build a
    merged AND-mask from two layers, SAVE it by name, RELOAD it from
    disk, resample to res-5 cells, attach to the grid table.  The
    oracle recomputes merge+resample+join in SQL from the same fixture
    parquet, so a green row proves the round trip preserved the mask
    bit-for-bit."""
    from geodata_ray.stages import raster as R
    from geodata_ray.state.maskstore import attach_named_mask, save_mask

    merged = R.merge_layers_and(
        _raster_both_ds(), layers=["landcover", "slope"],
        reference_layer="slope",
    )

    def addll(batch: pa.Table) -> pa.Table:
        r = batch["row"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = batch["col"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "lat": pa.array(30.0 + (r + 0.5) * 0.25),
                "lon": pa.array(-15.0 + (c + 0.5) * 0.25),
                "value": batch["value"],
            }
        )

    merged_ll = merged.map_batches(addll, batch_format="pyarrow")
    save_mask(
        "suitability_q",
        layers={
            "landcover": _raster_ds("landcover"),
            "slope": _raster_ds("slope"),
        },
        merged=merged_ll,
    )

    grid = _grid_ds(sf_dir)

    def gridpoints(batch: pa.Table) -> pa.Table:
        return batch.select(["ts", "lat", "lon"])

    pts = grid.map_batches(gridpoints, batch_format="pyarrow")
    out = attach_named_mask(pts, "suitability_q", res=5)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["ts", "lat", "lon", "cell", "mask_value"])

    return out.map_batches(project, batch_format="pyarrow")


def partitioned_view_events(sf_dir: str):
    """Manifest-pruned VIEW over a resumable partitioned write (the
    reference's prepared-cutout view semantics, cutout.py:129-177):
    events are written once to part=<bucket>/ dirs, then the view
    reopens ONLY buckets {{1, 3}} — file-level pruning, proven by
    input_files() in tests."""
    import hashlib
    import os

    from geodata_ray.state.lineage import (
        read_partitioned_view,
        write_partitioned_resumable,
    )

    fp = hashlib.sha256(
        str(os.path.getmtime(f"{sf_dir}/events.parquet")).encode()
        + sf_dir.encode()
    ).hexdigest()
    out_dir = f"/tmp/geodata_views/events_{fp[:12]}"
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        b = ((ids * _GEO_A) % _GEO_M) % 8
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow")
    write_partitioned_resumable(
        keyed, out_dir, "bucket", stage_version="v1", input_fingerprint=fp
    )
    return read_partitioned_view(out_dir, keys=[1, 3])


def knn_events_gazetteer(sf_dir: str):
    """Cell-local kNN: derived event coords -> 3 nearest gazetteer
    cities (rows-only; exactness vs brute force in tests)."""
    from geodata_ray.sources.synth import gazetteer_arrays
    from geodata_ray.stages.knn import knn_join

    names, lats, lons, _ = gazetteer_arrays()
    ds = _read(sf_dir, "events", columns=["event_id"])

    def coords(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        return pa.table(
            {
                "id": batch["event_id"],
                "lat": pa.array(_derive_lat_np(ids)),
                "lon": pa.array(_derive_lon_np(ids)),
            }
        )

    pts = ds.map_batches(coords, batch_format="pyarrow")
    # ring=5 at res 2 (11.25-degree cells): the disk spans ~±56 degrees,
    # which covers the 3rd-nearest of 500 global cities everywhere incl.
    # polar/anti-meridian sparse regions — proven exact by the
    # brute-force SQL oracle below (ring=2 missed ~3% of ranks)
    out = knn_join(
        pts, np.arange(len(names)), lats, lons, k=3, res=2, ring=5
    )
    return out.select_columns(["query_id", "ref_id", "rank"])


def top3_events_per_type_salted(sf_dir: str):
    """Salted top-k against a SQL oracle: every event_type is hot at
    this threshold, so the query exercises the full salt -> per-(key,
    salt) partial top-k -> per-key merge path (``stages/skew.py``) and
    hash-matches a plain ROW_NUMBER window."""
    from geodata_ray.stages.skew import salted_topk_per_key

    ds = _read(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return salted_topk_per_key(
        ds, key="event_type", order_col="value", k=3, n_salts=4,
        threshold_rows=100,
    )


def wind_model_fit_grid(sf_dir: str):
    from geodata_ray.stages import wind_model as WM

    return WM.fit_extrapolation(_grid_ds(sf_dir))


def wind_model_estimate_grid(sf_dir: str):
    from geodata_ray.stages import wind_model as WM

    params = WM.fit_extrapolation(_grid_ds(sf_dir))
    out = WM.estimate_extrapolation(params, 30.0)
    return _scaled_renamed(out, "wnd30m_est", "wnd30m_est_um", 1_000_000)


def wind_spline_estimate_grid(sf_dir: str):
    """Spline interpolation model over synthetic multi-height speeds
    (deterministic power-law profile of wndlml)."""
    from geodata_ray.stages import wind_model as WM

    hs = WM._SPLINE_HEIGHTS

    def profile(batch: pa.Table) -> pa.Table:
        u = batch["ulml"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = batch["vlml"].to_numpy(zero_copy_only=False).astype(np.float64)
        base = np.sqrt(u * u + v * v)  # SQL-reproducible sqrt form
        cols = {
            "ts": batch["ts"],
            "lat": batch["lat"],
            "lon": batch["lon"],
        }
        for h in hs:
            cols[f"wnd_h{h:g}"] = pa.array(base * (h / 10.0) ** 0.14)
        return pa.table(cols)

    src = _grid_ds(sf_dir).map_batches(profile, batch_format="pyarrow")
    params = WM.fit_spline(src)
    out = WM.estimate_spline(params, 80.0)
    return _scaled_renamed(out, "wnd80m_est", "wnd80m_est_um", 1_000_000)


def _spline_profile_const() -> float:
    """Independent (pure-Python Gaussian elimination, no numpy solve)
    evaluation of the not-a-knot spline through the power-law profile
    constants c_h = (h/10)^0.14 at h=80.  Because the spline is LINEAR
    in its data values and every profile column is ``base * c_h``, the
    whole fit+estimate collapses to ``est = base * K`` — the oracle
    inlines K and recomputes only the base wind speed."""
    from geodata_ray.stages.wind_model import _SPLINE_HEIGHTS

    xs = [float(h) for h in _SPLINE_HEIGHTS]
    ys = [(h / 10.0) ** 0.14 for h in xs]
    K = len(xs)
    h = [xs[i + 1] - xs[i] for i in range(K - 1)]
    A = [[0.0] * K for _ in range(K)]
    d = [0.0] * K
    for i in range(1, K - 1):
        A[i][i - 1] = h[i - 1]
        A[i][i] = 2.0 * (h[i - 1] + h[i])
        A[i][i + 1] = h[i]
        d[i] = 6.0 * ((ys[i + 1] - ys[i]) / h[i] - (ys[i] - ys[i - 1]) / h[i - 1])
    A[0][0], A[0][1], A[0][2] = h[1], -(h[0] + h[1]), h[0]
    A[K - 1][K - 3] = h[K - 2]
    A[K - 1][K - 2] = -(h[K - 3] + h[K - 2])
    A[K - 1][K - 1] = h[K - 3]
    # plain partial-pivot elimination
    for col in range(K):
        p = max(range(col, K), key=lambda r: abs(A[r][col]))
        A[col], A[p] = A[p], A[col]
        d[col], d[p] = d[p], d[col]
        for r in range(col + 1, K):
            f = A[r][col] / A[col][col]
            for c in range(col, K):
                A[r][c] -= f * A[col][c]
            d[r] -= f * d[col]
    m = [0.0] * K
    for r in range(K - 1, -1, -1):
        s = d[r] - sum(A[r][c] * m[c] for c in range(r + 1, K))
        m[r] = s / A[r][r]
    xq = 80.0
    i = 0
    while i < K - 2 and xs[i + 1] <= xq:
        i += 1
    hi = xs[i + 1] - xs[i]
    a = (xs[i + 1] - xq) / hi
    b = (xq - xs[i]) / hi
    return (
        m[i] * (a**3 - a) * hi**2 / 6.0
        + m[i + 1] * (b**3 - b) * hi**2 / 6.0
        + ys[i] * a
        + ys[i + 1] * b
    )


def flagship_resumable(sf_dir: str):
    """Flagship enrichment written as resumable partitioned parquet
    with per-partition lineage records — SELF-AUDITING: after the
    write, every partition is re-read from disk, re-hashed with the
    same canonical content hash, and compared (rows + hash) against
    the manifest record; the query RAISES on any mismatch, so a green
    run proves write -> manifest -> re-read bit-identity even though
    the side effect itself has no SQL expression.  Returns the audited
    manifest (key, rows, skipped, roundtrip_ok)."""
    import tempfile

    from geodata_ray.pipelines.flagship import enrich_pages, pages_from_documents
    from geodata_ray.state import lineage as L

    pages = pages_from_documents(sf_dir)
    enriched = enrich_pages(pages)

    def add_shard(batch: pa.Table) -> pa.Table:
        cell = batch["h3_r5"].to_numpy()
        shard = np.where(cell >= 0, cell % 8, -1)
        return batch.append_column("shard", pa.array(shard))

    sharded = enriched.map_batches(add_shard, batch_format="pyarrow")
    out_dir = tempfile.mkdtemp(prefix="graft_lineage_")
    manifest = L.write_partitioned_resumable(
        sharded, out_dir, "shard", stage_version="v1",
        input_fingerprint=sf_dir,
    )
    audit = L.audit_partitions(out_dir).to_pandas()
    if not audit["roundtrip_ok"].all():
        bad = audit[~audit["roundtrip_ok"]]["key"].tolist()
        raise RuntimeError(
            f"flagship_resumable round-trip audit FAILED for "
            f"partitions {bad}"
        )
    out = manifest.merge(
        audit[["key", "roundtrip_ok"]], on="key", how="left"
    ).sort_values("key", ignore_index=True)
    return out


def top_pages_per_tile(sf_dir: str):
    """Per-tile top-k: highest-extracted-length pages per r5 cell.

    Physical plan: per-batch PARTIAL top-3 per cell (each batch ships
    <= 3 x n_cells rows — top-k is decomposable, so hot megacity cells
    collapse locally, no salting needed) + a bounded-cardinality final
    merge (res-5 cells over the gazetteer footprint).  The salted-topk
    primitive remains for HOLISTIC per-group computations and is
    oracle-audited by top3_events_per_type_salted."""
    import pandas as pd

    from geodata_ray.pipelines.flagship import enrich_pages, pages_from_documents

    enriched = enrich_pages(pages_from_documents(sf_dir))

    def score(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch["extracted_text"])
        t = pa.table(
            {
                "url": batch["url"],
                "cell": batch["h3_r5"],
                "score": pc.cast(n, pa.float64()),
            }
        )
        keep = pc.greater_equal(t["cell"], 0)
        return t.filter(keep)

    def local_top3(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas()
        g = g.sort_values(["score", "url"], ascending=[False, True])
        return pa.Table.from_pandas(
            g.groupby("cell", sort=False).head(3), preserve_index=False
        )

    def final_top3(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas()
        g = g.sort_values(["score", "url"], ascending=[False, True])
        g = g.groupby("cell", sort=False).head(3)
        g["rank"] = g.groupby("cell", sort=False).cumcount() + 1
        return pa.Table.from_pandas(g, preserve_index=False)

    partial = enriched.map_batches(
        score, batch_format="pyarrow"
    ).map_batches(local_top3, batch_format="pyarrow")
    return partial.repartition(1).map_batches(
        final_top3, batch_format="pyarrow", batch_size=None
    )


def value_quantiles_events(sf_dir: str):
    """Mergeable quantile sketch over events.value (rows-only;
    accuracy/determinism proven in tests)."""
    import pandas as pd

    from geodata_ray.stages.sketch import approx_quantiles

    ds = _read(sf_dir, "events", columns=["value"])
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    res = approx_quantiles(ds, "value", qs)
    return pd.DataFrame(
        {"q_pct": [int(q * 100) for q in qs], "value": [res[q] for q in qs]}
    )


def ts_series_grid(sf_dir: str):
    """Plot-prep time series (reference plot.py:35-131
    ``ds_ts_aggregate``): daily spatial-mean temperature over the grid
    fixture.  Exact-float oracle: float32 inputs sum exactly in
    float64, so the grouped mean is engine-independent."""
    from geodata_ray.pipelines.plotprep import time_series

    return time_series(_grid_ds(sf_dir), "temperature", freq="day")


def heatmap_grid(sf_dir: str):
    """Plot-prep heatmap (reference plot.py:61-336 map inputs):
    time-mean temperature per (lat, lon) cell."""
    from geodata_ray.pipelines.plotprep import heatmap_table

    return heatmap_table(_grid_ds(sf_dir), "temperature")


def exact_quantiles_events(sf_dir: str):
    """EXACT distributed quantiles via two-phase bucket histogram:
    the driver values are exact 2-decimal, so a grouped count per cents
    bucket (bounded cardinality regardless of row count — only (bucket,
    partial-count) rows shuffle) plus a driver-side cumulative walk
    gives quantile_disc semantics with no approximation.  Complements
    the mergeable sketch (value_quantiles_events), which trades
    exactness for unbounded-resolution values."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table({"cents": c})

    hist = (
        grouped_aggregate(
            ds.map_batches(cents, batch_format="pyarrow"),
            ["cents"],
            [("cents", "count", "n")],
        )
        .to_pandas()
        .sort_values("cents", ignore_index=True)
    )
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["cents"].to_numpy()
    n = int(cum[-1])
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    out_v = []
    for q in qs:
        target = int(np.ceil(q * n))  # smallest v with #(x <= v) >= ceil(q*n)
        out_v.append(int(vals[np.searchsorted(cum, target)]))
    return pd.DataFrame(
        {"q_pct": [int(q * 100) for q in qs], "value_cents": out_v}
    )


def sample_frames_stream(sf_dir: str):
    """Video frame sampling over REAL PPM-stream payloads, SQL-audited
    (r5 conversion from rows-only): the kernel parses every frame
    header from the byte stream, decodes every 4th frame, and emits its
    EXACT integer pixel sum (r+g+b over the 16x12 raster) — the oracle
    regenerates the sampled frames' pixels from the generator
    arithmetic and replays the sums, so frame boundaries, sampling
    stride AND decoded pixel bytes are all verified (the float
    frame-mean form of this stage stays in
    stages/multimodal.py::sample_frames for feature use)."""
    import ray.data as rd

    from geodata_ray.stages.multimodal import ppm_decode, synth_video_table

    ds = rd.from_arrow(synth_video_table(60)).repartition(4)

    def sampled_sums(batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_numpy()
        out_id, out_no, out_sum = [], [], []
        for vid, p in zip(ids, batch["payload"].to_pylist()):
            off, frame_no = 0, 0
            while off < len(p):
                px, off = ppm_decode(p, off)
                if frame_no % 4 == 0:
                    out_id.append(int(vid))
                    out_no.append(frame_no)
                    out_sum.append(int(px.astype(np.int64).sum()))
                frame_no += 1
        return pa.table(
            {
                "video_id": pa.array(out_id, pa.int64()),
                "frame_no": pa.array(out_no, pa.int64()),
                "pixel_sum": pa.array(out_sum, pa.int64()),
            }
        )

    return ds.map_batches(
        sampled_sums, batch_format="pyarrow", batch_size=128
    )


def audio_features_wav(sf_dir: str):
    """Audio features from REAL decoded PCM WAV samples, SQL-audited
    (r5 conversion from rows-only): the RIFF chunk walk + int16 decode
    run over the integer-noise clip corpus, and the features are
    EXACT-integer waveform statistics — sample count, sum of absolute
    amplitudes, zero-crossing count, peak amplitude — which the oracle
    replays by regenerating every sample from the splitmix arithmetic
    (LAG for the crossings).  The float cepstrum form stays in
    stages/multimodal.py::extract_audio_features for feature use (its
    sine corpus is not bit-replayable across engines)."""
    import ray.data as rd

    from geodata_ray.stages.multimodal import (
        synth_audio_int_table,
        wav_decode,
    )

    ds = rd.from_arrow(synth_audio_int_table(200)).repartition(4)

    def feats(batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_numpy()
        out = {"clip_id": [], "n_samples": [], "abs_sum": [],
               "zero_crossings": [], "peak": []}
        for cid, p in zip(ids, batch["payload"].to_pylist()):
            s, _rate = wav_decode(p)
            v = s.astype(np.int64)
            out["clip_id"].append(int(cid))
            out["n_samples"].append(int(v.size))
            out["abs_sum"].append(int(np.abs(v).sum()))
            out["zero_crossings"].append(
                int((v[1:] * v[:-1] < 0).sum()) if v.size > 1 else 0
            )
            out["peak"].append(int(np.abs(v).max()) if v.size else 0)
        return pa.table(
            {k: pa.array(vals, pa.int64()) for k, vals in out.items()}
        )

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=128)


def running_totals_actor_stream(sf_dir: str):
    """Keyed stateful-actor stream (raw-actor last-resort pattern):
    running per-user cents over event time; rows-only (same semantics
    as running_user_totals, which is SQL-audited)."""
    from geodata_ray.stages.streaming import keyed_running_aggregate

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "cents": cents,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = keyed_running_aggregate(
        prepped, key_col="user_id", ts_col="ts", value_col="cents",
        num_buckets=4,
    )
    # out is a Dataset (shard outputs stay in the object store)
    return out.select_columns(["event_id", "running_sum", "running_n"])


def normalize_era5_raw(sf_dir: str):
    """ERA5-style raw variables -> canonical schema (M7 normalizer);
    deterministic raw fixture derived from event ids."""
    from geodata_ray.stages.normalize import normalize_era5

    ds = _read(sf_dir, "events", columns=["event_id"])

    def raw(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        def u(stream):
            return (((ids * _GEO_A + stream * 7919) % _GEO_M) / _GEO_M)
        ssrd = u(1) * 3.6e6
        fdir = ssrd * (0.2 + 0.7 * u(2))
        return pa.table({
            "ts": pa.array((ids * 3600 * 1_000_000).astype("datetime64[us]")),
            "lat": pa.array(u(3) * 120.0 - 60.0),
            "lon": pa.array(u(4) * 360.0 - 180.0),
            "z": pa.array(u(5) * 5e4),
            "ssrd": pa.array(ssrd),
            "ssr": pa.array(ssrd * (0.7 + 0.25 * u(6))),
            "fdir": pa.array(fdir),
            "tisr": pa.array(ssrd * (1.0 + 0.3 * u(7))),
            "u100": pa.array(u(8) * 20 - 10),
            "v100": pa.array(u(9) * 20 - 10),
            "ro": pa.array(u(10) * 2e-4 - 1e-4),
            "t2m": pa.array(250.0 + u(11) * 60.0),
            "sp": pa.array(9e4 + u(12) * 1.5e4),
            "stl4": pa.array(260.0 + u(13) * 40.0),
            "fsr": pa.array(u(14)),
        })

    return normalize_era5(ds.map_batches(raw, batch_format="pyarrow"))


def decode_images_ppm(sf_dir: str):
    """Image decode over REAL binary-PPM payloads, SQL-audited (r5
    conversion from rows-only): the Netpbm header parse + pixel decode
    run for real, and the output is the EXACT integer per-grid-cell
    channel sums (5 column cells via x*5//w, matching the aHash block
    mapping) — the oracle regenerates geometry (splitmix) and every
    pixel (modular RGB arithmetic) and replays the cell sums, so
    header, dimensions and pixel bytes are all verified.  The float
    grid-mean feature form stays in
    stages/multimodal.py::decode_images."""
    import ray.data as rd

    from geodata_ray.stages.multimodal import ppm_decode, synth_image_table

    ds = rd.from_arrow(synth_image_table(200)).repartition(4)
    cells = 5

    def grid_sums(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_numpy()
        out_id, out_c, sums = [], [], [[], [], []]
        for iid, p in zip(ids, batch["payload"].to_pylist()):
            px, _ = ppm_decode(p)
            h, w, _ = px.shape
            cell = (np.arange(w, dtype=np.int64) * cells) // w
            for c in range(cells):
                m = px[:, cell == c, :].astype(np.int64)
                out_id.append(int(iid))
                out_c.append(c)
                for ch in range(3):
                    sums[ch].append(int(m[..., ch].sum()))
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.int64()),
                "cell": pa.array(out_c, pa.int64()),
                "r_sum": pa.array(sums[0], pa.int64()),
                "g_sum": pa.array(sums[1], pa.int64()),
                "b_sum": pa.array(sums[2], pa.int64()),
            }
        )

    return ds.map_batches(
        grid_sums, batch_format="pyarrow", batch_size=128
    )


def lsh_buckets_embeddings(sf_dir: str):
    """Hyperplane-LSH bucket assignment (the ANN/dedup scale path).
    SQL-audited: the oracle inlines the same 16 hyperplanes as literals
    and recomputes every sign bit with ``list_inner_product`` (sign
    flips would need |dot| within float-sum reordering error ~1e-13 —
    never observed on this corpus)."""
    import ray.data as rd

    from geodata_ray.stages.dedup import hyperplane_buckets

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return hyperplane_buckets(ds, bits=16)


def kmeans_embeddings(sf_dir: str):
    """Distributed k-means over embeddings (iterative streaming Lloyd;
    rows-only — assignments are deterministic at any parallelism)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from geodata_ray.stages.kmeans import kmeans_assign, kmeans_fit

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    base = pa.table(
        {
            "vec_id": t["vec_id"],
            "embedding": pc.cast(t["embedding"], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(base).repartition(8)
    C, _ = kmeans_fit(ds, k=8, iters=6, init_table=base)
    return kmeans_assign(ds, C)


def ivf_topk_embeddings(sf_dir: str):
    """IVF-pruned ANN (approximate scale path; rows-only check)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from geodata_ray.stages.dedup import _as_matrix
    from geodata_ray.stages.simsearch import ivf_build, ivf_topk

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    C, _ = ivf_build(t)
    qt = t.filter(pc.less(t["vec_id"], 5))
    ds = rd.from_arrow(t)
    return ivf_topk(
        ds, C, _as_matrix(qt["embedding"]), qt["vec_id"].to_numpy(),
        id_col="vec_id", k=5, n_probe=4,
    )


def hll_registers_events(sf_dir: str):
    """HyperLogLog sketch state over events.user_id: the mergeable
    (register, max_rank) table at p=12.  The rank uses TRAILING zeros
    (exact integer math on both engines) instead of leading zeros —
    statistically identical geometric distribution, but the oracle can
    recompute it bit-exactly (``bit_count((w & -w) - 1)``) on top of
    the unrolled splitmix64 SQL.  The float estimate itself is
    ``sketch.hll_estimate`` (golden-tested vs exact distinct counts —
    floats cannot hash-match across engines, the state can)."""
    from geodata_ray.stages.sketch import hll_register_table

    ds = _read(sf_dir, "events", columns=["user_id"])
    return hll_register_table(ds, "user_id")


def lm_surprisal_docs(sf_dir: str):
    """Byte-bigram LM surprisal per document: train the (<= 65,536
    row) bigram count table on the corpus in one aggregation pass,
    broadcast it, score every adjacent byte pair in a second pass.
    Output is the integer fixed-point state (doc_id, n_pairs,
    qbits_total) — hash-exact vs the recursive-CTE oracle; the float
    bits-per-pair view is ``stages.lm.surprisal_bits`` (golden-tested
    in tests/test_lm.py, not hashed)."""
    from geodata_ray.stages.lm import lm_surprisal

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lm_surprisal(ds)


def ngram_decontaminate_docs(sf_dir: str):
    """GPT-3-style n-gram decontamination: the eval set is one planted
    8-token window (tokens 2..9) from each of the first 50 docs; any
    corpus doc sharing such a window is contaminated.  Finer-grained
    than ``contamination_check`` (whole-doc fingerprints): here the
    exact-duplicate docs of the eval sources are caught through a
    SHARED WINDOW, not a shared full text.  Eval n-grams broadcast
    once; the corpus streams; zero shuffle."""
    import pyarrow.parquet as pq

    from geodata_ray.stages.textstats import ngram_decontaminate

    # eval side input: pushed-down 50-row read + local window slice
    # (tokens 2..9 zero-based == DuckDB list_slice(ts, 3, 10))
    ev = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", 50)],
    )
    toks = pc.split_pattern(
        pc.utf8_lower(ev["text"].combine_chunks().fill_null("")), " "
    )
    eval_ngrams = pc.binary_join(pc.list_slice(toks, 2, 10), " ")

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_decontaminate(ds, eval_ngrams, n=8)


def pack_sequences_docs(sf_dir: str):
    """Training-sequence packing (concat-then-split at seq_len=512):
    docs laid out in Knuth-hash order (unique — odd multiplier mod 2^32
    is a bijection), token stream concatenated, each doc mapped to its
    (start_tok, first_seq, last_seq) span via the two-phase distributed
    prefix-sum scan in ``stages/packing.py``.  The oracle recomputes
    the prefix with a SQL window SUM — fully independent machinery."""
    from geodata_ray.stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        ntok = pc.list_value_length(
            pc.split_pattern(batch["text"], " ")
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ntok": pc.cast(ntok, pa.int64()),
                "ord": pa.array((ids * _GEO_A) % _GEO_M),
            }
        )

    packed = pack_sequences(
        ds.map_batches(prep, batch_format="pyarrow"),
        id_col="doc_id", ntok_col="ntok", order_col="ord", seq_len=512,
    )
    return packed.select_columns(
        ["doc_id", "start_tok", "first_seq", "last_seq"]
    )


def global_shuffle_docs(sf_dir: str):
    """Seeded deterministic epoch shuffle: every doc gets its global
    0-based position in splitmix64(doc_id + seed) order — the
    reproducible training layout.  The ORDER ITSELF is hash-audited:
    the oracle recomputes the same hash with the unrolled splitmix64
    CTE chain and ranks with ROW_NUMBER, machinery fully independent
    of the distributed two-phase prefix-sum scan used here."""
    from geodata_ray.stages.packing import global_shuffle

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return global_shuffle(ds, id_col="doc_id", seed=20260817)


def paragraph_dedup_docs(sf_dir: str):
    """Corpus-wide paragraph-level exact dedup (first occurrence in
    global (doc, para_idx) order wins) over deterministically
    synthesized multi-paragraph docs: paragraph j of doc i is drawn
    from a 40-entry shared pool unless (i+j)%3==0 (unique).  The
    engine SPLITS the synthesized text and runs the generic hash +
    two-phase min machinery; the oracle re-derives content purely from
    the (i, j) arithmetic — it never splits a string."""
    from geodata_ray.stages.dedup import paragraph_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        nper = 3 + ids % 4
        sid = pd.Series(ids).astype(str)
        txt = None
        for j in range(6):
            shared = (
                "para " + pd.Series((ids * 7 + j * 13) % 40).astype(str)
                + " body"
            )
            uniq = "uniq " + sid + "/" + str(j)
            cont = pd.Series(
                np.where((ids + j) % 3 != 0, shared.to_numpy(),
                         uniq.to_numpy())
            )
            if txt is None:
                txt = cont
            else:
                txt = pd.Series(
                    np.where(j < nper, (txt + "\n\n" + cont).to_numpy(),
                             txt.to_numpy())
                )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(txt.to_numpy())}
        )

    pages = ds.map_batches(synth, batch_format="pyarrow")
    return paragraph_dedup(pages, id_col="doc_id", text_col="text")


def length_buckets_docs(sf_dir: str):
    """Quantile length-bucketing: every doc tagged with its quartile
    bucket (0..3) of the corpus-wide n_chars distribution — the
    batch-packing prep step of a training loader.  Boundaries are
    EXACT quantile_disc values from the bounded value-histogram (two
    streaming passes, no per-row shuffle); the oracle recomputes them
    with a window cumulative sum."""
    from geodata_ray.stages.relational import assign_quantile_buckets

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return assign_quantile_buckets(
        ds, col="n_chars", qs=(0.25, 0.5, 0.75)
    )


def source_mixture_docs(sf_dir: str):
    """Epoch mixture expansion: source srcK gets repeat factor
    1 + (K%4)*0.75 (so 1.0 / 1.75 / 2.5 / 3.25 — floor copies plus a
    deterministic splitmix64 coin for the fractional copy).  The
    oracle replays the same u64 threshold compare with the unrolled
    splitmix CTE chain and unnests range(k)."""
    from geodata_ray.stages.packing import source_mixture

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    weights = {f"src{k}": 1 + (k % 4) * 0.75 for k in range(64)}
    return source_mixture(
        ds, id_col="doc_id", source_col="source", weights=weights,
        seed=424242,
    )


def url_dedup_best_docs(sf_dir: str):
    """URL-level crawl merge: doc triples {3m, 3m+1, 3m+2} map (after
    undoing case/port/slash/fragment mutations) to ONE canonical URL;
    keep the highest-n_chars capture, tie lowest doc_id, via the
    packed-int64 grouped argmax.  The oracle derives the canonical URL
    straight from the doc_id arithmetic and picks the winner with a
    window QUALIFY."""
    from geodata_ray.stages.urls import dedup_by_canonical_url

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def messy(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        g = ids // 3
        k = pd.Series(g % 97).astype(str)
        sg = pd.Series(g).astype(str)
        scheme = pd.Series(np.where(ids % 2 == 0, "HTTPS", "https"))
        host = np.where(
            ids % 3 == 0,
            ("SITE" + k + ".Example.COM").to_numpy(),
            ("site" + k + ".example.com").to_numpy(),
        )
        port = pd.Series(
            np.where(
                ids % 10 == 0, ":0443",
                np.where(ids % 5 == 0, ":443", ""),
            )
        )
        trail = pd.Series(np.where(ids % 7 == 0, "/", ""))
        frag = pd.Series(
            np.where(
                ids % 11 == 0,
                ("#s" + pd.Series(ids % 4).astype(str)).to_numpy(),
                "",
            )
        )
        url = (
            scheme + "://" + pd.Series(host) + port + "/p" + sg
            + trail + frag
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "url": pa.array(url.to_numpy()),
            }
        )

    pages = ds.map_batches(messy, batch_format="pyarrow")
    return dedup_by_canonical_url(
        pages, url_col="url", id_col="doc_id", score_col="n_chars"
    )


def cms_counts_events(sf_dir: str):
    """Count-Min sketch of user_id frequencies over events: the
    mergeable (depth, cell, n) table — counts merge across
    shards/days by a grouped SUM, the additive sibling of the HLL
    register max.  The oracle replays all four depth hashes with one
    shared splitmix CTE chain and recounts exactly; the table itself
    hash-matches, not an estimate."""
    from geodata_ray.stages.sketch import cms_table

    ds = _read(sf_dir, "events", columns=["user_id"])
    return cms_table(ds, "user_id")


def _messy_host_urls(ids: np.ndarray, *, cdn: bool = False) -> np.ndarray:
    """THE synthetic messy-host convention shared by
    host_stats/host_quota/blocklist (and their oracles): host
    ``site{id % 97}.example.com``, upper-cased 'SITE…Example.COM' every
    3rd id, optional ``cdn.`` prefix every 5th id, url
    ``https://host/d{id}``.  One place to change when the convention
    changes."""
    import pandas as pd

    k = pd.Series(ids % 97).astype(str)
    sid = pd.Series(ids).astype(str)
    site = np.where(
        ids % 3 == 0,
        ("SITE" + k + ".Example.COM").to_numpy(),
        ("site" + k + ".example.com").to_numpy(),
    )
    host = np.where(ids % 5 == 0, "cdn." + pd.Series(site), site) if cdn \
        else site
    return ("https://" + pd.Series(host) + "/d" + sid).to_numpy()


def host_quota_docs(sf_dir: str):
    """Per-domain quota: keep the FIRST 3 docs (by doc_id = crawl
    order) of every host — the politeness/diversity cap crawl
    pipelines apply before training.  Hosts come from the real URL
    normalizer over messy synthesized URLs; the per-key head runs on
    the skew-safe salted top-k machinery (ascending)."""
    from geodata_ray.stages.skew import salted_topk_per_key
    from geodata_ray.stages.urls import canonicalize_batch

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def messy(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": batch["doc_id"],
             "url": pa.array(_messy_host_urls(ids))}
        )

    pages = ds.map_batches(messy, batch_format="pyarrow")

    def hosts(batch: pa.Table) -> pa.Table:
        cb = canonicalize_batch(batch, url_col="url")
        return pa.table({"doc_id": cb["doc_id"], "host": cb["host"]})

    with_host = pages.map_batches(hosts, batch_format="pyarrow")
    return salted_topk_per_key(
        with_host, key="host", order_col="doc_id", k=3, descending=False
    )


def bloom_bits_events(sf_dir: str):
    """Partitioned Bloom filter over events.user_id as its exact
    DISTINCT set-bit table — the crawl-frontier / seen-URL membership
    structure: constant-bounded (d * 2^lw rows max), merges across
    crawls by distinct union, no false negatives on probe.  Shares the
    Count-Min (depth, cell) hashing, so the oracle replays the same
    splitmix chain and takes DISTINCT bits."""
    from geodata_ray.stages.sketch import bloom_bits

    ds = _read(sf_dir, "events", columns=["user_id"])
    return bloom_bits(ds, "user_id")


def blocklist_filter_docs(sf_dir: str):
    """Domain blocklist filter (UT1-style) with registrable-suffix
    semantics over canonicalized messy URLs: hosts ``site{k}.example
    .com`` for k % 11 == 0 are blocked, and blocking the parent also
    drops ``cdn.``-subdomain variants.  The blocklist broadcasts once;
    per-batch cost is label-stripping ``is_in`` probes independent of
    list size.  Returns the SURVIVING (doc_id, host) rows."""
    from geodata_ray.stages.urls import canonicalize_batch, filter_blocked_hosts

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def messy(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {"doc_id": batch["doc_id"],
             "url": pa.array(_messy_host_urls(ids, cdn=True))}
        )

    def hosts(batch: pa.Table) -> pa.Table:
        cb = canonicalize_batch(batch, url_col="url")
        return pa.table({"doc_id": cb["doc_id"], "host": cb["host"]})

    with_host = ds.map_batches(messy, batch_format="pyarrow").map_batches(
        hosts, batch_format="pyarrow"
    )
    blocked = [f"site{k}.example.com" for k in range(0, 97, 11)]
    return filter_blocked_hosts(with_host, blocked, host_col="host")


def top_bigrams_docs(sf_dir: str):
    """Corpus-wide top-20 bigrams by exact total count over documents
    — the collocation table (shared lower+single-space tokenizer, so
    the oracle mirrors the decontamination SQL's window construction).
    Partial in-batch counts shuffle, min_count pruning bounds the
    final sort."""
    from geodata_ray.stages.textstats import top_ngrams

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return top_ngrams(ds, n=2, k=20, min_count=2)


def _format_roundtrip(sf_dir: str, fmt: str):
    """Shared JSONL/CSV round-trip: documents -> write in ``fmt`` to a
    per-sf scratch dir -> read back with the matching ray.data reader
    -> full-row return, so the oracle (plain documents SQL) hash-checks
    that every value survived the format.  Crawl corpora arrive as
    JSONL (WARC-extract convention) and CSV exports; both writers/
    readers stream file-per-block, so the pattern IS the 100-TB
    ingest path (one file per input shard, resumable by file)."""
    import os
    import shutil

    import ray.data as rd

    base = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/geodata_ray_fmt/{fmt}_{base}"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = _read(sf_dir, "documents")
    if fmt == "jsonl":
        ds.write_json(out_dir)
        back = rd.read_json(out_dir)
    else:
        ds.write_csv(out_dir)
        back = rd.read_csv(out_dir)

    def project(batch: pa.Table) -> pa.Table:
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
        arrs = []
        for c in cols:
            a = batch[c]
            if c in ("text", "lang", "source"):
                # CSV cannot distinguish empty string from null on
                # read-back; normalize to the writer's empty form
                a = pc.fill_null(pc.cast(a, pa.string()), "")
            else:
                a = pc.cast(a, pa.int64())
            arrs.append(a)
        return pa.table(dict(zip(cols, arrs)))

    return back.map_batches(project, batch_format="pyarrow")


def jsonl_roundtrip_docs(sf_dir: str):
    """documents -> JSONL files -> read_json -> identical rows."""
    return _format_roundtrip(sf_dir, "jsonl")


def csv_roundtrip_docs(sf_dir: str):
    """documents -> CSV files -> read_csv -> identical rows (quoted
    newlines/commas in text included)."""
    return _format_roundtrip(sf_dir, "csv")


def _host_edges_map(batch: pa.Table) -> pa.Table:
    """THE deterministic 97-node host link graph (3 out-links per doc,
    modular-arithmetic targets) — single definition shared by
    ``pagerank_hosts_docs``, ``k_core_hosts``, ``hits_hosts_docs``,
    ``clustering_coeff_hosts``, ``eccentricity_hosts`` and
    ``edge_support_hosts`` so the engine and the oracles can never
    diverge on the graph."""
    ids = batch["doc_id"].to_numpy()
    u = ids % 97
    us, vs = [], []
    for j in (1, 2, 3):
        us.append(u)
        vs.append((u + 1 + (ids * j) % 96) % 97)
    return pa.table(
        {"u": pa.array(np.concatenate(us)),
         "v": pa.array(np.concatenate(vs))}
    )


def pagerank_hosts_docs(sf_dir: str):
    """PageRank over a deterministic 97-node host link graph derived
    from documents (3 out-links per doc, modular-arithmetic targets,
    DISTINCT edges) — 5 iterations of EXACT fixed-point integer
    PageRank (stages/graphcc.py ``pagerank``): bit-identical ranks in
    both engines, no float tolerance anywhere.  The oracle unrolls the
    5 iterations as materialized CTEs."""
    from geodata_ray.stages.graphcc import distinct_edges_packed, pagerank

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    e = distinct_edges_packed(
        ds.map_batches(_host_edges_map, batch_format="pyarrow")
    )
    return pagerank(e, iters=5)


def funnel_users_events(sf_dir: str):
    """Conversion funnel per user (view -> click -> purchase, each
    stage strictly after the previous): one bucketed exchange, one
    vectorized masked segment-min per stage.  -1 marks a stage never
    reached (and blocks later stages).  The oracle chains three
    MIN-after-threshold CTEs."""
    from geodata_ray.stages.windows import funnel

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    return funnel(
        ds.map_batches(prep, batch_format="pyarrow"),
        stages=("view", "click", "purchase"),
    )


def knn_classify_embeddings(sf_dir: str):
    """kNN label classification: 25 query vectors classified by the
    majority label of their 10 exact-cosine nearest neighbors (tie ->
    smallest label) — ANN composed with a vote, the label-propagation
    / weak-annotation primitive.  Brute-force matmul partials + one
    tiny merge; the oracle replays the ranking and the vote with
    windows."""
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from geodata_ray.stages.dedup import _as_matrix
    from geodata_ray.stages.simsearch import ann_topk

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    qt = t.filter(pc.less(t["vec_id"], 25))
    Q = _as_matrix(qt["embedding"])
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    nn = ann_topk(ds, Q, qt["vec_id"].to_numpy(), id_col="vec_id", k=10)

    labels = pa.table(
        {
            "neighbor_id": t["vec_id"],
            "label": pc.cast(t["label"], pa.int64()),
        }
    )
    votes = grouped_aggregate(
        broadcast_join(nn, labels, keys=["neighbor_id"]),
        ["query_id", "label"],
        [("label", "count", "n_votes")],
    )

    def pick(g: pa.Table) -> pa.Table:
        n = g["n_votes"].to_numpy(zero_copy_only=False)
        lab = g["label"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, -n))
        i = order[0]
        return pa.table(
            {
                "query_id": g["query_id"].slice(0, 1),
                "pred_label": pa.array([int(lab[i])], pa.int64()),
                "n_votes": pa.array([int(n[i])], pa.int64()),
            }
        )

    return votes.groupby("query_id").map_groups(
        pick, batch_format="pyarrow"
    )


def windowed_dedup_events(sf_dir: str):
    """Time-windowed dedup: keep the FIRST event per (user, type,
    epoch-week) — the recrawl-dedup semantics ("refetch allowed after
    a window") that pure fingerprint dedup can't express.  One
    bucketed exchange via the generic keep-first-per-group operator;
    the oracle is a QUALIFY row_number window."""
    from geodata_ray.stages.windows import first_per_group

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())  # microseconds since epoch
        week = pc.divide(us, 604800 * 10**6)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "week": week,
                "ts": batch["ts"],
                "event_id": batch["event_id"],
            }
        )

    kept = first_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_cols=["user_id", "event_type", "week"],
        order_cols=["ts", "event_id"],
        hash_col="user_id",
    )
    return kept.select_columns(
        ["user_id", "event_type", "week", "event_id"]
    )


def corpus_stats_docs(sf_dir: str):
    """One-pass corpus data-card: doc/token/char totals, distinct
    language count, max document length — five statistics in a SINGLE
    streaming pass (per-batch partial rows, one-block merge; no
    groupby, no second read).  The reporting step every corpus build
    ships with its output."""
    ds = _read(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ntok = pc.list_value_length(
            pc.split_pattern(text.fill_null(""), " ")
        ).to_numpy(zero_copy_only=False)
        langs = sorted(
            {v for v in batch["lang"].to_pylist() if v is not None}
        )
        return pa.table(
            {
                "n_docs": pa.array([len(batch)], pa.int64()),
                "n_tokens": pa.array([int(ntok.sum())], pa.int64()),
                "n_chars": pa.array(
                    [int(pc.sum(batch["n_chars"]).as_py() or 0)], pa.int64()
                ),
                "max_doc_tokens": pa.array(
                    [int(ntok.max()) if len(ntok) else 0], pa.int64()
                ),
                "__langs": pa.array([",".join(langs)]),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        langs = set()
        for s in batch["__langs"].to_pylist():
            langs.update(x for x in s.split(",") if x)
        return pa.table(
            {
                "n_docs": pa.array(
                    [int(pc.sum(batch["n_docs"]).as_py())], pa.int64()
                ),
                "n_tokens": pa.array(
                    [int(pc.sum(batch["n_tokens"]).as_py())], pa.int64()
                ),
                "n_chars": pa.array(
                    [int(pc.sum(batch["n_chars"]).as_py())], pa.int64()
                ),
                "n_langs": pa.array([len(langs)], pa.int64()),
                "max_doc_tokens": pa.array(
                    [int(pc.max(batch["max_doc_tokens"]).as_py())],
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


def triangle_counts_hosts(sf_dir: str):
    """Per-host triangle counts over the deterministic 97-node host
    link graph (same edge arithmetic as PageRank, undirected): wedge
    self-join on the middle vertex + broadcast closing-edge check —
    the clustering-coefficient ingredient for web community analysis.
    All-integer; the oracle is a 3-way SQL self-join."""
    from geodata_ray.stages.graphcc import triangle_counts

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        u = ids % 97
        us, vs = [], []
        for j in (1, 2, 3):
            us.append(u)
            vs.append((u + 1 + (ids * j) % 96) % 97)
        return pa.table(
            {"u": pa.array(np.concatenate(us)),
             "v": pa.array(np.concatenate(vs))}
        )

    return triangle_counts(
        ds.map_batches(edges, batch_format="pyarrow"), num_buckets=16
    )


def bfs_hosts_2hop(sf_dir: str):
    """Crawl-frontier expansion: multi-source BFS distance labels (<=2
    hops) from seed hosts over the deterministic 97-node directed host
    link graph (same edge arithmetic as PageRank/triangles).  Each
    round is a broadcast frontier filter + distinct — no edge shuffle;
    the visited set is bounded by reachable nodes."""
    from geodata_ray.stages.graphcc import bfs_levels

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        u = ids % 97
        us, vs = [], []
        for j in (1, 2, 3):
            us.append(u)
            vs.append((u + 1 + (ids * j) % 96) % 97)
        return pa.table(
            {"u": pa.array(np.concatenate(us)),
             "v": pa.array(np.concatenate(vs))}
        )

    return bfs_levels(
        ds.map_batches(edges, batch_format="pyarrow"),
        seeds=[0, 31, 62, 93],
        max_depth=2,
    )


def grid_clusters_events(sf_dir: str):
    """DBSCAN-style grid density clustering of the event points: 4-deg
    cells, dense = >=10 points, 4-connected dense cells merge into
    clusters (one exchange + a grid-bounded labeling block).  The
    oracle replays the quantization and a recursive-CTE min-label
    walk — fully independent CC machinery."""
    from geodata_ray.stages.raster import grid_density_clusters

    ds = _read(sf_dir, "events", columns=["event_id"])

    def pts(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        return pa.table(
            {
                "lat": pa.array(_derive_lat_np(ids)),
                "lon": pa.array(_derive_lon_np(ids)),
            }
        )

    return grid_density_clusters(
        ds.map_batches(pts, batch_format="pyarrow"),
        cell_deg=4.0,
        min_pts=10,
    )


def winsorized_value_events(sf_dir: str):
    """Robust per-type value totals: clip each event's exact cents to
    its type's exact [p10, p90] quantiles (bounded keyed histogram),
    broadcast the clip bounds, one grouped sum — outlier-insensitive
    aggregation with zero value-side shuffle beyond the histogram."""
    from geodata_ray.stages.relational import winsorized_grouped_sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table({"event_type": batch["event_type"], "cents": cents})

    return winsorized_grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type",
        "cents",
        alias="win_cents",
    )


def session_attribution_users(sf_dir: str):
    """First-touch / last-touch session attribution: sessionize by the
    30-minute gap rule, then per session report first/last event type
    (event-id tie-break), event count and exact cents total."""
    from geodata_ray.stages.windows import session_attribution

    ds = _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": cents,
            }
        )

    return session_attribution(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id",
        ts_col="ts",
        type_col="event_type",
        val_col="cents",
        tie_col="event_id",
        gap_minutes=30,
    )


def fuzzy_match_parts(sf_dir: str):
    """Fuzzy record linkage: match deterministically-corrupted part
    names (one char deleted at position ``p_partkey % len``) back to
    the catalog within edit distance 1, via SymSpell deletion-
    neighborhood blocking + vectorized byte-matrix verify — no
    all-pairs comparison anywhere.  The oracle IS the all-pairs plan:
    a cross join with DuckDB's levenshtein, fully independent
    machinery.  Duplicate catalog names make this a real stress (many
    dirty names match dozens of parts)."""
    from geodata_ray.stages.dedup import fuzzy_edit1_pairs

    parts = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    left = parts.map_batches(
        lambda b: pa.table({"id": b["p_partkey"], "name": b["p_name"]}),
        batch_format="pyarrow",
    )

    def dirty(batch: pa.Table) -> pa.Table:
        names = batch["p_name"].to_pylist()
        keys = batch["p_partkey"].to_numpy()
        bs = [x.encode("utf-8") for x in names]
        n = len(bs)
        S = np.array(bs)  # padded fixed-width bytes
        M = S.view(np.uint8).reshape(n, -1)
        ln = np.fromiter((len(x) for x in bs), np.int64, n)
        k = keys % ln
        j = np.arange(M.shape[1] - 1, dtype=np.int64)
        idx = j[None, :] + (j[None, :] >= k[:, None])
        gathered = np.take_along_axis(M, idx, axis=1)
        out = [
            bytes(gathered[i, : ln[i] - 1]).decode("utf-8")
            for i in range(n)
        ]
        return pa.table(
            {
                "id": pa.array(keys + 1_000_000, pa.int64()),
                "name": pa.array(out, pa.string()),
            }
        )

    right = parts.map_batches(dirty, batch_format="pyarrow")
    return fuzzy_edit1_pairs(left, right, id_col="id", str_col="name")


def pmi_bigrams_docs(sf_dir: str):
    """Top-20 bigram collocations by exact fixed-point PMI (qlog2
    domain shared with the LM surprisal); min_count=5 prunes before
    scoring and bounds the sort."""
    from geodata_ray.stages.textstats import pmi_top_bigrams

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pmi_top_bigrams(ds, k=20, min_count=5)


def zorder_rank_events(sf_dir: str):
    """Z-order (Morton) storage layout: quantize each event's derived
    lat/lon to 15 bits, interleave into a 30-bit space-filling-curve
    key, and assign the global Z-curve position with the distributed
    prefix-sum scan (rank = exclusive prefix of 1s over the unique
    ``zkey*2^32 + event_id`` order key).  This is the clustered-write
    ordering that co-locates spatially-near rows; the oracle replays
    the bit interleave arithmetically and ranks with ROW_NUMBER."""
    from geodata_ray.cellmath.qcell import morton_interleave2
    from geodata_ray.stages.packing import global_prefix_sum

    ds = _read(sf_dir, "events", columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        lat = _derive_lat_np(ids)
        lon = _derive_lon_np(ids)
        qy = np.floor((lat + 90.0) / 180.0 * 32768.0).astype(np.int64)
        qx = np.floor((lon + 180.0) / 360.0 * 32768.0).astype(np.int64)
        zkey = morton_interleave2(qx, qy, 15)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "zkey": pa.array(zkey),
                "zord": pa.array(zkey * 4294967296 + ids),
                "_one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    out = global_prefix_sum(
        ds.map_batches(prep, batch_format="pyarrow"),
        order_col="zord",
        value_col="_one",
        out_col="zpos",
    )
    return out.select_columns(["event_id", "zkey", "zpos"])


def incremental_daily_merge(sf_dir: str):
    """Incremental materialized-view maintenance: the stored daily
    aggregate (history before the cutoff) is PERSISTED to parquet and
    read back; the delta days aggregate separately; merge_aggregates
    combines the two projected aggregates — history is never
    rescanned.  The oracle is one full GROUP BY over all rows, proving
    merge-equals-recompute."""
    import tempfile

    import ray.data as rd

    from geodata_ray.stages.relational import merge_aggregates

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    cut = pa.scalar(np.datetime64("2024-01-15", "us"))

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "ts": batch["ts"],
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "cents": cents,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    hist = prepped.map_batches(
        lambda b: b.filter(pc.less(b["ts"], cut)).drop_columns(["ts"]),
        batch_format="pyarrow",
    )
    delta = prepped.map_batches(
        lambda b: b.filter(pc.greater_equal(b["ts"], cut)).drop_columns(["ts"]),
        batch_format="pyarrow",
    )
    specs = [("cents", "count", "n"), ("cents", "sum", "value_cents")]
    stored_path = tempfile.mkdtemp(prefix="geodata_mv_daily_")
    grouped_aggregate(hist, ["day"], specs).write_parquet(stored_path)
    stored = rd.read_parquet(stored_path)
    return merge_aggregates(
        stored, grouped_aggregate(delta, ["day"], specs), ["day"], specs
    )


def top_event_type_per_user(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (ties break
    lexicographically) — pre-combined (user, type) counts, then the
    bucketed keep-first with a negated-count order key; no per-group
    Python anywhere."""
    from geodata_ray.stages.windows import first_per_group

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = grouped_aggregate(
        ds, ["user_id", "event_type"], [("event_type", "count", "n")]
    )

    def neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "negn", pc.multiply(pc.cast(batch["n"], pa.int64()), -1)
        )

    win = first_per_group(
        counts.map_batches(neg, batch_format="pyarrow"),
        group_cols=["user_id"],
        order_cols=["negn", "event_type"],
        hash_col="user_id",
    )
    return win.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "top_type": b["event_type"],
                "n": pc.cast(b["n"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def cohort_retention_users(sf_dir: str):
    """Weekly cohort retention: cohort = each user's first active epoch
    week (grouped MIN), then distinct active users per (cohort_week,
    week_offset) — first-activity exchange + one distinct-count
    exchange, the product-analytics retention triangle."""
    from geodata_ray.stages.relational import (
        grouped_distinct_count,
        native_join,
    )

    def weeks(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        wk = ts.astype("datetime64[s]").astype(np.int64) // 86400 // 7
        return pa.table(
            {"user_id": batch["user_id"], "wk": pa.array(wk, pa.int64())}
        )

    w = _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        weeks, batch_format="pyarrow"
    )
    first = grouped_aggregate(w, ["user_id"], [("wk", "min", "cohort")])
    j = native_join(w, first, on="user_id", num_partitions=8)

    def off(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch["cohort"],
                "week_offset": pc.subtract(batch["wk"], batch["cohort"]),
                "user_id": batch["user_id"],
            }
        )

    return grouped_distinct_count(
        j.map_batches(off, batch_format="pyarrow"),
        ["cohort_week", "week_offset"],
        "user_id",
        alias="n_users",
    )


def ewma_user_values(sf_dir: str):
    """Per-user integer EWMA (alpha=1/2, exact halving recursion) of
    event cents in time order — the deterministic smoothing operator;
    the oracle replays the recursion as a recursive CTE over per-user
    row numbers."""
    from geodata_ray.stages.windows import ewma_halving

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "cents": cents,
            }
        )

    return ewma_halving(
        ds.map_batches(prep, batch_format="pyarrow"), alias="ewma_cents"
    )


def type_pair_support_events(sf_dir: str):
    """Market-basket pair support: for every unordered pair of event
    types, how many users did both — association-rule mining's support
    table.  Per batch: distinct (user, type) pre-dedup; one grouped
    distinct pass; per-user pair expansion is bounded by the TYPE
    cardinality (k choose 2 per user, k <= 5), then a pre-combined
    count.  The oracle is an independent self-join."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([])

    def expand(batch: pa.Table) -> pa.Table:
        # users arrive whole per bucket; in-batch pre-dedup upstream
        # leaves at most one (user, type) row per INPUT batch — finish
        # the distinct here before pair expansion
        batch = batch.group_by(["user_id", "event_type"]).aggregate([])
        t = batch.sort_by(
            [("user_id", "ascending"), ("event_type", "ascending")]
        )
        u = t["user_id"].to_numpy()
        ty = np.asarray(t["event_type"].to_pylist(), dtype=object)
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(u)))
        a_idx, b_idx = [], []
        # offsets (i, j) within a user's sorted type list: bounded by
        # the type cardinality, so this loop is O(k^2) not O(rows)
        kmax = int(counts.max()) if len(counts) else 0
        for i in range(kmax):
            for j in range(i + 1, kmax):
                sel = starts[counts > j]
                a_idx.append(sel + i)
                b_idx.append(sel + j)
        if not a_idx:
            return pa.table(
                {"type_a": pa.array([], pa.string()),
                 "type_b": pa.array([], pa.string()),
                 "n_users": pa.array([], pa.int64())}
            )
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        out = pa.table(
            {"type_a": pa.array(ty[ai].tolist(), pa.string()),
             "type_b": pa.array(ty[bi].tolist(), pa.string())}
        )
        out = out.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return out.rename_columns(["type_a", "type_b", "n_users"])

    # route by user hash so each user lands whole (ONE exchange of
    # in-batch-deduped (user, type) pairs), expand pairs per bucket,
    # then one pre-combined count exchange
    from geodata_ray.stages.windows import _tag_bucket

    bucketed = _tag_bucket(
        ds.map_batches(pre, batch_format="pyarrow"), "user_id", 32
    )
    expanded = bucketed.groupby("__b").map_groups(
        lambda g: expand(g.drop_columns(["__b"])), batch_format="pyarrow"
    )
    return grouped_aggregate(
        expanded, ["type_a", "type_b"], [("n_users", "sum", "n_users")]
    )


def percentile_rank_events(sf_dir: str):
    """Per-row CDF: each event's rank count within its type
    (#cents <= x), via the bounded per-type value histogram BROADCAST
    as a cumulative lookup — zero row-side shuffle for the rank
    assignment itself; the oracle is a COUNT window."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": cents,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    hist = grouped_aggregate(
        prepped, ["event_type", "cents"], [("cents", "count", "hn")]
    )
    # bounded (type x distinct cents) table -> cumulative lookup
    ht = pa.concat_tables(
        list(hist.iter_batches(batch_format="pyarrow"))
    ).sort_by([("event_type", "ascending"), ("cents", "ascending")])
    types = np.asarray(ht["event_type"].to_pylist(), dtype=object)
    vals = ht["cents"].to_numpy()
    cnts = ht["hn"].to_numpy()
    lut = {}
    new = np.ones(len(types), dtype=bool)
    new[1:] = types[1:] != types[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(types))
    for s, e in zip(starts, ends):
        lut[types[s]] = (vals[s:e], np.cumsum(cnts[s:e]))
    import ray

    lut_ref = ray.put(lut)

    def rank(batch: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        ty = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        cents = batch["cents"].to_numpy()
        out = np.empty(len(ty), dtype=np.int64)
        for t in np.unique(ty):
            m = ty == t
            v, cum = lu[t]
            idx = np.searchsorted(v, cents[m], side="right")
            out[m] = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": batch["cents"],
                "rank_le": pa.array(out, pa.int64()),
            }
        )

    return prepped.map_batches(rank, batch_format="pyarrow")


def retained_users_events(sf_dir: str):
    """Set INTERSECT as a distributed operator: users active BOTH
    before and after the cutoff (distinct-in-batch keys + one grouped
    flag-max exchange) — the retention set-op sibling of the cohort
    triangle."""
    from geodata_ray.stages.relational import keyed_set_op

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    cut = pa.scalar(np.datetime64("2024-01-15", "us"))
    before = ds.map_batches(
        lambda b: b.filter(pc.less(b["ts"], cut)), batch_format="pyarrow"
    )
    after = ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["ts"], cut)),
        batch_format="pyarrow",
    )
    return keyed_set_op(before, after, "user_id", "intersect")


def value_histogram_events(sf_dir: str):
    """Fixed-width histogram of event values ($25 bins over exact
    cents): one pre-combined grouped count — the profiling primitive
    every column-stats pass needs."""
    ds = _read(sf_dir, "events", columns=["value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        bin_ = pc.divide(cents, 2500)  # integer division on int64
        return pa.table({"bin": bin_})

    binned = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_aggregate(binned, ["bin"], [("bin", "count", "n")])
    return out.map_batches(
        lambda b: b.append_column(
            "lo_cents", pc.multiply(b["bin"], 2500)
        ),
        batch_format="pyarrow",
    )


def integrity_audit(sf_dir: str):
    """Cross-table referential-integrity audit: orphan counts for
    lineitem->orders, orders->customer, and events.user->customer —
    each check is a left-outer native hash join + null count, reported
    as one (check_name, n_violations) row.  The data-quality gate a
    100-TB ingest runs before anything else."""
    from geodata_ray.stages.relational import native_join

    def orphans(left, right, lk, rk):
        # the native join drops the right key column from its output;
        # a marker column survives and is null exactly on orphans.
        # Right sides here are KEY tables — dedup in-batch so the
        # left_outer join cannot fan out duplicate matches.
        def mark(b: pa.Table, _c=rk) -> pa.Table:
            d = b.select([_c]).group_by([_c]).aggregate([])
            return d.append_column(
                "__hit", pa.array(np.ones(len(d), np.int64))
            )

        marked = right.map_batches(mark, batch_format="pyarrow")
        j = native_join(left, marked, on=lk, right_on=rk,
                        join_type="left_outer", num_partitions=8)
        bad = j.map_batches(
            lambda b: b.filter(pc.is_null(b["__hit"])).select([lk]),
            batch_format="pyarrow",
        )
        return bad.count()

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    orders_k = _read(sf_dir, "orders", columns=["o_orderkey"])
    orders_c = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    ev = _read(sf_dir, "events", columns=["user_id"])

    rows = [
        ("lineitem_orphan_orders", orphans(li, orders_k, "l_orderkey", "o_orderkey")),
        ("orders_orphan_customers", orphans(orders_c, cust, "o_custkey", "c_custkey")),
        ("events_users_not_customers", orphans(ev, cust, "user_id", "c_custkey")),
    ]
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "check_name": pa.array([r[0] for r in rows], pa.string()),
                "n_violations": pa.array(
                    [int(r[1]) for r in rows], pa.int64()
                ),
            }
        )
    )


def skyline_orders(sf_dir: str):
    """Pareto skyline of orders: maximize price, minimize order date —
    no order on the front is beaten on both axes.  Local per-batch
    skyline + one bounded merge (skyline is idempotent-mergeable);
    the oracle is the NOT EXISTS dominance definition, fully
    independent machinery."""
    from geodata_ray.stages.relational import skyline_2d

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["o_totalprice"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "price_cents": cents,
                "date_s": pc.cast(
                    pc.cast(batch["o_orderdate"], pa.int64()), pa.int64()
                ),
                "o_orderdate": batch["o_orderdate"],
            }
        )

    sky = skyline_2d(
        ds.map_batches(prep, batch_format="pyarrow"),
        x_col="price_cents",
        y_col="date_s",
    )
    return sky.select_columns(["o_orderkey", "price_cents", "o_orderdate"])


def golden_record_users(sf_dir: str):
    """Survivorship merge (MDM golden record): per user the canonical
    profile — first/last seen, event count, exact cents total, and the
    type of the LAST event ((ts, event_id) argmax via the bucketed
    keep-first over negated order keys).  One grouped-agg exchange +
    one keep-first exchange + a native join on the entity key."""
    from geodata_ray.stages.relational import native_join
    from geodata_ray.stages.windows import first_per_group

    ds = _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)),
            pa.int64(),
        )
        ts_us = pc.cast(batch["ts"], pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": ts_us,
                "neg_ts": pc.multiply(ts_us, -1),
                "neg_id": pc.multiply(batch["event_id"], -1),
                "event_type": batch["event_type"],
                "cents": cents,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    agg = grouped_aggregate(
        prepped,
        ["user_id"],
        [
            ("ts_us", "min", "first_seen_us"),
            ("ts_us", "max", "last_seen_us"),
            ("cents", "count", "n_events"),
            ("cents", "sum", "total_cents"),
        ],
    )
    last = first_per_group(
        prepped.select_columns(["user_id", "neg_ts", "neg_id", "event_type"]),
        group_cols=["user_id"],
        order_cols=["neg_ts", "neg_id"],
        hash_col="user_id",
    ).map_batches(
        lambda b: pa.table(
            {"user_id": b["user_id"], "last_type": b["event_type"]}
        ),
        batch_format="pyarrow",
    )
    return native_join(agg, last, on="user_id", num_partitions=8)


def type_sequence_counts(sf_dir: str):
    """Sequential-pattern support (first-occurrence ordering): for each
    ordered type pair (a, b), how many users saw their FIRST a strictly
    before their FIRST b.  One grouped-min exchange, then per-user pair
    expansion bounded by type cardinality."""
    from geodata_ray.stages.windows import _tag_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    firsts = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "event_type"],
        [("ts_us", "min", "t0")],
    )

    def expand(batch: pa.Table) -> pa.Table:
        t = batch.sort_by(
            [("user_id", "ascending"), ("t0", "ascending"),
             ("event_type", "ascending")]
        )
        u = t["user_id"].to_numpy()
        ty = np.asarray(t["event_type"].to_pylist(), dtype=object)
        t0 = t["t0"].to_numpy()
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(u)))
        a_idx, b_idx = [], []
        kmax = int(counts.max()) if len(counts) else 0
        for i in range(kmax):
            for j in range(i + 1, kmax):
                sel = starts[counts > j]
                a_idx.append(sel + i)
                b_idx.append(sel + j)
        if not a_idx:
            return pa.table(
                {"type_a": pa.array([], pa.string()),
                 "type_b": pa.array([], pa.string()),
                 "n_users": pa.array([], pa.int64())}
            )
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        strict = t0[ai] < t0[bi]  # ties are NOT a sequence
        ai, bi = ai[strict], bi[strict]
        out = pa.table(
            {"type_a": pa.array(ty[ai].tolist(), pa.string()),
             "type_b": pa.array(ty[bi].tolist(), pa.string())}
        )
        out = out.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return out.rename_columns(["type_a", "type_b", "n_users"])

    bucketed = _tag_bucket(firsts, "user_id", 32)
    expanded = bucketed.groupby("__b").map_groups(
        lambda g: expand(g.drop_columns(["__b"])), batch_format="pyarrow"
    )
    return grouped_aggregate(
        expanded, ["type_a", "type_b"], [("n_users", "sum", "n_users")]
    )


def moment_matrix_lineitem(sf_dir: str):
    """Column-profiling moment matrix: exact integer first and second
    cross-moments of (quantity, price cents, discount bp) over all
    lineitem rows — everything correlation/covariance needs, in one
    pre-combined pass, as one mergeable row.  All products are exact
    int64 at driver scales (documented bound; beyond it split the sums
    into HUGEINT-safe shards)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch["l_quantity"]), pa.int64()).to_numpy()
        p = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["l_extendedprice"],
                                         pa.float64()), 100.0)),
            pa.int64(),
        ).to_numpy()
        d = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["l_discount"],
                                         pa.float64()), 100.0)),
            pa.int64(),
        ).to_numpy()
        one = np.ones(len(q), dtype=np.int64)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(q), np.int64)),
                "n": pa.array(one),
                "sq": pa.array(q),
                "sp": pa.array(p),
                "sd": pa.array(d),
                "sqq": pa.array(q * q),
                "spp": pa.array(p * p),
                "sdd": pa.array(d * d),
                "sqp": pa.array(q * p),
                "sqd": pa.array(q * d),
                "spd": pa.array(p * d),
            }
        )

    cols = ["n", "sq", "sp", "sd", "sqq", "spp", "sdd", "sqp", "sqd", "spd"]
    out = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["g"],
        [(c, "sum", c) for c in cols],
    )
    return out.drop_columns(["g"])


def partition_checksums_events(sf_dir: str):
    """Anti-entropy partition checksums: per day, an order-insensitive
    content fingerprint = SUM(splitmix64(event_id) mod 2^40) mod 2^40 —
    the cheap replica-comparison primitive for 100-TB table sync.
    Partial sums are reduced MOD m per batch so the grouped int64 sum
    can never overflow (blocks x 2^40 << 2^63); the SQL replays the
    same splitmix chain in HUGEINT."""
    from geodata_ray.sources.synth import splitmix64

    m = np.int64(1) << np.int64(40)
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        h = splitmix64(ids.astype(np.uint64))
        hm = (h % np.uint64(m)).astype(np.int64)
        t = pa.table(
            {
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "hm": pa.array(hm),
                "one": pa.array(np.ones(len(ids), np.int64)),
            }
        )
        g = t.group_by(["day"]).aggregate([(["hm"], "sum"), (["one"], "sum")])
        # reduce partial mod m so downstream sums stay int64-safe
        return pa.table(
            {
                "day": g["day"],
                "hm": pc.cast(
                    pa.array(
                        g["hm_sum"].to_numpy(zero_copy_only=False) % m
                    ),
                    pa.int64(),
                ),
                "n": g["one_sum"],
            }
        )

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"],
        [("hm", "sum", "hm"), ("n", "sum", "n_rows")],
    )

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch["day"],
                "checksum": pa.array(
                    batch["hm"].to_numpy(zero_copy_only=False) % m,
                    pa.int64(),
                ),
                "n_rows": pc.cast(batch["n_rows"], pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def compact_files_roundtrip(sf_dir: str):
    """Storage maintenance: COMPACTION round-trip — read the events
    table, rewrite it as a small fixed number of larger parquet files
    (the small-files problem's fix), read the compacted copy back and
    return it.  The oracle is the source table itself: compaction must
    be byte-faithful on every column."""
    import tempfile

    import ray.data as rd

    ds = _read(sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="geodata_compact_")
    ds.repartition(4).write_parquet(out_dir)
    back = rd.read_parquet(out_dir)
    return back.select_columns(
        ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def curation_chain(ds, *, host_mod: int = 97, flag_fn=None):
    """End-to-end corpus curation — the headline webtext chain, each
    stage an existing operator: language-ID keep-en -> quality rules
    (INTEGER-form Gopher bands: 3*ntok <= nchars <= 12*ntok,
    100*nstop >= ntok, 10 <= ntok <= 100k — no float thresholds
    anywhere) -> exact dedup keep-first (hash-only shuffle) -> derived
    host (doc_id % host_mod) -> per-host cap of 2 (skew-safe salted
    ascending head).  Single fused filter+hash map stage, ONE hash-key
    shuffle, one bounded per-key head: the 100-TB shape is three
    exchanges total.  Shared by the gate query (host_mod=97) and the
    sf1 stress case (host_mod=9973) so the two can never diverge.

    ``flag_fn`` (optional): a ``batch -> bool ndarray`` kernel run in
    the SAME first scan (while text is still in hand) whose result is
    carried through the chain as an int64 ``__flag`` column — the
    one-scan fusion hook for decontamination (the flag is a pure
    function of text, so min() over an exact-dup group preserves it)."""
    from geodata_ray.stages.dedup import hash_strings_nomemo
    from geodata_ray.stages.skew import salted_topk_per_key
    from geodata_ray.stages.textstats import langid_batch, token_stats_batch

    def filt(batch: pa.Table) -> pa.Table:
        stats = token_stats_batch(batch)
        lang = langid_batch(batch)
        ntok = stats["n_tokens"].to_numpy()
        nchr = stats["n_chars"].to_numpy()
        nstp = stats["n_stopwords"].to_numpy()
        en = pc.equal(lang["lang_pred"], "en").to_numpy(
            zero_copy_only=False
        )
        keep = (
            en
            & (ntok >= 10) & (ntok <= 100_000)
            & (nchr >= 3 * ntok) & (nchr <= 12 * ntok)
            & (100 * nstp >= ntok)
        )
        kept = batch.filter(pa.array(keep))
        h = hash_strings_nomemo(kept["text"].to_pylist())
        cols = {
            "doc_id": kept["doc_id"],
            "text_hash": pa.array(h.astype(np.int64)),
            "n_tokens": pa.array(ntok[keep]),
        }
        if flag_fn is not None:
            cols["__flag"] = pa.array(
                np.asarray(flag_fn(kept), dtype=bool).astype(np.int64)
            )
        return pa.table(cols)

    specs = [("doc_id", "min", "doc_id"), ("n_tokens", "min", "n_tokens")]
    if flag_fn is not None:
        specs.append(("__flag", "min", "__flag"))
    hashed = ds.map_batches(filt, batch_format="pyarrow")
    kept = grouped_aggregate(hashed, ["text_hash"], specs)

    def add_host(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        cols = {
            "doc_id": batch["doc_id"],
            "host": pa.array(ids % host_mod),
            "n_tokens": batch["n_tokens"],
        }
        if flag_fn is not None:
            cols["__flag"] = batch["__flag"]
        return pa.table(cols)

    hosted = kept.map_batches(add_host, batch_format="pyarrow")
    return salted_topk_per_key(
        hosted, key="host", order_col="doc_id", k=2, descending=False
    )


def curation_pipeline_docs(sf_dir: str):
    """Gate entry for ``curation_chain`` over the documents table
    (host_mod=97; full-chain DuckDB oracle)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return curation_chain(ds, host_mod=97)


def chunk_documents_docs(sf_dir: str):
    """Sliding-window chunking (40-token windows, stride 20) over
    documents — the embedding/RAG prep transform.  Zero shuffle; the
    oracle rebuilds every window with generate_series + list_slice."""
    from geodata_ray.stages.textstats import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, chunk=40, stride=20)


def normalize_text_docs(sf_dir: str):
    """Crawl-text normalization over documents: whitespace squash +
    C0-control strip + trim, three RE2 passes, zero shuffle.  The
    oracle applies the same RE2 patterns via DuckDB regexp_replace.
    (Debuts past the full r4 driver window; driver row expected in the
    r5 rotation.)"""
    from geodata_ray.stages.textstats import normalize_text_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow")


def bloom_probe_events(sf_dir: str):
    """Cross-crawl membership via sketch composition: Bloom filter
    built over 'day-1' user_ids (even event_id), probed by the
    DISTINCT 'day-2' user_ids (odd event_id).  ``maybe_seen`` carries
    honest false positives (bit collisions with OTHER day-1 users) —
    the oracle genuinely replays the bit table and the per-user bit
    probe, not a shortcut equality join.  Probe side: zero shuffle,
    16 KB broadcast."""
    from geodata_ray.stages.sketch import bloom_bits, bloom_probe

    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def parity(keep_even):
        def f(batch: pa.Table) -> pa.Table:
            even = pc.equal(
                pc.bit_wise_and(batch["event_id"], 1), 0
            )
            mask = even if keep_even else pc.invert(even)
            return batch.filter(mask).select(["user_id"])

        return f

    build = ev.map_batches(parity(True), batch_format="pyarrow")
    bits = bloom_bits(build, "user_id")
    probe = grouped_aggregate(
        ev.map_batches(parity(False), batch_format="pyarrow"),
        ["user_id"],
        [("user_id", "count", "_n")],
    ).select_columns(["user_id"])
    return bloom_probe(probe, bits, "user_id")


_RETRIEVAL_TERMS = ("hash", "join", "merge", "vector")


def tfidf_retrieval_docs(sf_dir: str):
    """Keyword retrieval: top-10 docs by EXACT fixed-point TF-IDF for
    a fixed 4-term query — score_fp = sum_t tf(t, doc) * (qlog2(N) -
    qlog2(df_t)), every quantity an integer (the lm.py qlog2 kernel /
    its recursive-CTE mirror), ties broken (score DESC, doc_id ASC).
    Scale shape: the probe terms filter the flat token stream in-batch
    (the (doc, term, tf) intermediate only holds query-term hits), df
    is a |query|-row aggregate, idf broadcasts as a dict, and the
    final sort runs over hit docs only."""
    from geodata_ray.stages.lm import qlog2_fixed

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = pa.array(list(_RETRIEVAL_TERMS))

    def tf_batch(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(text.fill_null("")), " ")
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        )
        doc_of = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            lengths.astype(np.int64),
        )
        flat = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        ).flatten()
        hit = pc.is_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False
        )
        if not hit.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "doc_id": pa.array(doc_of[hit]),
                "term": flat.filter(pa.array(hit)),
            }
        )
        out = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return out.rename_columns(["doc_id", "term", "tf"])

    # docs are single rows -> each (doc, term, tf) completes in-batch
    tfm = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()
    n_docs = ds.count()
    df_tbl = grouped_aggregate(
        tfm, ["term"], [("term", "count", "df")]
    ).to_pandas()
    qn = int(qlog2_fixed(np.array([n_docs], dtype=np.uint64))[0])
    idf = {
        t: qn - int(qlog2_fixed(np.array([d], dtype=np.uint64))[0])
        for t, d in zip(df_tbl["term"], df_tbl["df"])
    }

    idf_arr = np.array(
        [idf.get(t, 0) for t in _RETRIEVAL_TERMS], dtype=np.int64
    )

    def score(batch: pa.Table) -> pa.Table:
        # every term in tfm IS a query term -> index_in never nulls
        iu = pc.index_in(batch["term"], value_set=terms).to_numpy(
            zero_copy_only=False
        )
        s = batch["tf"].to_numpy(zero_copy_only=False) * idf_arr[iu]
        t = pa.table({"doc_id": batch["doc_id"], "score_fp": pa.array(s)})
        out = t.group_by(["doc_id"]).aggregate([("score_fp", "sum")])
        return out.rename_columns(["doc_id", "score_fp"])

    scored = grouped_aggregate(
        tfm.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        [("score_fp", "sum", "score_fp")],
    )
    return scored.sort(
        ["score_fp", "doc_id"], descending=[True, False]
    ).limit(10)


def curriculum_pack_docs(sf_dir: str):
    """Curriculum-ordered sequence packing: the hashed-linear
    classifier scores every document, then the distributed prefix-sum
    pack lays tokens out in (score DESC, doc_id ASC) order — highest-
    quality-first data ordering for training, as ONE composition of
    two audited operators.  Order key = -score * 2^32 + doc_id (exact
    int encoding of the desc/asc pair).  The oracle wraps the
    standalone classifier SQL as a CTE and replays the pack with a
    window prefix sum — the composition cannot drift from its parts."""
    from geodata_ray.stages.packing import pack_sequences
    from geodata_ray.stages.textstats import classifier_score_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(classifier_score_batch, batch_format="pyarrow")

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        score = batch["score"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ntok": batch["n_tokens"],
                "ord": pa.array(-score * (1 << 32) + ids),
            }
        )

    return pack_sequences(
        scored.map_batches(prep, batch_format="pyarrow"),
        id_col="doc_id", ntok_col="ntok", order_col="ord", seq_len=512,
    ).select_columns(["doc_id", "start_tok", "first_seq", "last_seq"])


def daily_hll_users(sf_dir: str):
    """Per-day HLL register tables (keyed mergeable sketch state) —
    the approximate sibling of ``daily_distinct_users`` whose exchange
    is bounded by days x 2^p rows regardless of event volume.  The
    register table itself hash-matches the SQL replay (exact state,
    approximate estimate — same honesty split as the global HLL)."""
    from geodata_ray.stages.sketch import hll_register_table

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "user_id": batch["user_id"],
            }
        )

    return hll_register_table(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        keys=["day"],
    )


def bm25_retrieval_docs(sf_dir: str):
    """BM25 keyword retrieval (k1=1.2, b=0.75) for the fixed 4-term
    query, in EXACT fixed-point integer arithmetic: the qlog2 idf of
    the TF-IDF query plus the BM25 length normalization, every step a
    positive-integer floor division identical in numpy and SQL —
    score_fp = sum_t idf_fp(t) * (220*tf) // (100*tf + (120*norm)//100)
    with norm = 25 + (7500*dl) // avgdl_x100.  Same scale shape as
    tfidf_retrieval_docs: probe terms filter the token stream
    in-batch; df and the corpus length stats are tiny aggregates;
    the sort runs over hit docs only."""
    from geodata_ray.stages.lm import qlog2_fixed

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = pa.array(list(_RETRIEVAL_TERMS))

    def tf_batch(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(text.fill_null("")), " ")
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_of = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), lengths
        )
        dl_of = np.repeat(lengths, lengths)
        flat = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        ).flatten()
        hit = pc.is_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False
        )
        if not hit.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "doc_id": pa.array(doc_of[hit]),
                "term": flat.filter(pa.array(hit)),
                "dl": pa.array(dl_of[hit]),
            }
        )
        out = t.group_by(["doc_id", "term"]).aggregate(
            [([], "count_all"), ("dl", "max")]
        )
        return out.rename_columns(["doc_id", "term", "tf", "dl"])

    def len_batch(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        nt = pc.list_value_length(
            pc.split_pattern(pc.utf8_lower(text.fill_null("")), " ")
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nt": pa.array([int(nt.sum())], pa.int64()),
                "nd": pa.array([len(batch)], pa.int64()),
            }
        )

    tfm = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()
    lens = ds.map_batches(len_batch, batch_format="pyarrow")
    tt = lens.sum(["nt", "nd"])
    total_tokens, n_docs = int(tt["sum(nt)"]), int(tt["sum(nd)"])
    avg100 = 100 * total_tokens // n_docs

    df_tbl = grouped_aggregate(
        tfm, ["term"], [("term", "count", "df")]
    ).to_pandas()
    qn = int(qlog2_fixed(np.array([n_docs], dtype=np.uint64))[0])
    idf = {
        t: qn - int(qlog2_fixed(np.array([d], dtype=np.uint64))[0])
        for t, d in zip(df_tbl["term"], df_tbl["df"])
    }
    idf_arr = np.array(
        [idf.get(t, 0) for t in _RETRIEVAL_TERMS], dtype=np.int64
    )

    def score(batch: pa.Table) -> pa.Table:
        iu = pc.index_in(batch["term"], value_set=terms).to_numpy(
            zero_copy_only=False
        )
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dl = batch["dl"].to_numpy(zero_copy_only=False)
        norm = 25 + (7500 * dl) // avg100
        s = idf_arr[iu] * (220 * tf) // (100 * tf + (120 * norm) // 100)
        t = pa.table({"doc_id": batch["doc_id"], "score_fp": pa.array(s)})
        out = t.group_by(["doc_id"]).aggregate([("score_fp", "sum")])
        return out.rename_columns(["doc_id", "score_fp"])

    scored = grouped_aggregate(
        tfm.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        [("score_fp", "sum", "score_fp")],
    )
    return scored.sort(
        ["score_fp", "doc_id"], descending=[True, False]
    ).limit(10)


def perplexity_buckets_docs(sf_dir: str):
    """CCNet-style perplexity bucketing: per-doc fixed-point
    bits-per-pair from the byte-bigram LM (``ppx_fp = qbits_total //
    n_pairs``, exact int), then EXACT quartile buckets (0 = most
    fluent / 'head' ... 3 = 'tail') via the bounded-histogram
    quantile machinery.  The surprisal Dataset is materialized once so
    the histogram and bucket passes don't retrain the LM."""
    from geodata_ray.stages.lm import lm_surprisal
    from geodata_ray.stages.relational import assign_quantile_buckets

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ppx(batch: pa.Table) -> pa.Table:
        np_ = batch["n_pairs"].to_numpy(zero_copy_only=False)
        qb = batch["qbits_total"].to_numpy(zero_copy_only=False)
        # exact int64 arithmetic; maximum() only dodges the 0-divisor
        # lanes the where-predicate discards
        p = np.where(np_ > 0, qb // np.maximum(np_, 1), 0)
        return pa.table(
            {"doc_id": batch["doc_id"], "ppx_fp": pa.array(p)}
        )

    scored = (
        lm_surprisal(ds)
        .map_batches(ppx, batch_format="pyarrow")
        .materialize()
    )
    return assign_quantile_buckets(
        scored, col="ppx_fp", qs=(0.25, 0.5, 0.75)
    )


def cdc_chunks_docs(sf_dir: str):
    """Content-defined chunking over documents (FastCDC-style fixed
    8-byte rolling window, splitmix boundary test) — the sub-document
    dedup primitive.  Zero shuffle; the oracle packs each window with
    ascii() arithmetic and replays the identical splitmix chain."""
    from geodata_ray.stages.dedup import cdc_chunks

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return cdc_chunks(ds)


def cdc_dup_spans_docs(sf_dir: str):
    """Sub-document duplicate spans: CDC chunks grouped by content
    fingerprint, groups with > 1 member — shared boilerplate/quotes
    across otherwise-different docs.  Only 8-byte fingerprints
    shuffle; the oracle groups the same chunks by their literal
    substring content."""
    from geodata_ray.stages.dedup import cdc_duplicate_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return cdc_duplicate_spans(ds)


def pretrain_pipeline_docs(sf_dir: str):
    """The webtext HEADLINE composition — a complete pretraining-data
    build in one pipeline, each stage an existing audited operator:
    curation_chain (langid -> integer quality bands -> exact dedup ->
    per-host cap) -> GPT-3-style 8-gram decontamination (broadcast
    eval windows, contaminated ids anti-joined) -> Knuth-order
    sequence packing (distributed prefix-sum, seq_len=512).  The
    oracle wraps the SAME standalone curation and decontamination SQL
    texts as CTEs, so the composition cannot drift from its parts.

    FUSED (r5): the contamination check runs as a ``flag_fn`` inside
    curation's first scan — ONE pass over the corpus text instead of
    two, no hit-id driver round-trip, no anti-join exchange.  The flag
    rides the hash-only shuffle as one int64 and the contaminated rows
    drop AFTER the per-host cap, exactly where the oracle's anti-join
    sits, so the output is bit-identical to the two-scan plan."""
    import pyarrow.parquet as pq

    import ray

    from geodata_ray.stages.packing import pack_sequences
    from geodata_ray.stages.textstats import contamination_flag_fn

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    ev = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", 50)],
    )
    toks = pc.split_pattern(
        pc.utf8_lower(ev["text"].combine_chunks().fill_null("")), " "
    )
    eval_ngrams = pc.binary_join(pc.list_slice(toks, 2, 10), " ")
    eval_ref = ray.put(
        pa.array(eval_ngrams, type=pa.string())
        if not isinstance(eval_ngrams, (pa.Array, pa.ChunkedArray))
        else (
            eval_ngrams.combine_chunks()
            if isinstance(eval_ngrams, pa.ChunkedArray)
            else eval_ngrams
        )
    )
    kept = curation_chain(
        docs,
        host_mod=97,
        flag_fn=contamination_flag_fn(eval_ref, n=8),
    )
    clean = kept.map_batches(
        lambda b: b.filter(pc.equal(b["__flag"], 0)).drop_columns(
            ["__flag"]
        ),
        batch_format="pyarrow",
    )

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ntok": batch["n_tokens"],
                "ord": pa.array((ids * _GEO_A) % _GEO_M),
            }
        )

    packed = pack_sequences(
        clean.map_batches(prep, batch_format="pyarrow"),
        id_col="doc_id", ntok_col="ntok", order_col="ord", seq_len=512,
    )
    return packed.select_columns(
        ["doc_id", "start_tok", "first_seq", "last_seq"]
    )


def classifier_score_docs(sf_dir: str):
    """Model-scored quality gate: hashed bag-of-words LINEAR CLASSIFIER
    (fastText/CCNet shape — token -> splitmix bucket -> integer weight
    -> per-doc sum -> keep/drop threshold).  The weight table is a
    deterministic arithmetic stand-in for trained weights, so scoring
    is int64-exact and the oracle replays the full per-byte hash chain
    plus the weight formula.  One map_batches, zero shuffle — scoring
    cost is linear in corpus bytes at any scale."""
    from geodata_ray.stages.textstats import classifier_score_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(classifier_score_batch, batch_format="pyarrow")


def _crawl_snapshot(sf_dir: str, *, drop_mod: int, v2: bool = False):
    """One synthetic crawl snapshot over the documents table: docs with
    ``doc_id % 10 == drop_mod`` are absent from this snapshot, and with
    ``v2=True`` docs with ``doc_id % 7 == 3`` carry revised content
    (text + ' v2').  Emits the diff-ready (url, fp) projection — a
    canonical URL plus the md5-64 content fingerprint — so the
    downstream exchange never carries page bytes."""
    from geodata_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = (ids % 10) != drop_mod
        batch = batch.filter(pa.array(keep))
        ids = ids[keep]
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = text.fill_null("")
        if v2:
            suf = pa.array(
                np.where(ids % 7 == 3, " v2", ""), type=pa.string()
            )
            text = pc.binary_join_element_wise(text, suf, "")
        url = pc.binary_join_element_wise(
            "https://site",
            pc.cast(pa.array(ids % 97), pa.string()),
            ".example.com/d",
            pc.cast(batch["doc_id"], pa.string()),
            "",
        )
        fp = fingerprint_batch(
            pa.table({"doc_id": batch["doc_id"], "text": text})
        )["fingerprint"]
        return pa.table({"url": url, "fp": fp})

    return ds.map_batches(build, batch_format="pyarrow")


def crawl_diff_docs(sf_dir: str):
    """Incremental crawl diff between two snapshots of the same URL
    space (10% of pages dropped on each side, a 1/7 slice recrawled
    with changed content): every URL classified added / removed /
    changed / unchanged.  One full-outer fingerprint join (the only
    exchange); the oracle recomputes both snapshots and the FULL OUTER
    JOIN directly from the generator arithmetic."""
    from geodata_ray.stages.urls import snapshot_diff

    a = _crawl_snapshot(sf_dir, drop_mod=0)
    b = _crawl_snapshot(sf_dir, drop_mod=5, v2=True)
    return snapshot_diff(a, b, key_col="url", fp_col="fp")


def inverted_index_docs(sf_dir: str):
    """Corpus inverted index: term -> document frequency + ascending
    comma-joined posting list (min_df=3 prunes the singleton tail).
    One hash-bucketed exchange over (term, doc_id) pairs; the oracle
    rebuilds postings with string_agg(... ORDER BY doc_id)."""
    from geodata_ray.stages.textstats import inverted_index

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_index(ds, min_df=3)


def host_stats_docs(sf_dir: str):
    """Per-host corpus statistics over canonicalized messy URLs — the
    domain-level aggregation every crawl pipeline runs (host doc
    counts + volume feed per-domain quotas and blocklists).  Chains
    the URL normalizer's host extraction into a two-phase grouped
    aggregate; the oracle derives the host straight from the doc_id
    arithmetic, independent of the regex machinery."""
    from geodata_ray.stages.urls import canonicalize_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def messy(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "url": pa.array(_messy_host_urls(ids)),
            }
        )

    pages = ds.map_batches(messy, batch_format="pyarrow").map_batches(
        canonicalize_batch, batch_format="pyarrow"
    )
    return grouped_aggregate(
        pages,
        ["host"],
        [("doc_id", "count", "n_docs"), ("n_chars", "sum", "sum_chars")],
    )


def near_dup_keep_docs(sf_dir: str):
    """End-to-end fuzzy dedup: MinHash-LSH verified pairs -> connected
    components -> one canonical representative (min doc_id) per
    cluster, singletons kept.  Output is (doc_id, cluster_id, is_rep)
    for EVERY corpus doc; the oracle recomputes the clusters with a
    recursive-CTE reachability over the identical exact pair set."""
    import ray.data as rd

    from geodata_ray.stages.graphcc import near_dup_clusters

    corpus = _ndup_corpus(sf_dir)
    pairs = near_dup_pairs(sf_dir)
    ids = rd.from_arrow(corpus.select(["doc_id"]))
    return near_dup_clusters(ids, pairs)


def repetition_stats_docs(sf_dir: str):
    """Gopher-style per-document repetition statistics (duplicate-token
    and top-bigram coverage ingredients, longest same-token run) — the
    repetition half of a C4/Gopher quality filter.  All-integer outputs;
    the DuckDB oracle recomputes them with list ops + a gaps-and-islands
    window (fully independent machinery)."""
    from geodata_ray.stages.textstats import repetition_stats_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Query registry ordering contract (see COVERAGE.md):
# the external driver's correctness gate checks exactly the FIRST 50 names in
# dict order.  Round 4 rotates the window so the 28 queries that never had (or
# lost) a driver row in rounds 1-3 come first, followed by queries new in this
# round, then long-stable driver-green backfill.  Names and implementations
# are stable across rounds; ONLY the ordering moves.  Never append a new query
# at the end — insert it after the rotation block so it gets a driver row.
# ---------------------------------------------------------------------------
def outlier_events_zscore(sf_dir: str):
    """Per-user anomaly detection: events whose value deviates from the
    user's mean by more than 3 population standard deviations, decided
    by EXACT integer arithmetic ((n*x-S)^2 > 9*(n*SS-S^2)) so the flag
    set is bit-identical across engines — no float mean/std anywhere.
    Two passes: pre-combined grouped moments, then a broadcast join
    back (one row per user; ``moments="shuffle"`` is the 10^9-key
    path).  Reference parity: geodata's out-of-range cell screening
    before conversion, generalized to keyed z-scores."""
    from geodata_ray.stages.anomaly import grouped_zscore_outliers

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table(
            {"event_id": batch["event_id"], "user_id": batch["user_id"],
             "cents": c}
        )

    return grouped_zscore_outliers(
        ds.map_batches(cents, batch_format="pyarrow"),
        "user_id", "cents", k2=9, min_n=8, carry_cols=["event_id"],
    )


def rrf_fusion_docs(sf_dir: str):
    """Reciprocal-rank fusion of the TF-IDF and BM25 retrievers (the
    standard multi-retriever merge, Cormack et al.): each retriever
    contributes floor(2^20 / (60 + rank)) for its top-10 list, fused
    scores are exact integer sums, ties broken (rrf_fp DESC, doc_id
    ASC).  Composition of two audited operators; the candidate lists
    are bounded (k=10 each) so the fuse itself is a constant-size
    merge — the distributed work is the two retrieval scans."""
    a = tfidf_retrieval_docs(sf_dir).to_pandas()
    b = bm25_retrieval_docs(sf_dir).to_pandas()

    import pandas as pd

    parts = []
    for t in (a, b):
        t = t.sort_values(
            ["score_fp", "doc_id"], ascending=[False, True],
            ignore_index=True,
        )
        r = np.arange(1, len(t) + 1, dtype=np.int64)
        parts.append(pd.DataFrame(
            {"doc_id": t["doc_id"].to_numpy(),
             "c": (1 << 20) // (60 + r)}
        ))
    u = pd.concat(parts, ignore_index=True)
    g = u.groupby("doc_id", as_index=False).agg(
        rrf_fp=("c", "sum"), n_lists=("c", "size")
    )
    g = g.sort_values(
        ["rrf_fp", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(10)
    return pa.table(
        {
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "rrf_fp": pa.array(g["rrf_fp"].to_numpy(), pa.int64()),
            "n_lists": pa.array(g["n_lists"].to_numpy(), pa.int64()),
        }
    )


def setsim_join_docs(sf_dir: str):
    """EXACT set-similarity self-join (prefix filtering, recall 1 by
    construction — the deterministic sibling of the MinHash path):
    all doc pairs with 3-gram shingle Jaccard >= 0.7 over the
    mutation corpus.  No vocabulary broadcast, no corpus broadcast:
    df attaches by hash join, candidates verify by joining ids back
    to texts."""
    import ray.data as rd

    from geodata_ray.stages.dedup import setsim_join_pairs

    corpus = _ndup_corpus(sf_dir)
    return setsim_join_pairs(
        rd.from_arrow(corpus), threshold_num=7, threshold_den=10
    )


def semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic deduplication over the embedding mutation
    corpus: streaming k-means (k=8, 6 iters), then within-cluster
    cosine >= 0.99 pruning keeping the lowest id.  The oracle replays
    Lloyd in MATERIALIZED CTEs and the prune as a within-cluster
    self-join + NOT IN — the full cluster-then-dedup chain is
    SQL-audited."""
    import ray.data as rd

    from geodata_ray.stages.kmeans import semdedup_keep

    corpus = _embedding_corpus(sf_dir)
    ds = rd.from_arrow(corpus).repartition(8)
    return semdedup_keep(ds, k=8, iters=6, tau=0.99, init_table=corpus)


def zonemap_pruned_scan_events(sf_dir: str):
    """Zone-map pruned range scan: events rewritten ONCE as
    value-partitioned parquet (16 buckets), then ``value >= 200``
    answered by consulting only the file FOOTERS — files whose
    [min,max] misses the predicate are never opened (the file-level
    analogue of the reference's reader-side bbox/variable trimming).
    A residual in-batch filter keeps semantics exact; the oracle is
    the plain full-scan filter, so the comparison proves pruning
    loses nothing."""
    import ray.data as rd

    from geodata_ray.state.lineage import fingerprint_files
    from geodata_ray.state.zonemap import pruned_range_read

    # cache keyed by the INPUT FILE's content hash (not the path): a
    # regenerated sf_dir can never silently reuse stale partitions
    tag = fingerprint_files([f"{sf_dir}/events.parquet"])[:16]
    root = f"/tmp/geodata_zonemap/v1/{tag}"
    if not os.path.exists(root):
        ds = _read(sf_dir, "events", columns=["event_id", "value"])

        def bucket(batch: pa.Table) -> pa.Table:
            v = batch["value"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "vbucket",
                pa.array(
                    np.clip(v // 32.0, 0, 15).astype(np.int64)
                ),
            )

        # write to a process-unique tmp dir, then one atomic rename:
        # concurrent gate runs race benignly (loser's rename fails,
        # winner's complete tree is used — never a doubled directory)
        tmp = f"{root}.tmp.{os.getpid()}"
        ds.map_batches(bucket, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["vbucket"]
        )
        try:
            os.rename(tmp, root)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    out, n_total, n_read = pruned_range_read(
        root, "value", 200.0, columns=["event_id", "value"]
    )
    assert n_read < n_total, "zone map pruned nothing"
    return out.select_columns(["event_id", "value"])


def bpe_pair_counts_docs(sf_dir: str):
    """Tokenizer training, step one: BPE merge-candidate statistics —
    adjacent byte-pair counts within whitespace words over the whole
    corpus, counted on the distinct-word vocabulary weighted by word
    frequency (Sennrich BPE; the highest-count pair would be the first
    merge).  Pairs with corpus count >= 100."""
    from geodata_ray.stages.textstats import bpe_pair_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    return bpe_pair_counts(ds, min_count=100)


def entity_resolution_customers(sf_dir: str):
    """Multi-key entity resolution over customers: two deterministic
    blocking keys (an "email" key linking custkeys {17j, 17j+1} and a
    "phone" key linking {23j, 23j+1}; all other records get null keys)
    — records sharing EITHER key merge transitively via union-find, so
    e.g. 68~69 by email and 69~70 by phone yield entity {68, 69, 70}.
    The oracle replays the closure with a recursive CTE."""
    import ray.data as rd

    from geodata_ray.stages.graphcc import resolve_entities

    ds = _read(sf_dir, "customer", columns=["c_custkey"])

    def keys(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch["c_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        em = k // 17
        ph = k // 23
        return pa.table(
            {
                "record_id": pa.array(k),
                "k_email": pa.array(em, pa.int64(), mask=(k % 17 > 1)),
                "k_phone": pa.array(ph, pa.int64(), mask=(k % 23 > 1)),
            }
        )

    recs = ds.map_batches(keys, batch_format="pyarrow")
    return resolve_entities(
        recs, id_col="record_id", key_cols=["k_email", "k_phone"]
    )


def dq_suite_events(sf_dir: str):
    """Data-quality expectation suite (the Deequ/Great-Expectations
    operator class, one streaming pass): per-check violation counts
    over events — null checks, domain checks, range checks, an
    out-of-bounds timestamp check, a threshold watch, plus a
    duplicate-key check (the only one needing a keyed exchange;
    everything else pre-combines to one partial row per check per
    batch).  Zero-violation checks still emit their row, so the report
    schema never collapses."""
    from geodata_ray.stages.relational import grouped_aggregate

    ds = _read(sf_dir, "events")
    types = pa.array(["click", "view", "purchase", "signup", "error"])
    lo = np.datetime64("2024-01-01", "us")
    hi = np.datetime64("2026-01-01", "us")

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        v = batch["value"]
        vnull = v.null_count
        vv = v.fill_null(0).to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        )
        # a NULL event_type is NOT 'unknown' (SQL: NULL NOT IN -> NULL,
        # uncounted) — mask validity before inverting
        et = batch["event_type"]
        bad_type = int(
            pc.sum(
                pc.and_(pc.invert(pc.is_in(et, value_set=types)),
                        pc.is_valid(et))
            ).as_py()
            or 0
        )
        checks = {
            "row_count": n,
            "event_id_null": batch["event_id"].null_count,
            "value_null": vnull,
            "value_negative": int((vv < 0).sum()),
            "value_gt_250": int((vv > 250).sum()),
            "event_type_unknown": bad_type,
            "ts_out_of_range": int(((ts < lo) | (ts >= hi)).sum()),
        }
        return pa.table(
            {
                "check": pa.array(list(checks), pa.string()),
                "n": pa.array(
                    np.array(list(checks.values()), dtype=np.int64)
                ),
            }
        )

    rowlevel = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["check"],
        [("n", "sum", "n_violations")],
    )
    # duplicate-key check: the one aggregate that must shuffle by key.
    # NULL ids form ONE group, keyed by an explicit validity flag so no
    # stage ever groups on a null key (n nulls = n-1 duplicates, the
    # same rule the oracle's COUNT arithmetic replays)
    def id_key(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"]
        return pa.table(
            {
                "eid": pc.cast(eid, pa.int64()).fill_null(0),
                "isnull": pc.invert(pc.is_valid(eid)),
            }
        )

    per_id = grouped_aggregate(
        ds.map_batches(id_key, batch_format="pyarrow"),
        ["eid", "isnull"],
        [("eid", "count", "c")],
    )

    def dup_partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        extra = int((c - 1).clip(min=0).sum())
        return pa.table(
            {
                "check": pa.array(["event_id_duplicate"], pa.string()),
                "n": pa.array([extra], pa.int64()),
            }
        )

    dups = grouped_aggregate(
        per_id.map_batches(dup_partial, batch_format="pyarrow"),
        ["check"],
        [("n", "sum", "n_violations")],
    )
    return rowlevel.union(dups)


def scd2_intervals_users(sf_dir: str):
    """Slowly-changing-dimension type-2 build: each user's event
    stream becomes validity intervals — state (event_type) valid from
    its own timestamp until the NEXT event's timestamp (null for the
    open current interval).  The distributed LEAD: bucket by user,
    per-bucket vectorized sort + shift (the keyed-segment family);
    timestamps exposed as integer epoch-us (exact in both engines)."""
    from geodata_ray.stages.windows import _tag_bucket

    ds = _read(
        sf_dir, "events",
        columns=["user_id", "event_id", "ts", "event_type"],
    )

    def to_us(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "ts_us": us,
            }
        )

    def intervals(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, u))
        u, e, ts = u[order], e[order], ts[order]
        ty = t["event_type"].take(pa.array(order))
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        last = np.zeros(len(u), dtype=bool)
        last[-1:] = True
        if len(u) > 1:
            last[:-1] = u[:-1] != u[1:]
        return pa.table(
            {
                "user_id": pa.array(u),
                "event_type": ty,
                "valid_from_us": pa.array(ts),
                "valid_to_us": pa.array(nxt, pa.int64(), mask=last),
            }
        )

    bucketed = _tag_bucket(
        ds.map_batches(to_us, batch_format="pyarrow"), "user_id", 32
    )
    return bucketed.groupby("__b").map_groups(
        lambda g: intervals(g.drop_columns(["__b"])),
        batch_format="pyarrow",
    )


def geohash_events(sf_dir: str):
    """Geohash tiling (precision 8, the third index family next to
    the quad cells and S2 tokens): standard base32 geohash of each
    event's derived point, vectorized bit interleave + one table
    lookup per character.  The oracle replays the interleave with the
    Z-order //-and-% arithmetic and decodes base32 with substring —
    string-level equality, not just bit-level."""
    from geodata_ray.cellmath.qcell import geohash_encode

    ds = _read(sf_dir, "events", columns=["event_id"])

    def enc(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        gh, s = geohash_encode(
            _derive_lat_np(ids), _derive_lon_np(ids), 8
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "gh_int": pa.array(gh),
                "geohash": s,
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def trailing_window_count_events(sf_dir: str):
    """Per-ROW trailing-window aggregate (rate limiting / burst
    detection): for every event, the count of the same user's events
    in the preceding hour INCLUDING the current row and its timestamp
    peers — exactly SQL's RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW.  Thin wrapper over the shared
    ``windows.trailing_window_counts`` kernel (the sf1 stress case
    drives the same code)."""
    from geodata_ray.stages.windows import trailing_window_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    out = trailing_window_counts(
        ds, key_col="user_id", ts_col="ts", tie_col="event_id",
        window_us=3_600_000_000,
    )
    return out.map_batches(
        lambda b: pa.table(
            {"event_id": b["event_id"], "n_trailing_1h": b["n_trailing"]}
        ),
        batch_format="pyarrow",
    )


def resize_checksum_images(sf_dir: str):
    """Image RESIZE audited end-to-end: PPM decode -> integer-exact
    nearest-neighbor downscale (longest side 24, half-even integer
    target dims) -> PPM re-encode -> second decode -> per-image
    position-weighted pixel checksum.  The oracle regenerates every
    SOURCE pixel from the generator arithmetic, replays the dim
    rounding and the x*w//nw index mapping in SQL, and checksums the
    resized raster — geometry AND pixel placement both verified."""
    import ray.data as rd

    from geodata_ray.stages.multimodal import (
        ppm_decode,
        resize_images,
        synth_image_table,
    )

    ds = rd.from_arrow(synth_image_table(200)).repartition(4)
    small = resize_images(ds, max_side=24)

    def chk(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_numpy()
        out_w, out_h, out_c = [], [], []
        for p in batch["payload"].to_pylist():
            px, _ = ppm_decode(p)
            h, w, _ = px.shape
            rgb = (
                px[..., 0].astype(np.int64)
                + 256 * px[..., 1].astype(np.int64)
                + 65536 * px[..., 2].astype(np.int64)
            )
            pos = np.arange(h, dtype=np.int64)[:, None] * w + np.arange(
                w, dtype=np.int64
            )[None, :] + 1
            out_w.append(w)
            out_h.append(h)
            out_c.append(int((rgb * pos).sum()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.int64()),
                "nw": pa.array(np.array(out_w, np.int64)),
                "nh": pa.array(np.array(out_h, np.int64)),
                "checksum": pa.array(np.array(out_c, np.int64)),
            }
        )

    return small.map_batches(chk, batch_format="pyarrow", batch_size=64)


def audio_energy_frames(sf_dir: str):
    """WAV decode audited end-to-end: the integer-noise clip corpus
    decodes through the real RIFF parser, then framewise (256-sample)
    energy = sum of squared int16 samples — exact integers, so the
    oracle regenerates every sample from the splitmix arithmetic and
    replays the framing in SQL (the audio analogue of the image pixel
    replay; the sine corpus stays rows-only because sin() is not
    bit-replayable across engines)."""
    import ray.data as rd

    from geodata_ray.stages.multimodal import (
        synth_audio_int_table,
        wav_decode,
    )

    ds = rd.from_arrow(synth_audio_int_table(100)).repartition(4)

    def frames(batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_numpy()
        out_id, out_fr, out_n, out_e = [], [], [], []
        for cid, p in zip(ids, batch["payload"].to_pylist()):
            s, _rate = wav_decode(p)
            v = s.astype(np.int64)
            fr = np.arange(v.size, dtype=np.int64) // 256
            nfr = int(fr[-1]) + 1 if v.size else 0
            out_id.append(np.full(nfr, cid, dtype=np.int64))
            out_fr.append(np.arange(nfr, dtype=np.int64))
            out_n.append(np.bincount(fr, minlength=nfr).astype(np.int64))
            out_e.append(
                np.bincount(fr, weights=(v * v).astype(np.float64),
                            minlength=nfr).astype(np.int64)
            )
        if not out_id:
            return pa.table(
                {"clip_id": pa.array([], pa.int64()),
                 "frame": pa.array([], pa.int64()),
                 "n_samples": pa.array([], pa.int64()),
                 "energy": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "clip_id": pa.array(np.concatenate(out_id)),
                "frame": pa.array(np.concatenate(out_fr)),
                "n_samples": pa.array(np.concatenate(out_n)),
                "energy": pa.array(np.concatenate(out_e)),
            }
        )

    return ds.map_batches(frames, batch_format="pyarrow", batch_size=32)


def scene_deltas_video(sf_dir: str):
    """Video scene-cut signal, SQL-audited end-to-end (completing the
    image/audio/video trio): decode every PPM-stream frame, emit the
    exact integer sum of absolute per-pixel channel deltas between
    adjacent frames — the standard cut-detection statistic.  The
    oracle regenerates both frames' pixels from the generator
    arithmetic and replays the |delta| sum."""
    import ray.data as rd

    from geodata_ray.stages.multimodal import ppm_decode, synth_video_table

    ds = rd.from_arrow(synth_video_table(60)).repartition(4)

    def deltas(batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_numpy()
        out_id, out_fr, out_d = [], [], []
        for vid, p in zip(ids, batch["payload"].to_pylist()):
            off, frames = 0, []
            while off < len(p):
                px, off = ppm_decode(p, off)
                frames.append(px.astype(np.int64))
            for f in range(1, len(frames)):
                out_id.append(int(vid))
                out_fr.append(f)
                out_d.append(int(np.abs(frames[f] - frames[f - 1]).sum()))
        return pa.table(
            {
                "video_id": pa.array(out_id, pa.int64()),
                "frame_no": pa.array(out_fr, pa.int64()),
                "delta": pa.array(out_d, pa.int64()),
            }
        )

    return ds.map_batches(deltas, batch_format="pyarrow", batch_size=16)


def vocab_coverage_docs(sf_dir: str):
    """Tokenizer-vocabulary sizing report: what fraction (basis
    points, exact integer floor) of the corpus token stream is covered
    by the top-k most frequent words, for k in {100, 1000, 10000} —
    the coverage curve that decides vocab size before training.  Word
    counts aggregate once (the corpus-sized exchange); each block then
    ships only its top-k candidates plus ONE total-row, so the final
    merge is bounded by k x blocks regardless of vocabulary size."""
    from geodata_ray.stages.relational import grouped_aggregate

    ds = _read(sf_dir, "documents", columns=["text"])

    def wcount(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # NULL texts contribute no tokens (SQL unnest(string_split(
        # NULL)) emits nothing; a fill_null('') would count one '')
        text = text.drop_null()
        toks = pc.split_pattern(text, " ")
        flat = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        ).flatten()
        out = pa.table({"word": flat}).group_by(["word"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["word", "n"])

    vocab = grouped_aggregate(
        ds.map_batches(wcount, batch_format="pyarrow"),
        ["word"],
        [("n", "sum", "n")],
    )
    kmax = 10_000

    def partial_topk(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        w = batch["word"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, -n))[:kmax]
        return pa.table(
            {
                "word": pa.array(
                    np.append(w[order], [""]).astype(object), pa.string()
                ),
                "n": pa.array(np.append(n[order], [int(n.sum())])),
                "is_tot": pa.array(
                    np.append(np.zeros(len(order), bool), [True])
                ),
            }
        )

    def report(batch: pa.Table) -> pa.Table:
        tot_mask = batch["is_tot"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        total = int(n[tot_mask].sum())
        nn = n[~tot_mask]
        ww = batch["word"].to_numpy(zero_copy_only=False)[~tot_mask]
        order = np.lexsort((ww, -nn))
        csum = np.cumsum(nn[order])
        ks = np.array([100, 1000, 10_000], dtype=np.int64)
        cov = np.array(
            [
                10_000 * int(csum[min(int(k), len(csum)) - 1]) // total
                if len(csum) and total
                else 0
                for k in ks
            ],
            dtype=np.int64,
        )
        return pa.table({"k": pa.array(ks), "coverage_bp": pa.array(cov)})

    return (
        vocab.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(report, batch_format="pyarrow", batch_size=None)
    )


def crawl_frontier_order(sf_dir: str):
    """Crawler politeness scheduling: assign every URL a global fetch
    slot that round-robins across hosts (slot = within-host sequence *
    n_hosts + host id), so no host is ever fetched twice before every
    other host with pending work gets a turn — the standard frontier
    interleave, as exact integer arithmetic.  Distributed as keyed
    segments (bucket by host, per-segment rank)."""
    from geodata_ray.stages.windows import _tag_bucket

    n_hosts = 101
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def host(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"doc_id": pa.array(d), "host": pa.array(d % n_hosts)}
        )

    def order(t: pa.Table) -> pa.Table:
        h = t["host"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((d, h))
        h, d = h[o], d[o]
        new = np.ones(h.size, dtype=bool)
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        seq = np.arange(h.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, h.size))
        )
        return pa.table(
            {
                "doc_id": pa.array(d),
                "host": pa.array(h),
                "fetch_slot": pa.array(seq * n_hosts + h),
            }
        )

    bucketed = _tag_bucket(
        ds.map_batches(host, batch_format="pyarrow"), "host", 32
    )
    return bucketed.groupby("__b").map_groups(
        lambda g: order(g.drop_columns(["__b"])), batch_format="pyarrow"
    )


def langid_margin_docs(sf_dir: str):
    """Language-ID CONFIDENCE: the margin between the best and
    second-best stopword-hit counts per document (the CLD-style
    score-gap gate: small margin = ambiguous, route to review).
    Exact integers; the oracle unpivots the four counts and ranks."""
    from geodata_ray.stages.textstats import langid_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def margin(batch: pa.Table) -> pa.Table:
        lg = langid_batch(batch, return_counts=True)
        counts = np.stack(
            [
                lg[c].to_numpy(zero_copy_only=False)
                for c in ("n_en", "n_es", "n_de", "n_fr")
            ],
            axis=1,
        )
        part = np.partition(counts, counts.shape[1] - 2, axis=1)
        n1 = part[:, -1]
        n2 = part[:, -2]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_top1": pa.array(n1.astype(np.int64)),
                "margin": pa.array((n1 - n2).astype(np.int64)),
            }
        )

    return ds.map_batches(margin, batch_format="pyarrow")


def bot_signature_users(sf_dir: str):
    """Bot/automation detection signal: per-user inter-arrival-gap
    moments (count, sum, sum of squares — gaps in WHOLE SECONDS so the
    squares stay exact in int64; microsecond gaps square past 2^63)
    plus the regularity flag ((n*SS - S^2) == 0 with n >= 10 gaps —
    perfectly periodic traffic).  Humans never have zero gap variance;
    schedulers do.  Keyed-segment plan: bucket by user, per-segment
    sorted diff, one exact moment row per user; an overflow predictor
    raises rather than wrapping (same family as the z-score guard)."""
    from geodata_ray.stages.windows import _tag_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def to_s(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_s": pc.divide(us, 1_000_000),
            }
        )

    def moments(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        e = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, u))
        u, ts = u[order], ts[order]
        same = np.zeros(u.size, dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same[1:]]
        gu = u[1:][same[1:]]
        uniq, inv = np.unique(gu, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        ss = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, gaps)
        np.add.at(ss, inv, gaps * gaps)
        if len(n) and (
            float(np.max(n.astype(np.float64) * ss.astype(np.float64)))
            > 4.0e18
            or float(np.max(s.astype(np.float64) ** 2)) > 4.0e18
        ):
            raise OverflowError(
                "gap moments exceed int64 — rescale gaps or shard sums"
            )
        regular = (n >= 10) & (n * ss - s * s == 0)
        return pa.table(
            {
                "user_id": pa.array(uniq),
                "n_gaps": pa.array(n),
                "gap_sum_s": pa.array(s),
                "gap_sumsq_s": pa.array(ss),
                "is_regular": pa.array(regular),
            }
        )

    bucketed = _tag_bucket(
        ds.map_batches(to_s, batch_format="pyarrow"), "user_id", 32
    )
    return bucketed.groupby("__b").map_groups(
        lambda g: moments(g.drop_columns(["__b"])),
        batch_format="pyarrow",
    )


def url_templates_docs(sf_dir: str):
    """URL template mining (site-structure discovery): digit runs in
    the derived path collapse to 'N' and templates are counted — the
    standard crawl-dedup/structure signal ('/a/item/N' vs
    '/post/N/comment/N').  One vectorized regex replace per batch +
    a pre-combined grouped count."""
    from geodata_ray.stages.relational import grouped_aggregate

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def paths(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cat = np.array(list("abcde"), dtype=object)[d % 5]
        even = d % 2 == 0
        p = np.empty(len(d), dtype=object)
        ie = np.flatnonzero(even)
        io = np.flatnonzero(~even)
        p[ie] = [f"/{cat[i]}/item/{d[i] * 7 % 1000}/page/{d[i] % 13}"
                 for i in ie]
        p[io] = [f"/post/{d[i]}/comment/{d[i] % 7}" for i in io]
        tmpl = pc.replace_substring_regex(
            pa.array(list(p), pa.string()), r"[0-9]+", "N"
        )
        return pa.table({"template": tmpl})

    return grouped_aggregate(
        ds.map_batches(paths, batch_format="pyarrow"),
        ["template"],
        [("template", "count", "n_urls")],
    )


def time_travel_events(sf_dir: str):
    """Append-only TIME TRAVEL over the lineage-manifested partitioned
    store: write the early days, commit snapshot v1, append the
    remaining days (snapshot v2), then read the table AS OF v1 —
    which must equal a plain timestamp filter (the oracle).  Reads
    verify content hashes, so a rewritten partition can never serve
    silently wrong history."""
    import ray.data as rd

    from geodata_ray.state.lineage import (
        commit_snapshot,
        fingerprint_files,
        read_snapshot,
        write_partitioned_resumable,
    )

    tag = fingerprint_files([f"{sf_dir}/events.parquet"])[:16]
    root = f"/tmp/geodata_timetravel/v2/{tag}"
    marker = f"{root}/_SNAPSHOTS_DONE"
    cut = np.datetime64("2024-01-15", "us")

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("us"))
        month = pc.strftime(ts, format="%Y-%m-%d")
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "day": month,
                "cents": cents,
                "ts_us": ts.cast(pa.int64()),
            }
        )

    if not os.path.exists(marker):
        # build the whole store (partitions + snapshots + marker) in a
        # process-unique dir, then ONE atomic rename — concurrent gate
        # runs can never observe (or interleave into) a half-built
        # snapshot history
        build = f"{root}.tmp.{os.getpid()}"
        ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"])
        # materialize once: both writes consume prepped, and lazy
        # re-execution would scan+prep the source twice
        prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
        early = prepped.filter(
            expr=f"ts_us < {int(cut.astype('int64'))}"
        )
        late = prepped.filter(
            expr=f"ts_us >= {int(cut.astype('int64'))}"
        )
        write_partitioned_resumable(early, build, "day")
        v1 = commit_snapshot(build)
        write_partitioned_resumable(late, build, "day")
        commit_snapshot(build)
        open(f"{build}/_SNAPSHOTS_DONE", "w").write(str(v1))
        try:
            os.rename(build, root)
        except OSError:
            import shutil

            shutil.rmtree(build, ignore_errors=True)
    v1 = int(open(marker).read())
    out = read_snapshot(root, v1)
    return out.select_columns(["event_id", "day", "cents"])


def schema_evolution_read_events(sf_dir: str):
    """SCHEMA EVOLUTION read: half the table was written by a v1
    writer (event_id, cents), the other half by a v2 writer that added
    event_type — one unified read with typed nulls for the missing
    column, no file ever rewritten (the lakehouse add-column
    contract).  The oracle replays the writer split with a CASE."""
    from geodata_ray.state.lineage import fingerprint_files
    from geodata_ray.state.zonemap import read_evolved

    tag = fingerprint_files([f"{sf_dir}/events.parquet"])[:16]
    root = f"/tmp/geodata_schevo/v1/{tag}"
    if not os.path.exists(root):
        ds = _read(
            sf_dir, "events", columns=["event_id", "value", "event_type"]
        )

        def prep(batch: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(
                    pc.cast(batch["value"], pa.float64()), 100.0)),
                pa.int64(),
            )
            return pa.table(
                {
                    "event_id": batch["event_id"],
                    "cents": cents,
                    "event_type": batch["event_type"],
                }
            )

        prepped = ds.map_batches(prep, batch_format="pyarrow")
        build = f"{root}.tmp.{os.getpid()}"

        def half(parity, cols):
            def f(batch: pa.Table) -> pa.Table:
                ids = batch["event_id"].to_numpy(zero_copy_only=False)
                return batch.filter(
                    pa.array(ids % 2 == parity)
                ).select(cols)

            return f

        prepped.map_batches(
            half(0, ["event_id", "cents"]), batch_format="pyarrow"
        ).write_parquet(f"{build}/writer_v1")
        prepped.map_batches(
            half(1, ["event_id", "cents", "event_type"]),
            batch_format="pyarrow",
        ).write_parquet(f"{build}/writer_v2")
        try:
            os.rename(build, root)
        except OSError:
            import shutil

            shutil.rmtree(build, ignore_errors=True)
    target = pa.schema(
        [
            ("event_id", pa.int64()),
            ("cents", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    return read_evolved(root, target)


def merge_upsert_events(sf_dir: str):
    """MERGE INTO (upsert apply — the write-side complement of the
    crawl-diff CDC operator): a change set of Updates, Deletes and
    Inserts applies onto the base table in ONE keyed exchange — per
    key, the change row wins over the base row; deletes drop, updates
    replace, inserts land.  Change set derived deterministically from
    the base (id%10: 0=update +100 cents, 1=delete, 2=insert id+10^9
    at cents+5); the oracle replays it with a LEFT JOIN + CASE."""
    from geodata_ray.stages.windows import _tag_bucket

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["event_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        if ids.size and int(ids.max()) >= 1_000_000_000:
            raise ValueError(
                "insert-key offset collides with base event_ids >= 1e9"
            )
        m = ids % 10
        # base rows (is_change=0)
        out_id = [ids]
        out_c = [cents]
        out_ch = [np.zeros(len(ids), np.int64)]
        out_op = [np.full(len(ids), "B", dtype=object)]
        # updates
        upd = m == 0
        out_id.append(ids[upd])
        out_c.append(cents[upd] + 100)
        out_ch.append(np.ones(int(upd.sum()), np.int64))
        out_op.append(np.full(int(upd.sum()), "U", dtype=object))
        # deletes
        del_ = m == 1
        out_id.append(ids[del_])
        out_c.append(np.zeros(int(del_.sum()), np.int64))
        out_ch.append(np.ones(int(del_.sum()), np.int64))
        out_op.append(np.full(int(del_.sum()), "D", dtype=object))
        # inserts (new keys)
        ins = m == 2
        out_id.append(ids[ins] + 1_000_000_000)
        out_c.append(cents[ins] + 5)
        out_ch.append(np.ones(int(ins.sum()), np.int64))
        out_op.append(np.full(int(ins.sum()), "I", dtype=object))
        return pa.table(
            {
                "id": pa.array(np.concatenate(out_id)),
                "cents": pa.array(np.concatenate(out_c)),
                "is_change": pa.array(np.concatenate(out_ch)),
                "op": pa.array(
                    np.concatenate(out_op).tolist(), pa.string()
                ),
            }
        )

    def apply_merge(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        ch = t["is_change"].to_numpy(zero_copy_only=False)
        op = np.asarray(t["op"].to_pylist(), dtype=object)
        order = np.lexsort((ch, ids))  # change row LAST per key
        ids, cents, ch, op = (
            ids[order], cents[order], ch[order], op[order]
        )
        # MERGE presupposes unique base keys; keep-last would silently
        # collapse duplicate base rows where the oracle's LEFT JOIN
        # keeps every one — refuse instead (all rows of a key share a
        # bucket, so the per-group check is complete).  After the
        # lexsort, duplicate base rows are adjacent with is_change=0.
        if ids.size > 1 and bool(
            ((ids[1:] == ids[:-1]) & (ch[1:] == 0)).any()
        ):
            raise ValueError(
                "merge_upsert: duplicate base-table key — MERGE "
                "semantics require a unique merge key on the target"
            )
        last = np.ones(ids.size, dtype=bool)
        last[:-1] = ids[:-1] != ids[1:]
        keep = last & (op != "D")
        return pa.table(
            {
                "id": pa.array(ids[keep]),
                "cents": pa.array(cents[keep]),
            }
        )

    bucketed = _tag_bucket(
        ds.map_batches(prep, batch_format="pyarrow"), "id", 32
    )
    return bucketed.groupby("__b").map_groups(
        lambda g: apply_merge(g.drop_columns(["__b"])),
        batch_format="pyarrow",
    )


def weighted_discount_lineitem(sf_dir: str):
    """Weighted aggregate as an EXACT integer ratio: per return flag,
    the quantity-weighted average discount exposed as (numerator =
    sum qty*disc_bp, denominator = sum qty) — the weighted-mean family
    without a single float division (consumers divide downstream)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(batch["l_quantity"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bp = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["l_discount"],
                                         pa.float64()), 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "wnum": pa.array(qty * bp),
                "wden": pa.array(qty),
            }
        )

    from geodata_ray.stages.relational import grouped_aggregate

    return grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag"],
        [("wnum", "sum", "wnum"), ("wden", "sum", "wden")],
    )


def daily_delta_events(sf_dir: str):
    """Day-over-day change report: daily cents totals plus the LAG
    delta vs the previous CALENDAR day (null when yesterday had no
    rows — a gap is not a zero).  The daily table is bounded, so the
    shift is the documented single-block merge after one pre-combined
    exchange."""
    from geodata_ray.stages.relational import grouped_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                "day": pc.floor_temporal(
                    batch["ts"].cast(pa.timestamp("us")), unit="day"
                ),
                "cents": cents,
            }
        )

    daily = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["day"],
        [("cents", "sum", "cents")],
    )

    def shift(batch: pa.Table) -> pa.Table:
        day = batch["day"].cast(pa.timestamp("us")).cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(day)
        day, cents = day[order], cents[order]
        prev = np.empty_like(cents)
        prev[1:] = cents[:-1]
        one_day = 86_400_000_000
        has_prev = np.zeros(day.size, dtype=bool)
        if day.size > 1:
            has_prev[1:] = day[1:] - day[:-1] == one_day
        delta = cents - prev
        return pa.table(
            {
                "day": pa.array(day).cast(pa.timestamp("us")),
                "cents": pa.array(cents),
                "delta_cents": pa.array(
                    delta, pa.int64(), mask=~has_prev
                ),
            }
        )

    return daily.repartition(1).map_batches(
        shift, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# sixth wave (round 5): MAD outliers, grid radius join, watermark
# lateness, EXISTS semi-join, returned-revenue join, reciprocal edges
# ---------------------------------------------------------------------------


def robust_outliers_events(sf_dir: str):
    """Robust (median/MAD) outlier flags per event type — the
    median-based complement of the mean/std z-score family
    (``outlier_events_zscore``), immune to the very outliers it hunts.
    EXACT integers end to end: per-key median and MAD both come from
    the bounded-histogram quantile machinery (ceil-rank quantile_disc
    semantics); a row is flagged iff |cents - med| > 3 * MAD.  Output
    is the flagged rows only.  Scale shape: two keyed histogram
    exchanges (value-cardinality-bounded) + two broadcast join-backs
    of the tiny per-key tables — raw rows never shuffle."""
    import ray

    from geodata_ray.stages.relational import (
        broadcast_join,
        grouped_exact_quantiles,
    )

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": cents,
            }
        )

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()

    med = grouped_exact_quantiles(
        rows, "event_type", "cents", [(50, 0.5)]
    ).to_pandas()
    med_tbl = pa.table(
        {
            "event_type": pa.array(med["event_type"], pa.string()),
            "med": pa.array(med["cents"].astype("int64")),
        }
    )
    with_med = broadcast_join(rows, med_tbl, ["event_type"])

    def dev(batch: pa.Table) -> pa.Table:
        d = pc.abs(pc.subtract(batch["cents"], batch["med"]))
        return batch.append_column("dev", pc.cast(d, pa.int64()))

    devd = with_med.map_batches(dev, batch_format="pyarrow").materialize()
    mad = grouped_exact_quantiles(
        devd, "event_type", "dev", [(50, 0.5)]
    ).to_pandas()
    mad_tbl = pa.table(
        {
            "event_type": pa.array(mad["event_type"], pa.string()),
            "mad": pa.array(mad["dev"].astype("int64")),
        }
    )
    joined = broadcast_join(
        devd.select_columns(
            ["event_id", "event_type", "cents", "med", "dev"]
        ),
        mad_tbl,
        ["event_type"],
    )

    def flag(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            batch["dev"], pc.multiply(batch["mad"], pa.scalar(3, pa.int64()))
        )
        return batch.filter(keep).select(
            ["event_id", "event_type", "cents", "med", "mad"]
        )

    return joined.map_batches(flag, batch_format="pyarrow")


def radius_join_events(sf_dir: str):
    """Spatial RADIUS self-join (all pairs within distance R) on the
    integer event grid — the fixed-radius companion of the kNN join:
    each point hashes to an R-sized cell, probes replicate to the 3x3
    neighbor cells, ONE equi-join on cell id co-locates every
    candidate, and the exact integer L2^2 test keeps dx^2 + dy^2 <=
    R^2.  Pair (a, b) surfaces exactly once (probe id < home id).
    Scale shape: one keyed exchange of 10n rows (9 probes + 1 home per
    point); a hot cell (megacity skew) splits by raising the grid
    resolution — documented partitioning assumption.  Coordinates and
    the distance test are pure int64, so the oracle is a band-predicate
    self-join over the identical derived grid."""
    return _radius_pairs(sf_dir, R=64)


def _radius_pairs(sf_dir: str, *, R: int, GRID: int = 4096):
    """(id_a, id_b, d2) pairs of events within integer L2 distance
    ``R`` on the splitmix-derived GRIDxGRID lattice — the cell-hash +
    3x3-probe join shared by ``radius_join_events`` (R=64) and the
    DBSCAN labeling (eps=32)."""
    from geodata_ray.stages.relational import shuffle_join

    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "events", columns=["event_id"])

    def points(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        # splitmix coordinates: the two Knuth multiplicative hash
        # streams are lattice-correlated (documented in the oracle
        # rules), which piles points onto lines and inflates the pair
        # count ~30x — the splitmix streams are uniform
        qx = (
            splitmix64(ids.astype(np.uint64)) % np.uint64(GRID)
        ).astype(np.int64)
        qy = (
            splitmix64(ids.astype(np.uint64) ^ np.uint64(0xD1B54A32D192ED03))
            % np.uint64(GRID)
        ).astype(np.int64)
        return pa.table(
            {
                "id": batch["event_id"],
                "qx": pa.array(qx),
                "qy": pa.array(qy),
            }
        )

    pts = ds.map_batches(points, batch_format="pyarrow").materialize()
    ncell = GRID // R

    def home(batch: pa.Table) -> pa.Table:
        qx = batch["qx"].to_numpy()
        qy = batch["qy"].to_numpy()
        cell = (qx // R) * ncell + (qy // R)
        return pa.table(
            {
                "cell": pa.array(cell),
                "h_id": batch["id"],
                "h_qx": batch["qx"],
                "h_qy": batch["qy"],
            }
        )

    def probes(batch: pa.Table) -> pa.Table:
        qx = batch["qx"].to_numpy()
        qy = batch["qy"].to_numpy()
        ids = batch["id"].to_numpy()
        cx, cy = qx // R, qy // R
        out = []
        for dx_ in (-1, 0, 1):
            for dy_ in (-1, 0, 1):
                nx, ny = cx + dx_, cy + dy_
                ok = (nx >= 0) & (nx < ncell) & (ny >= 0) & (ny < ncell)
                out.append(
                    pa.table(
                        {
                            "cell": pa.array(
                                (nx[ok] * ncell + ny[ok]).astype(np.int64)
                            ),
                            "p_id": pa.array(ids[ok]),
                            "p_qx": pa.array(qx[ok]),
                            "p_qy": pa.array(qy[ok]),
                        }
                    )
                )
        return pa.concat_tables(out)

    hm = pts.map_batches(home, batch_format="pyarrow")
    pb = pts.map_batches(probes, batch_format="pyarrow")
    j = shuffle_join(pb, hm, ["cell"], num_buckets=32)

    def dist_keep(batch: pa.Table) -> pa.Table:
        dx = (
            batch["p_qx"].to_numpy(zero_copy_only=False)
            - batch["h_qx"].to_numpy(zero_copy_only=False)
        )
        dy = (
            batch["p_qy"].to_numpy(zero_copy_only=False)
            - batch["h_qy"].to_numpy(zero_copy_only=False)
        )
        pi = batch["p_id"].to_numpy(zero_copy_only=False)
        hi = batch["h_id"].to_numpy(zero_copy_only=False)
        keep = (pi < hi) & (dx * dx + dy * dy <= R * R)
        t = batch.filter(pa.array(keep))
        d2 = (
            t["p_qx"].to_numpy(zero_copy_only=False)
            - t["h_qx"].to_numpy(zero_copy_only=False)
        ) ** 2 + (
            t["p_qy"].to_numpy(zero_copy_only=False)
            - t["h_qy"].to_numpy(zero_copy_only=False)
        ) ** 2
        return pa.table(
            {
                "id_a": t["p_id"],
                "id_b": t["h_id"],
                "d2": pa.array(d2.astype(np.int64)),
            }
        )

    return j.map_batches(dist_keep, batch_format="pyarrow")


def late_events_watermark(sf_dir: str):
    """Event-time watermark / late-data accounting (the streaming
    semantics every windowed aggregation needs): consuming events in
    ARRIVAL order (event_id), the watermark is the running max event
    time over all STRICTLY EARLIER arrivals minus a 600 s allowed
    lateness; an event is late iff its own timestamp is already behind
    the watermark.  Output: the late rows with integer lateness
    seconds.  Scale shape: the same two-phase distributed scan as the
    packing prefix-sum — per-block running max + an exclusive
    cross-block max carry, no single-block funnel."""
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "ts"])
    LATENESS_US = 600 * 1_000_000

    # arrival order is a deterministic SCRAMBLE of event_id (bijective
    # for ids < 2^32): the driver tables emit events in event-time
    # order, so id-order arrival would make lateness vacuously zero —
    # the scramble models a crawler's out-of-order delivery and is
    # reproducible as the identical expression in the oracle
    def arrival(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        return batch.append_column(
            "__arr", pa.array((ids * _GEO_A) % _GEO_M)
        )

    sorted_ds = ds.map_batches(
        arrival, batch_format="pyarrow"
    ).sort("__arr").materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "first_order": pa.array([], pa.int64()),
                    "block_max": pa.array([], pa.int64()),
                }
            )
        order = batch["__arr"].to_numpy(zero_copy_only=False)
        tsv = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "first_order": pa.array([np.int64(order[0])]),
                "block_max": pa.array([np.int64(tsv.max())]),
            }
        )

    summaries = sorted_ds.map_batches(
        block_summary, batch_size=None, batch_format="pyarrow"
    ).to_pandas().sort_values("first_order", ignore_index=True)
    firsts = summaries["first_order"].to_numpy().astype(np.int64)
    bmax = summaries["block_max"].to_numpy().astype(np.int64)
    # exclusive running max across blocks (carry into each block); the
    # no-predecessor sentinel is min+LATENESS so wm = min (never wraps
    # below int64 min) and the stream's first row can never flag late
    carry = np.empty_like(bmax)
    carry[0] = np.iinfo(np.int64).min + LATENESS_US
    if bmax.size > 1:
        np.maximum.accumulate(bmax[:-1], out=bmax[:-1])
        carry[1:] = bmax[:-1]
    bc = ray.put((firsts, carry))

    def flag_late(batch: pa.Table) -> pa.Table:
        import ray as _ray

        fo = bc if isinstance(bc, tuple) else _ray.get(bc)
        f, c = fo
        order = batch["__arr"].to_numpy(zero_copy_only=False)
        tsv = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        bi = np.searchsorted(f, order[0], side="right") - 1
        run = np.empty(tsv.size, dtype=np.int64)
        run[0] = c[bi]
        if tsv.size > 1:
            np.maximum.accumulate(tsv[:-1], out=run[1:])
            np.maximum(run[1:], c[bi], out=run[1:])
        wm = run - LATENESS_US
        late = tsv < wm
        t = batch.filter(pa.array(late))
        lateness = ((wm - tsv)[late] // 1_000_000).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "lateness_sec": pa.array(lateness),
            }
        )

    return sorted_ds.map_batches(
        flag_late, batch_size=None, batch_format="pyarrow"
    )


def q4_priority_exists(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join: count orders per priority that
    have at least one line item shipped more than 30 days after the
    order date.  The semi-join side carries only the qualifying
    DISTINCT orderkeys (hash-bounded), never line rows — the canonical
    decorrelated-EXISTS plan."""
    from geodata_ray.stages.relational import (
        grouped_aggregate,
        native_join,
    )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"]
    )
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    lk = grouped_aggregate(
        li, ["l_orderkey"], [("l_shipdate", "max", "max_ship")],
        coalesce=0,  # orderkey is high-cardinality: partials are not
        # small, so the coalesce repartition only adds an exchange
    ).materialize()  # one row per DISTINCT order; count + pull reuse it
    # bound-switched join (the repo's standard pattern): the per-order
    # max-ship table is one row per DISTINCT order — at gate/bench
    # scales a few MB, so broadcast beats a two-sided hash exchange by
    # ~5x; past the bound fall back to the native hash join
    n_keys = lk.count()
    if n_keys <= 5_000_000:
        lk_tbl = pa.Table.from_pandas(
            lk.to_pandas(), preserve_index=False
        ).rename_columns(["o_orderkey", "max_ship"])
        j = broadcast_join(orders, lk_tbl, ["o_orderkey"])
    else:
        j = native_join(
            orders, lk, on="o_orderkey", right_on="l_orderkey",
            num_partitions=16,
        )

    def qual(batch: pa.Table) -> pa.Table:
        od = (
            batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ms = (
            batch["max_ship"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = ms > od + np.int64(30) * 86_400_000_000
        return pa.table(
            {"o_orderpriority": batch["o_orderpriority"]}
        ).filter(pa.array(keep))

    return grouped_aggregate(
        j.map_batches(qual, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("o_orderpriority", "count", "order_count")],
    )


def q10_returned_revenue(sf_dir: str):
    """TPC-H Q10-shaped returned-item revenue: customer x orders x
    lineitem x nation, returnflag = 'R', revenue = extendedprice *
    (1 - discount) in EXACT integer fixed point (price cents x
    discount basis points -> 10^-6 currency units), grouped by
    nation.  One native hash join chain with the small nation side
    broadcast."""
    import ray

    from geodata_ray.stages.relational import (
        broadcast_join,
        grouped_aggregate,
        native_join,
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    import pyarrow.parquet as pq

    # key renamed to the big side's name (broadcast_join equi-keys)
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "n_name"])

    def ret(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = _rev_micro_np(t)  # 10^-6 currency units, exact int64
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_micro": pa.array(rev)}
        )

    r = li.map_batches(ret, batch_format="pyarrow")
    jo = native_join(
        r, orders, on="l_orderkey", right_on="o_orderkey",
        num_partitions=16,
    )
    jc = native_join(
        jo.select_columns(["o_custkey", "rev_micro"]), cust,
        on="o_custkey", right_on="c_custkey", num_partitions=16,
    )
    jn = broadcast_join(
        jc.select_columns(["c_nationkey", "rev_micro"]), nation,
        ["c_nationkey"],
    )
    return grouped_aggregate(
        jn.select_columns(["n_name", "rev_micro"]),
        ["n_name"],
        [("rev_micro", "sum", "revenue_micro"),
         ("rev_micro", "count", "n_items")],
    )


def mutual_links_hosts(sf_dir: str):
    """Reciprocal-edge detection on the derived host link graph (the
    link-farm / mutual-citation signal): directed edges (u, v) from
    the documents link generator, answer = distinct pairs linked in
    BOTH directions (u < v).  Plan: distinct directed edges (packed
    tree distinct), then one self-equi-join realized as a packed-key
    membership test against the broadcast reversed edge set — bounded
    by the distinct edge count, zero extra shuffle."""
    import ray
    import ray.data as rd

    from geodata_ray.stages.graphcc import distinct_edges_packed

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        u = ids % 97
        # two asymmetric link streams so reciprocity is non-trivial
        v1 = (u * 3 + ids % 7 + 1) % 97
        v2 = (u * 5 + ids % 11 + 2) % 97
        uu = np.concatenate([u, u])
        vv = np.concatenate([v1, v2])
        ok = uu != vv
        return pa.table(
            {"u": pa.array(uu[ok]), "v": pa.array(vv[ok])}
        )

    e = distinct_edges_packed(
        ds.map_batches(edges, batch_format="pyarrow")
    ).materialize()

    fwd = pa.concat_tables(ray.get(e.to_arrow_refs()))
    uv = (
        fwd["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        << np.int64(32)
    ) | fwd["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    rev_ref = ray.put(np.sort(uv))

    def mutual(batch: pa.Table) -> pa.Table:
        import ray as _ray

        rev = rev_ref if isinstance(rev_ref, np.ndarray) else _ray.get(
            rev_ref
        )
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        vu = (v << np.int64(32)) | u
        pos = np.searchsorted(rev, vu)
        pos = np.minimum(pos, max(rev.size - 1, 0))
        has = rev.size > 0
        hit = (rev[pos] == vu) if has else np.zeros(u.size, bool)
        keep = hit & (u < v)  # emit each mutual pair once
        t = batch.filter(pa.array(keep))
        return pa.table({"u": t["u"], "v": t["v"]})

    return e.map_batches(mutual, batch_format="pyarrow")


# seventh wave (round 5): interval coverage, weighted SSSP, seasonal
# anomalies, weighted reservoir-free sampling, activity bitmaps,
# largest-remainder budget apportionment.


def interval_coverage_users(sf_dir: str):
    """Per-user covered time: the union length of half-open activity
    intervals [ts, ts+300 s) — "active seconds" accounting, the keyed
    interval-union primitive (gaps-and-islands).  Exact int64
    epoch-microseconds end to end; one bounded-bucket exchange
    (``interval_union_length``), raw rows shuffle once, no per-key
    Python."""
    from geodata_ray.stages.windows import interval_union_length

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def iv(batch: pa.Table) -> pa.Table:
        s = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "start_us": s,
                "end_us": pc.add(s, pa.scalar(300_000_000, pa.int64())),
            }
        )

    out = interval_union_length(
        ds.map_batches(iv, batch_format="pyarrow"), key_col="user_id"
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": batch["user_id"], "covered_us": batch["covered"]}
        )

    return out.map_batches(rename, batch_format="pyarrow")


def sssp_hosts(sf_dir: str):
    """Weighted single-source shortest paths over the derived host
    link graph (crawl-cost distances from host 0): the same directed
    edge generator as ``mutual_links_hosts`` plus a deterministic
    integer weight 1 + (u*7 + v*13) % 9, relaxed to convergence by the
    distributed Bellman-Ford stage.  Both engines apply the identical
    path-cost cutoff (< 150) — with non-negative weights every prefix
    of a sub-cutoff shortest path is itself sub-cutoff, so the
    recursive-CTE oracle's bounded enumeration is exact."""
    from geodata_ray.stages.graphcc import distinct_edges_packed, sssp

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        u = ids % 97
        v1 = (u * 3 + ids % 7 + 1) % 97
        v2 = (u * 5 + ids % 11 + 2) % 97
        uu = np.concatenate([u, u])
        vv = np.concatenate([v1, v2])
        ok = uu != vv
        return pa.table({"u": pa.array(uu[ok]), "v": pa.array(vv[ok])})

    e = distinct_edges_packed(ds.map_batches(edges, batch_format="pyarrow"))

    def weigh(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "w", pa.array(1 + (u * 7 + v * 13) % 9)
        )

    dist = sssp(
        e.map_batches(weigh, batch_format="pyarrow"), 0, max_rounds=160
    )
    return dist.filter(expr="dist < 150")


def seasonal_anomaly_events(sf_dir: str):
    """Seasonal count anomalies: bucket events by (type, day, hour),
    baseline each (type, hour-of-day) slot across the days it appears
    in, flag buckets whose count deviates from the slot mean by more
    than 3 sigma.  EXACT integer predicate — (n*x - S)^2 > 9*(n*SS -
    S^2) clears the division — with an explicit overflow guard, same
    family as ``outlier_events_zscore``.  Scale shape: counts
    pre-combine inside blocks, so both exchanges carry only the
    bounded (type x day x hour) bucket table; raw rows never
    shuffle."""
    from geodata_ray.stages.relational import (
        broadcast_join,
        grouped_aggregate,
    )

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def bucket(batch: pa.Table) -> pa.Table:
        us = (
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day_idx": pa.array(us // 86_400_000_000),
                "hour": pa.array((us // 3_600_000_000) % 24),
            }
        )

    b = grouped_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "day_idx", "hour"],
        [("event_type", "count", "x")],
    ).materialize()

    def sq(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        if x.size and int(x.max()) > 3_037_000_499:  # isqrt(2^63 - 1)
            raise OverflowError(
                "seasonal_anomaly_events: bucket count too large for "
                "exact int64 moments"
            )
        return batch.append_column("xx", pa.array(x * x))

    m = grouped_aggregate(
        b.map_batches(sq, batch_format="pyarrow"),
        ["event_type", "hour"],
        [("x", "count", "n"), ("x", "sum", "s"), ("xx", "sum", "ss")],
    ).to_pandas()  # bounded: event types x 24 hour slots
    joined = broadcast_join(b, m, ["event_type", "hour"])

    def flag(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        ss = batch["ss"].to_numpy(zero_copy_only=False).astype(np.int64)
        lhs = n * x - s
        keep = (n >= 3) & (lhs * lhs > 9 * (n * ss - s * s))
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "event_type": t["event_type"],
                "day_idx": t["day_idx"],
                "hour": t["hour"],
                "n_events": t["x"],
            }
        )

    return joined.map_batches(flag, batch_format="pyarrow")


def weighted_sample_events(sf_dir: str):
    """Weighted sample without replacement, reservoir-free: each row
    draws a deterministic priority ``(splitmix64(event_id) >> 1) //
    w`` (integer Efraimidis-Spirakis — heavier w, smaller expected
    priority) with weight ``w = ((cents % 1000) + 1000) % 1000 + 1``,
    and the k=100 smallest (priority, event_id) win via the bounded
    ``bottom_k`` partial-then-merge — no global sort, only k rows per
    block ever move."""
    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.skew import bottom_k

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def prio(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        cents = (
            pc.cast(
                pc.round(
                    pc.multiply(pc.cast(batch["value"], pa.float64()), 100.0)
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        w = ((cents % 1000) + 1000) % 1000 + 1
        u = (splitmix64(ids) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "w": pa.array(w),
                "priority": pa.array(u // w),
            }
        )

    return bottom_k(
        ds.map_batches(prio, batch_format="pyarrow"),
        ["priority", "event_id"],
        100,
    )


def activity_bitmap_users(sf_dir: str):
    """Per-user day-of-month activity bitmap: bit (d-1) set iff the
    user has an event on calendar day d, plus the active-day count —
    the roaring-bitmap-style presence encoding, exactly reproducible
    in SQL because distinct day bits make bitwise-OR equal to SUM of
    distinct powers.  Two pre-combined exchanges, both bounded by
    users x 31."""
    from geodata_ray.stages.relational import grouped_aggregate

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def dom(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "dom": pc.day(batch["ts"].cast(pa.timestamp("us"))).cast(
                    pa.int64()
                ),
            }
        )

    distinct = grouped_aggregate(
        ds.map_batches(dom, batch_format="pyarrow"),
        ["user_id", "dom"],
        [("dom", "count", "__n")],
    )

    def pw(batch: pa.Table) -> pa.Table:
        d = batch["dom"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "p": pa.array(np.int64(1) << (d - 1)),
            }
        )

    return grouped_aggregate(
        distinct.map_batches(pw, batch_format="pyarrow"),
        ["user_id"],
        [("p", "sum", "bitmap"), ("p", "count", "active_days")],
    )


def apportion_crawl_budget(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a fixed crawl
    budget B=1,000,000 across hosts proportional to document counts:
    exact integer quotas ``docs*B // total`` plus one extra fetch for
    the hosts with the largest remainders — the canonical
    fair-allocation report.  Host counts pre-combine per block
    (bounded exchange); the final rank runs driver-side over the
    host-cardinality table (97 rows here; bounded by the host universe
    by construction, documented like the pagerank node table)."""
    from geodata_ray.stages.relational import grouped_aggregate

    B = 1_000_000
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def host(batch: pa.Table) -> pa.Table:
        return pa.table({"host": pa.array(batch["doc_id"].to_numpy() % 97)})

    counts = grouped_aggregate(
        ds.map_batches(host, batch_format="pyarrow"),
        ["host"],
        [("host", "count", "docs")],
    ).to_pandas()

    h = counts["host"].to_numpy().astype(np.int64)
    docs = counts["docs"].to_numpy().astype(np.int64)
    total = int(docs.sum())
    base = docs * B // total
    rem = docs * B % total
    leftover = B - int(base.sum())
    order = np.lexsort((h, -rem))  # rem DESC, host ASC
    extra = np.zeros(h.size, dtype=np.int64)
    extra[order[:leftover]] = 1
    out = pa.table(
        {
            "host": pa.array(h),
            "docs": pa.array(docs),
            "budget": pa.array(base + extra),
        }
    )
    import ray.data as rd

    return rd.from_arrow(out)



# ---------------------------------------------------------------------------
# Eighth wave (round 5): OHLC bars, gap-filled timelines, three more
# TPC-H shapes, winnowing fingerprints, k-core, CUSUM change points
# ---------------------------------------------------------------------------


def ohlc_candles_events(sf_dir: str):
    """Per (event_type, hour) OHLC candlestick bars: open/close = the
    first/last value in (ts, event_id) order, high/low = max/min, all
    in exact cents — the time-bucket bar summarization with
    deterministic tie-breaks, so the result is independent of block
    order and parallelism.  One sort per block + one bounded partial
    exchange (stages/windows.py ``ohlc_candles``); open/close
    candidates carry their own (ts, tie) keys so partials merge
    exactly."""
    from geodata_ray.stages.windows import ohlc_candles

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pc.divide(ts_us, 3_600_000_000),
                "ts_us": ts_us,
                "event_id": batch["event_id"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.cast(batch["value"], pa.float64()), 100.0
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    return ohlc_candles(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_cols=["event_type", "hour"],
        ts_col="ts_us",
        tie_col="event_id",
        val_col="cents",
    )


def gapfill_hourly_events(sf_dir: str):
    """Gap-filled hourly event counts per type: every hour between the
    global min and max active hour appears, missing hours as EXPLICIT
    zero rows — time-series densification (the resample-with-fill the
    reference does daily, ``convert.py:151``, generalized to a
    distributed counting spine).  Counts pre-combine per block; the
    spine is a bounded post-aggregate artifact (guarded), never a
    join."""
    from geodata_ray.stages.windows import gapfill_hourly_counts

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    return gapfill_hourly_counts(ds, key_col="event_type", ts_col="ts")


def late_shipment_priority(sf_dir: str):
    """TPC-H Q12-style shipping-delay audit: lineitems shipped more
    than 90 days after their order date, counted per returnflag and
    split by order-priority class (URGENT/HIGH vs the rest) — the
    conditional-aggregation-over-a-join shape.  One hash exchange
    (native join on orderkey); the flags are vectorized int64 0/1
    columns pre-combined before the tiny final groupby."""
    from geodata_ray.stages.relational import native_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_returnflag"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = native_join(li, od, on="l_orderkey", right_on="o_orderkey")

    def flags(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        odt = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        late = pc.cast(
            pc.greater(pc.subtract(ship, odt), 90 * 86_400_000_000),
            pa.int64(),
        )
        high = pc.cast(
            pc.is_in(
                batch["o_orderpriority"],
                value_set=pa.array(["1-URGENT", "2-HIGH"]),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "high_late": pc.multiply(late, high),
                "low_late": pc.multiply(
                    late, pc.subtract(pa.scalar(1, pa.int64()), high)
                ),
            }
        )

    return grouped_aggregate(
        j.map_batches(flags, batch_format="pyarrow"),
        ["l_returnflag"],
        [
            ("high_late", "sum", "high_late_count"),
            ("low_late", "sum", "low_late_count"),
            ("high_late", "count", "n_lines"),
        ],
    )


def q18_large_orders(sf_dir: str):
    """TPC-H Q18 (large-volume orders): orders whose total lineitem
    quantity exceeds 200 units, enriched with customer name and order
    facts — the HAVING-filter-then-enrich shape.  The quantity
    aggregate pre-combines per block; the having filter shrinks the
    key set ~20x before any join; enrichment is one native join plus
    a broadcast of the small customer dimension."""
    from geodata_ray.stages.relational import native_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
            }
        )

    qsum = grouped_aggregate(
        li.map_batches(qty, batch_format="pyarrow"),
        ["l_orderkey"],
        [("qty", "sum", "sum_qty")],
    )
    big = qsum.map_batches(
        lambda b: b.filter(pc.greater(b["sum_qty"], 200)),
        batch_format="pyarrow",
    )
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])
    j = native_join(big, od, on="l_orderkey", right_on="o_orderkey")
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).rename_columns(["o_custkey", "c_name"])
    enriched = broadcast_join(j, cust, ["o_custkey"])

    def project(batch: pa.Table) -> pa.Table:
        # native_join consumed the right key column; l_orderkey IS the
        # orderkey after the equi-join
        return pa.table(
            {
                "c_name": batch["c_name"],
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["l_orderkey"],
                "o_orderdate_us": batch["o_orderdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "total_cents": pc.cast(
                    pc.round(pc.multiply(batch["o_totalprice"], 100.0)),
                    pa.int64(),
                ),
                "sum_qty": batch["sum_qty"],
            }
        )

    return enriched.map_batches(project, batch_format="pyarrow")


def q22_idle_customers(sf_dir: str):
    """TPC-H Q22 shape (global-scalar broadcast + anti join): rich
    customers — strictly above the average positive balance, decided
    by exact cross-multiplied integers ``cents * n > sum`` — with no
    order since 1999, grouped by nation.  The scalar (sum, n) pair is
    ONE tiny aggregate broadcast into the filter; the recent-buyer key
    set is bounded by the customer dimension and anti-joins without a
    shuffle."""
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["c_acctbal"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        t = pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
                "cents": c,
            }
        )
        return t.filter(pc.greater(t["cents"], 0))

    pos = cust.map_batches(cents, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    agg = pos.aggregate(Sum("cents"), Count())
    s, n = int(agg["sum(cents)"]), int(agg["count()"])

    rich = pos.map_batches(
        lambda b, s=s, n=n: b.filter(
            pc.greater(pc.multiply(b["cents"], pa.scalar(n, pa.int64())),
                       pa.scalar(s, pa.int64()))
        ),
        batch_format="pyarrow",
    )

    cutoff_us = int(
        (np.datetime64("1999-01-01T00:00:00", "us")
         - np.datetime64(0, "us")).astype(np.int64)
    )
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    recent = grouped_aggregate(
        od.map_batches(
            lambda b: pa.table(
                {"o_custkey": b["o_custkey"]}
            ).filter(
                pc.greater_equal(
                    b["o_orderdate"].cast(pa.timestamp("us"))
                    .cast(pa.int64()),
                    cutoff_us,
                )
            ),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        [("o_custkey", "count", "__n")],
    )
    recent_keys = recent.to_pandas()["o_custkey"].to_numpy()  # bounded
    idle = anti_join(rich, recent_keys, "c_custkey")
    return grouped_aggregate(
        idle,
        ["nationkey"],
        [("cents", "count", "n_customers"), ("cents", "sum", "total_cents")],
    )


def winnowing_docs(sf_dir: str):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken —
    the MOSS algorithm): k=8-byte-gram splitmix64 hashes over the
    lower-cased 200-char ASCII prefix, rightmost-min selection per
    w=4 window, distinct (pos, fp) per doc.  Zero shuffle, fully
    vectorized (one sliding-window argmin over all docs per batch);
    the oracle replays the identical hash + window arithmetic."""
    from geodata_ray.stages.textstats import winnowing_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(winnowing_fingerprints, batch_format="pyarrow")


def k_core_hosts(sf_dir: str):
    """k-core decomposition (k=21) of the symmetrized 97-node host
    link graph (same deterministic 3-out-link derivation as
    ``pagerank_hosts_docs``): iteratively peel nodes with induced
    degree < k — the density filter that isolates spam farms / link
    rings.  Edges stream every round with zero shuffle; only the
    bounded alive set broadcasts (stages/graphcc.py ``k_core``); the
    oracle unrolls the same 12 peels as chained CTEs."""
    from geodata_ray.stages.graphcc import k_core

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return k_core(
        ds.map_batches(_host_edges_map, batch_format="pyarrow"),
        k=21,
        max_rounds=12,
    )


def changepoint_users_events(sf_dir: str):
    """Per-user CUSUM change-point detection in exact integers: over
    the user's events in (ts, event_id) order with prefix sums c_i and
    total T, report the split i maximizing |n*c_i - i*T| (ties to the
    smallest i) — mean-shift detection with the normalizer cleared so
    the argmax is bit-identical across engines.  One keyed-bucket
    exchange; per bucket a lexsort + segment prefix sums + a lexsort
    argmax (stages/windows.py ``cusum_changepoint``)."""
    from geodata_ray.stages.windows import cusum_changepoint

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch["event_id"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.cast(batch["value"], pa.float64()), 100.0
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    return cusum_changepoint(
        ds.map_batches(prep, batch_format="pyarrow"), min_n=8
    )



# ---------------------------------------------------------------------------
# Ninth wave (round 5): cell compaction, RFM segmentation, PR-curve
# model eval, HITS hubs/authorities
# ---------------------------------------------------------------------------


def compact_cells_events(sf_dir: str):
    """Hierarchical cell-set compaction (the H3 ``compact`` op on the
    quad grid): the distinct res-4 event tiles, with every COMPLETE
    4-sibling group replaced by its parent down to res 2 — the
    covering-set shrink step that makes broadcast polygon covers 4-70x
    smaller at identical geometry.  Per level only the promoted parent
    set (shrinks 4x/level) materializes; kept cells never leave their
    blocks (stages/raster.py ``compact_cells``)."""
    from geodata_ray.stages.raster import compact_cells

    ds = _read(sf_dir, "events", columns=["event_id"])

    def tiles(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        return pa.table(
            {
                "cell": pa.array(
                    qcell.latlng_to_cell(
                        _derive_lat_np(ids), _derive_lon_np(ids), 4
                    )
                )
            }
        )

    return compact_cells(
        ds.map_batches(tiles, batch_format="pyarrow"), min_res=2
    )


def rfm_segments_users(sf_dir: str):
    """RFM segmentation: per user recency (days since last event,
    relative to the corpus max day), frequency (event count), monetary
    (exact cents sum), each scored 1-5 by the measure's own EXACT
    quintile boundaries (ceil-rank quantile_disc — no float
    percentile), segment = r*100 + f*10 + m.  NOTE r_score 5 = most
    STALE (scores are plain quintile buckets on all three measures).
    One keyed exchange builds the bounded user table (materialized
    once); boundaries broadcast; no per-row shuffle after that."""
    from geodata_ray.stages.relational import exact_int_quantiles

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(ts_us, 86_400_000_000),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.cast(batch["value"], pa.float64()), 100.0
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    per_user = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        [
            ("day", "max", "last_day"),
            ("day", "count", "frequency"),
            ("cents", "sum", "monetary_cents"),
        ],
    ).materialize()  # bounded by user cardinality; reused 5x below

    from ray.data.aggregate import Max

    maxday = int(per_user.aggregate(Max("last_day"))["max(last_day)"])

    def measures(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "recency_days": pc.subtract(
                    pa.scalar(maxday, pa.int64()), batch["last_day"]
                ),
                "frequency": batch["frequency"],
                "monetary_cents": batch["monetary_cents"],
            }
        )

    m = per_user.map_batches(measures, batch_format="pyarrow")
    qs = (0.2, 0.4, 0.6, 0.8)
    bounds = {
        col: np.asarray(exact_int_quantiles(m, col, qs), dtype=np.int64)
        for col in ("recency_days", "frequency", "monetary_cents")
    }

    def score(batch: pa.Table) -> pa.Table:
        out = {c: batch[c] for c in batch.column_names}
        sc = {}
        for col, short in (
            ("recency_days", "r"),
            ("frequency", "f"),
            ("monetary_cents", "m"),
        ):
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            sc[short] = (
                1 + (v[:, None] > bounds[col][None, :]).sum(axis=1)
            ).astype(np.int64)
            out[f"{short}_score"] = pa.array(sc[short])
        out["segment"] = pa.array(
            sc["r"] * 100 + sc["f"] * 10 + sc["m"]
        )
        return pa.table(out)

    return m.map_batches(score, batch_format="pyarrow")


_PR_THRESHOLDS = (-10000, 0, 5000, 10000, 15000, 20000, 30000, 40000,
                  50000)


def pr_curve_docs(sf_dir: str):
    """Model-eval precision/recall curve points: confusion counts
    (tp/fp/fn/tn) of the hashed-linear quality classifier against the
    ``lang == 'en'`` ground truth at 9 fixed score thresholds — the
    threshold-sweep evaluation every filtering-model deployment runs
    before picking its operating point.  One corpus scan emits 9
    partial rows per batch (vectorized outer compare); the only
    exchange groups 9 keys."""
    from geodata_ray.stages.textstats import classifier_score_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    th = np.asarray(_PR_THRESHOLDS, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        scored = classifier_score_batch(batch)  # preserves row order
        score = scored["score"].to_numpy(zero_copy_only=False)
        pos = pc.equal(batch["lang"], "en").to_numpy(
            zero_copy_only=False
        )
        pred = score[None, :] >= th[:, None]  # (9, n)
        tp = (pred & pos[None, :]).sum(axis=1)
        fp = (pred & ~pos[None, :]).sum(axis=1)
        fn = (~pred & pos[None, :]).sum(axis=1)
        tn = (~pred & ~pos[None, :]).sum(axis=1)
        return pa.table(
            {
                "threshold": pa.array(th),
                "tp": pa.array(tp.astype(np.int64)),
                "fp": pa.array(fp.astype(np.int64)),
                "fn": pa.array(fn.astype(np.int64)),
                "tn": pa.array(tn.astype(np.int64)),
            }
        )

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["threshold"],
        [
            ("tp", "sum", "tp"),
            ("fp", "sum", "fp"),
            ("fn", "sum", "fn"),
            ("tn", "sum", "tn"),
        ],
    )


def hits_hosts_docs(sf_dir: str):
    """HITS hubs-and-authorities over the same deterministic host link
    graph as ``pagerank_hosts_docs`` — one unnormalized
    mutual-reinforcement round in exact integers (hub = sum of
    in-degree over out-neighbors, auth = sum of hub over in-neighbors;
    normalization only rescales, so dropping it preserves the ranking
    AND bit-exactness).  Edges stream three times with zero shuffle;
    bounded score maps broadcast between passes
    (stages/graphcc.py ``hits_scores``)."""
    from geodata_ray.stages.graphcc import hits_scores

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return hits_scores(
        ds.map_batches(_host_edges_map, batch_format="pyarrow")
    )



# ---------------------------------------------------------------------------
# Tenth wave (round 5): MOSS match join, A/B readout, byte entropy,
# interval-stabbing concurrency
# ---------------------------------------------------------------------------


def winnowing_match_pairs(sf_dir: str):
    """MOSS-style local-overlap pairs: documents sharing >= 8 winnowing
    fingerprints (k=8, w=4 over the 200-char prefix, hot fingerprints
    in > 20 docs dropped as stopwords per the paper) — the match join
    the winnowing paper builds.  Fingerprint buckets fan out pairs
    vectorized with the max-df cut bounding expansion BY CONSTRUCTION
    (stages/textstats.py ``winnowing_pair_candidates``)."""
    from geodata_ray.stages.textstats import (
        winnowing_fingerprints,
        winnowing_pair_candidates,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    fps = ds.map_batches(winnowing_fingerprints, batch_format="pyarrow")
    return winnowing_pair_candidates(fps, min_shared=8, max_df=20)


def ab_test_events(sf_dir: str):
    """A/B experiment readout: users split by ``user_id % 2`` into
    control (0) and treatment (1); per event_type the EXACT integer
    moment triple (n, sum cents, sum cents^2) for each arm plus the
    cross-multiplied mean-difference numerator ``s1*n0 - s0*n1``
    (its SIGN is the float-free verdict on which arm's mean is
    higher).  One pre-combined grouped exchange; the per-type fold
    merges two bounded rows."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        cv = c.to_numpy(zero_copy_only=False)
        if cv.size and int(np.abs(cv).max()) > 3_037_000_499:
            raise ValueError(
                "ab_test_events: |cents| exceeds isqrt(int64 max); "
                "cents^2 would wrap"
            )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "variant": pc.cast(
                    pc.bit_wise_and(batch["user_id"], 1), pa.int64()
                ),
                "cents": c,
                "cents2": pa.array(cv * cv),
            }
        )

    arms = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "variant"],
        [
            ("cents", "count", "n"),
            ("cents", "sum", "s"),
            ("cents2", "sum", "ss"),
        ],
    )

    def fold(g: pa.Table) -> pa.Table:
        v = g["variant"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        ss = g["ss"].to_numpy(zero_copy_only=False)
        row = {"event_type": g["event_type"].take(pa.array([0]))}
        vals = {0: (0, 0, 0), 1: (0, 0, 0)}
        for i in range(v.size):
            vals[int(v[i])] = (int(n[i]), int(s[i]), int(ss[i]))
        (n0, s0, ss0), (n1, s1, ss1) = vals[0], vals[1]
        for name, val in (
            ("n_control", n0), ("sum_control", s0), ("ss_control", ss0),
            ("n_treat", n1), ("sum_treat", s1), ("ss_treat", ss1),
            ("mean_diff_num", s1 * n0 - s0 * n1),
        ):
            row[name] = pa.array([val], pa.int64())
        return pa.table(row)

    return arms.groupby("event_type").map_groups(
        fold, batch_format="pyarrow"
    )


def source_entropy_docs(sf_dir: str):
    """Per-source byte-distribution Shannon entropy in fixed-point
    qlog2 units — the compressibility / machine-generated-text
    detector, exact-integer end to end (stages/textstats.py
    ``source_byte_entropy``; same qlog2 domain as the LM and PMI
    operators, same recursive-CTE replay in the oracle).  ASCII docs
    only, by the LM kernel's byte-vs-codepoint contract."""
    from geodata_ray.stages.textstats import source_byte_entropy

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    return source_byte_entropy(ds)


def open_orders_daily(sf_dir: str):
    """Interval-stabbing concurrency count: how many orders are OPEN
    on each day a change happens, with an order open for 30 days from
    its order date — the difference-array technique (+1 at start, -1
    at end, running sum), which turns interval overlap counting into
    one bounded grouped sum + a prefix scan over the tiny day table.
    Emits only CHANGE days (the count is constant between them)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def deltas(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
            86_400_000_000,
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(np.concatenate([day, day + 30])),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(day.size, np.int64),
                            -np.ones(day.size, np.int64),
                        ]
                    )
                ),
            }
        )

    net = grouped_aggregate(
        ds.map_batches(deltas, batch_format="pyarrow"),
        ["day"],
        [("delta", "sum", "net")],
    )

    def scan(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        return pa.table(
            {
                "day": t["day"],
                "open_orders": pa.array(
                    np.cumsum(
                        t["net"].to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    # the day table is bounded by the calendar span (one row per
    # distinct change day), so the prefix scan runs in a single block
    return net.repartition(1).map_batches(
        scan, batch_format="pyarrow", batch_size=None
    )



# ---------------------------------------------------------------------------
# Eleventh wave (round 5): late-interaction retrieval, scalar
# quantization audit
# ---------------------------------------------------------------------------


def maxsim_retrieval_embeddings(sf_dir: str):
    """ColBERT-style late-interaction retrieval (MaxSim): treat each
    run of 8 consecutive vec_ids as one multi-vector document and the
    4 vectors with vec_id < 4 as the query tokens; score(doc) =
    sum over query tokens of the MAX dot product against the doc's
    token vectors.  All dots run on 2^20-scaled INTEGER embeddings
    (float32 -> float64 -> FLOOR is bit-identical in numpy and SQL;
    ROUND is not — float32 products land on exact .5 ties
    constantly, and numpy rounds half-even where SQL rounds
    half-away,
    and integer dots make max/sum order-free), so the scores
    hash-match exactly — no float ranking anywhere.

    Shape: the 4x64 quantized query broadcasts; per batch one int64
    matmul + per-(doc, token) partial max; two bounded exchanges
    (grouped max, then the per-doc sum of 4 maxes)."""
    import pyarrow.parquet as pq

    from geodata_ray.stages.dedup import _as_matrix

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 4)],  # prune at the read: the query
        # side is 4 rows, never the whole vector table
    )
    Q = np.floor(
        _as_matrix(qt["embedding"]).astype(np.float64) * 1048576.0
    ).astype(np.int64)  # (4, 64)
    qids = qt["vec_id"].to_numpy().astype(np.int64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def dots(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc": pa.array([], pa.int64()), "qt": pa.array([], pa.int64()), "dot": pa.array([], pa.int64())})
        X = np.floor(
            _as_matrix(batch["embedding"]).astype(np.float64) * 1048576.0
        ).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        d = X @ Q.T  # (n, 4) exact int64
        doc = ids // 8
        n = ids.size
        return pa.table(
            {
                "doc": pa.array(np.repeat(doc, Q.shape[0])),
                "qt": pa.array(np.tile(qids, n)),
                "dot": pa.array(d.ravel()),
            }
        )

    per_token = grouped_aggregate(
        ds.map_batches(dots, batch_format="pyarrow"),
        ["doc", "qt"],
        [("dot", "max", "m")],
    )
    return grouped_aggregate(
        per_token, ["doc"], [("m", "sum", "maxsim")]
    )


def sq8_quantize_embeddings(sf_dir: str):
    """Scalar int8 quantization audit (the SQ8 compression every
    vector store applies before ANN): per-dimension global min/max ->
    8-bit code ``(x - min) * 255 // (max - min)`` -> integer
    reconstruction -> per-vector code checksum + max/total absolute
    reconstruction error.  Everything runs on 2^20-scaled integer
    embeddings, so codes and errors are exact and hash-match.

    Shape: pass 1 pre-combines per-dim min/max (64 keys); the 64x2
    stat table broadcasts; pass 2 quantizes per batch with zero
    shuffle."""
    from geodata_ray.stages.dedup import _as_matrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def dim_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"dim": pa.array([], pa.int64()), "lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())})
        X = np.floor(
            _as_matrix(batch["embedding"]).astype(np.float64) * 1048576.0
        ).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(X.shape[1], dtype=np.int64)),
                "lo": pa.array(X.min(axis=0)),
                "hi": pa.array(X.max(axis=0)),
            }
        )

    stats = (
        grouped_aggregate(
            ds.map_batches(dim_partial, batch_format="pyarrow"),
            ["dim"],
            [("lo", "min", "lo"), ("hi", "max", "hi")],
        )
        .to_pandas()
        .sort_values("dim", ignore_index=True)
    )
    lo = stats["lo"].to_numpy().astype(np.int64)
    rng = np.maximum(
        stats["hi"].to_numpy().astype(np.int64) - lo, 1
    )
    weights = np.arange(1, lo.size + 1, dtype=np.int64)

    def quantize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "code_checksum": pa.array([], pa.int64()), "max_err": pa.array([], pa.int64()), "sum_err": pa.array([], pa.int64())})
        X = np.floor(
            _as_matrix(batch["embedding"]).astype(np.float64) * 1048576.0
        ).astype(np.int64)
        code = (X - lo[None, :]) * 255 // rng[None, :]
        recon = lo[None, :] + code * rng[None, :] // 255
        err = np.abs(X - recon)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "code_checksum": pa.array(
                    (code * weights[None, :]).sum(axis=1)
                ),
                "max_err": pa.array(err.max(axis=1)),
                "sum_err": pa.array(err.sum(axis=1)),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")



# ---------------------------------------------------------------------------
# Twelfth wave (round 5): box rasterization with an oracle, k-anonymity
# audit, k-fold split audit
# ---------------------------------------------------------------------------


def box_cover_cells_nations(sf_dir: str):
    """Vector -> raster cover with a full SQL oracle: one axis-aligned
    box per nation (deterministically derived), rasterized to EVERY
    res-5 cell it intersects — for an axis-aligned box the cover is
    exactly the row/col index ranges of its corners, so the same floor
    arithmetic runs in numpy and SQL and the general
    ``polygon_cover_cells`` path (golden-tested geometry) gains an
    oracle-audited sibling.  Zero shuffle; output bounded by
    boxes x cover size."""
    ds = _read(sf_dir, "nation", columns=["n_nationkey"])

    def cover(batch: pa.Table) -> pa.Table:
        nk = batch["n_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lat_c = np.clip(_derive_lat_np(nk), -80.0, 80.0)
        lon_c = np.clip(_derive_lon_np(nk), -170.0, 170.0)
        hh = (2 + nk % 4).astype(np.float64)
        hw = (3 + nk % 5).astype(np.float64)
        nlat, nlon = 128.0, 256.0  # res 5 grid
        row0 = np.floor((lat_c - hh + 90.0) / 180.0 * nlat).astype(
            np.int64
        )
        row1 = np.floor((lat_c + hh + 90.0) / 180.0 * nlat).astype(
            np.int64
        )
        col0 = np.floor((lon_c - hw + 180.0) / 360.0 * nlon).astype(
            np.int64
        )
        col1 = np.floor((lon_c + hw + 180.0) / 360.0 * nlon).astype(
            np.int64
        )
        row0, row1 = np.clip(row0, 0, 127), np.clip(row1, 0, 127)
        col0, col1 = np.clip(col0, 0, 255), np.clip(col1, 0, 255)
        nr, nc = row1 - row0 + 1, col1 - col0 + 1
        per_box = nr * nc
        box = np.repeat(np.arange(nk.size), per_box)
        local = (
            np.arange(int(per_box.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(per_box)[:-1]]),
                        per_box)
        )
        r = row0[box] + local // nc[box]
        c = col0[box] + local % nc[box]
        cell = (
            (np.int64(5) << np.int64(58)) | (r << np.int64(29)) | c
        )
        return pa.table(
            {
                "nationkey": pa.array(nk[box]),
                "cell": pa.array(cell),
            }
        )

    return ds.map_batches(cover, batch_format="pyarrow")


def k_anonymity_events(sf_dir: str):
    """k-anonymity audit (k=5): quasi-identifier groups — (event_type,
    hour-of-day, value band of 10 currency units) — small enough to
    re-identify a user, reported with their sizes.  The structural
    privacy check that complements content-level PII redaction.  One
    pre-combined grouped exchange; the violation filter is a
    vectorized post-map."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def qid(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        hod = (
            ts_us.to_numpy(zero_copy_only=False) // 3_600_000_000
        ) % 24
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour_of_day": pa.array(hod.astype(np.int64)),
                "band": pa.array(
                    np.floor_divide(cents, 1000).astype(np.int64)
                ),
            }
        )

    groups = grouped_aggregate(
        ds.map_batches(qid, batch_format="pyarrow"),
        ["event_type", "hour_of_day", "band"],
        [("band", "count", "n")],
    )
    return groups.map_batches(
        lambda t: t.filter(pc.less(t["n"], 5)), batch_format="pyarrow"
    )


def kfold_split_docs(sf_dir: str):
    """Deterministic k-fold split audit: fold = splitmix64(doc_id) % 5,
    reported as per-(fold, lang) doc counts + total chars — the
    stratification check a training pipeline runs before trusting a
    hash split.  Zero-shuffle fold assignment (pure hash of the id);
    one bounded grouped exchange."""
    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"])

    def fold(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        f = (splitmix64(ids.astype(np.uint64))
             % np.uint64(5)).astype(np.int64)
        return pa.table(
            {
                "fold": pa.array(f),
                "lang": batch["lang"],
                "n_chars": batch["n_chars"],
            }
        )

    return grouped_aggregate(
        ds.map_batches(fold, batch_format="pyarrow"),
        ["fold", "lang"],
        [("n_chars", "count", "n_docs"), ("n_chars", "sum", "total_chars")],
    )



# ---------------------------------------------------------------------------
# Thirteenth wave (round 5): stream-disorder measurement, ANN recall
# audit
# ---------------------------------------------------------------------------


def reorder_depth_events(sf_dir: str):
    """Stream-disorder measurement: per user, the maximum REORDER
    DEPTH — how many positions an event arrived ahead of its
    event-time rank (arrival order proxied by event_id, the ingest
    sequence) — the statistic that sizes a streaming reorder buffer /
    watermark lateness budget before deploying an event-time pipeline.
    One keyed-bucket exchange; per key two lexsort rank passes, all
    vectorized."""
    from geodata_ray.stages.windows import _tag_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(
                    pa.int64()
                ),
                "event_id": batch["event_id"],
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "max_reorder_depth": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # arrival ranks: sort by (user, event_id)
        oa = np.lexsort((eid, u))
        # event-time ranks: sort by (user, ts, event_id)
        ot = np.lexsort((eid, ts, u))
        n = u.size
        ra = np.empty(n, dtype=np.int64)
        rt = np.empty(n, dtype=np.int64)
        ra[oa] = np.arange(n)
        rt[ot] = np.arange(n)
        # both lexsorts share the primary key, so each key's segment
        # base is identical in the two orders and cancels: the global
        # rank difference IS the per-key reorder depth
        depth = ra - rt
        order = np.argsort(u, kind="stable")
        us, ds_ = u[order], depth[order]
        kstart = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        return pa.table(
            {
                "user_id": pa.array(us[kstart].astype(np.int64)),
                "max_reorder_depth": pa.array(
                    np.maximum.reduceat(ds_, kstart).astype(np.int64)
                ),
                "n": pa.array(
                    np.diff(np.append(kstart, us.size)).astype(np.int64)
                ),
            }
        )

    return (
        _tag_bucket(
            ds.map_batches(prep, batch_format="pyarrow"), "user_id", 32
        )
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        )
    )


def ann_recall_embeddings(sf_dir: str):
    """ANN quality audit: recall@5 of the IVF-pruned index against the
    exact brute-force top-5 for the same 5 queries — the acceptance
    check every vector-store deployment runs before trusting an
    approximate index.  Both sides are existing audited operators; the
    intersection runs driver-side over the two BOUNDED top-k tables
    (Q x k rows each, the same bounded-fusion shape as RRF)."""
    exact = ann_topk_embeddings(sf_dir).to_pandas()
    approx = ivf_topk_embeddings(sf_dir).to_pandas()
    import pandas as pd

    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    ap = approx.groupby("query_id")["neighbor_id"].apply(set)
    qids = sorted(ex.index)
    hits = [len(ex[q] & ap.get(q, set())) for q in qids]
    out = pa.table(
        {
            "query_id": pa.array(np.asarray(qids, dtype=np.int64)),
            "n_hits": pa.array(np.asarray(hits, dtype=np.int64)),
            "recall_bp": pa.array(
                (np.asarray(hits, dtype=np.int64) * 10000) // 5
            ),
        }
    )
    import ray.data as rd

    return rd.from_arrow(out)



# ---------------------------------------------------------------------------
# Fourteenth wave (round 5): graph statistics, burst detection,
# ratio-to-report, vocabulary growth
# ---------------------------------------------------------------------------


def avg_neighbor_degree_hosts(sf_dir: str):
    """Average-neighbor-degree per host (the assortativity ingredient)
    over the shared 97-node link graph, as an EXACT integer ratio pair
    ``(sum of out-neighbors' out-degrees, out-degree)`` — no float
    mean, so the result hash-matches.  Degrees are a bounded map
    broadcast; edges stream twice with zero shuffle."""
    import ray
    from geodata_ray.stages.graphcc import distinct_edges_packed

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    e = distinct_edges_packed(
        ds.map_batches(_host_edges_map, batch_format="pyarrow")
    )

    def outdeg_partial(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        uu, cc = np.unique(u, return_counts=True)
        return pa.table({"node": pa.array(uu.astype(np.int64)),
                         "d": pa.array(cc.astype(np.int64))})

    deg = e.map_batches(outdeg_partial, batch_format="pyarrow")         .groupby("node").sum("d").to_pandas()  # bounded by node count
    nodes = deg["node"].to_numpy().astype(np.int64)
    vals = deg["sum(d)"].to_numpy().astype(np.int64)
    o = np.argsort(nodes)
    nodes, vals = nodes[o], vals[o]
    nref, vref = ray.put(nodes), ray.put(vals)

    def gather(batch: pa.Table) -> pa.Table:
        from geodata_ray.stages.graphcc import sorted_map_lookup

        nd, vv = ray.get(nref), ray.get(vref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        nbr = sorted_map_lookup(nd, vv, v, default=0)
        return pa.table(
            {"node": pa.array(u.astype(np.int64)),
             "nbr_deg": pa.array(nbr.astype(np.int64))}
        )

    return grouped_aggregate(
        e.map_batches(gather, batch_format="pyarrow"),
        ["node"],
        [("nbr_deg", "sum", "nbr_deg_sum"),
         ("nbr_deg", "count", "out_degree")],
    )


def peak_rate_events(sf_dir: str):
    """Burst detection readout: each user's PEAK 1-hour event rate —
    the max over rows of the trailing-window count (RANGE 1 HOUR
    PRECEDING semantics) — what a rate limiter or anomaly monitor
    alerts on.  Reuses the shared trailing-window kernel with the key
    carried through, then one bounded grouped max."""
    from geodata_ray.stages.windows import trailing_window_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    per_row = trailing_window_counts(
        ds, key_col="user_id", ts_col="ts", tie_col="event_id",
        window_us=3_600_000_000, keep_key=True,
    )
    return grouped_aggregate(
        per_row.select_columns(["user_id", "n_trailing"]),
        ["user_id"],
        [("n_trailing", "max", "peak_1h"),
         ("n_trailing", "count", "n")],
    )


def revenue_share_lineitem(sf_dir: str):
    """Ratio-to-report: each (returnflag, linestatus) group's share of
    total revenue in EXACT basis points — ``share_bp = s * 10000 //
    total`` with both operands exact cents, so no float division ever
    happens.  One pre-combined grouped exchange; the total is the sum
    of the bounded group sums (broadcast scalar)."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "rev": pa.array(price * (1.0 - disc)),
            }
        )

    # money convention (module header): float SUM then ONE round —
    # the true group total is a 2-decimal value, accumulated float
    # error ~1e-9 << 0.5, so the rounded cents are engine-independent
    groups = _scale_to_int(
        grouped_aggregate(
            li.map_batches(rev, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            [("rev", "sum", "revenue_cents"), ("rev", "count", "n_lines")],
        ),
        {"revenue_cents": 100},
    ).materialize()  # bounded: one row per (flag, status)

    from ray.data.aggregate import Sum

    total = int(
        groups.aggregate(Sum("revenue_cents"))["sum(revenue_cents)"]
    )

    def share(batch: pa.Table) -> pa.Table:
        s = batch["revenue_cents"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "share_bp", pa.array((s * 10000 // total).astype(np.int64))
        )

    return groups.map_batches(share, batch_format="pyarrow")


def vocab_growth_docs(sf_dir: str):
    """Vocabulary growth curve (Heaps-law audit): the corpus in 10
    doc-id deciles, reporting how many NEW distinct BIGRAMS each
    decile introduces — the saturation check before sizing a tokenizer
    vocab (bigrams, not unigrams: the synthetic vocabulary saturates
    unigrams in decile 0, which would make the curve a single row).
    Bigram -> min doc_id is one pre-combined exchange; the decile
    bucketing is integer arithmetic against the broadcast max id."""
    from geodata_ray.stages.textstats import _ngram_window_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bi(batch: pa.Table) -> pa.Table:
        ids, grams = _ngram_window_batch(
            batch, id_col="doc_id", text_col="text", n=2
        )
        return pa.table(
            {"doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
             "term": grams}
        )

    first = grouped_aggregate(
        ds.map_batches(bi, batch_format="pyarrow"),
        ["term"],
        [("doc_id", "min", "first_doc")],
    )

    import pyarrow.parquet as pq

    # scalar max from row-group statistics — zero data read (the
    # whole-column driver read is the waste class review finding #4
    # fixed for maxsim)
    md = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    idx = md.schema.names.index("doc_id")
    max_id = max(
        md.row_group(i).column(idx).statistics.max
        for i in range(md.num_row_groups)
    )

    def decile(batch: pa.Table) -> pa.Table:
        f = batch["first_doc"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"decile": pa.array((f * 10 // (max_id + 1)).astype(
                np.int64))}
        )

    return grouped_aggregate(
        first.map_batches(decile, batch_format="pyarrow"),
        ["decile"],
        [("decile", "count", "new_terms")],
    )



def dau_mau_daily_events(sf_dir: str):
    """Engagement metrics: per active day, DAU (distinct users) and
    trailing-30-day MAU — the stickiness pair (DAU/MAU is the ratio;
    both sides exact ints so the report hash-matches).  The windowed
    COUNT DISTINCT every SQL engine struggles with is restated as
    interval stabbing: a user covers day d iff d falls in the union of
    their [active_day, active_day+29] intervals, so per-user merged
    intervals become +1/-1 deltas and MAU(d) is one running sum — two
    pre-combined exchanges plus a bounded day-table scan, NO per-day
    distinct pass."""
    import ray.data as rd

    from geodata_ray.stages.windows import _tag_bucket

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(ts_us, 86_400_000_000),
            }
        )

    ud = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "day"],
        [("day", "count", "__n")],
    )

    dau = grouped_aggregate(
        ud.select_columns(["day"]), ["day"], [("day", "count", "dau")]
    )

    def deltas(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        n = u.size
        if n == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "delta": pa.array([], pa.int64())}
            )
        # merge each user's [day, day+29] intervals in one pass: a new
        # merged run starts at a user boundary or a gap > 29 days
        new = np.ones(n, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (d[1:] > d[:-1] + 29)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n) - 1
        s = d[starts]
        e = d[ends] + 29
        return pa.table(
            {
                "day": pa.array(np.concatenate([s, e + 1])),
                "delta": pa.array(
                    np.concatenate(
                        [np.ones(s.size, np.int64),
                         -np.ones(s.size, np.int64)]
                    )
                ),
            }
        )

    net = grouped_aggregate(
        _tag_bucket(ud.select_columns(["user_id", "day"]), "user_id", 32)
        .groupby("__b")
        .map_groups(
            lambda g: deltas(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        ),
        ["day"],
        [("delta", "sum", "net")],
    ).to_pandas()  # bounded: one row per coverage change day

    net = net.sort_values("day", ignore_index=True)
    tl_days = net["day"].to_numpy().astype(np.int64)
    tl_mau = np.cumsum(net["net"].to_numpy()).astype(np.int64)

    def attach(batch: pa.Table) -> pa.Table:
        d = batch["day"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(tl_days, d, side="right") - 1
        return pa.table(
            {
                "day": batch["day"],
                "dau": batch["dau"],
                "mau": pa.array(tl_mau[pos]),
            }
        )

    return dau.map_batches(attach, batch_format="pyarrow")



def activity_gini_users(sf_dir: str):
    """Activity concentration (Gini) over per-user event counts as an
    EXACT integer ratio: with counts sorted ascending (ties by
    user_id), ``gini_num = sum_i (2i - n - 1) * x_i`` and ``gini_den =
    n * total`` — the crawl-hotspot / load-skew report with no float
    division anywhere.  One pre-combined count exchange; the sorted
    fold runs over the bounded user table."""
    ds = _read(sf_dir, "events", columns=["user_id"])
    counts = grouped_aggregate(
        ds, ["user_id"], [("user_id", "count", "n_events")]
    )

    def fold(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        x = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((u, x))
        x = x[order]
        n = x.size
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(((2 * i - n - 1) * x).sum())
        return pa.table(
            {
                "n_users": pa.array([n], pa.int64()),
                "total_events": pa.array([int(x.sum())], pa.int64()),
                "gini_num": pa.array([num], pa.int64()),
                "gini_den": pa.array([n * int(x.sum())], pa.int64()),
            }
        )

    # the per-user count table is bounded; the fold is one block
    return counts.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def geo_mean_values_events(sf_dir: str):
    """Per-type GEOMETRIC mean of positive cents in the fixed-point
    qlog2 domain: ``(sum of qlog2(cents), count)`` per event_type —
    the multiplicative-aggregation primitive (rate compounding,
    log-normal summaries), exact-integer so it hash-matches; the
    fixed-point geometric mean itself is ``2^(sum/count/2^16)``
    driver-side.  One pre-combined exchange."""
    from geodata_ray.stages.lm import qlog2_fixed

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        keep = c > 0  # log of non-positive undefined; drop like SQL
        q = qlog2_fixed(c[keep].astype(np.uint64)).astype(np.int64)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table(
            {
                "event_type": et.filter(pa.array(keep)),
                "qlog": pa.array(q),
            }
        )

    return grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        [("qlog", "sum", "qlog_sum"), ("qlog", "count", "n_pos")],
    )


# ---------------------------------------------------------------------------
# Seventeenth wave: TPC-H completion (the remaining Q-shapes, adapted
# to the driver schema: no partsupp table, no commit/receipt dates).
# Every money aggregate is exact integer micro-units via _rev_micro_np.
# ---------------------------------------------------------------------------


def _nation_name_map(sf_dir: str) -> pa.Table:
    """(n_nationkey, n_name) as an Arrow table — tiny by contract
    (25 rows at every TPC-H scale)."""
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )


def _supplier_nation(sf_dir: str) -> pa.Table:
    """(s_suppkey, supp_nation) via an in-Arrow join — supplier is the
    classic small dimension side (10k rows/SF), broadcast not shuffled."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    j = sup.join(_nation_name_map(sf_dir), keys=["s_nationkey"],
                 right_keys=["n_nationkey"])
    return pa.table(
        {"l_suppkey": j["s_suppkey"], "supp_nation": j["n_name"]}
    )


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7-shaped cross-nation shipping volume: revenue between
    every DIFFERENT (supplier nation, customer nation) pair, by ship
    year 1996-1997.  All nation pairs (not TPC-H's two) so the result
    is non-empty at every scale factor — the tiny sf0.001 fixture has
    no suppliers in some nations, and an all-empty side would leave
    Ray's hash-shuffle join with schema-less partitions.  Plan:
    supplier->nation and customer->nation are broadcast dimension
    joins; the one big-big exchange is lineitem x orders on orderkey;
    the output domain is bounded by nations^2 x years."""
    from geodata_ray.stages.relational import native_join

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))

    def lprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        t = batch.filter(m)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "rev_micro": pa.array(_rev_micro_np(t)),
        })

    lif = broadcast_join(
        li.map_batches(lprep, batch_format="pyarrow"),
        _supplier_nation(sf_dir), ["l_suppkey"],
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nat = _nation_name_map(sf_dir).rename_columns(
        ["c_nationkey", "cust_nation"])
    cj = broadcast_join(cust, nat, ["c_nationkey"]).select_columns(
        ["c_custkey", "cust_nation"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    oj = native_join(orders, cj, on="o_custkey", right_on="c_custkey",
                     num_partitions=8)
    # Barrier between the two hash joins (the q8 lesson): concurrent
    # JoinOperator aggregator pools can starve/deadlock clusters
    # smaller than their sum; the materialized side is two narrow
    # columns of orders.
    oj = oj.select_columns(["o_orderkey", "cust_nation"]).materialize()

    j = native_join(
        lif.select_columns(["l_orderkey", "supp_nation", "l_year",
                            "rev_micro"]),
        oj,
        on="l_orderkey", right_on="o_orderkey", num_partitions=8,
    )

    def cross(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch["supp_nation"], batch["cust_nation"])
        return batch.filter(m)

    return grouped_aggregate(
        j.map_batches(cross, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "l_year"],
        [("rev_micro", "sum", "revenue_micro")],
    )


def q9_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9-shaped product-line profit (lite: no partsupp table, so
    profit = discounted revenue): parts named 'red %' -> revenue by
    supplier nation x ORDER year.  Part filter is a broadcast
    semi-join on partkey (name-filtered subset, small fraction of a
    dimension table); supplier->nation broadcast; the only big-big
    exchange is lineitem x orders on orderkey."""
    from geodata_ray.stages.relational import native_join, semi_join

    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    red = part.filter(
        pc.starts_with(part["p_name"], "red "))["p_partkey"]
    red_ref = ray.put(red.combine_chunks())

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    lif = semi_join(li, red_ref, "l_partkey")

    def lprep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "rev_micro": pa.array(_rev_micro_np(batch)),
        })

    lif = broadcast_join(
        lif.map_batches(lprep, batch_format="pyarrow"),
        _supplier_nation(sf_dir), ["l_suppkey"],
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def oyear(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
        })

    j = native_join(
        lif.select_columns(["l_orderkey", "supp_nation", "rev_micro"]),
        orders.map_batches(oyear, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey", num_partitions=8,
    )
    return grouped_aggregate(
        j.select_columns(["supp_nation", "o_year", "rev_micro"]),
        ["supp_nation", "o_year"],
        [("rev_micro", "sum", "profit_micro")],
    )


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14-shaped promo-share: for one ship month, conditional
    revenue (p_type = 'PROMO') vs total — the CASE-WHEN aggregate
    shape, exposed as exact integer numerator/denominator instead of
    the float ratio.  Part's (partkey -> is_promo) is a broadcast
    bitmap; one scan, constant-key pre-combined aggregate."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = pa.table({
        "l_partkey": part["p_partkey"],
        "is_promo": pc.cast(pc.equal(part["p_type"], "PROMO"),
                            pa.int64()),
    })
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-09-01", "us"))
    hi = pa.scalar(np.datetime64("1996-10-01", "us"))

    def lprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        t = batch.filter(m)
        return pa.table({
            "l_partkey": t["l_partkey"],
            "rev_micro": pa.array(_rev_micro_np(t)),
        })

    j = broadcast_join(
        li.map_batches(lprep, batch_format="pyarrow"), promo,
        ["l_partkey"],
    )

    def flag(batch: pa.Table) -> pa.Table:
        rev = batch["rev_micro"].to_numpy(zero_copy_only=False)
        isp = batch["is_promo"].to_numpy(zero_copy_only=False)
        return pa.table({
            "grp": pa.array(np.zeros(len(batch), np.int64)),
            "promo_rev": pa.array(rev * isp),
            "rev_micro": batch["rev_micro"],
        })

    return grouped_aggregate(
        j.map_batches(flag, batch_format="pyarrow"),
        ["grp"],
        [("promo_rev", "sum", "promo_rev_micro"),
         ("rev_micro", "sum", "total_rev_micro"),
         ("rev_micro", "count", "n_lines")],
    )


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15-shaped top supplier: revenue per supplier over one
    quarter, return the supplier(s) achieving the GLOBAL max — the
    view + correlated-max shape.  The per-supplier aggregate is
    dimension-sized; the global max is computed distributed
    (Dataset.max, no driver pull of the aggregate), then an
    equality filter selects the winners."""
    li = _read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    def lprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        t = batch.filter(m)
        return pa.table({
            "l_suppkey": t["l_suppkey"],
            "rev_micro": pa.array(_rev_micro_np(t)),
        })

    agg = grouped_aggregate(
        li.map_batches(lprep, batch_format="pyarrow"),
        ["l_suppkey"],
        [("rev_micro", "sum", "total_revenue_micro")],
    ).materialize()  # dimension-sized; reused by max + filter
    best = agg.max("total_revenue_micro")
    win = agg.filter(
        lambda r: r["total_revenue_micro"] == best
    )
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]) \
        .rename_columns(["l_suppkey", "s_name"])
    out = broadcast_join(win, sup, ["l_suppkey"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": batch["l_suppkey"],
            "s_name": batch["s_name"],
            "total_revenue_micro": batch["total_revenue_micro"],
        })

    return out.map_batches(proj, batch_format="pyarrow")


def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17-shaped small-quantity revenue: lines of Brand#3 parts
    whose quantity is below 20% of that part's average quantity —
    the correlated scalar-subquery shape, decorrelated into a
    per-part aggregate joined back.  The threshold compare is exact
    integer algebra: qty < 0.2 * (sum/cnt)  <=>  5*qty*cnt < sum
    (quantities are integral by data contract).  Output: total
    extended price (cents) + line count, one row."""
    from geodata_ray.stages.relational import semi_join

    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    keys = part.filter(
        pc.equal(part["p_brand"], "Brand#3"))["p_partkey"].combine_chunks()
    keys_ref = ray.put(keys)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    lif = semi_join(li, keys_ref, "l_partkey")

    def iq(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch["l_quantity"]), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(
                pc.cast(batch["l_extendedprice"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table({
            "l_partkey": batch["l_partkey"], "qty": q, "cents": cents,
        })

    lif = lif.map_batches(iq, batch_format="pyarrow").materialize()
    # per-part aggregate: brand-filtered dimension-sized (one row per
    # distinct Brand#3 part), safe to broadcast back
    agg = grouped_aggregate(
        lif, ["l_partkey"],
        [("qty", "sum", "sum_qty"), ("qty", "count", "cnt")],
    )
    agg_tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    j = broadcast_join(lif, agg_tbl, ["l_partkey"])

    def qual(batch: pa.Table) -> pa.Table:
        q = batch["qty"].to_numpy(zero_copy_only=False)
        s = batch["sum_qty"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        keep = 5 * q * c < s
        t = batch.filter(pa.array(keep))
        return pa.table({
            "grp": pa.array(np.zeros(len(t), np.int64)),
            "cents": t["cents"],
        })

    return grouped_aggregate(
        j.map_batches(qual, batch_format="pyarrow"),
        ["grp"],
        [("cents", "sum", "total_price_cents"),
         ("cents", "count", "n_lines")],
    )


def q19_or_predicates_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    (brand, size range, quantity range) branches evaluated in ONE
    lineitem scan against a broadcast part attribute table, grouped
    by the matching brand — the multi-branch pushdown shape."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
    ).rename_columns(["l_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    j = broadcast_join(li, part, ["l_partkey"])

    def branches(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(batch["l_quantity"]),
                    pa.int64()).to_numpy(zero_copy_only=False)
        sz = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        br = batch["p_brand"].to_numpy(zero_copy_only=False)
        m1 = (br == "Brand#1") & (q >= 1) & (q <= 11) & (sz >= 1) & (sz <= 5)
        m2 = (br == "Brand#2") & (q >= 10) & (q <= 20) & (sz >= 1) & (sz <= 10)
        m3 = (br == "Brand#3") & (q >= 20) & (q <= 30) & (sz >= 1) & (sz <= 15)
        keep = m1 | m2 | m3
        t = batch.filter(pa.array(keep))
        return pa.table({
            "p_brand": t["p_brand"],
            "rev_micro": pa.array(_rev_micro_np(t)),
        })

    return grouped_aggregate(
        j.map_batches(branches, batch_format="pyarrow"),
        ["p_brand"],
        [("rev_micro", "sum", "revenue_micro"),
         ("rev_micro", "count", "n_lines")],
    )


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2-shaped correlated-min: for each STANDARD size-15 part,
    the EUROPE supplier(s) offering the minimum observed unit cost
    (min line price in cents stands in for ps_supplycost; no partsupp
    table in the driver schema).  Decorrelated: per-(part,supplier)
    min -> per-part min -> equality join back, all on the
    dimension-sized filtered subsets (broadcast, no big exchange
    beyond the pre-pruned lineitem scan)."""
    import pyarrow.parquet as pq
    import ray

    from geodata_ray.stages.relational import semi_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_size", "p_type"])
    pk = part.filter(
        pc.and_(pc.equal(part["p_size"], 15),
                pc.equal(part["p_type"], "STANDARD"))
    )["p_partkey"].combine_chunks()

    sup = _supplier_nation(sf_dir)  # (l_suppkey, supp_nation)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    eu_nations = nat.join(reg, keys=["n_regionkey"],
                          right_keys=["r_regionkey"])
    eu_nations = eu_nations.filter(
        pc.equal(eu_nations["r_name"], "EUROPE"))["n_name"]
    eu_sup = sup.filter(pc.is_in(sup["supp_nation"],
                                 value_set=eu_nations.combine_chunks()))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    lif = semi_join(li, ray.put(pk), "l_partkey")
    lif = broadcast_join(lif, eu_sup.select(["l_suppkey"]), ["l_suppkey"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(
                pc.cast(batch["l_extendedprice"], pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table({"l_partkey": batch["l_partkey"],
                         "l_suppkey": batch["l_suppkey"], "cents": c})

    cost = grouped_aggregate(
        lif.map_batches(cents, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        [("cents", "min", "cost_cents")],
    ).materialize()  # filtered-dimension-sized; reused twice
    best = grouped_aggregate(
        cost, ["l_partkey"], [("cost_cents", "min", "min_cost_cents")]
    )
    best_tbl = pa.Table.from_pandas(best.to_pandas(),
                                    preserve_index=False)
    j = broadcast_join(cost, best_tbl, ["l_partkey"])
    sup_names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).rename_columns(["l_suppkey", "s_name"])
    j = broadcast_join(j, sup_names, ["l_suppkey"])

    def pick(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["cost_cents"],
                                  batch["min_cost_cents"]))
        return pa.table({
            "s_name": t["s_name"],
            "p_partkey": t["l_partkey"],
            "min_cost_cents": t["min_cost_cents"],
        })

    return j.map_batches(pick, batch_format="pyarrow")


def q8_market_share(sf_dir: str):
    """TPC-H Q8-shaped market share: among PROMO-part sales to AMERICA
    customers in 1996-1997, NATION_3 suppliers' revenue vs total, per
    order year — the conditional-aggregate-ratio shape exposed as
    exact integer numerator/denominator columns."""
    import pyarrow.parquet as pq
    import ray

    from geodata_ray.stages.relational import native_join, semi_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = part.filter(
        pc.equal(part["p_type"], "PROMO"))["p_partkey"].combine_chunks()

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])
    lif = semi_join(li, ray.put(promo), "l_partkey")
    lif = broadcast_join(
        lif, _supplier_nation(sf_dir), ["l_suppkey"])

    def lprep(batch: pa.Table) -> pa.Table:
        rev = _rev_micro_np(batch)
        isn = pc.equal(batch["supp_nation"], "NATION_3")
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "rev_micro": pa.array(rev),
            "nation_rev": pa.array(
                rev * isn.to_numpy(zero_copy_only=False).astype(np.int64)),
        })

    lif = lif.map_batches(lprep, batch_format="pyarrow")

    # AMERICA customers (region filter via the tiny nation/region join)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    amn = nat.join(reg, keys=["n_regionkey"], right_keys=["r_regionkey"])
    amn = pa.table({
        "c_nationkey": amn.filter(
            pc.equal(amn["r_name"], "AMERICA"))["n_nationkey"]
    })
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cam = broadcast_join(cust, amn, ["c_nationkey"]).select_columns(
        ["c_custkey"])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                              "o_orderdate"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))

    def oprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["o_orderdate"], lo),
                    pc.less(batch["o_orderdate"], hi))
        t = batch.filter(m)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        })

    of = native_join(
        orders.map_batches(oprep, batch_format="pyarrow"), cam,
        on="o_custkey", right_on="c_custkey", num_partitions=8,
    )
    # Materialize between the two hash joins: each JoinOperator spawns
    # num_partitions aggregator actors, and running both concurrently
    # starves/deadlocks a cluster smaller than their sum (observed hang
    # at num_cpus=4).  The barrier serializes them; the materialized
    # side is the 2-year AMERICA order slice (3 int64 columns, ~6% of
    # orders), which the object store holds/spills fine at scale.
    of = of.select_columns(["o_orderkey", "o_year"]).materialize()
    j = native_join(
        lif, of,
        on="l_orderkey", right_on="o_orderkey", num_partitions=8,
    )
    return grouped_aggregate(
        j.select_columns(["o_year", "rev_micro", "nation_rev"]),
        ["o_year"],
        [("nation_rev", "sum", "nation_rev_micro"),
         ("rev_micro", "sum", "total_rev_micro")],
    )


def q11_important_parts(sf_dir: str):
    """TPC-H Q11-shaped HAVING-against-global-scalar: parts whose
    total lineitem value exceeds 1.5x THE AVERAGE part value — the
    scale-invariant form of Q11's fraction (TPC-H itself scales the
    fraction by 1/SF so the output stays non-degenerate as the part
    count grows; a fixed 1/10000 kept everything at sf0.01 and
    nothing at sf0.1, and the uniform generator tops out at ~1.8x
    avg, so 1.5x selects a real tail at every SF).  The per-part
    aggregate is one pre-combined exchange (coalesce=0 for the
    high-cardinality key); the global scalar is a distributed
    Dataset.sum over that aggregate (never over raw lines twice); the
    compare is exact: ``v > (3 * total) // (2 * n_parts)`` (integers;
    the floor form is equivalent to ``2 * v * n_parts > 3 * total``
    and never overflows int64, unlike the product)."""
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def lprep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"],
            "rev_micro": pa.array(_rev_micro_np(batch)),
        })

    agg = grouped_aggregate(
        li.map_batches(lprep, batch_format="pyarrow"),
        ["l_partkey"], [("rev_micro", "sum", "value_micro")],
        coalesce=0,
    ).materialize()  # part-dimension-sized; reused by sum + filter
    total = int(agg.sum("value_micro"))
    thr = (3 * total) // (2 * agg.count())  # exact in Python ints

    def keep(batch: pa.Table) -> pa.Table:
        v = batch["value_micro"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(v > thr))
        return pa.table({"p_partkey": t["l_partkey"],
                         "value_micro": t["value_micro"]})

    return agg.map_batches(keep, batch_format="pyarrow")


def q13_order_count_distribution(sf_dir: str):
    """TPC-H Q13-shaped customer order-count distribution: orders per
    customer (priority-filtered), INCLUDING zero-order customers via a
    left-outer join, then the count-of-counts histogram — two grouped
    exchanges, the second over the tiny (c_count) domain."""
    from geodata_ray.stages.relational import native_join

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"])

    def of(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.not_equal(batch["o_orderpriority"], "5-LOW"))
        return t.select(["o_custkey"])

    per_cust = grouped_aggregate(
        orders.map_batches(of, batch_format="pyarrow"),
        ["o_custkey"], [("o_custkey", "count", "c_count")],
        coalesce=0,
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    j = native_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                    join_type="left_outer", num_partitions=8)

    def fill(batch: pa.Table) -> pa.Table:
        c = pc.fill_null(batch["c_count"], 0)
        return pa.table({"c_count": pc.cast(c, pa.int64())})

    return grouped_aggregate(
        j.map_batches(fill, batch_format="pyarrow"),
        ["c_count"], [("c_count", "count", "custdist")],
    )


def q16_supplier_part_counts(sf_dir: str):
    """TPC-H Q16-shaped supplier counts by part attribute: COUNT
    DISTINCT suppliers per (brand, type, size) over the observed
    lineitem (part, supplier) pairs, excluding Brand#1 / PROMO /
    off-list sizes and a supplier blocklist (suppkey % 7 == 0 stands
    in for the complaints predicate).  Two distinct passes: pair
    distinct on the composite key, then attribute-level distinct —
    both pre-combined in map_batches before the exchange."""
    import pyarrow.parquet as pq

    sizes = pa.array([1, 4, 9, 16, 25, 36, 49], pa.int32())
    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    part = part.filter(pc.and_(
        pc.and_(pc.not_equal(part["p_brand"], "Brand#1"),
                pc.not_equal(part["p_type"], "PROMO")),
        pc.is_in(part["p_size"], value_set=sizes),
    )).rename_columns(["l_partkey", "p_brand", "p_type", "p_size"])

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def sf(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(sk % 7 != 0))
        # in-batch pair dedup shrinks the exchange
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = grouped_aggregate(
        li.map_batches(sf, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [("l_partkey", "count", "_n")],
        coalesce=0,
    )
    j = broadcast_join(pairs, part, ["l_partkey"])
    attr_supp = grouped_aggregate(
        j.select_columns(["p_brand", "p_type", "p_size", "l_suppkey"]),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        [("l_suppkey", "count", "_n")],
    )
    return grouped_aggregate(
        attr_supp.select_columns(["p_brand", "p_type", "p_size"]),
        ["p_brand", "p_type", "p_size"],
        [("p_brand", "count", "supplier_cnt")],
    )


def q20_qty_semijoin(sf_dir: str):
    """TPC-H Q20-shaped nested semi-join: suppliers who shipped more
    than 50 total units of some 'small %' part during 1996 — the
    HAVING-qualified IN-subquery shape.  The inner aggregate runs per
    (supplier, part) with in-batch partials; the outer is a distinct
    projection joined to the broadcast supplier dimension."""
    import pyarrow.parquet as pq
    import ray

    from geodata_ray.stages.relational import semi_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    pk = part.filter(pc.starts_with(part["p_name"], "small "))[
        "p_partkey"].combine_chunks()

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def lprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        t = batch.filter(m)
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
        })

    lif = semi_join(li.map_batches(lprep, batch_format="pyarrow"),
                    ray.put(pk), "l_partkey")
    ps = grouped_aggregate(
        lif, ["l_suppkey", "l_partkey"], [("qty", "sum", "sum_qty")],
    )

    def qual(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["sum_qty"], 50))
        return t.select(["l_suppkey"]).group_by(["l_suppkey"]).aggregate([])

    supp = grouped_aggregate(
        ps.map_batches(qual, batch_format="pyarrow"),
        ["l_suppkey"], [("l_suppkey", "count", "_n")],
    )
    sup_names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).rename_columns(["l_suppkey", "s_name"])
    out = broadcast_join(supp, sup_names, ["l_suppkey"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch["l_suppkey"],
                         "s_name": batch["s_name"]})

    return out.map_batches(proj, batch_format="pyarrow")


def q21_sole_late_supplier(sf_dir: str):
    """TPC-H Q21-shaped EXISTS + NOT-EXISTS: per supplier, the number
    of finished ('F') multi-supplier orders where THEY were the only
    late shipper (ship > order date + 60 days stands in for
    receipt > commit).  Decorrelated into two grouped aggregates on
    the same keyed exchange: per-(order,supplier) late flag, then
    per-order supplier/late counts, joined back on orderkey."""
    from geodata_ray.stages.relational import native_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus", "o_orderdate"])

    def of(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        return t.select(["o_orderkey", "o_orderdate"])

    off = orders.map_batches(of, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    j = native_join(li, off, on="l_orderkey", right_on="o_orderkey",
                    num_partitions=8)

    def late(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        isl = (sd > od + np.int64(60) * 86_400_000_000).astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_suppkey": batch["l_suppkey"],
            "late": pa.array(isl),
        })

    lo = grouped_aggregate(
        j.map_batches(late, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"], [("late", "max", "late")],
        coalesce=0,
    ).materialize()  # reused: order-level rollup + join back
    og = grouped_aggregate(
        lo, ["l_orderkey"],
        [("late", "count", "n_supp"), ("late", "sum", "n_late")],
        coalesce=0,
    )
    jj = native_join(lo, og.rename_columns({"l_orderkey": "ok"}),
                     on="l_orderkey", right_on="ok", num_partitions=8)

    def qual(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch["late"], 1),
            pc.and_(pc.greater_equal(batch["n_supp"], 2),
                    pc.equal(batch["n_late"], 1)),
        )
        return batch.filter(m).select(["l_suppkey"])

    per_supp = grouped_aggregate(
        jj.map_batches(qual, batch_format="pyarrow"),
        ["l_suppkey"], [("l_suppkey", "count", "numwait")],
    )
    import pyarrow.parquet as pq

    sup_names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).rename_columns(["l_suppkey", "s_name"])
    out = broadcast_join(per_supp, sup_names, ["l_suppkey"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({"s_name": batch["s_name"],
                         "numwait": batch["numwait"]})

    return out.map_batches(proj, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Eighteenth wave: the last two TPC-H shapes (Q6/Q12 — the full 22 are
# now covered) + dedup-cluster / rules / sketch-merge / NTILE
# compositions over the engine's existing stages.
# ---------------------------------------------------------------------------


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6-shaped forecast revenue change: one scan, tight row
    filter (ship year 1996, discount 5-7% as exact basis points,
    quantity < 24), global ``SUM(price * discount)`` as exact integer
    10^-6 units.  The cheapest TPC-H shape: no join, constant-key
    pre-combined aggregate (one partial row per block)."""
    li = _read(
        sf_dir, "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def lprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi)),
            pc.less(batch["l_quantity"], 24.0),
        )
        t = batch.filter(m)
        cents, bp = _cents_bp_np(t)
        keep = (bp >= 500) & (bp <= 700)
        rev = cents[keep] * bp[keep]
        return pa.table({
            "grp": pa.array(np.zeros(rev.size, np.int64)),
            "rev": pa.array(rev),
        })

    return grouped_aggregate(
        li.map_batches(lprep, batch_format="pyarrow"),
        ["grp"],
        [("rev", "sum", "revenue_micro"), ("rev", "count", "n_lines")],
    )


def q12_late_lines_priority(sf_dir: str):
    """TPC-H Q12-shaped shipping-mode priority audit, adapted to the
    driver schema (no l_shipmode / commit / receipt dates):
    ``l_returnflag`` stands in for the mode and a line is LATE when it
    ships more than 60 days after its order date (the q21 lateness
    convention; the sibling ``late_shipment_priority`` audits the same
    join at the 90-day band — kept separately so the canonical Q-shape
    registry stays 22/22).  Per flag, count late lines on
    high-priority (1-URGENT / 2-HIGH) vs lower-priority orders.  One
    orderkey exchange (native hash join); the priority flag is
    computed order-side so only three narrow columns ship."""
    from geodata_ray.stages.relational import native_join

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])

    def oprep(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"]
        high = pc.or_(pc.equal(pr, "1-URGENT"), pc.equal(pr, "2-HIGH"))
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "is_high": pc.cast(high, pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def lprep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_returnflag": batch["l_returnflag"],
            "s_us": pc.cast(batch["l_shipdate"], pa.int64()),
        })

    j = native_join(
        li.map_batches(lprep, batch_format="pyarrow"),
        orders.map_batches(oprep, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey", num_partitions=8,
    )
    late_us = 60 * 86_400_000_000  # 60 days in microseconds

    def late(batch: pa.Table) -> pa.Table:
        m = pc.greater(pc.subtract(batch["s_us"], batch["o_us"]),
                       late_us)
        t = batch.filter(m)
        hi = t["is_high"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "high": pa.array(hi),
            "low": pa.array(1 - hi),
        })

    return grouped_aggregate(
        j.map_batches(late, batch_format="pyarrow"),
        ["l_returnflag"],
        [("high", "sum", "high_line_count"),
         ("low", "sum", "low_line_count")],
    )


def near_dup_clusters_docs(sf_dir: str):
    """Near-duplicate CLUSTERS: the MinHash-LSH verified pair stream
    (the ``near_dup_pairs`` operator — banded, never all-pairs) fed
    into distributed connected components (striped union-find), then
    one tiny keyed count: (cluster_id = min doc id, cluster_size) per
    multi-document cluster.  The canonical corpus-dedup composition —
    the pair count bounds both the exchange and the oracle's recursive
    closure."""
    from geodata_ray.stages.graphcc import connected_components

    pairs = near_dup_pairs(sf_dir)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return grouped_aggregate(
        comp, ["cluster_id"], [("node", "count", "cluster_size")]
    )


def association_rules_events(sf_dir: str):
    """Association rules over per-user event-type baskets: for every
    unordered type pair, the exact integer components of support /
    confidence / lift — ``n_ab`` (users with both), ``n_a`` / ``n_b``
    (users with each), ``n_users`` (total) — ratios stay with the
    caller so every value hash-matches.  Plan: one distinct
    (user, type) exchange, types mapped to BITS (domain discovered
    first, guarded <= 20), per-user mask = sum of distinct bits (= OR),
    then a <= 2^|types|-row mask histogram; pair counts are an exact
    popcount convolution over that tiny histogram — no user-level
    self-join anywhere."""
    import ray.data as rd

    d = grouped_aggregate(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        ["user_id", "event_type"],
        [("event_type", "count", "__n")],
    ).drop_columns(["__n"])

    types_tbl = grouped_aggregate(
        d, ["event_type"], [("event_type", "count", "__n")]
    ).drop_columns(["__n"]).take_all()  # domain-bounded (checked below)
    types = sorted(r["event_type"] for r in types_tbl)
    if len(types) > 20:
        raise ValueError(
            f"association_rules: {len(types)} types exceeds the "
            "bitmask bound (2^20 histogram) — shard the type domain"
        )
    bit_of = {t: 1 << i for i, t in enumerate(types)}

    type_arr = pa.array(types, pa.string())
    bit_lut = np.array([bit_of[t] for t in types], dtype=np.int64)

    def to_bits(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["event_type"],
                          value_set=type_arr).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "bit": pa.array(bit_lut[idx]),
        })

    masks = grouped_aggregate(
        d.map_batches(to_bits, batch_format="pyarrow"),
        ["user_id"], [("bit", "sum", "mask")],  # bits distinct => sum == OR
    )
    hist = grouped_aggregate(
        masks, ["mask"], [("mask", "count", "n")]
    ).take_all()  # <= 2^|types| rows by construction
    hm = np.array([r["mask"] for r in hist], dtype=np.int64)
    hn = np.array([r["n"] for r in hist], dtype=np.int64)
    n_users = int(hn.sum())
    per_type = {
        t: int(hn[(hm & b) != 0].sum()) for t, b in bit_of.items()
    }
    rows = {"type_a": [], "type_b": [], "n_ab": [], "n_a": [],
            "n_b": [], "n_users": []}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = int(hn[((hm & bit_of[a]) != 0)
                          & ((hm & bit_of[b]) != 0)].sum())
            if both == 0:
                continue
            rows["type_a"].append(a)
            rows["type_b"].append(b)
            rows["n_ab"].append(both)
            rows["n_a"].append(per_type[a])
            rows["n_b"].append(per_type[b])
            rows["n_users"].append(n_users)
    return rd.from_arrow(pa.table({
        "type_a": pa.array(rows["type_a"], pa.string()),
        "type_b": pa.array(rows["type_b"], pa.string()),
        "n_ab": pa.array(rows["n_ab"], pa.int64()),
        "n_a": pa.array(rows["n_a"], pa.int64()),
        "n_b": pa.array(rows["n_b"], pa.int64()),
        "n_users": pa.array(rows["n_users"], pa.int64()),
    }))


def hll_merge_types_events(sf_dir: str):
    """HLL sketch MERGE: per-register max ranks for two event-type
    audiences ('view', 'click') side by side, plus their union merge
    (elementwise max) — the mergeability property that makes HLL the
    scale path for distinct-users-across-segments, shown as exact
    integer register state.  Absent registers report rank 0, matching
    the estimator's zero-register convention."""
    from geodata_ray.stages.sketch import hll_register_table

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    ev = ev.map_batches(
        lambda b: b.filter(
            pc.or_(pc.equal(b["event_type"], "view"),
                   pc.equal(b["event_type"], "click"))
        ),
        batch_format="pyarrow",
    )
    keyed = hll_register_table(ev, "user_id", keys=["event_type"])

    def split(batch: pa.Table) -> pa.Table:
        isv = pc.cast(pc.equal(batch["event_type"], "view"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        r = batch["max_rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "register": batch["register"],
            "rv": pa.array(r * isv),
            "rc": pa.array(r * (1 - isv)),
        })

    merged = grouped_aggregate(
        keyed.map_batches(split, batch_format="pyarrow"),
        ["register"],
        [("rv", "max", "rank_view"), ("rc", "max", "rank_click")],
    )

    def union(batch: pa.Table) -> pa.Table:
        rv = batch["rank_view"].to_numpy(zero_copy_only=False)
        rc = batch["rank_click"].to_numpy(zero_copy_only=False)
        return pa.table({
            "register": batch["register"],
            "rank_view": batch["rank_view"],
            "rank_click": batch["rank_click"],
            "rank_union": pa.array(np.maximum(rv, rc)),
        })

    return merged.map_batches(union, batch_format="pyarrow")


def ntile_value_users(sf_dir: str):
    """NTILE(4) quartile assignment over per-user total value: the
    deterministic-tiebreak global-rank shape.  Per-user cents is one
    keyed exchange; the global 0-based rank comes from the distributed
    prefix-sum scan over the single int64 order key
    ``cents * 2^32 + user_id`` (both factors bound-checked); the tile
    is then pure arithmetic on (rank, n) replicating SQL NTILE's
    first-(n mod 4)-buckets-get-one-extra sizing."""
    from geodata_ray.stages.packing import global_prefix_sum

    ev = _read(sf_dir, "events", columns=["user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({"user_id": batch["user_id"], "cents": cents})

    agg = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], [("cents", "sum", "cents")],
    ).materialize()  # dimension-sized; reused by rank scan + count

    def okey(batch: pa.Table) -> pa.Table:
        c = batch["cents"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        if c.size and (int(np.abs(c).max()) >= 2**31
                       or int(u.max()) >= 2**32 or int(u.min()) < 0):
            raise OverflowError(
                "ntile order key needs |cents| < 2^31 and user_id in "
                "[0, 2^32) — widen the key packing for this domain"
            )
        return pa.table({
            "user_id": batch["user_id"],
            "cents": batch["cents"],
            "__ok": pa.array(c * 4294967296 + u),
            "__one": pa.array(np.ones(c.size, np.int64)),
        })

    ranked = global_prefix_sum(
        agg.map_batches(okey, batch_format="pyarrow"),
        order_col="__ok", value_col="__one", out_col="__rank",
    )
    n = agg.count()  # dimension-sized (one row per user)
    k, m = divmod(n, 4)

    def tile(batch: pa.Table) -> pa.Table:
        r = batch["__rank"].to_numpy(zero_copy_only=False)
        if k == 0:  # fewer users than tiles: one per bucket in order
            t = r + 1
        else:
            big = m * (k + 1)
            t = np.where(r < big, r // (k + 1), m + (r - big) // k) + 1
        return pa.table({
            "user_id": batch["user_id"],
            "cents": batch["cents"],
            "tile": pa.array(t.astype(np.int64)),
        })

    return ranked.map_batches(tile, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Nineteenth wave: KMV sketch, weighted median, range-partition
# planner, class balancing, inter-arrival medians, string aggregation.
# ---------------------------------------------------------------------------


def kmv_sketch_events(sf_dir: str):
    """KMV (k-minimum-values) distinct sketch over events.user_id:
    the k=64 smallest splitmix64 hashes of the distinct ids — the
    third mergeable cardinality sketch next to HLL (union = bottom-k
    of the concatenation).  Order and storage use the SIGNED int64 bit
    view of the hash (the engine's hash-column convention, same as
    ``global_shuffle``) — statistically identical for a uniform hash
    and bit-exact in SQL.  Distinct ids are one pre-combined exchange;
    the bottom-k is a sort + limit over the hashed dimension table;
    the final 64-row state is ranked driver-side (bounded by k)."""
    import ray.data as rd

    from geodata_ray.sources.synth import splitmix64

    k = 64
    d = grouped_aggregate(
        _read(sf_dir, "events", columns=["user_id"]),
        ["user_id"], [("user_id", "count", "__n")],
    ).drop_columns(["__n"])

    def h(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        hv = splitmix64(u.view(np.uint64)).view(np.int64)
        return pa.table({"hash_i64": pa.array(hv)})

    bottom = (
        d.map_batches(h, batch_format="pyarrow")
        .sort("hash_i64")
        .limit(k)
        .take_all()  # <= k rows by construction
    )
    hv = np.sort(np.array([r["hash_i64"] for r in bottom],
                          dtype=np.int64))
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, hv.size + 1, dtype=np.int64)),
        "hash_i64": pa.array(hv),
    }))


def weighted_median_lineitem(sf_dir: str):
    """Weighted median unit price: the smallest price (cents) whose
    cumulative quantity weight reaches half the total — computed over
    the bounded (cents -> total-quantity) histogram, never the raw
    rows: one keyed exchange builds the histogram, the distributed
    prefix-sum scan ranks it, and exactly one row satisfies
    ``2 * cum_exclusive < W <= 2 * cum_inclusive``."""
    from geodata_ray.stages.packing import global_prefix_sum

    li = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["l_extendedprice"],
                                         pa.float64()), 100.0)),
            pa.int64(),
        )
        qty = pc.cast(pc.round(pc.cast(batch["l_quantity"],
                                       pa.float64())), pa.int64())
        return pa.table({"cents": cents, "w": qty})

    hist = grouped_aggregate(
        li.map_batches(prep, batch_format="pyarrow"),
        ["cents"], [("w", "sum", "w")],
    ).materialize()  # histogram-sized; reused by sum + scan
    total_w = int(hist.sum("w"))
    ranked = global_prefix_sum(hist, order_col="cents", value_col="w",
                               out_col="cw")

    def pick(batch: pa.Table) -> pa.Table:
        cw = batch["cw"].to_numpy(zero_copy_only=False)  # exclusive
        w = batch["w"].to_numpy(zero_copy_only=False)
        m = (2 * cw < total_w) & (2 * (cw + w) >= total_w)
        t = batch.filter(pa.array(m))
        return pa.table({
            "grp": pa.array(np.zeros(len(t), np.int64)),
            "median_cents": t["cents"],
            "total_weight": pa.array(
                np.full(len(t), total_w, np.int64)),
        })

    return ranked.map_batches(pick, batch_format="pyarrow")


def range_partition_plan_events(sf_dir: str):
    """Range-partition planning — the equi-depth boundary computation
    every distributed sort runs before it shuffles: 15 exact
    quantile_disc cut points over value cents (bounded histogram, one
    exchange), broadcast back, every row assigned partition
    ``#(bounds < v)`` by vectorized searchsorted, then per-partition
    size + min/max audit (the realized skew report).  Two scans: plan
    and apply — the honest shape of sample-free exact planning."""
    P = 16
    from geodata_ray.stages.relational import exact_int_quantiles

    ev = _read(sf_dir, "events", columns=["value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({"cents": c})

    cds = ev.map_batches(cents, batch_format="pyarrow")
    bounds = np.array(
        exact_int_quantiles(cds, "cents",
                            [i / P for i in range(1, P)]),
        dtype=np.int64,
    )

    def assign(batch: pa.Table) -> pa.Table:
        v = batch["cents"].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(bounds, v, side="left")  # = #(bounds < v)
        return pa.table({
            "partition_id": pa.array(pid.astype(np.int64)),
            "cents": batch["cents"],
        })

    return grouped_aggregate(
        cds.map_batches(assign, batch_format="pyarrow"),
        ["partition_id"],
        [("cents", "count", "n_rows"),
         ("cents", "min", "min_cents"),
         ("cents", "max", "max_cents")],
    )


def class_balance_docs(sf_dir: str):
    """Deterministic class balancing (training-data upsampling): per
    language, the replication count that brings every class exactly to
    the majority-class size — docs ranked within their class get
    ``target // cnt`` copies plus one for the first ``target % cnt``.
    Emitted as (doc_id, lang, n_copies) metadata, not replicated rows.
    Class counts are a tiny broadcast; the within-class rank is the
    distributed prefix-sum over the packed (class, doc_id) key minus
    the class offset — no per-class sort jobs."""
    from geodata_ray.stages.packing import global_prefix_sum

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    counts = grouped_aggregate(
        docs, ["lang"], [("lang", "count", "cnt")]
    ).take_all()  # class-domain-sized
    if len(counts) > 10_000:
        raise ValueError("class_balance: class domain too large for "
                         "the broadcast plan — shard the class map")
    langs = sorted(r["lang"] for r in counts)
    cnt_of = {r["lang"]: int(r["cnt"]) for r in counts}
    target = max(cnt_of.values())
    # exclusive offset of each class in (class, doc_id) order
    off_of = {}
    acc = 0
    for l in langs:
        off_of[l] = acc
        acc += cnt_of[l]

    lang_arr = pa.array(langs, pa.string())

    def okey(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        li = pc.index_in(batch["lang"], value_set=lang_arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if ids.size and (int(ids.max()) >= 2**44 or int(ids.min()) < 0):
            raise OverflowError(
                "class_balance order key needs doc_id in [0, 2^44)")
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "__ok": pa.array(li * 2**44 + ids),
            "__one": pa.array(np.ones(ids.size, np.int64)),
        })

    ranked = global_prefix_sum(
        docs.map_batches(okey, batch_format="pyarrow"),
        order_col="__ok", value_col="__one", out_col="__rank",
    )
    base_a = np.array([target // cnt_of[l] for l in langs], np.int64)
    rem_a = np.array([target % cnt_of[l] for l in langs], np.int64)
    off_a = np.array([off_of[l] for l in langs], np.int64)

    def copies(batch: pa.Table) -> pa.Table:
        li = pc.index_in(batch["lang"], value_set=lang_arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rk = batch["__rank"].to_numpy(zero_copy_only=False) - off_a[li]
        n = base_a[li] + (rk < rem_a[li])
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_copies": pa.array(n.astype(np.int64)),
        })

    return ranked.map_batches(copies, batch_format="pyarrow")


def interarrival_median_users(sf_dir: str):
    """Per-user median inter-arrival gap (microseconds): consecutive
    event gaps within each user's (ts, event_id)-ordered stream, and
    the exact per-user quantile_disc median — both computed INSIDE the
    bucketed group pass (users hash into bounded buckets, ONE Arrow
    sort per bucket, numpy diff + segment ceil-rank picks) — never a
    per-user Ray group, and no second exchange: all rows of a user
    land in one bucket, so the per-user median is bucket-local."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "q_pct": pa.array([], pa.int64()),
                          "gap_us": pa.array([], pa.int64())})
        t = g.sort_by([("user_id", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        if len(u) < 2:
            return empty
        same = u[1:] == u[:-1]
        gu = u[1:][same]
        gv = np.diff(ts)[same]
        if gu.size == 0:
            return empty
        # per-user ceil-rank median: sort gaps within user segments,
        # pick element at offset ceil(n/2)-1 of each segment
        order = np.lexsort((gv, gu))
        gu, gv = gu[order], gv[order]
        starts = np.flatnonzero(np.r_[True, gu[1:] != gu[:-1]])
        ends = np.r_[starts[1:], gu.size]
        n = ends - starts
        med_idx = starts + (n + 1) // 2 - 1  # ceil(n/2), 0-based
        return pa.table({
            "user_id": pa.array(gu[starts]),
            "q_pct": pa.array(np.full(starts.size, 50, np.int64)),
            "gap_us": pa.array(gv[med_idx]),
        })

    return (
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def string_agg_daily_types_events(sf_dir: str):
    """Collect-list / STRING_AGG: per day, the comma-joined SORTED
    distinct event types plus their count — the list-materializing
    aggregate (the only one here whose output column is built, not
    computed).  One distinct (day, type) exchange; per-day assembly is
    a map_groups over the tiny per-day type sets."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(batch["ts"], unit="day"),
            "event_type": batch["event_type"],
        })

    d = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day", "event_type"],
        [("event_type", "count", "__n")],
    ).drop_columns(["__n"])

    def per_day(g: pa.Table) -> pa.Table:
        types = sorted(g["event_type"].to_pylist())
        return pa.table({
            "day": g["day"].slice(0, 1),
            "types_csv": pa.array([",".join(types)], pa.string()),
            "n_types": pa.array([len(types)], pa.int64()),
        })

    return d.groupby("day").map_groups(per_day,
                                       batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Twenty-first wave: DBSCAN labels, phrase retrieval, Merkle tree,
# label centroids, LOCF forward-fill, seasonal load profile.
# ---------------------------------------------------------------------------


def dbscan_labels_events(sf_dir: str):
    """DBSCAN (eps=32, minPts=5) over the splitmix event lattice with
    a DETERMINISTIC border rule: core points (>= minPts-1 neighbors)
    cluster by connected components of the core-core adjacency
    (cluster id = min core id; isolated cores are singleton clusters);
    border points (non-core with a core neighbor) join the MINIMUM
    adjacent core cluster (textbook DBSCAN leaves this order-
    dependent); everything else is noise (label -1).

    Plan (message-passing, every exchange ~5 s of single-node floor,
    so rounds are fused aggressively): the fixed-radius pair join
    (cell hash + 3x3 probes) feeds TWO bucketed group rounds — round 1
    computes each sender's degree/coreness and messages it to every
    neighbor; round 2 re-derives the receiver's coreness from its
    incoming message count and emits core-core edges, border
    candidates, and core flags in ONE pass.  Components run in the
    striped union-find; core and border labels union into one table
    for a single left join back onto the id spine.  41 s -> this
    shape at sf0.1 (see BASELINE.md)."""
    import ray.data as rd

    from geodata_ray.stages.graphcc import connected_components
    from geodata_ray.stages.relational import shuffle_join
    from geodata_ray.stages.windows import _tag_bucket

    MINPTS = 5

    def _typed(ds, **cols):
        """Union a zero-row typed block so the schema survives even
        when every real block is empty (Ray passes empty blocks
        through map operators without calling the UDF, losing the
        declared schema — the sf0.001 no-core case)."""
        return ds.union(rd.from_arrow(pa.table(
            {k: pa.array([], t) for k, t in cols.items()}
        )))

    pairs = _radius_pairs(sf_dir, R=32).select_columns(
        ["id_a", "id_b"])

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id": pa.array(np.concatenate([a, b])),
            "nbr": pa.array(np.concatenate([b, a])),
        })

    def round1(g: pa.Table) -> pa.Table:
        # per sender: degree -> coreness, messaged to every neighbor
        t = g.sort_by([("id", "ascending")])
        u = t["id"].to_numpy(zero_copy_only=False)
        nb = t["nbr"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        deg = np.diff(np.r_[starts, u.size])
        core = (deg + 1 >= MINPTS).astype(np.int64)
        return pa.table({
            "dst": pa.array(nb),
            "src": pa.array(u),
            "src_core": pa.array(np.repeat(core, deg)),
        })

    msgs = (
        _tag_bucket(
            pairs.map_batches(sym, batch_format="pyarrow"), "id", 64)
        .groupby("__b")
        .map_groups(round1, batch_format="pyarrow")
    )

    def round2(g: pa.Table) -> pa.Table:
        # receiver coreness = incoming message count (== degree);
        # emit kind=0 core-core edges, kind=1 border candidates,
        # kind=2 core flags — one pass, no extra exchange
        t = g.sort_by([("dst", "ascending")])
        d = t["dst"].to_numpy(zero_copy_only=False)
        s = t["src"].to_numpy(zero_copy_only=False)
        sc = t["src_core"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        deg = np.diff(np.r_[starts, d.size])
        my_core = np.repeat((deg + 1 >= MINPTS), deg)
        ce = my_core & (sc == 1)
        bc = (~my_core) & (sc == 1)
        core_ids = d[starts][(deg + 1 >= MINPTS)]
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.zeros(int(ce.sum()), np.int64),
                np.ones(int(bc.sum()), np.int64),
                np.full(core_ids.size, 2, np.int64),
            ])),
            "a": pa.array(np.concatenate(
                [d[ce], d[bc], core_ids])),
            "b": pa.array(np.concatenate(
                [s[ce], s[bc], core_ids])),
        })

    tagged = (
        _tag_bucket(msgs, "dst", 64)
        .groupby("__b")
        .map_groups(round2, batch_format="pyarrow")
        .materialize()  # reused three ways below
    )

    def pick(kind):
        return tagged.map_batches(
            lambda b, k=kind: b.filter(pc.equal(b["kind"], k)).select(
                ["a", "b"]),
            batch_format="pyarrow",
        )

    cc = connected_components(pick(0), src="a", dst="b")

    # core labels: component id where connected, own id when isolated
    cl = shuffle_join(
        _typed(pick(2).map_batches(
            lambda b: pa.table({"id": b["a"]}),
            batch_format="pyarrow"), id=pa.int64()),
        _typed(cc.map_batches(
            lambda b: pa.table({"id": b["node"],
                                "cluster_id": b["cluster_id"]}),
            batch_format="pyarrow",
        ), id=pa.int64(), cluster_id=pa.int64()),
        ["id"], how="left",
    )
    core_label = _typed(cl.map_batches(
        lambda b: pa.table({
            "id": b["id"],
            "label": pc.cast(pc.coalesce(b["cluster_id"], b["id"]),
                             pa.int64()),
        }),
        batch_format="pyarrow",
    ), id=pa.int64(), label=pa.int64()).materialize()

    # border: non-core point adjacent to a core -> min core label
    nb = shuffle_join(
        _typed(pick(1).map_batches(
            lambda b: pa.table({"nc": b["a"], "id": b["b"]}),
            batch_format="pyarrow"), nc=pa.int64(), id=pa.int64()),
        core_label, ["id"],
    )
    border = grouped_aggregate(
        nb.map_batches(
            lambda b: pa.table({"id": b["nc"], "label": b["label"]}),
            batch_format="pyarrow",
        ),
        ["id"], [("label", "min", "label")],
    )

    # one labels table (core ids and border ids are disjoint), one
    # left join onto the id spine
    labels = _typed(core_label.map_batches(
        lambda b: pa.table({"id": b["id"], "label": b["label"],
                            "role": pa.array(
                                np.zeros(len(b), np.int64))}),
        batch_format="pyarrow",
    ), id=pa.int64(), label=pa.int64(), role=pa.int64()).union(
        _typed(border.map_batches(
            lambda b: pa.table({"id": b["id"], "label": b["label"],
                                "role": pa.array(
                                    np.ones(len(b), np.int64))}),
            batch_format="pyarrow",
        ), id=pa.int64(), label=pa.int64(), role=pa.int64())
    )
    ids = _read(sf_dir, "events", columns=["event_id"])
    lab = shuffle_join(
        ids.map_batches(
            lambda b: pa.table({"id": b["event_id"]}),
            batch_format="pyarrow",
        ),
        labels, ["id"], how="left",
    )

    def final(batch: pa.Table) -> pa.Table:
        lv = batch["label"]
        rv = batch["role"]
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        if isinstance(rv, pa.ChunkedArray):
            rv = rv.combine_chunks()
        return pa.table({
            "event_id": batch["id"],
            "role": pc.cast(
                pc.coalesce(rv, pa.scalar(2, pa.int64())), pa.int64()),
            "label": pc.cast(
                pc.coalesce(lv, pa.scalar(-1, pa.int64())), pa.int64()),
        })

    return lab.map_batches(final, batch_format="pyarrow")


def phrase_query_docs(sf_dir: str):
    """Positional phrase retrieval: documents containing the exact
    adjacent-token phrase 'hash join' (lower + single-space tokenizer,
    the corpus convention), with the occurrence count — the capability
    a doc-level inverted index cannot answer.  Vectorized over the
    flattened token buffer with list-offset boundary guards; zero
    shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    W1, W2 = "hash", "join"

    def hits(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(text), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        off = np.asarray(toks.offsets)
        e1 = pc.equal(flat, W1).to_numpy(zero_copy_only=False)
        e2 = pc.equal(flat, W2).to_numpy(zero_copy_only=False)
        # adjacent match at flat position i: tok[i]==W1 and
        # tok[i+1]==W2, where i and i+1 belong to the same doc
        adj = np.zeros(len(e1), dtype=bool)
        if len(e1) > 1:
            adj[:-1] = e1[:-1] & e2[1:]
        # zero the last slot of every doc (i+1 crosses the boundary)
        last = off[1:] - 1
        adj[last[(last >= 0) & (last < adj.size)]] &= False
        per_doc = np.add.reduceat(
            adj.astype(np.int64), off[:-1]
        ) if len(off) > 1 else np.zeros(0, np.int64)
        per_doc = np.where(np.diff(off) == 0, 0, per_doc)
        keep = per_doc > 0
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(
                pa.array(keep)),
            "n_hits": pa.array(per_doc[keep]),
        })

    return ds.map_batches(hits, batch_format="pyarrow")


_MERKLE_LEVELS = 6  # 64 leaf buckets -> root


def merkle_tree_events(sf_dir: str):
    """Merkle verification tree over events: 64 leaf checksums
    (bucket = event_id % 64; leaf = SUM of splitmix64(id * 2^20 +
    cents) mod 2^64 — commutative, so block order never matters),
    parents = splitmix64(left + 3 * right) up to the root.  The
    anti-entropy primitive: two replicas diff by walking O(log n)
    hashes instead of re-scanning (extends the flat
    ``partition_checksums_events``).  One bounded keyed exchange for
    the leaves; the tree folds driver-side over 127 rows."""
    import ray.data as rd

    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def leaf(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = splitmix64((ids * (1 << 20) + cents).view(np.uint64))
            # per-batch partial sums WRAP mod 2^64 (uint64 add)
            acc = np.zeros(64, dtype=np.uint64)
            np.add.at(acc, ids % 64, h)
        return pa.table({
            "bucket": pa.array(np.arange(64, dtype=np.int64)),
            "partial": pa.array(acc.view(np.int64)),
        })

    # per-batch partials are 64 rows each; fold the bounded partial
    # table driver-side in uint64 so the sum wraps mod 2^64 exactly
    # (Ray's Sum aggregate promotes to Python ints and cannot wrap)
    parts = ds.map_batches(leaf, batch_format="pyarrow").take_all()
    lv = np.zeros(64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in parts:
            lv[int(r["bucket"])] += np.int64(r["partial"]).view(
                np.uint64)
    lv = lv.view(np.int64)
    out_level, out_idx, out_hash = [], [], []
    cur = lv.view(np.uint64)
    out_level += [0] * 64
    out_idx += list(range(64))
    out_hash += cur.view(np.int64).tolist()
    from geodata_ray.sources.synth import splitmix64 as sm

    for level in range(1, _MERKLE_LEVELS + 1):
        with np.errstate(over="ignore"):
            cur = sm(cur[0::2] + np.uint64(3) * cur[1::2])
        out_level += [level] * cur.size
        out_idx += list(range(cur.size))
        out_hash += cur.view(np.int64).tolist()
    return rd.from_arrow(pa.table({
        "level": pa.array(out_level, pa.int64()),
        "idx": pa.array(out_idx, pa.int64()),
        "hash_i64": pa.array(out_hash, pa.int64()),
    }))


def label_centroids_embeddings(sf_dir: str):
    """Per-label embedding centroid state (the supervised prototype /
    nearest-class-mean primitive): per (label, dimension), the exact
    integer sum of FLOOR(x * 2^20) quantized components plus the class
    count — the caller divides for the float centroid; the state
    hash-matches.  Per-batch dense (label x dim) partial sums pre-
    combine before the one bounded exchange (|labels| x 64 rows)."""
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        dim = flat.size // max(len(batch), 1) if len(batch) else 0
        if len(batch) == 0 or dim == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "sum_q": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        q = np.floor(flat * 1048576.0).astype(np.int64).reshape(
            len(batch), dim)
        ulab, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros((ulab.size, dim), dtype=np.int64)
        np.add.at(acc, inv, q)
        cnt = np.bincount(inv, minlength=ulab.size).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, dim)),
            "dim": pa.array(np.tile(np.arange(1, dim + 1), ulab.size)),
            "sum_q": pa.array(acc.ravel()),
            "n": pa.array(np.repeat(cnt, dim)),
        })

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("sum_q", "sum", "sum_q"), ("n", "sum", "n")],
    )


def forward_fill_user_values(sf_dir: str):
    """LOCF imputation (forward fill): per user, the daily LAST
    observed value (ties by event_id) densified over the user's
    [first, last] active-day span, missing days carrying the previous
    observation with ``filled = 1``.  The data-cleaning primitive for
    per-entity daily series.  One (user, day) keyed exchange for the
    daily lasts; the fill runs in the bucketed per-user pass
    (vectorized searchsorted from each spine day to its observation);
    span width is bounded by the data's own day range."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        day = pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                      pa.int64())  # us since epoch, day-aligned
        return pa.table({
            "user_id": batch["user_id"],
            "day_us": day,
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "cents": cents,
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"),
                       ("day_us", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["day_us"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        DAY = 86_400_000_000
        out_u, out_d, out_c, out_f = [], [], [], []
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], u.size]
        for s, e in zip(starts, ends):
            dd, cc = d[s:e], c[s:e]
            # last per day: the final row of each equal-day run
            last = np.r_[dd[1:] != dd[:-1], True]
            dd, cc = dd[last], cc[last]
            spine = np.arange(dd[0], dd[-1] + DAY, DAY)
            pos = np.searchsorted(dd, spine, side="right") - 1
            out_u.append(np.full(spine.size, u[s]))
            out_d.append(spine)
            out_c.append(cc[pos])
            out_f.append((~np.isin(spine, dd)).astype(np.int64))
        return pa.table({
            "user_id": pa.array(np.concatenate(out_u)),
            "day_us": pa.array(np.concatenate(out_d)),
            "cents": pa.array(np.concatenate(out_c)),
            "filled": pa.array(np.concatenate(out_f)),
        })

    return (
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def load_profile_events(sf_dir: str):
    """Seasonal load profile: exact event counts per (day-of-week,
    hour-of-day) cell plus the integer deviation ``n * 168 - total``
    (positive = hotter than a flat profile) — the capacity-planning /
    anomaly-baseline aggregate.  One bounded (168-row) exchange; the
    total folds from the same table."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def prep(batch: pa.Table) -> pa.Table:
        # ISO day of week 1-7 (DuckDB isodow), hour 0-23
        dow = pc.cast(
            pc.day_of_week(batch["ts"], count_from_zero=False),
            pa.int64())
        hr = pc.cast(pc.hour(batch["ts"]), pa.int64())
        return pa.table({"dow": dow, "hour": hr})

    cells = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["dow", "hour"], [("hour", "count", "n")],
    ).materialize()  # <= 168 rows
    total = int(cells.sum("n"))

    def dev(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "dow": batch["dow"],
            "hour": batch["hour"],
            "n": batch["n"],
            "dev_x168": pa.array(n * 168 - total),
        })

    return cells.map_batches(dev, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Twenty-fourth wave: KS drift test, MMR diversity rerank, near-dup
# canonicalization.
# ---------------------------------------------------------------------------


def ks_test_events(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov statistic between the 'view' and
    'click' value distributions — the distribution-drift detector
    (train/serve skew, feed corruption) — with DIVISION-FREE exact
    integers: ``D = max |F_a - F_b|`` becomes
    ``max |cum_a * n_b - cum_b * n_a|`` over the merged support.  The
    support histogram is one bounded keyed exchange; the cumulative
    walk runs over the bounded (distinct cents) table — the exact-
    quantile machinery's shape."""
    import ray.data as rd

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        isv = pc.equal(batch["event_type"], "view")
        isc = pc.equal(batch["event_type"], "click")
        t = batch.filter(pc.or_(isv, isc))
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(t["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        a = pc.cast(pc.equal(t["event_type"], "view"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "cents": cents,
            "a": pa.array(a),
            "b": pa.array(1 - a),
        })

    hist = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["cents"], [("a", "sum", "a"), ("b", "sum", "b")],
    ).to_pandas().sort_values("cents", ignore_index=True)
    # bounded: one row per distinct cents value (the value-domain
    # histogram), independent of row count — same contract as
    # exact_int_quantiles
    ca = hist["a"].to_numpy().cumsum()
    cb = hist["b"].to_numpy().cumsum()
    na, nb = int(ca[-1]), int(cb[-1])
    d = np.abs(ca * nb - cb * na)
    return rd.from_arrow(pa.table({
        "grp": pa.array([0], pa.int64()),
        "ks_scaled": pa.array([int(d.max())], pa.int64()),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
    }))


def mmr_rerank_embeddings(sf_dir: str):
    """Maximal Marginal Relevance rerank (diversity-aware retrieval):
    query = vector 0; the top-20 candidates by exact integer dot
    product (FLOOR-2^10 quantized components) are greedily reranked
    with lambda = 1/2 — pick k+1 maximizes ``rel - max_sim_to_
    selected`` (ties by vec_id), which demotes near-duplicates of
    already-picked results.  Relevance scoring streams distributed;
    the greedy runs over the BOUNDED 20x20 candidate matrix; the
    oracle replays the greedy as a list-carrying recursive CTE."""
    import ray.data as rd

    import pyarrow.parquet as pq

    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    q0 = q0.filter(pc.equal(q0["vec_id"], 0))
    qv = np.floor(
        np.array(q0["embedding"].to_pylist()[0], dtype=np.float64)
        * 1024.0
    ).astype(np.int64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def rel(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch["vec_id"], 0))
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "rel_q": pa.array([], pa.int64())})
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64) * 1024.0
        ).astype(np.int64).reshape(len(t), -1)
        return pa.table({
            "vec_id": t["vec_id"],
            "rel_q": pa.array(q @ qv),
        })

    top = ds.map_batches(rel, batch_format="pyarrow").sort(
        ["rel_q", "vec_id"], descending=[True, False]
    ).limit(20).take_all()
    cand_ids = np.array([r["vec_id"] for r in top], dtype=np.int64)
    rels = np.array([r["rel_q"] for r in top], dtype=np.int64)

    # bounded 20x20 sim matrix from the candidates' own vectors
    ct = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    ct = ct.filter(pc.is_in(ct["vec_id"],
                            value_set=pa.array(cand_ids)))
    cv = ct["vec_id"].to_numpy(zero_copy_only=False)
    cm = np.floor(
        np.array(ct["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(cv)}
    M = cm[[pos[int(v)] for v in cand_ids]]
    sims = M @ M.T

    picked, chosen = [], np.zeros(cand_ids.size, dtype=bool)
    for k in range(min(10, cand_ids.size)):
        rem = np.flatnonzero(~chosen)
        if chosen.any():
            scores = rels[rem] - sims[rem][:, chosen].max(axis=1)
        else:
            scores = rels[rem]
        i = int(rem[np.lexsort((cand_ids[rem], -scores))[0]])
        chosen[i] = True
        picked.append((k + 1, int(cand_ids[i]), int(rels[i])))
    return rd.from_arrow(pa.table({
        "k": pa.array([p[0] for p in picked], pa.int64()),
        "vec_id": pa.array([p[1] for p in picked], pa.int64()),
        "rel_q": pa.array([p[2] for p in picked], pa.int64()),
    }))


def dedup_canonical_docs(sf_dir: str):
    """Near-duplicate CANONICALIZATION — the end state of corpus
    dedup: every member of a near-dup cluster maps to its cluster's
    representative (longest text, ties to the smallest doc_id), so
    downstream consumers rewrite references instead of just dropping
    rows.  Pairs are the banded MinHash stream, clusters the striped
    union-find, the representative one keyed argmax over cluster
    members joined with their lengths."""
    from geodata_ray.stages.graphcc import connected_components
    from geodata_ray.stages.relational import shuffle_join

    import ray.data as rd

    pairs = near_dup_pairs(sf_dir)
    comp = connected_components(pairs, src="id_a", dst="id_b")

    corpus = _ndup_corpus(sf_dir)
    lens = rd.from_arrow(pa.table({
        "node": corpus["doc_id"],
        "n_chars": pc.cast(
            pc.utf8_length(corpus["text"]), pa.int64()),
    }))
    m = shuffle_join(comp, lens, ["node"])

    def best(g: pa.Table) -> pa.Table:
        n = g["n_chars"].to_numpy(zero_copy_only=False)
        v = g["node"].to_numpy(zero_copy_only=False)
        i = int(np.lexsort((v, -n))[0])
        return pa.table({
            "cluster_id": g["cluster_id"].slice(0, 1),
            "canonical_id": pa.array([int(v[i])], pa.int64()),
        })

    reps = m.groupby("cluster_id").map_groups(
        best, batch_format="pyarrow")
    out = shuffle_join(comp, reps, ["cluster_id"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["node"],
            "canonical_id": batch["canonical_id"],
        })

    return out.map_batches(proj, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Twenty-third wave: language confusion matrix, centroid-distance
# outliers, RLE run-length audit, session-duration quantiles.
# ---------------------------------------------------------------------------


def lang_confusion_docs(sf_dir: str):
    """Language-ID confusion matrix: declared ``lang`` column crossed
    with the stopword-profile predictor — the model-eval view of the
    langid operator (per-class precision/recall numerators fall out of
    the counts).  One vectorized prediction pass re-attaching the
    declared label positionally, one bounded (|langs|^2) exchange."""
    from geodata_ray.stages.textstats import langid_batch

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang"])

    def pred(batch: pa.Table) -> pa.Table:
        out = langid_batch(batch)  # row-aligned with the input
        return pa.table({
            "lang": batch["lang"],
            "lang_pred": out["lang_pred"],
        })

    return grouped_aggregate(
        ds.map_batches(pred, batch_format="pyarrow"),
        ["lang", "lang_pred"],
        [("lang_pred", "count", "n_docs")],
    )


def label_outliers_embeddings(sf_dir: str):
    """Mislabeled-vector candidates: per label, the 5 vectors farthest
    from their class centroid — with EXACT integer algebra: comparing
    ``|x - s/n|^2`` across vectors of one class equals comparing
    ``|n*q_x - s|^2`` (q = FLOOR-2^20 quantization, s = class sum, n =
    class count), so no division ever happens.  Centroid state is the
    bounded (label x dim) table broadcast back; top-5 per label is a
    vectorized argsort over the bounded label domain."""
    import ray.data as rd

    cent = label_centroids_embeddings(sf_dir).take_all()  # |labels|x64
    labels = sorted({int(r["label"]) for r in cent})
    dims = max(int(r["dim"]) for r in cent)
    S = np.zeros((len(labels), dims), dtype=np.int64)
    N = np.zeros(len(labels), dtype=np.int64)
    lidx = {l: i for i, l in enumerate(labels)}
    for r in cent:
        S[lidx[int(r["label"])], int(r["dim"]) - 1] = int(r["sum_q"])
        N[lidx[int(r["label"])]] = int(r["n"])

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "label", "embedding"])

    def dist(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "dist2_scaled": pa.array([], pa.int64())})
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64) * 1048576.0
        ).astype(np.int64).reshape(len(batch), -1)
        li = np.array([lidx[x] for x in lab], dtype=np.int64)
        diff = N[li, None] * q - S[li]
        if diff.size and int(np.abs(diff).max()) > 379_625_062:
            # sqrt(2^63 / 64): 64 squared terms must fit int64
            raise OverflowError(
                "label_outliers: |n*q - s| too large — rescale")
        d2 = np.einsum("ij,ij->i", diff, diff)
        return pa.table({
            "label": pa.array(lab),
            "vec_id": batch["vec_id"],
            "dist2_scaled": pa.array(d2),
        })

    def top5(g: pa.Table) -> pa.Table:
        d2 = g["dist2_scaled"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -d2))[:5]
        rk = np.arange(1, order.size + 1, dtype=np.int64)
        return pa.table({
            "label": g["label"].take(pa.array(order)),
            "rk": pa.array(rk),
            "vec_id": g["vec_id"].take(pa.array(order)),
            "dist2_scaled": g["dist2_scaled"].take(pa.array(order)),
        })

    return (
        ds.map_batches(dist, batch_format="pyarrow")
        .groupby("label")
        .map_groups(top5, batch_format="pyarrow")
    )


def rle_runs_events(sf_dir: str):
    """Run-length audit of the event-type stream in global
    (ts, event_id) order: per type, the number of RUNS (maximal
    constant stretches) and total rows — the storage/compression
    diagnostic (RLE ratio = n_rows / n_runs) and the state-transition
    count.  Distributed shape: range-partitioned sort, per-block
    vectorized run counting, then a driver-side stitch over the
    BOUNDED (one per block) boundary records — runs spanning a block
    boundary are merged by comparing last/first types of adjacent
    blocks."""
    import ray.data as rd

    ev = _read(sf_dir, "events",
               columns=["event_type", "ts", "event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
        })

    s = ev.map_batches(prep, batch_format="pyarrow").sort(
        ["ts_us", "event_id"]).materialize()

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], pa.string()),
            "runs": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64()),
            "__first_ts": pa.array([], pa.int64()),
            "__first_eid": pa.array([], pa.int64()),
            "__first_type": pa.array([], pa.string()),
            "__last_type": pa.array([], pa.string()),
            "__is_boundary": pa.array([], pa.int64()),
        })
        if len(batch) == 0:
            return empty
        col = batch["event_type"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        de = col.dictionary_encode()
        idx = de.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        vocab = de.dictionary.to_pylist()
        starts = np.r_[True, idx[1:] != idx[:-1]]
        runs = np.bincount(idx[starts], minlength=len(vocab))
        rows = np.bincount(idx, minlength=len(vocab))
        n = len(vocab)
        return pa.table({
            "event_type": pa.array(vocab + [""], pa.string()),
            "runs": pa.array(np.r_[runs, 0].astype(np.int64)),
            "rows": pa.array(np.r_[rows, 0].astype(np.int64)),
            "__first_ts": pa.array(
                [0] * n + [int(batch["ts_us"][0].as_py())],
                pa.int64()),
            "__first_eid": pa.array(
                [0] * n + [int(batch["event_id"][0].as_py())],
                pa.int64()),
            "__first_type": pa.array(
                [""] * n + [vocab[idx[0]]], pa.string()),
            "__last_type": pa.array(
                [""] * n + [vocab[idx[-1]]], pa.string()),
            "__is_boundary": pa.array([0] * n + [1], pa.int64()),
        })

    parts = s.map_batches(per_block, batch_size=None,
                          batch_format="pyarrow").take_all()
    agg: dict[str, list] = {}
    bounds = []
    for r in parts:
        if int(r["__is_boundary"]):
            bounds.append((int(r["__first_ts"]), int(r["__first_eid"]),
                           r["__first_type"], r["__last_type"]))
        else:
            a = agg.setdefault(r["event_type"], [0, 0])
            a[0] += int(r["runs"])
            a[1] += int(r["rows"])
    # stitch: a run continuing across adjacent blocks was counted
    # once per block — subtract one per same-type adjacency
    bounds.sort()
    for cur, prev in zip(bounds[1:], bounds[:-1]):
        if cur[2] == prev[3]:  # this block starts what prev ended
            agg[cur[2]][0] -= 1
    out = sorted(agg)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out, pa.string()),
        "n_runs": pa.array([agg[k][0] for k in out], pa.int64()),
        "n_rows": pa.array([agg[k][1] for k in out], pa.int64()),
    }))


def session_duration_quantiles_events(sf_dir: str):
    """Session-duration distribution: exact quantile_disc (p50 / p90 /
    p99) of the 30-minute-gap session lengths in seconds — quantiles
    over a DERIVED entity stream, not a raw column.  Session rows are
    the bounded sessionization output; the quantile walk is the
    bounded-histogram exact machinery."""
    import ray.data as rd

    from geodata_ray.stages.relational import exact_int_quantiles
    from geodata_ray.stages.windows import session_windows

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    sess = session_windows(ev, key_col="user_id", ts_col="ts",
                           gap_minutes=30)

    def dur(batch: pa.Table) -> pa.Table:
        d = pc.divide(
            pc.subtract(pc.cast(batch["session_end"], pa.int64()),
                        pc.cast(batch["session_start"], pa.int64())),
            1_000_000,
        )
        return pa.table({"dur_s": pc.cast(d, pa.int64())})

    vals = exact_int_quantiles(
        sess.map_batches(dur, batch_format="pyarrow"), "dur_s",
        [0.5, 0.9, 0.99],
    )
    if not vals:  # no sessions at all: the oracle emits zero rows
        return rd.from_arrow(pa.table({
            "q_pct": pa.array([], pa.int64()),
            "dur_s": pa.array([], pa.int64()),
        }))
    return rd.from_arrow(pa.table({
        "q_pct": pa.array([50, 90, 99], pa.int64()),
        "dur_s": pa.array([int(v) for v in vals], pa.int64()),
    }))


# ---------------------------------------------------------------------------
# Twenty-second wave: partitioned bloom index audit, rank
# normalization, train/eval fold-leakage audit, TWAP, bounce rate.
# ---------------------------------------------------------------------------

_BLOOM_PROBES = (1, 3, 5, 7, 911)  # 911 is absent from every SF


def bloom_partition_index_events(sf_dir: str):
    """File/partition-level Bloom INDEX audit — the data-skipping
    structure for point lookups on unsorted columns (zonemaps only
    prune sorted ones): events partition by ``event_id % 16``, each
    partition keeps a partitioned-Bloom bit set over its user_ids;
    probing five fixed users yields, per (probe, partition),
    ``bloom_hit`` (all d bits set -> partition must be scanned) and
    ``present`` (exact membership) — hits with present=0 are the
    measured false-positive cost.  Bit tables are constant-bounded
    (16 x d x 2^lw); one distinct exchange builds them."""
    import ray.data as rd

    from geodata_ray.stages.sketch import CMS_D, CMS_LW, cms_cells_batch

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def bits(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        part = (ids % 16).astype(np.int64)
        depths, cells = cms_cells_batch(u)
        bit = depths * np.int64(1 << CMS_LW) + cells
        # cms_cells_batch flattens depth-major ([d0 rows..., d1 rows...])
        t = pa.table({
            "part": pa.array(np.tile(part, CMS_D)),
            "bit": pa.array(bit),
        })
        out = t.group_by(["part", "bit"]).aggregate([([], "count_all")])
        return out.select(["part", "bit"])

    bit_tbl = grouped_aggregate(
        ds.map_batches(bits, batch_format="pyarrow"),
        ["part", "bit"], [("bit", "count", "__n")],
    ).drop_columns(["__n"]).take_all()  # <= 16 * d * 2^lw rows
    part_bits: dict[int, set] = {}
    for r in bit_tbl:
        part_bits.setdefault(int(r["part"]), set()).add(int(r["bit"]))

    # exact presence of the probes (tiny filtered exchange)
    probes = np.array(_BLOOM_PROBES, dtype=np.int64)

    def pres(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(u, probes)
        return pa.table({
            "part": pa.array((ids[keep] % 16).astype(np.int64)),
            "user_id": pa.array(u[keep]),
        })

    present = grouped_aggregate(
        ds.map_batches(pres, batch_format="pyarrow"),
        ["part", "user_id"], [("user_id", "count", "__n")],
    ).drop_columns(["__n"]).take_all()
    pset = {(int(r["part"]), int(r["user_id"])) for r in present}

    depths, cells = cms_cells_batch(probes)
    pbits = (depths * np.int64(1 << CMS_LW) + cells).reshape(
        CMS_D, probes.size)
    rows = {"probe_user": [], "part": [], "bloom_hit": [],
            "present": []}
    for pi, pu in enumerate(probes):
        need = {int(pbits[j, pi]) for j in range(CMS_D)}
        for part in range(16):
            rows["probe_user"].append(int(pu))
            rows["part"].append(part)
            rows["bloom_hit"].append(
                int(need <= part_bits.get(part, set())))
            rows["present"].append(int((part, int(pu)) in pset))
    return rd.from_arrow(pa.table({
        "probe_user": pa.array(rows["probe_user"], pa.int64()),
        "part": pa.array(rows["part"], pa.int64()),
        "bloom_hit": pa.array(rows["bloom_hit"], pa.int64()),
        "present": pa.array(rows["present"], pa.int64()),
    }))


def rank_normalize_embeddings(sf_dir: str):
    """Quantile (rank) normalization of the embedding matrix: per
    dimension, each vector's value replaced by its 1-based rank
    under the deterministic (quantized value, vec_id) order — the
    rank-based feature-scaling step that makes dimensions comparable
    regardless of their marginal distributions.  Explode to
    (vec_id, dim, q) once, exchange on the 64-dim key, vectorized
    argsort rank per dimension group."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def explode(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = len(batch)
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        dim = flat.size // n
        q = np.floor(flat * 1048576.0).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(
                batch["vec_id"].to_numpy(zero_copy_only=False), dim)),
            "dim": pa.array(np.tile(
                np.arange(1, dim + 1, dtype=np.int64), n)),
            "q": pa.array(q),
        })

    def per_dim(g: pa.Table) -> pa.Table:
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        q = g["q"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, q))
        rank = np.empty(v.size, dtype=np.int64)
        rank[order] = np.arange(1, v.size + 1)
        return pa.table({
            "vec_id": g["vec_id"],
            "dim": g["dim"],
            "rank": pa.array(rank),
        })

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("dim")
        .map_groups(per_dim, batch_format="pyarrow")
    )


def fold_leakage_audit_docs(sf_dir: str):
    """Train/eval fold-leakage audit: k-fold assignment
    (``doc_id %% 5``) crossed with the near-duplicate pair stream —
    every pair whose endpoints land in DIFFERENT folds is an
    evaluation leak (a near-copy of a training doc sits in the held-
    out fold).  The hygiene check every deduplicated-corpus split
    needs; pair generation is the banded MinHash join, the audit is a
    stateless filter on it."""
    pairs = near_dup_pairs(sf_dir)

    def leak(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        # fold = (id // 7) % 5: NOT aligned with the mutation offset,
        # so planted near-copies really do straddle folds
        fa, fb = (a // 7) % 5, (b // 7) % 5
        keep = fa != fb
        return pa.table({
            "id_a": pa.array(a[keep]),
            "id_b": pa.array(b[keep]),
            "fold_a": pa.array(fa[keep]),
            "fold_b": pa.array(fb[keep]),
        })

    return pairs.map_batches(leak, batch_format="pyarrow")


def twap_user_values(sf_dir: str):
    """Time-weighted average price (TWAP) state per user: each
    observation's value holds until the next one, so
    ``twap = sum(cents_i * gap_i) / span`` — emitted as the exact
    integer numerator, span, and observation count (the float ratio is
    the caller's).  Same bucketed per-user pass as the inter-arrival
    median (one exchange); products are overflow-guarded."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "cents": cents,
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "twap_num": pa.array([], pa.int64()),
                          "span_us": pa.array([], pa.int64()),
                          "n_obs": pa.array([], pa.int64())})
        if u.size < 2:
            return empty
        same = u[1:] == u[:-1]
        gaps = np.where(same, np.diff(ts), 0)
        if gaps.size and c.size and int(np.abs(c).max()) > 0 \
                and int(gaps.max()) > (2**62) // max(
                    int(np.abs(c).max()), 1):
            raise OverflowError(
                "twap: cents * gap_us exceeds int64 — rescale")
        contrib = np.r_[c[:-1] * gaps, np.int64(0)]
        starts = np.flatnonzero(np.r_[True, ~same])
        ends = np.r_[starts[1:], u.size]
        n = ends - starts
        num = np.add.reduceat(contrib, starts)
        span = ts[ends - 1] - ts[starts]
        keep = n >= 2  # single-observation users have no span
        return pa.table({
            "user_id": pa.array(u[starts][keep]),
            "twap_num": pa.array(num[keep]),
            "span_us": pa.array(span[keep]),
            "n_obs": pa.array(n[keep].astype(np.int64)),
        })

    return (
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def bounce_rate_daily_events(sf_dir: str):
    """Daily bounce rate state (the classic web-analytics KPI): per
    day of session START, total sessions and single-event (bounce)
    sessions — composed over the engine's 30-minute-gap
    sessionization.  Ratios stay with the caller; counts hash-match."""
    from geodata_ray.stages.windows import session_windows

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    sess = session_windows(ev, key_col="user_id", ts_col="ts",
                           gap_minutes=30)

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["session_start"], unit="day")
        one = pc.cast(pc.equal(batch["n_events"], 1), pa.int64())
        return pa.table({
            "day": day,
            "n_sessions": pa.array(np.ones(len(batch), np.int64)),
            "n_bounces": one,
        })

    return grouped_aggregate(
        sess.map_batches(daily, batch_format="pyarrow"),
        ["day"],
        [("n_sessions", "sum", "n_sessions"),
         ("n_bounces", "sum", "n_bounces")],
    )


# ---------------------------------------------------------------------------
# Twentieth wave: Hilbert layout, pseudonymization, self-join-size /
# F2 skew audit, exact audience overlap, Zipf state, grouped mode.
# ---------------------------------------------------------------------------


def hilbert_xy2d(x: np.ndarray, y: np.ndarray,
                 order: int = 15) -> np.ndarray:
    """Vectorized Hilbert-curve index of 2-D integer coords (the
    classic xy2d bit loop, ``order`` rounds of flip+rotate) — the
    locality-preserving alternative to the Morton/Z layout
    (``cellmath.morton_interleave2``): no diagonal jumps, better range
    clustering for storage layout.  Pure int64 ops, so the DuckDB
    oracle unrolls the same loop stage-by-stage and matches exactly."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_rank_events(sf_dir: str):
    """Hilbert space-filling-curve storage key per event (15-bit
    quantized derived lat/lon -> 30-bit curve position) — the
    clustered-write layout that beats Z-order on range-query locality.
    Stateless vectorized map, zero shuffle; the oracle replays the
    xy2d loop as an unrolled 15-stage CTE chain."""
    ds = _read(sf_dir, "events", columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        lat = _derive_lat_np(ids)
        lon = _derive_lon_np(ids)
        qy = np.floor((lat + 90.0) / 180.0 * 32768.0).astype(np.int64)
        qx = np.floor((lon + 180.0) / 360.0 * 32768.0).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "hkey": pa.array(hilbert_xy2d(qx, qy, 15)),
        })

    return ds.map_batches(prep, batch_format="pyarrow")


_PSEUDO_SEED = 20260819


def pseudonymize_users_events(sf_dir: str):
    """Deterministic pseudonymization (the GDPR-pipeline tokenizer):
    user ids replaced by the signed int64 view of
    ``splitmix64(user_id + seed)`` — consistent across every table
    touching the id, keyless to reverse without the seed, and
    collision-free (splitmix64 is a bijection on u64).  Stateless
    vectorized map, zero shuffle."""
    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def tok(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = splitmix64(
            (u + _PSEUDO_SEED).view(np.uint64)
        ).view(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "user_token": pa.array(t),
        })

    return ds.map_batches(tok, batch_format="pyarrow")


def selfjoin_size_lineitem(sf_dir: str):
    """Self-join-size / skew audit on l_partkey: the exact second
    frequency moment ``F2 = sum(cnt^2)`` (= the row count of the
    partkey self-join), key count, and max key frequency — the three
    numbers a planner needs before scheduling a join or flagging salt-
    worthy keys.  One pre-combined keyed exchange builds the counts;
    F2/max fold in a constant-key second pass over the bounded key
    table."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey"])
    counts = grouped_aggregate(
        li, ["l_partkey"], [("l_partkey", "count", "cnt")],
        coalesce=0,
    )

    def sq(batch: pa.Table) -> pa.Table:
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        return pa.table({
            "grp": pa.array(np.zeros(c.size, np.int64)),
            "c2": pa.array(c * c),
            "cnt": batch["cnt"],
        })

    return grouped_aggregate(
        counts.map_batches(sq, batch_format="pyarrow"),
        ["grp"],
        [("c2", "sum", "f2_selfjoin_rows"),
         ("cnt", "count", "n_keys"),
         ("cnt", "max", "max_cnt")],
    )


def audience_overlap_types_events(sf_dir: str):
    """EXACT audience overlap of the 'view' and 'click' user sets:
    |A|, |B|, |A and B|, |A or B| as one row — the exact companion of
    ``hll_merge_types_events`` (same shape the sketch estimates), and
    the inputs to Jaccard/overlap coefficients.  One distinct
    (user, flag) exchange; the set algebra folds over per-user flag
    sums."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def flags(batch: pa.Table) -> pa.Table:
        isv = pc.equal(batch["event_type"], "view")
        isc = pc.equal(batch["event_type"], "click")
        t = batch.filter(pc.or_(isv, isc))
        v = pc.cast(pc.equal(t["event_type"], "view"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "v": pa.array(v),
            "c": pa.array(1 - v),
        })

    per_user = grouped_aggregate(
        ev.map_batches(flags, batch_format="pyarrow"),
        ["user_id"], [("v", "max", "has_v"), ("c", "max", "has_c")],
    )

    def fold(batch: pa.Table) -> pa.Table:
        hv = batch["has_v"].to_numpy(zero_copy_only=False)
        hc = batch["has_c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "grp": pa.array(np.zeros(hv.size, np.int64)),
            "v": pa.array(hv),
            "c": pa.array(hc),
            "b": pa.array(hv & hc),
            "u": pa.array(np.ones(hv.size, np.int64)),
        })

    return grouped_aggregate(
        per_user.map_batches(fold, batch_format="pyarrow"),
        ["grp"],
        [("v", "sum", "n_view"), ("c", "sum", "n_click"),
         ("b", "sum", "n_both"), ("u", "sum", "n_union")],
    )


def zipf_state_docs(sf_dir: str):
    """Zipf (rank-frequency) diagnostic state of the corpus: the top
    100 terms by exact count (ties broken by term), each with its
    rank, count, and the fixed-point ``qlog2`` of both — the integer
    regression inputs for a power-law fit (slope ~ -1 for Zipfian
    text), hash-exact because qlog2 is the engine's deterministic
    integer log (stages/lm.py).  Term counts are one pre-combined
    exchange; the top-100 is sort+limit over the vocabulary table."""
    from geodata_ray.stages.lm import qlog2_fixed

    ds = _read(sf_dir, "documents", columns=["text"])

    def terms(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(batch["text"].combine_chunks()
                          if isinstance(batch["text"], pa.ChunkedArray)
                          else batch["text"]), " ")
        flat = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks).flatten()
        t = pa.table({"term": flat})
        out = t.group_by(["term"]).aggregate([([], "count_all")])
        ncol = next(c for c in out.column_names if c != "term")
        return pa.table({"term": out["term"], "n": out[ncol]})

    vocab = grouped_aggregate(
        ds.map_batches(terms, batch_format="pyarrow"),
        ["term"], [("n", "sum", "n")],
    )
    top = vocab.sort(["n", "term"],
                     descending=[True, False]).limit(100).take_all()
    terms_l = [r["term"] for r in top]
    ns = np.array([r["n"] for r in top], dtype=np.int64)
    ranks = np.arange(1, ns.size + 1, dtype=np.int64)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "rank": pa.array(ranks),
        "term": pa.array(terms_l, pa.string()),
        "n": pa.array(ns),
        "qlog2_rank_fp": pa.array(qlog2_fixed(ranks).astype(np.int64)),
        "qlog2_n_fp": pa.array(qlog2_fixed(ns).astype(np.int64)),
    }))


def grouped_mode_cents_events(sf_dir: str):
    """MODE() per group with a DEFINED tie-break: per event type, the
    most frequent exact-cents value (ties -> smallest value) and its
    count — SQL's mode() leaves ties unspecified, so the oracle uses
    the explicit rank window instead.  (type, cents) counts are one
    pre-combined exchange; the per-type argmax is vectorized over the
    bounded type domain."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({"event_type": batch["event_type"],
                         "cents": c})

    counts = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "cents"], [("cents", "count", "n")],
    )

    def argmax(g: pa.Table) -> pa.Table:
        n = g["n"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, -n))  # max count, then smallest cents
        i = order[0]
        return pa.table({
            "event_type": g["event_type"].slice(i, 1),
            "mode_cents": pa.array([int(c[i])], pa.int64()),
            "mode_n": pa.array([int(n[i])], pa.int64()),
        })

    return counts.groupby("event_type").map_groups(
        argmax, batch_format="pyarrow"
    )


def clustering_coeff_hosts(sf_dir: str):
    """Per-host LOCAL clustering coefficient over the deterministic
    97-node host link graph (same edge arithmetic as PageRank /
    triangles): ``2*tri / (deg*(deg-1))`` as an exact floor-ppm
    integer plus its exact ingredients — the per-node ratio form of
    the triangle statistic, the standard web-community density score.
    ONE canonical distinct-edge pass feeds both the wedge join and the
    degree count; the two bounded per-vertex aggregates merge in a
    single grouped SUM (union, not join)."""
    from geodata_ray.stages.graphcc import clustering_coefficient

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return clustering_coefficient(
        ds.map_batches(_host_edges_map, batch_format="pyarrow"),
        num_buckets=16,
    )


# Benford first-digit expectation, floor(log10(1 + 1/d) * 1e6) —
# hardcoded as integers so the engine and the SQL oracle share the
# exact same constants (no cross-engine log10 bit dependence).
_BENFORD_PPM = (301029, 176091, 124938, 96910, 79181,
                66946, 57991, 51152, 45757)


def benford_audit_events(sf_dir: str):
    """Benford's-law first-digit audit over the exact event cents (the
    classic fraud / data-quality screen): observed count and floor-ppm
    share per leading digit 1-9 next to the hardcoded Benford
    expectation and the signed deviation.  Per-batch partials are a
    bounded 9-bin bincount (first digit by exact integer division —
    no string formatting, no float log); one tiny grouped SUM; the
    final 9-row share table is finished driver-side."""
    ev = _read(sf_dir, "events", columns=["value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        x = np.abs(cents)
        x = x[x > 0]
        # strip trailing digits by repeated exact division — at most
        # 19 vectorized passes (int64 magnitude), typically ~5
        while x.size and int(x.max()) >= 10:
            big = x >= 10
            x = np.where(big, x // 10, x)
        counts = np.bincount(x, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    agg = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["digit"], [("n", "sum", "n")],
    )
    rows = {int(r["digit"]): int(r["n"]) for r in agg.take_all()}
    n = np.array([rows.get(d, 0) for d in range(1, 10)], dtype=np.int64)
    tot = int(n.sum())
    share = (n * 1_000_000) // tot if tot else np.zeros(9, np.int64)
    bppm = np.array(_BENFORD_PPM, dtype=np.int64)
    return pa.table({
        "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
        "n": pa.array(n),
        "share_ppm": pa.array(share.astype(np.int64)),
        "benford_ppm": pa.array(bppm),
        "dev_ppm": pa.array(share.astype(np.int64) - bppm),
    })


def _daily_view_click_counts(sf_dir: str) -> tuple[list[int], list[int]]:
    """The shared exact daily (view, click) count series: one bounded
    (day x 2) pre-combined exchange, returned day-sorted as two Python
    int lists — single definition for the Pearson (``daily_corr``) and
    Kendall (``kendall_tau``) correlation queries, mirroring the
    identical `c` CTE both oracles share."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["view", "click"]))
        t = batch.filter(keep)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = (ts // day_us) * day_us
        eq = pc.equal(t["event_type"], "view")
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        vmask = eq.to_numpy(zero_copy_only=False).astype(bool)
        ud, inv = np.unique(d, return_inverse=True)
        x = np.bincount(inv[vmask], minlength=ud.size).astype(np.int64)
        y = np.bincount(inv[~vmask], minlength=ud.size).astype(np.int64)
        return pa.table({
            "day_us": pa.array(ud),
            "x": pa.array(x),
            "y": pa.array(y),
        })

    daily = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day_us"], [("x", "sum", "x"), ("y", "sum", "y")],
    )
    rows = sorted(daily.take_all(), key=lambda r: int(r["day_us"]))
    return ([int(r["x"]) for r in rows], [int(r["y"]) for r in rows])


def daily_corr_types_events(sf_dir: str):
    """Pearson correlation between the daily count series of two event
    types (view vs click) — the drift / co-movement check between two
    metrics.  One bounded (day x 2) pre-combined exchange produces the
    exact integer daily counts; the five moments and the correlation
    fold driver-side in PYTHON INTS (unbounded, exact), emitted as the
    signed squared correlation in parts-per-billion plus every exact
    ingredient, so no cross-engine sqrt/division bits are compared."""
    xs, ys = _daily_view_click_counts(sf_dir)
    nd = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = nd * sxy - sx * sy
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    if den_x and den_y:
        sgn = -1 if num < 0 else 1
        corr = sgn * ((num * num * 10**9) // (den_x * den_y))
    else:
        corr = 0
    vals = (nd, sx, sy, num, den_x, den_y, corr)
    if any(abs(v) > 2**62 for v in vals):
        raise OverflowError("daily_corr: moment exceeds int64 output")
    return pa.table({
        "n_days": pa.array([nd], pa.int64()),
        "sum_x": pa.array([sx], pa.int64()),
        "sum_y": pa.array([sy], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den_x": pa.array([den_x], pa.int64()),
        "den_y": pa.array([den_y], pa.int64()),
        "corr_sq_ppb": pa.array([corr], pa.int64()),
    })


def markov_transitions_events(sf_dir: str):
    """First-order Markov transition matrix over each user's
    time-ordered event-type stream: count and floor-ppm probability
    per (from_type, to_type) adjacency — the session-behavior model
    next to the FIRST-occurrence pair support of
    ``type_sequence_counts``.  Same bucketed per-user pass as TWAP
    (one exchange); the types^2-bounded count table is finished
    driver-side."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        empty = pa.table({"from_type": pa.array([], pa.string()),
                          "to_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if u.size < 2:
            return empty
        utypes, codes = np.unique(ty, return_inverse=True)
        k = utypes.size
        same = u[1:] == u[:-1]
        pair = codes[:-1][same] * k + codes[1:][same]
        acc = np.bincount(pair, minlength=k * k)
        nz = np.flatnonzero(acc)
        return pa.table({
            "from_type": pa.array(utypes[nz // k], pa.string()),
            "to_type": pa.array(utypes[nz % k], pa.string()),
            "n": pa.array(acc[nz].astype(np.int64)),
        })

    agg = grouped_aggregate(
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["from_type", "to_type"], [("n", "sum", "n")],
    )
    rows = agg.take_all()  # bounded by types^2
    tot: dict[str, int] = {}
    for r in rows:
        tot[r["from_type"]] = tot.get(r["from_type"], 0) + int(r["n"])
    rows.sort(key=lambda r: (r["from_type"], r["to_type"]))
    return pa.table({
        "from_type": pa.array([r["from_type"] for r in rows],
                              pa.string()),
        "to_type": pa.array([r["to_type"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "prob_ppm": pa.array(
            [int(r["n"]) * 1_000_000 // tot[r["from_type"]]
             for r in rows], pa.int64()),
    })


def pq_assign_embeddings(sf_dir: str):
    """Product-quantization codebook assignment (the ANN index-build
    companion to SQ8): each FLOOR-2^10-quantized vector splits into 8
    subvectors of 8 dims, each assigned to the nearest of 16 centroids
    (ties to the lowest centroid index) — codebook = the 16 lowest-
    vec_id vectors, so the whole construction is deterministic and
    SQL-replayable.  Emits the bounded 8x16 code histogram with the
    exact integer quantization error.  The codebook comes from a
    per-block partial bottom-16 (no full sort); assignment streams
    with the [16][64] codebook broadcast once via ``ray.put``."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bottom16(batch: pa.Table) -> pa.Table:
        order = np.argsort(
            batch["vec_id"].to_numpy(zero_copy_only=False),
            kind="stable")[:16]
        return batch.take(pa.array(order.astype(np.int64)))

    parts = [t for t in ray.get(
        ds.map_batches(bottom16, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    cand = pa.concat_tables(parts)
    if cand.num_rows < 16:
        raise ValueError("pq_assign: fewer than 16 vectors for the "
                         "codebook")
    order = np.argsort(cand["vec_id"].to_numpy(zero_copy_only=False),
                       kind="stable")[:16]
    cand = cand.take(pa.array(order.astype(np.int64)))
    cb = np.floor(
        np.array(cand["embedding"].to_pylist(), dtype=np.float64)
        * 1024.0
    ).astype(np.int64).reshape(16, 8, 8)
    cb_ref = ray.put(cb)

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "subspace": pa.array([], pa.int64()),
                "code": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_sqdist": pa.array([], pa.int64()),
            })
        book = ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef) \
            else cb_ref
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64) * 1024.0
        ).astype(np.int64).reshape(len(batch), 8, 8)
        ncnt = np.zeros((8, 16), np.int64)
        sdist = np.zeros((8, 16), np.int64)
        for s in range(8):
            diff = q[:, None, s, :] - book[None, :, s, :]
            d = np.einsum("ncd,ncd->nc", diff, diff)
            code = np.argmin(d, axis=1)  # first min = lowest index
            np.add.at(ncnt[s], code, 1)
            np.add.at(sdist[s], code, d[np.arange(len(code)), code])
        sub, code = np.nonzero(ncnt)
        return pa.table({
            "subspace": pa.array(sub.astype(np.int64)),
            "code": pa.array(code.astype(np.int64)),
            "n": pa.array(ncnt[sub, code]),
            "sum_sqdist": pa.array(sdist[sub, code]),
        })

    return grouped_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["subspace", "code"],
        [("n", "sum", "n"), ("sum_sqdist", "sum", "sum_sqdist")],
    )


def positional_deletes_events(sf_dir: str):
    """Merge-on-read POSITIONAL delete application (the Iceberg/Delta
    delete-file shape, complementing the KEYED ``merge_upsert``): a
    delete file addresses rows by (partition, ordinal position within
    the partition's canonical order), here every position p with
    ``p % 7 == 3`` (1-based, ordered by ts then event_id within the
    day partition).  Days hash to buckets, each day ranks entirely
    inside its group (one exchange), survivors pre-aggregate in
    place — no second exchange."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events", columns=["ts", "event_id", "value"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({
            "day_us": pc.multiply(pc.divide(ts, day_us), day_us),
            "ts_us": ts,
            "event_id": batch["event_id"],
            "cents": cents,
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("day_us", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        d = t["day_us"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        if d.size == 0:
            return pa.table({
                "day": pa.array([], pa.timestamp("us")),
                "n_live": pa.array([], pa.int64()),
                "cents_live": pa.array([], pa.int64()),
            })
        new = np.ones(d.size, dtype=bool)
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(d.size) - np.repeat(starts,
                                            np.diff(np.append(starts,
                                                              d.size)))
        live = (pos + 1) % 7 != 3
        dl = d[live]
        cl = c[live]
        udays, inv = np.unique(dl, return_inverse=True)
        csum = np.zeros(udays.size, np.int64)
        np.add.at(csum, inv, cl)  # exact int64, no float-weight path
        return pa.table({
            "day": pa.array(udays).cast(pa.timestamp("us")),
            "n_live": pa.array(np.bincount(inv).astype(np.int64)),
            "cents_live": pa.array(csum),
        })

    return (
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "day_us", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def subtree_rollup_parts(sf_dir: str):
    """Hierarchical SUBTREE rollup (BOM-explosion / org-chart shape):
    parts form a deterministic 8-ary tree (parent = key // 8, root 0)
    and every node reports the exact cents total and descendant count
    of its whole subtree.  Instead of iterating levels, each row
    FLAT-MAPS its full ancestor chain (depth = log8(maxkey), ~7 even
    at 100 TB) and ONE grouped SUM finishes — the recursive CTE
    collapses to a bounded-depth vectorized expansion + one
    exchange."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_retailprice"])

    def anc(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch["p_partkey"], pa.int64()).to_numpy(
            zero_copy_only=False).copy()
        cents = pc.cast(
            pc.round(pc.multiply(
                pc.cast(batch["p_retailprice"], pa.float64()), 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        nodes = [k.copy()]
        vals = [cents]
        cur, cv = k, cents
        while cur.size and bool((cur > 0).any()):
            m = cur > 0
            cur = cur[m] // 8
            cv = cv[m]
            nodes.append(cur)
            vals.append(cv)
        return pa.table({
            "node": pa.array(np.concatenate(nodes)),
            "cents": pa.array(np.concatenate(vals)),
        })

    return grouped_aggregate(
        ds.map_batches(anc, batch_format="pyarrow"),
        ["node"],
        [("cents", "sum", "subtree_cents"), ("cents", "count", "n_desc")],
    )


def eccentricity_hosts(sf_dir: str):
    """All-pairs hop statistics on the deterministic 97-node host link
    graph (undirected — same edge arithmetic as PageRank / triangles):
    per-host ECCENTRICITY and reachable-set size, the diameter /
    radius ingredients for web-graph topology audits.  Edge dedup is
    distributed; the APSP is a bounded dense boolean matrix-power BFS
    (documented node bound — a page-scale graph swaps in per-source
    ``bfs_levels``)."""
    from geodata_ray.stages.graphcc import eccentricity

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return eccentricity(
        ds.map_batches(_host_edges_map, batch_format="pyarrow")
    )


def readability_docs(sf_dir: str):
    """Flesch-style readability scoring with exact integer
    ingredients: words (the engine's shared single-space
    tokenization), vowel-group count as the classic syllable proxy,
    and PSEUDO-SENTENCES of 16 words (the gate corpus carries no
    sentence punctuation — a real corpus swaps in an [.!?]+ run
    count, same shape).  ``flesch_milli = 206835 - 1015*w/s -
    84600*v/w`` in floor-milli units — one map_batches, zero shuffle,
    linear in corpus bytes."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        low = pc.utf8_lower(text.fill_null(""))
        w = pc.list_value_length(
            pc.split_pattern(low, " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        v = pc.count_substring_regex(low, "[aeiou]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = (w + 15) // 16
        flesch = 206_835 - (1015 * w) // s - (84_600 * v) // w
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(w),
            "n_vowel_groups": pa.array(v),
            "n_sents": pa.array(s),
            "flesch_milli": pa.array(flesch),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def feature_hash_collisions_docs(sf_dir: str):
    """Hashing-trick collision audit (the feature-space health check
    for hashed bag-of-words models like the quality classifier): the
    DISTINCT corpus vocabulary hashes into 64 buckets with the
    engine's shared token hash, and the output is the bucket LOAD
    HISTOGRAM (how many buckets hold k distinct terms).  Vocabulary is
    the only corpus-sized exchange (pre-combined per batch); the
    bucket and histogram aggregates are bounded by 64 and by the max
    load."""
    from geodata_ray.stages.dedup import hash_tokens_batch

    ds = _read(sf_dir, "documents", columns=["text"])

    def toks(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = pc.split_pattern(
            pc.utf8_lower(text.fill_null("")), " ")
        flat = (flat.combine_chunks()
                if isinstance(flat, pa.ChunkedArray) else flat).flatten()
        uniq = pc.unique(flat)
        return pa.table({"tok": uniq})

    vocab = grouped_aggregate(
        ds.map_batches(toks, batch_format="pyarrow"),
        ["tok"], [("tok", "count", "n_dup")],
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        tok = batch["tok"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        th = hash_tokens_batch(tok)
        bucket = (th % np.uint64(64)).astype(np.int64)
        acc = np.bincount(bucket, minlength=64)
        nz = np.flatnonzero(acc)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "n_terms": pa.array(acc[nz].astype(np.int64)),
        })

    per_bucket = grouped_aggregate(
        vocab.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], [("n_terms", "sum", "n_terms")],
    )

    def hist(batch: pa.Table) -> pa.Table:
        return pa.table({"load": batch["n_terms"]})

    return grouped_aggregate(
        per_bucket.map_batches(hist, batch_format="pyarrow"),
        ["load"], [("load", "count", "n_buckets")],
    )


def cohens_kappa_docs(sf_dir: str):
    """Cohen's kappa between the declared ``lang`` label and the
    stopword-profile language-ID prediction — the chance-corrected
    agreement statistic over the ``lang_confusion_docs`` matrix,
    folded driver-side from the bounded |langs|^2 counts in PYTHON
    INTS: ``kappa = (N*agree - sum_k row_k*col_k) / (N^2 - sum_k
    row_k*col_k)``, emitted as sign-factored floor-ppm plus every
    exact ingredient (no cross-engine float division)."""
    conf = lang_confusion_docs(sf_dir).take_all()  # bounded langs^2
    n_docs = sum(int(r["n_docs"]) for r in conf)
    n_agree = sum(int(r["n_docs"]) for r in conf
                  if r["lang"] == r["lang_pred"])
    row: dict[str, int] = {}
    col: dict[str, int] = {}
    for r in conf:
        row[r["lang"]] = row.get(r["lang"], 0) + int(r["n_docs"])
        col[r["lang_pred"]] = col.get(r["lang_pred"], 0) + int(r["n_docs"])
    sum_rc = sum(v * col.get(k, 0) for k, v in row.items())
    num = n_docs * n_agree - sum_rc
    den = n_docs * n_docs - sum_rc
    kappa = 0 if den == 0 else (
        (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // den)
    )
    if any(abs(v) > 2**62 for v in (n_docs, n_agree, sum_rc, kappa)):
        raise OverflowError("cohens_kappa: count exceeds int64 output")
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_agree": pa.array([n_agree], pa.int64()),
        "sum_rc": pa.array([sum_rc], pa.int64()),
        "kappa_ppm": pa.array([kappa], pa.int64()),
    })


def reservoir_sample_per_type_events(sf_dir: str):
    """Deterministic per-group k-reservoir (uniform k-sample per key
    at any scale): per event type, the 10 rows with the smallest
    splitmix64(event_id) — hash-priority sampling, the distributed
    stand-in for sequential reservoir sampling (same marginal
    distribution, mergeable, reproducible).  Per-batch partial
    bottom-10 per type bounds the exchange at 10 x types x blocks;
    the final per-type rank runs on that tiny stream."""
    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64)).astype(np.int64)
        ty = batch["event_type"].to_numpy(zero_copy_only=False)
        # partial bottom-10 per type within the batch
        order = np.lexsort((ids, h, ty))
        ty_s = ty[order]
        new = np.ones(ty_s.size, dtype=bool)
        new[1:] = ty_s[1:] != ty_s[:-1]
        grp = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        pos = np.arange(ty_s.size) - starts[grp]
        keep = order[pos < 10]
        return pa.table({
            "event_type": pa.array(ty[keep], pa.string()),
            "event_id": pa.array(ids[keep]),
            "hash_i64": pa.array(h[keep]),
        })

    def finish(g: pa.Table) -> pa.Table:
        h = g["hash_i64"].to_numpy(zero_copy_only=False)
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:10]
        return pa.table({
            "event_type": g["event_type"].take(
                pa.array(order.astype(np.int64))),
            "rank": pa.array(np.arange(1, order.size + 1,
                                       dtype=np.int64)),
            "event_id": pa.array(ids[order]),
            "hash_i64": pa.array(h[order]),
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


def theta_intersection_types_events(sf_dir: str):
    """Theta/KMV SET-INTERSECTION estimate between the view-user and
    click-user sets, WITH its exact companion (the sketch-accuracy
    audit pattern of ``ann_recall``): the k=64 smallest splitmix64
    hashes over the UNION of distinct users carry per-user membership
    flags, Jaccard_est = |both flags in sketch| / k — next to the
    exact |A∩B| / |A∪B| from the same bounded per-user flag table.
    One distinct-user exchange feeds both; the sketch is a per-block
    partial bottom-64 (no full sort)."""
    import ray

    from geodata_ray.sources.synth import splitmix64

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["view", "click"]))
        t = batch.filter(keep)
        eq = pc.equal(t["event_type"], "view")
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        v = eq.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "in_view": pa.array(v),
            "in_click": pa.array(1 - v),
        })

    flags = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        [("in_view", "max", "in_view"), ("in_click", "max", "in_click")],
    ).materialize()  # consumed twice: exact counts + sketch

    def hash_bottom(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(u.astype(np.uint64)).astype(np.int64)
        order = np.argsort(h, kind="stable")[:64]
        return pa.table({
            "hash_i64": pa.array(h[order]),
            "in_view": batch["in_view"].take(
                pa.array(order.astype(np.int64))),
            "in_click": batch["in_click"].take(
                pa.array(order.astype(np.int64))),
        })

    parts = [t for t in ray.get(
        flags.map_batches(hash_bottom, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    sk = pa.concat_tables(parts)
    h = sk["hash_i64"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")[:64]
    iv = sk["in_view"].to_numpy(zero_copy_only=False)[order]
    ic = sk["in_click"].to_numpy(zero_copy_only=False)[order]
    k = order.size
    n_both_sketch = int((iv & ic).sum())

    def both_either(batch: pa.Table) -> pa.Table:
        v = batch["in_view"].to_numpy(zero_copy_only=False)
        c = batch["in_click"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_inter": pa.array([int((v & c).sum())], pa.int64()),
            "n_union": pa.array([len(batch)], pa.int64()),
        })

    ex = grouped_aggregate(
        flags.map_batches(both_either, batch_format="pyarrow")
        .map_batches(lambda t: t.append_column(
            "g", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow"),
        ["g"],
        [("n_inter", "sum", "n_inter"), ("n_union", "sum", "n_union")],
    ).take_all()
    n_inter = int(ex[0]["n_inter"])
    n_union = int(ex[0]["n_union"])
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_both_sketch": pa.array([n_both_sketch], pa.int64()),
        "jaccard_est_ppm": pa.array(
            [n_both_sketch * 1_000_000 // k if k else 0], pa.int64()),
        "n_inter": pa.array([n_inter], pa.int64()),
        "n_union": pa.array([n_union], pa.int64()),
        "jaccard_ppm": pa.array(
            [n_inter * 1_000_000 // n_union if n_union else 0],
            pa.int64()),
    })


def l2_norm_audit_embeddings(sf_dir: str):
    """Embedding-normalization audit: per vector, the exact integer
    squared L2 norm of the FLOOR-2^10 quantized components plus the
    dominant dimension (max component value, ties to the lowest dim,
    1-based) — the pre-normalize health check (zero vectors, spiky
    dims) before cosine similarity.  One map_batches, zero shuffle."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def audit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "norm2_q": pa.array([], pa.int64()),
                "max_q": pa.array([], pa.int64()),
                "max_dim": pa.array([], pa.int64()),
            })
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64) * 1024.0
        ).astype(np.int64).reshape(len(batch), -1)
        norm2 = np.einsum("nd,nd->n", q, q)
        max_dim = np.argmax(q, axis=1)  # first max = lowest dim
        return pa.table({
            "vec_id": batch["vec_id"],
            "norm2_q": pa.array(norm2),
            "max_q": pa.array(q[np.arange(len(q)), max_dim]),
            "max_dim": pa.array((max_dim + 1).astype(np.int64)),
        })

    return ds.map_batches(audit, batch_format="pyarrow")


def term_shift_docs(sf_dir: str):
    """Term-frequency DRIFT between two corpus halves (even vs odd
    doc_id — the between-snapshot / between-source vocabulary shift
    report): per term, occurrence counts in each half and the exact
    floor-ppm rate delta; top 20 by |delta|, term ascending.  The
    vocabulary aggregate is the only corpus-sized exchange; half
    totals broadcast as two scalars; the top-20 is a per-block
    partial + bounded final."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(text.fill_null("")), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks).flatten()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        half = np.repeat(ids % 2, lens)
        tok_np = flat.to_numpy(zero_copy_only=False)
        ut, inv = np.unique(tok_np, return_inverse=True)
        a = np.bincount(inv[half == 0], minlength=ut.size)
        b = np.bincount(inv[half == 1], minlength=ut.size)
        return pa.table({
            "term": pa.array(ut, pa.string()),
            "n_a": pa.array(a.astype(np.int64)),
            "n_b": pa.array(b.astype(np.int64)),
        })

    vocab = grouped_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["term"], [("n_a", "sum", "n_a"), ("n_b", "sum", "n_b")],
    ).materialize()  # consumed twice: totals + ranking

    tot = grouped_aggregate(
        vocab.map_batches(lambda t: pa.table({
            "g": pa.array(np.zeros(len(t), np.int64)),
            "n_a": t["n_a"], "n_b": t["n_b"]}), batch_format="pyarrow"),
        ["g"], [("n_a", "sum", "ta"), ("n_b", "sum", "tb")],
    ).take_all()
    ta, tb = int(tot[0]["ta"]), int(tot[0]["tb"])

    def shift(batch: pa.Table) -> pa.Table:
        a = batch["n_a"].to_numpy(zero_copy_only=False)
        b = batch["n_b"].to_numpy(zero_copy_only=False)
        if a.size and (int(a.max()) > (2**62) // 1_000_000
                       or int(b.max()) > (2**62) // 1_000_000):
            raise OverflowError("term_shift: count * 1e6 exceeds int64")
        delta = (a * 1_000_000) // ta - (b * 1_000_000) // tb
        t = batch.append_column("delta_ppm", pa.array(delta))
        # partial top-20 by |delta| desc, term asc
        terms = t["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -np.abs(delta)))[:20]
        return t.take(pa.array(order.astype(np.int64)))

    parts = [t for t in ray.get(
        vocab.map_batches(shift, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    allp = pa.concat_tables(parts)
    terms = allp["term"].to_numpy(zero_copy_only=False)
    delta = allp["delta_ppm"].to_numpy(zero_copy_only=False)
    order = np.lexsort((terms, -np.abs(delta)))[:20]
    out = allp.take(pa.array(order.astype(np.int64)))
    return out.select(["term", "n_a", "n_b", "delta_ppm"])


def session_paths_events(sf_dir: str):
    """Top clickstream PATHS: the first up-to-3 event types of every
    30-minute-gap session joined as ``a>b>c``, counted corpus-wide —
    top 20 paths by count (path ascending on ties).  Same bucketed
    per-user ordered pass as TWAP (one exchange); path counts are
    bounded by types^3, so the final ranking is tiny."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    gap_us = 30 * 60 * 1_000_000

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        new = np.ones(u.size, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], u.size]
        # vectorized first-3 path build (object-dtype concatenation)
        path = ty[starts].astype(object)
        has2 = ends - starts >= 2
        path[has2] = path[has2] + ">" + ty[starts[has2] + 1]
        has3 = ends - starts >= 3
        path[has3] = path[has3] + ">" + ty[starts[has3] + 2]
        up, cnt = np.unique(path.astype(str), return_counts=True)
        return pa.table({
            "path": pa.array(up, pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    agg = grouped_aggregate(
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["path"], [("n", "sum", "n")],
    )
    rows = agg.take_all()  # bounded by types^3 distinct paths
    rows.sort(key=lambda r: (-int(r["n"]), r["path"]))
    rows = rows[:20]
    return pa.table({
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
    })


def view_click_pairs_events(sf_dir: str):
    """Stream-stream WINDOWED self-join (the interval-join streaming
    primitive): per user, every (view, click) pair with the click
    STRICTLY after the view and within 5 minutes, counted per day of
    the view — e.g. impression->action attribution pairs.  The join
    never materializes pairs: per user-bucket, a sorted two-sided
    ``searchsorted`` counts matching clicks per view in O(n log n),
    then one bounded per-day SUM."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])
    day_us = 86_400_000_000
    win_us = 5 * 60 * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["view", "click"]))
        t = batch.filter(keep)
        eq = pc.equal(t["event_type"], "view")
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "is_view": pa.array(
                eq.to_numpy(zero_copy_only=False).astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"), ("ts_us", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        isv = t["is_view"].to_numpy(zero_copy_only=False).astype(bool)
        empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                          "n_pairs": pa.array([], pa.int64())})
        if u.size == 0:
            return empty
        # fully vectorized per-user interval counting: pack (user,
        # relative ts) into ONE sortable int64 key so two global
        # searchsorteds count each view's in-window clicks — no
        # per-user loop.  M > max ts_rel + win keeps users disjoint.
        t0 = int(ts.min())
        rel = ts - t0
        m_span = int(rel.max()) + win_us + 2
        if int(u.max()) > (2**62) // m_span:
            raise OverflowError(
                "view_click_pairs: user*span key exceeds int64 — "
                "widen the bucket modulus or re-bucket by (user, day)"
            )
        key = u * m_span + rel
        ckey = key[~isv]  # sorted: input is (user, ts)-sorted
        vkey = key[isv]
        n = (np.searchsorted(ckey, vkey + win_us, side="right")
             - np.searchsorted(ckey, vkey, side="right"))
        keep = n > 0
        if not keep.any():
            return empty
        d = ((ts[isv][keep]) // day_us) * day_us
        c = n[keep]
        ud, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(ud.size, np.int64)
        np.add.at(tot, inv, c)
        return pa.table({
            "day": pa.array(ud).cast(pa.timestamp("us")),
            "n_pairs": pa.array(tot),
        })

    return grouped_aggregate(
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["day"], [("n_pairs", "sum", "n_pairs")],
    )


def gram_matrix_embeddings(sf_dir: str):
    """Exact integer GRAM / scatter matrix of the quantized embedding
    corpus (the PCA / whitening ingredient): ``G[i,j] = sum_vec
    q_i*q_j`` over all vectors (FLOOR-2^10 components), upper triangle
    only — per-batch ``einsum`` partials (a bounded 64x64 state per
    block), one bounded grouped SUM.  The corpus never shuffles."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    iu, ju = np.triu_indices(64)

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            })
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64) * 1024.0
        ).astype(np.int64).reshape(len(batch), -1)
        g = q.T @ q  # 64x64 int64 — |q|<=2^10 so n<=2^42 rows is safe
        return pa.table({
            "i": pa.array((iu + 1).astype(np.int64)),
            "j": pa.array((ju + 1).astype(np.int64)),
            "s": pa.array(g[iu, ju]),
        })

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], [("s", "sum", "s")],
    )


def new_users_daily_events(sf_dir: str):
    """Adoption curve: per day, the number of NEW users (first-seen
    that day) and the cumulative user count — the growth-accounting
    complement of retention/cohort.  One per-user MIN exchange, one
    bounded per-day count, cumulative folded driver-side over the
    bounded day table."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        return pa.table({
            "user_id": batch["user_id"],
            "day_us": pc.multiply(pc.divide(ts, day_us), day_us),
        })

    first = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], [("day_us", "min", "first_day")],
    )
    daily = grouped_aggregate(
        first.map_batches(
            lambda t: pa.table({"day_us": t["first_day"]}),
            batch_format="pyarrow"),
        ["day_us"], [("day_us", "count", "n_new")],
    )
    rows = sorted(daily.take_all(), key=lambda r: int(r["day_us"]))
    cum, out_c = 0, []
    for r in rows:
        cum += int(r["n_new"])
        out_c.append(cum)
    return pa.table({
        "day": pa.array(
            np.array([int(r["day_us"]) for r in rows], np.int64)
        ).cast(pa.timestamp("us")),
        "n_new": pa.array([int(r["n_new"]) for r in rows], pa.int64()),
        "cum_users": pa.array(out_c, pa.int64()),
    })


def autocorr_daily_events(sf_dir: str):
    """Lag-1..7 AUTOCORRELATION of the daily event-count series (the
    seasonality detector feeding the seasonal-anomaly operator):
    ordinal-lag pairing over the sorted day series, exact integer
    moments folded driver-side in Python ints, emitted as signed
    corr^2 in ppb per lag plus the exact ingredients — zero
    cross-engine float bits."""
    ev = _read(sf_dir, "events", columns=["ts"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = (ts // day_us) * day_us
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({
            "day_us": pa.array(ud),
            "n": pa.array(cnt.astype(np.int64)),
        })

    daily = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day_us"], [("n", "sum", "n")],
    )
    rows = sorted(daily.take_all(), key=lambda r: int(r["day_us"]))
    x = [int(r["n"]) for r in rows]
    lags, nums, dxs, dys, corrs = [], [], [], [], []
    for k in range(1, 8):
        a = x[:-k] if k < len(x) else []
        b = x[k:]
        m = len(a)
        if m == 0:  # the oracle's GROUP BY emits no row for this lag
            continue
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sxx = sum(p * p for p in a)
        syy = sum(q * q for q in b)
        num = m * sxy - sx * sy
        den_x = m * sxx - sx * sx
        den_y = m * syy - sy * sy
        if den_x and den_y:
            sgn = -1 if num < 0 else 1
            corr = sgn * ((num * num * 10**9) // (den_x * den_y))
        else:
            corr = 0
        if any(abs(v) > 2**62 for v in (num, den_x, den_y, corr)):
            raise OverflowError("autocorr: moment exceeds int64 output")
        lags.append(k)
        nums.append(num)
        dxs.append(den_x)
        dys.append(den_y)
        corrs.append(corr)
    return pa.table({
        "lag": pa.array(lags, pa.int64()),
        "num": pa.array(nums, pa.int64()),
        "den_x": pa.array(dxs, pa.int64()),
        "den_y": pa.array(dys, pa.int64()),
        "corr_sq_ppb": pa.array(corrs, pa.int64()),
    })


def edge_support_hosts(sf_dir: str):
    """Per-EDGE triangle support over the 97-node host graph (the
    k-truss peeling ingredient — trusses prune edges by support where
    cores prune vertices by degree): for each canonical undirected
    edge, how many common neighbors close a triangle through it.
    Reuses the wedge join; each closed wedge credits its THREE edges;
    one grouped SUM keyed by the packed edge."""
    from geodata_ray.stages.graphcc import edge_triangle_support

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return edge_triangle_support(
        ds.map_batches(_host_edges_map, batch_format="pyarrow"),
        num_buckets=16,
    )


def clustering_depth_events(sf_dir: str):
    """Data-layout CLUSTERING DEPTH (the Iceberg/Delta metric for how
    well a sort key clusters across files): events partition by
    ``event_id % 16`` (an unclustered layout), each partition reports
    its exact [min, max] cents range, and the depth is the maximum
    number of overlapping ranges at any point — depth == n_parts means
    every file overlaps every probe and zonemap pruning is useless.
    One bounded min/max exchange; the 2*16-boundary sweep folds
    driver-side."""
    ev = _read(sf_dir, "events", columns=["event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({
            "part": pa.array((ids % 16).astype(np.int64)),
            "cents": cents,
        })

    ranges = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["part"],
        [("cents", "min", "lo"), ("cents", "max", "hi")],
    ).take_all()  # bounded: 16 partitions
    los = np.array([int(r["lo"]) for r in ranges], np.int64)
    his = np.array([int(r["hi"]) for r in ranges], np.int64)
    # depth at each range start = how many ranges contain that start
    depth = np.array(
        [int(((los <= s) & (his >= s)).sum()) for s in los], np.int64
    )
    return pa.table({
        "n_parts": pa.array([len(ranges)], pa.int64()),
        "max_depth": pa.array([int(depth.max()) if depth.size else 0],
                              pa.int64()),
    })


def triplet_mining_embeddings(sf_dir: str):
    """Hard-example TRIPLET mining (metric-learning data prep): for
    each of the 10 lowest-id anchor vectors, the exact integer squared
    distance to its nearest SAME-label vector (hardest positive is the
    farthest — here we report the nearest-positive baseline) and to
    its nearest OTHER-label vector (hardest negative), plus the
    margin.  Anchors broadcast once; the corpus streams through one
    map_batches emitting 10-row partial minima; a bounded grouped MIN
    finishes."""
    import ray

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])

    def bottom10(batch: pa.Table) -> pa.Table:
        order = np.argsort(
            batch["vec_id"].to_numpy(zero_copy_only=False),
            kind="stable")[:10]
        return batch.take(pa.array(order.astype(np.int64)))

    parts = [t for t in ray.get(
        ds.map_batches(bottom10, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    cand = pa.concat_tables(parts)
    vid0 = cand["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid0, kind="stable")[:10]
    a_ids = vid0[order]
    a_lab = cand["label"].to_numpy(zero_copy_only=False).astype(
        np.int64)[order]
    a_q = np.floor(
        np.array(cand["embedding"].combine_chunks().to_pylist(),
                 dtype=np.float64) * 1024.0
    ).astype(np.int64)[order]
    anchors = ray.put((a_ids, a_lab, a_q))

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "anchor_id": pa.array([], pa.int64()),
                "d_pos": pa.array([], pa.int64()),
                "d_neg": pa.array([], pa.int64()),
            })
        ids_, labs_, qa = ray.get(anchors) \
            if isinstance(anchors, ray.ObjectRef) else anchors
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        q = np.floor(
            emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64) * 1024.0
        ).astype(np.int64).reshape(len(batch), -1)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        big = np.int64(2**62)
        out_a, out_p, out_n = [], [], []
        for i in range(len(ids_)):
            diff = q - qa[i]
            d = np.einsum("nd,nd->n", diff, diff)
            d = np.where(vid == ids_[i], big, d)  # exclude the anchor
            same = lab == labs_[i]
            dp = int(d[same].min()) if same.any() else int(big)
            dn = int(d[~same].min()) if (~same).any() else int(big)
            out_a.append(int(ids_[i]))
            out_p.append(dp)
            out_n.append(dn)
        return pa.table({
            "anchor_id": pa.array(out_a, pa.int64()),
            "d_pos": pa.array(out_p, pa.int64()),
            "d_neg": pa.array(out_n, pa.int64()),
        })

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["anchor_id"],
        [("d_pos", "min", "d_pos"), ("d_neg", "min", "d_neg")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "margin",
            pc.subtract(batch["d_neg"], batch["d_pos"]),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def conversion_latency_quantiles_events(sf_dir: str):
    """Conversion-latency distribution: exact quantile_disc (p50 / p90
    / p99) of the seconds between each user's FIRST view and their
    first purchase STRICTLY AFTER it — the funnel's time dimension.
    One bucketed per-user segment pass derives the latencies; the
    quantile walk is the bounded-histogram exact machinery."""
    import ray.data as rd

    from geodata_ray.stages.relational import exact_int_quantiles
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["view", "purchase"]))
        t = batch.filter(keep)
        eq = pc.equal(t["event_type"], "view")
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "is_view": pa.array(
                eq.to_numpy(zero_copy_only=False).astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"), ("ts_us", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        isv = t["is_view"].to_numpy(zero_copy_only=False).astype(bool)
        empty = pa.table({"lat_s": pa.array([], pa.int64())})
        if u.size == 0:
            return empty
        new = np.ones(u.size, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new) - 1
        nseg = int(seg[-1]) + 1
        big = np.int64(2**62)
        vfirst = np.full(nseg, big)
        np.minimum.at(vfirst, seg[isv], ts[isv])
        # first purchase strictly after the user's first view
        pm = ~isv
        pafter = pm & (ts > vfirst[seg])
        pfirst = np.full(nseg, big)
        np.minimum.at(pfirst, seg[pafter], ts[pafter])
        ok = (vfirst < big) & (pfirst < big)
        lat = (pfirst[ok] - vfirst[ok]) // 1_000_000
        return pa.table({"lat_s": pa.array(lat.astype(np.int64))})

    lats = (
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    vals = exact_int_quantiles(lats, "lat_s", [0.5, 0.9, 0.99])
    if not vals:  # no conversions at all: the oracle emits zero rows
        return rd.from_arrow(pa.table({
            "q_pct": pa.array([], pa.int64()),
            "lat_s": pa.array([], pa.int64()),
        }))
    return rd.from_arrow(pa.table({
        "q_pct": pa.array([50, 90, 99], pa.int64()),
        "lat_s": pa.array([int(v) for v in vals], pa.int64()),
    }))


def polygon_area_nations(sf_dir: str):
    """Exact-integer SHOELACE area of one deterministic polygon per
    nation (the shape-ingest geometry kernel made SQL-auditable —
    reference parity: the convert-shape area path, here on integer
    vertex coords so the signed doubled area ``2A = sum(x_i*y_{i+1} -
    x_{i+1}*y_i)`` is exact in both engines).  Vertices derive from
    the nation key (3..6 per polygon); one vectorized map over the
    dimension table, zero shuffle."""
    ds = _read(sf_dir, "nation", columns=["n_nationkey"])

    def area(batch: pa.Table) -> pa.Table:
        k = batch["n_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        nv = 3 + (k % 4)
        out_k, out_n, out_a = [], [], []
        # nations are a bounded dimension table (25 rows at every SF);
        # the per-polygon loop is over <= 6 vertices
        for kk, n in zip(k, nv):
            i = np.arange(n, dtype=np.int64)
            x = (kk * 7 + i * 13) % 100
            y = (kk * 11 + i * 17) % 100
            xn = np.roll(x, -1)
            yn = np.roll(y, -1)
            out_k.append(int(kk))
            out_n.append(int(n))
            out_a.append(int((x * yn - xn * y).sum()))
        return pa.table({
            "n_nationkey": pa.array(out_k, pa.int64()),
            "n_vertices": pa.array(out_n, pa.int64()),
            "area2": pa.array(out_a, pa.int64()),
        })

    return ds.map_batches(area, batch_format="pyarrow")


def pct_cont_types_events(sf_dir: str):
    """PERCENTILE_CONT (interpolated median) per event type in EXACT
    MICRO-UNITS: position ``(n-1)*0.5`` splits into ``lo = posm //
    1e6`` and ``frac_micro = posm % 1e6``, and ``p50_micro = lo_val *
    1e6 + (hi_val - lo_val) * frac_micro`` — the linear interpolation
    with zero float bits (both engines replay the same integer math;
    DuckDB's builtin quantile_cont is NOT used).  One bounded
    (type, cents) histogram exchange; the rank walk runs per type over
    the bounded histogram."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({"event_type": batch["event_type"],
                         "cents": cents})

    hist = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "cents"], [("cents", "count", "cnt")],
    )

    def walk(g: pa.Table) -> pa.Table:
        t = g.sort_by([("cents", "ascending")])
        v = t["cents"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(c)
        n = int(cum[-1])
        posm = (n - 1) * 500_000
        lo_rank = posm // 1_000_000
        hi_rank = min(lo_rank + 1, n - 1)
        lo_val = int(v[np.searchsorted(cum, lo_rank + 1)])
        hi_val = int(v[np.searchsorted(cum, hi_rank + 1)])
        frac = posm % 1_000_000
        return pa.table({
            "event_type": t["event_type"].slice(0, 1),
            "n": pa.array([n], pa.int64()),
            "p50_micro": pa.array(
                [lo_val * 1_000_000 + (hi_val - lo_val) * frac],
                pa.int64()),
        })

    return hist.groupby("event_type").map_groups(
        walk, batch_format="pyarrow"
    )


def calibration_bins_docs(sf_dir: str):
    """Calibration / reliability bins for the hashed-linear quality
    classifier (the eval companion to ``pr_curve_docs``): scores bin
    by FLOOR division into 256-wide buckets clamped to [-8, 7], the
    deterministic ground truth is ``doc_id % 3 == 0``, and each bin
    reports count, positives and the exact floor-ppm positive rate.
    Floor semantics are forced identical in both engines by adding a
    positive offset before the division (DuckDB ``//`` truncates
    toward zero; numpy floors)."""
    from geodata_ray.stages.textstats import classifier_score_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def binned(batch: pa.Table) -> pa.Table:
        s = classifier_score_batch(batch)
        score = s["score"].to_numpy(zero_copy_only=False)
        if score.size and int(np.abs(score).max()) >= 1_048_576:
            raise OverflowError(
                "calibration: |score| >= 2^20 breaks the positive-"
                "offset floor-division trick — raise the offset"
            )
        b = np.clip((score + 1_048_576) // 256 - 4096, -8, 7)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = (ids % 3 == 0).astype(np.int64)
        return pa.table({
            "bin": pa.array(b.astype(np.int64)),
            "n": pa.array(np.ones(b.size, np.int64)),
            "n_pos": pa.array(pos),
        })

    agg = grouped_aggregate(
        ds.map_batches(binned, batch_format="pyarrow"),
        ["bin"], [("n", "sum", "n"), ("n_pos", "sum", "n_pos")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        p = batch["n_pos"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pos_rate_ppm", pa.array((p * 1_000_000) // n))

    return agg.map_batches(finish, batch_format="pyarrow")


def kendall_tau_daily_events(sf_dir: str):
    """Kendall rank correlation (tau-a) between the view and click
    daily count series — the EXACT-INTEGER rank alternative to the
    Pearson ``daily_corr`` (no squares, no sqrt: concordant minus
    discordant pairs over n(n-1)/2).  The daily table is the same
    bounded pre-combined exchange; the O(days^2) pair scan vectorizes
    driver-side over the bounded day count (guarded)."""
    xs, ys = _daily_view_click_counts(sf_dir)
    if len(xs) > 5_000:
        # 5000 days (~13 years) = 1.2e7 pairs ~ 300 MB of int64
        # temporaries; past that, shard the pair scan
        raise ValueError("kendall_tau: day count exceeds the bounded "
                         "O(days^2) driver scan — shard the pair scan")
    x = np.array(xs, np.int64)
    y = np.array(ys, np.int64)
    n = x.size
    iu, ju = np.triu_indices(n, k=1)
    sx = np.sign(x[iu] - x[ju])
    sy = np.sign(y[iu] - y[ju])
    prod = sx * sy
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    npairs = n * (n - 1) // 2
    num = conc - disc
    tau = 0 if npairs == 0 else (
        (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // npairs)
    )
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "n_conc": pa.array([conc], pa.int64()),
        "n_disc": pa.array([disc], pa.int64()),
        "tau_a_ppm": pa.array([tau], pa.int64()),
    })


def recency_decay_types_events(sf_dir: str):
    """Time-decayed per-type totals with an EXACT half-life: weight =
    2^(-age_days) applied as an integer right-shift (``cents >>
    age``), so the decayed sum is bit-exact in both engines — the
    freshness-weighted scoring shape (trending content, recency-boosted
    retrieval) without a single float.  Two passes: a tiny projected
    MAX fixes the reference day, then one pre-combined grouped SUM."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    day_us = 86_400_000_000

    mx = _read(sf_dir, "events", columns=["ts"]).map_batches(
        lambda t: pa.table({
            "m": pa.array(
                [int(pc.max(pc.cast(t["ts"], pa.int64())).as_py()
                     // day_us * day_us)], pa.int64())}),
        batch_format="pyarrow",
    ).max("m")
    max_day = int(mx)

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        if cents.size and int(cents.min()) < 0:
            # the oracle's `//` truncates toward zero while `>>`
            # floors — negative money is outside this query's domain,
            # refuse instead of silently diverging
            raise ValueError(
                "recency_decay: negative cents — floor(>>) and SQL "
                "trunc(//) diverge below zero"
            )
        age = (max_day - (ts // day_us) * day_us) // day_us
        dec = cents >> np.minimum(age, 62)
        return pa.table({
            "event_type": batch["event_type"],
            "one": pa.array(np.ones(cents.size, np.int64)),
            "cents": pa.array(cents),
            "dec": pa.array(dec),
        })

    return grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        [("one", "sum", "n"), ("cents", "sum", "raw_cents"),
         ("dec", "sum", "decayed_cents")],
    )


def trending_types_daily_events(sf_dir: str):
    """TRENDING report: per day, each event type's count-rank (count
    desc, type asc) and its movement vs the PREVIOUS CALENDAR day
    (prev_rank = 0 when the type did not appear; delta = prev - rank,
    positive = climbing) — the leaderboard-movement shape.  One
    bounded (day x type) pre-combined exchange; ranks and deltas fold
    driver-side over the bounded table."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = (ts // day_us) * day_us
        t = pa.table({"day_us": pa.array(d),
                      "event_type": batch["event_type"]})
        out = t.group_by(["day_us", "event_type"]).aggregate(
            [([], "count_all")])
        ncol = next(c for c in out.column_names
                    if c not in ("day_us", "event_type"))
        return pa.table({
            "day_us": out["day_us"],
            "event_type": out["event_type"],
            "n": out[ncol],
        })

    daily = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day_us", "event_type"], [("n", "sum", "n")],
    )
    rows = daily.take_all()  # bounded: days x types
    by_day: dict[int, list] = {}
    for r in rows:
        by_day.setdefault(int(r["day_us"]), []).append(
            (r["event_type"], int(r["n"])))
    rank: dict[tuple[int, str], int] = {}
    for d, items in by_day.items():
        items.sort(key=lambda kv: (-kv[1], kv[0]))
        for i, (ty, _n) in enumerate(items, 1):
            rank[(d, ty)] = i
    out = {"day": [], "event_type": [], "n": [], "rank": [],
           "prev_rank": [], "delta": []}
    for d in sorted(by_day):
        for ty, n in sorted(by_day[d]):
            rk = rank[(d, ty)]
            pv = rank.get((d - day_us, ty), 0)
            out["day"].append(d)
            out["event_type"].append(ty)
            out["n"].append(n)
            out["rank"].append(rk)
            out["prev_rank"].append(pv)
            out["delta"].append(pv - rk)
    return pa.table({
        "day": pa.array(np.array(out["day"], np.int64)).cast(
            pa.timestamp("us")),
        "event_type": pa.array(out["event_type"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
        "prev_rank": pa.array(out["prev_rank"], pa.int64()),
        "delta": pa.array(out["delta"], pa.int64()),
    })


def mlm_mask_plan_docs(sf_dir: str):
    """Masked-LM DATA-PREP plan: the deterministic 15% token-masking
    schedule — token i of doc d is masked iff ``splitmix64(d * 2^20 +
    i) % 100 < 15`` — reported per doc as (n_tokens, n_masked), fully
    SQL-replayable (the mask needs only positions, never token bytes,
    so the exchange is zero and the scan is length-arithmetic only).
    Guards: doc_id < 2^42 and n_tokens < 2^20 keep the packed key
    collision-free."""
    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plan(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lens = pc.list_value_length(
            pc.split_pattern(pc.utf8_lower(text.fill_null("")), " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        if ids.size and (int(ids.max()) >= 2**42
                         or int(lens.max()) >= 2**20):
            raise OverflowError("mlm_mask: packed (doc, pos) key "
                                "exceeds int64")
        doc_rep = np.repeat(np.arange(ids.size), lens)
        pos = np.arange(int(lens.sum())) - np.repeat(
            np.cumsum(lens) - lens, lens)
        key = (ids[doc_rep] << np.int64(20)) + pos + 1
        masked = (splitmix64(key.astype(np.uint64))
                  % np.uint64(100)) < np.uint64(15)
        nm = np.zeros(ids.size, np.int64)
        np.add.at(nm, doc_rep, masked.astype(np.int64))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(lens),
            "n_masked": pa.array(nm),
        })

    return ds.map_batches(plan, batch_format="pyarrow")


def user_lifetime_survival_events(sf_dir: str):
    """User-lifetime SURVIVAL curve (the churn view of retention): per
    observed day d, users alive entering d (first_day <= d <=
    last_day), users whose LAST event is d (churned), and the exact
    floor-ppm survival share ``still_alive_after / n_users`` — the
    Kaplan-Meier shape without censoring, so the product form
    collapses to exact counting.  One per-user (min, max) exchange;
    the bounded day table folds driver-side."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        d = pc.multiply(pc.divide(ts, day_us), day_us)
        return pa.table({"user_id": batch["user_id"], "day_us": d})

    span = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        [("day_us", "min", "first_day"), ("day_us", "max", "last_day")],
    )

    def pairs(batch: pa.Table) -> pa.Table:
        f = batch["first_day"].to_numpy(zero_copy_only=False)
        ls = batch["last_day"].to_numpy(zero_copy_only=False)
        uf, cf = np.unique(f, return_counts=True)
        ul, cl = np.unique(ls, return_counts=True)
        return pa.table({
            "day_us": pa.array(np.concatenate([uf, ul])),
            "n_born": pa.array(np.concatenate(
                [cf, np.zeros(ul.size, np.int64)]).astype(np.int64)),
            "n_churn": pa.array(np.concatenate(
                [np.zeros(uf.size, np.int64), cl]).astype(np.int64)),
        })

    daily = grouped_aggregate(
        span.map_batches(pairs, batch_format="pyarrow"),
        ["day_us"],
        [("n_born", "sum", "n_born"), ("n_churn", "sum", "n_churn")],
    )
    rows = sorted(daily.take_all(), key=lambda r: int(r["day_us"]))
    total = sum(int(r["n_born"]) for r in rows)
    alive = 0
    out = {"day": [], "n_alive": [], "n_churn": [], "surv_ppm": []}
    dead = 0
    for r in rows:
        alive += int(r["n_born"])
        churn = int(r["n_churn"])
        out["day"].append(int(r["day_us"]))
        out["n_alive"].append(alive - dead)
        out["n_churn"].append(churn)
        dead += churn
        out["surv_ppm"].append((total - dead) * 1_000_000 // total
                               if total else 0)
    return pa.table({
        "day": pa.array(np.array(out["day"], np.int64)).cast(
            pa.timestamp("us")),
        "n_alive": pa.array(out["n_alive"], pa.int64()),
        "n_churn": pa.array(out["n_churn"], pa.int64()),
        "surv_ppm": pa.array(out["surv_ppm"], pa.int64()),
    })


def multitouch_attribution_events(sf_dir: str):
    """LINEAR multi-touch attribution: each purchase splits one unit
    of credit equally (floor micro-shares of 1e6) across all view /
    click touches of the SAME user in the 24 h window before it —
    the marketing-science upgrade of first/last-touch
    ``session_attribution``.  Per user-bucket, the touch windows
    resolve with the packed-key double searchsorted (no pair
    materialization for counting k); credits spread with one
    ``np.add.at`` over the expanded ranges, bounded by the true
    touch-pair count."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])
    win_us = 86_400_000_000  # 24 h

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["view", "click",
                                            "purchase"]))
        t = batch.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"), ("ts_us", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        empty = pa.table({
            "event_type": pa.array([], pa.string()),
            "credit_micro": pa.array([], pa.int64()),
            "n_touches": pa.array([], pa.int64()),
        })
        if u.size == 0:
            return empty
        is_p = ty == "purchase"
        is_t = ~is_p
        t0 = int(ts.min())
        rel = ts - t0
        m_span = int(rel.max()) + win_us + 2
        if int(u.max()) > (2**62) // m_span:
            raise OverflowError("multitouch: user*span key exceeds "
                                "int64 — re-bucket by (user, day)")
        key = u * m_span + rel
        tkey = key[is_t]
        tty = ty[is_t]
        pkey = key[is_p]
        lo = np.searchsorted(tkey, pkey - win_us, side="left")
        hi = np.searchsorted(tkey, pkey, side="left")  # strictly before
        k = hi - lo
        ok = k > 0
        lo, hi, k = lo[ok], hi[ok], k[ok]
        share = (1_000_000 // k).astype(np.int64)
        # expand [lo, hi) ranges into flat touch indices + shares —
        # repeat/offset arithmetic, no per-purchase Python loop
        total = int(k.sum())
        idx = (np.repeat(lo, k)
               + (np.arange(total) - np.repeat(np.cumsum(k) - k, k)))
        sh = np.repeat(share, k)
        utypes, tcodes = np.unique(tty, return_inverse=True)
        cred = np.zeros(utypes.size, np.int64)
        np.add.at(cred, tcodes[idx], sh)
        ntouch = np.bincount(tcodes[idx], minlength=utypes.size)
        nz = np.flatnonzero(ntouch)
        return pa.table({
            "event_type": pa.array(utypes[nz], pa.string()),
            "credit_micro": pa.array(cred[nz]),
            "n_touches": pa.array(ntouch[nz].astype(np.int64)),
        })

    return grouped_aggregate(
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["event_type"],
        [("credit_micro", "sum", "credit_micro"),
         ("n_touches", "sum", "n_touches")],
    )


def subtree_share_parts(sf_dir: str):
    """Percent-of-parent HIERARCHICAL share: each non-root node's
    subtree cents as a floor-ppm share of its PARENT's subtree cents —
    the drill-down report over the 8-ary part tree (composes the
    subtree rollup with a parent self-join; parent key is pure
    arithmetic so the join is a bounded broadcast lookup, not an
    exchange)."""
    import ray

    roll = subtree_rollup_parts(sf_dir).materialize()
    # the rollup is bounded by the key space (~1.15x the part count);
    # broadcast the (node -> subtree_cents) map for the parent lookup
    parts = [t for t in ray.get(roll.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts)
    nodes = tbl["node"].to_numpy(zero_copy_only=False)
    cents = tbl["subtree_cents"].to_numpy(zero_copy_only=False)
    order = np.argsort(nodes, kind="stable")
    lookup_ref = ray.put((nodes[order], cents[order]))

    def share(batch: pa.Table) -> pa.Table:
        nk, nc = ray.get(lookup_ref) \
            if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
        node = batch["node"].to_numpy(zero_copy_only=False)
        sc = batch["subtree_cents"].to_numpy(zero_copy_only=False)
        keep = node > 0
        node, sc = node[keep], sc[keep]
        parent = node // 8
        pos = np.searchsorted(nk, parent)
        pc_ = nc[pos]
        if sc.size and int(np.abs(sc).max()) > (2**62) // 1_000_000:
            raise OverflowError("subtree_share: cents*1e6 overflows")
        return pa.table({
            "node": pa.array(node),
            "parent": pa.array(parent),
            "share_ppm": pa.array((sc * 1_000_000) // pc_),
        })

    return roll.map_batches(share, batch_format="pyarrow")


def psi_value_drift_events(sf_dir: str):
    """Population Stability Index (PSI — THE industry drift metric for
    model inputs) between the first and second time half of the value
    distribution, in EXACT fixed-point: per 2048-cent bucket,
    ``psi_term_q = (na*TB - nb*TA) * (qlog2(na*TB) - qlog2(nb*TA))``
    using the deterministic integer qlog2 kernel (both engines replay
    the same truncation loop bit-for-bit; the caller divides by
    TA*TB*2^16/ln2 for the textbook value).  One-sided buckets (a
    count of zero on either side, where PSI is undefined) emit flagged
    zero terms.  A tiny MIN/MAX pass fixes the time cut; one bounded
    (bucket x 2) exchange; the <=16-row fold runs driver-side."""
    from geodata_ray.stages.lm import qlog2_fixed

    ev0 = _read(sf_dir, "events", columns=["ts"])
    day_us = 86_400_000_000
    bounds = grouped_aggregate(
        ev0.map_batches(
            lambda t: pa.table({
                "g": pa.array(np.zeros(min(len(t), 1), np.int64)),
                "ts_us": pa.array(
                    [int(pc.min(pc.cast(t["ts"], pa.int64())).as_py())]
                    if len(t) else [], pa.int64()),
                "ts_mx": pa.array(
                    [int(pc.max(pc.cast(t["ts"], pa.int64())).as_py())]
                    if len(t) else [], pa.int64()),
            }),
            batch_format="pyarrow"),
        ["g"],
        [("ts_us", "min", "lo"), ("ts_mx", "max", "hi")],
    ).take_all()
    lo_day = int(bounds[0]["lo"]) // day_us
    hi_day = int(bounds[0]["hi"]) // day_us
    cut_us = ((lo_day + hi_day) // 2) * day_us  # floor day midpoint

    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        if cents.size and int(cents.min()) < 0:
            raise ValueError("psi: negative cents outside the bucket "
                             "domain")
        b = cents // 2048
        first = (ts // day_us) * day_us < cut_us
        ub, inv = np.unique(b, return_inverse=True)
        na = np.bincount(inv[first], minlength=ub.size)
        nb = np.bincount(inv[~first], minlength=ub.size)
        return pa.table({
            "bucket": pa.array(ub),
            "n_a": pa.array(na.astype(np.int64)),
            "n_b": pa.array(nb.astype(np.int64)),
        })

    agg = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["bucket"], [("n_a", "sum", "n_a"), ("n_b", "sum", "n_b")],
    )
    rows = sorted(agg.take_all(), key=lambda r: int(r["bucket"]))
    na = np.array([int(r["n_a"]) for r in rows], np.int64)
    nb = np.array([int(r["n_b"]) for r in rows], np.int64)
    ta, tb = int(na.sum()), int(nb.sum())
    two = (na > 0) & (nb > 0)
    psi = np.zeros(na.size, np.int64)
    if two.any():
        # guard in PYTHON INTS before the uint64 cast — a wrapped
        # product would otherwise pass a small bogus value through
        if (int(na[two].max()) * tb > 2**62
                or int(nb[two].max()) * ta > 2**62):
            raise OverflowError("psi: count*total exceeds the qlog2 "
                                "domain")
        xa = na[two].astype(np.uint64) * np.uint64(tb)
        xb = nb[two].astype(np.uint64) * np.uint64(ta)
        dq = qlog2_fixed(xa).astype(np.int64) \
            - qlog2_fixed(xb).astype(np.int64)
        dn = xa.astype(np.int64) - xb.astype(np.int64)
        term = dn * dq
        if term.size and int(np.abs(term).max()) > 2**62:
            raise OverflowError("psi: term exceeds int64")
        psi[two] = term
    return pa.table({
        "bucket": pa.array([int(r["bucket"]) for r in rows], pa.int64()),
        "n_a": pa.array(na),
        "n_b": pa.array(nb),
        "one_sided": pa.array((~two).astype(np.int64)),
        "psi_term_q": pa.array(psi),
    })


def histogram_intersection_types_events(sf_dir: str):
    """Histogram-intersection similarity between every pair of event
    types' exact cents distributions (the distribution-overlap kernel
    — drift/segmentation companion to KS and PSI): ``inter =
    sum_v min(h_a(v), h_b(v))``, normalized floor-ppm by the smaller
    total.  The (type, cents) histogram is the only exchange (bounded
    by the value domain); per-value pairwise mins emit from a
    ``map_groups`` over cents, so the pair table never leaves the
    cluster unbounded."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({"event_type": batch["event_type"],
                         "cents": cents})

    hist = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "cents"], [("cents", "count", "n")],
    ).materialize()  # bounded by the value domain; consumed twice

    def pair_mins(g: pa.Table) -> pa.Table:
        ty = g["event_type"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(ty, kind="stable")
        ty, n = ty[order], n[order]
        k = ty.size
        if k < 2:
            return pa.table({
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "inter": pa.array([], pa.int64()),
            })
        iu, ju = np.triu_indices(k, k=1)
        return pa.table({
            "type_a": pa.array(ty[iu], pa.string()),
            "type_b": pa.array(ty[ju], pa.string()),
            "inter": pa.array(np.minimum(n[iu], n[ju]).astype(np.int64)),
        })

    pairs = grouped_aggregate(
        hist.groupby("cents").map_groups(pair_mins,
                                         batch_format="pyarrow"),
        ["type_a", "type_b"], [("inter", "sum", "inter")],
    )
    totals = {
        r["event_type"]: int(r["n"])
        for r in grouped_aggregate(
            hist, ["event_type"], [("n", "sum", "n")],
        ).take_all()
    }

    def finish(batch: pa.Table) -> pa.Table:
        a = batch["type_a"].to_numpy(zero_copy_only=False)
        b = batch["type_b"].to_numpy(zero_copy_only=False)
        inter = batch["inter"].to_numpy(zero_copy_only=False)
        mn = np.array([min(totals[x], totals[y]) for x, y in zip(a, b)],
                      np.int64)
        return batch.append_column(
            "sim_ppm", pa.array((inter * 1_000_000) // mn))

    return pairs.map_batches(finish, batch_format="pyarrow")


def embedding_drift_labels(sf_dir: str):
    """Per-label EMBEDDING DRIFT between the two vec_id halves (the
    centroid-shift monitor for feature pipelines — PSI's vector-space
    sibling): squared centroid distance in exact micro-units via the
    cross-multiplied difference ``sum_d (S_a[d]*n_b - S_b[d]*n_a)^2 *
    1e6 // (n_a*n_b)^2`` — division-free until the final floor, folded
    in PYTHON INTS over the bounded (label x dim) state.  One
    pre-combined (label, half, dim) exchange; the corpus never
    shuffles."""
    ev = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])

    def prep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "half": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        from geodata_ray.stages.lm import quantized_matrix

        q = quantized_matrix(batch["embedding"], len(batch))
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        half = (batch["vec_id"].to_numpy(zero_copy_only=False)
                % 2).astype(np.int64)
        key = lab * 2 + half
        uk, inv = np.unique(key, return_inverse=True)
        d = q.shape[1]
        s = np.zeros((uk.size, d), np.int64)
        np.add.at(s, inv, q)
        cnt = np.bincount(inv)
        return pa.table({
            "label": pa.array(np.repeat(uk // 2, d)),
            "half": pa.array(np.repeat(uk % 2, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    uk.size)),
            "s": pa.array(s.ravel()),
            "n": pa.array(np.repeat(cnt.astype(np.int64), d)),
        })

    state = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["label", "half", "dim"],
        [("s", "sum", "s"), ("n", "sum", "n")],
    )
    rows = state.take_all()  # bounded: labels x 2 x 64
    acc: dict[tuple[int, int], dict] = {}
    for r in rows:
        k = (int(r["label"]), int(r["half"]))
        e = acc.setdefault(k, {"s": {}, "n": 0})
        e["s"][int(r["dim"])] = int(r["s"])
        e["n"] = int(r["n"])  # identical across dims of one key
    labels = sorted({l for l, _h in acc})
    out = {"label": [], "n_a": [], "n_b": [], "shift_sq_micro": []}
    for l in labels:
        a = acc.get((l, 0))
        b = acc.get((l, 1))
        if a is None or b is None:
            continue  # one-sided label: drift undefined (SQL join drops)
        na, nb = a["n"], b["n"]
        num = sum(
            (a["s"].get(d, 0) * nb - b["s"].get(d, 0) * na) ** 2
            for d in range(1, 65)
        )
        shift = num * 1_000_000 // (na * nb) ** 2
        if shift > 2**62:
            raise OverflowError("embedding_drift: shift exceeds int64")
        out["label"].append(l)
        out["n_a"].append(na)
        out["n_b"].append(nb)
        out["shift_sq_micro"].append(shift)
    return pa.table({
        "label": pa.array(out["label"], pa.int64()),
        "n_a": pa.array(out["n_a"], pa.int64()),
        "n_b": pa.array(out["n_b"], pa.int64()),
        "shift_sq_micro": pa.array(out["shift_sq_micro"], pa.int64()),
    })


def crosscorr_daily_events(sf_dir: str):
    """Lead-lag CROSS-correlation between the view and click daily
    series: for lag k in -3..3, the exact-integer Pearson moments of
    (x_t, y_{t+k}) — "does view lead click?" — completing the
    Pearson/Kendall/autocorr family over the shared
    ``_daily_view_click_counts`` exchange.  Signed corr^2 in ppb plus
    exact ingredients; lags with no pairs emit no row (oracle GROUP BY
    parity)."""
    xs, ys = _daily_view_click_counts(sf_dir)
    out = {"lag": [], "num": [], "den_x": [], "den_y": [],
           "corr_sq_ppb": []}
    n = len(xs)
    for k in range(-3, 4):
        if k >= 0:
            a = xs[:n - k]
            b = ys[k:]
        else:
            a = xs[-k:]
            b = ys[:n + k]
        m = len(a)
        if m == 0:
            continue
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sxx = sum(p * p for p in a)
        syy = sum(q * q for q in b)
        num = m * sxy - sx * sy
        den_x = m * sxx - sx * sx
        den_y = m * syy - sy * sy
        if den_x and den_y:
            sgn = -1 if num < 0 else 1
            corr = sgn * ((num * num * 10**9) // (den_x * den_y))
        else:
            corr = 0
        if any(abs(v) > 2**62 for v in (num, den_x, den_y, corr)):
            raise OverflowError("crosscorr: moment exceeds int64")
        out["lag"].append(k)
        out["num"].append(num)
        out["den_x"].append(den_x)
        out["den_y"].append(den_y)
        out["corr_sq_ppb"].append(corr)
    return pa.table({
        "lag": pa.array(out["lag"], pa.int64()),
        "num": pa.array(out["num"], pa.int64()),
        "den_x": pa.array(out["den_x"], pa.int64()),
        "den_y": pa.array(out["den_y"], pa.int64()),
        "corr_sq_ppb": pa.array(out["corr_sq_ppb"], pa.int64()),
    })


def dim_variance_embeddings(sf_dir: str):
    """Per-dimension VARIANCE screening of the embedding space (the
    feature-selection / dead-dimension audit before indexing): exact
    integer moments per dim — ``var_num = n*sum(q^2) - sum(q)^2``
    (n^2 times the variance) — over the FLOOR-2^10 quantized
    components, top-8 dims flagged.  One bounded 64-row moment
    exchange from per-batch einsum partials; the corpus never
    shuffles."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "dim": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        from geodata_ray.stages.lm import quantized_matrix

        q = quantized_matrix(batch["embedding"], len(batch))
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "s": pa.array(q.sum(axis=0)),
            "ss": pa.array(np.einsum("nd,nd->d", q, q)),
            "n": pa.array(np.full(d, len(batch), np.int64)),
        })

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        [("s", "sum", "s"), ("ss", "sum", "ss"), ("n", "sum", "n")],
    )
    rows = sorted(agg.take_all(), key=lambda r: int(r["dim"]))
    dims = np.array([int(r["dim"]) for r in rows], np.int64)
    s = np.array([int(r["s"]) for r in rows], dtype=object)
    ss = np.array([int(r["ss"]) for r in rows], dtype=object)
    n = int(rows[0]["n"]) if rows else 0
    var_num = n * ss - s * s  # Python ints: no overflow at any scale
    if any(abs(int(v)) > 2**62 for v in var_num):
        raise OverflowError("dim_variance: n^2*var exceeds int64 "
                            "output — rescale")
    order = np.lexsort((dims, [-int(v) for v in var_num]))
    topset = set(dims[order[:8]].tolist())
    return pa.table({
        "dim": pa.array(dims),
        "sum_q": pa.array([int(v) for v in s], pa.int64()),
        "sum_q2": pa.array([int(v) for v in ss], pa.int64()),
        "var_num": pa.array([int(v) for v in var_num], pa.int64()),
        "is_top8": pa.array(
            [1 if int(d) in topset else 0 for d in dims], pa.int64()),
    })


def mrr_same_label_embeddings(sf_dir: str):
    """Mean Reciprocal Rank (the retrieval-eval position metric next
    to ``ann_recall``'s set metric): for each of the 10 lowest-id
    anchor vectors, the rank of its FIRST same-label neighbor in the
    exact integer L2 ordering (ties before it by (dist, vec_id)
    count), emitted with floor-micro reciprocal shares.  Two streaming
    passes: the triplet machinery's d_pos bound broadcasts, then one
    scan counts strictly-closer (and tied lower-id) vectors — no
    global sort, no pair materialization."""
    import ray

    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])

    def bottom10(batch: pa.Table) -> pa.Table:
        order = np.argsort(
            batch["vec_id"].to_numpy(zero_copy_only=False),
            kind="stable")[:10]
        return batch.take(pa.array(order.astype(np.int64)))

    parts = [t for t in ray.get(
        ds.map_batches(bottom10, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    cand = pa.concat_tables(parts)
    vid0 = cand["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid0, kind="stable")[:10]
    a_ids = vid0[order]
    a_lab = cand["label"].to_numpy(zero_copy_only=False).astype(
        np.int64)[order]
    from geodata_ray.stages.lm import quantized_matrix

    a_q = quantized_matrix(cand["embedding"], cand.num_rows)[order]
    anchors = ray.put((a_ids, a_lab, a_q))

    def scan(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "anchor_id": pa.array([], pa.int64()),
                "d_pos": pa.array([], pa.int64()),
                "pos_vid": pa.array([], pa.int64()),
            })
        from geodata_ray.stages.lm import quantized_matrix

        ids_, labs_, qa = ray.get(anchors) \
            if isinstance(anchors, ray.ObjectRef) else anchors
        q = quantized_matrix(batch["embedding"], len(batch))
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        big = np.int64(2**62)
        out_a, out_d, out_v = [], [], []
        for i in range(len(ids_)):
            diff = q - qa[i]
            d = np.einsum("nd,nd->n", diff, diff)
            d = np.where(vid == ids_[i], big, d)
            same = lab == labs_[i]
            if same.any():
                ds_ = d[same]
                vv = vid[same]
                j = np.lexsort((vv, ds_))[0]
                out_a.append(int(ids_[i]))
                out_d.append(int(ds_[j]))
                out_v.append(int(vv[j]))
        return pa.table({
            "anchor_id": pa.array(out_a, pa.int64()),
            "d_pos": pa.array(out_d, pa.int64()),
            "pos_vid": pa.array(out_v, pa.int64()),
        })

    # phase 1: the nearest same-label neighbor per anchor ((dist, vid)
    # lexicographic min via one grouped pass over per-block minima)
    p1 = ds.map_batches(scan, batch_format="pyarrow")
    best: dict[int, tuple[int, int]] = {}
    for r in p1.take_all():  # bounded: 10 rows per block
        k = int(r["anchor_id"])
        cur = (int(r["d_pos"]), int(r["pos_vid"]))
        if k not in best or cur < best[k]:
            best[k] = cur
    # an anchor whose label is UNIQUE has only the 2^62 self-sentinel
    # as its "best positive" — the oracle emits no row for it, so drop
    # it here too instead of reporting a bogus rank
    big = 2**62
    best = {k: v for k, v in best.items() if v[0] < big}
    bref = ray.put(best)

    def count_closer(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "anchor_id": pa.array([], pa.int64()),
                "n_before": pa.array([], pa.int64()),
            })
        from geodata_ray.stages.lm import quantized_matrix

        ids_, labs_, qa = ray.get(anchors) \
            if isinstance(anchors, ray.ObjectRef) else anchors
        bst = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        q = quantized_matrix(batch["embedding"], len(batch))
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_a, out_n = [], []
        for i in range(len(ids_)):
            k = int(ids_[i])
            if k not in bst:
                continue
            dp, pv = bst[k]
            diff = q - qa[i]
            d = np.einsum("nd,nd->n", diff, diff)
            ok = vid != ids_[i]
            before = ok & ((d < dp) | ((d == dp) & (vid < pv)))
            out_a.append(k)
            out_n.append(int(before.sum()))
        return pa.table({
            "anchor_id": pa.array(out_a, pa.int64()),
            "n_before": pa.array(out_n, pa.int64()),
        })

    agg = grouped_aggregate(
        ds.map_batches(count_closer, batch_format="pyarrow"),
        ["anchor_id"], [("n_before", "sum", "n_before")],
    )
    rows = sorted(agg.take_all(), key=lambda r: int(r["anchor_id"]))
    return pa.table({
        "anchor_id": pa.array(
            [int(r["anchor_id"]) for r in rows], pa.int64()),
        "rank": pa.array(
            [int(r["n_before"]) + 1 for r in rows], pa.int64()),
        "recip_micro": pa.array(
            [1_000_000 // (int(r["n_before"]) + 1) for r in rows],
            pa.int64()),
    })


def snm_pairs_customers(sf_dir: str):
    """Sorted-Neighborhood Method candidate pairs (the classic
    record-linkage BLOCKING alternative to LSH: sort by a fuzzy key,
    compare only within a fixed window): customers sort globally by
    (balance cents, custkey); every pair within rank distance <= 4
    whose balances differ by <= 10 cents is a candidate duplicate.
    Distributed: one global range-partitioned sort, per-block pair
    generation, and the <= 4-deep block JUNCTIONS stitched driver-side
    from 4-row head/tail marker rows per block (the pair set is
    provably independent of where Ray splits the blocks).  Blocks
    thinner than the window raise rather than silently dropping
    junction pairs."""
    ev = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    win = 4
    tol = 10

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["c_acctbal"],
                                         pa.float64()), 100.0)),
            pa.int64(),
        )
        return pa.table({
            "cents": cents,
            "key": pc.cast(batch["c_custkey"], pa.int64()),
        })

    srt = ev.map_batches(prep, batch_format="pyarrow").sort(
        ["cents", "key"])

    def block_pairs(batch: pa.Table) -> pa.Table:
        c = batch["cents"].to_numpy(zero_copy_only=False)
        k = batch["key"].to_numpy(zero_copy_only=False)
        n = c.size
        empty_cols = {
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
            "diff_cents": pa.array([], pa.int64()),
            "__head_off": pa.array([], pa.int64()),
            "__tail_off": pa.array([], pa.int64()),
            "__cents": pa.array([], pa.int64()),
            "__key": pa.array([], pa.int64()),
        }
        if n == 0:
            return pa.table(empty_cols)
        if n < 2 * win:
            raise ValueError(
                "snm: a sorted block is thinner than 2x the window — "
                "repartition the sorted input before pair generation"
            )
        ka, kb, dc = [], [], []
        for d in range(1, win + 1):
            diff = c[d:] - c[:-d]
            ok = diff <= tol
            ka.append(k[:-d][ok])
            kb.append(k[d:][ok])
            dc.append(diff[ok])
        ka = np.concatenate(ka)
        kb = np.concatenate(kb)
        dc = np.concatenate(dc)
        # marker rows: first/last `win` rows with their offsets, so
        # the driver can compute cross-junction rank distances
        m = win
        head_off = np.r_[np.arange(m), np.full(m, -1)]
        tail_off = np.r_[np.full(m, -1), np.arange(m - 1, -1, -1)]
        mc = np.r_[c[:m], c[-m:]]
        mk = np.r_[k[:m], k[-m:]]
        pairs_n = ka.size
        mark_n = 2 * m
        return pa.table({
            "key_a": pa.array(np.r_[ka, np.zeros(mark_n, np.int64)]),
            "key_b": pa.array(np.r_[kb, np.zeros(mark_n, np.int64)]),
            "diff_cents": pa.array(
                np.r_[dc, np.zeros(mark_n, np.int64)]),
            "__head_off": pa.array(
                np.r_[np.full(pairs_n, -2, np.int64), head_off]),
            "__tail_off": pa.array(
                np.r_[np.full(pairs_n, -2, np.int64), tail_off]),
            "__cents": pa.array(np.r_[np.zeros(pairs_n, np.int64), mc]),
            "__key": pa.array(np.r_[np.zeros(pairs_n, np.int64), mk]),
        })

    import ray

    out = srt.map_batches(block_pairs, batch_format="pyarrow")
    # one output block per sorted input block: split each into its
    # pair rows and its 2*win marker rows (head/tail offsets)
    ka, kb, dc = [], [], []
    marker_blocks = []
    for t in ray.get(out.to_arrow_refs()):
        if t.num_rows == 0:
            continue
        ho = t["__head_off"].to_numpy(zero_copy_only=False)
        is_pair = ho == -2
        p = t.filter(pa.array(is_pair))
        ka.append(p["key_a"].to_numpy(zero_copy_only=False))
        kb.append(p["key_b"].to_numpy(zero_copy_only=False))
        dc.append(p["diff_cents"].to_numpy(zero_copy_only=False))
        m = t.filter(pa.array(~is_pair))
        if m.num_rows:
            marker_blocks.append(m)
    # blocks are globally ordered by the sort: their first marker row
    # (head_off == 0 == the block's first row) recovers adjacency
    marker_blocks.sort(
        key=lambda m: (int(m["__cents"][0].as_py()),
                       int(m["__key"][0].as_py()))
    )
    for i in range(len(marker_blocks) - 1):
        mt = marker_blocks[i]
        mh = marker_blocks[i + 1]
        toff = mt["__tail_off"].to_numpy(zero_copy_only=False)
        hoff = mh["__head_off"].to_numpy(zero_copy_only=False)
        tsel = toff >= 0
        hsel = hoff >= 0
        tc = mt["__cents"].to_numpy(zero_copy_only=False)[tsel]
        tk = mt["__key"].to_numpy(zero_copy_only=False)[tsel]
        to = toff[tsel]
        hc = mh["__cents"].to_numpy(zero_copy_only=False)[hsel]
        hk = mh["__key"].to_numpy(zero_copy_only=False)[hsel]
        ho2 = hoff[hsel]
        dist = to[:, None] + ho2[None, :] + 1
        diff = hc[None, :] - tc[:, None]
        hit = (dist <= win) & (diff <= tol)
        ti, hi = np.nonzero(hit)
        ka.append(tk[ti])
        kb.append(hk[hi])
        dc.append(diff[ti, hi])
    ka = np.concatenate(ka) if ka else np.empty(0, np.int64)
    kb = np.concatenate(kb) if kb else np.empty(0, np.int64)
    dc = np.concatenate(dc) if dc else np.empty(0, np.int64)
    order = np.lexsort((kb, ka))
    return pa.table({
        "key_a": pa.array(ka[order].astype(np.int64)),
        "key_b": pa.array(kb[order].astype(np.int64)),
        "diff_cents": pa.array(dc[order].astype(np.int64)),
    })


def daily_trend_slope_types_events(sf_dir: str):
    """Per-type TREND line (ordinary-least-squares slope of daily
    counts over the day index) with exact integer moments: ``slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` emitted as the exact numerator
    / denominator plus sign-factored floor slope in micro-units/day —
    the metric-trend regression shape (first of the regression
    family).  One bounded (day x type) pre-combined exchange; the
    fold runs driver-side in Python ints."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = (ts // day_us) * day_us
        t = pa.table({"day_us": pa.array(d),
                      "event_type": batch["event_type"]})
        out = t.group_by(["day_us", "event_type"]).aggregate(
            [([], "count_all")])
        ncol = next(c for c in out.column_names
                    if c not in ("day_us", "event_type"))
        return pa.table({
            "day_us": out["day_us"],
            "event_type": out["event_type"],
            "n": out[ncol],
        })

    daily = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day_us", "event_type"], [("n", "sum", "n")],
    )
    rows = daily.take_all()  # bounded: days x types
    min_day = min(int(r["day_us"]) for r in rows)
    series: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(
            ((int(r["day_us"]) - min_day) // day_us, int(r["n"])))
    out = {"event_type": [], "n_days": [], "num": [], "den": [],
           "slope_micro": []}
    for ty in sorted(series):
        pts = series[ty]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = 0 if den == 0 else (
            (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // den)
        )
        if any(abs(v) > 2**62 for v in (num, den, slope)):
            raise OverflowError("trend_slope: moment exceeds int64")
        out["event_type"].append(ty)
        out["n_days"].append(n)
        out["num"].append(num)
        out["den"].append(den)
        out["slope_micro"].append(slope)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_days": pa.array(out["n_days"], pa.int64()),
        "num": pa.array(out["num"], pa.int64()),
        "den": pa.array(out["den"], pa.int64()),
        "slope_micro": pa.array(out["slope_micro"], pa.int64()),
    })


def sliding_max_user_values(sf_dir: str):
    """Sliding-window MAX over each user's event stream (ROWS 4
    PRECEDING — the monotonic-deque window op, e.g. peak-value-in-
    last-5 alerting): per event, the max cents of the trailing 5
    same-user rows.  Same bucketed per-user ordered pass as TWAP; the
    window fold is 5 vectorized shifted maxima with a position mask
    (O(w*n), zero Python loops over rows)."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "cents": cents,
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "max5": pa.array([], pa.int64()),
            })
        new = np.ones(u.size, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        pos = np.arange(u.size) - starts[seg]
        acc = c.copy()
        for d in range(1, 5):
            idx = np.flatnonzero(pos >= d)
            acc[idx] = np.maximum(acc[idx], c[idx - d])
        return pa.table({
            "event_id": t["event_id"],
            "cents": pa.array(c),
            "max5": pa.array(acc),
        })

    return (
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def unpivot_daily_types_events(sf_dir: str):
    """UNPIVOT / melt: the dynamic per-type count pivot flows BACK to
    long form (day, event_type, n) with zero-count cells dropped — the
    wide-to-long reshape that completes the pivot pair.  Melt is a
    pure per-batch map over the pivoted table (no extra exchange
    beyond the pivot's own); the oracle is the direct GROUP BY the
    round trip must reproduce."""
    wide = pivot_event_types_daily(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        cols = [c for c in batch.column_names if c != "day"]
        day = batch["day"]
        days, types, ns = [], [], []
        for cname in cols:
            n = batch[cname].to_numpy(zero_copy_only=False)
            keep = n > 0
            days.append(
                day.take(pa.array(np.flatnonzero(keep).astype(
                    np.int64))))
            types.append(np.full(int(keep.sum()), cname, dtype=object))
            ns.append(n[keep])
        if not days:
            return pa.table({
                "day": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        return pa.table({
            "day": pa.concat_arrays(
                [d.combine_chunks() if isinstance(d, pa.ChunkedArray)
                 else d for d in days]),
            "event_type": pa.array(
                np.concatenate(types).tolist(), pa.string()),
            "n": pa.array(np.concatenate(ns).astype(np.int64)),
        })

    return wide.map_batches(melt, batch_format="pyarrow")


def decision_stump_events(sf_dir: str):
    """Decision-STUMP split search (the tree-learning primitive): over
    the 15 bucket-edge thresholds t = k*2048, find the cents split
    minimizing the EXACT weighted child entropy for predicting
    ``event_type == 'purchase'`` — ``H_num(n, p) = n*qlog2(n) -
    p*qlog2(p) - (n-p)*qlog2(n-p)`` per side (the n-scaled entropy, so
    no division), summed and compared as integers; ties take the
    smallest threshold.  One bounded (bucket x label) exchange; the
    15-candidate fold runs driver-side with the deterministic qlog2
    kernel the SQL replays bit-for-bit."""
    from geodata_ray.stages.lm import qlog2_fixed

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        if cents.size and int(cents.min()) < 0:
            raise ValueError("stump: negative cents outside the "
                             "bucket domain")
        b = np.clip(cents // 2048, 0, 15)
        eq = pc.equal(batch["event_type"], "purchase")
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        y = eq.to_numpy(zero_copy_only=False).astype(np.int64)
        key = b * 2 + y
        acc = np.bincount(key, minlength=32)
        nz = np.flatnonzero(acc)
        return pa.table({
            "bucket": pa.array((nz // 2).astype(np.int64)),
            "is_pos": pa.array((nz % 2).astype(np.int64)),
            "n": pa.array(acc[nz].astype(np.int64)),
        })

    agg = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["bucket", "is_pos"], [("n", "sum", "n")],
    )
    cnt = np.zeros((16, 2), dtype=np.int64)
    for r in agg.take_all():
        cnt[int(r["bucket"]), int(r["is_pos"])] = int(r["n"])

    def h_num(n: int, p: int) -> int:
        # n*qlog2(n) - p*qlog2(p) - (n-p)*qlog2(n-p), 0-count terms 0
        tot = 0
        for c, sign in ((n, 1), (p, -1), (n - p, -1)):
            if c > 0:
                tot += sign * c * int(
                    qlog2_fixed(np.array([c], np.uint64))[0])
        return tot

    rows = {"threshold": [], "n_left": [], "pos_left": [],
            "n_right": [], "pos_right": [], "h_q": [], "is_best": []}
    best = None
    hs = []
    for k in range(1, 16):
        left = cnt[:k]
        right = cnt[k:]
        nl, pl = int(left.sum()), int(left[:, 1].sum())
        nr, pr = int(right.sum()), int(right[:, 1].sum())
        h = h_num(nl, pl) + h_num(nr, pr)
        if h > 2**62:
            raise OverflowError("stump: entropy numerator exceeds "
                                "int64")
        hs.append((h, k, nl, pl, nr, pr))
        if best is None or (h, k) < best:
            best = (h, k)
    for h, k, nl, pl, nr, pr in hs:
        rows["threshold"].append(k * 2048)
        rows["n_left"].append(nl)
        rows["pos_left"].append(pl)
        rows["n_right"].append(nr)
        rows["pos_right"].append(pr)
        rows["h_q"].append(h)
        rows["is_best"].append(1 if (h, k) == best else 0)
    return pa.table({
        "threshold": pa.array(rows["threshold"], pa.int64()),
        "n_left": pa.array(rows["n_left"], pa.int64()),
        "pos_left": pa.array(rows["pos_left"], pa.int64()),
        "n_right": pa.array(rows["n_right"], pa.int64()),
        "pos_right": pa.array(rows["pos_right"], pa.int64()),
        "h_q": pa.array(rows["h_q"], pa.int64()),
        "is_best": pa.array(rows["is_best"], pa.int64()),
    })


def front_coding_audit_docs(sf_dir: str):
    """FRONT-CODING storage audit (the sorted-string-table / term-
    dictionary compression estimate): URLs sort globally and every row
    records the byte LCP with its predecessor — ``saved_bytes`` is
    what delta-encoding the sorted run would save.  Per-block LCPs are
    fully vectorized over the padded byte matrix (argmax of the first
    mismatch); the one-row-deep block junctions stitch driver-side
    (same marker pattern as the SNM window, window=1).  Emits ONE
    audit row: n_urls, total_bytes, saved_bytes."""
    import ray

    from geodata_ray.stages.lm import _byte_view

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def urls(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        cat = np.array(list("abcde"), dtype=object)[d % 5]
        even = d % 2 == 0
        p = np.empty(len(d), dtype=object)
        ie = np.flatnonzero(even)
        io = np.flatnonzero(~even)
        p[ie] = [f"/{cat[i]}/item/{d[i] * 7 % 1000}/page/{d[i] % 13}"
                 for i in ie]
        p[io] = [f"/post/{d[i]}/comment/{d[i] % 7}" for i in io]
        return pa.table({
            "path": pa.array(list(p), pa.string()),
            "key": pa.array(d),
        })

    srt = ds.map_batches(urls, batch_format="pyarrow").sort(
        ["path", "key"])

    def block_lcp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "n_urls": pa.array([], pa.int64()),
                "total_bytes": pa.array([], pa.int64()),
                "saved_bytes": pa.array([], pa.int64()),
                "__first": pa.array([], pa.string()),
                "__last": pa.array([], pa.string()),
                "__first_key": pa.array([], pa.int64()),
            })
        data, offsets = _byte_view(batch["path"])
        lens = np.diff(offsets)
        lmax = int(lens.max()) if n else 0
        idx = offsets[:-1, None] + np.arange(lmax)[None, :]
        valid = idx < offsets[1:, None]
        mat = np.where(valid, data[np.minimum(idx, data.size - 1)], 0)
        saved = 0
        if n > 1:
            neq = mat[1:] != mat[:-1]
            any_neq = neq.any(axis=1)
            first_mis = np.where(any_neq, np.argmax(neq, axis=1), lmax)
            lcp = np.minimum(first_mis,
                             np.minimum(lens[1:], lens[:-1]))
            saved = int(lcp.sum())
        first = batch["path"][0].as_py()
        last = batch["path"][n - 1].as_py()
        first_key = int(batch["key"][0].as_py())
        return pa.table({
            "n_urls": pa.array([n], pa.int64()),
            "total_bytes": pa.array([int(lens.sum())], pa.int64()),
            "saved_bytes": pa.array([saved], pa.int64()),
            "__first": pa.array([first], pa.string()),
            "__last": pa.array([last], pa.string()),
            # unique tiebreak: duplicate paths can span whole blocks,
            # and adjacency by __first alone would then be arbitrary
            "__first_key": pa.array([first_key], pa.int64()),
        })

    parts = [t for t in ray.get(
        srt.map_batches(block_lcp, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    rows = sorted(
        (t.to_pylist()[0] for t in parts),
        key=lambda r: (r["__first"], r["__first_key"]),
    )
    n_urls = sum(r["n_urls"] for r in rows)
    total = sum(r["total_bytes"] for r in rows)
    saved = sum(r["saved_bytes"] for r in rows)
    for i in range(1, len(rows)):  # one-row-deep junctions
        a = rows[i - 1]["__last"]
        b = rows[i]["__first"]
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        saved += k
    return pa.table({
        "n_urls": pa.array([n_urls], pa.int64()),
        "total_bytes": pa.array([total], pa.int64()),
        "saved_bytes": pa.array([saved], pa.int64()),
    })


def residual_outlier_days_types_events(sf_dir: str):
    """OLS REGRESSION DIAGNOSTICS: per event type, the 3 days whose
    daily count deviates most from the type's fitted trend line —
    exact integer residuals scaled by ``n*den`` (``res = n*den*y_i -
    den*Sy - num*(n*x_i - Sx)``, so no division ever happens), ranked
    by |res| with day-ascending ties.  Composes the trend-slope
    moments over the same bounded (day x type) exchange."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = (ts // day_us) * day_us
        t = pa.table({"day_us": pa.array(d),
                      "event_type": batch["event_type"]})
        out = t.group_by(["day_us", "event_type"]).aggregate(
            [([], "count_all")])
        ncol = next(c for c in out.column_names
                    if c not in ("day_us", "event_type"))
        return pa.table({
            "day_us": out["day_us"],
            "event_type": out["event_type"],
            "n": out[ncol],
        })

    daily = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day_us", "event_type"], [("n", "sum", "n")],
    )
    rows = daily.take_all()  # bounded: days x types
    min_day = min(int(r["day_us"]) for r in rows)
    series: dict[str, list[tuple[int, int, int]]] = {}
    for r in rows:
        x = (int(r["day_us"]) - min_day) // day_us
        series.setdefault(r["event_type"], []).append(
            (x, int(r["n"]), int(r["day_us"])))
    out = {"event_type": [], "day": [], "res_scaled": [], "rank": []}
    for ty in sorted(series):
        pts = series[ty]
        n = len(pts)
        sx = sum(x for x, _y, _d in pts)
        sy = sum(y for _x, y, _d in pts)
        sxy = sum(x * y for x, y, _d in pts)
        sxx = sum(x * x for x, _y, _d in pts)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            continue  # a single-day series has no trend line
        scored = []
        for x, y, d in pts:
            res = n * den * y - den * sy - num * (n * x - sx)
            if abs(res) > 2**62:
                raise OverflowError("residuals: res_scaled exceeds "
                                    "int64")
            scored.append((-abs(res), d, res))
        scored.sort()
        for rk, (_negabs, d, res) in enumerate(scored[:3], 1):
            out["event_type"].append(ty)
            out["day"].append(d)
            out["res_scaled"].append(res)
            out["rank"].append(rk)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "day": pa.array(np.array(out["day"], np.int64)).cast(
            pa.timestamp("us")),
        "res_scaled": pa.array(out["res_scaled"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
    })


def zipf_slope_docs(sf_dir: str):
    """Power-law (Zipf) FIT: the exact-integer OLS slope of
    ``qlog2(count)`` against ``qlog2(rank)`` over the top-100 terms —
    composing the rank-frequency state with the regression family
    (Zipfian text fits slope ~ -1).  Emits the exact num/den moments
    plus sign-factored floor micro-slope; every input is the
    deterministic integer log both engines replay bit-for-bit."""
    st = zipf_state_docs(sf_dir).take_all()  # bounded: 100 rows
    x = [int(r["qlog2_rank_fp"]) for r in st]
    y = [int(r["qlog2_n_fp"]) for r in st]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = 0 if den == 0 else (
        (-1 if num < 0 else 1) * (abs(num) * 1_000_000 // den)
    )
    if any(abs(v) > 2**62 for v in (num, den, slope)):
        raise OverflowError("zipf_slope: moment exceeds int64")
    return pa.table({
        "n_terms": pa.array([n], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "slope_micro": pa.array([slope], pa.int64()),
    })


def negative_sampling_unigram_docs(sf_dir: str):
    """Word2vec-style NEGATIVE-SAMPLING plan: 100 deterministic probes
    ``u_i = splitmix64(i) % total_tokens`` resolve against the
    cumulative unigram ranges of the term-ascending vocabulary —
    frequency-proportional categorical sampling with zero floats.
    Scale plan: the vocabulary sorts by term; pass 1 sends one
    (min_term, block_total) marker per block to the driver (bounded by
    the block count) to compute exclusive block offsets; pass 2
    broadcasts the offsets keyed by min_term so each block resolves
    the probes landing in its own range locally — the cumulative walk
    never materializes the vocabulary in one place."""
    import ray

    from geodata_ray.sources.synth import splitmix64

    ds = _read(sf_dir, "documents", columns=["text"])

    def terms(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = pc.split_pattern(pc.utf8_lower(text.fill_null("")), " ")
        flat = (flat.combine_chunks()
                if isinstance(flat, pa.ChunkedArray) else flat).flatten()
        t = pa.table({"term": flat})
        out = t.group_by(["term"]).aggregate([([], "count_all")])
        ncol = next(c for c in out.column_names if c != "term")
        return pa.table({"term": out["term"], "n": out[ncol]})

    vocab = grouped_aggregate(
        ds.map_batches(terms, batch_format="pyarrow"),
        ["term"], [("n", "sum", "n")],
    ).sort(["term"]).materialize()

    # pass 1: one (min_term, total) marker per MATERIALIZED block via
    # tiny remote tasks over the block refs — the same stable blocks
    # pass 2 consumes (batch_size=None = whole-block batches), so the
    # min_term -> offset lookup can never see an unknown key
    @ray.remote
    def _marker(blk: pa.Table):
        if blk.num_rows == 0:
            return None
        return (blk["term"][0].as_py(),
                int(blk["n"].to_numpy(zero_copy_only=False).sum()))

    marks = sorted(
        m for m in ray.get(
            [_marker.remote(r) for r in vocab.to_arrow_refs()])
        if m is not None
    )
    offsets = {}
    acc = 0
    for term0, tot in marks:
        offsets[term0] = acc
        acc += tot
    total_tokens = acc
    probes = (splitmix64(np.arange(100, dtype=np.uint64))
              % np.uint64(total_tokens)).astype(np.int64)
    bcast = ray.put((offsets, probes))

    def resolve(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "probe": pa.array([], pa.int64()),
            "u_pos": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "term_n": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        offs, pr = ray.get(bcast) \
            if isinstance(bcast, ray.ObjectRef) else bcast
        off = offs[batch["term"][0].as_py()]
        n = batch["n"].to_numpy(zero_copy_only=False)
        cum = off + np.cumsum(n)
        lo, hi = off, int(cum[-1])
        mine = np.flatnonzero((pr >= lo) & (pr < hi))
        if mine.size == 0:
            return empty
        idx = np.searchsorted(cum, pr[mine], side="right")
        return pa.table({
            "probe": pa.array(mine.astype(np.int64)),
            "u_pos": pa.array(pr[mine]),
            "term": batch["term"].take(
                pa.array(idx.astype(np.int64))),
            "term_n": pa.array(n[idx].astype(np.int64)),
        })

    return vocab.map_batches(resolve, batch_format="pyarrow",
                             batch_size=None)  # whole-block batches


def parquet_column_stats_events(sf_dir: str):
    """STORAGE INTROSPECTION: per-column Parquet footprint of the
    events table straight from the file footers — row-group count,
    value count, compressed/uncompressed bytes and the floor-ppm
    compression ratio (the table-layout health check that drives
    column-encoding and sort-order decisions).  The footer scan is a
    Dataset map over the FILE LIST (one row set per file, bounded by
    the manifest, never the data), then one bounded grouped SUM — at
    100 TB this reads kilobytes of footers, not the table.

    NOTE: the oracle pins the sf0.01 path (parquet_metadata needs a
    literal path, and the driver gate runs at sf=0.01) — comparing at
    another sf compares different files by construction."""
    import ray.data as rd

    # the single canonical table file — matching _read and the oracle
    files = [f"{sf_dir}/events.parquet"]

    def footer(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pqt

        paths = batch["path"].to_pylist()
        cols, nrg, nv, cb, ub = [], [], [], [], []
        for p in paths:
            md = pqt.ParquetFile(p).metadata
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for ci in range(rg.num_columns):
                    c = rg.column(ci)
                    cols.append(c.path_in_schema)
                    nrg.append(1)
                    nv.append(int(c.num_values))
                    cb.append(int(c.total_compressed_size))
                    ub.append(int(c.total_uncompressed_size))
        return pa.table({
            "column_name": pa.array(cols, pa.string()),
            "n_row_groups": pa.array(nrg, pa.int64()),
            "n_values": pa.array(nv, pa.int64()),
            "compressed_bytes": pa.array(cb, pa.int64()),
            "uncompressed_bytes": pa.array(ub, pa.int64()),
        })

    agg = grouped_aggregate(
        rd.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
        .map_batches(footer, batch_format="pyarrow"),
        ["column_name"],
        [("n_row_groups", "sum", "n_row_groups"),
         ("n_values", "sum", "n_values"),
         ("compressed_bytes", "sum", "compressed_bytes"),
         ("uncompressed_bytes", "sum", "uncompressed_bytes")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        cbv = batch["compressed_bytes"].to_numpy(zero_copy_only=False)
        ubv = batch["uncompressed_bytes"].to_numpy(
            zero_copy_only=False)
        if cbv.size and (int(cbv.max()) > (2**62) // 1_000_000
                         or int(ubv.min()) <= 0):
            raise OverflowError(
                "parquet_stats: bytes*1e6 exceeds int64 (or an empty "
                "column chunk) — rescale to per-KB ratios"
            )
        return batch.append_column(
            "ratio_ppm", pa.array((cbv * 1_000_000) // ubv))

    return agg.map_batches(finish, batch_format="pyarrow")


def bloom_size_plan_events(sf_dir: str):
    """Bloom-filter CAPACITY PLANNER: per partition (event_id % 16),
    the exact distinct-user count and the filter size it implies at a
    1/1024 false-positive target — ``m = ceil(n * log2(1/p) / ln2)``
    with log2(1/p) = 10 exact and ln2 as the fixed micro constant
    693147, so the plan is pure integer arithmetic (k = 10 hash
    functions at this p).  One distinct exchange; the 16-row plan is
    bounded."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array((ids % 16).astype(np.int64)),
            "user_id": batch["user_id"],
        })

    distinct = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["part", "user_id"], [("user_id", "count", "c")],
    )
    plan = grouped_aggregate(
        distinct.map_batches(
            lambda t: pa.table({
                "part": t["part"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow"),
        ["part"], [("one", "sum", "n_distinct")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_distinct"].to_numpy(zero_copy_only=False)
        if n.size and int(n.max()) > (2**62) // 10_000_000:
            raise OverflowError("bloom_plan: n*1e7 exceeds int64")
        m_bits = -(-(n * 10 * 1_000_000) // 693_147)  # ceil div
        return pa.table({
            "part": batch["part"],
            "n_distinct": pa.array(n),
            "m_bits": pa.array(m_bits.astype(np.int64)),
            "m_bytes": pa.array(((m_bits + 7) // 8).astype(np.int64)),
            "k_hashes": pa.array(np.full(n.size, 10, np.int64)),
        })

    return plan.map_batches(finish, batch_format="pyarrow")


def dedup_savings_docs(sf_dir: str):
    """Dedup ROI report: corpus bytes BEFORE vs AFTER exact-fingerprint
    dedup (keep the lowest doc_id per md5-64 text fingerprint) — the
    one-row business case for running the dedup stage at all.  Only
    (fp, doc_id, n_bytes) triples shuffle, never text; the kept-bytes
    fold is the per-fp min-doc group pass."""
    from geodata_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = text.fill_null("")  # null-fill BEFORE hashing too
        filled = pa.table({"doc_id": batch["doc_id"], "text": text})
        fp = fingerprint_batch(filled)
        nb = pc.binary_length(text).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "fp": fp["fingerprint"],
            "n_bytes": pa.array(nb),
        })

    per_fp = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["fp"],
        [("n_bytes", "min", "kept_b"),
         ("n_bytes", "sum", "tot_b"), ("n_bytes", "count", "n_copies")],
    )
    # per fp all copies have identical text, so min == any byte size.
    # the fingerprint table is corpus-sized — fold it DISTRIBUTED
    # (per-block partials + one single-key sum), never on the driver
    tot = grouped_aggregate(
        per_fp.map_batches(
            lambda t: pa.table({
                "g": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_copies": t["n_copies"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "tot_b": t["tot_b"],
                "kept_b": t["kept_b"],
            }),
            batch_format="pyarrow"),
        ["g"],
        [("n_copies", "sum", "n_docs"), ("one", "sum", "n_unique"),
         ("tot_b", "sum", "bytes_total"),
         ("kept_b", "sum", "bytes_kept")],
    ).take_all()
    r = tot[0]
    bt, bk = int(r["bytes_total"]), int(r["bytes_kept"])
    return pa.table({
        "n_docs": pa.array([int(r["n_docs"])], pa.int64()),
        "n_unique": pa.array([int(r["n_unique"])], pa.int64()),
        "bytes_total": pa.array([bt], pa.int64()),
        "bytes_kept": pa.array([bk], pa.int64()),
        "saved_ppm": pa.array(
            [(bt - bk) * 1_000_000 // bt if bt else 0], pa.int64()),
    })


def hash_uniformity_audit_events(sf_dir: str):
    """HASH-QUALITY audit of the engine's own partitioner: distinct
    user ids bucket by ``splitmix64(id) % 256`` and the exact scaled
    chi-square numerator ``sum((256*n_b - N)^2)`` over all 256 buckets
    measures uniformity (the shuffle-skew early-warning; the caller
    divides by 256*N for the textbook statistic, E[chi2] ~ dof = 255
    on a good hash).  One distinct exchange + a bounded 256-bucket
    aggregate; the fold is driver-side over 256 integers."""
    from geodata_ray.sources.synth import splitmix64

    ev = _read(sf_dir, "events", columns=["user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        return pa.table({"user_id": pa.array(u.astype(np.int64))})

    distinct = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], [("user_id", "count", "c")],
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        b = (splitmix64(u.astype(np.uint64))
             % np.uint64(256)).astype(np.int64)
        acc = np.bincount(b, minlength=256)
        nz = np.flatnonzero(acc)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "n": pa.array(acc[nz].astype(np.int64)),
        })

    agg = grouped_aggregate(
        distinct.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], [("n", "sum", "n")],
    )
    counts = np.zeros(256, np.int64)
    for r in agg.take_all():  # bounded: 256 buckets
        counts[int(r["bucket"])] = int(r["n"])
    n_total = int(counts.sum())
    dev = 256 * counts.astype(object) - n_total
    chi2_num = int(sum(int(d) * int(d) for d in dev))
    if chi2_num > 2**62 or n_total > 2**62:
        raise OverflowError("hash_audit: chi2 numerator exceeds int64")
    return pa.table({
        "n_ids": pa.array([n_total], pa.int64()),
        "n_buckets": pa.array([256], pa.int64()),
        "chi2_num": pa.array([chi2_num], pa.int64()),
        "max_bucket_n": pa.array([int(counts.max())], pa.int64()),
        "min_bucket_n": pa.array([int(counts.min())], pa.int64()),
    })


def fano_factor_types_events(sf_dir: str):
    """BURSTINESS (Fano factor, variance-to-mean of the daily count
    series) per event type — the traffic-profiling dispersion index
    (~1 for a Poisson process, >1 bursty, <1 regular): ``fano_milli =
    (n*ss - s^2) * 1000 // ((n-1) * s)`` from exact integer moments
    over the bounded (day x type) exchange.  Emits the exact
    ingredients alongside the floor-milli ratio."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = (ts // day_us) * day_us
        t = pa.table({"day_us": pa.array(d),
                      "event_type": batch["event_type"]})
        out = t.group_by(["day_us", "event_type"]).aggregate(
            [([], "count_all")])
        ncol = next(c for c in out.column_names
                    if c not in ("day_us", "event_type"))
        return pa.table({
            "day_us": out["day_us"],
            "event_type": out["event_type"],
            "n": out[ncol],
        })

    daily = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["day_us", "event_type"], [("n", "sum", "n")],
    )
    series: dict[str, list[int]] = {}
    for r in daily.take_all():  # bounded: days x types
        series.setdefault(r["event_type"], []).append(int(r["n"]))
    out = {"event_type": [], "n_days": [], "sum_n": [], "sum_n2": [],
           "fano_milli": []}
    for ty in sorted(series):
        ys = series[ty]
        n = len(ys)
        s = sum(ys)
        ss = sum(y * y for y in ys)
        if n < 2 or s == 0:
            continue  # dispersion undefined; oracle HAVING drops too
        var_num = n * ss - s * s
        fano = var_num * 1000 // ((n - 1) * s)
        if any(abs(v) > 2**62 for v in (s, ss, var_num, fano)):
            raise OverflowError("fano: moment exceeds int64")
        out["event_type"].append(ty)
        out["n_days"].append(n)
        out["sum_n"].append(s)
        out["sum_n2"].append(ss)
        out["fano_milli"].append(fano)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_days": pa.array(out["n_days"], pa.int64()),
        "sum_n": pa.array(out["sum_n"], pa.int64()),
        "sum_n2": pa.array(out["sum_n2"], pa.int64()),
        "fano_milli": pa.array(out["fano_milli"], pa.int64()),
    })


def user_breadth_histogram_events(sf_dir: str):
    """Engagement-BREADTH histogram: how many users touch exactly k
    distinct event types (the bipartite-degree distribution on the
    user side — the segmentation backbone behind "power users").
    One distinct (user, type) exchange, one per-user count, one
    bounded (k <= |types|) histogram."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch["user_id"],
                      "event_type": batch["event_type"]})
        out = t.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return out.select(["user_id", "event_type"])

    distinct = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "event_type"], [("event_type", "count", "c")],
    )
    per_user = grouped_aggregate(
        distinct.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow"),
        ["user_id"], [("one", "sum", "k")],
    )
    return grouped_aggregate(
        per_user.map_batches(
            lambda t: pa.table({
                "k_types": t["k"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow"),
        ["k_types"], [("one", "sum", "n_users")],
    )


def user_type_entropy_events(sf_dir: str):
    """Per-user TYPE-DIVERSITY entropy (behavioral-diversity score —
    bots concentrate, humans spread): the exact n-scaled entropy
    ``entropy_q = n*qlog2(n) - sum_t c_t*qlog2(c_t)`` of each user's
    event-type distribution in the deterministic fixed-point log both
    engines replay.  One (user, type) count exchange, then a bucketed
    per-user fold — counts are small ints, so the oracle's qlog2 CTE
    stays bounded."""
    from geodata_ray.stages.lm import qlog2_fixed
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch["user_id"],
                      "event_type": batch["event_type"]})
        out = t.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        ncol = next(c for c in out.column_names
                    if c not in ("user_id", "event_type"))
        return pa.table({
            "user_id": out["user_id"],
            "event_type": out["event_type"],
            "c": out[ncol],
        })

    counts = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "event_type"], [("c", "sum", "c")],
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "entropy_q": pa.array([], pa.int64()),
            })
        new = np.ones(u.size, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        nseg = starts.size
        n_tot = np.zeros(nseg, np.int64)
        np.add.at(n_tot, seg, c)
        if int(n_tot.max()) > 2**40:
            raise OverflowError("user_entropy: n*qlog2(n) would "
                                "exceed int64 — rescale")
        ql_c = qlog2_fixed(c.astype(np.uint64)).astype(np.int64)
        sum_cql = np.zeros(nseg, np.int64)
        np.add.at(sum_cql, seg, c * ql_c)
        ql_n = qlog2_fixed(n_tot.astype(np.uint64)).astype(np.int64)
        ent = n_tot * ql_n - sum_cql
        return pa.table({
            "user_id": pa.array(u[starts]),
            "n_events": pa.array(n_tot),
            "entropy_q": pa.array(ent),
        })

    return (
        _tag_bucket(counts, "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def lorenz_deciles_users_events(sf_dir: str):
    """LORENZ CURVE decile table of user activity (the distributional
    companion to the ``activity_gini`` scalar — "the bottom 50% of
    users produce X% of events"): users rank ascending by event count,
    each decile reports its user count, event total and the exact
    floor-ppm cumulative share.  KEY SCALE INSIGHT: rank ties all
    carry the SAME count, so decile boundaries inside a tie group
    split exactly as k*n without ever ordering users — the whole fold
    runs over the BOUNDED (count -> n_users) histogram, no global
    user sort."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["user_id"].to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({
            "user_id": pa.array(u.astype(np.int64)),
            "n": pa.array(c.astype(np.int64)),
        })

    per_user = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], [("n", "sum", "n")],
    )
    hist = grouped_aggregate(
        per_user.map_batches(
            lambda t: pa.table({
                "n": t["n"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow"),
        ["n"], [("one", "sum", "n_users")],
    )
    rows = sorted(
        ((int(r["n"]), int(r["n_users"])) for r in hist.take_all())
    )  # bounded by the distinct activity-count domain
    total_users = sum(c for _n, c in rows)
    total_events = sum(n * c for n, c in rows)
    out = {"decile": [], "n_users": [], "events": [],
           "cum_share_ppm": []}
    dec_users = [0] * 10
    dec_events = [0] * 10
    placed = 0
    for n, c in rows:
        left = c
        while left:
            d = placed * 10 // total_users  # current decile (0-based)
            cap = (d + 1) * total_users  # next boundary * 10
            room = -(-(cap - placed * 10) // 10)  # users until boundary
            take = min(left, room)
            dec_users[d] += take
            dec_events[d] += take * n
            placed += take
            left -= take
    cum = 0
    for d in range(10):
        cum += dec_events[d]
        if dec_users[d] == 0:
            continue  # only possible when U < 10; SQL GROUP BY drops
        out["decile"].append(d + 1)
        out["n_users"].append(dec_users[d])
        out["events"].append(dec_events[d])
        out["cum_share_ppm"].append(
            cum * 1_000_000 // total_events if total_events else 0)
    return pa.table({
        "decile": pa.array(out["decile"], pa.int64()),
        "n_users": pa.array(out["n_users"], pa.int64()),
        "events": pa.array(out["events"], pa.int64()),
        "cum_share_ppm": pa.array(out["cum_share_ppm"], pa.int64()),
    })


def longest_gaps_users_events(sf_dir: str):
    """IDLE-GAP mining: the 20 longest between-event gaps across all
    users (who went quiet, when, for how long — the churn-risk /
    incident-detection signal).  Same bucketed per-user ordered pass
    as the inter-arrival median; each block emits only its partial
    top-20, so the final selection sees 20 x blocks rows."""
    from geodata_ray.stages.windows import _tag_bucket

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([("user_id", "ascending"),
                       ("ts_us", "ascending"),
                       ("event_id", "ascending")])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "gap_start": pa.array([], pa.timestamp("us")),
            "gap_us": pa.array([], pa.int64()),
        })
        if u.size < 2:
            return empty
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        gusers = u[:-1][same]
        gstart = ts[:-1][same]
        if gaps.size == 0:
            return empty
        # partial top-20 by (gap desc, user asc, start asc)
        order = np.lexsort((gstart, gusers, -gaps))[:20]
        return pa.table({
            "user_id": pa.array(gusers[order]),
            "gap_start": pa.array(gstart[order]).cast(
                pa.timestamp("us")),
            "gap_us": pa.array(gaps[order]),
        })

    import ray

    parts = [t for t in ray.get(
        _tag_bucket(ev.map_batches(prep, batch_format="pyarrow"),
                    "user_id", 32)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    allp = pa.concat_tables(parts)
    g = allp["gap_us"].to_numpy(zero_copy_only=False)
    uu = allp["user_id"].to_numpy(zero_copy_only=False)
    ss = allp["gap_start"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)
    order = np.lexsort((ss, uu, -g))[:20]
    out = allp.take(pa.array(order.astype(np.int64)))
    return out.append_column(
        "rank", pa.array(np.arange(1, out.num_rows + 1,
                                   dtype=np.int64)))


def markov_conditional_entropy_events(sf_dir: str):
    """SEQUENCE PREDICTABILITY: the conditional entropy H(next type |
    current type) of the per-user event-type Markov chain in exact
    fixed-point — ``h_cond_q = sum_a n_a*qlog2(n_a) - sum_ab
    c_ab*qlog2(c_ab)`` over the bounded transition matrix (0 = fully
    deterministic behavior, high = noise; the single-number summary
    the MLM/bot-detection stack thresholds on).  Composes the Markov
    transition exchange with the deterministic qlog2 fold."""
    from geodata_ray.stages.lm import qlog2_fixed

    trans = markov_transitions_events(sf_dir)  # bounded types^2 table
    c = trans["n"].to_numpy(zero_copy_only=False)
    frm = trans["from_type"].to_numpy(zero_copy_only=False)
    uf, inv = np.unique(frm, return_inverse=True)
    n_a = np.zeros(uf.size, np.int64)
    np.add.at(n_a, inv, c)
    if int(c.sum()) > 2**40:
        raise OverflowError("cond_entropy: n*qlog2 would exceed int64")
    term_a = int((n_a * qlog2_fixed(n_a.astype(np.uint64)).astype(
        np.int64)).sum())
    term_ab = int((c * qlog2_fixed(c.astype(np.uint64)).astype(
        np.int64)).sum())
    return pa.table({
        "n_transitions": pa.array([int(c.sum())], pa.int64()),
        "n_states": pa.array([int(uf.size)], pa.int64()),
        "h_cond_q": pa.array([term_a - term_ab], pa.int64()),
    })


def duplicate_rows_audit_events(sf_dir: str):
    """Exact DUPLICATE-ROW audit (the ingestion-quality double-write
    detector): events grouped by the full business key (user_id,
    timestamp, type, cents) — ignoring the surrogate event_id — and
    reported as the multiplicity histogram (k copies -> n_groups).
    One pre-combined exchange on the composite key; the histogram is
    bounded by the max multiplicity."""
    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch["value"], pa.float64()),
                                 100.0)),
            pa.int64(),
        )
        t = pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
            "cents": cents,
        })
        out = t.group_by(
            ["user_id", "ts_us", "event_type", "cents"]
        ).aggregate([([], "count_all")])
        ncol = next(c for c in out.column_names
                    if c not in ("user_id", "ts_us", "event_type",
                                 "cents"))
        return out.rename_columns(
            [c if c != ncol else "c" for c in out.column_names])

    groups = grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "ts_us", "event_type", "cents"],
        [("c", "sum", "c")],
    )

    def hist(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k_copies": batch["c"],
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    return grouped_aggregate(
        groups.map_batches(hist, batch_format="pyarrow"),
        ["k_copies"], [("one", "sum", "n_groups")],
    )


def retention_half_life_events(sf_dir: str):
    """RETENTION HALF-LIFE: the first observed day on which fewer than
    half the user base remains alive (survival share < 500000 ppm) —
    the single-number retention summary product teams track, composed
    over the exact survival curve.  Emits that day, the exact share at
    it, and the observed-day count; zero rows when survival never
    crosses 50% inside the observation window (matching the oracle's
    empty filter)."""
    surv = user_lifetime_survival_events(sf_dir)  # bounded day table
    days = surv["day"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)
    ppm = surv["surv_ppm"].to_numpy(zero_copy_only=False)
    below = np.flatnonzero(ppm < 500_000)
    if below.size == 0:
        return pa.table({
            "half_life_day": pa.array([], pa.timestamp("us")),
            "surv_ppm_at": pa.array([], pa.int64()),
            "n_days_observed": pa.array([], pa.int64()),
        })
    i = int(below[0])
    return pa.table({
        "half_life_day": pa.array(
            np.array([days[i]], np.int64)).cast(pa.timestamp("us")),
        "surv_ppm_at": pa.array([int(ppm[i])], pa.int64()),
        "n_days_observed": pa.array([int(days.size)], pa.int64()),
    })


RAY_QUERIES = {
    # -- r5 driver window (50 slots): queries that have never held an
    #    external driver row.  Positions 1-25 = the fifth wave; 26-50 =
    #    the late-r4 block (first 25 in debut order, with fuzzy_match_parts
    #    and skyline_orders swapped in for daily_distinct_users /
    #    daily_hll_users, whose operator families already hold green
    #    driver rows).  Rotation recorded in COVERAGE.md; guarded by
    #    tools/check_window.py. --
    "outlier_events_zscore": outlier_events_zscore,
    "rrf_fusion_docs": rrf_fusion_docs,
    "setsim_join_docs": setsim_join_docs,
    "semdedup_embeddings": semdedup_embeddings,
    "zonemap_pruned_scan_events": zonemap_pruned_scan_events,
    "bpe_pair_counts_docs": bpe_pair_counts_docs,
    "entity_resolution_customers": entity_resolution_customers,
    "dq_suite_events": dq_suite_events,
    "scd2_intervals_users": scd2_intervals_users,
    "geohash_events": geohash_events,
    "trailing_window_count_events": trailing_window_count_events,
    "resize_checksum_images": resize_checksum_images,
    "audio_energy_frames": audio_energy_frames,
    "cube_daily_type_events": cube_daily_type_events,
    "scene_deltas_video": scene_deltas_video,
    "vocab_coverage_docs": vocab_coverage_docs,
    "crawl_frontier_order": crawl_frontier_order,
    "langid_margin_docs": langid_margin_docs,
    "bot_signature_users": bot_signature_users,
    "url_templates_docs": url_templates_docs,
    "time_travel_events": time_travel_events,
    "schema_evolution_read_events": schema_evolution_read_events,
    "merge_upsert_events": merge_upsert_events,
    "weighted_discount_lineitem": weighted_discount_lineitem,
    "daily_delta_events": daily_delta_events,
    "normalize_text_docs": normalize_text_docs,
    "bloom_probe_events": bloom_probe_events,
    "tfidf_retrieval_docs": tfidf_retrieval_docs,
    "perplexity_buckets_docs": perplexity_buckets_docs,
    "cdc_chunks_docs": cdc_chunks_docs,
    "cdc_dup_spans_docs": cdc_dup_spans_docs,
    "pretrain_pipeline_docs": pretrain_pipeline_docs,
    "classifier_score_docs": classifier_score_docs,
    "crawl_diff_docs": crawl_diff_docs,
    "inverted_index_docs": inverted_index_docs,
    "zonal_stats_events": zonal_stats_events,
    "kring_smooth_raster": kring_smooth_raster,
    "trajectory_stats_events": trajectory_stats_events,
    "bloom_join_lineitem": bloom_join_lineitem,
    "grouped_quantiles_events": grouped_quantiles_events,
    "image_ahash_dups": image_ahash_dups,
    "triangle_counts_hosts": triangle_counts_hosts,
    "corpus_stats_docs": corpus_stats_docs,
    "windowed_dedup_events": windowed_dedup_events,
    "knn_classify_embeddings": knn_classify_embeddings,
    "funnel_users_events": funnel_users_events,
    "bm25_retrieval_docs": bm25_retrieval_docs,
    "curriculum_pack_docs": curriculum_pack_docs,
    "fuzzy_match_parts": fuzzy_match_parts,
    "skyline_orders": skyline_orders,
    # -- still never-windowed (28): green in the identical local gate
    #    (tools/check_correctness.py); no external row — the 50-slot
    #    window cannot hold all 78 rotation candidates. --
    "daily_distinct_users": daily_distinct_users,
    "daily_hll_users": daily_hll_users,
    "s2_tokens_events": s2_tokens_events,
    "q5_region_supplier_volume": q5_region_supplier_volume,
    "rollup_daily_events": rollup_daily_events,
    "pivot_event_types_daily": pivot_event_types_daily,
    "ip_range_lookup_events": ip_range_lookup_events,
    "user_value_trend_events": user_value_trend_events,
    "bfs_hosts_2hop": bfs_hosts_2hop,
    "grid_clusters_events": grid_clusters_events,
    "winsorized_value_events": winsorized_value_events,
    "session_attribution_users": session_attribution_users,
    "pmi_bigrams_docs": pmi_bigrams_docs,
    "zorder_rank_events": zorder_rank_events,
    "incremental_daily_merge": incremental_daily_merge,
    "top_event_type_per_user": top_event_type_per_user,
    "cohort_retention_users": cohort_retention_users,
    "ewma_user_values": ewma_user_values,
    "type_pair_support_events": type_pair_support_events,
    "percentile_rank_events": percentile_rank_events,
    "retained_users_events": retained_users_events,
    "value_histogram_events": value_histogram_events,
    "integrity_audit": integrity_audit,
    "golden_record_users": golden_record_users,
    "type_sequence_counts": type_sequence_counts,
    "moment_matrix_lineitem": moment_matrix_lineitem,
    "partition_checksums_events": partition_checksums_events,
    "compact_files_roundtrip": compact_files_roundtrip,
    # -- r5 additions slot in here (before the backfill) --
    "robust_outliers_events": robust_outliers_events,
    "radius_join_events": radius_join_events,
    "late_events_watermark": late_events_watermark,
    "q4_priority_exists": q4_priority_exists,
    "q10_returned_revenue": q10_returned_revenue,
    "mutual_links_hosts": mutual_links_hosts,
    "interval_coverage_users": interval_coverage_users,
    "sssp_hosts": sssp_hosts,
    "seasonal_anomaly_events": seasonal_anomaly_events,
    "weighted_sample_events": weighted_sample_events,
    "activity_bitmap_users": activity_bitmap_users,
    "apportion_crawl_budget": apportion_crawl_budget,
    "ohlc_candles_events": ohlc_candles_events,
    "gapfill_hourly_events": gapfill_hourly_events,
    "late_shipment_priority": late_shipment_priority,
    "q18_large_orders": q18_large_orders,
    "q22_idle_customers": q22_idle_customers,
    "winnowing_docs": winnowing_docs,
    "k_core_hosts": k_core_hosts,
    "changepoint_users_events": changepoint_users_events,
    "compact_cells_events": compact_cells_events,
    "rfm_segments_users": rfm_segments_users,
    "pr_curve_docs": pr_curve_docs,
    "hits_hosts_docs": hits_hosts_docs,
    "winnowing_match_pairs": winnowing_match_pairs,
    "ab_test_events": ab_test_events,
    "source_entropy_docs": source_entropy_docs,
    "open_orders_daily": open_orders_daily,
    "maxsim_retrieval_embeddings": maxsim_retrieval_embeddings,
    "sq8_quantize_embeddings": sq8_quantize_embeddings,
    "box_cover_cells_nations": box_cover_cells_nations,
    "k_anonymity_events": k_anonymity_events,
    "kfold_split_docs": kfold_split_docs,
    "reorder_depth_events": reorder_depth_events,
    "ann_recall_embeddings": ann_recall_embeddings,
    "avg_neighbor_degree_hosts": avg_neighbor_degree_hosts,
    "peak_rate_events": peak_rate_events,
    "revenue_share_lineitem": revenue_share_lineitem,
    "vocab_growth_docs": vocab_growth_docs,
    "dau_mau_daily_events": dau_mau_daily_events,
    "activity_gini_users": activity_gini_users,
    "geo_mean_values_events": geo_mean_values_events,
    "q7_nation_volume": q7_nation_volume,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_or_predicates_revenue": q19_or_predicates_revenue,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q11_important_parts": q11_important_parts,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_qty_semijoin": q20_qty_semijoin,
    "q21_sole_late_supplier": q21_sole_late_supplier,
    # eighteenth wave (round 5): TPC-H Q6/Q12 (22/22 shapes complete)
    # + dedup-cluster / rules / sketch-merge / NTILE compositions
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_late_lines_priority": q12_late_lines_priority,
    "near_dup_clusters_docs": near_dup_clusters_docs,
    "association_rules_events": association_rules_events,
    "hll_merge_types_events": hll_merge_types_events,
    "ntile_value_users": ntile_value_users,
    # nineteenth wave (round 5)
    "kmv_sketch_events": kmv_sketch_events,
    "weighted_median_lineitem": weighted_median_lineitem,
    "range_partition_plan_events": range_partition_plan_events,
    "class_balance_docs": class_balance_docs,
    "interarrival_median_users": interarrival_median_users,
    "string_agg_daily_types_events": string_agg_daily_types_events,
    # twentieth wave (round 5)
    "hilbert_rank_events": hilbert_rank_events,
    "pseudonymize_users_events": pseudonymize_users_events,
    "selfjoin_size_lineitem": selfjoin_size_lineitem,
    "audience_overlap_types_events": audience_overlap_types_events,
    "zipf_state_docs": zipf_state_docs,
    "grouped_mode_cents_events": grouped_mode_cents_events,
    # twenty-first wave (round 5)
    "dbscan_labels_events": dbscan_labels_events,
    "phrase_query_docs": phrase_query_docs,
    "merkle_tree_events": merkle_tree_events,
    "label_centroids_embeddings": label_centroids_embeddings,
    "forward_fill_user_values": forward_fill_user_values,
    "load_profile_events": load_profile_events,
    # twenty-second wave (round 5)
    "bloom_partition_index_events": bloom_partition_index_events,
    "rank_normalize_embeddings": rank_normalize_embeddings,
    "fold_leakage_audit_docs": fold_leakage_audit_docs,
    "twap_user_values": twap_user_values,
    "bounce_rate_daily_events": bounce_rate_daily_events,
    # twenty-third wave (round 5)
    "lang_confusion_docs": lang_confusion_docs,
    "label_outliers_embeddings": label_outliers_embeddings,
    "rle_runs_events": rle_runs_events,
    "session_duration_quantiles_events":
        session_duration_quantiles_events,
    # twenty-fourth wave (round 5)
    "ks_test_events": ks_test_events,
    "mmr_rerank_embeddings": mmr_rerank_embeddings,
    "dedup_canonical_docs": dedup_canonical_docs,
    # twenty-fifth wave (round 5)
    "clustering_coeff_hosts": clustering_coeff_hosts,
    "benford_audit_events": benford_audit_events,
    "daily_corr_types_events": daily_corr_types_events,
    "markov_transitions_events": markov_transitions_events,
    "pq_assign_embeddings": pq_assign_embeddings,
    "positional_deletes_events": positional_deletes_events,
    # twenty-sixth wave (round 5)
    "subtree_rollup_parts": subtree_rollup_parts,
    "eccentricity_hosts": eccentricity_hosts,
    "readability_docs": readability_docs,
    "feature_hash_collisions_docs": feature_hash_collisions_docs,
    "cohens_kappa_docs": cohens_kappa_docs,
    "reservoir_sample_per_type_events": reservoir_sample_per_type_events,
    # twenty-seventh wave (round 5)
    "theta_intersection_types_events": theta_intersection_types_events,
    "l2_norm_audit_embeddings": l2_norm_audit_embeddings,
    "term_shift_docs": term_shift_docs,
    "session_paths_events": session_paths_events,
    "view_click_pairs_events": view_click_pairs_events,
    "gram_matrix_embeddings": gram_matrix_embeddings,
    # twenty-eighth wave (round 5)
    "new_users_daily_events": new_users_daily_events,
    "autocorr_daily_events": autocorr_daily_events,
    "edge_support_hosts": edge_support_hosts,
    "clustering_depth_events": clustering_depth_events,
    "triplet_mining_embeddings": triplet_mining_embeddings,
    "conversion_latency_quantiles_events":
        conversion_latency_quantiles_events,
    # twenty-ninth wave (round 5)
    "polygon_area_nations": polygon_area_nations,
    "pct_cont_types_events": pct_cont_types_events,
    "calibration_bins_docs": calibration_bins_docs,
    "kendall_tau_daily_events": kendall_tau_daily_events,
    # thirtieth wave (round 5)
    "recency_decay_types_events": recency_decay_types_events,
    "trending_types_daily_events": trending_types_daily_events,
    "mlm_mask_plan_docs": mlm_mask_plan_docs,
    # thirty-first wave (round 5)
    "user_lifetime_survival_events": user_lifetime_survival_events,
    "multitouch_attribution_events": multitouch_attribution_events,
    "subtree_share_parts": subtree_share_parts,
    # thirty-second wave (round 5)
    "psi_value_drift_events": psi_value_drift_events,
    "histogram_intersection_types_events":
        histogram_intersection_types_events,
    # thirty-third wave (round 5)
    "embedding_drift_labels": embedding_drift_labels,
    "crosscorr_daily_events": crosscorr_daily_events,
    # thirty-fourth wave (round 5)
    "dim_variance_embeddings": dim_variance_embeddings,
    "mrr_same_label_embeddings": mrr_same_label_embeddings,
    # thirty-fifth wave (round 5)
    "snm_pairs_customers": snm_pairs_customers,
    "daily_trend_slope_types_events": daily_trend_slope_types_events,
    # thirty-sixth wave (round 5)
    "sliding_max_user_values": sliding_max_user_values,
    "unpivot_daily_types_events": unpivot_daily_types_events,
    # thirty-seventh wave (round 5)
    "decision_stump_events": decision_stump_events,
    # thirty-eighth wave (round 5)
    "front_coding_audit_docs": front_coding_audit_docs,
    # thirty-ninth wave (round 5)
    "residual_outlier_days_types_events":
        residual_outlier_days_types_events,
    "zipf_slope_docs": zipf_slope_docs,
    # fortieth wave (round 5)
    "negative_sampling_unigram_docs": negative_sampling_unigram_docs,
    # forty-first wave (round 5)
    "parquet_column_stats_events": parquet_column_stats_events,
    # forty-second wave (round 5)
    "bloom_size_plan_events": bloom_size_plan_events,
    "dedup_savings_docs": dedup_savings_docs,
    # forty-third wave (round 5)
    "hash_uniformity_audit_events": hash_uniformity_audit_events,
    # forty-fourth wave (round 5)
    "fano_factor_types_events": fano_factor_types_events,
    # forty-fifth wave (round 5)
    "user_breadth_histogram_events": user_breadth_histogram_events,
    "user_type_entropy_events": user_type_entropy_events,
    # forty-sixth wave (round 5)
    "lorenz_deciles_users_events": lorenz_deciles_users_events,
    # forty-seventh wave (round 5)
    "longest_gaps_users_events": longest_gaps_users_events,
    "markov_conditional_entropy_events":
        markov_conditional_entropy_events,
    # forty-eighth wave (round 5)
    "duplicate_rows_audit_events": duplicate_rows_audit_events,
    # forty-ninth wave (round 5)
    "retention_half_life_events": retention_half_life_events,
    # -- backfill: every query below holds a green driver row (r1-r4) --
    "temperature_grid": temperature_grid,
    "heat_demand_grid": heat_demand_grid,
    "winddir_grid": winddir_grid,
    "raster_and_merge": raster_and_merge,
    "raster_sum_merge": raster_sum_merge,
    "raster_filter_trim": raster_filter_trim,
    "raster_resample_r5": raster_resample_r5,
    "raster_min_area": raster_min_area,
    "raster_min_area_km2": raster_min_area_km2,
    "knn_events_gazetteer": knn_events_gazetteer,
    "wind_model_fit_grid": wind_model_fit_grid,
    "wind_model_estimate_grid": wind_model_estimate_grid,
    "wind_spline_estimate_grid": wind_spline_estimate_grid,
    "flagship_resumable": flagship_resumable,
    "decode_images_ppm": decode_images_ppm,
    "sample_frames_stream": sample_frames_stream,
    "audio_features_wav": audio_features_wav,
    "running_totals_actor_stream": running_totals_actor_stream,
    "normalize_era5_raw": normalize_era5_raw,
    "top_pages_per_tile": top_pages_per_tile,
    "value_quantiles_events": value_quantiles_events,
    "embedding_dups_lsh": embedding_dups_lsh,
    "mask_save_load_attach": mask_save_load_attach,
    "partitioned_view_events": partitioned_view_events,
    "top3_events_per_type_salted": top3_events_per_type_salted,
    "exact_quantiles_events": exact_quantiles_events,
    "ts_series_grid": ts_series_grid,
    "heatmap_grid": heatmap_grid,
    "repetition_stats_docs": repetition_stats_docs,
    "near_dup_keep_docs": near_dup_keep_docs,
    "pack_sequences_docs": pack_sequences_docs,
    "host_stats_docs": host_stats_docs,
    "hll_registers_events": hll_registers_events,
    "lm_surprisal_docs": lm_surprisal_docs,
    "ngram_decontaminate_docs": ngram_decontaminate_docs,
    "global_shuffle_docs": global_shuffle_docs,
    "paragraph_dedup_docs": paragraph_dedup_docs,
    "length_buckets_docs": length_buckets_docs,
    "source_mixture_docs": source_mixture_docs,
    "url_dedup_best_docs": url_dedup_best_docs,
    "cms_counts_events": cms_counts_events,
    "host_quota_docs": host_quota_docs,
    "bloom_bits_events": bloom_bits_events,
    "blocklist_filter_docs": blocklist_filter_docs,
    "top_bigrams_docs": top_bigrams_docs,
    "jsonl_roundtrip_docs": jsonl_roundtrip_docs,
    "csv_roundtrip_docs": csv_roundtrip_docs,
    "pagerank_hosts_docs": pagerank_hosts_docs,
    "curation_pipeline_docs": curation_pipeline_docs,
    "chunk_documents_docs": chunk_documents_docs,
    "q1_pricing_summary": q1_pricing_summary,
    "tiles_r7_events": tiles_r7_events,
    "bbox_filter_events": bbox_filter_events,
    "top10_orders": top10_orders,
    "dedup_documents_exact": dedup_documents_exact,
    "daily_user_value": daily_user_value,
    "customer_nation_revenue": customer_nation_revenue,
    "orders_per_segment": orders_per_segment,
    "customers_without_big_orders": customers_without_big_orders,
    "lang_counts": lang_counts,
    "near_dup_pairs": near_dup_pairs,
    "embedding_dups": embedding_dups,
    "ann_topk_embeddings": ann_topk_embeddings,
    "token_stats_docs": token_stats_docs,
    "hourly_event_counts": hourly_event_counts,
    "session_windows_users": session_windows_users,
    "lineitem_part_join": lineitem_part_join,
    "sliding_event_counts": sliding_event_counts,
    "top3_orders_per_segment": top3_orders_per_segment,
    "sample_docs_hash": sample_docs_hash,
    "props_json_extract": props_json_extract,
    "pip_boxes_events": pip_boxes_events,
    "knn_oracle_events": knn_oracle_events,
    "asof_latest_order": asof_latest_order,
    "running_user_totals": running_user_totals,
    "pip_boxes_anti": pip_boxes_anti,
    "q3_shipping_native": q3_shipping_native,
    "range_join_orders_events": range_join_orders_events,
    "simhash_docs": simhash_docs,
    "fingerprint_docs": fingerprint_docs,
    "langid_docs": langid_docs,
    "quality_docs": quality_docs,
    "tfidf_top_terms_docs": tfidf_top_terms_docs,
    "heavy_hitter_users": heavy_hitter_users,
    "stratified_sample_events": stratified_sample_events,
    "contamination_check": contamination_check,
    "streaming_dedup_docs": streaming_dedup_docs,
    "url_canonicalize_docs": url_canonicalize_docs,
    "boilerplate_removal_docs": boilerplate_removal_docs,
    "redact_pii_docs": redact_pii_docs,
    "ivf_topk_embeddings": ivf_topk_embeddings,
    "kmeans_embeddings": kmeans_embeddings,
    "lsh_buckets_embeddings": lsh_buckets_embeddings,
    "windspd_grid": windspd_grid,
    "wind_power_grid": wind_power_grid,
    "windwpd_grid": windwpd_grid,
    "pv_grid": pv_grid,
    "pv_tracking_grid": pv_tracking_grid,
    "solar_thermal_grid": solar_thermal_grid,
    "pm25_grid": pm25_grid,
}


def __getattr__(name: str):
    """Lazy re-export of the oracle SQL surface (moved to
    ``pipelines.oracles``): ``queries.ORACLE_SQL`` / ``queries.FOO_SQL``
    keep working for every existing import site, and the oracle module
    (which reads the gate corpus at import) only loads when the SQL is
    actually requested."""
    from geodata_ray.pipelines import oracles

    try:
        return getattr(oracles, name)
    except AttributeError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
