"""Mergeable sketches: approximate quantiles over a Dataset.

SURVEY.md A10: the reference has no sketches; at 10^12-row scale,
distribution statistics (for skew detection, bucketing, quality
thresholds) need a mergeable approximate structure.  This is the
classic weighted-sample quantile sketch: each batch emits k
equally-spaced order statistics weighted by batch_size/k; partials
merge by weighted-quantile compression.  One tiny row set per batch
moves — never the data.  Error is O(1/k) per level, deterministic
(no randomness; retries give identical results).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _compress(values: np.ndarray, weights: np.ndarray, k: int):
    """Weighted sample -> k equally-spaced weighted quantile points."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    w = weights[order].astype(np.float64)
    cum = np.cumsum(w)
    total = cum[-1]
    targets = (np.arange(k) + 0.5) / k * total
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.clip(idx, 0, v.shape[0] - 1)
    out_v = v[idx]
    out_w = np.full(k, total / k)
    return out_v, out_w


def approx_quantiles(ds, col: str, qs, *, k: int = 256) -> dict[float, float]:
    """Approximate quantiles of ``col`` (error ~1-2/k of rank)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return pa.table(
                {"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        kk = min(k, v.size)
        pv, pw = _compress(v, np.ones_like(v), kk)
        return pa.table({"v": pa.array(pv), "w": pa.array(pw)})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        if v.size == 0:
            return batch
        mv, mw = _compress(v, w, min(k, v.size))
        return pa.table({"v": pa.array(mv), "w": pa.array(mw)})

    # two-level tree merge: at 10^12-row scale per-batch sketches are
    # themselves numerous (blocks x k rows), so compress within 16
    # shards before the final single-block merge
    merged = (
        partials.repartition(16)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    df: pd.DataFrame = merged.to_pandas()
    v = df["v"].to_numpy()
    w = df["w"].to_numpy()
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = {}
    for q in qs:
        i = int(np.clip(np.searchsorted(cum, q * total), 0, v.shape[0] - 1))
        out[float(q)] = float(v[i])
    return out


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — mergeable approximate distinct
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers, relative error ~1.04/sqrt(m) = 1.6%


def hll_rank_batch(h: np.ndarray, p: int = HLL_P):
    """(register, rank) per hash: register = top ``p`` bits; rank =
    trailing-zero count of the remaining ``64-p`` bits + 1 (capped at
    ``64-p+1`` when they are all zero).  Trailing zeros — not leading —
    because they are EXACT in integer math on both engines
    (``bit_count((w & -w) - 1)`` in SQL, lsb bit-length via frexp here;
    the geometric distribution is identical).  All int64 outputs."""
    h = np.asarray(h, dtype=np.uint64)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    lsb = (w & (~w + np.uint64(1))).astype(np.float64)
    # lsb <= 2^(63-p) < 2^53 for p >= 11 -> frexp exponent is exact
    rank = np.where(
        w == 0, 64 - p + 1, np.frexp(lsb)[1].astype(np.int64)
    ).astype(np.int64)
    return reg, rank


def hll_register_table(ds, col: str, *, p: int = HLL_P,
                       prehashed: bool = False, keys=None):
    """Mergeable HLL state as a Dataset of (*keys, register, max_rank)
    rows — only registers that were hit (<= 2^p rows per key group).
    Per-batch partial max (one tiny table per batch ships), then a
    bounded grouped max — the same two-phase shape as every sketch
    here.  ``prehashed=False`` splitmix64-hashes the int64 column
    first.  ``keys`` makes the sketch PER GROUP (e.g. per day): the
    approximate sibling of ``relational.grouped_distinct_count`` whose
    exchange stays <= |groups| * 2^p rows no matter the input."""
    import pyarrow as pa

    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.relational import grouped_aggregate

    keys = list(keys or [])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            cols = {k: batch[k] for k in keys}
            cols["register"] = pa.array([], pa.int64())
            cols["max_rank"] = pa.array([], pa.int64())
            return pa.table(cols)
        v = batch[col].to_numpy(zero_copy_only=False)
        h = v.view(np.uint64) if prehashed else splitmix64(
            v.astype(np.int64).view(np.uint64)
        )
        reg, rank = hll_rank_batch(h, p)
        cols = {k: batch[k] for k in keys}
        cols["register"] = pa.array(reg)
        cols["rank"] = pa.array(rank)
        out = pa.table(cols).group_by(keys + ["register"]).aggregate(
            [("rank", "max")]
        )
        return out.rename_columns(keys + ["register", "max_rank"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(
        partials, keys + ["register"], [("max_rank", "max", "max_rank")]
    )


def hll_estimate(registers: np.ndarray, ranks: np.ndarray,
                 p: int = HLL_P) -> float:
    """Cardinality estimate from a (register, max_rank) table (absent
    registers are zero), with the standard small-range linear-counting
    correction."""
    m = 1 << p
    M = np.zeros(m, dtype=np.int64)
    M[np.asarray(registers, dtype=np.int64)] = np.asarray(
        ranks, dtype=np.int64
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-M.astype(np.float64)))
    zeros = int(np.sum(M == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

CMS_D = 4        # depth (independent hash rows)
CMS_LW = 12      # log2 width -> 4096 cells/row
_CMS_SALT = 0x9E3779B97F4A7C15


def cms_cells_batch(v: np.ndarray, *, d: int = CMS_D, lw: int = CMS_LW):
    """(depth, cell) pairs for every value: depth j hashes
    ``splitmix64(v + j*SALT)`` and takes the top ``lw`` bits — the
    same top-bit convention as the HLL register, so the SQL replay is
    one shared splitmix chain per depth.  Returns (depths, cells)
    flattened depth-major, each ``d * len(v)`` int64."""
    from geodata_ray.sources.synth import splitmix64

    v = np.asarray(v, dtype=np.int64).view(np.uint64)
    shift = np.uint64(64 - lw)
    cells = np.empty((d, v.size), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(d):
            h = splitmix64(v + np.uint64(j) * np.uint64(_CMS_SALT))
            cells[j] = (h >> shift).astype(np.int64)
    depths = np.repeat(np.arange(d, dtype=np.int64), v.size)
    return depths, cells.ravel()


def cms_table(ds, col: str, *, d: int = CMS_D, lw: int = CMS_LW):
    """Mergeable Count-Min state as a Dataset of (depth, cell, n) rows
    — only cells that were hit (<= d * 2^lw rows total; counts merge
    by SUMMING, so sketches from disjoint shards/days combine with a
    grouped sum).  Two-phase like every sketch here: per-batch grouped
    count (bounded d * 2^lw rows ship per batch), then a bounded
    grouped sum."""
    from geodata_ray.stages.relational import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "depth": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        v = batch[col].to_numpy(zero_copy_only=False)
        depths, cells = cms_cells_batch(v, d=d, lw=lw)
        t = pa.table({"depth": pa.array(depths), "cell": pa.array(cells)})
        out = t.group_by(["depth", "cell"]).aggregate([([], "count_all")])
        return out.rename_columns(["depth", "cell", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(
        partials, ["depth", "cell"], [("n", "sum", "n")]
    )


def cms_estimate(cms_df, values, *, d: int = CMS_D, lw: int = CMS_LW):
    """Point frequency estimates (min over depths) from a collected
    (depth, cell, n) table — one-sided: estimate >= true count, with
    overshoot ~ N/2^lw per depth.  Driver-side helper over the
    bounded sketch table."""
    grid = np.zeros((d, 1 << lw), dtype=np.int64)
    grid[cms_df["depth"].to_numpy(), cms_df["cell"].to_numpy()] = (
        cms_df["n"].to_numpy()
    )
    depths, cells = cms_cells_batch(np.asarray(values), d=d, lw=lw)
    return grid[depths, cells].reshape(d, -1).min(axis=0)


# ---------------------------------------------------------------------------
# Bloom filter (partitioned)
# ---------------------------------------------------------------------------


def bloom_bits(ds, col, *, d: int = CMS_D, lw: int = CMS_LW):
    """Partitioned Bloom filter over an int64 column as a Dataset of
    DISTINCT set-bit indices ``bit = depth * 2^lw + cell`` — one 2^lw
    partition per hash, the same (depth, cell) hashing as the
    Count-Min sketch (``cms_cells_batch``), so the SQL replay shares
    its splitmix chain.  Merge across shards/days/crawls is a distinct
    UNION of bit tables; at most ``d * 2^lw`` rows ever exist, so the
    state is constant-bounded no matter the input size.  Membership
    (``bloom_contains``): no false negatives; false-positive rate
    ~ prod_j (n_distinct / 2^lw) for the partitioned variant."""
    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"bit": pa.array([], pa.int64())})
        v = batch[col].to_numpy(zero_copy_only=False)
        depths, cells = cms_cells_batch(v, d=d, lw=lw)
        bits = depths * np.int64(1 << lw) + cells
        return pa.table({"bit": pa.array(np.unique(bits))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # distinct union: the bit space is constant-bounded (d * 2^lw
    # <= 16K rows at the defaults), so collapsing the per-batch
    # distinct partials to ONE block and deduping locally beats a Ray
    # groupby's fixed exchange cost by ~2s per execution — the
    # bounded-cardinality final-merge pattern (same as hll/simsearch)

    def merge(batch: pa.Table) -> pa.Table:
        b = batch["bit"].to_numpy(zero_copy_only=False)
        return pa.table({"bit": pa.array(np.unique(b))})

    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def bloom_contains(bits_df, values, *, d: int = CMS_D, lw: int = CMS_LW):
    """Driver-side membership probe against a collected bit table:
    True iff ALL d partition bits are set (no false negatives)."""
    grid = np.zeros(d << lw, dtype=bool)
    grid[bits_df["bit"].to_numpy()] = True
    depths, cells = cms_cells_batch(np.asarray(values), d=d, lw=lw)
    hits = grid[depths * np.int64(1 << lw) + cells]
    return hits.reshape(d, -1).all(axis=0)


def bloom_probe(ds, bits_tbl, col, *, d: int = CMS_D, lw: int = CMS_LW,
                out_col: str = "maybe_seen"):
    """Probe a column against a COLLECTED Bloom bit table (<= d * 2^lw
    rows ~ 16 KB at the defaults — broadcast once): appends a boolean
    ``out_col``; True has false positives (bit collisions), False is
    exact.  The cross-crawl membership / frontier-dedup composition:
    ``bloom_bits`` on crawl A, ``bloom_probe`` on crawl B, zero
    shuffle on the probe side."""
    import ray

    if hasattr(bits_tbl, "to_arrow_refs"):  # a Dataset
        bits_tbl = pa.concat_tables(ray.get(bits_tbl.to_arrow_refs()))
    grid = np.zeros(d << lw, dtype=bool)
    grid[np.asarray(bits_tbl["bit"])] = True
    grid_ref = ray.put(grid)

    def probe(batch: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        depths, cells = cms_cells_batch(v, d=d, lw=lw)
        hits = g[depths * np.int64(1 << lw) + cells]
        seen = hits.reshape(d, -1).all(axis=0)
        return batch.append_column(out_col, pa.array(seen))

    return ds.map_batches(probe, batch_format="pyarrow")
