"""Skew handling: hot-key detection and salted group computation.

Megacity geocodes concentrate web pages into a few H3 cells (the
fixture gazetteer is zipf-weighted so the top city holds ~15% of rows
— SURVEY.md §4 skew row).  Algebraic aggregates in this engine never
feel it (``grouped_aggregate`` pre-combines inside batches), but
holistic per-group computations (top-k per tile, per-group sorts,
quantiles) would ship every hot-cell row to one reducer.  The standard
fix, implemented here:

1. ``detect_hot_keys``: cheap two-phase count, keys above a row
   threshold are "hot";
2. salt: hot keys get a uniform random-but-deterministic salt in
   [0, n_salts) appended to the group key, cold keys salt 0 — so a hot
   group splits into n_salts bounded subgroups;
3. per-(key, salt) partial computation via ``map_groups``;
4. final merge per key over n_salts partial results (tiny).

Works for any computation with a partial+merge decomposition (top-k,
count-distinct sketches, sampled quantiles...).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geodata_ray.sources.synth import splitmix64
from geodata_ray.stages.relational import grouped_aggregate


def detect_hot_keys(ds, key: str, *, threshold_rows: int) -> np.ndarray:
    """Keys whose total row count exceeds ``threshold_rows`` (exact,
    two-phase — cheap because only (key, partial count) rows shuffle;
    the threshold filter runs distributed so only the hot subset — tiny
    by definition — ever reaches the driver)."""
    counts = grouped_aggregate(ds, [key], [(key, "count", "n")])
    hot = counts.filter(expr=f"n > {threshold_rows}").to_pandas()
    if key not in hot.columns:  # empty result loses its schema
        return np.empty(0, dtype=np.int64)
    return hot[key].to_numpy()


def salted_topk_per_key(
    ds,
    *,
    key: str,
    order_col: str,
    k: int,
    n_salts: int = 8,
    hot_keys: np.ndarray | None = None,
    threshold_rows: int = 10_000,
    descending: bool = True,
):
    """Top-k rows per key under skew.

    Hot keys are split into ``n_salts`` deterministic subgroups (salt =
    splitmix64(row order_col bits) % n_salts — any per-row hash works;
    determinism keeps retries byte-stable).  Phase 1 takes top-k within
    each (key, salt); phase 2 merges the <= n_salts * k survivors per
    key.  Cold keys pay nothing (salt 0, single group).
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, key, threshold_rows=threshold_rows)
    hot_set = pa.array(np.asarray(hot_keys))

    def add_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = batch[key]
        if len(hot_set) == 0:
            # empty hot set: numpy gives it a default dtype that need
            # not match the key column (e.g. string keys), so skip the
            # is_in entirely — nothing is hot
            is_hot = np.zeros(len(batch), dtype=bool)
        else:
            is_hot = pc.is_in(keys, value_set=hot_set).to_numpy(
                zero_copy_only=False
            )
        vals = batch[order_col].to_numpy(zero_copy_only=False)
        h = splitmix64(vals.astype(np.float64).view(np.uint64))
        salt = np.where(is_hot, (h % np.uint64(n_salts)).astype(np.int64), 0)
        return batch.append_column("__salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def _tie_cols(g: pd.DataFrame):
        # deterministic tie-break: order_col first, then every other
        # column — equal rows are interchangeable, so block arrival
        # order can never change the selected top-k
        return [order_col] + [c for c in g.columns if c not in (order_col, "__salt")]

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        cols = _tie_cols(g)
        g = g.sort_values(
            cols, ascending=[not descending] + [True] * (len(cols) - 1),
            kind="stable",
        ).head(k)
        return g.drop(columns=["__salt"])

    partial = salted.groupby([key, "__salt"]).map_groups(
        local_topk, batch_format="pandas"
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        cols = [order_col] + [c for c in g.columns if c != order_col]
        g = g.sort_values(
            cols, ascending=[not descending] + [True] * (len(cols) - 1),
            kind="stable",
        ).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return partial.groupby(key).map_groups(final_topk, batch_format="pandas")


def heavy_hitters(ds, key: str, *, min_count: int,
                  summary_size: int | None = None):
    """EXACT heavy hitters (keys with >= ``min_count`` rows) without a
    full-key shuffle — the 100-TB path where ``detect_hot_keys``'s
    grouped count over EVERY distinct key would itself be the bottleneck
    (10^12 pages have ~10^9 distinct hosts; only the heavy tail
    matters).

    Two passes (mergeable-summaries construction, Agarwal et al.,
    "Mergeable Summaries", PODS'12):

    1. per-batch Misra-Gries-style compressed counts: exact batch
       counts, top-``m`` kept after subtracting the (m+1)-th count —
       the summed summaries undercount any key by at most n/m, so with
       ``m >= 2n/min_count`` (the default) every true heavy hitter
       survives with summed count >= min_count - n/m.  Only m rows per
       batch ever shuffle;
    2. exact counts for the bounded candidate set (broadcast semi-join
       + grouped count), filtered ``>= min_count`` — the output is
       EXACT, the summary error only ever widens the candidate set.

    Pass ``summary_size`` to override m (smaller = less traffic, wider
    candidates; BELOW n/min_count the superset guarantee is lost).
    """
    from geodata_ray.stages.relational import semi_join

    n = ds.count()
    if summary_size is None:
        m = max(64, -(-2 * n // max(min_count, 1)))
    else:
        # a summary below n/min_count voids the superset guarantee —
        # true heavy hitters could silently vanish from an output that
        # claims to be EXACT, so refuse instead of degrading
        floor = -(-n // max(min_count, 1))
        if summary_size < floor:
            raise ValueError(
                f"heavy_hitters: summary_size={summary_size} is below "
                f"ceil(n/min_count)={floor}; the merged summaries could "
                "undercount a true heavy hitter out of the candidate "
                "set. Pass summary_size >= that floor (or None for the "
                "2x default)."
            )
        m = summary_size

    def summarize(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        c = t["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) > m:
            order = np.argsort(-c, kind="stable")
            cut = c[order[m]]  # (m+1)-th largest batch count
            keep = order[:m]
            newc = c[keep] - cut
            pos = newc > 0
            return pa.table(
                {
                    key: t[key].take(pa.array(keep[pos])),
                    "mg": pa.array(newc[pos]),
                }
            )
        return pa.table({key: t[key], "mg": pa.array(c)})

    partials = ds.map_batches(summarize, batch_format="pyarrow")
    merged = grouped_aggregate(partials, [key], [("mg", "sum", "mg")])
    cand_thresh = max(min_count - n // max(m, 1) - 1, 1)
    cand = merged.filter(expr=f"mg >= {cand_thresh}").to_pandas()
    if key not in cand.columns or len(cand) == 0:
        # no candidates: return an empty result WITH the output schema
        # (an empty pipeline tail would lose it)
        import ray.data as rd

        from geodata_ray.stages.relational import _arrow_type

        ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
        return rd.from_arrow(
            pa.table(
                {
                    key: pa.array([], _arrow_type(ktype)),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        )
    cand_keys = cand[key].to_numpy()

    exact = grouped_aggregate(
        semi_join(ds.select_columns([key]), cand_keys, key),
        [key],
        [(key, "count", "n_rows")],
    )
    return exact.filter(expr=f"n_rows >= {min_count}")


def _shard_of(values: np.ndarray, n_shards: int) -> np.ndarray:
    """Deterministic value-only shard assignment for the final-merge
    grouping: splitmix64 for integer keys, pandas' fixed-key siphash
    (``pd.util.hash_array``) for strings/objects.  Consistent across
    batches and runs — a key's partials always land in one shard."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.integer):
        h = splitmix64(arr.astype(np.uint64))
    else:
        h = pd.util.hash_array(arr.astype(object))
    return (h % np.uint64(n_shards)).astype(np.int64)


def stratified_sample(
    ds, *, key: str, id_col: str, n_per_key: int, n_shards: int = 16
):
    """Deterministic per-key fixed-quota sample: the ``n_per_key`` rows
    with the smallest Knuth-multiplicative id hash within each key —
    the per-language / per-domain quota sampling a training-data
    pipeline runs, reproducible at ANY parallelism (a seeded
    ``random_sample`` depends on block structure).

    Decomposable top-k plan: per-batch partial quota (at most
    n x distinct-keys rows leave each batch — the wide payload never
    ships; join the returned ids back for payloads), then a SHARDED
    final merge: partials group by ``hash(key) % n_shards`` so each
    key's candidates co-locate in one of ``n_shards`` bounded groups —
    no single-block funnel even at per-domain cardinality (~10^8 keys
    x n rows split across shards; raise ``n_shards`` with cardinality).
    Ids must be NON-NEGATIVE: a negative id would hash differently here
    (uint64 wrap) than in the oracle's signed SQL modulo, so it is
    rejected upfront.
    """
    from geodata_ray.sources.synth import GEO_A, GEO_M

    def quota(batch: pa.Table) -> pa.Table:
        df = batch.select([key, id_col]).to_pandas()
        raw = df[id_col].to_numpy()
        if raw.size and raw.min() < 0:
            raise ValueError(
                f"stratified_sample requires non-negative {id_col!r} "
                f"(signed-modulo hash divergence otherwise)"
            )
        ids = raw.astype(np.uint64)
        df["__h"] = ((ids * np.uint64(GEO_A)) % np.uint64(GEO_M)).astype(
            np.int64
        )
        df = df.sort_values(["__h", id_col], kind="stable")
        out = df.groupby(key, sort=False).head(n_per_key)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(quota, batch_format="pyarrow")

    def add_shard(batch: pa.Table) -> pa.Table:
        kv = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__shard", pa.array(_shard_of(kv, n_shards))
        )

    def final_quota(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col], kind="stable")
        g = g.groupby(key, sort=False).head(n_per_key)
        return g.drop(columns=["__h", "__shard"])

    return (
        partials.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(final_quota, batch_format="pandas")
    )


def bottom_k(ds, sort_cols, k: int):
    """Global bottom-k rows by ``sort_cols`` (ascending, left-to-right
    tie-break) WITHOUT a global sort: each block keeps its own k
    smallest rows (vectorized lexsort + slice), then the surviving
    <= n_blocks x k rows — bounded and tiny — merge through one final
    sort + limit.  The all-to-all exchange a naive ``ds.sort().limit``
    would pay never happens; at 100 TB only k rows per block move.
    Mirrors the reference's sorted-table sinks (geodata
    convert.py sorted outputs) generalized to a weighted-priority
    selection.  Returns a Dataset of exactly min(k, total) rows."""

    cols = list(sort_cols)

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        arrs = [
            batch[c].to_numpy(zero_copy_only=False) for c in reversed(cols)
        ]
        order = np.lexsort(arrs)[:k]
        return batch.take(pa.array(order))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return pruned.sort(cols).limit(k)
