"""Relational core: scalable groupby / join / dedup building blocks.

The reference's relational surface is coordinate-aligned raster algebra
(SURVEY.md §2.4-2.7); here those semantics are generalized to proper
relational operators with Ray-Data-scale physical plans:

- ``grouped_aggregate``: ALWAYS two-phase — partial aggregation inside
  each batch with pyarrow's vectorized hash aggregation, then a final
  ``groupby().aggregate`` over the (tiny) partials.  A bare
  ``ds.groupby(...)`` would shuffle every row; this ships one row per
  (batch, key) instead, which also neutralizes key skew for
  algebraic aggregates (sum/count/min/max/mean).
- ``broadcast_join``: small side ``ray.put`` once, pyarrow hash join
  per batch inside ``map_batches`` (SURVEY.md J4's mask-attach join).
- ``semi_join`` / ``anti_join``: broadcast key set membership filter
  (the reference's include/exclude shape extraction, ``mask.py:593-598``).
- ``distinct_first``: exact dedup keeping the min-orderby row per key
  (hash-partitioned groupby + per-group reduce; SURVEY.md D6).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# (input_col, fn, output_alias); fn in {sum,count,mean,min,max}
AggSpec = tuple[str, str, str]


def grouped_aggregate(
    ds, keys: Sequence[str], specs: Sequence[AggSpec], *, coalesce: int = 16
):
    """``coalesce``: number of blocks to repartition the partials into
    before the final groupby.  Partial aggregation leaves one tiny
    block per input block; Ray's sort-based groupby pays per-block
    overhead, so coalescing cuts the final shuffle's fixed cost ~3x.
    Set 0 to disable for very high-cardinality keys where partials are
    themselves large."""
    keys = list(keys)
    # build the partial-phase pyarrow aggregation list
    pa_aggs: list[tuple] = []
    need: set[tuple[str, str]] = set()
    for col, fn, _alias in specs:
        if fn == "count":
            need.add(("", "count_all"))
        elif fn == "mean":
            # null-skipping mean (xarray/pandas semantics): sum over
            # valid / count of valid — callers converting NaN->null get
            # skipna behavior; otherwise NaN poisons the sum as in numpy
            need.add((col, "sum"))
            need.add((col, "count"))
        elif fn in ("sum", "min", "max"):
            need.add((col, fn))
        else:
            raise ValueError(f"unsupported agg fn {fn}")
    for col, fn in sorted(need):
        pa_aggs.append(([] if fn == "count_all" else [col], fn))

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys).aggregate(pa_aggs)

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if coalesce:
        partials = partials.repartition(coalesce)
    final_aggs = []
    for col, fn in sorted(need):
        pname = "count_all" if fn == "count_all" else f"{col}_{fn}"
        if fn in ("sum", "count", "count_all"):  # counts merge by summing
            final_aggs.append(Sum(pname, alias_name=pname))
        elif fn == "min":
            final_aggs.append(Min(pname, alias_name=pname))
        elif fn == "max":
            final_aggs.append(Max(pname, alias_name=pname))
    out = partials.groupby(keys).aggregate(*final_aggs)

    # final projection: alias + derive means
    def project(batch: pa.Table) -> pa.Table:
        arrays, names = [], []
        for k in keys:
            arrays.append(batch[k])
            names.append(k)
        for col, fn, alias in specs:
            if fn == "count":
                arrays.append(batch["count_all"])
            elif fn == "mean":
                arrays.append(
                    pc.divide(
                        pc.cast(batch[f"{col}_sum"], pa.float64()),
                        pc.cast(batch[f"{col}_count"], pa.float64()),
                    )
                )
            else:
                arrays.append(batch[f"{col}_{fn}"])
            names.append(alias)
        return pa.table(dict(zip(names, arrays)))

    return out.map_batches(project, batch_format="pyarrow")


def _arrow_type(t) -> pa.DataType:
    """Normalize a Ray-reported schema type (Arrow DataType, numpy
    dtype, or Python class — pandas-produced blocks report the latter)
    to an Arrow DataType for null-filling."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except Exception:  # object dtype, Python classes, promotion errors
        pass
    mapping = {int: pa.int64(), float: pa.float64(), str: pa.string(),
               bool: pa.bool_(), bytes: pa.binary(), object: pa.string()}
    try:
        if np.dtype(t) == np.dtype(object):
            return pa.string()
    except Exception:
        pass
    return mapping.get(t, pa.string())


def _resolve(ref):
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except Exception:
        pass
    return ref


class _BroadcastJoiner:
    def __init__(self, small_ref, keys, join_type, small_cols=None):
        small = _resolve(small_ref)
        if isinstance(small, pd.DataFrame):
            small = pa.Table.from_pandas(small, preserve_index=False)
        if small_cols:
            small = small.select(list(dict.fromkeys(list(keys) + small_cols)))
        self.small = small.combine_chunks()
        self.keys = list(keys)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small, keys=self.keys, join_type=self.join_type
        )


def broadcast_join(
    ds,
    small,
    keys: Sequence[str],
    *,
    join_type: str = "inner",
    small_cols: Sequence[str] | None = None,
    concurrency=(1, 4),
    batch_size: int = 65536,
):
    """Hash-join each batch of ``ds`` against a broadcast small table.

    ``small`` may be a pyarrow Table / pandas DataFrame or a
    ``ray.ObjectRef`` to one (put once, resolved per actor).  No
    shuffle of the big side; the join runs in pyarrow acero per batch.
    """
    try:
        import ray

        if not isinstance(small, ray.ObjectRef):
            small = ray.put(small)
    except Exception:
        pass
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "small_ref": small,
            "keys": list(keys),
            "join_type": join_type,
            "small_cols": list(small_cols) if small_cols else None,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class _KeyFilter:
    def __init__(self, keys_ref, key_col, keep_matches):
        keys = _resolve(keys_ref)
        self.value_set = pa.array(keys)
        self.key_col = key_col
        self.keep = keep_matches

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[self.key_col], value_set=self.value_set)
        if not self.keep:
            mask = pc.invert(mask)
        return batch.filter(mask)


def semi_join(ds, key_values, key_col: str, *, concurrency=(1, 4)):
    """Keep rows whose ``key_col`` is in the broadcast key set."""
    return ds.map_batches(
        _KeyFilter,
        fn_constructor_kwargs={
            "keys_ref": key_values,
            "key_col": key_col,
            "keep_matches": True,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def anti_join(ds, key_values, key_col: str, *, concurrency=(1, 4)):
    """Drop rows whose ``key_col`` is in the broadcast key set
    (the reference's ``exclude=True`` anti-join, ``mask.py:593-598``)."""
    return ds.map_batches(
        _KeyFilter,
        fn_constructor_kwargs={
            "keys_ref": key_values,
            "key_col": key_col,
            "keep_matches": False,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def shuffle_join(
    left,
    right,
    keys: Sequence[str],
    *,
    how: str = "inner",
    num_buckets: int = 64,
    suffix: str = "_r",
):
    """Large-large equi-join: explicit partitioned hash join.

    Both sides get ``__b = hash(key) % num_buckets`` and a side tag,
    are unioned (one shuffle total), grouped by bucket, and merged
    per-bucket with pyarrow's acero hash join inside ``map_groups`` —
    Arrow-native, so empty or one-sided buckets keep the declared
    column types (the pandas empty-merge float-upcast hazard is gone).
    ``num_buckets`` bounds per-group memory (size the bucket count so
    |left|/num_buckets fits a worker heap).  Hot join keys skew their
    bucket; remedies are raising ``num_buckets`` (splits hash space,
    not a single hot key) or pre-filtering/broadcast for the hot keys —
    a salted two-sided join would have to replicate one side per salt,
    which is only worth it for extreme skew.

    NULL JOIN KEYS follow SQL semantics (Arrow's acero hash join):
    a null key never matches anything — not even another null — unlike
    pandas ``merge``, which matches NaN==NaN.  Null-keyed rows still
    appear (null-extended) in the appropriate outer-join outputs.  If
    pandas-style null matching is needed, sentinel-encode nulls before
    the join.
    """
    keys = list(keys)
    lsch = left.schema()
    rsch = right.schema()
    l_cols = list(lsch.names)
    r_cols = list(rsch.names)
    all_fields: dict[str, pa.DataType] = {}
    for n, t in zip(lsch.names, lsch.types):
        all_fields[n] = _arrow_type(t)
    for n, t in zip(rsch.names, rsch.types):
        all_fields.setdefault(n, _arrow_type(t))
    col_order = list(all_fields)

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            from geodata_ray.sources.synth import splitmix64

            h = np.zeros(len(batch), dtype=np.uint64)
            for k in keys:
                col = batch[k].to_numpy(zero_copy_only=False)
                if col.dtype.kind in "iu":
                    h ^= splitmix64(col.astype(np.uint64))
                else:  # string keys: deterministic, non-memoized hash
                    from geodata_ray.stages.dedup import hash_strings_nomemo

                    h ^= hash_strings_nomemo([str(v) for v in col])
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            # align to the unified schema (null-fill the other side's cols)
            arrays = []
            for n in col_order:
                if n in batch.schema.names:
                    arrays.append(batch[n])
                else:
                    arrays.append(pa.nulls(len(batch), type=all_fields[n]))
            t = pa.table(dict(zip(col_order, arrays)))
            return t.append_column("__b", pa.array(b)).append_column(
                "__side", pa.array(np.full(len(batch), side))
            )

        return f

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")
    # coalesce before the sort-based groupby: the union typically holds
    # 2x the input block count of SMALL tagged blocks, and Ray's
    # groupby pays per-block fixed cost in its SortMap (measured 5.7 s
    # over 128 tiny blocks vs ~1.5 s over 16 on the bloom-join bench);
    # num_buckets blocks keeps the exchange volume identical.
    both = lt.union(rt).repartition(num_buckets)

    # right columns colliding with left non-key columns are RENAMED
    # with the suffix (pandas-style), not dropped
    r_keep = [c for c in r_cols]
    r_rename = {
        c: c + suffix for c in r_cols if c in l_cols and c not in keys
    }
    arrow_how = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }[how]

    # canonical pandas-style column order regardless of join type
    # (arrow's right/full outer joins reposition the key columns)
    out_cols = l_cols + [
        r_rename.get(c, c) for c in r_keep if c not in keys
    ]

    def merge(g: pa.Table) -> pa.Table:
        is_l = pc.equal(g["__side"], "l")
        lg = g.filter(is_l).select(l_cols)
        rg = g.filter(pc.invert(is_l)).select(r_keep)
        if r_rename:
            rg = rg.rename_columns([r_rename.get(c, c) for c in r_keep])
        return lg.join(rg, keys=keys, join_type=arrow_how).select(out_cols)

    return both.groupby("__b").map_groups(merge, batch_format="pyarrow")


def native_join(left, right, on, *, join_type: str = "inner",
                num_partitions: int = 16, right_on=None):
    """Ray Data's built-in hash-partitioned ``Dataset.join`` (available
    in this Ray version) — the engine's preferred large-large equi-join
    when both sides are Datasets; ``shuffle_join`` remains the
    portable/bucket-controlled fallback.

    ``num_partitions`` is capped at the cluster CPU count: the hash
    shuffle spawns one aggregator actor per partition, and a pool
    larger than the cluster DEADLOCKS on small clusters (observed hang
    at num_cpus=2 with 8 partitions).
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", num_partitions))
        num_partitions = max(2, min(num_partitions, cpus))
    except Exception:
        pass
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on) if not isinstance(on, str) else (on,),
        right_on=(
            tuple(right_on) if right_on and not isinstance(right_on, str)
            else ((right_on,) if right_on else None)
        ),
    )


def range_join(
    left,
    right,
    *,
    by: str,
    left_on: str,
    right_start: str,
    right_end: str,
    num_buckets: int = 32,
):
    """Interval-containment join: left rows matched to right rows of
    the same ``by`` key where ``right_start <= left_on <= right_end``
    (inclusive).  One bucketed union shuffle; within each bucket a
    key-equi merge followed by the interval filter — the per-key
    cross-product is the inherent output bound of a range join, so
    ``by`` must be selective (as with any range-join engine).
    """
    lsch = left.schema()
    rsch = right.schema()
    l_cols = list(lsch.names)
    r_cols = list(rsch.names)
    all_fields: dict[str, pa.DataType] = {}
    for n, t in zip(lsch.names, lsch.types):
        all_fields[n] = _arrow_type(t)
    for n, t in zip(rsch.names, rsch.types):
        all_fields.setdefault(n, _arrow_type(t))
    col_order = list(all_fields)

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            from geodata_ray.sources.synth import splitmix64

            col = batch[by].to_numpy(zero_copy_only=False)
            h = splitmix64(col.astype(np.uint64))
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            arrays = []
            for n in col_order:
                if n in batch.schema.names:
                    arrays.append(batch[n])
                else:
                    arrays.append(pa.nulls(len(batch), type=all_fields[n]))
            t = pa.table(dict(zip(col_order, arrays)))
            return t.append_column("__b", pa.array(b)).append_column(
                "__side", pa.array(np.full(len(batch), side))
            )

        return f

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )
    # colliding right columns are suffix-renamed, never silently dropped
    r_rename = {
        c: c + "_r" for c in r_cols
        if c in l_cols and c not in (by, right_start, right_end)
    }
    out_cols = l_cols + [
        r_rename.get(c, c) for c in r_cols if c != by
    ]

    def merge(g: pa.Table) -> pa.Table:
        # Arrow acero equi-join on the key + interval filter: like
        # shuffle_join, empty or one-sided buckets keep declared types
        is_l = pc.equal(g["__side"], "l")
        lg = g.filter(is_l).select(l_cols)
        rg = g.filter(pc.invert(is_l)).select(r_cols)
        if r_rename:
            rg = rg.rename_columns([r_rename.get(c, c) for c in r_cols])
        m = lg.join(rg, keys=[by], join_type="inner").select(out_cols)
        keep = pc.and_(
            pc.less_equal(m[right_start], m[left_on]),
            pc.less_equal(m[left_on], m[right_end]),
        )
        return m.filter(keep)

    return both.groupby("__b").map_groups(merge, batch_format="pyarrow")


def asof_join(
    left,
    right,
    *,
    by: str,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
    direction: str = "backward",
):
    """As-of join: for each left row, the latest right row with
    ``right_on <= left_on`` within the same ``by`` key (direction
    'backward'; pandas merge_asof semantics).

    Physical plan (ray guide pattern): bucket both sides by hash(by),
    one union shuffle, per-bucket ts-sort + ``pd.merge_asof``.
    """
    lsch = left.schema()
    rsch = right.schema()
    l_cols = list(lsch.names)
    r_cols = list(rsch.names)
    all_fields: dict[str, pa.DataType] = {}
    for n, t in zip(lsch.names, lsch.types):
        all_fields[n] = _arrow_type(t)
    for n, t in zip(rsch.names, rsch.types):
        all_fields.setdefault(n, _arrow_type(t))
    col_order = list(all_fields)

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            from geodata_ray.sources.synth import splitmix64

            col = batch[by].to_numpy(zero_copy_only=False)
            h = splitmix64(col.astype(np.uint64))
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            arrays = []
            for n in col_order:
                if n in batch.schema.names:
                    arrays.append(batch[n])
                else:
                    arrays.append(pa.nulls(len(batch), type=all_fields[n]))
            t = pa.table(dict(zip(col_order, arrays)))
            return t.append_column("__b", pa.array(b)).append_column(
                "__side", pa.array(np.full(len(batch), side))
            )

        return f

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )
    # colliding right columns are suffix-renamed (like shuffle_join),
    # never silently dropped
    r_rename = {
        c: c + "_r" for c in r_cols
        if c in l_cols and c not in (by, right_on)
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "l", l_cols].sort_values(
            left_on, kind="stable", ignore_index=True
        )
        rg = g.loc[g["__side"] == "r", r_cols].rename(
            columns=r_rename
        ).sort_values(right_on, kind="stable", ignore_index=True)
        # unify timestamp resolutions (blocks may arrive as s vs us
        # after shuffles); merge_asof requires identical key dtypes
        for df, col in ((lg, left_on), (rg, right_on)):
            if str(df[col].dtype).startswith("datetime64"):
                df[col] = df[col].astype("datetime64[us]")
        # run the merge even for empty lg so every bucket emits the
        # full joined schema (heterogeneous block schemas otherwise)
        return pd.merge_asof(
            lg, rg, left_on=left_on, right_on=right_on, by=by,
            direction=direction,
        )

    return both.groupby("__b").map_groups(merge, batch_format="pandas")


def distinct_first(ds, key: str, order_by: str):
    """Exact dedup: per distinct ``key`` keep the row minimizing
    ``order_by``.  Two-phase: per-batch local winner (pyarrow), then a
    hash-shuffle groupby over one row per (batch, key)."""

    def local(batch: pa.Table) -> pa.Table:
        # key first so equal keys are contiguous and the run filter
        # truly leaves one row per (batch, key)
        order = pc.sort_indices(
            batch, sort_keys=[(key, "ascending"), (order_by, "ascending")]
        )
        t = batch.take(order)
        # first row per key after stable sort
        keys_np = t[key].to_numpy(zero_copy_only=False)
        first = np.ones(len(t), dtype=bool)
        first[1:] = keys_np[1:] != keys_np[:-1]
        return t.filter(pa.array(first))

    local_winners = ds.map_batches(local, batch_format="pyarrow")

    def group_winner(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([order_by, key]).head(1)

    return local_winners.groupby(key).map_groups(
        group_winner, batch_format="pandas"
    )


def exact_int_quantiles(ds, col: str, qs: Sequence[float]) -> list[int]:
    """EXACT quantile_disc values of an integer column via the bounded
    two-phase histogram (only (value, partial-count) rows shuffle —
    cardinality is the value range, not the row count; a char-length
    or token-count column has ~10^5 distinct values at any corpus
    size).  Returns, per q, the smallest v with #(x <= v) >= ceil(q*n).
    """
    import math

    hist = (
        grouped_aggregate(
            ds.select_columns([col]), [col], [(col, "count", "__qn")]
        )
        .to_pandas()
        .sort_values(col, ignore_index=True)
    )
    cum = hist["__qn"].cumsum().to_numpy()
    vals = hist[col].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return []  # callers emit zero rows, matching SQL's empty set
    out = []
    for q in qs:
        target = math.ceil(q * n)
        out.append(int(vals[np.searchsorted(cum, target)]))
    return out


def assign_quantile_buckets(ds, *, col: str, qs: Sequence[float]):
    """Bucket every row by the column's own EXACT quantile boundaries
    (e.g. qs=(0.25, 0.5, 0.75) -> buckets 0..3) — the length-bucketing
    step batch-efficient training loaders run so a batch packs
    similar-length sequences.  Two streaming passes: the bounded
    histogram above, then a broadcast compare (``bucket`` = number of
    boundaries strictly below the value); no per-row shuffle at all.
    """
    bounds = np.asarray(exact_int_quantiles(ds, col, qs), dtype=np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (v[:, None] > bounds[None, :]).sum(axis=1)
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64))
        )

    return ds.map_batches(bucketize, batch_format="pyarrow")


def bloom_prefilter_join(
    big,
    small,
    key: str,
    *,
    how: str = "inner",
    num_buckets: int = 64,
    d: int = 4,
    lw: int = 12,
    suffix: str = "_r",
):
    """:func:`shuffle_join` with a Bloom semi-join pushdown: the small
    side's join keys are sketched into a d x 2^lw partitioned Bloom
    filter (~16 KB at the defaults — broadcast once, never reshipped
    per batch), the BIG side is pre-filtered against it with zero
    shuffle, and only the surviving rows enter the exact partitioned
    hash join.  False positives pass a few extra rows into the exact
    join, which drops them — the output is bit-identical to the plain
    join; the win is exchange volume: at a 1% key-selective join the
    shuffle moves ~1% of the big side (plus the FP tail, bounded by
    (occupancy)^d) instead of all of it.  THE standard large-large
    join optimization when the small side is too big to broadcast
    exactly but its Bloom image is not.

    ``how`` must keep big-side-unmatched rows out of the output
    ("inner" or "right"): a pre-filter on the big side cannot preserve
    left/full-outer semantics."""
    if how not in ("inner", "right"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/right joins, got {how!r}"
        )
    from geodata_ray.stages.sketch import bloom_bits, bloom_probe

    # the small side feeds BOTH the sketch build and the join — pin it
    # once instead of re-executing its upstream chain for each (it is
    # small by the operator's premise)
    small = small.materialize()
    bits = bloom_bits(small, key, d=d, lw=lw)
    probed = bloom_probe(big, bits, key, d=d, lw=lw, out_col="__maybe")

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["__maybe"]).drop_columns(["__maybe"])

    filtered = probed.map_batches(keep, batch_format="pyarrow")
    return shuffle_join(
        filtered, small, [key], how=how, num_buckets=num_buckets,
        suffix=suffix,
    )


def grouped_exact_quantiles(
    ds,
    key_col: str,
    col: str,
    pct_qs: Sequence[tuple[int, float]],
):
    """EXACT per-group quantile_disc over an integer column: the same
    bounded two-phase histogram as :func:`exact_int_quantiles`, keyed —
    only (key, value, partial-count) rows shuffle, so exchange volume
    is key-cardinality x value-cardinality, independent of row count.
    The per-key rank walk runs inside ``map_groups`` (vectorized
    cumsum + searchsorted per group) — suitable for bounded key sets
    (event types, languages, sources); for millions of keys, bucket
    keys first as :func:`~geodata_ray.stages.windows.trajectory_stats`
    does.  Returns (key, q_pct, value) rows: per q, the smallest v
    with #(x <= v) >= ceil(q * n_key)."""
    import math

    hist = grouped_aggregate(
        ds.select_columns([key_col, col]),
        [key_col, col],
        [(col, "count", "__qn")],
    )

    def per_key(g: pa.Table) -> pa.Table:
        t = g.sort_by([(col, "ascending")])
        cum = np.cumsum(t["__qn"].to_numpy(zero_copy_only=False))
        vals = t[col].to_numpy(zero_copy_only=False)
        n = int(cum[-1])
        out_v = [
            int(vals[np.searchsorted(cum, math.ceil(q * n))])
            for _, q in pct_qs
        ]
        return pa.table(
            {
                key_col: pa.array([t[key_col][0].as_py()] * len(pct_qs)),
                "q_pct": pa.array([p for p, _ in pct_qs], type=pa.int64()),
                col: pa.array(out_v, type=pa.int64()),
            }
        )

    return hist.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def grouped_distinct_count(
    ds, keys: Sequence[str], col: str, *, alias: str = "n_distinct"
):
    """EXACT COUNT(DISTINCT col) per key group — the DAU/unique-hosts
    aggregate.  Three-phase: (1) per-batch Arrow group_by pre-dedups
    (key, col) pairs BEFORE any exchange (for skewed streams — one
    user firing 10^4 events in a block — this collapses the shuffle to
    distinct pairs per block); (2) a grouped count dedups pairs
    globally; (3) a second grouped count per key.  Both exchanges
    carry pair-cardinality rows, never raw rows.  NULL values are not
    counted (SQL COUNT(DISTINCT) semantics); keys whose rows are ALL
    null are omitted entirely (i.e. ``HAVING COUNT(DISTINCT col) > 0``)
    — left-join a key table downstream if zero-rows must appear.
    Approximate alternative at extreme pair cardinality: the mergeable
    HLL register table (``sketch.hll_register_table``) keyed by
    group."""
    keys = list(keys)

    def pre(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + [col])
        # SQL COUNT(DISTINCT col) semantics: NULLs are not counted —
        # drop them here or every key with a null row reports +1
        if t[col].null_count:
            t = t.filter(pc.is_valid(t[col]))
        return t.group_by(keys + [col]).aggregate([])

    pairs = ds.map_batches(pre, batch_format="pyarrow")
    distinct = grouped_aggregate(
        pairs, keys + [col], [(col, "count", "__c")]
    )
    return grouped_aggregate(distinct, keys, [(col, "count", alias)])


def _grouping_sets_plan(ds, keys, specs, kept_sets):
    """Shared GROUPING SETS executor: ONE distributed aggregate at the
    finest level, then every requested key subset derives LOCALLY by
    re-aggregating the bounded finest table (dropped keys emitted as
    NULL).  Only mergeable aggregates (count/sum/min/max)."""
    keys = list(keys)
    for _c, fn, _a in specs:
        if fn not in ("count", "sum", "min", "max"):
            raise ValueError(
                f"grouping sets require mergeable aggs, got {fn!r}"
            )
    finest = grouped_aggregate(ds, keys, specs)

    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    pa_aggs = [([alias], merge_fn[fn]) for _c, fn, alias in specs]
    out_names = [f"{alias}_{merge_fn[fn]}" for _c, fn, alias in specs]

    def derive(batch: pa.Table) -> pa.Table:
        levels = []
        for kept in kept_sets:
            kept = list(kept)
            if kept == keys:
                levels.append(batch)
                continue
            if kept:
                agg = batch.group_by(kept).aggregate(pa_aggs)
            else:
                agg = batch.select(
                    [a for _c, _f, a in specs]
                ).group_by([]).aggregate(pa_aggs)
            cols = {}
            for k in keys:
                if k in kept:
                    cols[k] = agg[k]
                else:
                    cols[k] = pa.nulls(len(agg), batch.schema.field(k).type)
            for (_c, _f, alias), got in zip(specs, out_names):
                cols[alias] = agg[got]
            levels.append(pa.table(cols).select(batch.column_names))
        return pa.concat_tables(levels)

    # single-block derive: the finest table is bounded, so collapsing
    # it to one block is the documented bounded-cardinality merge
    return finest.repartition(1).map_batches(
        derive, batch_format="pyarrow", batch_size=None
    )


def rollup_aggregate(ds, keys: Sequence[str], specs: Sequence[AggSpec]):
    """``GROUP BY ROLLUP(keys...)``: the finest level plus every key
    prefix up to the grand total, dropped keys emitted as NULL.

    Plan: ONE distributed ``grouped_aggregate`` at the finest level
    (the only all-to-all exchange — partials pre-combine per batch as
    usual), then the coarser levels derive LOCALLY by re-aggregating
    the finest table, which is bounded by the finest group cardinality
    (the same bounded-result invariant every grouped query here
    already relies on; at 100 TB a rollup whose finest level is
    unbounded is the wrong query).  Only mergeable aggregates are
    allowed (count/sum/min/max — a mean does not re-aggregate from
    projected output; compute sum+count and divide downstream).
    """
    keys = list(keys)
    sets = [tuple(keys[:d]) for d in range(len(keys), -1, -1)]
    return _grouping_sets_plan(ds, keys, specs, sets)


def cube_aggregate(ds, keys: Sequence[str], specs: Sequence[AggSpec]):
    """``GROUP BY CUBE(keys...)``: every subset of the keys (2^k
    grouping sets), dropped keys emitted as NULL — same one-exchange
    plan as ``rollup_aggregate``, with all subsets instead of
    prefixes."""
    import itertools

    keys = list(keys)
    sets = []
    for d in range(len(keys), -1, -1):
        for combo in itertools.combinations(keys, d):
            sets.append(combo)
    return _grouping_sets_plan(ds, keys, specs, sets)


def _pivot_partial(batch: pa.Table, *, key_col: str, pivot_col: str,
                   values: list) -> pa.Table:
    """One combined row per key per batch: indicator ints -> local sums
    (stateless task — no actor pool to respawn per execution)."""
    cols = {key_col: batch[key_col]}
    for v in values:
        cols[str(v)] = pc.cast(pc.equal(batch[pivot_col], v), pa.int64())
    t = pa.table(cols)
    return t.group_by([key_col]).aggregate(
        [([str(v)], "sum") for v in values]
    ).rename_columns([key_col] + [str(v) for v in values])


def pivot_counts(ds, key_col: str, pivot_col: str, values=None):
    """Pivot ``pivot_col``'s values into one count column per value,
    grouped by ``key_col`` (`PIVOT ... USING COUNT(*)`).

    ``values=None`` discovers the distinct pivot values with a tiny
    pre-pass (the pivoted column set must be bounded for the result to
    be a table at all — the discovered set IS that bound).  Per batch,
    indicator ints pre-combine into one row per key, so the exchange
    carries |keys| x (|values|+1) integers per batch regardless of row
    count; rows whose pivot value is outside ``values`` contribute
    zeros (SQL conditional-aggregation semantics).
    """
    if values is None:
        values = sorted(x for x in ds.unique(pivot_col) if x is not None)
    values = list(values)
    partial = ds.map_batches(
        _pivot_partial,
        fn_kwargs={
            "key_col": key_col,
            "pivot_col": pivot_col,
            "values": values,
        },
        batch_format="pyarrow",
    )
    return grouped_aggregate(
        partial,
        [key_col],
        [(str(v), "sum", str(v)) for v in values],
    )


def interval_lookup(ds, col: str, boundaries, out_col: str = "bucket_id"):
    """Map an integer column into the interval index defined by sorted
    ``boundaries`` (geo-IP / ASN-range style lookup): row gets
    ``#(b <= x)``, i.e. interval 0 is ``(-inf, b0)``, interval k is
    ``[b_{k-1}, b_k)``.

    The range table is BROADCAST once (``ray.put``) and each batch does
    one vectorized ``np.searchsorted`` — zero shuffle, per-batch cost
    O(rows x log ranges) regardless of range-table size, the right plan
    whenever the lookup side is bounded (ASN tables are ~10^6 rows).
    Contrast with ``range_join``, which shuffles when BOTH sides scale.
    """
    b = np.asarray(sorted(boundaries), dtype=np.int64)
    try:
        import ray

        b_ref = ray.put(b)
    except Exception:
        b_ref = b

    def assign(batch: pa.Table) -> pa.Table:
        bnds = _resolve(b_ref)
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(bnds, x, side="right").astype(np.int64)
        return batch.append_column(out_col, pa.array(idx, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def winsorized_grouped_sum(
    ds,
    key_col: str,
    col: str,
    *,
    lo=(10, 0.10),
    hi=(90, 0.90),
    alias: str = "win_sum",
):
    """Robust (winsorized) grouped aggregation over an integer column:
    per key, clip values to that key's exact [lo, hi] quantiles, then
    sum — the outlier-insensitive sibling of a plain grouped sum.

    Plan: the exact keyed quantiles come from the bounded two-phase
    histogram (:func:`grouped_exact_quantiles` — (key, value, count)
    exchange only); the per-key clip bounds are a KEY-CARDINALITY-
    bounded table, broadcast back (``ray.put`` once) for a zero-shuffle
    per-batch clip; the final sum is one pre-combined grouped
    aggregate.  Returns (key, n, alias).
    """
    q = grouped_exact_quantiles(ds, key_col, col, [lo, hi])
    qt = pa.concat_tables(
        [b for b in q.iter_batches(batch_format="pyarrow")]
        or [pa.table({key_col: [], "q_pct": [], col: []})]
    )
    lo_t = qt.filter(pc.equal(qt["q_pct"], lo[0])).select([key_col, col])
    hi_t = qt.filter(pc.equal(qt["q_pct"], hi[0])).select([key_col, col])
    bounds = lo_t.rename_columns([key_col, "__lo"]).join(
        hi_t.rename_columns([key_col, "__hi"]), keys=[key_col]
    )

    clipped = broadcast_join(ds, bounds, [key_col])

    def clip(batch: pa.Table) -> pa.Table:
        v = pc.min_element_wise(
            pc.max_element_wise(batch[col], batch["__lo"]), batch["__hi"]
        )
        return pa.table({key_col: batch[key_col], "__w": v})

    return grouped_aggregate(
        clipped.map_batches(clip, batch_format="pyarrow"),
        [key_col],
        [("__w", "count", "n"), ("__w", "sum", alias)],
    )


def merge_aggregates(stored, delta, keys: Sequence[str],
                     specs: Sequence[AggSpec]):
    """Incremental materialized-view maintenance: merge a NEW
    partition's aggregate into a STORED aggregate table without
    rescanning history — union the two projected aggregate tables and
    re-aggregate with each aggregate's MERGE function (count/sum by
    summing, min/max by themselves; means are not mergeable from
    projected output — store sum+count instead).  Both inputs are
    (keys + alias) tables as produced by :func:`grouped_aggregate`;
    the exchange is bounded by key cardinality, never history size.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for _c, fn, _a in specs:
        if fn not in merge_fn:
            raise ValueError(f"merge requires mergeable aggs, got {fn!r}")
    u = stored.union(delta)
    return grouped_aggregate(
        u, keys, [(alias, merge_fn[fn], alias) for _c, fn, alias in specs]
    )


def keyed_set_op(a, b, key_col: str, op: str):
    """Distinct-key set operation between two Datasets: ``intersect``,
    ``except`` (keys in a but not b) or ``union`` — SQL's INTERSECT /
    EXCEPT / UNION on a single key column.

    Plan: each side reduces to in-batch-distinct keys tagged with a
    side flag, then ONE grouped max per flag decides membership — the
    exchange carries distinct-in-batch keys only, never rows.
    """
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op {op!r}")

    def tag(side_a: bool):
        fa, fb = (1, 0) if side_a else (0, 1)

        def f(batch: pa.Table) -> pa.Table:
            d = batch.select([key_col]).group_by([key_col]).aggregate([])
            n = len(d)
            return pa.table(
                {
                    key_col: d[key_col],
                    "__fa": pa.array(np.full(n, fa, np.int64)),
                    "__fb": pa.array(np.full(n, fb, np.int64)),
                }
            )

        return f

    u = a.map_batches(tag(True), batch_format="pyarrow").union(
        b.map_batches(tag(False), batch_format="pyarrow")
    )
    flags = grouped_aggregate(
        u, [key_col], [("__fa", "max", "__fa"), ("__fb", "max", "__fb")]
    )

    def pick(batch: pa.Table) -> pa.Table:
        fa = batch["__fa"]
        fb = batch["__fb"]
        if op == "intersect":
            mask = pc.and_(pc.equal(fa, 1), pc.equal(fb, 1))
        elif op == "except":
            mask = pc.and_(pc.equal(fa, 1), pc.equal(fb, 0))
        else:  # union
            mask = pc.or_(pc.equal(fa, 1), pc.equal(fb, 1))
        return batch.filter(mask).select([key_col])

    return flags.map_batches(pick, batch_format="pyarrow")


def _skyline_scan(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Local 2-D skyline (x maximize, y minimize): sort by (x desc,
    y asc), keep per-x-group minima whose y strictly beats the running
    min of all higher-x groups.  Ties on BOTH coords all survive
    (neither dominates the other)."""
    if len(t) == 0:
        return t
    t = t.sort_by([(x_col, "descending"), (y_col, "ascending")])
    x = t[x_col].to_numpy(zero_copy_only=False)
    y = t[y_col].to_numpy(zero_copy_only=False)
    n = len(x)
    new = np.ones(n, dtype=bool)
    new[1:] = x[1:] != x[:-1]
    starts = np.flatnonzero(new)
    gmin = y[starts]  # per-group min (sorted asc within group)
    run = np.minimum.accumulate(gmin)
    prevmin = np.empty(len(starts), dtype=y.dtype)
    prevmin[0] = np.iinfo(np.int64).max if y.dtype.kind == "i" else np.inf
    prevmin[1:] = run[:-1]
    keep_group = gmin < prevmin
    gid = np.cumsum(new) - 1
    keep = keep_group[gid] & (y == gmin[gid])
    return t.filter(pa.array(keep))


def skyline_2d(ds, *, x_col: str, y_col: str):
    """Distributed 2-D Pareto skyline: rows not dominated by any other
    row (``x`` maximize, ``y`` minimize; a dominates b iff >= / <= with
    one strict).  The multi-objective "best tradeoffs" operator.

    Plan: skyline is IDEMPOTENT-MERGEABLE — skyline(A u B) =
    skyline(skyline(A) u skyline(B)) — so each batch emits its local
    skyline and one bounded final block merges them.  Expected local
    skyline size is O(log batch) for independent dims; adversarial
    anti-correlated data degrades toward the input size (then the
    merge block is the bound to watch — shard by x-range if it ever
    matters)."""
    local = ds.map_batches(
        lambda b: _skyline_scan(b, x_col, y_col), batch_format="pyarrow"
    )
    return local.repartition(1).map_batches(
        lambda b: _skyline_scan(b, x_col, y_col),
        batch_format="pyarrow",
        batch_size=None,
    )
