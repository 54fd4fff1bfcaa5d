"""Event-time windowing over batch datasets.

The reference is strictly batch (SURVEY.md §2.9) — its only temporal
operator is the daily-mean resample (``convert.py:151``).  Stream-shaped
inputs (the ``events`` table) get the standard batch expressions:

- tumbling windows: key = floor(ts / size) -> two-phase grouped agg
  (no per-row shuffle);
- session windows: gaps-and-islands per key — ``groupby(key)``
  ``map_groups`` over the ts-sorted group.  Partition key is the
  session key, so one shuffle; skewed keys can be salted only for
  aggregates, not sessions (a session must see all its rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.stages.relational import grouped_aggregate


def tumbling_counts(ds, *, key_col: str, ts_col: str = "ts", unit: str = "hour",
                    value_col: str | None = None):
    """Per-(key, window) counts (+ sum of ``value_col`` if given)."""

    def prep(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch[ts_col], unit=unit)
        cols = {key_col: batch[key_col], "window": win}
        if value_col:
            cols[value_col] = batch[value_col]
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    specs = [(key_col, "count", "n_events")]
    if value_col:
        specs.append((value_col, "sum", f"sum_{value_col}"))
    return grouped_aggregate(prepped, [key_col, "window"], specs)


def sliding_counts(ds, *, key_col: str, ts_col: str = "ts",
                   window_hours: int = 2, slide_hours: int = 1,
                   value_col: str | None = None):
    """Sliding (hopping) windows: each event replicates into the
    ``window/slide`` windows containing it (flat-map inside
    map_batches), then the standard two-phase grouped aggregate —
    overlap factor bounds the replication, never a per-row shuffle."""
    if window_hours % slide_hours != 0:
        raise ValueError(
            f"window_hours ({window_hours}) must be a multiple of "
            f"slide_hours ({slide_hours}) — otherwise events near hop "
            "boundaries would be silently dropped from covering windows"
        )
    n_windows = window_hours // slide_hours
    slide_us = slide_hours * 3600 * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        # align to SLIDE multiples, not plain hours: with slide>1 an
        # hour-floored base would put events of the same hop under
        # different window_start keys
        base = pc.floor_temporal(
            batch[ts_col], multiple=slide_hours, unit="hour"
        )
        tables = []
        for k in range(n_windows):
            off = pa.scalar(k * slide_us, pa.duration("us"))
            cols = {
                key_col: batch[key_col],
                "window_start": pc.subtract(base, off),
            }
            if value_col:
                cols[value_col] = batch[value_col]
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    specs = [(key_col, "count", "n_events")]
    if value_col:
        specs.append((value_col, "sum", f"sum_{value_col}"))
    return grouped_aggregate(exploded, [key_col, "window_start"], specs)


def session_windows(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    gap_minutes: int = 30):
    """Sessionization: per key, consecutive events within
    ``gap_minutes`` belong to one session.  Output one row per session:
    (key, session_start, session_end, n_events)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, ignore_index=True)
        ts = g[ts_col].to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = (
            g.assign(__sid=sid)
            .groupby("__sid", sort=True)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")


def _tag_bucket(ds, key_col: str, num_buckets: int):
    """Append ``__b = key % num_buckets`` (int64 keys) — the shared
    bounded-cardinality bucketing step of the keyed-segment operators
    below.  One definition so a future key-hash change (string keys,
    splitmix salting) lands everywhere at once."""

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__b", pa.array((k % num_buckets).astype(np.int64))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def trajectory_stats(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    num_buckets: int = 32,
):
    """Per-key trajectory statistics over time-ordered integer grid
    positions: point count, move count, total and maximum Chebyshev
    hop distance — the movement-summary primitive for sessionized
    geo streams.

    Shape: keys hash into ``num_buckets`` groups (bounded-cardinality
    groupby — a handful of big vectorized groups, never one Ray group
    per key); inside each group ONE Arrow sort by (key, ts, tie) and
    numpy segment reduction (``add.reduceat`` / ``maximum.reduceat``
    over key-change boundaries) — no per-key Python loop.  All-integer
    arithmetic, so outputs are engine-exact at any parallelism.  One
    exchange; ``num_buckets`` bounds per-group memory."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by(
            [
                (key_col, "ascending"),
                (ts_col, "ascending"),
                (tie_col, "ascending"),
            ]
        )
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        # hop i sits between points i and i+1; zero it across key
        # boundaries so segment reductions never mix users
        d = np.maximum(np.abs(np.diff(x)), np.abs(np.diff(y)))
        same = u[1:] == u[:-1]
        d_ext = np.r_[np.where(same, d, 0), np.int64(0)]
        ends = np.r_[starts[1:], n]
        n_pts = ends - starts
        total = np.add.reduceat(d_ext, starts)
        max_hop = np.maximum.reduceat(d_ext, starts)
        # reduceat over [start, next_start) includes the zeroed
        # boundary slot, so single-point keys report 0 — by design
        return pa.table(
            {
                key_col: pa.array(u[starts]),
                "n_pts": pa.array(n_pts.astype(np.int64)),
                "n_moves": pa.array((n_pts - 1).astype(np.int64)),
                "total_dist": pa.array(total.astype(np.int64)),
                "max_hop": pa.array(max_hop.astype(np.int64)),
            }
        )

    return (
        _tag_bucket(ds, key_col, num_buckets)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def first_per_group(
    ds,
    *,
    group_cols,
    order_cols,
    hash_col: str | None = None,
    num_buckets: int = 32,
):
    """Keep exactly the FIRST row of every group under a caller-defined
    total order — the time-windowed dedup / argmin primitive (e.g.
    "first fetch per (url, week)" recrawl dedup).  ``order_cols`` must
    make rows totally ordered within a group (append a unique id as
    the last key).

    Shape: ONE exchange — groups hash into ``num_buckets`` buckets by
    ``hash_col`` (default: first group col; int64), then inside each
    bucket one Arrow sort by group+order keys and a vectorized
    group-boundary mask picks first rows.  No per-group Python; bucket
    count bounds per-group memory."""
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    hc = hash_col or group_cols[0]

    def per_bucket(g: pa.Table) -> pa.Table:
        for c in group_cols:
            # a null/NaN group key would split into one "group" per row
            # (NaN != NaN in the boundary mask) while SQL's PARTITION BY
            # treats NULLs as ONE partition — refuse instead of diverging
            if g[c].null_count:
                raise ValueError(
                    f"first_per_group: null values in group column {c!r};"
                    " sentinel-encode them upstream"
                )
        t = g.sort_by(
            [(c, "ascending") for c in group_cols + order_cols]
        )
        n = len(t)
        # boundary mask: row i starts a group iff any group col differs
        # from row i-1
        diff = np.zeros(max(n - 1, 0), dtype=bool)
        for c in group_cols:
            col = t[c].to_numpy(zero_copy_only=False)
            diff |= col[1:] != col[:-1]
        first = np.r_[True, diff] if n else np.zeros(0, bool)
        return t.filter(pa.array(first)).drop_columns(["__b"])

    return (
        _tag_bucket(ds, hc, num_buckets)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def funnel(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    stages=("view", "click", "purchase"),
    num_buckets: int = 32,
):
    """Ordered conversion funnel per key: for each stage in ``stages``,
    the earliest event of that type STRICTLY AFTER the previous
    stage's time — the product-analytics funnel (view -> click ->
    purchase) as one distributed operator.  Emits one row per key:
    ``<stage>_us`` int64 (-1 = never reached; later stages are blocked
    once a stage is missed) and ``n_stages`` completed.

    Shape: the same ONE-exchange bucketed-keys pattern as
    :func:`trajectory_stats`; inside each bucket one Arrow sort by
    (key, ts) then one vectorized masked segment-min (`reduceat`) PER
    STAGE — no per-key Python, |stages| passes over the bucket.
    ``ts_col`` must be integer (cast timestamps to epoch-us upstream)
    so sentinels and comparisons are exact."""
    sent = np.iinfo(np.int64).max

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        u = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = np.asarray(t[type_col].to_numpy(zero_copy_only=False))
        n = len(u)
        if n and ts.min() < 0:
            # -1 is the "never reached" output sentinel and would be
            # ambiguous (and the first-stage threshold would drop
            # ts<=-1 events) — require nonnegative epoch-us
            raise ValueError(
                "funnel: ts_col must be nonnegative epoch-us"
            )
        new_seg = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_seg)
        seg = np.cumsum(new_seg) - 1
        thr_row = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        cols: dict[str, np.ndarray] = {}
        done = np.zeros(len(starts), dtype=np.int64)
        for st in stages:
            vals = np.where((typ == st) & (ts > thr_row), ts, sent)
            seg_min = np.minimum.reduceat(vals, starts)
            stage_t = np.where(seg_min == sent, np.int64(-1), seg_min)
            cols[f"{st}_us"] = stage_t
            done += (stage_t >= 0).astype(np.int64)
            thr_row = np.where(stage_t < 0, sent, stage_t)[seg]
        out = {key_col: pa.array(u[starts])}
        out.update({k: pa.array(v) for k, v in cols.items()})
        out["n_stages"] = pa.array(done)
        return pa.table(out)

    return (
        _tag_bucket(ds, key_col, num_buckets)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def session_attribution(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "cents",
    tie_col: str = "event_id",
    gap_minutes: int = 30,
):
    """Sessionize (same gap rule as :func:`session_windows`) and
    attribute each session: first/last event type (ties broken by
    ``tie_col`` — deterministic across partitionings), event count and
    integer value sum.  The marketing first-touch/last-touch primitive.
    Output: (key, session_start, session_end, n_events, value_sum,
    first_type, last_type), one row per session."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tie_col], ignore_index=True)
        ts = g[ts_col].to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        gg = g.assign(__sid=sid).groupby("__sid", sort=True)
        out = gg.agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
            value_sum=(val_col, "sum"),
            first_type=(type_col, "first"),
            last_type=(type_col, "last"),
        ).reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out["value_sum"] = out["value_sum"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")


def ewma_halving(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    val_col: str = "cents",
    num_buckets: int = 32,
    alias: str = "ewma",
):
    """Per-key exponentially-weighted moving average with alpha = 1/2
    in EXACT integer arithmetic: ``s_1 = y_1``, ``s_t = (s_{t-1} +
    y_t) // 2`` over (ts, tie) order — the smoothing recursion as a
    deterministic cross-engine operator (a float EWMA can never
    hash-match).

    Values must be NON-NEGATIVE: numpy's ``//`` floors while SQL
    engines truncate toward zero, so negatives would silently diverge
    — guarded with a ValueError instead.

    Shape: keys hash into ``num_buckets`` groups (ONE exchange);
    inside a bucket, one Arrow sort + a vectorized WAVEFRONT
    recursion — iteration k updates the k-th row of every segment at
    once, so the Python loop is bounded by the maximum per-key depth,
    never the row count.  Emits (key, tie, alias) per input row."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"),
             (tie_col, "ascending")]
        )
        y = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if y.size and y.min() < 0:
            raise ValueError(
                "ewma_halving requires non-negative values (floor vs "
                "truncating division diverges on negatives)"
            )
        keys = t[key_col].to_numpy(zero_copy_only=False)
        n = len(y)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        s = y.copy()
        for k in range(1, int(counts.max()) if n else 0):
            sel = starts[counts > k] + k
            s[sel] = (s[sel - 1] + y[sel]) // 2
        return pa.table(
            {
                key_col: t[key_col],
                tie_col: t[tie_col],
                alias: pa.array(s, pa.int64()),
            }
        )

    return (
        _tag_bucket(ds, key_col, num_buckets)
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def trailing_window_counts(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    window_us: int = 3_600_000_000,
    num_buckets: int = 32,
    keep_key: bool = False,
):
    """Per-ROW trailing-window count: for every row, how many of the
    same key's rows fall in the preceding ``window_us`` INCLUDING the
    row and its timestamp peers — exactly SQL's ``RANGE BETWEEN
    <window> PRECEDING AND CURRENT ROW``.  Keyed-segment plan: bucket
    by key, per-key-segment two-sided searchsorted (vectorized per
    segment; no self-join blowup).  Returns (tie_col, n_trailing)."""

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                tie_col: batch[tie_col],
                "__ts_us": batch[ts_col]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )

    def count(t: pa.Table) -> pa.Table:
        u = t[key_col].to_numpy(zero_copy_only=False)
        e = t[tie_col].to_numpy(zero_copy_only=False)
        ts = t["__ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, u))
        u, e, ts = u[order], e[order], ts[order]
        new = np.ones(u.size, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], u.size)
        n = np.empty(u.size, dtype=np.int64)
        for s, z in zip(starts, ends):  # per KEY segment, vectorized
            seg = ts[s:z]
            hi = np.searchsorted(seg, seg, side="right")
            lo = np.searchsorted(seg, seg - window_us, side="left")
            n[s:z] = hi - lo
        cols = {tie_col: pa.array(e), "n_trailing": pa.array(n)}
        if keep_key:
            cols[key_col] = pa.array(u)
        return pa.table(cols)

    bucketed = _tag_bucket(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key_col,
        num_buckets,
    )
    return bucketed.groupby("__b").map_groups(
        lambda g: count(g.drop_columns(["__b"])), batch_format="pyarrow"
    )


def interval_union_length(
    ds,
    *,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    num_buckets: int = 32,
):
    """Per-key length of the UNION of half-open integer intervals
    [start, end) — the coverage primitive behind "active seconds",
    sensor uptime and crawl-window accounting (the keyed complement of
    the reference's per-cell time aggregation, SURVEY §2.5 A1).

    Exact int64 sweep, fully vectorized: keys hash into
    ``num_buckets`` bounded groups; inside each group ONE Arrow sort
    by (key, start, end), then the classic sweep — interval i
    contributes ``max(0, end_i - max(start_i, M))`` where M is the
    running max of earlier ends in the same key segment.  The
    segment-reset running max uses the offset trick (add
    ``seg_id * (range+1)`` before a global ``np.maximum.accumulate``),
    guarded against int64 overflow so results are exact or the stage
    refuses loudly.  One exchange; per-group memory bounded by
    ``num_buckets``.  Returns (key, covered) with ``covered`` in the
    interval units."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by(
            [
                (key_col, "ascending"),
                (start_col, "ascending"),
                (end_col, "ascending"),
            ]
        )
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg_id = np.cumsum(np.r_[0, (u[1:] != u[:-1]).astype(np.int64)])
        lo = min(int(s.min()), int(e.min()))
        hi = max(int(s.max()), int(e.max()))
        rng = hi - lo + 1
        n_seg = int(seg_id[-1]) + 1
        if n_seg * rng >= 2**62:  # offset trick must stay exact
            raise ValueError(
                "interval_union_length: value range x segment count "
                "overflows int64 — shrink num_buckets groups or "
                "pre-normalize timestamps"
            )
        off = seg_id * np.int64(rng)
        cummax_e = np.maximum.accumulate(e - lo + off) - off + lo
        # running max of ends STRICTLY BEFORE row i, within segment
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = cummax_e[:-1]
        prev[starts] = np.iinfo(np.int64).min
        contrib = np.maximum(e - np.maximum(s, prev), 0)
        covered = np.add.reduceat(contrib, starts)
        return pa.table(
            {
                key_col: pa.array(u[starts]),
                "covered": pa.array(covered.astype(np.int64)),
            }
        )

    return (
        _tag_bucket(ds, key_col, num_buckets)
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        )
    )


def _key_codes(t: pa.Table, cols) -> np.ndarray:
    """Per-column integer codes for segment-boundary detection: string
    columns dictionary-encode to indices, everything else passes
    through as numpy — avoids object-array comparisons in the hot
    path."""
    out = []
    for c in cols:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            out.append(col.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64))
        else:
            out.append(col.to_numpy(zero_copy_only=False))
    return out


def _segment_starts(code_cols: list[np.ndarray]) -> np.ndarray:
    n = code_cols[0].size if code_cols else 0
    new = np.ones(n, dtype=bool)
    if n > 1:
        acc = np.zeros(n - 1, dtype=bool)
        for c in code_cols:
            acc |= c[1:] != c[:-1]
        new[1:] = acc
    return np.flatnonzero(new)


def ohlc_candles(
    ds,
    *,
    key_cols,
    ts_col: str = "ts",
    tie_col: str = "event_id",
    val_col: str = "cents",
):
    """Per-key OHLC candlesticks: ``open`` = value of the first row in
    (ts, tie) order, ``close`` = value of the last, ``high``/``low`` =
    max/min value, ``n_rows`` = count — the financial-bar /
    time-bucket summarization as a deterministic distributed operator
    (ties broken by ``tie_col``, so the result is order-independent).

    Shape: per input block ONE Arrow sort + reduceat extracts a
    9-column partial row per key (open/close candidates carry their
    own (ts, tie) order keys, so partials MERGE exactly — tuple argmin
    needs no packed key); the only exchange groups the tiny partials
    (<= blocks x keys rows) and lexsort-merges per key.  Nothing ever
    materializes on the driver."""
    key_cols = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    **{k: batch[k] for k in key_cols},
                    "o_ts": pa.array([], pa.int64()),
                    "o_tie": pa.array([], pa.int64()),
                    "o_val": pa.array([], pa.int64()),
                    "c_ts": pa.array([], pa.int64()),
                    "c_tie": pa.array([], pa.int64()),
                    "c_val": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = batch.sort_by(
            [(k, "ascending") for k in key_cols]
            + [(ts_col, "ascending"), (tie_col, "ascending")]
        )
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = t[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _segment_starts(_key_codes(t, key_cols))
        ends = np.append(starts[1:], t.num_rows)
        last = ends - 1
        cols = {k: t[k].take(pa.array(starts)) for k in key_cols}
        cols.update(
            {
                "o_ts": pa.array(ts[starts]),
                "o_tie": pa.array(tie[starts]),
                "o_val": pa.array(val[starts]),
                "c_ts": pa.array(ts[last]),
                "c_tie": pa.array(tie[last]),
                "c_val": pa.array(val[last]),
                "lo": pa.array(np.minimum.reduceat(val, starts)),
                "hi": pa.array(np.maximum.reduceat(val, starts)),
                "n": pa.array(ends - starts),
            }
        )
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        o = np.lexsort(
            (
                g["o_tie"].to_numpy(zero_copy_only=False),
                g["o_ts"].to_numpy(zero_copy_only=False),
            )
        )
        c = np.lexsort(
            (
                g["c_tie"].to_numpy(zero_copy_only=False),
                g["c_ts"].to_numpy(zero_copy_only=False),
            )
        )
        row = {k: g[k].take(pa.array([0])) for k in key_cols}
        row.update(
            {
                "open_cents": pa.array(
                    [int(g["o_val"][int(o[0])].as_py())], pa.int64()
                ),
                "high_cents": pa.array(
                    [int(pc.max(g["hi"]).as_py())], pa.int64()
                ),
                "low_cents": pa.array(
                    [int(pc.min(g["lo"]).as_py())], pa.int64()
                ),
                "close_cents": pa.array(
                    [int(g["c_val"][int(c[-1])].as_py())], pa.int64()
                ),
                "n_rows": pa.array([int(pc.sum(g["n"]).as_py())], pa.int64()),
            }
        )
        return pa.table(row)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key_cols).map_groups(
        merge, batch_format="pyarrow"
    )


def cusum_changepoint(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    val_col: str = "cents",
    min_n: int = 8,
    num_buckets: int = 32,
):
    """Per-key CUSUM change-point detection in EXACT integer
    arithmetic: over the key's rows in (ts, tie) order with prefix
    sums ``c_i`` and total ``T``, the change point is the split
    ``i`` (1-based, ``1 <= i < n``) maximizing ``|n*c_i - i*T|`` —
    the classic mean-shift CUSUM statistic with the 1/n(n-i)i
    normalizer cleared so no float ever appears; ties break to the
    SMALLEST ``i``.  Keys with fewer than ``min_n`` rows are dropped.

    Shape: keys hash into ``num_buckets`` groups (ONE exchange); per
    bucket one lexsort + segment-offset prefix sums + a lexsort
    argmax — no per-row Python.  ``n * sum|value|`` per key must fit
    int64 (raises otherwise: a silent wrap would flip the argmax).
    Emits (key, n, split_i, stat)."""
    from geodata_ray.stages.windows import _tag_bucket

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = g[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tie, ts, k))
        k, y = k[order], y[order]
        n = k.size
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "split_i": pa.array([], pa.int64()),
                    "stat": pa.array([], pa.int64()),
                }
            )
        new = np.ones(n, dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        seg = np.cumsum(new) - 1  # segment id per row
        lens = ends - starts
        # segment-local prefix sums via global cumsum minus the
        # per-segment offset (repeat, NOT accumulate: cumsums can be
        # negative, so a running max would mis-propagate offsets)
        gc = np.cumsum(y)
        prev = np.zeros(starts.size, dtype=np.int64)
        prev[1:] = gc[starts[1:] - 1]
        cs = gc - np.repeat(prev, lens)
        i_local = np.arange(n, dtype=np.int64) - starts[seg] + 1
        tot = cs[ends - 1][seg]
        nn = lens[seg]
        # overflow guard: |n*c_i| <= n * sum|y| per key, and |i*T| too.
        # Computed in float64 (an int64 product would itself wrap
        # before the check fires); float sum error is ~n*eps, far
        # inside the 2x margin between the 2^62 bar and the 2^63 wrap
        abs_sum = np.add.reduceat(
            np.abs(y).astype(np.float64), starts
        )
        if abs_sum.size and float(
            (lens.astype(np.float64) * abs_sum).max()
        ) > float(2**62):
            raise ValueError(
                "cusum_changepoint: n * sum|value| exceeds the exact-"
                "int64 budget; rescale the value column"
            )
        stat = np.abs(nn * cs - i_local * tot)
        # candidates: interior splits of segments with >= min_n rows
        cand = (i_local < nn) & (nn >= min_n)
        if not cand.any():
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "split_i": pa.array([], pa.int64()),
                    "stat": pa.array([], pa.int64()),
                }
            )
        cs_seg = seg[cand]
        cs_stat = stat[cand]
        cs_i = i_local[cand]
        o = np.lexsort((cs_i, -cs_stat, cs_seg))
        first = np.flatnonzero(
            np.r_[True, cs_seg[o][1:] != cs_seg[o][:-1]]
        )
        pick = o[first]
        return pa.table(
            {
                key_col: pa.array(k[starts[cs_seg[pick]]]),
                "n": pa.array(nn[cand][pick]),
                "split_i": pa.array(cs_i[pick]),
                "stat": pa.array(cs_stat[pick]),
            }
        )

    return (
        _tag_bucket(ds, key_col, num_buckets)
        .groupby("__b")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        )
    )


def gapfill_hourly_counts(
    ds,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    max_spine_rows: int = 2_000_000,
):
    """Time-series densification: hourly counts per key INCLUDING
    zero rows for every hour between the global min and max active
    hour — the gap-filling resample every monitoring/feature pipeline
    needs before windowed math (a missing hour must read as 0, not as
    an absent row).

    Shape: counts pre-combine per block (one bounded exchange); the
    spine is keys x hour-range — an inherently BOUNDED post-aggregate
    artifact (guarded by ``max_spine_rows``: a sparse 10^9-hour range
    raises instead of exploding), so the fill is a vectorized local
    scatter, not a join."""
    import ray.data as rd

    def hour(batch: pa.Table) -> pa.Table:
        h = pc.divide(
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            3_600_000_000,
        )
        return pa.table({key_col: batch[key_col], "hour": h})

    counts = grouped_aggregate(
        ds.map_batches(hour, batch_format="pyarrow"),
        [key_col, "hour"],
        [("hour", "count", "n_events")],
    ).to_pandas()  # bounded: distinct keys x active hours

    if counts.empty:
        return rd.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "hour": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        )
    hours = counts["hour"].to_numpy().astype(np.int64)
    h0, h1 = int(hours.min()), int(hours.max())
    keys = np.sort(counts[key_col].unique())
    span = h1 - h0 + 1
    if span * keys.size > max_spine_rows:
        raise ValueError(
            f"gapfill spine {span * keys.size} rows exceeds "
            f"max_spine_rows={max_spine_rows}; narrow the range or "
            "partition by key"
        )
    key_idx = {k: i for i, k in enumerate(keys)}
    filled = np.zeros((keys.size, span), dtype=np.int64)
    rows = counts[key_col].map(key_idx).to_numpy().astype(np.int64)
    filled[rows, hours - h0] = counts["n_events"].to_numpy()
    out = pa.table(
        {
            key_col: pa.array(np.repeat(keys, span)),
            "hour": pa.array(np.tile(np.arange(h0, h1 + 1), keys.size)),
            "n_events": pa.array(filled.ravel()),
        }
    )
    return rd.from_arrow(out)
