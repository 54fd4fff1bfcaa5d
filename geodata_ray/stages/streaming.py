"""Keyed stateful stream processing with raw Ray actors.

The one place this engine drops below the Dataset API (per the design
rule: raw actors only where ``Dataset`` genuinely cannot express the
semantics): UNBOUNDED keyed streams whose per-key state must persist
across batches in event-time order.  For bounded tables the same
results come from ``groupby(key).map_groups`` (see
``windows.session_windows`` / the running-totals query) — this module
is the scale/streaming path where a key's history cannot be
materialized as one group.

Topology: the input is consumed in event-time order (``ds.sort(ts)``
then ordered batch iteration); each batch is split by ``hash(key) %
num_buckets`` and routed to a pinned ``BucketStateActor``.  Actor tasks
from a single submitter execute in submission order, so per-key state
updates are applied in event-time order without locks.  State is a
dict key -> running aggregate inside each actor (the "one actor per
key-hash bucket" pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from geodata_ray.sources.synth import splitmix64


@ray.remote
class BucketStateActor:
    """Holds running per-key state for one hash bucket."""

    def __init__(self):
        # key -> slot index into the flat state arrays: the dict is
        # touched once per NEW key; steady-state reads/updates are pure
        # numpy gathers/scatters over the slot arrays
        self.slot: dict = {}
        self._sums = np.zeros(1024, dtype=np.int64)
        self._cnts = np.zeros(1024, dtype=np.int64)

    @property
    def sums(self) -> dict:
        """Materialized key -> running-sum dict (tests/snapshots)."""
        return {
            k: int(self._sums[s]) for k, s in self.slot.items()
        }

    @property
    def counts(self) -> dict:
        return {
            k: int(self._cnts[s]) for k, s in self.slot.items()
        }

    def _slots_for(self, ukeys: list) -> np.ndarray:
        """Slot index per unique key, registering new keys (zero state)."""
        get = self.slot.get
        slots = np.array([get(k, -1) for k in ukeys], dtype=np.int64)
        new = np.flatnonzero(slots < 0)
        if new.size:
            nxt = len(self.slot)
            need = nxt + new.size
            if need > self._sums.size:
                grow = max(need, 2 * self._sums.size)
                for name in ("_sums", "_cnts"):
                    arr = np.zeros(grow, dtype=np.int64)
                    arr[: getattr(self, name).size] = getattr(self, name)
                    setattr(self, name, arr)
            for i in new.tolist():
                self.slot[ukeys[i]] = nxt
                slots[i] = nxt
                nxt += 1
        return slots

    def process(self, table: pa.Table, key_col: str, value_col: str) -> pa.Table:
        """Vectorized per-key running sum/count over one event-time-ordered
        batch: hash-factorize keys (O(n), no comparison sort of raw
        keys), group rows with a composite-key argsort that is stable by
        construction, compute within-segment cumulative sums (one
        ``np.cumsum`` + a segment-base subtraction), add each key's
        carried-in state, scatter back to arrival order, and touch the
        state dict exactly once per UNIQUE key."""
        n = len(table)
        if n == 0:
            return table.append_column(
                "running_sum", pa.array([], pa.int64())
            ).append_column("running_n", pa.array([], pa.int64()))
        keys = table[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = table[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # factorize: codes in first-appearance order, m distinct.  The
        # composite key code*n + row_index is unique, so a plain
        # quicksort argsort groups by code while preserving event order
        # within each key — ~4x cheaper than a stable int64 argsort of
        # the raw keys (and radix-sortable dtypes don't apply to
        # arbitrary 64-bit user ids)
        codes, uniq = pd.factorize(keys)
        arange = np.arange(n, dtype=np.int64)
        if len(uniq) <= 32767:
            # numpy's stable argsort is a RADIX sort for <=16-bit ints
            # (~8x a comparison sort) — codes always fit for the 8k-row
            # stream batches
            order = np.argsort(codes.astype(np.int16), kind="stable")
        else:
            # unique composite key -> plain quicksort is stable here
            order = np.argsort(codes.astype(np.int64) * n + arange)
        sc, sv = codes[order], vals[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        counts = np.diff(np.append(starts, n))
        cs = np.cumsum(sv)
        # within-segment cumsum: subtract the cumsum up to (excl.) each start
        seg = cs - np.repeat(cs[starts] - sv[starts], counts)
        pos = arange - np.repeat(starts, counts) + 1
        # tolist() first: native-int dict probes are ~5x cheaper than
        # hashing boxed numpy scalars, and the slot probe is the only
        # remaining Python-level work (once per UNIQUE key; state
        # read/write is a numpy gather/scatter over the slot arrays).
        # sorted codes are 0..m-1 in order, so segment j's key is uniq[j]
        slots = self._slots_for(uniq.tolist())
        seg += np.repeat(self._sums[slots], counts)
        pos += np.repeat(self._cnts[slots], counts)
        ends = starts + counts - 1
        self._sums[slots] = seg[ends]
        self._cnts[slots] = pos[ends]
        out_sum = np.empty(n, dtype=np.int64)
        out_n = np.empty(n, dtype=np.int64)
        out_sum[order] = seg
        out_n[order] = pos
        return table.append_column(
            "running_sum", pa.array(out_sum)
        ).append_column("running_n", pa.array(out_n))

    def snapshot(self) -> dict:
        m = len(self.slot)
        return {"keys": m, "total": int(self._sums[:m].sum())}


def keyed_running_aggregate(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    num_buckets: int = 8,
    batch_size: int = 8192,
):
    """Running per-key aggregates over an event-time-ordered stream.

    Returns a ``ray.data.Dataset`` of the input rows +
    running_sum/running_n, built with ``from_arrow_refs`` over the
    actor-task outputs — the (input-sized) result stays in the object
    store and never materializes on the driver; only the routing loop's
    in-flight batch does.  Row order follows event time within each
    bucket.

    The driver routes batches; per-bucket work and all state live in
    actors.  This is the documented last-resort pattern — the driver
    loop is the price of cross-batch ordered state, which
    ``map_batches`` (stateless between batches per block) and
    ``map_groups`` (needs the whole group at once) cannot provide for
    unbounded keys.
    """
    import ray.data as rd

    actors = [BucketStateActor.remote() for _ in range(num_buckets)]
    pending: list = []
    ordered = ds.sort(ts_col)
    for batch in ordered.iter_batches(
        batch_size=batch_size, batch_format="pyarrow"
    ):
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        h = splitmix64(keys.astype(np.uint64))
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        for b in range(num_buckets):
            mask = bucket == b
            if mask.any():
                sub = batch.filter(pa.array(mask))
                pending.append(actors[b].process.remote(sub, key_col, value_col))
    if not pending:  # empty input stream: keep the schema + output cols
        sch = ordered.schema()
        from geodata_ray.stages.relational import _arrow_type

        cols = {
            n: pa.array([], _arrow_type(t))
            for n, t in zip(sch.names, sch.types)
        }
        cols["running_sum"] = pa.array([], pa.int64())
        cols["running_n"] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    return rd.from_arrow_refs(pending)


def actor_state_snapshots(actors) -> pd.DataFrame:
    return pd.DataFrame(ray.get([a.snapshot.remote() for a in actors]))


@ray.remote
class DedupStateActor:
    """Seen-fingerprint set for one hash shard of an unbounded stream
    (the incremental dedup a crawler runs: each arriving page is kept
    only if its fingerprint was never seen).  At 10^12 docs each shard
    holds |distinct|/num_buckets 8-byte hashes — sized by adding
    shards, the same scaling story as any distributed seen-set."""

    def __init__(self):
        self.seen: set = set()

    def process(self, table: pa.Table, fp_col: str) -> pa.Table:
        # vectorized in-batch first-occurrence (np.unique returns the
        # FIRST index per value); the Python set probe runs only over
        # the batch's UNIQUE values — under heavy duplication (the
        # workload this exists for) that is a small fraction of rows
        fps = table[fp_col].to_numpy(zero_copy_only=False)
        uniq, first_idx = np.unique(fps, return_index=True)
        fresh = np.fromiter(
            (int(u) not in self.seen for u in uniq),
            dtype=bool, count=len(uniq),
        )
        self.seen.update(int(u) for u in uniq[fresh])
        keep = np.zeros(len(fps), dtype=bool)
        keep[first_idx[fresh]] = True
        return table.filter(pa.array(keep))

    def snapshot(self) -> dict:
        return {"keys": len(self.seen)}


def streaming_exact_dedup(
    ds,
    *,
    order_col: str,
    fp_col: str,
    num_buckets: int = 8,
    batch_size: int = 8192,
):
    """First-occurrence exact dedup over a stream consumed in
    ``order_col`` order: rows whose ``fp_col`` was already seen are
    dropped.  Deterministic — with a total arrival order the kept row
    per fingerprint is exactly ``min(order_col)``, which is what the
    SQL oracle checks.  Same last-resort topology as
    :func:`keyed_running_aggregate` (per-shard pinned actors; actor
    tasks from one submitter run in submission order).

    Returns a ``ray.data.Dataset`` built from the shard outputs' object
    refs — the (corpus-sized) deduped stream never lands on the driver;
    only the routing loop's in-flight batch does."""
    import ray.data as rd
    actors = [DedupStateActor.remote() for _ in range(num_buckets)]
    pending: list = []
    ordered = ds.sort(order_col)
    # NOTE: the fp dtype is validated on the FIRST batch, not via
    # ordered.schema() — schema() after an AllToAll sort executes the
    # whole upstream pipeline, and iter_batches would then execute it
    # a SECOND time (measured 2x wall on streaming_dedup_docs).
    fp_checked = False
    for batch in ordered.iter_batches(
        batch_size=batch_size, batch_format="pyarrow"
    ):
        if not fp_checked:
            fp_type = batch.schema.field(fp_col).type
            if fp_type not in (pa.int64(), pa.uint64()):
                raise ValueError(
                    f"streaming_exact_dedup: fp_col {fp_col!r} must be "
                    f"int64/uint64 (a 64-bit fingerprint), got {fp_type}; "
                    "a narrower dtype would be silently reinterpreted by "
                    "the uint64 bit view"
                )
            fp_checked = True
        if batch[fp_col].null_count:
            raise ValueError(
                f"streaming_exact_dedup: fp_col {fp_col!r} contains nulls; "
                "fingerprints must be non-null (nulls degrade to object "
                "dtype and break the seen-set probe)"
            )
        fps = batch[fp_col].to_numpy(zero_copy_only=False)
        h = splitmix64(fps.view(np.uint64))
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        for b in range(num_buckets):
            mask = bucket == b
            if mask.any():
                sub = batch.filter(pa.array(mask))
                pending.append(actors[b].process.remote(sub, fp_col))
    if not pending:  # empty input stream: keep the schema
        from geodata_ray.stages.relational import _arrow_type

        sch = ordered.schema()
        return rd.from_arrow(
            pa.table(
                {
                    n: pa.array([], _arrow_type(t))
                    for n, t in zip(sch.names, sch.types)
                }
            )
        )
    return rd.from_arrow_refs(pending)
