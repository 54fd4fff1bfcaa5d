"""Microbench: per-row vs vectorized running-aggregate kernel
(VERDICT r3 item 4).

Compares the retired per-row Python loop against the
factorize+segment-cumsum+slot-array kernel now inside
``BucketStateActor.process``, on the wide batches the actor stream
actually sees, asserting identical outputs.  No Ray — the kernel is
pure numpy/pandas/pyarrow, so the comparison isolates exactly the code
that changed.  min-of-5 repeats per side (sandbox load makes single
timings swing ~2x); swept over distinct-key cardinalities.

Usage: python tools/microbench_running.py  -> one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from geodata_ray.stages.streaming import BucketStateActor

BATCH_ROWS = 8192
N_BATCHES = 50
REPEATS = 5


def per_row_reference(table: pa.Table, sums: dict, counts: dict):
    """The pre-r4 loop, verbatim semantics."""
    keys = table["k"].to_numpy(zero_copy_only=False)
    vals = table["v"].to_numpy(zero_copy_only=False)
    out_sum = np.empty(len(keys), dtype=np.int64)
    out_n = np.empty(len(keys), dtype=np.int64)
    for i, (k, v) in enumerate(zip(keys, vals)):
        k = int(k)
        s = sums.get(k, 0) + int(v)
        c = counts.get(k, 0) + 1
        sums[k] = s
        counts[k] = c
        out_sum[i] = s
        out_n[i] = c
    return out_sum, out_n


def bench_cardinality(n_keys: int) -> dict:
    rng = np.random.default_rng(7)
    batches = [
        pa.table(
            {
                "k": pa.array(
                    rng.integers(0, n_keys, BATCH_ROWS).astype(np.int64)
                ),
                "v": pa.array(
                    rng.integers(1, 1000, BATCH_ROWS).astype(np.int64)
                ),
            }
        )
        for _ in range(N_BATCHES)
    ]

    cls = BucketStateActor.__ray_metadata__.modified_class
    t_vec = min_actor = None
    for _ in range(REPEATS):
        actor = cls()
        t0 = time.perf_counter()
        vec_out = [actor.process(b, "k", "v") for b in batches]
        dt = time.perf_counter() - t0
        if t_vec is None or dt < t_vec:
            t_vec, min_actor = dt, actor

    t_ref = None
    for _ in range(REPEATS):
        sums: dict = {}
        counts: dict = {}
        t0 = time.perf_counter()
        ref_out = [per_row_reference(b, sums, counts) for b in batches]
        dt = time.perf_counter() - t0
        t_ref = dt if t_ref is None else min(t_ref, dt)

    for got, (ws, wn) in zip(vec_out, ref_out):
        np.testing.assert_array_equal(got["running_sum"].to_numpy(), ws)
        np.testing.assert_array_equal(got["running_n"].to_numpy(), wn)
    assert min_actor.sums == sums and min_actor.counts == counts

    return {
        "distinct_keys": n_keys,
        "per_row_sec": round(t_ref, 3),
        "vectorized_sec": round(t_vec, 3),
        "speedup": round(t_ref / t_vec, 1),
    }


def main() -> None:
    results = [bench_cardinality(nk) for nk in (100, 700, 3000)]
    print(json.dumps({
        "metric": "running-aggregate kernel microbench (min of 5)",
        "rows": BATCH_ROWS * N_BATCHES,
        "batch_rows": BATCH_ROWS,
        "by_cardinality": results,
        "outputs_identical": True,
    }))


if __name__ == "__main__":
    main()
