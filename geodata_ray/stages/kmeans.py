"""Distributed k-means over an embedding column.

Iterative algorithm on Ray Data (the class the driver records
rows-only — no SQL expression): each Lloyd iteration is one streaming
pass — broadcast centroids, per-batch partial sums per cluster
(vectorized argmax + bincount/add.at), tiny grouped reduction, new
centroids on the driver (k x d floats).  Initialization and tie-breaks
are deterministic, so results are identical at any parallelism.

Reference analogue: none (geodata has no ML ops); this is the
training-data-pipeline addition next to IVF (simsearch.ivf_build runs
the same Lloyd loop driver-side on a materialized table — this version
streams, which is the 10^12-row path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geodata_ray.stages.dedup import _as_matrix


def _resolve(ref):
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except Exception:
        pass
    return ref


def _partial_stats(batch: pa.Table, cref, vec_col: str) -> pa.Table:
    C = _resolve(cref)
    V = _as_matrix(batch[vec_col])
    d2 = (
        (V * V).sum(axis=1, keepdims=True)
        - 2.0 * V @ C.T
        + (C * C).sum(axis=1)[None, :]
    )
    assign = np.argmin(d2, axis=1)  # deterministic tie-break: lowest id
    k, dim = C.shape
    sums = np.zeros((k, dim))
    np.add.at(sums, assign, V)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
            "n": pa.array(counts),
        }
    )


def kmeans_fit(
    ds,
    *,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 10,
    seed: int = 5,
    init_table: pa.Table | None = None,
):
    """Fit k centroids; returns (centroids ndarray, inertia-proxy).

    ``init_table``: small table whose first k rows seed the centroids
    (deterministic); otherwise the first k rows of the dataset.
    """
    import ray

    if init_table is not None:
        C = _as_matrix(init_table[vec_col])[:k].copy()
    else:
        first = pa.Table.from_pylist(ds.take(k))
        C = _as_matrix(first[vec_col]).copy()

    counts = np.zeros(C.shape[0], dtype=np.int64)
    for _ in range(iters):
        cref = ray.put(C)
        parts = [
            t
            for t in ray.get(
                ds.map_batches(
                    lambda b, cref=cref: _partial_stats(b, cref, vec_col),
                    batch_format="pyarrow",
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        if parts:
            pt = pa.concat_tables(parts)
            cl = pt["cluster"].to_numpy(zero_copy_only=False)
            vs = _as_matrix(pt["vsum"])
            # vectorized scatter-add (one partial row per block x
            # cluster — was a pandas iterrows loop)
            np.add.at(sums, cl, vs)
            np.add.at(counts, cl,
                      pt["n"].to_numpy(zero_copy_only=False))
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return C, counts


def kmeans_assign(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Assign every row to its nearest centroid (one streaming pass)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(batch: pa.Table) -> pa.Table:
        C = _resolve(cref)
        V = _as_matrix(batch[vec_col])
        d2 = (
            (V * V).sum(axis=1, keepdims=True)
            - 2.0 * V @ C.T
            + (C * C).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def semdedup_keep(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 6,
    tau: float = 0.99,
    init_table: pa.Table | None = None,
):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering then WITHIN-CLUSTER cosine pruning — a vector is dropped
    iff some lower-id vector in the same cluster has cosine >= tau
    (greedy-by-id, NOT transitive closure: a dropped vector still
    suppresses its own higher-id neighbors, exactly the rule a SQL
    ``NOT IN (SELECT id_b FROM pairs)`` replays).  Returns the KEPT
    (id, cluster) rows.

    Scale shape: clustering is the streaming Lloyd above (one pass per
    iteration); the pairwise step never crosses clusters — k is the
    scale knob (SemDeDup's own design: pick k so n/k fits one worker;
    within-cluster LSH is the further escape hatch).  The threshold
    margin (0.99 vs ~0.5 max random cosine) makes the float comparison
    engine-stable."""
    import pyarrow.compute as pc

    C, _ = kmeans_fit(
        ds, vec_col=vec_col, k=k, iters=iters, init_table=init_table
    )
    import ray

    cref = ray.put(np.asarray(C, dtype=np.float64))

    def assign_keep_vec(batch: pa.Table) -> pa.Table:
        Cm = _resolve(cref)
        V = _as_matrix(batch[vec_col])
        d2 = (
            (V * V).sum(axis=1, keepdims=True)
            - 2.0 * V @ Cm.T
            + (Cm * Cm).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "cluster": pa.array(
                    np.argmin(d2, axis=1).astype(np.int64)
                ),
                vec_col: batch[vec_col],
            }
        )

    assigned = ds.map_batches(assign_keep_vec, batch_format="pyarrow")

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        V = _as_matrix(t[vec_col])[order]
        norms = np.sqrt((V * V).sum(axis=1))
        norms[norms == 0] = 1.0
        N = V / norms[:, None]
        S = N @ N.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = S[iu, ju] >= tau
        dropped = np.zeros(len(ids), dtype=bool)
        dropped[np.unique(ju[hit])] = True
        return pa.table(
            {
                id_col: pa.array(ids[~dropped], pa.int64()),
                "cluster": t["cluster"].take(
                    pa.array(order[~dropped])
                ),
            }
        )

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pyarrow"
    )
