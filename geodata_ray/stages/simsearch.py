"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — each batch matmuls against a
broadcast query matrix (exact, recall 1; numpy BLAS per batch), with a
per-batch partial top-k so only k rows per (query, batch) move to the
final merge.  Scale path: hyperplane-LSH bucketing (dedup.py) or the
IVF variant here (coarse k-means centroids -> probe nearest lists).

Reference analogue: the engine-level kNN requirement (SURVEY.md J10);
geodata's nearest-neighbor reindex (``cutout.py:929-1001``) is the
grid special case.
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


def ann_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
):
    """Exact cosine top-k: Dataset of (query_id, neighbor_id, rank).

    ``queries``: (Q, d) float matrix broadcast once.  Per batch:
    normalized matmul -> per-batch top-k partials; final exact merge on
    one reducer (Q x k x #blocks rows — tiny).
    """
    Q = np.asarray(queries, dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = np.asarray(query_ids, dtype=np.int64)
    try:
        import ray

        ref = ray.put((qids, Q))
    except Exception:
        ref = (qids, Q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        rqids, RQ = _resolve(ref)
        ids = batch[id_col].to_numpy()
        V = _as_matrix(batch[vec_col])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = RQ @ V.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        for qi in range(RQ.shape[0]):
            s = sims[qi]
            mask = np.ones(s.shape[0], dtype=bool)
            if exclude_self:
                mask &= ids != rqids[qi]
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            top = cand[np.argsort(-s[cand], kind="stable")[:k]]
            out_q.append(np.full(top.size, rqids[qi], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        df = df.sort_values(
            ["query_id", "sim", "neighbor_id"],
            ascending=[True, False, True],
            ignore_index=True,
        )
        df = df.groupby("query_id", sort=True).head(k)
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rank"]], preserve_index=False
        )

    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


def ivf_build(table: pa.Table, *, vec_col: str = "embedding", n_lists: int = 16,
              iters: int = 10, seed: int = 5):
    """Coarse IVF centroids via a few Lloyd iterations (driver-side,
    deterministic).  Returns (centroids, assignment) for probing."""
    X = _as_matrix(table[vec_col])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], size=min(n_lists, X.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(C.shape[0]):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                C[j] = v / np.linalg.norm(v)
    return C, np.argmax(X @ C.T, axis=1)


def ivf_topk(
    ds,
    centroids: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
):
    """IVF-pruned top-k: batches drop vectors whose centroid list is
    not probed by any query, then run the exact partial top-k on the
    survivors.  Approximate (recall < 1 when true neighbors live in
    unprobed lists) — the scale path next to :func:`ann_topk`."""
    C = np.asarray(centroids, dtype=np.float64)
    Q = np.asarray(queries, dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probed = set()
    for qi in range(Q.shape[0]):
        lists = np.argsort(-(Q[qi] @ C.T))[:n_probe]
        probed.update(int(x) for x in lists)
    probed_arr = np.array(sorted(probed), dtype=np.int64)
    try:
        import ray

        cref = ray.put((C, probed_arr))
    except Exception:
        cref = (C, probed_arr)

    def prune(batch: pa.Table) -> pa.Table:
        CC, plists = _resolve(cref)
        V = _as_matrix(batch[vec_col])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        assign = np.argmax(V @ CC.T, axis=1)
        keep = np.isin(assign, plists)
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return ann_topk(
        pruned, Q, query_ids, id_col=id_col, vec_col=vec_col, k=k
    )
