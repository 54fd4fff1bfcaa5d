"""Cell-local k-nearest-neighbors over geographic points.

Engine-level kNN (SURVEY.md J10): the reference's closest analogues are
``reindex_like(method="nearest")`` resampling (cutout.py:929-1001) and
the GEBCO nearest fallback (preparation.py:336-387), generalized to
true k-NN.

Plan: reference points are bucketed by cell at ``res`` (driver-side,
broadcast); each query batch expands its cells with a kRing
(``grid_disk_multi``) and brute-forces haversine top-k over the
candidate union — vectorized per batch, no shuffle.  Correct whenever
the ring radius covers the true k-th neighbor distance (documented
partitioning assumption; grow ``ring`` or fall back to a global pass
for sparse reference sets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geodata_ray.cellmath import qcell

EARTH_RADIUS_KM = qcell.EARTH_RADIUS_KM


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance (km), vectorized."""
    p1 = np.deg2rad(np.asarray(lat1, dtype=np.float64))
    p2 = np.deg2rad(np.asarray(lat2, dtype=np.float64))
    dphi = p2 - p1
    dlmb = np.deg2rad(
        np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64)
    )
    a = (
        np.sin(dphi / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


class CellKNNIndex:
    """Driver-built bucket index: cell -> reference point indices."""

    def __init__(self, ref_ids, ref_lat, ref_lon, *, res: int = 3):
        self.res = res
        self.ids = np.asarray(ref_ids)
        self.lat = np.asarray(ref_lat, dtype=np.float64)
        self.lon = np.asarray(ref_lon, dtype=np.float64)
        cells = qcell.latlng_to_cell(self.lat, self.lon, res)
        order = np.argsort(cells, kind="stable")
        self.sorted_cells = cells[order]
        self.order = order

    def candidates(self, cells: np.ndarray):
        """For each unique query cell, reference indices within it."""
        lo = np.searchsorted(self.sorted_cells, cells, side="left")
        hi = np.searchsorted(self.sorted_cells, cells, side="right")
        return lo, hi


def knn_join(
    query_ds,
    ref_ids,
    ref_lat,
    ref_lon,
    *,
    k: int = 3,
    res: int = 3,
    ring: int = 2,
    query_id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """k nearest reference points per query row.

    Output: (query_id, ref_id, rank, distance_km).  Queries whose
    coordinates are NaN produce no rows.
    """
    index = CellKNNIndex(ref_ids, ref_lat, ref_lon, res=res)
    try:
        import ray

        ref = ray.put(index)
    except Exception:
        ref = index

    def f(batch: pa.Table) -> pa.Table:
        idx = ref
        try:
            import ray

            if isinstance(idx, ray.ObjectRef):
                idx = ray.get(idx)
        except Exception:
            pass
        qids = batch[query_id_col].to_numpy(zero_copy_only=False)
        qlat = batch[lat_col].to_numpy(zero_copy_only=False)
        qlon = batch[lon_col].to_numpy(zero_copy_only=False)
        ok = np.isfinite(qlat) & np.isfinite(qlon)
        out_q, out_r, out_rank, out_d = [], [], [], []
        if ok.any():
            sel = np.flatnonzero(ok)
            cells = qcell.latlng_to_cell(qlat[sel], qlon[sel], idx.res)
            # queries sharing a cell share the exact candidate set, so
            # work per UNIQUE cell with one (Q_cell x C) distance matrix
            # instead of a Python loop per query point
            uniq, inv = np.unique(cells, return_inverse=True)
            u_origin, u_nbr = qcell.grid_disk_multi(
                uniq, ring, adaptive_lon=True
            )
            lo, hi = idx.candidates(u_nbr)
            for ui in range(uniq.shape[0]):
                m = u_origin == ui
                cand: list[np.ndarray] = [
                    idx.order[lo[j] : hi[j]] for j in np.flatnonzero(m)
                ]
                cand_idx = np.concatenate(cand) if cand else np.empty(0, np.int64)
                if cand_idx.size == 0:
                    continue
                gq = sel[inv == ui]  # batch rows of queries in this cell
                d = haversine_km(
                    qlat[gq][:, None],
                    qlon[gq][:, None],
                    idx.lat[cand_idx][None, :],
                    idx.lon[cand_idx][None, :],
                )
                kk = min(k, cand_idx.size)
                top = np.argsort(d, axis=1, kind="stable")[:, :kk]
                rows = np.repeat(np.arange(gq.size), kk)
                out_q.append(np.repeat(qids[gq], kk))
                out_r.append(idx.ids[cand_idx[top.ravel()]])
                out_rank.append(np.tile(np.arange(1, kk + 1), gq.size))
                out_d.append(d[rows, top.ravel()])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "ref_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "distance_km": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "ref_id": pa.array(np.concatenate(out_r)),
                "rank": pa.array(np.concatenate(out_rank)),
                "distance_km": pa.array(np.concatenate(out_d)),
            }
        )

    return query_ds.map_batches(f, batch_format="pyarrow")
