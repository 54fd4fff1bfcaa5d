"""Point-in-polygon spatial join (SURVEY.md J6/J7, M3 stage).

Reference semantics: ``Mask.extract_shapes`` keeps raster pixels inside
a polygon (``/root/reference/src/geodata/mask.py:607-705``) and
``add_shape_layer`` rasterizes polygons with include/exclude semantics
(``mask.py:503-605``).  Re-expressed Ray-Data-first:

- the polygon table is the SMALL side: indexed once on the driver
  (bboxes + covering-cell buckets at a coarse resolution — the
  STRtree-equivalent of SURVEY.md T7), ``ray.put`` once, pinned per
  actor in ``__init__``;
- the point side streams through an actor-pool ``map_batches``; each
  batch bucket-sorts its points by covering cell, prunes candidates by
  bucket + bbox, then runs an exact vectorized crossing-number test
  (numpy over ring segments);
- no shuffle at all: the big side never moves.  Output modes: ``inner``
  (emit one row per (point, containing polygon) — flat-map semantics),
  ``semi`` (keep points inside any polygon), ``anti`` (keep points
  outside all polygons; the reference's ``exclude=True``).

Anti-meridian-crossing polygons are handled by working in a shifted
longitude frame per polygon (ring lons normalized to [0, 360) and point
lons shifted likewise), mirroring the reference's lon-wrap logic
(``datasets/merra2.py:43-74``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geodata_ray.cellmath import qcell
from geodata_ray.cellmath.pip import pip_crossing as _pip_crossing
from geodata_ray.cellmath.pip import ring_crosses_am as _ring_crosses_am

DEFAULT_COVER_RES = 4


class PolygonIndex:
    """Driver-built spatial index over a polygon table.

    ``polygons``: pa.Table with poly_id, ring_x (list<f64> lons),
    ring_y (list<f64> lats), optional kind.
    """

    def __init__(self, polygons: pa.Table, cover_res: int = DEFAULT_COVER_RES):
        self.cover_res = cover_res
        self.poly_ids = polygons["poly_id"].to_pylist()
        self.rings: list[tuple[np.ndarray, np.ndarray, bool]] = []
        self.bboxes = np.empty((len(self.poly_ids), 4))  # latmin,latmax,lonmin,lonmax (frame lon)
        ring_x = polygons["ring_x"].to_pylist()
        ring_y = polygons["ring_y"].to_pylist()
        buckets: dict[int, list[int]] = {}
        for i, (xs, ys) in enumerate(zip(ring_x, ring_y)):
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            crosses = _ring_crosses_am(xs)
            fx = np.where(xs < 0, xs + 360.0, xs) if crosses else xs
            self.rings.append((fx, ys, crosses))
            self.bboxes[i] = (ys.min(), ys.max(), fx.min(), fx.max())
            # covering cells of the bbox at cover_res (in true lon frame)
            for cell in self._bbox_cells(ys.min(), ys.max(), fx.min(), fx.max(), crosses):
                buckets.setdefault(int(cell), []).append(i)
        self.buckets = {k: np.array(v, dtype=np.int64) for k, v in buckets.items()}

    def _bbox_cells(self, lat0, lat1, flon0, flon1, crosses):
        res = self.cover_res
        nlat = 1 << (res + 2)
        nlon = 1 << (res + 3)
        r0 = int(np.clip(np.floor((lat0 + 90.0) / 180.0 * nlat), 0, nlat - 1))
        r1 = int(np.clip(np.floor((lat1 + 90.0) / 180.0 * nlat), 0, nlat - 1))
        # frame lons may exceed 180 for AM-crossing polys; map cols mod nlon
        c0 = int(np.floor((flon0 + 180.0) / 360.0 * nlon))
        c1 = int(np.floor((flon1 + 180.0) / 360.0 * nlon))
        cells = []
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                cells.append(qcell.rowcol_to_cell(res, r, c % nlon))
        return cells

    def query(self, lat: np.ndarray, lon: np.ndarray):
        """Return (point_idx, poly_idx) match pairs for point arrays."""
        n = lat.shape[0]
        if n == 0:  # Ray delivers empty blocks after selective filters
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        ok = np.isfinite(lat) & np.isfinite(lon)
        cells = np.where(
            ok, qcell.latlng_to_cell(np.where(ok, lat, 0), np.where(ok, lon, 0), self.cover_res), -1
        )
        out_pts: list[np.ndarray] = []
        out_polys: list[np.ndarray] = []
        # bucket-sort points by covering cell; test each bucket's candidates
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_cells[1:] != sorted_cells[:-1]]
        )
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            cell = int(sorted_cells[s])
            if cell < 0:
                continue
            cand = self.buckets.get(cell)
            if cand is None:
                continue
            pts = order[s:e]
            plat = lat[pts]
            plon = lon[pts]
            for pi in cand:
                latmin, latmax, lonmin, lonmax = self.bboxes[pi]
                xs, ys, crosses = self.rings[pi]
                flon = np.where(plon < 0, plon + 360.0, plon) if crosses else plon
                near = (
                    (plat >= latmin)
                    & (plat <= latmax)
                    & (flon >= lonmin)
                    & (flon <= lonmax)
                )
                if not near.any():
                    continue
                inside = _pip_crossing(flon[near], plat[near], xs, ys)
                hits = pts[near][inside]
                if hits.size:
                    out_pts.append(hits)
                    out_polys.append(np.full(hits.size, pi, dtype=np.int64))
        if not out_pts:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(out_pts), np.concatenate(out_polys)


class SpatialJoiner:
    """Actor-pool stage: PIP join each batch against the pinned index.

    modes: inner (append poly_id; one output row per match), semi
    (keep matched points once), anti (keep unmatched points).
    """

    def __init__(self, index_ref, mode: str = "inner"):
        try:
            import ray

            if isinstance(index_ref, ray.ObjectRef):
                index_ref = ray.get(index_ref)
        except Exception:
            pass
        if isinstance(index_ref, PolygonIndex):
            self.index = index_ref
        else:
            self.index = PolygonIndex(index_ref)
        self.mode = mode
        self.poly_id_arr = np.asarray(self.index.poly_ids, dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        pts, polys = self.index.query(lat, lon)
        if self.mode == "inner":
            t = batch.take(pa.array(pts))
            return t.append_column(
                "poly_id", pa.array(self.poly_id_arr[polys], type=pa.string())
            )
        matched = np.zeros(len(batch), dtype=bool)
        matched[pts] = True
        if self.mode == "semi":
            return batch.filter(pa.array(matched))
        if self.mode == "anti":
            return batch.filter(pa.array(~matched))
        raise ValueError(f"unknown mode {self.mode}")


# worker-global cache: ObjectRef hex -> deserialized PolygonIndex.
# Ray Data actor pools are respawned per Dataset execution, so a
# stateless task + per-worker memo amortizes the broadcast exactly like
# an actor would, without paying pool startup on every run.
_INDEX_CACHE: dict[str, PolygonIndex] = {}


def _resolve_index(index_ref) -> PolygonIndex:
    if isinstance(index_ref, PolygonIndex):
        return index_ref
    key = index_ref.hex() if hasattr(index_ref, "hex") else str(id(index_ref))
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        import ray

        idx = ray.get(index_ref)
        _INDEX_CACHE.clear()
        _INDEX_CACHE[key] = idx
    return idx


def spatial_join(
    points_ds,
    polygons: pa.Table | PolygonIndex,
    *,
    mode: str = "inner",
    cover_res: int = DEFAULT_COVER_RES,
    use_actors: bool = False,
    concurrency=(1, 8),
    batch_size: int = 65536,
):
    """Join a streaming point Dataset against a broadcast polygon set.

    The polygon index is built once driver-side and broadcast via
    ``ray.put`` (two-phase broadcast plan; the big side never shuffles).
    Default execution is stateless tasks with a per-worker index memo
    (elastic, no pool startup); ``use_actors=True`` pins the index in a
    fixed actor pool instead (for very large indexes where per-worker
    deserialization must be strictly bounded).
    """
    index = (
        polygons
        if isinstance(polygons, PolygonIndex)
        else PolygonIndex(polygons, cover_res)
    )
    try:
        import ray

        index_ref = ray.put(index)
    except Exception:
        index_ref = index
    if use_actors:
        return points_ds.map_batches(
            SpatialJoiner,
            fn_constructor_kwargs={"index_ref": index_ref, "mode": mode},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def join_batch(batch: pa.Table) -> pa.Table:
        joiner = SpatialJoiner(_resolve_index(index_ref), mode=mode)
        return joiner(batch)

    return points_ds.map_batches(
        join_batch, batch_format="pyarrow", batch_size=batch_size
    )


def zonal_stats(
    points_ds,
    polygons,
    *,
    specs,
    by: str = "poly_id",
    mode: str = "inner",
    cover_res: int = DEFAULT_COVER_RES,
    coalesce: int = 8,
    **join_kwargs,
):
    """Zonal statistics: aggregate point attributes per containing
    polygon — the vector-side analogue of the reference's mask-based
    suitability aggregation (geodata masks AND a suitability raster
    per shape, then sums it; here arbitrary point measures aggregate
    per zone).  ``specs`` uses :func:`relational.grouped_aggregate`'s
    ``(col, fn, alias)`` form.

    Composition, not new machinery: the broadcast PIP join (big side
    streams, polygon index ships once) feeds a partial-then-merge
    grouped aggregate, so per-zone partials combine inside every map
    task and the final exchange carries only (zone x metric) rows —
    zone cardinality, not point cardinality, bounds the shuffle."""
    from geodata_ray.stages.relational import grouped_aggregate

    joined = spatial_join(
        points_ds, polygons, mode=mode, cover_res=cover_res, **join_kwargs
    )
    return grouped_aggregate(joined, [by], specs, coalesce=coalesce)
