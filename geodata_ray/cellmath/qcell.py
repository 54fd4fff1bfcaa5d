"""Quantized hierarchical cell scheme with an H3-like API.

This is the engine's tiling key (columns ``h3_r5``..``h3_r9`` on the
flagship pipeline).  It deliberately is NOT Uber H3 bit-for-bit — the
real library is unavailable both here and in the DuckDB oracle — but it
provides the same *capabilities* the reference's grid logic needs
(hierarchy, neighbors, areas, centroid; cf. the dense lat/lon grids of
``/root/reference/src/geodata/cutout.py:908-926`` and the coarsen /
reindex resampling at ``cutout.py:929-1001``), and its encoding is
reproducible in ANSI SQL so the correctness harness can verify tile
assignments independently (see :func:`cell_sql_expr`).

Layout of a cell id (fits in a signed 64-bit integer, max ``15<<58``):

    cell = (res << 58) | (row << 29) | col

where at resolution ``r``:

    nlat(r) = 2**(r+2)   rows    (latitude  bands, -90..90)
    nlon(r) = 2**(r+3)   cols    (longitude bands, -180..180)
    row = clamp(floor((lat +  90) / 180 * nlat), 0, nlat-1)
    col = clamp(floor((lon + 180) / 360 * nlon), 0, nlon-1)

Resolution 0 is an 8x4 grid (~45 deg cells); each step quarters the cell
(2x in each axis), so ``parent(cell) = (res-1, row>>1, col>>1)`` exactly
— hierarchy containment is pure bit math (``floor(floor(x*2^n)/2) ==
floor(x*2^(n-1))`` for x >= 0).  Resolution 7 cells are ~0.35 deg x
0.28 deg (~30 km), comparable to H3 res ~5-6 and to the reference's
MERRA-2 grid pitch (0.5 x 0.625 deg).

All functions are vectorized numpy over int64/float64 arrays and accept
scalars.
"""

from __future__ import annotations

import numpy as np

RES_SHIFT = 58
ROW_SHIFT = 29
ROW_MASK = (np.int64(1) << RES_SHIFT) - (np.int64(1) << ROW_SHIFT)
COL_MASK = (np.int64(1) << ROW_SHIFT) - 1
MAX_RES = 15

EARTH_RADIUS_KM = 6371.0088  # mean Earth radius (IUGG)


def _nlat(res):
    return np.int64(1) << (np.asarray(res, dtype=np.int64) + 2)


def _nlon(res):
    return np.int64(1) << (np.asarray(res, dtype=np.int64) + 3)


def latlng_to_cell(lat, lon, res: int):
    """Encode lat/lon (degrees) to a cell id at resolution ``res``.

    Vectorized; NaN coordinates map to cell id -1 (the engine's null
    cell sentinel, filtered by downstream joins).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    nlat = np.int64(1) << (res + 2)
    nlon = np.int64(1) << (res + 3)
    # float64 ops identical to the SQL expression in cell_sql_expr();
    # lon wraps cyclically so 180.0 and -180.0 land in the same column
    row = np.floor((lat + 90.0) / 180.0 * nlat)
    col = np.floor(np.mod(lon + 180.0, 360.0) / 360.0 * nlon)
    bad = ~(np.isfinite(row) & np.isfinite(col))
    row = np.clip(np.where(bad, 0, row), 0, float(nlat - 1)).astype(np.int64)
    col = np.clip(np.where(bad, 0, col), 0, float(nlon - 1)).astype(np.int64)
    cell = (np.int64(res) << RES_SHIFT) | (row << ROW_SHIFT) | col
    return np.where(bad, np.int64(-1), cell)


def cell_sql_expr(lat_expr: str, lon_expr: str, res: int) -> str:
    """ANSI-SQL expression computing the same cell id as
    :func:`latlng_to_cell` (DuckDB-compatible; used by ``oracle_sql``).
    """
    nlat = 1 << (res + 2)
    nlon = 1 << (res + 3)
    row = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {nlat}) "
        f"AS BIGINT), 0), {nlat - 1})"
    )
    col = (
        f"LEAST(GREATEST(CAST(FLOOR(((({lon_expr} + 180.0) % 360.0 + 360.0) "
        f"% 360.0) / 360.0 * {nlon}) AS BIGINT), 0), {nlon - 1})"
    )
    return f"(({res} * {1 << RES_SHIFT}) + ({row} * {1 << ROW_SHIFT}) + {col})"


def cell_resolution(cell):
    """Resolution encoded in a cell id."""
    return (np.asarray(cell, dtype=np.int64) >> RES_SHIFT).astype(np.int64)


def cell_to_rowcol(cell):
    """Return ``(res, row, col)`` arrays for cell ids."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> RES_SHIFT
    row = (cell & ROW_MASK) >> ROW_SHIFT
    col = cell & COL_MASK
    return res, row, col


def rowcol_to_cell(res, row, col):
    res = np.asarray(res, dtype=np.int64)
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    return (res << RES_SHIFT) | (row << ROW_SHIFT) | col


def cell_to_parent(cell, parent_res: int | None = None):
    """Parent cell at ``parent_res`` (default: one level up)."""
    res, row, col = cell_to_rowcol(cell)
    if parent_res is None:
        d = np.int64(1)
    else:
        d = res - np.int64(parent_res)
        if np.any(d < 0):
            raise ValueError("parent_res must be <= cell resolution")
    return rowcol_to_cell(res - d, row >> d, col >> d)


def cell_to_children(cell, child_res: int):
    """All children of a (scalar) cell at ``child_res`` (sorted)."""
    res, row, col = cell_to_rowcol(np.int64(cell))
    d = int(child_res) - int(res)
    if d < 0:
        raise ValueError("child_res must be >= cell resolution")
    n = 1 << d
    rows = (np.int64(row) << d) + np.arange(n, dtype=np.int64)
    cols = (np.int64(col) << d) + np.arange(n, dtype=np.int64)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    return np.sort(rowcol_to_cell(child_res, rr.ravel(), cc.ravel()))


def cell_to_latlng(cell):
    """Cell centroid ``(lat, lon)`` in degrees."""
    res, row, col = cell_to_rowcol(cell)
    nlat = _nlat(res).astype(np.float64)
    nlon = _nlon(res).astype(np.float64)
    lat = (row.astype(np.float64) + 0.5) / nlat * 180.0 - 90.0
    lon = (col.astype(np.float64) + 0.5) / nlon * 360.0 - 180.0
    return lat, lon


def cell_bounds(cell):
    """Cell bounding box ``(lat_min, lat_max, lon_min, lon_max)`` deg."""
    res, row, col = cell_to_rowcol(cell)
    nlat = _nlat(res).astype(np.float64)
    nlon = _nlon(res).astype(np.float64)
    lat0 = row.astype(np.float64) / nlat * 180.0 - 90.0
    lat1 = (row.astype(np.float64) + 1.0) / nlat * 180.0 - 90.0
    lon0 = col.astype(np.float64) / nlon * 360.0 - 180.0
    lon1 = (col.astype(np.float64) + 1.0) / nlon * 360.0 - 180.0
    return lat0, lat1, lon0, lon1


def grid_disk(cell, k: int = 1):
    """kRing: the set of cells within Chebyshev distance ``k`` on the
    (row, col) grid, with longitude wraparound and latitude clamping at
    the poles.  Scalar cell -> sorted unique 1-D array; array of cells
    -> (cells, offsets) is not provided — use :func:`grid_disk_multi`.
    """
    res, row, col = cell_to_rowcol(np.int64(cell))
    res_i, row_i, col_i = int(res), int(row), int(col)
    nlat = 1 << (res_i + 2)
    nlon = 1 << (res_i + 3)
    dr = np.arange(-k, k + 1, dtype=np.int64)
    dc = np.arange(-k, k + 1, dtype=np.int64)
    rr, cc = np.meshgrid(row_i + dr, col_i + dc, indexing="ij")
    keep = (rr >= 0) & (rr < nlat)
    rr = rr[keep]
    cc = np.mod(cc[keep], nlon)
    return np.unique(rowcol_to_cell(res_i, rr, cc))


def grid_disk_multi(cells, k: int = 1, *, adaptive_lon: bool = False):
    """Vectorized kRing for an array of same-resolution cells.

    Returns ``(origin_idx, neighbor_cell)`` flat arrays: for each input
    index i, all neighbor cells of ``cells[i]`` (with wrap/clamp).
    Used by the cell-local kNN expansion (SURVEY.md J10).

    ``adaptive_lon=True`` widens the COLUMN half-width per origin to
    ``ceil(k / cos(lat))`` (clamped to the full circle): lat-lon cells
    shrink in true width toward the poles, so a fixed Chebyshev ring
    under-covers there — a point at lat -85 can have nearer neighbors
    60 degrees of longitude away than a ring-5 disk reaches.  Near the
    poles the disk degenerates to whole row bands, which also covers
    across-the-pole neighbors.
    """
    cells = np.asarray(cells, dtype=np.int64)
    res, row, col = cell_to_rowcol(cells)
    if cells.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    r0 = int(res.flat[0])
    nlat = np.int64(1) << (r0 + 2)
    nlon = np.int64(1) << (r0 + 3)
    n = cells.shape[0]
    if adaptive_lon:
        cell_h = 180.0 / float(nlat)
        lat_c = -90.0 + (row.astype(np.float64) + 0.5) * cell_h
        need = np.ceil(
            k / np.maximum(np.cos(np.deg2rad(lat_c)), 1e-9)
        ).astype(np.int64)
        width = np.minimum(need, np.int64(nlon) // 2)
    else:
        width = np.full(n, k, dtype=np.int64)

    dr = np.arange(-k, k + 1, dtype=np.int64)
    out_origin, out_cell = [], []
    for w in np.unique(width):
        sel = np.nonzero(width == w)[0]
        dc = np.arange(-w, w + 1, dtype=np.int64)
        drr, dcc = np.meshgrid(dr, dc, indexing="ij")
        drr, dcc = drr.ravel(), dcc.ravel()
        rr = row[sel, None] + drr[None, :]
        cc = np.mod(col[sel, None] + dcc[None, :], nlon)
        keep = (rr >= 0) & (rr < nlat)
        origin = np.broadcast_to(sel[:, None], rr.shape)
        out_origin.append(origin[keep])
        out_cell.append(rowcol_to_cell(r0, rr[keep], cc[keep]))
    origin = np.concatenate(out_origin)
    cell = np.concatenate(out_cell)
    # dedupe (origin, cell): when 2w+1 >= nlon the column window wraps
    # onto itself and a neighbor cell would otherwise appear TWICE,
    # double-counting its reference points in kNN candidate lists.
    # Only possible for wrapping windows — skip the sort on the common
    # non-wrapping path (the hot per-batch kNN expansion).
    if origin.size and 2 * int(width.max()) + 1 >= nlon:
        order = np.lexsort((cell, origin))
        origin, cell = origin[order], cell[order]
        keep = np.ones(origin.size, dtype=bool)
        keep[1:] = (origin[1:] != origin[:-1]) | (cell[1:] != cell[:-1])
        origin, cell = origin[keep], cell[keep]
    return origin, cell


def cell_to_boundary(cell):
    """Cell boundary ring as (lats, lons) arrays (closed, CCW) — the
    h3 ``cell_to_boundary`` analogue (rectangular cells here)."""
    lat0, lat1, lon0, lon1 = cell_bounds(np.int64(cell))
    lats = np.array([lat0, lat0, lat1, lat1, lat0], dtype=np.float64)
    lons = np.array([lon0, lon1, lon1, lon0, lon0], dtype=np.float64)
    return lats, lons


def compact_cells(cells):
    """Replace every complete sibling quad with its parent, repeatedly —
    the h3 ``compact_cells`` analogue (minimal covering set with mixed
    resolutions; exact because children tile their parent)."""
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    if cells.size == 0:
        return cells
    out: list[np.ndarray] = []
    current = cells
    while current.size:
        res = cell_resolution(current)
        r = int(res.max())
        at_r = current[res == r]
        rest = current[res != r]
        if r == 0:
            out.append(at_r)
            current = rest
            continue
        parents = cell_to_parent(at_r)
        uniq, counts = np.unique(parents, return_counts=True)
        complete = uniq[counts == 4]
        if complete.size == 0:
            out.append(at_r)
            current = rest
            continue
        is_complete = np.isin(parents, complete)
        out.append(at_r[~is_complete])
        current = np.unique(np.concatenate([rest, complete]))
    return np.sort(np.concatenate(out)) if out else cells


def uncompact_cells(cells, res: int):
    """Expand a mixed-resolution set to uniform ``res`` children — the
    h3 ``uncompact_cells`` analogue."""
    cells = np.atleast_1d(np.asarray(cells, dtype=np.int64))
    parts = []
    for c in cells:
        cr = int(cell_resolution(c))
        if cr > res:
            raise ValueError(f"cell res {cr} finer than target {res}")
        parts.append(cell_to_children(c, res))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def cell_area_km2(cell):
    """Exact spherical area of a cell in km^2.

    A latitude band slice: ``A = R^2 * dlon_rad * (sin(lat1) - sin(lat0))``
    — the closed-form equal-area formula the reference approximates with
    per-latitude Albers polygons (``cutout.py:1004-1033``).
    """
    lat0, lat1, lon0, lon1 = cell_bounds(cell)
    dlon = np.deg2rad(lon1 - lon0)
    return (
        EARTH_RADIUS_KM**2
        * dlon
        * (np.sin(np.deg2rad(lat1)) - np.sin(np.deg2rad(lat0)))
    )


def morton_interleave2(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Z-order (Morton) key: interleave the low ``bits`` of two
    non-negative integer arrays — x in the even bit positions, y in the
    odd ones.  The space-filling-curve sort key that co-locates
    spatially-near rows in storage (the layout optimization behind
    clustered parquet writes).  Pure int64 bit math, SQL-replayable as
    SUM(((x // 2^i) % 2) * 4^i + ((y // 2^i) % 2) * 2 * 4^i)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    out = np.zeros_like(x)
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


_GEOHASH_ALPHABET = b"0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH_ALPHA_NP = np.frombuffer(_GEOHASH_ALPHABET, dtype=np.uint8)


def geohash_encode(lat: np.ndarray, lon: np.ndarray, precision: int = 8):
    """Standard geohash strings (base32, lon bit first) — the third
    tiling index family next to the quad cells and S2 tokens.  A
    precision-p geohash carries 5*p bits: lon gets ceil, lat floor.
    Vectorized: quantize, Morton-interleave (lat in even positions so
    the LON bit is most significant, per the geohash spec), then one
    table lookup per character.  Bit math only — SQL-replayable with
    the same // and % arithmetic as the Z-order oracle.

    Returns (codes int64 array, pyarrow string array)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    import pyarrow as pa
    import pyarrow.compute as pc

    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    qlon = np.floor(
        (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * (1 << lon_bits)
    ).astype(np.int64)
    qlat = np.floor(
        (np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * (1 << lat_bits)
    ).astype(np.int64)
    np.clip(qlon, 0, (1 << lon_bits) - 1, out=qlon)
    np.clip(qlat, 0, (1 << lat_bits) - 1, out=qlat)
    if lon_bits == lat_bits:
        # even total: from the LSB, lat sits at even positions, lon at
        # odd — the MSB is lon's top bit, per the geohash spec
        gh = morton_interleave2(qlat, qlon, lat_bits)
    else:
        # odd total: the sequence starts AND ends with lon, so from
        # the LSB lon sits at even positions (qlat's top loop bits are
        # zero — it has one bit fewer)
        gh = morton_interleave2(qlon, qlat, lon_bits)
    shifts = np.arange(precision - 1, -1, -1, dtype=np.int64) * 5
    codes = (gh[:, None] >> shifts[None, :]) & 31
    chars = _GEOHASH_ALPHA_NP[codes]
    arr = pa.Array.from_buffers(
        pa.binary(precision), len(gh), [None, pa.py_buffer(chars.tobytes())]
    )
    return gh, pc.cast(arr, pa.string())


def parent_sql_expr(cell_expr: str) -> str:
    """ANSI-SQL expression computing :func:`cell_to_parent` (one level
    up) for a cell-id expression — the oracle-side twin, sharing the
    bit layout constants with the numpy kernel."""
    res_div = 1 << RES_SHIFT
    row_div = 1 << ROW_SHIFT
    return (
        f"((({cell_expr}) // {res_div} - 1) * {res_div}"
        f" + ((({cell_expr}) % {res_div}) // {row_div} // 2) * {row_div}"
        f" + ((({cell_expr}) % {row_div}) // 2))"
    )
