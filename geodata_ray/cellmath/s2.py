"""S2 cell ids / tokens from the public S2 geometry spec, in numpy.

Implements the published encoding (s2geometry.io, "S2 Cell Hierarchy"):
unit-sphere point -> cube face (6 faces) -> (u, v) face coordinates ->
quadratic (s, t) transform -> leaf (i, j) at 2^30 resolution -> Hilbert
curve position -> 64-bit cell id ``(face << 61) | (pos << 1) | 1`` at
level 30, truncated to any level by keeping the leading ``2*level`` pos
bits and setting the trailing sentinel bit.  Tokens are the id as
16-digit hex with trailing zeros stripped.

The reference engine (GeodataTools/geodata) has no spatial index at all
— its grids are dense lat/lon rasters (``cutout.py:908-926``) — so S2
tokens here serve the new engine's covering/tiling role mandated by the
north rule.  Checked by roundtrip + hierarchy property tests
(tests/test_s2.py); no external oracle library exists in this sandbox.

All hot paths are vectorized numpy over uint64; the Hilbert transform
iterates 15 constant-size steps (4 bits/step) over the whole array.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02

# Canonical S2 traversal tables (public spec / s2geometry s2coords.h):
# for each orientation, the order in which the Hilbert curve visits the
# four quadrants, as ij = 2*i + j, and the orientation adjustment.
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.uint64,
)
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _SWAP_MASK | _INVERT_MASK], dtype=np.uint64
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.uint64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _build_lookup():
    """Build the 4-bit lookup tables used by the iterative transform
    (same construction as the public s2geometry InitLookupCell)."""
    n = 1 << (2 * _LOOKUP_BITS + 2)  # (ij composite, orientation) states
    lookup_pos = np.zeros(n, dtype=np.uint64)
    lookup_ij = np.zeros(n, dtype=np.uint64)

    def init_cell(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for idx in range(4):
            ij = int(r[idx])
            init_cell(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orientation,
                pos + idx,
                orientation ^ int(_POS_TO_ORIENTATION[idx]),
            )

    for orientation in range(4):
        init_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def _latlng_to_xyz(lat, lon):
    lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    # face-major axis u/v selection (s2 XYZtoFaceUV)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y, lambda: z, lambda: x),  # face 0: +x  u=y/x  v=z/x
            (lambda: -x, lambda: z, lambda: y),  # face 1: +y  u=-x/y v=z/y
            (lambda: -x, lambda: -y, lambda: z),  # face 2: +z u=-x/z v=-y/z
            (lambda: z, lambda: y, lambda: x),  # face 3: -x  u=z/x  v=y/x
            (lambda: z, lambda: -x, lambda: y),  # face 4: -y  u=z/y  v=-x/y
            (lambda: -y, lambda: -x, lambda: z),  # face 5: -z u=-y/z v=-x/z
        ]
    ):
        m = face == f
        if np.any(m):
            d = de()
            d = np.where(m, d, 1.0)  # avoid div-by-zero off-face
            u = np.where(m, ue() / d, u)
            v = np.where(m, ve() / d, v)
    return face, u, v


def _uv_to_st(u):
    """Quadratic projection (s2 UVtoST).  Both np.where branches are
    evaluated for every lane, so clamp each sqrt argument to >= 0."""
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _st_to_uv(s):
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s):
    return np.clip(
        np.floor(s * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1
    ).astype(np.uint64)


def latlng_to_s2_cell(lat, lon, level: int = MAX_LEVEL):
    """Encode lat/lon (deg) to S2 cell ids (uint64) at ``level``."""
    x, y, z = _latlng_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return _face_ij_to_cell(face.astype(np.uint64), i, j, level)


def _face_ij_to_cell(face, i, j, level: int):
    n = np.zeros_like(face, dtype=np.uint64)  # hilbert pos (60 bits)
    bits = face & np.uint64(_SWAP_MASK)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _LOOKUP_BITS)
        ib = (i >> shift) & mask
        jb = (j >> shift) & mask
        bits += (ib << np.uint64(_LOOKUP_BITS + 2)) + (jb << np.uint64(2))
        bits = _LOOKUP_POS[bits]
        n = (n << np.uint64(2 * _LOOKUP_BITS)) | (bits >> np.uint64(2))
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    # leaf id: 3 face bits, 60 pos bits (we built 64 -> keep low 60), lsb 1
    cell = (face << np.uint64(61)) + (
        (n & np.uint64((1 << 60) - 1)) << np.uint64(1)
    ) + np.uint64(1)
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        cell = (cell & ~(lsb - np.uint64(1))) | lsb
    return cell


def s2_cell_level(cell):
    """Level of each cell id (position of lowest set bit)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    # log2 of lsb via float (exact for powers of two < 2^63)
    k = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - (k >> 1)


def s2_cell_parent(cell, level: int):
    """Ancestor of each cell id at ``level``."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cell & ~(lsb - np.uint64(1))) | lsb


def _cell_to_face_ij(cell):
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(61)).astype(np.uint64)
    pos = (cell & np.uint64((1 << 61) - 1)) >> np.uint64(1)
    i = np.zeros_like(cell, dtype=np.uint64)
    j = np.zeros_like(cell, dtype=np.uint64)
    bits = face & np.uint64(_SWAP_MASK)
    for k in range(7, -1, -1):
        chunk = (pos >> np.uint64(k * 2 * _LOOKUP_BITS)) & np.uint64(
            (1 << (2 * _LOOKUP_BITS)) - 1
        )
        bits += chunk << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i = (i << np.uint64(_LOOKUP_BITS)) | (
            (bits >> np.uint64(_LOOKUP_BITS + 2)) & np.uint64((1 << _LOOKUP_BITS) - 1)
        )
        j = (j << np.uint64(_LOOKUP_BITS)) | (
            (bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)
        )
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    # accumulated chunks align exactly to the 30-bit leaf ij (the k=7
    # chunk's top 2 bits are provably zero for valid ids)
    return face, i, j


def s2_cell_to_latlng(cell):
    """Centroid lat/lon (deg) of cell ids (center of the leaf cell the
    id's center token points at — exact for leaf ids)."""
    face, i, j = _cell_to_face_ij(cell)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    # inverse of the face selection in _xyz_to_face_uv (s2 FaceUVtoXYZ)
    for f, fn in enumerate(
        [
            lambda u, v: (np.ones_like(u), u, v),
            lambda u, v: (-u, np.ones_like(u), v),
            lambda u, v: (-u, -v, np.ones_like(u)),
            lambda u, v: (-np.ones_like(u), -v, -u),
            lambda u, v: (v, -np.ones_like(u), -u),
            lambda u, v: (v, u, -np.ones_like(u)),
        ]
    ):
        m = face == f
        if np.any(m):
            xf, yf, zf = fn(u, v)
            x = np.where(m, xf, x)
            y = np.where(m, yf, y)
            z = np.where(m, zf, z)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.rad2deg(np.arcsin(z / norm))
    lon = np.rad2deg(np.arctan2(y, x))
    return lat, lon


def s2_cell_to_token(cell):
    """Hex tokens (trailing zeros stripped) for an array of cell ids."""
    cell = np.asarray(cell, dtype=np.uint64)
    flat = cell.ravel()
    out = np.empty(flat.shape[0], dtype=object)
    for idx in range(flat.shape[0]):
        v = int(flat[idx])
        out[idx] = format(v, "016x").rstrip("0") or "X"
    return out.reshape(cell.shape)


def s2_token_to_cell(tokens):
    """Inverse of :func:`s2_cell_to_token`."""
    toks = np.asarray(tokens, dtype=object).ravel()
    out = np.empty(toks.shape[0], dtype=np.uint64)
    for idx in range(toks.shape[0]):
        t = toks[idx]
        out[idx] = 0 if t == "X" else int(t.ljust(16, "0"), 16)
    return out.reshape(np.asarray(tokens, dtype=object).shape)


def latlng_to_s2_token(lat, lon, level: int = MAX_LEVEL):
    return s2_cell_to_token(latlng_to_s2_cell(lat, lon, level))
