"""Cell encoding: (lat, lon) -> hierarchical tile keys + S2 tokens.

Stateless vectorized ``map_batches`` stage — pure integer/float math
over numpy views of the Arrow batch (zero copies of the coordinate
buffers).  Adds ``h3_r5 .. h3_r9`` (int64; -1 for null geocode) and
``s2_token`` (string covering token at a configurable level).

The multi-resolution column set mirrors how the reference keeps every
spatial granularity addressable at once (its dense grids + the coarsen
hierarchy, ``/root/reference/src/geodata/cutout.py:929-1001``) and the
BASELINE.json ``input_hint`` layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geodata_ray.cellmath import qcell, s2

DEFAULT_RESOLUTIONS = (5, 6, 7, 8, 9)
DEFAULT_S2_LEVEL = 12


def encode_cells_batch(
    batch: pa.Table,
    *,
    resolutions=DEFAULT_RESOLUTIONS,
    s2_level: int = DEFAULT_S2_LEVEL,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    for res in resolutions:
        batch = batch.append_column(
            f"h3_r{res}", pa.array(qcell.latlng_to_cell(lat, lon, res))
        )
    ok = np.isfinite(lat) & np.isfinite(lon)
    tokens = np.full(len(batch), None, dtype=object)
    if ok.any():
        tokens[ok] = s2.latlng_to_s2_token(lat[ok], lon[ok], s2_level)
    batch = batch.append_column("s2_token", pa.array(tokens, type=pa.string()))
    return batch


def encode_cells(ds, *, batch_size: int = 65536, **kwargs):
    import functools

    fn = functools.partial(encode_cells_batch, **kwargs)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
