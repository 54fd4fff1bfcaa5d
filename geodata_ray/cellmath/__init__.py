"""Pure-numpy spatial cell indexes (no h3/s2/shapely libraries needed).

Two schemes:

- :mod:`geodata_ray.cellmath.qcell` — a quantized hierarchical lat/lon
  cell scheme exposing an H3-like API (``latlng_to_cell``,
  ``cell_to_parent``, ``grid_disk``, ``cell_area_km2``).  The cell id is
  integer-arithmetic-reproducible in ANSI SQL (see ``cell_sql_expr``),
  which is what the DuckDB correctness oracle checks.
- :mod:`geodata_ray.cellmath.s2` — an implementation of the public
  S2 cell-id spec (unit sphere -> cube face -> quadratic (s,t) ->
  Hilbert curve position -> 64-bit id / hex token).
"""

from geodata_ray.cellmath import qcell, s2  # noqa: F401
from geodata_ray.cellmath.qcell import (  # noqa: F401
    cell_area_km2,
    cell_resolution,
    cell_sql_expr,
    cell_to_boundary,
    cell_to_children,
    cell_to_latlng,
    cell_to_parent,
    cell_to_rowcol,
    compact_cells,
    grid_disk,
    latlng_to_cell,
    rowcol_to_cell,
    uncompact_cells,
)
from geodata_ray.cellmath.s2 import (  # noqa: F401
    s2_cell_to_latlng,
    s2_token_to_cell,
    s2_cell_to_token,
    latlng_to_s2_cell,
    latlng_to_s2_token,
)

from geodata_ray.cellmath import pip, proj  # noqa: E402,F401
