"""Deterministic fixture tables persisted to parquet for oracle SQL.

The driver's correctness gate registers only the sf-dir tables as
DuckDB views, but the conversion/raster operator families run over the
engine's own deterministic fixtures (grid + raster layers — FIXTURES.md
F3/F5).  To make those queries SQL-auditable, the fixtures are written
ONCE to ``/tmp/geodata_fixtures/*.parquet`` and the oracle SQL reads
them with ``read_parquet(...)`` — both engines then consume the
byte-identical input file, and the SQL independently recomputes the
conversion math (which is what the oracle verifies).

``ensure_fixture_parquet`` is called from both the ``queries()``
entries and ``oracle_sql()`` so the files exist regardless of which
side the driver evaluates first.  Writes are atomic (tmp + rename) so
concurrent callers race benignly.
"""

from __future__ import annotations

import os

# BUMP when grid_table / raster_table generation changes: the version
# is part of the directory, so stale parquet from an older generator
# can never be silently reused by queries or oracle SQL (both build
# their paths from fixture_path()).
FIXTURE_VERSION = 2
FIXTURE_DIR = f"/tmp/geodata_fixtures/v{FIXTURE_VERSION}"


def _specs():
    from geodata_ray.sources.synth import grid_table, raster_table

    return {
        "grid_120": lambda: grid_table(hours=120),
        "grid_240": lambda: grid_table(hours=240),
        "raster_landcover": lambda: raster_table(layer="landcover"),
        "raster_slope": lambda: raster_table(layer="slope"),
        "raster_scatter": lambda: raster_table(layer="scatter"),
    }


def fixture_path(name: str) -> str:
    return f"{FIXTURE_DIR}/{name}.parquet"


def ensure_fixture_parquet(names=None) -> None:
    """Write any missing fixture parquet files (idempotent, atomic)."""
    import pyarrow.parquet as pq

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    specs = _specs()
    for name in names or specs:
        path = fixture_path(name)
        if os.path.exists(path):
            continue
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(specs[name](), tmp)
        os.replace(tmp, path)
