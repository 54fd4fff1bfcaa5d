"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) initialises or shuts down Ray.

- ``entry()``      — flagship pipeline on /root/testdata/sf0.001.
- ``queries()``    — one callable per implemented operator/pipeline
                     (SURVEY.md §2); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for
                     non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: documents -> pages -> extract -> geocode -> encode ->
    res-7 tile counts (returns a ray.data.Dataset)."""
    from geodata_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geodata_ray.pipelines.queries import RAY_QUERIES

    return dict(RAY_QUERIES)


def oracle_sql() -> dict[str, str]:
    from geodata_ray.pipelines.fixtures import ensure_fixture_parquet
    from geodata_ray.pipelines.queries import ORACLE_SQL

    # conversion/raster oracles read the persisted fixture parquet;
    # write it here too so the files exist even if the driver runs the
    # SQL before the Ray queries
    ensure_fixture_parquet()
    return dict(ORACLE_SQL)
