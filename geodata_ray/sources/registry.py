"""Source-config registry: declarative per-source preparation.

The reference wires new weather sources through ``weather_data_config``
dict entries (api_func / prepare_func / variables; merra2.py:385-574,
era5.py:496-588 U5).  The engine's equivalent: a registry entry names
the normalizer kernel, the canonical variable set it guarantees, and
the partition template — adding a source is one entry + one batch
kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass(frozen=True)
class SourceConfig:
    name: str
    prepare_fn: Callable  # Dataset -> Dataset normalizer
    variables: tuple[str, ...]  # canonical columns guaranteed present
    # daily | daily_multiple | monthly | monthly_multiple — drives the
    # expected-partition enumeration (sources/manifest.py; reference
    # dataset.py:121-274)
    file_granularity: str = "monthly"
    partition_template: str = "part={year}-{month:02d}"
    # for *_multiple granularities: one file per period per key (the
    # reference's multi-collection sources)
    file_keys: tuple[str, ...] = ()


def _era5():
    from geodata_ray.stages.normalize import normalize_era5

    return SourceConfig(
        name="era5_hourly",
        prepare_fn=normalize_era5,
        variables=(
            "height", "albedo", "influx_direct", "influx_diffuse",
            "influx_toa", "wnd100m", "runoff", "temperature", "pressure",
            "soil_temperature", "roughness",
        ),
    )


def _merra2_flux():
    from geodata_ray.stages.normalize import normalize_merra2_flux

    return SourceConfig(
        name="merra2_surface_flux",
        prepare_fn=normalize_merra2_flux,
        variables=("roughness", "temperature", "tlml", "wndlml"),
        file_granularity="daily",
        partition_template="part={year}-{month:02d}-{day:02d}",
    )


_REGISTRY: dict[str, Callable[[], SourceConfig]] = {
    "era5_hourly": _era5,
    "merra2_surface_flux": _merra2_flux,
}


def get_source_config(name: str) -> SourceConfig:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"unknown source {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def register_source(name: str, factory: Callable[[], SourceConfig]) -> None:
    """Extension hook: third-party sources drop in one factory."""
    _REGISTRY[name] = factory


def prepare_source(ds, name: str):
    """Normalize a raw source table to its canonical schema and verify
    the declared variables arrived (the role of ``trim_variables``'s
    schema assertion, dataset.py:377-393)."""
    cfg = get_source_config(name)
    out = cfg.prepare_fn(ds)
    schema_names = set(out.schema().names)
    missing = [v for v in cfg.variables if v not in schema_names]
    if missing:
        raise ValueError(f"source {name}: missing canonical columns {missing}")
    return out
