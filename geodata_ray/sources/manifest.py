"""Multi-granularity source manifests: expected-vs-present reconciliation.

The reference enumerates every file a (years x months) range implies for
a source's ``file_granularity`` — ``daily`` / ``daily_multiple`` /
``monthly`` / ``monthly_multiple`` — then splits them into downloaded
vs to-download and flags the trove complete only when nothing is
missing (``/root/reference/src/geodata/dataset.py:121-274``).  The
engine analogue works on partition DIRECTORIES of parquet (this engine
never downloads — sources arrive as parquet partitions), so a resumed
ingest processes exactly the missing periods:

    cfg = get_source_config("merra2_surface_flux")
    man = reconcile_source("/data/merra2", cfg, years=[2023], months=[1, 2])
    man.missing      -> partition keys still to produce
    man.prepared     -> True when the trove is complete

``*_multiple`` granularities model sources that ship several files per
period (the reference's multi-collection MERRA2 configs): each period
expands to one key per ``file_key``.
"""

from __future__ import annotations

import os
from calendar import monthrange
from dataclasses import dataclass, field

from geodata_ray.sources.registry import SourceConfig


@dataclass
class SourceManifest:
    source: str
    expected: list[str]
    present: list[str]
    missing: list[str]

    @property
    def prepared(self) -> bool:
        return not self.missing

    def summary(self) -> dict:
        return {
            "source": self.source,
            "n_expected": len(self.expected),
            "n_present": len(self.present),
            "n_missing": len(self.missing),
            "prepared": self.prepared,
        }


def _period_keys(cfg: SourceConfig, years, months) -> list[str]:
    """Expand (years x months) into partition keys per the source's
    file granularity — the reference's mo_tuples loop."""
    gran = cfg.file_granularity
    base = gran.replace("_multiple", "")
    keys: list[str] = []
    for yr in years:
        for mo in months:
            if base == "daily":
                nodays = monthrange(yr, mo)[1]
                keys.extend(
                    f"{yr}-{mo:02d}-{d:02d}" for d in range(1, nodays + 1)
                )
            elif base == "monthly":
                keys.append(f"{yr}-{mo:02d}")
            else:
                raise ValueError(f"unknown file_granularity {gran!r}")
    if gran.endswith("_multiple"):
        fks = cfg.file_keys or ("main",)
        keys = [f"{k}.{fk}" for k in keys for fk in fks]
    return keys


def expected_partitions(cfg: SourceConfig, years, months) -> list[str]:
    return _period_keys(cfg, years, months)


def reconcile_source(
    root: str, cfg: SourceConfig, *, years, months
) -> SourceManifest:
    """Diff the expected partition set against what exists under
    ``root/part=<key>/`` (any parquet inside counts as present —
    partial dirs from a killed run are NOT present because the
    resumable writer commits atomically via rename)."""
    expected = _period_keys(cfg, years, months)
    present, missing = [], []
    for k in expected:
        pdir = os.path.join(root, f"part={k}")
        ok = os.path.isdir(pdir) and any(
            f.endswith(".parquet") for f in os.listdir(pdir)
        )
        (present if ok else missing).append(k)
    return SourceManifest(cfg.name, expected, present, missing)


def read_present(root: str, manifest: SourceManifest):
    """Dataset over the present partitions only (file-level pruning;
    shares the lineage module's part-dir reader)."""
    from geodata_ray.state.lineage import read_part_dirs

    return read_part_dirs(root, manifest.present)
