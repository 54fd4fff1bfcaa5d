"""Named mask persistence: save / load / attach round-trip.

Arrow re-expression of the reference's mask workflow
(``/root/reference/src/geodata/mask.py:786-933`` ``save_mask`` /
``Mask.from_name`` and ``cutout.py:363-392`` ``add_mask``): a *named*
mask is a directory holding its raw layers, the merged raster, and
optional per-shape extracted rasters, plus a JSON manifest — so a
suitability study can build a mask once, reload it by name in any later
session, and attach it to converted data.

Layout (mirrors the reference's ``mask_dir/<name>/`` tree)::

    <root>/<name>/
        manifest.json            # layer names, row counts, saved_at
        layers/<layer>/*.parquet # raw layer cell tables
        merged/*.parquet         # merged raster (if saved)
        shape_mask/<shape>/*.parquet

Datasets are written with ``Dataset.write_parquet`` (multi-file, so a
continental mask streams out of the object store instead of
materializing); loads are plain ``read_parquet`` — partition-prunable
by layer/shape name.
"""

from __future__ import annotations

import json
import os
import shutil
import time

DEFAULT_ROOT = "/tmp/geodata_masks"


def _mask_dir(name: str, root: str | None) -> str:
    return os.path.join(root or DEFAULT_ROOT, name)


def _write_ds(ds, path: str) -> int:
    """Write a Dataset (or Arrow table) to a parquet dir; returns rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if isinstance(ds, pa.Table):
        pq.write_table(ds, os.path.join(path, "data.parquet"))
        return ds.num_rows
    ds.write_parquet(path)
    import ray.data as rd

    return rd.read_parquet(path).count()


def save_mask(
    name: str,
    *,
    layers: dict | None = None,
    merged=None,
    shape_masks: dict | None = None,
    root: str | None = None,
) -> dict:
    """Persist a named mask (reference ``Mask.save_mask``); returns the
    manifest.  Overwrites any prior mask of the same name atomically
    (tmp dir + rename, the reference's temp+move idiom)."""
    final = _mask_dir(name, root)
    tmp = f"{final}.tmp-{os.getpid()}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    manifest: dict = {
        "name": name,
        "layers": {},
        "shape_masks": {},
        "has_merged": merged is not None,
        "saved_at": time.time(),
    }
    for lname, lds in (layers or {}).items():
        rows = _write_ds(lds, os.path.join(tmp, "layers", lname))
        manifest["layers"][lname] = {"rows": rows}
    if merged is not None:
        manifest["merged_rows"] = _write_ds(merged, os.path.join(tmp, "merged"))
    for sname, sds in (shape_masks or {}).items():
        rows = _write_ds(sds, os.path.join(tmp, "shape_mask", sname))
        manifest["shape_masks"][sname] = {"rows": rows}
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.isdir(final):
        shutil.rmtree(final)
    try:
        os.rename(tmp, final)
    except OSError as e:
        import errno as _errno

        # only the concurrent-recreate race is retryable (another saver
        # re-created `final` between rmtree and rename); any other
        # failure (ENOENT on tmp, EXDEV, EACCES) must NOT delete a
        # complete mask it cannot replace
        if e.errno not in (_errno.ENOTEMPTY, _errno.EEXIST, _errno.ENOTDIR):
            raise
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
    return manifest


class MaskHandle:
    """Reloaded named mask (reference ``Mask.from_name``)."""

    def __init__(self, name: str, root: str | None = None):
        self.dir = _mask_dir(name, root)
        with open(os.path.join(self.dir, "manifest.json")) as f:
            self.manifest = json.load(f)

    @property
    def layer_names(self) -> list[str]:
        return sorted(self.manifest["layers"])

    def layer(self, lname: str):
        import ray.data as rd

        return rd.read_parquet(os.path.join(self.dir, "layers", lname))

    def merged(self):
        import ray.data as rd

        if not self.manifest.get("has_merged"):
            raise FileNotFoundError(f"mask {self.manifest['name']}: no merged")
        return rd.read_parquet(os.path.join(self.dir, "merged"))

    def shape_mask(self, sname: str):
        import ray.data as rd

        return rd.read_parquet(os.path.join(self.dir, "shape_mask", sname))


def load_mask(name: str, root: str | None = None) -> MaskHandle:
    return MaskHandle(name, root)


def attach_named_mask(data_ds, name: str, *, res: int, root: str | None = None,
                      agg: str = "mean"):
    """The reference's ``cutout.add_mask`` analogue: reload the named
    mask's merged raster, resample it to hierarchical cells at ``res``,
    and broadcast-attach (cell, mask_value, cell area) to the data
    table."""
    import pyarrow as pa

    from geodata_ray.stages.raster import attach_mask, resample_to_cells

    handle = load_mask(name, root)
    cells = resample_to_cells(handle.merged(), res=res, agg=agg)

    def rename(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("value")
        return batch.set_column(i, "mask_value", batch["value"])

    # the resampled mask is bounded by cell cardinality at `res` (tiny
    # vs the data side) — safe to collect and broadcast
    mask_df = cells.map_batches(rename, batch_format="pyarrow").to_pandas()
    mask_pa = pa.Table.from_pandas(mask_df, preserve_index=False)
    return attach_mask(data_ds, mask_pa, res=res)
