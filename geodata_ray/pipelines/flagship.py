"""The flagship pipeline: pages -> extract -> geocode -> tile.

Ray-Data-first re-expression of the reference's whole prepare+convert
lifecycle (``/root/reference/src/geodata/preparation.py:73-202`` +
``cutout.py:509-564``, which run serial month loops): here every step
is a streaming ``map_batches`` stage and the only shuffle is the final
tile aggregation, pre-combined inside batches so hot (megacity) cells
never concentrate on one reducer.
"""

from __future__ import annotations

import pyarrow as pa

from geodata_ray.stages.encode import encode_cells
from geodata_ray.stages.extract import drop_html, extract_text
from geodata_ray.stages.geocode import geocode


def pages_from_documents(sf_dir: str, *, seed: int = 42):
    """Driver ``documents`` table -> mandated pages schema (url,
    warc_ts, html, text, lang), deterministically."""
    import ray.data as rd

    from geodata_ray.sources.synth import pages_from_documents_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return ds.map_batches(
        lambda b: pages_from_documents_batch(b, seed),
        batch_format="pyarrow",
    )


def enrich_pages(pages_ds, gazetteer_ref=None, *, geocode_concurrency=(1, 8)):
    """pages -> + extracted_text, lat, lon, h3_r5..r9, s2_token.

    The wide ``html`` binary is dropped right after extraction — before
    any shuffle (SURVEY.md §7.4).
    """
    ds = extract_text(pages_ds)
    ds = drop_html(ds)
    ds = geocode(ds, gazetteer_ref, concurrency=geocode_concurrency)
    ds = encode_cells(ds)
    return ds


def tile_counts(enriched_ds, *, res: int = 7):
    """Tile aggregation: rows per cell at resolution ``res``.

    Two-phase: partial counts inside each batch (`pyarrow` group_by —
    collapses megacity skew locally, the combiner the reference never
    needed on its uniform grids, SURVEY.md §4 skew row), then a small
    global ``groupby().sum()`` shuffle over at most
    (#batches x #distinct cells) partial rows.
    """
    key = f"h3_r{res}"

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        return t.rename_columns([key, "n_points"])

    from ray.data.aggregate import Sum

    partials = enriched_ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(key).aggregate(Sum("n_points", alias_name="n_points"))
    # drop the null-geocode sentinel cell
    return out.filter(expr=f"{key} >= 0")


def flagship(sf_dir: str, *, seed: int = 42, res: int = 7):
    """documents -> pages -> enrich -> tile counts (a Dataset)."""
    pages = pages_from_documents(sf_dir, seed=seed)
    enriched = enrich_pages(pages)
    return tile_counts(enriched, res=res)
