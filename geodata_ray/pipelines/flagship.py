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


def _enrich_batch(batch: pa.Table) -> pa.Table:
    """Fused extract -> drop html -> geocode -> encode, one pass over
    the batch.  All kernels are RE2 / numpy (~4us/row total), so one
    stateless operator beats four chained stages: no intermediate
    blocks, no actor-pool startup, elastic across every CPU."""
    from geodata_ray.stages.encode import encode_cells_batch
    from geodata_ray.stages.extract import extract_text_batch
    from geodata_ray.stages.geocode import Geocoder

    global _GEOCODER
    try:
        g = _GEOCODER
    except NameError:
        g = _GEOCODER = Geocoder()  # built once per worker process
    batch = extract_text_batch(batch)
    batch = batch.drop_columns(["html"])
    batch = g(batch)
    return encode_cells_batch(batch)


def enrich_pages(
    pages_ds,
    gazetteer_ref=None,
    *,
    geocode_concurrency=(1, 8),
    fused: bool = True,
    batch_size: int = 8192,
):
    """pages -> + extracted_text, lat, lon, h3_r5..r9, s2_token.

    The wide ``html`` binary is dropped right after extraction — before
    any shuffle (SURVEY.md §7.4).  ``fused=True`` (default) runs one
    stateless map_batches; ``fused=False`` runs the staged form with an
    actor-pool geocoder (for large broadcast gazetteers).
    """
    if fused and gazetteer_ref is None:
        return pages_ds.map_batches(
            _enrich_batch, batch_format="pyarrow", batch_size=batch_size
        )
    ds = extract_text(pages_ds)
    ds = drop_html(ds)
    ds = geocode(ds, gazetteer_ref, concurrency=geocode_concurrency)
    ds = encode_cells(ds)
    return ds


def tile_counts(enriched_ds, *, res: int = 7, final: str = "single"):
    """Tile aggregation: rows per cell at resolution ``res``.

    Two-phase: partial counts inside each batch (`pyarrow` group_by —
    collapses megacity skew locally, the combiner the reference never
    needed on its uniform grids, SURVEY.md §4 skew row), then a final
    merge of the partials.

    ``final="single"`` (default): coalesce partials into one block and
    merge locally.  The key cardinality at res<=8 is bounded (<= 2^19
    cells => a few MB of partials regardless of input size — even at
    10^12 rows), so one reducer is the scalable plan and avoids a
    second all-to-all barrier.  ``final="shuffle"``: hash-shuffle
    groupby, for res>=9 multi-node cases where partials outgrow one
    block.
    """
    key = f"h3_r{res}"

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        return t.rename_columns([key, "n_points"])

    partials = enriched_ds.map_batches(partial, batch_format="pyarrow")
    if final == "single":

        def merge(batch: pa.Table) -> pa.Table:
            t = batch.group_by(key).aggregate([("n_points", "sum")])
            t = t.rename_columns([key, "n_points"])
            import pyarrow.compute as pc

            return t.filter(pc.greater_equal(t[key], 0))

        return partials.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None
        )

    from ray.data.aggregate import Sum

    partials = partials.repartition(8)  # tiny blocks -> cheap final shuffle
    out = partials.groupby(key).aggregate(Sum("n_points", alias_name="n_points"))
    return out.filter(expr=f"{key} >= 0")


def flagship(sf_dir: str, *, seed: int = 42, res: int = 7):
    """documents -> pages -> enrich -> tile counts (a Dataset)."""
    pages = pages_from_documents(sf_dir, seed=seed)
    enriched = enrich_pages(pages)
    return tile_counts(enriched, res=res)
