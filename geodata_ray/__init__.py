"""geodata_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of
GeodataTools/geodata (reference at /root/reference), re-expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines of zero-copy Arrow
``map_batches`` stages, actor pools for stateful work (polygon indexes,
raster grids, model params), ``groupby`` shuffles keyed on hierarchical
spatial cells with explicit skew handling, and per-partition lineage for
resumability.

Subpackages
-----------
cellmath   pure-numpy spatial indexes: quantized hierarchical cells
           (H3-like API, SQL-reproducible) and S2 cell-id tokens.
sources    deterministic synthetic fixture generators + IO helpers.
stages     per-batch / actor-pool Dataset stages (extract, geocode,
           encode, spatial join, kNN, dedup, text stats, resample...).
functions  vectorized numeric kernels (wind laws, PV chain, unit
           conversions) mirroring the reference's conversion library.
pipelines  end-to-end pipeline builders (flagship tiling pipeline).
state      lineage / checkpoint / resume manifests.
"""

__version__ = "0.1.0"
