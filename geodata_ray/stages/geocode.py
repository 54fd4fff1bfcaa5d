"""Geocoding: URL/text -> (lat, lon), gazetteer as a broadcast side.

The gazetteer is the small side (SURVEY.md J4 pattern): it is
``ray.put`` once on the driver and each actor resolves it in
``__init__`` — never re-shipped per batch.  Matching itself is
vectorized RE2 (``pyarrow.compute.extract_regex``) + an Arrow
``index_in`` dictionary lookup; no per-row Python.

Precedence per page (deterministic): explicit ``@lat,lon`` coordinate
tag in the text > first gazetteer-city mention in the text > city name
in the URL host > null (NaN lat/lon; cell encoders map it to the -1
sentinel and joins drop it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_COORD_RE = r"@(?P<lat>-?\d+\.\d+),(?P<lon>-?\d+\.\d+)"
_CITY_RE = r"(?P<name>geocity\d\d\d)"
_HOST_RE = r"^https?://(?P<name>geocity\d\d\d)\."


class Geocoder:
    """Actor-pool stage: ``map_batches(Geocoder, fn_constructor_kwargs=
    {"gazetteer_ref": ref}, concurrency=N)``.

    ``gazetteer_ref`` may be a ``ray.ObjectRef`` to (names, lats, lons)
    numpy arrays or the tuple itself (tests / local use).
    """

    def __init__(self, gazetteer_ref=None):
        if gazetteer_ref is None:
            from geodata_ray.sources.synth import gazetteer_arrays

            names, lats, lons, _ = gazetteer_arrays()
        else:
            obj = gazetteer_ref
            try:
                import ray

                if isinstance(obj, ray.ObjectRef):
                    obj = ray.get(obj)
            except Exception:
                pass
            names, lats, lons = obj[0], obj[1], obj[2]
        self.names = pa.array(np.asarray(names, dtype=object), type=pa.string())
        self.lats = np.asarray(lats, dtype=np.float64)
        self.lons = np.asarray(lons, dtype=np.float64)

    def _lookup(self, name_arr: pa.Array):
        """city-name array -> (lat, lon, matched) numpy arrays."""
        pos = pc.index_in(name_arr, value_set=self.names)
        posn = pos.to_numpy(zero_copy_only=False)
        matched = ~np.isnan(posn.astype(np.float64))
        idx = np.where(matched, posn, 0).astype(np.int64)
        lat = np.where(matched, self.lats[idx], np.nan)
        lon = np.where(matched, self.lons[idx], np.nan)
        return lat, lon

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        url = batch["url"]
        n = len(batch)

        coord = pc.extract_regex(text, _COORD_RE)
        clat = pc.cast(pc.struct_field(coord, "lat"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        clon = pc.cast(pc.struct_field(coord, "lon"), pa.float64()).to_numpy(
            zero_copy_only=False
        )

        mention = pc.struct_field(pc.extract_regex(text, _CITY_RE), "name")
        mlat, mlon = self._lookup(mention)

        host = pc.struct_field(pc.extract_regex(url, _HOST_RE), "name")
        hlat, hlon = self._lookup(host)

        lat = np.where(~np.isnan(clat), clat, np.where(~np.isnan(mlat), mlat, hlat))
        lon = np.where(~np.isnan(clon), clon, np.where(~np.isnan(mlon), mlon, hlon))
        return batch.append_column("lat", pa.array(lat)).append_column(
            "lon", pa.array(lon)
        )


def geocode(ds, gazetteer_ref=None, *, concurrency=(1, 8), batch_size: int = 8192):
    """Dataset-level stage: stateful actor pool (regex + gazetteer
    compiled/resolved once per actor, SURVEY.md §7.2).

    Use this form when the gazetteer is large (millions of entries —
    resolve the ``ray.put`` ref once per actor).  For small gazetteers
    prefer the fused stateless path in
    :func:`geodata_ray.pipelines.flagship.enrich_pages`, which avoids
    actor-pool startup and scales with all available CPUs.
    """
    return ds.map_batches(
        Geocoder,
        fn_constructor_kwargs={"gazetteer_ref": gazetteer_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
