"""Deterministic synthetic fixtures (FIXTURES.md F1-F5).

Every value is a pure function of ``(seed, row index)`` via a
splitmix64-style integer hash, so generation is byte-identical at any
parallelism and any batch split — the invariant the driver's
"byte-identical extracted text per url" check rests on.  The reference
has no offline fixtures at all (its tests download live data,
``/root/reference/tests/pr/test_era5.py:112-147``); these tables play
the role its netCDF downloads play.

Generators come in two forms:
- ``*_table(n, seed)`` -> ``pyarrow.Table`` (driver-side, tests).
- ``pages_dataset(n, seed)`` -> ``ray.data.Dataset`` built from
  ``ray.data.range`` + ``map_batches`` so bench-scale corpora are
  generated in parallel without ever materializing on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

GAZETTEER_SIZE = 500
_LANGS = np.array(["en", "zh", "es", "de", "fr", "ja", "pt", "ru"])
# zipf-ish language weights
_LANG_CUM = np.cumsum((1.0 / np.arange(1, len(_LANGS) + 1))) / np.sum(
    1.0 / np.arange(1, len(_LANGS) + 1)
)
_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")

# the engine's Knuth multiplicative sampling/geocode hash constants —
# the SINGLE definition; plan code (stages/) and oracle SQL
# (pipelines/) both import these, so a retune cannot silently diverge
GEO_A = 2654435761
GEO_B = 1640531527
GEO_M = 4294967296


def splitmix64(x) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _h(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    """Independent hash stream ``stream`` for rows ``idx``."""
    return splitmix64(
        np.asarray(idx, dtype=np.uint64)
        ^ splitmix64(np.uint64(seed) + np.uint64(stream) * np.uint64(0x9E37))
    )


def _u01(h: np.ndarray) -> np.ndarray:
    """Map uint64 hash to uniform [0, 1) float64."""
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# F2: gazetteer (broadcast small side)
# ---------------------------------------------------------------------------


def gazetteer_table(n: int = GAZETTEER_SIZE, seed: int = 42) -> pa.Table:
    """City gazetteer: ``name, lat, lon, population``.

    Population follows a zipf law over the city index, which induces the
    megacity skew the flagship join must handle (hot H3 cells).
    Includes lats near the poles and lons straddling the anti-meridian
    (the reference's wrap logic: ``datasets/merra2.py:43-74``).
    """
    idx = np.arange(n, dtype=np.uint64)
    lat = _u01(_h(seed, idx, 1)) * 166.0 - 83.0  # [-83, 83]
    lon = _u01(_h(seed, idx, 2)) * 360.0 - 180.0  # [-180, 180)
    # force a handful of anti-meridian cities
    am = idx % np.uint64(97) == np.uint64(0)
    lon = np.where(am, np.where(idx % np.uint64(2) == 0, 179.5, -179.5), lon)
    pop = (1e7 / (idx.astype(np.float64) + 1.0)).astype(np.int64) + 1000
    names = np.array([f"geocity{i:03d}" for i in range(n)])
    return pa.table(
        {
            "name": names,
            "lat": np.round(lat, 4),
            "lon": np.round(lon, 4),
            "population": pop,
        }
    )


def gazetteer_arrays(n: int = GAZETTEER_SIZE, seed: int = 42):
    """(names, lats, lons, cum_weights) numpy views for broadcast use."""
    t = gazetteer_table(n, seed)
    pop = t["population"].to_numpy().astype(np.float64)
    cum = np.cumsum(pop) / pop.sum()
    return (
        t["name"].to_numpy(zero_copy_only=False),
        t["lat"].to_numpy(),
        t["lon"].to_numpy(),
        cum,
    )


# ---------------------------------------------------------------------------
# F1: pages (Common-Crawl-style web-page table; BASELINE.json input_hint)
# ---------------------------------------------------------------------------


def _escape(s: pd.Series) -> pd.Series:
    return (
        s.str.replace("&", "&amp;", regex=False)
        .str.replace("<", "&lt;", regex=False)
        .str.replace(">", "&gt;", regex=False)
    )


def pages_batch(idx: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate page rows for absolute indices ``idx`` — a pure function
    of (seed, index): columns url, warc_ts, html, text, lang.

    Geo structure baked into the text (consumed by the geocoder):
    - ~76%: a ``geocityNNN`` mention (zipf-weighted -> hot cells);
    - ~19% of those also carry an explicit ``@lat,lon`` coordinate tag
      (jittered around the city) which takes precedence;
    - ~5%: no geo signal at all -> geocode null.
    """
    idx = np.asarray(idx, dtype=np.uint64)
    names, glat, glon, cum = gazetteer_arrays(seed=seed)

    city = np.searchsorted(cum, _u01(_h(seed, idx, 10)), side="right")
    city = np.minimum(city, len(names) - 1)
    no_geo = _h(seed, idx, 11) % np.uint64(20) == np.uint64(0)
    has_coords = (_h(seed, idx, 12) % np.uint64(5) == np.uint64(0)) & ~no_geo
    amp = _h(seed, idx, 13) % np.uint64(7) == np.uint64(0)
    lang = _LANGS[
        np.minimum(
            np.searchsorted(_LANG_CUM, _u01(_h(seed, idx, 14)), side="right"),
            len(_LANGS) - 1,
        )
    ]
    ts = _EPOCH_2024 + (
        _h(seed, idx, 15) % np.uint64(2 * 365 * 24 * 3600)
    ).astype("timedelta64[s]").astype("timedelta64[us]")

    jlat = np.round(glat[city] + (_u01(_h(seed, idx, 16)) - 0.5) * 0.4, 4)
    jlon = np.round(glon[city] + (_u01(_h(seed, idx, 17)) - 0.5) * 0.4, 4)

    sidx = pd.Series(idx.astype(np.int64)).astype(str)
    cityname = pd.Series(names[city])
    text = "Report r" + sidx + ": survey notes from the field team."
    text = text.where(
        no_geo, text + " Observations near " + cityname + " continue."
    )
    coord_tag = (
        " Position @"
        + pd.Series(jlat).map(lambda v: f"{v:.4f}")
        + ","
        + pd.Series(jlon).map(lambda v: f"{v:.4f}")
        + " recorded."
    )
    text = text.where(~has_coords, text + coord_tag)
    text = text.where(~amp, text + " R&D follow-up <pending>.")

    host = cityname.where(~no_geo, "www")
    url = "https://" + host + ".example.com/r" + sidx.str.zfill(9)

    title = _escape("Crawl record r" + sidx)
    body = _escape(text)
    html = (
        "<html><head><title>"
        + title
        + "</title></head><body><p>"
        + body
        + "</p></body></html>"
    )
    return pa.table(
        {
            "url": pa.array(url, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(
                html.str.encode("utf-8").to_numpy(), type=pa.binary()
            ),
            "text": pa.array(text, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
        }
    )


def pages_table(n: int, seed: int = 42) -> pa.Table:
    return pages_batch(np.arange(n, dtype=np.uint64), seed)


def pages_dataset(n: int, seed: int = 42, *, blocks: int = 0):
    """Distributed page generation: ``ray.data.range`` carries only row
    ids; each block expands to full rows inside ``map_batches`` —
    nothing materializes on the driver."""
    import ray.data as rd

    # ~10k rows per block so a parquet sink of this dataset yields
    # enough files for full read parallelism on a 32-way node
    ds = rd.range(n, override_num_blocks=blocks or min(max(8, n // 10_000), 400))

    def gen(batch: pa.Table) -> pa.Table:
        return pages_batch(batch["id"].to_numpy(), seed)

    return ds.map_batches(gen, batch_format="pyarrow")


def pages_from_documents_batch(batch: pa.Table, seed: int = 42) -> pa.Table:
    """Adapt a ``documents`` batch (driver table: doc_id, text, lang,
    source, n_chars) into the mandated pages schema — a pure function of
    (seed, doc_id, text): deterministic url/host, geo mention appended
    to the text, html wrapper.  Lets the flagship pipeline run over the
    driver-provided sf tables while exercising the full
    extract->geocode->encode path."""
    doc_id = np.asarray(batch["doc_id"].to_numpy(), dtype=np.uint64)
    names, glat, glon, cum = gazetteer_arrays(seed=seed)
    city = np.searchsorted(cum, _u01(_h(seed, doc_id, 70)), side="right")
    city = np.minimum(city, len(names) - 1)
    no_geo = _h(seed, doc_id, 71) % np.uint64(20) == np.uint64(0)
    has_coords = (_h(seed, doc_id, 72) % np.uint64(5) == np.uint64(0)) & ~no_geo
    jlat = np.round(glat[city] + (_u01(_h(seed, doc_id, 73)) - 0.5) * 0.4, 4)
    jlon = np.round(glon[city] + (_u01(_h(seed, doc_id, 74)) - 0.5) * 0.4, 4)

    sid = pd.Series(doc_id.astype(np.int64)).astype(str)
    cityname = pd.Series(names[city])
    text = pd.Series(batch["text"].to_pandas())
    text = text.where(no_geo, text + " Observations near " + cityname + " continue.")
    coord_tag = (
        " Position @"
        + pd.Series(jlat).map(lambda v: f"{v:.4f}")
        + ","
        + pd.Series(jlon).map(lambda v: f"{v:.4f}")
        + " recorded."
    )
    text = text.where(~has_coords, text + coord_tag)
    host = cityname.where(~no_geo, "www")
    url = "https://" + host + ".example.com/d" + sid.str.zfill(9)
    html = (
        "<html><head><title>"
        + _escape("Doc d" + sid)
        + "</title></head><body><p>"
        + _escape(text)
        + "</p></body></html>"
    )
    ts = _EPOCH_2024 + (
        _h(seed, doc_id, 75) % np.uint64(2 * 365 * 24 * 3600)
    ).astype("timedelta64[s]").astype("timedelta64[us]")
    return pa.table(
        {
            "url": pa.array(url, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(html.str.encode("utf-8").to_numpy(), type=pa.binary()),
            "text": pa.array(text, type=pa.string()),
            "lang": pa.array(batch["lang"]),
        }
    )


# ---------------------------------------------------------------------------
# F3: grid (long-form weather-variable table for the conversion library)
# ---------------------------------------------------------------------------


def grid_table(
    *,
    hours: int = 240,
    ny: int = 10,
    nx: int = 12,
    lat0: float = 35.0,
    lon0: float = -10.0,
    pitch: float = 0.5,
    seed: int = 42,
) -> pa.Table:
    """Long-form ``(ts, lat, lon, <vars>)`` grid mirroring the shape of
    the reference's prepared cutouts (``datasets/era5.py:392-453``,
    ``datasets/merra2.py:208-241``): one row per cell-hour, float32
    variables, deterministic smooth fields + hash noise.  Includes the
    pathological values its conversions guard against (roughness <= 0,
    ``wind.py:290``; influx > TOA, ``pv/irradiation.py:190``; NaN
    temperature over "sea" cells, ``convert.py:126-136``)."""
    t_idx = np.arange(hours, dtype=np.int64)
    yy = np.arange(ny, dtype=np.int64)
    xx = np.arange(nx, dtype=np.int64)
    T, Y, X = np.meshgrid(t_idx, yy, xx, indexing="ij")
    T, Y, X = T.ravel(), Y.ravel(), X.ravel()
    n = T.shape[0]
    idx = np.arange(n, dtype=np.uint64)

    lat = lat0 + Y * pitch
    lon = lon0 + X * pitch
    ts = _EPOCH_2024 + (T * 3600 * 1_000_000).astype("timedelta64[us]")
    hod = (T % 24).astype(np.float64)
    doy = (T // 24).astype(np.float64)

    def noise(stream, lo, hi):
        return (_u01(_h(seed, idx, stream)) * (hi - lo) + lo).astype(
            np.float32
        )

    diurnal = np.sin((hod - 6.0) / 24.0 * 2 * np.pi).astype(np.float32)
    u = (3.0 + 2.5 * diurnal + noise(30, -1, 1) + 0.3 * Y).astype(np.float32)
    v = (1.0 + 1.5 * np.cos(doy / 10).astype(np.float32) + noise(31, -1, 1)).astype(
        np.float32
    )
    cols: dict[str, np.ndarray] = {}
    for h_name, scale in [("2m", 0.55), ("10m", 0.75), ("50m", 0.92), ("lml", 1.0)]:
        cols[f"u{h_name}"] = (u * scale).astype(np.float32)
        cols[f"v{h_name}"] = (v * scale).astype(np.float32)
    cols["wndlml"] = np.sqrt(cols["ulml"] ** 2 + cols["vlml"] ** 2)

    rough = noise(32, -0.05, 1.5)  # includes <=0 values (sanitized later)
    cols["roughness"] = rough
    cols["disph"] = noise(33, 0.0, 5.0)
    cols["hlml"] = noise(34, 40.0, 80.0)
    cols["ustar"] = noise(35, 0.05, 0.8)
    cols["rhoa"] = noise(36, 1.0, 1.3)
    # surface heat/evaporation fluxes for the stability-corrected wind
    # laws (wind.py:156-227 inputs; signs mix stable + unstable cases)
    cols["hflux"] = noise(42, -120.0, 250.0)
    cols["eflux"] = noise(43, -30.0, 180.0)
    temp = (288.0 + 10.0 * diurnal + noise(37, -5, 5)).astype(np.float32)
    sea = _h(seed, idx, 38) % np.uint64(11) == np.uint64(0)
    cols["temperature"] = np.where(sea, np.float32(np.nan), temp)
    cols["tlml"] = temp

    day = np.maximum(diurnal, 0.0)
    toa = (1360.0 * day).astype(np.float32)
    influx = (toa * noise(39, 0.2, 1.05)).astype(np.float32)  # some > TOA*1
    cols["influx_toa"] = toa
    cols["influx"] = influx
    cols["influx_direct"] = (influx * noise(40, 0.3, 0.8)).astype(np.float32)
    cols["influx_diffuse"] = np.maximum(
        influx - cols["influx_direct"], 0.0
    ).astype(np.float32)
    cols["albedo"] = noise(41, 0.05, 0.5)

    for k, (c, hi) in enumerate(
        [
            ("dusmass25", 4e-8),
            ("sssmass25", 2e-8),
            ("bcsmass", 1e-8),
            ("ocsmass", 3e-8),
            ("so4smass", 2e-8),
        ]
    ):
        cols[c] = noise(50 + k, 0.0, hi)

    out = {
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "lat": pa.array(lat.astype(np.float64)),
        "lon": pa.array(lon.astype(np.float64)),
    }
    for k, vv in cols.items():
        out[k] = pa.array(vv, type=pa.float32())
    return pa.table(out)


# ---------------------------------------------------------------------------
# F4: polygons (vector shapes for PIP join)
# ---------------------------------------------------------------------------


def polygons_table(n: int = 50, seed: int = 42) -> pa.Table:
    """Closed exterior rings as ``list<float64>`` lon/lat arrays:
    convex n-gons, concave stars, one anti-meridian crosser; ``kind``
    include/exclude drives semi vs anti join (``mask.py:593-598``)."""
    rows_id, rows_x, rows_y, rows_kind = [], [], [], []
    for i in range(n):
        h1 = int(splitmix64(np.uint64(seed * 1000 + i * 7 + 1)))
        h2 = int(splitmix64(np.uint64(seed * 1000 + i * 7 + 2)))
        h3 = int(splitmix64(np.uint64(seed * 1000 + i * 7 + 3)))
        clat = (h1 % 160_000) / 1000.0 - 80.0
        clon = (h2 % 360_000) / 1000.0 - 180.0
        if i == n - 1:  # force one anti-meridian crosser
            clon = 179.8
        radius = 0.5 + (h3 % 4500) / 1000.0
        nv = 5 + h1 % 7
        ang = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        star = i % 3 == 0
        r = np.full(nv, radius)
        if star:
            r[1::2] *= 0.45  # concave star
        px = clon + r * np.cos(ang) / max(np.cos(np.deg2rad(clat)), 0.2)
        py = np.clip(clat + r * np.sin(ang), -89.9, 89.9)
        px = ((px + 180.0) % 360.0) - 180.0  # wrap lon
        px = np.append(px, px[0])
        py = np.append(py, py[0])
        rows_id.append(f"poly{i:03d}")
        rows_x.append(px.tolist())
        rows_y.append(py.tolist())
        rows_kind.append("exclude" if i % 11 == 10 else "include")
    return pa.table(
        {
            "poly_id": pa.array(rows_id),
            "ring_x": pa.array(rows_x, type=pa.list_(pa.float64())),
            "ring_y": pa.array(rows_y, type=pa.list_(pa.float64())),
            "kind": pa.array(rows_kind),
        }
    )


# ---------------------------------------------------------------------------
# F5: raster (mask layers as cell-value tables)
# ---------------------------------------------------------------------------


def raster_table(
    *,
    layer: str = "landcover",
    nrow: int = 60,
    ncol: int = 80,
    lat0: float = 30.0,
    lon0: float = -15.0,
    pitch: float = 0.25,
    seed: int = 42,
) -> pa.Table:
    """One raster layer as a ``(layer, row, col, lat, lon, value)``
    table — the Arrow analogue of a GeoTIFF band (``mask.py:129-174``).
    ``landcover``: categorical codes with all-zero borders and small
    isolated blobs (exercises isin-filter, trim, min-area);
    ``slope``: continuous values (min/max-bound filter)."""
    rr, cc = np.meshgrid(
        np.arange(nrow, dtype=np.int32),
        np.arange(ncol, dtype=np.int32),
        indexing="ij",
    )
    rr, cc = rr.ravel(), cc.ravel()
    idx = np.arange(rr.shape[0], dtype=np.uint64)
    lat = lat0 + (rr + 0.5) * pitch
    lon = lon0 + (cc + 0.5) * pitch
    if layer == "landcover":
        val = (_h(seed, idx, 60) % np.uint64(6)).astype(np.float32)
        blob = ((rr // 3) * 31 + (cc // 3) * 17) % 13 == 0
        val = np.where(blob, np.float32(9.0), val)  # small isolated blobs
    elif layer == "scatter":
        # sparse scattered occupancy (~1/7 density, far below the 2-D
        # percolation threshold): connected components stay SMALL, so
        # the min-area DuckDB oracle's recursive-CTE label propagation
        # (cost ~ sum of component-size^2) stays cheap
        occ = _h(seed, idx, 62) % np.uint64(7) == np.uint64(0)
        mag = (_h(seed, idx, 63) % np.uint64(5) + np.uint64(1)).astype(
            np.float32
        )
        val = np.where(occ, mag, np.float32(0.0))
    else:  # slope: smooth continuous field
        val = (
            20.0
            + 15.0 * np.sin(rr / 7.0)
            + 10.0 * np.cos(cc / 9.0)
            + _u01(_h(seed, idx, 61)) * 4.0
        ).astype(np.float32)
    border = (rr < 2) | (rr >= nrow - 2) | (cc < 2) | (cc >= ncol - 2)
    val = np.where(border, np.float32(0.0), val)
    return pa.table(
        {
            "layer": pa.array(np.full(rr.shape[0], layer)),
            "row": pa.array(rr, type=pa.int32()),
            "col": pa.array(cc, type=pa.int32()),
            "lat": pa.array(lat.astype(np.float64)),
            "lon": pa.array(lon.astype(np.float64)),
            "value": pa.array(val, type=pa.float32()),
        }
    )
