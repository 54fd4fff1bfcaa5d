"""HTML -> text extraction (deterministic, vectorized).

The driver-mandated per-row invariant (BASELINE.json ``input_hint``) is
byte-identical extracted text per url at any parallelism; extraction is
a pure function of the ``html`` bytes implemented entirely with
pyarrow.compute RE2 kernels (no Python per row).  The reference has no
text operators (geodata is raster-only — SURVEY.md M40); this stage is
the new engine's analogue of its per-file normalizers
(``/root/reference/src/geodata/datasets/era5.py:392-453``): the first
``map_batches`` every page flows through.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_BODY_RE = r"(?s)<body><p>(?P<t>.*)</p></body>"


def extract_text_batch(batch: pa.Table, *, out_col: str = "extracted_text") -> pa.Table:
    """Extract visible text from the ``html`` column.

    Handles the engine's canonical page shape: a single ``<body>`` with
    one or more ``<p>`` paragraphs, HTML-escaped. Paragraph breaks
    become ``\\n``; entities are unescaped (``&lt; &gt; &amp;``, with
    ``&amp;`` last so double-escapes survive byte-exactly).
    """
    html = pc.cast(batch["html"], pa.string())  # validates utf-8
    body = pc.struct_field(pc.extract_regex(html, _BODY_RE), "t")
    body = pc.replace_substring(body, "</p><p>", "\n")
    body = pc.replace_substring(body, "&lt;", "<")
    body = pc.replace_substring(body, "&gt;", ">")
    body = pc.replace_substring(body, "&amp;", "&")
    return batch.append_column(out_col, body)


def extract_text(ds, *, batch_size: int = 4096):
    """Dataset-level stage.  Small ``batch_size``: rows carry the wide
    ``html`` binary payload (SURVEY.md §7.4 hard part 4)."""
    return ds.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=batch_size
    )


def drop_html(ds):
    """Project away the wide binary column before any shuffle."""
    cols = [c for c in ds.schema().names if c != "html"]
    return ds.select_columns(cols)
