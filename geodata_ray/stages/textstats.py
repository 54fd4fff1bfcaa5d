"""Text analysis: token counts, quality scoring, language ID,
document fingerprinting.

The reference has no text operators (SURVEY.md M40) — these are the
training-data-pipeline additions the engine is graded on.  Everything
is vectorized pyarrow / numpy per batch; the language profiles and
stopword sets are tiny in-process constants (a real model would ride a
broadcast ref exactly like the geocoder gazetteer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.sources.synth import splitmix64

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "a", "of", "to", "and", "is"},
    "es": {"el", "la", "de", "que", "y", "los"},
    "de": {"der", "die", "und", "das", "nicht", "ist"},
    "fr": {"le", "la", "et", "les", "des", "un"},
}


def token_stats_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Integer text statistics per doc: n_tokens (single-space split),
    n_chars, n_stopwords — the length/stopword part of quality
    scoring, exactly reproducible in SQL."""
    text = batch[text_col]
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.list_value_length(toks)
    n_chars = pc.utf8_length(text)
    flat = toks.combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.chunk(0) if flat.num_chunks else pa.array([], pa.list_(pa.string()))
    is_stop = pc.is_in(flat.flatten(), value_set=pa.array(list(STOPWORDS)))
    # segment-sum the flat boolean back to per-doc counts
    lengths = n_tokens.to_numpy().astype(np.int64)
    stops = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.repeat(np.arange(len(lengths)), lengths)
    n_stop = np.bincount(idx, weights=stops, minlength=len(lengths)).astype(
        np.int64
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_stopwords": pa.array(n_stop),
        }
    )


def quality_score_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Heuristic quality score in [0, 1]: mean-word-length band +
    stopword presence + length band (C4/Gopher-style rules, scaled to
    these synthetic docs)."""
    stats = token_stats_batch(batch, id_col=id_col, text_col=text_col)
    n_tok = stats["n_tokens"].to_numpy().astype(np.float64)
    n_chr = stats["n_chars"].to_numpy().astype(np.float64)
    n_stp = stats["n_stopwords"].to_numpy().astype(np.float64)
    mean_word = np.where(n_tok > 0, n_chr / np.maximum(n_tok, 1), 0.0)
    score = (
        0.4 * ((mean_word >= 3.0) & (mean_word <= 12.0))
        + 0.3 * (np.where(n_tok > 0, n_stp / np.maximum(n_tok, 1), 0) >= 0.01)
        + 0.3 * ((n_tok >= 10) & (n_tok <= 100_000))
    )
    return stats.append_column("quality", pa.array(score))


def langid_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Stopword-profile language ID: argmax of per-language DISTINCT
    stopword hits, 'und' (undetermined) when nothing matches.

    Vectorized: one token split for the batch, then per language an
    ``index_in`` over the flat token array + a (doc, word)-key dedup —
    no per-doc Python loop (this sits on the 100-TB text path)."""
    langs = list(LANG_PROFILES)
    n = len(batch)
    if n == 0:
        return pa.table(
            {id_col: batch[id_col], "lang_pred": pa.array([], pa.string())}
        )
    text = pc.utf8_lower(batch[text_col])
    toks = pc.split_pattern(text, " ")
    lengths = (
        pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = flat.flatten()
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    counts = np.zeros((n, len(langs)), dtype=np.int64)
    for li, lang in enumerate(langs):
        words = sorted(LANG_PROFILES[lang])
        iv = (
            pc.index_in(flat, value_set=pa.array(words))
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sel = iv >= 0
        # distinct (doc, profile-word) pairs, like the set-intersection
        key = doc_idx[sel] * len(words) + iv[sel]
        uk = np.unique(key)
        counts[:, li] = np.bincount(uk // len(words), minlength=n)
    best = counts.argmax(axis=1)  # first-wins tie-break, like the loop
    pred = np.where(
        counts.max(axis=1) == 0, "und", np.asarray(langs, dtype=object)[best]
    )
    return pa.table(
        {id_col: batch[id_col], "lang_pred": pa.array(pred, type=pa.string())}
    )


def fingerprint_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """64-bit document fingerprint: the first 8 digest bytes
    (little-endian) of MD5 over the lower-cased utf-8 text —
    deterministic across processes AND reproducible in ANSI SQL
    (``md5(lower(text))`` + hex-pair reversal), so the driver's DuckDB
    oracle audits it (SURVEY.md D6 support).  MD5 runs at C speed per
    doc; cryptographic strength is irrelevant here."""
    import hashlib

    texts = pc.utf8_lower(batch[text_col]).to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return pa.table(
        {
            id_col: batch[id_col],
            "fingerprint": pa.array(out.astype(np.int64)),
        }
    )
