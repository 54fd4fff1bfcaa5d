"""Byte-bigram language-model surprisal scoring.

The reference has no LM-scoring stage — this belongs to the
training-data quality family (cf. CCNet-style perplexity filtering,
Wenzek et al. 2020, arXiv:1911.00359): fit a tiny n-gram LM on the
corpus, score every document, and let downstream filters drop the
high-surprisal (gibberish) and ultra-low-surprisal (boilerplate)
tails.  The model here is a bigram LM over raw UTF-8 BYTES — the
alphabet is fixed (<= 256^2 = 65,536 bigrams), so the "model" is a
constant-size count table no matter the corpus size: the one
broadcast-friendly LM shape at 100 TB.

Physical plan (two scans, inherent to train-then-score):
  1. per-batch ``np.bincount`` over pair codes -> per-batch nonzero
     (pair_code, c) partials -> grouped sum (<= 65,536 rows total);
  2. the count table collapses to a 65,536-slot int64 lookup array,
     ``ray.put`` once, and a second pass over the raw docs scores
     every adjacent byte pair with one vectorized gather.

Cross-engine exactness: surprisal is -log2(c/N) per pair.  Floats
cannot hash-match across engines, so the score stays in a FIXED-POINT
integer domain end to end: ``qlog2(x)`` = msb(x) concatenated with the
first ``F_BITS`` fractional bits of log2(x), computed by the classic
square-and-normalize algorithm with pure integer truncation.  The
IDENTICAL algorithm runs vectorized here and as a recursive CTE in
the DuckDB oracle (``pipelines/oracles.py``), so per-doc totals are
bit-equal — the same state-vs-estimate split as the HLL sketch in
``stages/sketch.py`` (``surprisal_bits`` converts to float bits per
pair for human use and is golden-tested, not hashed).

ASCII note: the kernel operates on UTF-8 bytes; the SQL oracle's
``substr`` operates on codepoints.  They agree exactly on ASCII
corpora (the gate corpus is verified pure ASCII); for multi-byte text
the kernel is still well-defined (byte bigrams), only the SQL mirror
stops being a mirror.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

F_BITS = 16  # fractional bits of log2 kept (resolution ~1.5e-5 bits)
_MSCALE = np.uint64(1) << np.uint64(30)  # mantissa fixed-point scale


def qlog2_fixed(c, f: int = F_BITS) -> np.ndarray:
    """``floor_approx(2^f * log2(c))`` by exact integer arithmetic.

    msb by binary-search shifts (no float anywhere, so counts beyond
    2^53 stay exact); mantissa m = c normalized into [2^30, 2^31),
    then ``f`` rounds of square -> truncate-back-to-30-bits ->
    emit-integer-bit.  Truncation makes this a DEFINED deterministic
    algorithm rather than a float approximation: the DuckDB oracle
    runs the same loop in a recursive CTE and matches bit-for-bit.
    Off-by-truncation from true log2 is < 2^-14 bits — irrelevant for
    quality scoring, priceless for hash-matching."""
    c = np.asarray(c, dtype=np.uint64)
    if c.size and int(c.min()) < 1:
        raise ValueError("qlog2_fixed requires counts >= 1")
    msb = np.zeros(c.shape, dtype=np.uint64)
    x = c.copy()
    for s in (32, 16, 8, 4, 2, 1):
        su = np.uint64(s)
        big = x >= (np.uint64(1) << su)
        msb += np.where(big, su, np.uint64(0))
        x = np.where(big, x >> su, x)
    # m = floor(c * 2^30 / 2^msb), guarded shifts (numpy shift by a
    # negative/overflowed uint64 count is undefined)
    hi = msb >= np.uint64(30)
    down = c >> np.where(hi, msb - np.uint64(30), np.uint64(0))
    up = c << np.where(hi, np.uint64(0), np.uint64(30) - msb)
    m = np.where(hi, down, up)
    frac = np.zeros(c.shape, dtype=np.uint64)
    two = _MSCALE << np.uint64(1)  # 2^31
    for _ in range(f):
        mm = (m * m) >> np.uint64(30)
        bit = (mm >= two).astype(np.uint64)
        m = mm >> bit
        frac = (frac << np.uint64(1)) | bit
    return ((msb.astype(np.int64) << np.int64(f))
            + frac.astype(np.int64))


def _byte_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 data, int64 offsets) view of an Arrow string column,
    nulls as empty strings — zero-copy except the null fill."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    n = len(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    buf_off, buf_dat = arr.buffers()[1], arr.buffers()[2]
    offsets = np.frombuffer(buf_off, dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(buf_dat, dtype=np.uint8)
        if buf_dat is not None
        else np.empty(0, dtype=np.uint8)
    )
    # normalize so offsets[0] == 0 (sliced arrays)
    if offsets.size and offsets[0] != 0:
        data = data[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    else:
        data = data[: offsets[-1] if offsets.size else 0]
    return data, offsets


def quantized_matrix(col, n_rows: int, scale: float = 1024.0) -> np.ndarray:
    """FLOOR fixed-point quantization of an Arrow list<float> embedding
    column into an (n_rows, dim) int64 matrix — THE single definition
    of the engine's embedding quantization (``floor(x * 2^10)``), so a
    scale/rounding change lands everywhere at once and stays in sync
    with the SQL oracles' ``FLOOR(CAST(e AS DOUBLE) * 1024)``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.floor(
        col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        * scale
    ).astype(np.int64).reshape(n_rows, -1)


def _pair_codes(data: np.ndarray, offsets: np.ndarray):
    """(codes, valid): code[j] = data[j]*256 + data[j+1] for every
    adjacent byte position; valid masks off pairs that straddle a
    document boundary (the last byte of each doc)."""
    total = data.size
    if total < 2:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=bool))
    codes = data[:-1].astype(np.int64) * 256 + data[1:]
    valid = np.ones(total - 1, dtype=bool)
    ends = offsets[1:] - 1  # last-byte position of each doc
    ends = ends[(ends >= 0) & (ends <= total - 2)]
    valid[ends] = False
    return codes, valid


def _count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    data, offsets = _byte_view(batch[text_col])
    codes, valid = _pair_codes(data, offsets)
    cnt = np.bincount(codes[valid], minlength=65536)
    nz = np.flatnonzero(cnt)
    return pa.table(
        {
            "pair_code": pa.array(nz.astype(np.int64)),
            "c": pa.array(cnt[nz].astype(np.int64)),
        }
    )


def train_bigram_counts(ds, *, text_col: str = "text") -> pa.Table:
    """Corpus bigram count table (pair_code, c) as a driver-side
    pa.Table — bounded at 65,536 rows by the byte alphabet, the
    constant-size driver state this repo allows everywhere."""
    import ray

    partials = ds.map_batches(
        lambda b: _count_partial(b, text_col), batch_format="pyarrow"
    )

    # the key space is alphabet-bounded (<= 65,536), so the merge never
    # needs a distributed groupby (~1-2 s fixed cost per execution in
    # Ray's sort-based path): coalesce the tiny per-block partials into
    # a few blocks, bincount-merge inside each, and finish with one
    # bounded driver-side bincount over <= 16 x 65,536 rows.
    def merge_dense(batch: pa.Table) -> pa.Table:
        cnt = np.zeros(65536, dtype=np.int64)
        np.add.at(
            cnt,
            batch["pair_code"].to_numpy(zero_copy_only=False),
            batch["c"].to_numpy(zero_copy_only=False),
        )
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "pair_code": pa.array(nz.astype(np.int64)),
                "c": pa.array(cnt[nz]),
            }
        )

    merged = partials.repartition(16).map_batches(
        merge_dense, batch_format="pyarrow", batch_size=None
    )
    parts = [t for t in ray.get(merged.to_arrow_refs()) if len(t)]
    if not parts:
        return pa.table(
            {
                "pair_code": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
    return merge_dense(pa.concat_tables(parts).combine_chunks())


_SCORER_MEMO: dict = {}


def _resolve_scorer(ref, qn: int, id_col: str, text_col: str):
    """Per-worker-process scorer cache keyed by the lookup ref: the
    65,536-slot table is ray.get ONCE per worker (zero-copy from the
    local object store), never re-shipped per batch."""
    key = (ref.hex() if hasattr(ref, "hex") else id(ref), qn, id_col,
           text_col)
    sc = _SCORER_MEMO.get(key)
    if sc is None:
        sc = _SurprisalScorer(ref, qn, id_col, text_col)
        _SCORER_MEMO.clear()  # one live model per worker is enough
        _SCORER_MEMO[key] = sc
    return sc


class _SurprisalScorer:
    """Score raw doc rows against the broadcast qlog2 lookup: one
    gather + one prefix-sum per batch.  Pairs unseen in training (only
    possible when scoring a different corpus than the one trained on)
    back off to count 1 — maximum surprisal qlog2(N)."""

    def __init__(self, lookup_ref, qn: int, id_col: str, text_col: str):
        try:
            import ray

            if isinstance(lookup_ref, ray.ObjectRef):
                lookup_ref = ray.get(lookup_ref)
        except Exception:
            pass
        self.lookup = lookup_ref  # int64[65536]: qlog2(c), 0 if unseen
        self.qn = np.int64(qn)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        data, offsets = self._views(batch)
        n_docs = len(batch)
        lengths = offsets[1:] - offsets[:-1]
        n_pairs = np.maximum(lengths - 1, 0)
        codes, valid = _pair_codes(data, offsets)
        sbits = np.zeros(codes.size, dtype=np.int64)
        if codes.size:
            sbits[valid] = self.qn - self.lookup[codes[valid]]
        # per-doc totals via prefix sums: pair j belongs to the doc
        # containing byte j; boundary pairs are zeroed, so the closed
        # form is P[offsets[k+1]] - P[offsets[k]] with one pad slot
        pc = np.zeros(max(data.size, 1) + 1, dtype=np.int64)
        np.cumsum(sbits, out=pc[1 : codes.size + 1])
        if codes.size:
            pc[codes.size + 1 :] = pc[codes.size]
        totals = pc[np.minimum(offsets[1:], pc.size - 1)] - pc[
            np.minimum(offsets[:-1], pc.size - 1)
        ]
        return pa.table(
            {
                self.id_col: ids,
                "n_pairs": pa.array(n_pairs.astype(np.int64)),
                "qbits_total": pa.array(totals[:n_docs]),
            }
        )

    def _views(self, batch):
        return _byte_view(batch[self.text_col])


def lm_surprisal(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document bigram surprisal: (id, n_pairs, qbits_total) with
    qbits_total = sum over adjacent byte pairs of
    qlog2(N) - qlog2(count(pair)) — the fixed-point integer form of
    total -log2 probability in bits * 2^F_BITS.  Trains on ``ds``
    itself (two scans; the count table is alphabet-bounded).  Use
    :func:`surprisal_bits` to convert to float bits/pair."""
    import ray

    counts = train_bigram_counts(ds, text_col=text_col)
    lookup = np.zeros(65536, dtype=np.int64)
    if len(counts):
        pcode = counts["pair_code"].to_numpy(zero_copy_only=False)
        c = counts["c"].to_numpy(zero_copy_only=False)
        lookup[pcode] = qlog2_fixed(c)
        n_total = int(c.sum())
    else:
        n_total = 1
    qn = int(qlog2_fixed(np.array([max(n_total, 1)]))[0])
    ref = ray.put(lookup)

    # stateless tasks + a worker-global memo around ray.get instead of
    # an actor pool: pools respawn per Dataset execution (~2-4 s of
    # wall variance each run), while the memoized ray.get is a
    # zero-copy read from the local object store per worker process
    # (the spatial_join._resolve_index pattern).
    def score(batch: pa.Table) -> pa.Table:
        return _resolve_scorer(ref, qn, id_col, text_col)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


def surprisal_bits(qbits_total, n_pairs) -> np.ndarray:
    """Float mean surprisal (bits per byte pair) from the integer
    state; docs with no pairs score 0."""
    q = np.asarray(qbits_total, dtype=np.float64)
    n = np.asarray(n_pairs, dtype=np.float64)
    return np.where(n > 0, q / (1 << F_BITS) / np.maximum(n, 1), 0.0)
