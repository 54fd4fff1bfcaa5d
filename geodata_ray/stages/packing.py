"""Training-sequence packing: a distributed prefix-sum scan.

The export step of a training-data pipeline: documents are laid out in
a deterministic global order, their token streams conceptually
concatenated, and the stream split into fixed-length training
sequences; each document then spans sequences
``first_seq .. last_seq``.  (The "concat-then-split" packing used by
GPT-style pretraining dataloaders — documents may straddle sequence
boundaries.)

The core primitive is ``global_prefix_sum`` — a classic two-phase
distributed scan:

1. sort by the order column and MATERIALIZE (fixes block boundaries —
   both phases must see identical blocks);
2. phase 1: one tiny row per block (first order value, block sum);
3. driver: exclusive prefix over the per-block sums (bounded by block
   count, thousands of entries at 100 TB — metadata-sized);
4. phase 2: per-block cumsum + the block's broadcast offset, matched
   by searchsorted on the block's first order value.

No corpus-sized driver state; one sort (inherent to a deterministic
global layout) + two streaming passes.

``order_col`` must be globally UNIQUE (ties across a block boundary
would make the offset lookup ambiguous) — use a doc-id hash for a
shuffled-but-deterministic layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def global_prefix_sum(ds, *, order_col: str, value_col: str,
                      out_col: str = "prefix"):
    """Append ``out_col`` = exclusive prefix sum of ``value_col`` in
    ``order_col`` order (the sum of all STRICTLY EARLIER rows).
    Returns the sorted, materialized Dataset with the new column."""
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "first_order": pa.array([], pa.int64()),
                    "block_sum": pa.array([], pa.int64()),
                }
            )
        order = batch[order_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "first_order": pa.array([np.int64(order[0])]),
                "block_sum": pa.array([np.int64(vals.sum())]),
            }
        )

    # batch_size=None -> one batch per block, so summaries align with
    # the materialized block structure phase 2 will see
    summaries = sorted_ds.map_batches(
        block_summary, batch_size=None, batch_format="pyarrow"
    ).to_pandas()
    summaries = summaries.sort_values("first_order", ignore_index=True)
    firsts = summaries["first_order"].to_numpy().astype(np.int64)
    block_sums = summaries["block_sum"].to_numpy().astype(np.int64)
    offsets = np.r_[0, np.cumsum(block_sums)[:-1]]
    try:
        bc = ray.put((firsts, offsets))
    except Exception:
        bc = (firsts, offsets)

    def add_prefix(batch: pa.Table) -> pa.Table:
        import ray as _ray

        fo = bc
        if not isinstance(fo, tuple):
            fo = _ray.get(fo)
        f, off = fo
        if len(batch) == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        order = batch[order_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        i = np.searchsorted(f, np.int64(order[0]))
        if i >= f.size or f[i] != order[0]:
            raise RuntimeError(
                "global_prefix_sum: block boundary drift — phase-2 "
                "block does not start at a phase-1 first_order value "
                "(order_col must be unique and the input materialized)"
            )
        prefix = off[i] + np.cumsum(vals) - vals
        return batch.append_column(out_col, pa.array(prefix))

    return sorted_ds.map_batches(
        add_prefix, batch_size=None, batch_format="pyarrow"
    )


def pack_sequences(ds, *, id_col: str, ntok_col: str, order_col: str,
                   seq_len: int):
    """Assign each document its packed-sequence span: ``start_tok``
    (position of its first token in the concatenated stream),
    ``first_seq`` and ``last_seq`` (0-based fixed-length sequence
    indices).  Zero-token docs get first_seq = last_seq = the sequence
    their boundary position falls in (they occupy no tokens).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    with_prefix = global_prefix_sum(
        ds, order_col=order_col, value_col=ntok_col, out_col="start_tok"
    )

    def spans(batch: pa.Table) -> pa.Table:
        start = batch["start_tok"].to_numpy(zero_copy_only=False)
        ntok = batch[ntok_col].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        first = start // seq_len
        last = np.where(ntok > 0, (start + ntok - 1) // seq_len, first)
        return pa.table(
            {
                id_col: batch[id_col],
                "start_tok": batch["start_tok"],
                "first_seq": pa.array(first.astype(np.int64)),
                "last_seq": pa.array(last.astype(np.int64)),
            }
        )

    return with_prefix.map_batches(spans, batch_format="pyarrow")


def global_shuffle(ds, *, id_col: str, seed: int):
    """Seeded deterministic global shuffle — the reproducible corpus
    layout every training run needs (same seed => byte-identical epoch
    order on any cluster size, resumable mid-epoch by position range).

    Each row gets ``shuffle_ord`` = splitmix64(id + seed) (a u64
    bijection, stored as its int64 bit view — the repo-wide 64-bit-hash
    convention) and ``shuffle_pos`` = its 0-based rank in signed
    ``shuffle_ord`` order, computed with the same two-phase distributed
    prefix-sum scan ``pack_sequences`` uses (value = 1 per row): one
    sort + two streaming passes, block-count driver state only.

    ``id_col`` must be globally unique (splitmix64 is a bijection, so
    ``shuffle_ord`` is then unique too and the scan's block-boundary
    invariant holds).
    """
    from geodata_ray.sources.synth import splitmix64

    def add_ord(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            x = ids.astype(np.uint64) + np.uint64(seed)
        h = splitmix64(x).view(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "shuffle_ord": pa.array(h),
                "_one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    with_ord = ds.map_batches(add_ord, batch_format="pyarrow")
    out = global_prefix_sum(
        with_ord,
        order_col="shuffle_ord",
        value_col="_one",
        out_col="shuffle_pos",
    )
    return out.select_columns([id_col, "shuffle_ord", "shuffle_pos"])


def source_mixture(ds, *, id_col: str, source_col: str,
                   weights: dict[str, float], seed: int):
    """Epoch mixture: replicate each row by its source's (possibly
    fractional) repeat factor — how a training run up/down-weights
    corpora ("books x2.5, web x1") without materializing shuffled
    copies of the raw data.

    A doc in source s with weight r emits ``floor(r)`` copies plus one
    more iff ``splitmix64(id + seed) < frac(r) * 2^64`` — a
    deterministic per-doc coin, so the SAME docs get the extra copy on
    any cluster size / epoch restart, and the realized rate is exact in
    expectation with zero coordination.  Weights must be multiples of
    1/4 so the threshold ``frac(r) * 2^64`` is an exact u64 constant
    (no float compare anywhere).  Embarrassingly parallel: zero
    shuffle, one pass.

    Output: (id, source, copy_idx 0..k-1); k=0 sources drop rows.
    """
    from geodata_ray.sources.synth import splitmix64

    thresh: dict[str, tuple[int, int]] = {}
    for s, r in weights.items():
        q = round(r * 4)
        if q < 0 or abs(q / 4 - r) > 1e-12:
            raise ValueError(
                f"source_mixture: weight {r} for {s!r} is not a "
                "non-negative multiple of 1/4"
            )
        thresh[s] = (q // 4, (q % 4) << 62)  # (floor, frac*2^64)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # dictionary-encode so the weight lookup touches only the few
        # distinct sources, not every row
        enc = pc.dictionary_encode(
            batch[source_col].combine_chunks()
            if isinstance(batch[source_col], pa.ChunkedArray)
            else batch[source_col]
        )
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ub = np.array([thresh[s][0] for s in uniq], dtype=np.int64)
        uf = np.array([thresh[s][1] for s in uniq], dtype=np.uint64)
        base, frac = ub[codes], uf[codes]
        with np.errstate(over="ignore"):
            h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
        k = base + (h < frac)
        rep_ids = np.repeat(ids, k)
        rep_src = pa.array(np.asarray(uniq, dtype=object)[np.repeat(codes, k)])
        starts = np.repeat(np.cumsum(k) - k, k)
        copy_idx = np.arange(rep_ids.size, dtype=np.int64) - starts
        return pa.table(
            {
                id_col: pa.array(rep_ids),
                source_col: rep_src,
                "copy_idx": pa.array(copy_idx),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")
