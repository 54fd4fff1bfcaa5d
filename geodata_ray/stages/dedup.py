"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup is set reconciliation + an acknowledged
duplicate-timestamp case (SURVEY.md §2.7); a training-data engine needs
the full family.  Physical plans:

- exact: normalize -> hash -> two-phase grouped min (no raw text ever
  shuffles, only 64-bit hashes);
- MinHash+LSH: shingle -> 64 minhashes -> band buckets ->
  ``groupby(band, band_hash)`` -> candidate pairs -> exact-Jaccard
  verify.  Only (band_hash, id) pairs shuffle; texts stay put;
- SimHash: 64-bit weighted-bit fingerprint per doc (rows carry one
  int64);
- embedding near-dup: blocked matmul against a broadcast matrix
  (baseline, exact) or hyperplane-LSH buckets (scale path).

All hashing is the engine's splitmix64 over token bytes — deterministic
across processes (Python's builtin ``hash`` is salted and never used).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geodata_ray.sources.synth import splitmix64

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_C3 = np.uint64(0x165667B19E3779F9)

# worker-global token -> u64 hash memo (vocab is tiny vs corpus)
_TOKEN_CACHE: dict[str, int] = {}


def _token_hash(tok: str) -> int:
    # null tokens hash as the empty string — the same convention
    # hash_tokens_batch applies via fill_null(""), keeping the scalar
    # and vectorized paths bit-identical on null-bearing columns
    if tok is None:
        tok = ""
    h = _TOKEN_CACHE.get(tok)
    if h is None:
        b = np.frombuffer(tok.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        acc = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):
            for x in b:  # tokens are short; vocab memoized
                acc = splitmix64(acc ^ x)
        h = int(acc)
        _TOKEN_CACHE[tok] = h
    return h


_FNV_OFFSET = np.uint64(1469598103934665603)


def _as_string_array(col) -> pa.Array:
    arr = col
    if isinstance(arr, (list, tuple, np.ndarray)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def hash_tokens_batch(tokens: pa.Array) -> np.ndarray:
    """Vectorized :func:`_token_hash` over a flat Arrow string array:
    the identical FNV-offset + per-byte splitmix64 chain, evaluated
    COLUMN-wise (one vectorized step per byte position, masked by
    token length) instead of a Python loop per token.  Bit-identical
    to the scalar path (null tokens hash as "" in BOTH paths); the hot
    100-TB shingling/simhash stages call this."""
    arr = _as_string_array(tokens)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        arr = arr.fill_null("")
    buf_off, buf_dat = arr.buffers()[1], arr.buffers()[2]
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(buf_off, dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(buf_dat, dtype=np.uint8)
        if buf_dat is not None
        else np.empty(0, dtype=np.uint8)
    )
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    acc = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    maxlen = int(lengths.max()) if n else 0
    # process tokens sorted by length DESC so byte-position j touches
    # only the still-live prefix: total work is O(sum of lengths), and
    # one pathological 10KB token no longer drags an O(n) mask over
    # the whole batch for each of its bytes
    order = np.argsort(-lengths, kind="stable")
    s_starts = starts[order]
    s_len = np.sort(lengths)  # ascending, for the live-count lookup
    s_acc = acc[order]
    for j in range(maxlen):
        live = n - int(np.searchsorted(s_len, j, side="right"))
        if live == 0:
            break
        b = data[s_starts[:live] + j].astype(np.uint64)
        s_acc[:live] = splitmix64(s_acc[:live] ^ b)
    acc[order] = s_acc
    return acc


def _batch_shingles(texts, k: int):
    """Per-doc sorted-unique shingle-hash sets for a whole batch in one
    vectorized pass: flat token hashes (``hash_tokens_batch``) ->
    windowed combine over the flat array with doc-boundary masking ->
    one global (doc, hash) sort-dedup.  Returns ``(counts, flat)``
    where ``flat`` concatenates each doc's sorted unique shingles.
    Bit-identical to per-doc :func:`shingle_hashes`."""
    texts = _as_string_array(texts)
    n = len(texts)
    toks = pc.split_pattern(texts, " ")
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = lengths.astype(np.int64)
    flat = _as_string_array(toks).flatten()
    th = hash_tokens_batch(flat)
    m = th.size
    counts = np.zeros(n, dtype=np.int64)
    if m < k or n == 0:
        return counts, np.empty(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    W = m - k + 1
    with np.errstate(over="ignore"):
        sh = th[:W] * _C1
        for j in range(1, k):
            sh = sh ^ (th[j : W + j] * (_C2 if j == 1 else _C3))
    sh = splitmix64(sh)
    valid = doc_of[:W] == doc_of[k - 1 :]
    d, s = doc_of[:W][valid], sh[valid]
    order = np.lexsort((s, d))
    d, s = d[order], s[order]
    if d.size:
        keep = np.ones(d.size, dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        d, s = d[keep], s[keep]
    counts = np.bincount(d, minlength=n).astype(np.int64)
    return counts, s


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word-k-gram shingle hash set (sorted unique u64) for one doc.
    Docs with fewer than k tokens have NO shingles (empty set) — the
    same semantics the SQL oracle's range() expresses; such docs can
    never form near-dup pairs."""
    toks = text.split(" ")
    if len(toks) < k:
        return np.empty(0, dtype=np.uint64)
    th = np.array([_token_hash(t) for t in toks], dtype=np.uint64)
    with np.errstate(over="ignore"):
        sh = th[: len(th) - k + 1] * _C1
        for j in range(1, k):
            sh = sh ^ (th[j : len(th) - k + 1 + j] * (_C2 if j == 1 else _C3))
    return np.unique(splitmix64(sh))


_MINHASH_SEEDS = splitmix64(np.arange(1000, 1064, dtype=np.uint64))


def minhash_signature(shingles: np.ndarray, num: int = 64) -> np.ndarray:
    """num-permutation MinHash signature of a shingle-hash set."""
    if shingles.size == 0:
        return np.full(num, np.iinfo(np.uint64).max, dtype=np.uint64)
    sig = np.empty(num, dtype=np.uint64)
    seeds = _MINHASH_SEEDS[:num]
    for j in range(num):
        sig[j] = splitmix64(shingles ^ seeds[j]).min()
    return sig


def _band_rows(ids, texts, *, k, num_hashes, bands):
    """Vectorized banding for a whole batch: shingle hashing is one
    column-wise pass over the flat token array (``_batch_shingles`` —
    no per-doc Python loop), and each permutation's min is taken with
    one segmented ``minimum.reduceat``."""
    rows_per_band = num_hashes // bands
    n = len(ids)
    counts, flat = _batch_shingles(texts, k)
    offsets = np.r_[0, np.cumsum(counts)[:-1]]
    nonempty = counts > 0
    ne_offsets = offsets[nonempty]  # strictly increasing, < flat.size
    sig = np.full((n, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    for j in range(num_hashes):
        if flat.size:
            h = splitmix64(flat ^ _MINHASH_SEEDS[j])
            sig[nonempty, j] = np.minimum.reduceat(h, ne_offsets)
    # band hashes: fold each band's rows with splitmix64, seeded by band
    with np.errstate(over="ignore"):
        bh = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            acc = np.full(n, b + 1, dtype=np.uint64)
            for r in range(rows_per_band):
                acc = splitmix64(acc ^ sig[:, b * rows_per_band + r])
            bh[:, b] = acc
    ids_arr = np.asarray(ids)
    out_id = np.repeat(ids_arr, bands)
    out_band = np.tile(np.arange(bands, dtype=np.int32), n)
    # int64 bit view: uint64 keys degrade to Python objects in pandas
    # groupby paths and overflow Arrow conversion
    return out_id, out_band, bh.reshape(-1).view(np.int64)


# auto-switch bounds for the scale-path selection (documented in
# DEPLOYMENT.md): broadcast is chosen only below these, so no plan ever
# ships an unbounded value set through the driver or task closures.
MAX_BROADCAST_COLLISIONS = 5_000_000  # band-hash ids (~40 MB of int64)
MAX_BROADCAST_VERIFY_BYTES = 1 << 30  # (id, text) corpus bytes


def minhash_lsh_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    verify_corpus: pa.Table | None = None,
    verify_mode: str = "broadcast",
    collision_filter: str = "auto",
    max_broadcast_collisions: int = MAX_BROADCAST_COLLISIONS,
):
    """Near-duplicate pairs by MinHash banding + exact-Jaccard verify.

    Returns a Dataset of (id_a, id_b) with exact shingle Jaccard >=
    threshold, id_a < id_b.  The banding shuffle moves only
    (band, band_hash, id) triples.

    Verify stage: ``verify_mode="broadcast"`` ships the (id, text)
    ``verify_corpus`` table to every worker (fine when the corpus fits
    the object store); ``verify_mode="shuffle"`` instead joins the
    candidate-pair ids back to the input texts with two bucketed
    shuffle joins — the 10^12-doc path where the corpus cannot be
    broadcast (same exact-Jaccard kernel, only candidate pairs and
    their two texts ever co-locate).  ``verify_mode="auto"`` picks
    broadcast only when ``verify_corpus`` fits
    :data:`MAX_BROADCAST_VERIFY_BYTES`.

    Collision filter (keep only colliding band buckets before pair
    generation): ``collision_filter="distributed"`` semi-joins the band
    rows against the ``n >= 2`` bucket counts with Ray's native hash
    join — nothing ever lands on the driver, the 100-TB path for
    boilerplate-heavy crawls where the colliding set scales with dup
    density x bands.  ``"broadcast"`` pulls the colliding ids to the
    driver and filters with a broadcast membership set (cheaper at
    small scale: no extra shuffle of the band rows).  ``"auto"``
    (default) counts the colliding buckets — the count runs on the
    already-materialized (distributed) collision Dataset — and
    broadcasts only below ``max_broadcast_collisions``, so the driver
    hop is bounded by a constant, never by dup density.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_id, out_band, out_bh = _band_rows(
            ids, batch[text_col], k=k, num_hashes=num_hashes, bands=bands
        )
        return pa.table(
            {
                "id": pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_bh, type=pa.int64()),
            }
        )

    band_ds = ds.map_batches(to_bands, batch_format="pyarrow")

    # keep only COLLIDING buckets before any per-group work: band
    # hashes are unique per (band, doc) otherwise, and map_groups over
    # millions of single-member groups is pure overhead
    from geodata_ray.stages.relational import grouped_aggregate, semi_join

    counts = grouped_aggregate(
        band_ds, ["band_hash"], [("band_hash", "count", "n")]
    )
    # filter to collisions BEFORE any per-group work; the colliding
    # subset stays a DISTRIBUTED Dataset (object-store resident) — the
    # driver never sees it unless the bounded broadcast path is chosen
    colliding_ds = (
        counts.filter(expr="n >= 2")
        .select_columns(["band_hash"])
        .materialize()
    )
    mode = collision_filter
    n_colliding = colliding_ds.count()  # scalar; the set stays remote
    if mode == "auto":
        mode = (
            "broadcast" if n_colliding <= max_broadcast_collisions
            else "distributed"
        )
    if n_colliding == 0 and mode == "distributed":
        # an all-unique corpus leaves ZERO colliding buckets; the empty
        # filtered Dataset has no schema and would crash the native
        # hash join — the broadcast membership filter handles empty
        # exactly (and ships nothing)
        mode = "broadcast"
    if mode == "broadcast":
        cdf = colliding_ds.to_pandas()  # bounded by the auto threshold
        colliding = (
            cdf["band_hash"].to_numpy()
            if "band_hash" in cdf.columns  # empty result loses its schema
            else np.empty(0, dtype=np.int64)
        )
        band_ds = semi_join(band_ds, colliding, "band_hash")
    elif mode == "distributed":
        from geodata_ray.stages.relational import native_join

        # bucket counts are unique per band_hash, so the inner join IS
        # a semi-join (no row duplication).  Re-block the filtered side
        # first: Ray's sort-aggregate can emit schema-less empty blocks
        # that crash the native hash join, and only a sized re-batching
        # dissolves them.
        keys = colliding_ds.map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=65536
        )
        band_ds = native_join(band_ds, keys, on="band_hash")
    else:
        raise ValueError(f"unknown collision_filter {collision_filter!r}")

    # pair generation is SHARDED by band_hash (a bounded number of
    # shards, each holding complete buckets): no single-block funnel,
    # and no map_groups over thousands of single-pair buckets either.
    # The same bucket always lands in the same shard, so within-shard
    # drop_duplicates removes same-bucket repeats; the same PAIR can
    # still surface from different bands in different shards, so a
    # final grouped distinct (two-phase, pair keys only) globalizes it.
    n_shards = 32

    def add_shard(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        shard = (bh.view(np.uint64) % np.uint64(n_shards)).astype(np.int32)
        return batch.append_column("__shard", pa.array(shard))

    def shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("band_hash", sort=False):
            ids = np.unique(g["id"].to_numpy())
            if ids.size < 2:
                continue
            a, b = np.triu_indices(ids.size, k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": np.empty(0, dtype=np.int64),
                    "id_b": np.empty(0, dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates(ignore_index=True)

    # materialize the filtered band rows: the id-range probe below and
    # the pair-gen pass both consume them, and the filter join must not
    # re-execute per consumer
    band_ds = band_ds.materialize()
    sharded = band_ds.map_batches(add_shard, batch_format="pyarrow")
    raw_pairs = sharded.groupby("__shard").map_groups(
        shard_pairs, batch_format="pandas"
    )

    from geodata_ray.stages.relational import grouped_aggregate as _gagg

    def drop_n(batch: pa.Table) -> pa.Table:
        return batch.select(["id_a", "id_b"])

    def _shuffle_distinct(rp):
        # batch_size is EXPLICIT here: Ray's sort-aggregate emits
        # schema-less empty blocks when partitions outnumber rows, and
        # the native hash join crashes on them; bundling blocks into
        # sized batches re-blocks the stream and dissolves the empties
        # (a plain per-block map_batches SKIPS empty blocks and cannot
        # heal them).
        return _gagg(
            rp, ["id_a", "id_b"], [("id_a", "count", "__n")]
        ).map_batches(drop_n, batch_format="pyarrow", batch_size=65536)

    # cross-band pair distinct.  Ray's sort-based groupby costs ~26 s
    # at 3M raw pairs (measured, its documented floor); when both ids
    # fit [0, 2^31) the pairs pack into ONE int64 and the fan-in-8
    # tree distinct (an allreduce, not a shuffle) does the same job in
    # ~2 s — the exact machinery graphcc uses for edge distinct.  The
    # id range is probed on the (materialized, collision-filtered)
    # band rows; past the packed bound the tree RAISES driver-side and
    # the shuffle distinct takes over.
    from ray.data.aggregate import Max, Min

    stats = band_ds.aggregate(Min("id"), Max("id"))
    lo = stats.get("min(id)") if stats else None
    hi = stats.get("max(id)") if stats else None
    if lo is not None and lo >= 0 and hi is not None and hi < (1 << 31):
        from geodata_ray.stages.graphcc import distinct_edges_packed

        raw_pairs = raw_pairs.materialize()
        try:
            pairs = distinct_edges_packed(
                raw_pairs, src="id_a", dst="id_b"
            )
        except ValueError:  # pair volume past the one-task bound
            pairs = _shuffle_distinct(raw_pairs)
    else:
        pairs = _shuffle_distinct(raw_pairs)

    if verify_mode == "auto":
        verify_mode = (
            "broadcast"
            if verify_corpus is not None
            and verify_corpus.nbytes <= MAX_BROADCAST_VERIFY_BYTES
            else "shuffle"
        )
    if verify_mode == "shuffle":
        return _verify_pairs_shuffle(pairs, ds, id_col, text_col, k, threshold)
    if verify_corpus is None:
        return pairs

    try:
        import ray

        corpus_ref = ray.put(verify_corpus)
    except Exception:
        corpus_ref = verify_corpus

    def verify(batch: pa.Table) -> pa.Table:
        corpus = corpus_ref
        try:
            import ray

            if isinstance(corpus, ray.ObjectRef):
                corpus = ray.get(corpus)
        except Exception:
            pass
        texts = dict(
            zip(corpus[id_col].to_pylist(), corpus[text_col].to_pylist())
        )
        ia = batch["id_a"].to_numpy()
        ib = batch["id_b"].to_numpy()
        keep = _pairwise_jaccard_keep(
            [texts[int(x)] for x in ia],
            [texts[int(x)] for x in ib],
            k,
            threshold,
        )
        return batch.filter(pa.array(keep))

    return pairs.map_batches(verify, batch_format="pyarrow")


def _pairwise_jaccard_keep(texts_a, texts_b, k, threshold) -> np.ndarray:
    """Exact shingle-Jaccard >= threshold per (text_a, text_b) row.
    Shingle hashing is one vectorized pass per column; only the
    per-row sorted-set intersection remains row-wise (C-speed
    ``intersect1d`` over small unique arrays)."""
    ca, fa = _batch_shingles(texts_a, k)
    cb, fb = _batch_shingles(texts_b, k)
    oa = np.r_[0, np.cumsum(ca)]
    ob = np.r_[0, np.cumsum(cb)]
    keep = np.zeros(ca.size, dtype=bool)
    for i in range(ca.size):
        sa = fa[oa[i] : oa[i + 1]]
        sb = fb[ob[i] : ob[i + 1]]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        keep[i] = union > 0 and inter / union >= threshold
    return keep


def _verify_pairs_auto(pairs, corpus_ds, id_col, text_col, k, threshold,
                       *, shuffle_bound: int = 50_000):
    """Candidate-pair verify with a robustness switch: above
    ``shuffle_bound`` candidates, the fully-distributed join-back path
    (:func:`_verify_pairs_shuffle`); below it, a bounded local verify —
    semi-join the corpus to the candidate ids (broadcast id set), pull
    the <= 2n candidate texts, and run the exact-Jaccard kernel once.
    The small path exists because Ray's native hash join CRASHES any
    partition that receives zero left shards (zero-column builder
    table -> FieldRef miss), which sparse candidate sets make likely;
    the bounded path never routes a sparse side through it."""
    import ray
    import ray.data as rd

    pairs = pairs.materialize()
    n = pairs.count()
    if n == 0:
        return ray_empty_pairs()
    if n > shuffle_bound:
        return _verify_pairs_shuffle(
            pairs, corpus_ds, id_col, text_col, k, threshold
        )
    ptbl = pa.concat_tables(
        ray.get(pairs.to_arrow_refs()), promote_options="default"
    )
    ids = np.unique(
        np.concatenate(
            [
                ptbl["id_a"].to_numpy(zero_copy_only=False),
                ptbl["id_b"].to_numpy(zero_copy_only=False),
            ]
        )
    )
    from geodata_ray.stages.relational import semi_join

    cand = semi_join(
        corpus_ds.map_batches(
            lambda b: pa.table(
                {id_col: pc.cast(b[id_col], pa.int64()),
                 text_col: b[text_col]}
            ),
            batch_format="pyarrow",
        ),
        ids,
        id_col,
    )
    ctbl = pa.concat_tables(
        ray.get(cand.to_arrow_refs()), promote_options="default"
    )
    texts = dict(
        zip(ctbl[id_col].to_pylist(), ctbl[text_col].to_pylist())
    )
    ia = ptbl["id_a"].to_pylist()
    ib = ptbl["id_b"].to_pylist()
    keep = _pairwise_jaccard_keep(
        [texts[int(x)] for x in ia],
        [texts[int(x)] for x in ib],
        k,
        threshold,
    )
    out = ptbl.filter(pa.array(keep))
    if out.num_rows == 0:
        return ray_empty_pairs()
    return rd.from_arrow(out)


def _verify_pairs_shuffle(pairs, corpus_ds, id_col, text_col, k, threshold):
    """Scale-path verify: join pair ids to texts (both sides) via the
    engine's bucketed ``shuffle_join`` (schema-stable by construction:
    every bucket is merged with acero against the declared unified
    schema), then the exact shingle-Jaccard kernel.  Only candidate
    pairs and their two texts ever co-locate.

    NOT ``native_join`` here: the candidate-pair side is small and
    sparse, and Ray's built-in hash join was observed (flaky, under
    full-suite load) to emit a malformed empty block when a join
    partition receives zero left shards — chaining a second join over
    that output then fails inside acero with an ambiguous
    ``FieldRef.Name(id_b)``.  The large dense-keyed ``native_join``
    sites elsewhere never hit this because every partition is
    occupied."""
    from geodata_ray.stages.relational import shuffle_join

    def as_side(side):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"id_{side}": batch[id_col],
                    f"text_{side}": batch[text_col],
                }
            )

        return f

    ca = corpus_ds.map_batches(as_side("a"), batch_format="pyarrow")
    cb = corpus_ds.map_batches(as_side("b"), batch_format="pyarrow")
    j1 = shuffle_join(pairs, ca, ["id_a"], num_buckets=8)
    j2 = shuffle_join(j1, cb, ["id_b"], num_buckets=8)

    def verify(batch: pa.Table) -> pa.Table:
        keep = _pairwise_jaccard_keep(
            batch["text_a"], batch["text_b"], k, threshold
        )
        return batch.filter(pa.array(keep)).select(["id_a", "id_b"])

    return j2.map_batches(verify, batch_format="pyarrow")


def simhash_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """64-bit SimHash per doc (token-hash bit-vote fingerprint).

    Fully vectorized: one column-wise pass hashes every token in the
    batch (``hash_tokens_batch``), bit votes are a single segmented
    ``add.reduceat`` — no per-doc Python loop.  Bit-identical to the
    scalar definition (same token-hash chain, same bit packing)."""
    ids = batch[id_col]
    n = len(batch)
    if n == 0:
        return pa.table({id_col: ids, "simhash": pa.array([], pa.int64())})
    toks = pc.split_pattern(_as_string_array(batch[text_col]), " ")
    lengths = (
        pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    th = hash_tokens_batch(_as_string_array(toks).flatten())
    bit_idx = np.arange(64, dtype=np.uint64)
    bits = ((th[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int32)
    # every doc has >= 1 token (''.split(' ') == ['']), so reduceat
    # segments are never empty
    offs = np.r_[0, np.cumsum(lengths)[:-1]]
    votes = np.add.reduceat(bits, offs, axis=0).astype(np.int64)
    flags = (votes * 2 - lengths[:, None]) > 0
    out = np.packbits(flags[:, ::-1], axis=1).view(">u8").ravel()
    return pa.table(
        {id_col: ids, "simhash": pa.array(out.astype(np.uint64).astype(np.int64))}
    )


def hash_strings_nomemo(strings) -> np.ndarray:
    """Deterministic 64-bit hash per string WITHOUT memoization — for
    document-sized or join-key inputs where caching every distinct
    value would grow worker memory without bound (the token memo is
    only safe for small vocabularies).  blake2b runs at C speed
    (a Python byte loop costs ~µs/byte on 10KB documents)."""
    import hashlib

    out = np.empty(len(strings), dtype=np.uint64)
    for i, t in enumerate(strings):
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "little")
    return out


def exact_dedup_normalized(
    ds, *, id_col: str = "doc_id", text_col: str = "text", normalize: bool = True
):
    """Exact dedup on (optionally lower-cased) text: (text_hash group)
    -> min id + copy count.  Only 64-bit hashes shuffle — raw document
    text is never a shuffle key (at 10^12 docs the text column is the
    dataset; its blake2b-64 fingerprints are 8 bytes/row)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch[text_col]) if normalize else batch[text_col]
        h = hash_strings_nomemo(texts.to_pylist())
        return pa.table(
            {id_col: batch[id_col], "text_hash": pa.array(h.astype(np.int64))}
        )

    from geodata_ray.stages.relational import grouped_aggregate

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = grouped_aggregate(
        hashed,
        ["text_hash"],
        [(id_col, "min", id_col), (id_col, "count", "n_copies")],
    )
    return out.select_columns([id_col, "n_copies"])


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def _as_matrix(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def embedding_dup_pairs(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    ref_table: pa.Table | None = None,
):
    """Pairs (id_a < id_b) with cosine >= threshold.

    Baseline-exact plan: the corpus matrix (normalized) is broadcast;
    each batch matmuls its rows against it (blocked O(n^2/B) with
    recall 1).  For corpora too large to broadcast, bucket by
    hyperplane LSH first (see :func:`hyperplane_buckets`) and verify
    within buckets — same kernel, partitioned.
    """
    if ref_table is None:
        raise ValueError("ref_table (id, vec) required for broadcast plan")
    ref_ids = ref_table[id_col].to_numpy()
    M = _as_matrix(ref_table[vec_col])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    try:
        import ray

        ref = ray.put((ref_ids, M))
    except Exception:
        ref = (ref_ids, M)

    def pairs(batch: pa.Table) -> pa.Table:
        r = ref
        try:
            import ray

            if isinstance(r, ray.ObjectRef):
                r = ray.get(r)
        except Exception:
            pass
        rids, RM = r
        ids = batch[id_col].to_numpy()
        V = _as_matrix(batch[vec_col])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = V @ RM.T
        ai, bj = np.nonzero(sims >= threshold)
        a = ids[ai]
        b = rids[bj]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


_HYPERPLANES: dict[tuple[int, int], np.ndarray] = {}


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    key = (dim, bits, seed)
    H = _HYPERPLANES.get(key)
    if H is None:
        rng = np.random.default_rng(seed)
        H = rng.standard_normal((dim, bits))
        _HYPERPLANES[key] = H
    return H


def embedding_dup_pairs_lsh(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bits: int = 8,
    tables: int = 8,
    n_shards: int = 32,
):
    """Bucketed embedding near-dup: the 100-TB path, end-to-end.

    Multi-table hyperplane LSH (OR-amplified: ``tables`` independent
    ``bits``-bit sign buckets, seeds 7..7+tables-1): a pair is a
    candidate if it co-buckets in ANY table, then the EXACT cosine
    kernel runs within buckets — so precision is 1 and the only
    approximation is recall (a cos>=0.99 pair must flip a bit in all
    ``tables`` tables to be missed; with 8x8 the miss probability is
    ~(1-(1-p)^8)^8 for per-bit flip p<<1 — on the driver fixture the
    result is bit-equal to the exact broadcast plan, which is what the
    DuckDB oracle checks).

    Physical plan: vectors ship once per table into hash-sharded
    groups (bounded ``n_shards`` shards — no per-bucket map_groups over
    thousands of tiny groups, no single-block stage), pairs dedupe with
    a grouped distinct.  Contrast with :func:`embedding_dup_pairs`,
    whose broadcast matrix is the small-corpus exact baseline.
    """

    def bucketize_all(batch: pa.Table) -> pa.Table:
        V = _as_matrix(batch[vec_col])
        n = len(batch)
        ids = batch[id_col].to_numpy()
        out_id, out_t, out_b, out_sh, out_vec = [], [], [], [], []
        for t in range(tables):
            H = _hyperplanes(V.shape[1], bits, seed=7 + t)
            code = (V @ H > 0).astype(np.uint64)
            bucket = np.zeros(n, dtype=np.uint64)
            for j in range(bits):
                bucket = (bucket << np.uint64(1)) | code[:, j]
            out_id.append(ids)
            out_t.append(np.full(n, t, dtype=np.int32))
            out_b.append(bucket.astype(np.int64))
            with np.errstate(over="ignore"):  # u64 wrap is intended
                shard = splitmix64(
                    bucket ^ (np.uint64(t) * _C1)
                ) % np.uint64(n_shards)
            out_sh.append(shard.astype(np.int32))
        vecs = batch[vec_col]
        vec_rep = pa.concat_arrays(
            [vecs.combine_chunks() if isinstance(vecs, pa.ChunkedArray)
             else vecs] * tables
        )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "table": pa.array(np.concatenate(out_t)),
                "bucket": pa.array(np.concatenate(out_b)),
                "__shard": pa.array(np.concatenate(out_sh)),
                vec_col: vec_rep,
            }
        )

    cand = ds.map_batches(bucketize_all, batch_format="pyarrow")

    def shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby(["table", "bucket"], sort=False):
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = V @ V.T
            ai, bj = np.nonzero(sims >= threshold)
            a, b = ids[ai], ids[bj]
            keep = a < b
            out_a.append(a[keep])
            out_b.append(b[keep])
        if not out_a:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates(ignore_index=True)

    raw = cand.groupby("__shard").map_groups(shard_pairs, batch_format="pandas")

    from geodata_ray.stages.relational import grouped_aggregate as _gagg

    def drop_n(batch: pa.Table) -> pa.Table:
        return batch.select(["id_a", "id_b"])

    return _gagg(
        raw, ["id_a", "id_b"], [("id_a", "count", "__n")]
    ).map_batches(drop_n, batch_format="pyarrow", batch_size=65536)


EMBED_BROADCAST_MAX_ROWS = 1_000_000  # ~0.5 GB at d=128 float32


def embedding_dup_pairs_auto(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    ref_table: pa.Table | None = None,
    max_broadcast_rows: int = EMBED_BROADCAST_MAX_ROWS,
    **lsh_kwargs,
):
    """Auto-select the embedding near-dup plan (threshold documented in
    DEPLOYMENT.md): the exact broadcast matmul when a ``ref_table``
    corpus is provided and fits the object store
    (:data:`EMBED_BROADCAST_MAX_ROWS`), else the bucketed multi-table
    hyperplane-LSH plan — the 10^12-vector path that never broadcasts
    the corpus.  Both return the same (id_a, id_b) schema.

    The LSH plan pairs vectors WITHIN ``ds`` only, so a ``ref_table``
    too large to broadcast is an ERROR, not a silent semantics change
    (ds-vs-ref matching would quietly become ds-vs-ds and miss every
    duplicate of a reference vector): union the reference corpus into
    ``ds`` and call with ``ref_table=None``, or raise the bound."""
    if ref_table is not None:
        if ref_table.num_rows <= max_broadcast_rows:
            return embedding_dup_pairs(
                ds, id_col=id_col, vec_col=vec_col, threshold=threshold,
                ref_table=ref_table,
            )
        raise ValueError(
            f"ref_table has {ref_table.num_rows} rows, above the "
            f"{max_broadcast_rows}-row broadcast bound; union it into "
            f"ds and pass ref_table=None for the LSH plan"
        )
    return embedding_dup_pairs_lsh(
        ds, id_col=id_col, vec_col=vec_col, threshold=threshold,
        **lsh_kwargs,
    )


def hyperplane_buckets(
    ds, *, id_col: str = "vec_id", vec_col: str = "embedding", bits: int = 16
):
    """Signed-random-projection LSH bucket per vector (scale path for
    embedding dedup / ANN: groupby bucket, verify within)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        V = _as_matrix(batch[vec_col])
        H = _hyperplanes(V.shape[1], bits)
        code = (V @ H > 0).astype(np.uint64)
        bucket = np.zeros(len(batch), dtype=np.uint64)
        for j in range(bits):
            bucket = (bucket << np.uint64(1)) | code[:, j]
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket.astype(np.int64)),
            }
        )

    return ds.map_batches(bucketize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# paragraph-level exact dedup
# ---------------------------------------------------------------------------

_PARA_MAX = 1 << 20  # max paragraphs per document (order-key packing)


def paragraph_dedup(
    ds, *, id_col: str = "doc_id", text_col: str = "text", sep: str = "\n\n"
):
    """Corpus-wide exact paragraph dedup, FIRST occurrence wins in
    global (doc, paragraph-index) order — the sub-document granularity
    of exact dedup (reference-class pipelines dedup paragraphs across
    pages because boilerplate repeats below document level).

    Explodes each document into (id, para_idx, para_hash) rows — only
    8-byte hashes ever shuffle, never paragraph text — then a single
    two-phase grouped min over the packed order key
    ``id * 2^20 + para_idx`` finds each distinct paragraph's earliest
    occurrence; the winner's identity decodes straight from the min
    (no join back).  Output: one row per DISTINCT paragraph — the
    keeper's (id, para_idx) plus its corpus-wide copy count.

    Requires ``id_col`` < 2^43 and at most 2^20 paragraphs per doc
    (packed int64); both hold at 10^12-doc scale.
    """

    def explode(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        parts = pc.split_pattern(texts, sep)
        nper = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        nper = nper.astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if int(nper.max(initial=0)) >= _PARA_MAX:
            raise ValueError("paragraph_dedup: >2^20 paragraphs in one doc")
        flat = parts.combine_chunks() if isinstance(
            parts, pa.ChunkedArray) else parts
        flat_vals = flat.flatten()
        h = hash_strings_nomemo(flat_vals.to_pylist()).astype(np.int64)
        rep_ids = np.repeat(ids, nper)
        starts = np.repeat(np.cumsum(nper) - nper, nper)
        para_idx = np.arange(rep_ids.size, dtype=np.int64) - starts
        order = rep_ids * _PARA_MAX + para_idx
        return pa.table(
            {
                "para_hash": pa.array(h),
                "order_key": pa.array(order),
            }
        )

    from geodata_ray.stages.relational import grouped_aggregate

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    winners = grouped_aggregate(
        exploded,
        ["para_hash"],
        [("order_key", "min", "min_order"), ("order_key", "count", "n_copies")],
    )

    def decode(batch: pa.Table) -> pa.Table:
        mo = batch["min_order"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(mo // _PARA_MAX),
                "para_idx": pa.array(mo % _PARA_MAX),
                "n_copies": batch["n_copies"],
            }
        )

    return winners.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------

CDC_WINDOW = 8
CDC_MASK_MOD = 64  # boundary iff splitmix64(window) % 64 == 0 -> mean
                   # chunk ~64 bytes at gate scale (tune upward for
                   # storage-dedup use)


def cdc_chunk_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text",
    mask_mod: int = CDC_MASK_MOD,
) -> pa.Table:
    """Content-defined chunk boundaries for one batch of docs — the
    sub-document dedup primitive (FastCDC-style, fixed 8-byte window):
    a cut falls AFTER byte position i (0-based, window s[i-7..i],
    7 <= i <= L-2) iff splitmix64(bigendian_pack(window)) % mask_mod
    == 0.  Insertions/deletions only shift boundaries locally, so
    shared content between near-identical docs chunks identically —
    chunk-hash equality then finds shared spans exact dedup misses.

    Returns (id, chunk_idx, start_byte, n_bytes); an empty doc is one
    zero-length chunk.  Fully vectorized: the window pack is 8 shifted
    slices of the batch's flat byte buffer; doc-boundary windows are
    masked by owner comparison (the n-gram kernel's technique).

    ASCII note (same contract as stages/lm.py): the kernel packs
    BYTES; the SQL mirror packs codepoints via ascii() — identical on
    the pure-ASCII gate corpus."""
    from geodata_ray.sources.synth import splitmix64
    from geodata_ray.stages.lm import _byte_view

    n = len(batch)
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], batch[id_col].type),
                "chunk_idx": pa.array([], pa.int64()),
                "start_byte": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
            }
        )
    data, offsets = _byte_view(batch[text_col])
    total = int(offsets[-1])
    w = CDC_WINDOW
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    cuts_pos = np.empty(0, dtype=np.int64)
    if total >= w:
        # global window-end positions i in [w-1, total-1]
        nwin = total - w + 1
        p = np.zeros(nwin, dtype=np.uint64)
        for k in range(w):
            p |= data[k: k + nwin].astype(np.uint64) << np.uint64(
                8 * (w - 1 - k)
            )
        h = splitmix64(p)
        i_end = np.arange(w - 1, total, dtype=np.int64)
        same_doc = doc_of[i_end - (w - 1)] == doc_of[i_end]
        # exclude the doc's last byte (a cut there is a no-op)
        not_last = i_end != offsets[doc_of[i_end] + 1] - 1
        boundary = (h % np.uint64(mask_mod) == 0) & same_doc & not_last
        cuts_pos = i_end[boundary] + 1  # global 0-based chunk starts

    cut_doc = doc_of[cuts_pos] if cuts_pos.size else np.empty(
        0, dtype=np.int64
    )
    # merge per-doc head starts with cut starts (both doc-ascending)
    all_doc = np.concatenate([np.arange(n, dtype=np.int64), cut_doc])
    all_start = np.concatenate([offsets[:-1], cuts_pos])
    order = np.lexsort((all_start, all_doc))
    all_doc, all_start = all_doc[order], all_start[order]
    nxt = np.empty_like(all_start)
    nxt[:-1] = all_start[1:]
    nxt[-1] = offsets[all_doc[-1] + 1]
    tail = np.empty(all_doc.size, dtype=bool)
    tail[:-1] = all_doc[1:] != all_doc[:-1]
    tail[-1] = True
    ends = np.where(tail, offsets[all_doc + 1], nxt)
    # chunk_idx: position within doc
    doc_first_row = np.zeros(n, dtype=np.int64)
    np.cumsum(np.bincount(all_doc, minlength=n)[:-1], out=doc_first_row[1:])
    chunk_idx = np.arange(all_doc.size, dtype=np.int64) - doc_first_row[
        all_doc
    ]
    return pa.table(
        {
            id_col: pa.array(ids[all_doc]),
            "chunk_idx": pa.array(chunk_idx),
            "start_byte": pa.array(all_start - offsets[all_doc]),
            "n_bytes": pa.array(ends - all_start),
        }
    )


def cdc_chunks(ds, *, id_col: str = "doc_id", text_col: str = "text",
               mask_mod: int = CDC_MASK_MOD):
    """Dataset wrapper over ``cdc_chunk_batch`` — stateless, zero
    shuffle; at corpus scale the stage is read-bound."""
    return ds.map_batches(
        lambda b: cdc_chunk_batch(
            b, id_col=id_col, text_col=text_col, mask_mod=mask_mod
        ),
        batch_format="pyarrow",
    )


def cdc_duplicate_spans(
    ds, *, id_col: str = "doc_id", text_col: str = "text",
    mask_mod: int = CDC_MASK_MOD,
):
    """Sub-document duplicate-span detection: CDC-chunk every doc,
    fingerprint each chunk (blake2b-64 — the exact-dedup precedent:
    same groups as content equality modulo ~n^2/2^65 collisions), keep
    chunk groups with > 1 member.  Finds boilerplate/quoted spans
    SHARED between otherwise-different documents, which whole-doc
    dedup cannot see.

    Returns (id_col = min owner, n_bytes, n_copies > 1) per duplicated
    span.  Scale shape: chunks tile each doc, so a batch's chunk
    strings are ONE re-offsetting of its flat byte buffer (no per-
    chunk gather); only 8-byte fingerprints + 2 ints shuffle."""
    from geodata_ray.stages.relational import grouped_aggregate

    def spans(batch: pa.Table) -> pa.Table:
        from geodata_ray.stages.lm import _byte_view

        tbl = cdc_chunk_batch(
            batch, id_col=id_col, text_col=text_col, mask_mod=mask_mod
        )
        if len(tbl) == 0:
            return pa.table(
                {
                    "fp": pa.array([], pa.int64()),
                    id_col: pa.array([], batch[id_col].type),
                    "nb": pa.array([], pa.int64()),
                }
            )
        data, _ = _byte_view(batch[text_col])
        nb = tbl["n_bytes"].to_numpy()
        off = np.zeros(nb.size + 1, dtype=np.int32)
        np.cumsum(nb, out=off[1:])
        # chunks tile the docs in order -> their concatenation IS the
        # flat byte buffer; one offsets array re-slices it into chunk
        # strings with no gather
        sa = pa.Array.from_buffers(
            pa.string(), nb.size,
            [None, pa.py_buffer(off.tobytes()),
             pa.py_buffer(data.tobytes())],
        )
        fp = hash_strings_nomemo(sa.to_pylist()).astype(np.int64)
        return pa.table(
            {
                "fp": pa.array(fp),
                id_col: tbl[id_col],
                "nb": tbl["n_bytes"],
            }
        )

    parts = ds.map_batches(spans, batch_format="pyarrow")
    agg = grouped_aggregate(
        parts,
        ["fp"],
        [(id_col, "min", id_col), ("nb", "min", "n_bytes"),
         ("nb", "count", "n_copies")],
    )
    return agg.filter(expr="n_copies > 1").select_columns(
        [id_col, "n_bytes", "n_copies"]
    )


def _edit_le1_mask(a_list: list, b_list: list) -> np.ndarray:
    """Vectorized edit-distance<=1 verification for candidate string
    pairs.  Pairs are grouped into (len_a, len_b) classes; inside a
    class every check is a fixed-width numpy byte-matrix kernel (no
    per-pair Python).  BYTE-level semantics (== char-level for ASCII;
    multi-byte UTF-8 chars count per byte, documented contract)."""
    n = len(a_list)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    ab = [s.encode("utf-8") for s in a_list]
    bb = [s.encode("utf-8") for s in b_list]
    la = np.fromiter((len(x) for x in ab), np.int64, n)
    lb = np.fromiter((len(x) for x in bb), np.int64, n)
    for (ca, cb) in set(zip(la.tolist(), lb.tolist())):
        if abs(ca - cb) > 1:
            continue
        sel = np.flatnonzero((la == ca) & (lb == cb))
        A = np.frombuffer(
            b"".join(ab[i] for i in sel), np.uint8
        ).reshape(len(sel), ca) if ca else np.zeros((len(sel), 0), np.uint8)
        B = np.frombuffer(
            b"".join(bb[i] for i in sel), np.uint8
        ).reshape(len(sel), cb) if cb else np.zeros((len(sel), 0), np.uint8)
        if ca == cb:
            ok = (A != B).sum(axis=1) <= 1
        else:
            if ca > cb:  # make A the shorter side
                A, B, short = B, A, cb
            else:
                short = ca
            if short == 0:  # "" vs one char: always distance 1
                out[sel] = True
                continue
            # deletion alignment: first mismatch p in the aligned
            # prefix, then A[p:] must equal B shifted one right
            cmp0 = A != B[:, :short]
            has = cmp0.any(axis=1)
            p = np.where(has, cmp0.argmax(axis=1), short)
            cmp1 = A != B[:, 1 : short + 1]
            anyb = cmp1.any(axis=1)
            lastbad = np.where(
                anyb, short - 1 - cmp1[:, ::-1].argmax(axis=1), -1
            )
            ok = lastbad < p
        out[sel] = ok
    return out


def fuzzy_edit1_pairs(
    left,
    right,
    *,
    id_col: str = "id",
    str_col: str = "name",
    num_partitions: int = 8,
):
    """Record-linkage join: all (left_id, right_id) pairs whose strings
    are within edit distance 1 (SymSpell-style deletion-neighborhood
    blocking).

    Why it works: if ``edit(a, b) <= 1`` then the variant sets
    ``{s} U {del(s, i)}`` of a and b intersect (equality, the deleted
    form, or both deleting the substituted position).  So: each side
    emits 64-bit fingerprints of its variants (~len+1 rows per string
    — the exchange is (hash, id, short-string) tuples, never documents),
    ONE hash equi-join produces candidates, and a vectorized byte-matrix
    verify removes the false positives (shared-variant pairs at
    distance 2, hash collisions).  Strings ride along because this
    operator targets short keys (names, titles, hosts); for long
    strings join the pair ids back instead.  Identical strings
    cross-product inside a block — exact-dedup each side first, as any
    all-pairs similarity join requires.
    """
    from geodata_ray.stages.relational import grouped_aggregate, native_join

    def variants(tag: str):
        def f(batch: pa.Table) -> pa.Table:
            s = pc.cast(batch[str_col], pa.string())
            ids = batch[id_col]
            strs = s.to_pylist()
            hs, hid, hname = [], [], []
            # the string itself
            hs.append(hash_strings_nomemo(strs).view(np.int64))
            hid.append(ids)
            hname.append(s)
            nbytes = pc.binary_length(s).to_numpy(zero_copy_only=False)
            maxlen = int(nbytes.max()) if len(nbytes) else 0
            for i in range(maxlen):
                mask = pa.array(nbytes > i)
                sub_s = s.filter(mask)
                pre = pc.utf8_slice_codeunits(sub_s, 0, i)
                suf = pc.utf8_slice_codeunits(sub_s, i + 1, 2**30)
                var = pc.binary_join_element_wise(pre, suf, "")
                hs.append(
                    hash_strings_nomemo(var.to_pylist()).view(np.int64)
                )
                hid.append(ids.filter(mask))
                hname.append(sub_s)
            return pa.table(
                {
                    "__h": pa.array(np.concatenate(hs), pa.int64()),
                    f"{tag}_id": pa.concat_arrays(
                        [pa.array(c) if not isinstance(c, (pa.Array, pa.ChunkedArray)) else pc.cast(c, pa.int64()).combine_chunks() for c in hid]
                    ),
                    f"{tag}_name": pa.concat_arrays(
                        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in hname]
                    ),
                }
            )

        return f

    lv = left.map_batches(variants("left"), batch_format="pyarrow")
    rv = right.map_batches(variants("right"), batch_format="pyarrow")
    cand = native_join(lv, rv, on="__h", num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        ok = _edit_le1_mask(
            batch["left_name"].to_pylist(), batch["right_name"].to_pylist()
        )
        t = batch.filter(pa.array(ok))
        return t.select(["left_id", "right_id"])

    pairs = cand.map_batches(verify, batch_format="pyarrow")
    out = grouped_aggregate(
        pairs, ["left_id", "right_id"], [("left_id", "count", "__c")]
    )
    return out.drop_columns(["__c"])


def _setsim_rep_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold_num: int = 7,
    threshold_den: int = 10,
    num_buckets: int = 32,
):
    """Prefix-filter core of :func:`setsim_join_pairs`, run over
    DISTINCT texts only (the caller collapses exact duplicates first —
    identical shingle sets make every prefix bucket collide, turning
    candidate generation quadratic in duplicate density).

    EXACT set-similarity self-join by prefix filtering (Chaudhuri
    et al.'s SSJoin / PPJoin blocking): all pairs with shingle-set
    Jaccard >= threshold_num/threshold_den, id_a < id_b — recall
    exactly 1 by construction, no MinHash randomness.

    Plan (all distributed, no corpus broadcast anywhere):
      1. explode per-doc sorted-unique shingle hashes (one vectorized
         pass, ``_batch_shingles``) into (id, sh, m) rows;
      2. document frequency per shingle (pre-combined aggregate), then
         attach df to every row via the native hash join — the global
         token order (df ASC, sh ASC) is the classic rare-first prefix
         order and needs NO vocabulary broadcast;
      3. per doc keep only the first ``m - ceil(t*m) + 1`` shingles in
         that order (integer-exact ceil — a float ``0.7*m`` rounds the
         wrong way at m=10): any two sets with Jaccard >= t must share
         a prefix token (pigeonhole over the shared total order);
      4. prune prefix tokens seen once (they cannot produce a pair),
         shard the survivors by token hash, generate size-filtered
         candidate pairs per token (``min_m * den >= num * max_m`` —
         Jaccard of sets sized (ma<=mb) is at most ma/mb), distinct;
      5. verify exact Jaccard by joining candidate ids back to their
         texts (``_verify_pairs_shuffle``) — only candidate pairs and
         their two texts ever co-locate.

    Scale notes: step 2's df table is vocabulary-sized but never
    leaves the object store (hash join, not broadcast); step 4's
    per-token groups are bounded by the df of each doc's RAREST
    tokens, the quantity prefix filtering minimizes by design; hot
    stop-shingle groups would signal threshold too low, not skew to
    salt.  Shingle hashing is the same u64 kernel the (green)
    MinHash verify path uses — collisions are ~2^-64 per pair.
    """
    from geodata_ray.stages.relational import grouped_aggregate, native_join
    from geodata_ray.stages.windows import _tag_bucket

    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    tnum, tden = int(threshold_num), int(threshold_den)
    threshold = tnum / tden

    def explode(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        counts, flat = _batch_shingles(batch[text_col], k)
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, counts), pa.int64()),
                "sh": pa.array(flat.view(np.int64), pa.int64()),
                "m": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )

    # ex feeds both the df aggregate and the join; pref feeds both the
    # collision count and the key filter — materialize each once, or
    # the whole upstream chain re-executes per consumer
    ex = ds.map_batches(explode, batch_format="pyarrow").materialize()
    dfc = grouped_aggregate(ex, ["sh"], [("sh", "count", "df")]).materialize()
    if dfc.count() == 0:
        # every text shorter than k tokens -> zero shingles anywhere;
        # no pair can exist (and the concat below would be schema-less)
        return ray_empty_pairs()
    if dfc.count() <= 5_000_000:
        # bounded vocabulary: broadcast the (sh -> df) map once and
        # attach per batch with a sorted-array lookup — one exchange
        # fewer than the hash join, and every sh is guaranteed present
        import ray

        dtbl = pa.concat_tables(
            ray.get(dfc.to_arrow_refs()), promote_options="default"
        )
        sh_sorted = dtbl["sh"].to_numpy(zero_copy_only=False)
        order = np.argsort(sh_sorted)
        df_ref = ray.put(
            (sh_sorted[order],
             dtbl["df"].to_numpy(zero_copy_only=False)[order])
        )

        def attach(batch: pa.Table) -> pa.Table:
            import ray as _r

            ks, vs = _r.get(df_ref)
            sh = batch["sh"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ks, sh)
            return batch.append_column("df", pa.array(vs[idx]))

        exdf = ex.map_batches(attach, batch_format="pyarrow")
    else:
        # re-batch: sort-aggregate can emit schema-less empty blocks
        # that crash the native hash join
        exdf = native_join(
            ex,
            dfc.map_batches(
                lambda b: b, batch_format="pyarrow", batch_size=65536
            ),
            on="sh",
        )

    def prefix(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        sh = t["sh"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        df = t["df"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sh, df, ids))
        ids, sh, m, df = ids[order], sh[order], m[order], df[order]
        new = np.ones(ids.size, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(ids.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, ids.size))
        )
        alpha = -((-tnum * m) // tden)  # ceil(t*m), exact integers
        keep = rank < (m - alpha + 1)
        return pa.table(
            {
                "sh": pa.array(sh[keep]),
                "id": pa.array(ids[keep]),
                "m": pa.array(m[keep]),
            }
        )

    bucketed = _tag_bucket(exdf, "id", num_buckets)
    # sized re-batching after map_groups: the sort-groupby emits
    # schema-less empty blocks that crash the native hash join
    pref = bucketed.groupby("__b").map_groups(
        lambda g: prefix(g.drop_columns(["__b"])), batch_format="pyarrow"
    ).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=65536
    ).materialize()

    # collision pre-filter: a prefix token held by one doc yields no pair
    pcounts = grouped_aggregate(pref, ["sh"], [("sh", "count", "n")])
    keys = (
        pcounts.filter(expr="n >= 2")
        .select_columns(["sh"])
        .map_batches(lambda b: b, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )
    n_keys = keys.count()
    if n_keys == 0:
        return ray_empty_pairs()
    if n_keys <= 5_000_000:
        # bounded colliding set: broadcast membership filter (no
        # second exchange of the prefix rows) — minhash's auto pattern
        import ray

        from geodata_ray.stages.relational import semi_join

        key_arr = pa.concat_tables(
            ray.get(keys.to_arrow_refs()), promote_options="default"
        )["sh"].to_numpy(zero_copy_only=False)
        pref = semi_join(pref, key_arr, "sh")
    else:
        pref = native_join(pref, keys, on="sh")

    n_shards = 32

    def add_shard(batch: pa.Table) -> pa.Table:
        sh = batch["sh"].to_numpy(zero_copy_only=False)
        shard = (sh.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
        return batch.append_column("__shard", pa.array(shard))

    def shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("sh", sort=False):
            sub = g[["id", "m"]].drop_duplicates()
            ids = sub["id"].to_numpy()
            ms = sub["m"].to_numpy()
            if ids.size < 2:
                continue
            o = np.argsort(ids)
            ids, ms = ids[o], ms[o]
            a, b = np.triu_indices(ids.size, k=1)
            ok = (
                np.minimum(ms[a], ms[b]) * tden
                >= tnum * np.maximum(ms[a], ms[b])
            )
            out_a.append(ids[a][ok])
            out_b.append(ids[b][ok])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": np.empty(0, dtype=np.int64),
                    "id_b": np.empty(0, dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates(ignore_index=True)

    sharded = pref.map_batches(add_shard, batch_format="pyarrow")
    raw_pairs = sharded.groupby("__shard").map_groups(
        shard_pairs, batch_format="pandas"
    )
    pairs = grouped_aggregate(
        raw_pairs, ["id_a", "id_b"], [("id_a", "count", "__n")]
    ).map_batches(
        lambda b: b.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        batch_size=65536,
    )
    return _verify_pairs_auto(pairs, ds, id_col, text_col, k, threshold)


def ray_empty_pairs():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
    )


def setsim_join_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold_num: int = 7,
    threshold_den: int = 10,
    num_buckets: int = 32,
    max_group: int = 4_000,
):
    """EXACT set-similarity self-join (Jaccard >= num/den over k-gram
    shingle sets, id_a < id_b, recall 1): exact-duplicate texts are
    COLLAPSED to one representative before the prefix-filter core —
    for g identical copies every prefix bucket holds all g, so the raw
    candidate volume grows as prefix_len x g^2 per text (measured: a
    4x-amplified corpus with planted mutations ran >15 min before this
    collapse, ~40 s after).  Identical texts have identical shingle
    sets, so representative-level similarity transfers exactly:
    cross-group pairs expand via two id-keyed joins, and every
    same-text group of size g contributes its C(g,2) pairs at
    Jaccard 1.
    """
    import ray.data as rd

    from geodata_ray.stages.relational import broadcast_join
    from geodata_ray.stages.windows import _tag_bucket

    def fp_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        fp = hash_strings_nomemo(texts.fill_null("").to_pylist())
        return pa.table(
            {
                "id": pc.cast(batch[id_col], pa.int64()),
                "fp": pa.array(fp.view(np.int64)),
                "text": texts.fill_null(""),
            }
        )

    fpds = ds.map_batches(fp_batch, batch_format="pyarrow")

    # one sharded pass emits reps (tagged rows carrying text) and
    # members (id -> rep) together
    def collapse(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        fp = t["fp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fp))
        ids, fp = ids[order], fp[order]
        txt = t["text"].take(pa.array(order))
        counts, _flat = _batch_shingles(txt, k)
        new = np.ones(ids.size, dtype=bool)
        new[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(new)
        seglen = np.diff(np.append(starts, ids.size))
        rep = np.repeat(ids[starts], seglen)
        is_rep = np.zeros(ids.size, dtype=bool)
        is_rep[starts] = True
        return pa.table(
            {
                "id": pa.array(ids),
                "rep": pa.array(rep),
                "is_rep": pa.array(is_rep),
                # shingle-less texts (fewer than k tokens) have EMPTY
                # sets: Jaccard is 0/0, never a pair — the within-group
                # expansion must skip them (verify kernel, brute-force
                # definition, and SQL oracle all agree)
                "has_sh": pa.array(counts > 0),
                "text": txt,
            }
        )

    bucketed = _tag_bucket(fpds, "fp", num_buckets)
    collapsed = bucketed.groupby("__b").map_groups(
        lambda g: collapse(g.drop_columns(["__b"])),
        batch_format="pyarrow",
    ).materialize()

    reps = collapsed.filter(expr="is_rep == True").map_batches(
        lambda b: pa.table({id_col: b["id"], text_col: b["text"]}),
        batch_format="pyarrow",
        batch_size=65536,
    ).materialize()

    n_total = collapsed.count()  # metadata-cheap on materialized data
    n_reps = reps.count()
    if n_reps == n_total:
        # no duplicate texts at all: reps ARE the corpus; skip the
        # member expansion and within-group machinery entirely (saves
        # ~5 control-plane executions — the common clean-corpus path)
        return _setsim_rep_pairs(
            reps, id_col=id_col, text_col=text_col, k=k,
            threshold_num=threshold_num, threshold_den=threshold_den,
            num_buckets=num_buckets,
        )

    members = collapsed.map_batches(
        lambda b: b.select(["id", "rep"]),
        batch_format="pyarrow",
        batch_size=65536,
    ).materialize()
    # within-group pairs only among shingle-BEARING texts; cross pairs
    # are safe (verified reps necessarily have shingles)
    members_sh = collapsed.filter(expr="has_sh == True").map_batches(
        lambda b: b.select(["id", "rep"]),
        batch_format="pyarrow",
        batch_size=65536,
    )

    rep_pairs = _setsim_rep_pairs(
        reps, id_col=id_col, text_col=text_col, k=k,
        threshold_num=threshold_num, threshold_den=threshold_den,
        num_buckets=num_buckets,
    )

    # cross-group expansion: two id-keyed joins (rep -> its members)
    def side(name):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {f"rep_{name}": batch["rep"], f"m_{name}": batch["id"]}
            )

        return f

    # the verified representative-pair set is ANSWER-sized (it is the
    # operator's output at group granularity), so it broadcasts; the
    # corpus-sized members table streams through two broadcast joins.
    # (A generic shuffle/native join here is the schema-fragile path:
    # sparse pair sets produce empty leading bundles.)
    import ray

    rp_tbl = pa.concat_tables(
        ray.get(
            rep_pairs.map_batches(
                lambda b: pa.table(
                    {"rep_a": b["id_a"], "rep_b": b["id_b"]}
                ),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    if rp_tbl.num_rows == 0:
        rp_tbl = pa.table(
            {"rep_a": pa.array([], pa.int64()),
             "rep_b": pa.array([], pa.int64())}
        )
    ma = members.map_batches(side("a"), batch_format="pyarrow")
    j1 = broadcast_join(ma, rp_tbl, ["rep_a"]).materialize()
    mb = members.map_batches(side("b"), batch_format="pyarrow")
    if j1.count() <= 5_000_000:
        j1_tbl = pa.concat_tables(
            ray.get(j1.to_arrow_refs()), promote_options="default"
        )
        if j1_tbl.num_rows == 0:
            j1_tbl = pa.table(
                {"rep_a": pa.array([], pa.int64()),
                 "m_a": pa.array([], pa.int64()),
                 "rep_b": pa.array([], pa.int64())}
            )
        j2 = broadcast_join(mb, j1_tbl, ["rep_b"])
    else:
        # expansion too large to broadcast: bucketed acero join over
        # the two materialized (schema-known) sides
        from geodata_ray.stages.relational import shuffle_join

        j2 = shuffle_join(
            j1, mb.materialize(), ["rep_b"], num_buckets=64
        )

    def norm(batch: pa.Table) -> pa.Table:
        a = batch["m_a"].to_numpy(zero_copy_only=False)
        b = batch["m_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array(np.minimum(a, b)),
                "id_b": pa.array(np.maximum(a, b)),
            }
        )

    cross = j2.map_batches(norm, batch_format="pyarrow")

    # within-group pairs (identical texts: Jaccard exactly 1 >= t)
    def group_pairs(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        rep = t["rep"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, rep))
        ids, rep = ids[order], rep[order]
        new = np.ones(ids.size, dtype=bool)
        new[1:] = rep[1:] != rep[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, ids.size))
        if counts.size and int(counts.max()) > max_group:
            g = int(counts.max())
            raise ValueError(
                f"same-text group of {g} copies would expand to "
                f"C({g},2) = {g * (g - 1) // 2} identical pairs — run "
                "exact dedup (keep-first) before the similarity join "
                "instead of enumerating them"
            )
        out_a, out_b = [], []
        kmax = int(counts.max()) if counts.size else 0
        for i in range(kmax):
            for j in range(i + 1, kmax):
                sel = starts[counts > j]
                out_a.append(ids[sel + i])
                out_b.append(ids[sel + j])
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
            }
        )

    within = _tag_bucket(members_sh, "rep", num_buckets).groupby(
        "__b"
    ).map_groups(
        lambda g: group_pairs(g.drop_columns(["__b"])),
        batch_format="pyarrow",
    )
    return cross.union(within)
