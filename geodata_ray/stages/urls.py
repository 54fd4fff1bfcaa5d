"""URL canonicalization + host extraction — the web-page table's
normalization step before any host/domain grouping or URL-level dedup
(the reference has no URL surface; this is part of the Common-Crawl
-style engine the north rule mandates).

Vectorized: one ``pc.extract_regex`` pass splits every URL into
(scheme, userinfo, host, port, rest); canonical form is lower-cased
scheme+host, USERINFO DROPPED (credentials are PII and never part of
the resource identity), default ports dropped (http:80 / https:443),
fragments gone (the regex stops at ``#``), trailing slashes stripped.
Rows that do not parse as absolute URLs pass through unchanged (crawls
contain garbage; dropping it is a FILTER's decision, not a
normalizer's).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?:(?P<userinfo>[^@/?#]*)@)?"
    # host: bracketed IPv6 literal ([::1]) OR reg-name/IPv4 — without
    # the bracket alternative '[' would terminate the host match and
    # the address+port would leak into <rest>
    r"(?P<host>\[[^\]/?#]+\]|[^@/:?#]+)(?::(?P<port>\d+))?(?P<rest>[^#]*)"
)


def _parse(urls) -> pa.StructArray:
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pc.extract_regex(urls, _URL_RE)


def _canonical_from(ex: pa.StructArray, urls: pa.Array) -> pa.Array:
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    port = pc.struct_field(ex, "port")
    rest = pc.replace_substring_regex(
        pc.struct_field(ex, "rest"), r"/+$", ""
    )
    # ":" + port only for explicit non-default ports (a URL without a
    # port yields an EMPTY — not null — optional group).  Ports compare
    # and re-emit NUMERICALLY so zero-padded forms (':0443', ':08080')
    # canonicalize the same as their unpadded equivalents.
    port_str = pc.fill_null(port, "")
    # leading-zero strip via RE2 (no int cast — a garbage 30-digit
    # "port" must pass through, not overflow): '0443'->'443', '0'->'0'
    port_norm = pc.replace_substring_regex(port_str, r"^0+(\d)", r"\1")
    default = pc.or_(
        pc.and_(pc.equal(scheme, "https"), pc.equal(port_norm, "443")),
        pc.and_(pc.equal(scheme, "http"), pc.equal(port_norm, "80")),
    )
    has_port = pc.and_(
        pc.not_equal(port_str, ""), pc.invert(pc.fill_null(default, False))
    )
    port_part = pc.if_else(
        has_port,
        pc.binary_join_element_wise(":", port_norm, ""),
        "",
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", host, port_part, rest, "",
        null_handling="replace",
    )
    return pc.if_else(pc.is_valid(pc.struct_field(ex, "host")), canon, urls)


def canonicalize_urls(urls) -> pa.Array:
    """Canonical absolute-URL form; non-URL strings pass through."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return _canonical_from(_parse(urls), urls)


def url_hosts(urls) -> pa.Array:
    """Lower-cased host per URL; null for non-URL strings."""
    return pc.utf8_lower(pc.struct_field(_parse(urls), "host"))


def canonicalize_batch(
    batch: pa.Table, *, url_col: str = "url"
) -> pa.Table:
    """Append canonical_url + host columns to a pages batch — ONE
    regex pass shared by both outputs."""
    urls = batch[url_col]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = _parse(urls)
    return batch.append_column(
        "canonical_url", _canonical_from(ex, urls)
    ).append_column("host", pc.utf8_lower(pc.struct_field(ex, "host")))


_URL_BEST_M = 1 << 41  # id-packing modulus for the per-URL argmax


def dedup_by_canonical_url(
    ds, *, url_col: str = "url", id_col: str = "doc_id",
    score_col: str = "n_chars",
):
    """URL-level dedup: one keeper per CANONICAL url — the crawl-merge
    step that collapses re-crawls and trivially-mutated URLs of the
    same page, keeping the highest-``score_col`` capture (tie: lowest
    id).

    Canonicalizes with the real normalizer, then a single two-phase
    grouped max over the packed key ``score * 2^41 + (2^41-1-id)``
    (argmax-by-(score, -id) as one int64 max — merges associatively,
    so partials pre-combine per batch before the shuffle).  Groups by
    the 8-byte canonical-url hash, never the string; the string rides
    along as a per-group ``min`` (all equal within a group).

    Requires ``id_col`` < 2^41 (~2·10^12 docs) and non-negative
    ``score_col`` < 2^21; raises per batch if violated.

    Output: (canonical_url, best ``id_col``, best_score, n_dups).
    """
    import numpy as np

    from geodata_ray.stages.dedup import hash_strings_nomemo
    from geodata_ray.stages.relational import grouped_aggregate

    def prep(batch: pa.Table) -> pa.Table:
        cb = canonicalize_batch(batch, url_col=url_col)
        canon = pc.fill_null(cb["canonical_url"], "")
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        h = hash_strings_nomemo(canon.to_pylist()).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        score = batch[score_col].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if ids.size and (
            ids.min() < 0 or ids.max() >= _URL_BEST_M
            or score.min() < 0 or score.max() >= (1 << 21)
        ):
            raise ValueError(
                "dedup_by_canonical_url: id must be in [0, 2^41) and "
                "score in [0, 2^21) for int64 argmax packing"
            )
        packed = score * _URL_BEST_M + (_URL_BEST_M - 1 - ids)
        return pa.table(
            {
                "url_hash": pa.array(h),
                "canonical_url": canon,
                "packed": pa.array(packed),
            }
        )

    winners = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["url_hash"],
        [
            ("packed", "max", "max_packed"),
            ("packed", "count", "n_dups"),
            ("canonical_url", "min", "canonical_url"),
        ],
    )

    def decode(batch: pa.Table) -> pa.Table:
        mp = batch["max_packed"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "canonical_url": batch["canonical_url"],
                id_col: pa.array(_URL_BEST_M - 1 - (mp % _URL_BEST_M)),
                "best_score": pa.array(mp // _URL_BEST_M),
                "n_dups": batch["n_dups"],
            }
        )

    return winners.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Domain blocklist filter
# ---------------------------------------------------------------------------

_MAX_HOST_LABELS = 8  # probe depth; hosts with more labels than this
                      # only match blocklist entries of >= (labels-8)
                      # labels — real registrable domains are 2-4


class _BlocklistFilter:
    """UT1-class domain blocklist with registrable-suffix semantics: a
    host is blocked iff it EQUALS an entry or ends with ``"." +
    entry`` (so blocking ``example.com`` blocks ``cdn.example.com``).

    Scale shape: the blocklist broadcasts ONCE via ``ray.put``
    (UT1 adult list ~4M entries ~ tens of MB — fine as a side input;
    the corpus is the big side).  Per batch the host column is probed
    against the SET by successive label-stripping — at most
    ``_MAX_HOST_LABELS`` vectorized ``is_in`` + one RE2 strip each —
    so per-batch cost is O(rows * labels), INDEPENDENT of blocklist
    size (scanning the list with ends_with would be O(rows * |list|)).
    """

    def __init__(self, blocked_ref, host_col: str, keep_blocked: bool):
        try:
            import ray

            if isinstance(blocked_ref, ray.ObjectRef):
                blocked_ref = ray.get(blocked_ref)
        except Exception:
            pass
        if not isinstance(blocked_ref, (pa.Array, pa.ChunkedArray)):
            blocked_ref = pa.array(
                [str(b).lower() for b in blocked_ref], type=pa.string()
            )
        self.blocked = blocked_ref
        self.host_col = host_col
        self.keep_blocked = keep_blocked

    def _blocked_mask(self, host) -> pa.Array:
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        # hostnames are case-insensitive: lower the probe side to match
        # the lowercased blocklist even when the host column was not
        # pre-canonicalized
        cur = pc.utf8_lower(pc.fill_null(host, ""))
        mask = pc.is_in(cur, value_set=self.blocked)
        for _ in range(_MAX_HOST_LABELS - 1):
            nxt = pc.replace_substring_regex(
                cur, r"^[^.]*\.", "", max_replacements=1
            )
            moved = pc.not_equal(nxt, cur)
            if not pc.any(moved).as_py():
                break  # every host is down to its last label
            mask = pc.or_(
                mask, pc.and_(pc.is_in(nxt, value_set=self.blocked), moved)
            )
            cur = nxt
        return mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self._blocked_mask(batch[self.host_col])
        if self.keep_blocked:
            return batch.filter(mask)
        return batch.filter(pc.invert(mask))


def filter_blocked_hosts(
    ds,
    blocked,
    *,
    host_col: str = "host",
    keep_blocked: bool = False,
):
    """Filter rows whose ``host_col`` matches a domain blocklist
    (exact host or any parent domain).  ``keep_blocked=True`` inverts
    the filter (audit mode: show what WOULD be dropped)."""
    import ray

    arr = pa.array([str(b).lower() for b in blocked], type=pa.string())
    blocked_ref = ray.put(arr)
    return ds.map_batches(
        _BlocklistFilter,
        fn_constructor_kwargs={
            "blocked_ref": blocked_ref,
            "host_col": host_col,
            "keep_blocked": keep_blocked,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def snapshot_diff(
    old,
    new,
    *,
    key_col: str = "url",
    fp_col: str = "fp",
    num_buckets: int = 32,
):
    """Incremental crawl diff: classify every key across two crawl
    snapshots as ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, content fingerprint differs) or ``unchanged``.
    The recrawl-scheduling primitive every crawl pipeline runs between
    snapshots.

    Inputs carry ``(key_col, fp_col)`` — a canonical URL and a 64-bit
    content fingerprint — so only ~40 bytes/row move through the
    exchange regardless of page size.  One full-outer
    :func:`relational.shuffle_join` on the key (single shuffle; bucket
    count bounds per-group memory), then a vectorized per-batch
    classification.  At 10^12 pages, raise ``num_buckets`` so each
    bucket's slice of BOTH snapshots fits a worker heap."""
    from geodata_ray.stages.relational import shuffle_join

    j = shuffle_join(
        old.select_columns([key_col, fp_col]),
        new.select_columns([key_col, fp_col]),
        [key_col],
        how="outer",
        num_buckets=num_buckets,
    )
    new_fp = fp_col + "_r"

    def classify(batch: pa.Table) -> pa.Table:
        a, b = batch[fp_col], batch[new_fp]
        status = pc.if_else(
            pc.is_null(a),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(b),
                pa.scalar("removed"),
                pc.if_else(
                    pc.not_equal(a, b),
                    pa.scalar("changed"),
                    pa.scalar("unchanged"),
                ),
            ),
        )
        return pa.table({key_col: batch[key_col], "status": status})

    return j.map_batches(classify, batch_format="pyarrow")
