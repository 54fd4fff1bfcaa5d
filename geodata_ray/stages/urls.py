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
