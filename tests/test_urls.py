"""URL canonicalization kernel vs hand-written expectations."""

import pyarrow as pa

from geodata_ray.stages.urls import canonicalize_urls, url_hosts

CASES = [
    ("HTTPS://Site7.Example.COM:443/a/b7/", "https://site7.example.com/a/b7"),
    ("http://x.com:80/p?q=1#frag", "http://x.com/p?q=1"),
    ("http://x.com:8080/p/", "http://x.com:8080/p"),  # non-default port kept
    ("https://y.com/", "https://y.com"),
    ("https://y.com", "https://y.com"),
    ("not a url", "not a url"),  # garbage passes through
    ("ftp://Files.Org:21/z", "ftp://files.org:21/z"),
    ("https://UPPER.com/path//", "https://upper.com/path"),
    # IPv6 literals: bracketed host parses as the host (not '[')
    ("http://[::1]:8080/x", "http://[::1]:8080/x"),
    ("HTTPS://[2001:DB8::1]:443/a/", "https://[2001:db8::1]/a"),
    ("http://[::1]/y", "http://[::1]/y"),
    # zero-padded ports compare numerically: default dropped,
    # non-default re-emitted unpadded
    ("https://z.com:0443/p", "https://z.com/p"),
    ("http://z.com:08080/p", "http://z.com:8080/p"),
]


def test_canonicalize_urls():
    urls = pa.array([c[0] for c in CASES])
    assert canonicalize_urls(urls).to_pylist() == [c[1] for c in CASES]


def test_url_hosts():
    urls = pa.array([c[0] for c in CASES])
    hosts = url_hosts(urls).to_pylist()
    assert hosts == [
        "site7.example.com", "x.com", "x.com", "y.com", "y.com",
        None, "files.org", "upper.com",
        "[::1]", "[2001:db8::1]", "[::1]", "z.com", "z.com",
    ]
