"""Unit tests for the URL algebra quirks the reference depends on
(SURVEY.md §2 P1, P5-P7, P9; main.rs:162-164, 207-221, 271-275)."""

import pytest

from crawler_ray import urlnorm as un


def test_parse_normalizes():
    u = un.parse("HTTP://ExAmple.COM:80/a/b/../c?q=1#f")
    assert u.scheme == "http"
    assert u.host == "example.com"
    assert u.port is None  # default port removed
    assert u.path == "/a/c"  # dot segments resolved
    assert u.query == "q=1"
    assert u.fragment == "f"
    assert str(u) == "http://example.com/a/c?q=1#f"


def test_parse_path_floor():
    assert str(un.parse("http://a.example")) == "http://a.example/"
    assert str(un.parse("https://a.example:8443")) == "https://a.example:8443/"


def test_parse_relative_raises_relative_error():
    for link in ["p2", "/p2", "../p2", "?q", "#f", "//other.example/p"]:
        with pytest.raises(un.RelativeUrlError):
            un.parse(link)


def test_parse_malformed():
    for link in ["http://[bad", "http://", "http://ho st/x", "http://a:bad/x"]:
        with pytest.raises(un.UrlParseError):
            un.parse(link)


def test_parse_opaque_and_file():
    m = un.parse("mailto:someone@example.com")
    assert m.host is None and m.path == "someone@example.com"
    f = un.parse("file:///tmp/x")
    assert f.host is None and f.path == "/tmp/x"
    ftp = un.parse("ftp://h.example/x")
    assert ftp.host == "h.example" and not un.scheme_is_httpish(ftp.scheme)


def test_scheme_substring_quirk():
    # main.rs:218 — contains("http"), not equality
    assert un.scheme_is_httpish("http")
    assert un.scheme_is_httpish("https")
    assert un.scheme_is_httpish("xhttpx")
    assert not un.scheme_is_httpish("ftp")
    assert not un.scheme_is_httpish("mailto")


def test_origin_root_base():
    # main.rs:162-164 — relative links resolve against scheme://host/, not
    # the page directory
    page = un.parse("http://a.example/deep/dir/page.html?q=1")
    base = page.origin_root()
    assert str(base.without_fragment()) == "http://a.example/"
    assert str(un.join(base, "p2")) == "http://a.example/p2"
    assert str(un.join(base, "./p2")) == "http://a.example/p2"
    assert str(un.join(base, "/p2")) == "http://a.example/p2"
    assert str(un.join(base, "../p2")) == "http://a.example/p2"  # clamped
    assert str(un.join(base, "?x=2")) == "http://a.example/?x=2"
    assert str(un.join(base, "#frag")) == "http://a.example/#frag"
    assert str(un.join(base, "//other.example/z")) == "http://other.example/z"


def test_join_keeps_port_and_scheme():
    base = un.parse("https://a.example:8443/x/y").origin_root()
    assert str(un.join(base, "p")) == "https://a.example:8443/p"


def test_parse_links_reference_semantics():
    page = un.parse("http://a.example/dir/page")
    kept, malformed = un.parse_links(
        [
            "http://b.example/abs",  # absolute → kept
            "rel",  # relative → joined at origin root
            "ftp://c.example/f",  # scheme filter drops
            "mailto:x@y.example",  # no host → drops
            "xhttpx://q.example/z",  # substring quirk keeps
            "http://[broken",  # malformed → dropped, counted
            "file:///etc/passwd",  # hostless file → drops
        ],
        page,
    )
    assert malformed == 1
    assert sorted(str(u) for u in kept) == [
        "http://a.example/rel",
        "http://b.example/abs",
        "xhttpx://q.example/z",
    ]


def test_last_path_segment():
    assert un.parse("http://a.example/x/img.png").last_path_segment() == "img.png"
    assert un.parse("http://a.example/dir/").last_path_segment() == ""
    assert un.parse("http://a.example").last_path_segment() == ""
    assert un.parse("mailto:x@y").last_path_segment() is None


def test_fragment_kept_in_identity():
    # Finding identity includes the fragment (url crate Eq includes it)
    a = un.parse("http://a.example/p#one")
    b = un.parse("http://a.example/p#two")
    assert str(a) != str(b)
    assert str(a.without_fragment()) == str(b.without_fragment())


def test_with_host_vectorized_matches_parse():
    """politeness.with_host's RE2 host extraction must agree with re-parsing
    on every canonical URL shape the frontier can carry (including the
    scheme-contains-http quirk, ipv6 brackets, ports, userinfo-free
    authorities, opaque and hostless forms)."""
    import pyarrow as pa

    from crawler_ray import urlnorm as un
    from crawler_ray.stages.politeness import with_host

    raw = [
        "http://a.example/p1",
        "https://A.EXAMPLE:8443/x?q=1#f",
        "http://a.example:80/default-port-drops",
        "xhttpy://weird.host/p",          # contains("http") quirk, non-special
        "xhttpy:opaque/path",             # opaque: no host
        "mailto:u@dom.example",           # opaque with '@' and dots
        "file:///etc/hosts",              # empty authority -> no host
        "file://fshost/share",            # file WITH host
        "http://[2001:db8::1]:8080/v6",   # ipv6 + port
        "http://[2001:db8::2]/v6",        # ipv6 default
        "ws://sock.example/chat",
        "a://b",                          # minimal non-special authority
        "mailto:a://b",                   # '://' inside an opaque path
        "http://user@host.example/drop-userinfo",
        "http://h.test/p?q=a://fake-authority-in-query",
    ]
    canon = [str(un.parse(s)) for s in raw]
    tbl = pa.table(
        {
            "url": pa.array(canon),
            "kind": pa.array(["page"] * len(canon)),
            "depth": pa.array([0] * len(canon), pa.int32()),
        }
    )
    got = with_host(tbl)["host"].to_pylist()
    want = [un.parse(u).host for u in canon]
    assert got == want
