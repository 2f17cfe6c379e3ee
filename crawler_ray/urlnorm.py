"""URL algebra for the crawl engine.

Reimplements, from the public WHATWG URL Standard / RFC 3986, the subset of
URL behavior the reference relies on via the Rust ``url`` crate
(reference: /root/reference/src/main.rs:162-164, 207-221, 100-102, 271-275):

- absolute parse with normalization (lowercase scheme/host, default-port
  removal, dot-segment resolution, "/" path floor for special schemes);
- the RelativeUrlWithoutBase distinction: a link with no scheme prefix is
  resolved against a base (main.rs:210-211), any *other* parse failure is
  a warn-and-drop (main.rs:212-215);
- origin-root base derivation: ``set_path("")`` + ``set_query(None)``
  (main.rs:162-164) — relative links resolve against ``scheme://host[:port]/``,
  NOT the page's directory (a deliberate reference quirk);
- the scheme filter is substring containment: ``scheme.contains("http")``
  keeps http, https, and e.g. "xhttpx" (main.rs:218);
- host accessor = hostname without port (main.rs:100, 219);
- last path segment for the image sink filename (main.rs:271-275).

Scope note: this is the *constrained common subset* used by the deterministic
fixture corpus (ASCII hosts, no userinfo, no IDNA, simple percent-escapes).
The pure-Python oracle simulator and the Ray engine both use this module, so
URL semantics are pinned identically on both sides; the subset itself is
unit-tested directly against the behaviors cited above.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# WHATWG "special" schemes and their default ports.
SPECIAL_SCHEMES: dict[str, int | None] = {
    "http": 80,
    "https": 443,
    "ws": 80,
    "wss": 443,
    "ftp": 21,
    "file": None,
}

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):(.*)$", re.S)
# reg-name host: conservative allowed charset (fixture subset)
_HOST_OK_RE = re.compile(r"^[A-Za-z0-9._~\-]+$")
_IPV6_RE = re.compile(r"^\[[0-9A-Fa-f:.]+\]$")


class UrlParseError(ValueError):
    """Malformed absolute URL → warn-and-drop (main.rs:212-215)."""


class RelativeUrlError(ValueError):
    """No scheme → must be joined against a base (main.rs:210-211)."""


class Url(NamedTuple):
    scheme: str
    host: str | None  # lowercased; None when absent or empty
    port: int | None  # None when absent or default for the scheme
    path: str
    query: str | None
    fragment: str | None

    def __str__(self) -> str:
        out = [self.scheme, ":"]
        if self.host is not None:
            out.append("//")
            out.append(self.host)
            if self.port is not None:
                out.append(f":{self.port}")
        out.append(self.path)
        if self.query is not None:
            out.append("?" + self.query)
        if self.fragment is not None:
            out.append("#" + self.fragment)
        return "".join(out)

    @property
    def is_special(self) -> bool:
        return self.scheme in SPECIAL_SCHEMES

    def origin_root(self) -> "Url":
        """Base used for relative resolution: path stripped to root, query
        dropped (reference set_path("")+set_query(None), main.rs:162-164)."""
        path = "/" if (self.is_special or self.host is not None) else ""
        return self._replace(path=path, query=None, fragment=self.fragment)

    def without_fragment(self) -> "Url":
        return self._replace(fragment=None)

    def last_path_segment(self) -> str | None:
        """path_segments().last(): None for cannot-be-a-base URLs
        (main.rs:271-274); '' for a path ending in '/'."""
        if self.host is None and not self.path.startswith("/"):
            return None
        if not self.path:
            return None
        return self.path.split("/")[-1]


def _strip_input(s: str) -> str:
    # WHATWG: trim C0 controls and space at both ends; strip tab/newline.
    s = s.strip(" \t\n\r\f\v\x00")
    return s.replace("\t", "").replace("\n", "").replace("\r", "")


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash when last segment was . or ..
    if path.endswith(("/.", "/..")) and out and out[-1] != "":
        out.append("")
    result = "/".join(out)
    if path.startswith("/") and result == "":
        # dot segments consumed the whole path ("/.", "/a/.."): WHATWG
        # remove-dot-segments leaves the root, never an empty path
        return "/"
    return result


_PATH_ESCAPE = {" ": "%20", '"': "%22", "<": "%3C", ">": "%3E", "`": "%60"}


def _escape_path(path: str) -> str:
    return "".join(_PATH_ESCAPE.get(c, c) for c in path)


def _parse_host(raw: str, scheme: str) -> tuple[str | None, int | None]:
    """Parse authority ``host[:port]`` (no userinfo in the fixture subset)."""
    if "@" in raw:
        raw = raw.rsplit("@", 1)[1]  # drop userinfo (documented subset)
    host_part, port_part = raw, None
    if raw.startswith("["):
        end = raw.find("]")
        if end < 0:
            raise UrlParseError(f"unclosed ipv6 host: {raw!r}")
        host_part = raw[: end + 1]
        rest = raw[end + 1 :]
        if rest:
            if not rest.startswith(":"):
                raise UrlParseError(f"bad authority: {raw!r}")
            port_part = rest[1:]
        if not _IPV6_RE.match(host_part):
            raise UrlParseError(f"bad ipv6 host: {raw!r}")
    elif ":" in raw:
        host_part, port_part = raw.rsplit(":", 1)

    host = host_part.lower()
    if host and not host.startswith("[") and not _HOST_OK_RE.match(host):
        raise UrlParseError(f"forbidden host characters: {host!r}")

    port: int | None = None
    if port_part:
        if not port_part.isdigit():
            raise UrlParseError(f"invalid port: {port_part!r}")
        port = int(port_part)
        if port > 65535:
            raise UrlParseError(f"port out of range: {port}")
    if port is not None and SPECIAL_SCHEMES.get(scheme) == port:
        port = None  # default-port removal
    if host == "":
        if scheme in SPECIAL_SCHEMES and scheme != "file":
            raise UrlParseError(f"empty host for special scheme {scheme!r}")
        return None, None
    return host, port


def parse(s: str) -> Url:
    """Parse an absolute URL. Raises RelativeUrlError when there is no
    scheme (the RelativeUrlWithoutBase case) and UrlParseError on any other
    malformation."""
    s = _strip_input(s)
    m = _SCHEME_RE.match(s)
    if not m:
        raise RelativeUrlError(s)
    scheme, rest = m.group(1).lower(), m.group(2)
    special = scheme in SPECIAL_SCHEMES
    if special:
        rest = rest.replace("\\", "/")

    fragment: str | None = None
    if "#" in rest:
        rest, fragment = rest.split("#", 1)
    query: str | None = None
    if "?" in rest:
        rest, query = rest.split("?", 1)

    host: str | None = None
    port: int | None = None
    if special and scheme != "file":
        # special schemes "ignore slashes": http:foo == http://foo (WHATWG)
        rest = rest.lstrip("/")
        slash = rest.find("/")
        if slash < 0:
            slash = len(rest)
        authority, path = rest[:slash], rest[slash:]
        if authority == "":
            raise UrlParseError(f"empty host in {s!r}")
        host, port = _parse_host(authority, scheme)
        path = _remove_dot_segments(_escape_path(path)) if path else "/"
    elif rest.startswith("//"):
        # file / non-special with authority: exactly two slashes, then host
        rest = rest[2:]
        slash = rest.find("/")
        if slash < 0:
            slash = len(rest)
        authority, path = rest[:slash], rest[slash:]
        host, port = _parse_host(authority, scheme) if authority else (None, None)
        path = _remove_dot_segments(_escape_path(path)) if path else ""
        if scheme == "file" and not path:
            path = "/"
    else:
        # opaque / cannot-be-a-base (mailto:foo) or file path
        path = rest
        if scheme == "file":
            path = _remove_dot_segments(_escape_path(path))
            if not path.startswith("/"):
                path = "/" + path
    return Url(scheme, host, port, path, query, fragment)


def join(base: Url, link: str) -> Url:
    """Resolve ``link`` against ``base`` (RFC 3986 §5.3 merge; base is the
    origin-root in crawl use). A failure here mirrors the reference's
    ``.unwrap()`` panic (main.rs:211) and therefore raises hard."""
    link = _strip_input(link)
    if base.is_special:
        link = link.replace("\\", "/")
    try:
        return parse(link)
    except RelativeUrlError:
        pass
    except UrlParseError:
        raise

    fragment: str | None = None
    if "#" in link:
        link, fragment = link.split("#", 1)
    query: str | None = None
    if "?" in link:
        link, query = link.split("?", 1)

    if base.host is None and not base.path.startswith("/"):
        raise UrlParseError(f"cannot join against opaque base {base}")

    if link.startswith("//"):
        authority_rest = link[2:]
        slash = authority_rest.find("/")
        if slash < 0:
            authority, path = authority_rest, ""
        else:
            authority, path = authority_rest[:slash], authority_rest[slash:]
        host, port = _parse_host(authority, base.scheme)
        path = _remove_dot_segments(_escape_path(path))
        if base.is_special and not path:
            path = "/"
        return Url(base.scheme, host, port, path, query, fragment)

    if link == "":
        path, query = base.path, query if query is not None else base.query
    elif link.startswith("/"):
        path = _remove_dot_segments(_escape_path(link))
    else:
        # merge with base directory (base path is "/" in crawl use)
        base_dir = base.path.rsplit("/", 1)[0] + "/" if "/" in base.path else "/"
        path = _remove_dot_segments(_escape_path(base_dir + link))
    if not path.startswith("/"):
        path = "/" + path
    return Url(base.scheme, base.host, base.port, path, query, fragment)


def scheme_is_httpish(scheme: str) -> bool:
    """The reference's quirky filter: substring containment, not equality
    (main.rs:218) — keeps http, https, and any scheme containing 'http'."""
    return "http" in scheme


def parse_links(links: list[str], page_url: Url) -> tuple[list[Url], int]:
    """Reference ``parse_links`` (main.rs:207-221): absolute-parse each link;
    RelativeUrlWithoutBase → join against the origin-root base (panic on join
    failure); other malformation → drop. Then keep only scheme-contains-http
    AND host-present URLs. Returns (kept, n_malformed_dropped)."""
    base = page_url.origin_root()
    kept: list[Url] = []
    malformed = 0
    for raw in links:
        try:
            u = parse(raw)
        except RelativeUrlError:
            u = join(base, raw)  # UrlParseError here propagates (panic parity)
        except UrlParseError:
            malformed += 1
            continue
        if scheme_is_httpish(u.scheme) and u.host is not None:
            kept.append(u)
    return kept, malformed
