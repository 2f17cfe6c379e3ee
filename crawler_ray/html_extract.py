"""Tokenizer-level HTML link + text extraction.

The reference drives an html5ever *tokenizer* (no DOM tree) and collects, for
every StartTag token, the ``href`` attributes of ``<a>`` and the ``src``
attributes of ``<img>`` (reference: /root/reference/src/main.rs:166-170,
227-262). Faithful consequences, reproduced here on top of Python's stdlib
``html.parser`` (also a tokenizer):

- start tags only — end tags, comments, doctypes, text are ignored for links;
- content inside ``<script>``/``<style>`` is RAWTEXT in both tokenizers, so
  markup there is data, never a tag;
- markup inside comments is never a tag;
- self-closing start tags (``<img .../>``) ARE start tags (html5ever's
  ``TagKind::StartTag`` with self_closing set → reference still collects);
- duplicate attribute names on one tag are dropped by the spec tokenizer
  (duplicate-attribute parse error keeps the FIRST value), so only the first
  ``href``/``src`` per tag counts;
- attribute values have character references decoded;
- byte input is decoded UTF-8-lossy (reference ``String::from_utf8_lossy``,
  main.rs:242-243 and reqwest ``.text()``, main.rs:155).

Text extraction (our engine persists text; the reference discards bodies,
main.rs:155-157): the concatenation of all character-data tokens that occur
outside ``<script>``/``<style>`` elements, in document order. The fixture
corpus generator composes each page's ``text`` column from the exact same
pieces, which is what makes the "byte-identical extracted text per url"
invariant testable.
"""

from __future__ import annotations

from html.parser import HTMLParser

_RAWTEXT = {"script", "style"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.page_links: list[str] = []
        self.image_links: list[str] = []
        self.text_parts: list[str] = []
        self._rawtext_depth = 0

    def _collect(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            want, out = "href", self.page_links
        elif tag == "img":
            want, out = "src", self.image_links
        else:
            return
        seen: set[str] = set()
        for name, value in attrs:
            if name in seen:
                continue  # spec tokenizer keeps only the first duplicate attr
            seen.add(name)
            if name == want and value is not None:
                out.append(value)

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _RAWTEXT:
            self._rawtext_depth += 1
        self._collect(tag, attrs)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._collect(tag, attrs)  # self-closing is still a StartTag token

    def handle_endtag(self, tag: str) -> None:
        if tag in _RAWTEXT and self._rawtext_depth > 0:
            self._rawtext_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._rawtext_depth == 0:
            self.text_parts.append(data)


def _reference_extract(body: str) -> tuple[list[str], list[str], str]:
    ex = _Extractor()
    ex.feed(body)
    ex.close()
    return ex.page_links, ex.image_links, "".join(ex.text_parts)


# --------------------------------------------------------------- fast path
#
# html.parser dispatches a Python method call per token; at crawl scale the
# tokenizer is the dominant compute, so the hot path below scans with
# str.find / compiled stdlib regexes and only does attribute work for
# <a>/<img>. It reuses html.parser's OWN tolerant start-tag/attribute
# regexes, so attribute semantics (quoting, entity decoding, duplicate
# handling) are identical by construction; everything else is covered by a
# differential test against _reference_extract over the full fixture corpus
# and the edge-case strings (test_html_extract.py). The oracle simulator
# always uses the reference implementation, so engine-vs-oracle equality
# also cross-checks the fast path end-to-end.

import html.parser as _hp
import re
from html import unescape as _unescape

_LOCATE_START_END = _hp.locatestarttagend_tolerant
_ATTRFIND = _hp.attrfind_tolerant
_TAGFIND = _hp.tagfind_tolerant  # consumes the post-name whitespace too
_CHARREF_HINT = "&"


def _decode_data(s: str) -> str:
    return _unescape(s) if _CHARREF_HINT in s else s


class _Bail(Exception):
    """Input left the fast path's certain subset → reparse with the
    reference tokenizer (declarations, unterminated constructs, bogus end
    tags — all the places html.parser has intricate recovery rules)."""


_ENDTAGFIND = _hp.endtagfind

# html.parser's cdata-mode `interesting` regex is the FULL closing form
# (set_cdata_mode: r'</\s*TAG\s*>'): rawtext ends exactly at the first
# match; '</scriptx>' or '</script foo>' never match and stay rawtext data
# (dropped inside script/style). DERIVE the pattern from the running
# interpreter's html.parser rather than hard-coding CPython 3.11's form —
# newer CPythons have changed set_cdata_mode, and the fast path's bit-parity
# promise is against whatever html.parser this process runs.
def _derive_rawtext_end() -> dict:
    pats = {}
    probe = _hp.HTMLParser()
    for t in _RAWTEXT:
        probe.set_cdata_mode(t)
        pats[t] = re.compile(probe.interesting.pattern, re.IGNORECASE)
    return pats


_RAWTEXT_END = _derive_rawtext_end()

# The fast path's rawtext skip assumes the interesting pattern is the full
# closing form (ends in '>').  If a future interpreter changes the shape,
# the fast path can no longer prove where rawtext ends — bail every body
# to the reference tokenizer (correct, just slower) instead of guessing.
_RAWTEXT_FAST_OK = all(
    p.pattern.rstrip(")").endswith(">") for p in _RAWTEXT_END.values()
)


def _find_rawtext_end(body: str, tag: str, i: int) -> int:
    if not _RAWTEXT_FAST_OK:
        raise _Bail
    m = _RAWTEXT_END[tag].search(body, i)
    return m.start() if m else -1


def _fast_extract_inner(body: str) -> tuple[list[str], list[str], str]:
    pages: list[str] = []
    images: list[str] = []
    text: list[str] = []
    n = len(body)
    i = 0
    find = body.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            text.append(_decode_data(body[i:]))
            break
        if lt > i:
            text.append(_decode_data(body[i:lt]))
        nxt = body[lt + 1 : lt + 2]
        if nxt == "!":
            if not body.startswith("<!--", lt):
                raise _Bail  # declarations / marked sections: complex rules
            end = find("-->", lt + 4)
            if end < 0:
                raise _Bail  # unterminated comment: EOF-flush semantics
            i = end + 3
        elif nxt == "?":
            raise _Bail  # processing-instruction recovery rules
        elif nxt == "/":
            m = _ENDTAGFIND.match(body, lt)
            if not m:
                raise _Bail  # bogus end tag: data-recovery rules
            i = m.end()
        elif nxt and ("a" <= nxt <= "z" or "A" <= nxt <= "Z"):
            m = _TAGFIND.match(body, lt + 1)
            tag = m.group(1).lower()
            gt = find(">", lt)
            if gt < 0:
                raise _Bail  # unterminated start tag
            seg = body[m.end() : gt]
            if (
                "'" not in seg
                and '"' not in seg
                and "<" not in seg
                and tag != "a"
                and tag != "img"
            ):
                # quote-free non-collected tag: '>' cannot be inside an
                # attribute value, so this IS the tag end — skip the big
                # attribute regex entirely (the common <p>/<h1>/… case)
                i = gt + 1
                if tag in _RAWTEXT:
                    e = _find_rawtext_end(body, tag, i)
                    if e < 0:
                        raise _Bail
                    i = find(">", e) + 1  # '>' is inside the matched close
                continue
            attr_end = _LOCATE_START_END.match(body, lt)  # pattern has '<'
            j = attr_end.end()
            if body.startswith(">", j):
                close = j + 1
            elif body.startswith("/>", j):
                close = j + 2
            else:
                raise _Bail  # malformed / unterminated start tag
            if tag == "a" or tag == "img":
                want = "href" if tag == "a" else "src"
                out = pages if tag == "a" else images
                seen: set[str] = set()
                k = m.end()
                while k < j:
                    am = _ATTRFIND.match(body, k)
                    if not am:
                        break
                    name = am.group(1).lower()
                    value = am.group(3)
                    if name not in seen:
                        seen.add(name)
                        if name == want and value is not None:
                            if value[:1] in "'\"" and value[:1] == value[-1:]:
                                value = value[1:-1]
                            out.append(_decode_data(value))
                    k = am.end()
            i = close
            if tag in _RAWTEXT:
                # CDATA mode: content until the matching end tag is rawtext
                e = _find_rawtext_end(body, tag, i)
                if e < 0:
                    raise _Bail  # unterminated rawtext: EOF-flush semantics
                i = find(">", e) + 1  # '>' is inside the matched close
        else:
            # bare '<' (or '<' + non-name char) is character data
            text.append("<")
            i = lt + 1
    return pages, images, "".join(text)


def _fast_extract(body: str) -> tuple[list[str], list[str], str]:
    try:
        return _fast_extract_inner(body)
    except _Bail:
        return _reference_extract(body)


def extract(body: str | bytes, fast: bool = True) -> tuple[list[str], list[str], str]:
    """Tokenize one page body → (page_links, image_links, text).

    Links are the raw attribute strings in document order (URL resolution is
    a separate stage, see urlnorm.parse_links); text is the extracted
    character data. ``fast=False`` selects the html.parser-based reference
    implementation (used by the oracle simulator and the differential
    tests); both produce identical output on the supported HTML subset."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    if fast:
        return _fast_extract(body)
    return _reference_extract(body)


# ----------------------------------------------------------- anchor text


class _AnchorExtractor(HTMLParser):
    """Tokenizer-level anchor-text capture (an engine extension — the
    reference collects only the href attribute, main.rs:227-247; anchor
    text is the classic link-based relevance signal, so the curation
    side wants it too). Spec, stated tokenizer-style with no tree:

    - an ``<a>`` start tag carrying an ``href`` (first-duplicate-wins,
      like the link extractor above) OPENS an anchor; a later ``<a>``
      start tag closes the previous one first (no nesting at tokenizer
      level);
    - character data outside RAWTEXT elements accumulates into the open
      anchor;
    - ``</a>`` closes the open anchor; EOF closes a dangling one;
    - self-closing ``<a/>`` emits an empty-text anchor;
    - emitted text is whitespace-collapsed and stripped.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._parts: list[str] = []
        self._rawtext_depth = 0

    @staticmethod
    def _first_href(attrs: list[tuple[str, str | None]]) -> str | None:
        seen: set[str] = set()
        for name, value in attrs:
            if name in seen:
                continue
            seen.add(name)
            if name == "href" and value is not None:
                return value
        return None

    def _close(self) -> None:
        if self._href is not None:
            self.anchors.append((self._href, " ".join("".join(self._parts).split())))
        self._href, self._parts = None, []

    def handle_starttag(self, tag, attrs) -> None:
        if tag in _RAWTEXT:
            self._rawtext_depth += 1
        if tag == "a":
            self._close()
            self._href = self._first_href(attrs)

    def handle_startendtag(self, tag, attrs) -> None:
        if tag == "a":
            self._close()
            href = self._first_href(attrs)
            if href is not None:
                self.anchors.append((href, ""))

    def handle_endtag(self, tag) -> None:
        if tag in _RAWTEXT and self._rawtext_depth > 0:
            self._rawtext_depth -= 1
        if tag == "a":
            self._close()

    def handle_data(self, data) -> None:
        if self._rawtext_depth == 0 and self._href is not None:
            self._parts.append(data)


def extract_anchors(body: str | bytes) -> list[tuple[str, str]]:
    """Tokenize one page body → ordered ``(href, anchor_text)`` pairs (see
    _AnchorExtractor for the exact tokenizer-level spec)."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    ex = _AnchorExtractor()
    ex.feed(body)
    ex.close()
    ex._close()
    return ex.anchors
