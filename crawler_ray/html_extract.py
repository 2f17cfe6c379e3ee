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


def extract(body: str | bytes) -> tuple[list[str], list[str], str]:
    """Tokenize one page body → (page_links, image_links, text).

    Links are the raw attribute strings in document order (URL resolution is
    a separate stage, see urlnorm.parse_links); text is the extracted
    character data."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    ex = _Extractor()
    ex.feed(body)
    ex.close()
    return ex.page_links, ex.image_links, "".join(ex.text_parts)
