"""Unit tests for tokenizer-level extraction semantics
(SURVEY.md §2 P2-P4, P8; main.rs:166-170, 227-262)."""

from crawler_ray.html_extract import extract


def test_basic_links_and_text():
    pages, images, text = extract(
        "<html><head><title>T</title></head><body>"
        '<h1>Head</h1><a href="http://a.example/p1">one</a>'
        '<img src="http://a.example/i.png"><p>tail</p></body></html>'
    )
    assert pages == ["http://a.example/p1"]
    assert images == ["http://a.example/i.png"]
    assert text == "THeadonetail"


def test_start_tags_only():
    pages, images, _ = extract(
        '<a href="x">t</a>'
        "<!-- <a href='in-comment'> -->"
        '<script>var s = "<a href=\'in-script\'>";</script>'
        "<style>a[href='in-style'] {}</style>"
    )
    assert pages == ["x"]
    assert images == []


def test_script_style_excluded_from_text():
    _, _, text = extract("<p>A</p><script>ignored()</script><style>.x{}</style>B")
    assert text == "AB"


def test_self_closing_is_start_tag():
    pages, images, _ = extract('<img src="i1"/><a href="p1"/>')
    assert images == ["i1"]
    assert pages == ["p1"]


def test_duplicate_attr_keeps_first():
    # spec tokenizer: duplicate-attribute parse error drops the later value
    pages, _, _ = extract('<a href="first" href="second">x</a>')
    assert pages == ["first"]


def test_multiple_tags_in_order():
    pages, images, _ = extract(
        '<a href="1"></a><img src="a"><a href="2"></a><img src="b">'
    )
    assert pages == ["1", "2"]
    assert images == ["a", "b"]


def test_charref_decoded_in_attrs():
    pages, _, _ = extract('<a href="http://a.example/?x=1&amp;y=2">z</a>')
    assert pages == ["http://a.example/?x=1&y=2"]


def test_bytes_input_lossy_decode():
    pages, _, text = extract(b'<a href="p">ok\xff</a>')
    assert pages == ["p"]
    assert text == "ok�"


def test_non_link_tags_ignored():
    pages, images, _ = extract('<link href="css"><area href="m"><source src="v">')
    assert pages == []
    assert images == []


def test_fast_path_differential_full_corpus():
    """The fast scanner must agree byte-for-byte with the html.parser
    reference implementation on every fixture page plus edge strings and
    random fuzz (unsupported constructs bail to the reference parser)."""
    import random

    from crawler_ray import fixtures

    bodies = fixtures.gen_corpus(5, 20)["html"].to_pylist()
    bodies += [
        b'<p <q><a href="x">t</a>',
        b"<p a=b>u</p>",
        b"<br/><hr />leftover",
        b"<SCRIPT a=b>x</SCRIPT>done",
        "<étag>x".encode(),
        b"<!-->",
        b"<![CDATA[x]]>",
        b"trailing <a href",
        b"<script>never closed",
        # rawtext stays open when the close-tag name has a suffix or junk:
        # html.parser's cdata `interesting` regex is the full '</\s*tag\s*>'
        b'<script>var a = "</scriptx>"; </script><a href=q>t</a>',
        b"<script>x</ script ><a href=q>t</a>",
        b"<script>x</scriptx></script>tail",
        b"<script>a</scr</script>after",
        b"<style>p{}</styleX></style>T<img src=i.png>",
        b'<script foo="bar">x</scriptx></script>ok',
        b"<script>x</script foo></script>y",
    ]
    rng = random.Random(23)
    frag = ['<a href="', '">', "</a>", "<img src=", " ", "x", "&amp;", "<",
            ">", '"', "'", "<script>", "</script>", "<!--", "-->", "/", "=",
            "href", "<?", "<!", "</", "<p a=b>"]
    for _ in range(800):
        bodies.append(
            "".join(rng.choice(frag) for _ in range(rng.randint(1, 20))).encode()
        )
    for _ in range(200):
        bodies.append(bytes(rng.randrange(256) for _ in range(rng.randint(0, 50))))
    for b in bodies:
        assert extract(b, fast=True) == extract(b, fast=False), b[:120]


def test_anchor_extractor_tokenizer_spec():
    """extract_anchors' tokenizer-level contract: capture between an
    href-carrying <a> start tag and the first </a> or next <a> (no
    nesting), rawtext excluded, self-closing emits empty text, duplicate
    href keeps the first, dangling anchors close at EOF, charrefs decode,
    whitespace collapses."""
    from crawler_ray.html_extract import extract_anchors

    assert extract_anchors('<a href="x">hello <b>world</b></a>') == [
        ("x", "hello world")
    ]
    assert extract_anchors('<a href="x">one<a href="y">two</a>') == [
        ("x", "one"),
        ("y", "two"),
    ]
    assert extract_anchors(
        '<a href="x"><script>alert("no")</script>yes</a>'
    ) == [("x", "yes")]
    assert extract_anchors('<a href="x"/><a href="y">t</a>') == [
        ("x", ""),
        ("y", "t"),
    ]
    assert extract_anchors('<a href="a" href="b">t</a>') == [("a", "t")]
    assert extract_anchors("<a>bare</a>") == []
    assert extract_anchors('<a href="x">dangling') == [("x", "dangling")]
    assert extract_anchors('<a href="x">a &amp; b</a>') == [("x", "a & b")]
    assert extract_anchors(b'<a href="x">caf\xc3\xa9\n  two</a>') == [
        ("x", "café two")
    ]
    assert extract_anchors('<!-- <a href="c">no</a> -->real<a href="y">t</a>') == [
        ("y", "t")
    ]


def test_anchor_texts_aggregation(ray_session):
    """anchor_texts: counts per (target, anchor), top-k by (count desc,
    anchor asc), min_mentions floor on the target total, empty anchors
    dropped, relative hrefs resolved against the origin root."""
    import ray.data as rd

    from crawler_ray.functions.graph import anchor_texts

    pages = [
        {
            "url": "http://h.test/a/page1",
            "html": b'<a href="/t">alpha</a><a href="/t">alpha</a>'
            b'<a href="t2">beta</a><a href="/img"></a>',
        },
        {
            "url": "http://h.test/page2",
            "html": b'<a href="http://h.test/t">gamma</a>'
            b'<a href="http://h.test/t">alpha</a>',
        },
    ]
    out = anchor_texts(rd.from_items(pages), top_k=1)
    # /t: alpha×3, gamma×1 → top-1 alpha; t2 resolves against ORIGIN ROOT
    # (http://h.test/t2, not /a/t2); /img dropped (empty anchor)
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [
        ("http://h.test/t", "alpha", 3),
        ("http://h.test/t2", "beta", 1),
    ]
    floored = anchor_texts(rd.from_items(pages), top_k=3, min_mentions=2)
    assert set(floored["url"]) == {"http://h.test/t"}
