"""Sitemap source/sink + corpus seed discovery (sitemaps.org protocol).

The reference seeds its crawl from argv only (/root/reference/src/main.rs:
176-187); a production frontier is seeded from the sites' own published
sitemaps. This module ingests the three on-disk shapes the protocol
defines — XML ``<urlset>``, XML ``<sitemapindex>`` (one level of
indirection), and plain-text one-URL-per-line files, any of them gzipped —
into a seed table, provides the matching deterministic sink for round-trip
testing, and implements in-corpus seed discovery: per-host ``robots.txt``
``Sitemap:`` directives (with the ``/sitemap.xml`` convention as fallback)
resolved against the crawl corpus itself via pushdown ``isin`` scans, the
same out-of-band-metadata pattern as stages/robots.RobotsCache.

Ray shape, same as the WARC/JSONL readers: one ``read_binary_files`` block
per shard file (a sitemap file is capped at 50k URLs by the protocol, so
files are the natural parallel unit), then one per-file vectorized parse
inside ``map_batches``. No driver-side I/O on the read path.

Parse strategy: sitemap XML in the wild is machine-written and flat, so
the parser is two compiled-regex passes over the decoded file (``<url>``
blocks, then fields) — no DOM, matching the engine's tokenizer-level HTML
stance (SURVEY.md §2 P2). Entity escaping is handled for the five XML
built-ins in both directions, so locs containing ``&`` round-trip exactly.
Error contract: an entry without a ``<loc>`` is dropped and counted
(warn-and-drop, like the JSONL salvage path); an unparseable ``lastmod``
or ``priority`` becomes null rather than dropping the row (metadata vs
payload, same rule as jsonl._coerce_ts).
"""

from __future__ import annotations

import gzip
import re

import pyarrow as pa
import pyarrow.compute as pc

SEED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lastmod", pa.timestamp("us")),
        ("changefreq", pa.string()),
        ("priority", pa.float64()),
    ]
)

#: the five XML built-in entities — applied longest-first on unescape so
#: ``&amp;lt;`` decodes to ``&lt;`` (one level), mirroring escape order
_ESCAPES = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&apos;"),
]

_URL_BLOCK = re.compile(r"<url\b[^>]*>(.*?)</url>", re.S | re.I)
_SITEMAP_BLOCK = re.compile(r"<sitemap\b[^>]*>(.*?)</sitemap>", re.S | re.I)
_FIELD = {
    k: re.compile(rf"<{k}\b[^>]*>\s*(.*?)\s*</{k}>", re.S | re.I)
    for k in ("loc", "lastmod", "changefreq", "priority")
}
_INDEX_ROOT = re.compile(r"<\s*sitemapindex\b", re.I)
#: W3C datetime as sitemaps use it: date-only or full datetime w/ Z or
#: ±hh:mm offset (offset handled by the vectorized coercion below)
_LASTMOD_FULL = re.compile(
    r"^(\d{4}-\d{2}-\d{2})(?:[T ](\d{2}:\d{2}(?::\d{2})?(?:\.\d+)?)"
    r"(Z|[+-]\d{2}:\d{2})?)?$"
)


def xml_escape(s: str) -> str:
    for raw, ent in _ESCAPES:
        s = s.replace(raw, ent)
    return s


def xml_unescape(s: str) -> str:
    for raw, ent in reversed(_ESCAPES):
        s = s.replace(ent, raw)
    return s


def _decode(data: bytes) -> str:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data.decode("utf-8", errors="replace")


def _parse_lastmod_us(s: str | None) -> int | None:
    """W3C datetime → epoch micros (UTC); unparseable → None."""
    if not s:
        return None
    m = _LASTMOD_FULL.match(s.strip())
    if not m:
        return None
    import datetime as dt

    date_s, time_s, off_s = m.groups()
    try:
        d = dt.date.fromisoformat(date_s)
        if time_s is None:
            t = dt.time(0, 0, 0)
        else:
            parts = time_s.split(":")
            sec = 0.0
            if len(parts) == 3:
                sec = float(parts[2])
            t = dt.time(int(parts[0]), int(parts[1]), int(sec),
                        int(round((sec % 1) * 1e6)))
        ts = dt.datetime.combine(d, t, tzinfo=dt.timezone.utc)
        if off_s and off_s != "Z":
            sign = 1 if off_s[0] == "+" else -1
            hh, mm = int(off_s[1:3]), int(off_s[4:6])
            ts -= dt.timedelta(minutes=sign * (hh * 60 + mm))
        return int(ts.timestamp() * 1e6)
    except ValueError:
        return None


def _rows_to_table(
    locs: list[str],
    lastmods: list[int | None],
    changefreqs: list[str | None],
    priorities: list[float | None],
    dropped: int,
) -> pa.Table:
    out = pa.table(
        {
            "url": pa.array(locs, pa.string()),
            "lastmod": pa.array(lastmods, pa.int64()).cast(pa.timestamp("us")),
            "changefreq": pa.array(changefreqs, pa.string()),
            "priority": pa.array(priorities, pa.float64()),
        },
        schema=SEED_SCHEMA,
    )
    if dropped:
        out = out.replace_schema_metadata(
            {b"sitemap_dropped": str(dropped).encode()}
        )
    return out


def parse_sitemap_bytes(data: bytes) -> pa.Table:
    """One sitemap file → SEED_SCHEMA table.

    Handles ``<urlset>`` XML and plain-text one-URL-per-line files (the
    protocol's two leaf shapes), gzip by magic bytes. A ``<sitemapindex>``
    file yields an EMPTY table (its children are sitemaps, not pages —
    resolve them with :func:`parse_sitemap_index_bytes` or let
    :func:`discover_seeds` follow the one allowed level of indirection).
    """
    text = _decode(data)
    if "<" not in text:
        # plain-text sitemap: one URL per line, no metadata fields
        locs = [ln.strip() for ln in text.splitlines() if ln.strip()]
        return _rows_to_table(
            locs, [None] * len(locs), [None] * len(locs), [None] * len(locs), 0
        )
    if _INDEX_ROOT.search(text):
        return SEED_SCHEMA.empty_table()
    locs: list[str] = []
    lastmods: list[int | None] = []
    changefreqs: list[str | None] = []
    priorities: list[float | None] = []
    dropped = 0
    for block in _URL_BLOCK.findall(text):
        m = _FIELD["loc"].search(block)
        if not m or not m.group(1).strip():
            dropped += 1  # loc is the payload; entry without one is dropped
            continue
        locs.append(xml_unescape(m.group(1).strip()))
        lm = _FIELD["lastmod"].search(block)
        lastmods.append(_parse_lastmod_us(lm.group(1) if lm else None))
        cf = _FIELD["changefreq"].search(block)
        changefreqs.append(cf.group(1).strip().lower() if cf else None)
        pr = _FIELD["priority"].search(block)
        if pr:
            try:
                priorities.append(float(pr.group(1)))
            except ValueError:
                priorities.append(None)
        else:
            priorities.append(None)
    return _rows_to_table(locs, lastmods, changefreqs, priorities, dropped)


def parse_sitemap_index_bytes(data: bytes) -> list[str]:
    """``<sitemapindex>`` file → child sitemap locations (empty for a
    non-index file — shape dispatch is the caller's job)."""
    text = _decode(data)
    if "<" not in text or not _INDEX_ROOT.search(text):
        return []
    locs: list[str] = []
    for block in _SITEMAP_BLOCK.findall(text):
        m = _FIELD["loc"].search(block)
        if m and m.group(1).strip():
            locs.append(xml_unescape(m.group(1).strip()))
    return locs


def read_sitemaps(paths: str | list[str]):
    """Dataset of SEED_SCHEMA rows from sitemap files (file or directory
    paths; .xml / .txt / either .gz). One read task per file; the parse is
    one vectorized ``map_batches`` over file bytes. Index files contribute
    no rows here (their children are other FILES; on-disk corpora list the
    leaf shards directly — index indirection is a fetch-time concern,
    handled corpus-side by :func:`discover_seeds`)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        parts = [
            parse_sitemap_bytes(b.as_py() if hasattr(b, "as_py") else b)
            for b in batch["bytes"]
        ]
        live = [p.replace_schema_metadata(None) for p in parts if p.num_rows]
        if not live:
            return SEED_SCHEMA.empty_table()
        return pa.concat_tables(live)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_sitemap_file(tbl: pa.Table, path: str) -> int:
    """Write one SEED_SCHEMA-ish table as one ``<urlset>`` shard (gzipped
    when the path ends in .gz; mtime=0 so bytes are deterministic). Null
    metadata fields are omitted; ``priority`` is written at the protocol's
    0.0–1.0 single-decimal grain. Shard at the caller — one file per input
    shard is the resumable layout. Returns rows written."""
    import datetime as dt

    urls = tbl["url"].to_pylist()
    lastmods = (
        tbl["lastmod"].cast(pa.int64()).to_pylist()
        if "lastmod" in tbl.column_names
        else [None] * tbl.num_rows
    )
    changefreqs = (
        tbl["changefreq"].to_pylist()
        if "changefreq" in tbl.column_names
        else [None] * tbl.num_rows
    )
    priorities = (
        tbl["priority"].to_pylist()
        if "priority" in tbl.column_names
        else [None] * tbl.num_rows
    )
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u, lm, cf, pr in zip(urls, lastmods, changefreqs, priorities):
        lines.append("  <url>")
        lines.append(f"    <loc>{xml_escape(u)}</loc>")
        if lm is not None:
            iso = dt.datetime.fromtimestamp(
                lm / 1e6, tz=dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            lines.append(f"    <lastmod>{iso}</lastmod>")
        if cf is not None:
            lines.append(f"    <changefreq>{xml_escape(cf)}</changefreq>")
        if pr is not None:
            lines.append(f"    <priority>{pr:.1f}</priority>")
        lines.append("  </url>")
    lines.append("</urlset>")
    payload = ("\n".join(lines) + "\n").encode("utf-8")
    if path.endswith(".gz"):
        payload = gzip.compress(payload, mtime=0)
    with open(path, "wb") as f:
        f.write(payload)
    return tbl.num_rows


def write_sitemap_index_file(locs: list[str], path: str) -> int:
    """Write a ``<sitemapindex>`` file pointing at child sitemap URLs."""
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u in locs:
        lines.append("  <sitemap>")
        lines.append(f"    <loc>{xml_escape(u)}</loc>")
        lines.append("  </sitemap>")
    lines.append("</sitemapindex>")
    payload = ("\n".join(lines) + "\n").encode("utf-8")
    if path.endswith(".gz"):
        payload = gzip.compress(payload, mtime=0)
    with open(path, "wb") as f:
        f.write(payload)
    return len(locs)


#: sitemaps.org changefreq → recrawl interval, seconds. ``always`` means
#: recrawl every visit (interval 0); ``never`` means lastmod alone decides
#: (practically: only null-lastmod entries come due).
CHANGEFREQ_INTERVAL_S: dict[str, int] = {
    "always": 0,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,  # 30 days
    "yearly": 31_536_000,  # 365 days
    "never": 6_307_200_000,  # 200 years: effectively-never, yet the
    # resulting next_due still fits pandas' ns-epoch Timestamp range
}


def recrawl_due(ds, now_us: int, default_interval_s: int = 604_800):
    """Recrawl scheduling over a SEED_SCHEMA table: a URL is DUE at
    ``now_us`` iff it has no ``lastmod`` (never observed → fetch) or
    ``lastmod + interval(changefreq) <= now``, with missing/unknown
    changefreq falling back to ``default_interval_s`` (weekly). Emits
    ``(url, lastmod, changefreq, next_due, due)`` — the due set plus when
    each not-yet-due URL comes up, i.e. the input to the next crawl
    epoch's seed selection.

    One vectorized ``map_batches`` pass: the changefreq→interval map is
    applied via dictionary-encode + take (unique values only, no per-row
    Python), timestamps stay int64 micros. At the 10^10-URL design point
    this runs over the frontier partition-parallel with nothing on the
    driver; downstream either filters ``due`` for this epoch's frontier
    or min-aggregates ``next_due`` per host for wakeup scheduling."""
    import numpy as np

    def assign(t: pa.Table) -> pa.Table:
        cf = t["changefreq"].combine_chunks()
        de = pc.dictionary_encode(cf)
        uniq = [
            CHANGEFREQ_INTERVAL_S.get(u, default_interval_s) * 1_000_000
            if u is not None
            else default_interval_s * 1_000_000
            for u in de.dictionary.to_pylist()
        ]
        if len(uniq):
            iv = pa.array(uniq, pa.int64()).take(de.indices)
            iv = pc.fill_null(iv, default_interval_s * 1_000_000)
        else:
            iv = pa.array(
                np.full(t.num_rows, default_interval_s * 1_000_000), pa.int64()
            )
        lm = t["lastmod"].cast(pa.int64())
        next_due = pc.add_checked(lm, iv)  # null lastmod → null next_due
        due = pc.fill_null(  # never observed → due now
            pc.less_equal(next_due, pa.scalar(now_us, pa.int64())), True
        )
        return pa.table(
            {
                "url": t["url"],
                "lastmod": t["lastmod"],
                "changefreq": cf,
                "next_due": next_due.cast(pa.timestamp("us")),
                "due": due,
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def robots_sitemap_urls(body: bytes | str) -> list[str]:
    """``Sitemap:`` directive URLs from a robots.txt body. Per the
    protocol the directive is group-independent (applies regardless of
    User-agent sections), so this scans every line — unlike the
    group-scoped Allow/Disallow rules in stages/robots.parse_robots_rules."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    out: list[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def _corpus_bodies(corpus_path: str | list[str], urls: list[str]) -> dict[str, bytes]:
    """Pushdown ``isin`` scan of the crawl corpus for exact-url metadata
    pages (robots.txt / sitemap files stored as ordinary corpus rows) —
    the same out-of-band read RobotsCache.ensure_hosts does. Returns
    url → body for the rows that exist."""
    if not urls:
        return {}
    import pyarrow.dataset as pads

    dset = pads.dataset(corpus_path, format="parquet")
    t = dset.to_table(
        columns=["url", "html"], filter=pc.field("url").isin(urls)
    )
    out: dict[str, bytes] = {}
    for u, body in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        out[u] = body if isinstance(body, bytes) else str(body).encode()
    return out


def discover_seeds(
    corpus_path: str | list[str], hosts: list[str]
) -> pa.Table:
    """Seed frontier from the corpus' own published sitemaps.

    Per host: read ``{scheme}://host/robots.txt`` from the corpus and take
    its ``Sitemap:`` directives; hosts without any directive fall back to
    the ``{scheme}://host/sitemap.xml`` convention. Each sitemap body is
    then read from the corpus and parsed; ``<sitemapindex>`` files are
    followed exactly one level (the protocol forbids nested indexes).
    Returns SEED_SCHEMA + ``host``, sorted by (host, url) — deterministic
    input order for seeding a crawl.

    Scale shape: two pushdown ``isin`` scans (robots, then sitemaps) ∝
    hosts — metadata-sized, never corpus-sized; the parse loop runs over
    sitemap FILES (≤ 50k URLs each by protocol), not corpus rows. At the
    10^8-host design point the same two probes run as the bucketed
    exchange RobotsCache documents for its cache."""
    hosts = sorted(set(hosts))
    robots_urls = [
        f"{s}://{h}/robots.txt" for h in hosts for s in ("http", "https")
    ]
    robots = _corpus_bodies(corpus_path, robots_urls)
    sitemap_urls: dict[str, str] = {}  # sitemap url -> host
    for h in hosts:
        directed: list[str] = []
        for s in ("http", "https"):
            body = robots.get(f"{s}://{h}/robots.txt")
            if body is not None:
                directed.extend(robots_sitemap_urls(body))
        if not directed:
            directed = [f"{s}://{h}/sitemap.xml" for s in ("http", "https")]
        for u in directed:
            sitemap_urls.setdefault(u, h)
    bodies = _corpus_bodies(corpus_path, sorted(sitemap_urls))
    # one level of index indirection
    child_urls: dict[str, str] = {}
    for u, body in bodies.items():
        for child in parse_sitemap_index_bytes(body):
            child_urls.setdefault(child, sitemap_urls[u])
    child_bodies = _corpus_bodies(corpus_path, sorted(child_urls))
    parts: list[pa.Table] = []
    for u, body in {**bodies, **child_bodies}.items():
        t = parse_sitemap_bytes(body)
        if t.num_rows:
            host = sitemap_urls.get(u) or child_urls[u]
            parts.append(
                t.append_column("host", pa.array([host] * t.num_rows))
            )
    if not parts:
        return SEED_SCHEMA.append(pa.field("host", pa.string())).empty_table()
    out = pa.concat_tables(
        [p.replace_schema_metadata(None) for p in parts]
    ).combine_chunks()
    return out.sort_by([("host", "ascending"), ("url", "ascending")])
