"""Wave processing: corpus-lookup "fetch" + HTML parse/link-extract.

The reference's page path (fetch → tokenize → extract → resolve,
/root/reference/src/main.rs:150-173) and image path (fetch → filename →
write, main.rs:264-281), re-expressed as one Ray Data pass per wave:

    read_parquet(corpus, columns=[url, html], filter=url ∈ wave_lookups)
      → map_batches(attach_frontier)        # corpus row → admitted rows
      → map_batches(process_wave_batch)     # parse pages, project images

The corpus scan IS the join: the admitted frontier (small side, bounded by
politeness at 257/host) is broadcast as an Arrow lookup TABLE via
``ray.put`` (zero-copy plasma reads per task) and each scan task runs an
``is_in`` semi-filter + Arrow hash join, and the ``isin`` filter prunes
corpus row groups at the read (predicate pushdown), so only the wave's
pages leave storage. At 10^10-frontier scale with a corpus laid out in
hash(url) buckets this becomes a bucket-pruned scan; the broadcast-probe
shape is unchanged.

Output is a single tagged stream (rec ∈ {'f','t','i','m'}) so one
write_parquet both checkpoints the wave and feeds the seen-probe read-back:

    rec='f'  finding     (src_url, src_depth, url, kind, depth)
    rec='t'  page text   (url, text)                — the byte-identity column
    rec='i'  image write (url, filename, data, nbytes)
    rec='m'  metric      (metric, count) per batch  — lineage accounting
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

from .. import urlnorm as un
from ..html_extract import extract

LOOKUP_SCHEMA = pa.schema(
    [
        ("fetch_url", pa.string()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
    ]
)

PARSED_SCHEMA = pa.schema(
    [
        ("rec", pa.string()),
        ("src_url", pa.string()),
        ("src_depth", pa.int32()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
        ("text", pa.string()),
        ("filename", pa.string()),
        ("data", pa.binary()),
        ("metric", pa.string()),
        ("count", pa.int64()),
    ]
)

def build_lookups(
    admitted: pa.Table,
) -> tuple[dict[str, list[tuple[str, str, int]]], Counter]:
    """Defragmented-url → [(full_url, kind, depth)] for every fetchable
    admitted row. Non-http/https schemes fail at the fetch layer (reqwest
    builder error) and are dropped here with a metric — they already counted
    against the host budget at dispatch (main.rs:103-107 precedes the
    fetch)."""
    metrics: Counter = Counter()
    lookups: dict[str, list[tuple[str, str, int]]] = {}
    for url_s, kind, depth in zip(
        admitted["url"].to_pylist(),
        admitted["kind"].to_pylist(),
        admitted["depth"].to_pylist(),
    ):
        u = un.parse(url_s)
        if u.scheme not in ("http", "https"):
            metrics["fetch_unsupported_scheme"] += 1
            continue
        lookups.setdefault(str(u.without_fragment()), []).append(
            (url_s, kind, int(depth))
        )
    return lookups, metrics


def build_lookup_table(admitted: pa.Table) -> tuple[pa.Table, Counter]:
    """Vectorized ``build_lookups``: admitted frontier rows → a LOOKUP_SCHEMA
    table of (fetch_url, url, kind, depth) — the per-wave join side against
    the corpus. Frontier URLs are canonical serializations (seeds and
    parse_links both round-trip through urlnorm — same invariant
    ``with_host`` relies on), so the scheme is the text before the first
    ``:`` and the fetch key is the url with its fragment stripped: two Arrow
    kernels, no per-row ``un.parse`` on the driver. Differential-tested
    against the reference-semantics ``build_lookups`` in
    test_crawl_engine.py. The broadcast unit is an Arrow table (zero-copy
    plasma reads in every scan task), not a pickled Python dict."""
    metrics: Counter = Counter()
    if admitted.num_rows == 0:
        return LOOKUP_SCHEMA.empty_table(), metrics
    urls = admitted["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    scheme = pc.struct_field(pc.extract_regex(urls, r"^(?P<s>[^:]*):"), "s")
    ok = pc.fill_null(
        pc.is_in(scheme, value_set=pa.array(["http", "https"])), False
    )
    n_bad = admitted.num_rows - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    if n_bad:
        # non-http/https schemes fail at the fetch layer (reqwest builder
        # error, main.rs:111-117) — dropped with a metric; they already
        # counted against the host budget at dispatch (main.rs:103-107)
        metrics["fetch_unsupported_scheme"] += int(n_bad)
        admitted = admitted.filter(ok)
        urls = admitted["url"].combine_chunks()
        if admitted.num_rows == 0:
            return LOOKUP_SCHEMA.empty_table(), metrics
    fetch = pc.replace_substring_regex(urls, pattern=r"(?s)#.*$", replacement="")
    tbl = pa.table(
        {
            "fetch_url": fetch,
            "url": urls,
            "kind": admitted["kind"],
            "depth": admitted["depth"],
        }
    ).cast(LOOKUP_SCHEMA)
    return tbl.combine_chunks(), metrics


def attach_frontier_join(batch: pa.Table, lookups: pa.Table) -> pa.Table:
    """Vectorized form of ``attach_frontier``: corpus (url, html) rows →
    one row per admitted frontier entry resolving to them, via an ``is_in``
    semi-filter (unmatched html never leaves Arrow) + one Arrow hash join.
    Output is sorted (url, kind, depth) so the parsed checkpoint's row
    order is deterministic regardless of scan order."""
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "kind": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "html": batch["html"].slice(0, 0)
            if "html" in batch.column_names
            else pa.array([], pa.binary()),
        }
    )
    if batch.num_rows == 0 or lookups.num_rows == 0:
        return empty
    m = pc.is_in(batch["url"], value_set=lookups["fetch_url"].combine_chunks())
    sub = batch.select(["url", "html"]).filter(m)
    if sub.num_rows == 0:
        return empty
    joined = sub.join(
        lookups.rename_columns(["fetch_url", "frontier_url", "kind", "depth"]),
        keys="url",
        right_keys="fetch_url",
        join_type="inner",
    )
    out = pa.table(
        {
            "url": joined["frontier_url"],
            "kind": joined["kind"],
            "depth": joined["depth"],
            "html": joined["html"],
        }
    )
    return out.sort_by(
        [("url", "ascending"), ("kind", "ascending"), ("depth", "ascending")]
    )


def attach_frontier(batch: pa.Table, lookups: dict) -> pa.Table:
    """Corpus (url, html) rows → one row per admitted frontier entry that
    resolves to them (fragment variants and page+image dual findings each
    get their own row, as each was a separate dispatch).

    Only the URL strings are materialized to Python for the dict probe; the
    html payloads of matched rows are gathered with an Arrow ``take``
    (zero-copy slices), so unmatched pages never leave Arrow — this stage
    is a probe, not a decode."""
    urls, kinds, depths, src_idx = [], [], [], []
    for i, corpus_url in enumerate(batch["url"].to_pylist()):
        entries = lookups.get(corpus_url)
        if entries:
            for url_s, kind, depth in entries:
                urls.append(url_s)
                kinds.append(kind)
                depths.append(depth)
                src_idx.append(i)
    html = (
        batch["html"].take(pa.array(src_idx, pa.int64()))
        if src_idx
        else batch["html"].slice(0, 0)  # keeps the column's exact dtype
    )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "html": html,
        }
    )


def _sub_table(rec: str, n: int, **cols) -> pa.Table:
    """One record type's rows as a PARSED_SCHEMA table: populated columns
    from ``cols``, everything else null (null columns cost only definition
    levels in the parquet checkpoint, and the hive rec= partitioning means
    consumers never read another type's columns)."""
    arrs = []
    for f in PARSED_SCHEMA:
        if f.name == "rec":
            arrs.append(pa.array([rec] * n, pa.string()))
        elif f.name in cols:
            arrs.append(pa.array(cols[f.name], f.type))
        else:
            arrs.append(pa.nulls(n, f.type))
    return pa.table(dict(zip(PARSED_SCHEMA.names, arrs)))


def process_wave_batch(batch: pa.Table, faithful_depth: bool = True) -> pa.Table:
    """Parse fetched pages and project fetched images (vector of rows per
    input row; tokenization is inherently per-document, the batch loop is
    over documents, never over tokens/links). Output is built columnar —
    per-type value lists → one Arrow array per column — not per-row dicts;
    within each rec type, row order matches the input page order (the
    cross-type interleaving is irrelevant: the checkpoint is partitioned
    by rec and every consumer reads one partition)."""
    metrics: Counter = Counter()
    t_url: list[str] = []
    t_text: list[str] = []
    f_src: list[str] = []
    f_sdep: list[int] = []
    f_url: list[str] = []
    f_kind: list[str] = []
    f_dep: list[int] = []
    i_url: list[str] = []
    i_name: list[str] = []
    i_data: list[bytes | None] = []
    i_count: list[int] = []
    for url_s, kind, depth, html in zip(
        batch["url"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["depth"].to_pylist(),
        batch["html"].to_pylist(),
    ):
        u = un.parse(url_s)
        if kind == "page":
            page_links, image_links, text = extract(html)
            t_url.append(url_s)
            t_text.append(text)
            kept_pages, mal_p = un.parse_links(page_links, u)
            kept_images, mal_i = un.parse_links(image_links, u)
            metrics["malformed_links"] += mal_p + mal_i
            child_depth = depth if faithful_depth else depth + 1
            findings = {}
            for cu in kept_pages:
                findings[(str(cu), "page", child_depth)] = True
            for cu in kept_images:
                findings[(str(cu), "image", 0)] = True
            for fu, fk, fd in findings:
                f_src.append(url_s)
                f_sdep.append(depth)
                f_url.append(fu)
                f_kind.append(fk)
                f_dep.append(fd)
        else:  # image fetch succeeded; apply the sink projection
            seg = u.last_path_segment()
            if seg is None:
                metrics["image_no_segments"] += 1
            elif seg == "":
                metrics["image_sink_error"] += 1  # File::create("…/") fails
            else:
                i_url.append(url_s)
                i_name.append(seg)
                i_data.append(html)
                i_count.append(len(html) if html is not None else 0)
    parts = []
    if t_url:
        parts.append(_sub_table("t", len(t_url), url=t_url, text=t_text))
    if f_url:
        parts.append(
            _sub_table(
                "f", len(f_url), src_url=f_src, src_depth=f_sdep,
                url=f_url, kind=f_kind, depth=f_dep,
            )
        )
    if i_url:
        parts.append(
            _sub_table(
                "i", len(i_url), url=i_url, filename=i_name,
                data=i_data, count=i_count,
            )
        )
    if metrics:
        parts.append(
            _sub_table(
                "m", len(metrics), metric=list(metrics),
                count=[metrics[k] for k in metrics],
            )
        )
    if not parts:
        return PARSED_SCHEMA.empty_table()
    return pa.concat_tables(parts)
