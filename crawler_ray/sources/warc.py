"""WARC source/sink: ingest Common-Crawl-style web archives into the
engine's corpus schema (url, warc_ts, html) and write them back out.

Minimal ISO 28500 (WARC/1.0) record framing, implemented directly from the
public spec — no archive library in the container:

    WARC/1.0<CRLF>
    <header-name>: <value><CRLF> ...
    <CRLF>
    <Content-Length payload bytes>
    <CRLF><CRLF>

For ``WARC-Type: response`` records the payload is an HTTP response; the
page body is everything after the first blank line of the payload.

Ray shape: ``read_warc`` is ``read_binary_files`` (one block per .warc
file — the layout Common Crawl ships, ~1 GB/file, so file-level
parallelism is the natural unit) followed by one vectorized-per-record
``map_batches`` parse. No driver-side I/O; a 100 TB archive streams
through the object store like any other source.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_WARC_TS = "%Y-%m-%dT%H:%M:%SZ"

CORPUS_SCHEMA = pa.schema(
    [("url", pa.string()), ("warc_ts", pa.timestamp("us")), ("html", pa.binary())]
)


def iter_warc_records(data: bytes):
    """Yield (headers: dict[str, str], payload: bytes) per record. A
    malformed record (missing version line or Content-Length) is skipped
    by resyncing to the next ``WARC/`` marker instead of desyncing into
    payload bytes and losing the rest of the file."""
    i, n = 0, len(data)
    while i < n:
        while data.startswith(_CRLF, i):
            i += 2
        if i >= n:
            return
        if not data.startswith(b"WARC/", i):
            nxt = data.find(b"\r\nWARC/", i)
            if nxt < 0:
                return
            i = nxt + 2
            continue
        hdr_end = data.find(_SEP, i)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        lines = data[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError(length)
        except (KeyError, ValueError):
            # missing or non-numeric Content-Length: cannot frame the
            # payload — skip this record, resync to the next marker
            nxt = data.find(b"\r\nWARC/", hdr_end)
            if nxt < 0:
                return
            i = nxt + 2
            continue
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        yield headers, payload
        i = hdr_end + 4 + length


def _response_body(payload: bytes) -> bytes:
    """HTTP response payload → body (drop status line + headers)."""
    sep = payload.find(_SEP)
    return payload[sep + 4 :] if sep >= 0 else payload


def parse_warc_file(data: bytes) -> pa.Table:
    """One .warc file's bytes → corpus rows (response records only)."""
    urls: list[str] = []
    tss: list[int] = []
    bodies: list[bytes] = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        urls.append(headers.get("warc-target-uri", ""))
        ts = headers.get("warc-date", "")
        try:
            dt = datetime.strptime(ts, _WARC_TS).replace(tzinfo=timezone.utc)
            tss.append(int(dt.timestamp() * 1_000_000))
        except ValueError:
            tss.append(0)
        bodies.append(_response_body(payload))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
        }
    )


def read_warc(paths: str | list[str]):
    """WARC file(s)/dir → Dataset with the corpus schema (url, warc_ts,
    html). Feed ``.write_parquet`` to produce a crawlable corpus, or any
    map_batches stage directly."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, file_extensions=["warc"])

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_file(b.as_py()) for b in batch["bytes"]]
        if not tables:
            return CORPUS_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return ds.map_batches(parse, batch_format="pyarrow")


#: WARC 1.1 §6.7.2 revisit profile URI (identical payload digest)
REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def payload_digest(body: bytes) -> str:
    """``sha1:<base32>`` payload digest — the exact labeled-digest format
    WARC-Payload-Digest carries in Common Crawl / Heritrix output (WARC
    1.1 §5.9: base32-encoded SHA-1)."""
    import base64
    import hashlib

    return "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()


def write_warc_file(
    tbl: pa.Table, path: str, dedup_digests: bool = False
) -> int:
    """Corpus rows → one WARC/1.0 file of response records (the sink
    counterpart, used by the round-trip tests and for exporting crawl
    output to the archive format). Returns the record count.

    ``dedup_digests=True`` enables WARC 1.1 §6.7.2 storage dedup: a row
    whose payload digest was already written TO THIS FILE becomes a
    ``WARC-Type: revisit`` record (identical-payload-digest profile,
    ``WARC-Refers-To-Target-URI``/``-Date`` pointing at the first
    occurrence, zero-length payload) instead of a full response — the
    pointer-not-payload dedup the Wayback Machine and Common Crawl apply.
    Scope is deliberately file-local (the writer is one sink task; no
    cross-task state): CROSS-file dedup is the CDX layer's job —
    ``cdx.cdx_revisits`` computes exactly which captures a global index
    would deduplicate."""
    chunks: list[bytes] = []
    ts_col = tbl["warc_ts"].cast(pa.int64()).to_pylist() if "warc_ts" in tbl.column_names else [0] * tbl.num_rows
    seen: dict[str, tuple[str, str]] = {}
    for url, ts_us, html in zip(tbl["url"].to_pylist(), ts_col, tbl["html"].to_pylist()):
        body = html if isinstance(html, bytes) else (html or "").encode()
        ts = datetime.fromtimestamp((ts_us or 0) / 1e6, tz=timezone.utc)
        date = ts.strftime(_WARC_TS)
        dig = payload_digest(body)
        if dedup_digests and dig in seen:
            ref_url, ref_date = seen[dig]
            header = (
                f"WARC/1.0\r\n"
                f"WARC-Type: revisit\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {date}\r\n"
                f"WARC-Profile: {REVISIT_PROFILE}\r\n"
                f"WARC-Payload-Digest: {dig}\r\n"
                f"WARC-Refers-To-Target-URI: {ref_url}\r\n"
                f"WARC-Refers-To-Date: {ref_date}\r\n"
                f"Content-Length: 0\r\n"
            ).encode()
            chunks.append(header + _CRLF + _SEP)
            continue
        if dedup_digests:
            seen[dig] = (url, date)
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        header = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Payload-Digest: {dig}\r\n"
            f"Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        chunks.append(header + _CRLF + http + _SEP)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return tbl.num_rows


FULL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("record_type", pa.string()),
        ("digest", pa.string()),
    ]
)


def parse_warc_file_full(data: bytes) -> pa.Table:
    """One .warc file's bytes → rows for BOTH response and revisit
    records: ``(url, warc_ts, html, record_type, digest)`` — html is NULL
    on revisits (the payload lives in the referred record); digest comes
    from ``WARC-Payload-Digest`` (computed from the body when a response
    lacks the header, so pre-digest archives still resolve)."""
    urls: list[str] = []
    tss: list[int] = []
    bodies: list[bytes | None] = []
    kinds: list[str] = []
    digs: list[str] = []
    for headers, payload in iter_warc_records(data):
        kind = headers.get("warc-type")
        if kind not in ("response", "revisit"):
            continue
        urls.append(headers.get("warc-target-uri", ""))
        ts = headers.get("warc-date", "")
        try:
            dt = datetime.strptime(ts, _WARC_TS).replace(tzinfo=timezone.utc)
            tss.append(int(dt.timestamp() * 1_000_000))
        except ValueError:
            tss.append(0)
        kinds.append(kind)
        if kind == "response":
            body = _response_body(payload)
            bodies.append(body)
            digs.append(
                headers.get("warc-payload-digest") or payload_digest(body)
            )
        else:
            bodies.append(None)
            digs.append(headers.get("warc-payload-digest", ""))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "record_type": pa.array(kinds, pa.string()),
            "digest": pa.array(digs, pa.string()),
        }
    )


def read_warc_resolving(
    paths: str | list[str],
    n_buckets: int = 64,
    out_path: "str | None" = None,
):
    """WARC file(s) → fully RESOLVED capture rows: revisit records get
    their payload back from the response record sharing their digest.
    One hash-bucketed exchange on digest (a digest's response and all its
    revisits land in one bucket — same shape as every dedup exchange
    here), merge per bucket. Returns a pandas frame ``(url, warc_ts,
    html, was_revisit)``; a revisit whose referent is missing from the
    archive keeps html NULL (salvage semantics — observable, not
    dropped). Scale note: response bodies cross the exchange once; at
    archive scale the same resolution runs shard-local when revisits are
    file-local (the ``write_warc_file`` contract), making the exchange a
    no-op partition-wise. The result is corpus-sized: pass ``out_path``
    for the corpus-scale contract (resolved buckets stream straight to
    partitioned parquet from the workers, one stats row on the driver);
    the default gather serves test scale."""
    import pandas as pd
    import ray.data as rd

    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    ds = rd.read_binary_files(paths, file_extensions=["warc"])

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_file_full(b.as_py()) for b in batch["bytes"]]
        if not tables:
            return FULL_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        resp = df[df["record_type"] == "response"]
        body_of = dict(zip(resp["digest"], resp["html"]))
        out = df.copy()
        rev = out["record_type"] == "revisit"
        out.loc[rev, "html"] = out.loc[rev, "digest"].map(body_of)
        out["was_revisit"] = rev
        return out[["url", "warc_ts", "html", "was_revisit"]]

    refs = bucketed_group_map_refs(
        ds.map_batches(parse, batch_format="pyarrow"),
        bucket_on="digest",
        fn=resolve,
        n_buckets=n_buckets,
    )
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
            "was_revisit": pa.array([], pa.bool_()),
        }
    )
    if out_path is not None:
        from ..stages.output import sink_parquet

        out_ds = (
            rd.from_arrow_refs(refs)
            if refs is not None
            else rd.from_arrow(empty)
        )
        return sink_parquet(out_ds, out_path)
    got = gather_refs_pd(refs, empty=empty) if refs is not None else empty.to_pandas()
    return got.sort_values(["url", "warc_ts"]).reset_index(drop=True)
