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


def write_warc_file(tbl: pa.Table, path: str) -> int:
    """Corpus rows → one WARC/1.0 file of response records (the sink
    counterpart, used by the round-trip tests and for exporting crawl
    output to the archive format). Returns the record count."""
    chunks: list[bytes] = []
    ts_col = tbl["warc_ts"].cast(pa.int64()).to_pylist() if "warc_ts" in tbl.column_names else [0] * tbl.num_rows
    for url, ts_us, html in zip(tbl["url"].to_pylist(), ts_col, tbl["html"].to_pylist()):
        body = html if isinstance(html, bytes) else (html or "").encode()
        ts = datetime.fromtimestamp((ts_us or 0) / 1e6, tz=timezone.utc)
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        header = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime(_WARC_TS)}\r\n"
            f"Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        chunks.append(header + _CRLF + http + _SEP)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return tbl.num_rows
