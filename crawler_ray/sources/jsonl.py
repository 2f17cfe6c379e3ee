"""JSONL source/sink: ingest text corpora shipped as JSON Lines — the
common interchange format for WET-style text extractions and public LLM
training sets (one JSON object per line, usually gzip-sharded) — coercing
into the engine's text-corpus schema ``(url, warc_ts, text, lang)``.

Ray shape, same as the WARC reader (sources/warc.py): one
``read_binary_files`` block per shard file — line-delimited shards are the
natural unit of file-level parallelism — followed by one per-file
vectorized parse inside ``map_batches``. No driver-side I/O; a 100 TB
corpus of .jsonl.gz shards streams through the object store like any
other source.

Parse strategy: the fast path hands the whole (decompressed) file buffer
to ``pyarrow.json.read_json`` — vectorized C++, no per-line Python. A
file containing malformed lines fails that strict parse, and only then
does the per-line salvage run, keeping well-formed records and counting
drops (the engine's warn-and-drop error contract; hard schema errors
still raise). Records without a ``url`` are dropped the same way.

``warc_ts`` accepts either an ISO-8601 string (``2020-09-13T12:26:40Z``)
or integer epoch microseconds; missing/invalid timestamps become null
rather than dropping the record (timestamps are metadata, text is the
payload).
"""

from __future__ import annotations

import gzip
import io
import json

import numpy as np
import pyarrow as pa

TEXT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_FIELDS = ("url", "warc_ts", "text", "lang")


def _coerce_ts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """ISO strings or epoch micros → timestamp[us]; unparseable → null."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us"))
    if pa.types.is_integer(t):
        return col.cast(pa.timestamp("us"))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        # strptime(error_is_null=...) is not exposed on all versions; mask
        # non-conforming strings first, then parse the survivors
        ok = pc.match_substring_regex(
            col, r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$"
        )
        masked = pc.if_else(pc.fill_null(ok, False), col, None)
        return pc.strptime(masked, format="%Y-%m-%dT%H:%M:%SZ", unit="us")
    return pa.nulls(len(col), pa.timestamp("us"))


def _normalize(tbl: pa.Table) -> pa.Table:
    """Project any parsed table onto TEXT_SCHEMA (missing columns → null,
    extra columns dropped, url-less rows removed)."""
    import pyarrow.compute as pc

    n = tbl.num_rows
    cols: dict[str, pa.Array] = {}
    names = set(tbl.column_names)
    cols["url"] = (
        tbl["url"].cast(pa.string()).combine_chunks()
        if "url" in names
        else pa.nulls(n, pa.string())
    )
    cols["warc_ts"] = (
        _coerce_ts(tbl["warc_ts"])
        if "warc_ts" in names
        else pa.nulls(n, pa.timestamp("us"))
    )
    for name in ("text", "lang"):
        cols[name] = (
            tbl[name].cast(pa.string()).combine_chunks()
            if name in names
            else pa.nulls(n, pa.string())
        )
    out = pa.table(cols, schema=TEXT_SCHEMA)
    return out.filter(pc.is_valid(out["url"]))


def parse_jsonl_bytes(data: bytes) -> pa.Table:
    """One shard file → TEXT_SCHEMA table (+ drop accounting in
    ``metadata``). Vectorized pyarrow fast path; per-line salvage only
    when the strict parse rejects the file. Gzip is detected by magic
    bytes, not extension — some readers (Ray's read_binary_files
    included) inflate .gz transparently before the bytes get here."""
    from pyarrow import json as pj

    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if not data.strip():
        return TEXT_SCHEMA.empty_table()
    try:
        tbl = pj.read_json(io.BytesIO(data))
        return _normalize(tbl)
    except pa.ArrowInvalid:
        pass
    rows = []
    dropped = 0
    for line in data.splitlines():
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError("not an object")
        except ValueError:
            dropped += 1
            continue
        rows.append({k: obj.get(k) for k in _FIELDS})
    if not rows:
        return TEXT_SCHEMA.empty_table()
    raw = pa.Table.from_pylist(rows)
    out = _normalize(raw)
    return out.replace_schema_metadata({b"jsonl_dropped": str(dropped).encode()})


def read_jsonl(paths: str | list[str]):
    """Dataset of TEXT_SCHEMA rows from .jsonl / .jsonl.gz shard files
    (file or directory paths). One read task per file; parse is one
    vectorized ``map_batches`` over the file bytes."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        parts = [
            parse_jsonl_bytes(data.as_py() if hasattr(data, "as_py") else data)
            for data in batch["bytes"]
        ]
        live = [p for p in parts if p.num_rows]
        if not live:
            return TEXT_SCHEMA.empty_table()
        return pa.concat_tables(
            [p.replace_schema_metadata(None) for p in live]
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def write_jsonl_file(tbl: pa.Table, path: str) -> int:
    """Write one TEXT_SCHEMA-ish table as one JSONL shard (gzipped when
    the path ends in .gz). Shard at the caller — one file per input
    shard is the resumable layout. Returns rows written."""
    tbl = _normalize(tbl)
    ts = tbl["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    urls = tbl["url"].to_pylist()
    texts = tbl["text"].to_pylist()
    langs = tbl["lang"].to_pylist()
    lines = []
    for i in range(tbl.num_rows):
        obj = {"url": urls[i]}
        if ts[i] is not None and not (
            isinstance(ts[i], float) and np.isnan(ts[i])
        ):
            import datetime as _dt

            obj["warc_ts"] = _dt.datetime.fromtimestamp(
                int(ts[i]) / 1e6, tz=_dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        if texts[i] is not None:
            obj["text"] = texts[i]
        if langs[i] is not None:
            obj["lang"] = langs[i]
        lines.append(json.dumps(obj, ensure_ascii=False, sort_keys=True))
    payload = ("\n".join(lines) + "\n").encode("utf-8")
    if path.endswith(".gz"):
        payload = gzip.compress(payload, mtime=0)  # mtime=0: deterministic bytes
    with open(path, "wb") as f:
        f.write(payload)
    return tbl.num_rows
