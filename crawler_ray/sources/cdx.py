"""CDX URL index: SURT key computation, index build, CDXJ source/sink.

Web archives (Internet Archive, Common Crawl) publish a URL INDEX beside
the WARC data: one record per capture, keyed by the SURT form of the URL
("Sort-friendly URI Reordering Transform" — Heritrix's canonical key:
host labels reversed and comma-joined so that all URLs of a registered
domain sort together), serialized as CDXJ lines
(``<urlkey> <timestamp> <json>`` — the pywb / Common-Crawl cdx-index
format). The index is what lets a consumer answer "which captures exist
for host/prefix X" without touching petabytes of WARC — the lookup
artifact a crawl at the 10^10-URL design point must ship.

SURT spec implemented here (mirrored by the DuckDB oracle, which
re-parses the URL STRING with independent kernels):
  * scheme dropped; userinfo (``user:pw@``) dropped; host lowercased;
  * host labels reversed and comma-joined; an explicit port is kept,
    appended ``:port`` after the reversed host;
  * key = ``reversed_host[:port]`` + ``)`` + path+query (fragment
    dropped; empty path+query becomes ``/``). Path/query case is
    preserved (only the authority is case-insensitive per RFC 3986).
  No www-stripping or percent-encoding normalization is performed
  (Common Crawl's urlkey applies extra canonicalizations on top of
  SURT; this key is the Heritrix base form, documented subset).

Ray shape: ``surt_key`` is fully vectorized (polars list reverse/join —
no per-row Python); ``build_cdx_index`` is map_batches(key) → ONE
``Dataset.sort`` on (urlkey, ts) — the global range-partition sort IS
the operator here (an index must be totally ordered to serve prefix
scans), the one place this repo uses Ray Data's sort-based exchange on
purpose. ``write_cdxj`` writes the sorted blocks through one SINK TASK
per block to numbered shard files (block order = global order, so shard
N's key range precedes shard N+1's — resumable, range-addressable
output) plus a ``cluster.idx`` secondary index mapping each shard to its
first key. ``read_cdxj`` is ``read_binary_files`` (one block per shard,
parallel across files) + per-line parse with malformed-line salvage,
like the WARC/JSONL sources.

Reference anchor: the reference keeps no index at all (its seen-set is
an in-memory HashSet, main.rs:56); the CDX index is part of the
beyond-reference crawl-operations extension set (SURVEY.md §2),
downstream of the same canonical serializations urlnorm produces.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: CDXJ shard line budget — small enough that a shard is one scan unit,
#: large enough that file count stays manageable at the design point
DEFAULT_SHARD_ROWS = 100_000


def surt_key(urls: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Vectorized URL → SURT key (spec in the module docstring)."""
    import polars as pl

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    no_frag = pc.replace_substring_regex(
        pc.fill_null(urls, ""), pattern=r"#.*$", replacement=""
    )
    s = pl.from_arrow(no_frag)
    # authority = between scheme:// and the first / ? or end
    auth = s.str.extract(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?]*)", 1)
    # userinfo dropped (strip through the LAST @, RFC 3986 authority)
    hostport = auth.str.replace(r"^.*@", "")
    port = hostport.str.extract(r":(\d+)$", 1)
    host = hostport.str.replace(r":\d+$", "").str.to_lowercase()
    rev = host.str.split(".").list.reverse().list.join(",")
    pathq = s.str.replace(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*", "")
    out = (
        pl.DataFrame({"rev": rev, "port": port, "pathq": pathq})
        .select(
            (
                pl.col("rev")
                + pl.when(pl.col("port").is_null())
                .then(pl.lit(""))
                .otherwise(pl.lit(":") + pl.col("port"))
                + pl.lit(")")
                + pl.when(pl.col("pathq") == "")
                .then(pl.lit("/"))
                .otherwise(pl.col("pathq"))
            ).alias("urlkey")
        )["urlkey"]
        .to_arrow()
    )
    out = out.cast(pa.string())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def build_cdx_index(
    ds,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
):
    """Corpus captures → lazy SORTED Dataset ``(urlkey, ts, url, digest)``
    (global order on (urlkey, ts) via Ray Data's range-partition sort)."""

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "urlkey": surt_key(batch[url_col]),
                "ts": batch[ts_col].cast(pa.int64()),
                "url": batch[url_col],
                "digest": batch[digest_col],
            }
        )

    return ds.map_batches(key, batch_format="pyarrow").sort(["urlkey", "ts"])


def _serialize_cdxj_block(t: pa.Table):
    """One sorted block → one serialized CDXJ line per row (polars
    Series of strings, ``\\n``-terminated). Fully vectorized: polars
    struct → JSON plus string concat, no per-row ``json.dumps``. urlkeys
    containing a literal space are REJECTED loudly: the CDXJ line format
    is space-delimited, so such a key would be silently mangled into a
    salvage-dropped line on read — canonical SURT keys percent-encode
    spaces, so this only fires on malformed input."""
    import polars as pl

    keys = t["urlkey"]
    bad = pc.match_substring(keys, " ")
    if pc.any(bad).as_py():
        example = t.filter(bad)["urlkey"][0].as_py()
        raise ValueError(
            f"urlkey contains a space (CDXJ is space-delimited): {example!r}"
        )
    df = pl.from_arrow(t)
    lines = df.select(
        (
            pl.col("urlkey")
            + pl.lit(" ")
            + pl.col("ts").cast(pl.String)
            + pl.lit(" ")
            + pl.struct(["url", "digest"]).struct.json_encode()
            + pl.lit("\n")
        ).alias("line")
    )["line"]
    return lines


#: cached sink-task remote fn — a fresh ``@ray.remote`` per write_cdxj
#: call would export a new function definition to every worker each
#: call (same GCS-traffic reason stages/shuffle caches _SPLIT_TASKS)
_WRITE_BLOCK_TASK = None


def _write_block_task():
    global _WRITE_BLOCK_TASK
    if _WRITE_BLOCK_TASK is None:
        import ray

        @ray.remote
        def write_blocks(
            chunk_idx: int, out_dir: str, shard_rows: int, *tables
        ) -> "list[tuple[str, str, int, int]]":
            from pathlib import Path

            live = [
                pa.Table.from_batches([t])
                if isinstance(t, pa.RecordBatch)
                else t
                for t in tables
            ]
            live = [t for t in live if t.num_rows]
            if not live:
                return []
            # consecutive sorted blocks concat to a sorted run
            t = pa.concat_tables(live) if len(live) > 1 else live[0]
            out = Path(out_dir)
            lines = _serialize_cdxj_block(t)
            metas: list[tuple[str, str, int, int]] = []
            for sub, lo in enumerate(range(0, t.num_rows, shard_rows)):
                hi = min(lo + shard_rows, t.num_rows)
                p = out / f"cdx-{chunk_idx:05d}-{sub:04d}.cdxj"
                with open(p, "w", encoding="utf-8") as f:
                    f.write("".join(lines.slice(lo, hi - lo).to_list()))
                metas.append(
                    (
                        str(p),
                        t["urlkey"][lo].as_py(),
                        int(t["ts"][lo].as_py()),
                        hi - lo,
                    )
                )
            return metas

        _WRITE_BLOCK_TASK = write_blocks
    return _WRITE_BLOCK_TASK


def write_cdxj(
    sorted_ds,
    out_dir: str,
    shard_rows: int = DEFAULT_SHARD_ROWS,
) -> "list[str]":
    """Sorted index Dataset → ``cdx-BBBBB-SSSS.cdxj`` shards written by
    ONE SINK TASK PER SORTED BLOCK (block order = global order after the
    range-partition sort, and the block/sub-shard numbers are zero-padded,
    so lexicographic file order = global key order). The driver never
    touches row data — each task serializes its own block (vectorized, see
    ``_serialize_cdxj_block``) and returns only shard metadata; the driver
    folds that into a pywb-ZipNum-style ``cluster.idx`` secondary index
    (``first_urlkey first_ts filename nrows`` per shard) so a consumer can
    binary-search the key range to the right shard without opening it.
    Writers at the design point land on shared storage; single-box tests
    land on the local filesystem — same dataflow.

    Returns the shard paths in global key order (``cluster.idx`` sits
    beside them but is not in the returned list)."""
    from pathlib import Path

    import ray

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    from ..stages.shuffle import _chunk_refs

    task = _write_block_task()
    refs = sorted_ds.to_arrow_refs()
    # group CONSECUTIVE blocks per sink task (order preserved): at test
    # scale the sort emits dozens of tiny blocks and per-task overhead
    # would dominate; at the design point blocks are fat and the grouping
    # converges to ~one block per task
    chunks = _chunk_refs(refs)
    metas = [
        m
        for part in ray.get(
            [
                task.remote(i, str(out), shard_rows, *chunk)
                for i, chunk in enumerate(chunks)
            ]
        )
        for m in part
    ]
    (out / "cluster.idx").write_text(
        "".join(
            f"{first_key} {first_ts} {Path(p).name} {n}\n"
            for p, first_key, first_ts, n in metas
        ),
        encoding="utf-8",
    )
    return [p for p, _, _, _ in metas]


def read_cdxj(paths: "str | list[str]"):
    """CDXJ shards → lazy Dataset ``(urlkey, ts, url, digest)``; one input
    block per file (parallel across shards). Malformed lines (fewer than
    3 fields, non-integer timestamp, bad JSON) are SALVAGED — skipped,
    parsing continues — same contract as the WARC resync / JSONL
    bad-line handling."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        tss: list[int] = []
        urls: list[str] = []
        digs: list[str] = []
        for payload in batch["bytes"].to_pylist():
            for line in payload.decode("utf-8", errors="replace").splitlines():
                if not line.strip():
                    continue
                parts = line.split(" ", 2)
                if len(parts) != 3:
                    continue
                k, t, js = parts
                try:
                    ts = int(t)
                    rec = json.loads(js)
                except (ValueError, json.JSONDecodeError):
                    continue
                keys.append(k)
                tss.append(ts)
                urls.append(str(rec.get("url", "")))
                digs.append(str(rec.get("digest", "")))
        return pa.table(
            {
                "urlkey": pa.array(keys, pa.string()),
                "ts": pa.array(tss, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "digest": pa.array(digs, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def cdx_revisits(
    index_ds, n_buckets: int = 64, out_path: "str | None" = None
) -> pd.DataFrame:
    """WARC ``revisit`` resolution over a CDX index: within each urlkey's
    capture history (ordered by ts), a capture whose payload digest
    equals the PREVIOUS capture's digest is a revisit — the archive
    stores a pointer record instead of the payload (WARC 1.1 §6.7.2
    'revisit'; the Wayback Machine and Common Crawl both dedup storage
    this way, keyed by exactly this (urlkey, ts, digest) triple). Note
    the semantics are LAG-equality, not distinct-digest: A,B,A is THREE
    stored payloads (the return to A is a fresh fetch of content no
    longer deduplicable against the adjacent capture) — which is why the
    operator can stream per-key and needs no per-host digest set.

    Ray shape: one hash-bucketed exchange on urlkey (all captures of a
    key land in one bucket — stages/shuffle.bucketed_group_map_refs),
    then a vectorized sort + shift-compare per bucket; no global sort,
    no driver-side history. Output ``(urlkey, ts, digest, is_revisit)``
    sorted by (urlkey, ts) — corpus-sized: pass ``out_path`` for the
    corpus-scale contract (the marked buckets stream straight to
    partitioned parquet from the workers, only a one-row stats frame
    reaches the driver — stages/output.sink_parquet); the default
    driver gather serves the query-contract form at test scale.
    """
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["urlkey", "ts"]).reset_index(drop=True)
        prev_key = df["urlkey"].shift(1)
        prev_dig = df["digest"].shift(1)
        df["is_revisit"] = (df["urlkey"] == prev_key) & (
            df["digest"] == prev_dig
        )
        return df[["urlkey", "ts", "digest", "is_revisit"]]

    empty = pa.table(
        {
            "urlkey": pa.array([], pa.string()),
            "ts": pa.array([], pa.int64()),
            "digest": pa.array([], pa.string()),
            "is_revisit": pa.array([], pa.bool_()),
        }
    )
    refs = bucketed_group_map_refs(
        index_ds, bucket_on="urlkey", fn=mark, n_buckets=n_buckets
    )
    if out_path is not None:
        import ray.data as rd

        from ..stages.output import sink_parquet

        ds = (
            rd.from_arrow_refs(refs)
            if refs is not None
            else rd.from_arrow(empty)
        )
        return sink_parquet(ds, out_path)
    got = gather_refs_pd(refs, empty=empty) if refs is not None else empty.to_pandas()
    return (
        got.sort_values(["urlkey", "ts"])
        .reset_index(drop=True)
        .astype({"ts": "int64", "is_revisit": "bool"})
    )


def cdxj_salvage_counts(paths: "str | list[str]") -> pd.DataFrame:
    """Per-shard salvage metric for ``read_cdxj``: ``(path, total_lines,
    salvaged)`` where ``salvaged`` counts the malformed lines the reader
    skipped. Round-trip loss is silent inside ``read_cdxj`` by design
    (the salvage contract keeps bulk reads flowing); this companion scan
    makes it observable — a monitoring pipeline joins it to write-side
    row counts (``cluster.idx``) and alarms on any nonzero delta. Same
    parallel per-file shape as the reader."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def count(batch: pa.Table) -> pa.Table:
        out_paths: list[str] = []
        totals: list[int] = []
        salvaged: list[int] = []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            total = bad = 0
            for line in payload.decode("utf-8", errors="replace").splitlines():
                if not line.strip():
                    continue
                total += 1
                parts = line.split(" ", 2)
                if len(parts) != 3:
                    bad += 1
                    continue
                try:
                    int(parts[1])
                    json.loads(parts[2])
                except (ValueError, json.JSONDecodeError):
                    bad += 1
            out_paths.append(path)
            totals.append(total)
            salvaged.append(bad)
        return pa.table(
            {
                "path": pa.array(out_paths, pa.string()),
                "total_lines": pa.array(totals, pa.int64()),
                "salvaged": pa.array(salvaged, pa.int64()),
            }
        )

    return (
        ds.map_batches(count, batch_format="pyarrow")
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )


def prefix_lookup_indexed(out_dir: str, prefix: str) -> pd.DataFrame:
    """Prefix scan that uses ``cluster.idx`` to open ONLY the shards whose
    key range can contain the prefix — the pywb-ZipNum access path, and
    the reason ``write_cdxj`` emits the secondary index: a host lookup
    against a petabyte archive reads a handful of shards, not the index.
    Shard i's range is [first_key_i, first_key_{i+1}); a shard overlaps
    the prefix query iff first_key_i < prefix+MAX and the NEXT shard's
    first key is > prefix (binary search over the driver-resident,
    shard-count-sized manifest). Falls back to all shards when
    cluster.idx is absent (pre-round-5 output dirs)."""
    import bisect
    from pathlib import Path

    out = Path(out_dir)
    idx = out / "cluster.idx"
    if not idx.exists():
        import glob

        paths = sorted(glob.glob(str(out / "cdx-*.cdxj")))
        return prefix_lookup(read_cdxj(paths), prefix)
    names: list[str] = []
    first_keys: list[str] = []
    for ln in idx.read_text(encoding="utf-8").splitlines():
        if not ln.strip():
            continue
        first_key, _ts, name, _n = ln.rsplit(" ", 3)
        first_keys.append(first_key)
        names.append(name)
    # last shard whose first key <= prefix could still contain it; shards
    # after the first whose first key >= prefix+"￿" cannot
    lo = max(0, bisect.bisect_right(first_keys, prefix) - 1)
    hi = bisect.bisect_left(first_keys, prefix + "￿")
    selected = [str(out / n) for n in names[lo:hi]]
    if not selected:
        return pa.table(
            {
                "urlkey": pa.array([], pa.string()),
                "ts": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                "digest": pa.array([], pa.string()),
            }
        ).to_pandas()
    return prefix_lookup(read_cdxj(selected), prefix)


def prefix_lookup(index_ds, prefix: str) -> pd.DataFrame:
    """All captures whose urlkey starts with ``prefix`` (the index's
    reason to exist: a host/domain/path-subtree scan). Pushdown-shaped:
    one vectorized ``starts_with`` filter per block — on range-partitioned
    shards only the files whose key range overlaps the prefix would be
    read at all."""
    out = (
        index_ds.map_batches(
            lambda t: t.filter(pc.starts_with(t["urlkey"], prefix)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if len(out):
        return out.sort_values(["urlkey", "ts"]).reset_index(drop=True)
    # keep the index schema on an empty result (an empty filter over an
    # empty-block dataset can otherwise surface a column-less frame)
    return pa.table(
        {
            "urlkey": pa.array([], pa.string()),
            "ts": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "digest": pa.array([], pa.string()),
        }
    ).to_pandas()
