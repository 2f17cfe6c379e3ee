"""BFS wave driver: the reference dispatcher loop (/root/reference/src/
main.rs:86-147) as an iterative sequence of Ray Data wave pipelines.

One wave = one superstep (the reference's queue-drain + double barrier):

  frontier ──politeness gate──▶ admitted ──corpus scan (pushdown join)──▶
  fetched ──map_batches(parse/extract/project)──▶ parsed (checkpointed)
  ──seen-probe (sharded actor pool)──▶ new findings ──depth gate──▶ frontier'

Cross-wave state = the seen-set actor pool (state/seen.py) + the carried
host-counts Counter; both are snapshotted every wave into a resumable
layout:

  out/wave=K/{admitted,archive_delta,next_frontier,host_counts,metrics}.parquet
  out/wave=K/parsed/rec=*/…        (hive-partitioned by record type:
                                    f=findings t=texts i=images m=metrics)
  out/wave=K/lineage.json          (row counts in/out, paths, config hash)
  out/wave=K/_COMPLETE             (atomic completion marker)

Resume = load the last _COMPLETE wave's next_frontier + host_counts and
re-insert all archive deltas into a fresh seen pool; re-running a crawl
that died mid-wave K reproduces the uninterrupted run bit-for-bit (tested).

Determinism: the canonical wave order (kind, url, depth) replaces the
reference's HashSet/completion-order nondeterminism (SURVEY.md §3) in
exactly two order-sensitive places — politeness admission and the image
overwrite winner; all other per-wave results are set-keyed. Heavy stages
(corpus scan, HTML parse) run as streaming Ray Data ops; tiny frontier
state ops use a driver fast-path below ``ray_state_threshold`` rows and a
Ray-task bucketed exchange above it (stages/politeness.py, stages/shuffle.py).
"""

from __future__ import annotations

import functools
import json
import shutil
from collections import Counter
from dataclasses import asdict, dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import urlnorm as un
from ..keys import finding_keys
from ..stages import politeness
from ..stages.parse import (
    PARSED_SCHEMA,
    attach_frontier_join,
    build_lookup_table,
    process_wave_batch,
)
from ..stages.robots import RobotsCache
from ..state.seen import SeenSet

FRONTIER_SCHEMA = pa.schema(
    [("url", pa.string()), ("kind", pa.string()), ("depth", pa.int32())]
)


@dataclass
class FrontierRef:
    """Handle to a frontier that stays OUT of driver memory: a parquet
    path (file or part-dir) plus its row count (from footers/probe
    counters). Waves above ``ray_state_threshold`` pass this between
    supersteps instead of a driver-held Arrow table; admission then reads
    it as a Dataset and runs the distributed politeness prep — unless
    ``prep`` carries the politeness.PreppedParts the PREVIOUS wave's sink
    tasks already produced (host attach + top-(limit+1) prune fused into
    the probe finalize, overlapping wave K's checkpoint tail), in which
    case admission starts directly at the gate exchange. The parquet parts
    are still written either way: ``prep`` is a same-process fast path,
    resume always reconstructs from disk."""

    path: str
    num_rows: int  # same accessor name as pa.Table, so callers are agnostic
    prep: "object | None" = None  # politeness.PreppedParts for the NEXT wave


@functools.lru_cache(maxsize=4)
def _cached_get(ref):
    """Per-worker-process cache for broadcast objects. Arrow tables read
    zero-copy from plasma, but ``ray.get`` still pays a per-call lookup and
    wrapper rebuild; the lookup table is immutable for the wave, so cache
    it by ObjectRef."""
    import ray

    return ray.get(ref)


_SCAN_TASK = None


def _scan_parse_file_task():
    """Lazily-decorated Ray task: probe+parse ONE pruned corpus file for a
    small wave. Module-level singleton so the function is exported to the
    cluster once, not re-pickled every wave."""
    global _SCAN_TASK
    if _SCAN_TASK is None:
        import ray

        @ray.remote
        def scan_parse_file(
            path: str,
            lookups: pa.Table,
            faithful_depth: bool,
            curate: bool = False,
        ):
            t = pq.read_table(path, columns=["url", "html"])
            t = attach_frontier_join(t, lookups)
            if t.num_rows == 0:
                return None
            out = process_wave_batch(t, faithful_depth=faithful_depth)
            if curate:
                from ..stages.curate import curate_table

                out = curate_table(out)
            return out

        _SCAN_TASK = scan_parse_file
    return _SCAN_TASK


_FPW_TASK = None


def _fetch_parse_write_task():
    """Lazily-decorated Ray task: parse ONE SLICE of a shard's fetched pages
    and write its piece of the wave checkpoint directly
    (rec=*/part-{id}.parquet) — the driver receives one integer per task,
    never page bytes. A fat shard fans out into several of these (slice
    bounds over the shard's fetched table, still one plasma object), so
    parse parallelism is decoupled from the shard count and a skewed shard
    can't straggle the wave."""
    global _FPW_TASK
    if _FPW_TASK is None:
        import ray

        @ray.remote(num_returns=2)
        def fetch_parse_write(
            fetched: "pa.Table | None",
            parsed_dir: str,
            part: int,
            faithful_depth: bool,
            codec: str,
            batch_size: int,
            off0: int = 0,
            length: "int | None" = None,
            curate: bool = False,
        ) -> "tuple[int, pa.Table | None]":
            """Returns ``(rows_written, findings_slice)``: the findings stay
            in the OBJECT STORE as the probe's direct input — the seen probe
            never re-reads the checkpoint and never waits for a Ray Data
            executor launch."""
            if fetched is None or fetched.num_rows == 0:
                return 0, None
            if length is not None:
                fetched = fetched.slice(off0, length)
                if fetched.num_rows == 0:
                    return 0, None
            outs = []
            for off in range(0, fetched.num_rows, batch_size):
                o = process_wave_batch(
                    fetched.slice(off, batch_size),
                    faithful_depth=faithful_depth,
                )
                if o.num_rows:
                    outs.append(o)
            if not outs:
                return 0, None
            t = pa.concat_tables(outs)
            pdir = Path(parsed_dir)
            findings = None
            for rec in ("f", "t", "i", "m"):
                sub = t.filter(pc.equal(t["rec"], rec))
                if sub.num_rows:
                    sub = sub.drop_columns(["rec"])
                    if curate and rec == "t":
                        from ..stages.curate import curate_text_table

                        sub = curate_text_table(sub)
                    d = pdir / f"rec={rec}"
                    d.mkdir(parents=True, exist_ok=True)
                    pq.write_table(
                        sub,
                        d / f"part-{part:05d}.parquet",
                        compression=codec,
                    )
                    if rec == "f":
                        findings = sub.select(
                            ["src_url", "src_depth", "url", "kind", "depth"]
                        )
            return t.num_rows, findings

        _FPW_TASK = fetch_parse_write
    return _FPW_TASK


_READ_FINDINGS_TASK = None
_READ_FRONTIER_TASK = None


def _read_frontier_task():
    """Lazily-decorated Ray task: read ONE next_frontier checkpoint part
    for the big-frontier politeness path — plain tasks instead of a Ray
    Data pipeline, saving the per-wave streaming-executor launch (the same
    trade as _read_findings_task)."""
    global _READ_FRONTIER_TASK
    if _READ_FRONTIER_TASK is None:
        import ray

        @ray.remote
        def read_frontier(path: str) -> pa.Table:
            return pq.read_table(path)

        _READ_FRONTIER_TASK = read_frontier
    return _READ_FRONTIER_TASK


def _read_findings_task():
    """Lazily-decorated Ray task: read ONE rec=f checkpoint part (scan-path
    probe input) — plain tasks instead of a Ray Data pipeline, saving the
    per-wave streaming-executor launch."""
    global _READ_FINDINGS_TASK
    if _READ_FINDINGS_TASK is None:
        import ray

        @ray.remote
        def read_findings(path: str) -> pa.Table:
            return pq.read_table(
                path, columns=["src_url", "src_depth", "url", "kind", "depth"]
            )

        _READ_FINDINGS_TASK = read_findings
    return _READ_FINDINGS_TASK


@dataclass
class CrawlConfig:
    depth_limit: int = 4
    host_limit: int = 256
    faithful_depth: bool = True
    num_seen_shards: int = 8
    seen_capacity_per_shard: int = 1_000_000
    seen_fpp: float = 0.01
    approx_seen: bool = False  # design-scale mode: filter only, no exact set
    seen_filter: str = "bloom"  # | "cuckoo" — the probe filter backend each
    # seen shard holds (north_rule names both; cuckoo supports deletion and
    # runs ~2 bytes/key at its fixed fingerprint width)
    batch_size: int = 256  # pages per parse batch
    ray_state_threshold: int = 50_000  # rows above which state ops go via Ray
    scan_pushdown_limit: int = 10_000  # wave lookups above which scan skips isin
    scan_task_path_limit: int = 5_000  # dispatches at/below which a wave's
    # scan+parse+checkpoint runs as driver-orchestrated tasks (no
    # streaming-executor launches); above it, waves are fat enough that the
    # Dataset path's parallel write beats the task path's driver write
    max_waves: int | None = None
    priority: str = "canonical"  # | shallow_first | hot_host_first
    max_per_host_wave: int | None = None  # per-host per-WAVE dispatch cap
    # (token politeness; politeness.split_wave_cap): rows beyond the cap
    # are deferred to the next wave's frontier, never dropped — while the
    # 257-budget doesn't bind, the fetched URL set is IDENTICAL to the
    # uncapped crawl's (equivalence-tested), spread over more waves; a
    # binding budget changes which URLs compete for it (see the operator's
    # docstring). A host's robots crawl-delay d with
    # wave period T maps to cap = T/d. Off = faithful reference semantics
    # (the reference dispatches a whole wave's worth per host at once,
    # main.rs:110-117). The capped mode routes admission through the
    # driver-table path (the split is a frontier-table op, like robots).
    host_rank_path: str | None = None  # parquet (host, rank) table for the
    # "ranked" priority mode — external host importance (e.g. the PageRank
    # of a previous crawl epoch via functions/graph.pagerank): high-rank
    # hosts drain their budget first. Loaded once per crawl, attached to
    # each wave's frontier as a dictionary-encoded lookup column.
    crawl_delay_wave_period: float | None = None  # honor per-host robots
    # Crawl-delay directives as PER-HOST wave caps: a host with delay d
    # gets floor(period/d) dispatches per wave, min 1
    # (robots.RobotsCache.wave_caps); hosts without a delay fall back to
    # max_per_host_wave (or no cap). Requires respect_robots=True — the
    # delays come from the same cached robots.txt bodies as the Disallow
    # gate.
    respect_robots: bool = False  # robots.txt gate (extension; off = faithful)
    blocked_hosts_path: str | None = None  # parquet with a ``host`` column
    # (e.g. ``trap_host_stats`` rows where trap) — findings from these
    # hosts are dropped UNCOUNTED at the frontier gate, before robots/
    # hostless/budget (politeness.filter_blocked_hosts; metric
    # dropped_blocked_host). Loaded once per crawl. The blocklist is
    # host-cardinality (small side by contract) — at 10^8 hosts it would
    # ride the politeness bucket exchange like the carried counts.
    checkpoint_compression: str = "snappy"  # parsed-checkpoint parquet
    # codec. Measured on this rig (interleaved A/B, 16 CPUs, fat-wave
    # corpus): snappy 17.2 s vs zstd 18.5 s full crawl — checkpoint writes
    # land in page cache here, so zstd's ~3× byte savings don't repay its
    # compression CPU. On a real cluster writing to actual disk/S3 the
    # byte savings win: set "zstd" there.
    materialize_wave: bool = False  # True: pin the whole parsed wave in the
    # object store and feed write+probe from plasma (round-2 design). False
    # (default): ONE streaming pass writes the checkpoint and the probe
    # re-reads only the tiny rec=f partition from the page-cache-warm
    # checkpoint — the wave's text/image payloads never occupy the object
    # store twice, which is the only layout that fits a 10^8-page wave.
    # Measured (same A/B): streaming 17.2 s vs materialize 21.2 s.
    use_fetch_service: bool = False  # fetch via the sharded in-memory
    # corpus service (stages/fetch.CorpusFetchService) instead of per-wave
    # corpus scans: corpus bytes are read ONCE (async build, overlapped
    # with the BFS warmup waves) and each wave then moves only the admitted
    # pages' bytes — the cost model of a real fetch fleet, where bytes/wave
    # ∝ dispatches and fetch capacity scales with nodes.
    fetch_service_shards: int | None = None  # default: num_seen_shards
    fetch_service_sync_build: bool = False  # block on the service seal
    # BEFORE wave 0 instead of overlapping the build with the warmup waves
    # — deterministic routed-path coverage (tests) or pre-warmed restarts
    distributed_counts: bool = False  # carry host-visit counts as
    # per-bucket object-store shards (politeness.CarriedCounts) instead of
    # a driver Counter + per-wave ray.put broadcast — the 10^8-host form:
    # the driver holds counts_buckets refs, each admission bucket task
    # joins its frontier slice against its own shard, and the per-wave
    # host_counts snapshot is written per bucket from inside those tasks.
    counts_buckets: int = 32
    curate: bool = False  # inline text curation (stages/curate.py): lang ID,
    # token counts and quality features computed in the SAME task that
    # parsed the page and written as extra rec=t checkpoint columns — the
    # production crawl/curation fusion (a separate pass would re-read every
    # text byte). Off by default for reference-faithful output.
    chaos_kill_shard: "tuple | None" = None  # fault-injection hook for the
    # in-run shard-recovery path: (wave, shard_idx) kills that seen shard
    # actor at the START of that wave (ray.kill, no restart). The wave's
    # probes then hit a dead actor, _probe_collect/SeenSet.probe_and_insert
    # rebuild the shard from the committed archive checkpoints and replay —
    # chaos-tested to produce bit-identical output (test_crawl_engine).
    chaos_kill_fetch_shard: "tuple | None" = None  # same, for a corpus
    # fetch-service shard: (wave, shard_idx). The routed fetch barrier
    # rebuilds the dead shard's partition from the corpus files and
    # re-issues only the affected fetch+parse slices.

    def fingerprint(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


def seeds_table(seeds: list[str]) -> pa.Table:
    """CLI seed semantics: parse with hard error on invalid (main.rs:306
    unwrap), HashSet dedup, canonical order, depth 0 (main.rs:87-92)."""
    uniq = sorted({str(un.parse(s)) for s in seeds})
    return pa.table(
        {
            "url": pa.array(uniq, pa.string()),
            "kind": pa.array(["page"] * len(uniq)),
            "depth": pa.array([0] * len(uniq), pa.int32()),
        }
    )


def _rec_counts(parsed_dir: Path) -> dict[str, int]:
    """Row count per record type from parquet footers only (hive layout)."""
    out: dict[str, int] = {}
    for d in parsed_dir.glob("rec=*"):
        out[d.name.split("=", 1)[1]] = sum(
            pq.ParquetFile(f).metadata.num_rows for f in d.glob("*.parquet")
        )
    return out


def _corpus_files(corpus_path: "str | list[str]") -> list[str]:
    if isinstance(corpus_path, (list, tuple)):
        out: list[str] = []
        for p in corpus_path:
            out.extend(_corpus_files(p))
        return out
    p = Path(corpus_path)
    if p.is_dir():
        return sorted(str(f) for f in p.glob("*.parquet"))
    return [str(p)]


class CorpusIndex:
    """File-level scan pruning from parquet footer statistics: the min/max
    of each file's ``url`` column is read ONCE from the metadata (no data
    pages touched). A wave then reads only the files whose url range
    intersects its admitted set — the file-level analog of the row-group
    ``isin`` pushdown, and exactly what a hash/host-partitioned layout
    buys at the 100 TB design point (reference corpora keep a host's pages
    contiguous, so early small waves touch a handful of files). Files
    without usable stats are never pruned, so any layout stays correct —
    an unsorted corpus just prunes nothing."""

    def __init__(self, corpus_path: "str | list[str]") -> None:
        self.files = _corpus_files(corpus_path)
        self.ranges: list[tuple[str, str] | None] = []
        self.num_rows: list[int] = []  # per-file footer row counts
        for f in self.files:
            rng: tuple[str, str] | None = None
            rows = 1 << 62  # unreadable footer: never under-slice
            try:
                md = pq.ParquetFile(f).metadata
                rows = md.num_rows
                idx = md.schema.to_arrow_schema().get_field_index("url")
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError("no stats")
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    rng = (min(mins), max(maxs))
            except Exception:
                rng = None
            self.ranges.append(rng)
            self.num_rows.append(rows)

    def files_for(self, sorted_urls: list[str]) -> list[str]:
        """Files whose url range can contain any of the (sorted) urls."""
        import bisect

        if not sorted_urls:
            return []
        out = []
        for f, rng in zip(self.files, self.ranges):
            if rng is None:
                out.append(f)
                continue
            lo, hi = rng
            i = bisect.bisect_left(sorted_urls, lo)
            if i < len(sorted_urls) and sorted_urls[i] <= hi:
                out.append(f)
        return out


@dataclass
class WaveStats:
    wave: int
    frontier_rows: int
    admitted: int
    findings: int
    new_findings: int
    next_frontier: int
    metrics: dict = field(default_factory=dict)


class CrawlRun:
    """Handle to a (possibly finished) crawl's on-disk layout."""

    def __init__(self, out_dir: str) -> None:
        self.out = Path(out_dir)

    def wave_dirs(self) -> list[Path]:
        return sorted(
            d for d in self.out.glob("wave=*") if (d / "_COMPLETE").exists()
        )

    def _concat(self, name: str, schema: pa.Schema | None = None) -> pa.Table:
        parts = [
            pq.read_table(d / name) for d in self.wave_dirs() if (d / name).exists()
        ]
        if not parts:
            return schema.empty_table() if schema else pa.table({})
        return pa.concat_tables(parts)

    def order(self) -> pa.Table:
        return self._concat("admitted.parquet")

    def compact_marker(self) -> "dict | None":
        """The archive-compaction marker (see ``compact_archive``), or None
        when the run has never been compacted."""
        m = self.out / "_COMPACT"
        if not m.exists():
            return None
        return json.loads(m.read_text())

    def archive(self) -> pa.Table:
        """Per-wave deltas in canonical (kind, url, depth) order, waves
        concatenated in order. The driver probe path writes each delta
        pre-sorted (sort is a no-op); the streaming sink path writes one
        part per exchange bucket, so the read applies the canonical sort —
        new-finding sets are order-insensitive, the sort just pins the
        cross-path bit layout. After ``compact_archive`` the folded waves
        read from the compact parts instead (the stored ``wave`` column
        reproduces the same global (wave, kind, url, depth) order
        bit-for-bit — equality-tested across the compaction boundary)."""
        parts = []
        marker = self.compact_marker()
        upto = -1
        if marker is not None:
            upto = int(marker["upto_wave"])
            cdir = self.out / marker["dir"]
            compact = pq.read_table(cdir)
            parts.append(
                compact.sort_by(
                    [
                        ("wave", "ascending"),
                        ("kind", "ascending"),
                        ("url", "ascending"),
                        ("depth", "ascending"),
                    ]
                ).drop_columns(["wave"])
            )
        for d in self.wave_dirs():
            if int(d.name.split("=")[1]) <= upto:
                continue
            p = d / "archive_delta.parquet"
            if p.exists():
                parts.append(
                    pq.read_table(p).sort_by(
                        [
                            ("kind", "ascending"),
                            ("url", "ascending"),
                            ("depth", "ascending"),
                        ]
                    )
                )
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return FRONTIER_SCHEMA.empty_table()
        return pa.concat_tables(parts).cast(FRONTIER_SCHEMA)

    def host_counts(self) -> Counter:
        dirs = self.wave_dirs()
        if not dirs:
            return Counter()
        p = dirs[-1] / "host_counts.parquet"
        if p.is_dir() and not any(p.glob("*.parquet")):
            return Counter()  # distributed carry, no host ever admitted
        t = pq.read_table(p)
        return Counter(dict(zip(t["host"].to_pylist(), t["dispatches"].to_pylist())))

    def _parsed(self, rec: str, columns: list[str]) -> pa.Table:
        parts = []
        for d in self.wave_dirs():
            sub = d / "parsed" / f"rec={rec}"
            if sub.exists() and any(sub.glob("*.parquet")):
                parts.append(pq.read_table(sub, columns=columns))
        return pa.concat_tables(parts) if parts else None

    def texts(self) -> dict[str, str]:
        t = self._parsed("t", ["url", "text"])
        if t is None:
            return {}
        return dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))

    def curated_texts(self) -> "pa.Table | None":
        """url + inline-curation columns of every crawled text (crawls run
        with ``curate=True``), one row per url in canonical order (a url
        dispatched at two depths yields two identical text rows — same
        text, same curation — collapsed here like ``texts()`` collapses)."""
        from ..stages.curate import CURATE_FIELDS

        t = self._parsed("t", ["url", *(f for f, _ in CURATE_FIELDS)])
        if t is None:
            return None
        t = t.sort_by([("url", "ascending")])
        u = t["url"].combine_chunks()
        if len(u) > 1:
            neq = pc.not_equal(u.slice(1), u.slice(0, len(u) - 1)).to_numpy(
                zero_copy_only=False
            )
            t = t.filter(pa.array(np.concatenate([[True], neq])))
        return t

    def image_files(self) -> dict[str, str]:
        """filename → url of the canonically-last write (overwrite wins).
        One sort + one keep-last dedup kernel over all waves' image rows
        (global order = (wave, url) ascending), no per-row Python loop."""
        parts = []
        for w, d in enumerate(self.wave_dirs()):
            sub = d / "parsed" / "rec=i"
            if sub.exists() and any(sub.glob("*.parquet")):
                t = pq.read_table(sub, columns=["url", "filename"])
                parts.append(
                    t.append_column(
                        "wave", pa.array(np.full(t.num_rows, w, dtype=np.int32))
                    )
                )
        if not parts:
            return {}
        df = (
            pa.concat_tables(parts)
            .sort_by([("wave", "ascending"), ("url", "ascending")])
            .to_pandas()
            .drop_duplicates("filename", keep="last")
        )
        return dict(zip(df["filename"], df["url"]))

    def export_images(self, dest_dir: str) -> int:
        """Reference image-sink parity (main.rs:271-278): write each image's
        bytes to ``dest_dir/{filename}`` in canonical order, later writes
        silently overwriting earlier ones. Returns files written."""
        dest = Path(dest_dir)
        dest.mkdir(parents=True, exist_ok=True)
        n = 0
        for d in self.wave_dirs():
            sub = d / "parsed" / "rec=i"
            if sub.exists() and any(sub.glob("*.parquet")):
                t = pq.read_table(
                    sub, columns=["url", "filename", "data"]
                ).sort_by([("url", "ascending")])
                for fname, data in zip(
                    t["filename"].to_pylist(), t["data"].to_pylist()
                ):
                    (dest / fname).write_bytes(data or b"")
                    n += 1
        return n

    def metrics(self) -> Counter:
        out: Counter = Counter()
        t = self._concat("metrics.parquet")
        if t.num_rows:
            for m, c in zip(t["metric"].to_pylist(), t["count"].to_pylist()):
                out[m] += c
        return out

    def n_waves(self) -> int:
        return len(self.wave_dirs())


def _archive_part_paths(run: CrawlRun) -> list:
    """Committed archive-delta parquet part paths — the durable restore /
    recovery source for the seen shards. Only ``_COMPLETE``-marked waves
    contribute (an in-flight wave's partial sink parts are excluded; its
    probes are replayed instead). After ``compact_archive`` the folded
    waves' rows come from the compact parts (waves ≤ the marker are
    skipped even if their delta files still exist — the post-marker
    delete is not atomic with the marker write, and double-inserting a
    key is idempotent for the filter but would double-count nothing;
    skipping keeps the replay fan-in bounded either way)."""
    out = []
    marker = run.compact_marker()
    upto = -1
    if marker is not None:
        upto = int(marker["upto_wave"])
        out.extend(sorted((run.out / marker["dir"]).glob("*.parquet")))
    for d in run.wave_dirs():
        if int(d.name.split("=")[1]) <= upto:
            continue
        p = d / "archive_delta.parquet"
        if p.is_dir():
            out.extend(sorted(p.glob("*.parquet")))
        elif p.exists():
            out.append(p)
    return out


def compact_archive(out_dir: str, group_size: int = 64) -> dict:
    """Bound a long crawl's restore/recovery replay fan-in: fold the
    committed waves' archive-delta parts (plus any previous compaction)
    into ⌈parts/group_size⌉ compact parquet parts, each carrying a
    ``wave`` column so ``CrawlRun.archive()`` reproduces the exact
    pre-compaction byte layout. A 10^3-wave production crawl otherwise
    replays 10^3×buckets small files into every rebuilt seen shard; after
    compaction it replays a bounded set plus only the post-marker deltas.

    Distributed shape: one Ray task per output part reads its input
    group and writes directly (nothing archive-sized on the driver).
    Crash-safe ordering: new revision dir → atomic marker replace
    (tmp + os.replace) → delete the consumed delta files and stale
    revisions; a crash between steps leaves either the old marker with
    all inputs intact or the new marker with harmless leftovers that
    readers skip. Returns {"upto_wave", "parts_in", "parts_out", "rows"}.
    """
    import ray

    run = CrawlRun(out_dir)
    dirs = run.wave_dirs()
    if not dirs:
        return {"upto_wave": -1, "parts_in": 0, "parts_out": 0, "rows": 0}
    upto = int(dirs[-1].name.split("=")[1])
    marker = run.compact_marker()
    prev_upto = -1 if marker is None else int(marker["upto_wave"])
    # inputs: (path, wave_const_or_None); previous compact parts already
    # carry their wave column
    inputs: list[tuple[str, "int | None"]] = []
    if marker is not None:
        inputs.extend(
            (str(p), None)
            for p in sorted((run.out / marker["dir"]).glob("*.parquet"))
        )
    for d in dirs:
        w = int(d.name.split("=")[1])
        if w <= prev_upto:
            continue
        p = d / "archive_delta.parquet"
        if p.is_dir():
            inputs.extend((str(f), w) for f in sorted(p.glob("*.parquet")))
        elif p.exists():
            inputs.append((str(p), w))
    rev = run.out / f"archive_compact-r{upto:05d}.parquet"
    rev.mkdir(parents=True, exist_ok=True)

    @ray.remote
    def fold(group: list, out_path: str) -> int:
        import pyarrow.parquet as _pq

        tables = []
        for path, wave in group:
            t = _pq.read_table(path)
            if wave is not None:
                t = t.append_column(
                    "wave", pa.array(np.full(t.num_rows, wave, np.int32))
                )
            tables.append(t)
        merged = pa.concat_tables(tables).sort_by(
            [
                ("wave", "ascending"),
                ("kind", "ascending"),
                ("url", "ascending"),
                ("depth", "ascending"),
            ]
        )
        _pq.write_table(merged, out_path)
        return merged.num_rows

    futs = []
    for i in range(0, len(inputs), group_size):
        futs.append(
            fold.remote(
                inputs[i : i + group_size],
                str(rev / f"part-{i // group_size:05d}.parquet"),
            )
        )
    rows = sum(ray.get(futs))
    tmp = run.out / "_COMPACT.tmp"
    tmp.write_text(json.dumps({"upto_wave": upto, "dir": rev.name}))
    import os

    os.replace(tmp, run.out / "_COMPACT")
    # cleanup: consumed delta files + stale revisions (best-effort)
    for path, wave in inputs:
        try:
            Path(path).unlink()
        except OSError:
            pass
    for stale in run.out.glob("archive_compact-r*.parquet"):
        if stale.name != rev.name:
            shutil.rmtree(stale, ignore_errors=True)
    return {
        "upto_wave": upto,
        "parts_in": len(inputs),
        "parts_out": len(futs),
        "rows": rows,
    }


def _probe_new(
    findings: pa.Table,
    seen: SeenSet,
    faithful_depth: bool,
    epoch: "int | None" = None,
) -> pa.Table:
    """Wave-level dedup + archive probe. In non-faithful mode, reduce to one
    row per Finding key first (canonical winner = min (src_url, src_depth)),
    because the depth gate reads the discovering response's depth and the
    canonical response order is (src_url, src_depth) — see oracle.py.
    ``epoch`` (the wave number) makes the probe replayable after a shard
    death (see SeenSet.probe_and_insert)."""
    if findings.num_rows == 0:
        return findings
    if not faithful_depth:
        findings = findings.sort_by(
            [
                ("url", "ascending"),
                ("kind", "ascending"),
                ("depth", "ascending"),
                ("src_url", "ascending"),
                ("src_depth", "ascending"),
            ]
        )
    else:
        # faithful mode: rows sharing a Finding key are identical in every
        # column that matters (src_depth == depth == constant), so wave-level
        # key-dedup before the probe is free of ordering concerns
        pass
    # wave-level self-dedup: links are discovered by many pages (~fan-in×),
    # so dropping duplicate keys first shrinks the probe by that factor.
    # Same vectorized sort + adjacent-neq kernel as the streaming path
    # (_dedup_bucket): findings were just sorted on the key columns above
    # (non-faithful) or are key-identical in every column that matters
    # (faithful — sort only for adjacency), so keep-first == keep-min.
    if faithful_depth:
        findings = findings.sort_by(
            [("url", "ascending"), ("kind", "ascending"), ("depth", "ascending")]
        )
    keys = finding_keys(findings["url"], findings["kind"], findings["depth"])
    k = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    if len(k) > 1:
        neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.concatenate([[True], neq])
        if not first.all():
            m = pa.array(first)
            findings = findings.filter(m)
            k = k.filter(m)
    mask = seen.probe_and_insert(k, epoch=epoch)
    return _canonical_findings_sort(findings.filter(pa.array(mask)))


def _canonical_findings_sort(t: pa.Table) -> pa.Table:
    """Checkpoint determinism: new-finding sets are order-insensitive, but
    the parquet row order must be stable for bit-identical resume/compare."""
    return t.sort_by(
        [("kind", "ascending"), ("url", "ascending"), ("depth", "ascending")]
    )


_FINDINGS_SCHEMA = pa.schema(
    [
        ("src_url", pa.string()),
        ("src_depth", pa.int32()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
    ]
)


def _split_by_key_hash(block: pa.Table, n: int) -> list:
    """Map side of the findings exchange: project one parsed block down to
    its finding rows + key column, then slice into n key-hash partitions
    (one filter + sort + searchsorted, zero-copy slices — the heavy
    text/image columns are dropped before anything ships)."""
    from ..keys import hash64
    from ..stages.shuffle import _as_arrow

    block = _as_arrow(block) if block is not None else None
    if block is None or block.num_rows == 0 or "url" not in block.column_names:
        return [None] * n  # empty / schemaless / no-finding blocks
    if "rec" in block.column_names:
        block = block.filter(pc.equal(block["rec"], "f")).select(
            ["src_url", "src_depth", "url", "kind", "depth"]
        )
    if "fkey" not in block.column_names:
        block = block.append_column(
            "fkey", finding_keys(block["url"], block["kind"], block["depth"])
        )
    if block.num_rows == 0:
        return [None] * n
    h = (hash64(block["fkey"]) % np.uint64(n)).astype(np.int64)
    order = np.argsort(h, kind="stable")
    s = block.take(pa.array(order))
    hb = h[order]
    bounds = np.searchsorted(hb, np.arange(n + 1))
    return [
        s.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        if bounds[i + 1] > bounds[i]
        else None
        for i in range(n)
    ]


def _dedup_bucket(*parts) -> "tuple[pa.Table | None, pa.Array | None]":
    """Reduce side, step 1 (pure, no actor calls): all wave rows whose key
    hashes to this bucket. One vectorized sort+dedup picks the canonical
    discoverer per Finding key (min (url, kind, depth, src_url, src_depth)
    — in faithful mode all key-sharers agree on everything downstream reads
    EXCEPT image depths, which is exactly why the winner must be canonical,
    see oracle.py). Returns ``(deduped_rows, unique_keys)`` as two objects:
    the keys go to the bucket's seen shard, the rows to the finalize task."""
    parts = [p for p in parts if p is not None and p.num_rows]
    if not parts:
        return None, None
    t = pa.concat_tables(parts)
    order = pc.sort_indices(
        t,
        sort_keys=[
            (c, "ascending")
            for c in ("url", "kind", "depth", "src_url", "src_depth")
        ],
    )
    t = t.take(order)
    k = t["fkey"].combine_chunks()
    if len(k) > 1:
        # sorted on the key fields ⇒ equal fkeys are adjacent
        neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.concatenate([[True], neq])
    else:
        first = np.ones(len(k), dtype=bool)
    t = t.filter(pa.array(first))
    return t, t["fkey"].combine_chunks()


def _finalize_bucket(
    t: "pa.Table | None",
    mask,
    bucket_id: int,
    out_spec: "tuple | None",
) -> "pa.Table | tuple | None":
    """Reduce side, step 2: filter the bucket's deduped rows by the shard's
    new-mask and emit. Runs as a plain task whose args are OBJECT REFS
    (dedup output + shard mask) — Ray resolves them before scheduling, so
    no worker ever sits blocked in a ``ray.get`` (a blocked get inside a
    task makes the raylet spawn surplus workers and thrash the node; the
    round-3 profile measured intermittent 5-30 s probe spikes from exactly
    that before this split)."""
    if t is None:
        return (None, None) if out_spec is not None else None
    new = t.filter(pa.array(mask)).drop_columns(["fkey"])
    if out_spec is None:
        return new
    # SINK MODE: this reduce task writes its bucket's slice of the wave's
    # archive delta and (depth-gated) next frontier straight to the
    # checkpoint — the new-finding stream never lands on the driver; only
    # two scalar counts return per bucket. Within-part rows are in
    # canonical order; the cross-part order is by bucket id (file name),
    # and readers that need the global canonical order sort per wave
    # (CrawlRun.archive) — new-finding sets are order-insensitive.
    archive_dir, frontier_dir, depth_limit, codec, host_limit, priority = out_spec
    new = _canonical_findings_sort(new.cast(_FINDINGS_SCHEMA))
    n_new = new.num_rows
    if n_new:
        pq.write_table(
            new.select(["url", "kind", "depth"]).cast(FRONTIER_SCHEMA),
            Path(archive_dir) / f"part-{bucket_id:05d}.parquet",
            compression=codec,
        )
    nf = new.filter(pc.less(new["src_depth"], depth_limit)).select(
        ["url", "kind", "depth"]
    ).cast(FRONTIER_SCHEMA)
    if nf.num_rows:
        pq.write_table(
            nf,
            Path(frontier_dir) / f"part-{bucket_id:05d}.parquet",
            compression=codec,
        )
    # NEXT wave's politeness prep, fused here: attach the host key, count
    # valid rows, and run the per-host top-(limit+1) combiner on this
    # bucket's frontier slice WHILE the current wave's tail is still
    # draining — the next admission then starts directly at the gate
    # exchange (politeness.PreppedParts), saving the frontier re-read and
    # the prep task round every wave. The parquet part above is still the
    # durable copy; resume rebuilds prep from disk.
    prepped = None
    n_valid = 0
    hostc = None
    if host_limit is None:
        # caller will re-read the frontier anyway (e.g. robots gating runs
        # on the driver first): don't compute a prep that gets discarded
        return (n_new, nf.num_rows, 0, None), None
    if nf.num_rows:
        v = politeness.with_host(nf)
        valid = v.filter(pc.is_valid(v["host"]))
        n_valid = valid.num_rows
        if n_valid:
            if priority == "hot_host_first":
                hostc = politeness.vc_to_dict(valid["host"])
            prepped = politeness.presalt_prune(valid, host_limit, priority)
    return (n_new, nf.num_rows, n_valid, hostc), prepped


_PROBE_REMOTES = None


def _probe_remotes():
    """Singleton ``ray.remote`` wrappers for the probe dataflow's three task
    kinds. Wrapping per call makes every wave export three NEW function
    definitions to every worker process; with 100+ workers × 3 functions ×
    per wave, the GCS function-table traffic alone is a measurable per-wave
    tax on small waves."""
    global _PROBE_REMOTES
    if _PROBE_REMOTES is None:
        import ray

        _PROBE_REMOTES = (
            ray.remote(_split_by_key_hash),
            ray.remote(num_returns=2)(_dedup_bucket),
            ray.remote(_finalize_bucket),
        )
    return _PROBE_REMOTES


def _probe_new_streaming(
    rd,
    parsed_dir: Path,
    seen: SeenSet,
    wave: int,
    parsed_mat=None,
    sink=None,
    finding_refs=None,
) -> "pa.Table | tuple[int, int]":
    """Large-wave seen probe: the raw finding stream never lands on the
    driver. An explicit task exchange hash-partitions the wave's findings
    by Finding key; per bucket a dedup task picks the canonical discoverer,
    its unique keys flow (as an object ref) into ONE probe call on the
    bucket's seen shard, and a finalize task joins rows+mask and emits —
    a pure dataflow chain submitted entirely from the driver, so no worker
    ever blocks in ``ray.get`` (blocked in-task gets make the raylet spawn
    surplus workers and thrash the node). Bucket count is a multiple of the
    shard count and both route by the same ``hash64(fkey)``, so every
    bucket's keys land on exactly one shard: shard = bucket % num_shards.
    Recovery: probe calls are idempotent via shard probe-id memos (a
    re-executed dedup task re-presents identical keys); anything harsher
    falls back to wave-level resume like the rest of the wave machinery.

    ``sink=(wave_dir, depth_limit, codec)``: the reduce tasks write the wave's
    archive-delta and depth-gated next-frontier parquet parts DIRECTLY
    (one part per bucket under ``wave_dir/{archive_delta,
    next_frontier}.parquet/``) and the call returns only the scalar pair
    ``(n_new, n_next_frontier)`` — nothing frontier-sized ever returns to
    the driver. Without ``sink`` the probed table returns driver-side
    (small-wave/test form)."""
    run = _probe_submit(rd, parsed_dir, seen, wave, parsed_mat, sink, finding_refs)
    return _probe_collect(run, seen)


def _probe_submit(
    rd,
    parsed_dir: Path,
    seen: SeenSet,
    wave: int,
    parsed_mat=None,
    sink=None,
    finding_refs=None,
) -> tuple:
    """Submit the whole probe dataflow (split → dedup → shard probe →
    finalize) WITHOUT waiting: returns ``(futures, out_spec, dirs,
    resubmit)`` for ``_probe_collect`` (``resubmit`` replays the chain
    after shard recovery). Split out so fat waves can submit the chain right
    after dispatching their parse tasks — the probe's inputs are the parse
    tasks' findings refs, so Ray starts each probe stage as its inputs
    land and the probe rides the parse tail instead of serializing after
    the checkpoint barrier."""
    import ray  # noqa: F401  (submission uses task handles below)

    if finding_refs is not None:
        # fetch-service path: the parse tasks returned their findings
        # slices as plasma refs — probe them directly, no checkpoint
        # re-read, no Ray Data executor launch
        refs = list(finding_refs)
    elif parsed_mat is not None:
        # the wave's blocks are already in the object store — split tasks
        # project them to finding rows; no disk re-read
        refs = parsed_mat.to_arrow_refs()
    else:
        # scan path: plain read tasks over the rec=f checkpoint parts —
        # one task per part file, no per-wave streaming-executor launch
        read = _read_findings_task()
        refs = [
            read.remote(str(f))
            for f in sorted((parsed_dir / "rec=f").glob("*.parquet"))
        ]
    # multiple of num_shards ⇒ hash64 % n_buckets determines hash64 %
    # num_shards, so one bucket probes exactly one shard (single actor call)
    n_buckets = seen.num_shards * max(2, -(-16 // seen.num_shards))
    out_spec = None
    if sink is not None:
        wave_dir, depth_limit, codec, host_limit, priority = sink
        archive_dir = Path(wave_dir) / "archive_delta.parquet"
        frontier_dir = Path(wave_dir) / "next_frontier.parquet"
        archive_dir.mkdir(parents=True, exist_ok=True)
        frontier_dir.mkdir(parents=True, exist_ok=True)
        out_spec = (
            str(archive_dir),
            str(frontier_dir),
            depth_limit,
            codec,
            host_limit,
            priority,
        )
    split, dedup, finalize = _probe_remotes()

    def submit():
        # Replayable (shard-failure recovery): probe ids are stable across
        # replays — a surviving shard answers from its epoch memo without
        # re-inserting, a rebuilt shard answers fresh from committed state,
        # and (buckets key-disjoint, within-bucket keys unique) the masks
        # come out bit-identical to a failure-free run. Finalize parts
        # rewrite the same deterministic filenames.
        slices = [
            split.options(num_returns=n_buckets).remote(r, n_buckets)
            for r in refs
        ]
        futures = []
        for b in range(n_buckets):
            t_ref, keys_ref = dedup.remote(*[s[b] for s in slices])
            s = b % seen.num_shards
            mask_ref = seen.shards[s].probe_and_insert.remote(
                keys_ref, (wave, "wavebucket", b, s)
            )
            if out_spec is not None:
                # sink mode returns (scalars, prepped-frontier slice) as
                # two objects so the driver can keep the prep ref
                # undereferenced
                futures.append(
                    finalize.options(num_returns=2).remote(
                        t_ref, mask_ref, b, out_spec
                    )
                )
            else:
                futures.append(finalize.remote(t_ref, mask_ref, b, out_spec))
        return futures

    dirs = (archive_dir, frontier_dir) if out_spec is not None else None
    return submit(), out_spec, dirs, submit


def _probe_collect(run: tuple, seen: SeenSet) -> "pa.Table | tuple[int, int]":
    """Wait for a submitted probe dataflow and fold its results (see
    ``_probe_new_streaming`` for the two return forms). A seen-shard actor
    death surfaces here as a RayError on the gather: the dead shards are
    rebuilt from the committed archive checkpoints and the whole wave's
    probe chain is resubmitted — stable probe ids make the replay exact
    (see ``_probe_submit``/``SeenSet.recover``)."""
    import ray

    futures, out_spec, dirs, resubmit = run

    def _gather(refs):
        for attempt in range(3):
            try:
                return ray.get(refs)
            except ray.exceptions.RayError:
                dead = seen.find_dead()
                if not dead or attempt == 2:
                    raise
                seen.recover(dead)
                fresh = resubmit()
                refs = (
                    [f[0] for f in fresh] if out_spec is not None else fresh
                )
                # the caller's prep refs must follow the replacement run
                futures[:] = fresh
        raise RuntimeError("unreachable")

    if out_spec is not None:
        # sink futures are (scalars_ref, prep_ref) pairs: get the scalars,
        # keep the prepped-frontier slices as refs for the next admission
        scalars = _gather([f[0] for f in futures])
        prep_refs = [f[1] for f in futures]
        seen.end_epoch()
        archive_dir, frontier_dir = dirs
        n_new = sum(s[0] for s in scalars if s is not None)
        n_next = sum(s[1] for s in scalars if s is not None)
        n_valid = sum(s[2] for s in scalars if s is not None)
        wave_counts = None
        merged: dict = {}
        for s in scalars:
            if s is not None and s[3]:
                for h, c in s[3].items():
                    merged[h] = merged.get(h, 0) + int(c)
        if merged:
            wave_counts = merged
        # a dir a reader may open must contain ≥1 parquet file
        if n_new == 0:
            pq.write_table(
                FRONTIER_SCHEMA.empty_table(), archive_dir / "part-empty.parquet"
            )
        if n_next == 0:
            pq.write_table(
                FRONTIER_SCHEMA.empty_table(), frontier_dir / "part-empty.parquet"
            )
        if out_spec[4] is None:  # prep skipped (see _finalize_bucket)
            prep = None
        else:
            prep = politeness.PreppedParts(
                prep_refs, n_next, n_valid, wave_counts
            )
        return n_new, n_next, prep
    results = _gather(futures)
    seen.end_epoch()
    parts = [t for t in results if t is not None and t.num_rows]
    if not parts:
        return _FINDINGS_SCHEMA.empty_table()
    new = pa.concat_tables(parts)
    return _canonical_findings_sort(new.cast(_FINDINGS_SCHEMA))


def run_crawl(
    corpus_path: str | list[str],
    seeds: list[str],
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    fetcher_cls: "type | None" = None,
    fetcher_kwargs: "dict | None" = None,
) -> CrawlRun:
    """``fetcher_cls``: optional fetch-stage class (stages/fetch.py
    contract) run as a map_batches actor pool over the admitted frontier
    instead of the corpus pushdown scan — the real-deployment seam
    (HttpFetcher) and its deterministic test double (DictFetcher).
    ``fetcher_kwargs`` go to the actor constructor."""
    import ray.data as rd

    cfg = cfg or CrawlConfig()
    if cfg.crawl_delay_wave_period is not None and not cfg.respect_robots:
        raise ValueError(
            "crawl_delay_wave_period needs respect_robots=True (the delays "
            "come from the cached robots.txt bodies)"
        )
    if cfg.priority == "ranked" and cfg.host_rank_path is None:
        raise ValueError("priority='ranked' needs host_rank_path")
    host_rank: "dict[str, float] | None" = None
    if cfg.host_rank_path is not None:
        rt = pq.read_table(cfg.host_rank_path, columns=["host", "rank"])
        host_rank = dict(
            zip(rt["host"].to_pylist(), rt["rank"].to_pylist())
        )
    blocked_hosts: "frozenset[str] | None" = None
    if cfg.blocked_hosts_path is not None:
        bt = pq.read_table(cfg.blocked_hosts_path, columns=["host"])
        blocked_hosts = frozenset(bt["host"].to_pylist())
    out = Path(out_dir)
    run = CrawlRun(out_dir)

    seen = SeenSet(
        cfg.num_seen_shards,
        cfg.seen_capacity_per_shard,
        cfg.seen_fpp,
        cfg.approx_seen,
        filter_kind=cfg.seen_filter,
    )
    # In-run shard-failure recovery: a dead shard rebuilds from the
    # COMMITTED waves' archive deltas (state as of the last _COMPLETE
    # wave); the in-flight wave's probes replay on top (see _probe_collect)
    seen.set_recovery_source(lambda: _archive_part_paths(run))
    counts: "Counter | politeness.CarriedCounts" = (
        politeness.CarriedCounts.empty(cfg.counts_buckets)
        if cfg.distributed_counts
        else Counter()
    )
    wave = 0

    if resume and run.wave_dirs():
        last = run.wave_dirs()[-1]
        wave = int(last.name.split("=")[1]) + 1
        snap = last / "host_counts.parquet"
        if cfg.distributed_counts and snap.is_dir():
            # per-bucket shards restore straight into the object store
            counts = politeness.CarriedCounts.restore(
                str(snap), cfg.counts_buckets
            )
        elif cfg.distributed_counts:
            # checkpoint written by the driver-Counter form: re-shard it
            counts = politeness.CarriedCounts.from_counter(
                run.host_counts(), cfg.counts_buckets
            )
        else:
            counts = run.host_counts()
        # distributed restore: route tasks read the delta parts and ship
        # per-shard key slices straight to the shard actors — the archive
        # never materializes on the driver (shared with in-run recovery)
        seen.restore_from_parts(_archive_part_paths(run))
        fpath = last / "next_frontier.parquet"
        n_rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in (fpath.glob("*.parquet") if fpath.is_dir() else [fpath])
        )
        # footer-count only: the carried frontier is read into the driver
        # only when small; big frontiers resume as a lazy reference
        if n_rows <= cfg.ray_state_threshold:
            frontier = pq.read_table(fpath)
        else:
            frontier = FrontierRef(str(fpath), n_rows)
    else:
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
        frontier = seeds_table(seeds)

    robots = RobotsCache(corpus_path) if cfg.respect_robots else None
    index = CorpusIndex(corpus_path)
    fetch_service = None
    if cfg.use_fetch_service and fetcher_cls is None:
        from ..stages.fetch import CorpusFetchService

        # Seed-shaped crawls (small initial frontier): the build starts
        # NOW, asynchronously — the corpus streams into the shard actors
        # while the small BFS warmup waves run on the pruned-scan fast
        # path, and the first fat wave finds it sealed. Restart-shaped
        # crawls (fat wave 0, e.g. resuming a production frontier) DEFER:
        # wave 0 launches the build FUSED with its own fetch — one corpus
        # read both partitions the shards and serves the wave — so the
        # index build never sits on the critical path as a pure wait.
        fetch_service = CorpusFetchService(
            list(index.files),
            n_shards=cfg.fetch_service_shards or cfg.num_seen_shards,
            defer=frontier.num_rows > cfg.scan_task_path_limit,
        )
        if cfg.fetch_service_sync_build and not fetch_service.started:
            pass  # deferred (fused) build: wave 0 fuses build+fetch anyway
        elif cfg.fetch_service_sync_build:
            fetch_service.ready()
    try:
        while frontier.num_rows and (cfg.max_waves is None or wave < cfg.max_waves):
            frontier = _run_wave(
                rd, index, frontier, counts, seen, out, wave, cfg, robots,
                fetcher_cls, fetcher_kwargs, fetch_service, host_rank,
                blocked_hosts,
            )
            wave += 1
    finally:
        try:
            # shard memory/occupancy report (design-scale evidence: the
            # seen state is the crawl's only unbounded carry) — written
            # before the actor pool dies so post-run tooling can read it
            (out / "seen_stats.json").write_text(json.dumps(seen.stats()))
            n_fetch_rec = (
                fetch_service.recoveries if fetch_service is not None else 0
            )
            if seen.recoveries or n_fetch_rec:
                (out / "recovery.json").write_text(
                    json.dumps(
                        {
                            "seen_shard_recoveries": seen.recoveries,
                            "fetch_shard_recoveries": n_fetch_rec,
                        }
                    )
                )
        except Exception:
            pass  # stats are diagnostics; never fail a finished crawl
        seen.shutdown()
        if fetch_service is not None:
            fetch_service.shutdown()
    return run


def _run_wave(
    rd,
    index: CorpusIndex,
    frontier: pa.Table,
    counts: Counter,
    seen: SeenSet,
    out: Path,
    wave: int,
    cfg: CrawlConfig,
    robots: "RobotsCache | None" = None,
    fetcher_cls: "type | None" = None,
    fetcher_kwargs: "dict | None" = None,
    fetch_service=None,
    host_rank: "dict | None" = None,
    blocked_hosts: "frozenset[str] | None" = None,
) -> pa.Table:
    # _COMPLETE is the atomic wave-commit marker (resume only trusts marked
    # dirs); writing in place avoids a rename that would invalidate lazily
    # re-executed / retried Ray read tasks still pointing at the old path
    wave_dir = out / f"wave={wave:05d}"
    if wave_dir.exists():
        shutil.rmtree(wave_dir)  # incomplete leftover from a crashed run
    wave_dir.mkdir(parents=True)
    if cfg.chaos_kill_shard is not None and cfg.chaos_kill_shard[0] == wave:
        # fault injection (tests): this wave's probes hit a dead shard and
        # must recover in-run with bit-identical output
        import ray as _ray_chaos

        _ray_chaos.kill(
            seen.shards[cfg.chaos_kill_shard[1] % seen.num_shards],
            no_restart=True,
        )
    if (
        cfg.chaos_kill_fetch_shard is not None
        and cfg.chaos_kill_fetch_shard[0] == wave
        and fetch_service is not None
    ):
        import ray as _ray_chaos2

        _ray_chaos2.kill(
            fetch_service.shards[
                cfg.chaos_kill_fetch_shard[1] % fetch_service.n_shards
            ],
            no_restart=True,
        )
    wave_metrics: Counter = Counter()
    import time as _time

    phase_sec: dict[str, float] = {}
    _t = _time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal _t
        now = _time.perf_counter()
        phase_sec[name] = round(now - _t, 3)
        _t = now

    # With robots or the rate cap on, the next wave starts at a driver
    # frontier-table gate and re-reads the frontier from disk — the fused
    # politeness prep would be computed in the sink tasks and then thrown
    # away, so skip it there.
    frontier_table_gates = (
        robots is not None
        or blocked_hosts is not None
        or cfg.max_per_host_wave is not None
        or cfg.priority == "ranked"
    )
    prep_host_limit = None if frontier_table_gates else cfg.host_limit

    # ---- robots gate (extension) then politeness gate (ST2) ---------------
    if isinstance(frontier, FrontierRef) and (
        frontier_table_gates or frontier.num_rows <= cfg.ray_state_threshold
    ):
        # robots filtering is a driver-table extension; small frontiers
        # are cheaper on the driver fast-path anyway
        frontier = pq.read_table(frontier.path)
    deferred = None  # rate-cap overflow, re-enters the next wave's frontier
    if isinstance(frontier, FrontierRef):
        # big frontier: it never enters driver memory (cap mode never
        # reaches here — frontier_table_gates forces the table read above).
        # Preferred input is
        # the PREVIOUS wave's fused prep (politeness.PreppedParts riding on
        # the FrontierRef — host attach + top-(limit+1) prune already ran
        # inside the probe's sink tasks during wave K's tail); otherwise
        # one plain read task per checkpoint part feeds the distributed
        # prep (resume, or a driver-probed wave)
        if frontier.prep is not None:
            src = frontier.prep
        else:
            read = _read_frontier_task()
            fpath = Path(frontier.path)
            part_files = (
                sorted(fpath.glob("*.parquet")) if fpath.is_dir() else [fpath]
            )
            src = [read.remote(str(f)) for f in part_files]
        if isinstance(counts, politeness.CarriedCounts):
            admitted, m, snap_barriers = politeness.admit_carried(
                src,
                counts,
                cfg.host_limit,
                cfg.priority,
                snapshot_dir=str(wave_dir / "host_counts.parquet"),
            )
        else:
            admitted, m = politeness.admit_ray(
                src,
                counts,
                cfg.host_limit,
                cfg.priority,
            )
    else:
        frontier = politeness.with_host(frontier)
        if blocked_hosts is not None:
            frontier, n_blocked = politeness.filter_blocked_hosts(
                frontier, blocked_hosts
            )
            if n_blocked:
                wave_metrics["dropped_blocked_host"] = n_blocked
        if robots is not None:
            frontier, n_robots = robots.filter_frontier(frontier)
            if n_robots:
                wave_metrics["dropped_robots"] = n_robots
        if cfg.priority == "ranked":
            # broadcast-rank lookup column for the priority sort (the rank
            # table is host-cardinality; at 10^8 hosts it ships via the
            # same bucketed exchange as the carried counts)
            frontier = politeness.attach_rank_column(frontier, host_rank or {})
        host_caps = None
        if cfg.crawl_delay_wave_period is not None and robots is not None:
            # hosts are already cached by the robots gate above
            host_caps = robots.wave_caps(
                cfg.crawl_delay_wave_period, cfg.max_per_host_wave
            )
        if cfg.max_per_host_wave is not None or host_caps:
            frontier, deferred = politeness.split_wave_cap(
                frontier,
                cfg.max_per_host_wave,
                cfg.priority,
                host_caps=host_caps,
            )
            if deferred.num_rows:
                wave_metrics["deferred_rate"] = deferred.num_rows
        if isinstance(counts, politeness.CarriedCounts):
            # distributed carry admits via the bucket exchange at EVERY
            # size (the counts shards live in the object store; there is
            # no driver Counter for admit_local to read)
            admitted, m, snap_barriers = politeness.admit_carried(
                frontier,
                counts,
                cfg.host_limit,
                cfg.priority,
                snapshot_dir=str(wave_dir / "host_counts.parquet"),
            )
        elif frontier.num_rows <= cfg.ray_state_threshold:
            admitted, m = politeness.admit_local(
                frontier, counts, cfg.host_limit, cfg.priority
            )
        else:
            admitted, m = politeness.admit_ray(
                frontier, counts, cfg.host_limit, cfg.priority
            )
    wave_metrics.update(m)
    _mark("politeness")

    order = admitted.append_column(
        "wave", pa.array(np.full(admitted.num_rows, wave, dtype=np.int32))
    ).append_column(
        "rank", pa.array(np.arange(admitted.num_rows, dtype=np.int32))
    )
    pq.write_table(order, wave_dir / "admitted.parquet")

    # ---- fetch (corpus pushdown scan) + parse + image projection ----------
    # the lookup side is built VECTORIZED (Arrow kernels, no per-row driver
    # parse) and broadcast as an Arrow table — zero-copy plasma reads in
    # every scan task, not a pickled Python dict
    lookup_tbl, m = build_lookup_table(admitted)
    wave_metrics.update(m)
    parsed_dir = wave_dir / "parsed"
    n_files_pruned = 0
    parsed_mat = None
    svc_finding_refs = None
    probe_run = None  # early-submitted probe dataflow (fat service waves)
    n_pages_dispatched = pc.sum(
        pc.cast(pc.equal(lookup_tbl["kind"], "page"), pa.int64())
    ).as_py() or 0
    n_images_dispatched = lookup_tbl.num_rows - n_pages_dispatched
    if (
        fetch_service is not None
        and not fetch_service.started
        and admitted.num_rows <= cfg.scan_task_path_limit
    ):
        # deferred build + small wave: begin the plain async build now so a
        # later fat wave finds it sealed; THIS wave takes the scan fast-path
        fetch_service.start()
    if (
        lookup_tbl.num_rows
        and fetch_service is not None
        and not fetch_service.started
        and admitted.num_rows > cfg.scan_task_path_limit
    ):
        # FUSED build+fetch (restart-shaped wave 0): one corpus read both
        # hash-partitions the shards AND emits this wave's fetched rows —
        # per corpus file, one hits table (object ref) consumed by the same
        # fetch_parse_write slice tasks the service path uses. The wave's
        # critical path is read→parse→write with no svc-build wait; the
        # seal completes concurrently and wave 1 finds the service ready.
        import ray

        sorted_lk = lookup_tbl.sort_by(
            [
                ("url", "ascending"),
                ("kind", "ascending"),
                ("depth", "ascending"),
            ]
        )
        hit_refs = fetch_service.start_fused(ray.put(sorted_lk))
        _mark("svc_fused_launch")
        task = _fetch_parse_write_task()
        count_refs = []
        svc_finding_refs = []
        chunk = max(1, cfg.batch_size * 8)
        part_id = 0
        for fi, href in enumerate(hit_refs):
            # slice bound: a file can hit at most min(its rows, the wave's
            # lookups); trailing slices past the actual hit count are empty
            upper = min(index.num_rows[fi], sorted_lk.num_rows)
            for off0 in range(0, upper, chunk):
                cref, fref = task.remote(
                    href,
                    str(parsed_dir),
                    part_id,
                    cfg.faithful_depth,
                    cfg.checkpoint_compression,
                    cfg.batch_size,
                    off0,
                    chunk,
                    cfg.curate,
                )
                count_refs.append(cref)
                svc_finding_refs.append(fref)
                part_id += 1
        if admitted.num_rows > cfg.scan_task_path_limit:
            # overlap the probe with the parse tail: the chain's inputs
            # are the parse tasks' findings refs, so each probe stage
            # starts the moment its inputs land — nothing waits for the
            # checkpoint barrier below
            probe_run = _probe_submit(
                rd, parsed_dir, seen, wave, None,
                sink=(wave_dir, cfg.depth_limit, cfg.checkpoint_compression,
                      prep_host_limit, cfg.priority),
                finding_refs=svc_finding_refs,
            )
        _mark("svc_fused_dispatch")
        ray.get(count_refs)  # checkpoint-written barrier (counts read next)
    elif lookup_tbl.num_rows and fetch_service is not None and (
        fetch_service.is_ready()
        or admitted.num_rows > cfg.scan_task_path_limit
    ):
        # Sharded fetch-service path: bytes/wave ∝ dispatches. The lookup
        # table is hash-routed to the shard actors (same url hash the build
        # used); each shard's hits feed one fetch_parse_write task that
        # parses and writes its checkpoint slice directly — per wave the
        # driver ships one lookup slice per shard and gets back one integer
        # per shard. Warmup waves fall through to the pruned-scan fast path
        # until the async service build seals.
        import ray

        fetch_service.ready()
        _mark("svc_build_wait")
        task = _fetch_parse_write_task()
        count_refs = []
        svc_finding_refs = []
        # parse-task granularity is decoupled from the shard count: a fat
        # shard's fetched table (one plasma object) fans out into slice
        # tasks of ~8 parse batches each, so stragglers are bounded by the
        # chunk, not by the biggest shard
        chunk = max(1, cfg.batch_size * 8)
        part_id = 0
        dispatch_log = []  # (count_idx, shard, part, off0, part_id) — the
        # replay script for fetch-shard recovery below
        for b, part in enumerate(fetch_service.route(lookup_tbl)):
            if part is None or part.num_rows == 0:
                continue
            fetched_ref = fetch_service.shards[b].fetch.remote(part)
            # bounds from the routed lookup count (an upper bound on the
            # fetched rows — misses emit no row; trailing slices that fall
            # past the fetched end are empty and write nothing)
            for off0 in range(0, part.num_rows, chunk):
                cref, fref = task.remote(
                    fetched_ref,
                    str(parsed_dir),
                    part_id,
                    cfg.faithful_depth,
                    cfg.checkpoint_compression,
                    cfg.batch_size,
                    off0,
                    chunk,
                    cfg.curate,
                )
                dispatch_log.append((len(count_refs), b, part, off0, part_id))
                count_refs.append(cref)
                svc_finding_refs.append(fref)
                part_id += 1

        def _submit_probe():
            return _probe_submit(
                rd, parsed_dir, seen, wave, None,
                sink=(wave_dir, cfg.depth_limit, cfg.checkpoint_compression,
                      prep_host_limit, cfg.priority),
                finding_refs=svc_finding_refs,
            )

        if admitted.num_rows > cfg.scan_task_path_limit:
            # overlap the probe with the parse tail (see the fused branch)
            probe_run = _submit_probe()
        _mark("svc_route_dispatch")
        for attempt in range(3):
            try:
                # checkpoint-written barrier (counts read next)
                ray.get(count_refs)
                break
            except ray.exceptions.RayError:
                # fetch-shard death: rebuild the dead shards' partitions
                # from the corpus files (deterministic), re-issue only the
                # affected fetch+parse slices (identical checkpoint parts,
                # same filenames), and resubmit the probe chain over the
                # repaired finding refs — stable probe ids mean surviving
                # seen shards answer the replay from their epoch memos
                dead = fetch_service.find_dead()
                if not dead or attempt == 2:
                    raise
                fetch_service.recover(dead)
                refetched: dict = {}
                for idx, b, part, off0, pid in dispatch_log:
                    if b not in set(dead):
                        continue
                    if b not in refetched or refetched[b][0] is not part:
                        refetched[b] = (
                            part,
                            fetch_service.shards[b].fetch.remote(part),
                        )
                    cref, fref = task.remote(
                        refetched[b][1],
                        str(parsed_dir),
                        pid,
                        cfg.faithful_depth,
                        cfg.checkpoint_compression,
                        cfg.batch_size,
                        off0,
                        chunk,
                        cfg.curate,
                    )
                    count_refs[idx] = cref
                    svc_finding_refs[idx] = fref
                if probe_run is not None:
                    probe_run = _submit_probe()
    elif lookup_tbl.num_rows and fetcher_cls is not None:
        # pluggable fetch path (stages/fetch.py): actor-pool fetch over the
        # admitted dispatches; downstream parse identical to the scan path
        from ..stages.fetch import FETCH_IN_SCHEMA

        fetch_tbl = lookup_tbl.sort_by(
            [(c, "ascending") for c in ("fetch_url", "url", "kind", "depth")]
        ).cast(FETCH_IN_SCHEMA)
        n_blocks = max(1, min(32, fetch_tbl.num_rows // max(1, cfg.batch_size)))
        parsed = (
            rd.from_arrow(fetch_tbl)
            .repartition(n_blocks)
            .map_batches(
                fetcher_cls,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                # IO-bound stage: fractional CPU per actor so the pool
                # never starves the downstream parse tasks of cores
                concurrency=4,
                num_cpus=0.25,
                fn_constructor_kwargs=fetcher_kwargs or {},
            )
            .map_batches(
                process_wave_batch,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                fn_kwargs={"faithful_depth": cfg.faithful_depth},
            )
        )
        if cfg.curate:
            from ..stages.curate import curate_table

            parsed = parsed.map_batches(
                curate_table, batch_format="pyarrow", batch_size=cfg.batch_size
            )
        if cfg.materialize_wave:
            parsed_mat = parsed.materialize()
            parsed_mat.write_parquet(
                str(parsed_dir),
                partition_cols=["rec"],
                compression=cfg.checkpoint_compression,
            )
        else:
            parsed.write_parquet(
                str(parsed_dir),
                partition_cols=["rec"],
                compression=cfg.checkpoint_compression,
            )
    elif lookup_tbl.num_rows and admitted.num_rows <= cfg.scan_task_path_limit:
        # Small-wave task fast-path: one Ray task per PRUNED corpus file
        # runs probe+parse; the driver writes the hive checkpoint in one
        # pq.write_table per record type. A Ray Data pipeline pays two
        # streaming-executor launches per wave (materialize + write),
        # ~0.5-0.8 s of fixed cost that dwarfs a small wave's actual work
        # — the BFS warmup waves of every crawl are exactly this shape.
        # Fat waves (> scan_task_path_limit dispatches) take the streaming
        # Dataset path below, where the executor cost amortizes and the
        # parallel write wins.
        import ray

        sorted_urls = sorted(set(lookup_tbl["fetch_url"].to_pylist()))
        files = index.files_for(sorted_urls)
        n_files_pruned = len(index.files) - len(files)
        if files:
            task = _scan_parse_file_task()
            lookups_ref = ray.put(lookup_tbl)
            parts = ray.get(
                [
                    task.remote(f, lookups_ref, cfg.faithful_depth, cfg.curate)
                    for f in files
                ]
            )
            parts = [t for t in parts if t is not None and t.num_rows]
            if parts:
                parsed_tbl = pa.concat_tables(parts).combine_chunks()
                for rec in ("f", "t", "i", "m"):
                    sub = parsed_tbl.filter(pc.equal(parsed_tbl["rec"], rec))
                    if sub.num_rows:
                        sub = sub.drop_columns(["rec"])
                        if cfg.curate and rec != "t":
                            # curation columns belong to text rows only —
                            # keep the findings/image/metric slices lean
                            from ..stages.curate import CURATE_FIELDS

                            sub = sub.drop_columns(
                                [f for f, _ in CURATE_FIELDS]
                            )
                        d = parsed_dir / f"rec={rec}"
                        d.mkdir(parents=True, exist_ok=True)
                        pq.write_table(
                            sub,
                            d / "part-00000.parquet",
                            compression=cfg.checkpoint_compression,
                        )
    elif lookup_tbl.num_rows:
        import ray

        lookups_ref = ray.put(lookup_tbl)

        def attach(batch: pa.Table) -> pa.Table:
            return attach_frontier_join(batch, _cached_get(lookups_ref))

        # Two-level probe-side pruning. FILE level: parquet footer url
        # ranges (CorpusIndex) — a wave only reads files that can contain
        # an admitted url, which is what keeps early/narrow waves from
        # rescanning the whole corpus. ROW-GROUP level (small waves only):
        # an ``isin`` pushdown prunes inside the surviving files and keeps
        # non-matched html out of the object store; for LARGE waves the
        # expression itself (10^5 strings serialized into every read task,
        # hash-set rebuilt per row group) costs more than it prunes, so
        # the broadcast lookup table inside attach_frontier_join filters
        # instead.
        sorted_urls = sorted(set(lookup_tbl["fetch_url"].to_pylist()))
        files = index.files_for(sorted_urls)
        n_files_pruned = len(index.files) - len(files)
        if files:  # else: no file can hold an admitted url — all misses
            if len(sorted_urls) <= cfg.scan_pushdown_limit:
                ds = rd.read_parquet(
                    files,
                    columns=["url", "html"],
                    filter=pc.field("url").isin(sorted_urls),
                )
            else:
                ds = rd.read_parquet(files, columns=["url", "html"])
            parsed = ds.map_batches(
                # batch_size=None lets Ray FUSE the probe into the read
                # task itself: non-matched corpus rows are dropped before
                # any block enters the object store
                attach, batch_format="pyarrow", batch_size=None
            ).map_batches(
                process_wave_batch,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                fn_kwargs={"faithful_depth": cfg.faithful_depth},
            )
            if cfg.curate:
                from ..stages.curate import curate_table

                parsed = parsed.map_batches(
                    curate_table,
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
            # One subdir per record type (rec=f/t/i/m): read-backs and
            # downstream consumers (findings probe, texts, image sink)
            # each touch only their partition, never the heavy columns
            # of another type. Default = ONE streaming execution straight
            # into the checkpoint (text/image blocks never pinned in the
            # object store); the probe then reads back only the rec=f
            # partition — findings are link tuples, orders of magnitude
            # lighter than the page payloads. materialize_wave=True keeps
            # the round-2 plasma-fused form for comparison.
            if cfg.materialize_wave:
                parsed_mat = parsed.materialize()
                parsed_mat.write_parquet(
                    str(parsed_dir),
                    partition_cols=["rec"],
                    compression=cfg.checkpoint_compression,
                )
            else:
                parsed.write_parquet(
                    str(parsed_dir),
                    partition_cols=["rec"],
                    compression=cfg.checkpoint_compression,
                )
    _mark("scan_parse_write")
    have_parsed = parsed_dir.exists() and any(parsed_dir.rglob("*.parquet"))

    # ---- read back findings (pruned) + seen probe (ST1) -------------------
    # Two probe paths sharing the shard actor pool: small waves read the
    # findings into a driver table and probe coordinator-side (no retry
    # hazard, minimal latency); waves above ray_state_threshold stay a
    # Dataset — bucketed key-dedup exchange, then the idempotent streaming
    # probe (_probe_new_streaming), so the raw finding stream never lands
    # on the driver.
    if have_parsed:
        # rec-type counts come from parquet FOOTER metadata of the hive
        # partitions (no data pages read); only the metric rows and — for
        # small waves — the findings columns are actually read
        counts_by_rec = _rec_counts(parsed_dir)
        n_findings = counts_by_rec.get("f", 0)
        n_texts = counts_by_rec.get("t", 0)
        n_img_ok = counts_by_rec.get("i", 0)
        mdir = parsed_dir / "rec=m"
        if mdir.exists():
            mrows = pq.read_table(mdir, columns=["metric", "count"])
            for name, c in zip(
                mrows["metric"].to_pylist(), mrows["count"].to_pylist()
            ):
                wave_metrics[name] += c
        fdir = parsed_dir / "rec=f"
        if probe_run is not None:
            # the probe was submitted with the parse tasks and is already
            # draining — never re-read findings on the driver
            findings = None
        elif n_findings == 0 or not fdir.exists():
            findings = _FINDINGS_SCHEMA.empty_table()
        elif n_findings <= cfg.ray_state_threshold:
            findings = pq.read_table(
                fdir,
                columns=["src_url", "src_depth", "url", "kind", "depth"],
            )
        else:
            findings = None
    else:
        # an early-submitted probe must still be collected (its shard
        # probes and sink dirs exist) even when nothing was parsed
        findings = None if probe_run is not None else _FINDINGS_SCHEMA.empty_table()
        n_findings = 0
        n_texts = 0
        n_img_ok = 0
    # fetch misses = dispatched-and-fetchable minus rows that came back
    wave_metrics["fetch_miss_page"] += n_pages_dispatched - n_texts
    img_attempts = (
        n_img_ok
        + wave_metrics.get("image_sink_error", 0)
        + wave_metrics.get("image_no_segments", 0)
    )
    wave_metrics["fetch_miss_image"] += n_images_dispatched - img_attempts

    if findings is not None:
        new = _probe_new(findings, seen, cfg.faithful_depth, epoch=wave)
        _mark("seen_probe")
        pq.write_table(
            new.select(["url", "kind", "depth"]).cast(FRONTIER_SCHEMA),
            wave_dir / "archive_delta.parquet",
        )
        # depth gate (on the discovering response's depth, main.rs:132-134)
        gated = new.filter(pc.less(new["src_depth"], cfg.depth_limit))
        next_frontier = (
            gated.select(["url", "kind", "depth"]).cast(FRONTIER_SCHEMA)
        )
        if deferred is not None and deferred.num_rows:
            # rate-cap overflow: already probed (seen) in an earlier wave,
            # so it re-enters the frontier directly, bypassing the probe
            next_frontier = pa.concat_tables(
                [
                    next_frontier,
                    deferred.select(["url", "kind", "depth"]).cast(
                        FRONTIER_SCHEMA
                    ),
                ]
            )
        pq.write_table(next_frontier, wave_dir / "next_frontier.parquet")
        n_new, n_next = new.num_rows, next_frontier.num_rows
    else:
        # streaming probe in SINK mode: the reduce tasks write this wave's
        # archive delta and depth-gated next frontier directly (one part
        # per bucket); the driver receives two integers, nothing else.
        # Fat service waves submitted the chain alongside their parse
        # tasks (probe_run) — only the residual wait shows up here.
        if probe_run is not None:
            n_new, n_next, next_prep = _probe_collect(probe_run, seen)
        else:
            n_new, n_next, next_prep = _probe_new_streaming(
                rd, parsed_dir, seen, wave, parsed_mat,
                sink=(wave_dir, cfg.depth_limit, cfg.checkpoint_compression,
                      prep_host_limit, cfg.priority),
                finding_refs=svc_finding_refs,
            )
        _mark("seen_probe")
        if deferred is not None and deferred.num_rows:
            # rate-cap overflow joins the sink-written frontier parts as
            # one extra part (already probed; bypasses the next probe).
            # next_prep is None in cap mode (frontier_table_gates), so the
            # next admission re-reads all parts from disk and sees it.
            fdir = wave_dir / "next_frontier.parquet"
            fdir.mkdir(parents=True, exist_ok=True)
            pq.write_table(
                deferred.select(["url", "kind", "depth"]).cast(
                    FRONTIER_SCHEMA
                ),
                fdir / "part-deferred.parquet",
            )
            n_next += deferred.num_rows
        next_frontier = FrontierRef(
            str(wave_dir / "next_frontier.parquet"), n_next, prep=next_prep
        )

    # ---- carried state snapshots + lineage --------------------------------
    if isinstance(counts, politeness.CarriedCounts):
        # per-bucket snapshots were written from inside the admission gate
        # tasks (touched buckets: implied done by the admitted gather) /
        # tiny copy tasks (untouched buckets: barrier here) — the driver
        # never serializes a host-keyed table
        import ray as _ray_mod

        _ray_mod.get(snap_barriers)
    else:
        pq.write_table(
            pa.table(
                {
                    "host": pa.array(sorted(counts.keys()), pa.string()),
                    "dispatches": pa.array(
                        [counts[h] for h in sorted(counts)], pa.int64()
                    ),
                }
            ),
            wave_dir / "host_counts.parquet",
        )
    nonzero = sorted(k for k, v in wave_metrics.items() if v)
    pq.write_table(
        pa.table(
            {
                "metric": pa.array(nonzero, pa.string()),
                "count": pa.array([int(wave_metrics[k]) for k in nonzero], pa.int64()),
            }
        ),
        wave_dir / "metrics.parquet",
    )
    stats = WaveStats(
        wave=wave,
        frontier_rows=frontier.num_rows,
        admitted=admitted.num_rows,
        findings=n_findings,
        new_findings=n_new,
        next_frontier=n_next,
        metrics=dict(wave_metrics),
    )
    _mark("state_writes")
    (wave_dir / "lineage.json").write_text(
        json.dumps(
            {
                **asdict(stats),
                "phase_sec": phase_sec,
                "scan_files_pruned": n_files_pruned,
                "scan_files_total": len(index.files),
                "config": cfg.fingerprint(),
                "dir": str(wave_dir),
            },
            indent=1,
        )
    )
    (wave_dir / "_COMPLETE").touch()  # atomic wave commit
    return next_frontier


def main() -> None:
    import argparse

    import ray

    ap = argparse.ArgumentParser(description="Ray-Data crawl over a parquet corpus")
    ap.add_argument("--corpus", required=False, default=None)
    ap.add_argument("--seeds", nargs="+", required=False, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--compact-archive",
        action="store_true",
        help="maintenance mode: fold the run's committed archive-delta "
        "parts into a bounded compact set (restore/recovery replay "
        "fan-in; outputs stay bit-identical) and exit — no crawl runs",
    )
    ap.add_argument("-r", "--recursion-depth-limit", type=int, default=4)
    ap.add_argument("--host-limit", type=int, default=256)
    ap.add_argument("--increment-depth", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--fetch-service",
        action="store_true",
        help="fetch via the sharded in-memory corpus service (one-pass "
        "corpus load, per-wave bytes proportional to dispatches) instead "
        "of per-wave corpus scans",
    )
    ap.add_argument(
        "--distributed-counts",
        action="store_true",
        help="carry host-visit counts as per-bucket object-store shards "
        "(the 10^8-host form) instead of a driver Counter",
    )
    ap.add_argument(
        "--curate",
        action="store_true",
        help="inline text curation: language ID, token counts and quality "
        "features computed in the parse task and written as extra rec=t "
        "checkpoint columns",
    )
    ap.add_argument(
        "--priority",
        choices=["canonical", "shallow_first", "hot_host_first", "ranked"],
        default="canonical",
        help="frontier priority order within each wave",
    )
    ap.add_argument(
        "--host-rank-path",
        default=None,
        help="parquet (host, rank) table for --priority ranked: external "
        "host importance (e.g. a previous epoch's PageRank); high-rank "
        "hosts drain their budget first",
    )
    ap.add_argument(
        "--max-per-host-wave",
        type=int,
        default=None,
        help="per-host per-wave dispatch cap (token politeness): overflow "
        "defers to the next wave's frontier instead of dropping; a host "
        "crawl-delay d with wave period T maps to cap = T/d",
    )
    ap.add_argument(
        "--respect-robots",
        action="store_true",
        help="honor robots.txt Disallow rules (User-agent: * subset), "
        "cached per host from the corpus' own robots.txt pages",
    )
    ap.add_argument(
        "--crawl-delay-wave-period",
        type=float,
        default=None,
        help="honor robots Crawl-delay directives as per-host wave caps "
        "(floor(period/delay), min 1); requires --respect-robots",
    )
    ap.add_argument(
        "--blocked-hosts",
        default=None,
        help="parquet with a 'host' column (e.g. trap_host_stats rows "
        "where trap): findings from these hosts are dropped uncounted "
        "at the frontier gate",
    )
    ap.add_argument(
        "--address",
        default="local",
        help='Ray address: "local" (default) starts an in-process session; '
        '"auto" attaches to a running cluster — the mode `ray job submit` '
        "entrypoints use (the job server exports RAY_ADDRESS and this "
        "script attaches instead of starting its own head)",
    )
    args = ap.parse_args()
    if not args.compact_archive and (args.corpus is None or args.seeds is None):
        ap.error("--corpus and --seeds are required unless --compact-archive")

    if not ray.is_initialized():
        init_kwargs = dict(ignore_reinit_error=True, logging_level="ERROR")
        if args.address == "local":
            # own session: resource + dashboard knobs are ours to set
            init_kwargs.update(
                num_cpus=args.num_cpus, include_dashboard=False
            )
        ray.init(address=args.address, **init_kwargs)
    try:
        # under `python -m crawler_ray.pipelines.crawl` this file IS
        # __main__; re-import through the package so worker-shipped
        # closures reference importable module globals, not __main__
        from crawler_ray.pipelines.crawl import CrawlConfig as _Cfg
        from crawler_ray.pipelines.crawl import compact_archive as _compact
        from crawler_ray.pipelines.crawl import run_crawl as _run_crawl

        if args.compact_archive:
            print(json.dumps(_compact(args.out)))
            return

        cfg = _Cfg(
            depth_limit=args.recursion_depth_limit,
            host_limit=args.host_limit,
            faithful_depth=not args.increment_depth,
            use_fetch_service=args.fetch_service,
            distributed_counts=args.distributed_counts,
            curate=args.curate,
            priority=args.priority,
            max_per_host_wave=args.max_per_host_wave,
            respect_robots=args.respect_robots,
            crawl_delay_wave_period=args.crawl_delay_wave_period,
            host_rank_path=args.host_rank_path,
            blocked_hosts_path=args.blocked_hosts,
        )
        run = _run_crawl(args.corpus, args.seeds, args.out, cfg, resume=args.resume)
        print(
            json.dumps(
                {
                    "waves": run.n_waves(),
                    "dispatched": run.order().num_rows,
                    "archive": run.archive().num_rows,
                    "texts": len(run.texts()),
                    "image_files": len(run.image_files()),
                    "metrics": dict(run.metrics()),
                }
            )
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
