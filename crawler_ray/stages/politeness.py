"""Per-host politeness budget (ST2): the distributed form of the reference's
dispatch-time host counter (/root/reference/src/main.rs:100-107).

Semantics (tested one-for-one):
- key = hostname without port (url::Host, main.rs:100);
- host-less findings are skipped WITHOUT counting (main.rs:100-102);
- skip when the host's running count is ``> limit``, then increment — the
  check-before-increment means up to ``limit+1`` (257) dispatches per host
  succeed over the whole crawl (main.rs:24, 103-107);
- admission order within a wave is the canonical order (kind, url, depth) —
  the determinized replacement for the reference's HashSet/completion
  ordering (SURVEY.md §3).

Two interchangeable implementations (equivalence-tested):
- ``admit_local``: vectorized pyarrow/pandas on the driver — used while the
  wave frontier is below ``ray_threshold`` rows;
- ``admit_ray``: an explicit Ray-task bucketed exchange (hash(host) → ~32
  reduce tasks) with the carried counts broadcast via ``ray.put`` and a
  per-host top-(limit+1) pre-prune bounding hot-host shuffle volume.
  Because the budget is per-host and the priority order is a sort key,
  per-host admission is independent and deterministic; no cross-host
  coordination is needed.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

FRONTIER_SCHEMA = pa.schema(
    [("url", pa.string()), ("kind", pa.string()), ("depth", pa.int32())]
)


def with_host(frontier: pa.Table) -> pa.Table:
    """Attach the politeness key, vectorized — this runs over the unbounded
    pre-admission frontier every wave, so a per-row ``un.parse`` would be a
    driver choke. Frontier URLs are canonical serializations (parse_links
    and seeds both round-trip through urlnorm), where the host is exactly
    the text between ``://`` and the next ``/ : ? #`` (brackets kept for
    ipv6, empty meaning no host) — one RE2 kernel reproduces what re-parsing
    yields (differential-tested against un.parse in test_urlnorm.py)."""
    urls = frontier["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(urls, pattern=r"^[^:]*://(?P<host>\[[^\]]*\]|[^/:?#]*)")
    host = pc.struct_field(m, "host")
    host = pc.if_else(pc.equal(host, ""), pa.scalar(None, pa.string()), host)
    return frontier.append_column("host", host.cast(pa.string()))


def filter_blocked_hosts(
    frontier: pa.Table, blocked: "set[str] | frozenset[str]"
) -> "tuple[pa.Table, int]":
    """Host-blocklist frontier gate (extension) — the consumer of
    ``urlfilter.trap_host_stats``'s trap flags and any operator-supplied
    domain blocklist: findings whose host is in the blocklist are dropped
    UNCOUNTED (like the robots gate — they never compete for the budget),
    before the hostless drop and priority sort. One vectorized ``is_in``
    over the already-attached ``host`` column; hostless (null-host) rows
    pass through so the politeness gate can count them as
    ``dropped_hostless`` exactly as without a blocklist. Returns
    ``(kept_frontier, n_dropped)``."""
    if not blocked or frontier.num_rows == 0:
        return frontier, 0
    hit = pc.fill_null(
        pc.is_in(
            frontier["host"],
            value_set=pa.array(sorted(blocked), pa.string()),
        ),
        False,
    )
    n = int(pc.sum(pc.cast(hit, pa.int64())).as_py() or 0)
    if n == 0:
        return frontier, 0
    return frontier.filter(pc.invert(hit)), n


#: priority modes → (pandas sort columns, ascending flags). The priority
#: frontier (north_rule) is realized as the wave's admission ORDER: which
#: findings win the per-host budget and in what rank they dispatch.
#: "canonical" is the determinized reference order; "shallow_first" drains
#: low depths first (real frontier-priority behavior); "hot_host_first"
#: ranks hosts by their pending-finding count this wave (computed by a
#: per-wave groupby(host) aggregate — the groupby-aggregate-sort shuffle
#: shape at scale) so dense hosts drain their budget early.
PRIORITY_MODES = {
    "canonical": (["kind", "url", "depth"], [True, True, True]),
    "shallow_first": (["depth", "kind", "url"], [True, True, True]),
    "hot_host_first": (
        ["host_wave_rows", "host", "kind", "url", "depth"],
        [False, True, True, True, True],
    ),
    # external host importance (e.g. PageRank of a previous crawl epoch):
    # high-rank hosts drain their budget first. The rank column is attached
    # from a broadcast host->rank table before admission
    # (attach_rank_column); unknown hosts rank 0.0.
    "ranked": (
        ["host_rank", "host", "kind", "url", "depth"],
        [False, True, True, True, True],
    ),
}


def attach_rank_column(tbl: pa.Table, rank_map: dict) -> pa.Table:
    """host → external-importance lookup for the "ranked" priority mode
    (dictionary-encode + take: Python touches only UNIQUE hosts). Hosts
    absent from the map — and hostless rows — rank 0.0, sorting after any
    positively-ranked host."""
    if "host_rank" in tbl.column_names:
        return tbl
    col = tbl["host"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    de = pc.dictionary_encode(col)
    vals = pa.array(
        [float(rank_map.get(h, 0.0)) for h in de.dictionary.to_pylist()],
        pa.float64(),
    )
    ranks = pc.fill_null(vals.take(de.indices), 0.0)
    return tbl.append_column("host_rank", ranks)


def attach_priority_columns(tbl: pa.Table, priority: str) -> pa.Table:
    """Attach any computed columns a priority mode sorts on (per-wave
    aggregates). For hot_host_first this is the wave's per-host row count;
    for "ranked" the rank column must have been attached by the caller
    (it needs the broadcast rank table, see attach_rank_column)."""
    if priority == "ranked" and "host_rank" not in tbl.column_names:
        raise ValueError(
            "ranked priority needs host_rank attached (attach_rank_column)"
        )
    if priority == "hot_host_first" and "host_wave_rows" not in tbl.column_names:
        # vectorized: dictionary-encode the host column once, count codes
        # with one bincount, gather counts back by code — no Python loop
        # over hosts on the wave-prep path
        h = tbl["host"]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        enc = h.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)  # float64 w/ NaN nulls
        valid = ~np.isnan(idx)
        codes = idx[valid].astype(np.int64)
        counts = np.bincount(codes, minlength=len(enc.dictionary))
        rows = np.zeros(len(idx), dtype=np.int64)
        rows[valid] = counts[codes]
        tbl = tbl.append_column("host_wave_rows", pa.array(rows, pa.int64()))
    return tbl


def priority_sort(tbl: pa.Table, priority: str = "canonical") -> pa.Table:
    cols, asc = PRIORITY_MODES[priority]
    tbl = attach_priority_columns(tbl, priority)
    return tbl.sort_by(
        [(c, "ascending" if a else "descending") for c, a in zip(cols, asc)]
    )


def canonical_sort(tbl: pa.Table) -> pa.Table:
    return priority_sort(tbl, "canonical")


def _admit_group(
    df: pd.DataFrame, prior: int, limit: int, priority: str = "canonical"
) -> pd.DataFrame:
    """Within one host group, priority order: admit while prior+rank <= limit."""
    pairs = [(c, a) for c, a in zip(*PRIORITY_MODES[priority]) if c in df.columns]
    df = df.sort_values(
        [c for c, _ in pairs], ascending=[a for _, a in pairs], kind="mergesort"
    )
    n_admit = max(0, min(len(df), limit + 1 - prior))
    return df.iloc[:n_admit]


def admit_local(
    frontier: pa.Table, counts: Counter, limit: int = 256, priority: str = "canonical"
) -> tuple[pa.Table, Counter]:
    """Driver-side vectorized admission. Returns (admitted table in priority
    order, metrics). Mutates ``counts`` with the admitted increments and
    records drops in the returned metrics Counter."""
    metrics: Counter = Counter()
    if frontier.num_rows == 0:
        return frontier, metrics
    if "host" not in frontier.column_names:
        frontier = with_host(frontier)
    hostless = pc.is_null(frontier["host"])
    n_hostless = pc.sum(pc.cast(hostless, pa.int64())).as_py() or 0
    if n_hostless:
        metrics["dropped_hostless"] = n_hostless
        frontier = frontier.filter(pc.invert(hostless))
    frontier = priority_sort(frontier, priority)

    # vectorized 257-semantics admission: a row at in-order rank r within
    # its host (0-based, in wave priority order) is admitted iff
    # prior + r <= limit — identical to the reference's check-then-count
    # loop (counts[h] > limit skip, else admit and increment)
    import pandas as pd

    hosts_pd = pd.Series(frontier["host"].to_pandas())
    prior = hosts_pd.map(dict(counts)).fillna(0).to_numpy(dtype=np.int64)
    rank = hosts_pd.groupby(hosts_pd, sort=False).cumcount().to_numpy()
    keep = (prior + rank) <= limit
    for h, c in hosts_pd[keep].value_counts().items():
        counts[h] += int(c)
    metrics["dropped_budget"] = int((~keep).sum())
    admitted = frontier.filter(pa.array(keep))
    for helper in ("host_wave_rows", "host_rank"):
        if helper in admitted.column_names:
            admitted = admitted.drop_columns([helper])
    return admitted, metrics


def _gate_frame(
    df: pd.DataFrame, prior_map: dict, limit: int, priority: str
) -> pd.DataFrame:
    """THE per-bucket admission kernel (one sort, one cumcount, one mask —
    no per-host Python): every distributed admission path (admit_ray's
    gate tasks, the carried-counts gate tasks) must run exactly this, so
    the 257-semantics and the priority order can't drift between them."""
    pairs = [(c, a) for c, a in zip(*PRIORITY_MODES[priority]) if c in df.columns]
    sort_cols = ["host"] + [c for c, _ in pairs if c != "host"]
    ascending = [True] + [a for c, a in pairs if c != "host"]
    df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
    rank = df.groupby("host", sort=False).cumcount()
    prior = df["host"].map(prior_map).fillna(0).astype(int)
    return df[(prior + rank) <= limit]


def presalt_prune(valid: pa.Table, limit: int, priority: str = "canonical") -> pa.Table:
    """Per-host top-(limit+1) combiner: rows ranked beyond limit+1 within
    their host (in the wave's priority order) can never be admitted, so
    they are pruned before any exchange. Admission results are unchanged
    (equivalence-tested); the exchange volume per host is bounded."""
    if valid.num_rows == 0:
        return valid
    df = valid.to_pandas()
    pairs = [(c, a) for c, a in zip(*PRIORITY_MODES[priority]) if c in df.columns]
    sort_cols = ["host"] + [c for c, _ in pairs if c != "host"]
    ascending = [True] + [a for c, a in pairs if c != "host"]
    df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
    keep = df.groupby("host", sort=False).cumcount() <= limit
    return pa.Table.from_pandas(df[keep], preserve_index=False)


def split_wave_cap(
    frontier: pa.Table,
    cap: int | None,
    priority: str = "canonical",
    host_caps: "dict[str, int] | None" = None,
) -> tuple[pa.Table, pa.Table]:
    """Per-host per-wave dispatch cap — the token form of politeness: each
    wave spends at most ``cap`` tokens per host and everything beyond is
    DEFERRED to the next wave's frontier, not dropped (a host's crawl-delay
    d with wave period T is cap = T/d). The first ``cap`` rows of each
    host group in wave priority order stay in the wave; the cumulative
    257-budget still applies at admission. While the budget does not
    bind, a capped crawl fetches exactly the same URL set as an uncapped
    one — the BFS closure — just spread over more waves (asserted by
    test_priority_robots.test_rate_cap_same_final_state); once a host's
    budget binds, deferral legitimately changes WHICH URLs compete for
    the remaining budget (later waves mix deferred rows with newly
    discovered ones in priority order), so outcomes differ there by
    design, with the 257 cap still enforced. Host-less rows
    are NOT deferred (admission drops them with ``dropped_hostless``;
    deferring would carry them forever).

    ``host_caps`` overrides the default ``cap`` per host (the robots
    Crawl-delay form, see RobotsCache.wave_caps); hosts in neither get no
    cap. Returns (this_wave, deferred)."""
    if cap is not None and cap < 1:
        raise ValueError(f"max_per_host_wave must be >= 1, got {cap}")
    if host_caps is not None and any(c < 1 for c in host_caps.values()):
        raise ValueError("per-host caps must be >= 1")
    if frontier.num_rows == 0:
        return frontier, frontier.slice(0, 0)
    df = frontier.to_pandas()
    pairs = [(c, a) for c, a in zip(*PRIORITY_MODES[priority]) if c in df.columns]
    sort_cols = ["host"] + [c for c, _ in pairs if c != "host"]
    ascending = [True] + [a for c, a in pairs if c != "host"]
    df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
    cum = df.groupby("host", sort=False, dropna=True).cumcount()
    default_cap = float("inf") if cap is None else float(cap)
    if host_caps:
        row_cap = (
            df["host"].map(host_caps).fillna(default_cap).to_numpy(dtype=float)
        )
    else:
        row_cap = np.full(len(df), default_cap)
    keep = (cum.to_numpy(dtype=float) < row_cap) | df["host"].isna().to_numpy()
    now = pa.Table.from_pandas(df[keep], preserve_index=False).cast(
        frontier.schema
    )
    if keep.all():
        return now, frontier.slice(0, 0)
    deferred = pa.Table.from_pandas(df[~keep], preserve_index=False).cast(
        frontier.schema
    )
    return now, deferred


def vc_to_dict(col: "pa.ChunkedArray | pa.Array") -> dict:
    """pc.value_counts → {value: count}: Python objects only for UNIQUE
    values, never one per row. The one idiom for per-host wave counts
    (used here, in the distributed prep task, and in the crawl's fused
    sink prep — keep them identical)."""
    vc = pc.value_counts(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    return dict(
        zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
    )


def _counts_column(hosts: "pa.ChunkedArray | pa.Array", wc: dict) -> pa.Array:
    """Order-preserving per-row count lookup: dictionary-encode the host
    column so the Python dict probe touches only UNIQUE hosts, then fan the
    small count vector back out with a vectorized ``take``."""
    col = hosts.combine_chunks() if isinstance(hosts, pa.ChunkedArray) else hosts
    de = pc.dictionary_encode(col)
    uniq = de.dictionary.to_pylist()
    cnts = pa.array([int(wc.get(h, 0)) for h in uniq], pa.int64())
    return cnts.take(de.indices)


_PREP_BLOCK_TASK = None


def _prep_block_task():
    """Module-singleton distributed-prep task (see shuffle._reduce_bucket_task
    for why per-call ``@ray.remote`` definitions are a per-wave tax)."""
    global _PREP_BLOCK_TASK
    if _PREP_BLOCK_TASK is None:
        import ray

        @ray.remote
        def prep_block(t: pa.Table, limit: int, priority: str, need_counts: bool):
            from .shuffle import _as_arrow

            t = _as_arrow(t)
            if "host" not in t.column_names:
                t = with_host(t)
            n_tot = t.num_rows
            v = t.filter(pc.is_valid(t["host"]))
            n_val = v.num_rows
            hostc = vc_to_dict(v["host"]) if need_counts and n_val else None
            return n_tot, n_val, presalt_prune(v, limit, priority), hostc

        _PREP_BLOCK_TASK = prep_block
    return _PREP_BLOCK_TASK


from dataclasses import dataclass as _dataclass


@_dataclass
class PreppedParts:
    """Pre-prepped admission input, produced UPSTREAM of the wave barrier:
    the probe's sink tasks already attached host keys, counted rows and ran
    the per-host top-(limit+1) combiner on each next-frontier slice while
    the previous wave's checkpoint tail was still draining — so the next
    wave's admission skips its frontier re-read AND its prep task round
    and starts directly at the gate exchange. ``refs`` are object refs to
    the pruned slices (None where a slice was empty); counts/wave_counts
    carry the exact accounting the prep tasks would have produced
    (equivalence: per-slice prune + global prune == global prune, the same
    invariant the per-block prep path relies on)."""

    refs: list
    n_total: int
    n_valid: int
    wave_counts: "dict | None" = None


def _prep_valid(
    frontier_ds, limit: int, priority: str
) -> "tuple[pa.Table, int, int, dict | None]":
    """Shared map side of the admission exchange: attach host keys, count
    total/valid rows, and apply the per-host top-(limit+1) combiner —
    distributed per frontier block when the input is a Dataset / list of
    table refs, one vectorized pass when the coordinator already holds the
    wave table; a ``PreppedParts`` input skips the prep round entirely
    (the previous wave's sink tasks already ran it). Returns (pruned valid
    table, n_total, n_valid_in, per-host wave counts or None)."""
    import ray

    if isinstance(frontier_ds, PreppedParts):
        parts = [
            t
            for t in ray.get([r for r in frontier_ds.refs if r is not None])
            if t is not None and t.num_rows
        ]
        if parts:
            valid = presalt_prune(
                pa.concat_tables(parts).combine_chunks(), limit, priority
            )
        else:
            valid = FRONTIER_SCHEMA.empty_table().append_column(
                "host", pa.array([], pa.string())
            )
        wc = frontier_ds.wave_counts
        if priority == "hot_host_first" and "host_wave_rows" not in valid.column_names:
            valid = valid.append_column(
                "host_wave_rows", _counts_column(valid["host"], wc or {})
            )
        return valid, frontier_ds.n_total, frontier_ds.n_valid, wc

    # Hot-host skew bound (the "salting" of the north-star design): a host
    # can never admit more than limit+1 rows total, so rows ranked past
    # limit+1 within their host are dropped BEFORE the exchange — a
    # pathological host contributes at most limit+1 rows to the shuffle
    # instead of its entire pending frontier.
    wave_counts: "dict | None" = None
    if isinstance(frontier_ds, pa.Table):
        # coordinator already holds the wave table: one vectorized pass
        frontier = frontier_ds
        n_total = frontier.num_rows
        valid = frontier.filter(pc.is_valid(frontier["host"]))
        n_valid_in = valid.num_rows
        if priority == "hot_host_first" and n_valid_in:
            wave_counts = vc_to_dict(valid["host"])
        valid = presalt_prune(valid, limit, priority)
    else:
        # DISTRIBUTED prep: each frontier block attaches the host key,
        # counts its rows, and runs the per-host top-(limit+1) combiner in
        # its own task — the unbounded pre-admission frontier never lands
        # on the coordinator; only politeness-bounded survivors (at most
        # (limit+1) × hosts_in_block rows per block) return, plus partial
        # per-host counts for the hot_host_first priority aggregate.
        need_counts = priority == "hot_host_first"
        prep_block = _prep_block_task()
        refs = (
            frontier_ds
            if isinstance(frontier_ds, list)
            # Dataset input (compat path): forces a streaming-executor
            # launch; the crawl passes plain read-task refs instead
            else frontier_ds.to_arrow_refs()
        )
        res = ray.get(
            [prep_block.remote(r, limit, priority, need_counts) for r in refs]
        )
        n_total = sum(r[0] for r in res)
        n_valid_in = sum(r[1] for r in res)
        parts = [r[2] for r in res if r[2].num_rows]
        if need_counts:
            wave_counts = Counter()
            for r in res:
                if r[3]:
                    wave_counts.update(r[3])
        if parts:
            # merge the per-block combiner outputs with one global prune
            valid = presalt_prune(
                pa.concat_tables(parts).combine_chunks(), limit, priority
            )
        else:
            valid = FRONTIER_SCHEMA.empty_table().append_column(
                "host", pa.array([], pa.string())
            )
    if (
        priority == "hot_host_first"
        and "host_wave_rows" not in valid.column_names
    ):
        # attach the WAVE-WIDE per-host pending counts (from the partial
        # aggregates above, not the pruned survivors) so cross-host
        # priority order matches admit_local exactly
        valid = valid.append_column(
            "host_wave_rows", _counts_column(valid["host"], wave_counts or {})
        )
    return valid, n_total, n_valid_in, wave_counts


_ADMITTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
        ("host", pa.string()),
    ]
)


def admit_ray(
    frontier_ds,
    counts: Counter,
    limit: int = 256,
    priority: str = "canonical",
) -> tuple[pa.Table, Counter]:
    """Shuffle-native admission over frontier rows (url, kind, depth, host)
    given as a Dataset, a driver Table, or a LIST of Arrow-table object
    refs (the crawl's big-frontier form: plain read tasks per checkpoint
    part, no per-wave streaming-executor launch).
    Broadcasts the prior counts once (ray.put); each host
    group admits independently in canonical order. Returns the same
    (admitted, metrics) as admit_local and applies the same counts update.

    Scale note: at 10^8+ hosts the broadcast dict stops fitting — that is
    ``admit_carried``, which shards the counts per bucket and never holds
    them on the driver; this form is used where counts ≪ frontier."""
    import ray

    from .shuffle import bucketed_exchange_tasks

    valid, n_total, n_valid_in, _wave_counts = _prep_valid(
        frontier_ds, limit, priority
    )
    counts_ref = ray.put(dict(counts))

    def gate_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _gate_frame(df, ray.get(counts_ref), limit, priority)

    admitted = bucketed_exchange_tasks(valid, "host", gate_bucket)
    admitted = priority_sort(admitted, priority)
    # pin the schema: an all-empty exchange materialises null-typed columns
    # through pandas, which would poison downstream concat/cast
    admitted = admitted.select(["url", "kind", "depth", "host"]).cast(
        pa.schema(
            [
                ("url", pa.string()),
                ("kind", pa.string()),
                ("depth", pa.int32()),
                ("host", pa.string()),
            ]
        )
    )

    metrics: Counter = Counter()
    # vectorized counts update: one value_counts kernel (≤ hosts entries)
    # instead of a per-admitted-row Python loop
    for s in pc.value_counts(admitted["host"].combine_chunks()).to_pylist():
        counts[s["values"]] += int(s["counts"])
    metrics["dropped_hostless"] = int(n_total - n_valid_in)
    metrics["dropped_budget"] = int(n_valid_in - admitted.num_rows)
    return admitted, metrics


# --------------------------------------------------------------------------
# Distributed host-counts carry (the 10^8-host form)
# --------------------------------------------------------------------------

_GATE_CARRIED_TASK = None
_SNAP_TASK = None
_READ_COUNTS_TASK = None


def _gate_carried_task():
    """Module-singleton bucket gate for the carried-counts exchange: admits
    this bucket's frontier slice against ITS OWN counts shard, returns the
    admitted rows and the post-admission counts shard as two separate
    objects (the driver keeps the counts ref without dereferencing it),
    and — when a snapshot path is given — writes the shard's per-wave
    parquet snapshot from inside the same task (state write fused with the
    admission exchange: no extra task wave, no driver serialization)."""
    global _GATE_CARRIED_TASK
    if _GATE_CARRIED_TASK is None:
        import ray

        @ray.remote(num_returns=2)
        def gate_carried(
            part: pa.Table,
            counts_tbl: "pa.Table | None",
            limit: int,
            priority: str,
            snap_path: "str | None",
        ):
            from .shuffle import _as_arrow

            df = _as_arrow(part).to_pandas()
            prior_map: dict = (
                dict(
                    zip(
                        counts_tbl["host"].to_pylist(),
                        counts_tbl["dispatches"].to_pylist(),
                    )
                )
                if counts_tbl is not None and counts_tbl.num_rows
                else {}
            )
            adm = _gate_frame(df, prior_map, limit, priority)
            for h, c in adm["host"].value_counts().items():
                prior_map[h] = int(prior_map.get(h, 0)) + int(c)
            hosts = sorted(prior_map)
            new_counts = pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "dispatches": pa.array(
                        [prior_map[h] for h in hosts], pa.int64()
                    ),
                }
            )
            if snap_path is not None:
                import pyarrow.parquet as pq

                pq.write_table(new_counts, snap_path)
            admitted = pa.Table.from_pandas(
                adm[["url", "kind", "depth", "host"]], preserve_index=False
            ).cast(_ADMITTED_SCHEMA)
            if "host_wave_rows" in adm.columns:
                # carry the WAVE-WIDE pending counts through to the
                # caller's cross-bucket priority_sort: recomputing them
                # there from the admitted subset would give a different
                # hot_host_first order than admit_local (which sorts on
                # the pre-admission wave counts)
                admitted = admitted.append_column(
                    "host_wave_rows",
                    pa.array(adm["host_wave_rows"].to_numpy(), pa.int64()),
                )
            if "host_rank" in adm.columns:
                # same carry for the "ranked" mode's external host rank
                admitted = admitted.append_column(
                    "host_rank",
                    pa.array(
                        adm["host_rank"].to_numpy(dtype=float), pa.float64()
                    ),
                )
            return admitted, new_counts

        _GATE_CARRIED_TASK = gate_carried
    return _GATE_CARRIED_TASK


def _snap_task():
    """Snapshot an UNTOUCHED bucket's counts shard (no frontier rows this
    wave) to its per-wave parquet — a tiny copy task per shard, so every
    wave's host_counts dir is a complete restore point."""
    global _SNAP_TASK
    if _SNAP_TASK is None:
        import ray

        @ray.remote
        def snap(counts_tbl: pa.Table, snap_path: str) -> None:
            import pyarrow.parquet as pq

            pq.write_table(counts_tbl, snap_path)

        _SNAP_TASK = snap
    return _SNAP_TASK


def _read_counts_task():
    global _READ_COUNTS_TASK
    if _READ_COUNTS_TASK is None:
        import ray

        @ray.remote
        def read_counts(path: str) -> pa.Table:
            import pyarrow.parquet as pq

            return pq.read_table(path)

        _READ_COUNTS_TASK = read_counts
    return _READ_COUNTS_TASK


class CarriedCounts:
    """Host-visit counts carried as ``n_buckets`` per-bucket Arrow shards
    held in the OBJECT STORE (one ref per bucket, ``hash(host) %
    n_buckets`` — the same bucket space the admission exchange uses), so
    the driver holds B refs and never a host-keyed dict. This is the
    documented 10^8-host form of ST2's carried state: at design scale the
    driver Counter + per-wave ``ray.put`` broadcast stops fitting; here
    each admission bucket task reads exactly its own shard and emits the
    updated shard + its per-wave parquet snapshot."""

    def __init__(self, refs: "list") -> None:
        self.refs = list(refs)

    @property
    def n_buckets(self) -> int:
        return len(self.refs)

    @classmethod
    def empty(cls, n_buckets: int = 32) -> "CarriedCounts":
        return cls([None] * n_buckets)

    @classmethod
    def from_counter(cls, counts: Counter, n_buckets: int = 32) -> "CarriedCounts":
        import ray

        from .shuffle import _bucket_ids

        refs: list = [None] * n_buckets
        if counts:
            hosts = pa.array(sorted(counts), pa.string())
            b = _bucket_ids(hosts, n_buckets)
            for bucket in np.unique(b):
                sel = b == bucket
                hs = [h for h, s in zip(hosts.to_pylist(), sel) if s]
                refs[int(bucket)] = ray.put(
                    pa.table(
                        {
                            "host": pa.array(hs, pa.string()),
                            "dispatches": pa.array(
                                [counts[h] for h in hs], pa.int64()
                            ),
                        }
                    )
                )
        return cls(refs)

    @classmethod
    def restore(cls, snapshot_dir: str, n_buckets: int = 32) -> "CarriedCounts":
        """Resume from a per-wave snapshot dir WITHOUT driver
        materialization: one read task per bucket file, refs kept."""
        from pathlib import Path

        read = _read_counts_task()
        refs: list = [None] * n_buckets
        files = sorted(Path(snapshot_dir).glob("bucket_*.parquet"))
        # hosts are routed by hash % n_buckets: restoring a snapshot
        # written with a DIFFERENT bucket count would place shards at
        # stale indices and gate tasks would read the wrong (usually
        # empty) shard — silently re-admitting past-budget hosts.
        meta = Path(snapshot_dir) / "_meta.json"
        if meta.exists():
            import json

            written_n = json.loads(meta.read_text()).get("n_buckets")
            if written_n != n_buckets:
                raise ValueError(
                    f"counts snapshot {snapshot_dir} was written with "
                    f"n_buckets={written_n}; resume with that count, not "
                    f"{n_buckets}"
                )
        max_b = max((int(f.stem.split("_")[1]) for f in files), default=-1)
        if max_b >= n_buckets:  # pre-meta snapshots: catch shrink at least
            raise ValueError(
                f"counts snapshot {snapshot_dir} has bucket index {max_b} "
                f">= counts_buckets={n_buckets}; resume with the run's "
                "original bucket count"
            )
        for f in files:
            refs[int(f.stem.split("_")[1])] = read.remote(str(f))
        return cls(refs)

    def to_counter(self) -> Counter:
        """Gather to a driver Counter — accessor for tests / small scale
        (this is the one deliberately corpus-∝-hosts gather; the crawl
        itself never calls it)."""
        import ray

        out: Counter = Counter()
        for r in self.refs:
            if r is not None:
                t = ray.get(r)
                out.update(
                    dict(
                        zip(t["host"].to_pylist(), t["dispatches"].to_pylist())
                    )
                )
        return out


def admit_carried(
    frontier_ds,
    carried: CarriedCounts,
    limit: int = 256,
    priority: str = "canonical",
    snapshot_dir: "str | None" = None,
) -> "tuple[pa.Table, Counter, list]":
    """Admission with the counts carried as per-bucket object-store shards
    (see CarriedCounts) instead of a driver Counter: identical admission
    semantics to admit_local / admit_ray (equivalence-tested), but no
    host-keyed state ever lands on the driver — each bucket's gate task
    joins its frontier slice against its own counts shard and emits the
    updated shard. ``carried`` is updated IN PLACE (refs swap). When
    ``snapshot_dir`` is set, every non-empty shard's per-wave parquet
    snapshot is written from inside the gate tasks (touched buckets,
    fused) or a tiny copy task (untouched buckets); returns those write
    barriers as the third element — the caller ray.gets them before its
    wave-commit marker."""
    import ray

    from .shuffle import _bucket_ids

    if snapshot_dir is not None:
        import json
        from pathlib import Path

        Path(snapshot_dir).mkdir(parents=True, exist_ok=True)
        # hosts are routed by hash % n_buckets; a resume must use the same
        # count (restore() verifies against this record)
        (Path(snapshot_dir) / "_meta.json").write_text(
            json.dumps({"n_buckets": carried.n_buckets})
        )

    valid, n_total, n_valid_in, _wc = _prep_valid(frontier_ds, limit, priority)
    n = carried.n_buckets
    gate = _gate_carried_task()
    snap = _snap_task()

    admitted_refs: list = []
    new_refs: list = [None] * n
    barriers: list = []
    touched = np.zeros(n, dtype=bool)
    if valid.num_rows:
        buckets = _bucket_ids(valid["host"], n)
        order = np.argsort(buckets, kind="stable")
        sorted_tbl = valid.take(pa.array(order))
        bounds = np.searchsorted(buckets[order], np.arange(n + 1))
        for b in range(n):
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            if hi > lo:
                touched[b] = True
                spath = (
                    f"{snapshot_dir}/bucket_{b:05d}.parquet"
                    if snapshot_dir is not None
                    else None
                )
                adm_ref, cnt_ref = gate.remote(
                    sorted_tbl.slice(lo, hi - lo),
                    carried.refs[b],
                    limit,
                    priority,
                    spath,
                )
                admitted_refs.append(adm_ref)
                new_refs[b] = cnt_ref
    for b in range(n):
        if not touched[b]:
            new_refs[b] = carried.refs[b]
            if snapshot_dir is not None and carried.refs[b] is not None:
                barriers.append(
                    snap.remote(
                        carried.refs[b],
                        f"{snapshot_dir}/bucket_{b:05d}.parquet",
                    )
                )
    parts = [t for t in ray.get(admitted_refs) if t.num_rows]
    # getting an admitted output implies its gate task finished, i.e. its
    # fused snapshot file is on disk — touched buckets need no barrier
    admitted = (
        priority_sort(
            pa.concat_tables(parts).combine_chunks(), priority
        )
        if parts
        else _ADMITTED_SCHEMA.empty_table()
    )
    for helper in ("host_wave_rows", "host_rank"):
        if helper in admitted.column_names:
            admitted = admitted.drop_columns([helper])
    admitted = admitted.select(["url", "kind", "depth", "host"]).cast(
        _ADMITTED_SCHEMA
    )
    carried.refs = new_refs

    metrics: Counter = Counter()
    metrics["dropped_hostless"] = int(n_total - n_valid_in)
    metrics["dropped_budget"] = int(n_valid_in - admitted.num_rows)
    return admitted, metrics, barriers
