"""Pluggable fetch stage — the real-deployment seam.

In this sandbox the crawl "fetches" by scanning the corpus parquet (a
pushdown join, stages/parse.py) — the right substitution where no network
exists. A real deployment replaces that scan with THIS stage: a callable
CLASS run as a ``map_batches`` actor pool over the admitted frontier,
holding one pooled HTTP client per actor (the reference builds one reqwest
Client with a 5 s connect timeout and reuses it for every request,
/root/reference/src/main.rs:71-73, and fetches each dispatched finding
through it, main.rs:150-159, 264-270).

Contract: input batches are ``(fetch_url, url, kind, depth)`` — one row
per admitted dispatch, ``fetch_url`` the defragmented form actually
requested; output batches are ``(url, kind, depth, html)``, exactly the
schema ``attach_frontier`` produces, so ``process_wave_batch`` and
everything downstream is fetch-implementation-agnostic. Failed fetches
emit NO row — the wave accounting derives fetch_miss_* from dispatched
minus returned, identically for both paths.

``DictFetcher`` is the deterministic offline implementation (corpus
broadcast once via ``ray.put``); the seam test runs a whole crawl through
it and asserts bit-identical output against the corpus-scan path.
"""

from __future__ import annotations

import pyarrow as pa

FETCH_IN_SCHEMA = pa.schema(
    [
        ("fetch_url", pa.string()),
        ("url", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
    ]
)


def _emit(batch: pa.Table, keep_idx: list[int], htmls: list[bytes]) -> pa.Table:
    return pa.table(
        {
            "url": batch["url"].take(pa.array(keep_idx, pa.int64())),
            "kind": batch["kind"].take(pa.array(keep_idx, pa.int64())),
            "depth": batch["depth"].take(pa.array(keep_idx, pa.int64())),
            "html": pa.array(htmls, pa.binary()),
        }
    )


class HttpFetcher:
    """Actor-pool HTTP fetch: client built ONCE per actor in __init__
    (the expensive, stateful part — connection pools, TLS contexts), used
    per batch in __call__. Stdlib-only so it imports anywhere; a real
    deployment would swap in an async pooled client behind the same
    contract. This sandbox has no network: constructing the actor is fine
    and cheap, the first request raises — which is exactly the honest
    boundary (same pattern as the multimodal codec stub)."""

    def __init__(
        self,
        connect_timeout_s: float = 5.0,
        user_agent: str = "crawler-ray/0.1",
        max_concurrency: int = 16,
        respect_robots: bool = False,
    ) -> None:
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        self.opener = urllib.request.build_opener()
        self.opener.addheaders = [("User-Agent", user_agent)]
        self.timeout = connect_timeout_s
        # The reference spawns one task per dispatched URL with NO cap
        # (main.rs:110-117); a bounded in-actor pool is the scale-sane
        # analog — requests in one batch overlap instead of serializing
        # on each response's latency, while `max_concurrency × actors`
        # bounds the node's open sockets. Threads are built once per
        # actor (stateful setup), reused for every batch.
        self._pool = ThreadPoolExecutor(max_workers=max(1, int(max_concurrency)))
        # Per-actor robots.txt cache (north-star: robots caches live in
        # the stateful fetcher actors): host → Disallow prefixes, fetched
        # once per host per actor and reused for every later batch. This
        # is fetch-time enforcement — the LAST line of defense; the
        # engine's dispatch-side gate (stages/robots.py, gating BEFORE
        # the budget counter) is authoritative for budget semantics, and
        # a production deployment runs both. A robots-blocked URL emits
        # no row (indistinguishable from a miss at this seam).
        self.respect_robots = respect_robots
        #: host -> COMPILED precedence-ordered robots rules (robots.compile_rules)
        self._robots: "dict[str, list]" = {}

    def fetch_one(self, url: str) -> "bytes | None":
        try:
            with self.opener.open(url, timeout=self.timeout) as resp:
                return resp.read()
        except Exception:
            return None  # miss: reference warns and drops (main.rs:151-155)

    def _robots_allowed_idx(self, urls: "list[str]") -> "list[int]":
        """Indices of batch rows whose path is allowed by their host's
        robots rules. New hosts' robots.txt bodies are fetched through the
        same thread pool (concurrently, once per host per actor)."""
        from .. import urlnorm as un
        from .robots import compile_rules, parse_robots_rules, rules_allow

        parsed = []
        for u in urls:
            try:
                parsed.append(un.parse(u))
            except Exception:
                parsed.append(None)  # unfetchable anyway; let fetch miss
        fetch_list = []
        for p in parsed:
            if (
                p is not None
                and p.host is not None
                and p.host not in self._robots
                and all(h != p.host for h, _ in fetch_list)
            ):
                fetch_list.append(
                    (p.host, f"{p.scheme}://{p.host}/robots.txt")
                )
        if fetch_list:
            bodies = self._pool.map(self.fetch_one, [u for _, u in fetch_list])
            for (h, _), body in zip(fetch_list, bodies):
                # cache COMPILED precedence-ordered rules once per host per
                # actor (RFC 9309 matching: wildcards/anchors/Allow wins)
                self._robots[h] = compile_rules(
                    parse_robots_rules(body) if body else []
                )
        keep = []
        for i, p in enumerate(parsed):
            if p is None or p.host is None:
                keep.append(i)
                continue
            path = p.path + (f"?{p.query}" if p.query is not None else "")
            if rules_allow(self._robots.get(p.host) or [], path):
                keep.append(i)
        return keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["fetch_url"].to_pylist()
        idxs = (
            self._robots_allowed_idx(urls)
            if self.respect_robots
            else range(len(urls))
        )
        # executor.map yields results in submission order: output rows keep
        # the batch's (canonical) row order regardless of completion order,
        # so the deterministic-checkpoint contract survives concurrency.
        keep, htmls = [], []
        for i, body in zip(
            idxs, self._pool.map(self.fetch_one, [urls[i] for i in idxs])
        ):
            if body is not None:
                keep.append(i)
                htmls.append(body)
        return _emit(batch, keep, htmls)

    def __del__(self) -> None:  # actor teardown: don't leak threads
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)


_SHARD_ACTOR = None
_LOAD_SPLIT = None


def _corpus_shard_actor():
    """Lazily-decorated shard actor class (module singleton so the class is
    exported to the cluster once)."""
    global _SHARD_ACTOR
    if _SHARD_ACTOR is None:
        import ray

        @ray.remote
        class CorpusShard:
            """One shard of the corpus fetch service: holds the (url, html)
            rows whose ``hash64(url) % n_shards`` routes here, with a
            persistent hash index built ONCE at seal — each wave's probe is
            O(wave rows), never O(shard rows)."""

            def __init__(self) -> None:
                self._parts: list[pa.Table] = []
                self._urls = None
                self._html = None
                self._index = None

            def add(self, t: "pa.Table | None") -> None:
                if t is not None and t.num_rows:
                    self._parts.append(t)

            def seal(self) -> int:
                import pandas as pd

                if self._parts:
                    t = pa.concat_tables(self._parts)
                else:
                    t = pa.table(
                        {
                            "url": pa.array([], pa.string()),
                            "html": pa.array([], pa.binary()),
                        }
                    )
                self._parts = []
                self._urls = t["url"]
                # html stays a ChunkedArray referencing the build tasks'
                # PLASMA buffers — zero-copy: sealing moves no payload
                # bytes (the old combine_chunks memcpy'd corpus/n_shards
                # bytes per shard into actor heap, the dominant seal cost
                # and a 2x memory bill). take() on a chunked array is
                # supported and the per-wave probe touches only hit rows.
                self._html = t["html"]
                self._index = pd.Index(self._urls.to_pandas())
                return t.num_rows

            def stats(self) -> dict:
                """Liveness ping + occupancy (never mutates state)."""
                return {
                    "sealed": self._index is not None,
                    "rows": len(self._urls) if self._urls is not None else 0,
                }

            def fetch(self, batch: pa.Table) -> pa.Table:
                """FETCH_IN_SCHEMA rows routed to this shard → fetched
                (url, kind, depth, html) rows; misses emit no row. One
                vectorized index probe + one take — only HIT payloads are
                copied out. ORDER CONTRACT: input row order is preserved;
                ``route()`` pre-sorts its slices canonically on the DRIVER
                (lookup rows only, no payload), so the deterministic
                checkpoint order costs one small string sort per wave
                instead of a per-shard sort that would shuffle the fetched
                html payloads (hundreds of MB) a second time."""
                import numpy as np

                pos = self._index.get_indexer(batch["fetch_url"].to_pandas())
                hit = pos >= 0
                if not hit.any():
                    return _emit(batch, [], [])
                keep = pa.array(np.nonzero(hit)[0], pa.int64())
                return pa.table(
                    {
                        "url": batch["url"].take(keep),
                        "kind": batch["kind"].take(keep),
                        "depth": batch["depth"].take(keep),
                        "html": self._html.take(
                            pa.array(pos[hit], pa.int64())
                        ),
                    }
                )

        _SHARD_ACTOR = CorpusShard
    return _SHARD_ACTOR


def _load_split_task():
    global _LOAD_SPLIT
    if _LOAD_SPLIT is None:
        import ray

        @ray.remote
        def load_split(
            path: str, n: int, lookups: "pa.Table | None" = None
        ) -> "list":
            """Read ONE corpus file and hash-partition its rows across the
            service's shards (map side of the build exchange). Returns n+1
            objects: the n shard parts plus — when ``lookups`` (a
            FETCH_IN_SCHEMA table, canonically pre-sorted on the driver) is
            given — this file's fetched rows for the CURRENT wave, so the
            first fat wave of a restart-shaped crawl is served from the
            same single corpus read that builds the shards (fused
            build+fetch: no svc-build wait on the critical path)."""
            import numpy as np
            import pyarrow.parquet as pq

            from ..keys import hash64

            t = pq.read_table(path, columns=["url", "html"])
            hits = None
            if (
                lookups is not None
                and lookups.num_rows
                and t.num_rows
            ):
                import pandas as pd

                # same probe as CorpusShard.fetch: one vectorized index
                # lookup, hits emitted in lookup (= canonical) order
                idx = pd.Index(t["url"].to_pandas())
                pos = idx.get_indexer(lookups["fetch_url"].to_pandas())
                hit = pos >= 0
                if hit.any():
                    keep = pa.array(np.nonzero(hit)[0], pa.int64())
                    hits = pa.table(
                        {
                            "url": lookups["url"].take(keep),
                            "kind": lookups["kind"].take(keep),
                            "depth": lookups["depth"].take(keep),
                            "html": t["html"].take(pa.array(pos[hit], pa.int64())),
                        }
                    )
            if t.num_rows == 0:
                return [None] * n + [hits]
            h = (hash64(t["url"].combine_chunks()) % np.uint64(n)).astype(
                np.int64
            )
            order = np.argsort(h, kind="stable")
            s = t.take(pa.array(order))
            hb = h[order]
            bounds = np.searchsorted(hb, np.arange(n + 1))
            return [
                s.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                if bounds[i + 1] > bounds[i]
                else None
                for i in range(n)
            ] + [hits]

        _LOAD_SPLIT = load_split
    return _LOAD_SPLIT


_LOAD_ONE = None


def _load_one_task():
    """Singleton Ray task: read ONE corpus file and return only the rows of
    ONE shard partition (shard-rebuild path — a dead shard's state is a
    deterministic function of the corpus files, so recovery re-derives just
    its slice instead of re-running the full build exchange)."""
    global _LOAD_ONE
    if _LOAD_ONE is None:
        import ray

        @ray.remote
        def load_one(path: str, b: int, n: int) -> "pa.Table | None":
            import numpy as np
            import pyarrow.parquet as pq

            from ..keys import hash64

            t = pq.read_table(path, columns=["url", "html"])
            if t.num_rows == 0:
                return None
            h = (hash64(t["url"].combine_chunks()) % np.uint64(n)).astype(
                np.int64
            )
            pos = np.nonzero(h == b)[0]
            return t.take(pa.array(pos)) if len(pos) else None

        _LOAD_ONE = load_one
    return _LOAD_ONE


class CorpusFetchService:
    """Sharded in-memory corpus fetch service — the offline analog of a
    crawl's fetch fleet.

    The corpus-scan path re-reads corpus bytes EVERY wave (the scan is the
    join); a real crawl's fetch costs bytes per DISPATCH, not per corpus
    row, and scales with nodes because every node brings its own NIC. This
    service restores that cost model offline: corpus files are read ONCE
    and hash-exchanged to ``n_shards`` actors (each holding its slice in
    Arrow with a persistent url index), and each wave then moves only the
    admitted pages' bytes. At design scale the shards hold the corpus in
    the cluster's aggregate RAM — the moral equivalent of "the web is out
    there"; shard count scales with the cluster like the seen-set shards.

    The build runs asynchronously from ``start()`` (called from
    ``__init__`` unless ``defer=True``); ``ready()`` blocks until sealed,
    ``is_ready()`` polls — the crawl's small BFS warmup waves keep using
    the pruned-scan fast path while the build streams in the background,
    and the first fat wave flips over. A restart-shaped crawl (fat wave 0)
    instead defers and calls ``start_fused(lookups_ref)``: the SAME single
    corpus read both partitions the shards and emits wave 0's fetched rows
    (one hits table per corpus file, returned as object refs), so the
    build never sits on the critical path as a pure wait.
    """

    def __init__(
        self, files: "list[str]", n_shards: int = 8, defer: bool = False
    ) -> None:
        self.files = list(files)
        self.n_shards = max(1, int(n_shards))
        shard_cls = _corpus_shard_actor()
        self.shards = [shard_cls.remote() for _ in range(self.n_shards)]
        self._seal: "list | None" = None
        self.rows: "int | None" = None
        self.recoveries = 0  # diagnostic: in-run shard rebuilds performed
        if not defer:
            self.start()

    def find_dead(self) -> "list[int]":
        """Indices of shard actors that no longer answer (RayActorError)."""
        import ray

        dead = []
        for i, s in enumerate(self.shards):
            try:
                ray.get(s.stats.remote())
            except ray.exceptions.RayActorError:
                dead.append(i)
        return dead

    def recover(self, dead: "list[int]") -> None:
        """Respawn dead shards and rebuild each one's partition — shard
        state is a pure function of the corpus files (hash64(url) %
        n_shards), so recovery re-reads only the dead shards' slices
        (one load_one task per corpus file) and re-seals. Within-shard row
        order comes out identical to the original build (per-file order,
        stable within a file), so re-issued fetches are bit-identical."""
        import ray

        if not dead:
            return
        shard_cls = _corpus_shard_actor()
        load_one = _load_one_task()
        barriers = []
        for b in dead:
            self.shards[b] = shard_cls.remote()
            for f in self.files:
                self.shards[b].add.remote(
                    load_one.remote(f, b, self.n_shards)
                )
            seal_ref = self.shards[b].seal.remote()
            if self._seal is not None:
                self._seal[b] = seal_ref
            barriers.append(seal_ref)
        ray.get(barriers)  # re-fetch must see the rebuilt, sealed state
        self.recoveries += len(dead)

    @property
    def started(self) -> bool:
        return self._seal is not None

    def _launch(self, lookups_ref) -> "list":
        """Submit the build exchange (one load_split per corpus file, adds
        routed to the shard actors, then seals). Returns the per-file
        wave-0 hits refs (meaningful only under start_fused)."""
        load = _load_split_task()
        hit_refs = []
        for f in self.files:
            refs = load.options(num_returns=self.n_shards + 1).remote(
                f, self.n_shards, lookups_ref
            )
            parts, hits = refs[:-1], refs[-1]
            for b, r in enumerate(parts):
                self.shards[b].add.remote(r)
            hit_refs.append(hits)
        # actor tasks run in submission order: every add lands before seal
        self._seal = [s.seal.remote() for s in self.shards]
        return hit_refs

    def start(self) -> None:
        """Begin the plain async build (idempotent)."""
        if self._seal is None:
            self._launch(None)

    def start_fused(self, lookups_ref) -> "list":
        """Begin the build AND serve the current wave from the same read:
        ``lookups_ref`` is a ``ray.put`` FETCH_IN_SCHEMA table (canonically
        pre-sorted). Returns one object ref per corpus file resolving to
        that file's fetched (url, kind, depth, html) rows for the wave
        (None where the file holds no admitted url)."""
        assert self._seal is None, "service already started"
        return self._launch(lookups_ref)

    def is_ready(self) -> bool:
        import ray

        if self.rows is not None:
            return True
        if self._seal is None:
            return False
        done, _ = ray.wait(list(self._seal), num_returns=len(self._seal), timeout=0)
        return len(done) == len(self._seal)

    def ready(self) -> int:
        import ray

        if self.rows is None:
            self.start()
            try:
                self.rows = int(sum(ray.get(self._seal)))
            except ray.exceptions.RayError:
                dead = self.find_dead()
                if not dead:
                    raise
                self.recover(dead)  # recover() re-seals; refs now healthy
                self.rows = int(sum(ray.get(self._seal)))
        return self.rows

    def route(self, lookups: pa.Table) -> "list[pa.Table | None]":
        """Slice a FETCH_IN_SCHEMA lookup table into per-shard partitions by
        the same url hash the build used (zero-copy slices). Slices come out
        in canonical (url, kind, depth) order — the stable hash-argsort
        preserves this pre-sort — which is what lets ``fetch()`` skip
        re-sorting the payload-heavy fetched table (see its order
        contract)."""
        import numpy as np

        from ..keys import hash64

        n = self.n_shards
        if lookups.num_rows == 0:
            return [None] * n
        lookups = lookups.sort_by(
            [
                ("url", "ascending"),
                ("kind", "ascending"),
                ("depth", "ascending"),
            ]
        )
        h = (
            hash64(lookups["fetch_url"].combine_chunks()) % np.uint64(n)
        ).astype(np.int64)
        order = np.argsort(h, kind="stable")
        s = lookups.take(pa.array(order))
        hb = h[order]
        bounds = np.searchsorted(hb, np.arange(n + 1))
        return [
            s.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            if bounds[i + 1] > bounds[i]
            else None
            for i in range(n)
        ]

    def shutdown(self) -> None:
        import ray

        for s in self.shards:
            ray.kill(s)
        self.shards = []


class DictFetcher:
    """Offline fetcher: resolves against a corpus dict broadcast once via
    ``ray.put`` (pass the ObjectRef as ``corpus_ref``). Deterministic —
    the seam's test double AND a usable local-corpus fetch mode."""

    def __init__(self, corpus_ref) -> None:
        import pandas as pd
        import ray

        corpus: dict = ray.get(corpus_ref)
        # Vectorized probe state, built once per actor: the same persistent
        # pd.Index + Arrow payload layout CorpusShard.fetch uses, instead of
        # a per-row dict.get loop over to_pylist() strings.
        self._index = pd.Index(list(corpus.keys()))
        self._html = pa.array(
            [v if isinstance(v, bytes) else v.encode() for v in corpus.values()],
            pa.binary(),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        pos = self._index.get_indexer(batch["fetch_url"].to_pandas())
        hit = pos >= 0
        if not hit.any():
            return _emit(batch, [], [])
        keep = pa.array(np.nonzero(hit)[0], pa.int64())
        return pa.table(
            {
                "url": batch["url"].take(keep),
                "kind": batch["kind"].take(keep),
                "depth": batch["depth"].take(keep),
                "html": self._html.take(pa.array(pos[hit], pa.int64())),
            }
        )
