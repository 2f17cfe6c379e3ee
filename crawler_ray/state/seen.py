"""Sharded URL-seen set: the distributed form of the reference's global
``archive: HashSet<Finding>`` (/root/reference/src/main.rs:51, 129-130).

N shard actors each own a hash-partition of the key space (shard =
hash64(key) % N). A shard holds a Bloom filter (cuckoo available — see
state/filters.py) plus, below ``exact_limit`` keys, an exact Python set
that removes false positives entirely; the correctness tests always run
exact. ``probe_and_insert`` is the reference's set-difference + extend
fused into one idempotent call: the first caller to present a key gets
True (new), every later caller False.

Scale notes (10^10 design point): 64 shards × bloom(2×10^8 keys, 1% fpp)
≈ 64 × 230 MB — fits a 256-node cluster trivially; exact sets are dropped
(approx_only) and the rare false positive = a skipped URL, which the
north_rule accepts at design scale. Routing is a pure function of the key,
so batches probe shards in parallel and a crashed shard can be rebuilt by
re-inserting the archive deltas from the wave checkpoints (pipelines/crawl
writes one per wave).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..keys import finding_keys, hash64, hash_pair
from .filters import BloomFilter, CuckooFilter


_ROUTE_PART_TASK = None


def _route_part_task():
    """Singleton Ray task: read ONE archive-delta parquet part, derive its
    Finding keys, and return the key slice for each target shard (restore /
    recovery exchange — parts flow worker→shard as plasma refs, nothing
    archive-sized touches the driver)."""
    global _ROUTE_PART_TASK
    if _ROUTE_PART_TASK is None:

        @ray.remote
        def route_part(path: str, targets: tuple, n_shards: int):
            import pyarrow.parquet as pq

            t = pq.read_table(path, columns=["url", "kind", "depth"])
            keys = finding_keys(t["url"], t["kind"], t["depth"])
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            if len(keys) == 0:
                outs = [keys for _ in targets]
            else:
                h = (hash64(keys) % np.uint64(n_shards)).astype(np.int64)
                outs = [
                    keys.take(pa.array(np.nonzero(h == s)[0])) for s in targets
                ]
            return tuple(outs) if len(targets) > 1 else outs[0]

        _ROUTE_PART_TASK = route_part
    return _ROUTE_PART_TASK


def _first_occurrence(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """First-occurrence mask over the 128-bit hash pair, all numpy (used on
    the approx path, where a 2^-128 pair collision is far below the bloom
    false-positive rate anyway)."""
    pair = np.empty(len(h1), dtype=[("a", np.uint64), ("b", np.uint64)])
    pair["a"], pair["b"] = h1, h2
    _, idx = np.unique(pair, return_index=True)
    first = np.zeros(len(h1), dtype=bool)
    first[idx] = True
    return first


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One hash-partition of the archive. Bloom + (optional) exact set."""

    def __init__(
        self,
        capacity: int,
        fpp: float,
        approx_only: bool,
        filter_kind: str = "bloom",
    ) -> None:
        self.bloom = (
            CuckooFilter(capacity) if filter_kind == "cuckoo" else BloomFilter(capacity, fpp)
        )
        self.exact: set[str] | None = None if approx_only else set()
        # epoch → {digest → mask} memos making probes idempotent under Ray
        # task retry / lineage re-execution. Keyed by epoch so stale memos
        # self-expire: the first probe of a NEW epoch drops every older
        # epoch's memos, so a caller that forgets end_epoch() leaks at most
        # one epoch's masks instead of one per batch for the process life.
        self.applied: dict[int, dict[tuple, np.ndarray]] = {}

    def probe_and_insert(
        self, keys: "list[str] | pa.Array", probe_id: tuple | None = None
    ) -> np.ndarray:
        """Returns new-mask: True where the key was not seen before this
        call. Duplicates within one call: first occurrence wins. Accepts an
        Arrow array so the caller ships a zero-copy slice and the
        string→Python conversion runs HERE (parallel across shards), not on
        the coordinator.

        This call MUTATES shard state, which does not mix with transparent
        task re-execution UNLESS the caller passes ``probe_id``: a retried
        probe presenting the same id gets its original mask back instead of
        all-False. Ids must be content-derived and unique within the epoch
        — the crawl guarantees that by key-deduping the wave before the
        streaming probe, so equal content implies the same logical probe.
        Driver-coordinated probes (small waves) pass no id; their recovery
        is wave-level resume."""
        if keys is None or len(keys) == 0:
            # empty bucket in the streaming-probe exchange ships None
            return np.zeros(0, dtype=bool)
        if probe_id is not None:
            memo = self.applied.get(probe_id[0], {}).get(probe_id[1:])
            if memo is not None:
                return memo
        # keys stay Arrow through hashing (hash_pair is a vectorized polars
        # kernel over the Arrow column — no per-key Python on this path)
        h1, h2 = hash_pair(keys)
        if self.exact is not None:
            # test-scale exact mode: one string materialization, then
            # C-level hash-table passes (duplicated/isin) — no per-key loop
            import pandas as pd

            if isinstance(keys, (pa.Array, pa.ChunkedArray)):
                keys = keys.to_pylist()
            s = pd.Series(keys, dtype="object")
            first = ~s.duplicated().to_numpy()  # intra-call: first wins
            out = first & ~s.isin(self.exact).to_numpy()
            self.exact.update(s[out])
        else:
            # design-scale approx mode: fully numeric — intra-call first
            # occurrence on the 128-bit hash pair, never a Python string
            out = ~self.bloom.contains(h1, h2) & _first_occurrence(h1, h2)
        self.bloom.add(h1[out], h2[out])
        if probe_id is not None:
            self._memoize(probe_id, out)
        return out

    def _memoize(self, probe_id: tuple, out: np.ndarray) -> None:
        # probe_id = (epoch, *content-derived discriminators)
        epoch, digest = probe_id[0], probe_id[1:]
        if epoch not in self.applied:
            # first probe of a new epoch: older epochs are committed —
            # drop their memos even if the caller missed end_epoch()
            for stale in [e for e in self.applied if e < epoch]:
                del self.applied[stale]
            self.applied[epoch] = {}
        self.applied[epoch][digest] = out

    def clear_applied(self, before_epoch: "int | None" = None) -> int:
        """Drop the idempotency memos (end of wave/epoch). With
        ``before_epoch``, only memos of OLDER epochs are dropped — the
        fire-and-forget clear then can never race ahead of a NEWER
        epoch's worker-side probes (make_prober submits probes from
        map_batches tasks, which per-caller actor ordering does not
        serialize against the driver's clear)."""
        if before_epoch is None:
            n = sum(len(m) for m in self.applied.values())
            self.applied.clear()
            return n
        stale = [e for e in self.applied if e < before_epoch]
        n = sum(len(self.applied[e]) for e in stale)
        for e in stale:
            del self.applied[e]
        return n

    def insert(self, keys: "list[str] | pa.Array") -> int:
        """Insert without probing (checkpoint restore path)."""
        if keys is None or len(keys) == 0:
            return 0
        h1, h2 = hash_pair(keys)
        if self.exact is not None:
            if isinstance(keys, (pa.Array, pa.ChunkedArray)):
                keys = keys.to_pylist()
            self.exact.update(keys)
        self.bloom.add(h1, h2)
        return len(h1)

    def stats(self) -> dict:
        return {
            "n_exact": len(self.exact) if self.exact is not None else None,
            "n_bloom_added": self.bloom.n_added,
            "bloom_bytes": self.bloom.nbytes(),
        }


class SeenSet:
    """Driver-side handle to the shard pool."""

    def __init__(
        self,
        num_shards: int = 8,
        capacity_per_shard: int = 1_000_000,
        fpp: float = 0.01,
        approx_only: bool = False,
        filter_kind: str = "bloom",  # | "cuckoo" (north_rule names both)
    ) -> None:
        self.num_shards = num_shards
        self._ctor = (capacity_per_shard, fpp, approx_only, filter_kind)
        self.shards = [
            SeenShard.remote(capacity_per_shard, fpp, approx_only, filter_kind)
            for _ in range(num_shards)
        ]
        # run_crawl points this at the committed archive checkpoints so a
        # crashed shard can be rebuilt in-run (see recover()); None = no
        # durable source, recovery restores an empty shard (correct only
        # before the first commit).
        self._recovery_source = None
        self.recoveries = 0  # diagnostic: in-run shard rebuilds performed

    def set_recovery_source(self, fn) -> None:
        """``fn() -> list[str]`` of the COMMITTED archive-delta parquet
        part paths (state as of the last completed wave). Used by
        ``recover`` to rebuild dead shards; the current wave's partial
        sink parts must NOT be included — replayed probes re-derive them."""
        self._recovery_source = fn

    def find_dead(self) -> list[int]:
        """Indices of shard actors that no longer answer (RayActorError)."""
        dead = []
        for i, s in enumerate(self.shards):
            try:
                ray.get(s.stats.remote())
            except ray.exceptions.RayActorError:
                dead.append(i)
        return dead

    def recover(self, dead: list[int]) -> None:
        """Respawn the dead shards and restore each one's key-partition
        from the committed checkpoints. Restored state = end of the last
        COMMITTED wave; the in-flight wave's probes must then be replayed
        in full — surviving shards answer the replay from their epoch
        memos without re-inserting, the rebuilt shards answer fresh, and
        because buckets are key-disjoint and within-bucket keys unique,
        the replayed masks are bit-identical to a failure-free run."""
        if not dead:
            return
        for i in dead:
            self.shards[i] = SeenShard.remote(*self._ctor)
        if self._recovery_source is not None:
            self.restore_from_parts(
                list(self._recovery_source()), only_shards=dead
            )
        self.recoveries += len(dead)

    def restore_from_parts(
        self, paths: list, only_shards: "list[int] | None" = None
    ) -> None:
        """Distributed bulk-restore: one route task per checkpoint part
        reads it and emits per-shard key slices (plasma refs) that chain
        straight into the shards' ``insert`` — the driver handles only
        refs, never archive bytes (the resume and recovery paths share
        this). ``only_shards`` restores just those shard indices (in-run
        recovery of dead shards)."""
        targets = (
            tuple(range(self.num_shards))
            if only_shards is None
            else tuple(only_shards)
        )
        if not targets or not paths:
            return
        task = _route_part_task()
        barriers = []
        for p in paths:
            refs = task.options(num_returns=len(targets)).remote(
                str(p), targets, self.num_shards
            )
            if len(targets) == 1:
                refs = [refs]
            for s, r in zip(targets, refs):
                barriers.append(self.shards[s].insert.remote(r))
        ray.get(barriers)

    def _route(self, keys: pa.Array | list[str]) -> np.ndarray:
        return (hash64(keys) % np.uint64(self.num_shards)).astype(np.int64)

    def probe_and_insert(
        self, keys: pa.Array | pa.ChunkedArray, epoch: "int | None" = None
    ) -> np.ndarray:
        """Probe+insert a key column across all shards in parallel; returns
        the new-mask aligned with the input order.

        With ``epoch`` (the wave number), every shard call carries a
        content-derived probe id, which makes the whole call replayable:
        if a shard actor died, the call is retried after ``recover()`` —
        surviving shards answer the replay from their memos (no double
        insert), rebuilt shards answer fresh from committed state, and the
        merged mask is bit-identical to a failure-free run. Without
        ``epoch`` an actor death propagates (wave-level resume)."""
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        import hashlib

        h = hash64(keys)
        shard_of = (h % np.uint64(self.num_shards)).astype(np.int64)
        out = np.zeros(n, dtype=bool)
        for attempt in range(3):
            futures, positions = [], []
            for s in range(self.num_shards):
                pos = np.nonzero(shard_of == s)[0]
                if len(pos):
                    pid = None
                    if epoch is not None:
                        digest = hashlib.blake2b(
                            h[pos].tobytes(), digest_size=16
                        ).hexdigest()
                        pid = (epoch, digest)
                    # vectorized gather; the Arrow slice ships without a
                    # driver-side Python-string materialization
                    futures.append(
                        self.shards[s].probe_and_insert.remote(
                            keys.take(pa.array(pos)), pid
                        )
                    )
                    positions.append(pos)
            try:
                masks = ray.get(futures)
            except ray.exceptions.RayError:
                dead = self.find_dead()
                if epoch is None or not dead or attempt == 2:
                    raise
                self.recover(dead)
                continue
            for pos, mask in zip(positions, masks):
                out[pos] = mask
            return out
        raise RuntimeError("unreachable")

    def restore(self, keys: pa.Array | pa.ChunkedArray) -> None:
        """Bulk-load archive keys (resume-from-checkpoint path)."""
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(keys) == 0:
            return
        shard_of = self._route(keys)
        ray.get(
            [
                self.shards[s].insert.remote(
                    keys.take(pa.array(np.nonzero(shard_of == s)[0]))
                )
                for s in range(self.num_shards)
            ]
        )

    def make_prober(self, epoch: int | None = None, key_col: str | None = None):
        """A map_batches-ready probe stage for large waves: each task routes
        its batch's keys to the shard actors and keeps only new findings.
        The actor pool is the shared state; tasks are stateless and elastic,
        so the probe parallelizes with the number of blocks while every
        shard serializes its own partition of the key space.

        Pass ``epoch`` (the wave number) to make the stage safe under Ray
        task retry / lineage re-execution: every shard call carries a
        content-derived probe id (epoch + key-slice hash) that the shard
        memoizes, so a re-executed task gets its original mask instead of
        all-False. Ids are only unique if the wave's keys are globally
        deduplicated upstream — the crawl's streaming path does that with a
        bucketed key-dedup exchange first. Call ``end_epoch()`` after
        consuming the output to drop the memos.

        ``key_col``: use a precomputed key column instead of re-encoding."""
        import hashlib

        shards, n = self.shards, self.num_shards

        def probe(batch: pa.Table) -> pa.Table:
            from ..keys import finding_keys

            if batch.num_rows == 0:
                return batch
            if key_col is not None:
                keys = batch[key_col].combine_chunks()
            else:
                keys = finding_keys(batch["url"], batch["kind"], batch["depth"])
            # keys stay Arrow end-to-end: route on the vectorized 64-bit
            # hash, ship zero-copy Arrow slices to the shards, and derive
            # the retry-idempotency digest from the hash array's raw bytes
            # (content-derived, C-speed) — no per-key Python in this task.
            h = hash64(keys)
            shard_of = (h % np.uint64(n)).astype(np.int64)
            mask = np.zeros(batch.num_rows, dtype=bool)
            futures, positions = [], []
            for s in range(n):
                pos = np.nonzero(shard_of == s)[0]
                if len(pos):
                    pid = None
                    if epoch is not None:
                        digest = hashlib.blake2b(
                            h[pos].tobytes(), digest_size=16
                        ).hexdigest()
                        pid = (epoch, digest)
                    futures.append(
                        shards[s].probe_and_insert.remote(
                            keys.take(pa.array(pos)), pid
                        )
                    )
                    positions.append(pos)
            for pos, m in zip(positions, ray.get(futures)):
                mask[pos] = m
            return batch.filter(pa.array(mask))

        return probe

    def end_epoch(self, next_epoch: "int | None" = None) -> None:
        """Drop the shards' idempotency memos (wave is committed).
        Fire-and-forget: the memos are epoch-keyed (a missed clear
        self-expires on the next epoch's first probe) and blocking here
        put one full shard round-trip on every wave's critical path for
        no correctness gain. Pass ``next_epoch`` when probes may come
        from WORKER tasks (make_prober): the clear is then scoped to
        epochs < next_epoch, so even a clear that lands AFTER one of the
        next epoch's worker probes cannot wipe that probe's retry memo
        (driver-submitted probes don't need this — per-caller actor
        ordering already serializes them behind the clear)."""
        for s in self.shards:
            s.clear_applied.remote(next_epoch)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
