"""Seen-set shards, bloom/cuckoo filters, politeness dual implementations."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray.keys import finding_keys, hash64, hash_pair
from crawler_ray.state.filters import BloomFilter, CuckooFilter


def test_hash64_stable_and_distinct():
    a = hash64(["x", "y", "x"])
    b = hash64(["x", "y", "x"])
    assert (a == b).all()
    assert a[0] == a[2] != a[1]


def test_finding_keys_image_depth_pinned():
    keys = finding_keys(
        ["http://a/p", "http://a/p"], ["page", "image"], [3, 3]
    ).to_pylist()
    assert keys[0].endswith("\x1fpage\x1f3")
    assert keys[1].endswith("\x1fimage\x1f0")


@pytest.mark.parametrize("cls", [BloomFilter, CuckooFilter])
def test_filter_no_false_negatives(cls):
    f = cls(10_000)
    keys = [f"key-{i}" for i in range(5_000)]
    h1, h2 = hash_pair(keys)
    f.add(h1, h2)
    assert f.contains(h1, h2).all()  # no false negatives, ever


@pytest.mark.parametrize("cls", [BloomFilter, CuckooFilter])
def test_filter_fpp_reasonable(cls):
    f = cls(10_000)
    keys = [f"key-{i}" for i in range(10_000)]
    h1, h2 = hash_pair(keys)
    f.add(h1, h2)
    other = [f"other-{i}" for i in range(10_000)]
    o1, o2 = hash_pair(other)
    fp_rate = f.contains(o1, o2).mean()
    assert fp_rate < 0.03


@pytest.mark.usefixtures("ray_session")
def test_seen_set_probe_semantics():
    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=4, capacity_per_shard=10_000)
    try:
        keys = pa.array([f"k{i}" for i in range(100)] + ["k5", "k6"])
        mask = seen.probe_and_insert(keys)
        # first occurrences new, intra-call duplicates not
        assert mask[:100].all()
        assert not mask[100] and not mask[101]
        # second call: nothing new
        assert not seen.probe_and_insert(pa.array(["k0", "k99", "k5"])).any()
        # fresh keys still new
        assert seen.probe_and_insert(pa.array(["fresh"])).all()
        stats = seen.stats()
        assert sum(s["n_exact"] for s in stats) == 101
    finally:
        seen.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_seen_set_restore():
    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=1_000)
    try:
        seen.restore(pa.array(["a", "b", "c"]))
        mask = seen.probe_and_insert(pa.array(["a", "d"]))
        assert list(mask) == [False, True]
    finally:
        seen.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_seen_set_approx_only_mode():
    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=100_000, approx_only=True)
    try:
        keys = pa.array([f"u{i}" for i in range(1_000)])
        assert seen.probe_and_insert(keys).all()
        assert not seen.probe_and_insert(keys).any()
        assert seen.stats()[0]["n_exact"] is None
    finally:
        seen.shutdown()


def _frontier(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "depth": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


def test_admit_local_off_by_one_and_hostless():
    from crawler_ray.stages.politeness import admit_local, with_host

    rows = [(f"http://h.test/p{i:04d}", "page", 0) for i in range(300)]
    rows.append(("mailto:x@y", "page", 0))
    counts = Counter()
    admitted, metrics = admit_local(with_host(_frontier(rows)), counts)
    assert admitted.num_rows == 257
    assert counts["h.test"] == 257
    assert metrics["dropped_budget"] == 43
    assert metrics["dropped_hostless"] == 1
    # canonical order: lexicographic urls
    urls = admitted["url"].to_pylist()
    assert urls == sorted(urls)


def test_admit_local_carries_counts_across_waves():
    from crawler_ray.stages.politeness import admit_local, with_host

    counts = Counter({"h.test": 250})
    rows = [(f"http://h.test/q{i}", "page", 0) for i in range(20)]
    admitted, metrics = admit_local(with_host(_frontier(rows)), counts)
    assert admitted.num_rows == 7  # 257 - 250
    assert counts["h.test"] == 257


@pytest.mark.usefixtures("ray_session")
def test_admit_ray_equivalent_to_local():
    import ray.data as rd

    from crawler_ray.stages.politeness import admit_local, admit_ray, with_host

    rng = np.random.default_rng(7)
    rows = [
        (f"http://h{rng.integers(5)}.test/p{i}", "page" if i % 3 else "image", 0)
        for i in range(2_000)
    ]
    rows += [("mailto:x@y", "page", 0)] * 3
    f = with_host(_frontier(rows))

    counts_a = Counter({"h0.test": 200})
    local, m_local = admit_local(f, counts_a, limit=256)

    counts_b = Counter({"h0.test": 200})
    ray_adm, m_ray = admit_ray(rd.from_arrow(f), counts_b, limit=256)

    assert local.select(["url", "kind", "depth"]).equals(
        ray_adm.select(["url", "kind", "depth"]).cast(
            local.select(["url", "kind", "depth"]).schema
        )
    )
    assert counts_a == counts_b
    assert m_local == m_ray


@pytest.mark.usefixtures("ray_session")
def test_admit_carried_equivalent_to_local(tmp_path):
    """The distributed host-counts carry (per-bucket object-store shards,
    politeness.CarriedCounts) must admit exactly what admit_local admits,
    update the carried counts identically across TWO waves (carry), and
    write a complete per-bucket snapshot restorable without a driver
    gather."""
    from crawler_ray.stages.politeness import (
        CarriedCounts,
        admit_carried,
        admit_local,
        with_host,
    )

    rng = np.random.default_rng(11)
    waves = []
    for w in range(2):
        rows = [
            (
                f"http://h{rng.integers(6)}.test/w{w}p{i}",
                "page" if i % 3 else "image",
                0,
            )
            for i in range(1_500)
        ]
        rows += [("mailto:x@y", "page", 0)] * 2
        waves.append(with_host(_frontier(rows)))

    counts_a = Counter({"h0.test": 200, "h1.test": 256})
    carried = CarriedCounts.from_counter(
        Counter({"h0.test": 200, "h1.test": 256}), n_buckets=8
    )
    for w, f in enumerate(waves):
        local, m_local = admit_local(f, counts_a, limit=256)
        snap = tmp_path / f"wave{w}"
        dist, m_dist, barriers = admit_carried(
            f, carried, limit=256, snapshot_dir=str(snap)
        )
        import ray

        ray.get(barriers)
        assert local.select(["url", "kind", "depth"]).equals(
            dist.select(["url", "kind", "depth"]).cast(
                local.select(["url", "kind", "depth"]).schema
            )
        ), f"wave {w}"
        assert m_local == m_dist, f"wave {w}"
        assert carried.to_counter() == counts_a, f"wave {w}"
        # snapshot restores to the same state, shard-for-shard
        restored = CarriedCounts.restore(str(snap), n_buckets=8)
        assert restored.to_counter() == counts_a, f"wave {w}"


@pytest.mark.usefixtures("ray_session")
def test_probe_idempotent_under_retry():
    """A retried probe presenting the same probe_id must get its ORIGINAL
    mask back (not all-False), and the memo must clear on end_epoch."""
    import ray

    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=1)
    try:
        shard = seen.shards[0]
        keys = [f"k{i}" for i in range(10)]
        first = ray.get(shard.probe_and_insert.remote(keys, ("w0", "batchA")))
        assert first.all()
        # simulated Ray retry: same content, same probe id
        retry = ray.get(shard.probe_and_insert.remote(keys, ("w0", "batchA")))
        assert (retry == first).all()
        # a genuinely new probe of the same keys IS all-seen
        other = ray.get(shard.probe_and_insert.remote(keys, ("w0", "batchB")))
        assert not other.any()
        seen.end_epoch()
        # memo gone: replaying the old id now sees the keys as seen
        replay = ray.get(shard.probe_and_insert.remote(keys, ("w0", "batchA")))
        assert not replay.any()
    finally:
        seen.shutdown()


def test_admit_carried_hot_host_first_order_matches_local(tmp_path):
    """Cross-host hot_host_first ORDER equivalence through the carried
    path, on the skew shape that exposed the round-4 regression: host A
    has many pending rows but a nearly-exhausted prior (admits 1), host B
    has fewer pending and admits all — the dispatch order must follow the
    WAVE-WIDE pending counts (A first), not the admitted-subset counts."""
    from crawler_ray.stages.politeness import (
        CarriedCounts,
        admit_carried,
        admit_local,
        with_host,
    )

    rows = [(f"http://a.test/p{i}", "page", 0) for i in range(300)]
    rows += [(f"http://b.test/p{i}", "page", 0) for i in range(100)]
    f = with_host(_frontier(rows))

    counts = Counter({"a.test": 256})
    local, m_local = admit_local(
        f, counts, limit=256, priority="hot_host_first"
    )
    assert local["host"].to_pylist()[0] == "a.test"  # wave-wide 300 > 100

    carried = CarriedCounts.from_counter(Counter({"a.test": 256}), n_buckets=8)
    dist, m_dist, _ = admit_carried(
        f, carried, limit=256, priority="hot_host_first"
    )
    assert m_local == m_dist
    assert local.select(["url", "kind", "depth", "host"]).equals(
        dist.select(["url", "kind", "depth", "host"]).cast(
            local.select(["url", "kind", "depth", "host"]).schema
        )
    )


def test_carried_restore_rejects_bucket_count_mismatch(tmp_path):
    """Restoring a counts snapshot with a different counts_buckets would
    mis-shard prior counts (hosts route by hash %% n): both directions of
    the mismatch must be a hard error, same count must round-trip."""
    import pytest as _pytest

    from crawler_ray.stages.politeness import (
        CarriedCounts,
        admit_carried,
        with_host,
    )

    rows = [(f"http://h{i % 5}.test/p{i}", "page", 0) for i in range(50)]
    carried = CarriedCounts.from_counter(Counter(), n_buckets=8)
    snap = tmp_path / "snap"
    admit_carried(
        with_host(_frontier(rows)), carried, limit=256, snapshot_dir=str(snap)
    )
    ok = CarriedCounts.restore(str(snap), n_buckets=8)
    assert ok.n_buckets == 8
    with _pytest.raises(ValueError):
        CarriedCounts.restore(str(snap), n_buckets=4)
    with _pytest.raises(ValueError):
        CarriedCounts.restore(str(snap), n_buckets=16)


@pytest.mark.usefixtures("ray_session")
def test_epoch_scoped_clear_spares_newer_worker_memos():
    """A stale fire-and-forget clear (scoped to epochs < K+1) landing
    AFTER one of epoch K+1's probes must NOT wipe that probe's retry memo
    — the race a worker-submitted probe (make_prober) can actually hit."""
    import ray

    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=1)
    try:
        shard = seen.shards[0]
        ray.get(shard.probe_and_insert.remote(["a", "b"], (0, "w0batch")))
        # epoch-1 worker probe arrives BEFORE the end-of-epoch-0 clear
        first = ray.get(shard.probe_and_insert.remote(["c", "d"], (1, "w1batch")))
        assert first.all()
        seen.end_epoch(next_epoch=1)  # stale clear lands late
        # retry of the epoch-1 probe still replays its memoized mask
        retry = ray.get(shard.probe_and_insert.remote(["c", "d"], (1, "w1batch")))
        assert (retry == first).all() and retry.all()
        # while the epoch-0 memo IS gone
        replay = ray.get(shard.probe_and_insert.remote(["a", "b"], (0, "w0batch")))
        assert not replay.any()
    finally:
        seen.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_seen_set_shard_recovery_replays_exact():
    """Kill a shard after an epoch's probes, rebuild it from checkpoint
    parts, and replay the SAME epoch call: survivors must answer from
    their memos (no double insert), the rebuilt shard from the restored
    committed state — the merged mask equals the failure-free one."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=10_000)
    try:
        committed = pa.table(
            {
                "url": pa.array([f"http://h.test/{i}" for i in range(50)]),
                "kind": pa.array(["page"] * 50),
                "depth": pa.array(np.zeros(50, dtype=np.int32)),
            }
        )
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as d:
            part = Path(d) / "delta.parquet"
            pq.write_table(committed, part)
            seen.set_recovery_source(lambda: [part])
            from crawler_ray.keys import finding_keys

            ck = finding_keys(
                committed["url"], committed["kind"], committed["depth"]
            )
            seen.restore_from_parts([part])
            # epoch 1: a mix of committed (False) and fresh (True) keys
            wave = pa.array(
                [f"http://h.test/{i}\x1fpage\x1f0" for i in range(40, 60)]
            )
            want = np.array([i >= 50 for i in range(40, 60)])
            got = seen.probe_and_insert(wave, epoch=1)
            assert (got == want).all()
            # chaos: kill shard 0, then replay the SAME epoch-1 call — the
            # internal retry path rebuilds and the mask must come out equal
            ray.kill(seen.shards[0], no_restart=True)
            replay = seen.probe_and_insert(wave, epoch=1)
            assert (replay == want).all()
            assert seen.recoveries == 1
            # the rebuilt pool has full state: nothing re-admits
            assert not seen.probe_and_insert(wave, epoch=2).any()
            assert not seen.probe_and_insert(ck, epoch=3).any()
    finally:
        seen.shutdown()
