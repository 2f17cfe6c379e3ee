"""Engine-vs-oracle equivalence: the Ray wave driver must reproduce the
determinized reference semantics exactly (crawl order, URL-seen set, host
counts, byte-identical texts, image overwrite winners, metrics)."""

import pyarrow.parquet as pq
import pytest

from crawler_ray import fixtures, oracle, urlnorm as un
from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl


def assert_run_matches_oracle(run, res, corpus_tbl):
    # crawl order: (wave, rank, url, kind, depth) exact
    got = run.order()
    got_order = list(
        zip(
            got["wave"].to_pylist(),
            got["rank"].to_pylist(),
            got["url"].to_pylist(),
            got["kind"].to_pylist(),
            got["depth"].to_pylist(),
        )
    )
    assert got_order == res.order

    # URL-seen set (Finding-keyed)
    arch = run.archive()
    got_archive = set(
        zip(
            arch["url"].to_pylist(),
            arch["kind"].to_pylist(),
            arch["depth"].to_pylist(),
        )
    )
    assert got_archive == res.archive

    assert run.host_counts() == res.host_counts
    assert run.image_files() == res.image_files
    assert run.metrics() == {k: v for k, v in res.metrics.items() if v}

    # byte-identical extracted text per url (input_hint invariant)
    got_texts = run.texts()
    assert got_texts == res.texts
    expected = dict(
        zip(corpus_tbl["url"].to_pylist(), corpus_tbl["text"].to_pylist())
    )
    for u, t in got_texts.items():
        assert expected[str(un.parse(u).without_fragment())] == t


@pytest.mark.usefixtures("ray_session")
def test_t1_crawl_matches_oracle(t1_corpus, tmp_path):
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds)
    run = run_crawl(path, seeds, str(tmp_path / "run"), CrawlConfig(num_seen_shards=4))
    assert run.n_waves() == res.n_waves
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_t1_nonfaithful_depth(t1_corpus, tmp_path):
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds, depth_limit=2, faithful_depth=False)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "runNF"),
        CrawlConfig(num_seen_shards=4, depth_limit=2, faithful_depth=False),
    )
    assert run.n_waves() == res.n_waves
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_t1_budget_overflow_matches_oracle(t1_corpus, tmp_path):
    # lowered host limit makes the politeness budget bind at t1 scale
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds, host_limit=20)
    assert res.metrics["dropped_budget"] > 0  # the scenario must bind
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "runB"),
        CrawlConfig(num_seen_shards=4, host_limit=20),
    )
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_distributed_state_paths_match_oracle(t1_corpus, tmp_path):
    # threshold 0 forces the Ray-task bucketed politeness exchange on
    # every wave (the large-frontier path)
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "runD"),
        CrawlConfig(num_seen_shards=4, ray_state_threshold=0, max_waves=3),
    )
    res3 = oracle.simulate(corpus, seeds)  # full run; compare first 3 waves
    got = run.order()
    want = [o for o in res3.order if o[0] < 3]
    got_order = list(
        zip(
            got["wave"].to_pylist(),
            got["rank"].to_pylist(),
            got["url"].to_pylist(),
            got["kind"].to_pylist(),
            got["depth"].to_pylist(),
        )
    )
    assert got_order == want


@pytest.mark.usefixtures("ray_session")
def test_resume_reproduces_bit_identical(t1_corpus, tmp_path):
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    cfg = CrawlConfig(num_seen_shards=4)

    full = run_crawl(path, seeds, str(tmp_path / "full"), cfg)
    # kill after wave 2, then resume from checkpoint
    partial = run_crawl(
        path,
        seeds,
        str(tmp_path / "part"),
        CrawlConfig(num_seen_shards=4, max_waves=3),
    )
    assert partial.n_waves() == 3 < full.n_waves()
    resumed = run_crawl(path, seeds, str(tmp_path / "part"), cfg, resume=True)

    assert resumed.n_waves() == full.n_waves()
    assert resumed.order().equals(full.order())
    assert resumed.archive().equals(full.archive())
    assert resumed.host_counts() == full.host_counts()
    assert resumed.texts() == full.texts()
    assert resumed.image_files() == full.image_files()
    assert resumed.metrics() == full.metrics()


@pytest.mark.usefixtures("ray_session")
def test_export_images_overwrite_semantics(t1_corpus, tmp_path):
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds)
    run = run_crawl(path, seeds, str(tmp_path / "imgrun"), CrawlConfig(num_seen_shards=2))
    n = run.export_images(str(tmp_path / "prey_res"))
    assert n == len(res.image_writes)
    files = {p.name for p in (tmp_path / "prey_res").iterdir()}
    assert files == set(res.image_files)
    # overwrite winner: file bytes match the canonically-last written url
    for fname, url in res.image_files.items():
        import crawler_ray.urlnorm as un2

        want = corpus[str(un2.parse(url).without_fragment())]
        assert (tmp_path / "prey_res" / fname).read_bytes() == want


def test_presalt_prune_preserves_admission():
    from collections import Counter as C

    from crawler_ray.stages.politeness import admit_local, presalt_prune, with_host

    rows = [(f"http://hot.test/p{i:05d}", "page", 0) for i in range(2000)]
    rows += [(f"http://cold.test/q{i}", "page", 0) for i in range(5)]
    f = with_host(_frontier_tbl(rows))
    pruned = presalt_prune(f, limit=256)
    # hot host bounded to limit+1 rows; cold host untouched
    hosts = pruned["host"].to_pylist()
    assert hosts.count("hot.test") == 257
    assert hosts.count("cold.test") == 5
    # admission over pruned == admission over full
    ca, cb = C({"hot.test": 250}), C({"hot.test": 250})
    a_full, _ = admit_local(f, ca)
    a_pruned, _ = admit_local(pruned, cb)
    assert a_full.equals(a_pruned)
    assert ca == cb


def _frontier_tbl(rows):
    import pyarrow as pa

    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "depth": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_t2_scale_matches_oracle(tmp_path):
    """t2 correctness scale (50×100): the politeness budget genuinely binds
    (hub host capped at exactly 257), image filename collisions overwrite,
    and every output still matches the oracle exactly."""
    import pyarrow.parquet as pq2

    tbl = fixtures.gen_corpus(50, 100)
    path = tmp_path / "t2.parquet"
    pq2.write_table(tbl, path)
    seeds = fixtures.default_seeds(50)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds)
    assert res.host_counts["hub.test"] == 257  # the off-by-one cap binds
    assert res.metrics["dropped_budget"] > 0
    run = run_crawl(str(path), seeds, str(tmp_path / "t2run"), CrawlConfig())
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_approx_seen_mode_is_subset_and_terminates(t1_corpus, tmp_path):
    """Design-scale mode: bloom-only shards may drop genuinely-new URLs on
    false positives but never crawl a URL twice; the archive is a subset of
    the exact run's and the crawl still terminates."""
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    exact = run_crawl(path, seeds, str(tmp_path / "ex"), CrawlConfig(num_seen_shards=2))
    approx = run_crawl(
        path,
        seeds,
        str(tmp_path / "ap"),
        CrawlConfig(num_seen_shards=2, approx_seen=True, seen_fpp=0.01),
    )
    def keyset(run):
        a = run.archive()
        return set(zip(a["url"].to_pylist(), a["kind"].to_pylist(), a["depth"].to_pylist()))
    ks_exact, ks_approx = keyset(exact), keyset(approx)
    assert ks_approx <= ks_exact
    # at t1 scale with 1% fpp the loss should be zero or tiny
    assert len(ks_approx) >= 0.95 * len(ks_exact)
    # no duplicate dispatches of the same key except seeds
    o = approx.order()
    keys = list(zip(o["url"].to_pylist(), o["kind"].to_pylist(), o["depth"].to_pylist()))
    from collections import Counter as C

    dupes = {k for k, c in C(keys).items() if c > 1}
    seed_keys = {(s, "page", 0) for s in tbl["url"].to_pylist()}
    assert all(k[0] in {u for u, _, _ in seed_keys} or k in seed_keys for k in dupes) or all(
        k[1] == "page" and k[2] == 0 for k in dupes
    )


@pytest.mark.usefixtures("ray_session")
def test_resume_discards_wave_without_complete_marker(t1_corpus, tmp_path):
    """A crash mid-wave leaves a wave dir without _COMPLETE; resume must
    ignore and redo it, still reproducing the uninterrupted run exactly."""
    import shutil

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    cfg = CrawlConfig(num_seen_shards=2)
    full = run_crawl(path, seeds, str(tmp_path / "fullX"), cfg)

    partial = run_crawl(
        path, seeds, str(tmp_path / "crash"), CrawlConfig(num_seen_shards=2, max_waves=3)
    )
    # fake a crash during wave 3: copy wave 2's dir and strip the marker
    crash_dir = tmp_path / "crash" / "wave=00003"
    shutil.copytree(tmp_path / "crash" / "wave=00002", crash_dir)
    (crash_dir / "_COMPLETE").unlink()

    resumed = run_crawl(path, seeds, str(tmp_path / "crash"), cfg, resume=True)
    assert resumed.order().equals(full.order())
    assert resumed.archive().equals(full.archive())
    assert resumed.texts() == full.texts()
    assert resumed.metrics() == full.metrics()


@pytest.mark.usefixtures("ray_session")
def test_lineage_written_per_wave(t1_corpus, tmp_path):
    import json

    path, _ = t1_corpus
    run = run_crawl(
        path,
        fixtures.default_seeds(5),
        str(tmp_path / "lin"),
        CrawlConfig(num_seen_shards=2, max_waves=2),
    )
    for d in run.wave_dirs():
        lin = json.loads((d / "lineage.json").read_text())
        assert lin["admitted"] <= lin["frontier_rows"]
        assert "config" in lin and "metrics" in lin


@pytest.mark.usefixtures("ray_session")
def test_streaming_probe_bit_identical_to_driver_path(t1_corpus, tmp_path):
    """ray_state_threshold=0 routes the seen probe through the streaming
    Dataset path (bucketed key-dedup + idempotent shard probe); the whole
    run must be bit-identical to the driver-coordinated path."""
    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    a = run_crawl(
        path, seeds, str(tmp_path / "drv"), CrawlConfig(num_seen_shards=4)
    )
    b = run_crawl(
        path,
        seeds,
        str(tmp_path / "stream"),
        CrawlConfig(num_seen_shards=4, ray_state_threshold=0),
    )
    assert b.n_waves() == a.n_waves()
    assert b.order().equals(a.order())
    assert b.archive().equals(a.archive())
    assert b.host_counts() == a.host_counts()
    assert b.texts() == a.texts()
    assert b.image_files() == a.image_files()
    assert b.metrics() == a.metrics()


@pytest.mark.usefixtures("ray_session")
def test_cuckoo_approx_seen_end_to_end(tmp_path):
    """Design-scale seen-set mode, end to end at t2 scale (50×100 corpus):
    approx_seen=True with the CUCKOO backend must terminate, never
    dispatch a Finding key twice, lose at most fpp-bounded archive rows vs
    the exact run, and report per-shard filter memory (no exact set held)
    via the run's seen_stats.json."""
    import json as _json

    import pyarrow.parquet as pq2

    tbl = fixtures.gen_corpus(50, 100)
    path = tmp_path / "t2corpus.parquet"
    pq2.write_table(tbl, path)
    seeds = fixtures.default_seeds(50)

    exact = run_crawl(
        str(path), seeds, str(tmp_path / "ex"), CrawlConfig(num_seen_shards=4)
    )
    approx = run_crawl(
        str(path),
        seeds,
        str(tmp_path / "ap"),
        CrawlConfig(
            num_seen_shards=4,
            approx_seen=True,
            seen_filter="cuckoo",
            seen_capacity_per_shard=100_000,
        ),
    )

    def keyset(run):
        a = run.archive()
        return set(
            zip(a["url"].to_pylist(), a["kind"].to_pylist(), a["depth"].to_pylist())
        )

    ks_exact, ks_approx = keyset(exact), keyset(approx)
    assert ks_approx <= ks_exact  # a false positive only DROPS, never adds
    # archive delta bounded by the filter's false-positive budget: the
    # 16-bit-fingerprint cuckoo's fp rate is ~1e-4 per probe, so allow a
    # generous 1% of the exact archive and require an explicit count
    missing = len(ks_exact) - len(ks_approx)
    assert missing <= max(5, 0.01 * len(ks_exact)), missing

    # no Finding key dispatches twice — except seeds, which the reference
    # never archives (main.rs:87-92: seeds enqueue directly; only response
    # findings enter the archive), so a seed rediscovered as a link may
    # legitimately dispatch a second time
    o = approx.order()
    keys = list(
        zip(o["url"].to_pylist(), o["kind"].to_pylist(), o["depth"].to_pylist())
    )
    from collections import Counter as C

    seed_keys = {(s, "page", 0) for s in seeds}
    dupes = {k for k, c in C(keys).items() if c > 1}
    assert dupes <= seed_keys, dupes - seed_keys

    stats = _json.loads((tmp_path / "ap" / "seen_stats.json").read_text())
    assert len(stats) == 4
    for s in stats:
        assert s["n_exact"] is None  # design-scale mode: no exact set held
        assert s["bloom_bytes"] > 0  # per-shard filter memory reported
    ex_stats = _json.loads((tmp_path / "ex" / "seen_stats.json").read_text())
    assert all(s["n_exact"] is not None for s in ex_stats)


@pytest.mark.usefixtures("ray_session")
def test_distributed_counts_bit_identical_and_resumable(t1_corpus, tmp_path):
    """distributed_counts=True (host counts carried as per-bucket
    object-store shards, snapshots written per bucket from the admission
    tasks — no driver Counter anywhere) must reproduce the default run
    bit-for-bit, and a resume that restores the per-bucket snapshot
    straight into the object store must match an uninterrupted run."""
    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    a = run_crawl(
        path, seeds, str(tmp_path / "drv"), CrawlConfig(num_seen_shards=2)
    )
    cfg = CrawlConfig(
        num_seen_shards=2, distributed_counts=True, counts_buckets=8
    )
    b = run_crawl(path, seeds, str(tmp_path / "dist"), cfg)
    assert b.n_waves() == a.n_waves()
    assert b.order().equals(a.order())
    assert b.archive().equals(a.archive())
    assert b.host_counts() == a.host_counts()
    assert b.texts() == a.texts()
    assert b.metrics() == a.metrics()
    # snapshot layout: a DIRECTORY of per-bucket files on every wave
    for d in b.wave_dirs():
        snap = d / "host_counts.parquet"
        assert snap.is_dir() and list(snap.glob("bucket_*.parquet")), d

    run_crawl(
        path,
        seeds,
        str(tmp_path / "dcrash"),
        CrawlConfig(
            num_seen_shards=2,
            distributed_counts=True,
            counts_buckets=8,
            max_waves=3,
        ),
    )
    resumed = run_crawl(path, seeds, str(tmp_path / "dcrash"), cfg, resume=True)
    assert resumed.order().equals(a.order())
    assert resumed.archive().equals(a.archive())
    assert resumed.host_counts() == a.host_counts()
    assert resumed.metrics() == a.metrics()


@pytest.mark.usefixtures("ray_session")
def test_streaming_probe_crash_resume(t1_corpus, tmp_path):
    """Crash-mid-wave resume must also reproduce the run through the
    streaming probe path."""
    import shutil

    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    cfg = CrawlConfig(num_seen_shards=2, ray_state_threshold=0)
    full = run_crawl(path, seeds, str(tmp_path / "sfull"), cfg)

    run_crawl(
        path,
        seeds,
        str(tmp_path / "scrash"),
        CrawlConfig(num_seen_shards=2, ray_state_threshold=0, max_waves=3),
    )
    crash_dir = tmp_path / "scrash" / "wave=00003"
    shutil.copytree(tmp_path / "scrash" / "wave=00002", crash_dir)
    (crash_dir / "_COMPLETE").unlink()

    resumed = run_crawl(path, seeds, str(tmp_path / "scrash"), cfg, resume=True)
    assert resumed.order().equals(full.order())
    assert resumed.archive().equals(full.archive())
    assert resumed.texts() == full.texts()
    assert resumed.metrics() == full.metrics()


@pytest.mark.usefixtures("ray_session")
def test_fetcher_seam_bit_identical(t1_corpus, tmp_path):
    """The pluggable fetch stage (stages/fetch.py) run through DictFetcher
    must reproduce the corpus-scan crawl exactly — proving a real HTTP
    fetcher can be dropped in without touching parse or state."""
    import ray

    from crawler_ray.stages.fetch import DictFetcher

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    cfg = CrawlConfig(num_seen_shards=2)
    scan = run_crawl(path, seeds, str(tmp_path / "scan"), cfg)

    corpus_ref = ray.put(
        dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    )
    fetched = run_crawl(
        path,
        seeds,
        str(tmp_path / "fetched"),
        cfg,
        fetcher_cls=DictFetcher,
        fetcher_kwargs={"corpus_ref": corpus_ref},
    )
    assert fetched.n_waves() == scan.n_waves()
    assert fetched.order().equals(scan.order())
    assert fetched.archive().equals(scan.archive())
    assert fetched.texts() == scan.texts()
    assert fetched.image_files() == scan.image_files()
    assert fetched.metrics() == scan.metrics()


@pytest.mark.usefixtures("ray_session")
def test_fetch_service_bit_identical(t1_corpus, tmp_path):
    """The sharded corpus fetch service (one-pass async build, hash-routed
    per-wave fetches, per-shard parse+checkpoint tasks) must reproduce the
    corpus-scan crawl exactly — including resume from a checkpoint written
    by the OTHER path."""
    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    scan = run_crawl(
        path, seeds, str(tmp_path / "scan"), CrawlConfig(num_seen_shards=2)
    )
    svc = run_crawl(
        path,
        seeds,
        str(tmp_path / "svc"),
        CrawlConfig(
            num_seen_shards=2, use_fetch_service=True, fetch_service_shards=3
        ),
    )
    assert svc.n_waves() == scan.n_waves()
    assert svc.order().equals(scan.order())
    assert svc.archive().equals(scan.archive())
    assert svc.host_counts() == scan.host_counts()
    assert svc.texts() == scan.texts()
    assert svc.image_files() == scan.image_files()
    assert svc.metrics() == scan.metrics()

    # cross-path resume: truncate the scan-path run and resume it THROUGH
    # the service path — checkpoint layout differences must not matter
    run_crawl(
        path,
        seeds,
        str(tmp_path / "xres"),
        CrawlConfig(num_seen_shards=2, max_waves=2),
    )
    resumed = run_crawl(
        path,
        seeds,
        str(tmp_path / "xres"),
        CrawlConfig(
            num_seen_shards=2, use_fetch_service=True, fetch_service_shards=3
        ),
        resume=True,
    )
    assert resumed.order().equals(scan.order())
    assert resumed.archive().equals(scan.archive())
    assert resumed.texts() == scan.texts()
    assert resumed.metrics() == scan.metrics()


@pytest.mark.usefixtures("ray_session")
def test_fused_build_fetch_bit_identical(t1_corpus, tmp_path):
    """Restart-shaped crawls (fat wave 0) launch the fetch-service build
    FUSED with wave 0's own fetch: one corpus read partitions the shards
    AND serves the wave. scan_task_path_limit=0 makes every wave 'fat', so
    wave 0 exercises the fused branch and wave 1+ the sealed service; the
    whole run must reproduce the corpus-scan crawl exactly, including a
    resume whose wave 0 was written by the fused path."""
    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    scan = run_crawl(
        path, seeds, str(tmp_path / "scan"), CrawlConfig(num_seen_shards=2)
    )
    fused_cfg = CrawlConfig(
        num_seen_shards=2,
        use_fetch_service=True,
        fetch_service_shards=3,
        scan_task_path_limit=0,
    )
    fused = run_crawl(path, seeds, str(tmp_path / "fused"), fused_cfg)
    assert fused.n_waves() == scan.n_waves()
    assert fused.order().equals(scan.order())
    assert fused.archive().equals(scan.archive())
    assert fused.host_counts() == scan.host_counts()
    assert fused.texts() == scan.texts()
    assert fused.image_files() == scan.image_files()
    assert fused.metrics() == scan.metrics()

    # resume across the fused path: wave 0 checkpointed by the fused
    # branch, the resumed process re-fuses (or re-builds) as needed
    run_crawl(
        path,
        seeds,
        str(tmp_path / "fres"),
        CrawlConfig(
            num_seen_shards=2,
            use_fetch_service=True,
            fetch_service_shards=3,
            scan_task_path_limit=0,
            max_waves=2,
        ),
    )
    resumed = run_crawl(
        path, seeds, str(tmp_path / "fres"), fused_cfg, resume=True
    )
    assert resumed.order().equals(scan.order())
    assert resumed.archive().equals(scan.archive())
    assert resumed.texts() == scan.texts()
    assert resumed.metrics() == scan.metrics()


def test_http_fetcher_shape():
    """HttpFetcher constructs without network (client built in __init__)
    and reports a miss, not an exception, on unreachable URLs."""
    from crawler_ray.stages.fetch import HttpFetcher

    f = HttpFetcher(connect_timeout_s=0.1)
    assert f.fetch_one("http://127.0.0.1:1/none") is None


def test_http_fetcher_concurrent_batch():
    """The in-actor thread pool must overlap a batch's requests (the
    reference spawns one task per URL, main.rs:110-117): N slow fetches
    through one actor finish in ~one slow-fetch time, misses drop their
    row, and output preserves the batch's row order regardless of
    completion order (slowest URL first)."""
    import time

    import pyarrow as pa

    from crawler_ray.stages.fetch import HttpFetcher

    DELAY = 0.25

    class SlowFake(HttpFetcher):
        def fetch_one(self, url):  # noqa: D102 — test double
            time.sleep(DELAY)
            if url.endswith("/miss"):
                return None
            return f"body:{url}".encode()

    urls = [f"http://h{i}.example/p" for i in range(7)] + ["http://h7.example/miss"]
    batch = pa.table(
        {
            "fetch_url": pa.array(urls),
            "url": pa.array(urls),
            "kind": pa.array(["page"] * 8),
            "depth": pa.array([0] * 8, pa.int32()),
        }
    )
    f = SlowFake(max_concurrency=8)
    t0 = time.time()
    out = f(batch)
    wall = time.time() - t0
    assert wall < 4 * DELAY, wall  # serial would be 8 × DELAY
    assert out["url"].to_pylist() == urls[:7]  # miss dropped, order kept
    assert out["html"].to_pylist() == [f"body:{u}".encode() for u in urls[:7]]

    # and with a pool of 1 the same batch degrades to serial (sanity that
    # the speedup above came from the pool, not from the fake)
    f1 = SlowFake(max_concurrency=1)
    t0 = time.time()
    f1(batch)
    assert time.time() - t0 >= 8 * DELAY * 0.9


def test_build_lookup_table_matches_reference_semantics():
    """The vectorized lookup build (Arrow kernels) must agree with the
    per-row reference-semantics build_lookups on every canonical URL shape
    the admitted frontier can carry: fragments, non-http(s) schemes (the
    fetch-layer drop + metric), ipv6 hosts, ports, queries, dual
    page/image dispatches of the same fetch url."""
    import pyarrow as pa

    from crawler_ray import urlnorm as un
    from crawler_ray.stages.parse import build_lookup_table, build_lookups

    raw = [
        ("http://a.example/p1", "page", 0),
        ("http://a.example/p1#frag", "page", 1),      # same fetch_url
        ("http://a.example/p1", "image", 0),          # dual dispatch
        ("https://b.example:8443/x?q=1#f", "page", 2),
        ("xhttpy://weird.host/p", "page", 0),         # contains-http quirk:
        ("ws://sock.example/chat", "image", 0),       # admitted, unfetchable
        ("ftp://files.example/a.img", "image", 0),
        ("http://[2001:db8::1]:8080/v6#z", "page", 3),
        ("http://h.test/p?q=a://x#frag?y", "page", 0),
    ]
    canon = [(str(un.parse(u)), k, d) for u, k, d in raw]
    admitted = pa.table(
        {
            "url": pa.array([c[0] for c in canon]),
            "kind": pa.array([c[1] for c in canon]),
            "depth": pa.array([c[2] for c in canon], pa.int32()),
        }
    )
    want_dict, want_metrics = build_lookups(admitted)
    got_tbl, got_metrics = build_lookup_table(admitted)
    assert got_metrics == want_metrics
    got_dict: dict = {}
    for fu, u, k, d in zip(
        got_tbl["fetch_url"].to_pylist(),
        got_tbl["url"].to_pylist(),
        got_tbl["kind"].to_pylist(),
        got_tbl["depth"].to_pylist(),
    ):
        got_dict.setdefault(fu, []).append((u, k, d))
    assert {k: sorted(v) for k, v in got_dict.items()} == {
        k: sorted(v) for k, v in want_dict.items()
    }


def test_attach_frontier_join_matches_dict_probe():
    """Arrow-join probe == per-row dict probe (as row sets; the join output
    is canonically sorted, the dict probe is corpus-ordered)."""
    import pyarrow as pa

    from crawler_ray.stages.parse import (
        attach_frontier,
        attach_frontier_join,
        build_lookup_table,
        build_lookups,
    )

    admitted = pa.table(
        {
            "url": pa.array(
                [
                    "http://h.test/a",
                    "http://h.test/a#x",
                    "http://h.test/a",
                    "http://h.test/miss",
                ]
            ),
            "kind": pa.array(["page", "page", "image", "page"]),
            "depth": pa.array([0, 1, 0, 0], pa.int32()),
        }
    )
    corpus = pa.table(
        {
            "url": pa.array(
                ["http://h.test/a", "http://h.test/other", "http://h.test/b"]
            ),
            "html": pa.array([b"<p>A</p>", b"<p>O</p>", b"<p>B</p>"], pa.binary()),
        }
    )
    lookups_dict, _ = build_lookups(admitted)
    lookup_tbl, _ = build_lookup_table(admitted)
    want = attach_frontier(corpus, lookups_dict)
    got = attach_frontier_join(corpus, lookup_tbl)
    key = lambda t: sorted(
        zip(
            t["url"].to_pylist(),
            t["kind"].to_pylist(),
            t["depth"].to_pylist(),
            t["html"].to_pylist(),
        )
    )
    assert got.num_rows == want.num_rows == 3
    assert key(got) == key(want)


@pytest.mark.usefixtures("ray_session")
def test_shard_death_recovery_driver_path(t1_corpus, tmp_path):
    """Chaos: kill one seen-shard actor at the start of wave 2. The driver
    probe path must detect the dead shard, rebuild it from the committed
    archive checkpoints, replay the wave's probes (survivors answer from
    their epoch memos, the rebuilt shard answers fresh) and finish with
    output bit-identical to the oracle — an in-run recovery, no restart."""
    import json as _json

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "chaosD"),
        CrawlConfig(num_seen_shards=4, chaos_kill_shard=(2, 1)),
    )
    assert run.n_waves() == res.n_waves
    assert_run_matches_oracle(run, res, tbl)
    rec = _json.loads((tmp_path / "chaosD" / "recovery.json").read_text())
    assert rec["seen_shard_recoveries"] >= 1


@pytest.mark.usefixtures("ray_session")
def test_shard_death_recovery_streaming_path(t1_corpus, tmp_path):
    """Chaos through the streaming sink probe (ray_state_threshold=0):
    the failed wave's whole probe dataflow is resubmitted after the shard
    rebuild; finalize parts rewrite the same deterministic filenames, so
    the run stays bit-identical to an undisturbed streaming run."""
    import json as _json

    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    a = run_crawl(
        path,
        seeds,
        str(tmp_path / "plainS"),
        CrawlConfig(num_seen_shards=4, ray_state_threshold=0),
    )
    b = run_crawl(
        path,
        seeds,
        str(tmp_path / "chaosS"),
        CrawlConfig(
            num_seen_shards=4, ray_state_threshold=0, chaos_kill_shard=(2, 1)
        ),
    )
    assert b.n_waves() == a.n_waves()
    assert b.order().equals(a.order())
    assert b.archive().equals(a.archive())
    assert b.host_counts() == a.host_counts()
    assert b.texts() == a.texts()
    assert b.image_files() == a.image_files()
    assert b.metrics() == a.metrics()
    rec = _json.loads((tmp_path / "chaosS" / "recovery.json").read_text())
    assert rec["seen_shard_recoveries"] >= 1


@pytest.mark.usefixtures("ray_session")
def test_fetch_shard_death_recovery(t1_corpus, tmp_path):
    """Chaos: kill one corpus fetch-service shard mid-crawl. The routed
    fetch barrier must rebuild the dead shard's partition from the corpus
    files (its state is a pure function of them), re-issue the affected
    fetch+parse slices, and finish bit-identical to an undisturbed
    service-path run."""
    import json as _json

    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    plain = run_crawl(
        path,
        seeds,
        str(tmp_path / "svcP"),
        CrawlConfig(
            num_seen_shards=2, use_fetch_service=True, fetch_service_shards=3
        ),
    )
    # sync build: every wave takes the routed service path (a warm pytest
    # session otherwise finishes the whole crawl before the async seal, so
    # the dead shard would never be touched)
    chaos = run_crawl(
        path,
        seeds,
        str(tmp_path / "svcC"),
        CrawlConfig(
            num_seen_shards=2,
            use_fetch_service=True,
            fetch_service_shards=3,
            fetch_service_sync_build=True,
            chaos_kill_fetch_shard=(2, 1),
        ),
    )
    assert chaos.n_waves() == plain.n_waves()
    assert chaos.order().equals(plain.order())
    assert chaos.archive().equals(plain.archive())
    assert chaos.host_counts() == plain.host_counts()
    assert chaos.texts() == plain.texts()
    assert chaos.image_files() == plain.image_files()
    assert chaos.metrics() == plain.metrics()
    rec = _json.loads((tmp_path / "svcC" / "recovery.json").read_text())
    assert rec["fetch_shard_recoveries"] >= 1


def test_http_fetcher_robots_cache():
    """With respect_robots=True the fetcher holds a per-actor robots cache
    (north-star: robots caches in the stateful fetcher actors): robots.txt
    fetched ONCE per host across batches, disallowed paths emit no row,
    allowed paths fetch normally."""
    from collections import Counter as C

    import pyarrow as pa

    from crawler_ray.stages.fetch import HttpFetcher

    calls = C()

    class Fake(HttpFetcher):
        def fetch_one(self, url):  # noqa: D102 — test double
            calls[url] += 1
            if url == "http://a.example/robots.txt":
                return b"User-agent: *\nDisallow: /private\n"
            if url == "http://b.example/robots.txt":
                return None  # no robots file: everything allowed
            if url.endswith("/robots.txt"):
                return None
            return f"body:{url}".encode()

    def batch(urls):
        return pa.table(
            {
                "fetch_url": pa.array(urls),
                "url": pa.array(urls),
                "kind": pa.array(["page"] * len(urls)),
                "depth": pa.array([0] * len(urls), pa.int32()),
            }
        )

    f = Fake(respect_robots=True, max_concurrency=4)
    out = f(
        batch(
            [
                "http://a.example/ok",
                "http://a.example/private/x",
                "http://b.example/anything",
            ]
        )
    )
    assert out["url"].to_pylist() == [
        "http://a.example/ok",
        "http://b.example/anything",
    ]
    # second batch, same hosts: robots NOT re-fetched (per-actor cache)
    out2 = f(batch(["http://a.example/private/y", "http://a.example/ok2"]))
    assert out2["url"].to_pylist() == ["http://a.example/ok2"]
    assert calls["http://a.example/robots.txt"] == 1
    assert calls["http://b.example/robots.txt"] == 1
    # default mode is untouched: no robots fetch, disallowed paths fetch
    g = Fake(max_concurrency=2)
    out3 = g(batch(["http://a.example/private/x"]))
    assert out3["url"].to_pylist() == ["http://a.example/private/x"]


@pytest.mark.usefixtures("ray_session")
def test_compact_archive_preserves_outputs_and_resume(t1_corpus, tmp_path):
    """Archive compaction (crawl.compact_archive) folds the per-wave
    delta parts into a bounded compact set: (1) on a finished run,
    archive() is BIT-IDENTICAL across the compaction boundary and the
    restore source shrinks to the compact parts; (2) compacting an
    interrupted run mid-crawl and resuming reproduces the uninterrupted
    run exactly (the resume shard-restore reads the compact parts);
    (3) re-compaction folds a previous revision plus new deltas."""
    from crawler_ray.pipelines.crawl import _archive_part_paths, compact_archive

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    cfg = CrawlConfig(num_seen_shards=4)

    full = run_crawl(path, seeds, str(tmp_path / "full"), cfg)
    arch_before = full.archive()
    n_parts_before = len(_archive_part_paths(full))
    stats = compact_archive(str(full.out), group_size=4)
    assert stats["upto_wave"] == full.n_waves() - 1
    assert stats["rows"] == arch_before.num_rows
    assert full.archive().equals(arch_before)  # bit-identical read-back
    after = _archive_part_paths(full)
    assert len(after) == stats["parts_out"] <= n_parts_before
    assert all("archive_compact" in str(p) for p in after)
    assert full.texts() and full.metrics()  # other accessors untouched

    # interrupt -> compact -> resume == uninterrupted
    partial = run_crawl(
        path,
        seeds,
        str(tmp_path / "part"),
        CrawlConfig(num_seen_shards=4, max_waves=3),
    )
    assert partial.n_waves() == 3 < full.n_waves()
    compact_archive(str(partial.out), group_size=2)
    resumed = run_crawl(path, seeds, str(tmp_path / "part"), cfg, resume=True)
    assert resumed.n_waves() == full.n_waves()
    assert resumed.order().equals(full.order())
    assert resumed.archive().equals(arch_before)
    assert resumed.host_counts() == full.host_counts()
    assert resumed.texts() == full.texts()
    assert resumed.metrics() == full.metrics()

    # re-compaction: previous revision + the post-resume deltas fold again
    stats2 = compact_archive(str(partial.out), group_size=8)
    assert stats2["upto_wave"] == full.n_waves() - 1
    assert resumed.archive().equals(arch_before)
    assert all(
        "archive_compact" in str(p) for p in _archive_part_paths(resumed)
    )
