"""Priority-frontier admission modes and the robots.txt gate: engine must
match the oracle under every mode; robots parsing unit-tested directly."""

import pytest

from crawler_ray import fixtures, oracle
from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from crawler_ray.stages.robots import parse_robots
from tests.test_crawl_engine import assert_run_matches_oracle


def test_parse_robots_subset():
    body = b"""
# comment
User-agent: googlebot
Disallow: /only-google
User-agent: *
Disallow: /private/
Disallow: /tmp
Disallow:
User-agent: other
Disallow: /other
"""
    assert parse_robots(body) == ["/private/", "/tmp"]


def test_filter_frontier_matches_scalar_disallowed():
    """The vectorized frontier gate must equal the scalar ``disallowed``
    reference row-for-row (including hostless rows, query strings,
    multi-prefix hosts and hosts with no rules)."""
    import pyarrow as pa

    from crawler_ray.stages.robots import RobotsCache

    rc = RobotsCache(corpus_path=[])
    rc.rules = {
        "a.test": ["/private/", "/tmp"],
        "b.test": ["/x?y="],
        "c.test": [],
    }
    urls = [
        "http://a.test/private/page",
        "http://a.test/public",
        "http://a.test/tmpfile",  # startswith("/tmp") → blocked
        "http://b.test/x?y=1",
        "http://b.test/x?z=1",
        "http://c.test/anything",
        "http://a.test/ok#frag",  # fragment excluded from the match
        "mailto:nohost@example",  # hostless row: never blocked
    ]
    hosts = [
        "a.test", "a.test", "a.test", "b.test", "b.test", "c.test",
        "a.test", None,
    ]
    frontier = pa.table({"url": urls, "host": hosts})
    rc.ensure_hosts = lambda hs: None  # rules pinned above; no corpus probe
    kept, n_dropped = rc.filter_frontier(frontier)
    want_keep = [not rc.disallowed(u) for u in urls]
    assert kept["url"].to_pylist() == [u for u, k in zip(urls, want_keep) if k]
    assert n_dropped == want_keep.count(False)


@pytest.mark.parametrize("priority", ["shallow_first", "hot_host_first"])
@pytest.mark.usefixtures("ray_session")
def test_priority_modes_match_oracle(t1_corpus, tmp_path, priority):
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    # host_limit low enough that admission order changes outcomes
    res = oracle.simulate(corpus, seeds, host_limit=15, priority=priority)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / f"run_{priority}"),
        CrawlConfig(num_seen_shards=4, host_limit=15, priority=priority),
    )
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_robots_gate_matches_oracle(t1_corpus, tmp_path):
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds, respect_robots=True)
    assert res.metrics["dropped_robots"] > 0  # fixture rules must bind
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_robots"),
        CrawlConfig(num_seen_shards=4, respect_robots=True),
    )
    assert_run_matches_oracle(run, res, tbl)
    # robots-blocked hub pages consumed no budget
    base = oracle.simulate(corpus, seeds)
    assert run.host_counts()["hub.test"] < base.host_counts["hub.test"]


@pytest.mark.usefixtures("ray_session")
def test_hot_host_first_streaming_path_matches_oracle(t1_corpus, tmp_path):
    """hot_host_first through the STREAMING wave machinery
    (ray_state_threshold=0: FrontierRef + fused politeness prep riding the
    probe's sink tasks, pc.value_counts host aggregation, dictionary-encode
    host_wave_rows attach) must equal the oracle — and therefore the
    driver-path run test_priority_modes_match_oracle already pins."""
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(
        corpus, seeds, host_limit=15, priority="hot_host_first"
    )
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_hot_stream"),
        CrawlConfig(
            num_seen_shards=4,
            host_limit=15,
            priority="hot_host_first",
            ray_state_threshold=0,
        ),
    )
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_robots_gate_streaming_path_matches_oracle(t1_corpus, tmp_path):
    """robots + the streaming wave machinery (ray_state_threshold=0): the
    sink tasks SKIP the fused politeness prep (the driver re-reads the
    frontier for the robots gate — computing prep there would be thrown
    away), and the crawl still matches the oracle exactly."""
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    res = oracle.simulate(corpus, seeds, respect_robots=True)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_robots_stream"),
        CrawlConfig(
            num_seen_shards=4, respect_robots=True, ray_state_threshold=0
        ),
    )
    assert_run_matches_oracle(run, res, tbl)


def test_split_wave_cap_unit():
    """First ``cap`` rows per host in wave priority order stay; the rest
    defer; hostless rows are never deferred (admission drops them)."""
    import pyarrow as pa

    from crawler_ray.stages import politeness

    frontier = politeness.with_host(
        pa.table(
            {
                "url": [
                    "http://a.test/3",
                    "http://a.test/1",
                    "http://a.test/2",
                    "http://b.test/1",
                    "mailto:nohost@example",
                ],
                "kind": ["page"] * 5,
                "depth": pa.array([0] * 5, pa.int32()),
            }
        )
    )
    now, deferred = politeness.split_wave_cap(frontier, 2)
    # canonical order within host: a/1, a/2 stay, a/3 defers; b under cap;
    # the hostless row stays
    assert sorted(now["url"].to_pylist()) == [
        "http://a.test/1",
        "http://a.test/2",
        "http://b.test/1",
        "mailto:nohost@example",
    ]
    assert deferred["url"].to_pylist() == ["http://a.test/3"]
    assert now.schema.equals(frontier.schema)
    with pytest.raises(ValueError):
        politeness.split_wave_cap(frontier, 0)


def _max_per_host_per_wave(run) -> int:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from crawler_ray.stages import politeness

    worst = 0
    for wd in sorted(run.out.glob("wave=*")):
        adm = pq.read_table(wd / "admitted.parquet")
        if adm.num_rows == 0:
            continue
        hosts = politeness.with_host(adm.select(["url", "kind", "depth"]))[
            "host"
        ]
        vc = pc.value_counts(hosts.combine_chunks())
        worst = max(
            worst,
            *(s["counts"] for s in vc.to_pylist() if s["values"] is not None),
        )
    return worst


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("streaming", [False, True])
def test_rate_cap_same_final_state(t1_corpus, tmp_path, streaming):
    """With a NON-binding budget the per-host per-wave rate cap defers but
    never drops: the capped crawl's final archive / texts / host counts
    are IDENTICAL to the uncapped run's (the BFS closure), spread over
    more waves, and no wave dispatches more than ``cap`` URLs to any
    host. ``streaming=True`` drives the sink-mode probe
    (ray_state_threshold=0) so the deferred-part frontier write is
    exercised too."""
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    base = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_uncapped"),
        CrawlConfig(num_seen_shards=4),
    )
    assert base.metrics().get("dropped_budget", 0) == 0  # must not bind
    cap = 3
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / f"run_capped_{streaming}"),
        CrawlConfig(
            num_seen_shards=4,
            max_per_host_wave=cap,
            ray_state_threshold=0 if streaming else 50_000,
        ),
    )
    assert run.texts() == base.texts()
    assert run.archive().sort_by("url").equals(base.archive().sort_by("url"))
    assert run.host_counts() == base.host_counts()
    assert len(sorted(run.out.glob("wave=*"))) > len(
        sorted(base.out.glob("wave=*"))
    )
    assert run.metrics().get("deferred_rate", 0) > 0
    assert _max_per_host_per_wave(run) <= cap


@pytest.mark.usefixtures("ray_session")
def test_rate_cap_with_binding_budget_keeps_257_semantics(t1_corpus, tmp_path):
    """With a BINDING budget the capped crawl still enforces both limits -
    <= cap dispatches per host per wave and <= limit+1 per host over the
    whole crawl - and terminates (deferred rows beyond the budget are
    dropped at admission, not re-deferred forever)."""
    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    limit, cap = 15, 3
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_capped_binding"),
        CrawlConfig(num_seen_shards=4, host_limit=limit, max_per_host_wave=cap),
    )
    assert run.metrics().get("dropped_budget", 0) > 0  # budget must bind
    assert _max_per_host_per_wave(run) <= cap
    assert max(run.host_counts().values()) <= limit + 1


def test_parse_crawl_delay_group_rules():
    from crawler_ray.stages.robots import parse_crawl_delay, parse_robots

    body = b"""
User-agent: googlebot
Crawl-delay: 9
User-agent: *
Disallow: /private/
Crawl-delay: 2.5
Crawl-delay: 7
User-agent: other
Crawl-delay: 1
"""
    assert parse_crawl_delay(body) == 2.5  # first * value wins; others ignored
    assert parse_robots(body) == ["/private/"]
    assert parse_crawl_delay(b"User-agent: *\nCrawl-delay: nope\n") is None
    assert parse_crawl_delay(b"User-agent: *\nCrawl-delay: -3\n") is None
    assert parse_crawl_delay(b"User-agent: *\nDisallow: /x\n") is None


def test_split_wave_cap_host_caps():
    """Per-host caps override the default; hosts in neither are uncapped."""
    import pyarrow as pa

    from crawler_ray.stages import politeness

    frontier = politeness.with_host(
        pa.table(
            {
                "url": [f"http://a.test/{i}" for i in range(5)]
                + [f"http://b.test/{i}" for i in range(5)]
                + [f"http://c.test/{i}" for i in range(5)],
                "kind": ["page"] * 15,
                "depth": pa.array([0] * 15, pa.int32()),
            }
        )
    )
    now, deferred = politeness.split_wave_cap(
        frontier, 4, host_caps={"a.test": 2}
    )
    from collections import Counter

    got = Counter(u.split("/")[2] for u in now["url"].to_pylist())
    assert got == {"a.test": 2, "b.test": 4, "c.test": 4}
    # no default: only listed hosts capped
    now2, def2 = politeness.split_wave_cap(
        frontier, None, host_caps={"a.test": 1}
    )
    got2 = Counter(u.split("/")[2] for u in now2["url"].to_pylist())
    assert got2 == {"a.test": 1, "b.test": 5, "c.test": 5}
    with pytest.raises(ValueError):
        politeness.split_wave_cap(frontier, None, host_caps={"a.test": 0})


@pytest.mark.usefixtures("ray_session")
def test_crawl_delay_caps_per_host(tmp_path):
    """robots Crawl-delay → per-host wave caps end to end: the delayed
    host never exceeds floor(period/delay) dispatches in any wave, the
    undelayed host runs uncapped, and the final state equals the
    cap-free robots run (non-binding budget → BFS closure)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from crawler_ray.stages import politeness

    corpus = fixtures.gen_corpus(2, 12)
    robots_row = pa.table(
        {
            "url": ["http://host0.test/robots.txt"],
            "warc_ts": corpus["warc_ts"][:1],
            "html": [b"User-agent: *\nCrawl-delay: 1\n"],
            "text": ["User-agent: *\nCrawl-delay: 1\n"],
            "lang": [""],
        }
    )
    tbl = pa.concat_tables([corpus, robots_row.cast(corpus.schema)])
    cp = tmp_path / "corpus.parquet"
    pq.write_table(tbl, str(cp))
    seeds = fixtures.default_seeds(2)
    base = run_crawl(
        str(cp),
        seeds,
        str(tmp_path / "run_nodelay"),
        CrawlConfig(num_seen_shards=2, respect_robots=True),
    )
    assert base.metrics().get("dropped_budget", 0) == 0
    run = run_crawl(
        str(cp),
        seeds,
        str(tmp_path / "run_delay"),
        CrawlConfig(
            num_seen_shards=2,
            respect_robots=True,
            crawl_delay_wave_period=3.0,  # delay 1s -> cap 3 for host0 only
        ),
    )
    assert run.texts() == base.texts()
    assert run.host_counts() == base.host_counts()
    per_wave_host0 = []
    per_wave_host1 = []
    for wd in sorted(run.out.glob("wave=*")):
        adm = pq.read_table(wd / "admitted.parquet")
        if adm.num_rows == 0:
            continue
        hosts = politeness.with_host(adm.select(["url", "kind", "depth"]))[
            "host"
        ]
        d = {
            s["values"]: s["counts"]
            for s in pc.value_counts(hosts.combine_chunks()).to_pylist()
        }
        per_wave_host0.append(d.get("host0.test", 0))
        per_wave_host1.append(d.get("host1.test", 0))
    assert max(per_wave_host0) <= 3  # the delayed host is rate-capped
    assert max(per_wave_host1) > 3  # the undelayed host is not
    assert run.metrics().get("deferred_rate", 0) > 0
    # config contract: the delays need the robots cache
    with pytest.raises(ValueError):
        run_crawl(
            str(cp),
            seeds,
            str(tmp_path / "run_bad"),
            CrawlConfig(crawl_delay_wave_period=2.0),
        )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("distributed_counts", [False, True])
def test_ranked_priority_matches_oracle(t1_corpus, tmp_path, distributed_counts):
    """'ranked' priority (external host importance, e.g. a previous
    epoch's PageRank): high-rank hosts drain their budget first; engine
    order must equal the oracle simulator given the same rank table —
    through the driver admission path and the carried-counts bucket
    exchange."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray import oracle

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    ranks = {"host3.test": 5.0, "host1.test": 2.0, "hub.test": 1.5}
    rank_path = tmp_path / "ranks.parquet"
    pq.write_table(
        pa.table(
            {
                "host": pa.array(sorted(ranks), pa.string()),
                "rank": pa.array([ranks[h] for h in sorted(ranks)], pa.float64()),
            }
        ),
        str(rank_path),
    )
    res = oracle.simulate(
        corpus, seeds, host_limit=15, priority="ranked", host_rank=ranks
    )
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / f"run_ranked_{distributed_counts}"),
        CrawlConfig(
            num_seen_shards=4,
            host_limit=15,
            priority="ranked",
            host_rank_path=str(rank_path),
            distributed_counts=distributed_counts,
        ),
    )
    assert_run_matches_oracle(run, res, tbl)
    # the config contract: ranked without a rank table is an error
    with pytest.raises(ValueError):
        run_crawl(
            path,
            seeds,
            str(tmp_path / "run_bad_ranked"),
            CrawlConfig(priority="ranked"),
        )


@pytest.mark.usefixtures("ray_session")
def test_two_epoch_pagerank_ranked_recrawl(t1_corpus, tmp_path):
    """The two-epoch composition loop: epoch-1 crawl extracts the link
    graph → functions/graph.pagerank scores hosts → epoch-2 recrawls with
    priority='ranked' over that score table, and the engine's ranked
    order equals the oracle simulator fed the identical rank dict."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray import oracle
    from crawler_ray.functions.graph import pagerank
    from crawler_ray.stages.parse import process_wave_batch

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))

    # epoch 1: whole-corpus link extraction -> host->host page-link edges
    def to_wave(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "url": t["url"],
                "kind": pa.array(["page"] * t.num_rows),
                "depth": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
                "html": t["html"],
            }
        )

    def host_edges(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.equal(t["rec"], "f"), pc.equal(t["kind"], "page"))
        )
        pat = r"^[^:]*://(?P<host>\[[^\]]*\]|[^/:?#]*)"

        def host_of(col):
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            h = pc.struct_field(pc.extract_regex(col, pattern=pat), "host")
            return pc.if_else(
                pc.equal(h, ""), pa.scalar(None, pa.string()), h
            ).cast(pa.string())

        return pa.table({"src": host_of(t["src_url"]), "dst": host_of(t["url"])})

    edges = (
        rd.read_parquet(path, columns=["url", "html"])
        .map_batches(to_wave, batch_format="pyarrow")
        .map_batches(process_wave_batch, batch_format="pyarrow")
        .map_batches(host_edges, batch_format="pyarrow")
    )
    pr = pagerank(edges, damping=0.85, iters=5)
    assert len(pr) > 1 and pr["pr"].nunique() > 1  # real signal, not flat
    rank_path = tmp_path / "epoch1_rank.parquet"
    pq.write_table(
        pa.table(
            {
                "host": pa.array(pr["node"].tolist(), pa.string()),
                "rank": pa.array(pr["pr"].tolist(), pa.float64()),
            }
        ),
        str(rank_path),
    )

    # epoch 2: rank-prioritized recrawl == oracle under the same ranks
    ranks = dict(zip(pr["node"], pr["pr"]))
    res = oracle.simulate(
        corpus, seeds, host_limit=15, priority="ranked", host_rank=ranks
    )
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_epoch2"),
        CrawlConfig(
            num_seen_shards=4,
            host_limit=15,
            priority="ranked",
            host_rank_path=str(rank_path),
        ),
    )
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_blocked_hosts_gate_matches_oracle(t1_corpus, tmp_path):
    """Host-blocklist frontier gate (the trap_host_stats consumer):
    engine == oracle with two of the five hosts blocked; blocked hosts
    consume NO budget, appear nowhere in the archive, and the drop
    metric matches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    blocked = {"host1.test", "host3.test"}
    res = oracle.simulate(corpus, seeds, blocked_hosts=blocked)
    assert res.metrics["dropped_blocked_host"] > 0  # the gate must bind

    bl_path = tmp_path / "blocklist.parquet"
    pq.write_table(pa.table({"host": sorted(blocked)}), bl_path)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_blocked"),
        CrawlConfig(num_seen_shards=4, blocked_hosts_path=str(bl_path)),
    )
    assert_run_matches_oracle(run, res, tbl)
    hc = run.host_counts()
    assert all(h not in hc or hc[h] == 0 for h in blocked)


@pytest.mark.usefixtures("ray_session")
def test_blocked_hosts_streaming_path_matches_oracle(t1_corpus, tmp_path):
    """Same gate through the streaming wave machinery
    (ray_state_threshold=0): the blocklist is a frontier-table gate, so
    the driver re-reads the frontier — and still matches the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    blocked = {"host0.test"}
    res = oracle.simulate(corpus, seeds, blocked_hosts=blocked)
    bl_path = tmp_path / "blocklist_s.parquet"
    pq.write_table(pa.table({"host": sorted(blocked)}), bl_path)
    run = run_crawl(
        path,
        seeds,
        str(tmp_path / "run_blocked_stream"),
        CrawlConfig(
            num_seen_shards=4,
            blocked_hosts_path=str(bl_path),
            ray_state_threshold=0,
        ),
    )
    assert_run_matches_oracle(run, res, tbl)


@pytest.mark.usefixtures("ray_session")
def test_trap_stats_feed_blocklist_composition(t1_corpus, tmp_path):
    """Epoch loop: crawl 1's dispatched URLs -> trap_host_stats -> trap
    hosts become crawl 2's blocklist (the production hygiene cycle).
    With thresholds chosen so the deep-path fixture host trips the trap
    rule, crawl 2 must equal the oracle with exactly those hosts
    blocked."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray.functions.urlfilter import trap_host_stats

    path, tbl = t1_corpus
    seeds = fixtures.default_seeds(5)
    corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))

    run1 = run_crawl(
        path, seeds, str(tmp_path / "epoch1"), CrawlConfig(num_seen_shards=4)
    )
    order = run1.order()  # (wave, rank, url, kind, depth)
    stats = trap_host_stats(
        rd.from_arrow(order.select(["url"])),
        min_urls=3,
        depth_hi=1.9,  # the img hosts' /imgs/x{k}.png URLs are all depth 2
        query_hi=1.1,  # query rule off: this corpus has no query URLs
    )
    traps = set(stats[stats["trap"]]["host"])
    # of the DISPATCHED hosts, only the deep /imgs/x{k}.png host trips
    assert traps == {"img0.test"}

    bl_path = tmp_path / "trap_blocklist.parquet"
    pq.write_table(pa.table({"host": sorted(traps)}), bl_path)
    res = oracle.simulate(corpus, seeds, blocked_hosts=traps)
    run2 = run_crawl(
        path,
        seeds,
        str(tmp_path / "epoch2"),
        CrawlConfig(num_seen_shards=4, blocked_hosts_path=str(bl_path)),
    )
    assert_run_matches_oracle(run2, res, tbl)


# ------------------------------------------------- RFC 9309 matching


def test_parse_robots_rules_rfc_groups():
    """Stacked user-agent lines share a group; a user-agent line AFTER
    rules starts a new group; Allow rules are captured; multiple *
    groups concatenate; empty values carry no rule."""
    from crawler_ray.stages.robots import parse_robots_rules

    body = b"""
User-agent: googlebot
User-agent: *
Disallow: /a
Allow: /a/ok
User-agent: other
Disallow: /other-only
User-agent: *
Allow:
Disallow: /b$
"""
    assert parse_robots_rules(body) == [
        (False, "/a"),
        (True, "/a/ok"),
        (False, "/b$"),
    ]


@pytest.mark.parametrize(
    "rules,path,allowed",
    [
        # longest rule wins: Allow /a/ok (5) beats Disallow /a (2)
        ([(False, "/a"), (True, "/a/ok")], "/a/ok/page", True),
        ([(False, "/a"), (True, "/a/ok")], "/a/other", False),
        # tie length: Allow wins (RFC 9309 §2.2.2 / Google tie-break)
        ([(False, "/p"), (True, "/p")], "/page", True),
        # * wildcard spans path segments
        ([(False, "/*.pdf")], "/docs/x.pdf", False),
        ([(False, "/*.pdf")], "/docs/x.pdfx", False),  # no anchor: prefix-ish
        ([(False, "/*.pdf$")], "/docs/x.pdfx", True),  # $ anchors the end
        ([(False, "/*.pdf$")], "/docs/x.pdf", False),
        # mid-pattern $ is literal
        ([(False, "/a$b")], "/a$b/c", False),
        ([(False, "/a$b")], "/ab/c", True),
        # query string participates in the match
        ([(False, "/x?y=")], "/x?y=1", False),
        ([(False, "/x?y=")], "/x?z=1", True),
        # no matching rule => allowed
        ([(False, "/blocked")], "/free", True),
        # wildcard-only disallow blocks everything, but a longer Allow
        # carves an exception
        ([(False, "/*"), (True, "/public/")], "/public/a", True),
        ([(False, "/*"), (True, "/public/")], "/private/a", False),
    ],
)
def test_rules_allow_rfc_cases(rules, path, allowed):
    from crawler_ray.stages.robots import compile_rules, rules_allow

    assert rules_allow(compile_rules(rules), path) is allowed
    # the oracle's independent regex-free matcher agrees case by case
    assert oracle._robots_allows(rules, path) is allowed


def test_engine_and_oracle_matchers_agree_fuzz():
    """Differential fuzz: the engine's compiled-regex precedence matcher
    and the oracle's independent wildcard scanner must agree on random
    rule sets x random paths (the crawl-vs-simulator equality tests
    inherit this invariant for every robots-gated crawl)."""
    import random

    from crawler_ray.stages.robots import compile_rules, rules_allow

    rng = random.Random(93)
    alphabet = ["/", "a", "b", ".", "?", "*", "$"]
    for _ in range(300):
        rules = []
        for _ in range(rng.randint(0, 5)):
            pat = "/" + "".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 6))
            )
            rules.append((rng.random() < 0.4, pat))
        path = "/" + "".join(
            rng.choice(["/", "a", "b", ".", "?"])
            for _ in range(rng.randint(0, 8))
        )
        got = rules_allow(compile_rules(rules), path)
        want = oracle._robots_allows(rules, path)
        assert got == want, (rules, path, got, want)


def test_filter_frontier_matches_scalar_disallowed_rfc():
    """Vectorized gate == scalar matcher with wildcard/anchor/Allow rules
    in play (the legacy-prefix form is covered by the test above)."""
    import pyarrow as pa

    from crawler_ray.stages.robots import RobotsCache

    rc = RobotsCache(corpus_path=[])
    rc.rules = {
        "a.test": [(False, "/*.pdf$"), (True, "/pub/"), (False, "/pub/x")],
        "b.test": [(False, "/*"), (True, "/ok")],
    }
    urls = [
        "http://a.test/doc.pdf",
        "http://a.test/doc.pdfx",
        "http://a.test/pub/y",
        "http://a.test/pub/x",  # Disallow /pub/x (6) beats Allow /pub/ (5)
        "http://b.test/ok/page",
        "http://b.test/nope",
        "http://a.test/doc.pdf#frag",  # fragment excluded -> still blocked
    ]
    hosts = ["a.test"] * 4 + ["b.test"] * 2 + ["a.test"]
    frontier = pa.table({"url": urls, "host": hosts})
    rc.ensure_hosts = lambda hs: None
    kept, n_dropped = rc.filter_frontier(frontier)
    want_keep = [not rc.disallowed(u) for u in urls]
    assert kept["url"].to_pylist() == [u for u, k in zip(urls, want_keep) if k]
    assert want_keep == [False, True, True, False, True, False, False]
    assert n_dropped == 4
