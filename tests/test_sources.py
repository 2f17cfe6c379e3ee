"""WARC source/sink: round trip, and crawl parity with the parquet corpus."""

import pyarrow as pa
import pytest

from crawler_ray import fixtures
from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from crawler_ray.sources.warc import (
    parse_warc_file,
    read_warc,
    write_warc_file,
)


def test_warc_roundtrip(tmp_path):
    corpus = fixtures.gen_corpus(3, 8)
    p = tmp_path / "part-0.warc"
    n = write_warc_file(corpus, str(p))
    assert n == corpus.num_rows
    back = parse_warc_file(p.read_bytes())
    assert back["url"].to_pylist() == corpus["url"].to_pylist()
    want = [
        h if isinstance(h, bytes) else h.encode()
        for h in corpus["html"].to_pylist()
    ]
    assert back["html"].to_pylist() == want
    # timestamps survive at second precision (the WARC-Date grain)
    orig = corpus["warc_ts"].cast(pa.int64()).to_pylist()
    got = back["warc_ts"].cast(pa.int64()).to_pylist()
    assert all(abs(a - b) < 1_000_000 for a, b in zip(got, orig))


@pytest.mark.usefixtures("ray_session")
def test_crawl_over_warc_corpus_matches_parquet(tmp_path):
    corpus = fixtures.gen_corpus(3, 10)
    # parquet reference crawl
    pq_dir = tmp_path / "pq"
    fixtures.write_corpus_dir(corpus, str(pq_dir), n_files=4)
    ref = run_crawl(
        str(pq_dir), fixtures.default_seeds(3), str(tmp_path / "ref"),
        CrawlConfig(num_seen_shards=2),
    )
    # same pages via WARC → parquet ingestion
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    write_warc_file(corpus.slice(0, 15), str(warc_dir / "a.warc"))
    write_warc_file(corpus.slice(15), str(warc_dir / "b.warc"))
    ingested = tmp_path / "ingested"
    read_warc(str(warc_dir)).write_parquet(str(ingested))
    got = run_crawl(
        str(ingested), fixtures.default_seeds(3), str(tmp_path / "got"),
        CrawlConfig(num_seen_shards=2),
    )
    assert got.texts() == ref.texts()
    assert got.archive().sort_by("url").equals(ref.archive().sort_by("url"))
    assert got.host_counts() == ref.host_counts()


def test_jsonl_roundtrip_and_salvage(ray_session, tmp_path):
    """JSONL sink → source round trip preserves urls/timestamps/text/lang
    through plain and gzip shards; files with malformed lines fall back to
    the per-line salvage that keeps well-formed records and counts drops;
    url-less records are dropped."""
    import pyarrow as pa

    from crawler_ray.sources.jsonl import (
        TEXT_SCHEMA,
        parse_jsonl_bytes,
        read_jsonl,
        write_jsonl_file,
    )

    tbl = pa.table(
        {
            "url": ["http://a/1", "http://b/2", "http://c/3"],
            "warc_ts": pa.array(
                [1_600_000_000_000_000, None, 1_700_000_000_000_000],
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "text": ["hello world", None, "third doc"],
            "lang": ["en", "de", None],
        }
    )
    write_jsonl_file(tbl, str(tmp_path / "a.jsonl"))
    write_jsonl_file(tbl, str(tmp_path / "b.jsonl.gz"))
    back = (
        read_jsonl(str(tmp_path))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(back) == 6  # both shards, identical content
    a = back.iloc[::2].reset_index(drop=True)
    b = back.iloc[1::2].reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert a["url"].tolist() == ["http://a/1", "http://b/2", "http://c/3"]
    assert a["text"].tolist()[0] == "hello world" and a["text"][1] is None
    assert a["lang"].tolist() == ["en", "de", None]
    assert str(a["warc_ts"][0]) == "2020-09-13 12:26:40"
    assert pd.isna(a["warc_ts"][1])

    raw = (
        b'{"url":"http://x/1","text":"ok"}\n'
        b"not json at all\n"
        b'{"url":"http://x/2","warc_ts":"2020-09-13T12:26:40Z","lang":"en"}\n'
        b'{"no_url":1}\n'
    )
    t = parse_jsonl_bytes(raw)
    assert t.schema.equals(TEXT_SCHEMA, check_metadata=False)
    assert t["url"].to_pylist() == ["http://x/1", "http://x/2"]
    assert t.schema.metadata[b"jsonl_dropped"] == b"1"


def test_jsonl_gzip_bytes_deterministic(tmp_path):
    """The gzip shard writer must produce byte-identical files for
    identical input (mtime pinned) — required for resumable, rewritable
    partition outputs."""
    import pyarrow as pa

    from crawler_ray.sources.jsonl import write_jsonl_file

    tbl = pa.table(
        {
            "url": ["http://a/1"],
            "warc_ts": pa.array([1_600_000_000_000_000], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "text": ["x"],
            "lang": ["en"],
        }
    )
    write_jsonl_file(tbl, str(tmp_path / "x1.jsonl.gz"))
    write_jsonl_file(tbl, str(tmp_path / "x2.jsonl.gz"))
    assert (tmp_path / "x1.jsonl.gz").read_bytes() == (
        tmp_path / "x2.jsonl.gz"
    ).read_bytes()


def test_sitemap_roundtrip_and_parse_shapes(ray_session, tmp_path):
    """Sitemap sink → source round trip preserves url/lastmod/changefreq/
    priority through plain and gzip shards; plain-text and index shapes
    parse; loc-less entries are dropped and counted; XML entities in locs
    round-trip; date-only and offset lastmod forms parse."""
    import pandas as pd
    import pyarrow as pa

    from crawler_ray.sources.sitemap import (
        SEED_SCHEMA,
        parse_sitemap_bytes,
        parse_sitemap_index_bytes,
        read_sitemaps,
        write_sitemap_file,
        write_sitemap_index_file,
    )

    tbl = pa.table(
        {
            "url": [
                "http://a.example/p?x=1&y=2",  # & must escape/unescape
                "http://b.example/q",
                "http://c.example/r",
            ],
            "lastmod": pa.array(
                [1_600_000_000_000_000, None, 1_700_000_000_000_000],
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "changefreq": ["daily", None, "weekly"],
            "priority": pa.array([0.8, None, 0.1], pa.float64()),
        }
    )
    write_sitemap_file(tbl, str(tmp_path / "a.xml"))
    write_sitemap_file(tbl, str(tmp_path / "b.xml.gz"))
    back = (
        read_sitemaps(str(tmp_path))
        .to_pandas()
        .sort_values("url", kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(back) == 6
    a = back.iloc[::2].reset_index(drop=True)
    b = back.iloc[1::2].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["url"].tolist() == [
        "http://a.example/p?x=1&y=2",
        "http://b.example/q",
        "http://c.example/r",
    ]
    assert str(a["lastmod"][0]) == "2020-09-13 12:26:40"
    assert pd.isna(a["lastmod"][1])
    assert a["changefreq"].tolist() == ["daily", None, "weekly"]
    assert a["priority"][0] == 0.8 and a["priority"][2] == 0.1
    assert pd.isna(a["priority"][1])

    # plain-text shape
    t = parse_sitemap_bytes(b"http://x/1\n\nhttp://x/2\n")
    assert t.schema.equals(SEED_SCHEMA, check_metadata=False)
    assert t["url"].to_pylist() == ["http://x/1", "http://x/2"]
    assert t["lastmod"].null_count == 2

    # malformed entry (no loc) dropped + counted; bad lastmod/priority → null
    xml = (
        b'<?xml version="1.0"?><urlset>'
        b"<url><lastmod>2020-01-01</lastmod></url>"
        b"<url><loc>http://y/1</loc><lastmod>not-a-date</lastmod>"
        b"<priority>high</priority></url>"
        b"<url><loc>http://y/2</loc><lastmod>2020-01-02</lastmod></url>"
        b"<url><loc>http://y/3</loc>"
        b"<lastmod>2020-01-02T03:04:05+01:00</lastmod></url>"
        b"</urlset>"
    )
    t = parse_sitemap_bytes(xml)
    assert t["url"].to_pylist() == ["http://y/1", "http://y/2", "http://y/3"]
    assert t.schema.metadata[b"sitemap_dropped"] == b"1"
    assert t["lastmod"][0].as_py() is None and t["priority"][0].as_py() is None
    assert str(t["lastmod"][1]) == "2020-01-02 00:00:00"
    assert str(t["lastmod"][2]) == "2020-01-02 02:04:05"  # offset applied

    # index shape: no seed rows; children listed
    idx = tmp_path / "idx.xml"
    write_sitemap_index_file(
        ["http://a.example/sm-1.xml", "http://a.example/sm-2.xml"], str(idx)
    )
    assert parse_sitemap_bytes(idx.read_bytes()).num_rows == 0
    assert parse_sitemap_index_bytes(idx.read_bytes()) == [
        "http://a.example/sm-1.xml",
        "http://a.example/sm-2.xml",
    ]


def test_sitemap_discover_seeds_from_corpus(tmp_path):
    """In-corpus seed discovery: robots Sitemap: directives win, the
    /sitemap.xml convention is the fallback, index files are followed one
    level, hosts with no sitemap contribute nothing, and the result is
    (host, url)-sorted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.sources.sitemap import (
        discover_seeds,
        robots_sitemap_urls,
        write_sitemap_file,
        write_sitemap_index_file,
    )

    def sm_bytes(urls):
        import io
        import os

        p = tmp_path / "tmp_sm.xml"
        write_sitemap_file(
            pa.table({"url": pa.array(urls, pa.string())}), str(p)
        )
        data = p.read_bytes()
        os.remove(p)
        return data

    idx_p = tmp_path / "tmp_idx.xml"
    write_sitemap_index_file(
        ["http://a.ex/sm-1.xml", "http://a.ex/sm-2.xml"], str(idx_p)
    )
    robots_a = b"User-agent: *\nDisallow: /private\nSitemap: http://a.ex/smidx.xml\n"
    assert robots_sitemap_urls(robots_a) == ["http://a.ex/smidx.xml"]
    rows = [
        # host a: robots directive -> index -> two child sitemaps
        ("http://a.ex/robots.txt", robots_a),
        ("http://a.ex/smidx.xml", idx_p.read_bytes()),
        ("http://a.ex/sm-1.xml", sm_bytes(["http://a.ex/p1", "http://a.ex/p2"])),
        ("http://a.ex/sm-2.xml", sm_bytes(["http://a.ex/p3"])),
        # host b: no robots -> convention fallback
        ("http://b.ex/sitemap.xml", sm_bytes(["http://b.ex/q1"])),
        # host c: nothing
        ("http://c.ex/index.html", b"<html></html>"),
    ]
    corpus = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [1_600_000_000_000_000] * len(rows), pa.int64()
            ).cast(pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([""] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )
    cp = tmp_path / "corpus.parquet"
    pq.write_table(corpus, str(cp))
    got = discover_seeds(str(cp), ["a.ex", "b.ex", "c.ex"])
    assert got["url"].to_pylist() == [
        "http://a.ex/p1",
        "http://a.ex/p2",
        "http://a.ex/p3",
        "http://b.ex/q1",
    ]
    assert got["host"].to_pylist() == ["a.ex", "a.ex", "a.ex", "b.ex"]


def test_recrawl_due_schedule(ray_session):
    """Recrawl scheduling: null lastmod is always due (never observed),
    changefreq maps to its protocol interval, unknown/missing changefreq
    falls back to the default, 'never' pushes next_due out of range."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.sources.sitemap import recrawl_due

    base = 1_600_000_000_000_000
    day = 86_400_000_000
    tbl = pa.table(
        {
            "url": [f"http://x/{i}" for i in range(6)],
            "lastmod": pa.array(
                [base, base, base, None, base, base], pa.int64()
            ).cast(pa.timestamp("us")),
            "changefreq": ["daily", "weekly", "never", "monthly", None, "bogus"],
            "priority": pa.array([None] * 6, pa.float64()),
        }
    )
    now = base + 3 * day  # 3 days after everything's lastmod
    out = (
        recrawl_due(rd.from_arrow(tbl), now_us=now)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # daily: due (3d >= 1d); weekly: not due; never: not due;
    # null lastmod: due, null next_due; default-weekly fallbacks: not due
    assert out["due"].tolist() == [True, False, False, True, False, False]
    assert out["next_due"].isna().tolist() == [
        False, False, False, True, False, False,
    ]
    assert out["next_due"][0].value // 1000 == base + day
    assert out["next_due"][1].value // 1000 == base + 7 * day
    # unknown + missing changefreq both got the weekly default
    assert out["next_due"][4].value // 1000 == base + 7 * day
    assert out["next_due"][5].value // 1000 == base + 7 * day


# ------------------------------------------------------- CDX / SURT


def test_surt_key_cases():
    import pyarrow as pa

    from crawler_ray.sources.cdx import surt_key

    cases = {
        # host lowercased, labels reversed, fragment dropped
        "http://www.Example.COM/path/Page?q=1#frag":
            "com,example,www)/path/Page?q=1",
        # explicit port kept after the reversed host
        "https://a.b.example.org:8080/": "org,example,b,a:8080)/",
        # userinfo stripped; empty path becomes /
        "http://user:pw@example.com": "com,example)/",
        # path/query case preserved (only the authority folds)
        "http://example.com/UPPER?Q=X": "com,example)/UPPER?Q=X",
        # query with empty path: pathq starts at '?', kept as-is
        "http://example.com?q=1": "com,example)?q=1",
    }
    got = surt_key(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_cdx_index_roundtrip_sorted_and_salvage(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.sources.cdx import (
        build_cdx_index,
        prefix_lookup,
        read_cdxj,
        write_cdxj,
    )

    urls = [
        f"http://h{i % 3}.example/p{i}" + ("?q=1" if i % 2 else "")
        for i in range(50)
    ]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "ts": pa.array(list(range(50)), pa.int64()),
            "digest": pa.array([f"d{i}" for i in range(50)], pa.string()),
        }
    )
    idx = build_cdx_index(rd.from_arrow(t).repartition(5))
    paths = write_cdxj(idx, str(tmp_path / "cdx"), shard_rows=8)
    assert len(paths) > 1
    # shard files preserve the GLOBAL sort: file-order concat is sorted
    lines = []
    for p in paths:
        lines.extend(open(p).read().splitlines())
    keys = [(ln.split(" ", 2)[0], int(ln.split(" ", 2)[1])) for ln in lines]
    assert keys == sorted(keys)
    assert len(keys) == 50

    back = (
        read_cdxj(paths)
        .to_pandas()
        .sort_values(["urlkey", "ts"])
        .reset_index(drop=True)
    )
    assert len(back) == 50
    assert back["url"].tolist() != []
    assert set(back["digest"]) == {f"d{i}" for i in range(50)}

    # prefix lookup: exactly host h1's captures
    hits = prefix_lookup(read_cdxj(paths), "example,h1)")
    assert set(hits["url"]) == {u for u in urls if "//h1." in u}

    # malformed-line salvage: junk lines and bad JSON skipped, rest kept
    bad = tmp_path / "cdx" / "cdx-bad.cdxj"
    bad.write_text(
        "only-two fields\n"
        "com,example)/x notanint {\"url\":\"u\"}\n"
        "com,example)/y 5 {broken json\n"
        "com,example)/z 6 {\"url\":\"http://example.com/z\",\"digest\":\"dz\"}\n"
    )
    sal = read_cdxj([str(bad)]).to_pandas()
    assert len(sal) == 1
    assert sal["urlkey"][0] == "com,example)/z" and sal["ts"][0] == 6


def test_cdxj_sink_tasks_cluster_idx_and_guards(ray_session, tmp_path):
    """The distributed sink: per-block tasks write shards whose
    lexicographic NAME order equals global key order, cluster.idx maps
    each shard to its first key and row count, space-bearing urlkeys are
    rejected loudly, and cdxj_salvage_counts surfaces read-side drops."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.sources.cdx import (
        build_cdx_index,
        cdxj_salvage_counts,
        write_cdxj,
    )

    urls = [f"http://h{i % 7}.example/p{i}" for i in range(60)]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "ts": pa.array(list(range(60)), pa.int64()),
            "digest": pa.array([f"d{i}" for i in range(60)], pa.string()),
        }
    )
    out = tmp_path / "cdx2"
    paths = write_cdxj(
        build_cdx_index(rd.from_arrow(t).repartition(6)), str(out), shard_rows=7
    )
    # returned order == lexicographic name order == global key order
    assert paths == sorted(paths)
    keys = []
    for p in paths:
        keys.extend(
            (ln.split(" ", 2)[0], int(ln.split(" ", 2)[1]))
            for ln in open(p).read().splitlines()
        )
    assert keys == sorted(keys) and len(keys) == 60

    # cluster.idx: one line per shard, first key + row count per shard
    idx_lines = (out / "cluster.idx").read_text().splitlines()
    assert len(idx_lines) == len(paths)
    total = 0
    for ln, p in zip(idx_lines, paths):
        first_key, first_ts, name, n = ln.rsplit(" ", 3)
        assert name == p.rsplit("/", 1)[-1]
        first_line = open(p).readline()
        assert first_line.startswith(f"{first_key} {first_ts} ")
        total += int(n)
    assert total == 60

    # space-bearing urlkey -> loud ValueError from the sink task
    bad = rd.from_arrow(
        pa.table(
            {
                "urlkey": pa.array(["com,ex) /sp ace"], pa.string()),
                "ts": pa.array([1], pa.int64()),
                "url": pa.array(["u"], pa.string()),
                "digest": pa.array(["d"], pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="space"):
        write_cdxj(bad, str(tmp_path / "cdx3"))

    # salvage metric: clean shards report zero drops; a junk shard reports
    sal = cdxj_salvage_counts(paths)
    assert (sal["salvaged"] == 0).all()
    assert int(sal["total_lines"].sum()) == 60
    junk = out / "cdx-junk.cdxj"
    junk.write_text("no\ncom,x)/y 3 {\"url\":\"u\",\"digest\":\"d\"}\n")
    salj = cdxj_salvage_counts([str(junk)])
    assert salj["total_lines"].tolist() == [2]
    assert salj["salvaged"].tolist() == [1]


def test_warc_revisit_write_and_resolve(ray_session, tmp_path):
    """Revisit storage dedup is FILE-LOCAL (the writer is one sink task):
    a repeated body within a file becomes a zero-payload revisit record
    whose payload the resolving reader restores via the digest exchange;
    the same body in a DIFFERENT file stays a full response. A revisit
    with no referent anywhere keeps html NULL (salvage, not drop)."""
    import pyarrow as pa

    from crawler_ray.sources.warc import (
        iter_warc_records,
        read_warc_resolving,
        write_warc_file,
    )

    def tbl(rows):
        return pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "warc_ts": pa.array(
                    [1_600_000_000_000_000 + i for i in range(len(rows))],
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                "html": pa.array([b for _, b in rows], pa.binary()),
            }
        )

    # file A: body X twice (second becomes revisit), body Y once
    write_warc_file(
        tbl([("http://h/a1", b"XX"), ("http://h/a2", b"XX"), ("http://h/a3", b"YY")]),
        str(tmp_path / "a.warc"),
        dedup_digests=True,
    )
    # file B: body X again -> full response (file-local scope)
    write_warc_file(
        tbl([("http://h/b1", b"XX")]), str(tmp_path / "b.warc"), dedup_digests=True
    )

    raw_a = (tmp_path / "a.warc").read_bytes()
    kinds = [h.get("warc-type") for h, _ in iter_warc_records(raw_a)]
    assert kinds == ["response", "revisit", "response"]
    # the revisit record carries the profile + pointer headers, no payload
    rev_hdr = [h for h, p in iter_warc_records(raw_a) if h["warc-type"] == "revisit"][0]
    assert "identical-payload-digest" in rev_hdr["warc-profile"]
    assert rev_hdr["warc-refers-to-target-uri"] == "http://h/a1"
    assert rev_hdr["content-length"] == "0"
    raw_b = (tmp_path / "b.warc").read_bytes()
    assert [h.get("warc-type") for h, _ in iter_warc_records(raw_b)] == ["response"]

    back = read_warc_resolving([str(tmp_path / "a.warc"), str(tmp_path / "b.warc")])
    by_url = {r.url: (r.html, r.was_revisit) for r in back.itertuples()}
    assert by_url["http://h/a1"] == (b"XX", False)
    assert by_url["http://h/a2"] == (b"XX", True)   # payload restored
    assert by_url["http://h/a3"] == (b"YY", False)
    assert by_url["http://h/b1"] == (b"XX", False)  # file-local scope

    # orphan revisit: hand-write a revisit whose digest has no response
    orphan = (
        b"WARC/1.0\r\n"
        b"WARC-Type: revisit\r\n"
        b"WARC-Target-URI: http://h/orphan\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/identical-payload-digest\r\n"
        b"WARC-Payload-Digest: sha1:NOSUCHDIGEST\r\n"
        b"Content-Length: 0\r\n"
        b"\r\n\r\n\r\n"
    )
    (tmp_path / "c.warc").write_bytes(orphan)
    sal = read_warc_resolving([str(tmp_path / "c.warc")])
    assert len(sal) == 1 and sal["html"][0] is None and bool(sal["was_revisit"][0])


def test_prefix_lookup_indexed_prunes_shards(ray_session, tmp_path):
    """The cluster.idx access path must return exactly what the full scan
    returns while opening only the shards whose range can overlap the
    prefix — including prefixes before the first shard, past the last,
    and spanning a shard boundary."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.sources.cdx import (
        build_cdx_index,
        prefix_lookup,
        prefix_lookup_indexed,
        read_cdxj,
        write_cdxj,
    )

    urls = [f"http://h{i % 9}.example/p{i}" for i in range(90)]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "ts": pa.array(list(range(90)), pa.int64()),
            "digest": pa.array([f"d{i}" for i in range(90)], pa.string()),
        }
    )
    out = tmp_path / "cdx"
    paths = write_cdxj(
        build_cdx_index(rd.from_arrow(t).repartition(4)), str(out), shard_rows=10
    )
    assert len(paths) > 3
    for prefix in ("example,h4)", "example,h0)", "example,", "zzz", "aaa"):
        want = prefix_lookup(read_cdxj(paths), prefix)
        got = prefix_lookup_indexed(str(out), prefix)
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True)), prefix
    # pruning actually happens: a single-host prefix needs < all shards
    import bisect

    idx_lines = (out / "cluster.idx").read_text().splitlines()
    firsts = [ln.rsplit(" ", 3)[0] for ln in idx_lines]
    lo = max(0, bisect.bisect_right(firsts, "example,h4)") - 1)
    hi = bisect.bisect_left(firsts, "example,h4)" + "￿")
    assert hi - lo < len(idx_lines)


def test_corpus_scale_out_path_sinks(ray_session, tmp_path):
    """The out_path contract on the round-5 corpus-sized operators: the
    result streams to partitioned parquet from the workers (only a
    one-row stats frame reaches the driver), the written rows equal the
    gathered form, and re-running skips via _SUCCESS."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray.sources.cdx import cdx_revisits
    from crawler_ray.sources.warc import read_warc_resolving, write_warc_file

    idx = pa.table(
        {
            "urlkey": pa.array(["k1", "k1", "k2"], pa.string()),
            "ts": pa.array([0, 1, 2], pa.int64()),
            "digest": pa.array(["A", "A", "B"], pa.string()),
        }
    )
    gathered = cdx_revisits(rd.from_arrow(idx))
    stats = cdx_revisits(rd.from_arrow(idx), out_path=str(tmp_path / "rev"))
    assert int(stats["rows"].iloc[0]) == 3
    back = (
        pq.read_table(str(tmp_path / "rev"))
        .to_pandas()
        .sort_values(["urlkey", "ts"])
        .reset_index(drop=True)
    )
    assert back.equals(gathered)
    # resume: a second call with _SUCCESS present skips the write
    stats2 = cdx_revisits(rd.from_arrow(idx), out_path=str(tmp_path / "rev"))
    assert int(stats2["rows"].iloc[0]) == 3

    write_warc_file(
        pa.table(
            {
                "url": pa.array(["http://h/a", "http://h/b"], pa.string()),
                "warc_ts": pa.array(
                    [1_600_000_000_000_000] * 2, pa.int64()
                ).cast(pa.timestamp("us")),
                "html": pa.array([b"X", b"X"], pa.binary()),
            }
        ),
        str(tmp_path / "w.warc"),
        dedup_digests=True,
    )
    wstats = read_warc_resolving(
        [str(tmp_path / "w.warc")], out_path=str(tmp_path / "resolved")
    )
    assert int(wstats["rows"].iloc[0]) == 2
    wback = pq.read_table(str(tmp_path / "resolved")).to_pandas()
    assert sorted(wback["url"]) == ["http://h/a", "http://h/b"]
    assert set(wback["html"]) == {b"X"}
