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
