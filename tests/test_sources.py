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
