"""End-to-end training-data pipeline over crawl output."""

import pyarrow.dataset as pads
import pytest

from crawler_ray import fixtures
from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from crawler_ray.pipelines.webtext import build_training_set


@pytest.mark.usefixtures("ray_session")
def test_crawl_to_training_set(t1_corpus, tmp_path):
    path, tbl = t1_corpus
    run = run_crawl(
        path,
        fixtures.default_seeds(5),
        str(tmp_path / "crawl"),
        CrawlConfig(num_seen_shards=2),
    )
    n_texts = len(run.texts())
    stats = build_training_set(str(tmp_path / "crawl"), str(tmp_path / "corpus"))
    assert stats["docs"].sum() > 0
    assert stats["docs"].sum() <= n_texts  # dedup + filters only remove
    assert (stats["tokens"] > 0).all()

    # partitioned layout: lang=XX dirs, readable, schema includes features
    out = pads.dataset(
        [str(p) for p in (tmp_path / "corpus").glob("lang=*/*.parquet")],
        format="parquet",
    ).to_table()
    assert out.num_rows == stats["docs"].sum()
    for col in ["url", "text", "pred_lang", "ws_tokens", "fingerprint", "punct_ratio"]:
        assert col in out.schema.names
    # dedup: no duplicate text survives
    texts = out["text"].to_pylist()
    assert len(texts) == len(set(texts))
    assert (tmp_path / "corpus" / "stats.json").exists()


@pytest.mark.usefixtures("ray_session")
def test_training_set_deterministic(t1_corpus, tmp_path):
    path, _ = t1_corpus
    run_crawl(
        path, fixtures.default_seeds(5), str(tmp_path / "c1"), CrawlConfig(num_seen_shards=2)
    )
    s1 = build_training_set(str(tmp_path / "c1"), str(tmp_path / "o1"))
    s2 = build_training_set(str(tmp_path / "c1"), str(tmp_path / "o2"))
    assert s1.equals(s2)


@pytest.mark.usefixtures("ray_session")
def test_repetition_gate_only_removes(t1_corpus, tmp_path):
    path, _ = t1_corpus
    run_crawl(
        path, fixtures.default_seeds(5), str(tmp_path / "c1"), CrawlConfig(num_seen_shards=2)
    )
    base = build_training_set(str(tmp_path / "c1"), str(tmp_path / "base"))
    gated = build_training_set(
        str(tmp_path / "c1"),
        str(tmp_path / "gated"),
        max_top_bigram_ratio=0.12,  # aggressive: synthetic pages repeat phrases
        max_dup_line_ratio=0.5,
    )
    assert gated["docs"].sum() < base["docs"].sum()  # the gate actually fires
    # off-by-default path is byte-identical to the pre-gate behavior
    again = build_training_set(str(tmp_path / "c1"), str(tmp_path / "again"))
    assert again.equals(base)
