"""Inline crawl-time curation (stages/curate.py).

Truth model: the curated crawl's extra rec=t columns must equal what the
STANDALONE textstats operators (which carry their own DuckDB / pinned
oracles) compute over the same crawled texts — i.e. fusing curation into
the parse task changes where the work runs, never the answer. Plus
path-parity: all three fetch paths write identical curation columns."""

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray import fixtures
from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from crawler_ray.stages.curate import CURATE_FIELDS, curate_columns, curate_table


def _expected_curation(texts: dict[str, str]) -> pa.Table:
    """Independent recompute: standalone textstats operators over the
    crawl's url→text map, canonical url order (same reader contract as
    CrawlRun.curated_texts)."""
    from crawler_ray.functions import textstats as ts

    urls = sorted(texts)
    tmp = pa.table({"text": pa.array([texts[u] for u in urls], pa.string())})
    tmp = ts.token_counts(tmp)
    tmp = ts.quality_scores(tmp)
    tmp = ts.repetition_scores(tmp)
    tmp = ts.fingerprints(tmp)
    tmp = ts.LangId()(tmp)
    cols = {"url": pa.array(urls, pa.string()), "lang": tmp["pred_lang"]}
    for name, _typ in CURATE_FIELDS[1:]:
        cols[name] = tmp[name]
    return pa.table(cols)


def test_curate_table_mixed_rec_scatter():
    """Mixed-rec blocks: t rows get computed values, other recs get nulls,
    row order and existing columns untouched."""
    t = pa.table(
        {
            "rec": pa.array(["f", "t", "m", "t"]),
            "url": pa.array(["u1", "u2", "u3", "u4"]),
            "text": pa.array([None, "the quick brown fox.", None, "der die das und"]),
        }
    )
    out = curate_table(t)
    assert out["rec"].to_pylist() == ["f", "t", "m", "t"]
    langs = out["lang"].to_pylist()
    assert langs[0] is None and langs[2] is None
    assert langs[1] == "en" and langs[3] == "de"
    ws = out["ws_tokens"].to_pylist()
    assert ws[1] == 4 and ws[3] == 4 and ws[0] is None
    # direct compute on just the text rows must agree with the scatter
    direct = curate_columns(pa.array(["the quick brown fox.", "der die das und"]))
    for name, _ in CURATE_FIELDS:
        assert [out[name].to_pylist()[i] for i in (1, 3)] == direct[name].to_pylist()


def test_curate_table_no_text_rows():
    t = pa.table({"rec": pa.array(["f", "m"]), "url": pa.array(["a", "b"]),
                  "text": pa.array([None, None], pa.string())})
    out = curate_table(t)
    assert out.num_rows == 2
    for name, _ in CURATE_FIELDS:
        assert out[name].null_count == 2


@pytest.mark.usefixtures("ray_session")
def test_curated_crawl_matches_standalone_operators(t1_corpus, tmp_path):
    """Curated crawl (scan path): rec=t curation columns == standalone
    textstats recompute over the same texts; plain-crawl outputs (order,
    archive, texts) are unchanged by curation."""
    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    plain = run_crawl(
        path, seeds, str(tmp_path / "plain"), CrawlConfig(num_seen_shards=2)
    )
    cur = run_crawl(
        path,
        seeds,
        str(tmp_path / "curated"),
        CrawlConfig(num_seen_shards=2, curate=True),
    )
    assert cur.order().equals(plain.order())
    assert cur.archive().equals(plain.archive())
    assert cur.texts() == plain.texts()

    got = cur.curated_texts()
    want = _expected_curation(cur.texts())
    assert got.num_rows == want.num_rows > 0
    got = got.combine_chunks()
    for name in want.column_names:
        if pa.types.is_floating(want[name].type):
            assert np.allclose(
                got[name].to_numpy(zero_copy_only=False),
                want[name].to_numpy(zero_copy_only=False),
            ), name
        else:
            assert got[name].to_pylist() == want[name].to_pylist(), name


@pytest.mark.usefixtures("ray_session")
def test_curated_crawl_path_parity(t1_corpus, tmp_path):
    """Fetch-service and scan paths write identical curation columns."""
    path, _ = t1_corpus
    seeds = fixtures.default_seeds(5)
    scan = run_crawl(
        path,
        seeds,
        str(tmp_path / "scan"),
        CrawlConfig(num_seen_shards=2, curate=True),
    )
    svc = run_crawl(
        path,
        seeds,
        str(tmp_path / "svc"),
        CrawlConfig(
            num_seen_shards=2,
            use_fetch_service=True,
            fetch_service_shards=3,
            curate=True,
        ),
    )
    a, b = scan.curated_texts(), svc.curated_texts()
    assert a.num_rows == b.num_rows > 0
    for name in ("url", *(f for f, _ in CURATE_FIELDS)):
        assert a[name].to_pylist() == b[name].to_pylist(), name
