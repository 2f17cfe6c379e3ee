"""Distributed-output (out_path=) contract: corpus-sized query results
stream to partitioned parquet with only a stats row on the driver, the
written rows are bit-identical to the driver-return path, and the
_SUCCESS marker makes reruns skip finished sinks."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


def _read_back(path: str) -> pd.DataFrame:
    return pq.read_table(path).to_pandas()


def test_extract_links_sink_matches_driver_path(entry_mod, tmp_path):
    in_mem = entry_mod._extract_links(SF).to_pandas()
    stats = entry_mod._extract_links(SF, out_path=str(tmp_path / "links"))
    assert list(stats.columns) == ["path", "rows", "files", "bytes"]
    assert int(stats["rows"][0]) == len(in_mem)
    got = (
        _read_back(str(tmp_path / "links"))
        .sort_values(["src_url", "kind", "url"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, in_mem)


def test_quality_scores_sink_matches_driver_path(entry_mod, tmp_path):
    in_mem = entry_mod._quality_scores(SF)
    stats = entry_mod._quality_scores(SF, out_path=str(tmp_path / "q"))
    assert int(stats["rows"][0]) == len(in_mem)
    got = (
        _read_back(str(tmp_path / "q"))
        .sort_values("doc_id")
        .reset_index(drop=True)[in_mem.columns]
    )
    pd.testing.assert_frame_equal(got, in_mem)


def test_per_doc_sinks_cover_normalize_redact_repetition(entry_mod, tmp_path):
    for name, fn in [
        ("norm", entry_mod._doc_normalized),
        ("red", entry_mod._doc_redacted),
        ("rep", entry_mod._repetition_scores),
    ]:
        in_mem = fn(SF)
        stats = fn(SF, out_path=str(tmp_path / name))
        assert int(stats["rows"][0]) == len(in_mem), name
        got = (
            _read_back(str(tmp_path / name))
            .sort_values("doc_id")
            .reset_index(drop=True)[in_mem.columns]
        )
        pd.testing.assert_frame_equal(got, in_mem)


def test_sink_is_resumable_and_never_doubles_rows(entry_mod, tmp_path):
    out = tmp_path / "links"
    s1 = entry_mod._extract_links(SF, out_path=str(out))
    mtimes = {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")}
    # rerun with the marker present: skipped, stats identical, files untouched
    s2 = entry_mod._extract_links(SF, out_path=str(out))
    pd.testing.assert_frame_equal(s1, s2)
    assert {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")} == mtimes
    # simulate a run that died mid-write: marker missing, partial files left
    (out / "_SUCCESS").unlink()
    s3 = entry_mod._extract_links(SF, out_path=str(out))
    assert int(s3["rows"][0]) == int(s1["rows"][0])  # rewrite, not append
    assert (out / "_SUCCESS").exists()


@pytest.mark.usefixtures("ray_session")
def test_sink_parquet_replaces_plain_file_at_out_path(tmp_path):
    """A FILE already at out_path (e.g. a single-parquet output an older
    CLI run wrote) must be replaced, not crash rmtree with
    NotADirectoryError."""
    import ray.data as rd

    from crawler_ray.stages.output import sink_parquet

    out = tmp_path / "result.parquet"
    out.write_bytes(b"old single-file output")
    ds = rd.from_items([{"a": i} for i in range(10)])
    stats = sink_parquet(ds, str(out))
    assert stats["rows"].iloc[0] == 10
    assert (out / "_SUCCESS").exists()
