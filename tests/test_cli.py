"""The standalone pipeline CLI: registry listing, parquet writing, and
reuse of an existing Ray session (no nested init/shutdown)."""

import pyarrow.parquet as pq

from crawler_ray.cli import main


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and "docs_bpe_subwords" in names


def test_cli_runs_query_and_writes_parquet(ray_session, tmp_path, capsys):
    out = tmp_path / "ebt.parquet"
    rc = main(
        [
            "events_by_type",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    t = pq.read_table(out)
    assert t.num_rows == 5 and "event_type" in t.column_names
    import ray

    assert ray.is_initialized()  # borrowed session left intact
