"""Distributed-output contract for corpus-sized query results.

At sf test scale every query can return a pandas frame; at the 100 TB
design point a per-doc result IS the corpus — it must stream to
partitioned parquet, with only file-level stats landing on the driver.
``sink_parquet`` is that contract: a streaming ``Dataset.write_parquet``
(workers write blocks directly, nothing corpus-sized crosses the driver)
plus a ``_SUCCESS`` marker and a stats row assembled from parquet FOOTER
metadata (row counts read per file without touching data pages).

Idempotent/resumable at query granularity: a sink whose ``_SUCCESS``
marker already exists is skipped and its stats are recomputed from the
files on disk — a failed multi-query run re-executes only the sinks that
never finished (the same marker discipline the crawl's per-wave
``_COMPLETE`` checkpoints use, crawl.py).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd


def _stats_from_dir(out: Path) -> pd.DataFrame:
    import pyarrow.parquet as pq

    files = sorted(p for p in out.rglob("*.parquet"))
    rows = 0
    nbytes = 0
    for f in files:
        rows += pq.ParquetFile(f).metadata.num_rows  # footer only
        nbytes += f.stat().st_size
    return pd.DataFrame(
        {
            "path": [str(out)],
            "rows": pd.array([rows], dtype="int64"),
            "files": pd.array([len(files)], dtype="int64"),
            "bytes": pd.array([nbytes], dtype="int64"),
        }
    )


def sink_parquet(
    ds,
    out_path: str,
    partition_cols: "list[str] | None" = None,
) -> pd.DataFrame:
    """Write ``ds`` (a ray.data.Dataset) to ``out_path`` as (optionally
    hive-partitioned) parquet, streaming — and return a ONE-ROW stats
    frame ``(path, rows, files, bytes)``. If ``out_path/_SUCCESS`` already
    exists the write is skipped (resume semantics) and stats come from the
    existing files."""
    out = Path(out_path)
    marker = out / "_SUCCESS"
    if not marker.exists():
        if out.exists():
            # a previous attempt died mid-write: clear its partial files so
            # the rerun can't double rows. The path may also be a plain
            # FILE (e.g. a single-parquet output a non-sink run left at
            # the same path) — rmtree would raise NotADirectoryError.
            import shutil

            if out.is_dir():
                shutil.rmtree(out)
            else:
                out.unlink()
        out.mkdir(parents=True, exist_ok=True)
        if partition_cols:
            ds.write_parquet(str(out), partition_cols=list(partition_cols))
        else:
            ds.write_parquet(str(out))
        marker.touch()
    return _stats_from_dir(out)
