"""Run any registered pipeline from the command line.

``python -m crawler_ray.cli <query> --sf-dir <tables-dir> [--out <path>]``
runs one named pipeline from the driver contract's registry
(``__ray_entry__.queries()``) over a directory of the standard tables
(region … documents, embeddings) and writes the result as Parquet (or
prints a preview when ``--out`` is omitted). ``--list`` enumerates the
registry. This is the switch-over surface for reference users: every
operator the engine implements is runnable standalone, not only through
the test driver.

Owns its Ray session (guarded init, shutdown on exit) — the library
functions themselves never call ``ray.init``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _load_registry():
    """Import the repo-root driver contract module. It lives next to the
    package (the driver requires that layout), so make sure the repo root
    is importable no matter where the CLI is launched from."""
    root = str(Path(__file__).resolve().parent.parent)
    if root not in sys.path:
        sys.path.insert(0, root)
    import __ray_entry__ as entry

    return entry


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Run a registered crawler_ray pipeline standalone"
    )
    ap.add_argument("query", nargs="?", help="pipeline name (see --list)")
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory holding the standard parquet tables",
    )
    ap.add_argument(
        "--out", default=None, help="output parquet path (default: preview)"
    )
    ap.add_argument(
        "--list", action="store_true", help="list registered pipelines"
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    entry = _load_registry()
    registry = entry.queries()
    if args.list or not args.query:
        for name in sorted(registry):
            print(name)
        return 0
    if args.query not in registry:
        ap.error(
            f"unknown query {args.query!r}; run with --list to enumerate"
        )

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    try:
        fn = registry[args.query]
        import inspect

        if args.out and "out_path" in inspect.signature(fn).parameters:
            # corpus-sized queries expose the streaming-sink contract:
            # workers write partitioned parquet directly, only a one-row
            # stats frame reaches the driver — use it rather than
            # gathering the whole result here
            stats = fn(args.sf_dir, out_path=args.out)
            print(stats.to_string())
            return 0
        result = fn(args.sf_dir)
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        if isinstance(result, pd.DataFrame):
            table = pa.Table.from_pandas(result, preserve_index=False)
        elif isinstance(result, pa.Table):
            table = result
        else:  # ray.data.Dataset
            table = pa.concat_tables(
                [b for b in result.iter_batches(batch_format="pyarrow")]
            )
        if args.out:
            pq.write_table(table, args.out)
            print(f"{args.query}: wrote {table.num_rows} rows -> {args.out}")
        else:
            df = table.to_pandas()
            print(df.head(20).to_string())
            print(f"[{table.num_rows} rows x {table.num_columns} cols]")
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
