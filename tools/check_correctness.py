"""Local mirror of the driver's correctness harness.

Runs the first ``--window`` entries of ``__ray_entry__.queries()`` (the
driver checks exactly the first 50, in dict order — CORRECTNESS_r03.json
recorded exactly those keys) at the given sf dir, runs the matching
``oracle_sql()`` string on DuckDB over the same parquet tables, and
compares rows / schema / values the way the driver does (columns sorted by
name before value comparison). Queries without an oracle entry are
reported ``no_oracle`` with their row count, like the driver.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01]
       [--window 50] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _normalize(df):
    import pandas as pd
    import pyarrow as pa

    if isinstance(df, pa.Table):
        df = df.to_pandas()
    if not isinstance(df, pd.DataFrame):
        raise TypeError(type(df))
    df = df[sorted(df.columns)]
    # The driver's compare is row-order-insensitive (q1 etc. were green in
    # r03 with engine/oracle ORDER BY differing): sort rows by all columns,
    # stringifying so mixed/nested dtypes stay sortable. Floats are ROUNDED
    # before stringifying for the SORT KEY only (values compared unrounded
    # with tolerance below): engine 0.30000000000000004 vs oracle 0.3 must
    # land both sides' rows in the same position or assert_frame_equal
    # compares misaligned rows and reports a spurious mismatch.
    def _sort_key(s):
        import pandas.api.types as ptypes

        if ptypes.is_float_dtype(s):
            return s.round(6).astype(str)
        return s.astype(str)

    if len(df.columns):
        df = df.sort_values(
            by=list(df.columns), key=_sort_key, kind="mergesort"
        )
    return df.reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    names = list(qs)[: args.window]
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        t0 = time.time()
        rec: dict = {}
        try:
            got = _normalize(qs[name](args.sf))
            rec["rows"] = len(got)
            sql = sqls.get(name)
            if sql is None:
                rec["status"] = "no_oracle"
            else:
                want = _normalize(con.execute(sql).df())
                rec["oracle_rows"] = len(want)
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(want.columns)
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                    )
                    rec["hash_match"] = True
                except AssertionError as e:
                    rec["hash_match"] = False
                    rec["diff"] = str(e).splitlines()[0][:200]
                rec["status"] = "OK" if rec["hash_match"] else "MISMATCH"
        except Exception as e:  # noqa: BLE001 — harness reports, not raises
            rec["status"] = f"ERROR: {type(e).__name__}: {e}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        if rec["status"] not in ("OK", "no_oracle"):
            n_bad += 1
        print(f"{name}: {rec['status']} ({rec['sec']}s)", flush=True)

    print(json.dumps({"checked": len(names), "bad": n_bad}))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
