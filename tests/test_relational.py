"""Relational conformance: every SQL-checked pipeline vs DuckDB on the
same parquet, mirroring the driver's compare (sort columns by name, sort
rows, compare values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from crawler_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"

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

CASES = [
    (R.q1_pricing_summary, R.Q1_SQL),
    (R.q3_segment_top_orders, R.Q3_SQL),
    (R.q5_region_nation_revenue, R.Q5_SQL),
    (R.part_type_stats, R.PART_TYPE_SQL),
    (R.events_by_type, R.EVENTS_BY_TYPE_SQL),
    (R.events_hourly, R.EVENTS_HOURLY_SQL),
    (R.events_first3_per_user, R.EVENTS_FIRST3_SQL),
    (R.events_user_value_topk, R.EVENTS_TOPK_SQL),
    (R.customers_without_orders, R.ANTI_JOIN_SQL),
    (R.order_status_with_lineitems, R.SEMI_JOIN_SQL),
    (R.customer_nation, R.CUSTOMER_NATION_SQL),
    (R.top_suppliers, R.TOP_SUPPLIERS_SQL),
    (R.orders_priority_counts, R.ORDERS_PRIORITY_SQL),
    (R.lang_stats, R.LANG_STATS_SQL),
    (R.docs_exact_dedup_ids, R.DEDUP_IDS_SQL),
    (R.docs_token_totals, R.TOKEN_TOTALS_SQL),
    (R.docs_punct_ratio, R.PUNCT_RATIO_SQL),
    (R.ann_cosine_topk_sql_compat, R.ANN_TOPK_SQL),
    (R.purchases_asof_click, R.ASOF_SQL),
    (R.events_error_click_window, R.RANGE_JOIN_SQL),
    (R.events_hopping_window, R.HOPPING_WINDOW_SQL),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def driver_style_compare(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g = got[sorted(got.columns)].copy()
    w = want[sorted(want.columns)].copy()
    assert len(g) == len(w), f"row count {len(g)} != {len(w)}"
    sort_cols = list(g.columns)
    g = g.sort_values(sort_cols).reset_index(drop=True)
    w = w.sort_values(sort_cols).reset_index(drop=True)
    for c in g.columns:
        gc, wc = g[c], w[c]
        if np.issubdtype(gc.dtype, np.floating) or np.issubdtype(
            wc.dtype, np.floating
        ):
            assert np.allclose(
                gc.astype(float), wc.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"float mismatch in {c}"
        else:
            same = (gc.astype(str).values == wc.astype(str).values)
            assert same.all(), f"value mismatch in {c}: {gc[~same].head()} vs {wc[~same].head()}"


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "fn,sql", CASES, ids=[fn.__name__ for fn, _ in CASES]
)
def test_matches_duckdb(con, fn, sql):
    got = fn(SF)
    want = con.execute(sql).fetchdf()
    driver_style_compare(got, want)
