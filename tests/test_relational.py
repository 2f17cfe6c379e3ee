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
    (R.events_props_stats, R.PROPS_STATS_SQL),
    (R.events_value_quantiles, R.QUANTILES_SQL),
    (R.events_user_running_total, R.RUNNING_TOTAL_SQL),
    (R.doc_tfidf_topk, R.TFIDF_SQL),
    (R.docs_split_assign, R.DOCS_SPLIT_SQL),
    (R.docs_pack_chunks, R.PACK_CHUNKS_SQL),
    (R.docs_stratified_sample, R.STRATIFIED_SAMPLE_SQL),
    (R.events_late_arrivals, R.LATE_ARRIVALS_SQL),
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


@pytest.mark.usefixtures("ray_session")
def test_range_join_boundaries(tmp_path):
    """Exact-boundary semantics the random testdata never hits: a click at
    ts+window is excluded (half-open), at ts included, and an error whose
    window straddles a time-bucket boundary still counts clicks on both
    sides."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    W = 5 * 60 * 1_000_000  # the operator's 5-min window in µs
    base = 3 * W + 1234  # error NOT on a bucket boundary; window straddles
    rows = {
        "event_id": [0, 1, 2, 3, 4, 5, 6],
        "ts": [
            base,          # error
            base,          # click at exactly error.ts -> counted
            base + W - 1,  # click at last µs of window -> counted
            base + W,      # click at exactly ts+W -> excluded
            (base // W + 1) * W,  # click just over the bucket line -> counted
            4 * W,         # error exactly ON a bucket boundary
            4 * W + W,     # click at its ts+W -> excluded
        ],
        "user_id": [1] * 7,
        "event_type": ["error", "click", "click", "click", "click", "error", "click"],
        "value": [0.0] * 7,
        "props": ["{}"] * 7,
    }
    t = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"]),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = R.events_error_click_window(str(d))
    by_id = dict(zip(got["event_id"], got["n_clicks"]))
    # error 0: clicks 1, 2, 4 (straddles the bucket line); click 3 at
    # exactly ts+W is excluded (half-open)
    assert by_id[0] == 3
    # error 5 on the boundary [4W, 5W): clicks 2, 3, 4 count; click 6 at 5W no
    assert by_id[5] == 3


@pytest.mark.usefixtures("ray_session")
def test_hopping_window_boundary(tmp_path):
    """An event exactly on a hop boundary belongs to exactly size/hop
    windows, the newest starting at its own timestamp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    HOP = 15 * 60 * 1_000_000
    t = pa.table(
        {
            "event_id": pa.array([0], pa.int64()),
            "ts": pa.array([8 * HOP], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([2.5], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = R.events_hopping_window(str(d))
    starts = (got["window_start"].astype("int64") // HOP).tolist()
    assert starts == [5, 6, 7, 8] and (got["n"] == 1).all()
    assert (got["total_value"] == 2.5).all()


@pytest.mark.usefixtures("ray_session")
def test_unimax_budget_null_lang_group(tmp_path):
    """A corpus with NULL-lang docs: SQL's GROUP BY keeps the NULL group
    and its tokens count against the 1.5x budget, so the engine must too
    (pandas groupby dropna=False). Engine vs the recursive-CTE oracle on
    the same table, bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    texts = [
        "one two three",          # lang en
        "uno dos",                # lang es
        None,                     # NULL lang, NULL text -> 0 tokens
        "a b c d e f g h",        # NULL lang, 8 tokens
        "x y",                    # lang en
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "lang": pa.array(["en", "es", None, None, "en"], pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = R.docs_unimax_budget(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["docs_unimax_budget"]).df()
    assert len(got) == 3  # en, es, and the NULL group
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
