"""Session windows, HLL sketches, cuckoo-backed seen set, Ray corpus gen."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from crawler_ray.functions.sketches import HyperLogLog, approx_distinct_per_group

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_events_sessions_match_duckdb():
    from crawler_ray.pipelines.relational import EVENTS_SESSIONS_SQL, events_sessions
    from tests.test_relational import driver_style_compare

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    got = events_sessions(SF)
    want = con.execute(EVENTS_SESSIONS_SQL).fetchdf()
    driver_style_compare(got, want)
    assert (got["n_events"] >= 1).all()
    assert (got["end_ts"] >= got["start_ts"]).all()


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(5)
    a = HyperLogLog(12)
    b = HyperLogLog(12)
    vals_a = [f"u{i}" for i in range(20_000)]
    vals_b = [f"u{i}" for i in range(10_000, 40_000)]  # overlap 10k-20k
    a.add(vals_a)
    b.add(vals_b)
    merged = a.merge(b)
    assert abs(a.estimate() - 20_000) / 20_000 < 0.05
    assert abs(merged.estimate() - 40_000) / 40_000 < 0.05
    # serialization round trip preserves the estimate exactly
    again = HyperLogLog.deserialize(merged.serialize())
    assert again.estimate() == merged.estimate()


def test_hll_small_range_linear_counting():
    h = HyperLogLog(12)
    h.add([f"x{i}" for i in range(50)])
    assert abs(h.estimate() - 50) <= 2


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_per_group_close_to_exact():
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    approx = approx_distinct_per_group(ds, "event_type", "user_id")
    exact = (
        ds.to_pandas().groupby("event_type")["user_id"].nunique().rename("exact")
    )
    joined = approx.set_index("event_type").join(exact)
    rel_err = (joined["approx_distinct"] - joined["exact"]).abs() / joined["exact"]
    assert (rel_err < 0.08).all()


@pytest.mark.usefixtures("ray_session")
def test_seen_set_cuckoo_backend():
    from crawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=50_000, filter_kind="cuckoo")
    try:
        keys = pa.array([f"k{i}" for i in range(5_000)])
        assert seen.probe_and_insert(keys).all()
        assert not seen.probe_and_insert(keys).any()
    finally:
        seen.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_gen_corpus_ray_matches_driver_side(tmp_path):
    import pyarrow.dataset as pads

    from crawler_ray import fixtures

    out = fixtures.gen_corpus_ray(str(tmp_path / "rayc"), n_hosts=4, pages_per_host=6)
    ray_tbl = (
        pads.dataset(out, format="parquet").to_table().sort_by([("url", "ascending")])
    )
    local_tbl = fixtures.gen_corpus(4, 6).sort_by([("url", "ascending")])
    assert ray_tbl.cast(local_tbl.schema).equals(local_tbl)


def test_histogram_sketch_quantiles_close_to_exact(ray_session):
    """Sketch quantiles within one bin width of exact, and merge order
    doesn't matter (additive counts)."""
    import numpy as np
    import ray.data as rd

    from crawler_ray.functions.sketches import (
        HistogramSketch,
        approx_quantiles_per_group,
    )

    rng = np.random.default_rng(5)
    rows = []
    vals = {"a": rng.exponential(10, 4000), "b": rng.normal(50, 5, 4000)}
    for k, v in vals.items():
        rows += [{"g": k, "v": float(x)} for x in v]
    ds = rd.from_items(rows)
    got = approx_quantiles_per_group(ds, "g", "v", qs=(0.5, 0.9), bins=4096)
    lo = min(v.min() for v in vals.values())
    hi = max(v.max() for v in vals.values())
    width = (hi - lo) / 4096
    for r in got.itertuples():
        exact = float(np.quantile(vals[r.g], r.q, method="inverted_cdf"))
        assert abs(r.value - exact) <= width + 1e-9, (r, exact)

    # mergeability: (A + B) == (B + A), and equals one-shot
    h1 = HistogramSketch(0.0, 100.0, 64)
    h2 = HistogramSketch(0.0, 100.0, 64)
    a, b = rng.uniform(0, 100, 500), rng.uniform(0, 100, 500)
    h1.add(a)
    h2.add(b)
    one = HistogramSketch(0.0, 100.0, 64)
    one.add(np.concatenate([a, b]))
    m12 = h1.merge(h2)
    m21 = HistogramSketch.deserialize(h2.serialize()).merge(h1)
    assert (m12.counts == one.counts).all()
    assert (m21.counts == one.counts).all()


def test_with_prefix_max_exclusive_scan(ray_session):
    """Distributed exclusive prefix max: first row NULL, ties/decreases
    carry the running max, block count must not matter."""
    import pandas as pd
    import ray.data as rd

    from crawler_ray.stages.shuffle import with_prefix_max

    vals = [5, 3, 9, 9, 1, 12, 2]
    rows = [{"seq": i, "v": v} for i, v in enumerate(vals)]
    want = [None, 5, 5, 9, 9, 9, 12]
    for par in (1, 3, 7):
        out = (
            with_prefix_max(
                rd.from_items(rows, override_num_blocks=par),
                order_col="seq", value_col="v", out_col="pm",
            )
            .to_pandas()
            .sort_values("seq")
        )
        got = [None if pd.isna(x) else int(x) for x in out["pm"]]
        assert got == want, (par, got)
