"""Relational operator building blocks + conformance pipelines over the
driver testdata tables (TPC-H-ish star schema, events, documents,
embeddings). These back the SQL-checked ``queries()`` in __ray_entry__.py.

Patterns (each used by several pipelines):
- **partial aggregation**: per-batch pandas groupby inside ``map_batches``
  emits one partial row per key per batch, then a small ``groupby`` over
  partials — rows crossing the shuffle = keys×blocks, not input rows.
- **broadcast join**: the small side is ``ray.put`` once and merged per
  batch; no shuffle. Used for all dimension joins (region/nation/customer)
  and for semi/anti joins via broadcast key sets.
- **top-k**: per-batch partial top-k, then a driver merge of k×blocks
  rows; ordering keys always include a unique tiebreaker and any float
  sort key is rounded identically in the SQL oracle so the k-boundary is
  deterministic.

Float policy for oracle comparison: every aggregated double is rounded
(2dp money, 6dp ratios, 4dp cosine) in BOTH the Ray pipeline and the SQL
text, so double-summation-order differences can't flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_pd(sf_dir: str, table: str, columns=None) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


def bjoin(ds, small: pd.DataFrame, on, how: str = "inner"):
    """Broadcast hash join: small side shipped once via the object store."""
    import ray

    ref = ray.put(small)

    def j(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(j, batch_format="pandas", batch_size=65536)


def partial_sum_count(ds, keys: list[str], sum_cols: dict[str, str], count_name: str | None = None):
    """Two-phase grouped sums at any key cardinality: per-batch pandas
    partials (combiner) → bucketed hash shuffle → vectorized final merge
    (see stages/shuffle.py for why plain Ray groupby.aggregate is avoided).
    sum_cols: {output_name: input_column}. Returns a pandas DataFrame."""
    from ..stages.shuffle import bucketed_group_agg

    agg: dict[str, tuple[str, str]] = {
        out: (col, "sum") for out, col in sum_cols.items()
    }
    if count_name:
        agg[count_name] = (keys[0], "size")
    return bucketed_group_agg(ds, keys, agg)


# ------------------------------------------------------------------ TPC-Hish


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _rp(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        # per-row money rounding BEFORE summation (mirrored in the SQL):
        # keeps both engines' sums on the cent grid so the final 2dp round
        # can't flip on double summation-order differences
        disc_price = pc.round(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            ndigits=2,
            round_mode="half_towards_infinity",
        )
        charge = pc.round(
            pc.multiply(disc_price, pc.add(pa.scalar(1.0), t["l_tax"])),
            ndigits=2,
            round_mode="half_towards_infinity",
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "l_discount": t["l_discount"],
                "disc_price": disc_price,
                "charge": charge,
            }
        )

    df = partial_sum_count(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": "l_quantity",
            "sum_base_price": "l_extendedprice",
            "sum_disc_price": "disc_price",
            "sum_charge": "charge",
            "sum_disc": "l_discount",
        },
        count_name="count_order",
    )
    df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(6)
    df["avg_price"] = (df["sum_base_price"] / df["count_order"]).round(6)
    df["avg_disc"] = (df["sum_disc"] / df["count_order"]).round(6)
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
        df[c] = df[c].round(2)
    df = df.drop(columns=["sum_disc"])
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(round(l_extendedprice * (1 - l_discount), 2)), 2)      AS sum_disc_price,
       round(sum(round(round(l_extendedprice * (1 - l_discount), 2) * (1 + l_tax), 2)), 2) AS sum_charge,
       count(*)                                                         AS count_order,
       round(sum(l_quantity) / count(*), 6)                             AS avg_qty,
       round(sum(l_extendedprice) / count(*), 6)                        AS avg_price,
       round(sum(l_discount) / count(*), 6)                             AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_segment_top_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> pd.DataFrame:
    """Fact⋈fact as a bucketed hash join on the order key, fused with the
    per-order revenue aggregate inside the bucket (all lineitems of an
    order co-locate, so the grouped sum finishes bucket-locally). Only the
    segment-filtered CUSTOMER key list is broadcast (a dimension-sized
    side); orders and lineitem both stream — nothing fact-sized touches
    the driver. The driver merges k rows per bucket task output."""
    from ..stages.shuffle import bucketed_join

    cust = _read_pd(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust[cust["c_mktsegment"] == segment][["c_custkey"]]
    orders_ds = bjoin(
        _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        cust.rename(columns={"c_custkey": "o_custkey"}),
        on="o_custkey",
    ).map_batches(
        lambda df: df[["o_orderkey", "o_orderdate"]],
        batch_format="pandas",
        batch_size=65536,
    )
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        df["revenue"] = np.floor(rev * 100 + 0.5) / 100  # cent grid, half-up
        return df[["l_orderkey", "revenue"]]

    def order_revenue(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["l_orderkey", "o_orderdate"], sort=False)["revenue"]
            .sum()
            .reset_index()
        )
        # round before the partial top-k so partial and final use the same
        # (revenue, orderkey) ordering at the k boundary; half-up on the
        # cent grid to match DuckDB round() (pandas .round is half-even)
        out["revenue"] = np.floor(out["revenue"] * 100 + 0.5) / 100
        return out.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True]
        ).head(k)

    joined = bucketed_join(
        li.map_batches(prep, batch_format="pandas", batch_size=65536),
        orders_ds,
        left_on="l_orderkey",
        right_on="o_orderkey",
        post=order_revenue,
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue", pa.float64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))]
        ),
    )
    agg = joined.to_pandas().rename(columns={"l_orderkey": "o_orderkey"})
    return (
        agg.sort_values(["revenue", "o_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["o_orderkey", "o_orderdate", "revenue"]]
    )


Q3_SQL = """
SELECT o_orderkey, o_orderdate,
       round(sum(round(l_extendedprice * (1 - l_discount), 2)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_region_nation_revenue(sf_dir: str, region: str = "ASIA") -> pd.DataFrame:
    """Star join at scale shape: region⋈nation (tiny dims) merge on the
    driver; the region-filtered customer list is DIMENSION-sized (~|cust|/5)
    so it broadcast-joins onto orders (`bjoin`: one `ray.put`, probed per
    batch) — only lineitem⋈orders, the single fact⋈fact edge, pays a
    bucketed all-to-all. The fact join fuses the per-nation revenue partial
    inside each bucket, so the driver only merges nations×buckets partial
    rows. (r2 used a second bucketed join for orders⋈customer — four
    all-to-alls, 2.5× slower for a dimension-sized right side.)"""
    from ..stages.shuffle import bucketed_join

    reg = _read_pd(sf_dir, "region")
    nat = _read_pd(sf_dir, "nation")
    dims = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    dims = dims[dims["r_name"] == region][["n_nationkey", "n_name"]]
    cust = _read_pd(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust.merge(
        dims.rename(columns={"n_nationkey": "c_nationkey"}), on="c_nationkey"
    )[["c_custkey", "n_name"]]
    orders_ds = bjoin(
        _rp(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust.rename(columns={"c_custkey": "o_custkey"}),
        on="o_custkey",
    ).map_batches(
        lambda df: df[["o_orderkey", "n_name"]],
        batch_format="pandas",
        batch_size=65536,
    )
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        df["revenue"] = np.floor(rev * 100 + 0.5) / 100  # cent grid, half-up
        return df[["l_orderkey", "revenue"]]

    def nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", sort=False)["revenue"].sum().reset_index()

    joined = bucketed_join(
        li.map_batches(prep, batch_format="pandas", batch_size=65536),
        orders_ds,
        left_on="l_orderkey",
        right_on="o_orderkey",
        post=nation_partial,
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue", pa.float64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("n_name", pa.string())]
        ),
    )
    agg = (
        joined.to_pandas()
        .groupby("n_name", sort=False)["revenue"]
        .sum()
        .reset_index()
    )
    agg["revenue"] = np.floor(agg["revenue"] * 100 + 0.5) / 100  # half-up
    return agg.sort_values("n_name").reset_index(drop=True)


Q5_SQL = """
SELECT n_name, round(sum(round(l_extendedprice * (1 - l_discount), 2)), 2) AS revenue
FROM region JOIN nation   ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    from ..stages.shuffle import bucketed_group_agg

    ds = _rp(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])
    df = bucketed_group_agg(
        ds,
        ["p_type"],
        {
            "sum_price": ("p_retailprice", "sum"),
            "n_parts": ("p_retailprice", "size"),
            "max_size": ("p_size", "max"),
        },
    )
    df["avg_retail"] = (df["sum_price"] / df["n_parts"]).round(6)
    df = df.drop(columns=["sum_price"])
    return df.sort_values("p_type").reset_index(drop=True)


PART_TYPE_SQL = """
SELECT p_type, count(*) AS n_parts, max(p_size) AS max_size,
       round(sum(p_retailprice) / count(*), 6) AS avg_retail
FROM part GROUP BY p_type
"""


# ------------------------------------------------------------------- events


def events_by_type(sf_dir: str) -> pd.DataFrame:
    df = partial_sum_count(
        _rp(sf_dir, "events", ["event_type", "value"]),
        ["event_type"],
        {"total_value": "value"},
        count_name="n",
    )
    df["total_value"] = df["total_value"].round(2)
    return df.sort_values("event_type").reset_index(drop=True)


EVENTS_BY_TYPE_SQL = """
SELECT event_type, round(sum(value), 2) AS total_value, count(*) AS n
FROM events GROUP BY event_type
"""


def events_hourly(sf_dir: str) -> pd.DataFrame:
    from ..stages.shuffle import bucketed_group_agg

    ds = _rp(sf_dir, "events", ["ts"])
    hourly = ds.map_batches(
        lambda df: pd.DataFrame({"hour": df["ts"].dt.floor("h")}),
        batch_format="pandas",
        batch_size=65536,
    )
    df = bucketed_group_agg(hourly, ["hour"], {"n": ("hour", "size")})
    return df.sort_values("hour").reset_index(drop=True)


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS n
FROM events GROUP BY 1
"""


def events_hopping_window(
    sf_dir: str, size_min: int = 60, hop_min: int = 15
) -> pd.DataFrame:
    """Sliding/hopping WINDOW AGGREGATE (the streaming-window shape):
    count + value sum per [start, start+size) window at hop boundaries.
    An event at ts belongs to exactly size/hop windows, so one vectorized
    ``np.repeat``/arange explode replicates each event to its windows,
    per-batch partials combine, and ONE bucketed exchange merges — the
    same partial-agg shuffle as every grouped operator here, just with
    window replication as the (linear, size/hop-bounded) fan-out."""
    assert size_min % hop_min == 0, "window size must be a hop multiple"
    reps = size_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    ds = _rp(sf_dir, "events", ["ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        val = t["value"].to_numpy()
        hb = ts // hop_us
        wb = (hb[:, None] - np.arange(reps - 1, -1, -1)[None, :]).reshape(-1)
        return pa.table(
            {
                "window_start": pa.array(wb * hop_us, pa.int64()),
                "value": pa.array(np.repeat(val, reps), pa.float64()),
            }
        )

    df = partial_sum_count(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["window_start"],
        {"total_value": "value"},
        count_name="n",
    )
    df["window_start"] = pd.to_datetime(df["window_start"], unit="us").astype(
        "datetime64[us]"
    )
    df["total_value"] = df["total_value"].round(2)
    return (
        df[["window_start", "n", "total_value"]]
        .sort_values("window_start")
        .reset_index(drop=True)
    )


def doc_tfidf_topk(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Corpus-statistics operator: top-k TF-IDF terms per document.

    Distributed shape — TWO bucketed exchanges total:
      1. token-keyed: term counts (tf) AND document frequencies (df) are
         both token-local after the exchange, so the tf table, the df
         aggregate and their join all happen inside one bucket task;
      2. doc-keyed: per-document top-k (sort + grouped head, vectorized).
    IDF uses the ratio form (N+1)/(df+1) — pure IEEE division, so the
    DuckDB oracle reproduces it bit-for-bit (no libm transcendentals)."""
    from ..stages.shuffle import bucketed_group_map

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata count

    def explode(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas().fillna("").str.lower().str.split()
        toks = texts.explode().dropna()
        ids = t["doc_id"].to_numpy()[toks.index.to_numpy()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "tok": pa.array(toks.to_numpy(), pa.string()),
            }
        )

    def tf_df(df: pd.DataFrame) -> pd.DataFrame:
        tf = df.groupby(["tok", "doc_id"], sort=False).size().reset_index(name="tf")
        dfreq = (
            tf.groupby("tok", sort=False)["doc_id"].size().reset_index(name="df")
        )
        return tf.merge(dfreq, on="tok")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = df["tf"] * ((n_docs + 1.0) / (df["df"] + 1.0))
        out = (
            df.sort_values(
                ["doc_id", "score", "tok"], ascending=[True, False, True]
            )
            .groupby("doc_id", sort=False)
            .head(k)
        )
        # half-up to match DuckDB round(); pandas .round is half-even and
        # diverges on exact .5 boundaries (scores are always positive)
        out["score"] = np.floor(out["score"] * 1e6 + 0.5) / 1e6
        return out[["doc_id", "tok", "tf", "score"]]

    scored = bucketed_group_map(
        ds.map_batches(explode, batch_format="pyarrow"), "tok", tf_df
    )
    out = bucketed_group_map(scored, "doc_id", topk).to_pandas()
    return (
        out.astype({"doc_id": "int64", "tf": "int64", "score": "float64"})
        .sort_values(["doc_id", "score", "tok"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def docs_split_assign(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split (80/10/10) by multiplicative
    hash of the id — the standard reproducible-split pattern for training
    corpora (content-independent, stable across runs and partitionings,
    no shuffle: pure per-row map). Knuth multiplicative hash over Z/2^32:
    h = ((id mod 2^32) * 2654435761 mod 2^32) mod 10 — the mod-2^32
    BEFORE the multiply makes the product fit uint64 exactly for every
    int64 id (multiplication is a ring homomorphism mod 2^32), and the
    SQL oracle computes the identical value via HUGEINT."""
    ds = _rp(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = (
            (ids.astype(np.uint64) % np.uint64(2**32))
            * np.uint64(2654435761)
            % np.uint64(2**32)
            % np.uint64(10)
        )
        split = np.where(h < 8, "train", np.where(h == 8, "val", "test"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    out = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_SPLIT_SQL = """
WITH h AS (
  SELECT doc_id,
         CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
              % 4294967296 % 10 AS BIGINT) AS hv
  FROM documents
)
SELECT doc_id,
       CASE WHEN hv < 8 THEN 'train'
            WHEN hv = 8 THEN 'val'
            ELSE 'test' END AS split
FROM h ORDER BY doc_id
"""


def docs_pack_chunks(sf_dir: str, capacity: int = 2048) -> pd.DataFrame:
    """Training-sequence packing: assign doc_id-ordered documents to
    fixed-capacity token chunks — chunk_id = exclusive-prefix-sum(tokens)
    // capacity, the contiguous-stream packing used when concatenating a
    corpus into fixed-length examples. The cumulative sum needs a TOTAL
    order, which no per-batch operator can see; it runs on the
    ``with_prefix_sum`` two-phase parallel scan (per-block sums → O(blocks)
    driver prefix → per-block offsets), so the data never funnels through
    one task."""
    from ..stages.shuffle import with_prefix_sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pandas().fillna("")
        n = texts.str.split().map(len).to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "ws_tokens": pa.array(n, pa.int64()),
            }
        )

    scanned = with_prefix_sum(
        ds.map_batches(tokens, batch_format="pyarrow"),
        order_col="doc_id",
        value_col="ws_tokens",
        out_col="cum_before",
    )
    out = scanned.to_pandas()
    out["chunk_id"] = out["cum_before"] // capacity
    return (
        out[["doc_id", "ws_tokens", "chunk_id"]]
        .astype("int64")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def docs_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified (mixture-weight) sampling — the
    language-rebalancing step of corpus curation: keep 100% of en, 50% of
    fr, 25% of de, 10% of anything else, decided per row by the same
    mod-2^32 multiplicative hash as the split operator (content-independent
    and reproducible; no shuffle, no RNG state). Vectorized rate lookup +
    one filter per batch."""
    rates = {"en": 100, "fr": 50, "de": 25}
    default_rate = 10
    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = (
            (ids.astype(np.uint64) % np.uint64(2**32))
            * np.uint64(2654435761)
            % np.uint64(2**32)
            % np.uint64(100)
        )
        langs = t["lang"].to_pandas()
        rate = langs.map(rates).fillna(default_rate).to_numpy(dtype=np.uint64)
        return t.filter(pa.array(h < rate))

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_temperature_sample(sf_dir: str, alpha: float = 0.7) -> pd.DataFrame:
    """Temperature-based mixture sampling across sources (the Gopher/Pile
    α-reweighting): source ``s`` with ``n_s`` docs keeps a fraction
    ``∝ n_s^(α-1)`` — normalized so the rarest source keeps 100% — which
    flattens the source distribution toward uniform as α→0 and keeps it
    natural at α=1. Keep-decisions are per-row deterministic (same mod-2^32
    multiplicative hash as the split/stratified operators), so the sample
    is reproducible and shuffle-free.

    Two passes: a per-batch source-count combiner folds to the tiny
    per-source table on the driver (sources ≪ corpus), thresholds are
    quantized to a 1e-6 grid (absorbing pow() ULP differences between
    engines), then one stateless filter pass. The DuckDB oracle restates
    both passes in SQL with the exponent spelled ``0.7 - 1.0`` so both
    engines raise to the SAME double (the literal ``-0.3`` is a different
    binary value from ``0.7 - 1.0``); the oracle therefore describes the
    default α only.

    The sf* fixtures have perfectly BALANCED sources (uniform n_s ⇒ every
    rate is 1.0 and the oracle would be trivially the whole table), so the
    query first tiers the 20 sources into a skewed 14/5/1 mixture
    (web/books/code — same CASE in the SQL oracle), making the thresholds
    and the sample genuinely non-uniform."""
    ds = _rp(sf_dir, "documents", ["doc_id", "source"])

    def tier(t: pa.Table) -> pa.Table:
        suffix = pc.cast(
            pc.utf8_slice_codeunits(t["source"], 3, 99), pa.int64()
        )
        src = pc.if_else(
            pc.less(suffix, 14),
            pa.scalar("web"),
            pc.if_else(pc.less(suffix, 19), pa.scalar("books"), pa.scalar("code")),
        )
        return pa.table({"doc_id": t["doc_id"], "source": src})

    ds = ds.map_batches(tier, batch_format="pyarrow")

    def count_sources(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["source"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"source": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())}
        )

    counts = (
        ds.map_batches(count_sources, batch_format="pyarrow")
        .to_pandas()
        .groupby("source", sort=True)["n"]
        .sum()
    )
    w = np.power(counts.to_numpy(np.float64), alpha - 1.0)
    thr = np.floor(1e6 * w / w.max() + 0.5).astype(np.int64)
    thresholds = dict(zip(counts.index, thr))

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = (
            (ids.astype(np.uint64) % np.uint64(2**32))
            * np.uint64(2654435761)
            % np.uint64(2**32)
            % np.uint64(1_000_000)
        )
        src = t["source"].to_pandas()
        lim = src.map(thresholds).to_numpy(dtype=np.int64)
        return t.filter(pa.array(h.astype(np.int64) < lim))

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_mixture_budget_sample(sf_dir: str) -> pd.DataFrame:
    """Token-budget mixture allocation — the data-mixing step of training
    prep (fixed-weight recipes a la The Pile / DoReMi baselines): target
    token shares web 0.5 / books 0.3 / code 0.2 over a budget of 40% of
    the corpus' whitespace tokens. Source ``s`` keeps rate_s =
    min(1, budget*w_s / tokens_s): an oversubscribed target (code here —
    its natural share is below its target share) clamps to keeping
    everything, the rest downsample deterministically with the same
    mod-2^32 multiplicative hash as the split/stratified/temperature
    samplers (reproducible, shuffle-free). Two passes: a per-batch
    source-token combiner folds to the source-cardinality table on the
    driver, thresholds quantize to the 1e-6 grid, one stateless filter
    pass. The DuckDB oracle restates both passes with the SAME operation
    order (budget*w then /tokens) so the doubles round identically."""
    ds = _rp(sf_dir, "documents", ["doc_id", "source", "text"])

    def tier_tok(df: pd.DataFrame) -> pd.DataFrame:
        suffix = df["source"].str.slice(3).astype("int64")
        src = np.where(
            suffix < 14, "web", np.where(suffix < 19, "books", "code")
        )
        toks = df["text"].fillna("").str.split().str.len().astype("int64")
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "source": src, "ws_tokens": toks}
        )

    ds = ds.map_batches(tier_tok, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", sort=False)["ws_tokens"].sum().reset_index()

    tok = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("source", sort=True)["ws_tokens"]
        .sum()
    )
    budget = float(tok.sum()) * 0.4
    weights = {"web": 0.5, "books": 0.3, "code": 0.2}
    thr = {
        s: int(np.floor(1e6 * min(1.0, (budget * weights[s]) / float(t)) + 0.5))
        for s, t in tok.items()
    }

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        h = (
            (ids.astype(np.uint64) % np.uint64(2**32))
            * np.uint64(2654435761)
            % np.uint64(2**32)
            % np.uint64(1_000_000)
        ).astype(np.int64)
        lim = df["source"].map(thr).to_numpy(dtype=np.int64)
        return df[h < lim]

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_unimax_budget(
    sf_dir: str, budget_factor: float = 1.5, max_epochs: float = 2.0
) -> pd.DataFrame:
    """UniMax language-budget allocation (Chung et al., ICLR 2023) — the
    published successor to temperature sampling for multilingual mixing:
    languages are visited in ASCENDING corpus-size order and each gets
    ``min(max_epochs · size, remaining_budget / languages_left)`` tokens,
    so no language repeats more than ``max_epochs`` times and leftover
    budget flows to the bigger languages (waterfilling). With budget =
    1.5× total tokens and cap 2, the sf* language mix exercises BOTH
    branches: small languages hit the epoch cap, large ones the budget
    split.

    Ray shape: ONE per-batch (lang → n_docs, Σtokens) combiner folds to
    the language-cardinality table on the driver (langs ≪ corpus); the
    sequential fold is language-scale driver math, mirrored operation-
    for-operation by the SQL oracle's recursive CTE so the doubles agree
    bit-for-bit (``max_epochs·c`` vs ``rem/(k-i)`` in the same order).
    Outputs (lang, n_docs, n_tokens, quota_tokens, epochs) sorted by
    lang, quota/epochs rounded half-up at 6 dp. The realized per-doc
    sample for a fractional epoch would reuse the shared multiplicative
    hash (stratified/temperature/mixture samplers above); the allocation
    IS UniMax's contribution, so that is what this query states."""
    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split().str.len().astype("int64")
        return (
            # dropna=False: a NULL lang is a GROUP (the SQL oracle's
            # GROUP BY keeps it and its tokens count against the budget);
            # pandas' default would silently drop those rows and the
            # allocation would diverge on a corpus with untagged docs
            pd.DataFrame({"lang": df["lang"], "t": toks})
            .groupby("lang", sort=False, dropna=False)
            .agg(n_docs=("t", "size"), n_tokens=("t", "sum"))
            .reset_index()
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("lang", sort=True, dropna=False)
        .sum()
        .reset_index()
    )
    # pandas carries the null group key as NaN; surface it as None so the
    # output column matches the oracle's NULL (and stays a string column)
    agg["lang"] = agg["lang"].astype(object).where(agg["lang"].notna(), None)
    # ascending size, ties by lang — the paper's visit order
    agg = agg.sort_values(["n_tokens", "lang"]).reset_index(drop=True)
    rem = float(agg["n_tokens"].sum()) * budget_factor
    k = len(agg)
    quotas: list[float] = []
    for i in range(k):
        c = float(agg["n_tokens"].iloc[i])
        q = min(max_epochs * c, rem / (k - i))
        quotas.append(q)
        rem -= q
    qa = np.asarray(quotas, np.float64)
    tok = agg["n_tokens"].to_numpy(np.float64)
    agg["quota_tokens"] = np.floor(qa * 1e6 + 0.5) / 1e6
    with np.errstate(invalid="ignore", divide="ignore"):
        ep = np.where(tok > 0, qa / tok, 0.0)
    agg["epochs"] = np.floor(ep * 1e6 + 0.5) / 1e6
    return (
        agg[["lang", "n_docs", "n_tokens", "quota_tokens", "epochs"]]
        .astype({"n_docs": "int64", "n_tokens": "int64"})
        .sort_values("lang")
        .reset_index(drop=True)
    )


UNIMAX_BUDGET_SQL = r"""
WITH RECURSIVE counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(
             regexp_split_to_array(coalesce(text, ''), '\s+'),
             x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
ordered AS (
  SELECT lang, n_docs, n_tokens,
         CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS k,
         CAST(sum(n_tokens) OVER () AS DOUBLE) * 1.5 AS budget
  FROM counts
),
alloc(rn, rem, lang, n_docs, n_tokens, quota) AS (
  SELECT CAST(0 AS BIGINT), (SELECT any_value(budget) FROM ordered),
         CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
  UNION ALL
  SELECT o.rn,
         a.rem - least(2.0 * o.n_tokens, a.rem / (o.k - o.rn + 1)),
         o.lang, o.n_docs, o.n_tokens,
         least(2.0 * o.n_tokens, a.rem / (o.k - o.rn + 1))
  FROM alloc a JOIN ordered o ON o.rn = a.rn + 1
)
SELECT lang, n_docs, n_tokens,
       floor(quota * 1e6 + 0.5) / 1e6 AS quota_tokens,
       floor(CASE WHEN n_tokens > 0 THEN quota / n_tokens ELSE 0.0 END
             * 1e6 + 0.5) / 1e6 AS epochs
FROM alloc WHERE rn > 0
ORDER BY lang
"""


def docs_global_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic GLOBAL training-order shuffle: every doc gets a
    reproducible position = its rank under the mod-2^64 multiplicative
    hash (an odd-constant multiply mod 2^64 is a BIJECTION over the full
    uint64 id domain — unlike a mod-2^32 reduction, which would collide
    ids ≥ 2^32 at the 10^10-doc design point — so ranks are unique without
    tie-breaks and the shuffle is seedable/resumable, unlike
    ``random_shuffle``'s RNG state). The rank assignment is the
    ``with_prefix_sum`` two-phase scan: range-partitioned sort on the hash,
    per-block counts, O(blocks) driver cumsum, per-block position fill —
    nothing corpus-sized on the driver; at scale the output would
    ``write_parquet`` in position order as the training manifest."""
    from ..stages.shuffle import with_prefix_sum

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(2654435761)  # mod 2^64
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(h, pa.uint64()),
                "one": pa.array(np.ones(len(ids), np.int64)),
            }
        )

    out = (
        with_prefix_sum(
            ds.map_batches(add_hash, batch_format="pyarrow"),
            order_col="h",
            value_col="one",
            out_col="shuffle_pos",
        )
        .map_batches(
            lambda t: t.select(["doc_id", "shuffle_pos"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


GLOBAL_SHUFFLE_SQL = """
WITH h AS (
  SELECT doc_id,
         (CAST(doc_id AS HUGEINT) * 2654435761)
           % 18446744073709551616 AS hv
  FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY hv) - 1 AS BIGINT) AS shuffle_pos
FROM h
ORDER BY doc_id
"""


TEMPERATURE_SAMPLE_SQL = """
WITH tiered AS (
  SELECT doc_id,
         CASE WHEN CAST(substr(source, 4) AS BIGINT) < 14 THEN 'web'
              WHEN CAST(substr(source, 4) AS BIGINT) < 19 THEN 'books'
              ELSE 'code' END AS source
  FROM documents
),
c AS (SELECT source, count(*) AS n FROM tiered GROUP BY source),
w AS (SELECT source, pow(CAST(n AS DOUBLE), 0.7 - 1.0) AS wv FROM c),
thr AS (
  SELECT source,
         CAST(floor(1e6 * wv / (SELECT max(wv) FROM w) + 0.5) AS BIGINT) AS t
  FROM w
)
SELECT d.doc_id, d.source
FROM tiered d JOIN thr USING (source)
WHERE CAST((CAST(d.doc_id % 4294967296 AS HUGEINT) * 2654435761)
           % 4294967296 % 1000000 AS BIGINT) < thr.t
ORDER BY d.doc_id
"""


MIXTURE_BUDGET_SQL = r"""
WITH tiered AS (
  SELECT doc_id,
         CASE WHEN CAST(substr(source, 4) AS BIGINT) < 14 THEN 'web'
              WHEN CAST(substr(source, 4) AS BIGINT) < 19 THEN 'books'
              ELSE 'code' END AS source,
         CAST(len(list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                              x -> x <> '')) AS BIGINT) AS ws_tokens
  FROM documents
),
tok AS (SELECT source, CAST(sum(ws_tokens) AS DOUBLE) AS t
        FROM tiered GROUP BY source),
b AS (SELECT CAST(sum(ws_tokens) AS DOUBLE) * 0.4 AS budget FROM tiered),
thr AS (
  SELECT source,
         CAST(floor(1e6 * least(1.0,
              ((SELECT budget FROM b) * CASE source WHEN 'web' THEN 0.5
                   WHEN 'books' THEN 0.3 ELSE 0.2 END) / t) + 0.5)
              AS BIGINT) AS lim
  FROM tok
)
SELECT d.doc_id, d.source, d.ws_tokens
FROM tiered d JOIN thr USING (source)
WHERE CAST((CAST(d.doc_id % 4294967296 AS HUGEINT) * 2654435761)
           % 4294967296 % 1000000 AS BIGINT) < thr.lim
ORDER BY d.doc_id
"""


STRATIFIED_SAMPLE_SQL = """
WITH h AS (
  SELECT doc_id, lang,
         CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
              % 4294967296 % 100 AS BIGINT) AS hv
  FROM documents
)
SELECT doc_id, lang FROM h
WHERE hv < CASE lang WHEN 'en' THEN 100 WHEN 'fr' THEN 50
                     WHEN 'de' THEN 25 ELSE 10 END
ORDER BY doc_id
"""


PACK_CHUNKS_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                              x -> x <> '')) AS BIGINT) AS ws_tokens
  FROM documents
)
SELECT doc_id, ws_tokens,
       CAST((sum(ws_tokens) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - ws_tokens) // 2048
            AS BIGINT) AS chunk_id
FROM t ORDER BY doc_id
"""


TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         lower(unnest(list_filter(
             regexp_split_to_array(coalesce(text, ''), '\s+'),
             x -> x <> ''))) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, tok, CAST(tf.tf AS BIGINT) AS tf,
       round(tf.tf * (CAST(n.n + 1 AS DOUBLE) / (df.df + 1)), 6) AS score
FROM tf JOIN df USING (tok), n
QUALIFY row_number() OVER (
  PARTITION BY doc_id
  ORDER BY tf.tf * (CAST(n.n + 1 AS DOUBLE) / (df.df + 1)) DESC, tok
) <= 3
ORDER BY doc_id, score DESC, tok
"""


HOPPING_WINDOW_SQL = """
WITH e AS (
  SELECT CAST(floor(epoch_us(ts) / (15 * 60 * 1000000)) AS BIGINT) AS hb,
         value
  FROM events
),
x AS (
  SELECT unnest(generate_series(hb - 3, hb)) AS wb, value FROM e
)
SELECT make_timestamp(wb * 15 * 60 * 1000000) AS window_start,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total_value
FROM x GROUP BY wb ORDER BY window_start
"""


def events_first3_per_user(sf_dir: str) -> pd.DataFrame:
    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts"])

    from ..stages.shuffle import bucketed_group_map

    def first3(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the bucket: one sort + grouped head over all users
        return df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id", sort=False
        ).head(3)

    # the politeness-budget shape: co-locate by key → ordered head(k) per key
    df = bucketed_group_map(ds, "user_id", first3).to_pandas()
    return df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


EVENTS_FIRST3_SQL = """
SELECT user_id, event_id, ts FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 3
"""


def events_user_value_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    df = partial_sum_count(
        _rp(sf_dir, "events", ["user_id", "value"]),
        ["user_id"],
        {"total_value": "value"},
    )
    df["total_value"] = df["total_value"].round(2)
    return (
        df.sort_values(["total_value", "user_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


EVENTS_TOPK_SQL = """
SELECT user_id, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 10
"""


def events_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer field ``k`` out of the
    JSON ``props`` column with ONE vectorized RE2 kernel
    (pyarrow.compute.extract_regex — no per-row json.loads), then the
    standard partial-agg exchange per event_type. DuckDB's regexp_extract
    is also RE2, so the oracle parses identically."""
    ds = _rp(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            pc.coalesce(t["props"], ""), r'"k":\s*(?P<k>\d+)'
        )
        k = pc.if_else(
            pc.is_valid(m),
            pc.cast(pc.struct_field(m, "k"), pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        return pa.table({"event_type": t["event_type"], "k": k})

    df = partial_sum_count(
        ds.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        {"sum_k": "k"},
        count_name="n",
    )
    df["sum_k"] = df["sum_k"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return (
        df[["event_type", "n", "sum_k"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


PROPS_STATS_SQL = r"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(coalesce(CAST(NULLIF(regexp_extract(coalesce(props, ''),
                                                    '"k":\s*(\d+)', 1),
                               '') AS BIGINT), 0)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_value_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99)) -> pd.DataFrame:
    """EXACT grouped quantiles: one bucketed exchange co-locates each
    event_type's values; per bucket a numpy sort + inverted-CDF element
    selection — pure element picking, no interpolation arithmetic, so the
    result is byte-identical to DuckDB's quantile_disc. (For groups too
    large to sort in one task, the mergeable-sketch shape of
    functions/sketches.py is the scale path; group-local exact quantiles
    are the right tool at this cardinality.)"""
    from ..stages.shuffle import bucketed_group_map

    ds = _rp(sf_dir, "events", ["event_type", "value"])

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy())
            for q in qs:
                rows.append(
                    (et, q, float(np.quantile(v, q, method="inverted_cdf")))
                )
        return pd.DataFrame(rows, columns=["event_type", "q", "value"])

    out = bucketed_group_map(ds, "event_type", quant).to_pandas()
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


QUANTILES_SQL = """
SELECT event_type, 0.5 AS q, quantile_disc(value, 0.5) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.9 AS q, quantile_disc(value, 0.9) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.99 AS q, quantile_disc(value, 0.99) AS value
FROM events GROUP BY event_type
ORDER BY event_type, q
"""


def events_user_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-key cumulative aggregate (grouped running total): one bucketed
    exchange co-locates each user's events; inside the bucket a single
    sort + grouped cumsum computes every user's running total vectorized.
    Accumulation is in INTEGER CENTS — double summation is order-exact but
    DuckDB's windowed sum differs in the last ulp (verified), while the
    integer sum is bit-exact in both engines."""
    from ..stages.shuffle import bucketed_group_map

    ds = _rp(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        # half-up like DuckDB round(value*100, 0); values are positive
        v = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "user_id": t["user_id"].cast(pa.int64()),
                "ts": t["ts"],
                "cents": pa.array(v, pa.int64()),
            }
        )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        df["running_total_cents"] = df.groupby("user_id", sort=False)[
            "cents"
        ].cumsum()
        return df[["event_id", "user_id", "running_total_cents"]]

    out = bucketed_group_map(
        ds.map_batches(cents, batch_format="pyarrow"), "user_id", running
    ).to_pandas()
    return (
        out.astype("int64").sort_values("event_id").reset_index(drop=True)
    )


RUNNING_TOTAL_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_total_cents
FROM events ORDER BY event_id
"""


def events_error_click_window(sf_dir: str, window_min: int = 5) -> pd.DataFrame:
    """Distributed RANGE (interval) JOIN: for every 'error' event, the
    number of 'click' events with ts in [error.ts, error.ts + window).

    Shape: the time axis is cut into window-width buckets, so any probe
    interval overlaps at most TWO buckets. Build rows (clicks) go to their
    bucket; each probe interval is replicated to the ≤2 buckets it
    overlaps, CLIPPED to the bucket's span. One bucketed exchange
    co-locates build and probe; inside a bucket the count is two
    vectorized ``searchsorted`` calls against the sorted click
    timestamps (intervals never cross a bucket boundary after clipping,
    and buckets' time spans are disjoint, so a raw-timestamp binary
    search is exact even when one hash bucket holds many time buckets).
    A second (event-keyed) exchange sums the ≤2 partials per probe. No
    sort-merge over the full stream, nothing on the driver but the
    result."""
    from ..stages.shuffle import bucketed_group_map

    W = window_min * 60 * 1_000_000  # µs

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        ids = t["event_id"].to_numpy()
        et = t["event_type"]
        click = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        err = pc.equal(et, "error").to_numpy(zero_copy_only=False)
        # build rows: clicks at their own bucket, interval = the point ts
        c_ts = ts[click]
        sides = [np.zeros(c_ts.size, dtype=np.int8)]
        out_id = [ids[click]]
        tbs = [c_ts // W]
        los = [c_ts]
        his = [c_ts]
        # probe rows: [ts, ts+W) clipped to each overlapped bucket
        e_ts, e_id = ts[err], ids[err]
        tb0 = e_ts // W
        for k, tb in enumerate((tb0, tb0 + 1)):
            lo = np.maximum(e_ts, tb * W)
            hi = np.minimum(e_ts + W, (tb + 1) * W)
            keep = hi > lo if k else np.ones(e_ts.size, dtype=bool)
            # first replica always kept so zero-click errors still appear
            sides.append(np.ones(keep.sum(), dtype=np.int8))
            out_id.append(e_id[keep])
            tbs.append(tb[keep])
            los.append(lo[keep])
            his.append(hi[keep])
        return pa.table(
            {
                "side": pa.array(np.concatenate(sides)),
                "event_id": pa.array(np.concatenate(out_id), pa.int64()),
                "tb": pa.array(np.concatenate(tbs), pa.int64()),
                "lo": pa.array(np.concatenate(los), pa.int64()),
                "hi": pa.array(np.concatenate(his), pa.int64()),
            }
        )

    def count_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        probes = df[df["side"] == 1]
        if probes.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "n_clicks": pd.Series(dtype="int64")}
            )
        cts = np.sort(df.loc[df["side"] == 0, "lo"].to_numpy())
        n = np.searchsorted(cts, probes["hi"].to_numpy()) - np.searchsorted(
            cts, probes["lo"].to_numpy()
        )
        return pd.DataFrame(
            {"event_id": probes["event_id"].to_numpy(), "n_clicks": n}
        ).astype("int64")

    ds = _rp(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
        explode, batch_format="pyarrow"
    )
    partials = bucketed_group_map(ds, "tb", count_in_bucket)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_id", sort=False)["n_clicks"].sum().reset_index()

    out = bucketed_group_map(partials, "event_id", total).to_pandas()
    return (
        out.astype({"event_id": "int64", "n_clicks": "int64"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )


RANGE_JOIN_SQL = """
SELECT e.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks
FROM events e
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 5 MINUTE
WHERE e.event_type = 'error'
GROUP BY e.event_id
ORDER BY e.event_id
"""


# -------------------------------------------------------------- joins (set)


def customers_without_orders(sf_dir: str, min_total: float = 250_000.0) -> pd.DataFrame:
    """Distributed anti join: customers with no order above ``min_total``.
    Qualifying order keys are filtered + per-batch-deduped at the read
    (combiner), then both sides co-locate in a bucketed left join whose
    bucket task keeps the unmatched left rows — neither fact table is
    driver-read or broadcast."""
    from ..stages.shuffle import bucketed_join

    keys_ds = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda df: df.loc[df["o_totalprice"] > min_total, ["o_custkey"]]
        .drop_duplicates()
        .assign(__hit=np.int8(1)),
        batch_format="pandas",
        batch_size=65536,
    )

    def keep_unmatched(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["__hit"].isna(), ["c_custkey", "c_name"]]

    out = bucketed_join(
        _rp(sf_dir, "customer", ["c_custkey", "c_name"]),
        keys_ds,
        left_on="c_custkey",
        right_on="o_custkey",
        right_prep=lambda df: df.drop_duplicates(),
        how="left",
        post=keep_unmatched,
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_name", pa.string())]
        ),
        right_schema=pa.schema([("o_custkey", pa.int64()), ("__hit", pa.int8())]),
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True)


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
"""


def order_status_with_lineitems(sf_dir: str) -> pd.DataFrame:
    """Distributed semi join then grouped count: lineitem order keys are
    per-batch-deduped at the read (combiner, one key per order per block),
    globally deduped inside the join bucket (right_prep), and the inner
    merge against co-located orders IS the semi join; the per-status count
    partial also finishes in the bucket. The big side never lands on the
    driver — it used to be read into a driver Python set, the classic
    broadcast-the-wrong-side join."""
    from ..stages.shuffle import bucketed_join

    keys_ds = _rp(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=65536
    )

    def status_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderstatus", sort=False).size()
        return out.rename("n_orders").reset_index()

    partials = bucketed_join(
        _rp(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]),
        keys_ds,
        left_on="o_orderkey",
        right_on="l_orderkey",
        right_prep=lambda df: df.drop_duplicates(),
        post=status_partial,
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderstatus", pa.string())]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64())]),
    ).to_pandas()
    df = (
        partials.groupby("o_orderstatus", sort=False)["n_orders"]
        .sum()
        .astype("int64")
        .reset_index()
    )
    return df.sort_values("o_orderstatus").reset_index(drop=True)


SEMI_JOIN_SQL = """
SELECT o_orderstatus, count(*) AS n_orders FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
GROUP BY o_orderstatus
"""


def customer_nation(sf_dir: str) -> pd.DataFrame:
    nat = _read_pd(sf_dir, "nation", ["n_nationkey", "n_name"])
    ds = _rp(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    out = bjoin(
        ds, nat.rename(columns={"n_nationkey": "c_nationkey"}), on="c_nationkey"
    ).to_pandas()
    return (
        out[["c_custkey", "c_name", "n_name"]]
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


CUSTOMER_NATION_SQL = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def top_suppliers(sf_dir: str, k: int = 5) -> pd.DataFrame:
    ds = _rp(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # Round BEFORE the partial prune so partial and final top-k use the
        # same (rounded acctbal, suppkey) ordering; pruning on raw acctbal
        # could drop the rounded-tie winner at the k boundary.
        df = df.assign(s_acctbal=df["s_acctbal"].round(2))
        return df.sort_values(["s_acctbal", "s_suppkey"], ascending=[False, True]).head(k)

    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["s_acctbal", "s_suppkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


TOP_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier ORDER BY round(s_acctbal, 2) DESC, s_suppkey LIMIT 5
"""


def orders_priority_counts(sf_dir: str, min_total: float = 100_000.0) -> pd.DataFrame:
    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], pa.scalar(min_total)))
        return t.select(["o_orderpriority"]).append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    df = partial_sum_count(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["o_orderpriority"],
        {"n": "one"},
    )
    return df.sort_values("o_orderpriority").reset_index(drop=True)


ORDERS_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n FROM orders
WHERE o_totalprice > 100000 GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------- documents


def lang_stats(sf_dir: str) -> pd.DataFrame:
    df = partial_sum_count(
        _rp(sf_dir, "documents", ["lang", "n_chars"]),
        ["lang"],
        {"total_chars": "n_chars"},
        count_name="n_docs",
    )
    return df.sort_values("lang").reset_index(drop=True)


LANG_STATS_SQL = """
SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
FROM documents GROUP BY lang
"""


def docs_exact_dedup_ids(sf_dir: str) -> pd.DataFrame:
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    from ..functions.dedup import exact_dedup

    # project to ids BEFORE the gather — the survivor set carries text
    kept = exact_dedup(ds).select_columns(["doc_id"]).to_pandas()
    return kept.sort_values("doc_id").reset_index(drop=True)


DEDUP_IDS_SQL = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def docs_token_totals(sf_dir: str) -> pd.DataFrame:
    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(ws_tokens=df["text"].fillna("").map(lambda t: len(t.split())))
        return (
            df.groupby("lang", sort=False)["ws_tokens"].sum().reset_index()
        )

    from ray.data.aggregate import Sum

    df = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("ws_tokens", alias_name="ws_tokens"))
        .to_pandas()
    )
    return df.sort_values("lang").reset_index(drop=True)


TOKEN_TOTALS_SQL = r"""
SELECT lang,
       CAST(sum(len(list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                                x -> x <> ''))) AS BIGINT) AS ws_tokens
FROM documents GROUP BY lang
"""


def docs_punct_ratio(sf_dir: str) -> pd.DataFrame:
    """ASCII-explicit punct class so Python and RE2 agree on non-ASCII text."""
    import re

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    punct = re.compile(r"[^0-9A-Za-z_ \t\n\r]")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        n_punct = texts.map(lambda t: len(punct.findall(t)))
        n_chars = texts.str.len().clip(lower=1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "punct_ratio": (n_punct / n_chars).round(6),
            }
        )

    return (
        ds.map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


PUNCT_RATIO_SQL = r"""
SELECT doc_id,
       round(length(regexp_replace(text, '[0-9A-Za-z_ \t\n\r]', '', 'g'))
             / greatest(length(text), 1), 6) AS punct_ratio
FROM documents
"""


def events_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based session windows (the streaming-shaped operator): events of
    a user belong to one session while consecutive gaps stay under
    ``gap_minutes``. Ray shape: co-locate by user via the bucketed
    exchange, then ONE vectorized pass per bucket (sort + lag + cumsum) —
    the standard sessionization kernel. The ordering key (ts, event_id) is
    total, so results are deterministic and SQL-mirrorable."""
    from ..stages.shuffle import bucketed_group_map

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        new_user = df["user_id"] != df["user_id"].shift()
        gap_break = (df["ts"] - df["ts"].shift()) > gap
        df["session_id"] = (new_user | gap_break).cumsum()
        g = df.groupby(["user_id", "session_id"], sort=False)
        out = g.agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        ).reset_index()
        # renumber sessions per user in start order (bucket-local ids are
        # arbitrary; the per-user ordinal is the stable identity)
        out = out.sort_values(["user_id", "start_ts"])
        out["session_id"] = out.groupby("user_id", sort=False).cumcount() + 1
        return out

    df = bucketed_group_map(ds, "user_id", sessionize).to_pandas()
    return (
        df.sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "session_id": "int64", "n_events": "int64"})
    )


EVENTS_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM numbered GROUP BY user_id, session_id
"""


def purchases_asof_click(sf_dir: str) -> pd.DataFrame:
    """As-of join: for every purchase event, the user's most recent click
    at-or-before the purchase. Ray shape: co-locate each user's events via
    the bucketed exchange, then ``pd.merge_asof`` per bucket on the sorted
    timelines — the standard distributed as-of pattern (sort within
    partitions, merge_asof inside). Tie-break: at equal timestamps the
    largest qualifying click event_id wins (mirrored in the SQL)."""
    from ..stages.shuffle import bucketed_group_map

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        purchases = df[df["event_type"] == "purchase"][
            ["user_id", "event_id", "ts"]
        ].sort_values(["ts", "event_id"])
        clicks = df[df["event_type"] == "click"][
            ["user_id", "event_id", "ts"]
        ].rename(columns={"event_id": "click_id", "ts": "click_ts"}).sort_values(
            ["click_ts", "click_id"]
        )
        if purchases.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "click_id": pd.Series(dtype="float64"),
                    "click_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        out = pd.merge_asof(
            purchases,
            clicks,
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        # inner as-of semantics: purchases with no prior click drop out, so
        # both engines emit NULL-free integer keys
        return out.dropna(subset=["click_id"])

    df = bucketed_group_map(ds, "user_id", asof).to_pandas()
    df = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    df["click_id"] = df["click_id"].astype("int64")
    return df


ASOF_SQL = """
SELECT p.user_id, p.event_id, p.ts, c.click_id, c.click_ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
ASOF JOIN (
  SELECT user_id,
         -- collapse same-timestamp clicks to one row (max id), matching
         -- merge_asof's single-row-per-time semantics deterministically
         max(event_id) AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) c ON p.user_id = c.user_id AND p.ts >= c.click_ts
"""


# --------------------------------------------------------------- embeddings


def ann_cosine_topk_sql_compat(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k in float64 with duckdb-compatible rounding
    (sim to 4dp; order by rounded sim desc then vec_id)."""
    import ray

    full = _read_pd(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = np.asarray(
        full.loc[full["vec_id"] == query_vec_id, "embedding"].iloc[0], dtype=np.float64
    )
    ref = ray.put(q)
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        sims = (m @ qv) / (
            np.linalg.norm(m, axis=1) * np.linalg.norm(qv) + 0.0
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "sim": pa.array(np.round(sims, 4), pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (
        out.sort_values(["sim", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


ANN_TOPK_SQL = """
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS sim
FROM embeddings
ORDER BY sim DESC, vec_id LIMIT 10
"""


def events_late_arrivals(sf_dir: str, watermark_s: int = 300) -> pd.DataFrame:
    """Streaming watermark semantics over an out-of-order arrival stream
    (the Dataflow-model late-data rule, Akidau et al. VLDB 2015): an
    event is LATE iff its event time is more than ``watermark_s`` behind
    the high watermark — the max event time among all EARLIER ARRIVALS.
    The sf events table arrives in timestamp order, so the query
    synthesizes a deterministic out-of-order arrival sequence (each run
    of 10 event_ids arrives reversed — the same expression in the SQL
    oracle), then computes the exclusive prefix max of event time over
    arrival order with the distributed two-phase scan
    (``stages/shuffle.with_prefix_max``: per-block maxima to the driver,
    one scalar per block, vectorized shifted cummax per block). The
    globally first arrival has no watermark (NULL, never late)."""
    from ..stages.shuffle import with_prefix_max

    ds = _rp(sf_dir, "events", ["event_id", "ts"])

    def arrival(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy()
        seq = (ids // 10) * 10 + (9 - ids % 10)
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "ts_us": t["ts"].cast(pa.int64()),
                "arrival_seq": pa.array(seq.astype(np.int64), pa.int64()),
            }
        )

    scanned = with_prefix_max(
        ds.map_batches(arrival, batch_format="pyarrow"),
        order_col="arrival_seq",
        value_col="ts_us",
        out_col="watermark_us",
    )
    out = scanned.to_pandas()
    wm = out["watermark_us"]
    out["late"] = wm.notna() & (
        out["ts_us"] < wm.fillna(0).astype("int64") - watermark_s * 1_000_000
    )
    # float64 with NaN for the no-predecessor row, matching DuckDB's
    # nullable-BIGINT → pandas conversion (exact: us timestamps < 2^53)
    out["watermark_us"] = wm.astype("float64")
    return (
        out[["event_id", "ts_us", "watermark_us", "late"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


#: late-arrival oracle — the same reversed-run arrival synthesis; the
#: window max with a 1-PRECEDING frame restates the exclusive prefix max,
#: NULL (never late) for the globally first arrival
LATE_ARRIVALS_SQL = r"""
WITH arr AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         (event_id // 10) * 10 + (9 - event_id % 10) AS arrival_seq
  FROM events
),
wm AS (
  SELECT event_id, ts_us,
         max(ts_us) OVER (ORDER BY arrival_seq
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS watermark_us
  FROM arr
)
SELECT event_id, ts_us,
       CAST(watermark_us AS DOUBLE) AS watermark_us,
       coalesce(ts_us < watermark_us - 300000000, FALSE) AS late
FROM wm
ORDER BY event_id
"""
