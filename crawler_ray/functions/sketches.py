"""Mergeable sketches for distributed aggregation.

The pattern (Ray guide "Aggregation at scale"): emit ONE serialized sketch
per batch from ``map_batches`` (the combiner), then merge the handful of
sketches in a tiny final stage — sketches are designed to be mergeable, so
the shuffle carries kilobytes instead of the raw keys.

HyperLogLog here is the classic Flajolet et al. 2007 register scheme
(2^p registers, bias-corrected harmonic mean, linear counting for the
small range), vectorized with numpy. Standard error ≈ 1.04/√(2^p) — p=12
(4096 registers, 4 KB) gives ~1.6 %.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..keys import hash64


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        found = np.zeros(len(h), dtype=bool)
        for b in range(nbits):
            bit = (rest >> np.uint64(63 - b)) & np.uint64(1)
            newly = (~found) & (bit == 1)
            rank[newly] = b + 1
            found |= newly
        np.maximum.at(self.registers, idx, rank)

    def add(self, values: list[str] | pa.Array) -> None:
        self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


class HistogramSketch:
    """Mergeable equi-width histogram over a FIXED [lo, hi] range — the
    quantile counterpart of HyperLogLog in this module: per-batch partials
    are dense count vectors that merge by addition, so the exchange
    carries bins × 8 bytes per (group, block) instead of the raw values.
    Quantile error ≤ one bin width ((hi-lo)/bins); the range comes from a
    cheap exact min/max pre-pass."""

    def __init__(self, lo: float, hi: float, bins: int = 4096) -> None:
        self.lo, self.hi, self.bins = float(lo), float(hi), bins
        self.counts = np.zeros(bins, dtype=np.int64)

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        span = max(self.hi - self.lo, 1e-300)
        idx = np.clip(
            ((values - self.lo) / span * self.bins).astype(np.int64),
            0,
            self.bins - 1,
        )
        np.add.at(self.counts, idx, 1)

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        assert (self.lo, self.hi, self.bins) == (other.lo, other.hi, other.bins)
        out = HistogramSketch(self.lo, self.hi, self.bins)
        out.counts = self.counts + other.counts
        return out

    def quantile(self, q: float) -> float:
        n = int(self.counts.sum())
        if n == 0:
            return float("nan")
        target = max(1, int(np.ceil(q * n)))
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target))
        # right edge of the containing bin: error ≤ one bin width
        return self.lo + (self.hi - self.lo) * (b + 1) / self.bins

    def serialize(self) -> bytes:
        import struct

        return struct.pack("<ddq", self.lo, self.hi, self.bins) + self.counts.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HistogramSketch":
        import struct

        lo, hi, bins = struct.unpack("<ddq", data[:24])
        h = cls(lo, hi, int(bins))
        h.counts = np.frombuffer(data[24:], dtype=np.int64).copy()
        return h


def approx_quantiles_per_group(
    ds, group_col: str, value_col: str, qs=(0.5, 0.9, 0.99), bins: int = 4096
) -> pd.DataFrame:
    """Grouped approximate quantiles at sketch cost: exact global min/max
    pre-pass (two scalars), then per-batch per-group histogram partials →
    additive merge per group. Error ≤ (max-min)/bins per quantile. The
    scale path the exact operator (relational.events_value_quantiles)
    points to for groups too large to sort in one task."""
    import pyarrow.compute as pc

    stats = ds.map_batches(
        lambda t: pa.table(
            {
                "lo": pa.array([pc.min(t[value_col]).as_py()]),
                "hi": pa.array([pc.max(t[value_col]).as_py()]),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    lo, hi = float(stats["lo"].min()), float(stats["hi"].max())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(group_col, sort=False):
            h = HistogramSketch(lo, hi, bins)
            h.add(g[value_col].to_numpy(dtype=np.float64))
            rows.append({group_col: key, "sketch": h.serialize()})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    out = []
    for key, g in parts.groupby(group_col, sort=True):
        merged = HistogramSketch(lo, hi, bins)
        for blob in g["sketch"]:
            merged = merged.merge(HistogramSketch.deserialize(blob))
        for q in qs:
            out.append({group_col: key, "q": q, "value": merged.quantile(q)})
    return pd.DataFrame(out)


def approx_distinct_per_group(ds, group_col: str, value_col: str, p: int = 12) -> pd.DataFrame:
    """Grouped approximate distinct count: per-batch per-group HLL sketches
    (combiner) → merge per group — only (groups × blocks) 4 KB sketches
    cross the exchange, never the raw values."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(group_col, sort=False):
            h = HyperLogLog(p)
            h.add([str(v) for v in g[value_col]])
            rows.append({group_col: key, "sketch": h.serialize()})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    out = []
    for key, g in parts.groupby(group_col, sort=True):
        merged = HyperLogLog(p)
        for blob in g["sketch"]:
            merged = merged.merge(HyperLogLog.deserialize(blob))
        out.append({group_col: key, "approx_distinct": int(round(merged.estimate()))})
    return pd.DataFrame(out)


class MisraGries:
    """Misra-Gries frequent-items summary (Misra & Gries 1982): ``k``
    counters; after summarizing a stream of ``n`` items, every item with
    true count > n/(k+1) is guaranteed present, and each stored count
    under-estimates by at most n/(k+1). Mergeable (Agarwal et al. 2012):
    sum counters pairwise, then subtract the (k+1)-th largest count and
    drop non-positive — the merged summary keeps the same guarantee, which
    is what lets one summary per block reduce to one per dataset with
    kilobytes on the wire."""

    def __init__(self, k: int) -> None:
        self.k = int(k)
        self.counts: dict = {}
        self.n = 0  # total items summarized

    def update_counts(self, items: np.ndarray, counts: np.ndarray) -> None:
        """Merge EXACT (item, count) pairs (e.g. np.unique of one batch) —
        equivalent to merging another summary whose counters are exact."""
        self.n += int(counts.sum())
        d = self.counts
        for it, c in zip(items.tolist(), counts.tolist()):
            d[it] = d.get(it, 0) + int(c)
        self._shrink()

    def merge(self, other: "MisraGries") -> None:
        self.n += other.n
        d = self.counts
        for it, c in other.counts.items():
            d[it] = d.get(it, 0) + c
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        # subtract the (k+1)-th largest count from everything, drop <=0:
        # the standard decrement step, batched
        sub = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.counts = {
            it: c - sub for it, c in self.counts.items() if c > sub
        }

    def to_rows(self) -> "tuple[list, list]":
        return list(self.counts.keys()), list(self.counts.values())


def frequent_words(
    ds,
    text_col: str = "text",
    phi_inv: int = 30,
    k: "int | None" = None,
):
    """EXACT frequent items over a tokenized text column in two streaming
    passes — the classic heavy-hitters recipe that avoids a full-vocabulary
    ``groupby`` (at 100 TB the vocabulary is billions of keys; the heavy
    hitters are the only rows anyone wants):

    pass 1 (candidates): per block, exact ``np.unique`` word counts fold
    into one Misra-Gries summary of ``k = 2*phi_inv`` counters; one
    (≤k)-row summary per block returns to the reducer, which merges them.
    Any word with count ≥ n/phi_inv is guaranteed to survive (its true
    count exceeds n/(k+1)); the candidate set may contain extras but never
    misses.

    pass 2 (verify): the candidate set (≤k words) broadcasts into a second
    ``map_batches`` pass that exact-counts ONLY candidates; the tiny
    partials sum on the reducer and the threshold ``count * phi_inv >= n``
    filters with EXACT counts — so the result equals the full-groupby
    answer bit-for-bit while nothing vocabulary-sized ever moves.

    Returns a pandas DataFrame ``(word, cnt)`` sorted by word. Empty-string
    tokens (split artifacts) are excluded, matching the SQL statement of
    the rule."""
    import pyarrow.compute as pc

    k = int(k) if k is not None else 2 * int(phi_inv)

    def block_summary(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(
                pc.fill_null(t[text_col], "").combine_chunks(), pattern=" "
            )
        )
        w = words.to_numpy(zero_copy_only=False)
        w = w[w != ""]
        items, counts = np.unique(w, return_counts=True)
        mg = MisraGries(k)
        mg.update_counts(items, counts)
        its, cs = mg.to_rows()
        # one null-word row carries the block's total item count
        return pa.table(
            {
                "word": pa.array(its + [None], pa.string()),
                "weight": pa.array(cs + [mg.n], pa.int64()),
            }
        )

    summaries = ds.map_batches(
        block_summary, batch_format="pyarrow"
    ).to_pandas()
    total = int(summaries.loc[summaries["word"].isna(), "weight"].sum())
    merged = MisraGries(k)
    live = summaries.dropna(subset=["word"])
    # fold the per-block summaries; .n is tracked via update alone, fix after
    merged.update_counts(
        live["word"].to_numpy(), live["weight"].to_numpy()
    )
    merged.n = total
    candidates = sorted(merged.counts.keys())
    if not candidates:
        return pd.DataFrame({"word": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)})
    cand_set = pa.array(candidates, pa.string())

    def count_candidates(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(
                pc.fill_null(t[text_col], "").combine_chunks(), pattern=" "
            )
        )
        hits = words.filter(pc.is_in(words, value_set=cand_set))
        w = hits.to_numpy(zero_copy_only=False)
        items, counts = np.unique(w, return_counts=True)
        return pa.table(
            {
                "word": pa.array(items.tolist(), pa.string()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    partials = ds.map_batches(
        count_candidates, batch_format="pyarrow"
    ).to_pandas()
    exact = partials.groupby("word", sort=True)["cnt"].sum().reset_index()
    out = exact[exact["cnt"] * phi_inv >= total].reset_index(drop=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def exact_percentile_gate(ds, score_col: str, quantile: float = 0.8):
    """EXACT distributed percentile threshold + gate — the complement of
    ``HistogramSketch``'s approximate quantiles, for when curation policy
    needs a reproducible cut ("keep the top 20% by quality score") rather
    than an estimate.

    Semantics: with ``n`` rows and ``k = ceil(quantile * n)`` (clamped to
    >= 1), the threshold is the k-th SMALLEST score (1-indexed); every
    row with ``score >= threshold`` is kept — i.e. at least the top
    ``1 - quantile`` fraction survives, with ties at the threshold kept
    in full (deterministic, order-free). Returns ``(threshold, flagged)``
    where ``flagged`` is a lazy Dataset with a ``kept`` bool column
    appended; empty input returns ``(nan, ds-with-kept=False)``.

    Scale shape: NO global sort. Pass 1 builds an exact (score -> count)
    histogram — per-batch combiner + bucketed hash merge
    (``shuffle.bucketed_group_agg``), so the exchange carries one row per
    distinct score per batch. The histogram lands on the driver: its size
    is bounded by the score's quantization, not the corpus (callers
    should gate on a ROUNDED score — 6 dp over a unit-ish range is <=
    ~1e7 distinct values; for an unbounded-domain score, pre-round
    coarser or add a coarse-bucket refine level first). Pass 2 is one
    elementwise flag over the original Dataset — note ``ds`` is executed
    twice (lazy recompute), the normal trade at corpus scale where
    caching the scored corpus would cost more than re-running the cheap
    scoring map.
    """
    import math

    import pyarrow.compute as pc

    from ..stages.shuffle import bucketed_group_agg

    hist = bucketed_group_agg(
        ds, keys=[score_col], agg={"cnt": (score_col, "size")}
    )

    def flag_with(threshold: float):
        def flag(t: pa.Table) -> pa.Table:
            if np.isnan(threshold):
                kept = pa.array(np.zeros(len(t), dtype=bool))
            else:
                kept = pc.greater_equal(t[score_col], pa.scalar(threshold))
            return t.append_column("kept", kept)

        return flag

    if len(hist) == 0:
        nan = float("nan")
        return nan, ds.map_batches(flag_with(nan), batch_format="pyarrow")

    hist = hist.sort_values(score_col).reset_index(drop=True)
    counts = hist["cnt"].to_numpy(dtype=np.int64)
    n = int(counts.sum())
    k = max(1, math.ceil(quantile * n))
    idx = int(np.searchsorted(np.cumsum(counts), k, side="left"))
    threshold = float(hist[score_col].iloc[idx])
    return threshold, ds.map_batches(
        flag_with(threshold), batch_format="pyarrow"
    )
