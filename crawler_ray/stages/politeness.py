"""Per-host politeness budget (ST2): the distributed form of the reference's
dispatch-time host counter (/root/reference/src/main.rs:100-107).

Semantics (tested one-for-one):
- key = hostname without port (url::Host, main.rs:100);
- host-less findings are skipped WITHOUT counting (main.rs:100-102);
- skip when the host's running count is ``> limit``, then increment — the
  check-before-increment means up to ``limit+1`` (257) dispatches per host
  succeed over the whole crawl (main.rs:24, 103-107);
- admission order within a wave is the canonical order (kind, url, depth) —
  the determinized replacement for the reference's HashSet/completion
  ordering (SURVEY.md §3).

Two interchangeable implementations (equivalence-tested):
- ``admit_local``: vectorized pyarrow/pandas on the driver — used while the
  wave frontier is below ``ray_threshold`` rows;
- ``admit_ray``: ``groupby("host").map_groups`` with the carried counts
  broadcast via ``ray.put`` — the shuffle-native form for frontiers that
  don't fit a driver heap. Because the budget is per-host and the canonical
  order is a sort key, per-host groups admit independently and
  deterministically; no cross-host coordination is needed.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import urlnorm as un

FRONTIER_SCHEMA = pa.schema(
    [("url", pa.string()), ("kind", pa.string()), ("depth", pa.int32())]
)


def with_host(frontier: pa.Table) -> pa.Table:
    """Attach the politeness key. URL parse here cannot fail: every frontier
    row came from parse_links (already validated) or from seed parse."""
    hosts: list[str | None] = [un.parse(u).host for u in frontier["url"].to_pylist()]
    return frontier.append_column("host", pa.array(hosts, type=pa.string()))


def canonical_sort(tbl: pa.Table) -> pa.Table:
    return tbl.sort_by(
        [("kind", "ascending"), ("url", "ascending"), ("depth", "ascending")]
    )


def _admit_group(df: pd.DataFrame, prior: int, limit: int) -> pd.DataFrame:
    """Within one host group, canonical order: admit while prior+rank <= limit."""
    df = df.sort_values(["kind", "url", "depth"], kind="mergesort")
    n_admit = max(0, min(len(df), limit + 1 - prior))
    return df.iloc[:n_admit]


def admit_local(
    frontier: pa.Table, counts: Counter, limit: int = 256
) -> tuple[pa.Table, Counter]:
    """Driver-side vectorized admission. Returns (admitted table in canonical
    order, metrics). Mutates ``counts`` with the admitted increments and
    records drops in the returned metrics Counter."""
    metrics: Counter = Counter()
    if frontier.num_rows == 0:
        return frontier, metrics
    if "host" not in frontier.column_names:
        frontier = with_host(frontier)
    hostless = pc.is_null(frontier["host"])
    n_hostless = pc.sum(pc.cast(hostless, pa.int64())).as_py() or 0
    if n_hostless:
        metrics["dropped_hostless"] = n_hostless
        frontier = frontier.filter(pc.invert(hostless))
    frontier = canonical_sort(frontier)

    hosts = frontier["host"].to_pylist()
    keep = np.zeros(len(hosts), dtype=bool)
    for i, h in enumerate(hosts):
        if counts[h] > limit:
            continue
        counts[h] += 1
        keep[i] = True
    metrics["dropped_budget"] = int((~keep).sum())
    return frontier.filter(pa.array(keep)), metrics


def admit_ray(
    frontier_ds,
    counts: Counter,
    limit: int = 256,
) -> tuple[pa.Table, Counter]:
    """Shuffle-native admission over a Dataset of frontier rows (url, kind,
    depth, host). Broadcasts the prior counts once (ray.put); each host
    group admits independently in canonical order. Returns the same
    (admitted, metrics) as admit_local and applies the same counts update.

    Scale note: at 10^8+ hosts the broadcast dict is replaced by unioning a
    counts table into the groupby (same group function reads the carrier
    row); the broadcast form is used here because counts ≪ frontier in all
    sandbox workloads."""
    import ray

    counts_ref = ray.put(dict(counts))

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        prior = ray.get(counts_ref).get(df["host"].iloc[0], 0)
        return _admit_group(df, prior, limit)

    mat = frontier_ds.materialize()  # wave frontier: bounded, reused twice
    n_total = mat.count()
    valid = mat.map_batches(
        lambda t: t.filter(pc.is_valid(t["host"])), batch_format="pyarrow"
    ).materialize()
    n_valid_in = valid.count()
    admitted_df = (
        valid.groupby("host").map_groups(gate, batch_format="pandas").to_pandas()
    )
    admitted = canonical_sort(
        pa.Table.from_pandas(admitted_df, preserve_index=False).select(
            ["url", "kind", "depth", "host"]
        )
    )

    metrics: Counter = Counter()
    for h in admitted["host"].to_pylist():
        counts[h] += 1
    metrics["dropped_hostless"] = int(n_total - n_valid_in)
    metrics["dropped_budget"] = int(n_valid_in - admitted.num_rows)
    return admitted, metrics
