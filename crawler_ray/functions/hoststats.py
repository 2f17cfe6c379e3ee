"""Host-level (domain-level) curation statistics and gate — the
FineWeb / RefinedWeb practice of scoring and filtering whole REGISTERED
DOMAINS, not just individual documents: a domain whose pages are
systematically short or low-quality is dropped wholesale, which both
removes spam farms the per-document gates miss and lets the crawler
stop scheduling the host at all (the frontier-side use: the kept flag
joins back onto the politeness exchange as a host blocklist).

Semantics (per host):
  * ``n_docs``    — document count;
  * ``total_words`` — sum of per-document word counts (shared tokenizer
    convention: split on single spaces, empty tokens dropped — the same
    contract as every textstats kernel and its DuckDB oracle);
  * ``mean_words`` — ``total_words / n_docs`` rounded half-up to 6 dp;
  * ``short_frac`` — fraction of the host's documents with fewer than
    ``short_words`` words, rounded half-up to 6 dp;
  * ``kept``      — ``n_docs >= min_docs AND mean_words >= min_mean_words
    AND short_frac <= max_short_frac``, computed FROM THE ROUNDED values
    so a consumer recomputing the gate from the emitted columns can
    never contradict it (same contract as urlfilter.url_quality).

Scale shape: classic partial-aggregate-then-small-groupby. Pass 1 is a
per-batch COMBINER (``map_batches``: derive ``n_words`` vectorized,
then one within-batch pandas groupby → per-host partials), so the
exchange that follows carries one row per (batch, distinct host), not
one per document. Pass 2 merges partials with a bucketed hash exchange
on ``host`` (``shuffle.bucketed_group_agg``). The result is
host-cardinality — the small side by construction (~10^7 registered
domains for a full web crawl vs 10^10 pages), so returning it to the
driver / broadcasting it back into the frontier is the intended use.
Nothing document-sized ever moves after pass 1.

Reference anchor: the reference tracks hosts only as visit COUNTERS for
the 256-budget (/root/reference/src/main.rs:52,100-107); aggregating
document quality per host is part of the beyond-reference training-data
extension set (SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _round6(x: np.ndarray) -> np.ndarray:
    # half-up at 6 dp, matching DuckDB round() (away from zero; all
    # inputs here are non-negative)
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def host_curation_stats(
    ds,
    *,
    host_col: str = "host",
    text_col: str = "text",
    min_docs: int = 2,
    min_mean_words: float = 55.0,
    short_words: int = 40,
    max_short_frac: float = 0.45,
) -> pd.DataFrame:
    """Aggregate per-host curation stats over a Dataset carrying
    ``(host, text)`` columns and apply the domain gate. Returns a
    host-sorted DataFrame ``(host, n_docs, total_words, mean_words,
    short_frac, kept)`` — host-cardinality, the small side by contract."""
    from ..functions.textstats import _explode_tokens
    from ..stages.shuffle import bucketed_group_agg

    def partial(t: pa.Table) -> pd.DataFrame:
        # vectorized word counts: shared space-split/drop-empties contract
        _, doc_idx, n_docs = _explode_tokens(t[text_col])
        n_words = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        df = pd.DataFrame(
            {
                "host": t[host_col].to_pandas(),
                "n_words": n_words,
                "is_short": (n_words < short_words).astype(np.int64),
            }
        )
        return df

    # derive per-doc features per batch; bucketed_group_agg then runs its
    # own per-batch combiner + bucketed merge on host
    derived = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    g = bucketed_group_agg(
        derived,
        keys=["host"],
        agg={
            "n_docs": ("n_words", "size"),
            "total_words": ("n_words", "sum"),
            "n_short": ("is_short", "sum"),
        },
    )
    n = g["n_docs"].to_numpy(dtype=np.int64)
    mean_words = _round6(g["total_words"].to_numpy(dtype=np.float64) / n)
    short_frac = _round6(g["n_short"].to_numpy(dtype=np.float64) / n)
    out = pd.DataFrame(
        {
            "host": g["host"],
            "n_docs": n,
            "total_words": g["total_words"].astype("int64"),
            "mean_words": mean_words,
            "short_frac": short_frac,
            # gate over the ROUNDED values — consumers can recompute it
            "kept": (n >= min_docs)
            & (mean_words >= min_mean_words)
            & (short_frac <= max_short_frac),
        }
    )
    return out.sort_values("host").reset_index(drop=True)
