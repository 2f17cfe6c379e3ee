"""Adaptive recrawl scheduling from snapshot change history — the
Cho & Garcia-Molina line of work ("Estimating Frequency of Change", ACM
TOIT 2003): given several observations of each URL across crawl
snapshots, estimate how often the page actually changes and bucket URLs
into recrawl priority classes. This is the feedback loop a production
crawler runs between dumps: pages that changed at every visit are
re-fetched first; pages that never changed drop to a slow cycle; pages
seen once have no evidence yet and go to the default cadence.

Semantics (per URL, observations ordered by ``ts``; ``ts`` is unique per
URL by contract — a URL is fetched at most once per snapshot):
  * ``n_obs``      — number of snapshots the URL appears in;
  * ``n_changes``  — number of ADJACENT observation pairs whose content
    version differs (content hash / ETag / any comparable token);
  * ``change_ratio`` — ``n_changes / (n_obs - 1)`` (0.0 when n_obs < 2),
    rounded half-up to 6 dp;
  * ``lambda_hat`` — the bias-reduced Poisson-rate estimator from
    Cho & Garcia-Molina 2003 §4.2, in units of changes per
    snapshot interval: ``-ln((I - X + 0.5) / (I + 0.5))`` with
    ``I = n_obs - 1`` intervals and ``X = n_changes`` (0.0 when
    n_obs < 2; the +0.5 terms keep the estimate finite when every
    interval changed), rounded half-up to 6 dp;
  * ``priority``   — ``'new'`` (n_obs == 1), ``'hot'``
    (rounded change_ratio >= hot), ``'warm'`` (>= warm), else
    ``'cold'``. Computed FROM THE ROUNDED ratio so consumers
    recomputing the class from the emitted columns cannot disagree.

Scale shape: ONE bucketed hash exchange on the URL key
(``shuffle.bucketed_group_map`` — explicit task exchange, no global
sort), then fully-vectorized segment math inside each bucket: sort the
bucket by (url, ts) once, adjacent-compare versions, and reduce per-URL
change counts with a cumulative-sum over segment boundaries — no
per-URL Python loop. The result is URL-cardinality (one row per
distinct URL): corpus-sized at the design point, so the function
returns a lazy Dataset for the caller to sink (``out_path``) or gather
at sf scale.

Reference anchor: the reference crawls each URL at most once ever (the
archive check, /root/reference/src/main.rs:129-130) — recrawl scheduling
is part of the beyond-reference crawl-operations extension set
(SURVEY.md §2), alongside sitemap-driven ``recrawl_due``
(sources/sitemap.py:310), which handles the no-history case this
operator's ``'new'`` class feeds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _round6(x: np.ndarray) -> np.ndarray:
    # half-up at 6 dp, matching DuckDB round(); all inputs non-negative
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def change_rate_priorities(
    ds,
    *,
    url_col: str = "url_id",
    ts_col: str = "ts",
    ver_col: str = "ver",
    hot: float = 0.5,
    warm: float = 0.125,
    n_buckets: int = 64,
):
    """Estimate per-URL change rates over ``(url, ts, ver)`` snapshot
    observations. Returns a lazy Dataset of
    ``(url_col, n_obs, n_changes, change_ratio, lambda_hat, priority)``."""
    from ..stages.shuffle import bucketed_group_map

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col], kind="mergesort")
        u = df[url_col].to_numpy()
        v = df[ver_col].to_numpy()
        n = len(u)
        # segment boundaries of the url-sorted bucket
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        n_obs = np.diff(np.r_[starts, n]).astype(np.int64)
        # adjacent change indicators; pairs crossing a url boundary are 0
        same = u[1:] == u[:-1]
        chg = (same & (v[1:] != v[:-1])).astype(np.int64)
        cs = np.r_[0, np.cumsum(chg)]  # cs[k] = changes among pairs < k
        ends = starts + n_obs - 1
        n_changes = cs[ends] - cs[starts]
        intervals = np.maximum(n_obs - 1, 1).astype(np.float64)
        multi = n_obs >= 2
        ratio = _round6(np.where(multi, n_changes / intervals, 0.0))
        lam = _round6(
            np.where(
                multi,
                -np.log((intervals - n_changes + 0.5) / (intervals + 0.5)),
                0.0,
            )
        )
        priority = np.select(
            [~multi, ratio >= hot, ratio >= warm],
            ["new", "hot", "warm"],
            default="cold",
        )
        return pd.DataFrame(
            {
                url_col: u[starts],
                "n_obs": n_obs,
                "n_changes": n_changes,
                "change_ratio": ratio,
                "lambda_hat": lam,
                "priority": priority,
            }
        )

    return bucketed_group_map(
        ds, bucket_on=url_col, fn=per_bucket, n_buckets=n_buckets
    )
