"""robots.txt politeness gate (engine extension; the reference has none).

The north-star design keeps per-host robots rules cached next to the
politeness state. Here the cache is a driver/broadcast dict populated
lazily per wave: for every not-yet-seen host in the frontier, the corpus is
probed (pushdown ``isin`` scan, both schemes) for ``{scheme}://host/robots.txt``
and the body parsed with the stdlib's protocol rules restricted to
``User-agent: *`` groups and ``Disallow:`` prefix lines (the original 1994
robots.txt convention; no wildcards/Allow precedence, documented subset).

Gate placement: at dispatch, before the budget counter — a robots-blocked
URL is dropped with a ``dropped_robots`` metric and does NOT consume host
budget; robots lookups themselves are out-of-band metadata reads (not
archived, not budget-counted). Off by default (``CrawlConfig.respect_robots``)
so the faithful-reference mode is unaffected.

Scale note: the cache is an ordinary dict here (hosts ≪ frontier); on a
cluster it is either broadcast per wave (ray.put) or held in the fetcher
actors keyed by host partition — same probe interface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import urlnorm as un


def parse_robots(body: bytes | str) -> list[str]:
    """Disallow prefixes for User-agent: * (conservative subset)."""
    return _parse_robots_full(body)[0]


def parse_crawl_delay(body: bytes | str) -> float | None:
    """``Crawl-delay`` seconds for User-agent: * (same group rule as
    Disallow; non-numeric / non-positive values ignored)."""
    return _parse_robots_full(body)[1]


def _parse_robots_full(body: bytes | str) -> tuple[list[str], float | None]:
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    prefixes: list[str] = []
    delay: float | None = None
    applies = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif field == "disallow" and applies and value:
            prefixes.append(value)
        elif field == "crawl-delay" and applies and delay is None:
            try:
                d = float(value)
            except ValueError:
                continue
            if d > 0:
                delay = d
    return prefixes, delay


class RobotsCache:
    def __init__(self, corpus_path: str | list[str]) -> None:
        self.corpus_path = corpus_path
        self.rules: dict[str, list[str]] = {}
        self.delays: dict[str, float | None] = {}  # Crawl-delay seconds

    def ensure_hosts(self, hosts: set[str]) -> None:
        missing = sorted(h for h in hosts if h not in self.rules)
        if not missing:
            return
        lookups = [f"{s}://{h}/robots.txt" for h in missing for s in ("http", "https")]
        import pyarrow.dataset as pads

        dset = pads.dataset(self.corpus_path, format="parquet")
        t = dset.to_table(
            columns=["url", "html"], filter=pc.field("url").isin(lookups)
        )
        found: dict[str, list[str]] = {}
        delays: dict[str, float] = {}
        for u, body in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            host = un.parse(u).host
            prefixes, delay = _parse_robots_full(body)
            found.setdefault(host, []).extend(prefixes)
            if delay is not None:
                # both schemes present: the stricter (longer) delay wins
                delays[host] = max(delay, delays.get(host, 0.0))
        for h in missing:
            self.rules[h] = found.get(h, [])
            self.delays[h] = delays.get(h)

    def wave_caps(
        self, wave_period: float, global_cap: int | None = None
    ) -> dict[str, int]:
        """Per-host per-wave dispatch caps from the cached Crawl-delays: a
        host with delay d gets floor(wave_period / d), at least 1 (never
        starve a host out entirely — it just spreads over more waves).
        ``global_cap`` (CrawlConfig.max_per_host_wave) lowers any entry it
        beats; hosts without a delay are not in the dict (the split
        applies ``global_cap`` to them as the default)."""
        caps: dict[str, int] = {}
        for h, d in self.delays.items():
            if d is None:
                continue
            cap = max(1, int(wave_period / d))
            caps[h] = cap if global_cap is None else min(cap, global_cap)
        return caps

    def disallowed(self, url_s: str) -> bool:
        u = un.parse(url_s)
        if u.host is None:
            return False
        prefixes = self.rules.get(u.host, ())
        path = u.path + (f"?{u.query}" if u.query is not None else "")
        return any(path.startswith(p) for p in prefixes)

    def filter_frontier(self, frontier: pa.Table) -> tuple[pa.Table, int]:
        """Drop disallowed rows; returns (kept, n_dropped). Vectorized:
        the path+query string is one regex kernel over the url column and
        only hosts that actually HAVE disallow prefixes pay a startswith
        pass — no per-row ``un.parse`` (frontier-sized Python on the
        driver was the old form). Differential-tested against the scalar
        ``disallowed`` in test_priority_robots.py."""
        if frontier.num_rows == 0:
            return frontier, 0
        host_col = frontier["host"].combine_chunks()
        hosts = {h for h in host_col.unique().to_pylist() if h is not None}
        self.ensure_hosts(hosts)
        active = {h: p for h, p in self.rules.items() if p and h in hosts}
        if not active:
            return frontier, 0
        import numpy as np

        urls = frontier["url"].combine_chunks()
        # path+query = serialization minus scheme://authority and fragment
        # (frontier urls are canonical serializations, same invariant the
        # lookup-table build relies on)
        path = pc.replace_substring_regex(
            pc.replace_substring_regex(urls, pattern=r"(?s)#.*$", replacement=""),
            pattern=r"^[^:]*://[^/]*",
            replacement="",
        ).to_pandas()
        hs = host_col.to_pandas()
        drop = np.zeros(frontier.num_rows, dtype=bool)
        for h, prefixes in active.items():
            m = (hs == h).to_numpy()
            if not m.any():
                continue
            sub = path[m]
            d = np.zeros(int(m.sum()), dtype=bool)
            for p in prefixes:
                d |= sub.str.startswith(p).to_numpy()
            drop[m] = d
        kept = frontier.filter(pa.array(~drop))
        return kept, int(drop.sum())
