"""robots.txt politeness gate (engine extension; the reference has none).

The north-star design keeps per-host robots rules cached next to the
politeness state. Here the cache is a driver/broadcast dict populated
lazily per wave: for every not-yet-seen host in the frontier, the corpus is
probed (pushdown ``isin`` scan, both schemes) for ``{scheme}://host/robots.txt``
and the body parsed per RFC 9309 (the Robots Exclusion Protocol as
standardized in 2022): ``User-agent: *`` group selection with stacked
user-agent lines, BOTH ``Allow`` and ``Disallow`` rules, ``*`` wildcards
and trailing-``$`` end anchors in rule paths, and longest-rule-wins
precedence with Allow beating Disallow on equal length (RFC 9309 §2.2.2;
the same tie-break Google's open-sourced matcher uses). Only the ``*``
group applies — this crawler sends no product token, so specific-agent
groups never select (documented scope). Percent-encoding normalization of
rule/path octets is NOT performed (rules and frontier paths both come
from the corpus's canonical serializations, so they meet in the same
encoding by construction).

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


#: a rule is (allow, pattern): pattern may contain ``*`` wildcards and a
#: trailing ``$`` end anchor, per RFC 9309 §2.2.3
Rule = "tuple[bool, str]"


def parse_robots(body: bytes | str) -> list[str]:
    """Disallow rule PATTERNS for the ``*`` group (legacy accessor —
    matching must go through ``compile_rules``/``rules_allow``, since a
    pattern may carry wildcards/anchors and Allow rules may override)."""
    return [p for allow, p in parse_robots_rules(body) if not allow]


def parse_robots_rules(body: bytes | str) -> "list[tuple[bool, str]]":
    """``(allow, pattern)`` rules of the ``User-agent: *`` group(s), in
    file order. RFC 9309 group structure: consecutive ``User-agent``
    lines stack onto ONE group (the group applies if ANY stacked agent is
    ``*``); a ``User-agent`` line after rule lines starts a new group;
    multiple ``*`` groups concatenate (§2.2.1: rules of matching groups
    are combined). Empty rule values carry no rule (``Disallow:`` alone
    is the classic allow-everything form)."""
    return _parse_robots_full(body)[0]


def parse_crawl_delay(body: bytes | str) -> float | None:
    """``Crawl-delay`` seconds for User-agent: * (same group rule as
    Allow/Disallow; non-numeric / non-positive values ignored)."""
    return _parse_robots_full(body)[1]


def _parse_robots_full(
    body: bytes | str,
) -> "tuple[list[tuple[bool, str]], float | None]":
    if isinstance(body, bytes):
        body = body.decode("utf-8", errors="replace")
    rules: list[tuple[bool, str]] = []
    delay: float | None = None
    applies = False
    in_rules = False  # a user-agent line after rules starts a NEW group
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if in_rules:
                applies, in_rules = False, False
            applies = applies or value == "*"
        elif field in ("disallow", "allow"):
            in_rules = True
            if applies and value:
                rules.append((field == "allow", value))
        elif field == "crawl-delay":
            in_rules = True
            if applies and delay is None:
                try:
                    d = float(value)
                except ValueError:
                    continue
                if d > 0:
                    delay = d
    return rules, delay


def _rule_regex(pattern: str) -> str:
    """Rule pattern → anchored-at-start regex: ``*`` → ``.*``, ``$`` is an
    end anchor only in trailing position (mid-pattern ``$`` is literal,
    matching Google's matcher)."""
    import re as _re

    anchor = pattern.endswith("$")
    if anchor:
        pattern = pattern[:-1]
    body = ".*".join(_re.escape(part) for part in pattern.split("*"))
    return body + ("$" if anchor else "")


def compile_rules(rules: "list") -> "list[tuple[bool, object]]":
    """Rules → precedence-ordered ``(allow, compiled_regex)`` list: longest
    pattern first (RFC 9309 §2.2.2 most-octets precedence), Allow before
    Disallow on equal length. Legacy plain-string entries are accepted as
    Disallow patterns. The first matching entry decides; no match ⇒
    allowed."""
    import re as _re

    norm: list[tuple[bool, str]] = [
        (False, r) if isinstance(r, str) else (bool(r[0]), r[1])
        for r in rules
    ]
    norm.sort(key=lambda r: (-len(r[1]), not r[0]))
    return [(allow, _re.compile(_rule_regex(p))) for allow, p in norm]


def rules_allow(compiled: "list", path: str) -> bool:
    """Scalar precedence match (vectorized form: ``filter_frontier``)."""
    for allow, rx in compiled:
        if rx.match(path) is not None:
            return allow
    return True


class RobotsCache:
    def __init__(self, corpus_path: str | list[str]) -> None:
        self.corpus_path = corpus_path
        #: host -> (allow, pattern) rules (legacy plain-string entries are
        #: accepted as Disallow patterns by compile_rules)
        self.rules: dict[str, list] = {}
        self.delays: dict[str, float | None] = {}  # Crawl-delay seconds
        self._compiled: dict[str, list] = {}

    def _host_compiled(self, host: str) -> list:
        c = self._compiled.get(host)
        if c is None:
            c = compile_rules(self.rules.get(host, ()))
            self._compiled[host] = c
        return c

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
        found: dict[str, list] = {}
        delays: dict[str, float] = {}
        for u, body in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            host = un.parse(u).host
            rules, delay = _parse_robots_full(body)
            found.setdefault(host, []).extend(rules)
            if delay is not None:
                # both schemes present: the stricter (longer) delay wins
                delays[host] = max(delay, delays.get(host, 0.0))
        for h in missing:
            self.rules[h] = found.get(h, [])
            self.delays[h] = delays.get(h)
            self._compiled.pop(h, None)

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
        path = u.path + (f"?{u.query}" if u.query is not None else "")
        return not rules_allow(self._host_compiled(u.host), path)

    def filter_frontier(self, frontier: pa.Table) -> tuple[pa.Table, int]:
        """Drop disallowed rows; returns (kept, n_dropped). Vectorized:
        the path+query string is one regex kernel over the url column,
        and only hosts that actually HAVE rules pay matching passes — no
        per-row ``un.parse``. Precedence is evaluated rule-at-a-time over
        the host's rows (rules are precedence-sorted by compile_rules, so
        the FIRST rule matching an undecided row decides it — same
        first-match-decides contract as ``rules_allow``, whose scalar form
        this is differential-tested against in test_priority_robots.py).
        Rule count per host is robots-file-sized, so the per-rule loop is
        bounded and every pass over rows is a vectorized str.match."""
        if frontier.num_rows == 0:
            return frontier, 0
        host_col = frontier["host"].combine_chunks()
        hosts = {h for h in host_col.unique().to_pylist() if h is not None}
        self.ensure_hosts(hosts)
        active = {h: self._host_compiled(h) for h in hosts if self.rules.get(h)}
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
        for h, compiled in active.items():
            m = (hs == h).to_numpy()
            if not m.any():
                continue
            sub = path[m]
            undecided = np.ones(int(m.sum()), dtype=bool)
            d = np.zeros(int(m.sum()), dtype=bool)
            for allow, rx in compiled:
                if not undecided.any():
                    break
                hit = undecided & sub.str.match(rx).to_numpy()
                if not allow:
                    d |= hit
                undecided &= ~hit
            drop[m] = d
        kept = frontier.filter(pa.array(~drop))
        return kept, int(drop.sum())
