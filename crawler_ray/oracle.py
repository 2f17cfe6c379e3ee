"""Pure-Python oracle simulator of the reference crawl semantics.

A row-at-a-time, single-process reimplementation of the reference's
dispatcher loop (/root/reference/src/main.rs:86-147) and page/image paths
(main.rs:150-173, 264-281), with fetching replaced by corpus lookup and the
reference's nondeterministic intra-wave ordering replaced by the canonical
wave order (SURVEY.md §3): within each wave, findings are processed in
lexicographic ``(kind, url, depth)`` order ('image' < 'page'). The Ray
engine implements the same canonical order, which makes crawl order, budget
admission, and the image-overwrite winner deterministic and comparable.

Faithful reference semantics encoded here (each has a unit/fixture test):

- **Finding identity** is the full (kind, url, depth-for-pages) tuple
  (main.rs:58-62: ``derive(Hash, Eq)`` on the enum) — images carry no depth.
- **Seeds** enter the queue but are NOT added to the archive (main.rs:87-92);
  a later link to a seed is genuinely re-dispatched.
- **Politeness**: at dispatch, skip when the host's count is ``> 256``,
  *then* increment — so up to 257 dispatches per host succeed
  (main.rs:24, 103-107). Host-less findings are skipped without counting
  (main.rs:100-102). Failed fetches still count (the count happens at
  dispatch).
- **Dedup**: per spider response, ``findings − archive`` then
  ``archive ∪= new`` (main.rs:129-130); archive grows even for findings
  later blocked by depth or budget.
- **Depth**: gate is ``response_depth < limit`` on *enqueue*
  (main.rs:132-134); faithful mode never increments depth (children inherit
  the parent's depth, main.rs:198-200), so the gate is inert;
  ``faithful_depth=False`` uses parent+1 (the evident intent).
- **Image sink**: filename = last path segment (main.rs:271-275); URLs with
  no segments are skipped silently; an empty last segment fails file
  creation (warn-and-drop); same-filename writes silently overwrite — the
  final file content is the canonically-last write (main.rs:276-278).
- **Fetch miss** (URL absent from corpus) = request error: warn-and-drop
  (main.rs:136, 142-144).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from . import urlnorm as un
from .html_extract import extract

PAGE, IMAGE = "page", "image"


def finding_key(url: str, kind: str, depth: int) -> tuple[str, str, int]:
    """Archive/dedup key. Images carry no depth in the reference enum, so
    their depth is pinned to 0 in the key."""
    return (url, kind, depth if kind == PAGE else 0)


def canonical_sort_key(item: tuple[str, str, int]) -> tuple[str, str, int]:
    url, kind, depth = item
    return (kind, url, depth)


@dataclass
class CrawlResult:
    # (wave, rank, url, kind, depth) for every ADMITTED dispatch
    order: list[tuple[int, int, str, str, int]] = field(default_factory=list)
    # final URL-seen set, Finding-keyed
    archive: set[tuple[str, str, int]] = field(default_factory=set)
    host_counts: Counter = field(default_factory=Counter)
    # url (with fragment) -> extracted text, for every successful page fetch
    texts: dict[str, str] = field(default_factory=dict)
    # every successful image write in canonical global order
    image_writes: list[tuple[int, int, str, str]] = field(default_factory=list)
    # filename -> url of the canonically-last write (overwrite semantics)
    image_files: dict[str, str] = field(default_factory=dict)
    metrics: Counter = field(default_factory=Counter)
    n_waves: int = 0


def _robots_rules(corpus: dict[str, bytes], host: str) -> "list[tuple[bool, str]]":
    from .stages.robots import parse_robots_rules

    rules: list[tuple[bool, str]] = []
    for scheme in ("http", "https"):
        body = corpus.get(f"{scheme}://{host}/robots.txt")
        if body is not None:
            rules.extend(parse_robots_rules(body))
    return rules


def _pattern_matches(pattern: str, path: str) -> bool:
    """INDEPENDENT RFC 9309 rule match (no regex — greedy-with-backtrack
    wildcard scan), differentially tested against the engine's compiled
    form (stages/robots._rule_regex) in test_priority_robots.py. ``*``
    matches any octet sequence; a trailing ``$`` anchors the end;
    mid-pattern ``$`` is literal; match is anchored at path start."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    pos = 0
    # first part must match at the very start
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for part in parts[1:-1] if len(parts) > 1 else []:
        i = path.find(part, pos)
        if i < 0:
            return False
        pos = i + len(part)
    if len(parts) > 1:
        last = parts[-1]
        if anchored:
            return path.endswith(last) and len(path) - len(last) >= pos
        i = path.find(last, pos)
        return i >= 0
    return not anchored or pos == len(path)


def _robots_allows(rules: "list[tuple[bool, str]]", path: str) -> bool:
    """Longest-pattern-wins precedence, Allow beats Disallow on ties
    (RFC 9309 §2.2.2); no matching rule ⇒ allowed."""
    best: "tuple[int, bool] | None" = None  # (pattern_len, allow)
    for allow, pattern in rules:
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if best is None or plen > best[0] or (plen == best[0] and allow):
                best = (plen, allow)
    return True if best is None else best[1]


def simulate(
    corpus: dict[str, bytes],
    seeds: list[str],
    depth_limit: int = 4,
    host_limit: int = 256,
    faithful_depth: bool = True,
    priority: str = "canonical",
    respect_robots: bool = False,
    host_rank: "dict[str, float] | None" = None,
    blocked_hosts: "set[str] | None" = None,
) -> CrawlResult:
    res = CrawlResult()
    robots: dict[str, list[str]] = {}

    def robots_disallowed(u: un.Url) -> bool:
        if u.host not in robots:
            robots[u.host] = _robots_rules(corpus, u.host)
        path = u.path + (f"?{u.query}" if u.query is not None else "")
        return not _robots_allows(robots[u.host], path)

    # CLI seed parse: invalid seed is a hard error (main.rs:301-307 unwrap)
    seed_urls = {str(un.parse(s)) for s in seeds}
    queue: list[tuple[str, str, int]] = [(u, PAGE, 0) for u in seed_urls]

    while queue:
        wave = res.n_waves
        res.n_waves += 1
        current, queue = queue, []

        # blocklist gate (extension — e.g. trap_host_stats output): first
        # of the frontier gates, before robots/hostless/budget, uncounted
        if blocked_hosts:
            kept = []
            for item in current:
                u = un.parse(item[0])
                if u.host is not None and u.host in blocked_hosts:
                    res.metrics["dropped_blocked_host"] += 1
                else:
                    kept.append(item)
            current = kept

        # robots gate (extension): before hostless/budget, uncounted
        if respect_robots:
            kept = []
            for item in current:
                u = un.parse(item[0])
                if u.host is not None and robots_disallowed(u):
                    res.metrics["dropped_robots"] += 1
                else:
                    kept.append(item)
            current = kept

        # hostless drop, then priority order over the remainder
        valid = []
        for item in current:
            if un.parse(item[0]).host is None:
                res.metrics["dropped_hostless"] += 1
            else:
                valid.append(item)
        if priority == "canonical":
            valid.sort(key=canonical_sort_key)
        elif priority == "shallow_first":
            valid.sort(key=lambda it: (it[2], it[1], it[0]))
        elif priority == "hot_host_first":
            wave_hosts = Counter(un.parse(it[0]).host for it in valid)
            valid.sort(
                key=lambda it: (
                    -wave_hosts[un.parse(it[0]).host],
                    un.parse(it[0]).host,
                    it[1],
                    it[0],
                    it[2],
                )
            )
        elif priority == "ranked":
            rk = host_rank or {}
            valid.sort(
                key=lambda it: (
                    -rk.get(un.parse(it[0]).host, 0.0),
                    un.parse(it[0]).host,
                    it[1],
                    it[0],
                    it[2],
                )
            )
        else:
            raise ValueError(f"unknown priority mode {priority!r}")

        admitted: list[tuple[str, str, int]] = []
        rank = 0
        for url_s, kind, depth in valid:
            u = un.parse(url_s)
            if res.host_counts[u.host] > host_limit:
                res.metrics["dropped_budget"] += 1
                continue
            res.host_counts[u.host] += 1
            admitted.append((url_s, kind, depth))
            res.order.append((wave, rank, url_s, kind, depth))
            rank += 1

        # barrier 1: all spiders (pages). Response processing stays in
        # CANONICAL order even under priority admission modes (priority
        # governs dispatch/budget rank only) so archive/queue winners and
        # image overwrites stay order-deterministic across both engines.
        admitted = sorted(admitted, key=canonical_sort_key)
        for url_s, kind, depth in admitted:
            if kind != PAGE:
                continue
            u = un.parse(url_s)
            # reqwest speaks only http/https: any other scheme is a builder
            # error even though it passed the contains("http") filter — e.g.
            # an "xhttpx" finding dispatches, counts, then fails here
            if u.scheme not in ("http", "https"):
                res.metrics["fetch_unsupported_scheme"] += 1
                continue
            body = corpus.get(str(u.without_fragment()))
            if body is None:
                res.metrics["fetch_miss_page"] += 1
                continue
            # the oracle always tokenizes with the html.parser-based
            # REFERENCE implementation; the engine uses the fast scanner, so
            # engine-vs-oracle equality differentially verifies the fast
            # path on every crawled page
            page_links, image_links, text = extract(body, fast=False)
            res.texts[url_s] = text

            kept_pages, mal_p = un.parse_links(page_links, u)
            kept_images, mal_i = un.parse_links(image_links, u)
            res.metrics["malformed_links"] += mal_p + mal_i

            child_depth = depth if faithful_depth else depth + 1
            findings: set[tuple[str, str, int]] = set()
            for cu in kept_pages:
                findings.add(finding_key(str(cu), PAGE, child_depth))
            for cu in kept_images:
                findings.add(finding_key(str(cu), IMAGE, 0))

            new = findings - res.archive
            res.archive |= new
            if depth < depth_limit:
                queue.extend(sorted(new, key=canonical_sort_key))

        # barrier 2: all fetchers (images), canonical order
        for url_s, kind, _depth in admitted:
            if kind != IMAGE:
                continue
            u = un.parse(url_s)
            if u.scheme not in ("http", "https"):
                res.metrics["fetch_unsupported_scheme"] += 1
                continue
            body = corpus.get(str(u.without_fragment()))
            if body is None:
                res.metrics["fetch_miss_image"] += 1
                continue
            seg = u.last_path_segment()
            if seg is None:
                res.metrics["image_no_segments"] += 1
                continue
            if seg == "":
                res.metrics["image_sink_error"] += 1  # File::create("dir/") fails
                continue
            res.image_writes.append((wave, len(res.image_writes), url_s, seg))
            res.image_files[seg] = url_s

    return res
