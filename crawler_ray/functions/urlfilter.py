"""RefinedWeb-style URL quality filtering (Penedo et al. 2023 §3.1, after
Gopher/CCNet practice) — the curation stage that drops documents by their
URL alone, BEFORE any text is fetched or scored: a blocklist of known-bad
registered domains plus a weighted "soft" word score over the full URL
string (one strike word isn't fatal; several are).

Rules (per URL):
  * ``banned_host`` — the URL's host equals a blocklist entry or is a
    subdomain of one (``host == b`` or ``host`` ends with ``"." + b``).
    The host is the authority with any ``user[:pw]@`` userinfo stripped
    and any ``[...]`` IPv6 brackets removed, lowercased, without port;
  * ``soft_score`` — sum of weights of every soft word CONTAINED in the
    lowercased URL (each word counted once, presence not frequency —
    RefinedWeb's sub-word matching), rounded half-up to 6 dp (the same
    rounding the emitted column carries, so ``kept`` can never
    contradict a consumer recomputing the gate from the output);
  * ``kept`` — not banned AND ``soft_score < cutoff``.

Scale shape: embarrassingly per-row — ONE ``map_batches`` pass, no
shuffle; the blocklist/word table is a closure constant (broadcast once
with the function, never re-shipped per batch). Host extraction is one
vectorized ``extract_regex``; blocklist matching is one last-L-labels
suffix extraction + ``is_in`` per DISTINCT label count in the blocklist
(so a RefinedWeb-scale 4.6M-domain list costs ~3 passes, not 4.6M); the
soft score is |words| substring kernels over the batch (the word list is
policy-sized, tens of entries), summed in a float64 accumulator — no
per-row Python anywhere. At the crawl frontier the same kernel gates
findings before dispatch, where it is strictly cheaper than the
politeness exchange it precedes.

Reference anchor: the reference crawler fetches every discovered URL that
passes the scheme/host predicates (/root/reference/src/main.rs:218-219)
— it has no URL-quality notion; this operator is part of the
beyond-reference training-data extension set (SURVEY.md §2
"LLM-data-pipeline operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: host part of an absolute hierarchical URL:
#: scheme://[userinfo@]HOST[:port][/...], where HOST is a reg-name
#: (stops at ':' port) or a bracketed IPv6 literal (may contain ':');
#: brackets are trimmed after extraction
_HOST_PATTERN = (
    r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?"
    r"(?P<host>\[[^\]]*\]|[^/?#:]*)"
)


def url_quality(
    batch: pa.Table,
    *,
    url_col: str = "url",
    blocked_hosts: "tuple[str, ...]" = (),
    soft_words: "dict[str, float] | None" = None,
    cutoff: float = 2.0,
) -> pa.Table:
    """Score one batch of URLs. Returns the input columns plus
    ``(host, soft_score, banned_host, kept)``. URLs whose host can't be
    extracted (relative/opaque) get ``host = ''`` and are never
    blocklist-banned (the soft score still applies — a policy word in an
    opaque URL still counts)."""
    urls = pc.fill_null(batch[url_col], "")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if pa.types.is_large_string(urls.type):
        urls = urls.cast(pa.string())
    n = len(urls)
    low = pc.utf8_lower(urls)

    # host: vectorized regex extract; non-matching rows -> ''. Trim any
    # IPv6 brackets (hostnames can't contain '[' / ']', so the trim is a
    # no-op on reg-names).
    matched = pc.extract_regex(low, _HOST_PATTERN)
    host = pc.utf8_trim(
        pc.fill_null(pc.struct_field(matched, "host"), ""), "[]"
    )

    # blocklist: "host == b or host ends with '.' + b" ≡ "the host's
    # last-L-labels suffix equals b", L = b's label count. One regex
    # suffix extraction + one is_in per DISTINCT L (a handful), so cost
    # is independent of blocklist size.
    banned = np.zeros(n, dtype=bool)
    if blocked_hosts:
        by_labels: "dict[int, list[str]]" = {}
        for b in blocked_hosts:
            by_labels.setdefault(b.count(".") + 1, []).append(b.lower())
        for lab, entries in sorted(by_labels.items()):
            # leftmost match ending at $ with exactly lab-1 dots = the
            # last `lab` labels; hosts with fewer labels don't match
            sfx_pat = r"(?P<s>(?:[^.]*\.){%d}[^.]*)$" % (lab - 1)
            sfx = pc.fill_null(
                pc.struct_field(pc.extract_regex(host, sfx_pat), "s"), ""
            )
            banned |= pc.is_in(
                sfx, value_set=pa.array(entries, pa.string())
            ).to_numpy(zero_copy_only=False)

    score = np.zeros(n, dtype=np.float64)
    for word, weight in (soft_words or {}).items():
        score += weight * pc.match_substring(low, word.lower()).to_numpy(
            zero_copy_only=False
        )
    score = np.floor(score * 1e6 + 0.5) / 1e6  # 6-dp half-up, then gate

    kept = ~banned & (score < cutoff)
    out = batch
    for name, arr in (
        ("host", host),
        ("soft_score", pa.array(score, pa.float64())),
        ("banned_host", pa.array(banned)),
        ("kept", pa.array(kept)),
    ):
        out = out.append_column(name, arr)
    return out


def url_filter(ds, **kwargs):
    """URL-quality scoring over a Dataset: one vectorized ``map_batches``
    pass (per-row-local — no shuffle). Returns the input rows annotated
    with ``(host, soft_score, banned_host, kept)``; the surviving corpus
    is ``.filter(kept)``."""
    return ds.map_batches(url_quality, batch_format="pyarrow", fn_kwargs=kwargs)


#: authority (incl. any port/userinfo — the raw trap key) and the path
#: between authority and the first '?'/'#'
_AUTH_PATH_PATTERN = (
    r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
)


def trap_host_stats(
    ds,
    *,
    url_col: str = "url",
    min_urls: int = 5,
    depth_hi: float = 2.5,
    query_hi: float = 0.3,
):
    """Crawler-trap host detection from URL SHAPE alone — the classic
    frontier-hygiene heuristic (Heydon & Najork's Mercator, 1999, and
    every production crawler since): hosts whose discovered URLs are
    systematically deep (calendar/pagination traps) or query-heavy
    (session-id / faceted-search explosions) get flagged before they eat
    the politeness budget. This inspects only the frontier table — no
    fetch needed — so it runs BEFORE dispatch, complementing
    ``url_filter`` (per-URL policy) and the per-host budget (hard cap).

    Per URL (vectorized, one pass): ``host`` = the raw authority after
    ``scheme://`` (incl. port — the trap key is the exact authority),
    ``depth`` = count of non-empty '/'-separated path segments,
    ``has_query`` = contains '?'. Per host: ``n_urls``, ``mean_depth``
    and ``query_frac`` (each rounded half-up to 6 dp), and
    ``trap = n_urls >= min_urls AND (mean_depth >= depth_hi OR
    query_frac >= query_hi)`` — the flag computed FROM THE ROUNDED
    values (same consumer-can-recompute contract as ``url_quality``).

    Scale shape: identical to hoststats — per-batch feature derivation +
    combiner, one bucketed host exchange, host-cardinality result (the
    small side by contract; feed ``trap`` hosts back into the frontier
    as a blocklist join). URLs that don't parse as absolute hierarchical
    URLs are dropped from the stats (counted nowhere), matching the
    crawl engine's warn-and-drop contract for malformed findings.
    """
    import pandas as pd

    from ..stages.shuffle import bucketed_group_agg

    def partial(t: pa.Table) -> pd.DataFrame:
        urls = pc.fill_null(t[url_col], "").combine_chunks()
        m = pc.extract_regex(urls, _AUTH_PATH_PATTERN)
        ok = pc.is_valid(m).to_numpy(zero_copy_only=False)
        host = pc.struct_field(m, "auth").to_numpy(zero_copy_only=False)
        path = pc.struct_field(m, "path")
        # non-empty path-segment count: explode + mask + bincount
        segs = pc.split_pattern(pc.fill_null(path, ""), pattern="/")
        vals = segs.values.to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        nonempty = vals != ""
        depth = np.bincount(row_idx[nonempty], minlength=len(lens))
        has_q = pc.match_substring(urls, "?").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "host": host[ok],
                "depth": depth[ok].astype(np.int64),
                "has_q": has_q[ok].astype(np.int64),
            }
        )

    derived = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    g = bucketed_group_agg(
        derived,
        keys=["host"],
        agg={
            "n_urls": ("depth", "size"),
            "sum_depth": ("depth", "sum"),
            "n_query": ("has_q", "sum"),
        },
    )
    n = g["n_urls"].to_numpy(dtype=np.int64)
    mean_depth = np.floor(
        g["sum_depth"].to_numpy(dtype=np.float64) / n * 1e6 + 0.5
    ) / 1e6
    query_frac = np.floor(
        g["n_query"].to_numpy(dtype=np.float64) / n * 1e6 + 0.5
    ) / 1e6
    out = pd.DataFrame(
        {
            "host": g["host"],
            "n_urls": n,
            "mean_depth": mean_depth,
            "query_frac": query_frac,
            "trap": (n >= min_urls)
            & ((mean_depth >= depth_hi) | (query_frac >= query_hi)),
        }
    )
    return out.sort_values("host").reset_index(drop=True)


# -------------------------------------------- tracking-param canonical dedup

#: query parameters that never change the served content — the published
#: click-tracking families (Google Analytics utm_*, Google Ads gclid,
#: Facebook fbclid, Microsoft msclkid, generic ref) every production
#: crawler strips before frontier dedup (cf. the parameter blocklists
#: shipped by Heritrix's canonicalization rules and brave/adblock
#: "tracking parameter" lists; the pattern set here is the documented
#: subset both the engine and the SQL oracle state verbatim)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="


def canonical_url_strip_tracking(urls: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Vectorized URL canonicalization for frontier/storage dedup: drop
    the fragment, then remove query parameters matching
    ``TRACKING_PARAM_RE`` (param ORDER among survivors is preserved — the
    conservative choice: reordering can change served content on sloppy
    servers, so only provably-inert params are touched). A query left
    empty loses its ``?``. Pure string algebra (polars split / list
    filter / join) — no per-row Python."""
    import polars as pl

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    s = pl.from_arrow(pc.fill_null(urls, ""))
    no_frag = s.str.replace(r"#.*$", "")
    base = no_frag.str.replace(r"\?.*$", "")
    q = no_frag.str.extract(r"\?(.*)$", 1).fill_null("")
    kept = (
        q.str.split("&")
        .list.eval(
            pl.element().filter(
                (pl.element() != "")
                & ~pl.element().str.contains(TRACKING_PARAM_RE)
            )
        )
        .list.join("&")
    )
    out = (
        pl.DataFrame({"base": base, "kept": kept})
        .select(
            (
                pl.col("base")
                + pl.when(pl.col("kept") == "")
                .then(pl.lit(""))
                .otherwise(pl.lit("?") + pl.col("kept"))
            ).alias("canonical")
        )["canonical"]
        .to_arrow()
    )
    out = out.cast(pa.string())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def url_param_dedup(
    ds,
    url_col: str = "url",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Tracking-parameter URL dedup: canonicalize every URL with
    ``canonical_url_strip_tracking``, then keep ONE representative (min
    id) per canonical form — the frontier-side dedup that stops a crawler
    fetching the same page once per utm-tagged inbound link. One
    map_batches + one hash-bucketed exchange on the canonical key (all
    ids of a canonical URL land in one bucket), per-bucket count/min —
    same keep-min-per-key shape as ``dedup.exact_dedup_ids``. Output
    ``(canonical_url, n_urls, keep_id)`` sorted by canonical_url."""
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    def canon(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonical_url_strip_tracking(t[url_col]),
                "id": t[id_col].cast(pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("canonical_url", sort=False)["id"].agg(
            ["size", "min"]
        )
        return pd.DataFrame(
            {
                "canonical_url": g.index,
                "n_urls": g["size"].to_numpy().astype(np.int64),
                "keep_id": g["min"].to_numpy().astype(np.int64),
            }
        )

    empty = pa.table(
        {
            "canonical_url": pa.array([], pa.string()),
            "n_urls": pa.array([], pa.int64()),
            "keep_id": pa.array([], pa.int64()),
        }
    )
    refs = bucketed_group_map_refs(
        ds.map_batches(canon, batch_format="pyarrow"),
        bucket_on="canonical_url",
        fn=fold,
        n_buckets=n_buckets,
    )
    got = gather_refs_pd(refs, empty=empty) if refs is not None else empty.to_pandas()
    return (
        got.sort_values("canonical_url")
        .reset_index(drop=True)
        .astype({"n_urls": "int64", "keep_id": "int64"})
    )


# --------------------------------------------- registered-domain grouping

#: multi-label public suffixes recognized by this kernel — a DOCUMENTED
#: SUBSET of Mozilla's Public Suffix List (publicsuffix.org; the full
#: list is ~9k rules and ships as data in production — the kernel shape
#: is identical, this constant is the swap point). Politeness budgets,
#: mirror detection and host stats all group at the REGISTERED domain,
#: not the hostname: shop.example.co.uk and www.example.co.uk are one
#: crawl-budget principal.
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "co.in", "co.kr",
    "com.mx", "co.nz", "co.za",
)


def registered_domain(hosts: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Vectorized hostname → registered domain (eTLD+1): the last public-
    suffix label run plus one label. Lowercases; IPv4 literals and
    single-label hosts pass through unchanged; a host that IS a public
    suffix passes through (nothing is registered under it to name); NULL
    stays NULL. Pure polars list algebra — split, tail-join, set
    membership — no per-row Python."""
    import polars as pl

    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    s = pl.from_arrow(hosts).str.to_lowercase()
    labels = s.str.split(".")
    n = labels.list.len()
    last2 = labels.list.tail(2).list.join(".")
    last3 = labels.list.tail(3).list.join(".")
    is_ip = s.str.contains(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    is_multi = last2.is_in(list(MULTI_PART_SUFFIXES))
    out = (
        pl.DataFrame(
            {
                "host": s,
                "n": n,
                "last2": last2,
                "last3": last3,
                "ip": is_ip,
                "multi": is_multi,
            }
        )
        .select(
            pl.when(pl.col("host").is_null())
            .then(pl.lit(None, dtype=pl.String))
            .when(pl.col("ip") | (pl.col("n") <= 1))
            .then(pl.col("host"))
            .when(pl.col("multi") & (pl.col("n") >= 3))
            .then(pl.col("last3"))
            .when(pl.col("multi"))
            .then(pl.col("host"))  # the host IS the suffix
            .otherwise(pl.col("last2"))
            .alias("reg")
        )["reg"]
        .to_arrow()
    )
    out = out.cast(pa.string())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
