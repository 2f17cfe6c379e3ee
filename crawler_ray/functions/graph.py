"""Link-graph analytics over crawl output — host-level PageRank, HITS
hubs/authorities, and anchor-text aggregation.

PageRank (Page/Brin/Motwani/Winograd 1999, public spec): rank flows along
out-edges with damping ``d``; dangling (no-out-edge) mass and the teleport
term redistribute uniformly each iteration.

Physical plan per iteration (the edge-scale work never lands on the
driver):

  * the node-scale (src → rank/outdeg) weight table broadcasts once
    (``ray.put`` of sorted arrays, ``np.searchsorted`` lookup per batch);
  * each EDGE batch emits per-dst partial contribution sums — the
    mergeable-combiner shape, output ∝ distinct dsts per batch;
  * one bucketed task exchange sums partials per dst;
  * the driver folds the node-scale result with teleport + dangling mass.

Ranks are quantized to float32 after every update, so the float64
partial-reduction order (which varies with batching / parallelism) cannot
leak into the result — same discipline as ``similarity.kmeans_embeddings``.

Scale note: ranks/out-degrees are node-scale (hosts, ~10^8 at web scale —
a few GB as arrays, broadcast-feasible); edges are edge-scale and stay in
the object store. For node tables that outgrow the broadcast budget
(10^9+ nodes), ``pagerank_sharded`` below keeps ranks as hash-bucketed
pinned tables and exchanges contributions src-bucket → dst-bucket, with
only ``n_buckets`` floats per iteration reaching the driver; it matches
this broadcast form exactly at fixture scale
(tests/test_functions.py::test_pagerank_sharded_matches_broadcast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _dedup_edges(edges_ds, src_col: str, dst_col: str, n_buckets: int):
    """Distinct (src, dst) pairs, self-loops dropped, materialized once so
    the per-iteration passes re-read blocks instead of re-deriving them."""
    from ..stages.shuffle import bucketed_group_map

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.is_valid(t[src_col]), pc.is_valid(t[dst_col])
            ),
            pc.not_equal(t[src_col], t[dst_col]),
        )
        t = t.filter(keep)
        return pa.table({"src": t[src_col], "dst": t[dst_col]})

    deduped = bucketed_group_map(
        edges_ds.map_batches(prep, batch_format="pyarrow"),
        bucket_on="src",
        fn=lambda df: df.drop_duplicates(["src", "dst"]),
        n_buckets=n_buckets,
    )
    return deduped.materialize()


def pagerank(
    edges_ds,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 8,
    round_dp: int = 6,
    driver_combine_nodes: int = 100_000,
) -> pd.DataFrame:
    """PageRank over a Dataset of directed string edges.

    Deterministic spec (restated by the independent pytest reference):
    distinct edges, self-loops excluded; nodes = union of endpoints; init
    rank 1/n; ``iters`` iterations of
    ``r'(v) = (1-d)/n + d * (Σ_{u→v} r(u)/outdeg(u) + dangling/n)``;
    ranks float32-quantized per iteration; final ranks rounded half-up to
    ``round_dp`` decimals. Returns ``(node, pr)`` sorted by node.
    """
    import ray

    from ..stages.shuffle import apply_refs

    edges = _dedup_edges(edges_ds, src_col, dst_col, n_buckets)
    if edges.count() == 0:  # nothing survives dedup/self-loop filtering
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "pr": pd.Series(dtype=float)}
        )
    # every pass below re-reads the SAME pinned edge blocks: plain task
    # waves (apply_refs) instead of a streaming-executor launch per pass
    # (2 node-scale passes + ``iters`` contribution passes)
    edge_refs = edges.to_arrow_refs()

    # node-scale: out-degree per src and the node universe
    def deg_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["src"].to_numpy(zero_copy_only=False), return_counts=True
        )  # combiner: rows ∝ distinct srcs per batch, not edges
        return pa.table(
            {"src": pa.array(u, pa.string()), "one": pa.array(c, pa.int64())}
        )

    deg_parts = apply_refs(deg_partial, edge_refs)
    if deg_parts.empty:  # no edges survive dedup/self-loop filtering
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "pr": pd.Series(dtype=float)}
        )
    deg = deg_parts.groupby("src", sort=True)["one"].sum()
    def batch_nodes(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )  # per-batch combiner: output ∝ distinct endpoints per batch
        return pa.table({"node": pa.array(u, pa.string())})

    endpoints = apply_refs(batch_nodes, edge_refs)
    nodes = np.unique(endpoints["node"].to_numpy())
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype=object), "pr": pd.Series(dtype=float)})

    outdeg = np.zeros(n, np.float64)
    src_pos = np.searchsorted(nodes, deg.index.to_numpy())
    outdeg[src_pos] = deg.to_numpy(np.float64)
    dangling_mask = outdeg == 0

    pr = np.full(n, 1.0 / n, np.float64).astype(np.float32).astype(np.float64)

    from ..stages.shuffle import bucketed_group_map

    # the node-NAME array is constant across iterations — put it once;
    # only the small float weight vector re-broadcasts per iteration
    # (object-dtype string arrays are the expensive part to ship)
    nodes_ref = ray.put(nodes)

    for _ in range(iters):
        w = np.zeros(n, np.float64)
        nz = ~dangling_mask
        w[nz] = pr[nz] / outdeg[nz]
        w_ref = ray.put(w)

        def contrib(t: pa.Table, _nref=nodes_ref, _wref=w_ref) -> pa.Table:
            nds, wts = ray.get(_nref), ray.get(_wref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            c = wts[np.searchsorted(nds, src)]
            ud, inv = np.unique(dst, return_inverse=True)
            sums = np.bincount(inv, weights=c)
            return pa.table(
                {
                    "dst": pa.array(ud, pa.string()),
                    "c": pa.array(sums, pa.float64()),
                }
            )

        if n <= driver_combine_nodes:
            # small-graph fast path: the per-block partials are already
            # ≤ nodes rows each — fold them on the driver instead of
            # paying a task exchange per iteration. Sorting by (dst, c)
            # makes the float64 fold order-insensitive even across
            # different batchings (equal addends sum identically).
            parts = (
                apply_refs(contrib, edge_refs)
                .sort_values(["dst", "c"])
                .groupby("dst", sort=True)["c"]
                .sum()
                .reset_index()
            )
        else:
            parts = bucketed_group_map(
                edges.map_batches(contrib, batch_format="pyarrow"),
                bucket_on="dst",
                fn=lambda df: df.groupby("dst", sort=True)["c"].sum().reset_index(),
                n_buckets=n_buckets,
            ).to_pandas()  # node-scale

        inflow = np.zeros(n, np.float64)
        pos = np.searchsorted(nodes, parts["dst"].to_numpy())
        inflow[pos] = parts["c"].to_numpy(np.float64)
        dangling = float(pr[dangling_mask].sum())
        pr = (1.0 - damping) / n + damping * (inflow + dangling / n)
        pr = pr.astype(np.float32).astype(np.float64)  # absorb order noise

    scale = 10.0**round_dp
    pr = np.floor(pr * scale + 0.5) / scale  # half-up (values positive)
    return pd.DataFrame({"node": nodes, "pr": pr})


def anchor_texts(
    corpus_ds, top_k: int = 3, min_mentions: int = 1, n_buckets: int = 32
) -> pd.DataFrame:
    """Per-target anchor-text aggregation — the classic link-based
    relevance signal (anchor text describes the TARGET page better than
    the target's own body; search engines and webtext curators use the
    aggregate as a caption/quality feature for the linked URL).

    Input: the corpus (url, html). Per page, a tokenizer-level pass
    (html_extract.extract_anchors) captures ``(href, anchor)`` pairs;
    hrefs resolve with the reference semantics (origin-root base for
    relatives, malformed dropped, scheme-contains-http + host-present
    kept — urlnorm.parse semantics, main.rs:207-221 parity). Per-batch
    COMBINER pre-aggregation (groupby count over (url, anchor)) bounds
    the exchange to distinct pairs per batch; one bucketed exchange on
    the target url sums counts and keeps each target's ``top_k`` anchors
    by (count desc, anchor asc). Empty anchor strings (image links,
    ``<a/>``) are dropped from the aggregate; ``min_mentions`` prunes
    weakly-linked targets (total anchor mentions below the floor) inside
    the same per-bucket pass — all of a target's rows co-locate there, so
    the total is exact.

    Returns ``(url, anchor, n)`` sorted by (url, n desc, anchor). Rows ∝
    targets × top_k; at the 10^10 design point the final exchange writes
    parquet per bucket instead of returning a frame.
    """
    from .. import urlnorm as un
    from ..html_extract import extract_anchors
    from ..stages.shuffle import bucketed_group_map

    def page_pairs(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        anchors: list[str] = []
        for page_url, html in zip(
            t["url"].to_pylist(), t["html"].to_pylist()
        ):
            try:
                base = un.parse(page_url).origin_root()
            except un.UrlParseError:
                continue
            for href, text in extract_anchors(html):
                if not text:
                    continue
                try:
                    u = un.parse(href)
                except un.RelativeUrlError:
                    u = un.join(base, href)  # join failure raises (panic parity)
                except un.UrlParseError:
                    continue
                if un.scheme_is_httpish(u.scheme) and u.host is not None:
                    urls.append(str(u))
                    anchors.append(text)
        if not urls:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "anchor": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        df = (
            pd.DataFrame({"url": urls, "anchor": anchors})
            .groupby(["url", "anchor"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = corpus_ds.map_batches(page_pairs, batch_format="pyarrow")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby(["url", "anchor"], sort=False)["n"].sum().reset_index()
        )
        if min_mentions > 1:
            tot = agg.groupby("url", sort=False)["n"].transform("sum")
            agg = agg[tot >= min_mentions]
        agg = agg.sort_values(
            ["url", "n", "anchor"], ascending=[True, False, True]
        )
        return agg.groupby("url", sort=False).head(top_k)

    out = bucketed_group_map(pairs, "url", topk, n_buckets=n_buckets)
    out = out.to_pandas().astype({"n": "int64"})
    return out.sort_values(
        ["url", "n", "anchor"], ascending=[True, False, True]
    ).reset_index(drop=True)


def hits(
    edges_ds,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 8,
    round_dp: int = 6,
    driver_combine_nodes: int = 100_000,
) -> pd.DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public spec) over a
    Dataset of directed string edges — the complementary link-analysis
    signal to PageRank (an authority is pointed at by good hubs; a hub
    points at good authorities; webtext curators use the authority score
    as a seed-quality / recrawl-priority feature alongside rank).

    Deterministic spec (restated by the independent pytest reference):
    distinct edges, self-loops excluded; nodes = union of endpoints; init
    ``h = 1`` per node; each of ``iters`` iterations does
    ``a(v) = Σ_{u→v} h(u)`` then L2-normalizes ``a``, then
    ``h(u) = Σ_{u→v} a(v)`` then L2-normalizes ``h``; both vectors are
    float32-quantized after each normalize (so the float64 partial fold
    order cannot leak into the result); final scores rounded half-up to
    ``round_dp``. Returns ``(node, hub, authority)`` sorted by node.

    Physical plan per iteration — same shape as ``pagerank``: the
    node-scale weight vector broadcasts once (node names ``ray.put`` once
    for the whole run), each EDGE batch emits per-key partial sums (the
    mergeable-combiner form, output ∝ distinct keys per batch), and the
    fold is driver-side under ``driver_combine_nodes`` or one bucketed
    task exchange above it. Two edge passes per iteration (dst-keyed for
    authorities, src-keyed for hubs); edges stay pinned in the object
    store throughout.
    """
    import ray

    from ..stages.shuffle import apply_refs, bucketed_group_map

    edges = _dedup_edges(edges_ds, src_col, dst_col, n_buckets)
    empty = pd.DataFrame(
        {
            "node": pd.Series(dtype=object),
            "hub": pd.Series(dtype=float),
            "authority": pd.Series(dtype=float),
        }
    )
    if edges.count() == 0:
        return empty
    edge_refs = edges.to_arrow_refs()

    def batch_nodes(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": pa.array(u, pa.string())})

    endpoints = apply_refs(batch_nodes, edge_refs)
    if endpoints.empty:
        return empty
    nodes = np.unique(endpoints["node"].to_numpy())
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def _propagate(weights: np.ndarray, from_col: str, to_col: str):
        """One edge pass: per-``to_col`` sums of ``weights[from_col]``."""
        w_ref = ray.put(weights)

        def contrib(t: pa.Table, _nref=nodes_ref, _wref=w_ref) -> pa.Table:
            nds, wts = ray.get(_nref), ray.get(_wref)
            frm = t[from_col].to_numpy(zero_copy_only=False)
            to = t[to_col].to_numpy(zero_copy_only=False)
            c = wts[np.searchsorted(nds, frm)]
            uk, inv = np.unique(to, return_inverse=True)
            sums = np.bincount(inv, weights=c)
            return pa.table(
                {
                    "k": pa.array(uk, pa.string()),
                    "c": pa.array(sums, pa.float64()),
                }
            )

        if n <= driver_combine_nodes:
            parts = (
                apply_refs(contrib, edge_refs)
                .sort_values(["k", "c"])  # order-insensitive float64 fold
                .groupby("k", sort=True)["c"]
                .sum()
                .reset_index()
            )
        else:
            parts = bucketed_group_map(
                edges.map_batches(contrib, batch_format="pyarrow"),
                bucket_on="k",
                fn=lambda df: df.sort_values(["k", "c"])
                .groupby("k", sort=True)["c"]
                .sum()
                .reset_index(),
                n_buckets=n_buckets,
            ).to_pandas()
        out = np.zeros(n, np.float64)
        pos = np.searchsorted(nodes, parts["k"].to_numpy())
        out[pos] = parts["c"].to_numpy(np.float64)
        return out

    def _l2q(v: np.ndarray) -> np.ndarray:
        norm = float(np.sqrt(np.sum(v * v)))
        if norm > 0.0:
            v = v / norm
        return v.astype(np.float32).astype(np.float64)

    hub = np.ones(n, np.float64)
    auth = np.zeros(n, np.float64)
    for _ in range(iters):
        auth = _l2q(_propagate(hub, "src", "dst"))
        hub = _l2q(_propagate(auth, "dst", "src"))

    scale = 10.0**round_dp
    return pd.DataFrame(
        {
            "node": nodes,
            "hub": np.floor(hub * scale + 0.5) / scale,
            "authority": np.floor(auth * scale + 0.5) / scale,
        }
    )


# ------------------------------------------------------------ sharded ranks


def pagerank_sharded(
    edges_ds,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 8,
    round_dp: int = 6,
) -> pd.DataFrame:
    """The fully-sharded PageRank the module docstring promises for when
    the node table outgrows the broadcast budget (10^9+ nodes: a rank
    vector no longer fits in one ``ray.put``): ranks live as
    hash(node)-bucketed PINNED tables, each iteration is one keyed task
    exchange — per src-bucket, join that bucket's edges against ITS OWN
    rank shard (edges were bucketed by the same hash, so the join is
    shard-local) and scatter per-dst partials straight to dst buckets
    (``num_returns=n_buckets`` slices, no intermediate gather); per
    dst-bucket, fold partials and update that shard's ranks. The driver
    handles exactly ``n_buckets`` floats per iteration (the dangling-mass
    partial sums) — nothing node- or edge-scale.

    Same deterministic spec as ``pagerank`` (distinct edges, float32
    quantization per iteration, half-up rounding); per-dst folds sort
    ``(dst, c)`` first so equal addends sum identically. Cross-mode parity
    with the broadcast form is pinned by
    tests/test_functions.py::test_pagerank_sharded_matches_broadcast.
    """
    import ray

    from ..stages.shuffle import _bucket_ids

    B = n_buckets
    edges = _dedup_edges(edges_ds, src_col, dst_col, n_buckets)
    empty = pd.DataFrame(
        {"node": pd.Series(dtype=object), "pr": pd.Series(dtype=float)}
    )
    if edges.count() == 0:  # nothing survives dedup/self-loop filtering
        return empty
    edge_refs = edges.to_arrow_refs()
    if not edge_refs:
        return empty

    def _as_arrow_tbl(t):
        return t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)

    def _split_edges_task(nb: int):
        # plain factory: each pagerank_sharded call builds its remote fns
        # once (a cross-call cache cannot hit — the factory is per-call)
        @ray.remote(num_returns=nb + 1)
        def split(t):
            t = _as_arrow_tbl(t)
            # per-block node/outdeg partials ride along with the edge
            # slices so the setup needs only one pass over the edges
            bk = _bucket_ids(t["src"], nb)
            order = np.argsort(bk, kind="stable")
            st = t.take(pa.array(order))
            sb = bk[order]
            bounds = np.searchsorted(sb, np.arange(nb + 1))
            out = [st.slice(int(bounds[b]), int(bounds[b + 1] - bounds[b]))
                   for b in range(nb)]
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            u, c = np.unique(src, return_counts=True)
            ends = np.unique(np.concatenate([src, dst]))
            meta = pa.table(
                {
                    "node": pa.array(
                        np.concatenate([u, ends]), pa.string()
                    ),
                    "deg": pa.array(
                        np.concatenate(
                            [c, np.zeros(len(ends), np.int64)]
                        ),
                        pa.int64(),
                    ),
                }
            )
            return (*out, meta)

        return split

    split = _split_edges_task(B)
    slices = [split.remote(r) for r in edge_refs]
    # pin each src-bucket's edges once (concat task per bucket)
    @ray.remote
    def _concat(*parts):
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        return pa.concat_tables(parts).combine_chunks()

    edge_buckets = [
        _concat.remote(*[s[b] for s in slices]) for b in range(B)
    ]

    # node/outdeg shards: re-split the per-block meta partials by
    # hash(node), fold per bucket, init rank
    def _split_meta_task(nb: int):
        @ray.remote(num_returns=nb)
        def split_meta(t):
            bk = _bucket_ids(t["node"], nb)
            order = np.argsort(bk, kind="stable")
            st = t.take(pa.array(order))
            sb = bk[order]
            bounds = np.searchsorted(sb, np.arange(nb + 1))
            return tuple(
                st.slice(int(bounds[b]), int(bounds[b + 1] - bounds[b]))
                for b in range(nb)
            ) if nb > 1 else st
        return split_meta

    split_meta = _split_meta_task(B)
    meta_slices = [split_meta.remote(s[B]) for s in slices]

    @ray.remote(num_returns=2)
    def _init_shard(*parts):
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return (
                pa.table(
                    {
                        "node": pa.array([], pa.string()),
                        "outdeg": pa.array([], pa.float64()),
                    }
                ),
                0,
            )
        t = pa.concat_tables(parts)
        nodes_np = t["node"].to_numpy(zero_copy_only=False)
        deg_np = t["deg"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nodes_np, return_inverse=True)
        outdeg = np.bincount(inv, weights=deg_np.astype(np.float64))
        return (
            pa.table(
                {
                    "node": pa.array(u, pa.string()),
                    "outdeg": pa.array(outdeg, pa.float64()),
                }
            ),
            len(u),
        )

    init = [
        _init_shard.remote(
            *[(ms[b] if B > 1 else ms) for ms in meta_slices]
        )
        for b in range(B)
    ]
    shard_refs = [p[0] for p in init]
    counts = ray.get([p[1] for p in init])
    n = int(sum(counts))
    if n == 0:
        return empty

    # attach pr = 1/n (f32-quantized) and report initial dangling mass
    @ray.remote(num_returns=2)
    def _with_init_rank(shard, n_):
        outdeg = shard["outdeg"].to_numpy(zero_copy_only=False)
        pr = np.full(len(outdeg), 1.0 / n_, np.float64)
        pr = pr.astype(np.float32).astype(np.float64)
        shard = shard.append_column("pr", pa.array(pr, pa.float64()))
        return shard, float(pr[outdeg == 0].sum())

    with_rank = [_with_init_rank.remote(s, n) for s in shard_refs]
    state = [w[0] for w in with_rank]
    dangling = float(sum(ray.get([w[1] for w in with_rank])))

    def _contrib_task(nb: int):
        @ray.remote(num_returns=nb)
        def contrib(edges_b, shard_b):
            empty_part = pa.table(
                {
                    "dst": pa.array([], pa.string()),
                    "c": pa.array([], pa.float64()),
                }
            )
            if edges_b.num_rows == 0 or shard_b.num_rows == 0:
                return ((empty_part,) * nb) if nb > 1 else empty_part
            nodes_b = shard_b["node"].to_numpy(zero_copy_only=False)
            outdeg_b = shard_b["outdeg"].to_numpy(zero_copy_only=False)
            pr_b = shard_b["pr"].to_numpy(zero_copy_only=False)
            w = np.zeros(len(nodes_b), np.float64)
            nz = outdeg_b > 0
            w[nz] = pr_b[nz] / outdeg_b[nz]
            src = edges_b["src"].to_numpy(zero_copy_only=False)
            dst = edges_b["dst"].to_numpy(zero_copy_only=False)
            c = w[np.searchsorted(nodes_b, src)]
            ud, inv = np.unique(dst, return_inverse=True)
            sums = np.bincount(inv, weights=c)
            part = pa.table(
                {
                    "dst": pa.array(ud, pa.string()),
                    "c": pa.array(sums, pa.float64()),
                }
            )
            bk = _bucket_ids(part["dst"], nb)
            order = np.argsort(bk, kind="stable")
            st = part.take(pa.array(order))
            sb = bk[order]
            bounds = np.searchsorted(sb, np.arange(nb + 1))
            out = tuple(
                st.slice(int(bounds[b]), int(bounds[b + 1] - bounds[b]))
                for b in range(nb)
            )
            return out if nb > 1 else out[0]

        return contrib

    @ray.remote(num_returns=2)
    def _update_shard(shard, dangling_, n_, d_, *parts):
        nodes_b = shard["node"].to_numpy(zero_copy_only=False)
        outdeg_b = shard["outdeg"].to_numpy(zero_copy_only=False)
        inflow = np.zeros(len(nodes_b), np.float64)
        parts = [p for p in parts if p.num_rows]
        if parts:
            pp = (
                pa.concat_tables(parts)
                .to_pandas()
                .sort_values(["dst", "c"])  # order-insensitive fold
                .groupby("dst", sort=True)["c"]
                .sum()
                .reset_index()
            )
            pos = np.searchsorted(nodes_b, pp["dst"].to_numpy())
            inflow[pos] = pp["c"].to_numpy(np.float64)
        pr = (1.0 - d_) / n_ + d_ * (inflow + dangling_ / n_)
        pr = pr.astype(np.float32).astype(np.float64)
        shard = shard.set_column(
            shard.schema.get_field_index("pr"),
            "pr",
            pa.array(pr, pa.float64()),
        )
        return shard, float(pr[outdeg_b == 0].sum())

    contrib = _contrib_task(B)
    for _ in range(iters):
        contribs = [
            contrib.remote(edge_buckets[b], state[b]) for b in range(B)
        ]
        updated = [
            _update_shard.remote(
                state[j],
                dangling,
                n,
                damping,
                *[(contribs[b][j] if B > 1 else contribs[b]) for b in range(B)],
            )
            for j in range(B)
        ]
        state = [u[0] for u in updated]
        dangling = float(sum(ray.get([u[1] for u in updated])))

    shards = ray.get(state)
    out = pa.concat_tables(
        [s.select(["node", "pr"]) for s in shards if s.num_rows]
    ).to_pandas()
    scale = 10.0**round_dp
    out["pr"] = np.floor(out["pr"].to_numpy() * scale + 0.5) / scale
    return out.sort_values("node").reset_index(drop=True)


# ------------------------------------------------------ triangle counting


_ORIENT_TASK = None


def _orient_task():
    """Cached remote fn (same GCS-traffic reason as shuffle._SPLIT_TASKS):
    one canonical-edge block + the broadcast degree table → degree-ordered
    oriented edges (src = the endpoint earlier in the (degree, node) total
    order)."""
    global _ORIENT_TASK
    if _ORIENT_TASK is None:
        import ray

        @ray.remote
        def orient(ord_tbl, t) -> pa.Table:
            # node labels → ORDINALS in the (degree, node) total order, so
            # every downstream comparison (wedge-pair sort, closure merge)
            # is a plain integer compare under the SAME order the edges
            # are oriented by — mixing value order into wedge pairs would
            # silently miss the triangles whose closing edge points the
            # other way
            nodes, ords = ord_tbl
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            u = t["src"].to_numpy(zero_copy_only=False)
            v = t["dst"].to_numpy(zero_copy_only=False)
            ou = ords[np.searchsorted(nodes, u)]
            ov = ords[np.searchsorted(nodes, v)]
            return pa.table(
                {
                    "a": pa.array(np.minimum(ou, ov), pa.int64()),
                    "b": pa.array(np.maximum(ou, ov), pa.int64()),
                }
            )

        _ORIENT_TASK = orient
    return _ORIENT_TASK


def triangle_counts(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 64,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    UNDIRECTED graph given as an edge Dataset (direction/duplicates/self-
    loops ignored) — the classic MapReduce triangle enumeration of Suri &
    Vassilvitskii 2011 ("Counting Triangles and the Curse of the Last
    Reducer", WWW'11), degree-ordered so no reducer sees a hot node's full
    neighborhood:

      1. canonical distinct edges (min, max) via one hash-bucketed
         exchange (reusing ``_dedup_edges``'s shape);
      2. degrees: per-block (node, count) combiners folded on the driver
         — node-scale, same gate as ``hits`` (at 10^8+ nodes this fold
         and the broadcast below become one more bucketed exchange);
      3. orientation by the (degree, node) total order, broadcast degree
         table + ``searchsorted`` lookup per block: every edge points
         low → high, so a node's OUT-degree is O(√m) regardless of its
         true degree — the skew bound that kills the "last reducer";
      4. wedges (b, c) around each low node a (all pairs of a's
         out-neighbors, one bucketed exchange on a);
      5. triangle closure: wedges meet oriented edges keyed by THEIR low
         endpoint in a second bucketed exchange (tagged union, one
         ``pd.merge`` per bucket); each match (a, b, c) increments all
         three nodes' counts — emitted as per-bucket partial counts,
         folded with degrees on the driver.

    Output ``(node, degree, triangles, clustering)`` sorted by node,
    where clustering = 2·triangles / (degree·(degree−1)) (0 for degree
    ≤ 1), rounded half-up at ``round_dp``. Node dtype follows the input
    (int hosts and string hosts both work — every kernel is order-based).
    """
    import ray

    from ..stages.shuffle import (
        apply_refs,
        bucketed_group_map_refs,
        gather_refs_pd,
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[src_col]), pc.is_valid(t[dst_col])),
            pc.not_equal(t[src_col], t[dst_col]),
        )
        t = t.filter(keep)
        u = pc.min_element_wise(t[src_col], t[dst_col])
        v = pc.max_element_wise(t[src_col], t[dst_col])
        return pa.table({"src": u, "dst": v})

    edge_refs = bucketed_group_map_refs(
        edges_ds.map_batches(prep, batch_format="pyarrow"),
        bucket_on="src",
        fn=lambda df: df.drop_duplicates(["src", "dst"]),
        n_buckets=n_buckets,
    )
    if edge_refs is None:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="object"),
                "degree": pd.Series([], dtype="int64"),
                "triangles": pd.Series([], dtype="int64"),
                "clustering": pd.Series([], dtype="float64"),
            }
        )

    # 2. degrees (node-scale driver fold; see gate note in the docstring)
    def deg_partial(t: pa.Table) -> pa.Table:
        s = pd.concat(
            [t["src"].to_pandas(), t["dst"].to_pandas()], ignore_index=True
        )
        vc = s.value_counts()
        return pa.table(
            {"node": pa.array(vc.index), "cnt": pa.array(vc.to_numpy())}
        )

    degs = (
        apply_refs(deg_partial, edge_refs)
        .groupby("node", sort=True)["cnt"]
        .sum()
    )
    nodes_arr = degs.index.to_numpy()
    degs_arr = degs.to_numpy().astype(np.int64)
    # ordinal of each node in the (degree, node) total order; labels are
    # swapped for ordinals during orientation and mapped back at the end
    order = np.lexsort((nodes_arr, degs_arr))
    ord_of = np.empty(len(order), dtype=np.int64)
    ord_of[order] = np.arange(len(order), dtype=np.int64)
    nodes_by_ord = nodes_arr[order]
    ord_ref = ray.put((nodes_arr, ord_of))

    # 3. orient each deduped block (low → high in (degree, node) order)
    orient = _orient_task()
    oriented = [orient.remote(ord_ref, r) for r in edge_refs]

    # 4. wedges around each low endpoint
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for a, g in df.groupby("a", sort=False):
            nb = np.sort(g["b"].to_numpy())
            if len(nb) < 2:
                continue
            iu = np.triu_indices(len(nb), k=1)
            outs.append(
                pd.DataFrame(
                    {
                        "jkey": nb[iu[0]],
                        "x": nb[iu[1]],
                        "apex": a,
                        "kind": "w",
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {"jkey": [], "x": [], "apex": [], "kind": []}
            )
        return pd.concat(outs, ignore_index=True)

    wedge_refs = bucketed_group_map_refs(
        oriented, bucket_on="a", fn=wedges, n_buckets=n_buckets
    )

    # oriented edges re-tagged for the closure join (jkey = their low end)
    retag = _retag_task()
    edge_tagged = [retag.remote(r) for r in oriented]

    # 5. closure: wedge (jkey, x) matches an oriented edge (jkey, x)
    def close(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["kind"] == "w"]
        e = df[df["kind"] == "e"][["jkey", "x"]].drop_duplicates()
        if not len(w) or not len(e):
            return pd.DataFrame({"node": [], "tris": []})
        hit = w.merge(e, on=["jkey", "x"])
        if not len(hit):
            return pd.DataFrame({"node": [], "tris": []})
        s = pd.concat(
            [hit["apex"], hit["jkey"], hit["x"]], ignore_index=True
        ).value_counts()
        return pd.DataFrame({"node": s.index, "tris": s.to_numpy()})

    refs_all = (wedge_refs or []) + edge_tagged
    tri_refs = bucketed_group_map_refs(
        refs_all, bucket_on="jkey", fn=close, n_buckets=n_buckets
    )
    tri = (
        gather_refs_pd(tri_refs)
        if tri_refs is not None
        else pd.DataFrame({"node": [], "tris": []})
    )
    # fold ordinal-keyed partials, then map ordinals back to labels
    per_ord = (
        tri.groupby("node", sort=True)["tris"].sum()
        if len(tri)
        else pd.Series(dtype="int64")
    )
    tris_full = np.zeros(len(nodes_arr), dtype=np.int64)
    if len(per_ord):
        tris_full[per_ord.index.to_numpy().astype(np.int64)] = (
            per_ord.to_numpy()
        )
    out = pd.DataFrame(
        {"node": nodes_by_ord, "degree": degs_arr[order]}
    )
    out["triangles"] = tris_full
    d = out["degree"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc = np.where(
            d > 1, 2.0 * out["triangles"].to_numpy(np.float64) / (d * (d - 1)), 0.0
        )
    scale = 10.0**round_dp
    out["clustering"] = np.floor(cc * scale + 0.5) / scale
    return out.sort_values("node").reset_index(drop=True)


_RETAG_TASK = None


def _retag_task():
    global _RETAG_TASK
    if _RETAG_TASK is None:
        import ray

        @ray.remote
        def retag(t) -> pa.Table:
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            n = t.num_rows
            return pa.table(
                {
                    "jkey": t["a"],
                    "x": t["b"],
                    "apex": t["a"],  # unused for edges; keeps one schema
                    "kind": pa.array(["e"] * n, pa.string()),
                }
            )

        _RETAG_TASK = retag
    return _RETAG_TASK


# ------------------------------------------------ redirect-chain resolution


_REDIR_TAG_TASK = None


def _redir_tag_task():
    """Cached remote fn: one per-src-deduped edge block → the tagged
    union rows of the INIT exchange ('e' rows keyed by src carry the
    edge; 'p' probe rows keyed by dst ask whether dst redirects again)."""
    global _REDIR_TAG_TASK
    if _REDIR_TAG_TASK is None:
        import ray

        @ray.remote
        def tag(t) -> pa.Table:
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            n = len(src)
            return pa.table(
                {
                    "kind": pa.array(["e"] * n + ["p"] * n, pa.string()),
                    "key": pa.array(
                        np.concatenate([src, dst]), pa.int64()
                    ),
                    "node": pa.array(
                        np.concatenate([src, src]), pa.int64()
                    ),
                    "reach": pa.array(
                        np.concatenate([dst, dst]), pa.int64()
                    ),
                }
            )

        _REDIR_TAG_TASK = tag
    return _REDIR_TAG_TASK


def resolve_redirects(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 64,
    max_chain: int = 128,
) -> pd.DataFrame:
    """Redirect-chain resolution by POINTER DOUBLING — the O(log n)-round
    parallel list-ranking classic (Wyllie 1979; the standard shortcut
    trick in every Pregel/MapReduce connectivity paper): every crawler
    must collapse 301/302 chains to their final target before frontier
    dedup, and chains a million hops of log can still resolve in ~20
    rounds because each round composes the jump table with itself
    (reach 2^r steps), not one step.

    Input: an edge Dataset where ``src`` redirects to ``dst`` (int64 ids
    — key by canonical-URL id/hash upstream); several dsts for one src
    keep the MIN dst (deterministic; HTTP has one Location, dirty data
    doesn't). For every src node the output states the chain's terminal
    target and length, or flags it non-resolving:
    ``(node, final_id, hops, is_cycle)`` sorted by node — final_id/hops
    NULL on non-resolving chains (a redirect loop never lands anywhere;
    crawlers drop those URLs).

    ``max_chain`` bounds the guaranteed resolution length — every HTTP
    client does this (browsers abort after ~20 redirects; RFC 9110 §15.4
    tells clients to detect and intervene in cycles): chains of at most
    ``max_chain`` hops ALWAYS resolve; longer ones resolve iff they fit
    the round bound's 2^rounds reach, else they are flagged ``is_cycle``
    like a loop (the same drop class a client's redirect cap produces).
    The round count becomes ceil(log2(min(max_chain, n)))+1 instead of
    growing with corpus size; raise the cap (≤ number of srcs) if
    genuinely longer chains must deterministically resolve.

    Physical plan, all hash-bucketed task exchanges (no driver state
    beyond one remaining-count scalar per round):
      init — one exchange keyed (src ∪ dst): a probe learns whether its
      dst redirects again, yielding state(x) = (next(x), 1 hop, done?);
      round r — two exchanges: (a) every not-done state queries the
      bucket owning its reach for THAT node's state and composes
      (reach 2^r ∪ stop-at-terminal), (b) composed answers re-bucket by
      node to rebuild the state shards; stop when nothing is left
      unresolved or the round bound is hit — surviving not-done nodes
      sit on cycles or over-cap chains.
    """
    import ray

    from ..stages.shuffle import (
        bucketed_group_map_refs,
        gather_refs_pd,
        nrows_refs,
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[src_col]), pc.is_valid(t[dst_col]))
        t = t.filter(keep)
        return pa.table(
            {
                "src": t[src_col].cast(pa.int64()),
                "dst": t[dst_col].cast(pa.int64()),
            }
        )

    edge_refs = bucketed_group_map_refs(
        edges_ds.map_batches(prep, batch_format="pyarrow"),
        bucket_on="src",
        fn=lambda df: df.groupby("src", sort=False, as_index=False)["dst"].min(),
        n_buckets=n_buckets,
    )
    empty = pd.DataFrame(
        {
            "node": pd.Series([], dtype="int64"),
            "final_id": pd.Series([], dtype="float64"),
            "hops": pd.Series([], dtype="float64"),
            "is_cycle": pd.Series([], dtype="bool"),
        }
    )
    if edge_refs is None:
        return empty
    n_src = nrows_refs(edge_refs)

    tag = _redir_tag_task()
    tagged = [tag.remote(r) for r in edge_refs]

    def init_bucket(df: pd.DataFrame) -> pd.DataFrame:
        e_keys = set(df.loc[df["kind"] == "e", "key"])
        p = df[df["kind"] == "p"]
        return pd.DataFrame(
            {
                "node": p["node"].to_numpy(),
                "reach": p["key"].to_numpy(),
                "hops": np.ones(len(p), dtype=np.int64),
                # np.array, not a list: an EMPTY list column defaults to
                # float64 in pandas and poisons the arrow schema
                "done": np.array(
                    [k not in e_keys for k in p["key"]], dtype=bool
                ),
            }
        )

    state_refs = bucketed_group_map_refs(
        tagged, bucket_on="key", fn=init_bucket, n_buckets=n_buckets
    )
    if state_refs is None:
        return empty

    qtag = _redir_round_task()
    max_rounds = int(np.ceil(np.log2(max(2, min(max_chain, n_src))))) + 1
    for _ in range(max_rounds):
        # count remaining; also the early-exit signal (one scalar/round)
        remaining = _count_not_done(state_refs)
        if remaining == 0:
            break
        tagged_round = [qtag.remote(r) for r in state_refs]

        def compose(df: pd.DataFrame) -> pd.DataFrame:
            q = df[df["kind"] == "q"]
            s = df[df["kind"] == "s"].drop_duplicates("key")
            if not len(q):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "reach": pd.Series([], dtype="int64"),
                        "hops": pd.Series([], dtype="int64"),
                        "done": pd.Series([], dtype="bool"),
                    }
                )
            m = q.merge(
                s[["key", "reach", "hops", "done"]],
                on="key",
                how="left",
                suffixes=("", "_s"),
            )
            # a not-done state's reach is a src, so its state row exists;
            # a missing row would be data corruption — treat as terminal
            # (conservative: stops the walk, never invents a hop)
            hit = m["reach_s"].notna()
            out = pd.DataFrame(
                {
                    "node": m["node"].to_numpy(),
                    "reach": np.where(
                        hit, m["reach_s"].fillna(0), m["key"]
                    ).astype(np.int64),
                    "hops": np.where(
                        hit, m["hops"] + m["hops_s"].fillna(0), m["hops"]
                    ).astype(np.int64),
                    "done": np.where(
                        hit, m["done_s"].fillna(True), True
                    ).astype(bool),
                }
            )
            return out

        answer_refs = bucketed_group_map_refs(
            tagged_round, bucket_on="key", fn=compose, n_buckets=n_buckets
        )
        # rebuild state shards: done states pass through, answers replace
        # the not-done ones — both already carry the state schema
        keep = _redir_keep_done_task()
        done_refs = [keep.remote(r) for r in state_refs]
        state_refs = bucketed_group_map_refs(
            done_refs + (answer_refs or []),
            bucket_on="node",
            fn=lambda df: df,
            n_buckets=n_buckets,
        )
        if state_refs is None:
            return empty

    final = gather_refs_pd(state_refs)
    out = pd.DataFrame(
        {
            "node": final["node"].astype("int64"),
            "final_id": np.where(final["done"], final["reach"], np.nan),
            "hops": np.where(final["done"], final["hops"], np.nan),
            "is_cycle": ~final["done"].to_numpy(),
        }
    )
    return out.sort_values("node").reset_index(drop=True)


_REDIR_ROUND_TASK = None
_REDIR_KEEP_DONE_TASK = None
_REDIR_COUNT_TASK = None


def _redir_round_task():
    """State block → tagged union for the compose exchange: each state
    row serves lookups as 's' (keyed by its node); each NOT-done row also
    queries as 'q' (keyed by its reach)."""
    global _REDIR_ROUND_TASK
    if _REDIR_ROUND_TASK is None:
        import ray

        @ray.remote
        def rtag(t) -> pa.Table:
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            df = t.to_pandas()
            nd = df[~df["done"]]
            s = pd.DataFrame(
                {
                    "kind": "s",
                    "key": df["node"],
                    "node": df["node"],
                    "reach": df["reach"],
                    "hops": df["hops"],
                    "done": df["done"],
                }
            )
            q = pd.DataFrame(
                {
                    "kind": "q",
                    "key": nd["reach"],
                    "node": nd["node"],
                    "reach": nd["reach"],
                    "hops": nd["hops"],
                    "done": nd["done"],
                }
            )
            return pa.Table.from_pandas(
                pd.concat([s, q], ignore_index=True), preserve_index=False
            )

        _REDIR_ROUND_TASK = rtag
    return _REDIR_ROUND_TASK


def _redir_keep_done_task():
    global _REDIR_KEEP_DONE_TASK
    if _REDIR_KEEP_DONE_TASK is None:
        import ray

        @ray.remote
        def keep_done(t) -> pa.Table:
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            return t.filter(t["done"])

        _REDIR_KEEP_DONE_TASK = keep_done
    return _REDIR_KEEP_DONE_TASK


def _count_not_done(state_refs) -> int:
    global _REDIR_COUNT_TASK
    import ray

    if _REDIR_COUNT_TASK is None:

        @ray.remote
        def cnt(t) -> int:
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            return int(pc.sum(pc.invert(t["done"])).as_py() or 0)

        _REDIR_COUNT_TASK = cnt
    return int(sum(ray.get([_REDIR_COUNT_TASK.remote(r) for r in state_refs])))
