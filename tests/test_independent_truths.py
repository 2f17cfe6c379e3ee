"""Independent recomputation of the pinned driver-oracle truths.

Pinned oracles are committed expected outputs; on their own they prove
end-to-end determinism, not truth. These tests re-derive the same numbers
with a SECOND implementation — different code, same published algorithm
spec — and compare against the committed values, so every pin is
cross-checked by something other than the engine's own code path:

  lang-ID counts / webtext stats  (Cavnar & Trenkle profiles; C4 chain)
  fingerprints                    (per-byte Python polynomial hash)
  simhash pairs                   (per-bit votes + ALL-PAIRS Hamming)
  minhash clusters                (pure-Python shingle/sig/band/verify/UF)
  HLL distinct counts             (dict registers + Flajolet estimator)
  LSH / IVF ANN                   (per-vector probe loops, exact cosine)
  k-means / PageRank / PCA        (single-process numpy restatements)

The only pin without one is multimodal_decode, whose deterministic fake
codec IS the committed spec (no independent ground truth exists without a
real image library). The crawl texts feeding the webtext chain come from
the pure-Python oracle SIMULATOR, not the Ray engine.
"""

from __future__ import annotations

import re

# The spec's tiny seed corpus (constants, copied verbatim — the ALGORITHM
# below is the independent part).
SEEDS = {
    "en": "the quick brown fox jumps over the lazy dog and then it runs "
    "away with this that have from they will would there what when",
    "de": "der die das und ist nicht ich sie wir ihr ein eine zu von mit "
    "auf für über aber auch nach bei durch wenn dann haben werden",
    "fr": "le la les et est ne pas je vous nous ils une des du au aux "
    "avec pour sur dans par mais aussi être avoir fait comme plus",
}

# sf0.01-scale corpus parameters (same mapping as __ray_entry__._CORPUS_SIZES)
SF001_HOSTS, SF001_PAGES = 20, 60


def _gram_counts(text: str, n: int = 3) -> dict[str, int]:
    padded = f" {text.lower()} "
    counts: dict[str, int] = {}
    for i in range(max(0, len(padded) - n + 1)):
        g = padded[i : i + n]
        counts[g] = counts.get(g, 0) + 1
    return counts


def _rank_profile(text: str, n: int = 3, top: int = 300) -> dict[str, int]:
    # stable sort by descending count; first-seen wins ties (dict order)
    ranked = sorted(_gram_counts(text, n).items(), key=lambda kv: -kv[1])[:top]
    return {g: r for r, (g, _) in enumerate(ranked)}


def classify(text: str, profiles: dict[str, dict[str, int]]) -> str:
    doc = sorted(_gram_counts(text or "").items(), key=lambda kv: -kv[1])[:300]
    best, best_d = "und", float("inf")
    for lang, prof in profiles.items():
        d = sum(abs(prof.get(g, len(prof)) - r) for r, (g, _) in enumerate(doc))
        if d < best_d:
            best, best_d = lang, d
    return best


def test_lang_id_pinned_counts_independent():
    """Re-derive the LANG_ID_COUNTS pin (sf0.01 documents) independently."""
    import pyarrow.parquet as pq

    profiles = {lang: _rank_profile(t) for lang, t in SEEDS.items()}
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text"]
    )
    counts: dict[str, int] = {}
    for t in docs["text"].to_pylist():
        lang = classify(t, profiles)
        counts[lang] = counts.get(lang, 0) + 1
    assert counts == {"de": 184, "en": 246, "fr": 70}


def test_webtext_stats_pinned_independent():
    """Re-derive the WEBTEXT_STATS pin without the Ray engine: crawl texts
    from the pure-Python simulator, then an independent implementation of
    the curation chain (content dedup keep-min-url → n_words≥5 &
    punct_ratio≤0.3 → language id → whitespace token counts → stats)."""
    from crawler_ray import fixtures, oracle

    corpus_tbl = fixtures.gen_corpus(SF001_HOSTS, SF001_PAGES)
    corpus = dict(
        zip(corpus_tbl["url"].to_pylist(), corpus_tbl["html"].to_pylist())
    )
    res = oracle.simulate(corpus, fixtures.default_seeds(SF001_HOSTS))

    # exact dedup: survivors = min url per identical text
    best_url: dict[str, str] = {}
    for url, text in res.texts.items():
        if text not in best_url or url < best_url[text]:
            best_url[text] = url
    survivors = [(u, t) for t, u in best_url.items()]

    profiles = {lang: _rank_profile(t) for lang, t in SEEDS.items()}
    punct_re = re.compile(r"[^\w\s]")
    stats: dict[str, list[float]] = {}  # lang -> [docs, tokens, punct_sum]
    for _url, text in survivors:
        n_words = len(text.lower().split())
        punct_ratio = len(punct_re.findall(text)) / max(len(text), 1)
        if n_words < 5 or punct_ratio > 0.3:
            continue
        lang = classify(text, profiles)
        row = stats.setdefault(lang, [0, 0, 0.0])
        row[0] += 1
        row[1] += len(re.findall(r"\S+", text))
        row[2] += punct_ratio

    got = {
        lang: (int(d), int(tok), round(p / d, 6))
        for lang, (d, tok, p) in sorted(stats.items())
    }
    assert got == {
        "de": (61, 708, 0.004385),
        "en": (1034, 21847, 0.02627),
        "fr": (325, 6976, 0.020392),
    }


def test_kmeans_independent_reference_parity(ray_session):
    """kmeans_embeddings (distributed: broadcast centroids + mergeable
    per-batch partials) must equal a single-process numpy restatement of
    the same spec — deterministic init from the k smallest ids, argmin-L2
    assignment with lowest-index ties, empty clusters frozen, float32
    centroid quantization per step — on exact assignments AND the pinned
    summary columns."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray.functions.similarity import kmeans_embeddings

    sf = "/root/testdata/sf0.001"
    k, iters = 4, 3
    summary, rows = kmeans_embeddings(
        rd.read_parquet(f"{sf}/embeddings.parquet"),
        k=k,
        iters=iters,
        return_assignments=True,
    )

    t = pq.read_table(sf + "/embeddings.parquet").sort_by("vec_id")
    X = np.asarray(
        [np.asarray(v) for v in t["embedding"].to_pylist()], np.float64
    )
    C = X[:k].astype(np.float32)

    def assign_of(C):
        d2 = (
            (X * X).sum(1, keepdims=True)
            - 2 * X @ C.T.astype(np.float64)
            + (C.astype(np.float64) ** 2).sum(1)
        )
        return d2.argmin(1), d2

    for _ in range(iters):
        a, _ = assign_of(C)
        new = C.astype(np.float64).copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = X[m].sum(0) / m.sum()
        C = new.astype(np.float32)
    a, d2 = assign_of(C)

    got = rows.sort_values("vec_id")["cluster"].to_numpy()
    assert (got == a).all()
    assert summary["size"].to_numpy().tolist() == np.bincount(
        a, minlength=k
    ).tolist()
    inertia = np.zeros(k)
    np.add.at(
        inertia, a, d2[np.arange(len(a)), a].astype(np.float32).astype(float)
    )
    assert np.allclose(summary["inertia"].to_numpy(), inertia, atol=0.01)


def test_semantic_dedup_independent_reference_parity(ray_session):
    """semantic_dedup (SemDeDup: k-means scope, within-cluster cosine
    linking, transitive closure, min-id representative) must equal a
    single-process numpy restatement of the same spec. Run at a LOW
    threshold on the random sf0.001 embeddings so near pairs exist both
    within clusters (linked — 34 on this fixture) and across clusters
    (must NOT be linked — 32 here): this is the cluster-scoping behavior
    that distinguishes SemDeDup from plain cosine near-dup."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray.functions.similarity import semantic_dedup

    sf = "/root/testdata/sf0.001"
    k, iters, thr = 4, 3, 0.4
    got = semantic_dedup(
        rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]),
        k=k,
        iters=iters,
        threshold=thr,
    )

    t = pq.read_table(sf + "/embeddings.parquet").sort_by("vec_id")
    ids = t["vec_id"].to_numpy()
    X = np.asarray(
        [np.asarray(v) for v in t["embedding"].to_pylist()], np.float64
    )
    n = len(X)
    C = X[:k].astype(np.float32)

    def assign_of(C):
        d2 = (
            (X * X).sum(1, keepdims=True)
            - 2 * X @ C.T.astype(np.float64)
            + (C.astype(np.float64) ** 2).sum(1)
        )
        return d2.argmin(1)

    for _ in range(iters):
        a = assign_of(C)
        new = C.astype(np.float64).copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = X[m].sum(0) / m.sum()
        C = new.astype(np.float32)
    a = assign_of(C)

    N = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_within = n_cross = 0
    for i in range(n):
        for j in range(i + 1, n):
            if N[i] @ N[j] >= thr:
                if a[i] == a[j]:
                    n_within += 1
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
                else:
                    n_cross += 1
    # the fixture must exercise BOTH the linking and the scoping
    assert n_within > 0 and n_cross > 0

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    rows = []
    for g in groups.values():
        if len(g) < 2:
            continue
        rep = min(g, key=lambda i: ids[i])
        for i in g:
            if i != rep:
                rows.append(
                    (
                        ids[i],
                        ids[rep],
                        np.floor((N[i] @ N[rep]) * 1e4 + 0.5) / 1e4,
                    )
                )
    want = (
        pd.DataFrame(rows, columns=["vec_id", "rep_id", "sim"])
        .astype({"vec_id": "int64", "rep_id": "int64", "sim": "float64"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_pagerank_independent_reference_parity(ray_session):
    """graph.pagerank (broadcast weights + combiner + bucketed exchange)
    must exactly equal a dense single-process power iteration restating
    the same spec — distinct edges, no self-loops, dangling mass uniform,
    float32-quantized ranks, 6-dp half-up rounding — over the sf0.001
    crawl corpus's host-link graph."""
    import re as _re

    import numpy as np
    import pandas as pd

    import __ray_entry__ as E
    from crawler_ray.functions.graph import pagerank

    sf = "/root/testdata/sf0.001"
    got = E.queries()["crawl_host_pagerank"](sf)

    links = E.queries()["extract_links"](sf).to_pandas()
    pat = _re.compile(r"^[^:]*://(\[[^\]]*\]|[^/:?#]*)")

    def host(u):
        m = pat.match(u or "")
        return (m.group(1) if m else "") or None

    pl = links[links["kind"] == "page"]
    edges = pd.DataFrame(
        {"src": pl["src_url"].map(host), "dst": pl["url"].map(host)}
    ).dropna()
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    n = len(nodes)
    idx = {h: i for i, h in enumerate(nodes)}
    A = np.zeros((n, n))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] = 1.0
    outdeg = A.sum(1)
    dang = outdeg == 0
    pr = np.full(n, 1 / n).astype(np.float32).astype(np.float64)
    for _ in range(10):
        w = np.where(dang, 0.0, pr / np.maximum(outdeg, 1))
        pr = (1 - 0.85) / n + 0.85 * (A.T @ w + pr[dang].sum() / n)
        pr = pr.astype(np.float32).astype(np.float64)
    pr = np.floor(pr * 1e6 + 0.5) / 1e6

    ref = pd.DataFrame({"node": nodes, "pr": pr})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref)
    # rank mass conserves (within quantization): sums to ~1
    assert abs(got["pr"].sum() - 1.0) < 1e-3


def test_pca_independent_reference_parity(ray_session):
    """similarity.pca_projection (mergeable moment partials + broadcast
    projection) must exactly equal a single-process numpy restatement of
    the spec — n-1 covariance, eigh top components, canonical sign,
    float32 components, 4-dp half-up — and must be invariant to
    rebatching (the reduce-order noise argument in the docstring)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray.functions.similarity import pca_projection

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/embeddings.parquet")
    out = pca_projection(ds, n_components=2)
    out2 = pca_projection(ds.repartition(7), n_components=2)
    assert out.equals(out2)  # batching must not leak into the result

    t = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    X = np.asarray(
        [np.asarray(v) for v in t["embedding"].to_pylist()], np.float64
    )
    n = len(X)
    mean = X.mean(0)
    cov = (X.T @ X - n * np.outer(mean, mean)) / (n - 1)
    ev, V = np.linalg.eigh(cov)
    W = V[:, np.argsort(ev)[::-1][:2]].T
    for i in range(2):
        if W[i, int(np.abs(W[i]).argmax())] < 0:
            W[i] = -W[i]
    W = W.astype(np.float32)
    P = (X - mean.astype(np.float32).astype(np.float64)) @ W.T.astype(
        np.float64
    )
    P = np.sign(P) * np.floor(np.abs(P) * 1e4 + 0.5) / 1e4
    assert (out["pc1"].to_numpy() == P[:, 0]).all()
    assert (out["pc2"].to_numpy() == P[:, 1]).all()


def test_pagerank_combine_paths_equivalent(ray_session):
    """The driver-fold fast path and the bucketed-exchange scale path of
    graph.pagerank must produce identical ranks (the float32 quantization
    per iteration absorbs their different reduce orders)."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.functions.graph import pagerank

    edges = rd.from_arrow(
        pa.table(
            {
                "src": ["a", "a", "b", "c", "d", "d", "e"],
                "dst": ["b", "c", "c", "a", "a", "e", "a"],
            }
        )
    )
    fast = pagerank(edges, iters=10)  # driver fold (n ≤ threshold)
    bucketed = pagerank(edges, iters=10, driver_combine_nodes=0)
    assert fast.equals(bucketed)
    assert abs(fast["pr"].sum() - 1.0) < 1e-3


def test_pagerank_degenerate_graphs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.functions.graph import pagerank

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    assert pagerank(empty, iters=2).empty
    loops = rd.from_arrow(pa.table({"src": ["x"], "dst": ["x"]}))
    assert pagerank(loops, iters=2).empty  # self-loops are excluded


def test_fingerprints_pinned_independent():
    """Re-derive the first 10 pinned fingerprint rows with a NAIVE
    per-byte Python polynomial hash (no numpy, no vectorization — a
    different code path from textstats.fingerprints' strided kernels):
    full hash = Σ byte_k · 257^(n-1-k) mod 2^64, winnowed hash = min over
    all 8-byte windows of the same polynomial."""
    import duckdb

    import pyarrow.parquet as pq

    from crawler_ray import pinned_oracles as PIN

    pinned = duckdb.sql(PIN.DOC_FINGERPRINTS_SQL).df().set_index("doc_id")
    docs = (
        pq.read_table(
            "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
        )
        .to_pandas()
        .set_index("doc_id")
    )
    MASK = (1 << 64) - 1
    for doc_id in range(10):
        data = (docs.loc[doc_id, "text"] or "").encode("utf-8", "replace")
        full = 0
        for b in data:
            full = (full * 257 + b) & MASK
        if len(data) < 8:
            win = full
        else:
            win = MASK
            for s in range(len(data) - 7):
                h = 0
                for b in data[s : s + 8]:
                    h = (h * 257 + b) & MASK
                win = min(win, h)
        assert int(pinned.loc[doc_id, "fingerprint"]) == full
        assert int(pinned.loc[doc_id, "min_gram_hash"]) == win


def test_simhash_pinned_pairs_independent():
    """Re-derive the pinned dedup_simhash_pairs truth with a naive
    per-doc, per-token, per-bit pure-Python SimHash + ALL-PAIRS Hamming
    scan (no banding, no numpy vote kernels — a different code path from
    SimHasher.simhash_batch and the bucketed pair generation). Banding
    with 4×16 chunks is pigeonhole-complete for hamming ≤ 3, so the naive
    all-pairs answer must equal the engine's banded one exactly."""
    import duckdb
    import polars as pl
    import pyarrow.parquet as pq
    import re

    import __ray_entry__ as E

    pinned = duckdb.sql(E.oracle_sql()["dedup_simhash_pairs"]).df()
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()

    tok = re.compile(r"\w+")
    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = tok.findall((text or "").lower())
        votes = [0] * 64
        if words:
            hs = pl.Series(words).hash(seed=0x51A4).to_list()
            for h in hs:
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        sigs[int(doc_id)] = sig

    ids = sorted(sigs)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:
                pairs.append((a, b, d))
    got = sorted(
        zip(
            pinned["a"].astype(int),
            pinned["b"].astype(int),
            pinned["hamming"].astype(int),
        )
    )
    assert got == sorted(pairs)


def test_hll_pinned_counts_independent():
    """Re-derive the pinned approx_distinct_users truth with a pure-Python
    HyperLogLog (Flajolet et al. 2007): registers as a dict, rank via
    int.bit_length, the alpha_m estimator + linear-counting small-range
    correction in plain floats — no numpy register kernels, no engine code
    except the hash64 key derivation (which is the shared spec)."""
    import math

    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from crawler_ray.keys import hash64

    pinned = duckdb.sql(E.oracle_sql()["approx_distinct_users"]).df()
    t = pq.read_table(
        "/root/testdata/sf0.01/events.parquet",
        columns=["event_type", "user_id"],
    ).to_pandas()

    p = 12
    m = 1 << p
    got = {}
    for etype, g in t.groupby("event_type"):
        regs = [0] * m
        for h in hash64([str(u) for u in g["user_id"]]):
            h = int(h)
            idx = h >> (64 - p)
            rest = (h << p) & ((1 << 64) - 1)
            # rank = leading zeros of the remaining bits + 1 (capped)
            lz = 64 - rest.bit_length() if rest else 64
            rank = min(lz + 1, 64 - p + 1)
            regs[idx] = max(regs[idx], rank)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / sum(2.0**-r for r in regs)
        zeros = regs.count(0)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        got[etype] = int(round(est))

    want = dict(
        zip(pinned["event_type"], pinned["approx_distinct"].astype(int))
    )
    assert got == want


def test_lsh_topk_independent_reference(ray_session):
    """Re-derive the LSH ANN answer with a naive single-process
    reimplementation of the published spec (Charikar hyperplane LSH, same
    seeded planes): per-table sign-bit buckets, candidate = shares ≥1
    bucket with the query, exact cosine over candidates, top-10. IDs and
    ranks must match exactly; similarities within float32 matmul ULP."""
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.01"
    got = E.queries()["ann_lsh_topk"](sf)

    from crawler_ray.functions.similarity import HyperplaneLSH, _normalize

    t = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    X = _normalize(
        np.asarray([np.asarray(v) for v in t["embedding"].to_pylist()], np.float32)
    )
    ids = t["vec_id"].to_numpy()
    q = X[:4]
    lsh = HyperplaneLSH(X.shape[1], 8, 6, seed=11)  # shared seeded spec
    rows = []
    for qi in range(4):
        cand = []
        for vi in range(len(X)):
            share = False
            for tb in range(6):
                if lsh.bucket_of(X[vi : vi + 1], tb)[0] == lsh.bucket_of(
                    q[qi : qi + 1], tb
                )[0]:
                    share = True
                    break
            if share:
                cand.append(vi)
        sims = [(float(np.dot(X[v], q[qi])), int(ids[v])) for v in cand]
        sims.sort(key=lambda sv: (-sv[0], sv[1]))
        for rank, (s, v) in enumerate(sims[:10]):
            rows.append((qi, v, rank, s))

    assert len(rows) == len(got)
    for (qi, v, rank, s), r in zip(rows, got.itertuples(index=False)):
        assert (qi, v, rank) == (r.query_id, r.vec_id, r.rank)
        assert abs(s - r.sim) < 5e-4  # 4-dp rounding + matmul ULP


def test_ivf_topk_independent_reference(ray_session):
    """Re-derive the IVF ANN answer with a naive single-process restatement
    of the inverted-file probe semantics: per-vector nearest-centroid
    assignment, candidate = assigned centroid appears in the query's
    nprobe probe list, exact cosine over candidates, top-10. The trained
    quantizer (IVFIndex, seeded) is the SHARED spec constant — the
    independent part is the assign/probe/scan/rank path, which here runs
    per-vector in plain loops instead of the engine's batched masks."""
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from crawler_ray.functions.similarity import IVFIndex, _normalize

    sf = "/root/testdata/sf0.01"
    got = E.queries()["ann_ivf_topk"](sf)

    t = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    X = _normalize(
        np.asarray([np.asarray(v) for v in t["embedding"].to_pylist()], np.float32)
    )
    ids = t["vec_id"].to_numpy()
    # train sample = head of the dataset in vec_id order (the parquet is
    # id-ordered and ≤ train_sample rows, so this equals the engine's)
    index = IVFIndex(X, n_centroids=16, seed=13)
    q = X[:4]
    probe = index.probe(q, 6)
    rows = []
    for qi in range(4):
        probed = set(int(c) for c in probe[qi])
        sims = []
        for vi in range(len(X)):
            cent = int(np.argmax(X[vi] @ index.centroids.T))
            if cent in probed:
                sims.append((float(np.dot(X[vi], q[qi])), int(ids[vi])))
        sims.sort(key=lambda sv: (-sv[0], sv[1]))
        for rank, (s, v) in enumerate(sims[:10]):
            rows.append((qi, v, rank, s))

    assert len(rows) == len(got)
    for (qi, v, rank, s), r in zip(rows, got.itertuples(index=False)):
        assert (qi, v, rank) == (r.query_id, r.vec_id, r.rank)
        assert abs(s - r.sim) < 5e-4


def test_minhash_clusters_pinned_independent():
    """Re-derive the pinned dedup_minhash_clusters truth with a naive
    pure-Python pipeline: per-doc char-5-shingle polynomial hashes and
    (a·h+b mod 2^64) signature minima in plain loops (seeded perms are the
    shared spec constant), candidates by EXACT band-tuple equality (the
    engine's polynomial band hash can only add collision candidates, which
    exact verification removes), the same 4σ estimate prune, exact char-
    5-gram Jaccard ≥ 0.8, and a from-scratch union-find with min-id
    representatives."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    pinned = duckdb.sql(E.oracle_sql()["dedup_minhash_clusters"]).df()
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()

    MASK = (1 << 64) - 1
    BASE = 1_099_511_628_211
    rng = np.random.default_rng(7)
    M = (1 << 61) - 1
    a = [int(x) for x in rng.integers(1, M, size=64, dtype=np.uint64)]
    b = [int(x) for x in rng.integers(0, M, size=64, dtype=np.uint64)]

    def shingles(text):
        data = (text or "").encode("utf-8", "replace")
        if not data:
            return {0}
        k = min(5, len(data))
        out = set()
        for i in range(len(data) - k + 1):
            h = 0
            for c in data[i : i + k]:
                h = (h * BASE + c) & MASK
            out.add(h)
        return out

    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        hs = shingles(text)
        sigs[int(doc_id)] = [
            min(((a[p] * h + b[p]) & MASK) for h in hs) for p in range(64)
        ]

    buckets: dict = {}
    for doc_id, sig in sigs.items():
        for band in range(16):
            key = (band, tuple(sig[band * 4 : band * 4 + 4]))
            buckets.setdefault(key, []).append(doc_id)
    cands = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))

    texts = dict(zip(docs["doc_id"].astype(int), docs["text"]))

    def grams(t):
        t = t or ""
        return (
            {t[i : i + 5] for i in range(max(1, len(t) - 4))} if t else set()
        )

    verified = []
    for x, y in sorted(cands):
        est = sum(p == q for p, q in zip(sigs[x], sigs[y])) / 64
        if est < 0.8 - 0.2:  # 4σ prune, σ = sqrt(.8·.2/64)
            continue
        ga, gb = grams(texts[x]), grams(texts[y])
        jac = 1.0 if not ga and not gb else len(ga & gb) / max(1, len(ga | gb))
        if jac >= 0.8:
            verified.append((x, y))

    parent = {}

    def find(u):
        parent.setdefault(u, u)
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for x, y in verified:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    members = sorted(parent)
    got = {(m, find(m)) for m in members}
    want = {
        (int(r.doc_id), int(r.rep_id)) for r in pinned.itertuples(index=False)
    }
    assert got == want


def test_pinned_tables_reproduced_at_pinned_params(ray_session):
    """The kmeans/pagerank/PCA parity tests above run at sf0.001 with
    small parameters; this test closes the remaining gap by re-deriving
    the COMMITTED sf0.01 pinned tables themselves with single-process
    references at the exact pinned parameters (k=8/iters=5; damping
    0.85/iters 10; 2 components) — so a bug that only manifests at the
    pinned scale or parameterization cannot hide inside the pins."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from crawler_ray import pinned_oracles as PIN

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    X = np.asarray(
        [np.asarray(v) for v in t["embedding"].to_pylist()], np.float64
    )

    # ---- k-means summary (k=8, iters=5)
    k = 8
    C = X[:k].astype(np.float32)

    def d2_of(C):
        return (
            (X * X).sum(1, keepdims=True)
            - 2 * X @ C.T.astype(np.float64)
            + (C.astype(np.float64) ** 2).sum(1)
        )

    for _ in range(5):
        a = d2_of(C).argmin(1)
        new = C.astype(np.float64).copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = X[m].sum(0) / m.sum()
        C = new.astype(np.float32)
    d2 = d2_of(C)
    a = d2.argmin(1)
    pin = duckdb.sql(PIN.EMBEDDINGS_KMEANS_SQL).df()
    assert pin["size"].tolist() == np.bincount(a, minlength=k).tolist()
    inertia = np.zeros(k)
    np.add.at(inertia, a, d2[np.arange(len(a)), a].astype(np.float32))
    assert np.allclose(pin["inertia"].to_numpy(), inertia, atol=0.01)

    # ---- PCA projection (2 components)
    n = len(X)
    mean = X.mean(0)
    cov = (X.T @ X - n * np.outer(mean, mean)) / (n - 1)
    ev, V = np.linalg.eigh(cov)
    W = V[:, np.argsort(ev)[::-1][:2]].T
    for i in range(2):
        if W[i, int(np.abs(W[i]).argmax())] < 0:
            W[i] = -W[i]
    W = W.astype(np.float32)
    P = (X - mean.astype(np.float32).astype(np.float64)) @ W.T.astype(
        np.float64
    )
    P = np.sign(P) * np.floor(np.abs(P) * 1e4 + 0.5) / 1e4
    pin = duckdb.sql(PIN.EMBEDDINGS_PCA_SQL).df()
    assert (pin["pc1"].to_numpy() == P[:, 0]).all()
    assert (pin["pc2"].to_numpy() == P[:, 1]).all()

    # ---- PageRank over the sf0.01 host graph (damping 0.85, 10 iters)
    import re as _re

    import pandas as pd

    links = E.queries()["extract_links"](sf).to_pandas()
    pat = _re.compile(r"^[^:]*://(\[[^\]]*\]|[^/:?#]*)")
    host = lambda u: ((pat.match(u or "") or [None, ""])[1]) or None
    pl = links[links["kind"] == "page"]
    edges = pd.DataFrame(
        {"src": pl["src_url"].map(host), "dst": pl["url"].map(host)}
    ).dropna()
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    nn = len(nodes)
    idx = {h: i for i, h in enumerate(nodes)}
    A = np.zeros((nn, nn))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] = 1.0
    outdeg = A.sum(1)
    dang = outdeg == 0
    pr = np.full(nn, 1 / nn).astype(np.float32).astype(np.float64)
    for _ in range(10):
        w = np.where(dang, 0.0, pr / np.maximum(outdeg, 1))
        pr = 0.15 / nn + 0.85 * (A.T @ w + pr[dang].sum() / nn)
        pr = pr.astype(np.float32).astype(np.float64)
    pr = np.floor(pr * 1e6 + 0.5) / 1e6
    pin = duckdb.sql(PIN.CRAWL_HOST_PAGERANK_SQL).df()
    assert pin["node"].tolist() == nodes.tolist()
    assert (pin["pr"].to_numpy() == pr).all()


def test_logreg_quality_independent_reference_parity(ray_session):
    """logreg_quality (distributed: pinned design blocks, mergeable
    gradient partials, float32 weight quantization per step) must equal a
    from-scratch single-process restatement of the spec — features via
    plain re/str ops, training via plain numpy — at sf0.001, AND the
    sf0.01 pinned driver oracle must match the same independent recompute
    row-for-row."""
    import re as _re

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray import pinned_oracles as PIN
    from crawler_ray.functions.classify import logreg_quality

    stop = set(
        "the a an and or of to in is are was were be been it this that "
        "for on with as at by from".split()
    )
    punct = _re.compile(r"[^\w\s]")

    def reference(sf: str) -> pd.DataFrame:
        t = (
            pq.read_table(f"{sf}/documents.parquet")
            .select(["doc_id", "text"])
            .sort_by("doc_id")
        )
        feats, labels = [], []
        for s in t["text"].to_pylist():
            s = s or ""
            words = s.lower().split()
            nw = len(words)
            sr = sum(w in stop for w in words) / max(nw, 1)
            mwl = float(np.mean([len(w) for w in words])) if words else 0.0
            feats.append(
                [
                    np.log1p(len(s)),
                    np.log1p(nw),
                    len(punct.findall(s)) / max(len(s), 1),
                    sr,
                    mwl,
                ]
            )
            labels.append(1.0 if nw >= 56 and sr >= 0.06 else 0.0)
        x = np.asarray(feats, np.float64)
        y = np.asarray(labels, np.float64)
        n = len(x)
        mu = (x.sum(0) / n).astype(np.float32)
        sd = np.maximum(
            np.sqrt(np.maximum((x * x).sum(0) / n - (x.sum(0) / n) ** 2, 0)),
            1e-6,
        ).astype(np.float32)
        xb = np.column_stack(
            [np.ones(n), (x - mu.astype(np.float64)) / sd.astype(np.float64)]
        )

        def sig(z):
            out = np.empty_like(z)
            pos = z >= 0
            out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
            ez = np.exp(z[~pos])
            out[~pos] = ez / (1.0 + ez)
            return out

        w = np.zeros(6, np.float32)
        for _ in range(30):
            p = sig(xb @ w.astype(np.float64))
            w = (w.astype(np.float64) - 0.5 * (xb.T @ (p - y)) / n).astype(
                np.float32
            )
        p = sig(xb @ w.astype(np.float64))
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "label": y.astype(np.int64),
                "prob": np.floor(p * 1e4 + 0.5) / 1e4,
            }
        )

    # engine vs reference at sf0.001, plus rebatching invariance
    sf = "/root/testdata/sf0.001"
    got, _model = logreg_quality(
        rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    )
    pd.testing.assert_frame_equal(got, reference(sf))
    got13, _m13 = logreg_quality(
        rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).repartition(13)
    )
    pd.testing.assert_frame_equal(got, got13)

    # the committed sf0.01 pin must equal the independent recompute
    pinned = duckdb.sql(PIN.DOCS_QUALITY_CLASSIFIER_SQL).df()
    pd.testing.assert_frame_equal(pinned, reference("/root/testdata/sf0.01"))


def test_bpe_independent_reference_parity(ray_session):
    """bpe_subword_counts (distributed word count → driver merge learning
    → broadcast encode) must equal a from-scratch single-process BPE —
    Counter-based pair counting, the paper's merge rule restated — on the
    learned MERGE LIST and the per-doc counts at sf0.001, stay invariant
    under rebatching, and the sf0.01 pinned driver oracle must match the
    same independent recompute."""
    from collections import Counter

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray import pinned_oracles as PIN
    from crawler_ray.functions.bpe import bpe_subword_counts

    def reference(sf: str):
        t = pq.read_table(f"{sf}/documents.parquet").sort_by("doc_id")
        texts = t["text"].to_pylist()
        wf: Counter = Counter()
        for s in texts:
            for w in (s or "").split(" "):
                if w:
                    wf[w] += 1
        vocab: dict = {}
        for w, f in wf.items():
            syms = tuple(w[:-1]) + (w[-1] + "</w>",)
            vocab[syms] = vocab.get(syms, 0) + f
        merges = []
        for _ in range(50):
            pairs: Counter = Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += f
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            nb: dict = {}
            for syms, f in vocab.items():
                out = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == best[0]
                        and syms[i + 1] == best[1]
                    ):
                        out.append(best[0] + best[1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nb[tuple(out)] = nb.get(tuple(out), 0) + f
            vocab = nb
        rank = {m: i for i, m in enumerate(merges)}

        def enc(w: str) -> int:
            syms = list(w[:-1]) + [w[-1] + "</w>"]
            while len(syms) > 1:
                bi, br = -1, None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (br is None or r < br):
                        bi, br = i, r
                if br is None:
                    break
                syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
            return len(syms)

        rows = []
        for d, s in zip(t["doc_id"].to_pylist(), texts):
            ws = [w for w in (s or "").split(" ") if w]
            rows.append((d, len(ws), sum(enc(w) for w in ws)))
        return merges, pd.DataFrame(
            rows, columns=["doc_id", "n_words", "n_subwords"]
        )

    sf = "/root/testdata/sf0.001"
    got, merges = bpe_subword_counts(
        rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]),
        n_merges=50,
    )
    ref_merges, ref_counts = reference(sf)
    assert merges == ref_merges
    pd.testing.assert_frame_equal(got, ref_counts)
    got13, _m = bpe_subword_counts(
        rd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).repartition(13),
        n_merges=50,
    )
    pd.testing.assert_frame_equal(got, got13)

    pinned = duckdb.sql(PIN.DOCS_BPE_SUBWORDS_SQL).df()
    _m01, ref01 = reference("/root/testdata/sf0.01")
    pd.testing.assert_frame_equal(pinned, ref01)


def test_pq_topk_independent_reference(ray_session):
    """Re-derive the PQ/ADC ANN answer end to end with a second
    implementation: the TRAINING loop (seeded sorted-choice init + plain
    Lloyd per subspace), the encode path, and the ADC gather are each
    restated in per-vector Python loops — unlike the IVF test, no part of
    the trained index is shared with the engine, so a training-loop bug
    cannot cancel out."""
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from crawler_ray.functions.similarity import _normalize

    sf = "/root/testdata/sf0.01"
    got = E.queries()["ann_pq_topk"](sf)

    t = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    X = _normalize(
        np.asarray([np.asarray(v) for v in t["embedding"].to_pylist()], np.float32)
    )
    ids = t["vec_id"].to_numpy()
    m_sub, ks, dsub, iters = 8, 16, 8, 10

    # independent training: per-subspace seeded init + Lloyd with
    # squared-L2 argmin (ties -> lowest id), empty clusters frozen
    rng = np.random.default_rng(13)
    books = []
    for j in range(m_sub):
        sub = X[:, j * dsub : (j + 1) * dsub]
        pick = np.sort(rng.choice(len(X), size=ks, replace=False))
        c = sub[pick].copy()
        for _ in range(iters):
            assign = []
            for v in sub:
                d2 = [float(((v - ck) ** 2).sum()) for ck in c]
                assign.append(int(np.argmin(d2)))
            assign = np.asarray(assign)
            for ci in range(ks):
                mem = sub[assign == ci]
                if len(mem):
                    c[ci] = mem.mean(axis=0)
        books.append(c)

    def encode_one(v):
        code = []
        for j in range(m_sub):
            s = v[j * dsub : (j + 1) * dsub]
            d2 = [float(((s - ck) ** 2).sum()) for ck in books[j]]
            code.append(int(np.argmin(d2)))
        return code

    q = X[:4]
    rows = []
    for qi in range(4):
        scored = []
        for vi in range(len(X)):
            code = encode_one(X[vi])
            adc = sum(
                float(np.dot(q[qi, j * dsub : (j + 1) * dsub], books[j][code[j]]))
                for j in range(m_sub)
            )
            scored.append((adc, int(ids[vi]), float(np.dot(X[vi], q[qi]))))
        scored.sort(key=lambda svx: (-svx[0], svx[1]))
        for rank, (adc, v, sim) in enumerate(scored[:10]):
            rows.append((qi, v, rank, adc, sim))

    assert len(rows) == len(got)
    for (qi, v, rank, adc, sim), r in zip(rows, got.itertuples(index=False)):
        assert (qi, v, rank) == (r.query_id, r.vec_id, r.rank)
        assert abs(adc - r.sim_adc) < 5e-4
        assert abs(sim - r.sim) < 5e-4


def test_hashing_embed_independent_reference():
    """Re-derive the hashing-trick embedding with per-gram Python loops —
    polynomial rolling hash over Z/2^64, splitmix avalanche, signed
    bucket, L2 normalization — and compare against the vectorized engine
    kernel. Pure numpy/pyarrow, no Ray."""
    import numpy as np
    import pyarrow as pa

    from crawler_ray.functions.similarity import hashing_embed

    texts = ["spark merge slow", "", "ab", "the same the same the same", "ünïcode tëxt"]
    got = hashing_embed(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        dim=16,
        n=3,
    )

    BASE, M = 1099511628211, (1 << 64) - 1
    for i, t in enumerate(texts):
        data = t.encode("utf-8", "replace")
        vec = np.zeros(16)
        for s in range(len(data) - 2):
            h = 0
            for byte in data[s : s + 3]:
                h = (h * BASE + byte) & M
            h ^= h >> 33
            h = (h * 0xFF51AFD7ED558CCD) & M
            h ^= h >> 33
            b = h % 32
            vec[b % 16] += 1.0 if b < 16 else -1.0
        nrm = np.linalg.norm(vec)
        if nrm > 0:
            vec /= nrm
        want = np.asarray(got["embedding"][i].as_py(), dtype=np.float64)
        assert np.allclose(want, vec.astype(np.float32), atol=1e-6), (i, t)


def test_hits_independent_reference_parity(ray_session):
    """graph.hits (broadcast weights + per-batch combiners) must exactly
    equal a dense single-process restatement of the same spec — distinct
    edges, no self-loops, h init 1, a-then-h updates each L2-normalized
    and float32-quantized, 6-dp half-up rounding — over the sf0.001 crawl
    corpus's host-link graph."""
    import re as _re

    import numpy as np
    import pandas as pd

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = E.queries()["crawl_host_hits"](sf)

    links = E.queries()["extract_links"](sf).to_pandas()
    pat = _re.compile(r"^[^:]*://(\[[^\]]*\]|[^/:?#]*)")

    def host(u):
        m = pat.match(u or "")
        return (m.group(1) if m else "") or None

    pl = links[links["kind"] == "page"]
    edges = pd.DataFrame(
        {"src": pl["src_url"].map(host), "dst": pl["url"].map(host)}
    ).dropna()
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    n = len(nodes)
    idx = {h: i for i, h in enumerate(nodes)}
    A = np.zeros((n, n))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] = 1.0

    def l2q(v):
        norm = np.sqrt((v * v).sum())
        if norm > 0:
            v = v / norm
        return v.astype(np.float32).astype(np.float64)

    h = np.ones(n)
    for _ in range(10):
        a = l2q(A.T @ h)
        h = l2q(A @ a)
    ref = pd.DataFrame(
        {
            "node": nodes,
            "hub": np.floor(h * 1e6 + 0.5) / 1e6,
            "authority": np.floor(a * 1e6 + 0.5) / 1e6,
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref)
    # L2 norms survive quantization: both vectors are ~unit
    assert abs((got["hub"] ** 2).sum() - 1.0) < 1e-3
    assert abs((got["authority"] ** 2).sum() - 1.0) < 1e-3


def test_hits_combine_paths_and_degenerate(ray_session):
    """Driver-fold and bucketed-exchange paths of graph.hits agree
    exactly; empty and self-loop-only graphs return empty frames; a pure
    hub/authority pair gets the expected 1.0 scores."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.functions.graph import hits

    edges = rd.from_arrow(
        pa.table(
            {
                "src": ["a", "a", "b", "c", "d", "d", "e"],
                "dst": ["b", "c", "c", "a", "a", "e", "a"],
            }
        )
    )
    fast = hits(edges, iters=10)
    bucketed = hits(edges, iters=10, driver_combine_nodes=0)
    assert fast.equals(bucketed)

    empty = rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
    )
    assert hits(empty, iters=2).empty
    loops = rd.from_arrow(pa.table({"src": ["x"], "dst": ["x"]}))
    assert hits(loops, iters=2).empty

    # one hub pointing at one authority: hub(a)=1, authority(b)=1
    pair = rd.from_arrow(pa.table({"src": ["a"], "dst": ["b"]}))
    out = hits(pair, iters=3).set_index("node")
    assert out.loc["a", "hub"] == 1.0 and out.loc["b", "authority"] == 1.0
    assert out.loc["a", "authority"] == 0.0 and out.loc["b", "hub"] == 0.0
