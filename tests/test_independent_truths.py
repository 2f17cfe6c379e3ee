"""Independent recomputation of the pinned driver-oracle truths.

Pinned oracles (LANG_ID_COUNTS_SQL, WEBTEXT_STATS_SQL in __ray_entry__)
are committed expected outputs; on their own they prove end-to-end
determinism, not truth. These tests re-derive the same numbers with a
SECOND pure-Python implementation — different code, same published
algorithm spec (Cavnar & Trenkle 1994 rank-order n-gram profiles; the
C4-style filter chain) — and compare against the committed values, so the
pins are cross-checked by something other than the engine's own code path.
The crawl texts feeding the webtext chain come from the pure-Python oracle
SIMULATOR, not the Ray engine.
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
