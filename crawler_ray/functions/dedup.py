"""Deduplication operators for training-data pipelines (exact, MinHash-LSH,
SimHash, n-gram-Jaccard verification, embedding-cosine).

Design shapes (each documented with its shuffle/partitioning assumption):

- **exact**: content-hash column (vectorized) → ``groupby(hash)`` keep the
  min-id row. One hash-partitioned shuffle; group sizes are tiny (true
  duplicates), so no skew handling is needed beyond the hash itself.
- **MinHash+LSH**: per-doc shingle→minhash signatures in ``map_batches``
  (one pass, vectorized across a doc's shingles), explode to
  ``(band, band_hash, doc_id)`` rows, ``groupby`` the band buckets into
  candidate pairs, verify (signature-estimated or exact n-gram Jaccard on
  just the candidates), then connected components. The band groupby is the
  only all-to-all; candidate verification touches candidate rows only.
- **SimHash**: 64-bit signature per doc, banded into 4×16-bit chunks; docs
  sharing any chunk value are candidates, verified by Hamming distance.
- **embedding cosine**: see functions/similarity.py for the ANN machinery;
  here the near-dup wrapper emits pairs above a cosine threshold.

Connected components run as iterated min-label propagation over the pair
list — pure groupby/join rounds, O(log n) rounds at scale; below
``_DRIVER_CC_LIMIT`` pairs a driver union-find is used (the pair set after
LSH is tiny relative to the corpus, which is the point of LSH).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_DRIVER_CC_LIMIT = 5_000_000


def _stable_text_hash(texts: list[str]) -> np.ndarray:
    import polars as pl

    return pl.Series(texts).hash(seed=0xDED0).to_numpy().astype(np.uint64)


def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    return batch.append_column(
        "content_hash", pa.array(_stable_text_hash(batch[col].to_pylist()))
    )


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the minimum-id row per identical content. Returns a Dataset of
    survivors (all original columns). Shuffle = one bucketed hash exchange
    on the content hash; the per-bucket survivor pick is one vectorized
    sort + drop_duplicates, never per-key Python."""
    from ..stages.shuffle import bucketed_group_map

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).drop_duplicates("content_hash", keep="first")

    return bucketed_group_map(
        ds.map_batches(
            add_content_hash, batch_format="pyarrow", fn_kwargs={"col": col}
        ),
        bucket_on="content_hash",
        fn=keep_first,
    ).drop_columns(["content_hash"])


# ---------------------------------------------------------------- MinHash


_SHINGLE_BASE = np.uint64(1_099_511_628_211)  # FNV prime, wrapping uint64


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Polynomial hashes of the doc's character k-shingles over Z/2^64,
    fully vectorized: one (n_shingles × k) elementwise multiply against the
    base-power vector — no per-shingle Python objects."""
    data = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    if len(data) == 0:
        return np.zeros(1, dtype=np.uint64)
    if len(data) < k:
        k = len(data)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = _SHINGLE_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        return (windows * powers).sum(axis=1, dtype=np.uint64)


class MinHasher:
    """Actor-pool stage: permutation coefficients built once per actor.
    Emits one signature row per doc: (doc_id, sig: list<uint64>)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        h = np.unique(_shingle_hashes(text or "", self.k))  # set semantics
        # (a*h + b) over Z/2^64 (wrapping uint64) per permutation, min over
        # shingles — one vectorized (num_perm × n_shingles) op per doc
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * h[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def _band_rows(batch: pa.Table, bands: int) -> pa.Table:
    """Explode signatures into (band, band_hash, doc_id) bucket rows."""
    import polars as pl

    ids, bs, hs = [], [], []
    for doc_id, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        sig = np.asarray(sig, dtype=np.uint64)
        rows_per_band = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            ids.append(doc_id)
            bs.append(b)
            hs.append("|".join(map(str, chunk)))
    bh = pl.Series(hs).hash(seed=0xBA9D).to_numpy().astype(np.uint64)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(bs, pa.int32()),
            "band_hash": pa.array(bh),
        }
    )


def _pairs_for_ids(ids: np.ndarray) -> tuple[list, list]:
    """(a<b) pairs for one LSH bucket's member ids. A pathological giant
    bucket means the docs are all near-identical; its pair list is clipped
    to a star (min-id hub) to stay linear — the component is unchanged."""
    ids = np.unique(ids)
    if len(ids) < 2:
        return [], []
    if len(ids) > 200:  # star clip: same component, O(n) pairs
        return [int(ids[0])] * (len(ids) - 1), [int(x) for x in ids[1:]]
    iu = np.triu_indices(len(ids), k=1)
    return ids[iu[0]].tolist(), ids[iu[1]].tolist()


def _bucket_pairs_vec(df: pd.DataFrame) -> pd.DataFrame:
    """All LSH-bucket pairs within one hash bucket: pandas groupby over the
    real (band, band_hash) buckets, vectorized pair generation per bucket."""
    out_a: list[int] = []
    out_b: list[int] = []
    for _, g in df.groupby(["band", "band_hash"], sort=False):
        a, b = _pairs_for_ids(g["doc_id"].to_numpy())
        out_a.extend(a)
        out_b.extend(b)
    return pd.DataFrame({"a": out_a, "b": out_b}, dtype="int64")


def _estimated_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    return float((sa == sb).mean())


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (the verification metric)."""
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))} if a else set()
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))} if b else set()
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _connected_components(pairs: pd.DataFrame) -> dict[int, int]:
    """id → component representative (min id) via driver union-find — used
    below ``_DRIVER_CC_LIMIT`` pairs, where the verified pair list is tiny
    relative to the corpus (the point of LSH). Above the limit
    ``cc_label_propagation`` runs the same computation distributed."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def cc_label_propagation(pairs_ds, n_buckets: int = 64) -> pd.DataFrame:
    """Distributed connected components by min-label propagation: labels
    start at the node id; each round every node takes the min of its own
    label and its neighbors' labels (one bucketed join + one bucketed
    group-min per round) until the global label sum stops changing. The
    driver sees one scalar per round; edges and labels live in the object
    store. Rounds = component diameter — tiny for near-dup clusters (LSH
    buckets create star/clique edges). Returns (doc_id, rep_id) with
    rep = component min id, matching the union-find output exactly."""
    from ..stages.shuffle import bucketed_group_map, bucketed_join

    def symmetrize(t: pa.Table) -> pa.Table:
        x = pa.concat_arrays(
            [t["a"].combine_chunks().cast(pa.int64()),
             t["b"].combine_chunks().cast(pa.int64())]
        )
        y = pa.concat_arrays(
            [t["b"].combine_chunks().cast(pa.int64()),
             t["a"].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"x": x, "y": y})

    edges = (
        pairs_ds.map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        )
        .map_batches(symmetrize, batch_format="pyarrow")
        .materialize()
    )

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["x"]].drop_duplicates().rename(columns={"x": "node"})
        out["label"] = out["node"]
        return out

    def as_arrow(ds_pandas):  # unions need uniform block types
        return ds_pandas.map_batches(lambda t: t, batch_format="pyarrow")

    labels = as_arrow(
        bucketed_group_map(edges, "x", init_labels, n_buckets)
    ).materialize()
    prev_sum = labels.sum("label")

    while True:
        # neighbor labels: edge (x, y) delivers label(y) to x
        cand = bucketed_join(
            edges,
            labels,
            left_on="y",
            right_on="node",
            n_buckets=n_buckets,
            left_schema=pa.schema([("x", pa.int64()), ("y", pa.int64())]),
            right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        ).map_batches(
            lambda t: pa.table(
                {"node": t["x"].cast(pa.int64()), "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        both = labels.union(cand)

        def take_min(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", sort=False)["label"].min().reset_index()

        labels = as_arrow(
            bucketed_group_map(both, "node", take_min, n_buckets)
        ).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = labels.to_pandas().rename(columns={"node": "doc_id", "label": "rep_id"})
    return (
        out.sort_values("doc_id").reset_index(drop=True).astype("int64")
    )


def minhash_lsh_dedup(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    verify: str = "exact",  # "exact" (n-gram jaccard) or "estimate" (signature)
    seed: int = 7,
):
    """Full near-dup pipeline. Returns (clusters_df, pairs_df):
    clusters_df: doc_id, rep_id (component representative; docs with no
    near-dup are absent). pairs_df: a, b, jaccard for verified pairs.

    Ray shape: signatures via MinHasher actor pool → band explode →
    groupby((band, band_hash)) pair generation → candidate verification as
    bucketed joins against the signature/text datasets (nothing corpus-sized
    ever lands on the driver) → components.

    Verification detail: pairs first get both signatures attached via two
    hash joins (pair dedup folds into the first join's bucket task, which
    is already co-located on ``a``) and are pruned by the vectorized
    signature estimate; only the survivors join against the corpus text —
    two more linear exchanges — for exact n-gram Jaccard. Every stage is a
    Dataset; the driver only sees the verified pair list (small by
    construction) and, above ``_DRIVER_CC_LIMIT``, not even that —
    components then run distributed via ``cc_label_propagation``."""
    from ..stages.shuffle import bucketed_group_map, bucketed_join

    sigs = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=4,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_k": shingle_k,
            "seed": seed,
        },
    )
    if verify != "exact":
        # estimate mode reuses signatures for banding AND both verify
        # joins; exact mode uses them once (banding), so stay streaming
        sigs = sigs.materialize()

    pairs_ds = bucketed_group_map(
        sigs.map_batches(_band_rows, batch_format="pyarrow", fn_kwargs={"bands": bands}),
        bucket_on="band_hash",
        fn=_bucket_pairs_vec,
    )

    # Two hash joins attach the verification payload (text for exact mode,
    # signatures for estimate mode) to each candidate pair; cross-band pair
    # dedup folds into the first join's bucket task, which is already
    # co-located on `a`. LSH keeps the candidate set near-linear in the
    # true-dup count, so scoring candidates directly beats an extra
    # estimate-prune round trip of two more exchanges.
    if verify == "exact":
        payload = ds.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        )
        cols = ["doc_id", "text"]
        in_schema = ds.schema()  # source dataset: schema is metadata-cheap
        val_type = pa.schema(list(zip(in_schema.names, in_schema.types))).field(
            "text"
        ).type
    else:
        payload, cols = sigs, ["doc_id", "sig"]
        val_type = pa.list_(pa.uint64())

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    payload_schema = lambda suf: pa.schema(  # noqa: E731
        [("doc_id", pa.int64()), (cols[1] + suf, val_type)]
    )
    j1 = bucketed_join(
        pairs_ds,
        payload.map_batches(
            lambda t, c: t.rename_columns([c[0], c[1] + "_a"]),
            batch_format="pyarrow",
            fn_kwargs={"c": cols},
        ),
        left_on="a",
        right_on="doc_id",
        left_prep=lambda df: df.drop_duplicates(),
        left_schema=pairs_schema,
        right_schema=payload_schema("_a"),
    )
    j2 = bucketed_join(
        j1,
        payload.map_batches(
            lambda t, c: t.rename_columns([c[0], c[1] + "_b"]),
            batch_format="pyarrow",
            fn_kwargs={"c": cols},
        ),
        left_on="b",
        right_on="doc_id",
        left_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), (cols[1] + "_a", val_type)]
        ),
        right_schema=payload_schema("_b"),
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        if verify == "exact":
            jac = np.array(
                [
                    ngram_jaccard(x or "", y or "", shingle_k)
                    for x, y in zip(
                        t["text_a"].to_pylist(), t["text_b"].to_pylist()
                    )
                ]
            )
        else:
            sa = np.stack(t["sig_a"].to_numpy(zero_copy_only=False))
            sb = np.stack(t["sig_b"].to_numpy(zero_copy_only=False))
            jac = (sa == sb).mean(axis=1)
        return pa.table(
            {
                "a": t["a"].cast(pa.int64()),
                "b": t["b"].cast(pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    verified_ds = (
        j2.map_batches(score, batch_format="pyarrow")
        .filter(expr=f"jaccard >= {threshold!r}")
        .materialize()
    )

    n_pairs = verified_ds.count()
    if n_pairs == 0:
        empty = pd.DataFrame({"a": [], "b": [], "jaccard": []})
        return pd.DataFrame({"doc_id": [], "rep_id": []}, dtype="int64"), empty

    if n_pairs > _DRIVER_CC_LIMIT:
        clusters = cc_label_propagation(verified_ds)
    else:
        verified = verified_ds.to_pandas()
        comp = _connected_components(verified)
        clusters = pd.DataFrame(
            {
                "doc_id": sorted(comp),
                "rep_id": [comp[d] for d in sorted(comp)],
            }
        ).astype("int64")
    verified = verified_ds.to_pandas().astype({"a": "int64", "b": "int64"})
    return clusters, verified.sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------------------- exact n-gram Jaccard


def jaccard_ngram_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.5,
    n_buckets: int = 64,
    max_doc_freq: int | None = None,
):
    """EXACT word-n-gram Jaccard near-dup pairs via a shingle inverted-index
    join — the deterministic sibling of MinHash (no probabilistic recall
    loss), for corpora where exact similarity semantics are required.

    Identity: with c = |A∩B| common shingles and nA, nB the docs' distinct
    shingle counts, Jaccard = c / (nA + nB - c) — so the full pairwise
    similarity falls out of per-shingle co-occurrence counts alone, and the
    all-pairs stage disappears entirely:

      docs → distinct (doc_id, shingle, n_sh) rows (one vectorized pass)
           → bucketed exchange on shingle → per-bucket self-merge emits
             co-occurring pairs, partial-counted per bucket
           → bucketed exchange on pair → sum counts, Jaccard, threshold.

    Both exchanges are linear in the inverted-index size. The only
    superlinear term is hot shingles (a shingle shared by m docs yields
    m·(m-1)/2 pair rows); ``max_doc_freq`` drops shingles above a document
    frequency cap — the standard prefix-filtering trade (a dropped shingle
    can only LOWER a pair's computed similarity, never raise it). Default
    None = exact. Returns (a, b, jaccard) sorted, jaccard rounded to 6dp
    after thresholding on the unrounded value."""
    from ..stages.shuffle import bucketed_group_map

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        shs: list[str] = []
        ns: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            w = (text or "").split()
            if len(w) < n:
                continue
            sh = {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
            ids.extend([doc_id] * len(sh))
            shs.extend(sh)
            ns.extend([len(sh)] * len(sh))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingle": pa.array(shs, pa.string()),
                "n_sh": pa.array(ns, pa.int64()),
            }
        )

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized self-merge per bucket; a shingle's rows are all in
        # this bucket, so group size here IS its global document frequency
        if max_doc_freq is not None:
            freq = df.groupby("shingle", sort=False)["doc_id"].transform("size")
            df = df[freq <= max_doc_freq]
        m = df.merge(df, on="shingle", suffixes=("_x", "_y"))
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (
            m.groupby(["doc_id_x", "doc_id_y", "n_sh_x", "n_sh_y"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return out.rename(
            columns={"doc_id_x": "a", "doc_id_y": "b", "n_sh_x": "na", "n_sh_y": "nb"}
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["a", "b", "na", "nb"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        jac = g["c"].to_numpy(dtype=np.float64) / (
            g["na"].to_numpy() + g["nb"].to_numpy() - g["c"].to_numpy()
        )
        g["jaccard"] = jac
        return g.loc[jac >= threshold, ["a", "b", "jaccard"]]

    partials = bucketed_group_map(
        ds.map_batches(shingle_rows, batch_format="pyarrow"),
        bucket_on="shingle",
        fn=partial_counts,
        n_buckets=n_buckets,
    )
    out = bucketed_group_map(
        partials, bucket_on="a", fn=finalize, n_buckets=n_buckets
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    out["jaccard"] = out["jaccard"].round(6)
    return (
        out.astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------- SimHash


class SimHasher:
    """64-bit SimHash over word tokens (Charikar 2002): per-token hash bits
    vote ±1, sign of the sum per bit position. Actor-pool stage."""

    def __init__(self) -> None:
        import re

        self.tok = re.compile(r"\w+")

    def simhash(self, text: str) -> np.uint64:
        import polars as pl

        toks = self.tok.findall((text or "").lower())
        if not toks:
            return np.uint64(0)
        hs = pl.Series(toks).hash(seed=0x51A4).to_numpy().astype(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(
                    [self.simhash(t) for t in batch["text"].to_pylist()],
                    pa.uint64(),
                ),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding: 4×16-bit chunks, docs sharing any
    chunk are candidates (guaranteed to catch hamming ≤ 3 by pigeonhole),
    verified by exact Hamming distance. Returns (a, b, hamming)."""
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=2)

    def chunks(batch: pa.Table) -> pa.Table:
        ids, cis, cvs = [], [], []
        for doc_id, h in zip(
            batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()
        ):
            for c in range(4):
                ids.append(doc_id)
                cis.append(c)
                cvs.append((int(h) >> (16 * c)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk": pa.array(cis, pa.int32()),
                "chunk_val": pa.array(cvs, pa.int32()),
                "simhash": pa.array(
                    [
                        h
                        for h in batch["simhash"].to_pylist()
                        for _ in range(4)
                    ],
                    pa.uint64(),
                ),
            }
        )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # within one hash bucket: iterate the real (chunk, chunk_val)
        # candidate buckets; verify Hamming vectorized per bucket
        out = []
        for _, g in df.groupby(["chunk", "chunk_val"], sort=False):
            rows = g.drop_duplicates("doc_id").sort_values("doc_id")
            if len(rows) < 2:
                continue
            ids = rows["doc_id"].to_numpy()
            sh = rows["simhash"].to_numpy(dtype=np.uint64)
            iu = np.triu_indices(len(ids), k=1)
            x = sh[iu[0]] ^ sh[iu[1]]
            d = np.array([bin(int(v)).count("1") for v in x])
            keep = d <= max_hamming
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            "a": ids[iu[0]][keep],
                            "b": ids[iu[1]][keep],
                            "hamming": d[keep],
                        }
                    )
                )
        if not out:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}, dtype="int64")
        return pd.concat(out, ignore_index=True)

    from ..stages.shuffle import bucketed_group_map

    got = bucketed_group_map(
        sigs.map_batches(chunks, batch_format="pyarrow"),
        bucket_on="chunk_val",
        fn=pairs_in_bucket,
    ).to_pandas()
    if len(got) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return (
        got.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})
    )
