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
    survivors (all original columns)."""

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_content_hash, batch_format="pyarrow", fn_kwargs={"col": col})
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns(["content_hash"])
    )


# ---------------------------------------------------------------- MinHash


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the doc's character k-shingles (vectorized via polars)."""
    import polars as pl

    if len(text) < k:
        shingles = [text]
    else:
        shingles = [text[i : i + k] for i in range(len(text) - k + 1)]
    return pl.Series(shingles).hash(seed=0x51A9).to_numpy().astype(np.uint64)


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
        h = _shingle_hashes(text or "", self.k)
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


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """All (a<b) pairs within one LSH bucket. Buckets are capped upstream by
    signature width; a pathological giant bucket means the docs are all
    near-identical, and its pair list is clipped to a star (min-id hub) to
    stay linear — the connected component is unchanged."""
    ids = sorted(df["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    if len(ids) > 200:  # star clip: same component, O(n) pairs
        hub = ids[0]
        return pd.DataFrame({"a": [hub] * (len(ids) - 1), "b": ids[1:]})
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
    return pd.DataFrame({"a": list(a), "b": list(b)})


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
    """id → component representative (min id). Driver union-find below
    _DRIVER_CC_LIMIT pairs; label-propagation groupby rounds above."""
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
    groupby((band, band_hash)) pair generation → verification on the
    candidate set only → components."""
    import ray

    sigs = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_k": shingle_k,
            "seed": seed,
        },
    ).materialize()  # reused: banding + verification lookups

    pairs_ds = (
        sigs.map_batches(_band_rows, batch_format="pyarrow", fn_kwargs={"bands": bands})
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    pairs = pairs_ds.to_pandas().drop_duplicates(ignore_index=True)
    if len(pairs) == 0:
        empty = pd.DataFrame({"a": [], "b": [], "jaccard": []})
        return pd.DataFrame({"doc_id": [], "rep_id": []}, dtype="int64"), empty

    # verification on candidates only (broadcast the candidate docs)
    cand_ids = sorted(set(pairs["a"]) | set(pairs["b"]))
    if verify == "exact":
        texts_df = (
            ds.map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            )
            .to_pandas()
        )
        texts = dict(
            zip(texts_df["doc_id"], texts_df["text"])
        )  # scale path: semi-join candidates against the corpus instead
        jac = np.array(
            [
                ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
                for a, b in zip(pairs["a"], pairs["b"])
            ]
        )
    else:
        sig_df = sigs.to_pandas()
        sig_map = {
            i: np.asarray(s, dtype=np.uint64)
            for i, s in zip(sig_df["doc_id"], sig_df["sig"])
        }
        jac = np.array(
            [
                _estimated_jaccard(sig_map[a], sig_map[b])
                for a, b in zip(pairs["a"], pairs["b"])
            ]
        )
    pairs = pairs.assign(jaccard=jac)
    verified = pairs[pairs["jaccard"] >= threshold].reset_index(drop=True)

    comp = _connected_components(verified)
    clusters = pd.DataFrame(
        {
            "doc_id": sorted(comp),
            "rep_id": [comp[d] for d in sorted(comp)],
        }
    ).astype("int64")
    return clusters, verified.sort_values(["a", "b"]).reset_index(drop=True)


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
        rows = df.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].to_numpy()
        sh = rows["simhash"].to_numpy()
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(sh[i]) ^ int(sh[j])).count("1")
                if d <= pairs_in_bucket.max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_h.append(d)
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    pairs_in_bucket.max_hamming = max_hamming
    got = (
        sigs.map_batches(chunks, batch_format="pyarrow")
        .groupby(["chunk", "chunk_val"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(got) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return (
        got.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})
    )
