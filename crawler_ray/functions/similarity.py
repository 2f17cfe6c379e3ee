"""Similarity search over embedding columns (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul against it; per-batch
partial top-k rows are then reduced to the global top-k (tiny driver-side
merge of k×num_blocks rows). Linear scan, perfect scaling, no shuffle.

Scale path: LSH-bucketed ANN — random-hyperplane signatures (sign bits)
computed per batch, ``groupby(bucket)`` so only same-bucket vectors are
scored; multiple independent hash tables raise recall. IVF (k-means coarse
quantizer) has the same probe shape: assign→groupby(centroid)→scan probed
lists; the hyperplane variant is used here because it needs no training
pass.

Also: embedding-cosine near-duplicate pairs (the dedup use of the same
machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def brute_force_topk(
    ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns
    (query_id, vec_id, sim, rank) with deterministic tie-break on vec_id."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_to_matrix(batch["embedding"]))
        sims = m @ q.T  # (batch, n_queries)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        # per-batch partial top-k per query
        out_q, out_id, out_sim = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            part = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_q.extend([qi] * len(part))
            out_id.extend(ids[part])
            out_sim.extend(sims[part, qi])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(np.asarray(out_sim, dtype=np.float64)),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    return (
        partials.groupby("query_id", sort=True)
        .head(k)
        .assign(rank=lambda d: d.groupby("query_id").cumcount())
        .reset_index(drop=True)
    )


class HyperplaneLSH:
    """Random-hyperplane signature stage (actor pool: planes sampled once).
    Adds a ``bucket`` column of sign-bit signatures; same-bucket vectors are
    ANN candidates (cosine-LSH, Charikar 2002)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch["embedding"]))
        return batch.append_column("bucket", pa.array(self.bucket_of(m)))


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 12,
    seed: int = 11,
) -> pd.DataFrame:
    """Approximate cosine top-k: only vectors in a query's LSH bucket are
    scored. Returns the same schema as brute_force_topk (possibly fewer
    than k rows per query — the recall/latency trade)."""
    qm = _normalize(np.asarray(queries, dtype=np.float32))
    dim = dim or qm.shape[1]
    lsh = HyperplaneLSH(dim, n_planes, seed)
    q_buckets = lsh.bucket_of(qm)

    bucketed = ds.map_batches(
        HyperplaneLSH,
        batch_format="pyarrow",
        concurrency=2,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed},
    )
    wanted = set(int(b) for b in q_buckets)
    cand = bucketed.map_batches(
        lambda t: t.filter(
            pa.array([int(b) in wanted for b in t["bucket"].to_pylist()])
        ),
        batch_format="pyarrow",
    ).to_pandas()
    out = []
    for qi, qb in enumerate(q_buckets):
        rows = cand[cand["bucket"] == int(qb)]
        if not len(rows):
            continue
        m = _normalize(np.asarray(list(rows["embedding"]), dtype=np.float32))
        sims = m @ qm[qi]
        df = pd.DataFrame(
            {
                "query_id": qi,
                "vec_id": rows["vec_id"].to_numpy(),
                "sim": sims.astype(np.float64),
            }
        ).sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        out.append(df)
    if not out:
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": [], "rank": []})
    res = pd.concat(out, ignore_index=True)
    res["rank"] = res.groupby("query_id").cumcount()
    return res


def cosine_near_dup_pairs(ds, threshold: float = 0.95) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim ≥ threshold).
    Broadcast-matrix form: each batch scores against the full normalized
    matrix (fine to ~10^5 vectors; beyond that switch to the LSH buckets
    above and score within buckets only)."""
    import ray

    full = ds.map_batches(
        lambda t: t.select(["vec_id", "embedding"]), batch_format="pyarrow"
    ).to_pandas()
    ids = full["vec_id"].to_numpy(dtype=np.int64)
    m = _normalize(np.asarray(list(full["embedding"]), dtype=np.float32))
    m_ref = ray.put((ids, m))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(m_ref)
        bm = _normalize(_to_matrix(batch["embedding"]))
        bids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = bm @ all_m.T
        out_a, out_b, out_s = [], [], []
        for i in range(len(bids)):
            hits = np.nonzero((sims[i] >= threshold) & (all_ids > bids[i]))[0]
            out_a.extend([bids[i]] * len(hits))
            out_b.extend(all_ids[hits])
            out_s.extend(sims[i, hits])
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "sim": pa.array(np.asarray(out_s, dtype=np.float64)),
            }
        )

    got = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    if got.empty:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
    return got.sort_values(["a", "b"]).reset_index(drop=True)
