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


_MINHASHERS: dict = {}


def _minhash_block(
    batch: pa.Table, num_perm: int, shingle_k: int, seed: int
) -> pa.Table:
    """Task form of the MinHasher stage (per-worker instance cache keyed on
    the hash params): its setup is two rng coefficient arrays derived from
    the seed, so an actor pool buys nothing and pays spin-up per call."""
    key = (num_perm, shingle_k, seed)
    mh = _MINHASHERS.get(key)
    if mh is None:
        # Params are constant within a pipeline run: keep only the most
        # recent key so long-lived workers serving many parameter sets
        # don't grow the cache without bound.
        _MINHASHERS.clear()
        mh = _MINHASHERS.setdefault(
            key, MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)
        )
    return mh(batch)


def _band_rows(batch: pa.Table, bands: int) -> pa.Table:
    """Explode signatures into (band, band_hash, doc_id) bucket rows — one
    vectorized (n × bands × rows_per_band) polynomial hash per batch, no
    per-doc Python. Hash collisions can only ADD candidate pairs, which
    verification removes."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "band": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.uint64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    ids = batch["doc_id"].to_numpy()
    sig = np.stack(batch["sig"].to_numpy(zero_copy_only=False)).astype(np.uint64)
    n, num_perm = sig.shape
    rpb = num_perm // bands
    chunks = sig[:, : bands * rpb].reshape(n, bands, rpb)
    with np.errstate(over="ignore"):
        powers = _SHINGLE_BASE ** np.arange(rpb, dtype=np.uint64)
        bh = (chunks * powers).sum(axis=2, dtype=np.uint64)
        # mix the band index in so equal chunks in different bands never
        # share a bucket
        bh = bh * np.uint64(0x9E3779B97F4A7C15) + np.arange(
            bands, dtype=np.uint64
        )
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        }
    )


_STAR_CLIP = 200


def _bucket_pairs_vec(df: pd.DataFrame) -> pd.DataFrame:
    """All LSH-bucket pairs within one hash bucket, fully vectorized (no
    per-group Python): a self-merge on the bucket key emits the (a<b)
    pairs for normal buckets; a pathological giant bucket (> _STAR_CLIP
    members — the docs are all near-identical) is clipped to a star around
    its min-id hub, which keeps the pair list linear and the connected
    component unchanged."""
    df = df.drop_duplicates(["band", "band_hash", "doc_id"])
    sizes = df.groupby(["band", "band_hash"], sort=False)["doc_id"].transform(
        "size"
    )
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    small = df[(sizes > 1) & (sizes <= _STAR_CLIP)]
    if len(small):
        m = small.merge(small, on=["band", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        parts_a.append(m["doc_id_x"].to_numpy())
        parts_b.append(m["doc_id_y"].to_numpy())
    big = df[sizes > _STAR_CLIP]
    if len(big):
        hub = (
            big.groupby(["band", "band_hash"], sort=False)["doc_id"]
            .transform("min")
            .to_numpy()
        )
        ids = big["doc_id"].to_numpy()
        rest = ids != hub
        parts_a.append(hub[rest])
        parts_b.append(ids[rest])
    if not parts_a:
        return pd.DataFrame({"a": [], "b": []}, dtype="int64")
    return pd.DataFrame(
        {
            "a": np.concatenate(parts_a).astype(np.int64),
            "b": np.concatenate(parts_b).astype(np.int64),
        }
    )


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
    from ..stages.shuffle import bucketed_group_map, bucketed_join_tasks

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
        # neighbor labels: edge (x, y) delivers label(y) to x. The task
        # join: both inputs are already materialized each round, so the
        # streaming join's pipelining buys nothing and its sort-groupby
        # machinery costs a full extra exchange per round.
        cand = bucketed_join_tasks(
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
    prune_margin: float | None = None,  # exact mode: estimate-prune at
    # threshold - max(margin, 4σ); None = the 4σ floor alone, which scales
    # with num_perm (σ = sqrt(t(1-t)/num_perm): 0.2 at t=0.8, num_perm=64)
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
    import ray.data as rd

    from ..stages.shuffle import (
        bucketed_group_map_refs,
        bucketed_join,
        gather_refs_pd,
        nrows_refs,
    )

    # task form with a per-worker cache keyed on the hash params: MinHasher
    # setup is two rng arrays derived from the seed, so an actor pool here
    # bought nothing and paid per-call spin-up (same finding as SimHash)
    sigs = ds.map_batches(
        _minhash_block,
        batch_format="pyarrow",
        batch_size=256,
        fn_kwargs={"num_perm": num_perm, "shingle_k": shingle_k, "seed": seed},
    )
    sigs = sigs.materialize()  # read twice: banding + the estimate joins

    # band explode → task exchange → per-bucket pair gen, kept at the REFS
    # level: the pair list is candidate-sized, and re-wrapping it in a
    # Dataset just to count/gather costs 2-3 streaming-executor launches
    # (~1-2 s fixed each on a busy host — measured to dominate this phase)
    pair_refs = bucketed_group_map_refs(
        sigs.map_batches(_band_rows, batch_format="pyarrow", fn_kwargs={"bands": bands}),
        bucket_on="band_hash",
        fn=_bucket_pairs_vec,
    )
    if pair_refs is None:  # banding produced no rows (empty input)
        empty = pd.DataFrame({"a": [], "b": [], "jaccard": []})
        return pd.DataFrame({"doc_id": [], "rep_id": []}, dtype="int64"), empty

    # Semi-join prefilter: only CANDIDATE docs' payloads enter the verify
    # exchanges. The distinct candidate-id set is near-linear in the true
    # dup count (the point of LSH) — orders of magnitude smaller than the
    # corpus — so it broadcasts into a vectorized `is_in` filter, and the
    # verification joins then exchange only candidate-sized payloads
    # instead of re-shipping every doc's text. Per-block distinct → driver
    # union keeps the id collection bounded by the candidate count.
    import pyarrow.compute as pc

    def _distinct_ids(pairs) -> np.ndarray:
        parts = pairs.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.unique(
                        pa.concat_arrays(
                            [
                                t["a"].combine_chunks().cast(pa.int64()),
                                t["b"].combine_chunks().cast(pa.int64()),
                            ]
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        return np.unique(parts["doc_id"].to_numpy())

    def only_candidates(t: pa.Table, wanted: np.ndarray) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=pa.array(wanted)))

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _attach_payload(pairs, payload_ds, col, val_type, dedup_left):
        """Two hash joins attach (col_a, col_b) to each (a, b) pair;
        cross-band pair dedup folds into the first join's bucket task,
        which is already co-located on `a`."""
        j1 = bucketed_join(
            pairs,
            payload_ds.map_batches(
                lambda t: t.rename_columns(["doc_id", col + "_a"]),
                batch_format="pyarrow",
            ),
            left_on="a",
            right_on="doc_id",
            left_prep=(lambda df: df.drop_duplicates()) if dedup_left else None,
            left_schema=pairs_schema,
            right_schema=pa.schema(
                [("doc_id", pa.int64()), (col + "_a", val_type)]
            ),
        )
        return bucketed_join(
            j1,
            payload_ds.map_batches(
                lambda t: t.rename_columns(["doc_id", col + "_b"]),
                batch_format="pyarrow",
            ),
            left_on="b",
            right_on="doc_id",
            left_schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), (col + "_a", val_type)]
            ),
            right_schema=pa.schema(
                [("doc_id", pa.int64()), (col + "_b", val_type)]
            ),
        )

    def _empty_scored() -> pa.Table:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )

    # The verification working set — candidate pairs plus candidate-doc
    # payloads — is near-linear in the TRUE dup count by LSH construction,
    # i.e. tiny relative to the corpus. Below the limits it is gathered
    # once, the estimate runs as one driver-side numpy compare, and the
    # exact n-gram check fans out as plain Ray tasks over a ray.put text
    # dict (zero all-to-all rounds). Above the limits — where "tiny" can
    # still mean billions — verification runs as bucketed hash joins with
    # nothing corpus-sized on the driver (same output, more exchanges).
    # Prune margin for exact mode: 4σ of the signature estimate at the
    # threshold, floored by the caller's value — keeps the recall loss of
    # skipping the exact check below ~1e-4 at ANY num_perm (a fixed margin
    # is only ~2σ at num_perm=16).
    sigma4 = 4.0 * float(np.sqrt(threshold * (1 - threshold) / num_perm))
    prune_margin = max(prune_margin or 0.0, sigma4)

    n_pair_rows = nrows_refs(pair_refs)  # tiny tasks; no pair bytes move
    pp = cand_ids = None
    if n_pair_rows <= _BC_PAIR_LIMIT:
        # one gather serves the pair list, its dedup AND the candidate ids
        pp = gather_refs_pd(pair_refs).drop_duplicates(["a", "b"])
        cand_ids = (
            np.unique(np.concatenate([pp["a"].to_numpy(), pp["b"].to_numpy()]))
            if len(pp)
            else np.array([], dtype=np.int64)
        )
    if pp is not None and len(cand_ids) <= _BC_CAND_LIMIT:
        verified_ds = _verify_broadcast(
            ds, sigs, pp, only_candidates, cand_ids,
            verify, threshold, prune_margin, shingle_k,
        )
    else:
        # above the gate: back into Dataset form for the join path (the
        # refs are complete — nrows_refs was a barrier)
        pairs_ds = rd.from_arrow_refs(pair_refs)
        if cand_ids is None:
            cand_ids = _distinct_ids(pairs_ds)
        verified_ds = _verify_joins(
            ds, sigs, pairs_ds, _distinct_ids, only_candidates, cand_ids,
            _attach_payload, _empty_scored, verify, threshold, prune_margin,
            shingle_k,
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


_BC_CAND_LIMIT = 500_000  # candidate docs ≈ 250 MB of signatures
_BC_PAIR_LIMIT = 5_000_000


def _sig_estimate(
    smat: np.ndarray, sid: np.ndarray, a: np.ndarray, b: np.ndarray,
    chunk: int = 16384,
) -> np.ndarray:
    """Signature-estimate Jaccard for pair lists: fraction of equal minhash
    slots. Chunked with REUSED gather buffers rather than one
    ``smat[idx_a] == smat[idx_b]`` — the one-shot form materializes two
    pairs×num_perm matrices (hundreds of MB at 10^6 pairs) of FRESH pages,
    and first-touch page-fault cost is both the memory-bound term at scale
    and, on shared/overcommitted hosts, intermittently 100x the compute
    (measured: 5-25 s for a 66 MB first touch vs 0.06 s warm). Bounded
    buffers fault once and are reused for every chunk."""
    ia = np.searchsorted(sid, a)
    ib = np.searchsorted(sid, b)
    est = np.empty(len(a), np.float64)
    if len(a) == 0:
        return est
    n0 = min(chunk, len(a))
    ga = np.empty((n0, smat.shape[1]), smat.dtype)
    gb = np.empty_like(ga)
    for off in range(0, len(a), chunk):
        n = min(chunk, len(a) - off)
        np.take(smat, ia[off : off + n], axis=0, out=ga[:n])
        np.take(smat, ib[off : off + n], axis=0, out=gb[:n])
        est[off : off + n] = (ga[:n] == gb[:n]).mean(axis=1)
    return est


def _verify_broadcast(
    ds, sigs, pp, only_candidates, cand_ids,
    verify, threshold, prune_margin, shingle_k,
):
    """Small-working-set verification: one numpy signature compare on the
    driver (``pp`` = the already-gathered, deduped pair frame), then the
    exact n-gram check fanned out as Ray tasks against a broadcast
    candidate-text dict."""
    import functools

    import ray as _ray
    import ray.data as rd

    from ..stages.shuffle import apply_refs

    # sigs is materialized: gather the candidate rows with one plain task
    # per pinned block (a map_batches().to_pandas() here would pay a whole
    # streaming-executor launch to filter candidate-sized data)
    sig_pdf = apply_refs(
        functools.partial(only_candidates, wanted=cand_ids),
        sigs.to_arrow_refs(),
        empty=pa.schema(
            [("doc_id", pa.int64()), ("sig", pa.list_(pa.uint64()))]
        ).empty_table(),
    )
    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
    )
    if len(pp) == 0 or len(sig_pdf) == 0:
        return rd.from_arrow(out_schema.empty_table())
    order = np.argsort(sig_pdf["doc_id"].to_numpy())
    sid = sig_pdf["doc_id"].to_numpy()[order]
    smat = np.stack(sig_pdf["sig"].to_numpy())[order]
    a = pp["a"].to_numpy()
    b = pp["b"].to_numpy()
    est = _sig_estimate(smat, sid, a, b)

    if verify != "exact":
        keep = est >= threshold
        out = pa.table(
            {"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64()),
             "jaccard": pa.array(est[keep], pa.float64())}
        )
        return rd.from_arrow(out)

    band = est >= max(0.0, threshold - prune_margin)
    sa, sb = a[band], b[band]
    if len(sa) == 0:
        return rd.from_arrow(out_schema.empty_table())
    surv_ids = np.unique(np.concatenate([sa, sb]))
    texts_pdf = (
        ds.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        )
        .map_batches(
            only_candidates, batch_format="pyarrow", fn_kwargs={"wanted": surv_ids}
        )
        .to_pandas()
    )
    text_ref = _ray.put(
        dict(zip(texts_pdf["doc_id"].to_numpy(), texts_pdf["text"]))
    )

    @_ray.remote
    def exact_chunk(aa: np.ndarray, bb: np.ndarray, texts: dict) -> np.ndarray:
        return np.array(
            [
                ngram_jaccard(texts.get(x) or "", texts.get(y) or "", shingle_k)
                for x, y in zip(aa, bb)
            ]
        )

    n_chunks = min(32, max(1, len(sa) // 64))
    futs = [
        exact_chunk.remote(ca, cb, text_ref)
        for ca, cb in zip(np.array_split(sa, n_chunks), np.array_split(sb, n_chunks))
    ]
    jac = np.concatenate(_ray.get(futs))
    keep = jac >= threshold
    out = pa.table(
        {"a": pa.array(sa[keep], pa.int64()), "b": pa.array(sb[keep], pa.int64()),
         "jaccard": pa.array(jac[keep], pa.float64())}
    )
    return rd.from_arrow(out)


def _verify_joins(
    ds, sigs, pairs_ds, _distinct_ids, only_candidates, cand_ids,
    _attach_payload, _empty_scored, verify, threshold, prune_margin, shingle_k,
):
    """Fully-distributed verification (the > _BC_*_LIMIT path): signatures
    then texts attached via bucketed hash joins; estimate-prune between."""
    sig_payload = sigs.map_batches(
        only_candidates, batch_format="pyarrow", fn_kwargs={"wanted": cand_ids}
    ).materialize()  # candidate-sized; read by both stage-1 joins
    with_sigs = _attach_payload(
        pairs_ds, sig_payload, "sig", pa.list_(pa.uint64()), dedup_left=True
    )

    def est_score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_scored()
        sa = np.stack(t["sig_a"].to_numpy(zero_copy_only=False))
        sb = np.stack(t["sig_b"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "a": t["a"].cast(pa.int64()),
                "b": t["b"].cast(pa.int64()),
                "jaccard": pa.array((sa == sb).mean(axis=1), pa.float64()),
            }
        )

    est_ds = with_sigs.map_batches(est_score, batch_format="pyarrow")

    if verify != "exact":
        verified_ds = est_ds.filter(expr=f"jaccard >= {threshold!r}").materialize()
    else:
        # Stage 2: exact n-gram Jaccard, but only for pairs whose estimate
        # is within ``prune_margin`` of the threshold — the estimate is an
        # unbiased mean of num_perm Bernoullis (σ ≈ 0.05 at j=0.8,
        # num_perm=64), so a 0.2 margin is ≈4σ and the survivors are a tiny
        # near-threshold band. Only THEIR texts ship through the exchanges,
        # and the per-pair Python set intersection runs on survivors, not
        # on every banding candidate.
        survivors = (
            est_ds.filter(
                expr=f"jaccard >= {max(0.0, threshold - prune_margin)!r}"
            )
            .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
            .materialize()
        )
        surv_ids = _distinct_ids(survivors)
        in_schema = ds.schema()  # source dataset: schema is metadata-cheap
        text_type = pa.schema(list(zip(in_schema.names, in_schema.types))).field(
            "text"
        ).type
        text_payload = (
            ds.map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            )
            .map_batches(
                only_candidates,
                batch_format="pyarrow",
                fn_kwargs={"wanted": surv_ids},
            )
            .materialize()
        )
        with_texts = _attach_payload(
            survivors, text_payload, "text", text_type, dedup_left=False
        )

        def exact_score(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty_scored()
            jac = np.array(
                [
                    ngram_jaccard(x or "", y or "", shingle_k)
                    for x, y in zip(
                        t["text_a"].to_pylist(), t["text_b"].to_pylist()
                    )
                ]
            )
            return pa.table(
                {
                    "a": t["a"].cast(pa.int64()),
                    "b": t["b"].cast(pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

        verified_ds = (
            with_texts.map_batches(exact_score, batch_format="pyarrow")
            .filter(expr=f"jaccard >= {threshold!r}")
            .materialize()
        )
    return verified_ds


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
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

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

    # both exchanges chained at the refs level: re-entering Ray Data between
    # rounds (and for the final small gather) costs a streaming-executor
    # launch each — the fixed costs, not the exchanges, dominated this op
    p_refs = bucketed_group_map_refs(
        ds.map_batches(shingle_rows, batch_format="pyarrow"),
        bucket_on="shingle",
        fn=partial_counts,
        n_buckets=n_buckets,
    )
    o_refs = (
        None
        if p_refs is None
        else bucketed_group_map_refs(
            p_refs, bucket_on="a", fn=finalize, n_buckets=n_buckets
        )
    )
    if o_refs is None:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    # thresholded pair list: small by construction
    out = gather_refs_pd(o_refs)
    if len(out) == 0:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    # half-up to match DuckDB round() (pandas .round is half-even and
    # diverges on exact .5 boundaries, e.g. union sizes dividing 10^7)
    out["jaccard"] = np.floor(out["jaccard"] * 1e6 + 0.5) / 1e6
    return (
        out.astype({"a": "int64", "b": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def containment_ngram_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.7,
    n_buckets: int = 64,
    max_doc_freq: int | None = None,
):
    """Asymmetric n-gram CONTAINMENT pairs — the quote/subset detector
    Jaccard can't be (Broder 1997's 'containment' companion to resemblance:
    a short doc fully quoted inside a long one has containment ≈ 1 while
    Jaccard ≈ |A|/|B| ≈ 0, so near-dup passes miss it; decontamination and
    quote-tracing need this directional score). Same inverted-index
    identity as ``jaccard_ngram_pairs`` — with c = |A∩B| distinct-shingle
    co-occurrences, containment(A→B) = c/nA and (B→A) = c/nB — so the
    SAME two linear bucketed exchanges compute it; only the finalize
    arithmetic differs. Keeps pairs where EITHER direction ≥ threshold;
    returns ``(a, b, cont_a_in_b, cont_b_in_a)`` sorted by (a, b), scores
    rounded half-up at 6 dp after thresholding on the unrounded values.
    ``max_doc_freq`` is the same exactness trade documented on the
    Jaccard form."""
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

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
        c = g["c"].to_numpy(dtype=np.float64)
        ca = c / g["na"].to_numpy()
        cb = c / g["nb"].to_numpy()
        keep = np.maximum(ca, cb) >= threshold
        out = g.loc[keep, ["a", "b"]].copy()
        out["cont_a_in_b"] = ca[keep]
        out["cont_b_in_a"] = cb[keep]
        return out

    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "cont_a_in_b": pd.Series([], dtype="float64"),
            "cont_b_in_a": pd.Series([], dtype="float64"),
        }
    )
    p_refs = bucketed_group_map_refs(
        ds.map_batches(shingle_rows, batch_format="pyarrow"),
        bucket_on="shingle",
        fn=partial_counts,
        n_buckets=n_buckets,
    )
    o_refs = (
        None
        if p_refs is None
        else bucketed_group_map_refs(
            p_refs, bucket_on="a", fn=finalize, n_buckets=n_buckets
        )
    )
    if o_refs is None:
        return empty
    out = gather_refs_pd(o_refs)
    if len(out) == 0:
        return empty
    for col in ("cont_a_in_b", "cont_b_in_a"):
        out[col] = np.floor(out[col] * 1e6 + 0.5) / 1e6
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
        return self.simhash_batch([text])[0]

    def simhash_batch(self, texts: list) -> np.ndarray:
        """Whole-batch signature computation: ONE vectorized hash call over
        every token in the batch, per-doc bit votes via segment-reduce
        (np.add.reduceat), and signatures assembled with a single
        shift-multiply-sum — no per-doc or per-bit Python loop (only the
        regex tokenize itself is per-doc, which is inherent)."""
        import polars as pl

        tok_lists = [self.tok.findall((t or "").lower()) for t in texts]
        n_docs = len(tok_lists)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n_docs)
        sigs = np.zeros(n_docs, dtype=np.uint64)
        total = int(counts.sum())
        if total == 0:
            return sigs
        all_toks = [tok for lst in tok_lists for tok in lst]
        hs = pl.Series(all_toks).hash(seed=0x51A4).to_numpy().astype(np.uint64)
        # per-token ±1 votes for each of the 64 bit positions
        signs = (
            ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            .astype(np.int32)
            * 2
            - 1
        )
        nonempty = np.nonzero(counts)[0]
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1][nonempty]
        votes = np.add.reduceat(signs, offsets, axis=0)  # (n_nonempty, 64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sigs[nonempty] = ((votes > 0).astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64
        )
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(
                    self.simhash_batch(batch["text"].to_pylist()), pa.uint64()
                ),
            }
        )


_SIMHASHER: "SimHasher | None" = None


def _simhash_block(batch: pa.Table) -> pa.Table:
    """Task form of the SimHasher stage with a per-worker cached instance:
    its setup is one regex compile, so an actor POOL here buys nothing and
    pays ~0.5 s/actor spin-up per call (measured to dominate the stage at
    bench scale). Stages with real setup (models, profiles) stay actors."""
    global _SIMHASHER
    if _SIMHASHER is None:
        _SIMHASHER = SimHasher()
    return _SIMHASHER(batch)


def simhash_pairs(ds, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding: 4×16-bit chunks, docs sharing any
    chunk are candidates (guaranteed to catch hamming ≤ 3 by pigeonhole),
    verified by exact Hamming distance. Returns (a, b, hamming)."""
    sigs = ds.map_batches(_simhash_block, batch_format="pyarrow", batch_size=1024)

    def chunks(batch: pa.Table) -> pa.Table:
        # vectorized 4-way explode: doc-major order (chunk index inner)
        ids = batch["doc_id"].to_numpy()
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        cvs = ((sh[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "chunk": pa.array(
                    np.tile(np.arange(4, dtype=np.int32), len(ids)), pa.int32()
                ),
                "chunk_val": pa.array(cvs.ravel(), pa.int32()),
                "simhash": pa.array(np.repeat(sh, 4), pa.uint64()),
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
            # vectorized popcount: view each u64 as 8 bytes, unpack, sum
            d = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
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

    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    # refs-level: the banded pair list is small, so gather it with one
    # ray.get instead of paying a streaming launch for the to_pandas
    g_refs = bucketed_group_map_refs(
        sigs.map_batches(chunks, batch_format="pyarrow"),
        bucket_on="chunk_val",
        fn=pairs_in_bucket,
    )
    got = (
        gather_refs_pd(g_refs)
        if g_refs is not None
        else pd.DataFrame({"a": [], "b": [], "hamming": []})
    )
    if len(got) == 0:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return (
        got.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})
    )


# ------------------------------------------------------ decontamination


_DECON_TOKEN_RE = None


def _decon_tokens(text: str) -> list[str]:
    """Lowercase alphanumeric tokens — the one tokenizer both the engine and
    the SQL oracle use (``string_split_regex(lower(text), '[^a-z0-9]+')``)."""
    global _DECON_TOKEN_RE
    if _DECON_TOKEN_RE is None:
        import re

        _DECON_TOKEN_RE = re.compile(r"[^a-z0-9]+")
    return [t for t in _DECON_TOKEN_RE.split((text or "").lower()) if t]


def _decon_grams(text: str, n: int) -> set[str]:
    w = _decon_tokens(text)
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def collect_bench_grams(bench_ds, n: int = 8, text_col: str = "text"):
    """Distinct word ``n``-grams of a (small-by-contract) benchmark/eval
    dataset, gathered once and broadcast via ``ray.put`` — returns the
    ObjectRef of one frozenset (deserialized once per worker process, not
    per batch)."""
    import ray

    gram_parts = bench_ds.map_batches(
        lambda b: pa.table(
            {
                "g": pa.array(
                    sorted(
                        set().union(
                            *(
                                _decon_grams(t, n)
                                for t in b[text_col].to_pylist()
                            )
                        )
                        if b.num_rows
                        else set()
                    ),
                    pa.string(),
                )
            }
        ),
        batch_format="pyarrow",
    ).take_all()  # small side by contract: distinct grams of the EVAL set
    return ray.put(frozenset(r["g"] for r in gram_parts))


def ngram_decontaminate(
    docs_ds,
    bench_ds,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Test-set decontamination: flag every training doc that shares ANY
    word ``n``-gram with a benchmark/eval set — the standard guard against
    benchmark leakage into training corpora (the n-gram-overlap procedure
    published in the GPT-3 appendix / PaLM / Llama data cards; n=8..13
    word grams are the published operating points).

    Shape (the broadcast-small-side pattern): the benchmark set is tiny
    relative to the corpus (eval suites are ~10^5-10^7 grams), so its
    distinct grams are extracted in ``map_batches``, gathered once, and
    ``ray.put`` as one frozenset; the corpus side is a single stateless
    actor-pool pass that probes each doc's grams against the broadcast set
    with early exit on first hit. No shuffle touches the corpus. At larger
    bench sets, swap the string set for a 64-bit gram-hash set (8 bytes per
    gram) — same plumbing, hash both sides; string-exact here keeps the
    engine bit-comparable with the SQL oracle.

    Returns ``(doc_id, contaminated)`` for every doc in ``docs_ds``,
    sorted by id. Docs shorter than ``n`` tokens have no grams and are
    never contaminated.
    """
    import ray

    bench_ref = collect_bench_grams(bench_ds, n=n, text_col=text_col)

    class Flagger:
        def __init__(self) -> None:
            self.grams: frozenset = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bench = self.grams
            flags = []
            for text in batch[text_col].to_pylist():
                w = _decon_tokens(text)
                hit = False
                for i in range(len(w) - n + 1):
                    if " ".join(w[i : i + n]) in bench:
                        hit = True
                        break
                flags.append(hit)
            return pa.table(
                {
                    id_col: batch[id_col].cast(pa.int64()),
                    "contaminated": pa.array(flags, pa.bool_()),
                }
            )

    out = (
        docs_ds.map_batches(
            Flagger, batch_format="pyarrow", concurrency=2
        )
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# Line-level exact dedup (CCNet / RefinedWeb-style curation step)
# ---------------------------------------------------------------------------

_LINE_TRIM_CHARS = " \t\r"


def _explode_lines(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """One vectorized pass: docs → (doc_id, line_idx, line, dedupable, bkey)
    rows, plus one sentinel row per doc (line_idx = -1) so documents whose
    every line loses the global dedup still appear in the reassembly.

    ``dedupable`` = the line has non-whitespace content; whitespace-only
    lines are document structure and are always kept. ``bkey`` is the
    exchange routing key: the line itself for dedupable rows (global
    co-location of a line's instances), and a per-row synthetic key for
    keep-always rows — their bucket is irrelevant (they pass through), and
    routing them by content would funnel every empty line of a 100 TB
    corpus into one hot bucket."""
    import pyarrow.compute as pc

    ids = batch[id_col].cast(pa.int64()).combine_chunks()
    text = pc.fill_null(batch[text_col], "").cast(pa.string())
    lists = pc.split_pattern(text.combine_chunks(), pattern="\n")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    lengths = pc.list_value_length(lists).to_numpy().astype(np.int64)
    starts = np.cumsum(lengths) - lengths
    line_idx = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(
        starts, lengths
    )
    doc_ids = ids.take(parent)
    dedupable = pc.not_equal(
        pc.utf8_trim(flat, characters=_LINE_TRIM_CHARS), ""
    )
    ded_np = dedupable.to_numpy(zero_copy_only=False)
    # synthetic routing keys for pass-through rows (and sentinels): unique,
    # so whitespace-only lines spread across buckets instead of colliding
    did = doc_ids.to_numpy(zero_copy_only=False)
    synth = np.char.add(
        np.char.add(did.astype("U20"), ":"), line_idx.astype("U20")
    )
    bkey = np.where(ded_np, flat.to_numpy(zero_copy_only=False), synth)
    body = pa.table(
        {
            "doc_id": doc_ids,
            "line_idx": pa.array(line_idx, pa.int64()),
            "line": flat,
            "dedupable": dedupable,
            "bkey": pa.array(bkey, pa.string()),
        }
    )
    sent = pa.table(
        {
            "doc_id": ids,
            "line_idx": pa.array(
                np.full(len(ids), -1, dtype=np.int64), pa.int64()
            ),
            "line": pa.array([""] * len(ids), pa.string()),
            "dedupable": pa.array(np.zeros(len(ids), bool)),
            "bkey": pa.array(
                np.char.add("s", ids.to_numpy().astype("U20")), pa.string()
            ),
        }
    )
    return pa.concat_tables([body, sent])


def _keep_first_line_instance(df: pd.DataFrame) -> pd.DataFrame:
    """Per exchange bucket: globally-first instance wins per distinct line
    (canonical order = (doc_id, line_idx)); keep-always rows pass through.
    All instances of a dedupable line share ``bkey`` = the line, so they
    co-locate — the winner choice is exact, not per-bucket-approximate."""
    keep = df[~df["dedupable"]]
    ded = (
        df[df["dedupable"]]
        .sort_values(["line", "doc_id", "line_idx"], kind="stable")
        .drop_duplicates("line", keep="first")
    )
    return pd.concat([keep, ded])[["doc_id", "line_idx", "line"]]


def _reassemble_docs(df: pd.DataFrame) -> pd.DataFrame:
    """Per doc bucket: surviving lines (sentinel excluded) rejoined in
    original order. Documents that kept nothing emit empty text."""
    df = df.sort_values(["doc_id", "line_idx"], kind="stable")
    body = df[df["line_idx"] >= 0]
    g = body.groupby("doc_id", sort=True)
    text = g["line"].agg("\n".join)
    n = g.size()
    docs = pd.DataFrame({"doc_id": np.sort(df["doc_id"].unique())})
    out = docs.merge(
        pd.DataFrame(
            {"doc_id": text.index, "text": text.values, "n_lines_kept": n.values}
        ),
        on="doc_id",
        how="left",
    )
    out["text"] = out["text"].fillna("")
    out["n_lines_kept"] = out["n_lines_kept"].fillna(0).astype(np.int64)
    return out


def line_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Corpus-wide exact duplicate-LINE removal (the CCNet/RefinedWeb
    curation step: boilerplate lines — nav menus, cookie banners, footers —
    repeat across millions of pages; only the globally-first instance
    survives). Whitespace-only lines are structural and always kept.

    Shape: one vectorized explode pass (``map_batches``: Arrow
    ``split_pattern`` + ``list_flatten``, no per-row Python), then two
    bucketed task exchanges — by line (winner per distinct line = min
    (doc_id, line_idx)) and by doc (reassemble survivors in original
    order). Both exchanges are linear in the line count; nothing lands on
    the driver. Returns a Dataset of ``(doc_id, text, n_lines_kept)`` with
    one row per input document (fully-deduped docs emit empty text).
    """
    from ..stages.shuffle import bucketed_group_map

    exploded = ds.map_batches(
        _explode_lines,
        batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "text_col": text_col},
    )
    survivors = bucketed_group_map(
        exploded, "bkey", _keep_first_line_instance, n_buckets=n_buckets
    )
    return bucketed_group_map(
        survivors, "doc_id", _reassemble_docs, n_buckets=max(8, n_buckets // 2)
    )


def window_dup_pairs(
    ds,
    w: int = 8,
    n_buckets: int = 64,
    max_doc_freq: "int | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """EXACT duplicate-substring pairs: document pairs sharing at least one
    exact ``w``-word window — the exact-substring dedup criterion of
    published training-data dedup work (suffix-array substring dedup),
    restated over word windows so the inverted-index join applies.

    Same two-linear-exchange shape as ``jaccard_ngram_pairs``: distinct
    (doc, window) rows → bucketed exchange on window (per-bucket self-merge
    emits co-occurring pairs; a window's rows all land in one bucket, so
    the optional ``max_doc_freq`` cap sees true document frequency) →
    bucketed exchange on pair summing shared-window counts. Returns
    ``(a, b, n_shared)`` with ``n_shared`` = number of DISTINCT shared
    windows, sorted by (a, b).

    Scale note: window keys stay strings here so the DuckDB oracle can
    restate them; at the 10^10 design point they'd be 64-bit rolling
    hashes (the index shrinks ~10×, semantics unchanged modulo a
    2^-64-rate collision). A window shared by f docs inherently yields
    f·(f-1)/2 OUTPUT pairs, so on real corpora run exact dedup first
    (collapsing identical docs) and set ``max_doc_freq`` to cap boilerplate
    windows — both standard for the exact-substring criterion; the unitless
    default is exact to match the SQL oracle. Tokens = space-split,
    empties dropped, matching the repo's SQL tokenizer convention."""
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    def window_rows(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        wins: list[str] = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            words = [t for t in (text or "").split(" ") if t]
            if len(words) < w:
                continue
            uniq = {
                " ".join(words[i : i + w]) for i in range(len(words) - w + 1)
            }
            ids.extend([doc_id] * len(uniq))
            wins.extend(uniq)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "win": pa.array(wins, pa.string()),
            }
        )

    def partial_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if max_doc_freq is not None:
            freq = df.groupby("win", sort=False)["doc_id"].transform("size")
            df = df[freq <= max_doc_freq]
        m = df.merge(df, on="win", suffixes=("_x", "_y"))
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (
            m.groupby(["doc_id_x", "doc_id_y"], sort=False)
            .size()
            .reset_index(name="c")
            .rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["a", "b"], sort=False)["c"]
            .sum()
            .reset_index()
            .rename(columns={"c": "n_shared"})
        )

    p_refs = bucketed_group_map_refs(
        ds.map_batches(window_rows, batch_format="pyarrow"),
        bucket_on="win",
        fn=partial_pairs,
        n_buckets=n_buckets,
    )
    o_refs = (
        None
        if p_refs is None
        else bucketed_group_map_refs(
            p_refs, bucket_on="a", fn=finalize, n_buckets=n_buckets
        )
    )
    out = (
        gather_refs_pd(o_refs)
        if o_refs is not None
        else pd.DataFrame({"a": [], "b": [], "n_shared": []})
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
    return (
        out.astype({"a": "int64", "b": "int64", "n_shared": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------- duplicated-span excision


def dedup_spans(
    ds,
    w: int = 8,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """EXACT duplicated-span excision — the span-REMOVAL form of the
    exact-substring dedup criterion from published training-data dedup
    work (suffix-array substring dedup; restated over word windows like
    ``window_dup_pairs``, which only REPORTS the pairs).

    Semantics (deterministic, order-free): tokens = space-split, empties
    dropped. For every exact ``w``-word window occurring in ≥2 DISTINCT
    docs, the minimum doc_id containing it keeps all its occurrences;
    every occurrence in a higher doc_id is marked, and a token is removed
    iff covered by ≥1 marked occurrence ([pos, pos+w)) — so duplicated
    runs longer than ``w`` excise in full, and the earliest document
    retains one canonical copy of every span. Docs shorter than ``w``
    words pass through. Returns ``(doc_id, clean_text, n_removed)``
    sorted by doc_id.

    Shape: one linear pass emits (win, doc_id, pos) occurrence rows; one
    bucketed exchange on the window string finds multi-doc windows and
    emits the marked (doc_id, pos) occurrences (a window's rows all land
    in one bucket, so min-doc is exact); the marked set — duplicated
    occurrences only, ≪ corpus — gathers into a broadcast dict and one
    ``map_batches`` over the docs excises. At the design point the final
    join runs as a bucketed doc_id exchange instead of a broadcast (same
    two-exchange shape as ``window_dup_pairs``); window keys stay strings
    here for oracle parity, 64-bit rolling hashes at scale."""
    import ray as _ray

    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    def occ_rows(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        wins: list[str] = []
        pos: list[int] = []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            words = [t for t in (text or "").split(" ") if t]
            for i in range(len(words) - w + 1):
                ids.append(doc_id)
                wins.append(" ".join(words[i : i + w]))
                pos.append(i)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "win": pa.array(wins, pa.string()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def marked_occurrences(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("win", sort=False)["doc_id"]
        multi = (g.transform("nunique") > 1).to_numpy()
        keep_doc = g.transform("min").to_numpy()
        m = df[multi & (df["doc_id"].to_numpy() != keep_doc)]
        return m[["doc_id", "pos"]]

    refs = bucketed_group_map_refs(
        ds.map_batches(occ_rows, batch_format="pyarrow"),
        bucket_on="win",
        fn=marked_occurrences,
        n_buckets=n_buckets,
    )
    marked = (
        gather_refs_pd(refs)
        if refs is not None
        else pd.DataFrame({"doc_id": [], "pos": []})
    )
    starts: dict[int, np.ndarray] = {
        int(d): np.unique(g["pos"].to_numpy().astype(np.int64))
        for d, g in marked.groupby("doc_id", sort=False)
    }
    starts_ref = _ray.put(starts)

    def excise(batch: pa.Table) -> pa.Table:
        from ..pipelines.crawl import _cached_get

        st = _cached_get(starts_ref)
        ids = batch[id_col].to_pylist()
        out_text: list[str] = []
        out_removed: list[int] = []
        for doc_id, text in zip(ids, batch[text_col].to_pylist()):
            words = [t for t in (text or "").split(" ") if t]
            s = st.get(int(doc_id))
            if s is None or len(words) < w:
                out_text.append(" ".join(words))
                out_removed.append(0)
                continue
            drop = np.zeros(len(words), dtype=bool)
            for p in s:
                drop[p : p + w] = True
            kept = [x for x, dd in zip(words, drop) if not dd]
            out_text.append(" ".join(kept))
            out_removed.append(int(drop.sum()))
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(i) for i in ids], pa.int64()
                ),
                "clean_text": pa.array(out_text, pa.string()),
                "n_removed": pa.array(out_removed, pa.int64()),
            }
        )

    out = (
        ds.map_batches(excise, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


# --------------------------------------------------------- snapshot dedup


def _bloom_over(ds, col: str, capacity: int, fpp: float):
    """Mergeable Bloom build: one linear pass emits per-block packed bit
    arrays of FIXED size (independent of block rows — the bytes moved are
    ∝ blocks), OR-folded on the driver into one filter. At the 10^10
    design point a single filter outgrows one broadcast (1.2 GB per 10^9
    keys) and this becomes the hash-prefix-sharded form state/seen.py
    already implements; the single-filter broadcast below is the
    small-snapshot fast path."""
    from ..keys import hash_pair
    from ..state.filters import BloomFilter

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fpp)
        h1, h2 = hash_pair(t[col])
        bf.add(h1, h2)
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    bf = BloomFilter(capacity, fpp)
    for b in parts["bits"]:
        bf.bits |= np.frombuffer(b, dtype=np.uint8)
    return bf


def snapshot_dedup(
    new_ds,
    snap_ds,
    col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 1 << 20,
    fpp: float = 0.01,
    n_buckets: int = 32,
):
    """Incremental cross-snapshot EXACT dedup: keep only the new docs whose
    content did not already appear in a previous snapshot — the
    CCNet/Common-Crawl discipline of deduplicating each new dump against
    the dumps already collected, without re-shuffling the old corpus.

    Shape: (1) a mergeable Bloom filter over the snapshot broadcasts to
    one linear probe pass over the new docs; definite misses — the
    overwhelming majority at 1 % fpp — are kept with NO shuffle at all.
    (2) Only Bloom-positive candidates (true dups + ~fpp of the new
    corpus) go further: a SECOND Bloom built over just the candidates
    broadcasts to a snapshot scan, so the snapshot ships only its
    candidate-matching rows — both exchange sides stay ∝ candidates, not
    corpus. (3) One bucketed exchange on the 64-bit content hash settles
    candidates by EXACT text comparison (hash collisions and Bloom false
    positives both survive), so the final semantics are exact.

    The probe-marked new corpus is materialized once (object-store
    blocks, spill-backed) so the keep/candidate split does not re-read
    the input. Returns a Dataset of ``(id_col, col)`` survivors.
    """
    import pyarrow.compute as pc
    import ray

    from ..keys import hash_pair, hash64
    from ..stages.shuffle import bucketed_group_map

    snap_ref = ray.put(_bloom_over(snap_ds, col, capacity, fpp))

    def mark(t: pa.Table) -> pa.Table:
        h1, h2 = hash_pair(t[col])
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                col: t[col].cast(pa.string()),
                "_maybe": pa.array(ray.get(snap_ref).contains(h1, h2)),
            }
        )

    marked = new_ds.map_batches(mark, batch_format="pyarrow").materialize()
    kept_direct = marked.map_batches(
        lambda t: t.filter(pc.invert(t["_maybe"])).drop_columns(["_maybe"]),
        batch_format="pyarrow",
    )
    cands = marked.map_batches(
        lambda t: t.filter(t["_maybe"]).drop_columns(["_maybe"]),
        batch_format="pyarrow",
    )
    if cands.count() == 0:
        return kept_direct

    cand_ref = ray.put(_bloom_over(cands, col, capacity, fpp))

    def cand_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                col: t[col],
                "_h": pa.array(hash64(t[col])),
                "_side": pa.array(["n"] * t.num_rows),
            }
        )

    def snap_rows(t: pa.Table) -> pa.Table:
        h1, h2 = hash_pair(t[col])
        hit = t.filter(pa.array(ray.get(cand_ref).contains(h1, h2)))
        return pa.table(
            {
                id_col: pa.array(
                    np.full(hit.num_rows, -1, dtype=np.int64)
                ),
                col: hit[col].cast(pa.string()),
                "_h": pa.array(hash64(hit[col])),
                "_side": pa.array(["s"] * hit.num_rows),
            }
        )

    both = cands.map_batches(cand_rows, batch_format="pyarrow").union(
        snap_ds.map_batches(snap_rows, batch_format="pyarrow")
    )

    def settle(df: pd.DataFrame) -> pd.DataFrame:
        snap_texts = set(df.loc[df["_side"] == "s", col])
        keep = df[(df["_side"] == "n") & (~df[col].isin(snap_texts))]
        return keep[[id_col, col]]

    settled = bucketed_group_map(both, "_h", settle, n_buckets=n_buckets)
    return kept_direct.union(settled)


# ------------------------------------------------------- canonical-URL dedup


#: query parameters that never change page content (analytics trackers) —
#: the standard Common-Crawl-style preprocessing strip set
_TRACKING_PARAM = r"(?:utm_[^=&]*|fbclid|gclid|msclkid)"
_URL_SPLIT = r"(?s)^(?P<scheme>[^:/?#]+)://(?P<auth>[^/?#]*)(?P<rest>.*)$"


def canonicalize_url_batch(urls: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Vectorized crawl-corpus URL canonicalization (RE2 kernels only, no
    per-row Python): drop the fragment, strip analytics query params
    (utm_*/fbclid/gclid/msclkid — removed to a fixed point, so any run
    length collapses), drop a then-empty ``?``, lowercase the scheme and
    authority, and strip the scheme's default port (:80 http / :443
    https). Path and meaningful query params are preserved verbatim, in
    order. Rows that don't parse as ``scheme://authority...`` pass
    through with only the fragment/param normalization. This is the
    ingest-side equivalence key — coarser than the reference-parity
    urlnorm algebra, which must NOT fold case or ports (the reference
    treats those URLs as distinct; main.rs fetches them separately)."""
    import pyarrow.compute as pc

    u = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    u = u.cast(pa.string())
    u = pc.replace_substring_regex(u, pattern=r"(?s)#.*$", replacement="")
    # tracking params to a fixed point: each pass removes a [?&]param pair
    # together with the FOLLOWING separator (RE2 has no lookarounds), so a
    # run of k trackers needs up to k passes; corpora cap runs in practice
    # and the loop exits as soon as a pass changes nothing
    pat = rf"([?&]){_TRACKING_PARAM}(?:=[^&]*)?(?:&|$)"
    for _ in range(16):
        nxt = pc.replace_substring_regex(u, pattern=pat, replacement=r"\1")
        if not pc.any(pc.not_equal(nxt, u)).as_py():
            break
        u = nxt
    u = pc.replace_substring_regex(u, pattern=r"[?&]$", replacement="")
    m = pc.extract_regex(u, pattern=_URL_SPLIT)
    ok = pc.is_valid(m)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(m, "auth"))
    auth = pc.if_else(
        pc.and_(pc.equal(scheme, "http"),
                pc.match_substring_regex(auth, r":80$")),
        pc.utf8_replace_slice(auth, start=-3, stop=99_999, replacement=""),
        auth,
    )
    auth = pc.if_else(
        pc.and_(pc.equal(scheme, "https"),
                pc.match_substring_regex(auth, r":443$")),
        pc.utf8_replace_slice(auth, start=-4, stop=99_999, replacement=""),
        auth,
    )
    rebuilt = pc.binary_join_element_wise(
        scheme, pc.binary_join_element_wise(auth, pc.struct_field(m, "rest"), ""),
        "://",
    )
    return pc.if_else(ok, rebuilt, u)


def canonical_url_dedup(ds, url_col: str = "url", ts_col: str = "warc_ts"):
    """Ingest-side snapshot dedup by canonical URL: attach the canonical
    key (``canonicalize_url_batch``), then keep ONE row per key — the
    earliest ``ts_col``, ties broken by the smaller original URL string
    (deterministic under any partitioning). Shuffle shape = one bucketed
    hash exchange on the canonical key, per-bucket survivor pick is a
    vectorized sort + drop_duplicates — same scale contract as
    ``exact_dedup``. Returns a Dataset of surviving rows with the
    ``canon_url`` column attached."""
    from ..stages.shuffle import bucketed_group_map

    def attach(t: pa.Table) -> pa.Table:
        return t.append_column("canon_url", canonicalize_url_batch(t[url_col]))

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values([ts_col, url_col]).drop_duplicates(
            "canon_url", keep="first"
        )

    return bucketed_group_map(
        ds.map_batches(attach, batch_format="pyarrow"),
        bucket_on="canon_url",
        fn=keep_first,
    )


# ------------------------------------------------------------- mirror hosts


def mirror_host_pairs(
    ds,
    *,
    host_col: str = "host",
    text_col: str = "text",
    threshold: float = 0.5,
    min_shared: int = 2,
    max_hosts_per_key: "int | None" = None,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Mirror-host detection (Bharat & Broder, WWW 1999 "A comparison of
    techniques to find mirrored hosts"): hosts serving largely the SAME
    set of documents — www./m. aliases, CDN mirrors, scraped copies — are
    found from per-host content-fingerprint sets, so one representative
    host can be crawled and the rest dropped from the frontier.

    Metrics per host pair (a < b lexicographically): ``shared`` = number
    of distinct content keys both hosts serve; ``overlap`` = the overlap
    coefficient ``shared / min(|A|, |B|)`` (1.0 when one host's content
    is a subset of the other's — the mirror signature, robust to one
    side having extra pages); ``jaccard`` for reference. A pair is
    emitted iff ``shared >= min_shared`` and ``overlap >= threshold``
    (gated on the 6-dp-rounded overlap, same consumer-can-recompute
    contract as everywhere else).

    Scale shape: the host-granularity sibling of ``jaccard_ngram_pairs``
    — no all-pairs stage:

      docs → batch-distinct (host, content-key) rows
           → bucketed exchange on KEY: a (host, key) row can repeat only
             inside its key bucket, so global dedup happens here; each
             key's host group emits pair partials (self-merge) and one
             per-host distinct-key partial
           → bucketed exchange on host a: sum pair partials
           → driver: host-cardinality |A| table + thresholded pair list
             (both small sides by contract).

    Hot keys (boilerplate served by every host) blow up the pair stage
    quadratically; ``max_hosts_per_key`` drops keys above a host-frequency
    cap (prefix filtering: dropping a key only lowers similarities).
    Default None = exact.
    """
    import pyarrow.compute as pc

    from ..keys import hash64
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    def host_key_rows(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "host": batch[host_col].to_pandas(),
                "key": hash64(
                    pc.fill_null(
                        batch[text_col].combine_chunks()
                        if isinstance(batch[text_col], pa.ChunkedArray)
                        else batch[text_col],
                        "",
                    )
                ).astype("uint64"),
            }
        )
        return df.drop_duplicates()

    def per_key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["host", "key"])
        if max_hosts_per_key is not None:
            freq = df.groupby("key", sort=False)["host"].transform("size")
            df = df[freq <= max_hosts_per_key]
        # per-host distinct-key partial from THIS bucket (keys are
        # bucket-exclusive, so these partials sum to global |A|)
        counts = (
            df.groupby("host", sort=False).size().reset_index(name="c")
        )
        counts.insert(1, "b", "")
        counts.columns = ["a", "b", "c"]
        m = df.merge(df, on="key", suffixes=("_x", "_y"))
        m = m[m["host_x"] < m["host_y"]]
        pairs = (
            m.groupby(["host_x", "host_y"], sort=False)
            .size()
            .reset_index(name="c")
        )
        pairs.columns = ["a", "b", "c"]
        return pd.concat([counts, pairs], ignore_index=True)

    def sum_partials(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], sort=False)["c"].sum().reset_index()

    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype="object"),
            "b": pd.Series([], dtype="object"),
            "shared": pd.Series([], dtype="int64"),
            "overlap": pd.Series([], dtype="float64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    p_refs = bucketed_group_map_refs(
        ds.map_batches(host_key_rows, batch_format="pyarrow"),
        bucket_on="key",
        fn=per_key_bucket,
        n_buckets=n_buckets,
    )
    if p_refs is None:
        return empty
    s_refs = bucketed_group_map_refs(
        p_refs, bucket_on="a", fn=sum_partials, n_buckets=n_buckets
    )
    got = gather_refs_pd(s_refs) if s_refs is not None else pd.DataFrame()
    if len(got) == 0:
        return empty
    nh = dict(
        zip(got.loc[got["b"] == "", "a"], got.loc[got["b"] == "", "c"])
    )
    pairs = got[got["b"] != ""].copy()
    if len(pairs) == 0:
        return empty
    c = pairs["c"].to_numpy(dtype=np.int64)
    na = pairs["a"].map(nh).to_numpy(dtype=np.float64)
    nb = pairs["b"].map(nh).to_numpy(dtype=np.float64)
    overlap = np.floor(c / np.minimum(na, nb) * 1e6 + 0.5) / 1e6
    jaccard = np.floor(c / (na + nb - c) * 1e6 + 0.5) / 1e6
    out = pd.DataFrame(
        {
            "a": pairs["a"],
            "b": pairs["b"],
            "shared": c,
            "overlap": overlap,
            "jaccard": jaccard,
        }
    )
    out = out[(out["shared"] >= min_shared) & (out["overlap"] >= threshold)]
    return out.sort_values(["a", "b"]).reset_index(drop=True)
