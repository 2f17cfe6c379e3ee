"""Distributed positional inverted index + exact phrase search.

The retrieval operator BM25 (textstats.bm25_topk) does NOT cover: BM25 is
a bag-of-words ranker, while phrase queries ("exact match, words in this
order") need token POSITIONS — the classic positional-postings design
every web search engine ships (Manning, Raghavan & Schütze, *Introduction
to Information Retrieval* 2008, §2.4: positional postings and phrase
queries). This module builds the positional index as a distributed
artifact and answers phrase queries from postings intersections without
re-reading document text.

Semantics (mirrored by the DuckDB oracle in ``__ray_entry__``):
  * tokens = the repo-wide space-split convention, empty tokens dropped
    (``textstats._explode_tokens``); a token's position is its index in
    the per-document KEPT-token sequence (0-based);
  * a phrase ``[t0 .. tK-1]`` occurs at position ``p`` of a document iff
    the document's kept tokens at ``p .. p+K-1`` equal the phrase —
    occurrences may OVERLAP (``"batch batch batch"`` contains
    ``"batch batch"`` twice), which substring replace-counting gets
    wrong and positional intersection gets right;
  * result: one row per (phrase, doc) with at least one occurrence:
    ``(phrase, doc_id, n_occurrences, first_pos)``, sorted by
    (phrase, doc_id).

Scale shape: the build pass is one ``map_batches`` over the corpus that
emits postings ONLY for the query vocabulary (the phrase term set is
query-sized, shipped in the stage closure) — at the 10^10 design point
with a standing index the same pass runs unfiltered and sinks per-term
postings parts via the bucketed exchange, and queries touch only the
buckets their terms hash to. Matching is ONE bucketed hash exchange on
``doc_id`` (stages/shuffle.bucketed_group_map_refs — all postings of a
document co-locate, so adjacency checks are bucket-local) with fully
vectorized intersection inside each bucket: per phrase term, candidate
start positions survive an ``np.isin`` against the term's
``doc*2^32 + pos`` key array — no per-document Python. The gather is
match-sized (docs × phrases that actually matched), never corpus-sized.

Reference anchor: the reference has no search surface at all (main.rs is
fetch/parse/extract only); this is part of the beyond-reference
training-data/retrieval extension set (SURVEY.md §2), complementing
``bm25_topk`` (ranked bag-of-words) with exact-phrase retrieval.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: position packing: doc_id * 2^32 + pos. Positions are bounded by the
#: per-document token count (< 2^32 for any real document); doc ids up to
#: 2^31 stay collision-free in int64. At larger id spaces the key becomes
#: a (doc_id, pos) structured sort instead — same intersections.
_POS_BITS = 32


def _token_positions(col: pa.ChunkedArray):
    """Vectorized (token, row_idx, pos) explode with per-document
    positions over the kept (non-empty) tokens — the positional extension
    of ``textstats._explode_tokens`` (same split, same empty-drop, so the
    two operators and their oracles share one tokenizer contract)."""
    if pa.types.is_null(col.type):
        col = pa.chunked_array([pa.nulls(len(col), pa.string())])
    toks = pc.split_pattern(pc.fill_null(col, "").combine_chunks(), pattern=" ")
    vals = toks.values.to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    mask = vals != ""
    vals, doc_idx = vals[mask], doc_idx[mask]
    if len(doc_idx) == 0:
        return vals, doc_idx, np.zeros(0, np.int64)
    # position = running index within each doc's kept-token run; doc_idx is
    # nondecreasing, so segment starts are the boundaries of its runs
    boundary = np.r_[True, doc_idx[1:] != doc_idx[:-1]]
    seg_id = np.cumsum(boundary) - 1
    starts = np.flatnonzero(boundary)
    pos = np.arange(len(doc_idx), dtype=np.int64) - starts[seg_id]
    return vals, doc_idx, pos


def positional_postings(
    ds,
    terms: "tuple[str, ...] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus → lazy Dataset of positional postings
    ``(term, doc_id, pos)``. ``terms`` prunes the emit to a query
    vocabulary (phrase search needs only its own terms); ``None`` builds
    the full standing index (sink it partitioned by term bucket)."""
    term_arr = None if terms is None else np.asarray(sorted(set(terms)))

    def emit(batch: pa.Table) -> pa.Table:
        vals, doc_idx, pos = _token_positions(batch[text_col])
        if term_arr is not None and len(vals):
            keep = np.isin(vals, term_arr)
            vals, doc_idx, pos = vals[keep], doc_idx[keep], pos[keep]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "term": pa.array(vals, pa.string()),
                "doc_id": pa.array(
                    ids[doc_idx].astype(np.int64) if len(doc_idx) else
                    np.zeros(0, np.int64)
                ),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow")


def phrase_search(
    ds,
    phrases: "tuple[str, ...]",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Exact phrase search over the corpus via positional postings.
    Returns ``(phrase, doc_id, n_occurrences, first_pos)`` for every
    document containing each phrase at least once, sorted by
    (phrase, doc_id). Empty/whitespace-only phrases are rejected."""
    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    phrase_toks = {}
    for p in phrases:
        toks = tuple(t for t in p.split(" ") if t)
        if not toks:
            raise ValueError(f"empty phrase: {p!r}")
        phrase_toks[p] = toks
    vocab = tuple({t for ts in phrase_toks.values() for t in ts})

    empty = pd.DataFrame(
        {
            "phrase": pd.Series([], dtype="object"),
            "doc_id": pd.Series([], dtype="int64"),
            "n_occurrences": pd.Series([], dtype="int64"),
            "first_pos": pd.Series([], dtype="int64"),
        }
    )

    def match_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # keys per term: sorted doc*2^32+pos arrays (one groupby, no loop
        # over docs; the loop below is over the QUERY's phrases/terms only)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        pos = df["pos"].to_numpy().astype(np.int64)
        # the packed key is only collision-free for 0 <= doc_id < 2^31 and
        # 0 <= pos < 2^32 — out-of-range values would silently corrupt
        # keys and return WRONG matches, so fail loudly instead
        if len(ids) and (
            ids.min() < 0
            or ids.max() >= (1 << 31)
            or pos.max() >= (1 << _POS_BITS)
        ):
            raise ValueError(
                "phrase_search packs doc_id<<32|pos into int64: doc_id must "
                f"be in [0, 2^31) and pos in [0, 2^32); got doc_id range "
                f"[{ids.min()}, {ids.max()}], max pos {pos.max()} — use a "
                "(doc_id, pos) structured key for larger id spaces"
            )
        key = (ids << _POS_BITS) | pos
        term_keys = {
            t: np.sort(key[idx])
            for t, idx in df.groupby("term", sort=False).indices.items()
        }
        out_p: list[str] = []
        frames: list[pd.DataFrame] = []
        for p, toks in phrase_toks.items():
            cand = term_keys.get(toks[0])
            if cand is None:
                continue
            for i, t in enumerate(toks[1:], start=1):
                nxt = term_keys.get(t)
                if nxt is None or len(cand) == 0:
                    cand = np.zeros(0, np.int64)
                    break
                # pos+i stays within the doc's key range: positions are
                # dense per doc, so doc boundaries can't be crossed by a
                # hit (pos+i of the last token would not exist)
                cand = cand[
                    np.isin(cand + i, nxt, assume_unique=True)
                ]
            if len(cand) == 0:
                continue
            docs = cand >> _POS_BITS
            uniq, first_idx, counts = np.unique(
                docs, return_index=True, return_counts=True
            )
            first_pos = (cand[first_idx] & ((1 << _POS_BITS) - 1))
            frames.append(
                pd.DataFrame(
                    {
                        "phrase": np.repeat(p, len(uniq)),
                        "doc_id": uniq.astype(np.int64),
                        "n_occurrences": counts.astype(np.int64),
                        "first_pos": first_pos.astype(np.int64),
                    }
                )
            )
            out_p.append(p)
        if not frames:
            return empty.copy()
        return pd.concat(frames, ignore_index=True)

    refs = bucketed_group_map_refs(
        positional_postings(ds, terms=vocab, text_col=text_col, id_col=id_col),
        bucket_on="doc_id",
        fn=match_bucket,
        n_buckets=n_buckets,
    )
    out = gather_refs_pd(refs) if refs is not None else empty.copy()
    if len(out) == 0:
        return empty.copy()
    return (
        out.astype(
            {"doc_id": "int64", "n_occurrences": "int64", "first_pos": "int64"}
        )
        .sort_values(["phrase", "doc_id"])
        .reset_index(drop=True)
    )
