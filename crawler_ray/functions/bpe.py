"""Distributed BPE vocabulary training + subword encoding.

Byte-pair encoding for subword vocabularies is the public algorithm of
Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare Words
with Subword Units"); GPT-2-family tokenizers train the same way. Every
LLM data pipeline ends at a tokenizer, so the engine ships the training
step, not just a token counter.

The scale fact the physical plan leans on: **BPE trains on the
word-frequency table, not the raw corpus.** The corpus-scale stage is the
distributed word count — one per-batch ``np.unique`` combiner pass (rows ∝
distinct words per batch) plus one bucketed exchange summing partials —
after which the (word, freq) table is vocab-scale (Heaps' law: orders of
magnitude smaller than the corpus) and the merge-learning loop runs on the
driver, exactly like k-means' k×d centroid state or PageRank's node
table. The learned merge list then broadcasts once (``ray.put``) for the
corpus-scale encode pass, a plain ``map_batches`` with a per-worker word
cache (Zipf: almost every token is a cache hit).

Deterministic spec (restated by the independent pytest reference):

* words: space-split, empties dropped (same tokenizer as the unigram-LM
  and window-dedup operators);
* symbol init per word: its characters, with ``</w>`` appended to the
  final character (the original paper's end-of-word marker);
* each merge step picks the adjacent symbol pair with the largest total
  frequency over the weighted vocab, ties broken by lexicographically
  smallest pair; training stops early if no pair occurs at all;
* encoding applies merges in learned order (rank order) until no learned
  pair remains in the word.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def word_freqs(ds, text_col: str = "text") -> pd.DataFrame:
    """Distributed exact word-frequency table: per-batch combiner (one row
    per distinct word per batch) → bucketed exchange summing partials.
    Returns a vocab-scale (word, freq) DataFrame."""
    from ..stages.shuffle import bucketed_group_agg

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(
                pc.fill_null(t[text_col], "").combine_chunks(), pattern=" "
            )
        )
        w = words.to_numpy(zero_copy_only=False)
        w = w[w != ""]
        items, counts = np.unique(w, return_counts=True)
        return pa.table(
            {"word": pa.array(items), "freq": pa.array(counts, pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(parts, ["word"], {"freq": ("freq", "sum")})


def bpe_train(freqs: pd.DataFrame, n_merges: int = 50) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table. Runs on
    the vocab-scale table (see module docstring); pure deterministic
    Python/Counter work."""
    from collections import Counter

    vocab: dict[tuple[str, ...], int] = {}
    for word, f in zip(freqs["word"], freqs["freq"]):
        syms = tuple(word[:-1]) + (word[-1] + "</w>",)
        vocab[syms] = vocab.get(syms, 0) + int(f)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> int:
    """Subword count for one word under the learned merges (lowest-rank
    pair first, the standard BPE encode order)."""
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_encode_counts(
    ds, merges: list[tuple[str, str]], text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Corpus-scale encode pass: broadcast the merge ranks once, count the
    learned-subword tokens per document. Per-worker word cache — Zipf
    makes almost every word a repeat, so the per-word Python encode runs
    ~once per DISTINCT word per worker, not once per token. Returns
    ``(doc_id, n_words, n_subwords)`` sorted by id."""
    import ray

    ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    class Encoder:
        def __init__(self) -> None:
            self.rank = ray.get(ref)
            self.cache: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            lists = pc.split_pattern(
                pc.fill_null(t[text_col], "").combine_chunks(), pattern=" "
            )
            flat = lists.values.to_numpy(zero_copy_only=False)
            keep = flat != ""
            flat = flat[keep]
            # encode each DISTINCT word once per batch, gather per token
            uniq, inv = np.unique(flat, return_inverse=True)
            per_word = np.array(
                [
                    self.cache.get(w)
                    if w in self.cache
                    else self.cache.setdefault(w, _encode_word(w, self.rank))
                    for w in uniq
                ],
                dtype=np.int64,
            )
            tok = per_word[inv]
            # segment-sum back to documents
            parent = pc.list_parent_indices(lists).to_numpy()[keep]
            n = t.num_rows
            subwords = np.bincount(parent, weights=tok, minlength=n).astype(
                np.int64
            )
            words = np.bincount(parent, minlength=n).astype(np.int64)
            return pa.table(
                {
                    id_col: t[id_col].cast(pa.int64()),
                    "n_words": pa.array(words),
                    "n_subwords": pa.array(subwords),
                }
            )

    out = ds.map_batches(
        Encoder, batch_format="pyarrow", concurrency=(2, 8)
    ).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


def bpe_subword_counts(
    ds, n_merges: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[pd.DataFrame, list[tuple[str, str]]]:
    """End-to-end: distributed word count → driver merge learning →
    broadcast encode. The input is pinned once so the count and encode
    passes share one scan. Returns (per-doc counts, learned merges)."""
    ds = ds.materialize()
    merges = bpe_train(word_freqs(ds, text_col), n_merges=n_merges)
    return bpe_encode_counts(ds, merges, text_col, id_col), merges
