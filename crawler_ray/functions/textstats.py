"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized batch transforms over a ``text`` column
(documents table / crawl text output), designed for ``map_batches``:
stateless ones are plain functions (elastic tasks); the language-ID model
is a callable class (actor pool) because it builds its n-gram profile
tables once per actor.

Scale notes: every function is per-row independent — no shuffle, no state,
linear scaling with blocks. Regexes are compiled at module import (once per
worker process); pandas/pyarrow kernels do the per-batch work.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs — the common
# GPT-2-style pre-split shape (public pattern family), ASCII-safe.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")
_WS_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)


def token_counts(batch: pa.Table) -> pa.Table:
    """Whitespace tokens + BPE-ish subword-piece counts per document."""
    texts = batch["text"].to_pandas().fillna("")
    ws = texts.map(lambda t: len(_WS_RE.findall(t)))
    bpe = texts.map(lambda t: len(_BPE_RE.findall(t)))
    return batch.append_column(
        "ws_tokens", pa.array(ws.to_numpy(), pa.int64())
    ).append_column("bpe_tokens", pa.array(bpe.to_numpy(), pa.int64()))


def quality_scores(batch: pa.Table) -> pa.Table:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length — the standard cheap pre-filters for web text
    (C4/Gopher-style rule families)."""
    texts = batch["text"].to_pandas().fillna("")
    n_chars = texts.str.len().to_numpy(dtype=np.int64)
    n_punct = texts.map(lambda t: len(_PUNCT_RE.findall(t))).to_numpy(np.int64)
    words = texts.map(lambda t: t.lower().split())
    n_words = words.map(len).to_numpy(np.int64)
    n_stop = words.map(lambda ws: sum(w in _STOPWORDS for w in ws)).to_numpy(
        np.int64
    )
    mean_wl = np.where(
        n_words > 0,
        words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0),
        0.0,
    ).astype(np.float64)
    safe_chars = np.maximum(n_chars, 1)
    safe_words = np.maximum(n_words, 1)
    out = batch
    out = out.append_column("n_chars_txt", pa.array(n_chars))
    out = out.append_column("n_words", pa.array(n_words))
    out = out.append_column(
        "punct_ratio", pa.array(n_punct / safe_chars, pa.float64())
    )
    out = out.append_column(
        "stopword_ratio", pa.array(n_stop / safe_words, pa.float64())
    )
    out = out.append_column("mean_word_len", pa.array(mean_wl, pa.float64()))
    return out


def normalize_text(batch: pa.Table, col: str = "text") -> pa.Table:
    """Canonical text form for dedup/training: lowercase, collapse
    whitespace runs to single spaces, strip ends. Pure Arrow kernels
    (utf8_lower / replace_substring_regex / utf8_trim_whitespace) — no
    Python per row; per-row local, no shuffle."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(pc.coalesce(batch[col], "")), r"\s+", " "
        )
    )
    return batch.append_column("norm_text", norm)


#: PII-ish scrubbing patterns (curation-stage redaction). RE2 syntax —
#: pyarrow.compute and DuckDB both run RE2, so the same patterns behave
#: identically in the engine and in SQL (tested in test_functions.py).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\d{8,}", "<NUM>"),
)


def redact_pii(batch: pa.Table, col: str = "text") -> pa.Table:
    """Replace emails, URLs and long digit runs with placeholder tokens —
    chained Arrow regex kernels, no per-row Python; per-row local, no
    shuffle."""
    out = pc.coalesce(batch[col], "")
    for pat, repl in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pat, replacement=repl)
    return batch.append_column("red_text", out)


#: docs per internal slice of repetition_scores. Each doc is independent,
#: so the math is slice-invariant; what the bound buys is TEMP SIZE: the
#: exploded line/bigram frames of a fat batch allocate multi-MB numpy
#: temporaries that glibc mmaps fresh per call, and on this rig (and any
#: memory-tight worker) fresh first-touch pages are the dominant cost —
#: measured 13 ms/doc at 2000-doc calls vs 0.39 ms/doc at 256 (33x), same
#: kernels. Bounded slices keep every temp inside the recycled warm arena.
_REPETITION_SLICE = 256


def repetition_scores(batch: pa.Table) -> pa.Table:
    """Repetition-based quality signals (Gopher-style rule family):
    ``dup_line_char_ratio`` — fraction of characters in lines that occur
    more than once in the doc; ``top_bigram_ratio`` — occurrences of the
    most frequent word bigram over all bigrams. Both per-row local (no
    shuffle) and computed with vectorized pandas explode/groupby kernels —
    no per-line or per-bigram Python. Fat batches are processed in
    bounded sub-slices (see _REPETITION_SLICE)."""
    if batch.num_rows > _REPETITION_SLICE:
        dups, tops = [], []
        for off in range(0, batch.num_rows, _REPETITION_SLICE):
            part = repetition_scores(
                batch.slice(off, _REPETITION_SLICE).select(["text"])
            )
            dups.append(part["dup_line_char_ratio"])
            tops.append(part["top_bigram_ratio"])
        return batch.append_column(
            "dup_line_char_ratio", pa.concat_arrays(
                [c.combine_chunks() for c in dups]
            )
        ).append_column(
            "top_bigram_ratio", pa.concat_arrays(
                [c.combine_chunks() for c in tops]
            )
        )
    texts = batch["text"].to_pandas().fillna("")
    n = len(texts)
    dup_ratio = np.zeros(n, dtype=np.float64)
    top_ratio = np.zeros(n, dtype=np.float64)

    if n:
        # Strings are interned ONCE (pd.factorize, a single C hash-table
        # pass); everything after is integer kernels. The earlier form ran
        # pandas groupbys on (doc, line)/(doc, bigram) STRING keys over the
        # exploded frames — rebuilding string hashes per group operation —
        # and measured 7 ms/page at 6 KB docs, 14x this version. Same
        # math to the bit (the DuckDB oracle checks it).
        lines = texts.str.split("\n").explode()
        doc = lines.index.to_numpy().astype(np.int64)
        codes, _uniq = pd.factorize(lines.to_numpy())
        chars = lines.str.len().to_numpy(dtype=np.int64)
        # count rows per (doc, line): lexsort + run-length over the pairs
        order = np.lexsort((codes, doc))
        d_s, c_s, ch_s = doc[order], codes[order], chars[order]
        new_run = np.empty(len(d_s), dtype=bool)
        new_run[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=new_run[1:])
        np.logical_or(new_run[1:], c_s[1:] != c_s[:-1], out=new_run[1:])
        run_id = np.cumsum(new_run) - 1
        run_sizes = np.bincount(run_id)
        dup_row = run_sizes[run_id] > 1  # row's line occurs >1x in its doc
        tot_per_doc = np.bincount(d_s, weights=ch_s, minlength=n)
        dup_per_doc = np.bincount(
            d_s, weights=ch_s * dup_row, minlength=n
        )
        dup_ratio = dup_per_doc / np.maximum(tot_per_doc, 1)

        words = texts.str.split().explode().dropna()
        if len(words):
            wdoc = words.index.to_numpy().astype(np.int64)
            wcodes, _wuniq = pd.factorize(words.to_numpy())
            # bigram = adjacent pair within the same doc
            same = wdoc[1:] == wdoc[:-1]
            if same.any():
                bd = wdoc[:-1][same]
                b1 = wcodes[:-1][same]
                b2 = wcodes[1:][same]
                order2 = np.lexsort((b2, b1, bd))
                bd_s, b1_s, b2_s = bd[order2], b1[order2], b2[order2]
                nr = np.empty(len(bd_s), dtype=bool)
                nr[0] = True
                nr[1:] = (
                    (bd_s[1:] != bd_s[:-1])
                    | (b1_s[1:] != b1_s[:-1])
                    | (b2_s[1:] != b2_s[:-1])
                )
                rid = np.cumsum(nr) - 1
                rsz = np.bincount(rid)
                run_doc = bd_s[nr]  # one doc id per run
                mx = np.zeros(n, dtype=np.int64)
                np.maximum.at(mx, run_doc, rsz)
                tot2 = np.bincount(bd_s, minlength=n)
                top_ratio = mx / np.maximum(tot2, 1)

    return batch.append_column(
        "dup_line_char_ratio", pa.array(dup_ratio, pa.float64())
    ).append_column("top_bigram_ratio", pa.array(top_ratio, pa.float64()))


def fingerprints(batch: pa.Table, window: int = 8) -> pa.Table:
    """Deterministic document fingerprint: 64-bit polynomial hash of the
    whole text plus a winnowed min-hash over ``window``-gram rolling hashes
    (Karp-Rabin / winnowing family) — stable content identity that survives
    re-chunking. Arithmetic is over Z/2^64 (wrapping uint64, the
    numpy-native modulus), so each doc is ONE vectorized multiply-sum
    against a batch-shared power table — no per-byte Python."""
    texts = batch["text"].to_pylist()
    BASE = np.uint64(257)
    datas = [
        np.frombuffer((t or "").encode("utf-8", "replace"), dtype=np.uint8)
        for t in texts
    ]
    max_len = max((len(d) for d in datas), default=0)
    full = np.zeros(len(texts), dtype=np.uint64)
    winnow = np.zeros(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        pows = np.ones(max(max_len, 1), dtype=np.uint64)  # pows[k] = BASE^k
        if max_len > 1:
            pows[1:] = BASE
            np.cumprod(pows, out=pows)
        for i, data in enumerate(datas):
            n = len(data)
            if n == 0:
                continue
            d = data.astype(np.uint64)
            full[i] = (d * pows[n - 1 :: -1]).sum(dtype=np.uint64)
            if n < window:
                winnow[i] = full[i]
                continue
            # window-gram hashes in bounded slices: the (chunk × window)
            # uint64 temp stays ~64 MB even for multi-GB documents
            wpows = pows[window - 1 :: -1]
            n_win = n - window + 1
            chunk = 1 << 20
            best = np.uint64(0xFFFFFFFFFFFFFFFF)
            for s in range(0, n_win, chunk):
                e = min(s + chunk, n_win)
                wins = np.lib.stride_tricks.sliding_window_view(
                    data[s : e + window - 1], window
                ).astype(np.uint64)
                m = (wins * wpows).sum(axis=1, dtype=np.uint64).min()
                if m < best:
                    best = m
            winnow[i] = best
    return batch.append_column(
        "fingerprint", pa.array(full, pa.uint64())
    ).append_column("min_gram_hash", pa.array(winnow, pa.uint64()))


class LangId:
    """Character-n-gram language identifier (Cavnar & Trenkle-style rank
    profiles over a tiny built-in seed corpus). Actor-pool stage: profiles
    built once per actor in __init__, batches scored vectorized-ish in
    __call__. A deterministic heuristic, not a trained model — the point is
    the Ray plumbing shape (stateful setup amortized across batches)."""

    SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and then it runs "
        "away with this that have from they will would there what when",
        "de": "der die das und ist nicht ich sie wir ihr ein eine zu von mit "
        "auf für über aber auch nach bei durch wenn dann haben werden",
        "fr": "le la les et est ne pas je vous nous ils une des du au aux "
        "avec pour sur dans par mais aussi être avoir fait comme plus",
    }

    def __init__(self, n: int = 3, top: int = 300) -> None:
        self.n = n
        self.profiles = {
            lang: self._profile(text, top) for lang, text in self.SEEDS.items()
        }

    def _grams(self, text: str):
        text = f" {text.lower()} "
        return (text[i : i + self.n] for i in range(max(0, len(text) - self.n + 1)))

    def _profile(self, text: str, top: int) -> dict[str, int]:
        from collections import Counter

        common = Counter(self._grams(text)).most_common(top)
        return {g: rank for rank, (g, _) in enumerate(common)}

    def _top_grams(self, text: str) -> "list[str]":
        """The doc's 300 most frequent n-grams in ``Counter.most_common``
        order (count desc, first occurrence asc for ties) — computed with
        numpy window/unique kernels instead of a Python Counter over every
        gram (measured 3x per-doc cost at web-page sizes). UTF-32 makes
        code-point windows == Python string slices, so the grams are
        bit-identical to the generator form."""
        s = f" {(text or '').lower()} "
        cps = np.frombuffer(
            s.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
        )
        n_win = len(cps) - self.n + 1
        if n_win <= 0:
            return []
        win = np.lib.stride_tricks.sliding_window_view(cps, self.n)
        v = np.ascontiguousarray(win).view(
            np.dtype((np.void, self.n * 4))
        ).ravel()
        _, first_idx, counts = np.unique(
            v, return_index=True, return_counts=True
        )
        order = np.lexsort((first_idx, -counts))[:300]
        return [s[j : j + self.n] for j in first_idx[order]]

    def _score_one(self, text: str) -> str:
        grams = self._top_grams(text)
        best_lang, best_dist = "und", float("inf")
        for lang, prof in self.profiles.items():
            out_of_place = sum(
                abs(prof.get(g, len(prof)) - rank)
                for rank, g in enumerate(grams)
            )
            if out_of_place < best_dist:
                best_dist, best_lang = out_of_place, lang
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self._score_one(t) for t in batch["text"].to_pylist()]
        return batch.append_column("pred_lang", pa.array(langs, pa.string()))


_LANGID: "LangId | None" = None


def lang_id_block(batch: pa.Table) -> pa.Table:
    """Task form of the LangId stage with a per-worker cached instance: the
    profile build is a few hundred tiny dict entries, so an actor pool buys
    nothing over worker-process caching and pays spin-up per call (same
    finding as the MinHash/SimHash signature stages)."""
    global _LANGID
    if _LANGID is None:
        _LANGID = LangId()
    return _LANGID(batch)


def corpus_top_ngrams(
    ds,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
    n_buckets: int = 16,
):
    """Corpus-wide top-``k`` word ``n``-grams by total occurrence count —
    the vocabulary/phrase-mining aggregate, and the canonical
    pre-aggregate-before-shuffle shape:

      map_batches COMBINER (per-batch gram→count dict; emits one row per
      DISTINCT gram per batch, so exchange volume ∝ vocabulary, not corpus)
      → bucketed exchange on gram, summing partials
      → per-bucket top-k (each gram lives wholly in one bucket, so the
        global top-k is contained in the union of per-bucket top-k's)
      → driver merges n_buckets·k rows.

    Ordering is deterministic: count desc, gram asc. Tokenization matches
    the decontamination/SQL convention (lowercase, split on non-[a-z0-9]).
    """
    import pandas as pd

    from ..stages.shuffle import bucketed_group_map
    from .dedup import _decon_tokens

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch[text_col].to_pylist():
            w = _decon_tokens(text)
            for i in range(len(w) - n + 1):
                g = " ".join(w[i : i + n])
                counts[g] = counts.get(g, 0) + 1
        return pa.table(
            {
                "gram": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("gram", sort=False)["cnt"].sum().reset_index()
        return g.sort_values(
            ["cnt", "gram"], ascending=[False, True]
        ).head(k)

    parts = bucketed_group_map(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        bucket_on="gram",
        fn=bucket_topk,
        n_buckets=n_buckets,
    ).to_pandas()  # n_buckets * k rows — driver-safe by construction
    return (
        parts.sort_values(["cnt", "gram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
        .astype({"cnt": "int64"})
    )


def _explode_tokens(col) -> "tuple[np.ndarray, np.ndarray, int]":
    """Whitespace-token explode shared by the unigram-LM / DSIR / BM25
    passes: ``(vals, doc_idx, n_docs)`` with empty tokens dropped — ONE
    tokenizer convention (space split), so the passes and their DuckDB
    oracles (``string_split(text, ' ')`` + empty filter) cannot drift
    apart site by site."""
    if pa.types.is_null(col.type):  # an all-null block types as null, not string
        col = pa.chunked_array([pa.nulls(len(col), pa.string())])
    toks = pc.split_pattern(
        pc.fill_null(col, "").combine_chunks(), pattern=" "
    )
    vals = toks.values.to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    mask = vals != ""
    return vals[mask], doc_idx[mask], len(lens)


class _UnigramScorer:
    """Actor-pool scorer for ``unigram_logprob`` pass 2: the (word →
    log10 p) table is fetched from the object store ONCE per actor in
    ``__init__`` (sorted word array + aligned logprob array, so per-batch
    lookup is one vectorized ``np.searchsorted``), then every batch is
    scored with numpy segment math — no per-token Python."""

    def __init__(
        self, vocab_ref, text_col: str, id_col: str, oov_logp=None
    ) -> None:
        import ray

        words, logp = ray.get(vocab_ref)
        self.words = words  # np.ndarray[str], sorted
        self.logp = logp  # np.ndarray[float64], aligned
        self.text_col = text_col
        self.id_col = id_col
        #: None = uncapped mode, every token MUST be in vocab (hard error);
        #: a float = capped mode, absent tokens score this OOV floor
        self.oov_logp = oov_logp

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals, doc_idx, n_rows = _explode_tokens(batch[self.text_col])
        idx = np.searchsorted(self.words, vals)
        idx_c = np.minimum(idx, max(len(self.words) - 1, 0))
        hit = (
            self.words[idx_c] == vals
            if len(self.words)
            else np.zeros(len(vals), bool)
        )
        if self.oov_logp is None:
            # uncapped: every token exists in the vocab by construction
            # (the input is materialized, so pass 2 scores exactly the rows
            # pass 1 counted) — verify rather than trust: a silent neighbor
            # lookup would corrupt scores, so an absent token is a hard error
            if not hit.all():
                missing = vals[~hit][:3]
                raise ValueError(f"tokens absent from vocab: {missing!r}")
            lp = self.logp[idx_c]
        else:
            # capped (CCNet top-V) mode: tokens outside the kept vocabulary
            # score the precomputed OOV floor (np.where evaluates its arms
            # eagerly, so an empty kept vocab needs the explicit branch)
            if len(self.words) == 0:
                lp = np.full(len(vals), self.oov_logp, np.float64)
            else:
                lp = np.where(hit, self.logp[idx_c], self.oov_logp)
        n_tok = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        sums = np.bincount(doc_idx, weights=lp, minlength=n_rows)
        keep = n_tok > 0  # empty docs have no defined mean (SQL inner join)
        mean = sums[keep] / n_tok[keep]
        # 6-dp half-away-from-zero, matching DuckDB round(x, 6) on the
        # negative log values (cf. the positive-value floor(x*1e6+0.5)
        # convention used elsewhere in this repo)
        mean = np.sign(mean) * np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "logprob_mean": pa.array(mean, pa.float64()),
            }
        )


def unigram_logprob(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    concurrency=(2, 16),
    top_v: "int | None" = None,
):
    """Corpus-unigram language-model score per document — the CCNet-style
    LM-quality proxy: mean log10 unigram probability of the document's
    tokens, with probabilities estimated from THIS corpus.

    Two linear passes; nothing corpus-sized ever sits on the driver:

      pass 1 (vocab): per-batch token-count COMBINER (one row per distinct
        word per batch, so exchange volume ∝ vocabulary, not corpus) →
        bucketed task exchange summing partials → exact global
        (word, count) table; the corpus token total is its sum.
      pass 2 (score): the vocab broadcasts once (``ray.put`` of a sorted
        word array + log-prob array) into a stateful ``map_batches`` actor
        pool; each batch scores with one ``np.searchsorted`` + two
        ``np.bincount`` segment reductions, averaging in document order.

    Scale: ``top_v`` is the CCNet vocabulary cap for the 10^10-doc design
    point, where an unbounded broadcast vocab would outgrow ``ray.put``:
    only the top-V words by ``(count desc, word asc)`` ship to the
    scorers, and every other token scores the deterministic OOV floor
    ``log10(dropped_token_mass / total) - log10(n_dropped_words)`` (the
    average per-word probability of the dropped tail — so the floor is
    derived from the corpus, not tuned). ``top_v=None`` (default, the
    oracle path) uses the exact full vocabulary, where the DuckDB oracle
    (same tokenizer: space-split, empties dropped) matches bit-for-bit
    after 6-dp rounding; a cap ≥ the true vocabulary size is exactly
    equivalent to uncapped (pytest-pinned).

    Returns a pandas DataFrame ``(doc_id, n_tokens, logprob_mean)`` sorted
    by id; documents with zero tokens are excluded (matching the SQL
    oracle's inner join through the token list).
    """
    import ray

    from ..stages.shuffle import bucketed_group_map

    # pin the blocks once: pass 2 must score EXACTLY the rows pass 1
    # counted (vocab totality), and both passes reuse the same scan
    ds = ds.materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(
                pc.fill_null(t[text_col], "").combine_chunks(), pattern=" "
            )
        )
        w = words.to_numpy(zero_copy_only=False)
        w = w[w != ""]
        items, counts = np.unique(w, return_counts=True)
        return pa.table(
            {
                "word": pa.array(items, pa.string()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    def sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=False)["cnt"].sum().reset_index()

    vocab = bucketed_group_map(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        bucket_on="word",
        fn=sum_bucket,
        n_buckets=n_buckets,
    ).to_pandas()  # vocabulary-sized (see scale note)
    vocab = vocab.sort_values("word").reset_index(drop=True)
    total = float(vocab["cnt"].sum())
    oov_logp = None
    if top_v is not None and top_v < len(vocab):
        keep = vocab.sort_values(
            ["cnt", "word"], ascending=[False, True]
        ).head(top_v)
        dropped_mass = total - float(keep["cnt"].sum())
        n_dropped = len(vocab) - len(keep)
        oov_logp = float(
            np.log10(dropped_mass / total) - np.log10(n_dropped)
        )
        vocab = keep.sort_values("word").reset_index(drop=True)
    words = vocab["word"].to_numpy()
    logp = np.log10(vocab["cnt"].to_numpy(np.float64) / total)
    ref = ray.put((words, logp))

    out = ds.map_batches(
        _UnigramScorer,
        fn_constructor_args=(ref, text_col, id_col, oov_logp),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


def _batch_bigrams(
    col, doc_idx_offset: int = 0
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, int]":
    """Adjacent-token bigrams per document from a text column: returns
    ``(w1, w2, doc_idx, n_docs)``. Tokens are the shared space-split
    convention (``_explode_tokens``), so a bigram never straddles a
    document boundary and neither word can contain a space — which makes
    ``w1 + ' ' + w2`` a collision-free composite key for the exchange."""
    vals, doc_idx, n_rows = _explode_tokens(col)
    if len(vals) < 2:
        e = np.empty(0, dtype=vals.dtype if len(vals) else object)
        return e, e, np.empty(0, np.int64), n_rows
    same = doc_idx[1:] == doc_idx[:-1]
    return (
        vals[:-1][same],
        vals[1:][same],
        doc_idx[1:][same] + doc_idx_offset,
        n_rows,
    )


class _KNBigramScorer:
    """Actor-pool scorer for ``kn_bigram_logprob`` pass 2. The broadcast
    model is fetched once per actor: a sorted composite-key array
    (``w1 + ' ' + w2``) with an aligned per-bigram log10 KN probability,
    plus (capped mode only) sorted per-history and per-continuation
    arrays for the backoff path. Per-batch work is one vectorized key
    build + ``np.searchsorted`` + two ``np.bincount`` segment sums."""

    def __init__(self, model_ref, text_col: str, id_col: str) -> None:
        import ray

        (
            self.keys,  # sorted np.ndarray[str] "w1 w2"
            self.logp,  # aligned log10 P_KN, float64
            self.backoff,  # None (uncapped) or (h_words, h_logw, c_words, c_logp)
        ) = ray.get(model_ref)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        w1, w2, doc_idx, n_rows = _batch_bigrams(batch[self.text_col])
        if len(w1):
            keys = np.char.add(np.char.add(w1.astype(str), " "), w2.astype(str))
        else:
            keys = np.empty(0, dtype="U1")
        idx = np.searchsorted(self.keys, keys)
        idx_c = np.minimum(idx, max(len(self.keys) - 1, 0))
        hit = (
            self.keys[idx_c] == keys
            if len(self.keys)
            else np.zeros(len(keys), bool)
        )
        if self.backoff is None:
            # uncapped: the input is materialized, so pass 2 scores exactly
            # the bigrams pass 1 counted — an absent key is a hard error
            # (a silent neighbor lookup would corrupt scores)
            if not hit.all():
                raise ValueError(
                    f"bigrams absent from model: {keys[~hit][:3]!r}"
                )
            lp = self.logp[idx_c] if len(self.keys) else np.empty(0)
        else:
            # capped (top-B) mode: a dropped bigram backs off to the
            # lower order — log10(backoff_weight(w1)) + log10(P_cont(w2)).
            # Histories/continuations are complete (built before the cap,
            # vocabulary-sized), so both lookups always hit when scoring
            # the counted corpus.
            h_words, h_logw, c_words, c_logp = self.backoff
            hi = np.searchsorted(h_words, w1.astype(str) if len(w1) else w1)
            ci = np.searchsorted(c_words, w2.astype(str) if len(w2) else w2)
            lp_bo = (
                h_logw[np.minimum(hi, max(len(h_words) - 1, 0))]
                + c_logp[np.minimum(ci, max(len(c_words) - 1, 0))]
                if len(h_words)
                else np.empty(0)
            )
            lp = np.where(hit, self.logp[idx_c] if len(self.keys) else 0.0, lp_bo)
        n_bg = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        sums = np.bincount(doc_idx, weights=lp, minlength=n_rows)
        keep = n_bg > 0  # docs with <2 tokens have no bigram (SQL group absent)
        mean = sums[keep] / n_bg[keep]
        mean = np.sign(mean) * np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(n_bg[keep], pa.int64()),
                "kn_logprob_mean": pa.array(mean, pa.float64()),
            }
        )


def kn_bigram_logprob(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    concurrency=(2, 16),
    top_b: "int | None" = None,
    discount: float = 0.75,
):
    """Interpolated Kneser-Ney bigram LM score per document — the
    KenLM-family step up from ``unigram_logprob`` (CCNet filters on a
    KN-smoothed n-gram LM; this is the order-2 member trained on THIS
    corpus, public formulation per Kneser & Ney 1995 / Chen & Goodman
    1998):

        P_KN(w2 | w1) = (c(w1,w2) - D) / c(w1·)
                        + D · N1+(w1,·) / c(w1·) · P_cont(w2)
        P_cont(w2)    = N1+(·,w2) / N1+(·,·)

    with D = ``discount`` (0.75), histories counted from the bigram table
    itself (c(w1·) = Σ_w2 c(w1,w2)), so the model normalizes exactly.

    Dataflow (mirrors ``unigram_logprob``; nothing corpus-sized on the
    driver):

      pass 1: per-batch bigram-count COMBINER (adjacent space-split
        tokens within each document; exchange volume ∝ distinct bigrams
        per batch) → bucketed task exchange on the composite key →
        exact global (w1, w2, count) table.
      model: history table (c(w1·), N1+(w1,·)) and continuation table
        (N1+(·,w2)) are single groupbys of the bigram-vocabulary-sized
        count table; per-bigram log10 P_KN is evaluated once here with
        the SAME floating-point expression order as the DuckDB oracle.
      pass 2: broadcast (sorted key array + log-prob array) into a
        stateful ``map_batches`` actor pool; per-batch searchsorted +
        bincount segment means, 6-dp half-away-from-zero.

    Scale: the bigram vocabulary grows faster than the unigram one, so
    ``top_b`` is the design-point cap: only the top-B bigrams by
    ``(count desc, key asc)`` ship to the scorers, and a dropped bigram
    backs off to the standard lower-order term
    ``D·N1+(w1,·)/c(w1·) · P_cont(w2)`` (histories/continuations are
    vocabulary-sized and always ship whole). ``top_b=None`` (default,
    the oracle path) is exact: the DuckDB oracle (same tokenizer, same
    expression order) matches bit-for-bit after 6-dp rounding; a cap
    ≥ the true bigram-vocabulary size equals uncapped (pytest-pinned).

    Returns a pandas DataFrame ``(doc_id, n_bigrams, kn_logprob_mean)``
    sorted by id; documents with fewer than two tokens are excluded
    (they have no bigram — matching the SQL oracle's inner join).
    """
    import ray

    from ..stages.shuffle import bucketed_group_map

    ds = ds.materialize()  # pass 2 must score exactly what pass 1 counted

    def partial_counts(t: pa.Table) -> pa.Table:
        w1, w2, _, _ = _batch_bigrams(t[text_col])
        if len(w1):
            keys = np.char.add(np.char.add(w1.astype(str), " "), w2.astype(str))
            items, counts = np.unique(keys, return_counts=True)
        else:
            items = np.empty(0, dtype="U1")
            counts = np.empty(0, np.int64)
        return pa.table(
            {
                "bigram": pa.array(items, pa.string()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    def sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bigram", sort=False)["cnt"].sum().reset_index()

    bc = bucketed_group_map(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        bucket_on="bigram",
        fn=sum_bucket,
        n_buckets=n_buckets,
    ).to_pandas()  # bigram-vocabulary-sized (see scale note)
    empty = pd.DataFrame(
        {
            id_col: pd.Series([], dtype="int64"),
            "n_bigrams": pd.Series([], dtype="int64"),
            "kn_logprob_mean": pd.Series([], dtype="float64"),
        }
    )
    if len(bc) == 0:
        return empty
    # split the composite key back into (w1, w2): tokens cannot contain a
    # space, so the first space is the unambiguous separator
    parts = bc["bigram"].str.split(" ", n=1, expand=True)
    bc = pd.DataFrame(
        {"w1": parts[0], "w2": parts[1], "cnt": bc["cnt"].to_numpy(np.int64)}
    )
    h = bc.groupby("w1", sort=True).agg(
        ch=("cnt", "sum"), n1p_l=("cnt", "size")
    )
    r = bc.groupby("w2", sort=True).agg(n1p_r=("cnt", "size"))
    nb = float(len(bc))
    D = float(discount)
    # per-bigram probability, SAME expression order as the SQL oracle:
    #   (c - D)/ch + D*n1p_l/ch * (n1p_r/nb)   [all left-associative]
    c = bc["cnt"].to_numpy(np.float64)
    ch = h["ch"].to_numpy(np.float64)[h.index.get_indexer(bc["w1"])]
    n1p_l = h["n1p_l"].to_numpy(np.float64)[h.index.get_indexer(bc["w1"])]
    pcont = (
        r["n1p_r"].to_numpy(np.float64)[r.index.get_indexer(bc["w2"])] / nb
    )
    prob = (c - D) / ch + D * n1p_l / ch * pcont
    # U-dtype throughout so the scorer's np.char-built keys compare against
    # the same dtype (code-point order either way, but keep it uniform)
    keys = (bc["w1"] + " " + bc["w2"]).to_numpy().astype(str)
    order = np.argsort(keys, kind="stable")  # searchsorted needs sorted keys
    keys, logp, cnt_sorted = keys[order], np.log10(prob)[order], c[order]
    backoff = None
    if top_b is not None and top_b < len(keys):
        # keep top-B by (count desc, key asc); full histories/continuations
        # ship regardless — they are vocabulary-sized, not bigram-sized
        sel = np.lexsort((keys, -cnt_sorted))[:top_b]
        sel.sort()
        keys, logp = keys[sel], logp[sel]
        h_words = h.index.to_numpy().astype(str)
        h_logw = np.log10(D * h["n1p_l"].to_numpy(np.float64) / h["ch"].to_numpy(np.float64))
        c_words = r.index.to_numpy().astype(str)
        c_logp = np.log10(r["n1p_r"].to_numpy(np.float64) / nb)
        backoff = (h_words, h_logw, c_words, c_logp)
    ref = ray.put((keys, logp, backoff))

    out = ds.map_batches(
        _KNBigramScorer,
        fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    if len(out) == 0:
        return empty
    return out.sort_values(id_col).reset_index(drop=True)


def dsir_sample(
    ds,
    target_lang: str = "en",
    frac: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 16,
    top_v: "int | None" = None,
) -> pd.DataFrame:
    """DSIR-style unigram importance resampling (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more likely its
    tokens are under a TARGET language model than under the SOURCE (whole
    corpus) model, then keep the highest-importance fraction — the
    data-selection step that tilts a raw crawl toward a target domain.
    The paper uses hashed n-gram features; this unigram form keeps the
    same estimator shape while staying bit-checkable against a SQL oracle
    (the repo's tokenizer convention: space-split, empties dropped).

    Deterministic spec:
      * target corpus = rows with ``lang_col == target_lang``; source =
        all rows;
      * p_X(w) = (cnt_X(w)+1) / (n_X + V), add-one smoothed over the
        SOURCE vocabulary (V = distinct source words, so every scored
        token is in-vocabulary by construction);
      * weight(doc) = mean over tokens of log10 p_T(w) − log10 p_S(w),
        rounded 6-dp half-away-from-zero; zero-token docs are excluded;
      * keep the top ``ceil(frac × n_scored)`` docs ordered by (rounded
        weight DESC, doc_id ASC) — ordering on the rounded grid keeps the
        cutoff reproducible against the oracle.

    Ray shape: ONE combiner pass emits per-batch (word, cnt, cnt_target)
    partials (volume ∝ vocabulary) → bucketed task exchange sums them →
    the vocabulary-sized log-ratio table broadcasts once → the scoring
    pass reuses ``_UnigramScorer``'s vectorized searchsorted/bincount
    math. ``top_v`` is the design-point vocabulary cap: only the top-V
    words by ``(combined count desc, word asc)`` broadcast, and all
    dropped words pool into ONE out-of-vocabulary type whose log-ratio is
    computed from the pooled tail counts under the same add-1 smoothing
    (the smoothing denominator becomes ``kept types + 1``) — so a cap ≥
    the true vocabulary size is exactly the uncapped computation
    (pytest-pinned, with a brute-force spec restatement for small caps).
    ``top_v=None`` (default) is the exact-vocab oracle path, bit-exact
    against DuckDB.

    Returns ``(doc_id, dsir_weight)`` for the kept docs, sorted by id."""
    import ray

    from ..stages.shuffle import bucketed_group_map_refs, gather_refs_pd

    ds = ds.materialize()  # the scoring pass must see exactly the counted rows

    def partial_counts(t: pa.Table) -> pa.Table:
        vals, doc_idx, _n = _explode_tokens(t[text_col])
        is_t = (
            pc.equal(pc.fill_null(t[lang_col], ""), target_lang)
            .to_numpy(zero_copy_only=False)
        )
        tok_t = is_t[doc_idx]
        items, inv = np.unique(vals, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(items)).astype(np.int64)
        cnt_t = np.bincount(
            inv, weights=tok_t.astype(np.float64), minlength=len(items)
        ).astype(np.int64)
        return pa.table(
            {
                "word": pa.array(items, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
                "cnt_t": pa.array(cnt_t, pa.int64()),
            }
        )

    def sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("word", sort=False)[["cnt", "cnt_t"]].sum().reset_index()
        )

    v_refs = bucketed_group_map_refs(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        bucket_on="word",
        fn=sum_bucket,
        n_buckets=n_buckets,
    )
    empty_out = pd.DataFrame(
        {
            id_col: pd.Series([], dtype="int64"),
            "dsir_weight": pd.Series([], dtype="float64"),
        }
    )
    if v_refs is None:
        return empty_out
    vocab = gather_refs_pd(v_refs).sort_values("word").reset_index(drop=True)
    n_s = float(vocab["cnt"].sum())
    n_t = float(vocab["cnt_t"].sum())
    oov_ratio = None
    if top_v is not None and top_v < len(vocab):
        order = vocab.sort_values(["cnt", "word"], ascending=[False, True])
        drop = order.iloc[top_v:]
        vocab = order.head(top_v).sort_values("word").reset_index(drop=True)
        V = float(len(vocab)) + 1.0  # kept types + the pooled OOV type
        oov_ratio = float(
            np.log10((float(drop["cnt_t"].sum()) + 1.0) / (n_t + V))
            - np.log10((float(drop["cnt"].sum()) + 1.0) / (n_s + V))
        )
    else:
        V = float(len(vocab))
    log_t = np.log10((vocab["cnt_t"].to_numpy(np.float64) + 1.0) / (n_t + V))
    log_s = np.log10((vocab["cnt"].to_numpy(np.float64) + 1.0) / (n_s + V))
    ref = ray.put((vocab["word"].to_numpy(), log_t - log_s))

    scored = (
        ds.map_batches(
            _UnigramScorer,
            fn_constructor_args=(ref, text_col, id_col, oov_ratio),
            batch_format="pyarrow",
            concurrency=(2, 8),
        )
        .to_pandas()
        .rename(columns={"logprob_mean": "dsir_weight"})
    )
    if len(scored) == 0:
        return empty_out
    m = int(np.ceil(frac * len(scored)))
    kept = scored.sort_values(
        ["dsir_weight", id_col], ascending=[False, True]
    ).head(m)
    return (
        kept[[id_col, "dsir_weight"]]
        .sort_values(id_col)
        .reset_index(drop=True)
    )


def perplexity_buckets(ds, text_col: str = "text", id_col: str = "doc_id"):
    """CCNet head/middle/tail perplexity bucketing: documents are split
    into terciles of the corpus-unigram LM score (``unigram_logprob``
    above — higher mean logprob = more in-distribution = ``head``), the
    bucketing CCNet uses to stratify Common Crawl by LM quality before
    sampling.

    Thresholds are the EXACT inverted-CDF terciles of the score
    distribution (``np.quantile(..., method="inverted_cdf")`` — element
    picking, no interpolation — byte-identical to DuckDB
    ``quantile_disc``), computed over the 6-dp-rounded scores so the SQL
    oracle sees the same grid. Ties land in the better bucket (``>=``),
    mirrored in the SQL CASE. At the 10^10 design point the thresholds
    come from the mergeable histogram sketch (functions/sketches.py) and
    assignment is the same broadcast-compare map; at test scale the exact
    terciles keep the oracle bit-exact.

    Returns ``(doc_id, n_tokens, logprob_mean, bucket)`` sorted by id;
    zero-token docs are excluded (inherited from unigram_logprob).
    """
    lp = unigram_logprob(ds, text_col=text_col, id_col=id_col)
    v = lp["logprob_mean"].to_numpy()
    t_lo = float(np.quantile(v, 1 / 3, method="inverted_cdf"))
    t_hi = float(np.quantile(v, 2 / 3, method="inverted_cdf"))
    lp["bucket"] = np.where(
        v >= t_hi, "head", np.where(v >= t_lo, "middle", "tail")
    )
    return lp


def bm25_topk(
    ds,
    query_terms: "tuple[str, ...]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Okapi BM25 document ranking for a bag of query terms (Robertson &
    Walker 1994; the classic retrieval scorer — complements the TF-IDF
    vectors in ``relational.doc_tfidf_topk`` with an actual query ranker).

    Deterministic spec (mirrored by the DuckDB oracle):
      idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)   [BM25+-style
                floor: always positive]
      score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1-b+b·dl/avgdl))
      keep docs with score > 0; top-k by (score desc, id asc); scores
      rounded 6-dp half-up.

    Ray shape: ONE combiner pass emits per-batch ``(n_docs, sum_dl,
    df_t...)`` partials — all integers, so the driver fold is EXACT and
    reduce-order-free; the (terms × idf, avgdl) broadcast is query-sized;
    the scoring pass computes per-doc tf via one searchsorted +
    2-d bincount and emits per-query-batch partial top-k. Nothing
    corpus-sized reaches the driver."""
    import ray

    terms = np.asarray(sorted(set(query_terms)))
    nt = len(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        vals, doc_idx, n_rows = _explode_tokens(t[text_col])
        dl = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        pos = np.searchsorted(terms, vals)
        posc = np.minimum(pos, nt - 1) if nt else np.zeros(0, np.int64)
        hit = terms[posc] == vals if nt else np.zeros(0, bool)
        # df partial: distinct docs containing each term in this batch
        df = np.zeros(nt, np.int64)
        if hit.any():
            pairs = np.unique(
                doc_idx[hit] * np.int64(nt) + posc[hit].astype(np.int64)
            )
            np.add.at(df, (pairs % nt).astype(np.int64), 1)
        return pa.table(
            {
                "n_docs": pa.array([n_rows], pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], pa.int64()),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n_docs"].sum())
    if n_docs == 0 or nt == 0:
        return pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
                "rank": pd.Series(dtype="int64"),
            }
        )
    sum_dl = int(parts["sum_dl"].sum())  # exact integer fold
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.float64)
    avgdl = sum_dl / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((terms, idf, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        terms_, idf_, avgdl_ = ray.get(ref)
        vals, doc_idx, n_rows = _explode_tokens(batch[text_col])
        dl = np.bincount(doc_idx, minlength=n_rows).astype(np.float64)
        pos = np.searchsorted(terms_, vals)
        posc = np.minimum(pos, len(terms_) - 1)
        hit = terms_[posc] == vals
        tf = np.zeros((n_rows, len(terms_)), np.float64)
        if hit.any():
            flat = doc_idx[hit] * len(terms_) + posc[hit]
            tf = np.bincount(
                flat, minlength=n_rows * len(terms_)
            ).reshape(n_rows, len(terms_)).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dl / avgdl_)[:, None])
        with np.errstate(invalid="ignore"):
            s = np.where(tf > 0, idf_[None, :] * tf * (k1 + 1.0) / denom, 0.0)
        sc = s.sum(axis=1)
        sc = np.floor(sc * 1e6 + 0.5) / 1e6  # scores are non-negative
        keep = sc > 0
        if not keep.any():
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        sc = sc[keep]
        order = np.lexsort((ids, -sc))[:k]  # per-batch partial top-k
        return pa.table(
            {
                id_col: pa.array(ids[order].astype(np.int64)),
                "score": pa.array(sc[order], pa.float64()),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
                "rank": pd.Series(dtype="int64"),
            }
        )
    out = (
        partials.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(len(out), dtype=np.int64)
    return out


#: Gopher quality-rule defaults (Rae et al. 2021, Appendix A1.1 — the
#: published web-text document filter every later pipeline cites).
GOPHER_REQUIRED_WORDS: "tuple[str, ...]" = (
    "the",
    "be",
    "to",
    "of",
    "and",
    "that",
    "have",
    "with",
)

#: line-start markers that count as bullets for the line rule
GOPHER_BULLET_PREFIXES: "tuple[str, ...]" = ("- ", "* ", "• ")


def gopher_quality(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    required_words: "tuple[str, ...]" = GOPHER_REQUIRED_WORDS,
    min_required_hits: int = 2,
) -> pa.Table:
    """Gopher quality rules for one batch (Rae et al. 2021 A1.1): a
    document is KEPT iff word count in [min_words, max_words], mean word
    length in [min_mean, max_mean], '#'/'...' symbol-to-word ratio under
    the cap, bullet-started and ellipsis-ended line fractions under their
    caps, >= min_alpha_word_ratio of words contain a letter, and at least
    ``min_required_hits`` DISTINCT ``required_words`` appear. Emits one
    row per doc with every signal plus ``kept`` — per-doc-local (no
    shuffle), all Arrow/numpy kernels (two-level explode + bincount)."""
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())
    # normalize CRLF / bare-CR line endings so the '\n' line split and
    # the word split see them, and '...\r\n' lines still count as
    # ellipsis-ended (real web text is routinely CRLF)
    texts = pc.replace_substring(texts, "\r\n", "\n")
    texts = pc.replace_substring(texts, "\r", "\n")
    n = len(texts)

    # --- word-level signals ------------------------------------------
    words = pc.split_pattern_regex(texts, r"[ \n]+")
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(words)
    ne = pc.not_equal(flat, "")
    ne_np = ne.to_numpy(zero_copy_only=False)
    fw = flat.filter(ne)
    fp = parent[ne_np]

    n_words = np.bincount(fp, minlength=n).astype(np.int64)
    wl = pc.utf8_length(fw).to_numpy(zero_copy_only=False)
    sum_wl = np.bincount(fp, weights=wl, minlength=n)
    safe_w = np.maximum(n_words, 1)
    mean_wl = sum_wl / safe_w

    alpha = pc.match_substring_regex(fw, r"[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha = np.bincount(fp[alpha], minlength=n).astype(np.int64)
    alpha_ratio = n_alpha / safe_w

    low_fw = pc.utf8_lower(fw)
    req_hits = np.zeros(n, dtype=np.int64)
    for w in required_words:
        has = np.bincount(
            fp[
                pc.equal(low_fw, w.lower()).to_numpy(zero_copy_only=False)
            ],
            minlength=n,
        )
        req_hits += has > 0  # distinct presence, not frequency

    # --- symbol ratio (non-overlapping counts, same as str.count and
    # the SQL replace-length arithmetic) -------------------------------
    n_sym = (
        pc.count_substring(texts, "#").to_numpy(zero_copy_only=False)
        + pc.count_substring(texts, "...").to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    symbol_ratio = n_sym / safe_w

    # --- line-level signals -------------------------------------------
    lines = pc.split_pattern(texts, "\n")
    lparent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    lflat = pc.list_flatten(lines)
    n_lines = np.bincount(lparent, minlength=n).astype(np.int64)
    bullet = np.zeros(len(lflat), dtype=bool)
    for pfx in GOPHER_BULLET_PREFIXES:
        bullet |= pc.starts_with(lflat, pfx).to_numpy(zero_copy_only=False)
    ell = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
    safe_l = np.maximum(n_lines, 1)
    bullet_ratio = np.bincount(lparent[bullet], minlength=n) / safe_l
    ellipsis_ratio = np.bincount(lparent[ell], minlength=n) / safe_l

    kept = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_line_ratio)
        & (ellipsis_ratio <= max_ellipsis_line_ratio)
        & (alpha_ratio >= min_alpha_word_ratio)
        & (req_hits >= min_required_hits)
    )

    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(np.floor((mean_wl) * 1e6 + 0.5) / 1e6, pa.float64()),
            "symbol_ratio": pa.array(
                np.floor((symbol_ratio) * 1e6 + 0.5) / 1e6, pa.float64()
            ),
            "bullet_line_ratio": pa.array(
                np.floor((bullet_ratio) * 1e6 + 0.5) / 1e6, pa.float64()
            ),
            "ellipsis_line_ratio": pa.array(
                np.floor((ellipsis_ratio) * 1e6 + 0.5) / 1e6, pa.float64()
            ),
            "alpha_word_ratio": pa.array(
                np.floor((alpha_ratio) * 1e6 + 0.5) / 1e6, pa.float64()
            ),
            "n_required_hits": pa.array(req_hits),
            "kept": pa.array(kept),
        }
    )


def gopher_filter(ds, **kwargs):
    """Gopher quality rules over a Dataset: one vectorized ``map_batches``
    pass (per-doc-local — no shuffle, streams at read bandwidth). One row
    per document with every rule signal plus ``kept``."""
    return ds.map_batches(
        gopher_quality, batch_format="pyarrow", fn_kwargs=kwargs
    )


def gopher_repetition(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: "tuple[int, ...]" = (2, 3, 4),
    dup_ns: "tuple[int, ...]" = (5, 6, 7, 8, 9, 10),
) -> pa.Table:
    """The FULL Gopher repetition rule family (Rae et al. 2021 A1.1),
    completing what ``repetition_scores`` starts (dup-line chars, top
    bigram count): per document,

      * ``top_{n}gram_char_ratio`` (n in ``top_ns``) — characters of the
        most frequent word n-gram times its count, over total word
        characters. Deterministic tie-break: maximal count, then maximal
        character length. Overlapping occurrences are each counted
        (Gopher's definition), so the ratio can exceed 1 on degenerate
        docs — thresholds compare fine.
      * ``dup_{n}gram_char_ratio`` (n in ``dup_ns``) — fraction of word
        characters covered by at least one n-gram that occurs more than
        once in the document (character-coverage union, so overlapping
        duplicated windows never double-count a word).

    Per-doc-local (no shuffle). One words explode + factorize, then pure
    integer kernels per n: window runs via lexsort over the n shifted
    code columns, counts via run-length bincount, character coverage via
    a prefix-sum window test — no per-row Python.
    """
    texts = batch[text_col].to_pandas().fillna("")
    n = len(texts)
    safe_tc = None
    out_cols: "dict[str, np.ndarray]" = {}
    for nn in top_ns:
        out_cols[f"top_{nn}gram_char_ratio"] = np.zeros(n, np.float64)
    for nn in dup_ns:
        out_cols[f"dup_{nn}gram_char_ratio"] = np.zeros(n, np.float64)

    words = texts.str.split().explode().dropna()
    total = len(words)
    if n and total:
        wdoc = words.index.to_numpy().astype(np.int64)
        wcode, _ = pd.factorize(words.to_numpy())
        wlen = words.str.len().to_numpy(dtype=np.int64)
        m = np.bincount(wdoc, minlength=n)  # words per doc
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(m, out=starts[1:])
        W = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(wlen, out=W[1:])
        total_chars = np.bincount(wdoc, weights=wlen, minlength=n)
        safe_tc = np.maximum(total_chars, 1)
        g = np.arange(total, dtype=np.int64)
        pos = g - starts[wdoc]

        for nn in sorted(set(top_ns) | set(dup_ns)):
            valid = pos <= (m[wdoc] - nn)
            idx = np.nonzero(valid)[0]
            if len(idx) == 0:
                continue
            cols = [wcode[idx + k] for k in range(nn)]
            order = np.lexsort(tuple(reversed(cols)) + (wdoc[idx],))
            sidx = idx[order]
            sdoc = wdoc[sidx]
            new = np.empty(len(sidx), dtype=bool)
            new[0] = True
            acc = sdoc[1:] != sdoc[:-1]
            for c in cols:
                cs = c[order]
                acc = acc | (cs[1:] != cs[:-1])
            new[1:] = acc
            rid = np.cumsum(new) - 1
            rsz = np.bincount(rid)
            c_occ = rsz[rid]  # this window's in-doc occurrence count
            chars_occ = W[sidx + nn] - W[sidx]

            if nn in top_ns:
                # per-doc lexicographic max of (count, chars): packed key
                K = int(chars_occ.max()) + 1
                key = c_occ.astype(np.int64) * K + chars_occ
                best = np.zeros(n, np.int64)
                np.maximum.at(best, sdoc, key)
                bc, bch = best // K, best % K
                out_cols[f"top_{nn}gram_char_ratio"] = (
                    bc * bch
                ) / safe_tc

            if nn in dup_ns:
                F = np.zeros(total, np.int64)
                F[sidx[c_occ > 1]] = 1  # duplicated-window start marks
                S = np.zeros(total + 1, np.int64)
                np.cumsum(F, out=S[1:])
                lo = np.maximum(g - (nn - 1), starts[wdoc])
                hi = np.minimum(g, starts[wdoc] + m[wdoc] - nn)
                ok = hi >= lo
                hi_c = np.clip(hi, 0, total - 1)
                covered = ok & ((S[hi_c + 1] - S[lo]) > 0)
                dup_chars = np.bincount(
                    wdoc[covered], weights=wlen[covered], minlength=n
                )
                out_cols[f"dup_{nn}gram_char_ratio"] = dup_chars / safe_tc

    tbl = {"doc_id": batch[id_col].cast(pa.int64())}
    for name, arr in out_cols.items():
        tbl[name] = pa.array(np.floor((arr) * 1e6 + 0.5) / 1e6, pa.float64())
    return pa.table(tbl)


def gopher_repetition_scores(ds, **kwargs):
    """Full Gopher repetition signals over a Dataset: one vectorized
    ``map_batches`` pass (per-doc-local — no shuffle)."""
    return ds.map_batches(
        gopher_repetition, batch_format="pyarrow", fn_kwargs=kwargs
    )
