"""jusText-style boilerplate-paragraph classification (Pomikálek 2011,
"Removing Boilerplate and Duplicate Content from Web Corpora" ch. 4) — the
paragraph-level main-content extractor that sits between raw text capture
and line/structural cleaning (functions/c4.py) in a webtext curation
pipeline.

Two passes, both per-document-local (ONE ``map_batches``, NO shuffle —
streams at read bandwidth at any corpus size, like c4_filter):

context-free pass — each paragraph gets a class from its own features:
  * ``short``    — fewer than ``length_low`` words;
  * ``bad``      — link density (fraction of words containing ``http`` or
    ``www.``) above ``max_link_density``;
  * ``good``     — stopword density ≥ ``stopwords_high``;
  * ``neargood`` — stopword density ≥ ``stopwords_low``;
  * ``bad``      — otherwise.

context-sensitive pass — jusText's key idea: undecided paragraphs take
their class from their decisive neighbours. Our deterministic rule (a
simplification of jusText's edge-block handling, stated here as THE
contract): a ``short``/``neargood`` paragraph becomes ``good`` iff the
nearest context-free ``good``/``bad`` paragraph BEFORE it (in the same
document) is ``good``, OR the nearest one AFTER it is ``good``; otherwise
it becomes ``bad``. Missing neighbours (document edges) count as
not-good. ``good``/``bad`` paragraphs keep their class.

Everything is Arrow/numpy-vectorized: two-level ``split_pattern`` explode
(doc → paragraph → word), ``np.bincount`` per-paragraph feature
aggregation, and the neighbour search is two ``np.maximum.accumulate``
scans over decisive-paragraph indices with per-document validity masks —
no per-row Python anywhere, including the context pass.

Default thresholds are exact binary fractions (0.25, 0.125, 0.2) so the
density comparisons are bit-identical between float math here and the
DuckDB oracle SQL.

Reference anchor: the reference crawler persists whole fetched bodies
unfiltered (/root/reference/src/main.rs:119-130); this operator is part of
the beyond-reference training-data extension set (SURVEY.md §2
"LLM-data-pipeline operators").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _STOPWORDS

#: default stopword list — THE 24-word list from textstats quality
#: features (single shared definition; editing one cannot desynchronize
#: the other)
DEFAULT_STOPWORDS: "tuple[str, ...]" = tuple(sorted(_STOPWORDS))

#: paragraph separator: blank line (jusText works on DOM blocks; on flat
#: text the blank-line convention is the standard stand-in)
PARA_SEP = "\n\n"

#: a word is a "link word" if it contains either marker
LINK_MARKERS = ("http", "www.")

_CLS_NAMES = np.array(["short", "neargood", "bad", "good"])
_SHORT, _NEARGOOD, _BAD, _GOOD = 0, 1, 2, 3


def paragraph_signals(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: "tuple[str, ...]" = DEFAULT_STOPWORDS,
    length_low: int = 4,
    stopwords_high: float = 0.25,
    stopwords_low: float = 0.125,
    max_link_density: float = 0.2,
) -> pa.Table:
    """Classify every paragraph of every document in one batch. Returns
    one row per paragraph: ``(doc_id, para_idx, n_words, stopword_ratio,
    link_density, cls_ctxfree, cls)`` — both the context-free class and
    the final context-sensitive one (the final classes are only
    ``good``/``bad``; ``short``/``neargood`` appear in ``cls_ctxfree``).
    A document with no paragraphs still emits one ``short`` row
    (para_idx 0, n_words 0) so per-doc joins never lose documents."""
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())
    # real web text carries CRLF (and bare-CR) line endings; normalize to
    # '\n' so the blank-line paragraph split and the word split both see
    # them (contract: '\r\n' and lone '\r' ARE line breaks)
    texts = pc.replace_substring(texts, "\r\n", "\n")
    texts = pc.replace_substring(texts, "\r", "\n")
    n_docs = len(texts)

    # --- explode level 1: document -> paragraphs -----------------------
    paras = pc.split_pattern(texts, PARA_SEP)
    para_parent = pc.list_parent_indices(paras).to_numpy(zero_copy_only=False)
    flat_paras = pc.list_flatten(paras)
    # split_pattern emits >=1 element per doc (even empty text -> [""]),
    # so every doc owns >=1 paragraph row by construction
    n_paras = len(flat_paras)
    paras_per_doc = np.bincount(para_parent, minlength=n_docs)
    para_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(paras_per_doc, out=para_start[1:])
    para_idx = np.arange(n_paras, dtype=np.int64) - para_start[para_parent]

    # --- explode level 2: paragraph -> words ---------------------------
    words = pc.split_pattern_regex(flat_paras, r"[ \n]+")
    word_parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    flat_words = pc.list_flatten(words)
    nonempty = pc.not_equal(flat_words, "")
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    real_words = flat_words.filter(nonempty)
    real_parent = word_parent[ne_np]

    n_words = np.bincount(real_parent, minlength=n_paras).astype(np.int64)
    is_stop = pc.is_in(
        pc.utf8_lower(real_words),
        value_set=pa.array(list(stopwords), pa.string()),
    ).to_numpy(zero_copy_only=False)
    is_link = pc.or_(
        pc.match_substring(real_words, LINK_MARKERS[0]),
        pc.match_substring(real_words, LINK_MARKERS[1]),
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(real_parent[is_stop], minlength=n_paras).astype(
        np.int64
    )
    n_link = np.bincount(real_parent[is_link], minlength=n_paras).astype(
        np.int64
    )

    # --- context-free classification (vector select) -------------------
    safe = np.maximum(n_words, 1)
    cls0 = np.full(n_paras, _BAD, dtype=np.int8)
    cls0[n_stop >= stopwords_low * n_words] = _NEARGOOD
    cls0[n_stop >= stopwords_high * n_words] = _GOOD
    cls0[n_link > max_link_density * n_words] = _BAD
    cls0[n_words < length_low] = _SHORT

    # --- context-sensitive pass -----------------------------------------
    # nearest decisive (good/bad) paragraph strictly before / after each
    # undecided one, within the same document: forward/backward
    # maximum.accumulate over decisive indices, invalidated across
    # document boundaries via the per-doc paragraph start offsets.
    decisive = (cls0 == _GOOD) | (cls0 == _BAD)
    ar = np.arange(n_paras, dtype=np.int64)
    idx_fwd = np.where(decisive, ar, -1)
    prev_dec = np.maximum.accumulate(idx_fwd)  # last decisive <= i
    idx_bwd = np.where(decisive, n_paras - 1 - ar, -1)[::-1]
    next_dec = (n_paras - 1) - np.maximum.accumulate(idx_bwd)[::-1]
    # validity: inside this doc's paragraph range (and existing at all);
    # for undecided rows prev_dec/next_dec never equal i itself
    doc_lo = para_start[para_parent]
    doc_hi = para_start[para_parent + 1]
    prev_ok = prev_dec >= doc_lo
    next_ok = (next_dec < doc_hi) & (next_dec >= 0)
    prev_good = prev_ok & (cls0[np.maximum(prev_dec, 0)] == _GOOD)
    next_good = next_ok & (cls0[np.minimum(next_dec, n_paras - 1)] == _GOOD)
    cls = np.where(
        decisive, cls0, np.where(prev_good | next_good, _GOOD, _BAD)
    ).astype(np.int8)

    return pa.table(
        {
            "doc_id": pc.take(
                batch[id_col].cast(pa.int64()), pa.array(para_parent)
            ),
            "para_idx": pa.array(para_idx),
            "n_words": pa.array(n_words),
            "stopword_ratio": pa.array(
                np.floor((n_stop / safe) * 1e6 + 0.5) / 1e6, pa.float64()
            ),
            "link_density": pa.array(
                np.floor((n_link / safe) * 1e6 + 0.5) / 1e6, pa.float64()
            ),
            "cls_ctxfree": pa.array(_CLS_NAMES[cls0], pa.string()),
            "cls": pa.array(_CLS_NAMES[cls], pa.string()),
        }
    )


def classify_paragraphs(ds, **kwargs):
    """jusText-style paragraph classification over a Dataset: one
    vectorized ``map_batches`` pass (per-doc-local — no shuffle). Returns
    a Dataset with one row per paragraph; the retained main content of a
    document is the concatenation of its ``cls == 'good'`` paragraphs."""
    return ds.map_batches(
        paragraph_signals, batch_format="pyarrow", fn_kwargs=kwargs
    )
