"""C4-style line-level corpus cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) — the rule family every web-text
training pipeline runs before dedup/quality scoring:

line rules (a line survives iff ALL hold):
  * ends in a terminal punctuation mark (``. ! ? "``);
  * has at least ``min_words_per_line`` whitespace words;
  * does not contain the word "javascript" (case-insensitive substring —
    C4's cookie/JS-warning boilerplate rule).

document rules (a document is KEPT iff ALL hold):
  * at least ``min_kept_lines`` lines survived the line rules (C4's
    "fewer than 3 sentences" page drop);
  * no whitespace-delimited token equals a ``doc_bad_words`` entry
    (C4 uses the List-of-Dirty-Naughty-Words; the list is a parameter
    here — policy words are deployment-specific);
  * the text contains neither ``{`` (code page heuristic) nor the
    placeholder phrase "lorem ipsum".

This stage is embarrassingly per-document: ONE ``map_batches`` pass, no
shuffle, so at 100 TB it scales with read bandwidth exactly like the
curation stage (stages/curate.py) it complements — curate COMPUTES
signals, this APPLIES the C4 structural rule set and emits the cleaned
text. Everything is Arrow-vectorized: ``split_pattern`` explode →
flat-line string kernels → ``np.bincount`` per-doc re-aggregation →
``ListArray.from_arrays`` + ``binary_join`` to rebuild the kept text;
no per-row Python anywhere.

Reference anchor: the reference crawler keeps every fetched page verbatim
(/root/reference/src/main.rs:119-130 writes unfiltered bodies); this
operator is part of the beyond-reference training-data extension set
(SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: C4 terminal punctuation: period, exclamation, question mark, end quote
TERMINAL_RE = r'[.!?"]$'

#: C4's line-level boilerplate marker (case-insensitive substring)
LINE_BAD_SUBSTR = "javascript"

#: C4's page-level heuristics (case-insensitive substring for the phrase,
#: exact for the brace)
DOC_BAD_PHRASE = "lorem ipsum"
DOC_BAD_CHAR = "{"


def c4_signals(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    doc_bad_words: "tuple[str, ...]" = (),
) -> pa.Table:
    """Per-document C4 verdicts for one batch: ``(doc_id, n_lines,
    n_kept_lines, kept, clean_text)``. ``clean_text`` is always the
    newline-join of surviving lines (well-defined even for dropped docs,
    so the caller can audit what the doc-level rule rejected)."""
    texts = pc.fill_null(batch[text_col], "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        # binary_join ships no large_string kernel (any Arrow ≤ 21); a Ray
        # block is bounded well under the 2 GiB string-offset limit, so
        # the narrowing cast is safe per batch
        texts = texts.cast(pa.string())
    n = len(texts)

    lines = pc.split_pattern(texts, "\n")
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lines)

    # word count per line = whitespace-split token count (matches DuckDB
    # len(string_split(line, ' ')): an empty line counts 1 token [''])
    nw = pc.add(pc.count_substring(flat, " "), 1)
    term = pc.match_substring_regex(flat, TERMINAL_RE)
    badl = pc.match_substring(pc.utf8_lower(flat), LINE_BAD_SUBSTR)
    keep_line = pc.and_(
        pc.and_(term, pc.invert(badl)),
        pc.greater_equal(nw, min_words_per_line),
    )
    keep_np = keep_line.to_numpy(zero_copy_only=False)

    n_lines = np.bincount(parent, minlength=n).astype(np.int64)
    n_kept = np.bincount(parent[keep_np], minlength=n).astype(np.int64)

    # rebuild kept text per doc: filter preserves order, so offsets from
    # the per-doc kept counts reconstruct each doc's surviving lines
    kept_flat = flat.filter(keep_line)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_kept, out=offsets[1:])
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), kept_flat), "\n"
    )

    # doc-level rules on the full text
    low = pc.utf8_lower(texts)
    drop = pc.or_(
        pc.match_substring(texts, DOC_BAD_CHAR),
        pc.match_substring(low, DOC_BAD_PHRASE),
    )
    if doc_bad_words:
        # exact token equality under whitespace splitting (case-sensitive,
        # same as DuckDB list_contains(string_split(text,' '), w)); lines
        # count as whitespace too
        alt = "|".join(re.escape(w) for w in doc_bad_words)
        tok_re = rf"(?:^|[ \n])(?:{alt})(?:[ \n]|$)"
        drop = pc.or_(drop, pc.match_substring_regex(texts, tok_re))
    kept = pc.and_(
        pa.array(n_kept >= min_kept_lines), pc.invert(drop)
    )

    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_lines": pa.array(n_lines),
            "n_kept_lines": pa.array(n_kept),
            "kept": kept,
            "clean_text": clean,
        }
    )


def c4_filter(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    doc_bad_words: "tuple[str, ...]" = (),
):
    """C4 structural cleaning over a Dataset: one vectorized
    ``map_batches`` pass (per-doc-local — NO shuffle, streams at read
    bandwidth at any scale). Returns a Dataset of ``(doc_id, n_lines,
    n_kept_lines, kept, clean_text)``, one row per input document; the
    cleaned corpus is ``.filter(kept)`` + ``clean_text``, the audit frame
    is the whole thing."""
    return ds.map_batches(
        c4_signals,
        batch_format="pyarrow",
        fn_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "min_words_per_line": min_words_per_line,
            "min_kept_lines": min_kept_lines,
            "doc_bad_words": doc_bad_words,
        },
    )
